"""End-to-end corpus-cleaning pipeline — the composition the individual
operators exist for: score → language-gate → exact-dedup → emit, as one
declarative plan (one shuffle, for the dedup window).

This is the canonical LLM-training-data preparation shape at 100 TB:
every stage before the dedup window is a map-only column expression
fused into the scan; the single wide operation is the per-content-hash
window, keyed on sha-256 digests (32 bytes/doc on the wire regardless
of document size). Rejected documents never cross the shuffle — the
quality/language gates run scan-side, so a 60%-reject corpus shuffles
40% of its digests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from query_planner_optimizer_spark.operators import text as T

QUALITY_MIN = 0.5
KEEP_LANGS = ("en",)


def clean_corpus(
    docs: DataFrame,
    quality_min: float = QUALITY_MIN,
    keep_langs: tuple[str, ...] = KEEP_LANGS,
) -> DataFrame:
    """Filter + dedup a document corpus for training-data use.

    Stages: quality scoring (length/punctuation/stopword mix) →
    language-ID gate → exact dedup keeping the smallest doc_id per
    content hash. Returns the surviving documents with their metrics:
    (doc_id, lang_pred, quality_score, n_tokens).
    """
    scored = T.with_lang_id(T.with_quality_score(docs))
    gated = scored.filter(
        (F.col("quality_score") >= F.lit(quality_min))
        & (F.col("lang_pred").isin(*keep_langs))
    )
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy(
        F.col("doc_id").asc()
    )
    return (
        gated.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "lang_pred", "quality_score", "n_tokens")
    )


# --------------------------------------------------------------------------
# Driver entry
# --------------------------------------------------------------------------

def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean_corpus(T._load_documents(spark, sf_dir))


def entry_queries() -> dict[str, Callable]:
    return {"pipeline_clean_corpus": q_clean_corpus}


def entry_oracles() -> dict[str, str]:
    # Compose the text operators' oracle SQL (same formulas, same
    # engine-portable constructs) + a dedup window over sha256(text).
    quality = T.entry_oracles()["text_quality_score"]
    lang = T.entry_oracles()["text_lang_id"]
    sql = f"""
        WITH q AS ({quality}),
        l AS ({lang}),
        gated AS (
            SELECT d.doc_id, l.lang_pred, q.quality_score, q.n_tokens,
                   sha256(d.text) AS h
            FROM documents d
            JOIN q ON d.doc_id = q.doc_id
            JOIN l ON d.doc_id = l.doc_id
            WHERE q.quality_score >= {QUALITY_MIN}
              AND l.lang_pred IN ({", ".join(f"'{x}'" for x in KEEP_LANGS)})
        )
        SELECT doc_id, lang_pred, quality_score, n_tokens FROM (
            SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id)
                AS rn
            FROM gated
        ) WHERE rn = 1
    """
    return {"pipeline_clean_corpus": sql}
