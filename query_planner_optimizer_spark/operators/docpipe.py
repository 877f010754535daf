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

from query_planner_optimizer_spark.catalog import FrameMemo
from query_planner_optimizer_spark.dsl.compiler import agg_decimal_scale
from query_planner_optimizer_spark.functions.rounding import (
    round_half_up,
    sql_round_half_up as _rs,
)
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
    scored = T.with_quality_and_lang(docs)
    gated = scored.filter(
        (F.col("quality_score") >= F.lit(quality_min))
        & (F.col("lang_pred").isin(*keep_langs))
    )
    # Keep-smallest-doc_id per content hash as a partial-aggregable
    # min-struct argmin instead of a row_number window (r15, guide
    # §2.3 "aggregate before you shuffle"): map-side combine collapses
    # duplicate hashes BEFORE the exchange, so the shuffle carries
    # ~unique digests instead of every gated row, and the per-partition
    # sort the window needed disappears. doc_id is unique, so the
    # struct order picks exactly the row the (doc_id ASC) window kept.
    return (
        gated.groupBy(F.sha2(F.col("text"), 256).alias("__h"))
        .agg(F.min(F.struct(
            "doc_id", "lang_pred", "quality_score", "n_tokens")).alias("b"))
        .select(
            F.col("b.doc_id").alias("doc_id"),
            F.col("b.lang_pred").alias("lang_pred"),
            F.col("b.quality_score").alias("quality_score"),
            F.col("b.n_tokens").alias("n_tokens"),
        )
    )


TOP_QUALITY_KEEP_FRAC = 0.3


def top_quality_fraction(
    docs: DataFrame,
    group_col: str = "lang",
    keep_frac: float = TOP_QUALITY_KEEP_FRAC,
) -> DataFrame:
    """Keep the top ``keep_frac`` of documents by quality score within
    each group — the per-language curation cut of a corpus pipeline.

    Threshold-based, not rank-based: the per-group cutoff is the
    (1 - keep_frac) quantile of the score, computed in ONE partial→final
    aggregation and broadcast back onto the scan. The rank-based
    alternative (percent_rank window per group) sorts entire groups —
    and groups here are languages, whose cardinality is tiny while their
    size is corpus-scale: exactly the giant-partition window this repo
    deliberately never offers. Ties at the cutoff are kept (>=), so the
    kept fraction is ≥ keep_frac by at most the tie mass. Scores are
    rounded to 6dp BEFORE the quantile so both engines threshold the
    same discrete values (the interpolated cutoff then lands either
    exactly on a score — both engines agree — or strictly between two
    6dp values, 10 orders of magnitude past double error).
    """
    scored = T.with_quality_score(docs).select(
        "doc_id", group_col, round_half_up(F.col("quality_score"), 6).alias("q")
    )
    cut = scored.groupBy(group_col).agg(
        F.percentile(F.col("q"), F.lit(1.0 - keep_frac)).alias("__cut"),
        F.count(F.lit(1)).alias("n_group"),
    )
    return (
        scored.join(F.broadcast(cut), group_col)
        .filter(F.col("q") >= F.col("__cut"))
        .select(
            "doc_id", group_col, F.col("q").alias("quality_score"), "n_group"
        )
    )


TOKEN_BUDGET = 12_000


#: Max documents per (quality-level, salt) window partition — a
#: doc_id-range bucket, so the bound holds by construction even when
#: every document in the corpus shares ONE exact score.
LEVEL_SALT_WIDTH = 65536

#: select_token_budget's fused (scored + windowed) frame, memoized per
#: (input-frame identity, salt_width): the entry/bench paths pass the
#: SAME cached reader frame on every call, so the persist below
#: materializes once per session instead of once per invocation. A
#: catalog.FrameMemo — anchor-identity-checked, LRU-bounded (evictions
#: unpersist), cleared by invalidate_reader_caches.
_FUSED_CACHE = FrameMemo()

#: line_dedup's exploded+hashed lines frame, same memo discipline.
_LINES_CACHE = FrameMemo()


def select_token_budget(
    docs: DataFrame, budget: int = TOKEN_BUDGET,
    salt_width: int = LEVEL_SALT_WIDTH,
) -> DataFrame:
    """Global best-first corpus selection under a token budget: take
    documents in (quality desc, doc_id asc) order until the cumulative
    token count would exceed ``budget`` — "fill the training budget with
    the best data first".

    A naive global window (SUM OVER one big ORDER BY) serializes the
    whole corpus through one task. Instead the global prefix-sum splits
    into two bounded stages:

    1. per-QUALITY-LEVEL token totals (quality rounded to 6dp →
       ≤ 1e6 distinct levels regardless of corpus size), cumulated by a
       window over the LEVELS — a corpus-size-independent frame — and
       broadcast back;
    2. a within-level cumsum SALTED by doc_id range: the window
       partitions on (level, salt) where ``salt = doc_id DIV
       salt_width`` — truncating division is monotone non-decreasing in
       doc_id, so (level, salt asc, doc_id asc) is exactly (level,
       doc_id asc) and no partition can hold more than ``salt_width``
       documents BY CONSTRUCTION, even on the adversarial corpus where
       every document shares one exact score (the concentration hazard
       the unsalted form documented). Bridging the salt buckets costs
       one more bounded aggregation: per-(level, salt) totals, cumulated
       by a window over the salt buckets WITHIN each level (aggregated
       rows only — ≤ id-range/salt_width per level).

    global_cum(doc) = level_cum_before + salt_cum_before +
    within-salt_cum, so the filter reproduces the single-window
    semantics exactly; ``cum_tokens`` is emitted for auditability.
    Oracle: one ANSI cumulative window.

    ONE scan of ``docs`` (r10, the r9 verdict's restructure): the
    within-salt running sum and the per-bucket total are two window
    expressions over the SAME (level, salt) partitioning — one shuffle,
    one sort pass — and every aggregated frame derives from that fused
    output instead of re-deriving the scored scan (level totals = sum
    of bucket totals, exact by integer-sum associativity). The fused
    frame is persisted (5 narrow columns) so its three consumers share
    one materialization; the expensive part of a re-derivation is
    re-reading and re-tokenizing the TEXT column, which at 100 TB is
    3× corpus I/O — the narrow cache is orders of magnitude smaller.
    """
    scored = T.with_quality_score(docs).select(
        "doc_id",
        round_half_up(F.col("quality_score"), 6).alias("quality_score"),
        "n_tokens",
    ).withColumn("__salt", F.expr(f"doc_id DIV {int(salt_width)}"))
    wd = (
        Window.partitionBy("quality_score", "__salt")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wb = Window.partitionBy("quality_score", "__salt")
    fkey = (id(docs), int(salt_width))
    fused = _FUSED_CACHE.get(fkey, anchor=docs)
    if fused is None:
        fused = _FUSED_CACHE.put(fkey, docs, scored.select(
            "doc_id", "quality_score", "n_tokens", "__salt",
            F.sum("n_tokens").over(wd).alias("__in_salt_cum"),
            F.sum("n_tokens").over(wb).alias("__bucket_tokens"),
        ).persist())
    # Per-(level, salt) totals read off the fused frame (every row of a
    # bucket carries the identical total), then level totals from
    # bucket totals — aggregation trees only, no second corpus scan.
    buckets = fused.groupBy("quality_score", "__salt").agg(
        F.max("__bucket_tokens").alias("__bucket_tokens")
    )
    lvl = buckets.groupBy("quality_score").agg(
        F.sum("__bucket_tokens").alias("__lvl_tokens")
    )
    wl = (
        Window.orderBy(F.col("quality_score").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lvl = lvl.select(
        "quality_score",
        (F.sum("__lvl_tokens").over(wl) - F.col("__lvl_tokens")).alias(
            "__cum_before"
        ),
    )
    # Salt-bucket bridge: cumulate across the salt buckets of each
    # level. The window runs over AGGREGATED rows (one per bucket),
    # never documents.
    ws = (
        Window.partitionBy("quality_score")
        .orderBy(F.col("__salt").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bcum = buckets.select(
        "quality_score", "__salt",
        (F.sum("__bucket_tokens").over(ws)
         - F.col("__bucket_tokens")).alias("__salt_cum_before"),
    )
    out = (
        fused.join(F.broadcast(lvl), "quality_score")
        .join(bcum, ["quality_score", "__salt"])
        .withColumn(
            "cum_tokens",
            F.col("__cum_before") + F.col("__salt_cum_before")
            + F.col("__in_salt_cum"),
        )
    )
    return out.filter(F.col("cum_tokens") <= budget).select(
        "doc_id", "quality_score", "n_tokens", "cum_tokens"
    )


PACK_BUDGET = 2048
PACK_SHARDS = 32


def pack_sequences(
    docs: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = PACK_BUDGET,
    shards: int = PACK_SHARDS,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Greedy context-window packing: assign documents to fixed
    token-budget packs for training-sequence assembly.

    A global greedy pack is a sequential scan — unshardable. Instead
    documents hash-shard (stable md5 buckets, so assignment survives
    data growth) and pack WITHIN each shard by running token count:
    pack_id = floor(pre_cumsum / budget) — a document belongs to the
    pack in which it STARTS, so packs hold `budget` tokens on average
    (a boundary-straddling doc overflows its pack rather than being
    split; splitting at the boundary is a downstream choice this layout
    leaves open via pack_offset). Each shard's window sorts
    independently → shards-way parallel, one shuffle. Returns
    (doc_id, [group_cols...,] shard, pack_id, pack_offset); pack_offset
    is the document's token start within its pack.

    ``group_cols`` packs WITHIN groups (e.g. per language/source): a
    pack never mixes documents across groups — the standard discipline
    for monolingual training sequences. Each (group, shard) packs
    independently, so group count multiplies parallelism, not cost.
    """
    from query_planner_optimizer_spark.operators.sampling import hash_bucket

    gcols = list(group_cols)
    shard = (hash_bucket(F.col(id_col)) % shards).alias("shard")
    w = (
        Window.partitionBy(*gcols, "shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_shard = docs.select(id_col, token_col, *gcols, shard)
    cum = F.sum(token_col).over(w)
    pre = (cum - F.col(token_col)).alias("__pre")
    return (
        with_shard.withColumn("__pre", pre)
        .select(
            id_col,
            *gcols,
            "shard",
            F.floor(F.col("__pre") / budget).cast("int").alias("pack_id"),
            (F.col("__pre") % budget).cast("int").alias("pack_offset"),
        )
    )


CHUNK_SIZE = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Split documents into overlapping token windows — the dual of
    :func:`pack_sequences` (short docs pack, long docs chunk; real
    pipelines do both around one token budget).

    Chunk i covers tokens [i*stride, i*stride + chunk_size); starts are
    generated while start < n_tokens, i.e. ceil(n/stride) chunks, so
    every token is covered and consecutive chunks overlap by
    chunk_size - stride tokens. Entirely built-in array expressions
    (tokenize → sequence → explode → slice → join): map-only, zero
    shuffle, fused into the scan — chunking 100 TB is embarrassingly
    parallel and this plan keeps it that way. Returns
    (doc_id, chunk_id, n_chunk_tokens, chunk_text); empty documents
    yield no chunks.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toked = docs.select(
        F.col(id_col).alias("doc_id"), T.tokens(F.col(text_col)).alias("__toks")
    )
    n = F.size(F.col("__toks"))
    n_chunks = F.ceil(n / F.lit(stride)).cast("int")
    exploded = (
        toked.filter(n > 0)
        .withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
    )
    # slice() is 1-indexed; length past the end is truncated.
    piece = F.slice(
        F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_size
    )
    return exploded.select(
        "doc_id",
        "chunk_id",
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


#: Pseudo-line width for the driver entry (the driver corpus has no
#: newlines, so "lines" are non-overlapping 3-token windows — narrow
#: enough that cross-document repeats actually occur and removal is
#: exercised for real).
LINE_DEDUP_WINDOW = 3
#: Remove lines occurring in MORE than this many distinct documents
#: (C4 removes any line repeated >= 3 times; expressed as doc-freq).
LINE_DEDUP_MAX_DF = 2


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int = LINE_DEDUP_MAX_DF,
    line_tokens: int | None = None,
) -> DataFrame:
    """Corpus-level exact LINE dedup (the C4/RefinedWeb cleaning step):
    drop every line that occurs in more than ``max_doc_freq`` distinct
    documents (boilerplate: navigation, cookie banners, license
    headers), then reassemble each document from its surviving lines in
    order. Returns (doc_id, clean_text, n_lines_kept, n_lines_removed).

    ``line_tokens=None`` splits on newlines (the real-corpus mode);
    an integer splits into non-overlapping token windows of that width
    (pseudo-lines — used by the driver entry because its corpus has no
    newlines).

    Scale shape: lines are hashed to md5 immediately, so the
    doc-frequency aggregation shuffles (16-byte hash, doc_id) pairs —
    never line text. The removal set (df > threshold) is a tiny
    fraction of distinct lines in practice (boilerplate is by
    definition repeated), and AQE elects a broadcast join for it at
    runtime from the materialized shuffle stats — deliberately NOT a
    forced ``F.broadcast`` so a degenerate everything-repeated corpus
    degrades to a shuffle join instead of an executor OOM. The only
    full-width shuffle is the per-document reassembly groupBy, keyed on
    doc_id and bounded by document size.
    """
    if line_tokens is not None:
        toked = docs.select(
            F.col(id_col).alias("doc_id"),
            T.tokens(F.col(text_col)).alias("__toks"),
        )
        n = F.size(F.col("__toks"))
        n_lines = F.ceil(n / F.lit(line_tokens)).cast("int")
        lines = (
            toked.filter(n > 0)
            .withColumn("idx", F.explode(F.sequence(F.lit(0), n_lines - 1)))
            .select(
                "doc_id",
                "idx",
                F.array_join(
                    F.slice(
                        F.col("__toks"),
                        F.col("idx") * line_tokens + 1,
                        line_tokens,
                    ),
                    " ",
                ).alias("line"),
            )
        )
        sep = " "
    else:
        lines = docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
        )
        sep = "\n"
    hashed = lines.withColumn("h", F.md5("line"))
    # Two consumers read the exploded+hashed lines (the doc-frequency
    # aggregation and the join probe); without a barrier each re-runs
    # the tokenize/explode scan (r10 sf1 protocol: ~half the engine
    # time). Persist once, memoized per input frame like the other
    # session caches. With AQE electing a broadcast for the removal
    # set, the probe side then never shuffles at all.
    lkey = (id(docs), id_col, text_col, line_tokens)
    memo = _LINES_CACHE.get(lkey, anchor=docs)
    if memo is None:
        hashed = _LINES_CACHE.put(lkey, docs, hashed.persist())
    else:
        hashed = memo
    removal = (
        hashed.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") > max_doc_freq)
        .select("h")
    )
    # No FORCED broadcast: the removal set is tiny on real corpora
    # (boilerplate is a small fraction of distinct lines) and AQE
    # converts the join to broadcast at runtime from the materialized
    # shuffle stats — but a degenerate corpus (everything repeated)
    # can make it huge, and a forced broadcast would OOM executors
    # where the runtime-elected shuffle join just works.
    flagged = hashed.join(
        removal.withColumn("__hot", F.lit(True)), "h", "left"
    ).withColumn("keep", F.col("__hot").isNull())
    kept_struct = F.when(
        F.col("keep"), F.struct(F.col("idx"), F.col("line"))
    )
    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s.getField("line"),
            ),
            sep,
        ).alias("clean_text"),
        F.sum(F.col("keep").cast("long")).alias("n_lines_kept"),
        F.sum((~F.col("keep")).cast("long")).alias("n_lines_removed"),
    )


# --------------------------------------------------------------------------
# Driver entries
# --------------------------------------------------------------------------

def curation_funnel(
    docs: DataFrame,
    quality_min: float = QUALITY_MIN,
    keep_langs: tuple[str, ...] = KEEP_LANGS,
) -> DataFrame:
    """One-row curation FUNNEL report — the per-stage survival counts
    every pipeline run logs (input → quality gate → language gate →
    dedup keeper) plus token totals in/out. Computed in a SINGLE pass:
    per-document stage flags (the dedup-keeper flag via a whole-
    partition MIN window over the content hash — no sort) feed one
    conditional aggregation, so the funnel costs one scan + one
    digest-keyed window + one reduce, not four pipeline reruns.
    """
    scored = T.with_quality_and_lang(docs)
    q_ok = F.col("quality_score") >= F.lit(quality_min)
    l_ok = q_ok & F.col("lang_pred").isin(*keep_langs)
    h = F.sha2(F.col("text"), 256)
    keeper = F.min(F.when(l_ok, F.col("doc_id"))).over(Window.partitionBy(h))
    kept = l_ok & (F.col("doc_id") == keeper)
    staged = scored.select(
        F.col("n_tokens"), q_ok.alias("__q"), l_ok.alias("__l"),
        kept.alias("__k"),
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.count(F.when(F.col("__q"), 1)).alias("n_quality_pass"),
        F.count(F.when(F.col("__l"), 1)).alias("n_lang_pass"),
        F.count(F.when(F.col("__k"), 1)).alias("n_kept"),
        F.sum("n_tokens").alias("tokens_in"),
        F.sum(F.when(F.col("__k"), F.col("n_tokens"))).alias("tokens_kept"),
    )


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean_corpus(T._load_documents(spark, sf_dir))


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation_funnel(T._load_documents(spark, sf_dir))


def boilerplate_report(
    docs: DataFrame,
    text_col: str = "text",
    line_tokens: int = 3,
    min_docs: int = 2,
    top_k: int = 50,
) -> DataFrame:
    """C4-style boilerplate diagnostics: the most document-frequent
    pseudo-lines (non-overlapping ``line_tokens``-token chunks — the
    same segmentation :func:`line_dedup` removes by). The report a
    curation run prints before choosing removal thresholds. Returns the
    top ``top_k`` (line, n_docs, n_occurrences), ordered by
    (n_docs desc, line asc) — a total order, so the cut is
    deterministic. One explode + one partial-agg shuffle on the line
    string; the top-k is TakeOrdered, never a global sort.
    """
    from query_planner_optimizer_spark.functions.textexpr import tokens

    toked = docs.select(
        F.col("doc_id"), tokens(F.col(text_col)).alias("__t")
    )
    n = F.size(F.col("__t"))
    n_lines = F.ceil(n.cast("double") / F.lit(float(line_tokens))).cast("int")
    lines = (
        toked.filter(n >= 1)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_lines - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.slice(F.col("__t"), i * line_tokens + 1,
                                line_tokens),
                    ),
                )
            ).alias("line"),
        )
    )
    return (
        lines.groupBy("line")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.col("n_docs").desc(), F.col("line").asc())
        .limit(top_k)
    )


def q_boilerplate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return boilerplate_report(T._load_documents(spark, sf_dir))


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T.with_token_count(T._load_documents(spark, sf_dir))
    return pack_sequences(docs)


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(T._load_documents(spark, sf_dir))


def q_top_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_quality_fraction(T._load_documents(spark, sf_dir))


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    return select_token_budget(T._load_documents(spark, sf_dir))


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return line_dedup(
        T._load_documents(spark, sf_dir), line_tokens=LINE_DEDUP_WINDOW
    )


def q_pack_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monolingual packing: packs never mix languages."""
    docs = T.with_token_count(T._load_documents(spark, sf_dir))
    return pack_sequences(docs, group_cols=("lang",))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    content_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Dataset-versioning delta: classify every key across two corpus
    snapshots as ``added`` / ``removed`` / ``changed`` / ``unchanged``.
    Returns the row-level frame ``(key, status)``; aggregate with
    :func:`snapshot_diff_report` for the release-notes summary.

    Scale: both sides reduce to ``(key, sha2-256 digest)`` scan-side —
    32 bytes per row crosses the FULL OUTER JOIN shuffle regardless of
    document size, and snapshots partitioned/bucketed on the key
    co-locate so the join is shuffle-free on a real deployment. Content
    equality is digest equality (change detection, not diff content),
    which is also what makes the report incremental-friendly: a stored
    digest column amortizes across runs. NULL content hashes as the
    empty string (concat_ws), so NULL vs '' compare equal — acceptable
    for change DETECTION, documented here.
    """
    digest = F.sha2(F.concat_ws("\x1f", *content_cols), 256)
    o = old.select(F.col(key_col).alias("k"), digest.alias("oh"))
    n = new.select(F.col(key_col).alias("k"), digest.alias("nh"))
    status = (
        F.when(F.col("oh").isNull(), F.lit("added"))
        .when(F.col("nh").isNull(), F.lit("removed"))
        .when(F.col("oh") != F.col("nh"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return o.join(n, "k", "full_outer").select(
        F.col("k").alias(key_col), status.alias("status"))


def snapshot_diff_report(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    content_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Per-status counts of :func:`snapshot_diff` — the one-line answer
    to "what changed between corpus v1 and v2"."""
    return (
        snapshot_diff(old, new, key_col, content_cols)
        .groupBy("status").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )


def corpus_card(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-source dataset card — the documentation table a curated
    corpus release ships (docs / tokens / quality / language mix /
    duplicate rate per provenance bucket). One aggregation composes
    the quality and language scorers (scan-side column expressions)
    with an exact-dup count via sha2 digests:
    ``(source, n_docs, total_tokens, avg_quality, n_english, n_dupes)``
    where ``n_dupes`` counts rows beyond the first per content hash
    WITHIN the group.

    Scale: one shuffle on the group key; per-group COUNT(DISTINCT
    digest) rides the same Expand Spark uses for mixed distinct
    aggregates — with few provenance buckets the reduce side is tiny.
    ``avg_quality`` accumulates in DECIMAL then rounds half-up (the
    bit-portability discipline every unordered rounded mean follows).
    """
    from pyspark.sql import types as PT

    scored = T.with_quality_and_lang(docs)
    dec = F.col("quality_score").cast(
        PT.DecimalType(38, agg_decimal_scale(6)))
    return (
        scored.select(
            F.col(group_col), "n_tokens", "quality_score", "lang_pred",
            F.sha2(F.col("text"), 256).alias("__h"), dec.alias("__q"),
        )
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            round_half_up(
                F.sum("__q").cast("double") / F.count(F.lit(1)), 6)
             .alias("avg_quality"),
            F.count(F.when(F.col("lang_pred") == "en", 1))
             .alias("n_english"),
            (F.count(F.lit(1)) - F.count_distinct(F.col("__h")))
             .alias("n_dupes"),
        )
        .orderBy(group_col)
    )


def q_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_card(T._load_documents(spark, sf_dir))


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic synthetic snapshots of the documents table
    (the driver corpus has no version history, so divergence is
    synthesized — the same modular-split discipline as the dedup
    entries): v1 drops doc_id % 3 == 0, v2 drops doc_id % 5 == 0 and
    rewrites text for doc_id % 7 == 0. Every status class is
    populated. The oracle classifies by RAW text equality — an
    independent implementation of the same predicate (digest equality
    ≡ content equality)."""
    docs = T._load_documents(spark, sf_dir).select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")),
    )
    return snapshot_diff_report(old, new)


_SNAPSHOT_DIFF_SQL = """
    WITH v1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
    v2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END
                   AS text
        FROM documents WHERE doc_id % 5 <> 0
    ),
    j AS (
        SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.text <> n.text THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM v1 o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id
    )
    SELECT status, COUNT(*) AS n FROM j GROUP BY status ORDER BY status
"""


def entry_queries() -> dict[str, Callable]:
    return {
        "pipeline_clean_corpus": q_clean_corpus,
        "pipeline_curation_funnel": q_curation_funnel,
        "pipeline_boilerplate_report": q_boilerplate_report,
        "pipeline_pack_sequences": q_pack_sequences,
        "pipeline_chunk_documents": q_chunk_documents,
        "pipeline_top_quality": q_top_quality,
        "pipeline_token_budget": q_token_budget,
        "pipeline_line_dedup": q_line_dedup,
        "pipeline_pack_grouped": q_pack_grouped,
        "pipeline_snapshot_diff": q_snapshot_diff,
        "pipeline_corpus_card": q_corpus_card,
    }


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
    langs_sql = ", ".join(f"'{x}'" for x in KEEP_LANGS)
    funnel = f"""
        WITH q AS ({quality}),
        l AS ({lang}),
        flags AS (
            SELECT d.doc_id, q.n_tokens,
                   (q.quality_score >= {QUALITY_MIN}) AS qok,
                   (q.quality_score >= {QUALITY_MIN}
                    AND l.lang_pred IN ({langs_sql})) AS lok,
                   sha256(d.text) AS h
            FROM documents d
            JOIN q ON d.doc_id = q.doc_id
            JOIN l ON d.doc_id = l.doc_id
        ),
        keep AS (
            SELECT *,
                   (lok AND doc_id = MIN(CASE WHEN lok THEN doc_id END)
                        OVER (PARTITION BY h)) AS kept
            FROM flags
        )
        SELECT COUNT(*) AS n_input,
               COUNT(CASE WHEN qok THEN 1 END) AS n_quality_pass,
               COUNT(CASE WHEN lok THEN 1 END) AS n_lang_pass,
               COUNT(CASE WHEN kept THEN 1 END) AS n_kept,
               CAST(SUM(n_tokens) AS BIGINT) AS tokens_in,
               CAST(SUM(CASE WHEN kept THEN n_tokens END) AS BIGINT)
                   AS tokens_kept
        FROM keep
    """
    toks = T._sql_tokens()
    pack = f"""
        WITH counted AS (
            SELECT doc_id, len({toks}) AS n_tokens,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 1000000 % {PACK_SHARDS} AS shard
            FROM documents
        ),
        cum AS (
            SELECT doc_id, shard, n_tokens,
                   SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens AS pre
            FROM counted
        )
        SELECT doc_id, shard,
               CAST(pre // {PACK_BUDGET} AS INTEGER) AS pack_id,
               CAST(pre % {PACK_BUDGET} AS INTEGER) AS pack_offset
        FROM cum
    """
    chunk = f"""
        WITH toked AS (
            SELECT doc_id, {toks} AS toks FROM documents
        ),
        nz AS (
            SELECT doc_id, toks, len(toks) AS n FROM toked WHERE len(toks) > 0
        ),
        ex AS (
            SELECT doc_id, toks,
                   unnest(range(CAST(ceil(n / {CHUNK_STRIDE}.0) AS BIGINT)))
                       AS cid
            FROM nz
        )
        SELECT doc_id, CAST(cid AS INTEGER) AS chunk_id,
               CAST(len(toks[cid * {CHUNK_STRIDE} + 1 :
                          cid * {CHUNK_STRIDE} + {CHUNK_SIZE}]) AS INTEGER)
                   AS n_chunk_tokens,
               array_to_string(
                   toks[cid * {CHUNK_STRIDE} + 1 :
                        cid * {CHUNK_STRIDE} + {CHUNK_SIZE}], ' ')
                   AS chunk_text
        FROM ex
    """
    top_quality = f"""
        WITH q AS ({quality}),
        scored AS (
            SELECT d.doc_id, d.lang, {_rs('q.quality_score', 6)} AS qs
            FROM documents d JOIN q ON d.doc_id = q.doc_id
        ),
        cut AS (
            SELECT lang, quantile_cont(qs, {1.0 - TOP_QUALITY_KEEP_FRAC})
                       AS c,
                   COUNT(*) AS n_group
            FROM scored GROUP BY lang
        )
        SELECT s.doc_id, s.lang, s.qs AS quality_score, cut.n_group
        FROM scored s JOIN cut USING (lang)
        WHERE s.qs >= cut.c
    """
    token_budget = f"""
        WITH q AS ({quality}),
        scored AS (
            SELECT doc_id, {_rs('quality_score', 6)} AS quality_score,
                   n_tokens
            FROM q
        ),
        c AS (
            SELECT doc_id, quality_score, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       ORDER BY quality_score DESC, doc_id ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM scored
        )
        SELECT doc_id, quality_score, n_tokens, cum_tokens
        FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
    """
    k = LINE_DEDUP_WINDOW
    line_dd = f"""
        WITH toked AS (SELECT doc_id, {toks} AS tk FROM documents),
        lines AS (
            SELECT doc_id, u.idx AS idx, u.line AS line FROM (
                SELECT doc_id, unnest(list_transform(
                    range(CAST(ceil(len(tk) / {k}.0) AS BIGINT)),
                    i -> struct_pack(
                        idx := CAST(i AS INTEGER),
                        line := array_to_string(
                            tk[i * {k} + 1 : i * {k} + {k}], ' ')))) AS u
                FROM toked WHERE len(tk) > 0
            )
        ),
        removal AS (
            SELECT md5(line) AS h FROM lines
            GROUP BY md5(line)
            HAVING COUNT(DISTINCT doc_id) > {LINE_DEDUP_MAX_DF}
        ),
        flagged AS (
            SELECT l.doc_id, l.idx, l.line, r.h IS NULL AS keep
            FROM lines l LEFT JOIN removal r ON md5(l.line) = r.h
        )
        SELECT doc_id,
               COALESCE(string_agg(CASE WHEN keep THEN line END, ' '
                        ORDER BY idx), '') AS clean_text,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_lines_kept,
               CAST(SUM(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_lines_removed
        FROM flagged GROUP BY doc_id
    """
    pack_grouped = f"""
        WITH counted AS (
            SELECT doc_id, lang, len({toks}) AS n_tokens,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 1000000 % {PACK_SHARDS} AS shard
            FROM documents
        ),
        cum AS (
            SELECT doc_id, lang, shard, n_tokens,
                   SUM(n_tokens) OVER (PARTITION BY lang, shard
                       ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens AS pre
            FROM counted
        )
        SELECT doc_id, lang, shard,
               CAST(pre // {PACK_BUDGET} AS INTEGER) AS pack_id,
               CAST(pre % {PACK_BUDGET} AS INTEGER) AS pack_offset
        FROM cum
    """
    boiler = f"""
        WITH toked AS (
            SELECT doc_id, {toks} AS t FROM documents
        ),
        lines AS (
            SELECT doc_id,
                   array_to_string(t[u.i * 3 + 1 : u.i * 3 + 3], ' ')
                       AS line
            FROM (SELECT doc_id, t,
                         unnest(list_transform(
                             range(CAST(ceil(len(t) / 3.0) AS BIGINT)),
                             i -> struct_pack(i := i))) AS u
                  FROM toked WHERE len(t) >= 1)
        )
        SELECT line, COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(*) AS n_occurrences
        FROM lines GROUP BY line
        HAVING COUNT(DISTINCT doc_id) >= 2
        ORDER BY n_docs DESC, line ASC
        LIMIT 50
    """
    return {"pipeline_clean_corpus": sql,
            "pipeline_curation_funnel": funnel,
            "pipeline_boilerplate_report": boiler,
            "pipeline_pack_sequences": pack,
            "pipeline_chunk_documents": chunk,
            "pipeline_top_quality": top_quality,
            "pipeline_token_budget": token_budget,
            "pipeline_line_dedup": line_dd,
            "pipeline_pack_grouped": pack_grouped,
            "pipeline_snapshot_diff": _SNAPSHOT_DIFF_SQL,
            "pipeline_corpus_card": f"""
        WITH q AS ({quality}),
        l AS ({lang}),
        j AS (
            SELECT d.source, q.n_tokens, q.quality_score, l.lang_pred,
                   sha256(d.text) AS h
            FROM documents d
            JOIN q ON d.doc_id = q.doc_id
            JOIN l ON d.doc_id = l.doc_id
        )
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               {_rs('''CAST(SUM(CAST(quality_score AS DECIMAL(38, 12)))
                          AS DOUBLE) / COUNT(*)''', 6)} AS avg_quality,
               COUNT(CASE WHEN lang_pred = 'en' THEN 1 END) AS n_english,
               COUNT(*) - COUNT(DISTINCT h) AS n_dupes
        FROM j GROUP BY source ORDER BY source
    """}
