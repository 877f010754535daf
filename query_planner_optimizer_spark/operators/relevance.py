"""Lexical relevance scoring over the ``documents`` table: TF-IDF and
BM25 — the retrieval/quality-weighting primitives of a training-data
pipeline (score documents against a topic term list, weight sampling by
relevance, build dedup-priority orders).

Plan shape (both scorers, identical skeleton):

1. tokenize map-side, explode, filter to the query terms **before** the
   shuffle — the exploded stream shrinks to |terms| rows per doc ceiling
   at the scan, so the groupBy shuffles a sliver of the corpus;
2. per-(doc, term) term frequencies: ONE partial→final aggregation;
3. per-term document frequencies: aggregation over the distinct
   (doc, term) pairs from step 2 — |terms| rows out, broadcast back;
4. corpus scalars (N, avgdl) via a single tiny aggregate, crossJoin'd
   as a broadcast literal row;
5. score = Σ_terms weight(tf, df, dl) — join tf↔idf (broadcast, the idf
   side has |terms| rows), groupBy doc, sum.

No UDFs anywhere — ln/division/multiplication are codegen'd JVM
expressions; the DuckDB oracle reproduces the math to the same 6dp.

Scoring returns ALL matching docs (score > 0) rather than a top-k so
the driver's order-insensitive hash compare never sits on a
float-ordering boundary; callers add ``.orderBy(...).limit(k)`` for
retrieval (TakeOrderedAndProject — no full sort at scale).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from query_planner_optimizer_spark.catalog import FrameMemo
from query_planner_optimizer_spark.functions.textexpr import tokens

BM25_K1 = 1.2
BM25_B = 0.75

#: Default topic terms for the driver entry — mid-frequency tokens of
#: the driver corpus (present at every sf).
DEFAULT_QUERY_TERMS = ("spark", "window", "customer", "stream")


#: One-tokenize frame memo (r10): keyed on the input frame's identity
#: (+ the scoring signature), anchor-identity-checked. Entries pass the
#: session-cached reader frame, so the persist below materializes once
#: per session. A catalog.FrameMemo — LRU-bounded (evictions
#: unpersist), cleared by invalidate_reader_caches.
_PRE_CACHE = FrameMemo()


def _matched_tokens(
    docs: DataFrame, terms: list[str], id_col: str, text_col: str
) -> DataFrame:
    """Narrow per-doc frame (doc_id, dl, __m = tokens ∩ terms) off ONE
    tokenization pass, persisted + memoized. Both consumers — the tf
    aggregation (explode __m) and BM25's corpus scalars (count/avg dl
    over EVERY doc; the array filter keeps zero-match rows) — derive
    from it, so the corpus is tokenized once per session instead of
    once per consumer per call (r10: the sf1 protocol showed bm25's
    engine time was 2× this tokenize cost; at 100 TB a second
    full-corpus tokenize pass is the whole bill). The persisted rows
    carry a handful of matched terms, never the full token arrays."""
    key = (id(docs), tuple(terms), id_col, text_col)
    hit = _PRE_CACHE.get(key, anchor=docs)
    if hit is not None:
        return hit
    tlit = F.array(*[F.lit(t) for t in terms])
    pre = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__toks")
    ).select(
        "doc_id",
        F.size("__toks").alias("dl"),
        F.filter("__toks", lambda t: F.array_contains(tlit, t)).alias("__m"),
    ).persist()
    return _PRE_CACHE.put(key, docs, pre)


def _eq_term(term: str):
    """Closure factory (never the default-arg idiom — see
    dedup._minhash_sig's arity note) for the per-term equality lambda."""
    return lambda t: t == F.lit(term)


def _per_term_tf(terms: list[str]) -> list:
    """In-row per-term term frequencies off the matched-token array:
    tf_i = |{tokens == terms[i]}| — one codegen'd array filter per
    term, no explode, no shuffle (r15 optimization: the former shape
    exploded (doc, term) rows and shuffled them for a partial→final
    COUNT; the array is already grouped by doc, so the count is a map
    expression — guide §2.3/§2.4)."""
    return [
        F.size(F.filter(F.col("__m"), _eq_term(t))).cast("long")
        .alias(f"__tf{i}")
        for i, t in enumerate(terms)
    ]


def _exact_decimal_sum(cols: list) -> "F.Column":
    """Fixed-order exact decimal sum: each operand is cast to
    DECIMAL(30,12) — double→decimal rounds at scale 12 exactly like the
    old per-row cast to (38,12) — and (30,12)+(30,12) = (31,12) is an
    EXACT addition (unlike (38,12)+(38,12), which Spark widens to
    (38,11), a rounding step), so chaining equals the former unordered
    DECIMAL(38,12) partial-agg SUM bit for bit."""
    acc = cols[0].cast("decimal(30,12)")
    for c in cols[1:]:
        acc = (acc + c.cast("decimal(30,12)")).cast("decimal(30,12)")
    return acc


def tfidf_scores(
    docs: DataFrame,
    terms: list[str] | tuple[str, ...] = DEFAULT_QUERY_TERMS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classic TF-IDF: score = Σ tf · ln(N / df). Returns
    (doc_id, n_matched_terms, score) for docs matching ≥1 term.

    r15 plan shape: per-term tfs are in-row array counts over the
    one-tokenize matched frame; N and the per-term dfs come from ONE
    single-row aggregate broadcast back onto the scan; the score is a
    fixed-order exact decimal sum — the whole scoring pass is a map
    over the persisted frame, where the former shape shuffled one row
    per (doc, term) and again per doc (2 corpus-keyed Exchanges
    removed; the only remaining exchange carries one row)."""
    terms = list(terms)
    pre = _matched_tokens(docs, terms, id_col, text_col)
    tfd = pre.select("doc_id", "dl", *_per_term_tf(terms))
    stats = pre.select(*_per_term_tf(terms)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
          for i in range(len(terms))],
    )
    scored = tfd.filter(
        sum(F.col(f"__tf{i}") for i in range(len(terms))) > 0
    ).crossJoin(F.broadcast(stats))
    contribs = [
        (F.col(f"__tf{i}")
         * F.log(F.col("n_docs").cast("double")
                 / F.col(f"__df{i}").cast("double")))
        for i in range(len(terms))
    ]
    matched = [
        F.when(F.col(f"__tf{i}") > 0, F.lit(1)).otherwise(F.lit(0))
        for i in range(len(terms))
    ]
    return scored.select(
        "doc_id",
        sum(matched).cast("long").alias("n_matched_terms"),
        F.round(_exact_decimal_sum(
            [F.when(F.col(f"__tf{i}") > 0, c).otherwise(F.lit(0.0))
             for i, c in enumerate(contribs)]), 6)
        .cast("double").alias("score"),
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str] | tuple[str, ...] = DEFAULT_QUERY_TERMS,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Okapi BM25 with the Lucene-style non-negative idf:
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)); score = Σ idf · tf·(k1+1) /
    (tf + k1·(1 - b + b·dl/avgdl)). Returns (doc_id, n_matched_terms,
    score).

    r15 plan shape (see :func:`tfidf_scores`): ONE single-row
    aggregate over the one-tokenize frame yields N, avgdl AND every
    per-term df together (zero-match docs count toward N/avgdl — the
    matched-array filter keeps their rows); scoring is then a map over
    the same frame with the one-row stats broadcast — the per-(doc,
    term) and per-doc corpus-keyed Exchanges of the former shape are
    gone. The avg over doubles runs over the same persisted partitions
    as before, so every bit of avgdl is unchanged."""
    terms = list(terms)
    pre = _matched_tokens(docs, terms, id_col, text_col)
    tfd = pre.select("doc_id", "dl", *_per_term_tf(terms))
    stats = pre.select("dl", *_per_term_tf(terms)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
        *[F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
          for i in range(len(terms))],
    )
    scored = tfd.filter(
        sum(F.col(f"__tf{i}") for i in range(len(terms))) > 0
    ).crossJoin(F.broadcast(stats))

    def _idf(i: int):
        return F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"__df{i}") + F.lit(0.5))
            / (F.col(f"__df{i}") + F.lit(0.5))
        )

    contribs = [
        (
            _idf(i)
            * (F.col(f"__tf{i}") * F.lit(k1 + 1.0))
            / (
                F.col(f"__tf{i}")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
                )
            )
        )
        for i in range(len(terms))
    ]
    matched = [
        F.when(F.col(f"__tf{i}") > 0, F.lit(1)).otherwise(F.lit(0))
        for i in range(len(terms))
    ]
    return scored.select(
        "doc_id",
        sum(matched).cast("long").alias("n_matched_terms"),
        F.round(_exact_decimal_sum(
            [F.when(F.col(f"__tf{i}") > 0, c).otherwise(F.lit(0.0))
             for i, c in enumerate(contribs)]), 6)
        .cast("double").alias("score"),
    )


# --------------------------------------------------------------------------
# Driver entries
# --------------------------------------------------------------------------

_SQL_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"


def _load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_planner_optimizer_spark.catalog import cached_parquet, spread

    return spread(cached_parquet(spark, f"{sf_dir}/documents.parquet"))


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_scores(_load_documents(spark, sf_dir))


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_scores(_load_documents(spark, sf_dir))


def entry_queries() -> dict[str, Callable]:
    return {
        "relevance_tfidf": q_tfidf,
        "relevance_bm25": q_bm25,
    }


def entry_oracles() -> dict[str, str]:
    term_list = ", ".join(f"'{t}'" for t in DEFAULT_QUERY_TERMS)
    base = f"""
        tok AS (
            SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM tok
            WHERE term IN ({term_list})
            GROUP BY doc_id, term
        ),
        dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        lens AS (SELECT doc_id, len({_SQL_TOKS}) AS dl FROM documents),
        stats AS (
            SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl
            FROM lens
        )
    """
    tfidf = f"""
        WITH {base}
        SELECT tf.doc_id, COUNT(*) AS n_matched_terms,
               CAST(ROUND(SUM(CAST(
                   tf.tf * ln(CAST(stats.n_docs AS DOUBLE) / dfreq.df)
               AS DECIMAL(38, 12))), 6) AS DOUBLE) AS score
        FROM tf JOIN dfreq USING (term), stats
        GROUP BY tf.doc_id
    """
    bm25 = f"""
        WITH {base}
        SELECT tf.doc_id, COUNT(*) AS n_matched_terms,
               CAST(ROUND(SUM(CAST(
                   ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                   * (tf.tf * {BM25_K1 + 1.0})
                   / (tf.tf + {BM25_K1} * ({1.0 - BM25_B}
                      + {BM25_B} * CAST(lens.dl AS DOUBLE) / stats.avgdl))
               AS DECIMAL(38, 12))), 6) AS DOUBLE) AS score
        FROM tf
        JOIN dfreq USING (term)
        JOIN lens ON tf.doc_id = lens.doc_id, stats
        GROUP BY tf.doc_id
    """
    return {"relevance_tfidf": tfidf, "relevance_bm25": bm25}
