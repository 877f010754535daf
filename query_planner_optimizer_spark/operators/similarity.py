"""Similarity search over the ``embeddings`` table (array<float> column).

- :func:`cosine_topk` — exact brute-force top-k: broadcast the query
  set, score every (query, candidate) pair with built-in array
  expressions (``zip_with`` dot product folded with ``aggregate`` —
  JVM-side, no Python), rank with a per-query window. The correctness
  baseline; cost O(|Q|·N·d).
- :func:`lsh_topk` — random-hyperplane LSH: sign-bit sketch over H
  fixed hyperplanes → candidates share a bucket (equi-join on bucket
  key, multi-probe over P tables) → exact rerank within candidates.
  The 100 TB path: the full corpus is scanned once to sketch, then
  scoring touches only bucket collisions.

Math is done in double on both engines (arrays cast element-wise), with
sequential left-to-right folds, so Spark and the DuckDB oracle
(``list_dot_product`` over ``DOUBLE[]``) agree bit-for-bit; outputs
round similarity to 6 dp.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from query_planner_optimizer_spark.functions.vector import as_double_array, dot

DEFAULT_K = 10
DEFAULT_NUM_QUERIES = 20
LSH_PLANES = 6
LSH_TABLES = 8


_as_double = as_double_array
_dot = dot


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn("_vec", v).withColumn("_norm", F.sqrt(_dot(v, v)))


def cosine_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = DEFAULT_K,
    num_queries: int = DEFAULT_NUM_QUERIES,
) -> DataFrame:
    """Exact cosine top-k neighbors for the first ``num_queries`` ids.

    Plan: the (tiny) query side is broadcast — the corpus is scanned
    exactly once with no shuffle of the corpus itself; ranking shuffles
    only |Q|·N scored (id, id, double) rows, and the per-query window
    is a partial top-k under AQE.
    """
    base = with_norm(df, vec_col).select(
        F.col(id_col).alias("nid"), "_vec", F.col("_norm").alias("n_norm")
    )
    qs = (
        with_norm(df, vec_col)
        .filter(F.col(id_col) < num_queries)
        .select(F.col(id_col).alias("qid"), F.col("_vec").alias("q_vec"),
                F.col("_norm").alias("q_norm"))
    )
    scored = (
        base.join(F.broadcast(qs), F.col("qid") != F.col("nid"))
        .withColumn("sim", _dot(F.col("q_vec"), F.col("_vec"))
                    / (F.col("q_norm") * F.col("n_norm")))
        .select("qid", "nid", "sim")
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", F.round("sim", 6).alias("sim"))
    )


def _hyperplanes(dim: int, planes: int, tables: int) -> list[list[list[float]]]:
    """Deterministic pseudo-random unit hyperplanes (pure-python LCG —
    reproducible across machines, no numpy state)."""
    state = 0x2545F4914F6CDD1D
    out = []

    def rnd() -> float:
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        # uniform in (-1, 1)
        return ((state >> 11) / float(1 << 53)) * 2.0 - 1.0

    for _ in range(tables):
        tbl = []
        for _ in range(planes):
            v = [rnd() for _ in range(dim)]
            norm = math.sqrt(sum(x * x for x in v)) or 1.0
            tbl.append([x / norm for x in v])
        out.append(tbl)
    return out


def lsh_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = DEFAULT_K,
    num_queries: int = DEFAULT_NUM_QUERIES,
    planes: int = LSH_PLANES,
    tables: int = LSH_TABLES,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Each vector gets ``tables`` bucket keys (one per hash table); a
    candidate is any corpus vector sharing a bucket with the query in
    any table. Exact cosine reranks candidates. Returns
    (qid, nid, rank, sim) like :func:`cosine_topk` (possibly fewer than
    k rows per query — recall < 1 is the accepted trade).
    """
    hp = _hyperplanes(dim, planes, tables)
    base = with_norm(df, vec_col)

    def bucket(table_idx: int) -> Column:
        bits = []
        for p_idx in range(planes):
            plane = F.array(*[F.lit(x) for x in hp[table_idx][p_idx]])
            bits.append(
                F.when(_dot(F.col("_vec"), plane) >= 0, F.lit(1)).otherwise(F.lit(0))
                * F.lit(1 << p_idx)
            )
        acc = bits[0]
        for b in bits[1:]:
            acc = acc + b
        return acc

    buckets = F.array(
        *[
            F.struct(F.lit(t).alias("tbl"), bucket(t).alias("bkt"))
            for t in range(tables)
        ]
    )
    sketched = base.select(
        F.col(id_col).alias("id"), "_vec", "_norm",
        F.explode(buckets).alias("b"),
    ).select("id", "_vec", "_norm",
             F.col("b.tbl").alias("tbl"), F.col("b.bkt").alias("bkt"))

    qs = sketched.filter(F.col("id") < num_queries).select(
        F.col("id").alias("qid"), F.col("_vec").alias("q_vec"),
        F.col("_norm").alias("q_norm"), "tbl", "bkt",
    )
    cand = (
        sketched.join(F.broadcast(qs), ["tbl", "bkt"])
        .filter(F.col("qid") != F.col("id"))
        .select("qid", "q_vec", "q_norm",
                F.col("id").alias("nid"), "_vec", "_norm")
        .dropDuplicates(["qid", "nid"])
    )
    scored = cand.withColumn(
        "sim", _dot(F.col("q_vec"), F.col("_vec")) / (F.col("q_norm") * F.col("_norm"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", F.round("sim", 6).alias("sim"))
    )


# --------------------------------------------------------------------------
# Driver entries
# --------------------------------------------------------------------------

def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_planner_optimizer_spark.catalog import spread

    # CPU-bound vector math: spread the (often single-file) local input
    # across cores before scoring.
    return spread(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(_emb(spark, sf_dir))


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_topk(_emb(spark, sf_dir))


def entry_queries() -> dict[str, Callable]:
    return {
        "sim_cosine_topk": q_cosine_topk,
        "sim_lsh_topk": q_lsh_topk,  # rows-only (approximate recall)
    }


def entry_oracles() -> dict[str, str]:
    cosine = f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
        scored AS (
            SELECT q.vec_id AS qid, c.vec_id AS nid,
                   list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS sim
            FROM n q JOIN n c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < {DEFAULT_NUM_QUERIES}
        )
        SELECT qid, nid, rank, ROUND(sim, 6) AS sim FROM (
            SELECT qid, nid, sim,
                   CAST(row_number() OVER (PARTITION BY qid
                        ORDER BY sim DESC, nid ASC) AS INTEGER) AS rank
            FROM scored
        ) WHERE rank <= {DEFAULT_K}
    """
    return {"sim_cosine_topk": cosine}
