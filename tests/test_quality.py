"""Trained quality classifier (operators/quality.py): separation on a
planted curated-vs-noise corpus (UNSEEN texts, not the training seed),
the gate shape, and the JVM-side scoring plan (broadcast weight table,
no Python UDFs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from query_planner_optimizer_spark.operators import quality as Q

# Unseen planted docs drawn from the same DISTRIBUTIONS as the seed
# classes — generalization, not memorization.
PLANTED_GOOD = [
    "the new bridge opened after two years of construction and the "
    "first buses crossed it during the morning commute",
    "researchers measured the lake temperature every week and noticed "
    "a steady decline through the autumn months",
    "the bakery on the corner sells fresh bread in the morning and "
    "the line often reaches the end of the street",
    "after months of practice the choir performed the full program "
    "without the conductor once opening the score",
]
PLANTED_NOISE = [
    "win win win now now now free free free cash cash cash win now",
    "qqq www eee rrr ttt qqq www eee rrr ttt qqq www eee rrr ttt",
    "<td><tr><td><tr><td><tr></td></tr></td></tr></td></tr> <td><tr>",
    "5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5 5",
]


@pytest.fixture(scope="module")
def planted(spark):
    rows = [(i, t) for i, t in enumerate(PLANTED_GOOD)] + [
        (100 + i, t) for i, t in enumerate(PLANTED_NOISE)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_separation_on_unseen_planted_corpus(spark, planted):
    scored = {r["doc_id"]: r["score"]
              for r in Q.quality_classifier_scores(planted).collect()}
    good = [scored[i] for i in range(len(PLANTED_GOOD))]
    noise = [scored[100 + i] for i in range(len(PLANTED_NOISE))]
    # every curated doc outscores every noise doc, with a real margin
    assert min(good) > max(noise) + 0.2, (good, noise)
    assert min(good) > 0.5 > max(noise)


def test_training_separates_its_own_seed(spark):
    m = Q.default_quality_model()
    rows = [(i, t) for i, t in enumerate(Q.SEED_POSITIVE)] + [
        (100 + i, t) for i, t in enumerate(Q.SEED_NEGATIVE)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scored = {r["doc_id"]: r["score"]
              for r in Q.quality_classifier_scores(df, m).collect()}
    pos = [scored[i] for i in range(len(Q.SEED_POSITIVE))]
    neg = [scored[100 + i] for i in range(len(Q.SEED_NEGATIVE))]
    assert min(pos) > 0.5 > max(neg)


def test_quality_gate_keeps_curated_rows(spark, planted):
    kept = Q.quality_gate(planted, threshold=0.5)
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert ids == list(range(len(PLANTED_GOOD)))
    # gate returns the ORIGINAL rows (schema preserved)
    assert kept.columns == planted.columns


def test_zero_token_doc_scores_sigmoid_bias(spark):
    import math

    df = spark.createDataFrame([(1, ""), (2, "   ")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            Q.quality_classifier_scores(df).collect()}
    b = float(Q.default_quality_model().bias)
    want = math.floor((1.0 / (1.0 + math.exp(-b))) * 1e6 + 0.5) / 1e6
    for r in rows.values():
        assert r["n_tokens"] == 0
        assert r["score"] == pytest.approx(want, abs=0)


def test_scoring_plan_is_jvm_side_and_map_only(spark, planted):
    # r15 optimization: the dot product is an in-row array aggregate
    # over the literal weight array — no join, no aggregation, no
    # Exchange anywhere in the plan (and still no Python).
    scored = Q.quality_classifier_scores(planted)
    scored.collect()
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan           # map-only scoring pass
    assert "BatchEvalPython" not in plan    # no row-at-a-time Python
    assert "ArrowEvalPython" not in plan    # no pandas UDF either


def test_map_only_scores_equal_explode_join_reference(spark, planted):
    """The optimized in-row aggregate must reproduce the pre-r15
    explode → broadcast-join → groupBy formulation bit for bit (both
    sum exact decimals; order cannot matter)."""
    from decimal import Decimal

    from query_planner_optimizer_spark.functions.rounding import (
        round_half_up,
    )
    from query_planner_optimizer_spark.functions.textexpr import tokens
    from query_planner_optimizer_spark.operators.dedup import (
        portable_hash60,
    )

    model = Q.default_quality_model()
    w_rows = [(fid, Decimal(w)) for fid, w in enumerate(model.weights)]
    w_df = spark.createDataFrame(w_rows, "fid long, w decimal(20,9)")
    base = planted.select(
        F.col("doc_id"), tokens(F.col("text")).alias("__toks")
    ).select("doc_id", F.size("__toks").alias("n_tokens"), "__toks")
    occ = (
        base.select("doc_id", F.explode("__toks").alias("tok"))
        .withColumn("fid", portable_hash60(F.col("tok")) % F.lit(model.dim))
        .join(F.broadcast(w_df), "fid")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w").cast("decimal(38, 12)")).alias("ws"))
    )
    z = F.lit(float(model.bias)) + (
        F.coalesce(F.col("ws"), F.lit(0)).cast("double")
        / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
    )
    ref = {
        r["doc_id"]: (r["n_tokens"], r["score"])
        for r in base.select("doc_id", "n_tokens")
        .join(occ, "doc_id", "left")
        .select(
            "doc_id", "n_tokens",
            round_half_up(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
        ).collect()
    }
    got = {r["doc_id"]: (r["n_tokens"], r["score"])
           for r in Q.quality_classifier_scores(planted).collect()}
    assert got == ref


def test_model_is_deterministic_and_quantized(spark):
    m1 = Q.train_quality_classifier(
        [(t, 1) for t in Q.SEED_POSITIVE]
        + [(t, 0) for t in Q.SEED_NEGATIVE])
    m2 = Q.default_quality_model()
    assert m1.weights == m2.weights and m1.bias == m2.bias
    assert all(len(w.split(".")[1]) == 9 for w in m1.weights)


def test_train_accepts_labeled_dataframe(spark):
    rows = [(t, 1) for t in Q.SEED_POSITIVE] + [
        (t, 0) for t in Q.SEED_NEGATIVE]
    df = spark.createDataFrame(rows, "text string, label int")
    m_df = Q.train_quality_classifier(df)
    m_list = Q.default_quality_model()
    # same seed -> identical quantized model regardless of input shape
    assert m_df.weights == m_list.weights and m_df.bias == m_list.bias
    # corpus-sized "seeds" fail loudly instead of collecting
    import pytest as _pytest

    big = spark.range(Q.MAX_SEED_ROWS + 1).selectExpr(
        "CAST(id AS STRING) AS text", "CAST(id % 2 AS INT) AS label")
    with _pytest.raises(ValueError, match="MAX_SEED_ROWS"):
        Q.train_quality_classifier(big)
