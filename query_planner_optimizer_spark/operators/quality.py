"""Trained quality-classifier scoring: a logistic model over hashed
token features, scored corpus-wide as a broadcast-weights JVM
expression — the standard "classifier gate" step of a training-data
curation pipeline (score every document against a curated seed;
keep/weight by score), complementing the HEURISTIC gates in text.py
(with_quality_score, readability, bigram LM). (No reference analog —
the reference engine, `claude.md:92-143`, has no text surface;
additive, like the rest of the text family.)

Design:

- **Features**: the hashing trick — token → ``portable_hash60 % dim``
  (dedup.py's engine-portable md5 family, so the driver oracle can
  replay feature extraction in SQL), features = mean token weight
  (count-weighted, normalized by document length so scores don't
  saturate with length).
- **Training is driver-side, scoring is cluster-side** — the standard
  split: the labeled seed is small by definition (curated examples),
  so full-batch logistic GD over a dense (n_seed × dim) numpy matrix
  is exact, deterministic (zero init, fixed iters/lr, no shuffling,
  no randomness), and instant; the 100-TB-side work is the SCORING
  pass, which is tokenize → hash → in-row dot product against the
  ``dim`` LITERAL weights (element_at over the token array) → sigmoid
  — all codegen'd JVM expressions, no Python anywhere in the hot path
  and (r15) no join/aggregation/Exchange either.
- **Determinism discipline** (the DECIMAL-partials contract): trained
  weights are quantized to 9 decimal places and summed as
  DECIMAL(38,12) — the per-document dot product is exact and
  order-independent in both engines; the single double division
  (by dl), the double additions, and exp() are replayed verbatim by
  the oracle SQL.

Scale shape (r15 optimization round): ONE corpus pass, zero shuffles —
scoring fuses into the scan as a map-only projection (the pre-r15
shape exploded one row per token and shuffled them for a per-doc
partial→final SUM; with the weights as literals the whole dot product
happens before any exchange, per guide §2.3 "aggregate before you
shuffle" taken to its limit). Scoring cost is token-proportional,
independent of model training.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Callable
from functools import lru_cache

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from query_planner_optimizer_spark.functions.rounding import (
    round_half_up,
    sql_round_half_up,
)
from query_planner_optimizer_spark.functions.textexpr import tokens
from query_planner_optimizer_spark.operators.dedup import portable_hash60

#: Feature dimensionality of the hashing trick. 256 keeps the broadcast
#: weight table (and the oracle's inline VALUES list) tiny while giving
#: the seed vocabulary ~1 expected collision per 2 features.
QUALITY_DIM = 256

#: Curated seed: POSITIVE = clean prose, NEGATIVE = the degenerate
#: shapes a crawl actually contains (repetition, keyboard mash, markup
#: soup, delimiter/number spam). Deliberately corpus-independent
#: literals so the trained weights are a pure function of this module.
SEED_POSITIVE = (
    "the committee reviewed the proposal and agreed that the revised "
    "budget would support the new research program through next year",
    "she walked along the river in the early morning while the city "
    "was still quiet and the light was soft on the water",
    "engineers tested the updated design under heavy load and found "
    "that the system remained stable for the entire week",
    "the report describes how local farmers adapted their planting "
    "schedules in response to the changing rainfall patterns",
    "after the lecture the students discussed the main argument and "
    "compared it with the readings from the previous seminar",
    "the museum opened a new exhibition about the history of printing "
    "and the visitors could operate a working replica press",
    "his latest novel follows three generations of a family as they "
    "move between the coast and the capital in search of work",
    "the study found that patients who followed the program reported "
    "better sleep and fewer symptoms after twelve weeks",
    "volunteers cleared the trail over the weekend and installed new "
    "signs so that hikers can find the summit route more easily",
    "the council voted to extend the library hours and to fund a "
    "small reading room in the northern district",
    "when the storm passed the crew inspected the hull and repaired "
    "two panels before continuing the voyage south",
    "the recipe calls for slow cooking the onions until they are "
    "golden and then adding the stock one ladle at a time",
)
SEED_NEGATIVE = (
    "buy buy buy buy buy buy buy buy buy buy buy buy buy buy buy buy",
    "asdf qwer zxcv asdf qwer zxcv asdf qwer zxcv asdf qwer zxcv",
    "click here click here click here click here click here click",
    "<div><span><b></b></span></div> <div><span><b></b></span></div>",
    "aaaa bbbb aaaa bbbb aaaa bbbb aaaa bbbb aaaa bbbb aaaa bbbb",
    "!!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) ___ +++ === ~~~ |||",
    "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12 x13 x14 x15 x16 x17",
    "free free free win win win now now now cash cash cash prize",
    "lorem7 ipsum9 dolor3 sit8 amet2 lorem7 ipsum9 dolor3 sit8 amet2",
    "http://a.b/c http://a.b/c http://a.b/c http://a.b/c http://a.b/c",
    "0 1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6 7 8 9",
    "zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz",
)


def _py_tokens(text: str) -> list[str]:
    """Python twin of functions.textexpr.tokens (lowercase, split on
    whitespace, drop empties) — used only on the tiny labeled seed."""
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _py_fid(token: str, dim: int) -> int:
    """Python twin of ``portable_hash60(token) % dim``."""
    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16) % dim


def _feature_vector(text: str, dim: int) -> np.ndarray:
    toks = _py_tokens(text)
    x = np.zeros(dim)
    for t in toks:
        x[_py_fid(t, dim)] += 1.0
    if toks:
        x /= len(toks)  # mean token weight — matches the scoring expr
    return x


class QualityModel:
    """(weights quantized to 9dp as strings, bias as a 9dp string) —
    the exchange format both the Spark scorer and the SQL oracle
    consume, so the dot product is bit-identical on both sides."""

    def __init__(self, weights: list[str], bias: str, dim: int):
        self.weights = weights
        self.bias = bias
        self.dim = dim


#: Loud bound on the labeled-seed collect in
#: :func:`train_quality_classifier`: curated seeds are small by
#: definition; a "labeled frame" of corpus size is a usage error, not
#: a training set — fail instead of silently materializing it.
MAX_SEED_ROWS = 100_000


def train_quality_classifier(
    labeled: "list[tuple[str, int]] | DataFrame",
    dim: int = QUALITY_DIM,
    iters: int = 300,
    lr: float = 2.0,
    l2: float = 1e-3,
    text_col: str = "text",
    label_col: str = "label",
) -> QualityModel:
    """Full-batch logistic regression on the labeled seed — either
    ``[(text, label), ...]`` or a small labeled DataFrame with
    (``text_col``, ``label_col``) columns (collected driver-side:
    bounded by :data:`MAX_SEED_ROWS`, raising loudly above it — a
    curated seed is small by definition; see module docstring).
    Deterministic (zero init, fixed schedule, no sampling, rows
    ordered before training when a frame is passed). Returns the
    9dp-quantized model."""
    if isinstance(labeled, DataFrame):
        n = labeled.count()
        if n > MAX_SEED_ROWS:
            raise ValueError(
                f"labeled seed has {n} rows > MAX_SEED_ROWS="
                f"{MAX_SEED_ROWS}; training is driver-side by design — "
                f"curate a smaller seed or raise the bound explicitly"
            )
        # Bounded collect (≤ MAX_SEED_ROWS curated rows); sort for a
        # partition-order-independent, reproducible gradient sequence.
        labeled = [
            (r[text_col], int(r[label_col]))
            for r in labeled.select(text_col, label_col)
            .orderBy(text_col, label_col).collect()
        ]
    X = np.stack([_feature_vector(t, dim) for t, _ in labeled])
    y = np.array([float(lab) for _, lab in labeled])
    w = np.zeros(dim)
    b = 0.0
    n = len(labeled)
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = X.T @ (p - y) / n + l2 * w
        w -= lr * g
        b -= lr * float(np.mean(p - y))
    return QualityModel(
        weights=[f"{v:.9f}" for v in w], bias=f"{b:.9f}", dim=dim)


@lru_cache(maxsize=1)
def default_quality_model() -> QualityModel:
    labeled = [(t, 1) for t in SEED_POSITIVE] + [
        (t, 0) for t in SEED_NEGATIVE]
    return train_quality_classifier(labeled)


def quality_classifier_scores(
    docs: DataFrame,
    model: QualityModel | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, score): score = sigmoid(bias + (Σ_tokens
    w[fid(token)]) / max(n_tokens, 1)) — every arithmetic step JVM-side:
    tokenize → hash → broadcast join on the ``dim``-row weight table →
    exact DECIMAL(38,12) partial-agg sum → one double division +
    sigmoid. Zero-token documents score sigmoid(bias)."""
    model = model or default_quality_model()
    # MAP-ONLY scoring (optimization r15, guide §2.3/§2.4): the weight
    # table is ``dim`` KNOWN literals, and the per-doc token array is
    # already grouped — so the dot product is an in-row array aggregate
    # over a literal weight array (element_at by fid), not an
    # explode → broadcast join → groupBy → re-join. That removes every
    # Exchange from the plan (the former shape shuffled one row per
    # token for the partial→final SUM and re-joined per doc). The sum
    # stays exact DECIMAL(38,12): decimal addition is associative and
    # exact, so the fixed array order equals the old unordered
    # partial-agg sum bit for bit — the oracle SQL is unchanged.
    w_arr = F.array(*[
        F.lit(w).cast("decimal(20,9)") for w in model.weights
    ])
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("__toks"),
    ).select("doc_id", F.size("__toks").alias("n_tokens"), "__toks")
    ws = F.aggregate(
        F.transform(
            F.col("__toks"),
            lambda t: F.element_at(
                w_arr,
                (portable_hash60(t) % F.lit(model.dim)).cast("int")
                + F.lit(1),
            ),
        ),
        F.lit("0").cast("decimal(30,12)"),
        # Accumulate at (30,12), NOT (38,12): Spark's addition rule
        # turns (38,12)+(38,12) into (38,11) — a ROUNDING step —
        # whereas (30,12)+(30,12) = (31,12) is exact, and the cast
        # back to (30,12) is exact for these magnitudes (|ws| ≪ 10^18).
        # Every accumulated value therefore equals the old unordered
        # DECIMAL(38,12) partial-agg sum bit for bit.
        lambda acc, x: (acc + x.cast("decimal(30,12)"))
        .cast("decimal(30,12)"),
    )
    bias = float(model.bias)
    z = F.lit(bias) + (
        F.coalesce(F.col("ws"), F.lit(0)).cast("double")
        / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
    )
    return (
        base.withColumn("ws", ws)
        .select(
            "doc_id",
            "n_tokens",
            # shared FLOOR formula, not native ROUND(double) — the r8
            # boundary-exactness contract (functions/rounding.py)
            round_half_up(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
        )
    )


def quality_gate(
    docs: DataFrame,
    threshold: float = 0.5,
    model: QualityModel | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep-set shape: the input rows whose classifier score clears the
    threshold — the curation-pipeline consumer of the scorer."""
    scores = quality_classifier_scores(docs, model, id_col, text_col)
    keep = scores.filter(F.col("score") >= F.lit(threshold)).select("doc_id")
    return docs.join(
        keep.withColumnRenamed("doc_id", id_col), id_col, "left_semi")


# --------------------------------------------------------------------------
# Driver entry: score the documents table with the default seed model.
# The oracle replays the EXACT pipeline in SQL — md5 feature hashing,
# the inline 9dp weight table, the DECIMAL dot product, the same
# division/sigmoid/rounding — weights come from the same in-process
# trained model on both sides.
# --------------------------------------------------------------------------

_SQL_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_planner_optimizer_spark.operators.relevance import (
        _load_documents,
    )

    return quality_classifier_scores(_load_documents(spark, sf_dir))


def entry_queries() -> dict[str, Callable]:
    return {"text_quality_classifier": q_quality_classifier}


def entry_oracles() -> dict[str, str]:
    m = default_quality_model()
    values = ", ".join(
        f"({fid}, CAST({w} AS DECIMAL(20,9)))"
        for fid, w in enumerate(m.weights)
    )
    sql = f"""
        WITH w(fid, w) AS (VALUES {values}),
        base AS (
            SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
        ),
        occ AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)
                       % {m.dim} AS fid
            FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
        ),
        sums AS (
            SELECT occ.doc_id,
                   SUM(CAST(w.w AS DECIMAL(38,12))) AS ws
            FROM occ JOIN w USING (fid)
            GROUP BY occ.doc_id
        ),
        lens AS (SELECT doc_id, len(toks) AS n_tokens FROM base)
        SELECT lens.doc_id, lens.n_tokens,
               {sql_round_half_up(
                   "CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-("
                   f"CAST({m.bias} AS DOUBLE)"
                   " + CAST(COALESCE(sums.ws, 0) AS DOUBLE)"
                   " / CAST(GREATEST(lens.n_tokens, 1) AS DOUBLE))))",
                   6)} AS score
        FROM lens LEFT JOIN sums ON lens.doc_id = sums.doc_id
    """
    return {"text_quality_classifier": sql}
