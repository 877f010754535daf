"""Deterministic sampling and dataset splits by key hash.

Training pipelines need sampling that is (a) reproducible across runs
and engines — no RNG state, no partition-order dependence — and (b)
stable under data growth: a document's split assignment never changes
when other rows come or go. Both follow from hashing the KEY, not
rolling dice per row: bucket = first 8 hex digits of md5(key) mod B.

md5 is identical everywhere (unlike xxhash64/rand, which are
engine-specific), so these are oracle-checkable bit-for-bit, and a
sample drawn in Spark matches one drawn in DuckDB/pandas for the same
keys — which is exactly the property you want when a 100 TB corpus and
its 0.1% eval sample are processed by different systems.

Map-only: no shuffle, fuses into the scan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from query_planner_optimizer_spark.catalog import cached_parquet

#: Bucket space; fractions resolve to whole buckets (granularity 1e-6).
BUCKETS = 1_000_000


def hash_bucket(key: Column) -> Column:
    """Stable bucket in [0, BUCKETS): first 32 bits of md5(key)."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
    return h.cast("long") % BUCKETS


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep rows whose key hashes below ``fraction`` of bucket space."""
    return df.filter(hash_bucket(F.col(key_col)) < int(fraction * BUCKETS))


def split_by_hash(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a split label by key hash; fractions must sum to
    <= 1 (any remainder is labeled NULL, letting callers hold data out
    entirely). Assignment is per-key: all rows of one key land in the
    same split, and adding/removing other keys never reassigns it."""
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = hash_bucket(F.col(key_col))
    expr = None
    lo = 0
    for name, frac in splits.items():
        hi = lo + int(frac * BUCKETS)
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn(split_col, expr)


def k_per_group_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Exactly min(k, group size) rows per group, chosen by ascending
    key hash — a deterministic, engine-portable "reservoir": the hash
    order is a fixed random-looking permutation, so the selection is
    uniform-ish, reproducible, and stable for the keys it keeps (a key
    in the sample stays in the sample until k smaller-hash keys enter
    its group).

    One window per group ordered by (bucket, key) — the tiebreak makes
    the cut total. Group cardinality here is the data's (lang, source,
    day...), typically large enough to spread; for tiny-cardinality
    giant groups the threshold pattern (see docpipe.top_quality_fraction)
    is the fallback.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key_col)).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ``fractions[stratum]``
    of each stratum's keys (``default_fraction`` for unlisted strata).

    The balance-the-corpus move in training-data prep: downsample
    over-represented languages/sources while keeping the rare ones —
    with the same reproducibility contract as :func:`hash_sample`
    (per-key hash thresholds, no RNG, stable under data growth, and the
    per-stratum sample is a SUBSET of any larger-fraction sample of the
    same stratum). Map-only: the threshold lookup is a literal CASE
    chain on the stratum column, fused into the scan."""
    bucket = hash_bucket(F.col(key_col))
    thresh = None
    for name, frac in fractions.items():
        cutoff = F.lit(int(frac * BUCKETS))
        cond = F.col(strata_col) == name
        thresh = (
            F.when(cond, cutoff) if thresh is None else thresh.when(cond, cutoff)
        )
    thresh = (
        thresh.otherwise(F.lit(int(default_fraction * BUCKETS)))
        if thresh is not None
        else F.lit(int(default_fraction * BUCKETS))
    )
    return df.filter(bucket < thresh)


def mixture_sample(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    key_col: str,
    default_weight: float = 1.0,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Source-weighted corpus mixing WITH oversampling — the standard
    LLM-pretraining mixture move: weight 2.5 emits every key of that
    source twice (epochs 0 and 1) plus a deterministic 50% sample as
    epoch 2; weight 0.4 emits a 40% sample at epoch 0. The emitted
    ``epoch_col`` (0-based copy index) lets downstream shuffles and
    packing decorrelate repeats instead of emitting adjacent clones.

    Same reproducibility contract as :func:`hash_sample`, with the hash
    ROTATED per epoch (md5 of ``key:epoch``) so the fractional epoch's
    subset is independent of the epoch-0 subset of a different weight —
    growing a source's weight only ever ADDS copies, it never reshuffles
    the ones already emitted.

    Plan shape: a literal CASE chain for the weight, one generator
    (explode of a 0..ceil(w)-1 sequence) and a scan-side filter — no
    shuffle, no driver participation; output size is exactly
    sum_s(w_s · |s|) rows regardless of cluster size.
    """
    import math

    def _case(mapping: dict[str, int], default: int) -> Column:
        expr: Column | None = None
        for name, v in mapping.items():
            cond = F.col(source_col) == name
            expr = (
                F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
            )
        return (
            expr.otherwise(F.lit(default)) if expr is not None else F.lit(default)
        )

    # Integer plan constants computed HERE, not in SQL float arithmetic:
    # Spark truncates double→long while DuckDB rounds, so (w-⌊w⌋)·B must
    # never be evaluated engine-side.
    full_n = {s: int(math.floor(w)) for s, w in weights.items()}
    epochs_n = {s: int(math.ceil(w)) for s, w in weights.items()}
    frac_thr = {
        s: int(round((w - math.floor(w)) * BUCKETS)) for s, w in weights.items()
    }
    d_full = int(math.floor(default_weight))
    d_epochs = int(math.ceil(default_weight))
    d_thr = int(round((default_weight - math.floor(default_weight)) * BUCKETS))

    n_epochs = _case(epochs_n, d_epochs)
    # explode(NULL) emits nothing, so weight-0 sources drop cleanly.
    seq = F.when(n_epochs >= 1, F.sequence(F.lit(0), n_epochs - 1))
    out = df.withColumn(epoch_col, F.explode(seq))
    epoch = F.col(epoch_col)
    full = epoch < _case(full_n, d_full)
    frac_bucket = hash_bucket(
        F.concat(F.col(key_col).cast("string"), F.lit(":"), epoch.cast("string"))
    )
    frac_keep = frac_bucket < _case(frac_thr, d_thr)
    return out.filter(full | frac_keep)


def temperature_mixture(
    df: DataFrame,
    source_col: str,
    key_col: str,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Temperature-based source rebalancing at α = 0.5 — the standard
    multilingual/multi-source move (sample p_s^α renormalized, so rare
    sources up-weight and dominant ones down-weight) with weights
    DERIVED FROM THE DATA: ``w_s = N · √n_s / Σ_t √n_t / n_s`` (the
    α = 0.5 emission weight that preserves total corpus size in
    expectation). Sources are emitted :func:`mixture_sample`-style:
    ⌈w⌉ epoch copies, the last kept by a per-epoch rotated hash.

    α is fixed at 0.5 deliberately: IEEE-754 ``sqrt`` is CORRECTLY
    ROUNDED in every engine (unlike ``pow``/``ln``, which differ in the
    last ulp across libm builds), so the engine and the SQL oracle
    compute bit-identical weights. The fractional-part test compares
    ``bucket < (w − ⌊w⌋)·B`` directly — a comparison of identical
    doubles, no rounding step to disagree on.

    Plan: one tiny per-source count aggregation joined back (broadcast
    — sources number in the dozens), then the same generator + scan-
    side filter as mixture_sample. No driver-side weight computation:
    the weights live in the plan, so the op re-derives them correctly
    when the corpus changes.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    tot = counts.agg(
        F.sum("__n").alias("__tot_n"),
        F.sum(F.sqrt(F.col("__n").cast("double"))).alias("__tot_s"),
    )
    weights = counts.crossJoin(F.broadcast(tot)).select(
        source_col,
        (
            F.col("__tot_n").cast("double")
            * F.sqrt(F.col("__n").cast("double"))
            / F.col("__tot_s") / F.col("__n").cast("double")
        ).alias("__w"),
    )
    out = df.join(F.broadcast(weights), source_col)
    n_epochs = F.ceil(F.col("__w")).cast("int")
    seq = F.when(n_epochs >= 1, F.sequence(F.lit(0), n_epochs - 1))
    out = out.withColumn(epoch_col, F.explode(seq))
    epoch = F.col(epoch_col)
    full = epoch.cast("double") < F.floor(F.col("__w"))
    frac_bucket = hash_bucket(
        F.concat(F.col(key_col).cast("string"), F.lit(":"),
                 epoch.cast("string"))
    )
    frac_keep = (
        frac_bucket.cast("double")
        < (F.col("__w") - F.floor(F.col("__w"))) * F.lit(float(BUCKETS))
    )
    return out.filter(full | frac_keep).drop("__w")


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 0,
    epoch: int = 0,
) -> DataFrame:
    """Deterministic global-shuffle coordinates for training-data
    ordering: ``shard`` (which output shard a row lands in) and
    ``shuffle_key`` (its position driver within the shard), both from
    ``md5(seed:epoch:key)`` — a different, reproducible permutation per
    epoch with no RNG state and no partition-order dependence (same
    contract as :func:`hash_sample`, rotated like
    :func:`mixture_sample`'s epochs).

    This op is map-only; the actual reorder is
    ``repartition(n_shards, "shard").sortWithinPartitions("shuffle_key")``
    — ONE shuffle whose reduce side is shard-parallel, never a global
    single-task sort. ``shuffle_key`` uses md5 hex chars 9-23 (60 bits,
    fits BIGINT in every engine); collisions tie-break on the key at
    sort time.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    h = F.md5(F.concat_ws(
        ":", F.lit(str(seed)), F.lit(str(epoch)),
        F.col(key_col).cast("string"),
    ))
    shard = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    sort_key = F.conv(F.substring(h, 9, 15), 16, 10).cast("long")
    return (df.withColumn("shard", shard)
            .withColumn("shuffle_key", sort_key))


# --------------------------------------------------------------------------
# Driver entries
# --------------------------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cached_parquet(spark, f"{sf_dir}/documents.parquet")


def q_sample_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hash_sample(_docs(spark, sf_dir), "doc_id", 0.10).select(
        "doc_id", "lang", "n_chars"
    )


def q_split_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_by_hash(_docs(spark, sf_dir), "doc_id").select(
        "doc_id", "split"
    )


#: Corpus-balancing fractions for the driver entry: keep 20% of the
#: over-represented English stratum, 60% of everything else.
STRATA_FRACTIONS = {"en": 0.20}
STRATA_DEFAULT = 0.60


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample(
        _docs(spark, sf_dir), "lang", STRATA_FRACTIONS, "doc_id",
        default_fraction=STRATA_DEFAULT,
    ).select("doc_id", "lang", "n_chars")


def q_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return k_per_group_sample(
        _docs(spark, sf_dir), "lang", "doc_id", k=20
    ).select("doc_id", "lang")


#: Mixture weights for the driver entry: oversample src0 (2.5 epochs)
#: and src1 (2 full epochs), downsample src2 to 40%, pass the rest.
MIXTURE_WEIGHTS = {"src0": 2.5, "src1": 2.0, "src2": 0.4}


def q_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_sample(
        _docs(spark, sf_dir), "source", MIXTURE_WEIGHTS, "doc_id"
    ).select("doc_id", "source", "epoch")


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temperature_mixture(
        _docs(spark, sf_dir), "source", "doc_id"
    ).select("doc_id", "source", F.col("epoch").cast("int").alias("epoch"))


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    parts = [
        epoch_shuffle(docs, "doc_id", 8, seed=42, epoch=ep)
        .withColumn("epoch", F.lit(ep).cast("int"))
        for ep in (0, 1)
    ]
    out = parts[0].unionByName(parts[1])
    w = Window.partitionBy("epoch", "shard").orderBy("shuffle_key", "doc_id")
    return out.select(
        "doc_id", "epoch", "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


def entry_queries() -> dict[str, Callable]:
    return {
        "sample_hash_10pct": q_sample_10pct,
        "sample_split_assignments": q_split_assignments,
        "sample_stratified_by_lang": q_stratified_sample,
        "sample_k_per_group": q_k_per_group,
        "sample_mixture_weights": q_mixture,
        "sample_epoch_shuffle": q_epoch_shuffle,
        "sample_temperature_mixture": q_temperature_mixture,
    }


_BUCKET_SQL = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) "
    f"% {BUCKETS}"
)


def entry_oracles() -> dict[str, str]:
    sample = f"""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE {_BUCKET_SQL} < {int(0.10 * BUCKETS)}
    """
    split = f"""
        SELECT doc_id,
               CASE WHEN b < {int(0.8 * BUCKETS)} THEN 'train'
                    WHEN b < {int(0.9 * BUCKETS)} THEN 'val'
                    WHEN b < {BUCKETS} THEN 'test'
               END AS split
        FROM (SELECT doc_id, {_BUCKET_SQL} AS b FROM documents)
    """
    stratified = f"""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE {_BUCKET_SQL} <
              CASE WHEN lang = 'en' THEN {int(0.20 * BUCKETS)}
                   ELSE {int(0.60 * BUCKETS)} END
    """
    k_per_group = f"""
        SELECT doc_id, lang FROM (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang
                       ORDER BY {_BUCKET_SQL}, doc_id) AS rn
            FROM documents
        ) WHERE rn <= 20
    """
    import math

    w_cases = " ".join(
        f"WHEN '{s}' THEN {int(math.ceil(w))}"
        for s, w in MIXTURE_WEIGHTS.items()
    )
    full_cases = " ".join(
        f"WHEN '{s}' THEN {int(math.floor(w))}"
        for s, w in MIXTURE_WEIGHTS.items()
    )
    thr_cases = " ".join(
        f"WHEN '{s}' THEN {int(round((w - math.floor(w)) * BUCKETS))}"
        for s, w in MIXTURE_WEIGHTS.items()
    )
    epoch_bucket = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || "
        f"CAST(epoch AS VARCHAR)), 1, 8)) AS BIGINT) % {BUCKETS}"
    )
    mixture = f"""
        SELECT doc_id, source, CAST(epoch AS INTEGER) AS epoch
        FROM documents
        JOIN (SELECT unnest(generate_series(0,
              {max(int(math.ceil(w)) for w in MIXTURE_WEIGHTS.values()) - 1}))
              AS epoch) e
          ON epoch < (CASE source {w_cases} ELSE 1 END)
        WHERE epoch < (CASE source {full_cases} ELSE 1 END)
           OR {epoch_bucket} < (CASE source {thr_cases} ELSE 0 END)
    """
    epoch_hash = ("md5('42:' || CAST(epoch AS VARCHAR) || ':' || "
                  "CAST(doc_id AS VARCHAR))")
    shuffle = f"""
        SELECT doc_id, CAST(epoch AS INTEGER) AS epoch,
               CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % 8 AS shard,
               row_number() OVER (
                   PARTITION BY epoch,
                       CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % 8
                   ORDER BY CAST(('0x' || substr(hx, 9, 15)) AS BIGINT),
                            doc_id) AS pos
        FROM (SELECT doc_id, epoch, {epoch_hash} AS hx
              FROM documents
              JOIN (SELECT unnest(generate_series(0, 1)) AS epoch) e
                ON TRUE)
    """
    temp_bucket = ("CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' "
                   "|| CAST(epoch AS VARCHAR)), 1, 8)) AS BIGINT) "
                   f"% {BUCKETS}")
    temperature = f"""
        WITH counts AS (
            SELECT source, COUNT(*) AS n FROM documents GROUP BY source
        ),
        tot AS (
            SELECT CAST(SUM(n) AS DOUBLE) AS nn,
                   SUM(sqrt(CAST(n AS DOUBLE))) AS s
            FROM counts
        ),
        w AS (
            SELECT source,
                   nn * sqrt(CAST(n AS DOUBLE)) / s / CAST(n AS DOUBLE)
                       AS w
            FROM counts CROSS JOIN tot
        ),
        maxep AS (
            SELECT CAST(MAX(ceil(w)) AS BIGINT) AS m FROM w
        )
        SELECT d.doc_id, d.source, CAST(e.epoch AS INTEGER) AS epoch
        FROM documents d
        JOIN w ON d.source = w.source
        JOIN (SELECT unnest(generate_series(0, (SELECT m - 1 FROM maxep)))
              AS epoch) e
          ON e.epoch < CAST(ceil(w.w) AS BIGINT)
        WHERE CAST(e.epoch AS DOUBLE) < floor(w.w)
           OR CAST({temp_bucket} AS DOUBLE) < (w.w - floor(w.w)) * {BUCKETS}.0
    """
    return {"sample_hash_10pct": sample, "sample_split_assignments": split,
            "sample_stratified_by_lang": stratified,
            "sample_k_per_group": k_per_group,
            "sample_mixture_weights": mixture,
            "sample_epoch_shuffle": shuffle,
            "sample_temperature_mixture": temperature}
