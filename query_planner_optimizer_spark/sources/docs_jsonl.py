"""JSON-lines source for document corpora.

The reference ingests CSV events (``prepare_optimized.py:424-434``);
training-data pipelines overwhelmingly ship documents as JSONL — one
JSON object per line, splittable, append-friendly. This source mirrors
the CSV source's discipline (``events_csv.py``): an EXPLICIT schema
(never inference — a schema-inference pass reads the whole dataset
twice and can silently widen types between runs) plus production-grade
corrupt-record handling.

Scale: ``spark.read.json`` with an explicit schema is a distributed
splittable scan like CSV (one task per split). JSONL's per-row parse
cost is higher than columnar parquet — the intended flow is
JSONL (landing) → parquet (curated) via :func:`jsonl_to_parquet`, after
which every downstream query gets parquet pruning/pushdown for free.

Corrupt records: PERMISSIVE mode routes unparseable lines into
``_corrupt_record`` instead of failing the job (at 100 TB a single bad
line must not kill a multi-hour ingest). :func:`read_docs_jsonl`
returns clean rows; :func:`corrupt_docs_jsonl` returns the quarantined
lines so ingest jobs can count/alert on them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: documents-table schema (TESTDATA.md) + corrupt-record capture column.
DOCS_JSONL_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
    T.StructField("_corrupt_record", T.StringType()),
])

_READ_OPTS = {
    "mode": "PERMISSIVE",
    "columnNameOfCorruptRecord": "_corrupt_record",
}


def _read_raw(spark: SparkSession, path: str) -> DataFrame:
    reader = spark.read.schema(DOCS_JSONL_SCHEMA)
    for k, v in _READ_OPTS.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_docs_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Clean document rows from a JSONL file/dir/glob.

    Rows whose line failed to parse (``_corrupt_record`` set) are
    excluded; a missing field inside a VALID json object is an ordinary
    NULL, not corruption."""
    raw = _read_raw(spark, path)
    return raw.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )


def corrupt_docs_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """The quarantine side: raw lines that failed to parse.

    Spark refuses a query that references ONLY the corrupt-record
    column of a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    documented workaround is to materialize the parsed frame first, so
    the quarantine path caches. Quarantines are tiny relative to the
    corpus (or the ingest has bigger problems), so the cache is cheap;
    an ingest job that wants both sides shares one cached parse."""
    raw = _read_raw(spark, path).cache()
    return raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("line")
    )


def jsonl_to_parquet(
    spark: SparkSession, jsonl_path: str, parquet_path: str
) -> int:
    """Landing → curated: parse JSONL once, write zstd parquet. Returns
    the number of clean rows written. One distributed job, no driver
    materialization."""
    from query_planner_optimizer_spark.catalog import (
        invalidate_reader_caches,
    )

    clean = read_docs_jsonl(spark, jsonl_path)
    clean.write.mode("overwrite").option("compression", "zstd").parquet(
        parquet_path
    )
    invalidate_reader_caches(parquet_path)
    return spark.read.parquet(parquet_path).count()
