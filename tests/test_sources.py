"""Source-format tests: JSONL documents landing (schema-explicit read,
corrupt-record quarantine, landing→curated parquet conversion)."""

from __future__ import annotations

import pandas as pd

from query_planner_optimizer_spark.sources import (
    corrupt_docs_jsonl,
    jsonl_to_parquet,
    read_docs_jsonl,
)

from .conftest import SF_DIR, normalize


def _write_docs_jsonl(spark, tmp_path) -> str:
    """Materialize the testdata documents as JSONL (the landing format)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    docs.write.mode("overwrite").json(out)
    return out

def test_jsonl_round_trip(spark, tmp_path):
    path = _write_docs_jsonl(spark, tmp_path)
    got = read_docs_jsonl(spark, path).toPandas()
    want = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    assert set(got.columns) == set(want.columns)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want), check_dtype=False
    )


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        'this is not json at all\n'
        '{"doc_id": 2, "text": "also ok"\n'  # truncated object
        '{"doc_id": 3, "text": "fine", "lang": "fr", "source": "s", "n_chars": 4}\n'
    )
    clean = read_docs_jsonl(spark, str(p)).toPandas()
    bad = corrupt_docs_jsonl(spark, str(p)).toPandas()
    assert sorted(clean["doc_id"]) == [1, 3]
    assert len(bad) == 2
    assert "not json" in bad["line"].str.cat()
    # a VALID object with a missing field is a NULL, not corruption
    p2 = tmp_path / "sparse.jsonl"
    p2.write_text('{"doc_id": 9, "text": "no lang field"}\n')
    sparse = read_docs_jsonl(spark, str(p2)).toPandas()
    assert len(sparse) == 1 and pd.isna(sparse["lang"].iloc[0])


def test_jsonl_to_parquet_curation(spark, tmp_path):
    path = _write_docs_jsonl(spark, tmp_path)
    out = str(tmp_path / "curated")
    n = jsonl_to_parquet(spark, path, out)
    orig = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert n == orig.count()
    got = spark.read.parquet(out).toPandas()
    pd.testing.assert_frame_equal(
        normalize(got), normalize(orig.toPandas()), check_dtype=False
    )


def test_orc_round_trip_matches_parquet(spark, tmp_path):
    """events parquet → ORC (zstd, partitioned) → read back: identical
    rows and, after the declared-schema cast, identical dtypes."""
    from query_planner_optimizer_spark.sources.orc_io import (
        read_orc,
        write_orc,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    path = str(tmp_path / "events_orc")
    write_orc(events, path, partition_by=("event_type",))
    back = read_orc(spark, path, schema=events.schema)
    # column order differs under partitionBy — realign
    back = back.select(*events.columns)
    assert [f.dataType for f in back.schema.fields] == \
        [f.dataType for f in events.schema.fields]
    a = normalize(events.toPandas())
    b = normalize(back.toPandas())
    pd.testing.assert_frame_equal(a, b)


def test_orc_scan_pushes_predicates(spark, tmp_path):
    """The ORC scan must show pushed filters + pruned read schema —
    same audit the parquet path gets."""
    from query_planner_optimizer_spark.sources.orc_io import (
        read_orc,
        write_orc,
    )
    from pyspark.sql import functions as F

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    path = str(tmp_path / "events_orc_flat")
    write_orc(events, path)
    df = read_orc(spark, path).filter(F.col("user_id") > 500).select(
        "event_id", "user_id"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "user_id" in plan.split(
        "PushedFilters:"
    )[1].split("]")[0]
    assert "struct<event_id:bigint,user_id:bigint>" in plan.replace(
        " ", ""
    ) or "ReadSchema" in plan
