"""Shared fixtures: one SparkSession per test session, a Catalog over the
driver's sf0.001 testdata, and a DuckDB connection with the same tables
registered as views (the differential-testing oracle, mirroring the
reference's engine-vs-DuckDB-baseline comparison scheme — SURVEY.md §5).
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from query_planner_optimizer_spark.session import get_spark

    s = get_spark(
        app_name="qpo-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def catalog(spark):
    from query_planner_optimizer_spark.catalog import Catalog

    cat = Catalog(spark, SF_DIR)
    cat.register_all()
    return cat


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def normalize(df: pd.DataFrame, float_dp: int = 6) -> pd.DataFrame:
    """Canonical form for order/representation-insensitive comparison:
    columns sorted by name, floats rounded, datetimes stringified, rows
    sorted by every column."""
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(float_dp)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def assert_matches_duckdb(spark_df, ddb_con, sql: str, ordered: bool = False):
    """Differential check: Spark result ≡ DuckDB oracle result."""
    got = spark_df.toPandas()
    want = ddb_con.execute(sql).fetchdf()
    assert set(got.columns) == set(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} duckdb={sorted(want.columns)}"
    )
    if ordered:
        # Preserve row order: compare positionally after column sort only.
        g = normalize(got.assign(__row=range(len(got))))
        w = normalize(want.assign(__row=range(len(want))))
        g = g.sort_values("__row").reset_index(drop=True)
        w = w.sort_values("__row").reset_index(drop=True)
    else:
        g, w = normalize(got), normalize(want)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=1e-6)
