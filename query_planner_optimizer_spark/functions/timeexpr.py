"""Timestamp helpers that behave identically for TIMESTAMP and
TIMESTAMP_NTZ columns.

Parquet written with ``isAdjustedToUTC=false`` (pandas/pyarrow default)
arrives in Spark 4 as TIMESTAMP_NTZ, and several built-ins that look
type-agnostic (``unix_micros``/``unix_millis``) accept only TIMESTAMP.
Every engine session is pinned to UTC (``Catalog.__init__``), so casting
NTZ → TIMESTAMP interprets the naive wall-clock as UTC — exactly how the
DuckDB oracle's ``epoch_us(naive_ts)`` treats the same value. The cast
is an identity (elided by Catalyst) when the column is already TIMESTAMP.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_micros(col: str | Column) -> Column:
    """``unix_micros`` that also accepts TIMESTAMP_NTZ columns."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
