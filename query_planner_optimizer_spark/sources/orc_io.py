"""ORC source/sink — the columnar-interchange format Spark supports
natively alongside parquet (Hive-ecosystem pipelines hand data over as
ORC; a complete engine reads it without a conversion hop).

Same scan properties as the parquet path: splittable distributed reads,
predicate pushdown into ORC stripe/row-group statistics ("searchArgs"),
column pruning from the projected schema, and partitioned
(`partitionBy`) zstd-compressed writes. ``read_table`` normalizes the
one semantic wrinkle: parquet written with ``isAdjustedToUTC=false``
arrives as TIMESTAMP_NTZ in Spark 4 while ORC has no NTZ physical type,
so round-tripped timestamp columns come back as TIMESTAMP — with the
session pinned to UTC (``Catalog.__init__``) the wall-clock values are
identical, and we cast back to the declared schema so downstream code
sees one type regardless of the storage format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    compression: str = "zstd",
) -> None:
    """Distributed ORC sink (zstd, optionally hive-partitioned)."""
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Distributed ORC scan; when ``schema`` is given, timestamp-kind
    columns are cast to the declared type (ORC readback yields
    TIMESTAMP where parquet-NTZ pipelines declare TIMESTAMP_NTZ — an
    identity cast on the UTC-pinned session)."""
    df = spark.read.orc(path)
    if schema is not None:
        for field in schema.fields:
            if field.name in df.columns and (
                df.schema[field.name].dataType != field.dataType
            ):
                df = df.withColumn(
                    field.name, df[field.name].cast(field.dataType)
                )
    return df
