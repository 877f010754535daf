"""CSV source for the reference's raw ad-event files.

The reference declares this schema explicitly in every prepare script
(reference ``prepare_optimized.py:424-434``) and treats both ``""`` and
``"null"`` as NULL (reference ``prepare_optimized.py:54``). Spark's CSV
option ``nullValue`` handles one token; the empty string is null for
non-string types by default, and for string columns we normalize
``""``→NULL post-read so both engines agree.

Scale: ``spark.read.csv`` with an explicit schema does a distributed,
splittable scan (one task per ~128 MB split) — the entire
worker-pool/temp-dir machinery of the reference's prepare
(``prepare_optimized.py:31-97,347-397``) is subsumed by it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Reference raw schema (prepare_optimized.py:424-434, claude.md:56-68).
EVENTS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.LongType()),           # epoch millis
        T.StructField("type", T.StringType()),       # serve|impression|click|purchase
        T.StructField("auction_id", T.StringType()),
        T.StructField("advertiser_id", T.IntegerType()),
        T.StructField("publisher_id", T.IntegerType()),
        T.StructField("bid_price", T.DoubleType()),  # only on impressions
        T.StructField("user_id", T.LongType()),
        T.StructField("total_price", T.DoubleType()),  # only on purchases
        T.StructField("country", T.StringType()),
    ]
)

_STRING_COLS = ("type", "auction_id", "country")


def read_events_csv(
    spark: SparkSession, path: str, header: bool = True
) -> DataFrame:
    """Read raw event CSVs with the fixed schema and null conventions."""
    df = (
        spark.read.schema(EVENTS_CSV_SCHEMA)
        .option("header", str(header).lower())
        .option("nullValue", "null")
        .csv(path)
    )
    # ""→NULL for string columns (Spark keeps "" as empty string).
    for c in _STRING_COLS:
        df = df.withColumn(c, F.when(F.col(c) == "", None).otherwise(F.col(c)))
    return df
