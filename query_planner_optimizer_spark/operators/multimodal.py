"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct alongside (kind, n_bytes, content hash). The decode /
feature-extract steps run as Arrow-batched ``mapInPandas`` stages — the
Spark-side contract (schema, batch shape, partitioning) is real and
tested; the actual media decoding is STUBBED (no image/audio libs in
this container): :func:`decode_media` raises ``NotImplementedError``
and :func:`fake_decode_features` is the deterministic stand-in used by
tests and the driver entry.

Scale notes: payloads stay columnar Arrow end-to-end (no Python
row-at-a-time); ``mapInPandas`` streams record batches, so executor
memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
regardless of corpus size; feature extraction is map-only (no shuffle).
Frame-sampling/resize for video would add a per-row fan-out — expressed
as an iterator of multiple output batches per input batch, which
``mapInPandas`` supports natively.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Output schema of the feature-extraction stage.
FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, sha256 string, "
    "n_frames int, feature_ok boolean"
)


def to_media_table(
    df: DataFrame, id_col: str, payload_expr, kind: str
) -> DataFrame:
    """Wrap any source into the canonical media layout:
    (media_id, kind, payload binary, meta struct<n_bytes, sha256>)."""
    payload = payload_expr.cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def decode_media(kind: str, payload: bytes):  # pragma: no cover - stub
    """STUB: real image/audio/video decoding requires codec libraries
    not present in this container. The Spark plumbing around this stub
    (schema, Arrow batching, partitioning) is real and tested with
    :func:`fake_decode_features`."""
    raise NotImplementedError(
        f"decode_media({kind!r}): media codecs are not available in this "
        "environment; inject a decoder via extract_features(decoder=...)"
    )


def _fake_frames(n_bytes: int) -> int:
    """Deterministic stand-in for 'number of decoded frames'."""
    return int(n_bytes // 100) + 1


def fake_decode_features(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decoder: hashes + sizes + fake frame counts.
    Mirrors exactly what a real decoder stage would emit per batch."""
    payloads = batch["payload"]
    return pd.DataFrame(
        {
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "n_bytes": payloads.map(len).astype("int64"),
            "sha256": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
            "n_frames": payloads.map(lambda b: _fake_frames(len(b))).astype("int32"),
            "feature_ok": True,
        }
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[pd.DataFrame], pd.DataFrame] = fake_decode_features,
) -> DataFrame:
    """Arrow-batched feature extraction over the media table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield decoder(batch)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# Driver entry: documents.text encoded as binary payloads → features.
# Oracle-checkable because the fake decoder is deterministic arithmetic
# + hashes that DuckDB reproduces (octet_length / sha256 over the text).
# --------------------------------------------------------------------------

def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_planner_optimizer_spark.catalog import spread

    docs = spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    media = to_media_table(docs, "doc_id", F.encode(F.col("text"), "UTF-8"), "text")
    return extract_features(media)


def entry_queries():
    return {"multimodal_features": q_media_features}


def entry_oracles() -> dict[str, str]:
    sql = f"""
        SELECT doc_id AS media_id, 'text' AS kind,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS sha256,
               CAST(octet_length(encode(text)) // 100 + 1 AS INTEGER) AS n_frames,
               TRUE AS feature_ok
        FROM documents
    """
    return {"multimodal_features": sql}
