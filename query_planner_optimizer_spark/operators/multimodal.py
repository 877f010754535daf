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


#: Fixed fake frame stride: frame i = payload[i*FRAME_SIZE:(i+1)*FRAME_SIZE];
#: frame count = n_bytes // FRAME_SIZE + 1 (consistent with _fake_frames).
FRAME_SIZE = 100

FRAME_SCHEMA = "media_id bigint, kind string, frame_idx int, frame_bytes binary"

RESIZED_SCHEMA = (
    "media_id bigint, kind string, frame_idx int, frame_n_bytes int, "
    "frame_sha256 string, width int, height int, resized_n_bytes int, "
    "resized_sha256 string"
)


def sample_frames(
    media: DataFrame, every_n: int = 2, frame_size: int = FRAME_SIZE
) -> DataFrame:
    """Frame sampling: one output row per ``every_n``-th frame — the
    per-row fan-out stage of a video pipeline, expressed as mapInPandas
    yielding multiple rows per input row (no explode of a materialized
    frame array; frames are cut lazily inside the batch, so executor
    memory holds one Arrow batch of payloads plus its sampled frames).

    A real decoder would seek keyframes; the STUB cuts fixed
    ``frame_size``-byte windows (deterministic, oracle-reproducible).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {
                "media_id": [], "kind": [], "frame_idx": [], "frame_bytes": []
            }
            for mid, kind, payload in zip(
                batch["media_id"], batch["kind"], batch["payload"]
            ):
                data = bytes(payload)
                n_frames = len(data) // frame_size + 1
                for fi in range(0, n_frames, every_n):
                    out["media_id"].append(mid)
                    out["kind"].append(kind)
                    out["frame_idx"].append(fi)
                    out["frame_bytes"].append(
                        data[fi * frame_size:(fi + 1) * frame_size]
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_frames(
    frames: DataFrame, width: int = 16, height: int = 16
) -> DataFrame:
    """Resize stage over sampled frames. A real implementation would
    decode + interpolate pixels; the STUB "resizes" by truncating the
    frame to width*height bytes (deterministic). Emits digests + sizes
    instead of raw bytes so downstream compares are engine-portable.
    """
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            fb = batch["frame_bytes"].map(bytes)
            rb = fb.map(lambda b: b[:target])
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "kind": batch["kind"],
                    "frame_idx": batch["frame_idx"].astype("int32"),
                    "frame_n_bytes": fb.map(len).astype("int32"),
                    "frame_sha256": fb.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "width": pd.Series([width] * len(batch)).astype("int32"),
                    "height": pd.Series([height] * len(batch)).astype("int32"),
                    "resized_n_bytes": rb.map(len).astype("int32"),
                    "resized_sha256": rb.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                }
            )

    return frames.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_resize_frames(
    media: DataFrame,
    every_n: int = 2,
    frame_size: int = FRAME_SIZE,
    width: int = 16,
    height: int = 16,
) -> DataFrame:
    """Fused sample+resize: both stages in ONE ``mapInPandas`` pass.

    Chaining :func:`sample_frames` → :func:`resize_frames` is the
    composable form, but Spark cannot fuse adjacent Python stages — the
    sampled ``frame_bytes`` (the pipeline's largest intermediate, ~the
    whole corpus) would cross the Arrow↔Python boundary twice and pay a
    second worker round-trip. Here frames are cut and resized inside the
    same batch loop, so payloads enter Python once and only digests +
    sizes come back. Identical output to the chained form (asserted in
    tests); at 100 TB this halves the Python-transfer volume of the
    dominant stage.
    """
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {
                "media_id": [], "kind": [], "frame_idx": [],
                "frame_n_bytes": [], "frame_sha256": [],
                "resized_n_bytes": [], "resized_sha256": [],
            }
            for mid, kind, payload in zip(
                batch["media_id"], batch["kind"], batch["payload"]
            ):
                data = bytes(payload)
                n_frames = len(data) // frame_size + 1
                for fi in range(0, n_frames, every_n):
                    fb = data[fi * frame_size:(fi + 1) * frame_size]
                    rb = fb[:target]
                    out["media_id"].append(mid)
                    out["kind"].append(kind)
                    out["frame_idx"].append(fi)
                    out["frame_n_bytes"].append(len(fb))
                    out["frame_sha256"].append(
                        hashlib.sha256(fb).hexdigest()
                    )
                    out["resized_n_bytes"].append(len(rb))
                    out["resized_sha256"].append(
                        hashlib.sha256(rb).hexdigest()
                    )
            df = pd.DataFrame(out)
            df["frame_idx"] = df["frame_idx"].astype("int32")
            df["frame_n_bytes"] = df["frame_n_bytes"].astype("int32")
            df["width"] = pd.Series([width] * len(df)).astype("int32")
            df["height"] = pd.Series([height] * len(df)).astype("int32")
            df["resized_n_bytes"] = df["resized_n_bytes"].astype("int32")
            yield df[
                [
                    "media_id", "kind", "frame_idx", "frame_n_bytes",
                    "frame_sha256", "width", "height", "resized_n_bytes",
                    "resized_sha256",
                ]
            ]

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


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


def q_frame_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_planner_optimizer_spark.catalog import spread

    docs = spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    media = to_media_table(docs, "doc_id", F.encode(F.col("text"), "UTF-8"), "text")
    return sample_resize_frames(media)


def entry_queries():
    return {
        "multimodal_features": q_media_features,
        "multimodal_frame_pipeline": q_frame_pipeline,
    }


def entry_oracles() -> dict[str, str]:
    sql = f"""
        SELECT doc_id AS media_id, 'text' AS kind,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS sha256,
               CAST(octet_length(encode(text)) // 100 + 1 AS INTEGER) AS n_frames,
               TRUE AS feature_ok
        FROM documents
    """
    # Valid because the driver corpus text is pure ASCII (byte slicing ==
    # char slicing; verified octet_length(encode(text)) == length(text)).
    frames = f"""
        WITH m AS (
            SELECT doc_id AS media_id, text,
                   octet_length(encode(text)) AS nb
            FROM documents
        ),
        f AS (
            SELECT media_id, 'text' AS kind,
                   CAST(unnest(range(0, nb // {FRAME_SIZE} + 1, 2)) AS INTEGER)
                       AS frame_idx,
                   text, nb
            FROM m
        ),
        cut AS (
            SELECT media_id, kind, frame_idx,
                   substr(text, frame_idx * {FRAME_SIZE} + 1, {FRAME_SIZE})
                       AS fb
            FROM f
        )
        SELECT media_id, kind, frame_idx,
               CAST(octet_length(encode(fb)) AS INTEGER) AS frame_n_bytes,
               sha256(fb) AS frame_sha256,
               CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
               CAST(octet_length(encode(substr(fb, 1, 256))) AS INTEGER)
                   AS resized_n_bytes,
               sha256(substr(fb, 1, 256)) AS resized_sha256
        FROM cut
    """
    return {"multimodal_features": sql, "multimodal_frame_pipeline": frames}
