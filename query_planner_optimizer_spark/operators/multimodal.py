"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct alongside (kind, n_bytes, content hash). The decode /
feature-extract steps run as Arrow-batched ``mapInPandas`` stages.

Decode status: IMAGES decode for real — Pillow when importable (full
format coverage), else a zero-dependency reference PNG decoder
(:func:`decode_png`: stdlib zlib inflate + all five scanline filters,
unit-tested against hand-built PNGs), with nearest-neighbor resize
(:func:`resize_nearest`). Audio/video decoding still requires codec
libraries absent from this container: :func:`decode_media` raises
``NotImplementedError`` for those kinds, and
:func:`fake_decode_features` remains the deterministic stand-in the
text-payload driver entries use (oracle-reproducible arithmetic).

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


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes):
    """Minimal REAL PNG decoder (stdlib zlib + numpy): 8-bit depth,
    color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA),
    non-interlaced; all five scanline filters (None/Sub/Up/Average/
    Paeth). Returns (width, height, channels, HxWxC uint8 array).

    This is the reference decode path that works with zero optional
    dependencies — deterministic, unit-tested against hand-built PNGs.
    Pillow (when importable) is the production path covering JPEG/WebP/
    interlaced/paletted inputs; see :func:`decode_media`.
    """
    import struct
    import zlib

    import numpy as np

    if not payload.startswith(PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(PNG_SIG)
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"reference decoder handles 8-bit non-interlaced PNGs only "
            f"(depth={bit_depth}, interlace={interlace}); install Pillow "
            f"for full coverage"
        )
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise NotImplementedError(
            f"unsupported color type {color_type}; install Pillow"
        )
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev).astype(np.uint8)
        else:  # Sub / Average / Paeth need sequential left-neighbor
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(cur[x - channels]) if x >= channels else 0
                up = int(prev[x])
                if ftype == 1:  # Sub
                    pred = left
                elif ftype == 3:  # Average
                    pred = (left + up) // 2
                elif ftype == 4:  # Paeth
                    ul = int(prev[x - channels]) if x >= channels else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (
                        up if pb <= pc else ul
                    )
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
                cur[x] = (int(line[x]) + pred) & 0xFF
        out[y] = cur
        prev = cur
    return width, height, channels, out.reshape(height, width, channels)


def resize_nearest(pixels, width: int, height: int):
    """Nearest-neighbor resize of an HxWxC uint8 array — pure numpy
    index arithmetic (floor sampling), deterministic across platforms."""
    import numpy as np

    h, w = pixels.shape[0], pixels.shape[1]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return pixels[ys][:, xs]


def decode_media(kind: str, payload: bytes):
    """Decode a media payload to (width, height, channels, pixel array).

    Images: Pillow when importable (full format coverage); otherwise the
    zero-dependency reference PNG decoder (:func:`decode_png`). Audio /
    video kinds still require codec libraries and raise
    ``NotImplementedError`` when absent."""
    if kind == "image":
        try:  # pragma: no cover - Pillow not in this container
            import io

            import numpy as np
            from PIL import Image

            img = Image.open(io.BytesIO(payload))
            arr = np.asarray(img.convert("RGBA" if "A" in img.getbands()
                                         else "RGB"))
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return img.width, img.height, arr.shape[2], arr
        except ImportError:
            if payload.startswith(PNG_SIG):
                return decode_png(payload)
            raise NotImplementedError(
                "decode_media('image'): only PNG decodes without Pillow; "
                "install Pillow for JPEG/WebP/..."
            ) from None
    raise NotImplementedError(
        f"decode_media({kind!r}) returns the IMAGE contract only; audio "
        "decodes via decode_wav/audio_decode_features and video metadata "
        "via parse_mp4/video_meta_features (zero-dependency paths), or "
        "inject a codec decoder via extract_features(decoder=...)"
    )


#: Output schema of the real image-decode stage.
IMAGE_FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, width int, height int, "
    "channels int, pixel_sha256 string, decode_ok boolean"
)


def image_decode_features(batch: pd.DataFrame) -> pd.DataFrame:
    """Arrow-batch image decoder for :func:`extract_features`
    (``schema=IMAGE_FEATURE_SCHEMA``): REAL decode via
    :func:`decode_media`, per-row error isolation (a corrupt payload
    sets decode_ok=false instead of failing the task — at corpus scale
    some inputs are always broken). The pixel sha256 is taken over the
    decoded array bytes, so any engine/codec divergence is visible."""
    rows: dict[str, list] = {
        "media_id": [], "kind": [], "n_bytes": [], "width": [],
        "height": [], "channels": [], "pixel_sha256": [], "decode_ok": [],
    }
    for mid, kind, payload in zip(
        batch["media_id"], batch["kind"], batch["payload"]
    ):
        data = bytes(payload)
        rows["media_id"].append(mid)
        rows["kind"].append(kind)
        rows["n_bytes"].append(len(data))
        try:
            w, h, ch, arr = decode_media(kind, data)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["channels"].append(ch)
            rows["pixel_sha256"].append(
                hashlib.sha256(arr.tobytes()).hexdigest()
            )
            rows["decode_ok"].append(True)
        except Exception:
            rows["width"].append(None)
            rows["height"].append(None)
            rows["channels"].append(None)
            rows["pixel_sha256"].append(None)
            rows["decode_ok"].append(False)
    out = pd.DataFrame(rows)
    out["n_bytes"] = out["n_bytes"].astype("int64")
    for c in ("width", "height", "channels"):
        out[c] = out[c].astype("Int32")
    return out


def build_wav(sample_rate: int, channels: int, bits: int,
              frames) -> bytes:
    """Assemble a RIFF/WAVE PCM payload from a frames array (n, ch) —
    the synthesis half of the WAV round-trip (tests and the audio
    entry build payloads with it; :func:`decode_wav` parses them)."""
    import struct

    import numpy as np

    arr = np.asarray(frames)
    if bits == 16:
        data = arr.astype("<i2").tobytes()
    elif bits == 8:
        data = (arr.astype(np.int16) + 128).astype("u1").tobytes()
    else:
        raise NotImplementedError(f"{bits}-bit WAV")
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """Minimal REAL WAV (RIFF PCM) decoder — stdlib struct + numpy,
    zero optional dependencies (the audio twin of :func:`decode_png`):
    walks the word-aligned chunk list, parses fmt, and decodes 8/16-bit
    PCM to an (n_frames, channels) int16 array. Returns
    (sample_rate, channels, bits, frames array)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        chunk = payload[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # RIFF chunks are word-aligned
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
        "<HHIIHH", fmt[:16])
    if audio_fmt != 1:
        raise NotImplementedError(f"non-PCM WAV (format {audio_fmt})")
    if channels < 1:
        raise ValueError("WAV with zero channels")
    if bits == 16:
        arr = np.frombuffer(data, "<i2").astype(np.int16)
    elif bits == 8:
        arr = np.frombuffer(data, "u1").astype(np.int16) - 128
    else:
        raise NotImplementedError(f"{bits}-bit WAV")
    n_frames = len(arr) // channels
    return rate, channels, bits, arr[:n_frames * channels].reshape(
        n_frames, channels)


def build_mp4(brand: bytes, timescale: int, duration: int,
              n_tracks: int, mdat: bytes = b"") -> bytes:
    """Assemble a minimal ISO-BMFF (MP4) container: ftyp + moov(mvhd +
    n empty trak boxes) + optional mdat — the synthesis half of the
    video round-trip (:func:`parse_mp4` walks it back)."""
    import struct

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    # mvhd version 0: ver/flags, ctime, mtime, timescale, duration, ...
    mvhd = box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, timescale,
                                    duration) + b"\x00" * 80)
    traks = b"".join(box(b"trak", b"") for _ in range(n_tracks))
    out = ftyp + box(b"moov", mvhd + traks)
    if mdat:
        out += box(b"mdat", mdat)
    return out


def parse_mp4(payload: bytes):
    """Minimal REAL ISO-BMFF (MP4/MOV) metadata parser — stdlib struct
    only (the video twin of :func:`decode_wav`): walks the top-level
    box list (32-bit and 64-bit largesize forms), descends into moov,
    reads mvhd's timescale/duration (version 0 and 1) and counts trak
    boxes. Returns (major_brand, timescale, duration, n_tracks,
    duration_us)."""
    import struct

    def walk(buf: bytes):
        pos = 0
        while pos + 8 <= len(buf):
            (size,) = struct.unpack(">I", buf[pos:pos + 4])
            btype = buf[pos + 4:pos + 8]
            body_off = 8
            if size == 1:  # 64-bit largesize
                (size,) = struct.unpack(">Q", buf[pos + 8:pos + 16])
                body_off = 16
            elif size == 0:  # box extends to end of buffer
                size = len(buf) - pos
            if size < body_off or pos + size > len(buf):
                raise ValueError("truncated MP4 box")
            yield btype, buf[pos + body_off:pos + size]
            pos += size

    brand = timescale = duration = None
    n_tracks = 0
    for btype, body in walk(payload):
        if btype == b"ftyp":
            brand = body[:4].decode("latin-1")
        elif btype == b"moov":
            for ib, ibody in walk(body):
                if ib == b"mvhd":
                    version = ibody[0]
                    if version == 1:
                        timescale, = struct.unpack(">I", ibody[20:24])
                        duration, = struct.unpack(">Q", ibody[24:32])
                    else:
                        _, _, timescale, duration = struct.unpack(
                            ">IIII", ibody[4:20])
                elif ib == b"trak":
                    n_tracks += 1
    if brand is None or timescale is None:
        raise ValueError("not an MP4 payload (missing ftyp/mvhd)")
    if timescale == 0:
        raise ValueError("MP4 with zero timescale")
    return brand, timescale, duration, n_tracks, \
        duration * 1_000_000 // timescale


#: Output schema of the video metadata stage.
VIDEO_META_SCHEMA = (
    "media_id bigint, n_bytes bigint, major_brand string, timescale int, "
    "duration bigint, n_tracks int, duration_us bigint, decode_ok boolean"
)


def video_meta_features(batch: pd.DataFrame) -> pd.DataFrame:
    """Arrow-batch MP4 metadata stage (``schema=VIDEO_META_SCHEMA``)
    with the family's per-row corrupt-payload isolation."""
    rows: dict[str, list] = {
        "media_id": [], "n_bytes": [], "major_brand": [], "timescale": [],
        "duration": [], "n_tracks": [], "duration_us": [], "decode_ok": [],
    }
    for mid, payload in zip(batch["media_id"], batch["payload"]):
        data = bytes(payload)
        rows["media_id"].append(mid)
        rows["n_bytes"].append(len(data))
        try:
            brand, ts, dur, nt, dur_us = parse_mp4(data)
            rows["major_brand"].append(brand)
            rows["timescale"].append(ts)
            rows["duration"].append(dur)
            rows["n_tracks"].append(nt)
            rows["duration_us"].append(dur_us)
            rows["decode_ok"].append(True)
        except Exception:
            for c in ("major_brand", "timescale", "duration", "n_tracks",
                      "duration_us"):
                rows[c].append(None)
            rows["decode_ok"].append(False)
    out = pd.DataFrame(rows)
    out["n_bytes"] = out["n_bytes"].astype("int64")
    for c in ("timescale", "n_tracks"):
        out[c] = out[c].astype("Int32")
    for c in ("duration", "duration_us"):
        out[c] = out[c].astype("Int64")
    return out


def build_jpeg(width: int, height: int, n_components: int,
               progressive: bool, comment: bytes = b"",
               entropy: bytes = b"") -> bytes:
    """Assemble a minimal JFIF/JPEG container: SOI + APP0(JFIF) +
    optional COM + SOF0/SOF2 frame header + SOS + entropy bytes + EOI —
    the synthesis half of the JPEG round-trip (:func:`parse_jpeg`
    walks it back). Completes the media triple's common image format
    next to PNG (decode), WAV, and MP4."""
    import struct

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, 2 + len(body)) + body

    app0 = seg(0xFFE0, b"JFIF\x00" + bytes([1, 1, 0]) +
               struct.pack(">HH", 72, 72) + bytes([0, 0]))
    out = b"\xff\xd8" + app0
    if comment:
        out += seg(0xFFFE, comment)
    comps = b"".join(bytes([cid + 1, 0x11, 0]) for cid in
                     range(n_components))
    sof_marker = 0xFFC2 if progressive else 0xFFC0
    out += seg(sof_marker, bytes([8]) + struct.pack(">HH", height, width)
               + bytes([n_components]) + comps)
    scan = b"".join(bytes([cid + 1, 0]) for cid in range(n_components))
    out += seg(0xFFDA, bytes([n_components]) + scan + bytes([0, 63, 0]))
    return out + entropy + b"\xff\xd9"


def parse_jpeg(payload: bytes):
    """Minimal REAL JPEG metadata parser — stdlib struct only (the
    image-container twin of :func:`parse_mp4`): walks the marker
    segment list (skipping fill bytes and standalone RST/TEM markers),
    reads the first SOF frame header (SOF0 baseline, SOF1 extended
    sequential, SOF2 progressive), and stops at SOS — entropy-coded
    data is never touched, so metadata extraction reads O(header)
    bytes regardless of image size. Returns
    (progressive, precision, width, height, n_components)."""
    import struct

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    sof_markers = {0xC0: False, 0xC1: False, 0xC2: True}
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            # standalone TEM/RSTn/EOI — no length field
            pos += 2
            if marker == 0xD9:
                break
            continue
        (ln,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        if ln < 2 or pos + 2 + ln > len(payload):
            raise ValueError("truncated JPEG segment")
        body = payload[pos + 4:pos + 2 + ln]
        if marker in sof_markers:
            if len(body) < 6:
                raise ValueError("truncated SOF header")
            precision = body[0]
            height, width = struct.unpack(">HH", body[1:5])
            n_components = body[5]
            if len(body) < 6 + 3 * n_components:
                raise ValueError("truncated SOF component list")
            if width == 0 or n_components == 0:
                raise ValueError("JPEG with zero width/components")
            return (sof_markers[marker], precision, width, height,
                    n_components)
        if marker == 0xDA:  # SOS — entropy data follows
            break
        pos += 2 + ln
    raise ValueError("JPEG without a SOF frame header")


#: Output schema of the JPEG metadata stage.
JPEG_META_SCHEMA = (
    "media_id bigint, n_bytes bigint, progressive boolean, "
    "precision int, width int, height int, n_components int, "
    "n_pixels bigint, decode_ok boolean"
)


def jpeg_meta_features(batch: pd.DataFrame) -> pd.DataFrame:
    """Arrow-batch JPEG metadata stage (``schema=JPEG_META_SCHEMA``)
    with the family's per-row corrupt-payload isolation."""
    rows: dict[str, list] = {
        "media_id": [], "n_bytes": [], "progressive": [],
        "precision": [], "width": [], "height": [],
        "n_components": [], "n_pixels": [], "decode_ok": [],
    }
    for mid, payload in zip(batch["media_id"], batch["payload"]):
        data = bytes(payload)
        rows["media_id"].append(mid)
        rows["n_bytes"].append(len(data))
        try:
            prog, prec, w, h, nc = parse_jpeg(data)
            rows["progressive"].append(prog)
            rows["precision"].append(prec)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_components"].append(nc)
            rows["n_pixels"].append(w * h)
            rows["decode_ok"].append(True)
        except Exception:
            for c in ("progressive", "precision", "width", "height",
                      "n_components", "n_pixels"):
                rows[c].append(None)
            rows["decode_ok"].append(False)
    out = pd.DataFrame(rows)
    out["n_bytes"] = out["n_bytes"].astype("int64")
    for c in ("precision", "width", "height", "n_components"):
        out[c] = out[c].astype("Int32")
    out["n_pixels"] = out["n_pixels"].astype("Int64")
    out["progressive"] = out["progressive"].astype("boolean")
    return out


#: Output schema of the audio metadata/decode stage.
AUDIO_FEATURE_SCHEMA = (
    "media_id bigint, n_bytes bigint, sample_rate int, channels int, "
    "bits int, n_frames bigint, duration_us bigint, decode_ok boolean"
)


def audio_decode_features(batch: pd.DataFrame) -> pd.DataFrame:
    """Arrow-batch WAV decoder for :func:`extract_features`
    (``schema=AUDIO_FEATURE_SCHEMA``): real parse via
    :func:`decode_wav` with the same per-row corrupt-payload isolation
    as the image stage. ``duration_us`` is integer-exact
    (n_frames · 1e6 // rate) so it is oracle-recomputable."""
    rows: dict[str, list] = {
        "media_id": [], "n_bytes": [], "sample_rate": [], "channels": [],
        "bits": [], "n_frames": [], "duration_us": [], "decode_ok": [],
    }
    for mid, payload in zip(batch["media_id"], batch["payload"]):
        data = bytes(payload)
        rows["media_id"].append(mid)
        rows["n_bytes"].append(len(data))
        try:
            rate, ch, bits, frames = decode_wav(data)
            rows["sample_rate"].append(rate)
            rows["channels"].append(ch)
            rows["bits"].append(bits)
            rows["n_frames"].append(len(frames))
            rows["duration_us"].append(len(frames) * 1_000_000 // rate)
            rows["decode_ok"].append(True)
        except Exception:
            for c in ("sample_rate", "channels", "bits", "n_frames",
                      "duration_us"):
                rows[c].append(None)
            rows["decode_ok"].append(False)
    out = pd.DataFrame(rows)
    out["n_bytes"] = out["n_bytes"].astype("int64")
    for c in ("sample_rate", "channels", "bits"):
        out[c] = out[c].astype("Int32")
    for c in ("n_frames", "duration_us"):
        out[c] = out[c].astype("Int64")
    return out


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
    schema: str = FEATURE_SCHEMA,
) -> DataFrame:
    """Arrow-batched feature extraction over the media table. Pair the
    decoder with its schema: :func:`fake_decode_features` /
    ``FEATURE_SCHEMA`` (deterministic stand-in),
    :func:`image_decode_features` / ``IMAGE_FEATURE_SCHEMA`` (real
    decode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield decoder(batch)

    return media.mapInPandas(run, schema=schema)


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
    from query_planner_optimizer_spark.catalog import cached_parquet, spread

    docs = spread(cached_parquet(spark, f"{sf_dir}/documents.parquet"))
    media = to_media_table(docs, "doc_id", F.encode(F.col("text"), "UTF-8"), "text")
    return extract_features(media)


def q_frame_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_planner_optimizer_spark.catalog import cached_parquet, spread

    docs = spread(cached_parquet(spark, f"{sf_dir}/documents.parquet"))
    media = to_media_table(docs, "doc_id", F.encode(F.col("text"), "UTF-8"), "text")
    return sample_resize_frames(media)


def q_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-circle audio round-trip: per doc_id, SYNTHESIZE a real
    RIFF/WAVE PCM payload (rate/channels/bits/frames derived from
    doc_id by integer formulas), then PARSE the bytes back with the
    zero-dependency decoder — all inside one Arrow batch pass. The
    oracle recomputes every output from the same doc_id formulas in
    SQL, so a single flipped byte anywhere in the builder, the chunk
    walk, or the PCM reshape breaks the hash."""
    from collections.abc import Iterator

    from query_planner_optimizer_spark.catalog import cached_parquet, spread

    docs = spread(
        cached_parquet(spark, f"{sf_dir}/documents.parquet")
    ).select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for did in ids:
                rate = 8000 * (1 + did % 3)
                ch = 1 + did % 2
                bits = 8 if did % 4 == 0 else 16
                n = 100 + did % 50
                wave = ((np.arange(n * ch) * 7) % 241 - 120)
                payloads.append(
                    build_wav(int(rate), int(ch), int(bits),
                              wave.reshape(n, ch))
                )
            yield audio_decode_features(
                pd.DataFrame({"media_id": ids, "payload": payloads})
            )

    return docs.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


def q_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-circle video round-trip, mirror of :func:`q_audio_meta`:
    synthesize a real ISO-BMFF container per doc_id (brand/timescale/
    duration/tracks/mdat size from integer formulas), parse the bytes
    back, and let the SQL oracle recompute every field."""
    from collections.abc import Iterator

    from query_planner_optimizer_spark.catalog import cached_parquet, spread

    docs = spread(
        cached_parquet(spark, f"{sf_dir}/documents.parquet")
    ).select("doc_id")
    brands = (b"isom", b"mp42", b"qt  ")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = [
                build_mp4(
                    brands[did % 3],
                    1000 * (1 + did % 4),
                    5000 + did % 777,
                    1 + did % 3,
                    b"\x00" * (did % 32),
                )
                for did in ids
            ]
            yield video_meta_features(
                pd.DataFrame({"media_id": ids, "payload": payloads})
            )

    return docs.mapInPandas(run, schema=VIDEO_META_SCHEMA)


def q_jpeg_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-circle JPEG round-trip, mirror of :func:`q_video_meta`:
    synthesize a real JFIF container per doc_id (dimensions/components/
    baseline-vs-progressive/comment/entropy sizes from integer
    formulas), parse the bytes back with the marker-walking parser,
    and let the SQL oracle recompute every field."""
    from collections.abc import Iterator

    from query_planner_optimizer_spark.catalog import cached_parquet, spread

    docs = spread(
        cached_parquet(spark, f"{sf_dir}/documents.parquet")
    ).select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = [
                build_jpeg(
                    16 * (1 + did % 60),
                    8 * (1 + did % 45),
                    1 if did % 5 == 0 else 3,
                    did % 2 == 1,
                    b"c" * (did % 29),
                    b"\x00" * (did % 17),
                )
                for did in ids
            ]
            yield jpeg_meta_features(
                pd.DataFrame({"media_id": ids, "payload": payloads})
            )

    return docs.mapInPandas(run, schema=JPEG_META_SCHEMA)


def entry_queries():
    return {
        "multimodal_features": q_media_features,
        "multimodal_frame_pipeline": q_frame_pipeline,
        "multimodal_audio_meta": q_audio_meta,
        "multimodal_video_meta": q_video_meta,
        "multimodal_jpeg_meta": q_jpeg_meta,
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
    # WAV round-trip: every output recomputed from the doc_id formulas
    # (header = 44 bytes: RIFF(12) + fmt(8+16) + data hdr(8)).
    audio = """
        SELECT doc_id AS media_id,
               44 + (100 + doc_id % 50) * (1 + doc_id % 2)
                  * (CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 2 END) AS n_bytes,
               CAST(8000 * (1 + doc_id % 3) AS INTEGER) AS sample_rate,
               CAST(1 + doc_id % 2 AS INTEGER) AS channels,
               CAST(CASE WHEN doc_id % 4 = 0 THEN 8 ELSE 16 END AS INTEGER)
                   AS bits,
               100 + doc_id % 50 AS n_frames,
               (100 + doc_id % 50) * 1000000
                   // (8000 * (1 + doc_id % 3)) AS duration_us,
               TRUE AS decode_ok
        FROM documents
    """
    # MP4 round-trip: sizes — ftyp 20, mvhd 108, trak 8 each, moov
    # header 8, mdat 8+pad (absent when pad = 0).
    video = """
        SELECT doc_id AS media_id,
               136 + 8 * (1 + doc_id % 3)
                   + (CASE WHEN doc_id % 32 = 0 THEN 0
                      ELSE 8 + doc_id % 32 END) AS n_bytes,
               CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'isom'
                    WHEN 1 THEN 'mp42' ELSE 'qt  ' END AS major_brand,
               CAST(1000 * (1 + doc_id % 4) AS INTEGER) AS timescale,
               5000 + doc_id % 777 AS duration,
               CAST(1 + doc_id % 3 AS INTEGER) AS n_tracks,
               (5000 + doc_id % 777) * 1000000
                   // (1000 * (1 + doc_id % 4)) AS duration_us,
               TRUE AS decode_ok
        FROM documents
    """
    # JPEG round-trip: sizes — SOI 2 + APP0 18 + COM (4+k when k>0) +
    # SOF (10+3*nc) + SOS (8+2*nc) + entropy + EOI 2 = 40 + 5*nc + ...
    jpeg = """
        SELECT doc_id AS media_id,
               40 + 5 * (CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 3 END)
                  + doc_id % 17
                  + (CASE WHEN doc_id % 29 = 0 THEN 0
                     ELSE 4 + doc_id % 29 END) AS n_bytes,
               doc_id % 2 = 1 AS progressive,
               CAST(8 AS INTEGER) AS precision,
               CAST(16 * (1 + doc_id % 60) AS INTEGER) AS width,
               CAST(8 * (1 + doc_id % 45) AS INTEGER) AS height,
               CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 3 END
                    AS INTEGER) AS n_components,
               16 * (1 + doc_id % 60) * 8 * (1 + doc_id % 45)
                   AS n_pixels,
               TRUE AS decode_ok
        FROM documents
    """
    return {"multimodal_features": sql, "multimodal_frame_pipeline": frames,
            "multimodal_audio_meta": audio, "multimodal_video_meta": video,
            "multimodal_jpeg_meta": jpeg}
