"""Multimodal (image/audio/video) column support — north-star tier.

Media are modeled the Spark-idiomatic way for a 100 TB training-data
pipeline: an opaque ``binary`` payload column plus typed metadata columns,
decoded/feature-extracted by Arrow-batched ``mapInPandas`` UDFs. Decoding
is REAL for the netpbm image family (``decode_netpbm``: P5/P6 header parse
+ numpy pixel plane + nearest-neighbor downsample — no codec library
needed); compressed codecs (PNG/JPEG/WAV/MPEG — PIL/ffmpeg/librosa are not
in this container) stay honestly gated behind ``decode_media(...,
real=True) -> NotImplementedError``. Everything around the decode — schema,
binary synthesis, magic-byte sniffing, byte-level parsing in pandas
batches, frame sampling — is real and oracle-checked.

Payload layout (deterministic, derived from the document text):

    magic(4 bytes) | md5(text) (16 bytes) | utf-8 text bytes

so every byte-level property the decoder extracts is independently
recomputable in ANSI SQL from the text — which is exactly how the DuckDB
oracle verifies that the Arrow binary plumbing is byte-correct.

Scale notes: payloads stay opaque binary end-to-end (no driver collect);
mapInPandas streams Arrow record batches, so per-executor memory is bounded
by batch size (spark.sql.execution.arrow.maxRecordsPerBatch), not file
count; metadata-only queries never touch payload bytes thanks to parquet
column pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: magic prefixes for the three synthetic media kinds
MAGIC_HEX = {
    "image": "89504E47",  # PNG
    "audio": "52494646",  # RIFF/WAV
    "video": "000001BA",  # MPEG-PS pack header
}
MIME = {
    "image": "image/png",
    "audio": "audio/wav",
    "video": "video/mpeg",
}
_HEADER_BYTES = 20  # 4 magic + 16 md5


def synth_payload(text: Column, kind: str) -> Column:
    """Deterministic fake media payload (binary) for a text column."""
    return F.unhex(
        F.concat(
            F.lit(MAGIC_HEX[kind]),
            F.md5(F.encode(text, "UTF-8")),
            F.hex(F.encode(text, "UTF-8")),
        )
    )


def sniff_mime(payload: Column) -> Column:
    """Magic-byte content sniffing on the first 4 payload bytes."""
    head = F.upper(F.substring(F.hex(payload), 1, 8))
    expr = F.lit("application/octet-stream")
    for kind, magic in MAGIC_HEX.items():
        expr = F.when(head == magic, F.lit(MIME[kind])).otherwise(expr)
    return expr


def parsed_dims(payload: Column) -> tuple[Column, Column]:
    """(width, height) parsed from header bytes 4:6 / 6:8 as big-endian u16 —
    the built-in-expression twin of the pandas decoder (whole-stage codegen;
    use this form when no per-pixel work is needed)."""
    hx = F.hex(payload)
    width = F.conv(F.substring(hx, 9, 4), 16, 10).cast("long")
    height = F.conv(F.substring(hx, 13, 4), 16, 10).cast("long")
    return width, height


def synth_ppm(text: Column, w: int = 4, h: int = 4) -> Column:
    """A REAL P6 PPM image derived deterministically from the text: ASCII
    netpbm header + ``w*h*3`` raw RGB bytes cycling through md5(text). Built
    entirely from JVM-side expressions (encode/repeat/unhex/concat on
    binary), so payload synthesis is codegen'd — no Python until decode."""
    n = w * h * 3
    reps = (2 * n + 31) // 32  # md5 hex is 32 chars = 16 bytes per rep
    header = F.encode(F.lit(f"P6\n{w} {h}\n255\n"), "UTF-8")
    pixels = F.unhex(F.substring(F.repeat(F.md5(text), reps), 1, 2 * n))
    return F.concat(header, pixels)


def decode_netpbm(payload: bytes) -> dict:
    """REAL image decode for the netpbm family — P6 (RGB) and P5 (gray):
    parse the ASCII header (magic, dims, maxval, '#' comments), then
    ``np.frombuffer`` the raw pixel plane and compute real pixel features,
    including a genuine nearest-neighbor 2× downsample (``arr[::2, ::2]``).
    This is the one image family decodable with numpy alone; compressed
    codecs (PNG/JPEG/WAV/MPEG) stay behind the ``decode_media(real=True)``
    gate until PIL/ffmpeg exist in the runtime."""
    import numpy as np

    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError(f"not a netpbm payload: {payload[:2]!r}")
    # tokenize header: magic, width, height, maxval (whitespace/comments)
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        tokens.append(payload[start:i])
    i += 1  # single whitespace after maxval, then raw pixels
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    channels = 3 if payload[:2] == b"P6" else 1
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels,
                        offset=i).reshape(h, w, channels)
    ds = arr[::2, ::2]
    return {
        "width": w,
        "height": h,
        "channels": channels,
        "mean_px": round(float(arr.mean()), 4),
        "ds_mean_px": round(float(ds.mean()), 4),
    }


def decode_media(payload: bytes, real: bool = False) -> dict:
    """Byte-level 'decode' of one payload. ``real=True`` would hand off to an
    actual codec (PIL / ffmpeg / librosa) — not present in this container, so
    it is an explicit stub; the deterministic fake path parses the header
    bytes exactly like a codec parses an IHDR chunk."""
    if real:
        raise NotImplementedError(
            "real media codecs (PIL/ffmpeg/librosa) are not available in this "
            "environment; deterministic fake decode is the supported path"
        )
    width = (payload[4] << 8) | payload[5]
    height = (payload[6] << 8) | payload[7]
    return {
        "n_bytes": len(payload),
        "width": width,
        "height": height,
        "head_hex": payload[:4].hex().upper(),
        "mean_px": (width * height + len(payload)) % 256,
    }


DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("head_hex", StringType()),
        StructField("mean_px", LongType()),
    ]
)


PPM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("mean_px", DoubleType()),
        StructField("ds_mean_px", DoubleType()),
    ]
)


def ppm_features(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """Real-image feature extraction (decode_netpbm) over Arrow batches —
    same mapInPandas shape as ``decode_features`` but the decode step is an
    actual pixel decode + downsample, not header math."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats = [decode_netpbm(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(extract, PPM_SCHEMA)


def decode_features(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column
    (``mapInPandas`` — the idiomatic Spark shape for per-media Python work;
    one Python worker per partition, payload bytes never leave executors)."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats = [decode_media(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(extract, DECODE_SCHEMA)


def frame_samples(df: DataFrame, id_col: str, payload_col: str,
                  frame_bytes: int = 16, every: int = 3) -> DataFrame:
    """Sample every ``every``-th fixed-size frame from a video payload:
    (id, frame_idx, frame_sig). Frames are 1-based byte ranges after the
    4-byte magic; the signature is md5 over the frame's hex rendering so the
    oracle can recompute it without blob slicing. Explode + codegen'd
    expressions — no Python in this path."""
    hx = F.lower(F.hex(F.col(payload_col)))
    n_frames = F.floor((F.length(F.col(payload_col)) - F.lit(4)) / F.lit(frame_bytes))
    frames = df.select(
        F.col(id_col),
        hx.alias("hx"),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).filter(F.col("frame_idx") % every == 0)
    sig = F.md5(
        F.encode(
            F.substring(
                F.col("hx"),
                F.lit(9) + F.col("frame_idx") * (2 * frame_bytes),
                2 * frame_bytes,
            ),
            "UTF-8",
        )
    )
    return frames.select(id_col, "frame_idx", sig.alias("frame_sig"))


def frame_sig_py(payload: bytes, idx: int, frame_bytes: int = 16) -> str:
    """Python twin of the frame signature (for tests)."""
    frame = payload[4 + idx * frame_bytes : 4 + (idx + 1) * frame_bytes]
    return hashlib.md5(frame.hex().encode()).hexdigest()


# Executors must never need this package on their import path: the driver can
# run from any cwd (the round driver does), and functions defined here cross
# the JVM->Python-worker boundary. Pickle-by-value makes every shipped
# closure self-contained, so workers only need pyspark/pandas/numpy.
import sys as _sys  # noqa: E402

from pyspark import cloudpickle as _cloudpickle  # noqa: E402

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
