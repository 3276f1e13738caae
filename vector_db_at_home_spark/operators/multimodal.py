"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as ``binary``
columns with a metadata struct alongside text.  The Spark-side mechanics —
schema, partition-sized Arrow batches through ``mapInPandas``, batch shapes,
output contracts — are real and tested here; the actual codec calls are
STUBBED (image/audio libraries are not in this container) behind
``decode_stub`` which raises ``NotImplementedError``, with a deterministic
byte-level feature extractor standing in so the pipeline is end-to-end
runnable and verifiable.

Swap ``_extract_features_bytes`` for a real decoder (PIL/ffmpeg/torchcodec)
without touching any of the Spark plumbing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal record: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),   # image|audio|video
        StructField("payload", BinaryType(), False),    # opaque encoded bytes
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", LongType()),
                    StructField("height", LongType()),
                    StructField("duration_ms", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_entropy", DoubleType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _png_bytes(pixels: bytes, width: int) -> bytes:
    """A fully valid minimal grayscale 8-bit PNG from raw pixel bytes —
    stdlib only.  PNG is a public byte format: 8-byte signature, IHDR
    (width/height as big-endian u32), IDAT (zlib-compressed scanlines, each
    prefixed with filter byte 0), IEND; every chunk CRC-32'd."""
    import struct
    import zlib

    width = max(1, width)
    height = max(1, (len(pixels) + width - 1) // width)
    padded = pixels.ljust(width * height, b"\x00")
    raw = b"".join(
        b"\x00" + padded[r * width:(r + 1) * width] for r in range(height)
    )

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def parse_image_header(payload: bytes):
    """``(mime, width, height)`` parsed from the encoded bytes alone, or
    ``None`` if the format is unrecognized.  Pure public byte-format
    knowledge — no codec library:

    - PNG: signature ``89 50 4E 47 0D 0A 1A 0A``, IHDR chunk at offset 8
      carries width/height as big-endian u32.
    - JPEG: ``FF D8`` then marker segments; any SOF0–SOF15 frame header
      (except DHT/JPG/DAC) carries height/width as big-endian u16.
    - GIF: ``GIF87a``/``GIF89a`` then the logical screen descriptor's
      little-endian u16 width/height.
    """
    import struct

    if payload is None or len(payload) < 10:
        return None
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) >= 24 and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return ("image/png", w, h)
        return None
    if payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if pos + 4 > len(payload):
                return None
            seglen = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if pos + 9 <= len(payload):
                    h, w = struct.unpack(">HH", payload[pos + 5:pos + 9])
                    return ("image/jpeg", w, h)
                return None
            pos += 2 + seglen
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return ("image/gif", w, h)
    return None


def synthesize_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a deterministic media table from a text table.  Image rows get
    a REAL (decodable) PNG payload whose grayscale pixels are the text's
    UTF-8 bytes — so header-parsed dimensions are genuine, not copied from
    metadata.  Audio/video rows keep raw UTF-8 stand-in blobs.  The meta
    width/height start at 0 for images (unknown until
    ``attach_image_meta`` parses the payload)."""

    @F.pandas_udf(BinaryType())
    def png_payload(texts: pd.Series, ids: pd.Series) -> pd.Series:
        out = []
        for t, i in zip(texts, ids):
            raw = (t or "").encode("utf-8")
            out.append(_png_bytes(raw, width=4 + int(i) % 29))
        return pd.Series(out)

    is_image = F.col(id_col) % 3 == 0
    return df.select(
        F.col(id_col).alias("media_id"),
        (F.when(is_image, "image")
         .when(F.col(id_col) % 3 == 1, "audio")
         .otherwise("video")).alias("modality"),
        F.when(
            is_image, png_payload(F.col(text_col), F.col(id_col))
        ).otherwise(F.encode(F.col(text_col), "UTF-8")).alias("payload"),
        F.struct(
            F.when(is_image, "image/png")
            .otherwise("application/octet-stream").alias("mime"),
            F.when(is_image, F.lit(0))
            .otherwise(F.length(F.col(text_col))).cast("long").alias("width"),
            F.lit(0).cast("long").alias("height"),
            (F.length(F.col(text_col)) * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def attach_image_meta(media: DataFrame) -> DataFrame:
    """Fill ``meta.mime/width/height`` by parsing each payload's real
    image header (PNG/JPEG/GIF) — Arrow-batched, partition-parallel, no
    shuffle.  Non-image or unparseable payloads keep their existing meta.
    This is the honest boundary: header fields come from the bytes; only
    pixel DECODE remains stubbed (``decode_stub``)."""
    import pandas as pd

    parsed_t = StructType(
        [
            StructField("mime", StringType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
        ]
    )

    @F.pandas_udf(parsed_t)
    def parse(payloads: pd.Series) -> pd.DataFrame:
        rows = []
        for p in payloads:
            got = parse_image_header(bytes(p) if p is not None else None)
            rows.append(got if got else (None, None, None))
        return pd.DataFrame(rows, columns=["mime", "width", "height"])

    with_hdr = media.withColumn("__hdr", parse(F.col("payload")))
    return with_hdr.withColumn(
        "meta",
        F.when(
            F.col("__hdr.width").isNotNull(),
            F.struct(
                F.col("__hdr.mime").alias("mime"),
                F.col("__hdr.width").alias("width"),
                F.col("__hdr.height").alias("height"),
                F.col("meta.duration_ms").alias("duration_ms"),
            ),
        ).otherwise(F.col("meta")),
    ).drop("__hdr")


def decode_stub(payload: bytes, modality: str):
    """REAL-DECODER STUB.  In production this dispatches to PIL /
    libav / etc.  The container has no media codecs, so calling it raises —
    the pipeline uses ``_extract_features_bytes`` instead."""
    raise NotImplementedError(
        f"media decode for modality={modality!r} requires codec libraries "
        "not present in this environment; see _extract_features_bytes for "
        "the deterministic stand-in"
    )


def _extract_features_bytes(payload: bytes, n_features: int = 8):
    """Deterministic stand-in featurizer: byte histogram folded to
    ``n_features`` buckets (L1-normalized) + Shannon entropy.  Pure bytes —
    no codec dependency, stable across runs/engines."""
    import math

    counts = [0] * n_features
    hist = [0] * 256
    for b in payload:
        counts[b % n_features] += 1
        hist[b] += 1
    total = len(payload)
    if total == 0:
        return 0.0, [0.0] * n_features
    entropy = -sum(
        (c / total) * math.log2(c / total) for c in hist if c
    )
    return entropy, [c / total for c in counts]


def extract_media_features(media: DataFrame, n_features: int = 8,
                           use_real_decoder: bool = False) -> DataFrame:
    """Partition-parallel feature extraction over binary payloads via
    ``mapInPandas`` (Arrow batches of raw bytes — the shape a real decode
    farm uses; one task per partition, no shuffle).

    ``use_real_decoder=True`` routes through ``decode_stub`` and therefore
    raises in this environment — the flag exists so the call site for the
    real codec path is already wired.
    """
    import pandas as pd

    def featurize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ents, feats = [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                raw = bytes(payload) if payload is not None else b""
                if use_real_decoder:
                    decode_stub(raw, modality)  # raises NotImplementedError
                e, f = _extract_features_bytes(raw, n_features)
                ents.append(e)
                feats.append(f)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(bytes(p) if p is not None else b"")
                                for p in pdf["payload"]],
                    "byte_entropy": ents,
                    "features": feats,
                }
            )

    return media.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def media_stats_by_modality(features: DataFrame) -> DataFrame:
    """Downstream aggregation over extracted features — shows the decoded
    output flowing back into plain DataFrame analytics."""
    return (
        features.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("byte_entropy"), 6).alias("avg_entropy"),
        )
        .orderBy("modality")
    )
