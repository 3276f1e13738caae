"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as ``binary``
columns with a metadata struct alongside text.  The Spark-side mechanics —
schema, partition-sized Arrow batches through ``mapInPandas``, batch shapes,
output contracts — are real and tested here.  IMAGES DECODE FOR REAL:
``_png_bytes`` writes valid grayscale PNGs and ``decode_png_gray`` is its
stdlib inverse (zlib inflate + all five scanline filters), so pixel-level
features need no codec library.  Only audio/video decode remains STUBBED
(``decode_stub`` raises ``NotImplementedError`` for those modalities — no
libav in this container), with a deterministic byte-level featurizer
standing in so the pipeline is end-to-end runnable and verifiable.

Swap ``decode_stub``'s non-image branch for a real decoder
(ffmpeg/torchcodec) without touching any of the Spark plumbing.
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
        StructField("n_units", LongType()),   # decoded units (pixels) or bytes
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


def decode_png_gray(payload: bytes) -> tuple[int, int, bytes]:
    """``(width, height, pixels)`` decoded from an 8-bit grayscale
    non-interlaced PNG — pure stdlib (``zlib`` inflate + scanline
    unfiltering, all five filter types per the public PNG spec §6).  The
    exact inverse of ``_png_bytes``; also decodes filter-1..4 streams any
    conformant encoder produces for this pixel format."""
    import struct
    import zlib

    if payload is None or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat = 8, []
    w = h = None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos:pos + 8])
        data = payload[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w, h, bitdepth, colortype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bitdepth != 8 or colortype != 0 or interlace != 0:
                raise ValueError(
                    "only 8-bit grayscale non-interlaced PNG is supported"
                )
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (w + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray()
    prev = bytes(w)
    for r in range(h):
        ft = raw[r * (w + 1)]
        line = bytearray(raw[r * (w + 1) + 1:(r + 1) * (w + 1)])
        if ft == 1:      # Sub: + reconstructed left (bpp = 1)
            for i in range(1, w):
                line[i] = (line[i] + line[i - 1]) & 0xFF
        elif ft == 2:    # Up: + reconstructed above
            for i in range(w):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:    # Average: + floor((left + up) / 2)
            for i in range(w):
                left = line[i - 1] if i else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:    # Paeth predictor
            for i in range(w):
                a = line[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                line[i] = (line[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        out += line
        prev = bytes(line)
    return w, h, bytes(out)


def decode_stub(payload: bytes, modality: str):
    """REAL-DECODER STUB for the modalities this environment can't decode.
    PNG images decode for real (``decode_png_gray``, stdlib); audio/video
    would dispatch to libav/torchcodec, which this container doesn't have,
    so those raise."""
    if modality == "image":
        return decode_png_gray(payload)
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
                           use_real_decoder: bool = False,
                           decoder: str = "bytes") -> DataFrame:
    """Partition-parallel feature extraction over binary payloads via
    ``mapInPandas`` (Arrow batches of raw bytes — the shape a real decode
    farm uses; one task per partition, no shuffle).

    ``decoder`` picks the decode path per row:

    - ``"bytes"`` (default): features over the ENCODED payload bytes —
      the codec-free stand-in; works for every modality.
    - ``"auto"``: image rows are REALLY decoded (``decode_png_gray``,
      stdlib PNG) and featurized over their PIXELS (``n_units`` = pixel
      count = width·height); audio/video fall back to payload bytes.
    - ``"strict"``: every row goes through ``decode_stub`` — images decode
      (PNG), audio/video raise ``NotImplementedError`` (no codec libs in
      this container).  ``use_real_decoder=True`` is the legacy spelling.

    Output ``n_bytes`` is always the encoded payload size; ``byte_entropy``
    and ``features`` are over decoded pixels where decoding happened.
    """
    import pandas as pd

    if use_real_decoder:
        decoder = "strict"
    if decoder not in ("bytes", "auto", "strict"):
        raise ValueError(f"unknown decoder mode {decoder!r}")

    def featurize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ents, feats, n_units = [], [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                raw = bytes(payload) if payload is not None else b""
                units = raw
                if decoder == "strict":
                    _w, _h, units = decode_stub(raw, modality)
                elif decoder == "auto" and modality == "image":
                    _w, _h, units = decode_png_gray(raw)
                e, f = _extract_features_bytes(units, n_features)
                ents.append(e)
                feats.append(f)
                n_units.append(len(units))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(bytes(p) if p is not None else b"")
                                for p in pdf["payload"]],
                    "n_units": n_units,
                    "byte_entropy": ents,
                    "features": feats,
                }
            )

    return media.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_width: int,
                  out_height: int) -> DataFrame:
    """REAL image resize over the binary column: decode PNG pixels
    (``decode_png_gray``), nearest-neighbor resample to
    ``out_width × out_height`` (pure NumPy index arithmetic — the standard
    NN kernel, no codec library), re-encode as PNG.  Non-image rows pass
    through untouched.  Arrow-batched ``mapInPandas``, partition-parallel,
    no shuffle — the decode-farm shape; swap the kernel for a real codec
    resize without touching the plumbing.  ``meta.width/height`` are
    updated to the new dimensions for image rows."""
    import numpy as np

    if out_width <= 0 or out_height <= 0:
        raise ValueError("resize dimensions must be positive")

    def work(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads, metas = [], []
            for payload, modality, meta in zip(
                pdf["payload"], pdf["modality"], pdf["meta"]
            ):
                raw = bytes(payload) if payload is not None else b""
                if modality == "image":
                    w, h, px = decode_png_gray(raw)
                    img = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                    ys = (np.arange(out_height) * h) // out_height
                    xs = (np.arange(out_width) * w) // out_width
                    out = img[ys][:, xs]
                    payloads.append(_png_bytes(out.tobytes(), out_width))
                    meta = dict(meta)
                    meta["width"] = out_width
                    meta["height"] = out_height
                    metas.append(meta)
                else:
                    payloads.append(raw)
                    metas.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(work, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling PLUMBING: one output row per sampled timestamp
    ``(media_id, frame_ts_ms, frame)`` — the schema, batch shape and
    partitioning a real decoder farm uses.  Actual video decode requires
    codec libraries this container lacks, so the frame payload is a
    DETERMINISTIC STAND-IN (the 16-byte window of the raw payload at the
    proportional offset); swap ``_frame_at`` for a libav/torchcodec call
    without touching the Spark side.  Non-video rows produce no output."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")

    def _frame_at(raw: bytes, ts_ms: int, duration_ms: int) -> bytes:
        # REAL-DECODER STAND-IN — byte window at the proportional offset
        if not raw or duration_ms <= 0:
            return b""
        off = min(len(raw) - 1, (ts_ms * len(raw)) // duration_ms)
        return raw[off:off + 16]

    def work(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, tss, frames = [], [], []
            for media_id, modality, payload, meta in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"], pdf["meta"]
            ):
                if modality != "video":
                    continue
                raw = bytes(payload) if payload is not None else b""
                duration = int(meta["duration_ms"] or 0)
                for ts in range(0, max(duration, 1), every_ms):
                    ids.append(media_id)
                    tss.append(ts)
                    frames.append(_frame_at(raw, ts, duration))
            yield pd.DataFrame(
                {"media_id": ids, "frame_ts_ms": tss, "frame": frames}
            )

    return media.mapInPandas(
        work, schema="media_id long, frame_ts_ms long, frame binary"
    )


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
