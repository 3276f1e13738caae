"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as ``binary``
columns with a metadata struct alongside text.  The Spark-side mechanics —
schema, partition-sized Arrow batches through ``mapInPandas``, batch shapes,
output contracts — are real and tested here.  EVERY MODALITY DECODES FOR
REAL from public byte formats, no codec library:

- images: ``_png_bytes``/``decode_png_gray`` (stdlib zlib inflate + all
  five scanline filters), ``_jpeg_bytes``/``decode_jpeg_gray``
  (baseline-DCT grayscale per ITU T.81: generic DQT/DHT parsing,
  Huffman+EXTEND entropy decode, dequantize, float IDCT — stdlib +
  NumPy), ``_gif_bytes``/``decode_gif_gray`` (lossless variable-width
  LZW + grayscale palette);
- COLOR images (round 6): ``_png_rgb_bytes``/``decode_png_rgb``
  (truecolor color type 2, bpp-3 filters) and ``_jpeg_rgb_bytes``/
  ``decode_jpeg_rgb`` (baseline YCbCr with 4:2:0/4:2:2/4:4:4 sampling,
  MCU-interleaved entropy decode, chroma upsample, JFIF color convert);
- audio: ``_wav_bytes``/``decode_wav_pcm`` (RIFF chunk walk, 8/16-bit
  PCM) and ``_adpcm_wav_bytes``/``decode_wav_adpcm`` (IMA/DVI ADPCM,
  WAV tag 0x11 — a REAL 4:1 compressed codec with adaptive step size;
  ``decode_wav`` dispatches on the fmt tag) and ``_g711_wav_bytes``/
  ``decode_wav_g711`` (ITU-T G.711 µ-law tag 7 / A-law tag 6 — the
  telephony companding codecs);
- video: ``_y4m_bytes``/``decode_y4m_gray`` (YUV4MPEG2 raw frames, luma
  extraction) — ``sample_frames`` returns REAL frames for y4m.

Only PERCEPTUAL codecs (mp3/aac/h264/...) remain out of reach —
``decode_stub`` raises ``NotImplementedError`` for those (no libav in
this container), with a deterministic byte-level featurizer standing in
so the pipeline stays end-to-end runnable on any payload.  Swap that
branch for a real decoder (ffmpeg/torchcodec) without touching any of
the Spark plumbing.
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
    """Build a deterministic media table from a text table.  EVERY row gets
    a REAL (decodable) payload derived from the text's UTF-8 bytes:

    - image (``id % 3 == 0``): grayscale pixels in a rotating container —
      ``id % 9 == 0`` → baseline JPEG, ``id % 9 == 3`` → PNG,
      ``id % 9 == 6`` → GIF;
    - audio (``id % 3 == 1``): the bytes as 8-bit PCM samples in a WAV;
    - video (``id % 3 == 2``): the bytes as ``(4 + id % 29) × 8`` luma
      frames in a y4m stream.

    Header-parsed dimensions are genuine, not copied from metadata.  The
    meta width/height start at 0 for images (unknown until
    ``attach_image_meta`` parses the payload); audio meta keeps the char
    count as its stand-in width; video meta carries the real frame
    dimensions."""

    @F.pandas_udf(BinaryType())
    def media_payload(texts: pd.Series, ids: pd.Series) -> pd.Series:
        out = []
        for t, i in zip(texts, ids):
            raw = (t or "").encode("utf-8")
            i = int(i)
            width = 4 + i % 29
            if i % 3 == 0:
                if i % 9 == 0:
                    out.append(_jpeg_bytes(raw, width=width))
                elif i % 9 == 3:
                    out.append(_png_bytes(raw, width=width))
                else:
                    out.append(_gif_bytes(raw, width=width))
            elif i % 3 == 1:
                out.append(_wav_bytes(raw, sample_rate=8000))
            else:
                out.append(_y4m_bytes(raw, width, 8))
        return pd.Series(out)

    is_image = F.col(id_col) % 3 == 0
    is_audio = F.col(id_col) % 3 == 1
    return df.select(
        F.col(id_col).alias("media_id"),
        (F.when(is_image, "image")
         .when(is_audio, "audio")
         .otherwise("video")).alias("modality"),
        media_payload(F.col(text_col), F.col(id_col)).alias("payload"),
        F.struct(
            F.when(is_image,
                   F.when(F.col(id_col) % 9 == 0, "image/jpeg")
                   .when(F.col(id_col) % 9 == 3, "image/png")
                   .otherwise("image/gif"))
            .when(is_audio, "audio/wav")
            .otherwise("video/x-yuv4mpeg").alias("mime"),
            F.when(is_image, F.lit(0))
            .when(is_audio, F.length(F.col(text_col)))
            .otherwise(F.lit(4) + F.col(id_col) % 29)
            .cast("long").alias("width"),
            F.when(is_image | is_audio, F.lit(0)).otherwise(F.lit(8))
            .cast("long").alias("height"),
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
    conformant encoder produces for this pixel format.  Truncated/corrupt
    streams raise ``ValueError``."""
    import struct
    import zlib

    if payload is None or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    try:
        return _decode_png_gray_inner(payload)
    except (IndexError, struct.error, zlib.error) as e:
        raise ValueError(f"corrupt PNG stream: {e}") from e


def _decode_png_gray_inner(payload: bytes) -> tuple[int, int, bytes]:
    w, h, _nch, px = _decode_png_channels(
        payload, {0: 1},
        "only 8-bit grayscale PNG is supported here",
    )
    return w, h, px


#: JPEG zigzag scan order (public, ITU T.81 figure 5)
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex-K-style Huffman table specs (BITS, HUFFVAL) for luminance.  The
#: decoder never assumes these — it reads whatever DHT the file carries;
#: the encoder writes these into its DHT, so the roundtrip is closed.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical Huffman assignment (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _dct_matrix():
    import math

    import numpy as np

    c = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            c[u, x] = math.cos((2 * x + 1) * u * math.pi / 16) * (
                math.sqrt(0.125) if u == 0 else 0.5
            )
    return c


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 restart alignment);
        the normal write path handles 0xFF stuffing on the pad byte."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def marker(self, byte: int) -> None:
        """Emit a raw marker (byte-aligned caller responsibility)."""
        self.out += bytes([0xFF, byte])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _jpeg_bytes(pixels: bytes, width: int, quant: int = 1) -> bytes:
    """A valid baseline-DCT grayscale JPEG from raw pixel bytes — stdlib +
    NumPy only.  Flat quantization table of ``quant`` (1 = near-lossless:
    the only loss is DCT float rounding), standard-shaped Huffman tables
    written into DHT (the decoder reads them back from the file).  Public
    byte format per ITU T.81: SOI, DQT, SOF0, DHT×2, SOS, entropy-coded
    MCUs with byte stuffing, EOI."""
    import struct

    import numpy as np

    width = max(1, width)
    height = max(1, (len(pixels) + width - 1) // width)
    img = np.frombuffer(
        pixels.ljust(width * height, b"\x00"), dtype=np.uint8
    ).reshape(height, width).astype(np.float64)
    # pad to 8x8 blocks by edge replication
    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    padded = np.empty((ph, pw))
    padded[:height, :width] = img
    padded[height:, :width] = img[-1:, :]
    padded[:height, width:] = img[:, -1:]
    padded[height:, width:] = img[-1, -1]

    C = _dct_matrix()
    qtab = np.full((8, 8), quant, dtype=np.float64)
    dc_codes = _huffman_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huffman_codes(_AC_BITS, _AC_VALS)

    def cat(v: int) -> int:
        return int(v).bit_length() if v > 0 else int(-v).bit_length()

    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by:by + 8, bx:bx + 8] - 128.0
            coef = C @ block @ C.T
            q = np.rint(coef / qtab).astype(np.int64)
            zz = [int(q.flat[_ZIGZAG[i]]) for i in range(64)]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            s = cat(diff)
            code, ln = dc_codes[s]
            bw.write(code, ln)
            if s:
                bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                s = cat(zz[i])
                code, ln = ac_codes[(run << 4) | s]
                bw.write(code, ln)
                bw.write(zz[i] if zz[i] > 0 else zz[i] + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[0x00]  # EOB
                bw.write(code, ln)

    def seg(marker: int, data: bytes) -> bytes:
        return struct.pack(">HH", marker, len(data) + 2) + data

    dqt = seg(0xFFDB, bytes([0]) + bytes([quant] * 64))
    sof0 = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1)
               + bytes([1, 0x11, 0]))
    dht = seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)) \
        + seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof0 + dht + sos + bw.flush() + b"\xff\xd9")


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data with 0xFF00
    unstuffing; RST markers byte-align and are skipped by the caller."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy data truncated")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = d[self.pos] if self.pos < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 1
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                # marker reached — caller handles; feed pad bits
                self.pos -= 1
                b = 0
                self.acc = (self.acc << 8) | b
                self.nbits += 8
                return
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, bytes]:
    """``(width, height, pixels)`` decoded from a BASELINE-DCT grayscale
    JPEG — stdlib + NumPy only (generic DQT/DHT parsing, Huffman + EXTEND
    entropy decode, dequantize, dezigzag, float IDCT, level shift, crop to
    SOF dimensions).  The inverse of ``_jpeg_bytes`` and of any conformant
    baseline encoder's single-component output; progressive or
    multi-component (color) streams raise — this engine's decode surface
    is the grayscale training-pipeline path.  Truncated/corrupt streams
    raise ``ValueError``."""
    import struct

    if payload is None or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    try:
        return _decode_jpeg_gray_inner(payload)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(f"corrupt JPEG stream: {e}") from e


def _decode_jpeg_gray_inner(payload: bytes) -> tuple[int, int, bytes]:
    import struct

    import numpy as np

    pos = 2
    qtabs: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = None
    comp_q = 0
    dc_id = ac_id = 0
    restart_interval = 0
    scan_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG segment marker")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        data = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT — one or more tables per segment
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtabs[tq] = list(data[i + 1:i + 65])
                i += 65
        elif marker == 0xC4:  # DHT — one or more tables per segment
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 0x0F
                bits = list(data[i + 1:i + 17])
                nvals = sum(bits)
                vals = list(data[i + 17:i + 17 + nvals])
                codes = _huffman_codes(bits, vals)
                huff[(tc, th)] = {
                    (ln, code): sym for sym, (code, ln) in codes.items()
                }
                i += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, ncomp = struct.unpack(">BHHB", data[:6])
            if ncomp != 1:
                raise ValueError(
                    "only single-component (grayscale) JPEG is supported"
                )
            if data[7] != 0x11:
                raise ValueError("subsampled grayscale JPEG unsupported")
            comp_q = data[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) JPEG is supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", data[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = data[0]
            if ns != 1:
                raise ValueError("multi-scan JPEG unsupported")
            dc_id, ac_id = data[2] >> 4, data[2] & 0x0F
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if w is None or scan_start is None:
        raise ValueError("JPEG missing SOF0/SOS")
    qtab = np.array(qtabs[comp_q], dtype=np.float64)
    dc_table = huff[(0, dc_id)]
    ac_table = huff[(1, ac_id)]
    C = _dct_matrix()

    def read_symbol(br: _BitReader, table) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | br.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")

    def extend(v: int, s: int) -> int:
        return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1

    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    out = np.zeros((ph, pw), dtype=np.float64)
    br = _BitReader(payload, scan_start)
    prev_dc = 0
    n_blocks = (ph // 8) * (pw // 8)
    for bi in range(n_blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            # byte-align and consume the RST marker
            br.nbits = 0
            p = br.pos
            while p + 1 < len(payload) and not (
                payload[p] == 0xFF and 0xD0 <= payload[p + 1] <= 0xD7
            ):
                p += 1
            br.pos = p + 2
            prev_dc = 0
        zz = [0] * 64
        s = read_symbol(br, dc_table)
        diff = extend(br.read_bits(s), s) if s else 0
        prev_dc += diff
        zz[0] = prev_dc
        k = 1
        while k < 64:
            sym = read_symbol(br, ac_table)
            if sym == 0x00:  # EOB
                break
            run, s = sym >> 4, sym & 0x0F
            if s == 0:
                if run != 15:
                    raise ValueError("invalid AC symbol")
                k += 16  # ZRL
                continue
            k += run
            if k > 63:
                raise ValueError("AC coefficient index out of range")
            zz[k] = extend(br.read_bits(s), s)
            k += 1
        coef = np.zeros(64, dtype=np.float64)
        for i in range(64):
            coef[_ZIGZAG[i]] = zz[i] * qtab[i]
        block = C.T @ coef.reshape(8, 8) @ C + 128.0
        by, bx = divmod(bi, pw // 8)
        out[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = block
    pixels = np.clip(np.rint(out[:h, :w]), 0, 255).astype(np.uint8)
    return w, h, pixels.tobytes()


def _gif_bytes(pixels: bytes, width: int) -> bytes:
    """A valid GIF89a from raw grayscale pixel bytes — stdlib only.  Public
    byte format: header, logical screen descriptor, 256-entry grayscale
    global color table (palette[i] = (i,i,i), so index == gray value),
    image descriptor, LZW-compressed indices in 255-byte sub-blocks,
    trailer."""
    palette = bytes(v for i in range(256) for v in (i, i, i))
    return _gif_payload(pixels, width, palette)


def _gif_payload(pixels: bytes, width: int, palette: bytes) -> bytes:
    import struct

    width = max(1, width)
    height = max(1, (len(pixels) + width - 1) // width)
    data = pixels.ljust(width * height, b"\x00")

    # LZW encode (variable-width codes, LSB-first packing, min code size 8)
    min_code = 8
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(1 << min_code)}
    next_code = eoi + 1
    code_width = min_code + 1
    out_bits: list[tuple[int, int]] = [(clear, code_width)]
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        out_bits.append((table[run], code_width))
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << code_width) and code_width < 12:
                code_width += 1
            next_code += 1
        else:  # table full: emit clear, reset
            out_bits.append((clear, code_width))
            table = {bytes([i]): i for i in range(1 << min_code)}
            next_code = eoi + 1
            code_width = min_code + 1
        run = bytes([b])
    if run:
        out_bits.append((table[run], code_width))
    out_bits.append((eoi, code_width))
    acc = nbits = 0
    packed = bytearray()
    for code, cw in out_bits:
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        packed.append(acc & 0xFF)

    blocks = b"".join(
        bytes([min(255, len(packed) - i)]) + bytes(packed[i:i + 255])
        for i in range(0, len(packed), 255)
    )
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height) + bytes([0xF7, 0, 0])  # GCT 256
        + palette
        + b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        + bytes([min_code]) + blocks + b"\x00"
        + b"\x3b"
    )


def decode_gif_gray(payload: bytes) -> tuple[int, int, bytes]:
    """``(width, height, pixels)`` from a GIF87a/GIF89a image — stdlib-only
    LZW decode (variable-width codes, LSB-first, clear/EOI handling, the
    deferred-clear growth rule), palette mapped to grayscale by integer
    BT.601 luma (exact for the grayscale palettes ``_gif_bytes`` writes).
    First image block only; interlaced rows are de-interlaced per the
    4-pass spec order.  Truncated/corrupt streams raise ``ValueError``."""
    import struct

    if payload is None or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_gray_inner(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt GIF stream: {e}") from e


def _decode_gif_gray_inner(payload: bytes) -> tuple[int, int, bytes]:
    w, h, idx, pal = _decode_gif_indices(payload)
    # palette -> grayscale (integer BT.601 luma; exact identity for
    # the (i,i,i) palettes our encoder writes)
    lut = bytes(
        (299 * pal[3 * i] + 587 * pal[3 * i + 1] + 114 * pal[3 * i + 2]
         + 500) // 1000
        if 3 * i + 2 < len(pal) else 0
        for i in range(256)
    )
    return w, h, idx.translate(lut)


def _decode_gif_indices(payload: bytes) -> tuple[int, int, bytes, bytes]:
    """``(width, height, palette_indices, palette)`` — the shared LZW +
    de-interlace core under both the grayscale and RGB GIF decoders."""
    import struct

    sw, sh = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos:pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02X}")
        _l, _t, w, h = struct.unpack("<HHHH", payload[pos + 1:pos + 9])
        iflags = payload[pos + 9]
        pos += 10
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            pal = payload[pos:pos + 3 * n]
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image has no color table")
        interlaced = bool(iflags & 0x40)
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1

        # LZW decode
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        acc = nbits = bitpos = 0
        code_width = min_code + 1
        dictionary: list[bytes] = [bytes([i]) for i in range(1 << min_code)]
        dictionary += [b"", b""]  # clear, eoi placeholders
        out = bytearray()
        prev: bytes | None = None

        def read_code() -> int:
            nonlocal acc, nbits, bitpos
            while nbits < code_width:
                if bitpos >= len(data):
                    return eoi
                acc |= data[bitpos] << nbits
                nbits += 8
                bitpos += 1
            code = acc & ((1 << code_width) - 1)
            acc >>= code_width
            nbits -= code_width
            return code

        while True:
            code = read_code()
            if code == eoi:
                break
            if code == clear:
                dictionary = [bytes([i]) for i in range(1 << min_code)]
                dictionary += [b"", b""]
                code_width = min_code + 1
                prev = None
                continue
            if code < len(dictionary):
                entry = dictionary[code]
            elif code == len(dictionary) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            if prev is not None and len(dictionary) < 4096:
                dictionary.append(prev + entry[:1])
                if (len(dictionary) == (1 << code_width)
                        and code_width < 12):
                    code_width += 1
            prev = entry
        if len(out) < w * h:
            raise ValueError("GIF pixel data truncated")
        idx = bytes(out[:w * h])
        if interlaced:
            rows = [idx[r * w:(r + 1) * w] for r in range(h)]
            order = (list(range(0, h, 8)) + list(range(4, h, 8))
                     + list(range(2, h, 4)) + list(range(1, h, 2)))
            deint: list[bytes] = [b""] * h
            for src, dst in enumerate(order):
                deint[dst] = rows[src]
            idx = b"".join(deint)
        return w, h, idx, bytes(pal)
    raise ValueError("GIF contains no image block")


def decode_gif_rgb(payload: bytes) -> tuple[int, int, bytes]:
    """``(width, height, rgb)`` from a GIF87a/GIF89a image — the same
    stdlib LZW core as ``decode_gif_gray``, with each palette index
    expanded to its RGB triple (GIF color is palette-exact, so the decode
    is lossless for ANY palette, unlike the luma fold the gray path
    applies)."""
    import struct

    if payload is None or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    try:
        w, h, idx, pal = _decode_gif_indices(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt GIF stream: {e}") from e
    pal = pal.ljust(768, b"\x00")
    out = bytearray(3 * len(idx))
    for i, v in enumerate(idx):
        out[3 * i:3 * i + 3] = pal[3 * v:3 * v + 3]
    return w, h, bytes(out)


def _gif_rgb_bytes(indices: bytes, width: int, palette: bytes) -> bytes:
    """A valid GIF89a from palette INDICES + a 256-entry RGB palette —
    the color companion of ``_gif_bytes`` (which is exactly this with the
    identity grayscale palette).  GIF color is index-exact: decode
    returns ``palette[index]`` verbatim, no quantization loss."""
    if len(palette) != 768:
        raise ValueError("palette must be 256 RGB triples (768 bytes)")
    return _gif_payload(indices, width, palette)


def _wav_bytes(samples: bytes, sample_rate: int = 8000) -> bytes:
    """A valid 8-bit mono PCM WAV from raw sample bytes — stdlib only.
    Public RIFF/WAVE byte format: RIFF header, fmt chunk (PCM, 1 channel,
    8-bit unsigned), data chunk."""
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    data = samples
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav_pcm(payload: bytes) -> tuple[int, int, bytes]:
    """``(sample_rate, n_samples, samples)`` from a PCM WAV — stdlib-only
    RIFF chunk walk.  8-bit PCM returns the raw unsigned samples; 16-bit
    PCM folds to unsigned 8-bit (high byte + 128) so every PCM WAV yields
    a comparable byte-per-sample stream.  Multi-channel data stays
    interleaved (sample count = frames × channels).  Compressed (non-PCM)
    WAV raises."""
    import struct

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, _channels, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1:
        raise ValueError("only PCM WAV is supported")
    if bits == 8:
        samples = data
    elif bits == 16:
        # fold signed 16-bit to unsigned 8-bit (high byte + 128)
        samples = bytes(
            ((data[i + 1] + 128) & 0xFF) for i in range(0, len(data) - 1, 2)
        )
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    return sample_rate, len(samples), samples


# IMA/DVI ADPCM (public spec: IMA Digital Audio Focus and Technical
# Working Groups recommendation, 1992; WAV format tag 0x0011) — a REAL
# compressed audio codec: 4 bits per sample vs 16, adaptive step size.
_IMA_STEP = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]
_ADPCM_BLOCK_ALIGN = 256                       # bytes per block (mono)
_ADPCM_SAMPLES_PER_BLOCK = 1 + (_ADPCM_BLOCK_ALIGN - 4) * 2   # = 505


def _ima_reconstruct(nibble: int, pred: int, idx: int) -> tuple[int, int]:
    """One IMA ADPCM step shared by encode (for predictor tracking) and
    decode: returns the new (predictor, index)."""
    step = _IMA_STEP[idx]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX[nibble]))
    return pred, idx


def _adpcm_wav_bytes(samples: bytes, sample_rate: int = 8000) -> bytes:
    """A valid mono IMA-ADPCM WAV (format tag 0x0011) from unsigned 8-bit
    samples — a REAL 4:1 compressed encode, stdlib only.  Block layout per
    the IMA recommendation: 4-byte header (int16 predictor, uint8 step
    index, reserved) then two 4-bit samples per byte, low nibble first."""
    import struct

    pcm16 = [(s << 8) - 32768 for s in samples]
    blocks = []
    for start in range(0, len(pcm16), _ADPCM_SAMPLES_PER_BLOCK):
        chunk = pcm16[start:start + _ADPCM_SAMPLES_PER_BLOCK]
        pred = chunk[0]
        # seed the block's step index from its mean slope — the decoder
        # reads the index from the header, and a near-matched initial
        # step avoids the classic leading-edge slope-overload transient
        # (index 0 = step 7 chasing a steep waveform for many samples)
        if len(chunk) > 1:
            mean_d = sum(
                abs(chunk[i + 1] - chunk[i]) for i in range(len(chunk) - 1)
            ) / (len(chunk) - 1)
            idx = min(range(89), key=lambda i: abs(_IMA_STEP[i] - mean_d))
        else:
            idx = 0
        blk = bytearray(struct.pack("<hBB", pred, idx, 0))
        nibbles = []
        for s in chunk[1:]:
            step = _IMA_STEP[idx]
            diff = s - pred
            nib = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            pred, idx = _ima_reconstruct(nib, pred, idx)
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)
        blk.extend(
            nibbles[i] | (nibbles[i + 1] << 4)
            for i in range(0, len(nibbles), 2)
        )
        blk.extend(b"\x00" * (_ADPCM_BLOCK_ALIGN - len(blk)))  # final block pad
        blocks.append(bytes(blk))
    data = b"".join(blocks)
    byte_rate = (
        sample_rate * _ADPCM_BLOCK_ALIGN // _ADPCM_SAMPLES_PER_BLOCK
    )
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate,
        _ADPCM_BLOCK_ALIGN, 4, 2, _ADPCM_SAMPLES_PER_BLOCK,
    )
    fact = struct.pack("<I", len(samples))
    riff_size = 4 + (8 + len(fmt)) + (8 + len(fact)) + (8 + len(data))
    return (
        b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav_adpcm(payload: bytes) -> tuple[int, int, bytes]:
    """``(sample_rate, n_samples, samples)`` from a mono IMA-ADPCM WAV —
    REAL compressed-audio decode, stdlib only.  Output folds to the same
    unsigned-8-bit stream as ``decode_wav_pcm`` (high byte + 128) so PCM
    and ADPCM audio are directly comparable downstream.  The ``fact``
    chunk's sample count truncates the final block's padding."""
    import struct

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data, n_total = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated")
            fmt = struct.unpack("<HHIIHH", body[:16])
            if len(body) >= 20:
                (spb,) = struct.unpack("<H", body[18:20])
            else:
                spb = None
        elif cid == b"fact":
            if len(body) < 4:
                raise ValueError("WAV fact chunk truncated")
            (n_total,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _br, block_align, bits = fmt
    if audio_format != 0x11:
        raise ValueError("not an IMA-ADPCM WAV")
    if channels != 1 or bits != 4:
        raise ValueError("only mono 4-bit IMA-ADPCM is supported")
    if spb is None:
        spb = 1 + (block_align - 4) * 2
    out: list[int] = []
    for start in range(0, len(data) - 3, block_align):
        blk = data[start:start + block_align]
        pred, idx, _r = struct.unpack("<hBB", blk[:4])
        idx = max(0, min(88, idx))
        out.append(pred)
        produced = 1
        for b in blk[4:]:
            for nib in (b & 0xF, b >> 4):
                if produced >= spb:
                    break
                pred, idx = _ima_reconstruct(nib, pred, idx)
                out.append(pred)
                produced += 1
    if n_total is not None:
        out = out[:n_total]
    samples = bytes((((s >> 8) + 128) & 0xFF) for s in out)
    return sample_rate, len(samples), samples


# ITU-T G.711 (public spec, 1972/1988): logarithmic 8-bit companding of
# 16-bit PCM — µ-law (WAV tag 7, North America/Japan telephony) and A-law
# (WAV tag 6, Europe).  2:1 compression with segment-constant relative
# error; the standard codecs every telephony WAV uses.
_G711_BIAS = 0x84
_G711_CLIP = 32635


def _ulaw_encode_sample(s: int) -> int:
    sign = 0x80 if s < 0 else 0
    mag = min(-s if s < 0 else s, _G711_CLIP) + _G711_BIAS
    exp = 7
    mask = 0x4000
    while exp > 0 and not (mag & mask):
        exp -= 1
        mask >>= 1
    mant = (mag >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def _ulaw_decode_sample(u: int) -> int:
    u = ~u & 0xFF
    mag = (((u & 0x0F) << 3) + _G711_BIAS) << ((u >> 4) & 0x07)
    mag -= _G711_BIAS
    return -mag if u & 0x80 else mag


def _alaw_encode_sample(s: int) -> int:
    sign = 0x80 if s >= 0 else 0
    mag = min(s if s >= 0 else -s - 1, 32767)
    if mag >= 256:
        exp = 7
        mask = 0x4000
        while exp > 1 and not (mag & mask):
            exp -= 1
            mask >>= 1
        mant = (mag >> (exp + 3)) & 0x0F
        code = (exp << 4) | mant
    else:
        code = mag >> 4
    return (code | sign) ^ 0x55


def _alaw_decode_sample(a: int) -> int:
    a ^= 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    if exp == 0:
        mag = (mant << 4) + 8
    else:
        mag = ((mant << 4) + 0x108) << (exp - 1)
    return mag if sign else -mag


def _g711_wav_bytes(samples: bytes, law: str,
                    sample_rate: int = 8000) -> bytes:
    """A valid mono G.711 WAV (tag 7 µ-law / tag 6 A-law) from unsigned
    8-bit samples — REAL logarithmic companding, stdlib only."""
    import struct

    enc = _ulaw_encode_sample if law == "ulaw" else _alaw_encode_sample
    tag = 7 if law == "ulaw" else 6
    data = bytes(enc((s << 8) - 32768) for s in samples)
    fmt = struct.pack("<HHIIHHH", tag, 1, sample_rate, sample_rate, 1, 8, 0)
    fact = struct.pack("<I", len(samples))
    riff_size = 4 + (8 + len(fmt)) + (8 + len(fact)) + (8 + len(data))
    return (
        b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav_g711(payload: bytes) -> tuple[int, int, bytes]:
    """``(sample_rate, n_samples, samples)`` from a mono G.711 WAV
    (µ-law tag 7 or A-law tag 6) — REAL compressed-telephony decode,
    folded to the same unsigned-8-bit stream as the other WAV paths."""
    import struct

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, sample_rate, _br, _ba, bits = fmt
    if tag not in (6, 7):
        raise ValueError("not a G.711 WAV")
    if channels != 1 or bits != 8:
        raise ValueError("only mono 8-bit G.711 is supported")
    dec = _ulaw_decode_sample if tag == 7 else _alaw_decode_sample
    samples = bytes((((dec(b) >> 8) + 128) & 0xFF) for b in data)
    return sample_rate, len(samples), samples


def decode_wav(payload: bytes) -> tuple[int, int, bytes]:
    """``(sample_rate, n_samples, samples)`` from any supported WAV:
    PCM (tag 1 — ``decode_wav_pcm``) or IMA-ADPCM (tag 0x11 — the REAL
    compressed path, ``decode_wav_adpcm``), dispatched on the fmt tag."""
    import struct

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if cid == b"fmt ":
            if pos + 10 > len(payload):
                raise ValueError("WAV fmt chunk truncated")
            (tag,) = struct.unpack("<H", payload[pos + 8:pos + 10])
            if tag == 0x11:
                return decode_wav_adpcm(payload)
            if tag in (6, 7):
                return decode_wav_g711(payload)
            return decode_wav_pcm(payload)
        pos += 8 + ln + (ln & 1)
    raise ValueError("WAV missing fmt chunk")


def _y4m_bytes(pixel_stream: bytes, width: int, height: int = 8) -> bytes:
    """A valid YUV4MPEG2 (y4m) video from a raw grayscale pixel stream —
    stdlib only.  Public plain-text-header format (the raw-video container
    ffmpeg/mjpegtools read): ``YUV4MPEG2 W<w> H<h> F<fps> Ip A1:1 Cmono``
    then ``FRAME`` + w·h luma bytes per frame; the stream is chunked into
    ceil(len / (w·h)) frames, last frame zero-padded."""
    width = max(1, width)
    height = max(1, height)
    fsz = width * height
    n_frames = max(1, (len(pixel_stream) + fsz - 1) // fsz)
    data = pixel_stream.ljust(n_frames * fsz, b"\x00")
    header = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 Cmono\n".encode()
    return header + b"".join(
        b"FRAME\n" + data[i * fsz:(i + 1) * fsz] for i in range(n_frames)
    )


def parse_y4m_header(payload: bytes):
    """``(width, height, colorspace)`` from a y4m stream header, or None."""
    if payload is None or not payload.startswith(b"YUV4MPEG2"):
        return None
    end = payload.find(b"\n")
    if end < 0:
        return None
    w = h = None
    cs = "420"  # the spec default when no C tag is present
    for tok in payload[9:end].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            cs = t[1:]
    if w is None or h is None:
        return None
    return w, h, cs


def decode_y4m_gray(payload: bytes) -> tuple[int, int, list[bytes]]:
    """``(width, height, frames)`` from a y4m video — stdlib only; each
    frame is its w·h luma plane.  ``Cmono`` is read as-is; ``C420*``
    frames carry luma + 2 quarter-size chroma planes, of which the luma
    plane is returned (grayscale extraction — the training-pipeline
    shape).  Other colorspaces raise."""
    hdr = parse_y4m_header(payload)
    if hdr is None:
        raise ValueError("not a y4m payload")
    w, h, cs = hdr
    if cs == "mono":
        fsz = w * h
    elif cs.startswith("420"):
        fsz = w * h + 2 * ((w // 2) * (h // 2))
    else:
        raise ValueError(f"unsupported y4m colorspace C{cs}")
    pos = payload.find(b"\n") + 1
    frames: list[bytes] = []
    while pos < len(payload):
        end = payload.find(b"\n", pos)
        if end < 0 or payload[pos:pos + 5] != b"FRAME":
            raise ValueError("corrupt y4m frame header")
        pos = end + 1
        if pos + fsz > len(payload):
            raise ValueError("y4m frame data truncated")
        frames.append(payload[pos:pos + w * h])  # luma plane
        pos += fsz
    if not frames:
        raise ValueError("y4m contains no frames")
    return w, h, frames


def decode_image_gray(payload: bytes) -> tuple[int, int, bytes]:
    """``(width, height, pixels)`` from any supported image container,
    dispatched on the magic bytes: PNG (``decode_png_gray``), baseline
    JPEG (``decode_jpeg_gray``) or GIF (``decode_gif_gray``)."""
    if payload and payload[:2] == b"\xff\xd8":
        return decode_jpeg_gray(payload)
    if payload and payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_gray(payload)
    return decode_png_gray(payload)


def decode_stub(payload: bytes, modality: str):
    """Decode dispatch with an honest codec boundary.  Every container
    this repo can decode from public byte formats decodes FOR REAL —
    images (PNG/baseline JPEG/GIF), WAV audio (PCM and IMA-ADPCM — the
    latter a real compressed codec), y4m video (returns
    ``(w, h, concatenated luma)``); only PERCEPTUAL audio/video codecs
    (mp3/aac/h264/...) raise — those genuinely require codec libraries
    this container doesn't have."""
    if modality == "image":
        return decode_image_gray(payload)
    if modality == "audio" and payload and payload[:4] == b"RIFF":
        return decode_wav(payload)
    if modality == "video" and payload and payload.startswith(b"YUV4MPEG2"):
        w, h, frames = decode_y4m_gray(payload)
        return w, h, b"".join(frames)
    raise NotImplementedError(
        f"perceptual {modality} codecs (mp3/aac/h264/...) require codec "
        "libraries not present in this environment (PCM and IMA-ADPCM "
        "WAV audio and y4m video decode for real); see "
        "_extract_features_bytes for the byte-level stand-in"
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
    - ``"auto"``: rows whose container the repo can decode are REALLY
      decoded and featurized over their decoded units — image pixels
      (PNG/JPEG/GIF; ``n_units`` = width·height), WAV samples (PCM or
      IMA-ADPCM; ``n_units`` = sample count), y4m luma frames (``n_units`` = total
      frame pixels); unrecognized payloads fall back to payload bytes.
    - ``"strict"``: every row goes through ``decode_stub`` — decodable
      containers decode, compressed codecs raise ``NotImplementedError``
      (no codec libs in this container).  ``use_real_decoder=True`` is
      the legacy spelling.

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
                elif decoder == "auto":
                    if modality == "image":
                        _w, _h, units = decode_image_gray(raw)
                    elif modality == "audio" and raw[:4] == b"RIFF":
                        _sr, _n, units = decode_wav(raw)
                    elif modality == "video" and raw.startswith(
                            b"YUV4MPEG2"):
                        _w, _h, fr = decode_y4m_gray(raw)
                        units = b"".join(fr)
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
                    w, h, px = decode_image_gray(raw)
                    img = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                    ys = (np.arange(out_height) * h) // out_height
                    xs = (np.arange(out_width) * w) // out_width
                    out = img[ys][:, xs]
                    payloads.append(_png_bytes(out.tobytes(), out_width))
                    meta = dict(meta)
                    meta["mime"] = "image/png"  # re-encoded container
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
    """Video frame sampling: one output row per sampled timestamp
    ``(media_id, frame_ts_ms, frame)`` — the schema, batch shape and
    partitioning a real decoder farm uses.  y4m payloads are REALLY
    decoded: the returned frame is the luma plane of the frame at the
    proportional position in the stream.  Compressed containers
    (h264/...) would need codec libraries this container lacks, so they
    fall back to a DETERMINISTIC STAND-IN (the 16-byte window of the raw
    payload at the proportional offset); swap that branch for a
    libav/torchcodec call without touching the Spark side.  Non-video
    rows produce no output."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")

    def _frame_at(raw: bytes, ts_ms: int, duration_ms: int,
                  frames: list[bytes] | None) -> bytes:
        if not raw or duration_ms <= 0:
            return b""
        if frames is not None:  # REAL decode (y4m, decoded once per row)
            idx = min(len(frames) - 1, (ts_ms * len(frames)) // duration_ms)
            return frames[idx]
        # compressed-codec STAND-IN — byte window at the proportional offset
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
                decoded = (decode_y4m_gray(raw)[2]
                           if raw.startswith(b"YUV4MPEG2") else None)
                duration = int(meta["duration_ms"] or 0)
                for ts in range(0, max(duration, 1), every_ms):
                    ids.append(media_id)
                    tss.append(ts)
                    frames.append(_frame_at(raw, ts, duration, decoded))
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


# ---------------------------------------------------------------------------
# Round-6: COLOR image codecs — PNG truecolor (color type 2) and baseline
# JPEG YCbCr 4:2:0 — the formats an RGB multimodal corpus actually carries.
# Same honesty contract as the grayscale codecs above: real public byte
# formats, stdlib + NumPy only, encoder and decoder both in-repo so the
# roundtrip is closed and oracle-checkable.
# ---------------------------------------------------------------------------


def _png_rgb_bytes(rgb: bytes, width: int) -> bytes:
    """A valid truecolor (color type 2) 8-bit PNG from interleaved RGB
    bytes — stdlib only.  Identical chunk layout to ``_png_bytes``; each
    scanline is ``3·width`` bytes behind its filter byte."""
    import struct
    import zlib

    width = max(1, width)
    stride = 3 * width
    height = max(1, (len(rgb) + stride - 1) // stride)
    padded = rgb.ljust(stride * height, b"\x00")
    raw = b"".join(
        b"\x00" + padded[r * stride:(r + 1) * stride] for r in range(height)
    )

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png_rgb(payload: bytes) -> tuple[int, int, bytes]:
    """``(width, height, rgb)`` from an 8-bit truecolor non-interlaced PNG
    — stdlib inflate + the five scanline filters at bpp = 3 (PNG spec §6:
    Sub/Average/Paeth reference the pixel ``bpp`` bytes to the left).
    Exact inverse of ``_png_rgb_bytes`` and of any conformant encoder's
    color-type-2 output."""
    import struct
    import zlib

    if payload is None or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    try:
        return _decode_png_rgb_inner(payload)
    except (IndexError, struct.error, zlib.error) as e:
        raise ValueError(f"corrupt PNG stream: {e}") from e


def _decode_png_rgb_inner(payload: bytes) -> tuple[int, int, bytes]:
    w, h, nch, px = _decode_png_channels(
        payload, {2: 3},
        "only 8-bit truecolor non-interlaced PNG is supported",
    )
    return w, h, px


#: PNG color type → samples per pixel (8-bit depths)
_PNG_TYPE_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png_rgba(payload: bytes) -> tuple[int, int, bytes]:
    """``(width, height, rgba)`` from an 8-bit PNG with an ALPHA channel
    — truecolor+alpha (color type 6) decoded natively; grayscale+alpha
    (type 4) expanded to RGBA (gray replicated to R=G=B).  Real-corpus
    PNGs are frequently RGBA (web graphics, screenshots); the filter
    arithmetic is the same five scanline filters at bpp 4 (or 2)."""
    import struct
    import zlib

    if payload is None or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    try:
        w, h, nch, px = _decode_png_channels(
            payload, {4: 2, 6: 4},
            "only 8-bit alpha PNG (color type 4 or 6) is supported here",
        )
    except (IndexError, struct.error, zlib.error) as e:
        raise ValueError(f"corrupt PNG stream: {e}") from e
    if nch == 4:
        return w, h, px
    out = bytearray(4 * w * h)  # LA -> RGBA
    for i in range(w * h):
        g, a = px[2 * i], px[2 * i + 1]
        out[4 * i:4 * i + 4] = bytes((g, g, g, a))
    return w, h, bytes(out)


def _png_rgba_bytes(rgba: bytes, width: int) -> bytes:
    """A valid truecolor+alpha (color type 6) PNG from interleaved RGBA
    bytes — stdlib only, same chunk layout as ``_png_rgb_bytes``."""
    import struct
    import zlib

    width = max(1, width)
    stride = 4 * width
    height = max(1, (len(rgba) + stride - 1) // stride)
    padded = rgba.ljust(stride * height, b"\x00")
    raw = b"".join(
        b"\x00" + padded[r * stride:(r + 1) * stride] for r in range(height)
    )

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _decode_png_channels(payload: bytes, allowed: dict[int, int],
                         type_err: str) -> tuple[int, int, int, bytes]:
    """Shared 8-bit non-interlaced PNG core: parse chunks, inflate,
    unfilter with the color type's byte-per-pixel stride (Sub/Average/
    Paeth reference the sample ``bpp`` bytes left — PNG spec §6).
    ``allowed`` maps accepted color types → channel counts."""
    import struct
    import zlib

    pos, idat = 8, []
    w = h = None
    bpp = None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos:pos + 8])
        data = payload[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w, h, bitdepth, colortype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bitdepth != 8 or colortype not in allowed or interlace > 1:
                raise ValueError(type_err)
            bpp = allowed[colortype]
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(b"".join(idat))
    if not interlace:
        stride = bpp * w
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG pixel data length mismatch")
        return w, h, bpp, _png_unfilter(raw, w, h, bpp)
    # Adam7: seven independently-filtered sub-images, scattered onto the
    # pixel grid (PNG spec §8.2) — interlaced files are a real-corpus
    # reality (legacy web encoders default to them)
    out = bytearray(w * h * bpp)
    pos = 0
    for xs, ys, xstep, ystep in _ADAM7_PASSES:
        pw = (w - xs + xstep - 1) // xstep
        ph = (h - ys + ystep - 1) // ystep
        if pw <= 0 or ph <= 0:
            continue
        seg_len = ph * (pw * bpp + 1)
        sub = _png_unfilter(raw[pos:pos + seg_len], pw, ph, bpp)
        pos += seg_len
        for r in range(ph):
            y = ys + r * ystep
            for c in range(pw):
                x = xs + c * xstep
                src = (r * pw + c) * bpp
                dst = (y * w + x) * bpp
                out[dst:dst + bpp] = sub[src:src + bpp]
    if pos != len(raw):
        raise ValueError("PNG interlaced data length mismatch")
    return w, h, bpp, bytes(out)


#: Adam7 pass grid: (x_start, y_start, x_step, y_step) per PNG spec §8.2
_ADAM7_PASSES = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, w: int, h: int, bpp: int) -> bytes:
    """Invert the five scanline filters over one (sub-)image — shared by
    the sequential path and each Adam7 pass."""
    stride = bpp * w
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray()
    prev = bytes(stride)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1:(r + 1) * (stride + 1)])
        if ft == 1:      # Sub: + reconstructed pixel bpp bytes left
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:    # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:    # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:    # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
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
    return bytes(out)


def _rgb_to_ycbcr(rgb):
    """JFIF full-range color transform on float arrays (shape (h, w, 3))."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y, cb, cr):
    import numpy as np

    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b], axis=-1)


def _jpeg_rgb_bytes(rgb: bytes, width: int, quant: int = 1,
                    subsample: str = "420",
                    restart_interval: int = 0) -> bytes:
    """A valid baseline-DCT YCbCr color JPEG from interleaved RGB bytes —
    stdlib + NumPy only.  Public byte format per ITU T.81 / JFIF: SOF0
    declares three components (chroma on quant table 1), the scan
    interleaves MCUs with per-component DC predictors.

    ``subsample``: ``"420"`` (default — Y 2×2, Cb/Cr 1×1, 16×16 MCUs of
    four Y blocks + Cb + Cr; chroma planes are 2×2 box means, exact for
    the 2×2-block-constant synthesis patterns), ``"422"`` (Y 2×1, 16×8
    MCUs of two Y blocks + Cb + Cr; chroma is a horizontal 2-mean) or
    ``"444"`` (all 1×1, 8×8 MCUs of one block each — no chroma loss).
    ``restart_interval`` > 0 writes a DRI segment and RST0-7 markers
    every that many MCUs with DC-predictor resets — the error-resilience
    layout real encoders emit for streamable files."""
    import struct

    import numpy as np

    if subsample not in ("420", "422", "444"):
        raise ValueError("subsample must be '420', '422' or '444'")
    sub_x = 2 if subsample in ("420", "422") else 1
    sub_y = 2 if subsample == "420" else 1
    mcu_w, mcu_h = 8 * sub_x, 8 * sub_y
    width = max(1, width)
    stride = 3 * width
    height = max(1, (len(rgb) + stride - 1) // stride)
    img = np.frombuffer(
        rgb.ljust(stride * height, b"\x00"), dtype=np.uint8
    ).reshape(height, width, 3).astype(np.float64)
    # pad to whole MCUs by edge replication
    ph = (height + mcu_h - 1) // mcu_h * mcu_h
    pw = (width + mcu_w - 1) // mcu_w * mcu_w
    padded = np.empty((ph, pw, 3))
    padded[:height, :width] = img
    padded[height:, :width] = img[-1:, :]
    padded[:height, width:] = padded[:height, width - 1:width]
    padded[height:, width:] = padded[height - 1, width - 1]

    y, cb, cr = _rgb_to_ycbcr(padded)
    cb_s = cb.reshape(ph // sub_y, sub_y, pw // sub_x, sub_x) \
        .mean(axis=(1, 3))
    cr_s = cr.reshape(ph // sub_y, sub_y, pw // sub_x, sub_x) \
        .mean(axis=(1, 3))

    C = _dct_matrix()
    qtab = np.full((8, 8), quant, dtype=np.float64)
    dc_codes = _huffman_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huffman_codes(_AC_BITS, _AC_VALS)

    def cat(v: int) -> int:
        return int(v).bit_length() if v > 0 else int(-v).bit_length()

    bw = _BitWriter()
    prev_dc = [0, 0, 0]

    def write_block(plane, by, bx, ci):
        block = plane[by:by + 8, bx:bx + 8] - 128.0
        coef = C @ block @ C.T
        q = np.rint(coef / qtab).astype(np.int64)
        zz = [int(q.flat[_ZIGZAG[i]]) for i in range(64)]
        diff = zz[0] - prev_dc[ci]
        prev_dc[ci] = zz[0]
        s = cat(diff)
        code, ln = dc_codes[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for i in range(1, last_nz + 1):
            if zz[i] == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                bw.write(code, ln)
                run -= 16
            s = cat(zz[i])
            code, ln = ac_codes[(run << 4) | s]
            bw.write(code, ln)
            bw.write(zz[i] if zz[i] > 0 else zz[i] + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, ln = ac_codes[0x00]
            bw.write(code, ln)

    mcus = [(my, mx)
            for my in range(0, ph, mcu_h) for mx in range(0, pw, mcu_w)]
    for mi, (my, mx) in enumerate(mcus):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.align()
            bw.marker(0xD0 + ((mi // restart_interval - 1) % 8))
            prev_dc[0] = prev_dc[1] = prev_dc[2] = 0
        for vy in range(sub_y):
            for vx in range(sub_x):
                write_block(y, my + 8 * vy, mx + 8 * vx, 0)
        write_block(cb_s, my // sub_y, mx // sub_x, 1)
        write_block(cr_s, my // sub_y, mx // sub_x, 2)

    def seg(marker: int, data: bytes) -> bytes:
        return struct.pack(">HH", marker, len(data) + 2) + data

    y_sampling = (sub_x << 4) | sub_y
    dqt = (seg(0xFFDB, bytes([0]) + bytes([quant] * 64))
           + seg(0xFFDB, bytes([1]) + bytes([quant] * 64)))
    sof0 = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 3)
               + bytes([1, y_sampling, 0, 2, 0x11, 1, 3, 0x11, 1]))
    dht = seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)) \
        + seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    dri = (seg(0xFFDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof0 + dht + dri + sos
            + bw.flush() + b"\xff\xd9")


def decode_jpeg_rgb(payload: bytes) -> tuple[int, int, bytes]:
    """``(width, height, rgb)`` from a baseline-DCT three-component
    (YCbCr) JPEG — stdlib + NumPy only.  Handles the standard sampling
    layouts with factors in {1, 2} per axis (4:2:0, 4:2:2, 4:4:4):
    MCU-interleaved entropy decode with per-component DC predictors and
    per-component quant/Huffman table ids, dequantize + IDCT per block,
    nearest-neighbor chroma upsampling, JFIF YCbCr→RGB, crop to SOF
    dimensions.  Single-component streams belong to ``decode_jpeg_gray``;
    progressive/arithmetic streams raise."""
    import struct

    if payload is None or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    try:
        return _decode_jpeg_rgb_inner(payload)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(f"corrupt JPEG stream: {e}") from e


def _decode_jpeg_rgb_inner(payload: bytes) -> tuple[int, int, bytes]:
    import struct

    import numpy as np

    pos = 2
    qtabs: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = None
    comps: list[tuple[int, int, int, int]] = []  # (id, hs, vs, tq)
    scan_tables: dict[int, tuple[int, int]] = {}  # comp id -> (td, ta)
    scan_order: list[int] = []
    restart_interval = 0
    scan_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG segment marker")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        data = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtabs[tq] = list(data[i + 1:i + 65])
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 0x0F
                bits = list(data[i + 1:i + 17])
                nvals = sum(bits)
                vals = list(data[i + 17:i + 17 + nvals])
                codes = _huffman_codes(bits, vals)
                huff[(tc, th)] = {
                    (ln, code): sym for sym, (code, ln) in codes.items()
                }
                i += 17 + nvals
        elif marker == 0xC0:
            _prec, h, w, ncomp = struct.unpack(">BHHB", data[:6])
            if ncomp != 3:
                raise ValueError(
                    "only three-component (YCbCr) JPEG is supported here"
                )
            for c in range(ncomp):
                cid = data[6 + 3 * c]
                hv = data[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, data[8 + 3 * c]))
            if any(hs not in (1, 2) or vs not in (1, 2)
                   for _, hs, vs, _ in comps):
                raise ValueError("sampling factors beyond 2 unsupported")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) JPEG is supported")
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", data[:2])[0]
        elif marker == 0xDA:
            ns = data[0]
            if ns != 3:
                raise ValueError("expected a three-component scan")
            for c in range(ns):
                cid = data[1 + 2 * c]
                tt = data[2 + 2 * c]
                scan_tables[cid] = (tt >> 4, tt & 0x0F)
                scan_order.append(cid)
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if w is None or scan_start is None or not comps:
        raise ValueError("JPEG missing SOF0/SOS")

    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    planes = {
        cid: np.zeros((mcus_y * 8 * vs, mcus_x * 8 * hs), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    C = _dct_matrix()

    def read_symbol(br: _BitReader, table) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | br.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")

    def extend(v: int, s: int) -> int:
        return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1

    br = _BitReader(payload, scan_start)
    prev_dc = {cid: 0 for cid, *_ in comps}
    for mi in range(mcus_x * mcus_y):
        if restart_interval and mi and mi % restart_interval == 0:
            br.nbits = 0
            p = br.pos
            while p + 1 < len(payload) and not (
                payload[p] == 0xFF and 0xD0 <= payload[p + 1] <= 0xD7
            ):
                p += 1
            br.pos = p + 2
            prev_dc = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(mi, mcus_x)
        for cid in scan_order:
            hs, vs, tq = by_id[cid]
            td, ta = scan_tables[cid]
            dc_table = huff[(0, td)]
            ac_table = huff[(1, ta)]
            qtab = np.array(qtabs[tq], dtype=np.float64)
            for vy in range(vs):
                for vx in range(hs):
                    zz = [0] * 64
                    s = read_symbol(br, dc_table)
                    diff = extend(br.read_bits(s), s) if s else 0
                    prev_dc[cid] += diff
                    zz[0] = prev_dc[cid]
                    k = 1
                    while k < 64:
                        sym = read_symbol(br, ac_table)
                        if sym == 0x00:
                            break
                        run, s = sym >> 4, sym & 0x0F
                        if s == 0:
                            if run != 15:
                                raise ValueError("invalid AC symbol")
                            k += 16
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC index out of range")
                        zz[k] = extend(br.read_bits(s), s)
                        k += 1
                    coef = np.zeros(64, dtype=np.float64)
                    for i in range(64):
                        coef[_ZIGZAG[i]] = zz[i] * qtab[i]
                    block = C.T @ coef.reshape(8, 8) @ C + 128.0
                    py = (my * vs + vy) * 8
                    px = (mx * hs + vx) * 8
                    planes[cid][py:py + 8, px:px + 8] = block

    # upsample each component to the full MCU grid, then convert + crop
    full = {}
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        full[cid] = np.repeat(np.repeat(p, vmax // vs, axis=0),
                              hmax // hs, axis=1)
    y_id, cb_id, cr_id = [cid for cid, *_ in comps]
    rgb = _ycbcr_to_rgb(full[y_id], full[cb_id], full[cr_id])
    out = np.clip(np.rint(rgb[:h, :w]), 0, 255).astype(np.uint8)
    return w, h, out.tobytes()


def _color_formula(doc_id: int, w: int, h: int):
    """The deterministic RGB synthesis pattern — 2×2-block-constant
    channels, so JPEG's 4:2:0 chroma box-mean is exact on it and the only
    JPEG loss is DCT float rounding (measured max per-pixel error ≤ 2 at
    flat quant 1).  The same closed form is re-derivable in DuckDB SQL
    (integer div + mod over the pixel grid), which is what lets the color
    pipeline be VALUE-hashed, not just row-counted."""
    import numpy as np

    br = np.arange(h)[:, None] // 2
    bc = np.arange(w)[None, :] // 2
    r = (br * 3 + bc * 5 + doc_id) % 256
    g = (br * 7 + bc * 11 + 2 * doc_id) % 256
    b = (br * 13 + bc * 17 + 3 * doc_id) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def _gif_color_palette() -> bytes:
    """The deterministic 256-entry RGB palette of the GIF color synthesis:
    ``palette[i] = ((3i) mod 256, (7i) mod 256, (11i) mod 256)`` — like
    ``_color_formula``, closed-form re-derivable in SQL."""
    return bytes(v for i in range(256)
                 for v in ((i * 3) % 256, (i * 7) % 256, (i * 11) % 256))


def _gif_color_indices(doc_id: int, w: int, h: int) -> bytes:
    """Palette indices of the GIF color synthesis:
    ``idx(p) = (5p + doc_id) mod 256`` over the flat pixel index."""
    return bytes((p * 5 + doc_id) % 256 for p in range(w * h))


def synthesize_color_media(df: DataFrame, text_col: str,
                           id_col: str) -> DataFrame:
    """Deterministic RGB media from a text table: every row gets a REAL
    decodable color payload at ``width = 4 + id % 29``, ``height =
    ceil(utf8_len / width)`` (min 1), rotating the three color
    containers — ``id % 3 == 0`` truecolor PNG (lossless, pixels =
    ``_color_formula``), ``1`` baseline YCbCr 4:2:0 JPEG (same pattern,
    lossy-by-format), ``2`` palette GIF (index-exact: pixels =
    ``palette[idx]`` from the closed-form palette/index formulas).
    Output matches ``MEDIA_SCHEMA`` with meta dimensions left 0 (unknown
    until ``attach_image_meta`` parses the real headers)."""
    gif_pal = _gif_color_palette()

    @F.pandas_udf(BinaryType())
    def payload(texts: pd.Series, ids: pd.Series) -> pd.Series:
        out = []
        for t, i in zip(texts, ids):
            i = int(i)
            nb = len((t or "").encode("utf-8"))
            w = 4 + i % 29
            h = max(1, -(-nb // w))
            if i % 3 == 2:
                out.append(_gif_rgb_bytes(_gif_color_indices(i, w, h),
                                          w, gif_pal))
                continue
            rgb = _color_formula(i, w, h).tobytes()
            out.append(_png_rgb_bytes(rgb, w) if i % 3 == 0
                       else _jpeg_rgb_bytes(rgb, w))
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("modality"),
        payload(F.col(text_col), F.col(id_col)).alias("payload"),
        F.struct(
            F.when(F.col(id_col) % 3 == 0, "image/png")
            .when(F.col(id_col) % 3 == 1, "image/jpeg")
            .otherwise("image/gif").alias("mime"),
            F.lit(0).cast("long").alias("width"),
            F.lit(0).cast("long").alias("height"),
            F.lit(0).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


COLOR_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_px", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("max_err", LongType()),
    ]
)


def color_image_stats(media: DataFrame) -> DataFrame:
    """Per-image color decode stats — REAL pixel work, Arrow-batched, no
    shuffle: decode each payload through its container (PNG truecolor,
    baseline 4:2:0 JPEG, or palette GIF — dispatched on magic bytes),
    report parsed dimensions, per-channel pixel sums of the DECODED
    image, and the max per-pixel deviation from the synthesis source
    pattern (0 for PNG/GIF by losslessness; ≤ 2 for JPEG by
    measurement)."""
    import numpy as np

    def work(batches):
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p)
                if raw[:8] == b"\x89PNG\r\n\x1a\n":
                    w, h, px = decode_png_rgb(raw)
                    mime = "image/png"
                elif raw[:6] in (b"GIF87a", b"GIF89a"):
                    w, h, px = decode_gif_rgb(raw)
                    mime = "image/gif"
                else:
                    w, h, px = decode_jpeg_rgb(raw)
                    mime = "image/jpeg"
                arr = np.frombuffer(px, np.uint8).reshape(h, w, 3)
                if mime == "image/gif":
                    pal = np.frombuffer(
                        _gif_color_palette(), np.uint8
                    ).reshape(256, 3)
                    src = pal[
                        np.frombuffer(
                            _gif_color_indices(int(mid), w, h), np.uint8
                        )
                    ].reshape(h, w, 3)
                else:
                    src = _color_formula(int(mid), w, h)
                err = int(np.abs(arr.astype(np.int64)
                                 - src.astype(np.int64)).max())
                rows.append((
                    int(mid), mime, w, h, w * h,
                    int(arr[..., 0].sum()), int(arr[..., 1].sum()),
                    int(arr[..., 2].sum()), err,
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in COLOR_STATS_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        work, schema=COLOR_STATS_SCHEMA
    )


def parse_audio_header(payload: bytes):
    """``(mime, sample_rate, n_channels, bits, n_samples, duration_ms)``
    from a RIFF/WAVE header WITHOUT touching the sample data — the chunk
    walk reads each chunk id + size and skips payload bytes, so a 100 TB
    triage pass costs header IO only.  Sample count comes from the
    ``fact`` chunk when present (required for compressed formats), else
    from the data size: PCM (tag 1) ``data/block_align``; IMA-ADPCM
    (tag 0x11) nibble arithmetic per block; G.711 µ/A-law (tags 7/6) one
    sample per byte.  Returns ``None`` for non-WAV payloads."""
    import struct

    if (payload is None or len(payload) < 12 or payload[:4] != b"RIFF"
            or payload[8:12] != b"WAVE"):
        return None
    pos = 12
    tag = ch = sr = bits = block = None
    fact_samples = None
    data_size = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        if cid == b"fmt " and sz >= 16 and pos + 24 <= len(payload):
            tag, ch, sr, _br, block, bits = struct.unpack(
                "<HHIIHH", payload[pos + 8:pos + 24]
            )
        elif cid == b"fact" and sz >= 4 and pos + 12 <= len(payload):
            fact_samples = struct.unpack(
                "<I", payload[pos + 8:pos + 12]
            )[0]
        elif cid == b"data":
            data_size = sz
        pos += 8 + sz + (sz & 1)
    if tag is None or sr in (None, 0) or data_size is None:
        return None
    if fact_samples is not None:
        n_samples = fact_samples
    elif tag == 1 and block:
        n_samples = data_size // block
    elif tag == 0x11 and block and ch:
        # per block: 4-byte/channel header holds 1 sample, remaining
        # bytes hold 2 nibble-samples each (public IMA-ADPCM WAV layout)
        per_block = 1 + (block - 4 * ch) * 2 // ch
        full, rem = divmod(data_size, block)
        n_samples = full * per_block
        if rem >= 4 * ch:
            n_samples += 1 + (rem - 4 * ch) * 2 // ch
    elif tag in (6, 7):
        n_samples = data_size // max(1, ch or 1)
    else:
        return None
    mime = "audio/wav"
    duration_ms = int(n_samples * 1000 / sr + 0.5)
    return mime, sr, ch, bits, n_samples, duration_ms


def parse_video_header(payload: bytes):
    """``(mime, width, height, fps_num, fps_den, n_frames, duration_ms)``
    from a y4m stream header + the TOTAL byte length only — no frame
    walk: frame size follows from the header's dimensions and colorspace
    (mono w·h; 420 1.5·w·h; 422 2·w·h; 444 3·w·h), so the frame count is
    ``(len − header) / (6 + frame_size)`` for parameterless ``FRAME\\n``
    markers (the layout every in-repo stream and mjpegtools default
    produces).  Returns ``None`` for non-y4m payloads."""
    got = parse_y4m_header(payload)
    if got is None:
        return None
    w, h, cs = got
    end = payload.find(b"\n")
    fps_num, fps_den = 25, 1
    for tok in payload[9:end].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("F") and ":" in t:
            a, b = t[1:].split(":", 1)
            try:
                fps_num, fps_den = int(a), int(b)
            except ValueError:
                pass
    if cs == "mono":
        fsz = w * h
    elif cs.startswith("420"):
        fsz = w * h * 3 // 2
    elif cs.startswith("422"):
        fsz = w * h * 2
    elif cs.startswith("444"):
        fsz = w * h * 3
    else:
        return None
    body = len(payload) - (end + 1)
    n_frames = body // (6 + fsz) if fsz else 0
    duration_ms = (
        int(n_frames * 1000 * fps_den / fps_num + 0.5) if fps_num else 0
    )
    return "video/x-yuv4mpeg", w, h, fps_num, fps_den, n_frames, duration_ms


def decode_image_rgb(payload: bytes) -> tuple[int, int, bytes]:
    """``(width, height, rgb)`` from any supported COLOR container,
    dispatched on magic bytes — the color companion of
    ``decode_image_gray``: truecolor/alpha PNG (alpha composited over
    black, i.e. premultiplied-dropped: ``c·a/255``), baseline YCbCr
    JPEG, palette GIF."""
    if payload and payload[:2] == b"\xff\xd8":
        return decode_jpeg_rgb(payload)
    if payload and payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_rgb(payload)
    if payload and payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) > 25:
        colortype = payload[25]
        if colortype in (4, 6):
            w, h, rgba = decode_png_rgba(payload)
            out = bytearray(3 * w * h)
            for i in range(w * h):
                a = rgba[4 * i + 3]
                out[3 * i] = rgba[4 * i] * a // 255
                out[3 * i + 1] = rgba[4 * i + 1] * a // 255
                out[3 * i + 2] = rgba[4 * i + 2] * a // 255
            return w, h, bytes(out)
    return decode_png_rgb(payload)
