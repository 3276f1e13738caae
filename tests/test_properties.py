"""Property-based tests (Hypothesis) for the pure-Python kernels.

These run without Spark, so they explore thousands of cases cheaply:
- InDel ratio: metric properties + exact agreement with a reference DP LCS
(The rolling-fingerprint and Jaccard formulas are validated against the
ACTUAL Spark expressions in test_textstats.py and test_dedup.py — a pure-
Python restatement here would be a tautology.)
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from vector_db_at_home_spark.functions.fuzzy import _lcs_length, indel_ratio

text = st.text(alphabet="abcdef {}:\"',", max_size=60)


def lcs_dp(a: str, b: str) -> int:
    prev = [0] * (len(b) + 1)
    for ca in a:
        curr = [0]
        for j, cb in enumerate(b):
            curr.append(prev[j] + 1 if ca == cb else max(prev[j + 1], curr[-1]))
        prev = curr
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(text, text)
def test_bitparallel_lcs_equals_dp(a, b):
    assert _lcs_length(a, b) == lcs_dp(a, b)


@settings(max_examples=300, deadline=None)
@given(text, text)
def test_indel_ratio_bounds_and_symmetry(a, b):
    r = indel_ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert indel_ratio(b, a) == r  # symmetric


@settings(max_examples=100, deadline=None)
@given(text)
def test_indel_ratio_identity(a):
    assert indel_ratio(a, a) == 100.0


@settings(max_examples=200, deadline=None)
@given(text, text)
def test_indel_ratio_formula(a, b):
    # ratio = 100 * (1 - (len1+len2-2*LCS)/(len1+len2))
    total = len(a) + len(b)
    if total == 0:
        assert indel_ratio(a, b) == 100.0
    else:
        expected = 100.0 * (1.0 - (total - 2 * lcs_dp(a, b)) / total)
        assert abs(indel_ratio(a, b) - expected) < 1e-9


# --- sequence-packing kernel (operators/sampling.py) ---

from vector_db_at_home_spark.operators.sampling import first_fit_decreasing

sizes_strategy = st.lists(st.integers(min_value=1, max_value=2000),
                          max_size=200)


@settings(max_examples=300, deadline=None)
@given(sizes_strategy, st.integers(min_value=2, max_value=1024))
def test_ffd_invariants(sizes, max_tokens):
    ordered = sorted(sizes, reverse=True)
    assign = first_fit_decreasing(ordered, max_tokens)
    assert len(assign) == len(ordered)
    fill: dict[int, int] = {}
    singleton: set[int] = set()
    for t, b in zip(ordered, assign):
        fill[b] = fill.get(b, 0) + t
        if t >= max_tokens:
            singleton.add(b)
    # oversized items sit alone; every other bin respects the budget
    for b, total in fill.items():
        if b in singleton:
            assert sum(1 for x in assign if x == b) == 1
        else:
            assert total <= max_tokens
    # bin ids are dense 0..n-1 in first-use order
    assert sorted(set(assign)) == list(range(len(fill)))
    # bin count is within the FFD guarantee envelope of the volume bound
    small_total = sum(t for t in ordered if t < max_tokens)
    lower = -(-small_total // max_tokens) if small_total else 0
    n_small_bins = len(fill) - len(singleton)
    assert n_small_bins <= max(2 * lower, lower + 1) or n_small_bins == 0


# --- PNG header synthesis/parse roundtrip (operators/multimodal.py) ---

from vector_db_at_home_spark.operators.multimodal import (
    _png_bytes,
    parse_image_header,
)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400),
       st.integers(min_value=1, max_value=64))
def test_png_roundtrip_any_payload(pixels, width):
    png = _png_bytes(pixels, width)
    height = max(1, -(-len(pixels) // width))
    assert parse_image_header(png) == ("image/png", width, height)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_parse_never_crashes_on_garbage(blob):
    # arbitrary bytes: either a well-formed answer or None, never a raise
    got = parse_image_header(blob)
    assert got is None or (len(got) == 3 and got[1] >= 0 and got[2] >= 0)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400),
       st.integers(min_value=1, max_value=64))
def test_png_pixel_decode_roundtrip_any_payload(pixels, width):
    from vector_db_at_home_spark.operators.multimodal import decode_png_gray

    png = _png_bytes(pixels, width)
    w, h, got = decode_png_gray(png)
    assert w == width
    assert h == max(1, -(-len(pixels) // width))
    assert got == pixels.ljust(w * h, b"\x00")


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=1, max_size=240),
       st.integers(min_value=1, max_value=16),
       st.lists(st.integers(min_value=0, max_value=4), min_size=1,
                max_size=16))
def test_png_decode_inverts_random_filter_choices(pixels, width, filters):
    """For ANY per-row filter assignment a conformant encoder could pick,
    the decoder reconstructs the original pixels (forward-filter here is
    written from the public spec, independently of the decoder)."""
    import struct
    import zlib

    from vector_db_at_home_spark.operators.multimodal import decode_png_gray

    w = width
    h = max(1, -(-len(pixels) // w))
    padded = pixels.ljust(w * h, b"\x00")
    rows = [padded[r * w:(r + 1) * w] for r in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    raw = b""
    prev = bytes(w)
    for r in range(h):
        ft = filters[r % len(filters)]
        line = rows[r]
        if ft == 0:
            enc = line
        elif ft == 1:
            enc = bytes((line[i] - (line[i - 1] if i else 0)) & 0xFF
                        for i in range(w))
        elif ft == 2:
            enc = bytes((line[i] - prev[i]) & 0xFF for i in range(w))
        elif ft == 3:
            enc = bytes(
                (line[i] - (((line[i - 1] if i else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(w))
        else:
            enc = bytes(
                (line[i] - paeth(line[i - 1] if i else 0, prev[i],
                                 prev[i - 1] if i else 0)) & 0xFF
                for i in range(w))
        raw += bytes([ft]) + enc
        prev = line

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    got_w, got_h, got = decode_png_gray(png)
    assert (got_w, got_h, got) == (w, h, padded)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300), st.integers(min_value=1, max_value=40))
def test_jpeg_roundtrip_any_payload(pixels, width):
    """Baseline JPEG with quant=1: decode recovers every pixel within 2
    (DCT float rounding only), exact dimensions, for arbitrary bytes."""
    from vector_db_at_home_spark.operators.multimodal import (
        _jpeg_bytes,
        decode_jpeg_gray,
        parse_image_header,
    )

    enc = _jpeg_bytes(pixels, width)
    h = max(1, (len(pixels) + width - 1) // width)
    assert parse_image_header(enc) == ("image/jpeg", width, h)
    w2, h2, px = decode_jpeg_gray(enc)
    assert (w2, h2) == (width, h)
    want = pixels.ljust(width * h, b"\x00")
    assert len(px) == len(want)
    assert max(abs(a - b) for a, b in zip(px, want)) <= 2 if want else True


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=2000), st.integers(min_value=1, max_value=40))
def test_gif_roundtrip_any_payload_lossless(pixels, width):
    from vector_db_at_home_spark.operators.multimodal import (
        _gif_bytes,
        decode_gif_gray,
        parse_image_header,
    )

    enc = _gif_bytes(pixels, width)
    h = max(1, (len(pixels) + width - 1) // width)
    assert parse_image_header(enc) == ("image/gif", width, h)
    w2, h2, px = decode_gif_gray(enc)
    assert (w2, h2) == (width, h)
    assert px == pixels.ljust(width * h, b"\x00")


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=2000))
def test_wav_roundtrip_any_payload_lossless(samples):
    from vector_db_at_home_spark.operators.multimodal import (
        _wav_bytes,
        decode_wav_pcm,
    )

    sr, n, out = decode_wav_pcm(_wav_bytes(samples, 8000))
    assert (sr, n, out) == (8000, len(samples), samples)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=1500), st.integers(min_value=1, max_value=30))
def test_y4m_roundtrip_any_payload_lossless(stream, width):
    from vector_db_at_home_spark.operators.multimodal import (
        _y4m_bytes,
        decode_y4m_gray,
    )

    w2, h2, frames = decode_y4m_gray(_y4m_bytes(stream, width, 8))
    assert (w2, h2) == (width, 8)
    total = b"".join(frames)
    assert total == stream.ljust(len(frames) * width * 8, b"\x00")


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=100), st.integers(min_value=0, max_value=4))
def test_media_decoders_never_crash_on_magic_prefixed_garbage(blob, which):
    """Every decoder either succeeds or raises ValueError on arbitrary
    bytes AFTER its own magic (the hard case: the header check passes and
    the parser walks truncated structures) — never an unhandled
    IndexError/struct.error/KeyError."""
    from vector_db_at_home_spark.operators.multimodal import (
        decode_gif_gray,
        decode_jpeg_gray,
        decode_png_gray,
        decode_wav_pcm,
        decode_y4m_gray,
    )

    magics = [
        (decode_png_gray, b"\x89PNG\r\n\x1a\n"),
        (decode_jpeg_gray, b"\xff\xd8"),
        (decode_gif_gray, b"GIF89a"),
        (decode_wav_pcm, b"RIFF\x10\x00\x00\x00WAVE"),
        (decode_y4m_gray, b"YUV4MPEG2 "),
    ]
    dec, magic = magics[which]
    try:
        dec(magic + blob)
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=1200))
def test_adpcm_roundtrip_any_payload(samples):
    """IMA-ADPCM on arbitrary bytes: sample count always preserved (incl.
    the multi-block and final-partial-block paths), output bytes valid,
    and the decode is a pure function of the payload (re-decode equal)."""
    from vector_db_at_home_spark.operators.multimodal import (
        _adpcm_wav_bytes,
        decode_wav_adpcm,
    )

    payload = _adpcm_wav_bytes(samples)
    rate, n, out = decode_wav_adpcm(payload)
    assert (rate, n, len(out)) == (8000, len(samples), len(samples))
    assert decode_wav_adpcm(payload)[2] == out


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=600),
       st.sampled_from(["ulaw", "alaw"]))
def test_g711_roundtrip_any_payload(samples, law):
    """G.711 on arbitrary bytes: count preserved, every sample within the
    8-bit companding error bound (2/255)."""
    from vector_db_at_home_spark.operators.multimodal import (
        _g711_wav_bytes,
        decode_wav,
    )

    rate, n, out = decode_wav(_g711_wav_bytes(samples, law))
    assert (rate, n) == (8000, len(samples))
    assert all(abs(a - b) <= 2 for a, b in zip(samples, out))


# ---------------------------------------------------------------------------
# Round-6 decoder robustness fuzzing: corrupted media payloads must raise
# the decoder's documented ValueError (or decode successfully, when the
# mutation misses load-bearing bytes) — never hang, never escape with an
# arbitrary exception.  A 100 TB corpus WILL contain truncated and
# bit-flipped files; the pipeline's error contract is what lets callers
# route them to quarantine instead of crashing an executor.
# ---------------------------------------------------------------------------


def _mutate(payload: bytes, pos: int, mode: int, cut: int) -> bytes:
    if mode == 0:                      # flip a byte
        pos = pos % max(1, len(payload))
        return payload[:pos] + bytes([payload[pos] ^ 0xFF]) \
            + payload[pos + 1:]
    if mode == 1:                      # truncate
        return payload[:cut % max(1, len(payload))]
    pos = pos % max(1, len(payload))   # insert garbage
    return payload[:pos] + b"\xde\xad" + payload[pos:]


def _assert_decodes_or_value_errors(decoder, payload: bytes) -> None:
    try:
        decoder(payload)
    except ValueError:
        pass  # the documented corrupt-stream contract


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 1 << 30), st.integers(0, 2), st.integers(0, 1 << 30),
       st.binary(min_size=0, max_size=60))
def test_png_decoders_never_escape_valueerror(pos, mode, cut, pixels):
    from vector_db_at_home_spark.operators.multimodal import (
        _png_bytes,
        _png_rgb_bytes,
        decode_png_gray,
        decode_png_rgb,
    )

    from vector_db_at_home_spark.operators.multimodal import (
        _png_rgba_bytes,
        decode_png_rgba,
    )

    gray = _mutate(_png_bytes(pixels, 5), pos, mode, cut)
    _assert_decodes_or_value_errors(decode_png_gray, gray)
    rgb = _mutate(_png_rgb_bytes((pixels * 3)[:3 * len(pixels)], 5),
                  pos, mode, cut)
    _assert_decodes_or_value_errors(decode_png_rgb, rgb)
    rgba = _mutate(_png_rgba_bytes((pixels * 4)[:4 * len(pixels)], 5),
                   pos, mode, cut)
    _assert_decodes_or_value_errors(decode_png_rgba, rgba)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 1 << 30), st.integers(0, 2), st.integers(0, 1 << 30),
       st.binary(min_size=0, max_size=60))
def test_jpeg_decoders_never_escape_valueerror(pos, mode, cut, pixels):
    from vector_db_at_home_spark.operators.multimodal import (
        _jpeg_bytes,
        _jpeg_rgb_bytes,
        decode_jpeg_gray,
        decode_jpeg_rgb,
    )

    gray = _mutate(_jpeg_bytes(pixels, 5), pos, mode, cut)
    _assert_decodes_or_value_errors(decode_jpeg_gray, gray)
    rgb = _mutate(_jpeg_rgb_bytes((pixels * 3)[:3 * len(pixels)], 5),
                  pos, mode, cut)
    _assert_decodes_or_value_errors(decode_jpeg_rgb, rgb)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 1 << 30), st.integers(0, 2), st.integers(0, 1 << 30),
       st.binary(min_size=0, max_size=60))
def test_gif_wav_y4m_decoders_never_escape_valueerror(pos, mode, cut,
                                                      payload):
    from vector_db_at_home_spark.operators.multimodal import (
        _gif_bytes,
        _wav_bytes,
        _y4m_bytes,
        decode_gif_gray,
        decode_gif_rgb,
        decode_wav,
        decode_y4m_gray,
    )

    gif = _mutate(_gif_bytes(payload, 5), pos, mode, cut)
    _assert_decodes_or_value_errors(decode_gif_gray, gif)
    _assert_decodes_or_value_errors(decode_gif_rgb, gif)
    wav = _mutate(_wav_bytes(payload), pos, mode, cut)
    _assert_decodes_or_value_errors(decode_wav, wav)
    y4m = _mutate(_y4m_bytes(payload, 6, 4), pos, mode, cut)
    _assert_decodes_or_value_errors(decode_y4m_gray, y4m)
