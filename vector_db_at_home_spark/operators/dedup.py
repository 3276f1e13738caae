"""Deduplication operators for large-scale training-data pipelines.

Five strategies, all pure DataFrame plans (no Python in the hot path except
where noted), each designed so the shuffle volume stays proportional to the
candidate-pair set, not the full cross product:

- ``exact_dedup``          — hash-groupBy on content digest; one shuffle.
- ``ngram_jaccard_pairs``  — inverted shingle index self-join; exact Jaccard.
- ``minhash_lsh_pairs``    — MinHash signatures + banded LSH candidate
                             generation, verified with exact Jaccard.
- ``simhash_pairs``        — 64-bit SimHash + banded hamming candidates.
- ``cosine_topk_pairs``    — embedding near-dup by cosine, exact pairwise
                             (the LSH-bucketed scale path is
                             ``random_hyperplane_buckets``).

Scale notes: the inverted-index join is the classic "similarity join via
prefix/inverted index" — at 100 TB add a document-frequency cap on shingles
(drop shingles appearing in > F docs; they only generate useless candidate
pairs) and salt hot shingles.  MinHash banding keeps candidate generation
sub-quadratic; band width trades recall vs candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.distance import cosine_similarity


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def word_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3,
                  max_doc_freq: int | None = None) -> DataFrame:
    """Distinct word n-gram shingles per doc: ``(id, shingle)``.

    ``max_doc_freq`` drops shingles occurring in more than that many docs —
    the standard scale lever (a stop-shingle generates O(df^2) candidate
    pairs but almost never evidences a near-dup).  None = exact.
    """
    toks = _tokens(text_col)
    # guard: Spark sequence(1, 0) yields a DESCENDING [1, 0], not empty —
    # docs shorter than n shingles must produce an empty array explicitly
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
        ).alias("shingle"),
    ).distinct()
    if max_doc_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(
            freq.filter(F.col("df") <= max_doc_freq).select("shingle"), "shingle"
        )
    return sh


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup via content digest: ``(id, canonical_id)`` mapping for
    every row, canonical = min id among identical texts.  One shuffle on the
    digest; at 100 TB hash first so the shuffle key is 32 bytes, not the
    document."""
    digests = df.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("digest")
    )
    canon = digests.groupBy("digest").agg(F.min("id").alias("canonical_id"))
    return digests.join(canon, "digest").select("id", "canonical_id")


def exact_dedup_stats(df: DataFrame, text_col: str) -> DataFrame:
    """One-row dedup summary: total rows, distinct texts, rows that would be
    dropped by exact dedup."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.col(text_col)).alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct(F.col(text_col))).alias("n_dup_rows"),
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        n: int = 3, threshold: float = 0.5,
                        max_doc_freq: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity join: pairs ``(id_a, id_b, jaccard)``
    with ``jaccard >= threshold`` and ``id_a < id_b``.

    Plan: distinct shingles → sizes per doc → inverted-index self-join on
    shingle (only co-occurring docs pair up) → count = |intersection| →
    ``J = inter / (|A| + |B| - inter)`` (exact rational, cross-engine safe).
    """
    sh = word_shingles(df, text_col, id_col, n, max_doc_freq)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    jac = (
        F.col("inter").cast("double")
        / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    )
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .filter(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


NUM_PERM_DEFAULT = 64
BANDS_DEFAULT = 16  # 16 bands x 4 rows over 64 perms

# ---------------------------------------------------------------------------
# Cross-engine hashing: every hash below is md5-derived so the DuckDB oracle
# can compute the IDENTICAL integers (DuckDB has no xxhash64).  Spark uses
# conv(substr(md5(x), off, len), 16, 10); the SQL renderers emit an exact
# hex-digit fold for the same value.  All values are < 2^60, so BIGINT-safe
# in both engines.
# ---------------------------------------------------------------------------


def _md5_h32(col: Column, off: int) -> Column:
    """32-bit integer from md5 hex digits [off, off+8) (1-based)."""
    return F.conv(F.substring(F.md5(col), off, 8), 16, 10).cast("long")


def _md5_h60(col: Column) -> Column:
    """60-bit integer from the first 15 md5 hex digits."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _sql_hex2int(expr: str, start: int, length: int) -> str:
    """DuckDB rendering of the same hex-digit→integer fold (exact integer
    arithmetic, bit-identical to Spark's conv)."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range({start}, {start + length}), "
        f"i -> CAST(strpos('0123456789abcdef', substr({expr}, i, 1)) - 1 "
        "AS BIGINT))), (a, b) -> a * 16 + b)"
    )


def hashed_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3,
                    max_doc_freq: int | None = None) -> DataFrame:
    """Distinct word-n-gram shingles per doc, pre-hashed to integers:
    ``(id, h1, h2, h60)`` with one md5 per shingle instance.

    The shingle STRING never crosses a shuffle: hashing happens in the
    explode projection, the distinct and every downstream join carry
    24-byte integer rows.  ``max_doc_freq`` (the stop-shingle cap) is a
    window count over ``h60`` — same partitioning the distinct already
    produced, no extra join.  Exactly reproducible in DuckDB (md5 + hex
    fold), which is what makes the MinHash/SimHash oracles possible.
    """
    from pyspark.sql import Window

    toks = _tokens(text_col)
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    hx = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(
                starts, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n)))
            )
        ).alias("hx"),
    )
    hs = hx.select(
        "id",
        F.conv(F.substring("hx", 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring("hx", 9, 8), 16, 10).cast("long").alias("h2"),
        F.conv(F.substring("hx", 1, 15), 16, 10).cast("long").alias("h60"),
    )
    if max_doc_freq is not None:
        # ONE shuffle for distinct + doc-frequency cap: hash-partitioning by
        # h60 satisfies the distinct's clustered-distribution requirement
        # (h60 ⊆ the grouping keys) AND the window's partitioning — Spark
        # reuses the exchange for both.
        w = Window.partitionBy("h60")
        hs = (
            hs.repartition(F.col("h60"))
            .distinct()
            .withColumn("dfc", F.count(F.lit(1)).over(w))
            .filter(F.col("dfc") <= max_doc_freq)
            .drop("dfc")
        )
    else:
        hs = hs.distinct()
    return hs


def minhash_signatures(sh: DataFrame, num_perm: int = NUM_PERM_DEFAULT) -> DataFrame:
    """MinHash signature per doc from a ``(id, shingle)`` set.

    One md5 per shingle; permutation i is the Kirsch–Mitzenmacher
    construction ``h1 + i*h2`` over two independent 32-bit md5 halves
    (values < 2^38 — exact in 64-bit, and 64× cheaper than hashing per
    permutation).  The signature is the elementwise min — ``num_perm``
    partial-aggregating ``min()`` columns in ONE groupBy (one shuffle,
    map-side combined).
    """
    h = sh.select(
        "id", _md5_h32(F.col("shingle"), 1).alias("h1"),
        _md5_h32(F.col("shingle"), 9).alias("h2"),
    )
    mins = [
        F.min(F.col("h1") + i * F.col("h2")).alias(f"h{i}")
        for i in range(num_perm)
    ]
    sig = h.groupBy("id").agg(*mins)
    return sig.select(
        "id", F.array(*[f"h{i}" for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str,
                      n: int = 3, threshold: float = 0.5,
                      num_perm: int = NUM_PERM_DEFAULT,
                      bands: int = BANDS_DEFAULT,
                      max_doc_freq: int | None = None,
                      max_band_bucket: int | None = None) -> DataFrame:
    """Near-dup pairs via MinHash + banded LSH, verified with exact Jaccard.

    Candidate pairs come from equal band hashes (band = r consecutive
    signature slots, r = num_perm / bands); each candidate is then verified
    against the true shingle sets, so the output has NO false positives —
    LSH only bounds recall.  Shuffles: one for signatures, one for the band
    self-join, one for the verify join.  The full cross product never forms.

    Scale levers (both replicated exactly by the DuckDB oracle):

    - ``max_doc_freq``: drop shingles present in more than that many docs
      (stop-shingles generate O(df²) candidates but almost never evidence a
      near-dup).
    - ``max_band_bucket``: skip band buckets holding more than that many
      docs — the hot-bucket guard: a viral boilerplate band would otherwise
      self-join quadratically.  Pairs in an oversized bucket are still found
      via their other ``bands-1`` bands unless they collide there too.

    Output: ``(id_a, id_b, jaccard_e6)`` with the verified Jaccard scaled to
    an integer (``floor(j*1e6 + 0.5)``) — cross-engine hash-stable.
    """
    # hashed shingles feed both the signature pass and the exact-verify
    # pass — cache so the explode+distinct runs once, not twice.  The cache
    # pins executor memory for the session: the returned DataFrame exposes
    # it as ``result.cached_shingles`` so long-lived callers can
    # ``.unpersist()`` once the result is materialized.
    from pyspark.sql import Window

    rows = num_perm // bands
    sh = hashed_shingles(df, text_col, id_col, n, max_doc_freq).cache()
    # signatures AND set sizes in ONE partial-aggregating groupBy — the
    # verify stage needs |shingles(doc)| anyway, and a separate count pass
    # would re-shuffle the whole set
    agg_cols = [
        F.min(F.col("h1") + i * F.col("h2")).alias(f"h{i}")
        for i in range(num_perm)
    ] + [F.count(F.lit(1)).alias("sz")]
    sig_sz = sh.groupBy("id").agg(*agg_cols)
    sizes = sig_sz.select("id", "sz")
    band_rows = sig_sz.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _md5_h60(
                            F.concat_ws(
                                "_",
                                *[
                                    F.col(f"h{b * rows + r}").cast("string")
                                    for r in range(rows)
                                ],
                            )
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bhash")
    if max_band_bucket is not None:
        # hot-bucket guard as a window count — the window's (band, bhash)
        # partitioning is exactly the self-join key, so the exchange is
        # reused rather than adding an aggregate+join round trip
        wb = Window.partitionBy("band", "bhash")
        band_rows = (
            band_rows.withColumn("bucket_n", F.count(F.lit(1)).over(wb))
            .filter(F.col("bucket_n") <= max_band_bucket)
            .drop("bucket_n")
        )
    a = band_rows.select(F.col("id").alias("id_a"), "band", "bhash")
    b = band_rows.select(F.col("id").alias("id_b"), "band", "bhash")
    candidates = (
        a.join(b, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # exact-Jaccard verification restricted to candidates; shingle identity
    # is the 60-bit hash (cross-engine identical, so the oracle replicates
    # collisions too, in the 2^-60 event one occurs)
    sa = sh.select(F.col("id").alias("id_a"), "h60")
    sb = sh.select(F.col("id").alias("id_b"), "h60")
    inter = (
        candidates.join(sa, "id_a")
        .join(sb, ["id_b", "h60"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = (
        F.col("inter").cast("double")
        / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    )
    result = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .filter(jac >= threshold)
        .select(
            "id_a", "id_b",
            F.floor(jac * 1e6 + F.lit(0.5)).cast("long").alias("jaccard_e6"),
        )
        .orderBy("id_a", "id_b")
    )
    result.cached_shingles = sh  # caller may .unpersist() after materializing
    return result


def _sql_hashed_shingle_cte(max_doc_freq: int | None, n: int = 3) -> str:
    """DuckDB CTEs producing the same distinct hashed shingle set
    ``(id, h1, h2, h60)`` as ``hashed_shingles`` (md5 at explode time,
    distinct on the integer tuple, window-count doc-frequency cap)."""
    base = f"""
toks AS (SELECT doc_id AS id, string_split(text, ' ') AS t FROM documents),
shx AS (SELECT id, md5(array_to_string(list_slice(t, i, i + {n - 1}), ' ')) AS hx
        FROM toks, unnest(range(1, len(t) - {n - 2})) AS r(i)),
sh0 AS (SELECT DISTINCT id, {_sql_hex2int('hx', 1, 8)} AS h1,
               {_sql_hex2int('hx', 9, 8)} AS h2,
               {_sql_hex2int('hx', 1, 15)} AS h60
        FROM shx)"""
    if max_doc_freq is None:
        return base + ",\nsh AS (SELECT * FROM sh0)"
    return base + f""",
sh AS (SELECT id, h1, h2, h60 FROM
         (SELECT sh0.*, count(*) OVER (PARTITION BY h60) AS dfc FROM sh0)
       WHERE dfc <= {max_doc_freq})"""


def render_minhash_lsh_sql(n: int = 3, threshold: float = 0.5,
                           num_perm: int = NUM_PERM_DEFAULT,
                           bands: int = BANDS_DEFAULT,
                           max_doc_freq: int | None = None,
                           max_band_bucket: int | None = None) -> str:
    """DuckDB oracle for ``minhash_lsh_pairs`` over the ``documents`` table —
    the exact same md5-derived permutations, banding, bucket cap and verify
    join, so the output matches the Spark plan value-for-value."""
    rows = num_perm // bands
    mins = ", ".join(
        f"min(h1 + {i} * h2) AS h{i}" for i in range(num_perm)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT id, {b} AS band, md5("
        + " || '_' || ".join(
            f"CAST(h{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        + ") AS bhex FROM sig"
        for b in range(bands)
    )
    bucket_cap = ""
    bd_src = "bd0"
    if max_band_bucket is not None:
        bucket_cap = f""",
bd AS (SELECT id, band, bhash FROM
         (SELECT bd0.*, count(*) OVER (PARTITION BY band, bhash) AS bucket_n
          FROM bd0)
       WHERE bucket_n <= {max_band_bucket})"""
        bd_src = "bd"
    return f"""
WITH {_sql_hashed_shingle_cte(max_doc_freq, n)},
sig AS (SELECT id, {mins}, count(*) AS sz FROM sh GROUP BY id),
bk AS ({band_selects}),
bd0 AS (SELECT id, band, {_sql_hex2int('bhex', 1, 15)} AS bhash FROM bk){bucket_cap},
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM {bd_src} a JOIN {bd_src} b
           ON a.band = b.band AND a.bhash = b.bhash AND a.id < b.id),
inter AS (SELECT cand.id_a, cand.id_b, count(*) AS ic
          FROM cand
          JOIN sh sa ON sa.id = cand.id_a
          JOIN sh sb ON sb.id = cand.id_b AND sb.h60 = sa.h60
          GROUP BY cand.id_a, cand.id_b),
jac AS (SELECT id_a, id_b,
               CAST(ic AS DOUBLE) / (sa.sz + sb.sz - ic) AS j
        FROM inter
        JOIN sig sa ON sa.id = id_a
        JOIN sig sb ON sb.id = id_b)
SELECT id_a, id_b, CAST(floor(j * 1000000 + 0.5) AS BIGINT) AS jaccard_e6
FROM jac WHERE j >= {threshold} ORDER BY id_a, id_b
"""


SIMHASH_BITS = 60  # md5-derived 60-bit hash (15 hex digits — BIGINT-safe
#                    in both engines; 16 digits could overflow signed 64)


def _band_bounds(nbands: int, bits: int = SIMHASH_BITS) -> list[tuple[int, int]]:
    """Split ``bits`` into ``nbands`` contiguous (offset, width) chunks with
    widths differing by at most 1 — the pigeonhole partition."""
    base, extra = divmod(bits, nbands)
    bounds, off = [], 0
    for b in range(nbands):
        w = base + (1 if b < extra else 0)
        bounds.append((off, w))
        off += w
    return bounds


def simhash60(df: DataFrame, text_col: str, id_col: str,
              n: int = 3) -> DataFrame:
    """60-bit SimHash per doc over word n-gram shingles: ``(id, simhash)``.

    Per distinct shingle, each of the 60 bits of the md5-derived hash votes
    ±1; the fingerprint sets bit k where the vote sum is positive.  Shingles
    (not unigrams) are the feature set: with a small shared vocabulary,
    distinct-unigram sets collide for unrelated docs, while n-gram sets
    mirror the Jaccard ground truth.  The hash is md5-derived (not xxhash64)
    so the DuckDB oracle computes identical fingerprints.

    Plan shape: NO bit explode — the 60 per-bit vote sums are 60 conditional
    ``sum((h>>k)&1)`` columns in ONE map-combined groupBy (the ±1 vote sum
    being positive ⟺ ``2*ones_k > n_shingles``), so the only shuffle
    carries one 61-column row per doc, not 60 rows per shingle.
    """
    h = hashed_shingles(df, text_col, id_col, n).select(
        "id", F.col("h60").alias("h")
    )
    aggs = [
        F.sum(
            F.shiftright(F.col("h"), k).bitwiseAND(F.lit(1)).cast("long")
        ).alias(f"s{k}")
        for k in range(SIMHASH_BITS)
    ] + [F.count(F.lit(1)).alias("n")]
    ones = h.groupBy("id").agg(*aggs)
    fingerprint = None
    for k in range(SIMHASH_BITS):
        bit = F.when(
            F.col(f"s{k}") * 2 > F.col("n"), F.lit(1 << k).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return ones.select("id", fingerprint.alias("simhash"))


def simhash_pairs(df: DataFrame, text_col: str, id_col: str,
                  max_hamming: int = 5) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming``.

    Candidate generation by the pigeonhole band trick: split the 60 bits
    into ``max_hamming + 1`` bands; any pair within distance ``max_hamming``
    agrees exactly on at least one band, so a self-join per band finds all
    of them without a cross product.  Verification is ``bit_count(XOR)``.
    """
    nbands = max_hamming + 1
    bounds = _band_bounds(nbands)
    sig = simhash60(df, text_col, id_col)
    bands = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), off)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("bkey"),
                    )
                    for b, (off, w) in enumerate(bounds)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", "bk.band", "bk.bkey")
    a = bands.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "band", "bkey"
    )
    b = bands.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "band", "bkey"
    )
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
            .cast("long")
            .alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


def render_simhash_sql(n: int = 3, max_hamming: int = 5) -> str:
    """DuckDB oracle for ``simhash_pairs`` over ``documents`` — identical
    md5-derived 60-bit fingerprints, pigeonhole bands and hamming verify."""
    nbands = max_hamming + 1
    bounds = _band_bounds(nbands)
    band_rows = ", ".join(
        f"({b}, {off}, {(1 << w) - 1})" for b, (off, w) in enumerate(bounds)
    )
    ones = ", ".join(
        f"sum((h >> {k}) & 1) AS s{k}" for k in range(SIMHASH_BITS)
    )
    fp_sum = " + ".join(
        f"CASE WHEN s{k} * 2 > n THEN CAST({1 << k} AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END"
        for k in range(SIMHASH_BITS)
    )
    return f"""
WITH {_sql_hashed_shingle_cte(None, n)},
hs AS (SELECT id, h60 AS h FROM sh),
ones AS (SELECT id, {ones}, count(*) AS n FROM hs GROUP BY id),
fp AS (SELECT id, {fp_sum} AS simhash FROM ones),
bspec(band, boff, bmask) AS (VALUES {band_rows}),
bd AS (SELECT id, simhash, band, (simhash >> boff) & bmask AS bkey
       FROM fp, bspec),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                bit_count(xor(a.simhash, b.simhash)) AS hamming
         FROM bd a JOIN bd b
           ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id)
SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
FROM cand WHERE hamming <= {max_hamming} ORDER BY id_a, id_b
"""


def cosine_topk_pairs(df: DataFrame, vec_col: str, id_col: str,
                      k: int = 20) -> DataFrame:
    """Top-k most-similar embedding pairs by cosine — exact pairwise.

    O(N^2) distances but only the global top-k survives
    (TakeOrderedAndProject — nothing materializes the pair matrix).  For
    N beyond ~10^5 use ``random_hyperplane_buckets`` to restrict pairs to
    same-bucket candidates first.
    """
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    a = vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    sim = cosine_similarity("va", "vb")
    return (
        pairs.select("id_a", "id_b", F.round(sim, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(k)
    )


def cosine_topk_pairs_fast(df: DataFrame, vec_col: str, id_col: str,
                           k: int = 20) -> DataFrame:
    """GEMM path for ``cosine_topk_pairs``: the full normalized matrix is a
    broadcast variable; each partition computes its block × matrix product
    with NumPy and emits only its local top-k pairs, merged by a global
    top-k.  Same result as the expression path (oracle-checked there), ~50×
    faster at 10^3-10^5 rows.  Beyond that, restrict candidates with
    ``random_hyperplane_buckets`` first — the broadcast matrix is the
    limiting factor, not the compute.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    rows = df.select(id_col, vec_col).collect()
    ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    mat = np.asarray([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    bc = spark.sparkContext.broadcast((ids, mat / norms, k))

    def block_topk(batches):
        b_ids, b_nmat, b_k = bc.value
        pos = {int(i): p for p, i in enumerate(b_ids)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            my_ids = pdf["__id"].to_numpy(dtype=np.int64)
            my_pos = np.asarray([pos[int(i)] for i in my_ids])
            block = b_nmat[my_pos]
            sims = block @ b_nmat.T                     # (m, N)
            # mask self and enforce id_a < id_b (pair counted once, on the
            # partition holding the smaller id)
            mask = my_ids[:, None] >= b_ids[None, :]
            sims[mask] = -2.0
            kk = min(b_k, sims.shape[1])
            # Local top-k under the full contract order (cosine DESC, id_b
            # ASC; id_a fixed per row): lexsort keeps exactly kk candidates
            # per row — bounded emission even when the corpus is mostly
            # exact duplicates (a dedup input's degenerate-but-expected
            # case), and ties resolve to the lowest id like the exact path.
            frames = []
            for i in range(sims.shape[0]):
                order = np.lexsort((b_ids, -sims[i]))[:kk]
                s = sims[i, order]
                keep = s > -2.0
                frames.append(pd.DataFrame(
                    {"id_a": np.full(keep.sum(), my_ids[i]),
                     "id_b": b_ids[order][keep],
                     "cosine": np.round(s[keep], 6)}
                ))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    narrow = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"))
    cand = narrow.mapInPandas(block_topk, schema="id_a long, id_b long, cosine double")
    return cand.orderBy(
        F.col("cosine").desc(), F.col("id_a").asc(), F.col("id_b").asc()
    ).limit(k)


def random_hyperplane_buckets(df: DataFrame, vec_col: str, id_col: str,
                              n_planes: int = 16, seed: int = 42) -> DataFrame:
    """Sign-LSH bucketing for cosine similarity: ``(id, bucket)``.

    Hyperplanes are derived deterministically from ``xxhash64(plane_idx,
    dim_idx, seed)`` mapped to ±1 components (a Rademacher projection —
    public-knowledge random-hyperplane LSH).  Vectors with high cosine
    similarity collide with probability ``(1 - θ/π)^n_planes``.  Candidate
    pairs = same-bucket pairs; at scale run multiple hash tables (vary seed).
    """
    sign_bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.transform(
                        F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
                        lambda j: (
                            F.xxhash64(F.lit(p), j, F.lit(seed))
                            .bitwiseAND(F.lit(1))
                            .cast("double")
                            * 2.0
                            - 1.0
                        ),
                    ),
                    lambda x, r: x.cast("double") * r,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            F.lit(1).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        for p in range(n_planes)
    ]
    bucket = sign_bits[0]
    for i, bit in enumerate(sign_bits[1:], start=1):
        bucket = bucket + F.shiftleft(bit, i)
    return df.select(F.col(id_col).alias("id"), bucket.alias("bucket"))
