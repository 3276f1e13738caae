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


def minhash_signatures(sh: DataFrame, num_perm: int = NUM_PERM_DEFAULT) -> DataFrame:
    """MinHash signature per doc from a ``(id, shingle)`` set.

    Permutation i is simulated by ``xxhash64(shingle, i)`` (xxhash64 is
    Spark-native, JVM-side, seed-stable); the signature is the elementwise
    min — computed as ``num_perm`` partial-aggregating ``min()`` columns in
    ONE groupBy (one shuffle, map-side combined).
    """
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select(
        "id", F.array(*[f"h{i}" for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str,
                      n: int = 3, threshold: float = 0.5,
                      num_perm: int = NUM_PERM_DEFAULT,
                      bands: int = BANDS_DEFAULT) -> DataFrame:
    """Near-dup pairs via MinHash + banded LSH, verified with exact Jaccard.

    Candidate pairs come from equal band hashes (band = r consecutive
    signature slots, r = num_perm / bands); each candidate is then verified
    against the true shingle sets, so the output has NO false positives —
    LSH only bounds recall.  Shuffles: one for signatures, one for the band
    self-join, one for the verify join.  The full cross product never forms.
    """
    rows = num_perm // bands
    # shingles feed both the signature pass and the exact-verify pass —
    # cache so the explode+distinct runs once, not twice.  The cache pins
    # executor memory for the session: the returned DataFrame exposes it as
    # ``result.cached_shingles`` so long-lived callers can
    # ``.unpersist()`` once the result is materialized.
    sh = word_shingles(df, text_col, id_col, n).cache()
    # signatures AND set sizes in ONE partial-aggregating groupBy — the
    # verify stage needs |shingles(doc)| anyway, and a separate count pass
    # would re-shuffle the whole shingle set
    agg_cols = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_perm)
    ] + [F.count(F.lit(1)).alias("sz")]
    sig_sz = sh.groupBy("id").agg(*agg_cols)
    sig = sig_sz.select(
        "id", F.array(*[f"h{i}" for i in range(num_perm)]).alias("sig")
    )
    sizes = sig_sz.select("id", "sz")
    band_rows = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[b * rows + r] for r in range(rows)]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bhash")
    a = band_rows.select(F.col("id").alias("id_a"), "band", "bhash")
    b = band_rows.select(F.col("id").alias("id_b"), "band", "bhash")
    candidates = (
        a.join(b, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # exact-Jaccard verification restricted to candidates
    sa = sh.select(F.col("id").alias("id_a"), "shingle")
    sb = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        candidates.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
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
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )
    result.cached_shingles = sh  # caller may .unpersist() after materializing
    return result


def simhash64(df: DataFrame, text_col: str, id_col: str,
              n: int = 3) -> DataFrame:
    """64-bit SimHash per doc over word n-gram shingles: ``(id, simhash)``.

    Per distinct shingle, each of the 64 bits of ``xxhash64(shingle)`` votes
    ±1; the fingerprint sets bit k where the vote sum is positive.  Shingles
    (not unigrams) are the feature set: with a small shared vocabulary,
    distinct-unigram sets collide for unrelated docs, while n-gram sets
    mirror the Jaccard ground truth.  Fully built-in: explode shingles ×
    bit positions, two partial-aggregating groupBys — linear, map-combined;
    for 100 TB switch the inner explode to a pandas UDF computing the vote
    vector per partition (same result, fewer intermediate rows).
    """
    sh = word_shingles(df, text_col, id_col, n)
    h = sh.select("id", F.xxhash64("shingle").alias("h"))
    votes = h.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("bit"),
                        (
                            F.shiftright(F.col("h"), k)
                            .bitwiseAND(F.lit(1))
                            .cast("long")
                            * 2
                            - 1
                        ).alias("vote"),
                    )
                    for k in range(64)
                ]
            )
        ).alias("bv"),
    ).select("id", "bv.bit", "bv.vote")
    bit_sums = votes.groupBy("id", "bit").agg(F.sum("vote").alias("s"))
    return bit_sums.groupBy("id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_pairs(df: DataFrame, text_col: str, id_col: str,
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming``.

    Candidate generation by the pigeonhole band trick: split 64 bits into
    ``max_hamming + 1`` bands; any pair within distance ``max_hamming``
    agrees exactly on at least one band, so a self-join per band finds all
    of them without a cross product.  Verification is ``bit_count(XOR)``.
    """
    nbands = max_hamming + 1
    width = 64 // nbands
    sig = simhash64(df, text_col, id_col)
    bands = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bkey"),
                    )
                    for b in range(nbands)
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
        .select("id_a", "id_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


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
