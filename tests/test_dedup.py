"""Dedup-suite tests: exactness, LSH recall/precision, synthetic near-dups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_at_home_spark.operators.dedup import (
    cosine_topk_pairs,
    exact_dedup,
    exact_dedup_stats,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    word_shingles,
)


@pytest.fixture(scope="module")
def corpus(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("gamma", "lambda")),  # near dup of 0
        (3, "one two three four five six seven eight nine ten"),
        (4, "completely different words entirely unrelated content here now"),
        (5, base + " extra tail tokens appended here"),  # near dup, longer
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([(0, "a b"), (1, "a b c"), (2, "")],
                               "doc_id long, text string")
    sh = word_shingles(df, "text", "doc_id", n=3).collect()
    # doc 0 has 2 tokens < n → no shingles; doc 1 exactly one
    assert [(r.id, r.shingle) for r in sh] == [(1, "a b c")]


def test_exact_dedup_map(corpus):
    m = {r.id: r.canonical_id for r in exact_dedup(corpus, "text", "doc_id").collect()}
    assert m[1] == 0 and m[0] == 0
    assert m[2] == 2 and m[3] == 3


def test_exact_dedup_stats(corpus):
    r = exact_dedup_stats(corpus, "text").first()
    assert (r.n_rows, r.n_distinct, r.n_dup_rows) == (6, 5, 1)


def test_ngram_jaccard_finds_near_dups(corpus):
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(corpus, "text", "doc_id",
                                          threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0          # exact dup
    assert 0.3 <= pairs[(0, 2)] < 1.0    # near dup
    assert (0, 3) not in pairs           # unrelated
    assert (0, 5) in pairs               # prefix-shared


def test_minhash_subset_of_exact_and_full_recall_on_high_j(corpus):
    exact = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(corpus, "text", "doc_id",
                                          threshold=0.3).collect()}
    lsh = {(r.id_a, r.id_b): r.jaccard_e6
           for r in minhash_lsh_pairs(corpus, "text", "doc_id",
                                      threshold=0.3).collect()}
    # verified output ⊆ exact (no false positives), identical jaccard values
    # (exact path rounds to 6 decimals; LSH path emits floor(j*1e6+0.5))
    for pair, j_e6 in lsh.items():
        assert pair in exact
        assert abs(j_e6 - exact[pair] * 1e6) <= 1
    # pairs with very high jaccard must be recalled (16 bands of 4 rows →
    # p(catch) = 1-(1-j^4)^16 > 0.9999 at j >= 0.9)
    for pair, j in exact.items():
        if j >= 0.9:
            assert pair in lsh


def test_minhash_on_real_data_matches_exact(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {(r.id_a, r.id_b) for r in
             ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5).collect()}
    lsh = {(r.id_a, r.id_b) for r in
           minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5).collect()}
    assert lsh <= exact
    high = {(r.id_a, r.id_b) for r in
            ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.9).collect()}
    assert high <= lsh  # planted ~0.99 dups always recalled


def test_simhash_finds_exact_dup(corpus):
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in simhash_pairs(corpus, "text", "doc_id",
                                    max_hamming=5).collect()}
    assert pairs.get((0, 1)) == 0  # identical text → identical simhash


def test_minhash_band_bucket_cap_drops_hot_buckets(spark):
    """With max_band_bucket=1 every bucket of ≥2 docs is skipped, so no
    candidates survive — the hot-bucket guard's degenerate extreme."""
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert minhash_lsh_pairs(df, "text", "doc_id",
                             max_band_bucket=1).count() == 0
    # and with a permissive cap the exact dups are all found
    assert minhash_lsh_pairs(df, "text", "doc_id",
                             max_band_bucket=10).count() == 6


def test_cosine_topk_pairs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # very close to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top = cosine_topk_pairs(df, "embedding", "vec_id", k=2).collect()
    assert (top[0].id_a, top[0].id_b) == (0, 1)
    assert top[0].cosine > 0.99


def _pseudo_random_matrix(n: int, dim: int, seed: int = 1):
    """Deterministic pseudo-random matrix without RNG state (hash-style)."""
    import numpy as np

    ids = np.arange(n, dtype=np.float64) + 1 + seed * 1000
    cols = np.arange(dim, dtype=np.float64) + 1
    arg = np.sin(np.outer(ids, cols * 12.9898)) * 43758.5453
    # true fract (not modf: modf keeps the sign and would bias the mean)
    return arg - np.floor(arg) - 0.5


def test_cosine_blocked_matches_exact(spark):
    """The distributed block-GEMM returns the identical pair set (and
    cosines to rounding) as the O(N^2) expression path, including pairs
    whose smaller id lands in the 'right' block of an off-diagonal group."""
    from vector_db_at_home_spark.operators.dedup import cosine_topk_pairs_blocked

    mat = _pseudo_random_matrix(300, 16)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = cosine_topk_pairs(df, "embedding", "vec_id", k=15).collect()
    blk = cosine_topk_pairs_blocked(df, "embedding", "vec_id", k=15,
                                    n_blocks=4).collect()
    assert [(r.id_a, r.id_b) for r in exact] == [(r.id_a, r.id_b) for r in blk]
    for e, b in zip(exact, blk):
        assert b.cosine == pytest.approx(e.cosine, abs=2e-6)


def test_cosine_blocked_all_ties_matches_exact(spark):
    """Degenerate dedup corpus: 300 IDENTICAL vectors, every pair cosine
    1.0 — far more ties than the chunk buffer.  The tie-complete cutoff +
    deterministic (-cosine, id_a, id_b) truncation must return exactly the
    expression path's pairs ((0,1),(0,2),...), not an arbitrary tied
    subset."""
    from vector_db_at_home_spark.operators.dedup import cosine_topk_pairs_blocked

    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = cosine_topk_pairs(df, "embedding", "vec_id", k=15).collect()
    blk = cosine_topk_pairs_blocked(df, "embedding", "vec_id", k=15,
                                    n_blocks=4).collect()
    assert [(r.id_a, r.id_b) for r in exact] == [(r.id_a, r.id_b) for r in blk]
    assert [(r.id_a, r.id_b) for r in blk] == [(0, i) for i in range(1, 16)]


def test_cosine_blocked_no_cartesian_no_collect(spark):
    """Plan audit: the blocked path's physical plan contains no
    CartesianProduct node — the replication join is a broadcast of the
    B-row block-target list, never of the data."""
    from vector_db_at_home_spark.operators.dedup import cosine_topk_pairs_blocked

    mat = _pseudo_random_matrix(50, 8)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = cosine_topk_pairs_blocked(
        df, "embedding", "vec_id", k=5, n_blocks=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_cosine_neardup_bucketed_recall_and_precision(spark):
    """Planted near-dups: 400 base vectors + 40 perturbed copies
    (cosine >= ~0.99).  The LSH-bucketed path must recover >= 90% of the
    planted pairs (recall) and, because candidates are exactly re-ranked,
    return no pair below the threshold (exact precision)."""
    import numpy as np

    from vector_db_at_home_spark.operators.dedup import cosine_neardup_bucketed

    base = _pseudo_random_matrix(400, 16)
    noise = _pseudo_random_matrix(40, 16, seed=7) * 0.02
    dup = base[:40] + noise
    rows = [(i, [float(x) for x in base[i]]) for i in range(400)]
    rows += [(1000 + i, [float(x) for x in dup[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = cosine_neardup_bucketed(
        df, "embedding", "vec_id", min_cosine=0.95,
        n_planes=12, n_tables=4,
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    planted = {(i, 1000 + i) for i in range(40)}
    recall = len(pairs & planted) / len(planted)
    assert recall >= 0.9
    # exact precision: every returned cosine is genuinely >= threshold
    norm = base / np.linalg.norm(base, axis=1, keepdims=True)
    nd = dup / np.linalg.norm(dup, axis=1, keepdims=True)
    full = np.vstack([norm, nd])
    ids = [i for i in range(400)] + [1000 + i for i in range(40)]
    pos = {v: p for p, v in enumerate(ids)}
    for r in got:
        true_cos = float(full[pos[r.id_a]] @ full[pos[r.id_b]])
        assert true_cos >= 0.95 - 1e-6
        assert r.cosine == pytest.approx(true_cos, abs=2e-6)


def test_cosine_neardup_hot_bucket_cap(spark):
    """max_bucket=1 drops every bucket with >= 2 members, so even exact
    duplicates yield no candidates — the hot-bucket guard's extreme."""
    from vector_db_at_home_spark.operators.dedup import cosine_neardup_bucketed

    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assert cosine_neardup_bucketed(
        df, "embedding", "vec_id", min_cosine=0.5, max_bucket=1
    ).count() == 0
    assert cosine_neardup_bucketed(
        df, "embedding", "vec_id", min_cosine=0.5, max_bucket=100
    ).count() == 10


def test_cross_corpus_contamination(spark):
    """Planted contamination: corpus doc 0 embeds benchmark doc 100's text
    verbatim; doc 1 shares nothing; doc 2 contains half of it."""
    from vector_db_at_home_spark.operators.dedup import (
        cross_corpus_contamination,
        decontaminate,
    )

    bench_text = "the quick brown fox jumps over the lazy dog again today"
    corpus = spark.createDataFrame(
        [
            (0, "intro words " + bench_text + " trailing words"),
            (1, "completely unrelated content with different tokens only"),
            (2, "prefix " + " ".join(bench_text.split()[:7]) + " suffix"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)],
                                  "doc_id long, text string")
    hits = cross_corpus_contamination(corpus, bench, n=5, threshold=0.5)
    rows = {(r.corpus_id, r.bench_id): r.containment_e6 for r in hits.collect()}
    assert (0, 100) in rows and rows[(0, 100)] == 1_000_000  # full containment
    assert (1, 100) not in rows
    assert (2, 100) not in rows  # 3/7 shingles < 0.5
    # cleaning form removes exactly the flagged doc
    kept = {r.doc_id for r in
            decontaminate(corpus, bench, n=5, threshold=0.5).collect()}
    assert kept == {1, 2}


def test_contamination_matches_duckdb(spark):
    """Engine-portable: DuckDB reproduces overlap and containment exactly
    from the same md5 shingle hashes."""
    import duckdb

    from vector_db_at_home_spark.operators.dedup import (
        cross_corpus_contamination,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    bench = docs.filter(F.col("doc_id") % 2 == 1).limit(10)
    got = {(r.corpus_id, r.bench_id, r.overlap, r.containment_e6)
           for r in cross_corpus_contamination(corpus, bench, n=3,
                                               threshold=0.2).collect()}
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    want = set(con.execute("""
WITH ctoks AS (SELECT doc_id, string_split(text, ' ') AS t
               FROM documents WHERE doc_id % 2 = 0),
btoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM
          (SELECT * FROM documents WHERE doc_id % 2 = 1
           ORDER BY doc_id LIMIT 10)),
csh AS (SELECT DISTINCT doc_id AS corpus_id,
               CAST(('0x' || substr(md5(array_to_string(list_slice(t, i, i + 2), ' ')), 1, 15)) AS BIGINT) AS h60
        FROM ctoks, unnest(range(1, len(t) - 1)) AS r(i)),
bsh AS (SELECT DISTINCT doc_id AS bench_id,
               CAST(('0x' || substr(md5(array_to_string(list_slice(t, i, i + 2), ' ')), 1, 15)) AS BIGINT) AS h60
        FROM btoks, unnest(range(1, len(t) - 1)) AS r(i)),
bsz AS (SELECT bench_id, count(*) AS bench_sz FROM bsh GROUP BY bench_id),
inter AS (SELECT corpus_id, bench_id, count(*) AS overlap
          FROM csh JOIN bsh USING (h60) GROUP BY corpus_id, bench_id)
SELECT corpus_id, bench_id, overlap,
       CAST(floor(overlap * 1000000.0 / bench_sz + 0.5) AS BIGINT)
FROM inter JOIN bsz USING (bench_id)
WHERE overlap * 1.0 / bench_sz >= 0.2
""").fetchall())
    assert got == want and len(got) > 0


def test_minhash_incremental_vs_full(spark, corpus):
    """Incremental (new-batch × corpus) near-dup must equal the full
    self-join dedup restricted to cross-side pairs — same signatures,
    banding and verified Jaccard values."""
    from vector_db_at_home_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    new = spark.createDataFrame(
        [
            (100, base),                                    # exact dup of 0
            (101, base.replace("delta", "rho")),            # near dup
            (102, "totally novel content nothing shared here at all ok"),
        ],
        "doc_id long, text string",
    )
    inc = {(r.new_id, r.corpus_id): r.jaccard_e6
           for r in minhash_lsh_pairs_incremental(
               new, corpus, "text", "doc_id", threshold=0.3).collect()}
    # ground truth: full dedup over the union, keep cross pairs only
    union = corpus.unionByName(new)
    full = {(r.id_b, r.id_a): r.jaccard_e6
            for r in minhash_lsh_pairs(union, "text", "doc_id",
                                       threshold=0.3).collect()
            if r.id_b >= 100 and r.id_a < 100}
    assert inc == full
    assert (100, 0) in inc and inc[(100, 0)] == 1_000_000
    assert (101, 0) in inc
    assert not any(nid == 102 for nid, _ in inc)


def test_minhash_incremental_caps(spark, corpus):
    from vector_db_at_home_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
    )

    new = spark.createDataFrame(
        [(200, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    # hot-bucket cap of 0-tolerance drops every corpus band bucket → empty
    assert minhash_lsh_pairs_incremental(
        new, corpus, "text", "doc_id", max_band_bucket=0).count() == 0
    # doc-freq cap measured on the corpus: cap=1 keeps only shingles unique
    # within the corpus — the exact-dup pair (docs 0/1 share all shingles,
    # df=2) loses its evidence and disappears
    res = minhash_lsh_pairs_incremental(
        new, corpus, "text", "doc_id", max_doc_freq=1)
    assert not any(r.corpus_id in (0, 1) for r in res.collect())


def test_prepared_incremental_equals_direct(spark, tmp_path):
    """minhash_lsh_pairs_incremental_prepared over persisted corpus state
    returns EXACTLY the direct incremental's pairs, and state append
    admits a batch so later batches see it."""
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.dedup import (
        minhash_corpus_state_append,
        minhash_corpus_state_build,
        minhash_lsh_pairs_incremental,
        minhash_lsh_pairs_incremental_prepared,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    path = str(tmp_path / "mh_state")
    minhash_corpus_state_build(
        corpus, path, "text", "doc_id", n=3,
        max_doc_freq=100, max_band_bucket=200,
    )
    direct = minhash_lsh_pairs_incremental(
        batch, corpus, "text", "doc_id", threshold=0.5,
        max_doc_freq=100, max_band_bucket=200,
    ).collect()
    prepared = minhash_lsh_pairs_incremental_prepared(
        spark, path, batch, "text", "doc_id", threshold=0.5
    ).collect()
    assert sorted(map(tuple, prepared)) == sorted(map(tuple, direct))

    # admit the batch, then a copy of an admitted doc must hit it
    minhash_corpus_state_append(spark, path, batch, "text", "doc_id")
    probe_src = batch.orderBy("doc_id").limit(1).collect()[0]
    probe = spark.createDataFrame(
        [(999_999, probe_src.text)], "doc_id long, text string"
    )
    hits = minhash_lsh_pairs_incremental_prepared(
        spark, path, probe, "text", "doc_id", threshold=0.5
    ).collect()
    assert any(r.corpus_id == probe_src.doc_id and r.jaccard_e6 == 1_000_000
               for r in hits)


def test_state_compact_rewrites_without_changing_results(spark, tmp_path):
    """minhash_corpus_state_compact collapses the appended small files into
    target_partitions per table, changes NO content (identical incremental
    pairs before/after), and leaves hot/meta untouched."""
    import glob

    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.dedup import (
        minhash_corpus_state_append,
        minhash_corpus_state_build,
        minhash_corpus_state_compact,
        minhash_lsh_pairs_incremental_prepared,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 4 == 1)
    path = str(tmp_path / "mh_state_c")
    minhash_corpus_state_build(corpus, path, "text", "doc_id", n=3)
    # three appends -> many small files
    for m in (2, 3, 0):
        minhash_corpus_state_append(
            spark, path, docs.filter(F.col("doc_id") % 4 == m),
            "text", "doc_id",
        )
    probe = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    before = sorted(map(tuple, minhash_lsh_pairs_incremental_prepared(
        spark, path, probe, "text", "doc_id", threshold=0.5).collect()))
    n_files_before = len(glob.glob(f"{path}/shingles/*.parquet"))

    minhash_corpus_state_compact(spark, path, target_partitions=2)
    n_files_after = len(glob.glob(f"{path}/shingles/*.parquet"))
    assert n_files_after <= 2 < n_files_before
    after = sorted(map(tuple, minhash_lsh_pairs_incremental_prepared(
        spark, path, probe, "text", "doc_id", threshold=0.5).collect()))
    assert after == before and before  # identical, non-empty


def test_simhash_incremental_equals_self_join_cross_pairs(spark, tmp_path):
    """simhash_pairs_incremental == the full self-join restricted to
    (batch, corpus) cross pairs (fingerprints are per-doc, so exactly);
    the persisted-state prepared path returns the same pairs, and state
    append admits a batch so later batches see it."""
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.dedup import (
        simhash_pairs,
        simhash_pairs_incremental,
        simhash_pairs_incremental_prepared,
        simhash_state_append,
        simhash_state_build,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    corpus = docs.filter(F.col("doc_id") % 4 != 0)

    inc = {(r.new_id, r.corpus_id, r.hamming)
           for r in simhash_pairs_incremental(
               batch, corpus, "text", "doc_id", max_hamming=5).collect()}
    full = simhash_pairs(docs, "text", "doc_id", max_hamming=5).collect()
    cross = {
        (a, b, r.hamming)
        for r in full
        for a, b in ((r.id_a, r.id_b), (r.id_b, r.id_a))
        if a % 4 == 0 and b % 4 != 0
    }
    assert inc == cross and inc

    path = str(tmp_path / "sh_state")
    simhash_state_build(corpus, path, "text", "doc_id")
    prep = {(r.new_id, r.corpus_id, r.hamming)
            for r in simhash_pairs_incremental_prepared(
                spark, path, batch, "text", "doc_id",
                max_hamming=5).collect()}
    assert prep == inc

    # append the batch; an exact copy of an admitted doc must now hit it
    simhash_state_append(spark, path, batch, "text", "doc_id")
    probe_src = batch.orderBy("doc_id").limit(1).collect()[0]
    probe = spark.createDataFrame(
        [(999_999, probe_src.text)], "doc_id long, text string"
    )
    hits = simhash_pairs_incremental_prepared(
        spark, path, probe, "text", "doc_id", max_hamming=5).collect()
    assert any(r.corpus_id == probe_src.doc_id and r.hamming == 0
               for r in hits)


def test_substring_dedup_stats_hand_corpus(spark):
    """Known span arithmetic on a 4-doc corpus with W=3."""
    from vector_db_at_home_spark.operators.dedup import substring_dedup_stats

    boiler = "all rights reserved by us"            # 5 toks -> 3 spans of 3
    df = spark.createDataFrame(
        [(1, boiler + " apples and pears today"),   # 9 toks -> 7 spans
         (2, boiler + " oranges and lemons maybe"), # shares the 3 boiler spans
         (3, "x y z x y z x y z"),                  # 9 toks, self-repeating
         (4, "too short")],                         # 2 toks -> 0 spans
        "doc_id long, text string",
    )
    out = {r.id: r for r in
           substring_dedup_stats(df, "text", "doc_id", window=3).collect()}

    assert out[1].n_spans == 7 and out[2].n_spans == 7
    # docs 1 and 2 share exactly the 3 all-boilerplate spans; the
    # straddling spans differ past token 5 ('by us apples' vs 'by us oranges')
    assert out[1].n_crossdoc_spans == 3 == out[2].n_crossdoc_spans
    # flag is 5*n_dup >= n_spans i.e. >=20% duplicated; 15 >= 7 -> heavy
    assert out[1].n_dup_spans == 3 and out[1].flag_dup_heavy
    # doc 3: spans of 'x y z x y z x y z' W=3: 7 spans, pattern period 3
    # distinct spans: 'x y z','y z x','z x y' -> counts 3,2,2 all >=2
    assert out[3].n_spans == 7 and out[3].n_dup_spans == 7
    assert out[3].n_crossdoc_spans == 0 and out[3].flag_dup_heavy
    # short doc present with zeros, unflagged
    assert out[4].n_spans == 0 and not out[4].flag_dup_heavy


def test_substring_dedup_spans_ranking(spark):
    from vector_db_at_home_spark.operators.dedup import substring_dedup_spans

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "a b c f"), (4, "q r s t")],
        "doc_id long, text string",
    )
    rows = substring_dedup_spans(df, "text", "doc_id", window=3, k=5).collect()
    assert [(r.span, r.occ, r.ndocs) for r in rows] == [("a b c", 3, 3)]


def test_substring_dedup_stats_matches_bruteforce(spark):
    """Differential check on a seeded random corpus: per-doc counts
    match a plain-Python hash-free reference (dict-of-span counting)."""
    import random
    from collections import Counter, defaultdict

    from vector_db_at_home_spark.operators.dedup import substring_dedup_stats

    rng = random.Random(42)
    vocab = [f"t{i}" for i in range(12)]
    corpus = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30)))
        for i in range(1, 41)
    }
    W = 4
    df = spark.createDataFrame(list(corpus.items()),
                               "doc_id long, text string")
    got = {r.id: (r.n_spans, r.n_dup_spans, r.n_crossdoc_spans)
           for r in substring_dedup_stats(df, "text", "doc_id",
                                          window=W).collect()}

    occ = Counter()
    docs_of = defaultdict(set)
    spans = {}
    for i, text in corpus.items():
        toks = text.split(" ")
        sp = [" ".join(toks[j:j + W]) for j in range(len(toks) - W + 1)]
        spans[i] = sp
        for s in sp:
            occ[s] += 1
            docs_of[s].add(i)
    want = {}
    for i, sp in spans.items():
        want[i] = (
            len(sp),
            sum(1 for s in sp if occ[s] >= 2),
            sum(1 for s in sp if len(docs_of[s]) >= 2),
        )
    assert got == want


def test_setsim_join_cross_relation_semantics(spark):
    """R×S join: pairs only span the two relations (never within one),
    both thresholds and counts exact; J >= 1/2 via integer compare."""
    from vector_db_at_home_spark.operators.dedup import setsim_join

    base = "alpha beta gamma delta epsilon zeta eta theta"
    left = spark.createDataFrame(
        [(0, base), (2, "one two three four five six")],
        "doc_id long, text string")
    right = spark.createDataFrame(
        [(1, base), (3, base.replace("delta", "kappa")),
         (5, "totally unrelated text with other words")],
        "doc_id long, text string")
    rows = {(r.id_a, r.id_b): r for r in
            setsim_join(left, right, "text", "doc_id", n=3).collect()}
    # identical text: 6 shared 3-shingles of 6 -> J = 1
    assert rows[(0, 1)].inter == 6 and rows[(0, 1)].union_sz == 6
    assert rows[(0, 1)].jaccard_e6 == 1_000_000
    # one mid-string substitution kills the 3 shingles spanning it:
    # J = 3/9 = 1/3 < 1/2 -> filtered at the default threshold...
    assert (0, 3) not in rows
    # ...but accepted at exactly 1/3 (integer compare: 3*3 >= 1*9)
    lo = {(r.id_a, r.id_b): r for r in
          setsim_join(left, right, "text", "doc_id", n=3,
                      threshold_num=1, threshold_den=3).collect()}
    assert lo[(0, 3)].inter == 3 and lo[(0, 3)].union_sz == 9
    assert lo[(0, 3)].jaccard_e6 == 333_333
    # unrelated and within-relation pairs absent
    assert all(a in (0, 2) and b in (1, 3, 5) for a, b in rows)
    assert (0, 5) not in rows


def test_semantic_dedup_clustered_neardups(spark):
    """SemDeDup keep/drop semantics on constructed data: within-cluster
    near-dups (cos > threshold) collapse to the lowest id; distinct
    members survive; exact duplicates always drop regardless of cell
    count."""
    import numpy as np

    from vector_db_at_home_spark.operators.dedup import semantic_dedup

    # 4 well-separated clusters of 3 orthogonal-ish members each, plus
    # near-dup copies (tiny perturbation, cos ≈ 0.9999) of member 0 of
    # every cluster, plus one EXACT copy of id 0
    rows = []
    rng_dim = 32
    for c in range(4):
        for j in range(3):
            v = np.zeros(rng_dim)
            v[c * 8 + j] = 10.0          # orthogonal within cluster
            v[c * 8 + 7] = 30.0          # shared cluster direction
            rows.append((c * 10 + j, [float(x) for x in v]))
    base = dict(rows)
    for c in range(4):                   # near-dup of member 0, higher id
        v = np.array(base[c * 10]) * 1.0
        v[0] += 0.01
        rows.append((c * 10 + 5, [float(x) for x in v]))
    rows.append((100, list(base[0])))    # exact copy of id 0

    df = spark.createDataFrame(rows, "id long, vec array<double>")
    m = {r.id: r.keep for r in
         semantic_dedup(df, "id", "vec", n_cells=4, threshold=0.99)
         .collect()}
    assert len(m) == len(rows)
    # near-dup copies and the exact copy drop; all originals keep
    for c in range(4):
        assert m[c * 10 + 5] is False, f"near-dup of cluster {c} kept"
        for j in range(3):
            assert m[c * 10 + j] is True
    assert m[100] is False
    # determinism
    m2 = {r.id: r.keep for r in
          semantic_dedup(df, "id", "vec", n_cells=4, threshold=0.99)
          .collect()}
    assert m == m2


def test_substring_state_build_append_compact(spark, tmp_path):
    """Persisted substring-span state: incremental stats equal the full
    computation restricted to the batch, appends are O(batch) delta rows
    readers fold on the fly, and compact merges them losslessly."""
    from vector_db_at_home_spark.operators.dedup import (
        substring_dedup_incremental,
        substring_dedup_stats,
        substring_state_append,
        substring_state_build,
        substring_state_compact,
    )

    mk = lambda i, t: (i, t)
    boiler = "the quick brown fox jumps over the lazy dog again"
    corpus = [
        mk(1, boiler + " first unique tail words here now"),
        mk(2, "completely different text with no repeated window at all ok"),
    ]
    admitted = [mk(3, boiler + " second distinct continuation of the span")]
    batch = [
        mk(10, boiler + " third copy tail entirely new suffix words"),
        mk(11, "novel content nothing shared with anything else anywhere"),
    ]
    schema = "doc_id long, text string"
    cdf = spark.createDataFrame(corpus, schema)
    adf = spark.createDataFrame(admitted, schema)
    bdf = spark.createDataFrame(batch, schema)

    state = str(tmp_path / "ss_state")
    substring_state_build(cdf, state, "text", "doc_id", window=8)
    substring_state_append(spark, state, adf, "text", "doc_id")

    got = substring_dedup_incremental(spark, state, bdf, "text", "doc_id") \
        .collect()
    want = {
        r.id: r for r in substring_dedup_stats(
            cdf.union(adf).union(bdf), "text", "doc_id", window=8
        ).collect() if r.id >= 10
    }
    assert len(got) == 2
    for r in got:
        w = want[r.id]
        assert (r.n_spans, r.n_dup_spans, r.n_crossdoc_spans,
                r.flag_dup_heavy) == (
            w.n_spans, w.n_dup_spans, w.n_crossdoc_spans, w.flag_dup_heavy)
    # doc 10 shares the 8-token boilerplate prefix span with 1 and 3
    by_id = {r.id: r for r in got}
    assert by_id[10].n_crossdoc_spans > 0
    assert by_id[11].n_crossdoc_spans == 0

    # delta rows pending: state has > 1 row for the boilerplate hash
    pre = spark.read.parquet(f"{state}/spans")
    dup_h = pre.groupBy("h").count().filter("count > 1").count()
    assert dup_h > 0
    substring_state_compact(spark, state)
    post = spark.read.parquet(f"{state}/spans")
    assert post.groupBy("h").count().filter("count > 1").count() == 0
    # identical results through the compacted state
    got2 = substring_dedup_incremental(spark, state, bdf, "text", "doc_id") \
        .collect()
    assert sorted(map(tuple, got2)) == sorted(map(tuple, got))


def test_semantic_dedup_tiny_corpus_guard(spark):
    """n ≈ n_cells must not silently skip dedup (a singleton cell never
    compares anything): the cell count clamps so exact near-dups are
    still caught on tiny inputs."""
    from vector_db_at_home_spark.operators.dedup import semantic_dedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 0.001])],
        "id long, vec array<double>")
    m = {r.id: r.keep
         for r in semantic_dedup(df, "id", "vec", n_cells=8,
                                 threshold=0.99).collect()}
    assert m == {1: True, 2: True, 3: False}


def test_semantic_dedup_skew_guard_routes_oversized_cells(spark):
    """r8 skew guard: a deliberately 90%-one-cell distribution must flow
    through the blocked distributed path without one giant Arrow group,
    with keep/drop IDENTICAL to the unguarded in-cell GEMM."""
    import numpy as np

    from vector_db_at_home_spark.operators.dedup import semantic_dedup

    # one dense blob (180 rows around a single direction — one k-means
    # cell) + a small far cluster (20 rows): near-dup pairs inside the
    # blob at deterministic offsets
    rows = []
    for i in range(180):
        v = np.zeros(16)
        v[0] = 100.0
        v[1 + (i % 5)] = ((i * 2654435761) % 97) / 10.0  # spread
        rows.append((i, [float(x) for x in v]))
    for i in range(20):  # exact dup pairs: 1000+i duplicates i
        rows.append((1000 + i, list(rows[i][1])))
    for i in range(20):
        v = np.zeros(16)
        v[8] = -50.0
        v[9] = float(i)
        rows.append((2000 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "id long, vec array<double>")

    guarded = {r.id: r.keep for r in
               semantic_dedup(df, "id", "vec", n_cells=2, threshold=0.999,
                              max_cell_rows=40).collect()}
    plain = {r.id: r.keep for r in
             semantic_dedup(df, "id", "vec", n_cells=2, threshold=0.999,
                            max_cell_rows=10**9).collect()}
    # the core contract: the routed path is semantics-IDENTICAL to the
    # in-cell GEMM (the blob rows are mutually near-dup at 0.999 by
    # construction — they share a dominant axis — so most of them drop
    # in BOTH paths; what matters is that they drop identically)
    assert guarded == plain
    assert len(guarded) == len(rows)
    for i in range(20):
        assert guarded[1000 + i] is False   # exact dup dropped
    assert guarded[0] is True               # smallest id always survives
    # determinism of the guarded path
    g2 = {r.id: r.keep for r in
          semantic_dedup(df, "id", "vec", n_cells=2, threshold=0.999,
                         max_cell_rows=40).collect()}
    assert g2 == guarded


def test_strip_duplicate_spans_planted_boilerplate(spark):
    """r8: cross-doc duplicate spans vanish everywhere except the
    smallest-id holder; unique text and within-doc self-repetition
    survive; reassembly preserves order and original case."""
    from vector_db_at_home_spark.operators.dedup import (
        strip_duplicate_spans,
    )

    boiler = "subscribe to our newsletter for daily updates and offers"
    docs = spark.createDataFrame(
        [
            (1, f"Alpha beta gamma. {boiler} Unique tail one."),
            (2, f"{boiler} Second doc body text here now yes."),
            (3, "Totally unrelated document with its own words only."),
            (4, "rep rep rep rep rep rep rep rep rep rep"),  # self-rep
        ],
        "doc_id long, text string",
    )
    got = {r.id: r for r in
           strip_duplicate_spans(docs, "text", "doc_id", window=8)
           .collect()}
    # doc 1 is the min-id holder: keeps everything
    assert got[1].n_tokens_kept == got[1].n_tokens
    assert boiler in got[1].text_kept
    # doc 2 loses the 9-token boilerplate (two overlapping shared
    # 8-windows cover all 9 positions), keeps its own tail
    assert got[2].n_tokens - got[2].n_tokens_kept == 9
    assert boiler not in got[2].text_kept
    assert got[2].text_kept == "Second doc body text here now yes."
    # unique doc untouched; within-doc repetition untouched (cross-doc only)
    assert got[3].n_tokens_kept == got[3].n_tokens
    assert got[4].n_tokens_kept == got[4].n_tokens
    # determinism
    again = {r.id: r.text_kept for r in
             strip_duplicate_spans(docs, "text", "doc_id", window=8)
             .collect()}
    assert again == {i: r.text_kept for i, r in got.items()}


def test_cosine_admit_blocked_randomized_vs_numpy(spark):
    """r9 kernel, randomized: on seeded random batch/corpus matrices the
    distributed two-relation admit screen returns exactly the ids NumPy
    brute force finds, across thresholds and block counts (including
    n_blocks > n_rows)."""
    import numpy as np

    from vector_db_at_home_spark.operators.dedup import (
        cosine_admit_blocked,
    )

    rng = np.random.default_rng(1234)
    nb, nc, dim = 37, 53, 8
    B = rng.standard_normal((nb, dim))
    C = rng.standard_normal((nc, dim))
    # plant an exact dup and a zero vector on both sides
    B[5] = C[7]
    B[11] = 0.0
    C[13] = 0.0
    batch = spark.createDataFrame(
        [(i, [float(x) for x in B[i]]) for i in range(nb)],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [(100 + j, [float(x) for x in C[j]]) for j in range(nc)],
        "vec_id long, embedding array<double>",
    )

    Bn = B / np.where(np.linalg.norm(B, axis=1, keepdims=True) == 0, 1,
                      np.linalg.norm(B, axis=1, keepdims=True))
    Cn = C / np.where(np.linalg.norm(C, axis=1, keepdims=True) == 0, 1,
                      np.linalg.norm(C, axis=1, keepdims=True))
    S = Bn @ Cn.T
    # tau sweep at one grid, block sweep at one tau (incl. more blocks
    # than rows) — a full cross product is ~12 Spark jobs for no extra
    # coverage
    cases = [(0.2, 4), (0.5, 1), (0.5, 4), (0.5, 16), (0.9, 4),
             (0.999999, 4)]
    for tau, nblk in cases:
        want = {i for i in range(nb) if (S[i] >= tau).any()}
        got = {r.id for r in cosine_admit_blocked(
            batch, corpus, "embedding", "vec_id", tau,
            n_blocks=nblk).collect()}
        assert got == want, (tau, nblk)


def test_bm25_indexed_randomized_corpus(spark, tmp_path):
    """r9, randomized: on a seeded random corpus (duplicate words,
    skewed lengths, docs without any query term, an empty doc) the
    indexed BM25 is bit-identical to the corpus scan for several
    query-term sets."""
    import random

    from vector_db_at_home_spark.operators.invindex import (
        bm25_search_indexed,
        invindex_load,
        invindex_save,
    )
    from vector_db_at_home_spark.operators.tfidf import bm25_search

    rnd = random.Random(99)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(80):
        n = rnd.choice([0, 3, 8, 20, 60])
        rows.append((i, " ".join(rnd.choice(vocab) for _ in range(n))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "inv_rand")
    invindex_save(docs, "text", "doc_id", path, n_buckets=16)
    idx = invindex_load(spark, path)
    for terms in (["w0"], ["w1", "w2", "w3"],
                  ["w4", "w4", "w5"],            # duplicate query term
                  ["absent", "w6"]):             # term not in corpus
        want = bm25_search(docs, terms, "text", "doc_id", k=15).collect()
        got = bm25_search_indexed(idx, terms, k=15).collect()
        assert got == want, terms


def test_blocked_kernels_auto_n_blocks(spark):
    """r10 (VERDICT r9 task 3): n_blocks=None derives the block count
    from a count so the resident block stays ~target_block_rows at any
    scale — and the derivation is result-invariant vs explicit counts."""
    import math

    from vector_db_at_home_spark.operators.dedup import (
        _derive_n_blocks,
        cosine_admit_blocked,
        cosine_topk_pairs_blocked,
    )

    # derivation math: floor at 8, grows with n, capped at 512
    assert _derive_n_blocks(100, 8192) == 8
    assert _derive_n_blocks(8 * 8192, 8192) == 8
    assert _derive_n_blocks(100 * 8192, 8192) == 100
    assert _derive_n_blocks(10**9, 8192) == 512
    # resident block ≈ target at any scale in the derived regime
    for n in (9 * 8192, 100 * 8192, 400 * 8192):
        nb = _derive_n_blocks(n, 8192)
        assert math.ceil(n / nb) <= 8192 + nb

    mat = _pseudo_random_matrix(120, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(120)],
        "vec_id long, embedding array<float>",
    )
    auto = cosine_topk_pairs_blocked(df, "embedding", "vec_id",
                                     k=10).collect()
    explicit = cosine_topk_pairs_blocked(df, "embedding", "vec_id",
                                         k=10, n_blocks=8).collect()
    assert [tuple(r) for r in auto] == [tuple(r) for r in explicit]

    batch, corpus = df.limit(40), df.filter(F.col("vec_id") >= 40)
    got_auto = {r.id for r in cosine_admit_blocked(
        batch, corpus, "embedding", "vec_id", 0.9).collect()}
    got_exp = {r.id for r in cosine_admit_blocked(
        batch, corpus, "embedding", "vec_id", 0.9, n_blocks=8).collect()}
    assert got_auto == got_exp
