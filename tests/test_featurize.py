"""Hashing-trick embedder tests: sparse/dense consistency and the full
text→vector→ANN composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_at_home_spark.operators.featurize import (
    hash_embed_selfsearch,
    hashing_embed,
    hashing_embed_sparse,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(80)


def test_dense_matches_sparse(spark, docs):
    """The dense pivot carries exactly the sparse values (pre-norm) and
    unit L2 norm after normalization."""
    sparse = {
        (r.id, r.bucket): r.val
        for r in hashing_embed_sparse(docs, "text", "doc_id",
                                      dim=32).collect()
    }
    dense = hashing_embed(docs, "text", "doc_id", dim=32,
                          normalize=False).collect()
    assert dense
    for r in dense:
        for b, v in enumerate(r.vec):
            assert v == float(sparse.get((r.id, b), 0))
    unit = hashing_embed(docs, "text", "doc_id", dim=32).collect()
    for r in unit:
        n = sum(x * x for x in r.vec)
        assert n == pytest.approx(1.0, abs=1e-9) or n == 0.0


def test_selfsearch_agrees_with_dense_cosine(spark, docs):
    """The integer-domain self-search returns the same ranking as a
    cosine computed from the dense normalized vectors."""
    import numpy as np

    got = hash_embed_selfsearch(docs, "text", "doc_id", query_id=0,
                                k=5, dim=32).collect()
    dense = {r.id: np.array(r.vec)
             for r in hashing_embed(docs, "text", "doc_id",
                                    dim=32).collect()}
    q = dense[0]
    sims = sorted(
        ((float(q @ v), i) for i, v in dense.items() if i != 0),
        key=lambda t: (-t[0], t[1]),
    )
    assert [r.id for r in got] == [i for _, i in sims[:5]]
    for r, (s, _) in zip(got, sims):
        assert r.cos_e6 == int(s * 1e6 + 0.5)


def test_text_to_ann_composition(spark, docs):
    """End-to-end with no external embeddings: hash-embed the corpus,
    build IVF-SQ8 over the dense vectors, search with a document's own
    vector — the query doc comes back at rank 1 (cosine ≡ L2 on the
    unit sphere)."""
    from vector_db_at_home_spark.operators.sq import (
        ivfsq_build,
        ivfsq_search,
    )

    emb = hashing_embed(docs, "text", "doc_id", dim=32)
    sq = ivfsq_build(emb, id_col="id", vec_col="vec", n_cells=4)
    qv = emb.filter(F.col("id") == 3).select(
        F.lit(3).alias("query_id"), F.col("vec").alias("qvec")
    )
    hits = ivfsq_search(sq, qv, k=3, n_probes=4,
                        refine_with=emb, id_col="id",
                        vec_col="vec").collect()
    assert hits and hits[0].id == 3 and hits[0].distance <= 1e-6


def test_maxsim_exact_term_dominates(spark):
    """A doc containing a query term verbatim gets that term's full
    self-dot (the max aligns on the identical token); unrelated docs
    score lower."""
    from vector_db_at_home_spark.operators.featurize import (
        _char_trigrams,
        maxsim_search,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "we merge the vector batch nightly"),
         (2, "completely unrelated words here xyzzy"),
         (3, "merging vectors in batches")],
        "id long, text string",
    )
    terms = ["vector", "merge", "batch"]
    out = {r.id: r.score
           for r in maxsim_search(df, terms, "text", "id", k=3).collect()}
    # doc 1 contains all three terms verbatim -> highest score
    assert out[1] == max(out.values())
    # subword sharing: doc 3's inflected forms still beat the unrelated doc
    assert out.get(3, 0) > out.get(2, 0)


def test_maxsim_trigram_edgecases(spark):
    """Tokens shorter than 3 chars hash as themselves (no empty grams)."""
    from vector_db_at_home_spark.operators.featurize import _char_trigrams
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("ab",), ("abc",), ("abcd",)], "t string")
    rows = {r.t: r.g for r in df.select(
        "t", _char_trigrams(F.col("t")).alias("g")).collect()}
    assert rows["ab"] == ["ab"]
    assert rows["abc"] == ["abc"]
    assert rows["abcd"] == ["abc", "bcd"]


def test_mmr_rerank_diversity_beats_pure_relevance(spark):
    """MMR must demote a near-duplicate of an already-selected doc even
    when it outranks a diverse doc on pure relevance; invariants: rank 1
    is the relevance argmax, penalties are exact Gram entries, mmr =
    rel - penalty."""
    from vector_db_at_home_spark.operators.featurize import mmr_rerank

    df = spark.createDataFrame(
        [(1, "vector index merge batch vector index merge batch"),
         (2, "vector index merge batch vector index merge"),  # near-dup of 1
         (3, "batch jobs compact the index nightly"),
         (4, "weather report with nothing relevant")],
        "doc_id long, text string",
    )
    rows = mmr_rerank(df, ["vector", "merge", "batch", "index"],
                      "text", "doc_id", n_candidates=4, k=3, dim=16,
                      rel_weight=1).collect()
    assert [r.rnk for r in rows] == [1, 2, 3]
    assert rows[0].id == 1 and rows[0].penalty == 0 and \
        rows[0].mmr == rows[0].rel
    # doc 2 is the relevance runner-up but nearly identical to doc 1;
    # its Gram penalty vs doc 1 exceeds its relevance edge, so pure-
    # relevance rank 2 drops OUT of the MMR top 3 entirely
    assert 2 not in {r.id for r in rows}
    for r in rows:
        assert r.mmr == r.rel - r.penalty  # rel_weight=1 identity


def test_mmr_rerank_candidate_ceiling(spark):
    import pytest as _pytest

    from vector_db_at_home_spark.operators.featurize import mmr_rerank

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="ceiling"):
        mmr_rerank(df, ["a"], "text", "doc_id", n_candidates=5000)


def test_parentdoc_search_picks_best_chunk(spark):
    """The returned offset is the winning chunk's start: plant the
    query terms deep in a long doc and the second chunk must win."""
    from vector_db_at_home_spark.operators.featurize import parentdoc_search

    filler = " ".join(f"w{i}" for i in range(40))
    hot = "vector merge batch index " * 4
    df = spark.createDataFrame(
        [(1, filler + " " + hot.strip()),     # terms live past token 40
         (2, "vector merge batch index"),     # terms in chunk 1
         (3, " ".join(f"z{i}" for i in range(50)))],
        "doc_id long, text string",
    )
    rows = parentdoc_search(df, ["vector", "merge", "batch", "index"],
                            "text", "doc_id", k=3, dim=16,
                            chunk_tokens=32, stride=24).collect()
    by_id = {r.id: r for r in rows}
    # doc 1's winning chunk starts at 25 or 49 (stride grid), NOT 1
    assert by_id[1].best_start > 1
    assert by_id[1].score >= by_id[2].score  # 16 hot tokens beat 4
    assert rows == sorted(rows, key=lambda r: (-r.score, r.id))


def test_maxsim_matches_python_md5_reference(spark):
    """Differential fuzz: the whole MaxSim pipeline (trigram hashing,
    signs, bucket dots, max-per-term, sum) re-derived in plain Python
    from hashlib.md5 on a seeded random word corpus."""
    import hashlib
    import random
    from collections import defaultdict

    from vector_db_at_home_spark.operators.featurize import maxsim_search

    rng = random.Random(123)
    vocab = ["vector", "vectors", "merge", "merging", "batch", "batches",
             "index", "zzz", "ab", "a", "xylophone", "naïve"]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 25))))
            for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    terms, dim, k = ["vector", "merge", "batch"], 16, 30
    got = {r.id: r.score for r in
           maxsim_search(df, terms, "text", "doc_id", k=k,
                         dim=dim).collect()}

    def tri(tok):
        return [tok] if len(tok) < 3 else \
            [tok[i:i + 3] for i in range(len(tok) - 2)]

    def vec(tok):
        v = defaultdict(int)
        for g in tri(tok):
            h = hashlib.md5(g.encode("utf-8")).hexdigest()
            bucket = int(h[:15], 16) % dim
            v[bucket] += 1 if int(h[15], 16) % 2 == 0 else -1
        return {b: x for b, x in v.items() if x != 0}

    qv = {t: vec(t) for t in terms}
    want = {}
    for i, text in docs:
        toks = set(text.lower().split(" "))
        tv = {t: vec(t) for t in toks}
        score = 0
        for term in terms:
            best = 0
            for t in toks:
                # bucket-join semantics: only pairs sharing >= 1 bucket
                shared = set(tv[t]) & set(qv[term])
                if shared:
                    d = sum(tv[t][b] * qv[term][b] for b in shared)
                    best = max(best, d)
            score += best
        if score or any(set(tv[t]) & set(qv[term])
                        for t in toks for term in terms):
            want[i] = score
    # got is the top-k slice of want's ranking; compare on got's keys
    # and verify the cut is consistent
    for i, sc in got.items():
        assert want.get(i) == sc, (i, sc, want.get(i))
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert dict(ranked) == got


def test_maxsim_indexed_matches_corpus_scan(spark, tmp_path):
    """r10: MaxSim through the saved token-vector index is bit-identical
    to the corpus-scan maxsim_search at every lifecycle point — after
    save, after append (old AND new tokens), through a crash-torn
    append window (duplicate tokvec/posting rows), after a tombstoned
    delete, and after compact.  Integer scores end to end, so equality
    is exact, not approximate."""
    from vector_db_at_home_spark.operators.featurize import (
        maxsim_index_append,
        maxsim_index_compact_saved,
        maxsim_index_load,
        maxsim_index_save,
        maxsim_index_sync_deletes,
        maxsim_search,
        maxsim_search_indexed,
    )

    docs = spark.createDataFrame(
        [
            (1, "merge vectors into the batch store"),
            (2, "the quick brown fox jumps over fences"),
            (3, "vector merges and batches of vectors"),
            (4, "nothing relevant whatsoever here today"),
            (5, "merged batch vector pipelines"),
            (6, "fresh tokens arriving with novel vocabulary"),
            (7, "batch merging vector bulk appends"),
        ],
        "doc_id long, text string",
    )
    terms = ["vector", "merge", "batch"]
    path = str(tmp_path / "maxsim_idx")
    base, extra = docs.filter("doc_id <= 5"), docs.filter("doc_id > 5")
    maxsim_index_save(base, "text", "doc_id", path, dim=16, n_buckets=8)

    def scan(d):
        return maxsim_search(d, terms, "text", "doc_id", k=10,
                             dim=16).collect()

    def indexed():
        return maxsim_search_indexed(
            maxsim_index_load(spark, path), terms, k=10).collect()

    assert indexed() == scan(base)

    assert maxsim_index_append(spark, path, extra, "text", "doc_id") == 2
    assert indexed() == scan(docs)
    # replay is a no-op (docids guard)
    assert maxsim_index_append(spark, path, extra, "text", "doc_id") == 0

    # crash-torn append window: duplicate rows in BOTH tables
    spark.read.parquet(f"{path}/tokvecs").limit(5) \
        .write.mode("append").parquet(f"{path}/tokvecs")
    full = spark.read.parquet(f"{path}/postings")
    full.filter("id = 6").repartition(1).write.partitionBy("pbk") \
        .mode("append").parquet(f"{path}/postings")
    assert indexed() == scan(docs)

    class FakeStore:
        def __init__(self, df_):
            self._df = df_

        def df(self):
            return self._df

    live = docs.filter("doc_id <> 3")
    assert maxsim_index_sync_deletes(
        spark, FakeStore(live.withColumnRenamed("doc_id", "id")),
        path) == 1
    assert indexed() == scan(live)

    maxsim_index_compact_saved(spark, path)
    assert indexed() == scan(live)
    raw = spark.read.parquet(f"{path}/postings")
    assert raw.count() == raw.dropDuplicates(["tok", "id"]).count()


def test_maxsim_indexed_zero_score_membership(spark, tmp_path):
    """The 0-floor membership tail: when fewer than k docs score
    positive, the scan path fills the tail with 0-score docs whose
    tokens merely SHARE a hash bucket with some term — the indexed
    path must reproduce that set exactly (the docs_any semi-join)."""
    from vector_db_at_home_spark.operators.featurize import (
        maxsim_index_load,
        maxsim_index_save,
        maxsim_search,
        maxsim_search_indexed,
    )

    docs = spark.createDataFrame(
        [(i, f"filler{i}a filler{i}b filler{i}c") for i in range(1, 7)]
        + [(10, "vector merge batch")],
        "doc_id long, text string",
    )
    terms = ["vector"]
    path = str(tmp_path / "maxsim_zero")
    maxsim_index_save(docs, "text", "doc_id", path, dim=16, n_buckets=8)
    scan = maxsim_search(docs, terms, "text", "doc_id", k=10,
                         dim=16).collect()
    idxd = maxsim_search_indexed(
        maxsim_index_load(spark, path), terms, k=10).collect()
    assert idxd == scan
    assert scan[0].doc_id if hasattr(scan[0], "doc_id") else True


def test_maxsim_indexed_plan_never_scans_corpus(spark, tmp_path):
    """Plan pin: the indexed search reads ONLY the saved index tables —
    the corpus text appears nowhere in the physical plan (the serving
    claim at 100 TB)."""
    from vector_db_at_home_spark.operators.featurize import (
        maxsim_index_load,
        maxsim_index_save,
        maxsim_search_indexed,
    )

    docs = spark.createDataFrame(
        [(1, "merge vectors into the batch store"),
         (2, "unrelated words entirely")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "maxsim_plan")
    maxsim_index_save(docs, "text", "doc_id", path, dim=16, n_buckets=4)
    from vector_db_at_home_spark.plans.explain import formatted_plan

    df = maxsim_search_indexed(maxsim_index_load(spark, path),
                               ["vector"], k=5)
    plan = formatted_plan(df)
    assert "tokvecs" in plan and "postings" in plan
    assert "text#" not in plan  # no corpus text column anywhere


def test_maxsim_indexed_randomized_parity(spark, tmp_path):
    """r10, randomized: on seeded random corpora (shared vocab, skewed
    doc lengths, docs with repeated tokens, an empty-ish doc) the
    indexed MaxSim equals the corpus scan exactly across query shapes —
    including terms absent from the corpus and single-term queries."""
    import random

    from vector_db_at_home_spark.operators.featurize import (
        maxsim_index_load,
        maxsim_index_save,
        maxsim_search,
        maxsim_search_indexed,
    )

    rng = random.Random(77)
    vocab = [f"w{j}" for j in range(40)] + ["vector", "merge", "batch"]
    rows = []
    for i in range(60):
        n = rng.choice([1, 3, 8, 20])
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    rows.append((999, "x"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "ms_rand")
    maxsim_index_save(docs, "text", "doc_id", path, dim=16, n_buckets=8)
    idx = maxsim_index_load(spark, path)

    for terms in (["vector"], ["vector", "merge", "batch"],
                  ["absentterm"], ["w3", "w17", "absentterm"],
                  ["VeCtOr", "W3"]):
        scan = [tuple(r) for r in maxsim_search(
            docs, terms, "text", "doc_id", k=15, dim=16).collect()]
        served = [tuple(r) for r in maxsim_search_indexed(
            idx, terms, k=15).collect()]
        assert served == scan, terms


def test_maxsim_index_readmit_tombstoned_id(spark, tmp_path):
    """r11 (ADVICE r10): re-admitting a doc under a previously
    tombstoned id must make it searchable IMMEDIATELY — the append
    rewrites the tombstones minus the fresh ids (resurfacing the
    original postings) instead of appending rows the load-time
    tombstone anti-join hides until the next physical compact."""
    from vector_db_at_home_spark.operators.featurize import (
        maxsim_index_append,
        maxsim_index_load,
        maxsim_index_save,
        maxsim_index_sync_deletes,
        maxsim_search,
        maxsim_search_indexed,
    )

    docs = spark.createDataFrame(
        [(1, "merge vectors into the store"),
         (2, "the quick brown fox"),
         (3, "vector merges and batches")],
        "doc_id long, text string",
    )
    terms = ["vector", "merge", "fox"]
    path = str(tmp_path / "readmit")
    maxsim_index_save(docs, "text", "doc_id", path, dim=16, n_buckets=8)

    class FakeStore:
        def __init__(self, df_):
            self._df = df_

        def df(self):
            return self._df

    live = docs.filter("doc_id <> 2")
    assert maxsim_index_sync_deletes(
        spark, FakeStore(live.withColumnRenamed("doc_id", "id")), path) == 1

    def indexed():
        return maxsim_search_indexed(
            maxsim_index_load(spark, path), terms, k=10).collect()

    assert indexed() == maxsim_search(live, terms, "text", "doc_id", k=10,
                                      dim=16).collect()

    # re-admit doc 2 (same content) — searchable immediately, counted
    readd = docs.filter("doc_id = 2")
    assert maxsim_index_append(spark, path, readd, "text", "doc_id") == 1
    assert indexed() == maxsim_search(docs, terms, "text", "doc_id", k=10,
                                      dim=16).collect()
    # no duplicate rows were appended (the original postings resurfaced)
    raw = spark.read.parquet(f"{path}/postings").filter("id = 2")
    assert raw.count() == raw.dropDuplicates(["tok", "id"]).count()
    # replay is a no-op again (the docids guard sees the doc)
    assert maxsim_index_append(spark, path, readd, "text", "doc_id") == 0
