"""Binary-quantization (1-bit) tier tests: packing correctness vs NumPy,
Hamming symmetry/identity, recall of the Hamming-prefilter + exact-rerank
search, radius search vs brute force, and save/sync idempotence."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_db_at_home_spark.operators.ann import recall_at_k
from vector_db_at_home_spark.operators.bq import (
    binary_encode,
    bq_load,
    bq_save,
    bq_search,
    bq_sync_with_store,
    bq_topk,
    hamming_distance,
)
from vector_db_at_home_spark.operators.knn import knn_search, range_search


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return (
        emb.orderBy("vec_id")
        .limit(8)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qvec"))
    )


def test_pack_matches_numpy(spark, emb):
    """The codegen word packing reproduces a NumPy sign-bit reference
    bit for bit, including a non-multiple-of-32 dimension."""
    rows = emb.limit(16).collect()
    got = {
        r["id"]: r["words"]
        for r in binary_encode(emb.limit(16), id_col="vec_id",
                               vec_col="embedding").collect()
    }
    for r in rows:
        v = np.asarray(r.embedding)
        bits = (v > 0).astype(np.int64)
        want = []
        for w in range((len(v) + 31) // 32):
            chunk = bits[w * 32:(w + 1) * 32]
            want.append(int((chunk << np.arange(len(chunk))).sum()))
        assert got[r.vec_id] == want

    # 40-d vector: 2 words, upper word uses only 8 bits
    odd = spark.createDataFrame(
        [(1, [1.0 if i % 3 == 0 else -1.0 for i in range(40)])],
        "id long, vec array<double>",
    )
    (w,) = binary_encode(odd).collect()
    bits = np.array([1 if i % 3 == 0 else 0 for i in range(40)], dtype=np.int64)
    assert w.words == [
        int((bits[:32] << np.arange(32)).sum()),
        int((bits[32:] << np.arange(8)).sum()),
    ]


def test_hamming_identity_and_symmetry(spark):
    df = spark.createDataFrame(
        [(0, [5, 12], [5, 12]), (1, [5, 12], [4, 12]), (2, [0, 0], [3, 1])],
        "i long, a array<long>, b array<long>",
    )
    out = {r.i: (r.ab, r.ba) for r in df.select(
        "i",
        hamming_distance("a", "b").alias("ab"),
        hamming_distance("b", "a").alias("ba"),
    ).collect()}
    assert out[0] == (0, 0)
    assert out[1] == (1, 1)      # 5^4 = 1 → one bit
    assert out[2] == (3, 3)      # 3 → 2 bits, 1 → 1 bit


def test_bq_search_recall_and_exact_distances(emb, queries):
    """With a 10× re-rank the 1-bit prefilter recovers most exact top-5,
    and every returned distance equals the exact kNN distance for that
    (query, id) pair — the re-rank uses the same fold."""
    exact = knn_search(emb, queries, k=5, id_col="vec_id",
                       vec_col="embedding", impl="expr")
    approx = bq_search(emb, queries, k=5, rerank_factor=10,
                       id_col="vec_id", vec_col="embedding")
    assert recall_at_k(approx, exact) >= 0.7

    ed = {(r.query_id, r.id): r.distance for r in exact.collect()}
    for r in approx.collect():
        if (r.query_id, r.id) in ed:
            assert r.distance == ed[(r.query_id, r.id)]


def test_bq_full_rerank_equals_exact(emb, queries):
    """Re-ranking the ENTIRE corpus (rerank_factor = N/k) must equal
    brute force exactly — the prefilter only reorders candidates."""
    n = emb.count()
    exact = knn_search(emb, queries, k=5, id_col="vec_id",
                       vec_col="embedding", impl="expr")
    approx = bq_search(emb, queries, k=5, rerank_factor=(n // 5) + 1,
                       id_col="vec_id", vec_col="embedding")
    assert recall_at_k(approx, exact) == 1.0


def test_bq_topk_self_is_nearest(emb, queries):
    """Self-query: each query is its own vector, so hamming 0 at its id."""
    from vector_db_at_home_spark.operators.bq import _pack_words

    codes = binary_encode(emb, id_col="vec_id", vec_col="embedding")
    qc = queries.select("query_id", _pack_words("qvec").alias("words"))
    top = bq_topk(codes, qc, k=1).collect()
    for r in top:
        assert r.id == r.query_id and r.hamming == 0


def test_bq_save_load_sync(tmp_path, spark, emb):
    path = str(tmp_path / "bq")
    codes = binary_encode(emb.limit(300), id_col="vec_id",
                          vec_col="embedding")
    bq_save(codes, path)
    assert bq_load(spark, path).count() == 300

    class FakeStore:
        def df(self):
            return emb.select(F.col("vec_id").alias("id"),
                              F.col("embedding").alias("vec"))

    n_total = emb.count()
    added = bq_sync_with_store(spark, FakeStore(), path,
                               id_col="id", vec_col="vec")
    assert added == n_total - 300
    assert bq_load(spark, path).count() == n_total
    # idempotent
    assert bq_sync_with_store(spark, FakeStore(), path,
                              id_col="id", vec_col="vec") == 0


def test_range_search_vs_bruteforce(emb, queries):
    """Radius result = exact filter of the brute-force distance table."""
    r = 1.3
    got = range_search(emb, queries, radius=r, id_col="vec_id",
                       vec_col="embedding").collect()
    n = emb.count()
    full = knn_search(emb, queries, k=n, id_col="vec_id",
                      vec_col="embedding", impl="expr").collect()
    want = sorted(
        [(x.query_id, x.id, x.distance) for x in full if x.distance <= r]
    )
    assert sorted((x.query_id, x.id, x.distance) for x in got) == want
    # ordering contract
    assert [(x.query_id, x.distance, x.id) for x in got] == sorted(
        (x.query_id, x.distance, x.id) for x in got
    )


def test_range_search_bad_metric(emb, queries):
    with pytest.raises(ValueError, match="unknown metric"):
        range_search(emb, queries, radius=1.0, metric="manhattan")
