"""kNN golden tests ported from the reference suite.

Reference fixtures: eye(10) basis vectors with docs {"k{i}": "v{i}"}; golden
distances float32(0.5) and float32(1.118034) (tests.py:195-224, 226-275).
Spark computes in double → compare with 1e-5 tolerance (FIXTURES.md §5).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_db_at_home_spark.operators.knn import knn_join_payload, knn_search
from vector_db_at_home_spark.schema import QUERY_SCHEMA, VECTOR_SCHEMA

DIM = 10


def make_store(spark, vecs, docs=None):
    vecs = np.asarray(vecs, dtype=np.float32)
    if docs is None:
        docs = ["{}"] * len(vecs)
    rows = [(i, [float(x) for x in v], d) for i, (v, d) in enumerate(zip(vecs, docs))]
    return spark.createDataFrame(rows, VECTOR_SCHEMA)


def make_queries(spark, qvecs):
    rows = [(i, [float(x) for x in q]) for i, q in enumerate(np.asarray(qvecs))]
    return spark.createDataFrame(rows, QUERY_SCHEMA)


@pytest.fixture(scope="module")
def eye_store(spark):
    docs = ['{"k%d": "v%d"}' % (i, i) for i in range(DIM)]
    return make_store(spark, np.eye(DIM), docs)


@pytest.mark.parametrize("impl", ["expr", "pandas"])
def test_single_query_goldens(spark, eye_store, impl):
    # tests.py:195-224: query [0,0,0,.5,0,0,0,0,0,1], k=2 → ids [9, 3]
    q = np.zeros(DIM)
    q[3] = 0.5
    q[9] = 1.0
    res = knn_search(eye_store, make_queries(spark, [q]), k=2, impl=impl).collect()
    assert [r.id for r in res] == [9, 3]
    assert res[0].distance == pytest.approx(0.5, rel=1e-5)
    assert res[1].distance == pytest.approx(1.118034, rel=1e-5)


@pytest.mark.parametrize("impl", ["expr", "pandas"])
def test_batch_query_goldens(spark, eye_store, impl):
    # tests.py:226-275: queries [[1,.5,0...],[0,1,.5,0...]] → ids [0,1]/[1,2]
    q0 = np.zeros(DIM); q0[0] = 1.0; q0[1] = 0.5
    q1 = np.zeros(DIM); q1[1] = 1.0; q1[2] = 0.5
    res = knn_search(eye_store, make_queries(spark, [q0, q1]), k=2, impl=impl).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    assert [r.id for r in by_q[0]] == [0, 1]
    assert [r.id for r in by_q[1]] == [1, 2]
    for qid in (0, 1):
        assert by_q[qid][0].distance == pytest.approx(0.5, rel=1e-5)
        assert by_q[qid][1].distance == pytest.approx(1.118034, rel=1e-5)


def test_identical_vector_distance_zero(spark, eye_store):
    # tests.py:309: distance of an identical vector is 0
    q = np.zeros(DIM); q[0] = 1.0
    res = knn_search(eye_store, make_queries(spark, [q]), k=1, impl="expr").collect()
    assert res[0].id == 0
    assert res[0].distance == 0.0


def test_k_greater_than_n_raises(spark, eye_store):
    # vector_store.py:279-284 — no -1 padding, eager ValueError
    with pytest.raises(ValueError, match="must not exceed"):
        knn_search(eye_store, make_queries(spark, [np.zeros(DIM)]), k=11,
                   check_k=True)


def test_k_nonpositive_raises(spark, eye_store):
    with pytest.raises(ValueError, match="positive"):
        knn_search(eye_store, make_queries(spark, [np.zeros(DIM)]), k=0)


def test_payload_join(spark, eye_store):
    q = np.zeros(DIM); q[3] = 0.5; q[9] = 1.0
    res = knn_search(eye_store, make_queries(spark, [q]), k=2, impl="expr")
    full = knn_join_payload(res, eye_store).orderBy("distance").collect()
    assert full[0].doc == '{"k9": "v9"}'
    assert full[1].doc == '{"k3": "v3"}'
    assert full[1].vec[3] == 1.0


def test_impls_agree_on_real_data(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = (emb.orderBy("vec_id").limit(3)
          .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")))
    a = knn_search(emb, qs, k=4, id_col="vec_id", vec_col="embedding",
                   impl="expr").collect()
    b = knn_search(emb, qs, k=4, id_col="vec_id", vec_col="embedding",
                   impl="pandas").collect()
    assert [(r.query_id, r.id) for r in a] == [(r.query_id, r.id) for r in b]
    for ra, rb in zip(a, b):
        assert ra.distance == pytest.approx(rb.distance, abs=1e-6)


def test_cosine_metric(spark, eye_store):
    q = np.zeros(DIM); q[0] = 2.0  # scaled copy of basis 0 → cosine dist 0
    res = knn_search(eye_store, make_queries(spark, [q]), k=2, metric="cosine",
                     impl="expr").collect()
    assert res[0].id == 0
    assert res[0].distance == pytest.approx(0.0, abs=1e-9)
    assert res[1].distance == pytest.approx(1.0, abs=1e-9)


def test_pandas_impl_tie_break_across_chunks(spark):
    """Regression: duplicate vectors at the kth boundary — the local
    argpartition must not drop the lower-id member of a tie group
    (code-review finding).  Many identical vectors spread over several
    partitions force ties to straddle every local top-k boundary."""
    rows = [(i, [1.0, 0.0]) for i in range(40)]  # 40 identical vectors
    idx = spark.createDataFrame(
        [(i, v, "{}") for i, v in rows],
        "id long, vec array<float>, doc string",
    ).repartition(8)
    qs = make_queries(spark, [[1.0, 0.0]])
    for impl in ("expr", "pandas"):
        got = [r.id for r in knn_search(idx, qs, k=5, impl=impl).collect()]
        assert got == [0, 1, 2, 3, 4], (impl, got)


def test_pandas_impl_rejects_oversized_query_batch(spark, eye_store, monkeypatch):
    """The pandas kernel broadcasts the query side; a query set past the
    ceiling must fail loudly with a pointer to the join-based impl instead
    of silently collecting it to the driver."""
    import vector_db_at_home_spark.operators.knn as knn_mod

    monkeypatch.setattr(knn_mod, "_MAX_QUERY_ROWS", 3)
    qs = make_queries(spark, [np.zeros(DIM) for _ in range(5)])
    with pytest.raises(ValueError, match="query batch exceeds"):
        knn_search(eye_store, qs, k=1, impl="pandas")


def test_pandas_and_expr_agree_on_cosine(spark, eye_store):
    """Both kNN kernels implement the cosine metric identically."""
    qs = make_queries(spark, [np.ones(DIM), np.eye(DIM)[3] * 0.5])
    a = knn_search(eye_store, qs, k=4, metric="cosine", impl="expr").collect()
    b = knn_search(eye_store, qs, k=4, metric="cosine", impl="pandas").collect()
    assert [(r.query_id, r.id) for r in a] == [(r.query_id, r.id) for r in b]
    for ra, rb in zip(a, b):
        assert ra.distance == pytest.approx(rb.distance, abs=1e-9)


def test_dot_metric_both_impls_agree(spark):
    """metric="dot" (MIPS): both impls return identical rankings AND
    bit-identical distances (the pandas GEMM re-scores winners with the
    same expression), and the top hit is the true max-inner-product row,
    not the nearest-by-L2 one."""
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.knn import knn_search

    # id 1 has the same direction as the query but twice the magnitude —
    # MIPS must prefer it over the exactly-equal vector (id 0)
    rows = [(0, [1.0, 0.0]), (1, [2.0, 0.0]), (2, [0.0, 1.0]),
            (3, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    q = spark.createDataFrame([(0, [1.0, 0.0])],
                              "query_id long, qvec array<double>")
    exp = knn_search(df, q, k=3, metric="dot", impl="expr").collect()
    pan = knn_search(df, q, k=3, metric="dot", impl="pandas").collect()
    assert [(r.id, r.distance) for r in exp] == \
        [(r.id, r.distance) for r in pan]
    assert [r.id for r in exp] == [1, 0, 2]          # MIPS order
    assert exp[0].distance == -2.0

    with __import__("pytest").raises(ValueError, match="metric"):
        knn_search(df, q, k=1, metric="nope").collect()


def test_knn_join_blocked_bit_identical_to_expr(spark):
    """The two-table blocked GEMM join returns EXACTLY impl='expr''s
    result — same ids, bit-identical distances — across block
    configurations and both metrics (the winner vectors re-score through
    the same expression in the original element types)."""
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.knn import (
        knn_join_blocked,
        knn_search,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    for metric in ("l2", "cosine"):
        exact = knn_search(emb, qs, k=5, id_col="vec_id",
                           vec_col="embedding", impl="expr",
                           metric=metric).collect()
        for nq, ni in [(4, 4), (2, 7), (1, 1)]:
            got = knn_join_blocked(
                qs, emb, k=5, id_col="vec_id", vec_col="embedding",
                metric=metric, n_query_blocks=nq, n_index_blocks=ni,
            ).collect()
            assert [(r.query_id, r.id) for r in got] \
                == [(r.query_id, r.id) for r in exact]
            assert all(a.distance == b.distance
                       for a, b in zip(exact, got)), (metric, nq, ni)
