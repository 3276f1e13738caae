"""Product-quantization tests: compression, determinism, recall vs exact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_at_home_spark.operators.ann import recall_at_k
from vector_db_at_home_spark.operators.knn import knn_search
from vector_db_at_home_spark.operators.pq import pq_build, pq_search


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(spark, emb):
    return (
        emb.orderBy("vec_id")
        .limit(8)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qvec"))
    )


@pytest.fixture(scope="module")
def pq(emb):
    return pq_build(emb, id_col="vec_id", vec_col="embedding", m=8,
                    fit_sample_rows=400)


def test_codes_are_m_bytes(pq, emb):
    rows = pq.codes.collect()
    assert len(rows) == emb.count()
    assert all(len(r.code) == 8 for r in rows)  # 64-dim float32 → 8 bytes


def test_build_deterministic(emb, pq):
    again = pq_build(emb, id_col="vec_id", vec_col="embedding", m=8,
                     fit_sample_rows=400)
    a = {r.id: bytes(r.code) for r in pq.codes.collect()}
    b = {r.id: bytes(r.code) for r in again.codes.collect()}
    assert a == b


def test_adc_recall_and_refined_recall(emb, queries, pq):
    exact = knn_search(emb, queries, k=10, id_col="vec_id",
                       vec_col="embedding", impl="expr")
    adc = pq_search(pq, queries, k=10)
    r_adc = recall_at_k(adc, exact)
    refined = pq_search(pq, queries, k=10, refine_with=emb,
                        refine_factor=4, id_col="vec_id", vec_col="embedding")
    r_ref = recall_at_k(refined, exact)
    # ADC alone is lossy; exact re-rank over 4k candidates recovers most
    assert r_adc >= 0.4
    assert r_ref >= 0.8
    assert r_ref >= r_adc
    # the query vector itself (distance 0) must always be found
    top1 = {(r.query_id, r.id) for r in refined.collect()
            if r.distance == pytest.approx(0.0, abs=1e-9)}
    assert {(q, q) for q in range(8)} <= top1


def test_refined_distances_are_exact(emb, queries, pq):
    refined = pq_search(pq, queries, k=5, refine_with=emb,
                        refine_factor=4, id_col="vec_id", vec_col="embedding")
    exact = knn_search(emb, queries, k=5, id_col="vec_id",
                       vec_col="embedding", impl="expr")
    edist = {(r.query_id, r.id): r.distance for r in exact.collect()}
    for r in refined.collect():
        key = (r.query_id, r.id)
        if key in edist:  # shared hits carry the true distance
            assert r.distance == pytest.approx(edist[key], abs=1e-9)


def test_bad_m_raises(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_build(emb, id_col="vec_id", vec_col="embedding", m=7)


def test_empty_table_raises(spark):
    empty = spark.createDataFrame([], "id long, vec array<float>")
    with pytest.raises(ValueError, match="empty"):
        pq_build(empty)


def test_ivfpq_composed_search(spark, emb, queries, pq):
    """IVF probing × PQ codes × exact re-rank: the composed index finds
    most of the exact top-k while scanning only probed cells' codes."""
    from vector_db_at_home_spark.operators.ann import ivf_build
    from vector_db_at_home_spark.operators.pq import ivfpq_search

    ivf = ivf_build(emb, id_col="vec_id", vec_col="embedding", n_cells=8)
    exact = knn_search(emb, queries, k=5, id_col="vec_id",
                       vec_col="embedding", impl="expr")
    got = ivfpq_search(ivf, pq, queries, k=5, n_probes=4,
                       refine_with=emb, refine_factor=8,
                       id_col="vec_id", vec_col="embedding")
    r = recall_at_k(got, exact)
    assert r >= 0.7
    # probing all cells with generous refine == IVF pruning costs no recall
    got_all = ivfpq_search(ivf, pq, queries, k=5, n_probes=8,
                           refine_with=emb, refine_factor=16,
                           id_col="vec_id", vec_col="embedding")
    assert recall_at_k(got_all, exact) >= r
    # every query's own vector (distance 0) survives the composition
    zero = {(r2.query_id, r2.id) for r2 in got.collect()
            if abs(r2.distance) < 1e-9}
    assert {(q, q) for q in range(8)} <= zero


def test_pq_save_load_roundtrip(spark, tmp_path, emb, queries, pq):
    from vector_db_at_home_spark.operators.pq import pq_load, pq_save

    want = [(r.query_id, r.id) for r in pq_search(pq, queries, k=5).collect()]
    pq_save(pq, str(tmp_path / "pq"))
    reopened = pq_load(spark, str(tmp_path / "pq"))
    assert (reopened.m, reopened.dim) == (pq.m, pq.dim)
    import numpy as np

    assert np.array_equal(reopened.codebooks, pq.codebooks)
    got = [(r.query_id, r.id) for r in
           pq_search(reopened, queries, k=5).collect()]
    assert got == want


def test_pq_append_matches_full_encode(spark):
    """pq_append encodes new rows to the same bytes a full pq_build with
    identical codebooks would, and appended rows are searchable."""
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.pq import (
        pq_append,
        pq_build,
        pq_search,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    pq_old = pq_build(old, id_col="vec_id", vec_col="embedding", m=8,
                      fit_sample_rows=200)
    appended = pq_append(pq_old, new, id_col="vec_id", vec_col="embedding")
    assert appended.codes.count() == emb.count()
    # the appended codes equal what the same codebooks produce for those
    # rows directly (encode determinism)
    again = pq_append(pq_old, new, id_col="vec_id", vec_col="embedding")
    a = {r.id: bytes(r.code) for r in appended.codes.collect()}
    b = {r.id: bytes(r.code) for r in again.codes.collect()}
    assert a == b
    # an appended vector is findable via ADC + exact re-rank at rank 1
    probe = new.limit(1).collect()[0]
    qs = spark.createDataFrame(
        [(0, [float(x) for x in probe.embedding])],
        "query_id int, qvec array<double>",
    )
    hits = pq_search(appended, qs, k=1, refine_with=emb,
                     refine_factor=8, id_col="vec_id",
                     vec_col="embedding").collect()
    assert hits[0].id == probe.vec_id


def test_ivfpq_append_o_batch_ingest(spark, emb, queries):
    """ivfpq_append: build both levers on 80% of the corpus, append the
    other 20% in one call — appended rows are immediately findable through
    the composed search (each appended query's own vector at distance 0),
    and the id sets of the two index sides stay consistent."""
    from vector_db_at_home_spark.operators.ann import ivf_build
    from vector_db_at_home_spark.operators.pq import (
        ivfpq_append,
        ivfpq_search,
    )

    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    ivf = ivf_build(corpus, id_col="vec_id", vec_col="embedding", n_cells=8)
    pq0 = pq_build(corpus, id_col="vec_id", vec_col="embedding", m=8,
                   fit_sample_rows=400)
    ivf2, pq2 = ivfpq_append(ivf, pq0, batch, id_col="vec_id",
                             vec_col="embedding")
    n = emb.count()
    assert ivf2.assigned.count() == n
    assert pq2.codes.count() == n
    # ids consistent across the two sides
    assert ivf2.assigned.select("id").subtract(
        pq2.codes.select("id")).count() == 0

    got = ivfpq_search(ivf2, pq2, queries, k=5, n_probes=8,
                       refine_with=emb, refine_factor=8,
                       id_col="vec_id", vec_col="embedding")
    zero = {(r.query_id, r.id) for r in got.collect()
            if abs(r.distance) < 1e-9}
    appended_queries = {q for q in range(8) if q % 5 == 0}
    assert {(q, q) for q in appended_queries} <= zero


def test_pq_sync_with_store_incremental(spark, tmp_path):
    """pq_sync_with_store: new store rows are encoded with the saved
    codebooks and appended to the codes table (O(batch), idempotent);
    synced vectors are findable at rank 1 through the reloaded index."""
    import numpy as np

    from vector_db_at_home_spark.operators.pq import (
        pq_load,
        pq_save,
        pq_sync_with_store,
    )
    from vector_db_at_home_spark.store import VectorStore

    rng = np.random.default_rng(11)
    store = VectorStore(spark, tmp_path / "st_pqs", dim=16)
    store.insert(rng.normal(size=(50, 16)).astype("float32"))

    path = str(tmp_path / "pq_sync")
    pq0 = pq_build(store.df(), id_col="id", vec_col="vec", m=4,
                   fit_sample_rows=200)
    pq_save(pq0, path)

    store.insert((rng.normal(size=(12, 16)) + 4.0).astype("float32"))
    assert pq_sync_with_store(spark, store, path) == 12
    assert pq_sync_with_store(spark, store, path) == 0   # idempotent

    synced = pq_load(spark, path)
    assert synced.codes.count() == 62
    qid = 50
    q = store.df().filter(F.col("id") == qid).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    got = pq_search(synced, q, k=1, refine_with=store.df(),
                    refine_factor=8, id_col="id", vec_col="vec").collect()
    assert [r.id for r in got] == [qid]
    assert abs(got[0].distance) < 1e-5
