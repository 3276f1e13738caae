"""IVF-SQ8 tests: recall vs exact kNN, the no-drift append property,
save/load/sync, and the reconstruction-error contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_at_home_spark.operators.ann import recall_at_k
from vector_db_at_home_spark.operators.knn import knn_search
from vector_db_at_home_spark.operators.sq import (
    ivfsq_append,
    ivfsq_build,
    ivfsq_load,
    ivfsq_save,
    ivfsq_search,
    ivfsq_sync_with_store,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(spark, emb):
    return (
        emb.orderBy("vec_id")
        .limit(8)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qvec"))
    )


@pytest.fixture(scope="module")
def sq(emb):
    return ivfsq_build(emb, id_col="vec_id", vec_col="embedding", n_cells=8)


def _exact(emb, queries, k=5):
    return knn_search(emb, queries, k=k, id_col="vec_id",
                      vec_col="embedding", impl="expr")


def test_ivfsq_full_probe_refined_equals_exact(emb, queries, sq):
    """All cells probed + exact re-rank ⇒ identical to brute force."""
    exact = _exact(emb, queries)
    approx = ivfsq_search(sq, queries, k=5, n_probes=8,
                          refine_with=emb, id_col="vec_id",
                          vec_col="embedding")
    assert recall_at_k(approx, exact) == 1.0


def test_ivfsq_partial_probe_recall(emb, queries, sq):
    """int8 scan without re-rank still recovers most exact hits at half
    the cells probed."""
    exact = _exact(emb, queries)
    approx = ivfsq_search(sq, queries, k=5, n_probes=4)
    assert recall_at_k(approx, exact) >= 0.6


def test_ivfsq_error_bound(emb, sq):
    """|code·scale − x| ≤ scale/2 for every element of every vector."""
    deq = F.transform(F.col("codes"),
                      lambda c: c.cast("double") * F.col("scale"))
    orig = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    max_err = F.aggregate(
        F.zip_with(deq, orig, lambda a, b: F.abs(a - b)),
        F.lit(0.0), lambda acc, x: F.greatest(acc, x),
    )
    bad = (
        sq.codes.join(
            emb.select(F.col("vec_id").alias("id"), "embedding"), "id"
        )
        .filter(max_err > F.col("scale") * 0.5 * (1.0 + 1e-9))
        .count()
    )
    assert bad == 0


def test_ivfsq_append_no_drift(emb):
    """Scalar quantization has no fitted state, so the appended 20% slice
    carries EXACTLY the codes a full rebuild with the same centroids would
    give (assignment + per-vector encode are both batch-local)."""
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    base = ivfsq_build(corpus, id_col="vec_id", vec_col="embedding",
                       n_cells=8)
    appended = ivfsq_append(base, batch, id_col="vec_id",
                            vec_col="embedding")
    assert appended.codes.count() == emb.count()
    # full-table encode against the SAME centroids (append with empty base)
    empty = ivfsq_append(
        type(base)(codes=base.codes.filter(F.lit(False)),
                   centroids=base.centroids, n_cells=base.n_cells),
        batch, id_col="vec_id", vec_col="embedding",
    )
    batch_codes = {
        r.id: (r.cell, r.scale, tuple(r.codes))
        for r in appended.codes.join(
            batch.select(F.col("vec_id").alias("id")), "id", "left_semi"
        ).collect()
    }
    fresh_codes = {
        r.id: (r.cell, r.scale, tuple(r.codes))
        for r in empty.codes.collect()
    }
    assert batch_codes == fresh_codes


def test_ivfsq_save_load_roundtrip(spark, tmp_path, emb, queries, sq):
    path = str(tmp_path / "sqidx")
    ivfsq_save(sq, path)
    re = ivfsq_load(spark, path)
    assert re.n_cells == sq.n_cells
    a = ivfsq_search(sq, queries, k=5, n_probes=8).collect()
    b = ivfsq_search(re, queries, k=5, n_probes=8).collect()
    assert [(r.query_id, r.id) for r in a] == [(r.query_id, r.id) for r in b]


def test_ivfsq_sync_with_store_incremental(spark, tmp_path):
    from vector_db_at_home_spark.store import VectorStore

    import numpy as np

    store = VectorStore(spark, tmp_path / "store", dim=8)
    rng = np.random.default_rng(7)
    v0 = rng.normal(size=(40, 8)).astype("float32")
    store.insert(v0)
    sq = ivfsq_build(
        store.df().select(F.col("id"), F.col("vec")),
        id_col="id", vec_col="vec", n_cells=4,
    )
    path = str(tmp_path / "sqidx")
    ivfsq_save(sq, path)
    # grow the store; sync twice — second call must be a no-op
    v1 = rng.normal(size=(15, 8)).astype("float32")
    store.insert(v1)
    assert ivfsq_sync_with_store(spark, store, path,
                                 id_col="id", vec_col="vec") == 15
    assert ivfsq_sync_with_store(spark, store, path,
                                 id_col="id", vec_col="vec") == 0
    re = ivfsq_load(spark, path)
    assert re.codes.count() == 55


def test_stream_ingest_then_ivfsq_sync_loop(spark, tmp_path):
    """The full production loop for the int8 tier: streaming feed → store
    append → ivfsq_sync_with_store per cadence — synced vectors are
    immediately searchable at rank 1 through the saved index, and the
    sync is O(batch)-idempotent across repeats."""
    import numpy as np

    from vector_db_at_home_spark.store import VectorStore
    from vector_db_at_home_spark.streaming.ingest import stream_into_store

    rng = np.random.default_rng(11)
    feed = str(tmp_path / "feed")
    first = rng.normal(size=(20, 8)).astype("float32")
    spark.createDataFrame(
        [(v.tolist(), "{}") for v in first], "vec array<float>, doc string"
    ).coalesce(1).write.parquet(feed, mode="append")

    store = VectorStore(spark, tmp_path / "store", dim=8)
    stream = (spark.readStream.schema("vec array<float>, doc string")
              .option("maxFilesPerTrigger", 1).parquet(feed))
    q = stream_into_store(stream, store,
                          checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination()

    path = str(tmp_path / "sqidx")
    sq = ivfsq_build(store.df().select("id", "vec"),
                     id_col="id", vec_col="vec", n_cells=4)
    ivfsq_save(sq, path)

    # second micro-batch lands, store grows, index syncs
    second = rng.normal(size=(7, 8)).astype("float32")
    spark.createDataFrame(
        [(v.tolist(), "{}") for v in second], "vec array<float>, doc string"
    ).coalesce(1).write.parquet(feed, mode="append")
    stream2 = (spark.readStream.schema("vec array<float>, doc string")
               .option("maxFilesPerTrigger", 1).parquet(feed))
    q2 = stream_into_store(stream2, store,
                           checkpoint_dir=str(tmp_path / "ckpt"))
    q2.awaitTermination()
    assert store.count() == 27
    assert ivfsq_sync_with_store(spark, store, path,
                                 id_col="id", vec_col="vec") == 7
    assert ivfsq_sync_with_store(spark, store, path,
                                 id_col="id", vec_col="vec") == 0

    # a synced vector is its own nearest neighbor through the saved index
    re = ivfsq_load(spark, path)
    from pyspark.sql import functions as FF

    probe_vec = store.df().filter(FF.col("id") == 25).select(
        FF.lit(25).alias("query_id"), FF.col("vec").alias("qvec")
    )
    hit = ivfsq_search(re, probe_vec, k=1, n_probes=4).collect()
    assert hit and hit[0].id == 25


def test_ivfsq_cosine_via_normalization(spark, emb):
    """The unit-sphere identity carries to the int8 tier: IVF-SQ8 over
    l2-normalized vectors with exact re-rank returns exactly the cosine
    kNN ranking (argmin L2 on the sphere == argmax cosine)."""
    from vector_db_at_home_spark.operators.embeddings import l2_normalize

    unit = l2_normalize(emb, "embedding", "vec_id", out_col="vec")
    qs = (
        unit.orderBy("id").limit(6)
        .select(F.col("id").alias("query_id"), F.col("vec").alias("qvec"))
    )
    sq = ivfsq_build(unit, id_col="id", vec_col="vec", n_cells=8)
    approx = ivfsq_search(sq, qs, k=5, n_probes=8,
                          refine_with=unit, id_col="id", vec_col="vec")
    cos_exact = knn_search(emb, emb.orderBy("vec_id").limit(6).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec")), k=5,
        id_col="vec_id", vec_col="embedding",
        impl="expr", metric="cosine")
    assert [(r.query_id, r.id) for r in approx.collect()] \
        == [(r.query_id, r.id) for r in cos_exact.collect()]
