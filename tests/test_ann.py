"""ANN tests: IVF recall against the exact-kNN oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_at_home_spark.operators.ann import (
    ivf_build,
    ivf_search,
    recall_at_k,
)
from vector_db_at_home_spark.operators.knn import knn_search


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(spark, emb):
    return (
        emb.orderBy("vec_id")
        .limit(8)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )


def test_ivf_full_probe_equals_exact(spark, emb, queries):
    # probing ALL cells must reproduce exact kNN
    ivf = ivf_build(emb, id_col="vec_id", vec_col="embedding", n_cells=8)
    approx = ivf_search(ivf, queries, k=5, n_probes=8)
    exact = knn_search(emb, queries, k=5, id_col="vec_id", vec_col="embedding",
                       impl="expr")
    assert recall_at_k(approx, exact) == 1.0


def test_ivf_partial_probe_recall(spark, emb, queries):
    ivf = ivf_build(emb, id_col="vec_id", vec_col="embedding", n_cells=16)
    exact = knn_search(emb, queries, k=5, id_col="vec_id", vec_col="embedding",
                       impl="expr")
    r1 = recall_at_k(ivf_search(ivf, queries, k=5, n_probes=1), exact)
    r4 = recall_at_k(ivf_search(ivf, queries, k=5, n_probes=4), exact)
    # query vectors are store vectors → their own cell always probed first;
    # recall must be decent at 1 probe and improve (weakly) with more probes
    assert r1 >= 0.2
    assert r4 >= r1
    assert r4 >= 0.5


def test_ivf_deterministic(spark, emb, queries):
    ivf_a = ivf_build(emb, id_col="vec_id", vec_col="embedding", n_cells=8, seed=7)
    ivf_b = ivf_build(emb, id_col="vec_id", vec_col="embedding", n_cells=8, seed=7)
    a = ivf_search(ivf_a, queries, k=3, n_probes=2).collect()
    b = ivf_search(ivf_b, queries, k=3, n_probes=2).collect()
    assert [(r.query_id, r.id) for r in a] == [(r.query_id, r.id) for r in b]


def test_ivf_partitioned_store_prunes_partitions(spark, tmp_path, emb):
    """The IVF scale story made concrete: persist assignments partitioned
    by cell; a probe filter on cell prunes partitions at the SCAN (the plan
    carries the partition filter), so each probe reads only matching cells."""
    from vector_db_at_home_spark.operators.ann import ivf_build
    from vector_db_at_home_spark.plans.explain import formatted_plan

    ivf = ivf_build(emb, id_col="vec_id", vec_col="embedding", n_cells=8)
    path = str(tmp_path / "ivf_store")
    ivf.assigned.write.partitionBy("cell").parquet(path)
    stored = spark.read.parquet(path)
    probe = stored.filter(F.col("cell").isin([1, 3]))
    plan = formatted_plan(probe)
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1].split("]")[0]
    # only the probed cells' rows are read
    expected = ivf.assigned.filter(F.col("cell").isin([1, 3])).count()
    assert probe.count() == expected


def test_ivf_sampled_fit_recall(spark, emb, queries):
    """The KMeans fit runs on a bounded sample (fit_sample_rows < N); the
    full assign pass still covers every row, and recall at n_probes=4 stays
    >= 0.85 even on this tiny table (the 200k scale smoke pins >= 0.9
    with a far larger sample-to-cell ratio)."""
    n = emb.count()
    ivf = ivf_build(emb, id_col="vec_id", vec_col="embedding", n_cells=8,
                    fit_sample_rows=max(50, n // 4))
    assert ivf.assigned.count() == n  # every vector assigned, none sampled away
    exact = knn_search(emb, queries, k=5, id_col="vec_id", vec_col="embedding",
                       impl="expr")
    assert recall_at_k(ivf_search(ivf, queries, k=5, n_probes=4), exact) >= 0.85


def test_ivf_save_load_roundtrip(spark, tmp_path, emb, queries):
    from vector_db_at_home_spark.operators.ann import ivf_load, ivf_save

    ivf = ivf_build(emb, id_col="vec_id", vec_col="embedding", n_cells=8)
    want = [(r.query_id, r.id) for r in
            ivf_search(ivf, queries, k=5, n_probes=3).collect()]
    ivf_save(ivf, str(tmp_path / "ivf"))
    reopened = ivf_load(spark, str(tmp_path / "ivf"))
    assert reopened.n_cells == 8
    got = [(r.query_id, r.id) for r in
           ivf_search(reopened, queries, k=5, n_probes=3).collect()]
    assert got == want


def test_quantize_int8_roundtrip_error_bound(spark):
    import math

    from vector_db_at_home_spark.operators.embeddings import (
        dequantize_int8,
        l2_normalize,
        quantize_int8,
    )

    data = [
        (1, [1.0, -2.0, 0.5, 127.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),        # zero vector
        (3, [-0.001, 0.002, -0.003, 0.004]),
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    q = {r.id: r for r in quantize_int8(df, "embedding", "vec_id").collect()}
    assert q[2].scale == 0.0 and list(q[2].codes) == [0, 0, 0, 0]
    assert max(abs(c) for c in q[1].codes) == 127
    deq = {r.id: r for r in dequantize_int8(
        quantize_int8(df, "embedding", "vec_id"), out_col="recon"
    ).collect()}
    for vid, vec in data:
        s = q[vid].scale
        for orig, rec in zip(vec, deq[vid].recon):
            assert abs(orig - rec) <= s / 2 + 1e-12
    n = {r.id: r for r in l2_normalize(df, "embedding", "vec_id").collect()}
    assert abs(math.sqrt(sum(x * x for x in n[1].unit_vec)) - 1.0) < 1e-12
    assert list(n[2].unit_vec) == [0.0, 0.0, 0.0, 0.0]


def test_ivf_append_matches_full_assignment(spark):
    """ivf_append assigns new rows to the same cells a full rebuild with
    the SAME centroids would, and appended vectors are findable."""
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.ann import (
        ivf_append,
        ivf_build,
        ivf_search,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    ivf = ivf_build(old, id_col="vec_id", vec_col="embedding", n_cells=8)
    appended = ivf_append(ivf, new, id_col="vec_id", vec_col="embedding")
    assert appended.assigned.count() == emb.count()
    # appended rows landed in their true nearest cell: recompute directly
    import math

    cents = {r.cell: r.cvec for r in ivf.centroids.collect()}
    got = {r.id: r.cell for r in appended.assigned.collect()}
    for r in new.collect():
        v = [float(x) for x in r.embedding]
        best = min(
            cents,
            key=lambda c: (
                sum((a - b) ** 2 for a, b in zip(v, cents[c])), c
            ),
        )
        assert got[r.vec_id] == best
    # a query equal to an appended vector finds it at rank 1
    probe = new.limit(1).collect()[0]
    qs = spark.createDataFrame(
        [(0, [float(x) for x in probe.embedding])],
        "query_id int, qvec array<double>",
    )
    hits = ivf_search(appended, qs, k=1, n_probes=2).collect()
    assert hits[0].id == probe.vec_id
    assert abs(hits[0].distance) < 1e-6


def test_ivf_sync_with_store_incremental(spark, tmp_path):
    """ivf_sync_with_store closes the stream->store->index loop: new store
    rows are assigned to existing centroids and appended to the saved
    cell-partitioned index (O(batch)); the call is idempotent; synced
    vectors are immediately findable at rank 1."""
    import numpy as np
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.ann import (
        ivf_build,
        ivf_load,
        ivf_save,
        ivf_search,
        ivf_sync_with_store,
    )
    from vector_db_at_home_spark.store import VectorStore

    rng = np.random.default_rng(7)
    store = VectorStore(spark, tmp_path / "st_sync", dim=8)
    base = rng.normal(size=(60, 8)).astype("float32")
    store.insert(base)

    path = str(tmp_path / "ivf_sync")
    ivf = ivf_build(store.df(), id_col="id", vec_col="vec", n_cells=4)
    ivf_save(ivf, path)

    # grow the store, then sync
    extra = (rng.normal(size=(15, 8)) + 5.0).astype("float32")
    store.insert(extra)
    added = ivf_sync_with_store(spark, store, path)
    assert added == 15
    assert ivf_sync_with_store(spark, store, path) == 0   # idempotent

    synced = ivf_load(spark, path)
    assert synced.assigned.count() == 75
    # a synced vector finds itself at distance ~0 through the saved index
    qid = 60  # first appended id (max+1 allocation)
    q = store.df().filter(F.col("id") == qid).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    got = ivf_search(synced, q, k=1, n_probes=4).collect()
    assert [r.id for r in got] == [qid]
    assert abs(got[0].distance) < 1e-5


def test_ivf_cosine_via_normalization(spark):
    """Cosine ANN recipe: IVF over l2_normalize'd vectors ranks by cosine
    (||a-b||^2 = 2-2cos on the unit sphere) — full-probe results equal
    exact cosine kNN's id ranking."""
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.ann import ivf_build, ivf_search
    from vector_db_at_home_spark.operators.embeddings import l2_normalize
    from vector_db_at_home_spark.operators.knn import knn_search

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")
    qs = (
        emb.orderBy("vec_id").limit(4)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qvec"))
    )
    exact = knn_search(emb, qs, k=5, id_col="vec_id", vec_col="embedding",
                       metric="cosine", impl="expr").collect()
    unit = l2_normalize(emb, "embedding", "vec_id")
    ivf = ivf_build(unit, id_col="id", vec_col="unit_vec", n_cells=4)
    uq = l2_normalize(qs.withColumnRenamed("query_id", "qid"),
                      "qvec", "qid").select(
        F.col("id").alias("query_id"), F.col("unit_vec").alias("qvec")
    )
    got = ivf_search(ivf, uq, k=5, n_probes=4).collect()  # all cells
    assert [(r.query_id, r.id) for r in got] == \
        [(r.query_id, r.id) for r in exact]


def test_ivf_filtered_search_prefilters(spark, emb, queries):
    """Round-6 filtered ANN: the predicate lands before the distance scan
    — results only carry matching labels, full-probe filtered search
    equals exact filtered kNN, and k stays full within the slice."""
    from vector_db_at_home_spark.operators.ann import IVFIndex

    ivf = ivf_build(emb, id_col="vec_id", vec_col="embedding", n_cells=8)
    enriched = IVFIndex(
        assigned=ivf.assigned.join(
            emb.select(F.col("vec_id").alias("id"), "label"), "id"
        ),
        centroids=ivf.centroids,
        n_cells=ivf.n_cells,
    )
    pred = F.col("label").isin(2, 5, 7)
    approx = ivf_search(enriched, queries, k=5, n_probes=8, where=pred)
    got = approx.join(
        emb.select(F.col("vec_id").alias("id"), "label"), "id"
    ).collect()
    assert got and all(r.label in (2, 5, 7) for r in got)
    exact = knn_search(
        emb.filter(pred), queries, k=5, id_col="vec_id",
        vec_col="embedding", impl="expr",
    )
    assert recall_at_k(approx, exact) == 1.0  # all cells probed


def test_cosine_admit_ivf_exhaustive_equals_blocked(spark):
    """r9: the IVF-pruned admit screen at n_probes = n_cells is
    exhaustive and returns exactly the blocked-GEMM kernel's ids; an
    EXACT copy of an indexed vector is found at even ONE probe (its
    nearest centroid is its source's cell by construction)."""
    import numpy as np

    from vector_db_at_home_spark.operators.ann import (
        cosine_admit_ivf,
        ivf_build,
    )
    from vector_db_at_home_spark.operators.dedup import (
        cosine_admit_blocked,
    )

    rng = np.random.default_rng(7)
    C = rng.standard_normal((60, 6))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    corpus = spark.createDataFrame(
        [(j, [float(x) for x in C[j]]) for j in range(60)],
        "vec_id long, embedding array<double>",
    )
    B = rng.standard_normal((20, 6))
    B /= np.linalg.norm(B, axis=1, keepdims=True)
    batch = spark.createDataFrame(
        [(100 + i, [float(x) for x in B[i]]) for i in range(20)]
        + [(1000 + j, [float(x) for x in C[j]]) for j in range(5)],  # copies
        "vec_id long, embedding array<double>",
    )
    ivf = ivf_build(corpus, id_col="vec_id", vec_col="embedding",
                    n_cells=8)

    # exhaustive probes == the exact kernel, at two thresholds
    for tau in (0.5, 0.9):
        want = {r.id for r in cosine_admit_blocked(
            batch, corpus, "embedding", "vec_id", tau).collect()}
        got = {r.id for r in cosine_admit_ivf(
            batch, ivf, "embedding", "vec_id", tau,
            n_probes=8).collect()}
        assert got == want, tau

    # exact copies found at ONE probe regardless of tau < 1
    got1 = {r.id for r in cosine_admit_ivf(
        batch, ivf, "embedding", "vec_id", 0.999999,
        n_probes=1).collect()}
    assert {1000 + j for j in range(5)} <= got1

    # probe-bound recall: 1 probe finds a SUBSET of exhaustive
    sub = {r.id for r in cosine_admit_ivf(
        batch, ivf, "embedding", "vec_id", 0.5, n_probes=1).collect()}
    full = {r.id for r in cosine_admit_ivf(
        batch, ivf, "embedding", "vec_id", 0.5, n_probes=8).collect()}
    assert sub <= full


def test_cosine_admit_ivf_hot_cell_guard(spark):
    """r10 (VERDICT r9 task 1): a 90%-one-cell corpus must flow through
    sub-block packing on BOTH sides without one giant blob, with admit
    decisions IDENTICAL to the unguarded per-cell pack."""
    import numpy as np

    from vector_db_at_home_spark.operators.ann import (
        cosine_admit_ivf,
        ivf_build,
    )

    # one dense blob (180 corpus rows sharing a dominant axis — one
    # k-means cell) + a small far cluster (20 rows)
    rows = []
    for i in range(180):
        v = np.zeros(16)
        v[0] = 100.0
        v[1 + (i % 5)] = ((i * 2654435761) % 97) / 10.0
        rows.append((i, [float(x) for x in v]))
    for i in range(20):
        v = np.zeros(16)
        v[8] = -50.0
        v[9] = float(i)
        rows.append((2000 + i, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ivf = ivf_build(corpus, id_col="vec_id", vec_col="embedding", n_cells=2)

    # batch: 30 exact copies of blob rows (always admitted at any probe
    # count), 5 copies of far-cluster rows, 10 novel orthogonal rows
    brows = [(10_000 + i, list(rows[i][1])) for i in range(30)]
    brows += [(20_000 + i, list(rows[180 + i][1])) for i in range(5)]
    for i in range(10):
        v = np.zeros(16)
        v[12] = 7.0 + i
        brows.append((30_000 + i, [float(x) for x in v]))
    batch = spark.createDataFrame(brows, "vec_id long, embedding array<double>")

    kw = dict(n_probes=2)
    guarded = {r.id for r in cosine_admit_ivf(
        batch, ivf, "embedding", "vec_id", 0.999,
        max_cell_rows=40, **kw).collect()}
    plain = {r.id for r in cosine_admit_ivf(
        batch, ivf, "embedding", "vec_id", 0.999,
        max_cell_rows=10**9, **kw).collect()}
    assert guarded == plain
    assert {10_000 + i for i in range(30)} <= guarded   # exact copies
    assert {20_000 + i for i in range(5)} <= guarded
    assert not any(i >= 30_000 for i in guarded)        # novel rows pass
    # determinism of the guarded path
    g2 = {r.id for r in cosine_admit_ivf(
        batch, ivf, "embedding", "vec_id", 0.999,
        max_cell_rows=40, **kw).collect()}
    assert g2 == guarded
    # a lower threshold admits more, identically in both paths
    g_lo = {r.id for r in cosine_admit_ivf(
        batch, ivf, "embedding", "vec_id", 0.5,
        max_cell_rows=40, **kw).collect()}
    p_lo = {r.id for r in cosine_admit_ivf(
        batch, ivf, "embedding", "vec_id", 0.5,
        max_cell_rows=10**9, **kw).collect()}
    assert g_lo == p_lo and guarded <= g_lo


class _VecStore:
    """store-shaped adapter for ivf_sync_with_store."""

    def __init__(self, df_):
        self._df = df_

    def df(self):
        return self._df


def test_ivf_drift_monitor_and_refit(spark, tmp_path):
    """r10 (VERDICT r9 task 5): a drifting ingest stream must raise the
    centroid-drift signal — the batch's mean distance-to-assigned-
    centroid vs the build-time baseline — before probe recall silently
    rots; a refit (ivf_build + ivf_save, the documented policy) resets
    the baseline and restores recall."""
    import numpy as np

    from vector_db_at_home_spark.operators.ann import (
        ivf_build,
        ivf_drift_status,
        ivf_save,
        ivf_search,
        ivf_sync_with_store,
        recall_at_k,
    )
    from vector_db_at_home_spark.operators.knn import knn_search

    rng = np.random.default_rng(3)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    base_rows = []
    for i in range(300):
        c = centers[i % 3]
        base_rows.append((i, [float(c[0] + rng.normal(0, 0.5)),
                              float(c[1] + rng.normal(0, 0.5))]))
    base_df = spark.createDataFrame(base_rows, "id long, vec array<double>")
    path = str(tmp_path / "ivf_drift")
    ivf_save(ivf_build(base_df, n_cells=3, seed=1), path)

    st = ivf_drift_status(spark, path)
    assert st["baseline"] is not None and st["n_batches"] == 0
    assert st["refit_recommended"] is False

    # batch 1: in-distribution → ratio ≈ 1, no recommendation
    in_rows = []
    for i in range(60):
        c = centers[i % 3]
        in_rows.append((1000 + i, [float(c[0] + rng.normal(0, 0.5)),
                                   float(c[1] + rng.normal(0, 0.5))]))
    store_df = base_df.unionByName(
        spark.createDataFrame(in_rows, "id long, vec array<double>"))
    s1 = {}
    assert ivf_sync_with_store(spark, _VecStore(store_df), path,
                               stats=s1) == 60
    assert 0.5 < s1["drift_ratio"] < 1.5 and not s1["refit_recommended"]

    # batch 2: the distribution SHIFTS to (50, 50) — far from every
    # centroid, split across two old cells by the x<>y diagonal
    far_rows = [(2000 + i, [float(50 + rng.normal(0, 0.5)),
                            float(50 + rng.normal(0, 0.5))])
                for i in range(80)]
    store_df = store_df.unionByName(
        spark.createDataFrame(far_rows, "id long, vec array<double>"))
    s2 = {}
    assert ivf_sync_with_store(spark, _VecStore(store_df), path,
                               stats=s2) == 80
    assert s2["drift_ratio"] > 5 and s2["refit_recommended"]
    st = ivf_drift_status(spark, path)
    assert st["n_batches"] == 2 and st["refit_recommended"]

    # recall on the drifted slice degrades at low probes…
    from vector_db_at_home_spark.operators.ann import ivf_load

    queries = spark.createDataFrame(
        [(i, [float(50 + rng.normal(0, 0.5)), float(50 + rng.normal(0, 0.5))])
         for i in range(8)],
        "query_id long, qvec array<double>",
    )
    exact = knn_search(store_df, queries, k=5)
    drifted_recall = recall_at_k(
        ivf_search(ivf_load(spark, path), queries, k=5, n_probes=1), exact)

    # …the documented response: refit + save (resets baseline and log)
    ivf_save(ivf_build(store_df, n_cells=4, seed=1), path)
    st = ivf_drift_status(spark, path)
    assert st["n_batches"] == 0 and st["refit_recommended"] is False
    refit_recall = recall_at_k(
        ivf_search(ivf_load(spark, path), queries, k=5, n_probes=1), exact)
    assert refit_recall >= 0.9 and refit_recall > drifted_recall

    # a post-refit in-distribution batch scores ~1 against the NEW
    # baseline (the far region is in-distribution now)
    more = [(3000 + i, [float(50 + rng.normal(0, 0.5)),
                        float(50 + rng.normal(0, 0.5))]) for i in range(20)]
    store_df = store_df.unionByName(
        spark.createDataFrame(more, "id long, vec array<double>"))
    s3 = {}
    ivf_sync_with_store(spark, _VecStore(store_df), path, stats=s3)
    assert s3["drift_ratio"] < 1.5 and not s3["refit_recommended"]


def test_ivf_build_auto_cells(spark):
    """r10: n_cells=None derives the cell count from the corpus size
    (the semantic_dedup auto-cells rule), clamped to the fit sample."""
    import numpy as np

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((400, 4))
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(400)],
        "id long, vec array<double>",
    )
    ivf = ivf_build(df, n_cells=None, target_cell_rows=50)
    assert ivf.n_cells == 8  # ceil(400/50)
    assert ivf.assigned.select("cell").distinct().count() <= 8
    # tiny corpus: clamps to >= 2, never exceeds the row count
    small = df.limit(3)
    ivf2 = ivf_build(small, n_cells=None, target_cell_rows=4096)
    assert ivf2.n_cells == 2


def test_ivf_append_saved_equals_store_diff_sync(spark, tmp_path):
    """r10: the batch form (caller knows the new rows) lands the SAME
    index rows as the store-diff sync — without scanning the embedding
    store — and shares its idempotence (the index-id anti-join) and
    drift recording."""
    import numpy as np

    from vector_db_at_home_spark.operators.ann import (
        ivf_append_saved,
        ivf_build,
        ivf_save,
        ivf_sync_with_store,
    )

    rng = np.random.default_rng(21)
    mat = rng.standard_normal((120, 6))
    base = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(100)],
        "id long, vec array<double>",
    )
    batch = spark.createDataFrame(
        [(100 + j, [float(x) for x in mat[100 + j]]) for j in range(20)],
        "id long, vec array<double>",
    )
    ivf = ivf_build(base, n_cells=4, seed=3)
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    ivf_save(ivf, pa)
    ivf_save(ivf, pb)

    sa, sb = {}, {}
    assert ivf_append_saved(spark, pa, batch, stats=sa) == 20
    assert ivf_sync_with_store(
        spark, _VecStore(base.unionByName(batch)), pb, stats=sb) == 20

    rows_a = sorted(tuple(r) for r in spark.read.parquet(f"{pa}/assigned")
                    .select("id", "cell").collect())
    rows_b = sorted(tuple(r) for r in spark.read.parquet(f"{pb}/assigned")
                    .select("id", "cell").collect())
    assert rows_a == rows_b
    assert abs(sa["drift_ratio"] - sb["drift_ratio"]) < 1e-12

    # idempotent: replaying the same batch adds nothing
    assert ivf_append_saved(spark, pa, batch) == 0


def test_ivf_drift_baseline_torn_save_guard(spark, tmp_path):
    """r11 (ADVICE r10): a crash between ivf_save's centroid overwrite
    and its baseline write must NOT pair the fresh centroids with the
    previous build's baseline — the baseline's centroid_sig detects the
    mismatch and every drift reader degrades to no-signal."""
    import numpy as np

    from vector_db_at_home_spark.operators.ann import (
        ivf_append_saved,
        ivf_build,
        ivf_drift_status,
        ivf_save,
    )
    from vector_db_at_home_spark.functions.fsutil import fs_exists

    rng = np.random.default_rng(7)
    mat = rng.standard_normal((80, 4))
    base = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(60)],
        "id long, vec array<double>",
    )
    path = str(tmp_path / "torn")
    ivf_save(ivf_build(base, n_cells=4, seed=5), path)
    assert ivf_drift_status(spark, path)["baseline"] is not None

    # simulate the torn window: a refit overwrote assigned+centroids
    # and crashed before the new baseline landed
    refit = ivf_build(base, n_cells=3, seed=99)
    refit.assigned.write.partitionBy("cell").mode("overwrite").parquet(
        f"{path}/assigned")
    refit.centroids.write.mode("overwrite").parquet(f"{path}/centroids")

    st = ivf_drift_status(spark, path)
    assert st["baseline"] is None and st["refit_recommended"] is False

    # a sync in this state records nothing (no spurious refit signal)
    batch = spark.createDataFrame(
        [(100 + j, [float(x) for x in mat[60 + j]]) for j in range(20)],
        "id long, vec array<double>",
    )
    s = {}
    assert ivf_append_saved(spark, path, batch, stats=s) == 20
    assert "drift_ratio" not in s
    assert not fs_exists(spark, f"{path}/drift/log")

    # a completed refit (full ivf_save) restores the signal
    ivf_save(ivf_build(base.unionByName(batch), n_cells=4, seed=5), path)
    assert ivf_drift_status(spark, path)["baseline"] is not None


def test_ivf_drift_zero_baseline_is_no_signal(spark, tmp_path):
    """r11 (ADVICE r10): a ~0 baseline (k ≈ n, every vector ON its
    centroid) must not divide to an astronomically large ratio that
    latches refit_recommended true forever — it records NaN and never
    recommends."""
    import math

    from vector_db_at_home_spark.operators.ann import (
        ivf_append_saved,
        ivf_build,
        ivf_drift_status,
        ivf_save,
    )

    base = spark.createDataFrame(
        [(i, [float(i), float(-i)]) for i in range(6)],
        "id long, vec array<double>",
    )
    path = str(tmp_path / "zero")
    ivf_save(ivf_build(base, n_cells=6, seed=1, max_iter=30), path)
    st = ivf_drift_status(spark, path)
    assert st["baseline"] is not None
    assert st["baseline"]["mean_dist"] <= 1e-9

    batch = spark.createDataFrame(
        [(100, [500.0, 500.0]), (101, [501.0, 499.0])],
        "id long, vec array<double>",
    )
    s = {}
    assert ivf_append_saved(spark, path, batch, stats=s) == 2
    assert math.isnan(s["drift_ratio"])
    assert s["refit_recommended"] is False
    st = ivf_drift_status(spark, path)
    assert st["n_batches"] == 1 and st["refit_recommended"] is False


def test_ivf_append_saved_drift_after_rows(spark, tmp_path, monkeypatch):
    """r11 (ADVICE r10): the assigned rows land BEFORE the drift-log
    row, so a crash between them can only lose one drift row — the
    replay's anti-join sees the committed rows and no-ops instead of
    re-appending the batch and double-counting it in the log."""
    import numpy as np

    from vector_db_at_home_spark.operators import ann

    rng = np.random.default_rng(13)
    mat = rng.standard_normal((70, 4))
    base = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(50)],
        "id long, vec array<double>",
    )
    path = str(tmp_path / "order")
    ann.ivf_save(ann.ivf_build(base, n_cells=4, seed=2), path)
    batch = spark.createDataFrame(
        [(100 + j, [float(x) for x in mat[50 + j]]) for j in range(20)],
        "id long, vec array<double>",
    )

    real_record = ann._drift_record

    def boom(*a, **k):
        raise RuntimeError("crash between append and drift record")

    monkeypatch.setattr(ann, "_drift_record", boom)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="crash between"):
        ann.ivf_append_saved(spark, path, batch)
    # the batch IS committed (rows first) …
    got = spark.read.parquet(f"{path}/assigned").select("id")
    assert got.count() == 70 and got.distinct().count() == 70
    # … and the drift log has nothing (the lost-row window, documented)
    assert ann.ivf_drift_status(spark, path)["n_batches"] == 0

    # replay converges: no duplicates, still exactly one row per id
    monkeypatch.setattr(ann, "_drift_record", real_record)
    assert ann.ivf_append_saved(spark, path, batch) == 0
    got = spark.read.parquet(f"{path}/assigned").select("id")
    assert got.count() == 70 and got.distinct().count() == 70


def test_ivf_append_saved_readmit_tombstoned_id(spark, tmp_path):
    """r11 (ADVICE r10): ivf_search never dedups, so a re-admitted
    tombstoned id must NOT append a second assignment row — the append
    rewrites the tombstones (resurfacing the original row) and the
    idempotence guard anti-joins the RAW ids.  Also pins that a
    still-tombstoned store row is no longer re-appended on every sync."""
    import numpy as np

    from vector_db_at_home_spark.operators.ann import (
        ivf_append_saved,
        ivf_build,
        ivf_load,
        ivf_save,
        ivf_sync_deletes,
        ivf_sync_with_store,
    )

    rng = np.random.default_rng(31)
    mat = rng.standard_normal((60, 4))
    rows = [(i, [float(x) for x in mat[i]]) for i in range(50)]
    base = spark.createDataFrame(rows, "id long, vec array<double>")
    path = str(tmp_path / "ivf_readmit")
    ivf_save(ivf_build(base, n_cells=4, seed=9), path)

    live = base.filter("id <> 7")
    assert ivf_sync_deletes(spark, _VecStore(live), path) == 1
    assert ivf_load(spark, path).assigned.filter("id = 7").count() == 0

    # a sync while id 7 is still in the store and tombstoned must not
    # re-append it (the old filtered guard did, duplicating every sync)
    assert ivf_sync_with_store(spark, _VecStore(live), path) == 0
    raw = spark.read.parquet(f"{path}/assigned")
    assert raw.filter("id = 7").count() == 1

    # re-admit id 7 (same vector) alongside a truly new row
    batch = spark.createDataFrame(
        [rows[7], (100, [float(x) for x in mat[50]])],
        "id long, vec array<double>",
    )
    assert ivf_append_saved(spark, path, batch) == 2
    idx = ivf_load(spark, path)
    assert idx.assigned.filter("id = 7").count() == 1
    assert idx.assigned.filter("id = 100").count() == 1
    raw = spark.read.parquet(f"{path}/assigned")
    assert raw.filter("id = 7").count() == 1  # resurfaced, not duplicated
    # replay: everything already live
    assert ivf_append_saved(spark, path, batch) == 0


def test_ivf_sync_watermark_equals_store_diff(spark, tmp_path):
    """r11 (VERDICT r10 task 2): the id-watermark sync — the streaming
    vector hook's per-micro-batch form — lands BYTE-IDENTICAL index
    rows to the full store-diff sync across a 3-batch growth sequence,
    while reading only the store slice above the max indexed id."""
    import numpy as np

    from vector_db_at_home_spark.operators.ann import (
        ivf_build,
        ivf_save,
        ivf_sync_with_store,
        ivf_sync_with_store_watermark,
    )

    rng = np.random.default_rng(41)
    mat = rng.standard_normal((190, 6))
    rows = [(i, [float(x) for x in mat[i]]) for i in range(190)]
    base = spark.createDataFrame(rows[:100], "id long, vec array<double>")
    pa, pb = str(tmp_path / "diff"), str(tmp_path / "wm")
    ivf = ivf_build(base, n_cells=4, seed=7)
    ivf_save(ivf, pa)
    ivf_save(ivf, pb)

    growing = rows[:100]
    for lo, hi in ((100, 130), (130, 160), (160, 190)):
        growing = growing + rows[lo:hi]
        store_df = spark.createDataFrame(growing,
                                         "id long, vec array<double>")
        sa, sb = {}, {}
        na = ivf_sync_with_store(spark, _VecStore(store_df), pa, stats=sa)
        nb = ivf_sync_with_store_watermark(spark, _VecStore(store_df), pb,
                                           stats=sb)
        assert na == nb == hi - lo
        assert abs(sa["drift_ratio"] - sb["drift_ratio"]) < 1e-12

    cols = ["id", "vec", "cell"]
    rows_a = sorted(map(tuple, spark.read.parquet(f"{pa}/assigned")
                        .select(*cols).collect()))
    rows_b = sorted(map(tuple, spark.read.parquet(f"{pb}/assigned")
                        .select(*cols).collect()))
    assert rows_a == rows_b

    # replayed sync (same store) is a no-op under both forms
    store_df = spark.createDataFrame(growing, "id long, vec array<double>")
    assert ivf_sync_with_store_watermark(spark, _VecStore(store_df),
                                         pb) == 0
