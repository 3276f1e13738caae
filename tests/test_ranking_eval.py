"""IR eval metrics: hand-computed values, zero-hit and missing-query
handling, weight-table exactness."""

from __future__ import annotations

import math


def test_ranking_metrics_hand_values(spark):
    from vector_db_at_home_spark.operators.ranking_eval import (
        _dcg_weights,
        ranking_metrics,
    )

    # q0: rel docs {1, 2, 3}; run ranks doc2 @1, doc9 @2, doc1 @3
    # q1: rel docs {5};      run has no relevant doc
    # q2: rel docs {7, 8};   absent from the run entirely
    runs = spark.createDataFrame(
        [(0, 2, 1), (0, 9, 2), (0, 1, 3),
         (1, 4, 1), (1, 6, 2)],
        "query_id long, id long, rank long")
    qrels = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 5), (2, 7), (2, 8)],
        "query_id long, id long")
    rows = {r.query_id: r
            for r in ranking_metrics(runs, qrels, k=10).collect()}
    assert set(rows) == {0, 1, 2}

    w = _dcg_weights(10)
    r0 = rows[0]
    assert (r0.n_rel, r0.n_hits_at_k, r0.first_rel_rank) == (3, 2, 1)
    assert r0.mrr_e6 == 1_000_000
    assert r0.recall_at_k_e6 == (1_000_000 * 2) // 3
    assert r0.dcg_w == w[0] + w[2]            # hits at ranks 1 and 3
    assert r0.idcg_w == w[0] + w[1] + w[2]
    assert r0.ndcg_e6 == (1_000_000 * (w[0] + w[2])) // (w[0] + w[1] + w[2])
    # sanity vs float NDCG
    f = (1 / math.log2(2) + 1 / math.log2(4)) / (
        1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4))
    assert abs(r0.ndcg_e6 / 1e6 - f) < 1e-5

    for q in (1, 2):   # no relevant retrieved / query absent from run
        r = rows[q]
        assert (r.n_hits_at_k, r.first_rel_rank, r.mrr_e6,
                r.recall_at_k_e6, r.dcg_w, r.ndcg_e6) == (0, 0, 0, 0, 0, 0)
    assert rows[1].idcg_w == w[0]
    assert rows[2].idcg_w == w[0] + w[1]


def test_ranking_metrics_k_cap(spark):
    """Hits beyond rank k are ignored in every metric."""
    from vector_db_at_home_spark.operators.ranking_eval import (
        ranking_metrics,
    )

    runs = spark.createDataFrame(
        [(0, 1, 4)], "query_id long, id long, rank long")
    qrels = spark.createDataFrame([(0, 1)], "query_id long, id long")
    r3 = ranking_metrics(runs, qrels, k=3).first()
    assert (r3.n_hits_at_k, r3.mrr_e6, r3.ndcg_e6) == (0, 0, 0)
    r5 = ranking_metrics(runs, qrels, k=5).first()
    assert r5.n_hits_at_k == 1 and r5.mrr_e6 == 250_000


def test_second_moment_matrix_exact(spark):
    """Gram statistics match a numpy integer reference exactly,
    independent of partitioning."""
    import numpy as np

    from vector_db_at_home_spark.operators.embeddings import (
        second_moment_matrix,
    )

    rows = [(i, [0.1 * i, -0.25, 0.7 + 0.01 * i]) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    got = {(r.i, r.j): r.sxy
           for r in second_moment_matrix(df, "vec").collect()}
    m = np.floor(
        np.array([v for _, v in rows], dtype=np.float32)
        .astype(np.float64) * 1_000_000
    ).astype(np.int64)
    want = m.T @ m
    for i in range(3):
        for j in range(i, 3):
            assert got[(i, j)] == want[i, j]
    # repartitioned input: identical integers (no reduction-order drift)
    got2 = {(r.i, r.j): r.sxy
            for r in second_moment_matrix(df.repartition(7), "vec")
            .collect()}
    assert got2 == got


def test_pca_fit_project_shapes_and_variance(spark):
    import numpy as np

    from vector_db_at_home_spark.operators.embeddings import (
        pca_fit_project,
    )

    # anisotropic data: one dominant direction -> PC1 captures it
    rows = [(i, [float(i) * 2.0, float(i % 3) * 0.01, 0.5]) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    proj, comps, ev = pca_fit_project(df, "vec", "id", k=2)
    p = proj.collect()
    assert len(p) == 60 and all(len(r.pcvec) == 2 for r in p)
    c = np.array(comps)
    assert c.shape == (2, 3)
    assert np.abs(c @ c.T - np.eye(2)).max() < 1e-9
    assert ev[0] > 0.99          # the dominant axis
