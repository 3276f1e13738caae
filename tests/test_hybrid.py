"""Hybrid RRF retrieval + filtered kNN tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_at_home_spark.operators.hybrid import RRF_K, hybrid_search_rrf


def _tables(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return docs, emb


def test_hybrid_rrf_score_structure(spark):
    """Fused scores equal 1/(60+lex)+1/(60+vec) on the returned ranks,
    are sorted descending, and the top result beats single-leg scores
    only when both legs retrieved it."""
    docs, emb = _tables(spark)
    qvec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    rows = hybrid_search_rrf(
        docs, emb, ["vector", "merge", "batch"], qvec, k=10, depth=50
    ).collect()
    assert len(rows) == 10
    prev = None
    for r in rows:
        score = 0.0
        if r.lex_rank is not None:
            score += 1.0 / (RRF_K + r.lex_rank)
        if r.vec_rank is not None:
            score += 1.0 / (RRF_K + r.vec_rank)
        assert r.rrf_e6 == int(score * 1e6 + 0.5)
        assert r.lex_rank is not None or r.vec_rank is not None
        if prev is not None:
            assert r.rrf_e6 <= prev
        prev = r.rrf_e6


def test_hybrid_vector_leg_contains_query_itself(spark):
    """vec_id 0 is its own nearest vector — it must appear with
    vec_rank 1 somewhere in the fused top-k at this corpus size."""
    docs, emb = _tables(spark)
    qvec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    rows = hybrid_search_rrf(
        docs, emb, ["vector", "merge", "batch"], qvec, k=10, depth=50
    ).collect()
    by_id = {r.id: r for r in rows}
    assert 0 in by_id and by_id[0].vec_rank == 1


def test_filtered_knn_only_returns_matching_labels(spark):
    from vector_db_at_home_spark.registry import queries

    rows = queries()["knn_filtered_topk"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows and all(r.label in (2, 5, 7) for r in rows)
    # per query: 5 results, distances non-decreasing
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r.query_id].append(r.distance)
    for q, ds in per.items():
        assert len(ds) == 5
        assert ds == sorted(ds)
