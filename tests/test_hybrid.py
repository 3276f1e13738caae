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


def test_hybrid_indexed_matches_corpus_scan(spark, tmp_path):
    """r9: the pruned-index lexical leg reproduces the corpus-scan
    hybrid exactly — after save, after append, and through a
    crash-torn append window (duplicate postings rows collapse via the
    per-term distinct before counting)."""
    from vector_db_at_home_spark.operators.hybrid import (
        hybrid_search_rrf,
        hybrid_search_rrf_indexed,
    )
    from vector_db_at_home_spark.operators.invindex import (
        invindex_append,
        invindex_load,
        invindex_save,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the cat mat"),
            (2, "the cat the cat the cat"),
            (3, "cat the"),
            (4, "dog park visit"),
            (5, "completely unrelated text"),
            (6, "the cat returns"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5 * i]) for i in range(1, 7)],
        "vec_id long, embedding array<double>",
    )
    qvec = emb.filter("vec_id = 1").select(
        emb.embedding.alias("qvec"))
    terms = ["cat", "dog"]

    expect = hybrid_search_rrf(docs, emb, terms, qvec,
                               k=5, depth=4).collect()

    path = str(tmp_path / "hyb_idx")
    invindex_save(docs.filter("doc_id <= 4"), "text", "doc_id",
                  path, n_buckets=8)
    invindex_append(spark, path, docs.filter("doc_id > 4"),
                    "text", "doc_id")

    def indexed():
        return hybrid_search_rrf_indexed(
            invindex_load(spark, path), emb, terms, qvec,
            k=5, depth=4).collect()

    assert indexed() == expect

    # crash-torn append window: duplicate posting rows must not
    # inflate the lexical counts
    from pyspark.sql import functions as F  # noqa: F401

    full = spark.read.parquet(f"{path}/postings")
    full.filter("id = 6").repartition(1).write.partitionBy("bucket") \
        .mode("append").parquet(f"{path}/postings")
    assert indexed() == expect
