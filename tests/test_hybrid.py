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


def test_hybrid_two_tower_matches_corpus_scan(spark, tmp_path):
    """r11: hybrid RRF with BOTH towers on persisted indexes — with
    exhaustive probes the IVF candidate set provably covers the cosine
    top-depth, so the exact re-score + shared rrf_fuse tail make the
    output BIT-IDENTICAL to the corpus-scan hybrid; bounded probes
    return a well-formed (possibly lower-recall) ranking whose lexical
    leg is unchanged.  The serving plan scans neither the corpus text
    nor the full embedding table's vectors on the candidate side."""
    import numpy as np

    from vector_db_at_home_spark.operators.ann import (
        ivf_append_saved,
        ivf_build,
        ivf_load,
        ivf_save,
    )
    from vector_db_at_home_spark.operators.hybrid import (
        hybrid_search_rrf,
        hybrid_search_rrf_two_tower,
    )
    from vector_db_at_home_spark.operators.invindex import (
        invindex_append,
        invindex_load,
        invindex_save,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(23)
    words = ["cat", "dog", "fish", "bird", "tree", "rock", "wind"]
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choice(words, 8))) for i in range(120)],
        "doc_id long, text string",
    )
    mat = rng.standard_normal((120, 8))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(120)],
        "vec_id long, embedding array<double>",
    )
    qvec = emb.filter("vec_id = 1").select(emb.embedding.alias("qvec"))
    terms = ["cat", "dog"]

    expect = hybrid_search_rrf(docs, emb, terms, qvec,
                               k=10, depth=20).collect()

    lex = str(tmp_path / "tt_lex")
    invindex_save(docs.filter("doc_id % 5 != 0"), "text", "doc_id",
                  lex, n_buckets=8)
    invindex_append(spark, lex, docs.filter("doc_id % 5 = 0"),
                    "text", "doc_id")

    def nvec(col):
        v = F.transform(col, lambda x: x.cast("double"))
        nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
        return F.when(nrm == 0.0, v).otherwise(
            F.transform(v, lambda x: x / nrm))

    vec = str(tmp_path / "tt_vec")
    nbase = emb.select(F.col("vec_id").alias("id"),
                       nvec(F.col("embedding")).alias("vec"))
    ivf_save(ivf_build(nbase.filter("id % 5 != 0"), n_cells=6, seed=3),
             vec)
    ivf_append_saved(spark, vec, nbase.filter("id % 5 = 0"))

    idx, ivf = invindex_load(spark, lex), ivf_load(spark, vec)
    exhaustive = hybrid_search_rrf_two_tower(
        idx, ivf, emb, terms, qvec, k=10, depth=20, n_probes=6)
    assert exhaustive.collect() == expect

    # the candidate semi-join keeps the vector leg's scan bounded: the
    # plan carries the broadcast join, not a bare full-table cosine
    plan = exhaustive._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan  # corpus text never enters the plan

    # bounded probes: k rows, valid rank structure, lexical leg intact
    bounded = hybrid_search_rrf_two_tower(
        idx, ivf, emb, terms, qvec, k=10, depth=20, n_probes=1).collect()
    assert len(bounded) == 10
    exp_lex = {r["id"]: r["lex_rank"] for r in expect
               if r["lex_rank"] is not None}
    for r in bounded:
        if r["lex_rank"] is not None and r["id"] in exp_lex:
            assert r["lex_rank"] == exp_lex[r["id"]]
