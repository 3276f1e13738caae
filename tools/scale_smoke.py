"""Scale-validation smoke: exercise the flagship operators at ~100× the
bench data volume, derived deterministically from the driver's parquet.

Rationale: the provided embeddings top out at 2,000 rows; the 100 TB design
claims need evidence that the plans hold when the index is orders of
magnitude larger than the query side and no longer trivially fits one task.
Augmentation: replicate each base vector R times with a deterministic
per-replica rotation offset (id-derived, no RNG), so distances stay
non-degenerate and results remain reproducible.

Usage: python tools/scale_smoke.py [replicas] — prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def augmented_embeddings(spark, base_dir: str, replicas: int):
    """(vec_id, embedding) with N_base × replicas rows; replica r of vector v
    shifts each component by a small deterministic id/position-derived delta
    so no two replicas are identical."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{base_dir}/embeddings.parquet")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    return (
        base.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * 100_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + ((F.col("rep") * 31 + i) % 97).cast("float") / 9700.0,
            ).alias("embedding"),
        )
        .repartition(64, "vec_id")
    )


def synthetic_vectors(spark, n_rows: int, dim: int, n_dups: int):
    """(vec_id, embedding): hash-derived pseudo-random vectors (no RNG
    state — fract(sin(id·c)) per component, the classic shader hash), plus
    ``n_dups`` planted near-duplicates: ids >= n_rows are small-noise copies
    of id − n_rows (cosine ≈ 0.99+).  Fully distributed generation."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        cols = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if cols is None:
                cols = np.arange(dim, dtype=np.float64) + 1.0
            ids = pdf["id"].to_numpy(np.int64)
            src = np.where(ids < n_rows, ids, ids - n_rows)
            # centered (mean-0) components via true fract (x - floor(x),
            # NOT modf — modf keeps the sign, which would bias every
            # component and correlate all vectors): random pairs then sit
            # near 90°, so LSH collisions track true similarity
            arg = np.sin(np.outer(src + 1.0, cols * 12.9898)) * 43758.5453
            mat = arg - np.floor(arg) - 0.5
            dup = ids >= n_rows
            if dup.any():
                noise = np.modf(
                    np.sin(np.outer(ids[dup] + 3.0, cols * 7.131)) * 24634.6345
                )[0] * 0.01
                mat[dup] += noise
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(mat.astype(np.float32))}
            )

    base = spark.range(0, n_rows + n_dups, 1, 64)
    return base.mapInPandas(gen, "vec_id long, embedding array<float>")


def pq_section(spark, emb, qs, exact_rows, timings: dict,
               results: dict) -> None:
    """PQ at 200k: 8-byte codes (32× compression of 64-dim float32), ADC
    scan, and exact re-rank recall vs the exact kNN baseline."""
    import time as _t

    from vector_db_at_home_spark.operators.pq import pq_build, pq_search

    t0 = _t.time()
    pq = pq_build(emb, id_col="vec_id", vec_col="embedding", m=8,
                  fit_sample_rows=20_000)
    pq.codes.cache().count()
    timings["pq_build_encode_200k"] = round(_t.time() - t0, 3)

    exact = {(r.query_id, r.id) for r in exact_rows}
    t0 = _t.time()
    adc = pq_search(pq, qs, k=10).collect()
    timings["pq_adc_scan_200k"] = round(_t.time() - t0, 3)
    got = {(r.query_id, r.id) for r in adc}
    results["pq_adc_recall_at_10"] = round(len(got & exact) / len(exact), 4)

    t0 = _t.time()
    ref = pq_search(pq, qs, k=10, refine_with=emb, refine_factor=8,
                    id_col="vec_id", vec_col="embedding").collect()
    timings["pq_refined_200k"] = round(_t.time() - t0, 3)
    got_r = {(r.query_id, r.id) for r in ref}
    results["pq_refined_recall_at_10"] = round(
        len(got_r & exact) / len(exact), 4
    )
    print(f"# pq done {round(_t.time()-t0,1)}s", file=sys.stderr)
    pq.codes.unpersist()


def synthetic_docs(spark, n_rows: int, n_dups: int):
    """(doc_id, text): ~30-token pseudo-random word documents; ids >=
    n_rows are near-dups of id − n_rows with ONE word substituted
    (n-gram Jaccard ≈ 0.9) — the banding regime MinHash must recall."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        vocab = ["w%04d" % i for i in range(5000)]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(np.int64)
            src = np.where(ids < n_rows, ids, ids - n_rows)
            texts = []
            for sid, rid in zip(src, ids):
                arg = np.sin((sid + 1.0) * (np.arange(30) + 1.0) * 7.13) \
                    * 43758.5453
                widx = ((arg - np.floor(arg)) * len(vocab)).astype(np.int64)
                words = [vocab[i] for i in widx]
                if rid >= n_rows:
                    words[int(sid) % 30] = "sub%d" % rid
                texts.append(" ".join(words))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    base = spark.range(0, n_rows + n_dups, 1, 64)
    return base.mapInPandas(gen, "doc_id long, text string")


def minhash_section(spark, timings: dict, results: dict) -> None:
    """MinHash-LSH at 200k docs (40× the bench corpus): wall time with
    both scale levers on, and recall of 1000 planted one-word-substitution
    near-dups (expected ≈1.0: j≈0.9 → banding catch prob > 0.9999)."""
    import time as _t

    from vector_db_at_home_spark.operators.dedup import minhash_lsh_pairs

    import tempfile

    n_rows, n_dups = 200_000, 1_000
    # file-backed, not .cache(): exchange-reuse canonicalization does not
    # dedupe subplans over InMemoryRelation, so a cached source would make
    # the operator recompute its shingle pipeline per consumer — files are
    # also the shape production corpora actually have
    path = tempfile.mkdtemp(prefix="smoke_docs_") + "/docs"
    synthetic_docs(spark, n_rows, n_dups).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    t0 = _t.time()
    res = minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=0.5,
        max_doc_freq=100, max_band_bucket=200,
    )
    pairs = res.collect()
    timings["minhash_lsh_200k_docs"] = round(_t.time() - t0, 3)
    got = {(r.id_a, r.id_b) for r in pairs}
    planted = {(i, n_rows + i) for i in range(n_dups)}
    results["minhash_200k_rows"] = len(pairs)
    results["minhash_200k_recall"] = round(
        len(got & planted) / len(planted), 4
    )
    print(f"# minhash_200k done {timings['minhash_lsh_200k_docs']}s",
          file=sys.stderr)


def cosine_sections(spark, timings: dict, results: dict) -> None:
    """200k-vector evidence for the two cosine scale paths: LSH-bucketed
    near-dup (sub-quadratic, recall vs planted pairs) and the exact
    distributed block-GEMM top-k (no driver collect)."""
    import time as _t

    from vector_db_at_home_spark.operators.dedup import (
        cosine_neardup_bucketed,
        cosine_topk_pairs_blocked,
    )

    n_rows, n_dups = 200_000, 1_000
    vecs = synthetic_vectors(spark, n_rows, 64, n_dups).cache()
    vecs.count()

    t0 = _t.time()
    nd = cosine_neardup_bucketed(
        vecs, "embedding", "vec_id", min_cosine=0.95,
        n_planes=16, n_tables=4, max_bucket=1000,
    ).collect()
    print(f"# neardup_lsh_200k done {round(_t.time()-t0,1)}s", file=sys.stderr)
    timings["cosine_neardup_lsh_200k"] = round(_t.time() - t0, 3)
    planted = {(i, n_rows + i) for i in range(n_dups)}
    got = {(r.id_a, r.id_b) for r in nd}
    results["neardup_lsh_200k_rows"] = len(nd)
    results["neardup_lsh_200k_recall"] = round(
        len(got & planted) / len(planted), 4
    )

    t0 = _t.time()
    blk = cosine_topk_pairs_blocked(
        vecs, "embedding", "vec_id", k=20, n_blocks=32
    ).collect()
    print(f"# blocked_200k done {round(_t.time()-t0,1)}s", file=sys.stderr)
    timings["cosine_blocked_200k"] = round(_t.time() - t0, 3)
    # planted dups dominate the global top-k — every top pair must be real
    results["cosine_blocked_200k_top_planted"] = sum(
        1 for r in blk if (r.id_a, r.id_b) in planted
    )
    vecs.unpersist()


def ivf_section(spark, emb, qs, exact_rows, timings: dict,
                results: dict) -> None:
    """IVF at 200k end-to-end: sampled KMeans fit, assignments persisted
    partitioned by cell, probes against the RELOADED store (partition
    pruning on cell), recall >= 0.9 vs the exact kNN at n_probes=4.

    ``qs`` must be the SAME query DataFrame the exact baseline used —
    recall against different query vectors is meaningless."""
    import shutil
    import tempfile
    import time as _t

    from vector_db_at_home_spark.operators.ann import (
        ivf_build,
        ivf_load,
        ivf_save,
        ivf_search,
    )

    t0 = _t.time()
    ivf = ivf_build(emb, id_col="vec_id", vec_col="embedding", n_cells=64,
                    fit_sample_rows=20_000)
    print(f"# ivf_build done {round(_t.time()-t0,1)}s", file=sys.stderr)
    timings["ivf_build_200k_fit20k"] = round(_t.time() - t0, 3)

    tmp = tempfile.mkdtemp(prefix="ivf_store_")
    try:
        t0 = _t.time()
        ivf_save(ivf, tmp)
        timings["ivf_store_write_200k"] = round(_t.time() - t0, 3)
        stored = ivf_load(spark, tmp)
        t0 = _t.time()
        approx = ivf_search(stored, qs, k=10, n_probes=4).collect()
        timings["ivf_search_200k_probe4"] = round(_t.time() - t0, 3)
        exact = {(r.query_id, r.id) for r in exact_rows}
        got = {(r.query_id, r.id) for r in approx}
        results["ivf_recall_at_10_probe4"] = round(
            len(got & exact) / max(len(exact), 1), 4
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main(replicas: int = 100) -> None:
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.knn import knn_search
    from vector_db_at_home_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    emb = augmented_embeddings(spark, sf_dir, replicas).cache()
    n = emb.count()  # materialize the cache so timings measure the operators

    qs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .limit(32)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )

    timings: dict[str, float] = {}

    t0 = time.time()
    pandas_rows = knn_search(
        emb, qs, k=10, id_col="vec_id", vec_col="embedding", impl="pandas"
    ).collect()
    timings["knn_pandas_200k"] = round(time.time() - t0, 3)

    t0 = time.time()
    expr_rows = knn_search(
        emb, qs, k=10, id_col="vec_id", vec_col="embedding", impl="expr"
    ).collect()
    timings["knn_expr_200k"] = round(time.time() - t0, 3)

    # set overlap per (query, id) — ordered equality would be ULP-sensitive
    # at top-k boundaries since the impls sum distances in different orders
    pset = {(r.query_id, r.id) for r in pandas_rows}
    eset = {(r.query_id, r.id) for r in expr_rows}
    overlap = len(pset & eset) / max(len(eset), 1)

    results: dict = {}
    ivf_section(spark, emb, qs, pandas_rows, timings, results)
    pq_section(spark, emb, qs, pandas_rows, timings, results)
    minhash_section(spark, timings, results)
    cosine_sections(spark, timings, results)

    print(
        json.dumps(
            {
                "metric": "scale_smoke",
                "index_rows": n,
                "queries": 32,
                "k": 10,
                "timings_sec": timings,
                "impls_overlap": round(overlap, 4),
                "speedup_pandas_vs_expr": round(
                    timings["knn_expr_200k"]
                    / max(timings["knn_pandas_200k"], 1e-3),
                    2,
                ),
                **results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
