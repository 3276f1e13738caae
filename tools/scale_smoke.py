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
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
