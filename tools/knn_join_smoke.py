"""Scale smoke for the two-table blocked kNN join (round 6).

20,000 query vectors × 100,000 index vectors (dim 64, deterministic
hash-derived clusters like tools/scale_smoke.py) — 2×10⁹ pair distances,
a regime no broadcast-side kernel can take (the pandas kNN caps its
query batch at 65k for good reason; here the QUERY side is a table).
Correctness leg: 30 planted queries that are exact copies of index
vectors must return themselves at rank 1.  Prints one JSON line;
recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_INDEX = 100_000
N_QUERY = 20_000
DIM = 64
K = 5


def synth(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(256, DIM))
    assign = rng.integers(0, 256, size=n)
    return (centers[assign] + 0.05 * rng.normal(size=(n, DIM))).astype(
        "float32"
    )


def main() -> None:
    from vector_db_at_home_spark.operators.knn import knn_join_blocked
    from vector_db_at_home_spark.session import get_spark

    spark = get_spark("knn_join_smoke",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="kj_")
    idx = synth(N_INDEX, 1)
    qry = synth(N_QUERY, 2)
    # plant 30 queries as exact copies of index rows
    qry[:30] = idx[1000:1030]
    spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(idx)],
        "id long, vec array<float>",
    ).repartition(32).write.parquet(f"{base}/idx")
    spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(qry)],
        "query_id long, qvec array<float>",
    ).repartition(32).write.parquet(f"{base}/qry")
    index = spark.read.parquet(f"{base}/idx")
    queries = spark.read.parquet(f"{base}/qry")

    from pyspark.sql import Window

    t0 = time.time()
    res = knn_join_blocked(queries, index, k=K,
                           n_query_blocks=8, n_index_blocks=8)
    top1 = (
        res.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id")
                .orderBy(F.col("distance").asc(), F.col("id").asc())
            ),
        )
        .filter("rn = 1")
    )
    planted = {
        r.query_id: (r.id, r.distance)
        for r in top1.filter(F.col("query_id") < 30).collect()
    }
    n_rows = res.count()
    wall = time.time() - t0
    planted_ok = all(
        planted[q][0] == 1000 + q and planted[q][1] == 0.0
        for q in range(30)
    )
    print(json.dumps({
        "metric": "knn_join_blocked_smoke",
        "n_query": N_QUERY,
        "n_index": N_INDEX,
        "dim": DIM,
        "k": K,
        "pair_distances": N_QUERY * N_INDEX,
        "wall_sec": round(wall, 1),
        "result_rows": n_rows,
        "planted_rank1_ok": planted_ok,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
