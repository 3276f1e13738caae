"""Serving-path smoke for the loaded graph index (VERDICT r8 task 6):
the same 50k clustered geometry as nndescent_smoke, 64 queries — the
hop-loop batch path vs ``graph_ann_search_serving`` (broadcast index +
one mapInPandas walk, zero exchanges).  The serving target is
interactive latency (≤2 s for the 64-query batch vs ~44 s for the
hop-loop, which is all job-scheduling overhead at this size), with
RESULTS REQUIRED IDENTICAL to the fixed-schedule hop-loop.

Prints ONE JSON line; committed numbers live in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from nndescent_smoke import build_vectors  # noqa: E402

N_QUERIES, K = 64, 10


def main() -> None:
    from vector_db_at_home_spark.operators.knngraph import (
        graph_ann_search,
        graph_ann_search_serving,
        graph_serving_prepare,
        knn_graph_nndescent,
    )
    from vector_db_at_home_spark.session import get_spark

    spark = get_spark("graph-serving-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    mat = build_vectors()
    n = mat.shape[0]
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in mat[i]]) for i in range(n)],
        "id long, vec array<double>",
    ).repartition(32).localCheckpoint(eager=True)
    qids = list(range(0, n, n // N_QUERIES))[:N_QUERIES]
    qs = df.filter(F.col("id").isin(qids)).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    ).localCheckpoint(eager=True)

    t0 = time.time()
    g = knn_graph_nndescent(df, "id", "vec", k=20).localCheckpoint(True)
    g.count()
    build_wall = time.time() - t0

    t0 = time.time()
    batch = {(r.query_id, r.id, r.distance)
             for r in graph_ann_search(df, g, qs, k=K,
                                       early_stop=False).collect()}
    batch_wall = time.time() - t0

    # serving: prepare ONCE (the session's load cost), then the query
    # path — one mapInPandas job per batch of queries
    t0 = time.time()
    idx = graph_serving_prepare(df, g)
    prepare_wall = time.time() - t0
    t0 = time.time()
    serving = {(r.query_id, r.id, r.distance)
               for r in graph_ann_search_serving(idx, qs, k=K).collect()}
    first_wall = time.time() - t0
    warm = None
    for _ in range(3):
        t0 = time.time()
        rows = graph_ann_search_serving(idx, qs, k=K).collect()
        dt = time.time() - t0
        warm = dt if warm is None or dt < warm else warm
        assert len(rows) == len(serving)

    agree = len(batch & serving) / max(len(batch), 1)
    print(json.dumps({
        "metric": "graph_serving_smoke",
        "n": n, "n_queries": N_QUERIES, "k": K,
        "nndescent_build_sec": round(build_wall, 1),
        "hop_loop_wall_sec": round(batch_wall, 1),
        "serving_prepare_sec": round(prepare_wall, 2),
        "serving_first_query_sec": round(first_wall, 2),
        "serving_warm_wall_sec": round(warm, 2),
        "result_agreement": agree,
        "speedup_warm": round(batch_wall / max(warm, 1e-9), 1),
    }))
    assert agree == 1.0, "serving diverged from the hop-loop path"
    spark.stop()


if __name__ == "__main__":
    main()
