"""Beam-search convergence early-stop smoke (VERDICT r7 task 5): the
same 50k clustered geometry as nndescent_smoke, measuring wall +
executed hop count + result agreement for graph_ann_search with
``early_stop=True`` vs ``False`` on a 64-query batch.

Hop counts come from graph_ann_search's ``stats`` hook
(hops_scheduled / hops_executed).  Prints ONE JSON line; committed
numbers live in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from nndescent_smoke import build_vectors  # noqa: E402

N_QUERIES, K = 64, 10


def main() -> None:
    from vector_db_at_home_spark.operators.knngraph import (
        graph_ann_search,
        knn_graph_nndescent,
    )
    from vector_db_at_home_spark.session import get_spark

    spark = get_spark("beam-earlystop-smoke")
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

    out = {"n": n, "n_queries": N_QUERIES,
           "nndescent_build_sec": round(build_wall, 1)}
    results = {}
    for stop in (False, True):
        st: dict = {}
        t0 = time.time()
        res = graph_ann_search(df, g, qs, k=K + 1,
                               early_stop=stop, stats=st).collect()
        wall = time.time() - t0
        key = "early_stop" if stop else "fixed_hops"
        results[key] = {(r.query_id, r.id) for r in res}
        out[f"{key}_wall_sec"] = round(wall, 1)
        out[f"{key}_hops"] = f"{st['hops_executed']}/{st['hops_scheduled']}"
    inter = len(results["early_stop"] & results["fixed_hops"])
    union = len(results["early_stop"] | results["fixed_hops"])
    out["result_agreement"] = round(inter / union, 4)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
