"""NN-descent scale smoke: 50,000 vectors (dim 32), recall vs exact on
a 64-query sample, with and without the ρ-sampling lever.

Data: 500 deterministic Gaussian-ish cluster centers (hash-formula, no
RNG state), 100 members each with small offsets — clustered geometry so
a k-NN graph is meaningful (uniform random vectors have no usable
neighbor structure at this dimension).

Prints ONE JSON line: wall + recall@10 for rho=None and rho=0.5, plus
the exact-leg timing.  Committed numbers live in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_CLUSTERS, PER, DIM, K = 500, 100, 32, 10
N_QUERIES = 64


def build_vectors():
    ids = np.arange(N_CLUSTERS, dtype=np.float64)
    cols = np.arange(DIM, dtype=np.float64) + 1
    arg = np.sin(np.outer(ids + 7, cols * 12.9898)) * 43758.5453
    centers = (arg - np.floor(arg) - 0.5) * 20.0
    m_ids = np.arange(N_CLUSTERS * PER, dtype=np.float64)
    arg2 = np.sin(np.outer(m_ids + 3, cols * 78.233)) * 24634.6345
    offs = (arg2 - np.floor(arg2) - 0.5) * 0.5
    return centers.repeat(PER, axis=0) + offs


def main() -> None:
    from vector_db_at_home_spark.operators.knn import knn_search
    from vector_db_at_home_spark.operators.knngraph import (
        knn_graph_nndescent,
    )
    from vector_db_at_home_spark.session import get_spark

    spark = get_spark("nndescent_smoke")
    spark.sparkContext.setLogLevel("ERROR")
    V = build_vectors()
    n = len(V)
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(n)],
        "id long, vec array<double>",
    ).repartition(32).localCheckpoint(eager=True)

    qids = list(range(0, n, n // N_QUERIES))[:N_QUERIES]
    qs = df.filter(F.col("id").isin(qids)).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec"))
    t0 = time.time()
    exact = knn_search(df, qs, k=K + 1, id_col="id", vec_col="vec",
                       impl="pandas")
    truth = {}
    for r in exact.collect():
        if r.id != r.query_id:
            truth.setdefault(r.query_id, []).append(r.id)
    t_exact = time.time() - t0

    out = {"n": n, "dim": DIM, "k": K, "exact_leg_sec": round(t_exact, 1)}
    for label, rho in (("rho_none", None), ("rho_05", 0.5)):
        t0 = time.time()
        g = knn_graph_nndescent(df, "id", "vec", k=K, rho=rho)
        edges = set()
        for r in g.filter(F.col("src").isin(qids)).collect():
            edges.add((r.src, r.dst))
        wall = time.time() - t0
        hits = tot = 0
        for q, ids in truth.items():
            top = ids[:K]
            tot += len(top)
            hits += sum(1 for i in top if (q, i) in edges)
        out[label] = {"wall_sec": round(wall, 1),
                      "recall_at_10": round(hits / tot, 4)}
        print(f"# {label}: {out[label]}", file=sys.stderr)

    # graph-ANN query path at the same scale: build once (rho=None graph
    # already built above — rebuild for a clean wall), beam-search the
    # 64 queries THROUGH the graph (navigable fingers on), recall vs the
    # exact top-10 (self excluded)
    from vector_db_at_home_spark.operators.knngraph import graph_ann_search

    g = knn_graph_nndescent(df, "id", "vec", k=K)
    g = g.localCheckpoint(eager=True)
    t0 = time.time()
    beam = graph_ann_search(df, g, qs, k=K + 1).filter(
        F.col("id") != F.col("query_id"))
    got = {}
    for r in beam.collect():
        got.setdefault(r.query_id, []).append((r.distance, r.id))
    t_beam = time.time() - t0
    hits = tot = 0
    for q, ids in truth.items():
        top = set(ids[:K])
        tot += len(top)
        found = {i for _, i in sorted(got.get(q, []))[:K]}
        hits += len(top & found)
    out["beam_search"] = {"wall_sec_64q": round(t_beam, 1),
                          "recall_at_10": round(hits / tot, 4)}
    print(f"# beam_search: {out['beam_search']}", file=sys.stderr)

    print(json.dumps({"metric": "nndescent_50k", **out}))
    spark.stop()


if __name__ == "__main__":
    main()
