"""Semantic admit screen at 200k vectors (r9): the exact two-relation
blocked GEMM (``dedup.cosine_admit_blocked``) vs the IVF-pruned tier
(``ann.cosine_admit_ivf``) on a clustered synthetic corpus — the
number that justifies the probe tier: candidate volume drops to the
probed fraction while planted near-dup recall holds.

Setup: 200k corpus vectors in 64 Gaussian clusters (dim 64,
normalized), a 5k batch drawn from the same clusters, 256 planted
near-dups (perturbed copies of corpus vectors, cos ≈ 0.99) plus 256
exact copies.  Screens at τ = 0.95.  Reported per screen: wall,
dropped count, planted/copy recall vs the EXACT decision set, and the
IVF candidate fraction (probed cells / corpus).

Usage: ``python tools/admit_screen_smoke.py [n_corpus]``.  Prints ONE
JSON line; committed numbers live in SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.ann import (
        cosine_admit_ivf,
        ivf_build,
    )
    from vector_db_at_home_spark.operators.dedup import (
        cosine_admit_blocked,
    )
    from vector_db_at_home_spark.session import get_spark

    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_batch, n_plant, dim, k_clusters = 5_000, 256, 64, 64
    tau = 0.95

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((k_clusters, dim)) * 4.0

    def draw(n):
        cid = rng.integers(0, k_clusters, n)
        return centers[cid] + rng.standard_normal((n, dim))

    def unit(m):
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    C = unit(draw(n_corpus))
    B = unit(draw(n_batch))
    src = rng.integers(0, n_corpus, n_plant)
    pert = C[src] + 0.08 * rng.standard_normal((n_plant, dim))
    P = unit(pert)                      # cos ≈ 0.99 vs source
    X = C[rng.integers(0, n_corpus, n_plant)]  # exact copies

    spark = get_spark("admit_screen")
    spark.sparkContext.setLogLevel("ERROR")

    def to_df(mat, start):
        return spark.createDataFrame(
            [(start + i, [float(x) for x in mat[i]])
             for i in range(len(mat))],
            "vec_id long, embedding array<double>",
        ).repartition(32).localCheckpoint(eager=True)

    corpus = to_df(C, 0)
    batch = to_df(np.vstack([B, P, X]), 10_000_000)
    plant_ids = set(range(10_000_000 + n_batch,
                          10_000_000 + n_batch + 2 * n_plant))

    t0 = time.time()
    exact = {r.id for r in cosine_admit_blocked(
        batch, corpus, "embedding", "vec_id", tau,
        n_blocks=16).collect()}
    exact_wall = time.time() - t0

    t0 = time.time()
    ivf = ivf_build(corpus, id_col="vec_id", vec_col="embedding",
                    n_cells=k_clusters)
    ivf.assigned = ivf.assigned.localCheckpoint(eager=True)
    build_wall = time.time() - t0

    out = {"n_corpus": n_corpus, "n_batch_total": n_batch + 2 * n_plant,
           "tau": tau,
           "exact": {"wall_sec": round(exact_wall, 1),
                     "dropped": len(exact)},
           "ivf_build_wall_sec": round(build_wall, 1),
           "ivf": {}}
    for n_probes in (1, 4, 8):
        t0 = time.time()
        got = {r.id for r in cosine_admit_ivf(
            batch, ivf, "embedding", "vec_id", tau,
            n_probes=n_probes).collect()}
        wall = time.time() - t0
        agree = len(got & exact) / max(len(exact), 1)
        plant_exact = exact & plant_ids
        plant_got = got & plant_ids
        out["ivf"][f"probes_{n_probes}"] = {
            "wall_sec": round(wall, 1),
            "dropped": len(got),
            "decision_recall_vs_exact": round(agree, 4),
            "planted_recall": round(
                len(plant_got) / max(len(plant_exact), 1), 4),
            "candidate_fraction": round(n_probes / k_clusters, 4),
            "false_admits": len(got - exact),
        }
        print(f"# probes={n_probes}: {out['ivf'][f'probes_{n_probes}']}",
              file=sys.stderr)

    print(json.dumps({"metric": "admit_screen_200k", **out}))
    spark.stop()


if __name__ == "__main__":
    main()
