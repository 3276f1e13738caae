"""Power-law connected-components smoke (VERDICT r4 stretch #7).

The 1M-edge CC evidence in SCALE.md uses a chain+blobs graph — uniform
degrees.  Real near-dup graphs are power-law: a boilerplate/template doc
collides with everything and becomes a hub of degree 10^5.  This smoke
plants a Zipf degree sequence — hub k (k = 1..1000) gets floor(C / k)
spoke vertices, C = 150,000, so hub 1 alone has degree ~150k — and chains
the hubs so everything is ONE giant component of diameter ~1000.  That
exercises exactly the two stress points pointer jumping must survive:

- **key skew**: every propagation round groupBys labels by vertex; hub 1's
  key carries 150k edge rows into one reducer (AQE coalescing/split);
- **diameter**: 1000 hops collapse in O(log2 1000) ≈ 10 rounds, not 1000.

Records rounds, per-round shuffle-write bytes (must stay ~flat — skew may
slow a round but must not GROW rounds or bytes), wall, and exact
correctness (one component, exact vertex count).  Prints ONE JSON line;
committed numbers live in SCALE.md.

Usage: ``python tools/cc_powerlaw_smoke.py [C]`` (default 150000; pass
e.g. 5000 for a fast self-check).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

K_HUBS = 1000


def main() -> None:
    from scale_smoke_1m import shuffle_totals

    from vector_db_at_home_spark.operators.graph import connected_components
    from vector_db_at_home_spark.session import get_spark

    c = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    spark = get_spark("cc_powerlaw",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    hubs = spark.range(1, K_HUBS + 1, 1, 32).select(
        F.col("id").alias("k")
    )
    spoke_edges = hubs.select(
        "k",
        F.explode(
            F.sequence(F.lit(0), (F.lit(c) / F.col("k")).cast("long") - 1)
        ).alias("j"),
    ).select(
        F.col("k").alias("id_a"),
        (F.lit(10_000_000) + F.col("k") * 200_000 + F.col("j"))
        .alias("id_b"),
    )
    chain_edges = spark.range(1, K_HUBS, 1, 8).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    edges = spoke_edges.unionByName(chain_edges)

    n_spokes = sum(c // k for k in range(1, K_HUBS + 1))
    n_vertices = n_spokes + K_HUBS
    n_edges = n_spokes + K_HUBS - 1

    rounds: list[dict] = []
    last = shuffle_totals(spark)

    def on_round(i: int, changed: int) -> None:
        nonlocal last
        cur = shuffle_totals(spark)
        rounds.append({
            "round": i,
            "changed": changed,
            "shuffle_write_mb": round(
                (cur["write"] - last["write"]) / 2**20, 1
            ),
        })
        last = cur

    t0 = time.time()
    cc = connected_components(edges, max_iter=64, on_round=on_round)
    comp_sizes = cc.groupBy("component").count().collect()
    wall = round(time.time() - t0, 1)

    ok = (
        len(comp_sizes) == 1
        and comp_sizes[0]["count"] == n_vertices
        and comp_sizes[0]["component"] == 1
    )
    out = {
        "metric": "cc_powerlaw",
        "hub_degree_max": c,
        "n_hubs": K_HUBS,
        "n_edges": n_edges,
        "n_vertices": n_vertices,
        "wall_sec": wall,
        "rounds": len(rounds),
        "diameter": K_HUBS - 1,
        "round_shuffle_mb": [r["shuffle_write_mb"] for r in rounds],
        "round_changed": [r["changed"] for r in rounds],
        "correct": ok,
    }
    print(f"# cc_powerlaw: {wall}s rounds={len(rounds)} "
          f"(diameter {K_HUBS - 1} -> log2 ≈ {K_HUBS.bit_length()}), "
          f"correct={ok}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
