"""Skew-join smoke: measure AQE's skew-join split on a pathologically
skewed fact⋈dim SortMergeJoin, from the Spark UI REST API.

The 100 TB skew story has two levers in this repo: explicit salting
(operators/skew.py, result-invariance oracle-checked) and AQE's runtime
skew-join split.  This smoke evidences the second: a fact table where 80%
of rows share ONE key is joined to a 1M-row dim (too big to broadcast);
with ``spark.sql.adaptive.skewJoin.enabled`` the straggler partition is
split into many tasks, collapsing the max-task wall.  Prints one JSON
line with per-config {wall, max/median task time, task count} for the
join stage.  Results recorded in SCALE.md.

Usage: python tools/skew_smoke.py [n_fact]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stages(spark):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages?status=complete",
        timeout=10,
    ) as r:
        return json.load(r)


def run_config(spark, n_fact: int, skew_enabled: bool) -> dict:
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower())
    seen = {s["stageId"] for s in _stages(spark)}
    # fact: 80% of rows on key 0, rest uniform over 100k keys
    fact = spark.range(0, n_fact, 1, 32).select(
        F.when(F.col("id") % 5 < 4, F.lit(0))
        .otherwise(F.pmod(F.hash(F.col("id")), 100_000)).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(0, 1_000_000, 1, 32).select(
        F.col("id").alias("k"),
        F.concat(F.lit("payload_"), F.col("id")).alias("p"),
    )
    t0 = time.time()
    out = (
        fact.join(dim, "k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect()
    )
    wall = round(time.time() - t0, 1)
    new_stages = [s for s in _stages(spark) if s["stageId"] not in seen]
    # the join stage = the one with the most shuffle read
    join_stage = max(new_stages, key=lambda s: s.get("shuffleReadBytes", 0))
    sid, att = join_stage["stageId"], join_stage["attemptId"]
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages/{sid}/{att}/taskSummary"
        "?quantiles=0.5,1.0",
        timeout=10,
    ) as r:
        q = json.load(r)
    med_ms, max_ms = q["executorRunTime"]
    return {
        "rows": int(out[0]["n"]),
        "wall_sec": wall,
        "join_stage_tasks": join_stage["numCompleteTasks"],
        "task_runtime_median_ms": round(med_ms),
        "task_runtime_max_ms": round(max_ms),
    }


def main(n_fact: int = 20_000_000) -> None:
    from vector_db_at_home_spark.session import get_spark

    spark = get_spark("skew-smoke", extra_conf={
        "spark.ui.enabled": "true",
        # dim must not broadcast or there is no shuffle join to skew
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    })
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "skew_smoke", "n_fact": n_fact}
    for label, enabled in [("skewjoin_off", False), ("skewjoin_on", True)]:
        out[label] = run_config(spark, n_fact, enabled)
        print(f"# {label}: {out[label]}", file=sys.stderr)
    a, b = out["skewjoin_off"], out["skewjoin_on"]
    assert a["rows"] == b["rows"], "skew handling changed the result!"
    out["max_task_speedup"] = round(
        a["task_runtime_max_ms"] / max(b["task_runtime_max_ms"], 1), 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000)
