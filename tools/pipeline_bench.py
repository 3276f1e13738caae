"""Pipeline-capstone bench (r12, VERDICT r11 task 7): the per-round
regression tripwire for the INGEST loop, the one production path that
had no committed round-over-round number (serving got its tripwire in
r11 via serving_bench.py).

Measures ``pipeline.clean_corpus_admit_batch`` — the full cleaning
cascade screen (exact / MinHash near-dup / quality / language /
semantic) plus the r11 exactly-once state write-back — at STEADY STATE:
the cascade state builds once from a 50% corpus, six fixed-size shards
admit sequentially, and the committed number is the MEDIAN wall of
shards 4-6 (after 3 warm shards: codegen compiled, state file counts
settled, screen joins warm).  Per VERDICT r11: "so the exactly-once
machinery's cost is visible round-over-round".

Prints ONE JSON line (committed as BENCH_PIPELINE_r{N}.json):
``{"metric": "pipeline_admit_steady", "value": <median steady shard
wall s>, ...}``.  Band lives in BASELINE.md.

Usage: ``python tools/pipeline_bench.py [sf_dir]`` (default
/root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def main() -> None:
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.pipeline import (
        clean_corpus_admit_batch,
        clean_corpus_states_build,
    )
    from vector_db_at_home_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("pipeline_bench")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{src}/documents.parquet")
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    corpus = docs.filter(F.col("doc_id") % 12 >= 6)      # 50%
    cemb = emb.filter(F.col("vec_id") % 12 >= 6)
    root = tempfile.mkdtemp(prefix="pipebench_states_")
    try:
        t0 = time.time()
        clean_corpus_states_build(spark, corpus, cemb, root)
        build_wall = round(time.time() - t0, 2)

        shard_walls: list[float] = []
        shard_rows: list[dict] = []
        for i in range(6):                               # 6 × ~8.3% shards
            shard = docs.filter(F.col("doc_id") % 12 == i)
            semb = emb.filter(F.col("vec_id") % 12 == i)
            t1 = time.time()
            kept, counts = clean_corpus_admit_batch(
                spark, root, shard, semb, batch_id=f"bench-shard-{i}")
            n_surv = kept.count()
            w = round(time.time() - t1, 3)
            shard_walls.append(w)
            shard_rows.append({"wall_s": w,
                               "in": dict(counts)["0_batch"],
                               "survivors": n_surv})
            print(f"# shard {i}: {shard_rows[-1]}", file=sys.stderr)

        steady = sorted(shard_walls[3:])[1]              # median of 4-6
        print(json.dumps({
            "metric": "pipeline_admit_steady",
            "value": steady,
            "unit": "sec",
            "sf": src.rstrip("/").split("sf")[-1],
            "state_build_s": build_wall,
            "shards": shard_rows,
            "steady_over_first": round(
                steady / max(shard_walls[0], 1e-9), 2),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
