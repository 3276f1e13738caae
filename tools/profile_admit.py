"""Per-stage wall profile of ONE admit-loop shard (r13, VERDICT r12
task 5): builds the cascade state from a 50% corpus, admits two shards
(first = warmup, second = measured) and prints the measured shard's
``stats["stage_walls"]`` — where the 46 s/shard actually goes.

Usage: python tools/profile_admit.py [sf_dir]   (default sf0.1)
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
    spark = get_spark("profile_admit")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{src}/documents.parquet")
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    corpus = docs.filter(F.col("doc_id") % 12 >= 6)
    cemb = emb.filter(F.col("vec_id") % 12 >= 6)
    root = tempfile.mkdtemp(prefix="profadmit_states_")
    try:
        t0 = time.time()
        clean_corpus_states_build(spark, corpus, cemb, root)
        build_wall = round(time.time() - t0, 2)
        out = {"state_build_s": build_wall, "shards": []}
        for i in range(2):
            shard = docs.filter(F.col("doc_id") % 12 == i)
            semb = emb.filter(F.col("vec_id") % 12 == i)
            stats: dict = {}
            t1 = time.time()
            kept, counts = clean_corpus_admit_batch(
                spark, root, shard, semb, batch_id=f"prof-shard-{i}",
                stats=stats)
            n = kept.count()
            out["shards"].append({
                "wall_s": round(time.time() - t1, 3),
                "survivors": n,
                "stage_walls": stats.get("stage_walls", {}),
            })
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
