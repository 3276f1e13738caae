"""Production ingest-loop measurement (r9): build the cleaning-cascade
state ONCE from a corpus, then admit shards through
``pipeline.clean_corpus_admit_batch`` and measure per-shard wall —
quantifying the claim the registered ``clean_corpus_incremental``
query cannot show (the driver's self-contained contract forces it to
rebuild the state in-query every call): per-shard admit cost is
O(shard + state collisions), flat as the corpus grows by admission,
and far below the one-time state build.

Method: the source documents table splits into a 50% corpus + five 10%
shards (doc_id mod 10).  The corpus states build once; the five shards
admit sequentially (each screened against corpus ∪ earlier survivors).
Embeddings ride along where vec_ids match.  Reported: state-build wall,
per-shard admit wall, survivors per shard, and the shard-5/shard-1 wall
ratio (flat ⇒ ~1.0 despite the state having grown by four shards).

Usage: ``python tools/admit_loop_smoke.py [src_sf_dir]`` (default
/root/testdata/sf0.1; also runs the synthesized 10x).  Prints ONE JSON
line; committed numbers live in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from sf1_bench import build_sf1  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.pipeline import (
        clean_corpus_admit_batch,
        clean_corpus_states_build,
    )
    from vector_db_at_home_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("admit_loop")
    spark.sparkContext.setLogLevel("ERROR")

    sf1_dir = tempfile.mkdtemp(prefix="sf1_admit_")
    build_sf1(spark, src, sf1_dir)

    results: dict[str, dict] = {}
    for label, d in (("sf0.1", src), ("sf1", sf1_dir)):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        corpus = docs.filter(F.col("doc_id") % 10 >= 5)
        cemb = emb.filter(F.col("vec_id") % 10 >= 5)
        root = tempfile.mkdtemp(prefix=f"admit_states_{label}_")
        t0 = time.time()
        clean_corpus_states_build(spark, corpus, cemb, root)
        build_wall = time.time() - t0

        shards = []
        for i in range(5):
            shard = docs.filter(F.col("doc_id") % 10 == i)
            semb = emb.filter(F.col("vec_id") % 10 == i)
            t1 = time.time()
            k, counts = clean_corpus_admit_batch(
                spark, root, shard, semb, batch_id=f"shard-{i}")
            n_surv = k.count()
            shards.append({
                "wall_sec": round(time.time() - t1, 2),
                "in": dict(counts)["0_batch"],
                "survivors": n_surv,
            })
            print(f"# {label} shard {i}: {shards[-1]}", file=sys.stderr)
        results[label] = {
            "corpus_docs": corpus.count(),
            "state_build_wall_sec": round(build_wall, 1),
            "shards": shards,
            "shard5_over_shard1_wall": round(
                shards[-1]["wall_sec"] / max(shards[0]["wall_sec"], 1e-9),
                2),
        }

    print(json.dumps({
        "metric": "admit_loop",
        "scales": results,
        "src": src,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
