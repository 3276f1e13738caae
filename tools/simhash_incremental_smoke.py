"""SimHash incremental-ingest smoke at 1M-corpus scale (round 5) — the
SimHash analog of ``tools/incremental_smoke.py``: admit a 50k batch with
``simhash_pairs_incremental`` (naive — corpus re-fingerprinted per batch)
vs the PERSISTED 16-byte/doc fingerprint state
(``simhash_state_build`` + ``simhash_pairs_incremental_prepared``), and
record wall, shuffle bytes, result identity and planted-near-dup recall.

The state story is starker than MinHash's: the whole corpus side is one
``(id, int64)`` row per doc — ~16 MB for 1M docs — so the prepared admit
touches only the batch's shingles plus a tiny state scan.

Usage: python tools/simhash_incremental_smoke.py [n_corpus] [n_batch]
Prints one JSON line; recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_smoke import synthetic_docs  # noqa: E402
from tools.scale_smoke_1m import shuffle_totals  # noqa: E402


def main(n_corpus: int = 1_000_000, n_batch: int = 50_000) -> None:
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.dedup import (
        simhash_pairs_incremental,
        simhash_pairs_incremental_prepared,
        simhash_state_build,
    )
    from vector_db_at_home_spark.session import get_spark

    spark = get_spark("simhash-inc-smoke",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    n_dups = 5_000

    tmp = tempfile.mkdtemp(prefix="sh_inc_smoke_")
    all_docs = synthetic_docs(spark, n_corpus, n_dups)
    all_docs.filter(F.col("doc_id") < n_corpus).write.mode(
        "overwrite").parquet(tmp + "/corpus")
    base = spark.range(n_corpus + n_dups,
                       n_corpus + n_dups + (n_batch - n_dups))
    fresh = synthetic_docs(spark, n_corpus + n_dups + n_batch, 0) \
        .join(base.select(F.col("id").alias("doc_id")), "doc_id")
    all_docs.filter(F.col("doc_id") >= n_corpus).unionByName(fresh) \
        .write.mode("overwrite").parquet(tmp + "/batch")
    corpus = spark.read.parquet(tmp + "/corpus")
    batch = spark.read.parquet(tmp + "/batch")
    n_b = batch.count()

    planted = {(n_corpus + i, i) for i in range(n_dups)}
    out = {"metric": "simhash_incremental_smoke", "n_corpus": n_corpus,
           "n_batch": n_b}

    s0 = shuffle_totals(spark)
    t0 = time.time()
    hits = simhash_pairs_incremental(
        batch, corpus, "text", "doc_id", max_hamming=5
    ).collect()
    s1 = shuffle_totals(spark)
    got = {(r.new_id, r.corpus_id) for r in hits}
    out["naive"] = {
        "wall_sec": round(time.time() - t0, 1),
        "pairs": len(hits),
        "planted_recall": round(len(got & planted) / len(planted), 4),
        "shuffle_write_mb": round((s1["write"] - s0["write"]) / 2**20, 1),
    }
    print(f"# naive: {out['naive']}", file=sys.stderr)

    t0 = time.time()
    simhash_state_build(corpus, tmp + "/state", "text", "doc_id")
    out["state_build_wall_sec"] = round(time.time() - t0, 1)
    sz = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(tmp + "/state") for f in fs
    )
    out["state_size_mb"] = round(sz / 2**20, 1)
    print(f"# state build: {out['state_build_wall_sec']}s, "
          f"{out['state_size_mb']} MB on disk", file=sys.stderr)

    s0 = shuffle_totals(spark)
    t0 = time.time()
    hits2 = simhash_pairs_incremental_prepared(
        spark, tmp + "/state", batch, "text", "doc_id", max_hamming=5
    ).collect()
    s1 = shuffle_totals(spark)
    got2 = {(r.new_id, r.corpus_id) for r in hits2}
    out["prepared"] = {
        "wall_sec": round(time.time() - t0, 1),
        "pairs": len(hits2),
        "planted_recall": round(len(got2 & planted) / len(planted), 4),
        "shuffle_write_mb": round((s1["write"] - s0["write"]) / 2**20, 1),
    }
    out["results_identical"] = sorted(got) == sorted(got2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 50_000)
