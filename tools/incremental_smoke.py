"""Incremental-ingest smoke at 1M-corpus scale: admit a 50k batch against
a 1M-doc corpus with ``minhash_lsh_pairs_incremental`` and record wall,
shuffle bytes and recall of planted cross near-dups.

The claim under test: ingest cost is bounded by the BATCH's shingles plus
its band collisions with the corpus — the corpus is scanned once, never
self-joined — so admitting 5% more data costs a small fraction of the
full self-join dedup (measured alongside: the full-corpus
minhash_lsh_pairs at the same scale in tools/scale_smoke_1m.py).

Usage: python tools/incremental_smoke.py [n_corpus] [n_batch]
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
        minhash_lsh_pairs_incremental,
    )
    from vector_db_at_home_spark.session import get_spark

    spark = get_spark("incremental-smoke",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    n_dups = 5_000  # synthetic_docs plants docs n_corpus+i ≈ doc i

    tmp = tempfile.mkdtemp(prefix="inc_smoke_")
    # corpus = the first n_corpus base docs; batch = n_batch fresh docs of
    # which n_dups are planted one-word-substitution near-dups of corpus
    # docs 0..n_dups (the synthetic generator's layout)
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
    out = {"metric": "incremental_smoke", "n_corpus": n_corpus,
           "n_batch": n_b}

    # (a) the naive form: recomputes corpus state per batch — recorded to
    # show WHY the prepared state exists
    s0 = shuffle_totals(spark)
    t0 = time.time()
    hits = minhash_lsh_pairs_incremental(
        batch, corpus, "text", "doc_id", threshold=0.5,
        max_doc_freq=200, max_band_bucket=500,
    ).collect()
    got = {(r.new_id, r.corpus_id) for r in hits}
    s1 = shuffle_totals(spark)
    out["naive"] = {
        "wall_sec": round(time.time() - t0, 1),
        "pairs": len(hits),
        "planted_recall": round(len(got & planted) / len(planted), 4),
        "shuffle_write_mb": round((s1["write"] - s0["write"]) / 2**20, 1),
    }
    print(f"# naive: {out['naive']}", file=sys.stderr)

    # (b) the production loop: corpus state persisted once, batch admits
    # against it
    from vector_db_at_home_spark.operators.dedup import (
        minhash_corpus_state_build,
        minhash_lsh_pairs_incremental_prepared,
    )

    t0 = time.time()
    minhash_corpus_state_build(
        corpus, tmp + "/state", "text", "doc_id",
        max_doc_freq=200, max_band_bucket=500,
    )
    out["state_build_wall_sec"] = round(time.time() - t0, 1)
    print(f"# state build: {out['state_build_wall_sec']}s", file=sys.stderr)
    s0 = shuffle_totals(spark)
    t0 = time.time()
    hits2 = minhash_lsh_pairs_incremental_prepared(
        spark, tmp + "/state", batch, "text", "doc_id", threshold=0.5
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
