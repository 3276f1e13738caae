"""Substring-state ingest smoke at 1M-corpus scale: build the persisted
span-hash state once, then admit a 50k batch via
``substring_dedup_incremental`` + ``substring_state_append`` and record
wall + shuffle bytes for (a) the one-time state build, (b) the O(batch)
admit, and (c) the naive alternative (full-corpus
``substring_dedup_stats`` over corpus ∪ batch).

The claim under test: per-batch cost is bounded by the batch's own span
windows plus one hash join against the pre-aggregated state — the
corpus text is never re-read.

Usage: python tools/substring_incremental_smoke.py [n_corpus] [n_batch]
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
        substring_dedup_incremental,
        substring_dedup_stats,
        substring_state_append,
        substring_state_build,
    )
    from vector_db_at_home_spark.session import get_spark

    spark = get_spark("substring-incremental-smoke",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="ss_inc_smoke_")
    corpus_path, batch_path = f"{work}/corpus", f"{work}/batch"
    docs = synthetic_docs(spark, n_corpus, 0)
    docs.write.mode("overwrite").parquet(corpus_path)
    # batch ids disjoint; batch TEXTS duplicate the first n_batch corpus
    # docs (same hash formula), so every batch doc has cross-doc spans —
    # a strong equivalence check between the incremental and full paths
    batch = synthetic_docs(spark, n_batch, 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    batch.write.mode("overwrite").parquet(batch_path)
    corpus = spark.read.parquet(corpus_path)
    bdf = spark.read.parquet(batch_path)

    out: dict = {"n_corpus": n_corpus, "n_batch": n_batch}
    state = f"{work}/state"

    s0 = shuffle_totals(spark)
    t0 = time.time()
    substring_state_build(corpus, state, "text", "doc_id", window=8)
    out["state_build_sec"] = round(time.time() - t0, 1)
    s1 = shuffle_totals(spark)
    out["state_build_shuffle_mb"] = round((s1["write"] - s0["write"]) / 1e6, 1)

    t0 = time.time()
    inc = substring_dedup_incremental(spark, state, bdf, "text", "doc_id")
    n_flagged = inc.filter(F.col("n_crossdoc_spans") > 0).count()
    substring_state_append(spark, state, bdf, "text", "doc_id")
    out["admit_sec"] = round(time.time() - t0, 1)
    s2 = shuffle_totals(spark)
    out["admit_shuffle_mb"] = round((s2["write"] - s1["write"]) / 1e6, 1)
    out["batch_docs_with_crossdoc_spans"] = n_flagged

    # the naive alternative: full stats over corpus ∪ batch, batch rows
    t0 = time.time()
    full = substring_dedup_stats(corpus.unionByName(bdf), "text", "doc_id",
                                 window=8)
    n_full = full.filter((F.col("id") >= 10_000_000)
                         & (F.col("n_crossdoc_spans") > 0)).count()
    out["naive_full_sec"] = round(time.time() - t0, 1)
    s3 = shuffle_totals(spark)
    out["naive_full_shuffle_mb"] = round((s3["write"] - s2["write"]) / 1e6, 1)
    out["results_agree"] = bool(n_flagged == n_full)

    print(json.dumps({"metric": "substring_incremental_1m", **out}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 50_000)
