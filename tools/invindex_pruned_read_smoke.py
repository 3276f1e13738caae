"""Isolated pruned-read measurement for the persisted inverted index
(VERDICT r8 task 5): the registered ``phrase_search_indexed`` query
pays an index BUILD inside the read query (forced by the driver's
self-contained-query contract), so its committed 10x number understates
the pruned-read win.  This smoke prebuilds the postings store ONCE,
then times the SEARCH leg alone against the corpus-rescan
``phrase_search``, recording wall AND bytes scanned.  Bytes are
accounted at the FILE level: the plan test (tests/test_invindex.py)
proves the pruned scan touches exactly one ``bucket = N`` partition per
term, so the bytes the search reads are the on-disk sizes of those
bucket directories — exact and deterministic, vs the full store size
and vs the documents parquet the rescan must scan.

The claim being quantified: a k-term phrase over a B-bucket store reads
~k/B of the postings bytes — vs the rescan's full-corpus
tokenize+explode.

Usage: ``python tools/invindex_pruned_read_smoke.py [src_sf_dir]``
(default /root/testdata/sf0.1; also measures a synthesized 10x).
Prints ONE JSON line; committed numbers live in SCALE.md.
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

PHRASE = "the query"
BM25_TERMS = ["vector", "merge", "batch"]
N_BUCKETS = 32


def _du(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.invindex import (
        invindex_load,
        invindex_save,
        phrase_search,
        phrase_search_indexed,
    )
    from vector_db_at_home_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("invindex_pruned",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    sf1_dir = tempfile.mkdtemp(prefix="sf1_inv_")
    build_sf1(spark, src, sf1_dir)

    results: dict[str, dict] = {}
    for label, d in (("sf0.1", src), ("sf1", sf1_dir)):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        store = tempfile.mkdtemp(prefix=f"invstore_{label}_")
        t0 = time.time()
        invindex_save(docs, "text", "doc_id", store,
                      n_buckets=N_BUCKETS)
        build_wall = time.time() - t0
        store_bytes = _du(store)
        idx = invindex_load(spark, store)

        from vector_db_at_home_spark.operators.invindex import (
            bm25_search_indexed,
        )
        from vector_db_at_home_spark.operators.tfidf import bm25_search

        legs = {}
        for leg, fn in (
            ("indexed_search",
             lambda: phrase_search_indexed(idx, PHRASE)),
            ("corpus_rescan",
             lambda: phrase_search(docs, PHRASE, "text", "doc_id")),
            # r9: the ranked-retrieval serving leg — BM25 through the
            # same store (pruned tf reads + the doclens long pairs)
            ("bm25_indexed",
             lambda: bm25_search_indexed(idx, BM25_TERMS, k=10)),
            ("bm25_rescan",
             lambda: bm25_search(docs, BM25_TERMS, "text", "doc_id",
                                 k=10)),
        ):
            fn().collect()  # warmup: codegen + page cache parity
            best, rows = None, 0
            for _rep in range(3):
                t1 = time.time()
                rows = len(fn().collect())
                dt = time.time() - t1
                if best is None or dt < best:
                    best = dt
            legs[leg] = {"wall_sec": round(best, 3), "rows": rows}
        # exact file-level bytes the pruned search touches: one
        # bucket = pmod(xxhash64(term), B) partition per phrase term
        # (plan-asserted PartitionFilters)
        terms = PHRASE.split()
        buckets = {
            int(v) for v in spark.range(1).select(
                *[F.pmod(F.xxhash64(F.lit(t)), F.lit(N_BUCKETS))
                  .alias(f"b{i}") for i, t in enumerate(terms)]
            ).first()
        }
        touched = sum(
            _du(os.path.join(store, "postings", f"bucket={b}"))
            for b in buckets
        )
        docs_bytes = _du(f"{d}/documents.parquet")
        # r9: the BM25 serving leg's exact byte footprint — each unique
        # term's bucket (read twice in-plan: tf leg + df leg) plus the
        # doclens long-pair table
        bm25_buckets = {
            int(v) for v in spark.range(1).select(
                *[F.pmod(F.xxhash64(F.lit(t)), F.lit(N_BUCKETS))
                  .alias(f"b{i}") for i, t in enumerate(BM25_TERMS)]
            ).first()
        }
        bm25_touched = 2 * sum(
            _du(os.path.join(store, "postings", f"bucket={b}"))
            for b in bm25_buckets
        ) + _du(os.path.join(store, "doclens"))
        results[label] = {
            "bm25_bytes_read_mb": round(bm25_touched / 2**20, 2),
            "bm25_bytes_vs_rescan": round(bm25_touched / docs_bytes, 3),
            "build_wall_sec": round(build_wall, 1),
            "postings_store_mb": round(store_bytes / 2**20, 2),
            "touched_bucket_mb": round(touched / 2**20, 2),
            "docs_parquet_mb": round(docs_bytes / 2**20, 2),
            **legs,
            "bytes_read_over_store": round(touched / store_bytes, 3),
            "k_over_B": round(len(terms) / N_BUCKETS, 3),
            "bytes_vs_rescan": round(touched / docs_bytes, 3),
            "wall_speedup_vs_rescan": round(
                legs["corpus_rescan"]["wall_sec"]
                / max(legs["indexed_search"]["wall_sec"], 1e-9), 1),
        }
        print(f"# {label}: {results[label]}", file=sys.stderr)

    print(json.dumps({
        "metric": "invindex_pruned_read",
        "phrase": PHRASE,
        "n_buckets": N_BUCKETS,
        "scales": results,
        "src": src,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
