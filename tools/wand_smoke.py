"""Block-Max WAND pruning at the 1M-doc point (r12, VERDICT r11 task 2
"done" criterion): generate a 1M-doc corpus with a ZIPF vocabulary
(realistic term skew — the sf test corpus is a 30-word uniform vocab
where every block contains every term, the honest adversarial case the
oracle certifies but where pruning cannot win), save a blockmax-enabled
store, then serve BM25 queries both ways and record:

- ``pct_postings_skipped``: 1 − cnt_survivors/cnt_total over the query
  terms' posting-doc counts — the exact skipped-read fraction (blocks
  partition doc ids, so posting counts are proportional to bytes);
- ``bytes_total`` / ``bytes_survivors``: the same fraction applied to
  the on-disk postings bytes of the query terms' buckets;
- wall times: wand vs the full indexed read (both exclude the build);
- a bit-equality assertion between the two result sets per query.

Usage: ``python tools/wand_smoke.py [n_docs]`` (default 1_000_000).
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

N_BUCKETS = 32
BLOCK_SIZE = 4096

# Zipf-ish vocabulary with TOPIC-CLUSTERED ingest order: term v_r
# occupies a contiguous (wrapping) id window of width ~n/(r+1) — docs
# from one source arrive adjacent and share vocabulary, the standard
# crawl shape, and the block-level bound variance block-max pruning
# exists to exploit.  (A uniform per-doc sprinkle — every block holding
# every term at the same tf/dl — is the adversarial no-variance case:
# measured 0% skipped, served bit-exact via the full read; the sf-corpus
# oracle queries certify exactly that regime.)  Deterministic, no RNG.
# Query: one mid-frequency + one rare term, the realistic disjunctive
# shape.
VOCAB_RANKS = 64
QUERY = ["v2", "v40"]           # common-ish + rare


def main() -> None:
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.invindex import (
        _bucket,
        bm25_search_indexed,
        bm25_search_indexed_wand,
        invindex_load,
        invindex_save,
    )
    from vector_db_at_home_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("wand_smoke", master="local[32]",
                      shuffle_partitions=32)

    # deterministic topic-clustered corpus: doc i contains term v_r iff
    # (i + r·777787) mod n lies in v_r's window [0, n/(r+1)) — so
    # df(v_r) ≈ n/(r+1) and each term's postings span a contiguous
    # id range (wrapping), staggered across ranks by the prime stride
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    toks = F.array_compact(F.transform(
        F.sequence(F.lit(0), F.lit(VOCAB_RANKS - 1)),
        lambda r: F.when(
            F.pmod(F.col("doc_id") + r * F.lit(777787), n_docs)
            < F.floor(F.lit(n_docs) / (r + 1)),
            F.concat(F.lit("v"), r.cast("string"))),
    ))
    docs = base.select(
        "doc_id",
        F.concat(F.lit("pad "), F.array_join(toks, " ")).alias("text"),
    )

    path = tempfile.mkdtemp(prefix="wand1m_")
    t0 = time.time()
    invindex_save(docs, "text", "doc_id", path, n_buckets=N_BUCKETS,
                  block_size=BLOCK_SIZE)
    build_s = time.time() - t0
    idx = invindex_load(spark, path)

    # on-disk bytes of the query terms' bucket dirs (the pruned read
    # universe the wand skip applies to)
    buckets = {
        r.b for r in spark.createDataFrame([(t,) for t in QUERY],
                                           "t string")
        .select(_bucket(F.col("t"), N_BUCKETS).alias("b")).collect()
    }
    bytes_buckets = 0
    for b in buckets:
        d = f"{path}/postings/bucket={b}"
        for root, _dirs, files in os.walk(d):
            bytes_buckets += sum(
                os.path.getsize(os.path.join(root, f)) for f in files)

    t0 = time.time()
    full = [(r.id, r.score_e4)
            for r in bm25_search_indexed(idx, QUERY, k=10).collect()]
    full_s = time.time() - t0

    t0 = time.time()
    wand = [(r.id, r.score_e4)
            for r in bm25_search_indexed_wand(idx, QUERY,
                                              k=10).collect()]
    wand_s = time.time() - t0
    assert wand == full, "WAND diverged from the exact read"
    c: dict = {}  # separate untimed run for the skip accounting
    bm25_search_indexed_wand(idx, QUERY, k=10, counters=c).collect()
    assert c.get("fallback") is None, c

    if "cnt_total" not in c:
        # seed-covers-everything shortcut (small corpora): no skip stats
        c.update(cnt_total=0, cnt_survivors=0, theta_e4=None)
    skipped = 1.0 - c["cnt_survivors"] / max(c["cnt_total"], 1)
    out = {
        "metric": "wand_smoke",
        "n_docs": n_docs,
        "block_size": BLOCK_SIZE,
        "query": QUERY,
        "build_s": round(build_s, 2),
        "full_serve_s": round(full_s, 2),
        "wand_serve_s": round(wand_s, 2),
        "n_blocks": c["n_blocks"],
        "n_survivors": c["n_survivors"],
        "cnt_total": c["cnt_total"],
        "cnt_survivors": c["cnt_survivors"],
        "pct_postings_skipped": round(100 * skipped, 2),
        "bytes_query_buckets": bytes_buckets,
        "bytes_survivors_est": int(bytes_buckets * (1 - skipped)),
        "bit_identical": True,
    }
    print(json.dumps(out))
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
