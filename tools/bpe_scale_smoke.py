"""BPE training at realistic vocab scale (VERDICT r7 task 3): train
1,024 merges on the sf0.1 documents corpus through the hybrid path and
report wall + merges/sec.  The pre-r8 distributed loop paid 2 Spark
jobs per merge (~2 s/merge of pure scheduling on local[32]); the hybrid
collects the word-type table once and finishes locally with
byte-identical greedy semantics (equivalence pytest-pinned in
tests/test_bpe.py).

Usage: python tools/bpe_scale_smoke.py [sf_dir] [n_merges]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from vector_db_at_home_spark.operators.bpe import bpe_train_merges
    from vector_db_at_home_spark.session import get_spark
    from vector_db_at_home_spark.sources import load_table

    spark = get_spark("bpe-scale-smoke")
    docs = load_table(spark, sf_dir, "documents")
    n_types = docs.selectExpr(
        "explode(split(lower(text), ' ')) AS w"
    ).filter("w <> ''").select("w").distinct().count()

    t0 = time.monotonic()
    merges = bpe_train_merges(docs, "text", n_merges=n_merges)
    rows = merges.collect()
    wall = time.monotonic() - t0

    # sanity: counts non-increasing never guaranteed (not monotone in
    # general BPE), but every round must be positive and rounds contiguous
    assert [r["round"] for r in rows] == list(range(len(rows)))
    assert all(r["pair_count"] >= 1 for r in rows)

    # the synthetic corpus has a tiny vocabulary (31 types at sf0.1), so
    # merges exhaust early — the REALISTIC-vocab leg trains on 100k
    # deterministic hex word types (md5 of a range; 16 base symbols give
    # deep merge structure), where all n_merges rounds actually run
    from pyspark.sql import functions as F

    big = spark.range(100_000).select(
        F.md5(F.col("id").cast("string")).substr(1, 12).alias("text"),
    )
    n_types_big = big.distinct().count()
    t1 = time.monotonic()
    rows_big = bpe_train_merges(big, "text", n_merges=n_merges).collect()
    wall_big = time.monotonic() - t1
    assert len(rows_big) == n_merges

    print(json.dumps({
        "tool": "bpe_scale_smoke",
        "sf_dir": sf_dir,
        "word_types": n_types,
        "n_merges_requested": n_merges,
        "n_merges_trained": len(rows),
        "wall_sec": round(wall, 2),
        "merges_per_sec": round(len(rows) / wall, 1) if wall else None,
        "last_merge": [rows[-1]["left_sym"], rows[-1]["right_sym"],
                       rows[-1]["pair_count"]] if rows else None,
        "hexvocab_word_types": n_types_big,
        "hexvocab_merges_trained": len(rows_big),
        "hexvocab_wall_sec": round(wall_big, 2),
        "hexvocab_merges_per_sec": round(len(rows_big) / wall_big, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
