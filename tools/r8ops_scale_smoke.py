"""10× scaling point for the round-8 operators (indexed phrase search
through the persisted inverted index, the clean_corpus_v2 full-dedup
cascade, the regex tokenizer path, SemDeDup with the skew guard active)
— same replica methodology as tools/r7ops_scale_smoke.py.

Prints ONE JSON line with per-query wall + shuffle-write bytes at sf0.1
and the synthesized sf1; committed numbers live in SCALE.md.

Usage: ``python tools/r8ops_scale_smoke.py [src_sf_dir]``.
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

from sf1_bench import _shuffle_write, build_sf1  # noqa: E402

QUERIES = [
    "phrase_search_indexed",
    "clean_corpus_v2",
    "token_stats_regex",
]


def main() -> None:
    from pyspark.sql import functions as F

    from vector_db_at_home_spark import registry
    from vector_db_at_home_spark.operators.dedup import semantic_dedup
    from vector_db_at_home_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("r8ops_scale",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = tempfile.mkdtemp(prefix="sf1_r8ops_")
    t0 = time.time()
    build_sf1(spark, src, out_dir)
    n_docs = spark.read.parquet(f"{out_dir}/documents.parquet").count()
    print(f"# built replicas in {time.time() - t0:.1f}s: {n_docs} docs",
          file=sys.stderr)

    qs = registry.queries()
    results: dict[str, dict] = {}
    for name in QUERIES:
        fn = qs[name]
        fn(spark, out_dir).collect()  # codegen warmup
        per_scale = {}
        for label, d in (("sf0.1", src), ("sf1", out_dir)):
            best, rows, sw = None, 0, 0
            for _rep in range(2):
                s0 = _shuffle_write(spark)
                t1 = time.time()
                rows = len(fn(spark, d).collect())
                dt = time.time() - t1
                if best is None or dt < best:
                    best, sw = dt, _shuffle_write(spark) - s0
            per_scale[label] = {
                "wall_sec": round(best, 2),
                "shuffle_write_mb": round(sw / 2**20, 1),
                "rows": rows,
            }
        ratio = (per_scale["sf1"]["wall_sec"]
                 / max(per_scale["sf0.1"]["wall_sec"], 1e-9))
        results[name] = {**per_scale, "wall_ratio_10x": round(ratio, 1)}
        print(f"# {name}: sf0.1 {per_scale['sf0.1']['wall_sec']}s -> "
              f"sf1 {per_scale['sf1']['wall_sec']}s (x{ratio:.1f}, "
              f"{per_scale['sf1']['shuffle_write_mb']} MB shuffle, "
              f"{per_scale['sf1']['rows']} rows)", file=sys.stderr)

    # skew-guard leg: SemDeDup over the sf1 embeddings with a cap that
    # FORCES the blocked route (every natural cell >> cap), proving the
    # distributed path at 20k vectors and comparing its wall against the
    # unguarded in-cell kernel on the same data
    emb = spark.read.parquet(f"{out_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    ).localCheckpoint(eager=True)
    guard_leg = {}
    for label, cap in (("in_cell", 10**9), ("blocked", 512)):
        t1 = time.time()
        kept = semantic_dedup(emb, "id", "vec", n_cells=8,
                              threshold=0.8, max_cell_rows=cap) \
            .filter("keep").count()
        guard_leg[label] = {"wall_sec": round(time.time() - t1, 2),
                            "kept": kept}
    assert guard_leg["in_cell"]["kept"] == guard_leg["blocked"]["kept"]
    results["semantic_dedup_skew_guard_sf1"] = guard_leg
    print(f"# semantic skew guard @ sf1: {guard_leg}", file=sys.stderr)

    print(json.dumps({
        "metric": "r8ops_10x_scaling",
        "n_docs": n_docs,
        "queries": results,
        "src": src,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
