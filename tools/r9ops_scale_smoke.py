"""10x scaling points for the round-9 operators (the checkpointed
clean_corpus_v2 cascade, regex-mode BM25 and indexed phrase search) —
same replica methodology as tools/r8ops_scale_smoke.py.

Headline (VERDICT r8 task 2): clean_corpus_v2 at sf1 measured
109.7 s / 2664.7 MB shuffle before the stage-decision checkpoints and
28.8 s / 358.4 MB after (-74 % wall, -87 % shuffle; targets were -30 %)
— every heavy stage now materializes exactly once instead of being
re-derived by each stage-count branch and by semantic_dedup's internal
actions.

Prints ONE JSON line with per-query wall + shuffle-write bytes at sf0.1
and the synthesized sf1; committed numbers live in SCALE.md.

Usage: ``python tools/r9ops_scale_smoke.py [src_sf_dir]``.
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
    "clean_corpus_v2",
    "bm25_topk_regex",
    "phrase_search_indexed_regex",
    "bm25_topk_indexed",
    "clean_corpus_incremental",
    "hybrid_search_rrf_indexed",
]


def main() -> None:
    from vector_db_at_home_spark import registry
    from vector_db_at_home_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("r9ops_scale",
                      extra_conf={"spark.ui.enabled": "true",
                                  # the shuffle accounting sums the UI's
                                  # completed-stage list; the default
                                  # 1000-stage retention evicts early
                                  # stages mid-smoke and the cumulative
                                  # sum goes BACKWARDS (a negative delta)
                                  "spark.ui.retainedStages": "300000"})
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = tempfile.mkdtemp(prefix="sf1_r9ops_")
    t0 = time.time()
    build_sf1(spark, src, out_dir)
    n_docs = spark.read.parquet(f"{out_dir}/documents.parquet").count()
    print(f"# built replicas in {time.time() - t0:.1f}s: {n_docs} docs",
          file=sys.stderr)

    qs = registry.queries()
    results: dict[str, dict] = {}
    for name in QUERIES:
        fn = qs[name]
        fn(spark, src).collect()  # codegen warmup
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

    print(json.dumps({
        "metric": "r9ops_10x_scaling",
        "n_docs": n_docs,
        "queries": results,
        "src": src,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
