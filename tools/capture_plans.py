"""Capture ``explain("formatted")`` for named registry queries.

Writes ``<out_dir>/<query>_<suffix>.txt`` per query — the before/after
plan evidence the optimization rounds commit under ``plans/rN/``.

Usage: python tools/capture_plans.py <out_dir> <suffix> <query> [query...]
       (sf dir from $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.001 —
       plan shapes are scale-independent, the smallest SF keeps it fast)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(out_dir, exist_ok=True)

    from vector_db_at_home_spark.plans.explain import formatted_plan
    from vector_db_at_home_spark.registry import queries
    from vector_db_at_home_spark.session import get_spark

    spark = get_spark("capture_plans")
    qs = queries()
    for name in names:
        plan = formatted_plan(qs[name](spark, sf_dir))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
