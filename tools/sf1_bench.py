"""sf1-scale bench point for the FULL 12-query headline suite (VERDICT r5
task 5; r4's version covered only dedup/fuzzy/kNN) — extends the measured
scaling story one decade past the per-round sf0.1 bench, for EVERY
headline plan.

Synthesizes sf1-shaped tables (10× sf0.1) by DETERMINISTIC 10× replication
of the driver's sf0.1 parquet:

- ``documents``: replica ``r`` suffixes every token with ``_r`` — replicas
  are shingle-disjoint across reps (Jaccard 0), so the corpus is 10
  structurally identical, non-interacting copies and the true near-dup
  pair count scales exactly 10x.  A perturbation that left replicas
  near-identical would grow the OUTPUT quadratically and poison the
  scaling measurement.
- ``embeddings``: replica ``r`` shifts ids by ``r * 10_000_000`` and adds
  ``r * 0.001`` to the first component (distinct vectors, same geometry).
- ``lineitem``/``orders``/``customer``/``supplier``: every entity key
  (orderkey, custkey, suppkey, partkey) shifts by ``r * 10_000_000``, so
  the join graph stays referentially intact per replica and fact joins
  carry exactly 10× the rows; nation/region/part stay fixed dims (each
  replica maps onto the same groups, so group-by outputs keep their
  cardinality while inputs grow 10× — the scaling-measurement shape).
- ``events``: event/user ids shift; timestamps keep, so windowed aggs
  keep their group count at 10× the input.

Runs all 12 ``bench.bench_queries`` shapes at BOTH sf0.1 (the source) and
the synthesized sf1, best-of-2 each in the same session, and records wall
+ shuffle-write bytes per query (Spark UI REST API, bracketed).  The
sf1/sf0.1 wall ratio printed per query is the headline scaling evidence —
sub-quadratic (ideally ≈linear) growth for every plan.  Prints ONE JSON
line; the committed numbers live in SCALE.md.

Usage: ``python tools/sf1_bench.py [src_sf_dir]`` (default
/root/testdata/sf0.1; pass sf0.01 for a fast self-check).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPS = 10
SHIFT = 10_000_000


def _shuffle_write(spark) -> int:
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return -1
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        ) as r:
            stages = json.load(r)
    except Exception:  # noqa: BLE001 — UI may be momentarily unready
        return -1
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def _replicate(df, key_cols: list[str], reps):
    """10× cross-join replication shifting every key column by
    ``rep · SHIFT`` — referential integrity preserved within a replica."""
    out = df.crossJoin(F.broadcast(reps))
    for k in key_cols:
        out = out.withColumn(k, F.col(k) + F.col("rep").cast("long") * SHIFT)
    return out.drop("rep")


def build_sf1(spark, src_dir: str, out_dir: str) -> None:
    reps = spark.range(REPS).select(F.col("id").cast("int").alias("rep"))

    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    docs10 = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep").cast("long") * SHIFT)
            .alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(t, F.lit("_"),
                                           F.col("rep").cast("string")),
                    ),
                    " ",
                )
            ).alias("text"),
            "lang", "source", "n_chars",
        )
    )
    docs10.repartition(32).write.mode("overwrite") \
        .parquet(f"{out_dir}/documents.parquet")

    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    emb10 = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("rep").cast("long") * SHIFT)
            .alias("vec_id"),
            F.concat(
                F.array(
                    F.element_at("embedding", 1)
                    + F.col("rep").cast("float") * 0.001
                ),
                F.slice("embedding", 2, 10_000),
            ).alias("embedding"),
            "label",
        )
    )
    emb10.repartition(32).write.mode("overwrite") \
        .parquet(f"{out_dir}/embeddings.parquet")

    shifted = {
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "events": ["event_id", "user_id"],
    }
    for table, keys in shifted.items():
        df = spark.read.parquet(f"{src_dir}/{table}.parquet")
        _replicate(df, keys, reps).repartition(32).write \
            .mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
    for table in ("nation", "region", "part"):
        spark.read.parquet(f"{src_dir}/{table}.parquet").write \
            .mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


def main() -> None:
    from bench import bench_queries
    from vector_db_at_home_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("sf1_bench",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = tempfile.mkdtemp(prefix="sf1_")
    t0 = time.time()
    build_sf1(spark, src, out_dir)
    n_docs = spark.read.parquet(f"{out_dir}/documents.parquet").count()
    n_li = spark.read.parquet(f"{out_dir}/lineitem.parquet").count()
    print(f"# built sf1 tables in {time.time() - t0:.1f}s: "
          f"{n_docs} docs, {n_li} lineitems", file=sys.stderr)

    benches = bench_queries(spark)
    results: dict[str, dict] = {}
    for name, fn in benches.items():
        fn(spark, out_dir).collect()  # codegen warmup, same plan shape
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
              f"sf1 {per_scale['sf1']['wall_sec']}s "
              f"(x{ratio:.1f}, {per_scale['sf1']['shuffle_write_mb']} MB "
              f"shuffle, {per_scale['sf1']['rows']} rows)", file=sys.stderr)

    print(json.dumps({
        "metric": "sf1_headline_suite",
        "n_docs": n_docs,
        "n_lineitem": n_li,
        "queries": results,
        "src": src,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
