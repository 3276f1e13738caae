"""sf1-scale bench point for the three heaviest headline queries
(VERDICT r4 stretch #6) — extends the measured scaling story one decade
past the per-round sf0.1 bench.

Synthesizes sf1-shaped tables (10x sf0.1: 50k documents, 50k embeddings)
by DETERMINISTIC 10x replication of the driver's sf0.1 parquet:

- ``documents``: replica ``r`` suffixes every token with ``_r`` — replicas
  are shingle-disjoint across reps (Jaccard 0), so the corpus is 10
  structurally identical, non-interacting copies and the true near-dup
  pair count scales exactly 10x.  A perturbation that left replicas
  near-identical would grow the OUTPUT quadratically and poison the
  scaling measurement.
- ``embeddings``: replica ``r`` shifts ids by ``r * 10_000_000`` and adds
  ``r * 0.001`` to the first component (distinct vectors, same geometry).

Runs ``dedup_minhash_lsh``, ``fuzzy_topk`` and ``knn_batch32_k10`` with
the exact bench.py shapes, best-of-2, and records wall + shuffle-write
bytes per query (Spark UI REST API, bracketed).  Prints ONE JSON line;
the committed numbers live in SCALE.md next to the 1M smokes.

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


def build_sf1(spark, src_dir: str, out_dir: str) -> None:
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    reps = spark.range(REPS).select(F.col("id").cast("int").alias("rep"))
    docs10 = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep").cast("long") * 10_000_000)
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
            (F.col("vec_id") + F.col("rep").cast("long") * 10_000_000)
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


def main() -> None:
    from vector_db_at_home_spark.operators.dedup import minhash_lsh_pairs
    from vector_db_at_home_spark.operators.fuzzysearch import (
        fuzzy_search_by_doc,
    )
    from vector_db_at_home_spark.operators.knn import knn_search
    from vector_db_at_home_spark.session import get_spark
    from vector_db_at_home_spark.sources import load_table

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("sf1_bench",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = tempfile.mkdtemp(prefix="sf1_")
    t0 = time.time()
    build_sf1(spark, src, out_dir)
    n_docs = spark.read.parquet(f"{out_dir}/documents.parquet").count()
    n_vecs = spark.read.parquet(f"{out_dir}/embeddings.parquet").count()
    print(f"# built sf1 tables in {time.time() - t0:.1f}s: "
          f"{n_docs} docs, {n_vecs} vecs", file=sys.stderr)

    def dedup(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5,
                                 max_doc_freq=100, max_band_bucket=200)

    def fuzzy(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return fuzzy_search_by_doc(
            docs,
            ["spark window merge sort", "the fast key order sort table"],
            k=10, doc_col="text", id_col="doc_id",
        )

    def knn_batch(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        qs = (
            emb.orderBy("vec_id")
            .limit(32)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("qvec"))
        )
        return knn_search(emb, qs, k=10, id_col="vec_id",
                          vec_col="embedding", impl="pandas")

    benches = {
        "dedup_minhash_lsh": dedup,
        "fuzzy_topk": fuzzy,
        "knn_batch32_k10": knn_batch,
    }
    results: dict[str, dict] = {}
    for name, fn in benches.items():
        fn(spark, out_dir).collect()  # codegen warmup, same plan shape
        best, rows, sw = None, 0, 0
        for _rep in range(2):
            s0 = _shuffle_write(spark)
            t0 = time.time()
            rows = len(fn(spark, out_dir).collect())
            dt = time.time() - t0
            if best is None or dt < best:
                best, sw = dt, _shuffle_write(spark) - s0
        results[name] = {
            "wall_sec": round(best, 2),
            "shuffle_write_mb": round(sw / 2**20, 1),
            "rows": rows,
        }
        print(f"# {name}: {best:.2f}s, {results[name]['shuffle_write_mb']}"
              f" MB shuffle, {rows} rows", file=sys.stderr)

    print(json.dumps({
        "metric": "sf1_heavy_queries",
        "n_docs": n_docs,
        "n_vecs": n_vecs,
        "queries": results,
        "src": src,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
