"""1M-row scale smoke for the two flagship sub-quadratic paths — MinHash
LSH dedup and IVF ANN — recording SHUFFLE VOLUME from the Spark REST API
alongside wall time and recall.

Rationale: wall time at one scale says little about the 100× story; shuffle
bytes are the quantity that must grow ~linearly for the "no quadratic
anywhere" claim to hold.  This smoke runs at 5× the 200k smoke
(`tools/scale_smoke.py`) / 200× the bench corpus, so comparing the two
smokes' shuffle volumes directly tests the scaling exponent.

Usage: python tools/scale_smoke_1m.py [n_rows] — prints one JSON line.
Results are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_smoke import synthetic_docs  # noqa: E402


def clustered_vectors(spark, n_rows: int, dim: int, n_clusters: int):
    """(vec_id, embedding): points tightly grouped around ``n_clusters``
    hash-derived centers (cluster = id % n_clusters, noise σ ≈ 0.03 around
    a center with component range ±0.5) — the regime real embedding
    corpora live in and the one IVF is built for.  Uniform random vectors
    (``scale_smoke.synthetic_vectors``) are the pathological anti-IVF case:
    every neighbor list spans many cells, so recall there measures the
    data, not the index."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        cols = np.arange(dim, dtype=np.float64) + 1.0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(np.int64)
            cid = ids % n_clusters
            arg = np.sin(np.outer(cid + 1.0, cols * 12.9898)) * 43758.5453
            centers = arg - np.floor(arg) - 0.5
            narg = np.sin(np.outer(ids + 7.0, cols * 3.1707)) * 9631.4477
            noise = (narg - np.floor(narg) - 0.5) * 0.1
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": list((centers + noise).astype(np.float32)),
            })

    base = spark.range(0, n_rows, 1, 64)
    return base.mapInPandas(gen, "vec_id long, embedding array<float>")


def _ui_base(spark) -> str | None:
    ui = spark.sparkContext.uiWebUrl
    return ui if ui else None


def shuffle_totals(spark) -> dict[str, int]:
    """Cumulative shuffle read/write bytes across all completed stages,
    from the Spark UI REST API (public monitoring interface)."""
    base = _ui_base(spark)
    if base is None:
        return {"write": -1, "read": -1}
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        ) as r:
            stages = json.load(r)
    except Exception:  # noqa: BLE001 — UI may be momentarily unready
        return {"write": -1, "read": -1}
    return {
        "write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "read": sum(s.get("shuffleReadBytes", 0) for s in stages),
    }


def cc_section(spark, out: dict, n_blobs: int = 250_000,
               chain_len: int = 1 << 17) -> None:
    """Connected components at ~1M edges on a planted graph: ``n_blobs``
    4-vertex star clusters (the typical near-dup shape, diameter 2) plus
    two ``chain_len``-edge path graphs (the adversarial diameter case
    pointer jumping exists for).  Records rounds-to-converge (must be
    O(log diameter), not O(diameter)) and per-round shuffle bytes (must be
    ~flat: each round shuffles |V| + 2|E| keyed rows regardless of round
    index — the linear-per-round scale claim)."""
    import time

    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.graph import connected_components

    blob_edges = (
        spark.range(0, n_blobs, 1, 32)
        .select(
            (F.col("id") * 4).alias("id_a"),
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("off"),
        )
        .select("id_a", (F.col("id_a") + F.col("off")).alias("id_b"))
    )
    base1 = n_blobs * 4
    chain1 = spark.range(0, chain_len, 1, 32).select(
        (base1 + F.col("id")).alias("id_a"),
        (base1 + F.col("id") + 1).alias("id_b"),
    )
    base2 = base1 + chain_len + 1
    chain2 = spark.range(0, chain_len, 1, 32).select(
        (base2 + F.col("id")).alias("id_a"),
        (base2 + F.col("id") + 1).alias("id_b"),
    )
    edges = blob_edges.unionByName(chain1).unionByName(chain2)
    n_edges = 3 * n_blobs + 2 * chain_len

    rounds: list[dict] = []
    last = shuffle_totals(spark)

    def on_round(i: int, changed: int) -> None:
        nonlocal last
        cur = shuffle_totals(spark)
        rounds.append({
            "round": i,
            "changed": changed,
            "shuffle_write_mb": round((cur["write"] - last["write"]) / 2**20, 1),
        })
        last = cur

    t0 = time.time()
    cc = connected_components(edges, max_iter=64, on_round=on_round)
    n_comp = cc.select("component").distinct().count()
    chain_sizes = (
        cc.filter(F.col("component").isin(base1, base2))
        .groupBy("component").count().collect()
    )
    out["cc_wall_sec"] = round(time.time() - t0, 1)
    out["cc_n_edges"] = n_edges
    out["cc_n_components"] = n_comp
    out["cc_components_ok"] = (
        n_comp == n_blobs + 2
        and sorted(r["count"] for r in chain_sizes) == [chain_len + 1] * 2
    )
    out["cc_rounds"] = len(rounds)
    out["cc_diameter"] = chain_len
    out["cc_round_shuffle_mb"] = [r["shuffle_write_mb"] for r in rounds]
    out["cc_round_changed"] = [r["changed"] for r in rounds]
    print(f"# cc_1m: {out['cc_wall_sec']}s rounds={out['cc_rounds']} "
          f"(diameter {chain_len} -> log2 {chain_len.bit_length()}), "
          f"components_ok={out['cc_components_ok']}", file=sys.stderr)


def main(n_rows: int = 1_000_000) -> None:
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.ann import ivf_build, ivf_search
    from vector_db_at_home_spark.operators.dedup import minhash_lsh_pairs
    from vector_db_at_home_spark.operators.knn import knn_search
    from vector_db_at_home_spark.session import get_spark

    spark = get_spark(
        "scale-smoke-1m", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "scale_smoke_1m", "n_rows": n_rows}

    # ---- MinHash LSH at n_rows docs, 5000 planted one-word-sub near-dups
    import tempfile

    n_dups = 5_000
    # file-backed (see tools/scale_smoke.py): a cached source defeats
    # exchange reuse inside minhash_lsh_pairs and triples the shingle work
    path = tempfile.mkdtemp(prefix="smoke1m_docs_") + "/docs"
    synthetic_docs(spark, n_rows, n_dups).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    s0 = shuffle_totals(spark)
    t0 = time.time()
    res = minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=0.5,
        max_doc_freq=200, max_band_bucket=500,
    )
    pairs = res.collect()
    out["minhash_wall_sec"] = round(time.time() - t0, 1)
    s1 = shuffle_totals(spark)
    got = {(r.id_a, r.id_b) for r in pairs}
    planted = {(i, n_rows + i) for i in range(n_dups)}
    out["minhash_pairs"] = len(pairs)
    out["minhash_recall"] = round(len(got & planted) / len(planted), 4)
    out["minhash_shuffle_write_mb"] = round((s1["write"] - s0["write"]) / 2**20, 1)
    out["minhash_shuffle_read_mb"] = round((s1["read"] - s0["read"]) / 2**20, 1)
    print(f"# minhash_1m: {out['minhash_wall_sec']}s "
          f"recall={out['minhash_recall']} "
          f"shuffleW={out['minhash_shuffle_write_mb']}MB", file=sys.stderr)

    # ---- IVF at n_rows vectors (64-dim, 2000 natural clusters),
    # sampled fit, probe search
    vecs = clustered_vectors(spark, n_rows, 64, 2000).cache()
    vecs.count()
    qs = (
        vecs.orderBy("vec_id").limit(32)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qvec"))
    )
    t0 = time.time()
    exact = knn_search(vecs, qs, k=10, id_col="vec_id",
                       vec_col="embedding", impl="pandas").collect()
    out["knn_exact_wall_sec"] = round(time.time() - t0, 1)
    s0 = shuffle_totals(spark)
    t0 = time.time()
    ivf = ivf_build(vecs, id_col="vec_id", vec_col="embedding",
                    n_cells=256, fit_sample_rows=50_000)
    out["ivf_build_wall_sec"] = round(time.time() - t0, 1)
    ivf.assigned.cache().count()
    t0 = time.time()
    approx = ivf_search(ivf, qs, k=10, n_probes=16).collect()
    out["ivf_search_wall_sec"] = round(time.time() - t0, 1)
    s1 = shuffle_totals(spark)
    eset = {(r.query_id, r.id) for r in exact}
    aset = {(r.query_id, r.id) for r in approx}
    out["ivf_recall_at_10_probe16"] = round(
        len(aset & eset) / max(len(eset), 1), 4
    )
    out["ivf_shuffle_write_mb"] = round((s1["write"] - s0["write"]) / 2**20, 1)
    out["ivf_shuffle_read_mb"] = round((s1["read"] - s0["read"]) / 2**20, 1)
    out["ivf_probed_fraction"] = round(16 / 256, 4)
    print(f"# ivf_1m: build {out['ivf_build_wall_sec']}s search "
          f"{out['ivf_search_wall_sec']}s "
          f"recall={out['ivf_recall_at_10_probe16']}", file=sys.stderr)
    ivf.assigned.unpersist()
    vecs.unpersist()

    # ---- connected components at ~1M edges (planted blobs + chains)
    cc_section(spark, out)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
