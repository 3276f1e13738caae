"""Distributed k-NN graph construction via NN-descent (Dong, Charikar &
Li, WWW 2011 — public): the standard offline builder for graph-ANN
indexes (HNSW layers, NSG, DiskANN all start from a k-NN graph).

The insight is that a neighbor of a neighbor is likely a neighbor:
start from a cheap approximate neighborhood, then repeatedly score each
node against its neighbors' neighbors and keep the best k.  Each round
is PURE keyed joins + one per-node top-k — no driver-side graph, no
global structure, which is what makes the algorithm the canonical
Spark/MapReduce choice where HNSW's sequential insert loop is not.

Spark shapes per round:

- undirected view: ``E ∪ reverse(E)`` (the reverse edges are what let a
  node with few out-links be rediscovered through its in-links);
- candidate generation: one self-equi-join of that view on the shared
  endpoint — |candidates| ≈ Σ_v deg(v)² ≈ n·(2k)² rows of three longs;
- scoring: two vector joins + a codegen'd ``zip_with``/``aggregate``
  squared-L2 (JVM-side, no Python);
- selection: per-src ``row_number`` over ``(d2, dst)`` — map-side
  WindowGroupLimit keeps the shuffle at ≤ k rows per node per task;
- ``localCheckpoint`` per round caps lineage (the iterative-Spark rule,
  same as ``graph.connected_components``).

Scale levers (documented, not silently applied): the classical ρ-sample
of each neighborhood bounds the join quadratically (ρ²), and the
init-bucket width trades first-round quality for fan-out.  At 100 TB
the candidate join is the cost — it shuffles fixed-width id triples,
never vectors; vectors join in only for the per-round scoring pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _md5_h60


def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def _topk_edges(pairs: DataFrame, v: DataFrame, k: int) -> DataFrame:
    """Score candidate (src, dst) pairs and keep each src's k nearest
    (ties broken on dst — fully deterministic)."""
    scored = (
        pairs
        .join(v.select(F.col("id").alias("src"),
                       F.col("vec").alias("va")), "src")
        .join(v.select(F.col("id").alias("dst"),
                       F.col("vec").alias("vb")), "dst")
        .select("src", "dst",
                _sq_dist(F.col("va"), F.col("vb")).alias("d2"))
    )
    w = Window.partitionBy("src").orderBy(F.col("d2").asc(),
                                          F.col("dst").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def knn_graph_nndescent(vecs: DataFrame, id_col: str = "id",
                        vec_col: str = "vec", k: int = 10,
                        rounds: int | None = None,
                        init_bucket_size: int | None = None,
                        rho: float | None = None) -> DataFrame:
    """Build the approximate k-NN graph ``(src, dst, d2)`` of ``vecs``.

    Init seeds each node's neighborhood from TWO independent md5 bucket
    families of ~``init_bucket_size`` nodes each (two families make a
    doubly-isolated node vanishingly rare; any single incident edge
    re-integrates a node through the reverse-edge view).  ``rounds``
    fixed iterations of the neighbor-of-neighbor refinement follow.

    ``rho`` is NN-descent's classical sampling lever: each round only a
    deterministic md5-selected ``rho`` fraction of the undirected edge
    view enters the neighbor-of-neighbor join, bounding the candidate
    blow-up QUADRATICALLY (ρ² of the full join) at a graceful recall
    cost — the knob that keeps the per-round cost affordable when
    n·(2k)² stops being.  ``None`` = exact (no sampling).

    Deterministic end to end given the input (md5 buckets, md5 edge
    sampling, fixed rounds, (d2, dst) tie-breaks), but the RESULT is
    approximate — the registered correctness entry therefore follows
    the IVF pattern: DuckDB value-hashes the exact leg while
    convergence enters as an in-plan recall boolean."""
    v = vecs.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    n = v.count()
    bsz = init_bucket_size or max(2 * k, 16)
    n_buckets = max(n // bsz, 1)
    if rounds is None:
        # information propagates one hop per round; the bucket graph's
        # effective diameter grows ~log with the bucket count
        import math

        rounds = max(4, math.ceil(math.log2(max(n_buckets, 2))))

    def bucket_pairs(salt: str) -> DataFrame:
        bk = (_md5_h60(F.concat(F.lit(salt), F.col("id").cast("string")))
              % n_buckets).alias("bk")
        b = v.select("id", bk)
        return (
            b.alias("a").join(b.alias("b"), "bk")
            .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )

    init = bucket_pairs("i0:").union(bucket_pairs("i1:")).distinct()
    nbrs = _topk_edges(init, v, k).localCheckpoint(eager=True)
    for rnd in range(rounds):
        und = (
            nbrs.select("src", "dst")
            .union(nbrs.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
            .distinct()
        )
        if rho is not None:
            # deterministic per-round edge sample: md5 of (round, src,
            # dst) — the SAME edge keeps/loses independently each round,
            # so over R rounds every pair route gets sampled somewhere
            keep = (
                _md5_h60(F.concat_ws(":", F.lit(str(rnd)),
                                     F.col("src").cast("string"),
                                     F.col("dst").cast("string")))
                % 1_000_000 < int(rho * 1_000_000)
            )
            und = und.filter(keep)
        non = (
            und.alias("x")
            .join(und.alias("y"), F.col("x.dst") == F.col("y.src"))
            .select(F.col("x.src").alias("src"),
                    F.col("y.dst").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        cand = non.union(nbrs.select("src", "dst")).distinct()
        nbrs = _topk_edges(cand, v, k).localCheckpoint(eager=True)
    return nbrs
