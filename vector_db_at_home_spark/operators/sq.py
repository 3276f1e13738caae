"""IVF-SQ8 — IVF partition pruning over scalar-quantized (int8) vectors.

The middle tier of the standard ANN storage ladder (faiss's
``IndexIVFScalarQuantizer`` shape — public knowledge): cheaper than full
floats (4× IO reduction for float32 corpora), cheaper to decode than PQ (no
codebooks, no per-query LUTs — the dequantized distance is a pure column
expression inside whole-stage codegen), with near-exact recall because the
per-element quantization error is bounded by ``scale/2 = max|x|/254`` per
vector (``operators.embeddings.quantize_int8``).

Composition, exactly as ``pq.ivfpq_search`` composed IVF with PQ:

- ``ivfsq_build``   — IVF centroids/assignment (``ann.ivf_build``) + int8
                      codes for every assigned vector;
- ``ivfsq_search``  — probe ``n_probes`` cells, rank candidates by L2 over
                      the DEQUANTIZED codes (codegen expression, no Python),
                      optional exact float re-rank of a ``refine_factor·k``
                      short list;
- ``ivfsq_append``  — O(batch) ingest: assign to EXISTING centroids, encode
                      with the batch's own per-vector scales (scalar
                      quantization has no fitted state, so — unlike PQ
                      codebooks or KMeans centroids — appends never drift);
- ``ivfsq_save`` / ``ivfsq_load`` — codes partitioned by ``cell`` for
                      partition-pruned probes, like ``ann.ivf_save``;
- ``ivfsq_sync_with_store`` — the same store→index incremental-sync loop as
                      the IVF / PQ / MinHash families.

Scale shape: the probe is a broadcast kNN over the tiny centroid table; the
scan reads ``(id, cell, scale, codes)`` rows of probed cells only (parquet
partition pruning on ``cell``); distance is dequantize-on-the-fly inside
codegen, so the 4×-smaller scan is also allocation-free.  No stage collects
vectors to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.distance import l2_distance
from .ann import IVFIndex, ivf_append, ivf_build
from .knn import knn_search
from .topk import top_k_per_group


@dataclass
class SQIndex:
    """int8 codes + per-vector scales, cell-assigned for IVF pruning."""

    codes: DataFrame               # (id, cell, scale, codes array<int>)
    centroids: DataFrame           # (cell, cvec)
    n_cells: int


def _encode_sq(assigned: DataFrame) -> DataFrame:
    """(id, cell, scale, codes) from an IVF assignment frame — the
    ``quantize_int8`` kernel inlined so the cell column rides along.
    Pure column expressions; symmetric per-vector quantization
    (scale = max|x|/127, code = round-half-up(x/scale) ∈ [-127, 127])."""
    v = F.transform(F.col("vec"), lambda x: x.cast("double"))
    amax = F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    scale = amax / F.lit(127.0)
    codes = (
        F.when(scale == 0.0, F.transform(v, lambda x: F.lit(0)))
        .otherwise(
            F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5))
                        .cast("int"))
        )
    )
    return assigned.select(
        "id", "cell", scale.alias("scale"), codes.alias("codes")
    )


def ivfsq_build(index: DataFrame, id_col: str = "id", vec_col: str = "vec",
                n_cells: int = 16, seed: int = 42,
                max_iter: int = 20,
                fit_sample_rows: int = 100_000) -> SQIndex:
    """IVF (sampled KMeans fit, ``ann.ivf_build``) + int8 encode of every
    assigned vector.  The quantizer itself has NO fitted state — only the
    centroids are learned, so the sampled-fit bound applies to KMeans
    alone and encode is a single expression pass."""
    ivf = ivf_build(index, id_col=id_col, vec_col=vec_col, n_cells=n_cells,
                    seed=seed, max_iter=max_iter,
                    fit_sample_rows=fit_sample_rows)
    return SQIndex(
        codes=_encode_sq(ivf.assigned),
        centroids=ivf.centroids,
        n_cells=ivf.n_cells,
    )


def ivfsq_search(sq: SQIndex, queries: DataFrame, k: int,
                 n_probes: int = 4,
                 query_id_col: str = "query_id",
                 query_vec_col: str = "qvec",
                 refine_with: DataFrame | None = None,
                 refine_factor: int = 4,
                 id_col: str = "id", vec_col: str = "vec") -> DataFrame:
    """Probe the ``n_probes`` nearest cells, rank by L2 over dequantized
    codes (``code_i · scale`` — a codegen expression, no Python, no LUT),
    optionally re-rank a ``refine_factor·k`` short list exactly against
    ``refine_with`` float vectors.

    Per-query scan cost is ``(N/n_cells)·n_probes`` rows of ``d`` bytes
    (int8) instead of ``4d``/``8d`` (float) — the 4× IO lever — while the
    approximate distance stays within ``‖scale/2‖·√d`` of exact, which is
    what keeps recall near 1 without PQ's re-rank dependence."""
    probe = knn_search(
        sq.centroids, queries, k=min(n_probes, sq.n_cells),
        id_col="cell", vec_col="cvec",
        query_id_col=query_id_col, query_vec_col=query_vec_col,
        impl="expr",
    ).select(F.col("query_id"), F.col("id").alias("cell"))

    qvecs = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qvec"),
    )
    deq = F.transform(
        F.col("codes"), lambda c: c.cast("double") * F.col("scale")
    )
    scored = (
        sq.codes.join(F.broadcast(probe), "cell")
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id", "id",
            l2_distance(deq, F.col("qvec")).alias("distance"),
        )
    )
    kk = k * refine_factor if refine_with is not None else k
    approx = top_k_per_group(
        scored, ["query_id"], [F.col("distance").asc(), F.col("id").asc()], kk
    )
    if refine_with is None:
        return approx.orderBy("query_id", "distance", "id")

    vecs = refine_with.select(F.col(id_col).alias("id"),
                              F.col(vec_col).alias("tv"))
    exact = (
        approx.select("query_id", "id")
        .join(vecs, "id")
        .join(F.broadcast(qvecs), "query_id")
        .select("query_id", "id",
                l2_distance("tv", "qvec").alias("distance"))
    )
    return top_k_per_group(
        exact, ["query_id"], [F.col("distance").asc(), F.col("id").asc()], k
    ).orderBy("query_id", "distance", "id")


def ivfsq_append(sq: SQIndex, new_rows: DataFrame,
                 id_col: str = "id", vec_col: str = "vec") -> SQIndex:
    """O(batch) ingest: assign the new batch to EXISTING centroids
    (broadcast nearest-centroid — the ``ann.ivf_append`` kernel) and int8-
    encode it.  Scalar quantization is per-vector (no fitted codebooks),
    so appended codes are exactly what a full rebuild would produce —
    the one index family here whose append path has zero drift."""
    spark = new_rows.sparkSession
    empty_assigned = spark.createDataFrame(
        [], "id long, vec array<double>, cell int"
    )
    tmp = IVFIndex(assigned=empty_assigned, centroids=sq.centroids,
                   n_cells=sq.n_cells)
    assigned_new = ivf_append(tmp, new_rows, id_col=id_col,
                              vec_col=vec_col).assigned
    return SQIndex(
        codes=sq.codes.unionByName(_encode_sq(assigned_new)),
        centroids=sq.centroids,
        n_cells=sq.n_cells,
    )


def ivfsq_save(sq: SQIndex, path: str) -> None:
    """Codes partitioned by ``cell`` (probe-time parquet partition
    pruning) + the tiny centroid table — the ``ann.ivf_save`` layout."""
    sq.codes.write.partitionBy("cell").mode("overwrite").parquet(
        f"{path}/codes"
    )
    sq.centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def _tombstones_dir(path: str) -> str:
    return f"{path}/tombstones"


def ivfsq_load(spark, path: str) -> SQIndex:
    """Load a saved index as its LIVE view: if a tombstone table exists
    (ids whose store rows were deleted — see ``ivfsq_sync_deletes``),
    the code scan anti-joins it, so every consumer (search, append,
    sync) transparently stops seeing deleted vectors.  The tombstone
    set is bounded by the compaction cadence (``maintenance.
    ivfsq_compact_saved`` folds it into the rewrite and clears it).
    Self-heals a compaction crash window first, like ``ann.ivf_load``
    (ADVICE r6)."""
    from ..functions.fsutil import fs_exists
    from .maintenance import recover_compact_crash

    recover_compact_crash(spark, f"{path}/codes")
    centroids = spark.read.parquet(f"{path}/centroids")
    codes = spark.read.parquet(f"{path}/codes")
    tomb = _tombstones_dir(path)
    if fs_exists(spark, tomb):
        codes = codes.join(
            spark.read.parquet(tomb).select("id"), "id", "left_anti"
        )
    return SQIndex(
        codes=codes,
        centroids=centroids,
        n_cells=centroids.count(),
    )


def ivfsq_sync_with_store(spark, store, path: str,
                          id_col: str = "id",
                          vec_col: str = "vec") -> int:
    """Incrementally sync a SAVED IVF-SQ8 index with a growing
    :class:`~vector_db_at_home_spark.store.VectorStore` — the same loop as
    ``ann.ivf_sync_with_store`` / ``pq.pq_sync_with_store``: store rows
    missing from the codes table are centroid-assigned and int8-encoded
    (O(batch)), their code rows appended to the cell-partitioned parquet.
    Idempotent via the id anti-join; returns rows added."""
    sq = ivfsq_load(spark, path)
    have = sq.codes.select("id")
    new_rows = (
        store.df()
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .join(have, "id", "left_anti")
    )
    if new_rows.isEmpty():
        return 0
    empty = SQIndex(codes=sq.codes.filter(F.lit(False)),
                    centroids=sq.centroids, n_cells=sq.n_cells)
    fresh = ivfsq_append(empty, new_rows, id_col="id", vec_col="vec").codes
    fresh = fresh.localCheckpoint(eager=True)  # count + write, one compute
    n = fresh.count()
    fresh.write.partitionBy("cell").mode("append").parquet(f"{path}/codes")
    return n


def ivfsq_sync_deletes(spark, store, path: str,
                       id_col: str = "id") -> int:
    """Propagate store DELETES to a saved IVF-SQ8 index: live index ids
    absent from the store append to an id-only tombstone table —
    O(|index ids| ⋈ |store ids|) on long keys, never a code rewrite.
    ``ivfsq_load`` applies tombstones at the scan, so stale hits stop
    immediately; ``maintenance.ivfsq_compact_saved`` later removes the
    rows physically and clears the tombstones.  Idempotent (the live
    view already excludes prior tombstones, so a re-run appends
    nothing); returns ids tombstoned.  Safe under the engine's id
    discipline (``insert`` allocates max+1 — deleted ids never
    return)."""
    sq = ivfsq_load(spark, path)
    gone = sq.codes.select("id").join(
        store.df().select(F.col(id_col).alias("id")), "id", "left_anti"
    )
    gone = gone.localCheckpoint(eager=True)
    n = gone.count()
    if n:
        gone.write.mode("append").parquet(_tombstones_dir(path))
    return n
