"""Product quantization (PQ) for vector search at 100 TB scale.

Exact kNN (``operators.knn``) scans full float vectors: N·d·4 bytes of I/O
per query batch.  PQ (Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011 — public knowledge) compresses each
vector to ``m`` bytes: split d dims into m subspaces, k-means each subspace
into 256 centroids, store the centroid index per subspace.  A 64-dim float32
vector (256 B) becomes 8 B — 32× less scan I/O, which is what makes a
billion-vector index scannable at all.

Search uses asymmetric distance computation (ADC): per query, precompute an
``m × 256`` lookup table of squared distances from the query's subvectors to
every centroid; a vector's approximate distance is then m table lookups and
adds — no float vector is ever touched during the scan.  An optional exact
re-rank refines the top ``k·refine`` ADC candidates with true distances
(late materialization: the float vectors are joined back only for the
candidate set).

Spark mapping:

- **fit** — codebooks train on a driver-side SAMPLE (bounded by
  ``fit_sample_rows`` via the deterministic ``hash_sample``; seeded NumPy
  Lloyd iterations).  Sample-to-driver is the standard PQ recipe (faiss
  does the same) and is O(sample), never O(N).
- **encode** — one ``mapInPandas`` pass with broadcast codebooks; vectorized
  argmin per subspace; codes stored as a ``binary`` column (m bytes/row).
- **search** — broadcast the per-query LUTs; each partition gathers+sums
  LUT entries for its codes (NumPy fancy-indexing, no Python loop per row)
  and emits its local top-k; global top-k merges.  Shuffle is O(P·q·k).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: queries are the broadcast side (LUTs of 2 KB/query ship to every task);
#: past this, batch the query set
_MAX_QUERY_ROWS = 65_536


@dataclass
class PQIndex:
    codes: DataFrame          # (id, code binary[m])
    codebooks: object         # np.ndarray (m, 256, dsub) float64
    m: int
    dim: int


def _lloyd(data, k: int, iters: int, seed: int):
    """Seeded NumPy k-means (Lloyd); deterministic, kmeans++-free (random
    distinct init is fine for 256-way subspace codebooks)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n = data.shape[0]
    k = min(k, n)
    centers = data[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        # (n, k) squared distances via ||x||² − 2x·c + ||c||²
        d2 = (
            (data * data).sum(1)[:, None]
            - 2.0 * data @ centers.T
            + (centers * centers).sum(1)[None, :]
        )
        assign = d2.argmin(1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                centers[j] = data[mask].mean(0)
    return centers


def pq_build(index: DataFrame, id_col: str = "id", vec_col: str = "vec",
             m: int = 8, seed: int = 42, fit_sample_rows: int = 20_000,
             kmeans_iters: int = 12) -> PQIndex:
    """Train per-subspace codebooks on a bounded sample, then encode every
    vector to ``m`` bytes in one distributed pass.  ``dim % m`` must be 0.

    For COSINE quantization, pass ``embeddings.l2_normalize``'d vectors
    (and normalized queries to ``pq_search``) — on the unit sphere L2
    order ≡ cosine order, the same recipe ``ann_ivf_cosine_recall`` pins
    for IVF.
    """
    import numpy as np

    from .sampling import hash_sample

    first = index.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("cannot build a PQ index over an empty table")
    dim = int(first.d)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m

    sample = hash_sample(
        index.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        "id", fit_sample_rows, salt="pq_fit",
    ).collect()
    mat = np.asarray([r.v for r in sample], dtype=np.float64)
    books = np.zeros((m, 256, dsub), dtype=np.float64)
    for j in range(m):
        sub = mat[:, j * dsub:(j + 1) * dsub]
        cb = _lloyd(sub, 256, kmeans_iters, seed + j)
        books[j, :cb.shape[0]] = cb
        if cb.shape[0] < 256:  # tiny tables: repeat last centroid
            books[j, cb.shape[0]:] = cb[-1]

    narrow = index.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    codes = _encode_codes(narrow, books, m, dsub)
    return PQIndex(codes=codes, codebooks=books, m=m, dim=dim)


def _encode_codes(narrow: DataFrame, books, m: int, dsub: int) -> DataFrame:
    """Distributed nearest-centroid byte encoding of ``(id, v)`` rows
    against broadcast codebooks — shared by build and append."""
    import numpy as np

    bc = narrow.sparkSession.sparkContext.broadcast(books)

    def encode(batches):
        books_l = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            codes = np.zeros((len(pdf), m), dtype=np.uint8)
            for j in range(m):
                sub = vecs[:, j * dsub:(j + 1) * dsub]
                cb = books_l[j]
                d2 = (
                    (sub * sub).sum(1)[:, None]
                    - 2.0 * sub @ cb.T
                    + (cb * cb).sum(1)[None, :]
                )
                codes[:, j] = d2.argmin(1)
            yield pd.DataFrame({
                "id": pdf["id"],
                "code": [c.tobytes() for c in codes],
            })

    return narrow.mapInPandas(encode, schema="id long, code binary")


def pq_append(pq: PQIndex, new_rows: DataFrame, id_col: str = "id",
              vec_col: str = "vec") -> PQIndex:
    """Encode a NEW batch with the EXISTING codebooks and union the code
    tables — the PQ analog of ``ann.ivf_append``: no refit, no corpus
    rescan; codebook drift under a shifting distribution is a quantization
    -quality concern only (rebuild with ``pq_build`` on the compaction
    cadence).  With this, every index family in the repo (MinHash state,
    IVF, PQ) supports O(batch) ingest."""
    dsub = pq.dim // pq.m
    narrow = new_rows.select(F.col(id_col).alias("id"),
                             F.col(vec_col).alias("v"))
    new_codes = _encode_codes(narrow, pq.codebooks, pq.m, dsub)
    return PQIndex(codes=pq.codes.unionByName(new_codes),
                   codebooks=pq.codebooks, m=pq.m, dim=pq.dim)


def pq_save(pq: PQIndex, path: str) -> None:
    """Persist the index: the m-byte codes table plus the codebooks
    flattened to one parquet row per (subspace, centroid)."""
    import numpy as np

    pq.codes.write.mode("overwrite").parquet(f"{path}/codes")
    spark = pq.codes.sparkSession
    rows = [
        (j, c, [float(x) for x in pq.codebooks[j, c]])
        for j in range(pq.m) for c in range(256)
    ]
    spark.createDataFrame(
        rows, "subspace int, centroid int, center array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def pq_load(spark, path: str) -> PQIndex:
    import numpy as np

    # self-heal a compaction crash window before the code scan (ADVICE r6)
    from .maintenance import recover_compact_crash

    recover_compact_crash(spark, f"{path}/codes")
    cb_rows = spark.read.parquet(f"{path}/codebooks").collect()
    m = max(r.subspace for r in cb_rows) + 1
    dsub = len(cb_rows[0].center)
    books = np.zeros((m, 256, dsub), dtype=np.float64)
    for r in cb_rows:
        books[r.subspace, r.centroid] = r.center
    from ..functions.fsutil import fs_exists

    codes = spark.read.parquet(f"{path}/codes")
    tomb = f"{path}/tombstones"
    if fs_exists(spark, tomb):
        codes = codes.join(
            spark.read.parquet(tomb).select("id"), "id", "left_anti"
        )
    return PQIndex(
        codes=codes,
        codebooks=books,
        m=m,
        dim=m * dsub,
    )


def pq_sync_deletes(spark, store, path: str, id_col: str = "id") -> int:
    """Propagate store DELETES as tombstones (id-only append; the scan
    filters, ``maintenance.pq_compact_saved`` removes physically).
    Same contract as ``sq.ivfsq_sync_deletes``."""
    pq = pq_load(spark, path)
    gone = pq.codes.select("id").join(
        store.df().select(F.col(id_col).alias("id")), "id", "left_anti"
    )
    gone = gone.localCheckpoint(eager=True)
    n = gone.count()
    if n:
        gone.write.mode("append").parquet(f"{path}/tombstones")
    return n


def pq_search(pq: PQIndex, queries: DataFrame, k: int,
              query_id_col: str = "query_id", query_vec_col: str = "qvec",
              refine_with: DataFrame | None = None,
              refine_factor: int = 4,
              id_col: str = "id", vec_col: str = "vec") -> DataFrame:
    """ADC top-k per query: ``(query_id, id, distance)`` with approximate
    (quantized) L2 distances — or exact distances over the re-ranked
    ``k·refine_factor`` ADC candidates when ``refine_with`` (the original
    ``(id, vec)`` table) is given."""
    import numpy as np

    spark = pq.codes.sparkSession
    m, dim = pq.m, pq.dim
    dsub = dim // m
    q_rows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    ).limit(_MAX_QUERY_ROWS + 1).collect()
    if len(q_rows) > _MAX_QUERY_ROWS:
        raise ValueError(
            f"query batch exceeds {_MAX_QUERY_ROWS} rows — per-query LUTs "
            "broadcast to every task; batch the queries instead"
        )
    if not q_rows:
        raise ValueError("empty query set")
    qids = np.asarray([r.query_id for r in q_rows], dtype=np.int64)
    qmat = np.asarray([r.qv for r in q_rows], dtype=np.float64)
    # per-query LUT: (nq, m, 256) squared subdistances
    luts = np.zeros((len(qids), m, 256), dtype=np.float64)
    for j in range(m):
        sub = qmat[:, j * dsub:(j + 1) * dsub]          # (nq, dsub)
        cb = pq.codebooks[j]                             # (256, dsub)
        luts[:, j, :] = (
            (sub * sub).sum(1)[:, None]
            - 2.0 * sub @ cb.T
            + (cb * cb).sum(1)[None, :]
        )
    kk = k * refine_factor if refine_with is not None else k
    bc = spark.sparkContext.broadcast((qids, luts, kk))

    def scan(batches):
        b_qids, b_luts, b_k = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf["code"]), dtype=np.uint8
            ).reshape(len(pdf), m)
            ids = pdf["id"].to_numpy(np.int64)
            # (nq, n): sum over subspaces of LUT gathers
            dists = np.zeros((len(b_qids), len(ids)), dtype=np.float64)
            for j in range(m):
                dists += b_luts[:, j, codes[:, j]]
            nk = min(b_k, len(ids))
            frames = []
            for qi in range(len(b_qids)):
                row = dists[qi]
                part = (np.argpartition(row, nk - 1)[:nk]
                        if nk < len(ids) else np.arange(len(ids)))
                order = part[np.lexsort((ids[part], row[part]))][:nk]
                frames.append(pd.DataFrame({
                    "query_id": np.full(len(order), b_qids[qi]),
                    "id": ids[order],
                    "distance": np.sqrt(np.maximum(row[order], 0.0)),
                }))
            yield pd.concat(frames, ignore_index=True)

    cand = pq.codes.mapInPandas(
        scan, schema="query_id long, id long, distance double"
    )
    from .topk import top_k_per_group

    approx = top_k_per_group(
        cand, ["query_id"], [F.col("distance").asc(), F.col("id").asc()], kk
    )
    if refine_with is None:
        return approx.orderBy("query_id", "distance", "id")

    # exact re-rank: join true vectors for the candidate set only
    from ..functions.distance import l2_distance

    qdf = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    )
    vecs = refine_with.select(F.col(id_col).alias("id"),
                              F.col(vec_col).alias("tv"))
    exact = (
        approx.select("query_id", "id")
        .join(vecs, "id")
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", "id", l2_distance("tv", "qv").alias("distance"))
    )
    return top_k_per_group(
        exact, ["query_id"], [F.col("distance").asc(), F.col("id").asc()], k
    ).orderBy("query_id", "distance", "id")


def ivfpq_search(ivf, pq: PQIndex, queries: DataFrame, k: int,
                 n_probes: int = 4,
                 query_id_col: str = "query_id",
                 query_vec_col: str = "qvec",
                 refine_with: DataFrame | None = None,
                 refine_factor: int = 4,
                 id_col: str = "id", vec_col: str = "vec") -> DataFrame:
    """IVF-PQ — the billion-scale composition (faiss's IndexIVFPQ shape,
    public knowledge): IVF probing prunes the scan to ``n_probes`` cells,
    PQ codes make the pruned scan m bytes/row, ADC ranks candidates, and
    an optional exact re-rank restores precision on the short list.

    ``ivf`` is an ``operators.ann.IVFIndex`` (its ``assigned`` frame may be
    a reloaded cell-partitioned store — the probe semi-join then prunes
    parquet partitions); ``pq`` is a ``PQIndex`` over the same ids.  The
    scan cost per query is ``(N/n_cells)·n_probes·m`` byte lookups instead
    of ``N·d`` float mults — both pruning levers compose multiplicatively.
    """
    from .ann import ivf_search as _  # noqa: F401 (doc cross-ref)
    from .knn import knn_search

    probe = knn_search(
        ivf.centroids, queries, k=min(n_probes, ivf.n_cells),
        id_col="cell", vec_col="cvec",
        query_id_col=query_id_col, query_vec_col=query_vec_col,
        impl="expr",
    ).select(F.col("query_id"), F.col("id").alias("cell"))

    # candidate ids: rows of probed cells (partition-pruned when the store
    # is partitioned by cell), then their m-byte codes
    cand_codes = (
        ivf.assigned.select("id", "cell")
        .join(F.broadcast(probe), "cell")
        .join(pq.codes, "id")
        .select("query_id", "id", "code")
    )

    import numpy as np

    m, dim = pq.m, pq.dim
    dsub = dim // m
    q_rows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    ).limit(_MAX_QUERY_ROWS + 1).collect()
    if len(q_rows) > _MAX_QUERY_ROWS:
        raise ValueError(
            f"query batch exceeds {_MAX_QUERY_ROWS} rows — per-query LUTs "
            "broadcast to every task; batch the queries instead"
        )
    if not q_rows:
        raise ValueError("empty query set")
    qmat = np.asarray([r.qv for r in q_rows], dtype=np.float64)
    qpos = {int(r.query_id): i for i, r in enumerate(q_rows)}
    luts = np.zeros((len(q_rows), m, 256), dtype=np.float64)
    for j in range(m):
        sub = qmat[:, j * dsub:(j + 1) * dsub]
        cb = pq.codebooks[j]
        luts[:, j, :] = (
            (sub * sub).sum(1)[:, None]
            - 2.0 * sub @ cb.T
            + (cb * cb).sum(1)[None, :]
        )
    spark = pq.codes.sparkSession
    bc = spark.sparkContext.broadcast((qpos, luts))

    def adc(batches):
        b_qpos, b_luts = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf["code"]), dtype=np.uint8
            ).reshape(len(pdf), m)
            qidx = pdf["query_id"].map(b_qpos).to_numpy(np.int64)
            d = np.zeros(len(pdf), dtype=np.float64)
            for j in range(m):
                d += b_luts[qidx, j, codes[:, j]]
            yield pd.DataFrame({
                "query_id": pdf["query_id"],
                "id": pdf["id"],
                "distance": np.sqrt(np.maximum(d, 0.0)),
            })

    scored = cand_codes.mapInPandas(
        adc, schema="query_id long, id long, distance double"
    )
    from .topk import top_k_per_group

    kk = k * refine_factor if refine_with is not None else k
    approx = top_k_per_group(
        scored, ["query_id"], [F.col("distance").asc(), F.col("id").asc()], kk
    )
    if refine_with is None:
        return approx.orderBy("query_id", "distance", "id")

    from ..functions.distance import l2_distance

    qdf = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    )
    vecs = refine_with.select(F.col(id_col).alias("id"),
                              F.col(vec_col).alias("tv"))
    exact = (
        approx.select("query_id", "id")
        .join(vecs, "id")
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", "id", l2_distance("tv", "qv").alias("distance"))
    )
    return top_k_per_group(
        exact, ["query_id"], [F.col("distance").asc(), F.col("id").asc()], k
    ).orderBy("query_id", "distance", "id")


def ivfpq_append(ivf, pq: PQIndex, new_rows: DataFrame,
                 id_col: str = "id", vec_col: str = "vec"):
    """O(batch) ingest for the IVF-PQ composition: assign the new batch to
    the EXISTING centroids (``ann.ivf_append``) and encode it with the
    EXISTING codebooks (``pq_append``), returning the updated
    ``(IVFIndex, PQIndex)`` pair over a consistent id set — neither the
    corpus assignments nor the code table are rescanned, so the daily
    ingest of a billion-scale IVF-PQ index costs O(batch) like each
    component does alone.  Centroid/codebook drift is a recall concern
    only; rebuild on the compaction cadence."""
    from .ann import ivf_append

    return (
        ivf_append(ivf, new_rows, id_col=id_col, vec_col=vec_col),
        pq_append(pq, new_rows, id_col=id_col, vec_col=vec_col),
    )


def pq_sync_with_store(spark, store, path: str,
                       id_col: str = "id",
                       vec_col: str = "vec") -> int:
    """Incrementally sync a SAVED PQ index (``pq_save`` layout) with a
    growing :class:`~vector_db_at_home_spark.store.VectorStore` — the PQ
    analog of ``ann.ivf_sync_with_store``: store rows missing from the
    codes table are encoded with the EXISTING codebooks (the
    ``pq_append`` kernel) and their m-byte code rows appended.  Returns
    rows added; idempotent via the id anti-join; O(batch) — the corpus
    codes are never re-encoded.  Codebooks are not refit (rebuild with
    ``pq_build`` + ``pq_save`` on the compaction cadence).  With this,
    all three index families (MinHash corpus state, IVF, PQ) support the
    same loop: stream → store append → incremental index sync."""
    pq = pq_load(spark, path)
    have = pq.codes.select("id")
    new_rows = (
        store.df()
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .join(have, "id", "left_anti")
    )
    if new_rows.isEmpty():
        return 0
    dsub = pq.dim // pq.m
    fresh = _encode_codes(
        new_rows.select("id", F.col("vec").alias("v")),
        pq.codebooks, pq.m, dsub,
    )
    fresh = fresh.localCheckpoint(eager=True)  # count + write, one compute
    n = fresh.count()
    fresh.write.mode("append").parquet(f"{path}/codes")
    return n
