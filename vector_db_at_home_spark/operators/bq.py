"""Binary quantization (BQ) — the 1-bit tier of the ANN storage ladder.

Completes the index family ladder below IVF-SQ8 (``sq.py``) and PQ
(``pq.py``): each vector compresses to ONE BIT per dimension (sign bit),
64 bits for the 64-d test embeddings — a 32× reduction over float32 and
8× over int8 — and candidate generation ranks by Hamming distance over
the packed words, which is pure integer arithmetic (``bit_count(xor)``)
inside whole-stage codegen.  The public recipe (faiss ``IndexBinaryFlat``
re-rank pipelines, and the binary-quantization tier in several vector
DBs): Hamming top-``C`` prefilter, exact float re-rank of the short list.

Why sign bits work here: for zero-centered embeddings, Hamming distance
between sign patterns is a monotone estimate of angular distance
(Goemans–Williamson / sign-LSH argument — the same identity behind
``dedup.cosine_neardup_lsh``'s hyperplane buckets, but with the data's
own axes as the 64 hyperplanes).

Everything in the candidate stage is INTEGER-exact — packing, xor,
popcount, the (hamming, id) rank — so the whole search path (prefilter
AND the exact L2 re-rank, which reuses the bit-exact ``l2_distance``
fold from ``knn_l2``) is value-hashable against a DuckDB re-derivation
with zero float-reduction risk.

Scale shape: codes are 8–16 bytes/row — a 100 TB float corpus becomes a
~3 TB code table whose full scan is bandwidth-trivial; queries broadcast
(tiny), the single shuffle carries ``C`` candidate rows per query into
the re-rank, and the re-rank joins back to the float table on id
(point lookups over a bucketed/partitioned store at scale).

No counterpart in the reference (vector_store.py has exact search only);
SURVEY.md §2.2 extension territory, same family as ann.py/sq.py/pq.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.distance import l2_distance
from .topk import top_k_per_group

_WORD_BITS = 32  # 32-bit words inside BIGINTs: no sign-bit edge cases in
                 # either engine (1L << 63 wraps negative; 32 bits never do)


def _pack_words(vec_col: str) -> Column:
    """Sign-bit packing as one codegen expression: word ``w`` holds bits
    ``[32w, 32w+31]``, bit ``i`` set iff ``vec[i] > 0``.  Handles any
    dimension (per-row ``size``); fixed left-to-right integer fold, so
    both engines derive identical words."""
    return F.expr(
        f"transform(sequence(0, CAST(ceil(size({vec_col}) / {_WORD_BITS}) AS INT) - 1, 1), "
        f"  w -> aggregate(sequence(w * {_WORD_BITS}, "
        f"                          least(w * {_WORD_BITS} + {_WORD_BITS - 1}, size({vec_col}) - 1), 1), "
        f"       0L, (acc, i) -> acc + IF(element_at({vec_col}, i + 1) > 0, "
        f"                                shiftleft(1L, i - w * {_WORD_BITS}), 0L)))"
    )


def hamming_distance(a: Column | str, b: Column | str) -> Column:
    """Popcount of the word-wise xor of two packed-code arrays — integer
    arithmetic end to end, whole-stage codegen."""
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ac, bc, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def binary_encode(df: DataFrame, id_col: str = "id",
                  vec_col: str = "vec") -> DataFrame:
    """``(id, words array<bigint>)`` sign-bit codes for every vector —
    a single narrow projection (no shuffle, no Python)."""
    return df.select(
        F.col(id_col).alias("id"), _pack_words(vec_col).alias("words")
    )


def bq_topk(codes: DataFrame, query_codes: DataFrame, k: int) -> DataFrame:
    """Hamming top-``k`` of every query against the code table:
    broadcast the (tiny) query codes, rank ``(hamming ASC, id ASC)``.
    The scan side never shuffles; the single exchange carries the
    ``k``-per-query-per-task window-limited candidates."""
    joined = codes.crossJoin(
        F.broadcast(query_codes.select(
            F.col("query_id"), F.col("words").alias("qwords")))
    )
    scored = joined.select(
        "query_id", "id",
        hamming_distance("words", "qwords").alias("hamming"),
    )
    return top_k_per_group(
        scored, ["query_id"], [F.col("hamming").asc(), F.col("id").asc()], k
    )


def bq_search(index: DataFrame, queries: DataFrame, k: int,
              rerank_factor: int = 10,
              id_col: str = "id", vec_col: str = "vec",
              query_id_col: str = "query_id",
              query_vec_col: str = "qvec",
              codes: DataFrame | None = None) -> DataFrame:
    """Two-stage exact-top-``k``-candidate search: Hamming prefilter to
    ``rerank_factor·k`` candidates over the 1-bit codes, then an exact
    L2 re-rank of the short list against the float vectors (the same
    ``l2_distance`` fold as ``knn_search(impl='expr')``, so returned
    distances are bit-identical to exact kNN's for the ids it returns).

    Returns ``(query_id, id, hamming, distance)`` ranked
    ``(distance ASC, id ASC)`` per query.  Pass a pre-built ``codes``
    frame (``binary_encode`` output, e.g. loaded from ``bq_save``) to
    skip re-encoding the scan side."""
    if codes is None:
        codes = binary_encode(index, id_col=id_col, vec_col=vec_col)
    qcodes = queries.select(
        F.col(query_id_col).alias("query_id"),
        _pack_words(query_vec_col).alias("words"),
    )
    cand = bq_topk(codes, qcodes, k=max(k, k * rerank_factor))

    vecs = index.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v"))
    qvecs = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qv"),
    )
    exact = (
        cand.join(vecs, "id")
        .join(F.broadcast(qvecs), "query_id")
        .select("query_id", "id", "hamming",
                l2_distance("__v", "__qv").alias("distance"))
    )
    return top_k_per_group(
        exact, ["query_id"], [F.col("distance").asc(), F.col("id").asc()], k
    ).orderBy("query_id", "distance", "id")


# -- saved-index family parity (ann.ivf_save / sq.ivfsq_save shape) --------

def bq_save(codes: DataFrame, path: str) -> None:
    """Persist the code table.  No partitioning column: the whole point
    of the 1-bit tier is that the FULL code scan is cheap (8–16
    bytes/row), so the layout optimizes for sequential bandwidth."""
    codes.write.mode("overwrite").parquet(f"{path}/codes")


def bq_load(spark, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/codes")


def bq_sync_with_store(spark, store, path: str, id_col: str = "id",
                       vec_col: str = "vec") -> int:
    """Incremental store→index sync, the same O(batch) loop as
    ``ann.ivf_sync_with_store`` / ``sq.ivfsq_sync_with_store``: encode
    only store rows missing from the saved code table (id anti-join),
    append them.  Sign-bit encoding has no fitted state, so — like SQ,
    unlike IVF/PQ — the appended codes are exactly what a full rebuild
    would produce.  Idempotent; returns rows added."""
    codes = bq_load(spark, path)
    new_rows = (
        store.df()
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .join(codes.select("id"), "id", "left_anti")
    )
    if new_rows.isEmpty():
        return 0
    fresh = binary_encode(new_rows, id_col="id", vec_col="vec")
    fresh = fresh.localCheckpoint(eager=True)  # count + write, one compute
    n = fresh.count()
    fresh.write.mode("append").parquet(f"{path}/codes")
    return n
