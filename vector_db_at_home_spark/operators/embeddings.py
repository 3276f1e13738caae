"""Embedding-column utilities for training/similarity pipelines.

Pure DataFrame array expressions (codegen, no UDF), cross-engine
deterministic:

- ``l2_normalize``    — unit-norm vectors (the cosine-ready form);
- ``quantize_int8``   — per-vector symmetric int8 quantization
                        (scale = max|x| / 127, code = round(x / scale)):
                        4× storage reduction for float32 embeddings, the
                        standard cheap compression tier below PQ;
- ``dequantize_int8`` — the inverse (code · scale), max abs error ≤ s/2.

Determinism notes: the per-element arithmetic is IEEE-double identical in
Spark and DuckDB; the only fold (sum of squares / max of abs) is a
sequential left fold in both engines, so even float reductions agree
bit-for-bit — the same argument the kNN oracle rests on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec_col: str) -> Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def l2_normalize(df: DataFrame, vec_col: str, id_col: str,
                 out_col: str = "unit_vec") -> DataFrame:
    """``(id, unit_vec)``: each vector scaled to unit L2 norm; zero
    vectors pass through unchanged (norm 0 guard)."""
    v = _as_double(vec_col)
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.when(norm == 0.0, v)
        .otherwise(F.transform(v, lambda x: x / norm))
        .alias(out_col),
    )


def quantize_int8(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """``(id, scale, codes)``: symmetric per-vector int8 quantization.
    ``scale = max|x| / 127`` (0 for the zero vector), ``code_i =
    floor(x_i / scale + 0.5)`` — round-half-up, identical in both
    engines; codes lie in [-127, 127]."""
    v = _as_double(vec_col)
    amax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = amax / F.lit(127.0)
    codes = F.when(scale == 0.0, F.transform(v, lambda x: F.lit(0)))\
        .otherwise(
            F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5))
                        .cast("int"))
        )
    return df.select(
        F.col(id_col).alias("id"),
        scale.alias("scale"),
        codes.alias("codes"),
    )


def dequantize_int8(df: DataFrame, scale_col: str = "scale",
                    codes_col: str = "codes",
                    out_col: str = "vec") -> DataFrame:
    """Inverse of ``quantize_int8``: ``vec_i = code_i · scale`` (max abs
    reconstruction error ≤ scale / 2 by construction)."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(codes_col),
            lambda c: c.cast("double") * F.col(scale_col),
        ),
    )


def second_moment_matrix(df: DataFrame, vec_col: str,
                         quant: int = 1_000_000) -> DataFrame:
    """Exact-integer second-moment matrix of an embedding column:
    ``(i, j, sxy)`` for i ≤ j where ``sxy = Σ_rows q(x_i)·q(x_j)`` and
    ``q(x) = floor(x·quant)`` — the Gram statistics PCA/whitening/OLS
    consume, computed in BIGINT so the result is bit-identical across
    engines and partitionings (float dot-product sums are
    reduction-order-dependent; quantize-then-integer-sum is not).

    Plan: one per-row nested-transform explode to (i, j, product) —
    dim·(dim+1)/2 fixed-width rows per vector — and ONE partial-agg
    groupBy.  Overflow headroom (ADVICE r7): |q(x)| ≤ quant·max|x|
    bounds the FINAL per-cell sum at n_rows·(quant·max|x|)², so with
    unit-scale embeddings 2^63 allows ~9e6 rows at quant=1e6 — and that
    bound is now ENFORCED in-plan: a broadcast 1-row guard asserts
    ``n_rows · max|q|² < 2^62`` (a loud AssertionError, never silent
    wraparound; ANSI mode would also catch the partial sums, but the
    guard fires on the exact documented bound and names the fix: lower
    ``quant`` or shard rows).  One extra narrow agg over the codes —
    noise next to the dim²/2 explode."""
    q = F.transform(
        _as_double(vec_col),
        lambda x: F.floor(x * quant).cast("long"),
    )
    bound = (
        df.select(
            F.array_max(F.transform(q, lambda c: F.abs(c))).alias("__mq")
        )
        .agg(F.count(F.lit(1)).alias("__n"), F.max("__mq").alias("__mq"))
    )
    headroom_ok = (
        F.col("__n").cast("double")
        * F.col("__mq").cast("double") * F.col("__mq").cast("double")
        < F.lit(float(2 ** 62))
    )
    guard = bound.select(
        F.assert_true(
            F.coalesce(headroom_ok, F.lit(True)),  # empty input: no risk
            F.lit("second_moment_matrix int64 headroom exceeded: "
                  "n_rows * (quant*max_abs)^2 >= 2^62 — lower quant or "
                  "shard the rows"),
        ).alias("__g")
    )
    pairs = F.flatten(
        F.transform(
            q,
            lambda x, i: F.transform(
                # j >= i only: the matrix is symmetric
                F.slice(q, i + 1, F.size(q) - i),
                lambda y, j0: F.struct(
                    i.alias("i"), (i + j0).alias("j"),
                    (x * y).alias("p"),
                ),
            ),
        )
    )
    return (
        df.select(F.explode(pairs).alias("e"))
        .select("e.i", "e.j", "e.p")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("sxy"))
        .crossJoin(F.broadcast(guard))  # 1 row; assert_true is NULL on pass
        .filter(F.col("__g").isNull())  # forces the assert (never pruned)
        .select("i", "j", "sxy")
        .orderBy("i", "j")
    )


def pca_fit_project(df: DataFrame, vec_col: str, id_col: str,
                    k: int = 8) -> tuple[DataFrame, list[list[float]], list[float]]:
    """Distributed PCA (pyspark.ml.feature.PCA — JVM-side, scalable
    covariance + eigendecomposition) fitted on the embedding column;
    returns ``(projected (id, pcvec), components [k][dim],
    explained_variance [k])``.  The fit is deterministic given the data
    (no seed; eigen of the exact covariance).  Projection is the
    standard compression step before ANN indexing — 64→8 dims is 8×
    smaller codes for IVF/PQ to chew on."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    ml = df.select(F.col(id_col).alias("id"),
                   array_to_vector(_as_double(vec_col)).alias("features"))
    model = PCA(k=k, inputCol="features", outputCol="pc").fit(ml)
    projected = model.transform(ml).select(
        "id", vector_to_array(F.col("pc")).alias("pcvec"))
    comps = model.pc.toArray()          # dim × k
    ev = list(model.explainedVariance.toArray())
    return projected, [list(map(float, comps[:, c])) for c in range(k)], ev
