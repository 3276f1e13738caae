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
