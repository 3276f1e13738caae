"""Multi-format IO for the store schema and the test tables.

The reference supports exactly one storage format (SQLite).  Spark-side the
engine reads/writes Parquet (canonical), CSV, JSON, and ORC through one
surface, with the vector column bridged to a string representation for the
text formats (CSV/JSON can't carry native arrays portably).

Scale notes: Parquet/ORC are the only formats that preserve types, enable
predicate pushdown, and split well — the text formats exist for interchange,
and ``write_table``/``read_table`` keep their schemas explicit so a
round-trip is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import VECTOR_SCHEMA

SUPPORTED_FORMATS = ("parquet", "orc", "json", "csv")


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite") -> None:
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    out = df
    if fmt == "csv":
        # arrays/structs → JSON strings for the flat format
        for f in df.schema.fields:
            if f.dataType.simpleString().startswith(("array", "struct", "map")):
                out = out.withColumn(f.name, F.to_json(F.col(f.name)))
        out.write.mode(mode).option("header", "true").csv(path)
        return
    out.write.mode(mode).format(fmt).save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema=None) -> DataFrame:
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        return reader.option("header", "true").csv(path)
    return reader.format(fmt).load(path)


def write_store(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write an (id, vec, doc) store in any supported format."""
    write_table(df, path, fmt)


def read_store(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read an (id, vec, doc) store back with its canonical schema
    (vec restored from JSON for text formats)."""
    if fmt in ("parquet", "orc"):
        return read_table(spark, path, fmt, schema=VECTOR_SCHEMA)
    if fmt == "json":
        df = read_table(spark, path, "json")
    else:  # csv
        df = read_table(
            spark, path, "csv", schema="id long, vec string, doc string"
        ).withColumn("vec", F.from_json("vec", "array<float>"))
    return df.select(
        F.col("id").cast("long"),
        F.col("vec").cast("array<float>"),
        F.col("doc").cast("string"),
    )
