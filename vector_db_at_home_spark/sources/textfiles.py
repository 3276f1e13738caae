"""Raw-text corpus source: a directory of text files → the ``documents``
shape, via Spark's built-in ``text`` source.

The training-corpus front door: crawl output and dumps arrive as text
files, one document per file or one per line.  Both forms land in the
``(doc_id, text, source)`` shape every text operator here consumes
(dedup, quality, language-ID, chunking, cleaning capstone).

- ``whole_files=True``: one document per FILE (``wholetext``), doc id =
  64-bit hash of the file path — stable across runs, no driver-side
  enumeration.
- ``whole_files=False``: one document per LINE; doc id = hash of
  (file, line text, occurrence index) — the occurrence index (a window
  over identical lines within a file) keeps ids unique even for repeated
  lines, and EXACT duplicate lines across files stay distinct documents
  for the dedup operators to find, which is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load_text_corpus(spark: SparkSession, path: str,
                     whole_files: bool = True,
                     glob: str | None = None) -> DataFrame:
    """``(doc_id, text, source)`` from a directory of text files."""
    # options must be text() kwargs — reader-level .option() calls are
    # dropped by the text() path (measured on Spark 4.1)
    kw = {} if glob is None else {"pathGlobFilter": glob}
    if whole_files:
        df = spark.read.text(path, wholetext=True, **kw).select(
            F.col("value").alias("text"),
            F.input_file_name().alias("source"),
        )
        return df.select(
            F.xxhash64("source").alias("doc_id"), "text", "source"
        )
    df = spark.read.text(path, **kw).select(
        F.col("value").alias("text"),
        F.input_file_name().alias("source"),
    )
    occ = Window.partitionBy("source", "text").orderBy(F.lit(1))
    return (
        df.withColumn("__occ", F.row_number().over(occ))
        .select(
            F.xxhash64("source", "text", "__occ").alias("doc_id"),
            "text",
            "source",
        )
    )
