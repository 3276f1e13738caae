"""Compatibility bridge for the reference's on-disk SQLite format.

A user of ``dwisdom0/vector_db_at_home`` has data in a SQLite file with one
table ``vector(id INTEGER PRIMARY KEY, vec BLOB NOT NULL, doc TEXT)``
(reference ``schema.sql:3-7``), where ``vec`` is raw little-endian float32
bytes, dim×4 per row (encode ``vector_store.py:122-123``, decode
``vector_store.py:114-120``), and ``doc`` is a JSON string (``"{}"`` when
absent, ``vector_store.py:213-214``).

``import_sqlite`` reads that file into the Spark-native ``(id, vec, doc)``
schema (native float arrays — no blob codec needed downstream), and
``export_sqlite`` writes a store back out, so migration works both ways.
The read is driver-side (SQLite is a single local file — there is nothing
to parallelize until it lands in Parquet); for many files, parallelize by
calling this per file inside a thread pool or mapPartitions over paths.
"""

from __future__ import annotations

import json
import sqlite3
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..schema import VECTOR_SCHEMA

_CREATE_SQL = """
CREATE TABLE IF NOT EXISTS vector (
    id INTEGER PRIMARY KEY,
    vec BLOB NOT NULL,
    doc TEXT
)
"""


def blob_to_vec(blob: bytes) -> list[float]:
    """Little-endian float32 bytes → list[float] (reference codec)."""
    return [float(x) for x in np.frombuffer(blob, dtype="<f4")]


def vec_to_blob(vec) -> bytes:
    return np.asarray(vec, dtype="<f4").tobytes()


def import_sqlite(spark: SparkSession, db_path: str,
                  expected_dim: int | None = None) -> DataFrame:
    """Read a reference-format SQLite store into an ``(id, vec, doc)``
    DataFrame.  ``doc`` NULL → ``"{}"`` (reference read semantics,
    vector_store.py:126-130)."""
    con = sqlite3.connect(db_path)
    try:
        rows = con.execute("SELECT id, vec, doc FROM vector ORDER BY id").fetchall()
    finally:
        con.close()
    out = []
    for rid, blob, doc in rows:
        vec = blob_to_vec(blob)
        if expected_dim is not None and len(vec) != expected_dim:
            raise ValueError(
                f"row {rid}: vector dim {len(vec)} != expected {expected_dim}"
            )
        out.append((int(rid), vec, doc if doc is not None else "{}"))
    return spark.createDataFrame(out, VECTOR_SCHEMA)


def export_sqlite(df: DataFrame, db_path: str) -> int:
    """Write an ``(id, vec, doc)`` DataFrame to a reference-format SQLite
    file.  Returns the row count.  Collects to the driver — the reference
    format is inherently single-file/single-process."""
    rows = df.select("id", "vec", "doc").collect()
    con = sqlite3.connect(db_path)
    try:
        con.execute(_CREATE_SQL)
        con.executemany(
            "INSERT OR REPLACE INTO vector (id, vec, doc) VALUES (?, ?, ?)",
            [(r.id, vec_to_blob(r.vec), r.doc) for r in rows],
        )
        con.commit()
    finally:
        con.close()
    return len(rows)
