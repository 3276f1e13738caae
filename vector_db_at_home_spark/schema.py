"""Canonical schemas and constants.

The reference's single logical dataset is ``vector(id, vec, doc)``
(``/root/reference/src/vector_db_at_home/schema.sql:3-7``): INTEGER id,
float32 BLOB vec, JSON TEXT doc.  Spark-native equivalent: a Parquet table
with a native float array — no byte-level codec needed (SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Parity schema for the reference's ``vector`` table
#: (reference schema.sql:3-7; vec codec vector_store.py:114-123 is
#: unnecessary with a native ArrayType(FloatType)).
VECTOR_SCHEMA = StructType(
    [
        StructField("id", LongType(), nullable=False),
        StructField("vec", ArrayType(FloatType(), containsNull=False), nullable=False),
        # Schemaless JSON document kept as a raw string so JSON-path access
        # happens at query time, exactly like the reference's dynamic doc
        # column (vector_store.py:132-137, 337-346).
        StructField("doc", StringType(), nullable=False),
    ]
)

#: Query batch schema for kNN search (small, broadcast side).
QUERY_SCHEMA = StructType(
    [
        StructField("query_id", LongType(), nullable=False),
        StructField("qvec", ArrayType(FloatType(), containsNull=False), nullable=False),
    ]
)

#: Names of the driver-provided parquet tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dtypes the reference coerces to float32 with a warning
#: (vector_store.py:34-55); everything else raises ValueError.
COERCIBLE_NUMPY_KINDS = {"b", "i", "u", "f"}  # bool, int, uint, float
