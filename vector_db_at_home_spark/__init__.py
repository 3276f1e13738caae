"""vector_db_at_home_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ``dwisdom0/vector_db_at_home`` (reference:
/root/reference, read-only), re-architected Spark-first.

The reference is a single-process embedded vector store (SQLite + NumPy,
``src/vector_db_at_home/vector_store.py:28-404``).  This package re-expresses
every operator as a declarative DataFrame plan so Catalyst/Tungsten pick the
physical strategy, and extends the engine with the large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing) that a 100 TB deployment needs.

Layout
------
- ``session``    — SparkSession builder tuned for the engine
- ``schema``     — canonical StructTypes and constants
- ``store``      — VectorStore-parity eager API over a Parquet-backed table
- ``functions``  — column-level kernels (distance, fuzzy, json, text)
- ``operators``  — dataframe-level operators (knn, topk, dedup, textstats,
                   relational bench queries, multimodal)
- ``sources``    — table loaders for the driver's parquet test data
- ``streaming``  — Structured Streaming extensions over the events table
- ``plans``      — plan-introspection helpers (assert pushdown/broadcast)
"""

__version__ = "0.1.0"
