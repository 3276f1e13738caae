"""JSON-path helpers for the schemaless ``doc`` column.

The reference keeps docs as raw JSON text and filters with SQLite
``json_extract(doc, '$.a.b') IN (...)`` (``vector_store.py:334-356``).  Spark
equivalent: ``get_json_object`` — evaluated JVM-side inside codegen, and the
surrounding filter still benefits from column pruning (only ``doc`` is read).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_path(path: Sequence[str]) -> str:
    # Reference builds "$." + ".".join(path) with no escaping
    # (vector_store.py:337) — keys containing dots are unsupported there too.
    return "$." + ".".join(path)


def json_path_col(doc_col: Column | str, path: Sequence[str]) -> Column:
    return F.get_json_object(
        F.col(doc_col) if isinstance(doc_col, str) else doc_col, json_path(path)
    )


def query_by_doc(df: DataFrame, path: Sequence[str],
                 values: Sequence[str | int],
                 doc_col: str = "doc") -> DataFrame:
    """Filter rows whose JSON doc value at ``path`` is in ``values``.

    ``get_json_object`` yields strings (JSON numbers and strings both
    unquoted), so comparison is stringly: int query 2 matches JSON number 2
    (the reference behavior exercised by ``tests.py:478-486``) AND also
    matches JSON string "2".  SQLite's typed ``json_extract`` would reject
    the cross-type case — a documented deviation: Spark has no typed JSON
    scalar extraction over schemaless docs, and the DuckDB oracle
    (``json_extract_string``) shares this engine's stringly semantics.
    """
    extracted = json_path_col(doc_col, path)
    str_values = [str(v) for v in values]
    return df.filter(extracted.isin(str_values))
