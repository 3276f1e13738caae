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

    ``get_json_object`` yields strings; SQLite's ``json_extract`` compares
    typed values (int 2 matches JSON number 2, ``tests.py:478-486``), so we
    compare both the raw string form and the stringified value — this matches
    SQLite semantics for scalar string/int values (SURVEY.md §2.4).
    """
    extracted = json_path_col(doc_col, path)
    str_values = [str(v) for v in values]
    return df.filter(extracted.isin(str_values))
