"""Python UDTF surface — the table-function third of UDF/UDAF/UDTF
(SURVEY.md §2.5).

Scalar SQL UDFs live in ``functions/register.py``; this module adds a
user-defined TABLE function callable from SQL with ``LATERAL`` correlation,
the Spark-4 Python UDTF API.  UDTFs are the slow path (row-at-a-time
Python) — the built-in equivalents (``explode(transform(...))``, see
``operators/dedup.hashed_shingles``) stay the hot path; this exists so a
user who needs a custom table function has the pattern wired and tested.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, ngram string")
class WordNgrams:
    """Explode a text into its word n-grams with positions.

    SQL: ``SELECT d.doc_id, t.pos, t.ngram
    FROM docs d, LATERAL word_ngrams(d.text, 2) t``
    """

    def eval(self, text: str, n: int):  # noqa: D102 — UDTF contract
        toks = (text or "").split(" ")
        nn = max(1, int(n or 1))
        for i in range(max(0, len(toks) - nn + 1)):
            yield i, " ".join(toks[i:i + nn])


def register_udtfs(spark) -> None:
    """Idempotently register all UDTFs on the session."""
    spark.udtf.register("word_ngrams", WordNgrams)
