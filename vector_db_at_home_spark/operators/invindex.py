"""Positional inverted index + exact phrase search — the classic
retrieval primitive BM25/TF-IDF can't answer (term ADJACENCY), and the
textbook showcase for expressing index lookups as keyed joins.

Phrase match = the first term at position p, the second at p + 1, … —
so a k-term phrase is k−1 equi-joins on ``(id, pos)`` after shifting
each term's postings left by its phrase offset.  Every join input is
pre-filtered to ONE term's postings (the selective-term stream an
inverted index exists to provide), so the joins carry only matching
ids/positions — never the corpus.

Scale shape: the token explode happens at the scan; each postings
stream shuffles ``(id, pos)`` longs keyed by id; a stored index
(``build_positional_index`` landed to parquet partitioned by term
bucket) turns the scan into a partition-pruned read.  100 TB phrase
search is then k partition-pruned scans + k−1 keyed joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_positional_index(docs: DataFrame, text_col: str,
                           id_col: str) -> DataFrame:
    """``(term, id, pos)`` postings — lowercase space tokens, 0-based
    positions.  Land with ``.write.partitionBy(bucket)`` on
    ``pmod(xxhash64(term), B)`` for pruned lookups at scale."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), " "))
        .alias("pos", "term"),
    ).select("term", "id", "pos")


def phrase_search(docs: DataFrame, phrase: str, text_col: str,
                  id_col: str) -> DataFrame:
    """Exact phrase match over the corpus: ``(id, n_matches)`` for every
    document containing the token sequence, ordered by id.  Counts
    overlapping occurrences (a match may start at every position).
    Single-term phrases degenerate to postings counting."""
    terms = [t for t in phrase.lower().split(" ") if t]
    if not terms:
        raise ValueError("phrase_search requires a non-empty phrase")
    idx = build_positional_index(docs, text_col, id_col)
    m = idx.filter(F.col("term") == terms[0]).select("id", "pos")
    for i, t in enumerate(terms[1:], start=1):
        nxt = idx.filter(F.col("term") == t).select(
            "id", (F.col("pos") - i).alias("pos"))
        m = m.join(nxt, ["id", "pos"])
    return (
        m.groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matches"))
        .orderBy("id")
    )


def render_phrase_search_sql(phrase: str) -> str:
    """DuckDB oracle — identical tokenization, positions, and join
    semantics over ``documents``."""
    terms = [t for t in phrase.lower().split(" ") if t]
    lit0 = terms[0].replace("'", "''")
    joins = []
    for i, t in enumerate(terms[1:], start=1):
        lt = t.replace("'", "''")
        joins.append(
            f"JOIN (SELECT id, pos - {i} AS pos FROM postings "
            f"WHERE term = '{lt}') t{i} USING (id, pos)"
        )
    return f"""
WITH postings AS (
  SELECT doc_id AS id, u.i - 1 AS pos, toks[u.i] AS term
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
        FROM documents) b,
       unnest(range(1, len(b.toks) + 1)) AS u(i)
),
m AS (
  SELECT id, pos FROM postings WHERE term = '{lit0}'
)
SELECT m.id, CAST(count(*) AS BIGINT) AS n_matches
FROM m {' '.join(joins)}
GROUP BY m.id ORDER BY m.id
"""
