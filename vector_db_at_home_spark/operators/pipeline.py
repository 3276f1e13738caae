"""The end-to-end training-data cleaning pipeline — the north-star use case
composed from the engine's own operators, as one declarative plan:

1. exact dedup        — keep the min-id representative of identical texts
2. near-dup removal   — drop the higher id of every n-gram-Jaccard pair
                        ≥ threshold (greedy-by-id, deterministic)
3. quality filter     — distinct-token ratio and punctuation bounds
4. language filter    — keep docs whose labeled lang is in the allow-list
5. summary            — per-language stats of the surviving corpus

Every stage is a DataFrame transformation (no Python), so Catalyst fuses
filters, pushes projections, and the near-dup anti-join broadcasts its tiny
pair list.  The full pipeline is SQL-expressible and oracle-checked end to
end — each stage was proven individually, this proves the composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .dedup import exact_dedup, ngram_jaccard_pairs


def clean_corpus(spark: SparkSession, sf_dir: str,
                 jaccard_threshold: float = 0.5,
                 min_distinct_ratio: float = 0.3,
                 max_punct_ratio: float = 0.2,
                 langs: tuple[str, ...] = ("en", "de", "es", "fr"),
                 decontam_bench: DataFrame | None = None,
                 decontam_n: int = 8,
                 decontam_threshold: float = 0.5) -> DataFrame:
    """Surviving corpus after the full cleaning cascade: ``(doc_id, lang,
    n_tokens)`` of every kept doc.

    ``decontam_bench`` (a ``(doc_id, text)`` benchmark table) inserts a
    decontamination stage after near-dup removal: docs containing ≥
    ``decontam_threshold`` of any benchmark doc's ``decontam_n``-grams are
    dropped (``dedup.decontaminate``).  Default off — the registered
    oracle-checked query covers the base cascade; the stage is proven by
    its own oracle-replicated tests."""
    docs = load_table(spark, sf_dir, "documents")

    # 1. exact dedup: keep rows that are their own canonical representative
    canon = exact_dedup(docs, "text", "doc_id").filter(
        F.col("id") == F.col("canonical_id")
    ).select(F.col("id").alias("doc_id"))
    kept = docs.join(canon, "doc_id", "left_semi")

    # 2. near-dup removal: drop id_b of every qualifying pair (greedy by
    # id).  Pairs are computed on the POST-exact-dedup set: identical texts
    # have identical shingle sets, so any pair through a dropped duplicate
    # also exists through its canonical representative — same final result,
    # and exact-dup groups no longer inflate the shingle self-join
    # quadratically.
    near = ngram_jaccard_pairs(kept, "text", "doc_id",
                               threshold=jaccard_threshold)
    drop = near.select(F.col("id_b").alias("doc_id")).distinct()
    kept = kept.join(F.broadcast(drop), "doc_id", "left_anti")

    # 2b. optional benchmark decontamination (training/eval overlap)
    if decontam_bench is not None:
        from .dedup import decontaminate

        kept = decontaminate(
            kept, decontam_bench, n=decontam_n,
            threshold=decontam_threshold,
            corpus_text="text", corpus_id="doc_id",
            bench_text="text", bench_id="doc_id",
        )

    # 3. quality: distinct-token ratio + punctuation density bounds
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    punct_ratio = (
        F.length("text")
        - F.length(F.regexp_replace("text", "[^A-Za-z0-9 ]", ""))
    ).cast("double") / F.length("text")
    kept = kept.filter(
        (distinct_ratio >= min_distinct_ratio) & (punct_ratio <= max_punct_ratio)
    )

    # 4. language allow-list
    kept = kept.filter(F.col("lang").isin(list(langs)))

    return kept.select(
        "doc_id", "lang", n_tokens.cast("long").alias("n_tokens")
    ).orderBy("doc_id")


def clean_corpus_summary(spark: SparkSession, sf_dir: str, **kw) -> DataFrame:
    """Per-language stats of the cleaned corpus: ``(lang, n_docs,
    total_tokens)`` plus an ALL row."""
    kept = clean_corpus(spark, sf_dir, **kw)
    per_lang = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    total = kept.agg(
        F.lit("ALL").alias("lang"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    return per_lang.unionByName(total).orderBy("lang")


CLEAN_CORPUS_SQL = """
WITH canon AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
         WHERE doc_id IN (SELECT doc_id FROM canon)),
sh AS (SELECT DISTINCT doc_id, array_to_string(list_slice(t, i, i + 2), ' ') AS shingle
       FROM toks, unnest(range(1, len(t) - 1)) AS r(i)),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
neardrop AS (
  SELECT DISTINCT id_b AS doc_id
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= {threshold}
),
kept AS (
  SELECT d.doc_id, d.lang, len(string_split(d.text, ' ')) AS n_tokens
  FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM canon)
    AND d.doc_id NOT IN (SELECT doc_id FROM neardrop)
    AND CAST(len(list_distinct(string_split(d.text, ' '))) AS DOUBLE)
        / len(string_split(d.text, ' ')) >= {min_distinct}
    AND CAST(length(d.text) - length(regexp_replace(d.text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
        / length(d.text) <= {max_punct}
    AND d.lang IN {langs}
)
"""

CLEAN_CORPUS_DOCS_SQL = (
    CLEAN_CORPUS_SQL
    + "SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens "
      "FROM kept ORDER BY doc_id"
)

CLEAN_CORPUS_SUMMARY_SQL = (
    CLEAN_CORPUS_SQL
    + """
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM kept GROUP BY lang
UNION ALL
SELECT 'ALL' AS lang, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM kept
ORDER BY lang
"""
)


def render_clean_corpus_sql(summary: bool,
                            jaccard_threshold: float = 0.5,
                            min_distinct_ratio: float = 0.3,
                            max_punct_ratio: float = 0.2,
                            langs: tuple[str, ...] = ("en", "de", "es", "fr")) -> str:
    tmpl = CLEAN_CORPUS_SUMMARY_SQL if summary else CLEAN_CORPUS_DOCS_SQL
    return tmpl.format(
        threshold=jaccard_threshold,
        min_distinct=min_distinct_ratio,
        max_punct=max_punct_ratio,
        langs="(" + ", ".join(f"'{lang}'" for lang in langs) + ")",
    )
