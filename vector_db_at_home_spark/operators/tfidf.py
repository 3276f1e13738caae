"""TF-IDF over the documents table — pure DataFrame, oracle-exact.

Classic smooth-idf formulation, kept in exact rational/log arithmetic that
DuckDB reproduces bit-for-bit:

    tf(t, d)  = count of t in d
    idf(t)    = ln((N + 1) / (df(t) + 1)) + 1
    tfidf     = tf * idf

Plan shape: one explode (token, doc) → two partial-aggregating groupBys
(per-doc-term counts; document frequency) → broadcast-join the tiny df table
back.  No Python, no ML pipeline — at 100 TB the same plan holds with the
df table written out and broadcast per batch.  ``top_terms_per_doc`` adds
the WindowGroupLimit top-k so the output stays O(docs × k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .topk import top_k_per_group


def term_frequencies(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token, tf) — raw counts per document."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("token"),
        )
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token, tf, df_count, tfidf) for every (doc, term)."""
    n_docs = df.count()
    tf = term_frequencies(df, text_col, id_col)
    doc_freq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_count"))
    return tf.join(F.broadcast(doc_freq), "token").select(
        "id",
        "token",
        "tf",
        "df_count",
        F.round(
            F.col("tf")
            * (F.log((F.lit(float(n_docs + 1))) / (F.col("df_count") + 1)) + 1.0),
            6,
        ).alias("tfidf"),
    )


def top_terms_per_doc(df: DataFrame, text_col: str, id_col: str,
                      k: int = 3) -> DataFrame:
    """Top-k characteristic terms per doc by tfidf desc (token asc ties)."""
    scored = tfidf(df, text_col, id_col)
    return top_k_per_group(
        scored,
        ["id"],
        [F.col("tfidf").desc(), F.col("token").asc()],
        k,
        rank_col="rank",
    ).withColumn("rank", F.col("rank").cast("long")).orderBy("id", "rank")


TFIDF_TOP_TERMS_SQL_TEMPLATE = """
WITH tf AS (
  SELECT doc_id AS id, t.token, count(*) AS tf
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
  GROUP BY 1, 2
),
df_t AS (SELECT token, count(*) AS df_count FROM tf GROUP BY token),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.id, tf.token, tf.tf, df_t.df_count,
         round(tf.tf * (ln((n.n_docs + 1.0) / (df_t.df_count + 1)) + 1.0), 6)
           AS tfidf
  FROM tf, df_t, n WHERE tf.token = df_t.token
),
r AS (
  SELECT id, token, tf, df_count, tfidf,
         CAST(row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, token)
              AS BIGINT) AS rank
  FROM scored
)
SELECT id, token, tf, df_count, tfidf, rank
FROM r WHERE rank <= {k} ORDER BY id, rank
"""
