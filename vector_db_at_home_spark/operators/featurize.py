"""Text featurization: the hashing-trick embedder (feature hashing /
"hashing vectorizer" — Weinberger et al. 2009, the public technique
behind scikit-learn's ``HashingVectorizer``).

Closes the text→vector gap: every similarity operator in this engine
(exact kNN, IVF, IVF-SQ8, PQ, cosine LSH) consumes an embedding column;
this module PRODUCES one from raw text with no model weights and no
external service — each token hashes to one of ``dim`` buckets with a
±1 sign (the signed sum keeps collisions unbiased), giving a sparse
integer vector whose cosine geometry tracks token overlap.

Everything is md5-derived and INTEGER-exact, so the whole pipeline —
embedding components AND a cosine top-k over them — is value-hashable
against a DuckDB re-derivation with zero float-reduction risk: dot
products and squared norms are exact integers; the only float op is one
``dot / sqrt(n1·n2)`` per pair, identical in both engines.

Plan shape: explode tokens → md5 in the projection (strings never
shuffle) → one partial-aggregated groupBy on (id, bucket).  The dense
form assembles the array JVM-side from the sparse rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_h60, _sql_hex2int


def _token_col(text_col: str) -> Column:
    # literal single-space split, matching the oracle's string_split
    return F.split(F.lower(F.col(text_col)), " ")


def hashing_embed_sparse(docs: DataFrame, text_col: str, id_col: str,
                         dim: int = 64) -> DataFrame:
    """Sparse integer embedding: ``(id, bucket, val)`` where ``bucket =
    md5₆₀(token) mod dim`` and ``val`` sums the token's ±1 sign (16th
    md5 hex digit parity).  Tokens hash inside the explode projection;
    the single shuffle is the (id, bucket) partial aggregate.  Zero
    rows are naturally absent (sparse)."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_token_col(text_col)).alias("t"),
    )
    h = _md5_h60(F.col("t"))
    sign = F.when(
        F.conv(F.substring(F.md5(F.col("t")), 16, 1), 16, 10)
        .cast("int") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        tok.select("id", (h % dim).cast("int").alias("bucket"),
                   sign.alias("s"))
        .groupBy("id", "bucket")
        .agg(F.sum("s").cast("long").alias("val"))
        .filter(F.col("val") != 0)
    )


def hashing_embed(docs: DataFrame, text_col: str, id_col: str,
                  dim: int = 64, normalize: bool = True) -> DataFrame:
    """Dense embedding ``(id, vec array<double>)`` ready for the ANN
    stack (``knn_search`` / ``ivf_build`` / ``ivfsq_build`` /
    ``pq_build``): the sparse rows pivot into a ``dim``-length array
    JVM-side (map lookup over a static index sequence — no UDF), L2-
    normalized by default so dot ≡ cosine."""
    sparse = hashing_embed_sparse(docs, text_col, id_col, dim)
    dense = (
        sparse.groupBy("id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "val"))
            ).alias("m")
        )
        .select(
            "id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at("m", i.cast("int")).cast("double"),
                    F.lit(0.0),
                ),
            ).alias("vec"),
        )
    )
    if not normalize:
        return dense
    norm = F.sqrt(
        F.aggregate(F.col("vec"), F.lit(0.0), lambda a, x: a + x * x)
    )
    return dense.select(
        "id",
        F.when(norm == 0.0, F.col("vec"))
        .otherwise(F.transform(F.col("vec"), lambda x: x / norm))
        .alias("vec"),
    )


def hash_embed_selfsearch(docs: DataFrame, text_col: str, id_col: str,
                          query_id: int, k: int = 10,
                          dim: int = 64) -> DataFrame:
    """Cosine top-``k`` documents for one query document over the
    hashing embeddings, computed ENTIRELY in the exact integer domain:
    ``dot = Σ v_q·v_d`` (integer), ``cos = dot / sqrt(nq·nd)`` (one
    float op per candidate pair), ranked ``(cos desc, id)``.  Output
    ``(id, cos_e6)`` with the e6 quantization convention.

    Plan: sparse query rows broadcast; the bucket join touches only
    docs sharing ≥ 1 non-zero bucket with the query (an inverted-index
    probe, not a corpus scan at high dim); norms come from the same
    sparse aggregate via exchange reuse."""
    sparse = hashing_embed_sparse(docs, text_col, id_col, dim)
    norms = sparse.groupBy("id").agg(
        F.sum(F.col("val") * F.col("val")).alias("nsq")
    )
    q = sparse.filter(F.col("id") == query_id).select(
        F.col("bucket"), F.col("val").alias("qval")
    )
    qn = norms.filter(F.col("id") == query_id).select(
        F.col("nsq").alias("qnsq")
    )
    dots = (
        sparse.join(F.broadcast(q), "bucket")
        .groupBy("id")
        .agg(F.sum(F.col("val") * F.col("qval")).alias("dot"))
    )
    cos = F.col("dot") / F.sqrt(
        (F.col("nsq") * F.col("qnsq")).cast("double")
    )
    return (
        dots.join(norms, "id")
        .join(F.broadcast(qn))
        .filter(F.col("id") != query_id)
        .select(
            "id",
            cos.alias("__cos"),
            F.floor(cos * 1e6 + F.lit(0.5)).cast("long").alias("cos_e6"),
        )
        .orderBy(F.col("__cos").desc(), F.col("id").asc())
        .limit(k)
        .drop("__cos")
    )


def _char_trigrams(tok: Column) -> Column:
    # char 3-grams; tokens shorter than 3 chars hash as themselves
    return F.when(F.length(tok) < 3, F.array(tok)).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(tok) - 2),
            lambda i: tok.substr(i, F.lit(3)),
        )
    )


def _token_vectors(tok_df: DataFrame, tok_col: str, dim: int,
                   out_val: str) -> DataFrame:
    """Per-TOKEN signed-hash vector over char trigrams: every row of
    ``tok_df`` explodes into its trigrams, each hashing to ``md5₆₀(g) mod
    dim`` with a ±1 sign (16th md5 hex digit parity), summed per (row,
    bucket).  Subword features, so near-identical tokens ("merge" /
    "merges") share most buckets — the property MaxSim needs."""
    g = F.explode(_char_trigrams(F.col(tok_col))).alias("g")
    keys = [c for c in tok_df.columns]
    ex = tok_df.select(*keys, g)
    h = _md5_h60(F.col("g"))
    sign = F.when(
        F.conv(F.substring(F.md5(F.col("g")), 16, 1), 16, 10)
        .cast("int") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        ex.select(*keys, (h % dim).cast("int").alias("bucket"),
                  sign.alias("s"))
        .groupBy(*keys, "bucket")
        .agg(F.sum("s").cast("long").alias(out_val))
        .filter(F.col(out_val) != 0)
    )


def maxsim_search(docs: DataFrame, terms: list[str], text_col: str,
                  id_col: str, k: int = 10, dim: int = 16) -> DataFrame:
    """Late-interaction retrieval (the ColBERT MaxSim operator, Khattab &
    Zaharia 2020) over model-free subword hash vectors: every DISTINCT
    document token and every query term embeds as a signed trigram-hash
    vector (integer components), and

        ``score(doc) = Σ_{q term} max(0, max_{doc token} ⟨v_q, v_t⟩)``

    — each query term independently finds its best-matching document
    token (token-level alignment, what distinguishes late interaction
    from the single-vector cosine of ``hash_embed_selfsearch``).  The 0
    floor IS the exact max over all doc tokens whenever some token
    shares no bucket with the term (dot 0), i.e. essentially always.

    Everything is INTEGER-exact — trigram hashing, dots, maxes, the
    final sum — so the ranking value-hashes against the DuckDB oracle
    with no float anywhere.

    Plan: doc tokens explode at the scan; the bucket join against the
    broadcast query vectors touches only (doc-token, term) pairs sharing
    ≥ 1 bucket (inverted-index probe); two partial-agg groupBys (dot,
    then max/sum) both partition by id.  Returns ``(id, score)`` top-k
    ranked ``(score DESC, id ASC)``."""
    spark = docs.sparkSession
    dtok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), " "))
        ).alias("tok"),
    )
    dvec = _token_vectors(dtok, "tok", dim, "val")
    qdf = spark.createDataFrame([(t.lower(),) for t in terms], "qt string")
    qvec = _token_vectors(qdf, "qt", dim, "qval")
    dots = (
        dvec.join(F.broadcast(qvec), "bucket")
        .groupBy("id", "tok", "qt")
        .agg(F.sum(F.col("val") * F.col("qval")).alias("dot"))
    )
    per_term = dots.groupBy("id", "qt").agg(
        F.greatest(F.max("dot"), F.lit(0).cast("long")).alias("mx")
    )
    scores = per_term.groupBy("id").agg(F.sum("mx").alias("score"))
    return (
        scores.orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def render_maxsim_sql(terms: list[str], k: int = 10, dim: int = 16) -> str:
    """DuckDB oracle for ``maxsim_search`` — identical trigram/bucket/sign
    derivation, integer dots/maxes/sums, same (score desc, id) rank."""
    lit_terms = ", ".join("'" + t.lower().replace("'", "''") + "'"
                          for t in terms)
    tri = ("CASE WHEN length(tok) < 3 THEN [tok] "
           "ELSE list_transform(range(1, length(tok) - 1), "
           "i -> substr(tok, i, 3)) END")
    qtri = tri.replace("tok", "qt")
    return f"""
WITH dtok AS (
  SELECT doc_id AS id,
         unnest(list_distinct(string_split(lower(text), ' '))) AS tok
  FROM documents
),
dgram AS (
  SELECT id, tok, md5(unnest({tri})) AS hx FROM dtok
),
dvec AS (
  SELECT id, tok,
         CAST({_sql_hex2int('hx', 1, 15)} % {dim} AS INTEGER) AS bucket,
         CAST(sum(CASE WHEN {_sql_hex2int('hx', 16, 1)} % 2 = 0
                       THEN 1 ELSE -1 END) AS BIGINT) AS val
  FROM dgram GROUP BY id, tok, bucket
  HAVING sum(CASE WHEN {_sql_hex2int('hx', 16, 1)} % 2 = 0
                  THEN 1 ELSE -1 END) <> 0
),
qtok AS (SELECT unnest([{lit_terms}]) AS qt),
qgram AS (SELECT qt, md5(unnest({qtri})) AS hx FROM qtok),
qvec AS (
  SELECT qt,
         CAST({_sql_hex2int('hx', 1, 15)} % {dim} AS INTEGER) AS bucket,
         CAST(sum(CASE WHEN {_sql_hex2int('hx', 16, 1)} % 2 = 0
                       THEN 1 ELSE -1 END) AS BIGINT) AS qval
  FROM qgram GROUP BY qt, bucket
  HAVING sum(CASE WHEN {_sql_hex2int('hx', 16, 1)} % 2 = 0
                  THEN 1 ELSE -1 END) <> 0
),
dots AS (
  SELECT d.id, d.tok, q.qt, sum(d.val * q.qval) AS dot
  FROM dvec d JOIN qvec q USING (bucket)
  GROUP BY d.id, d.tok, q.qt
),
per_term AS (
  SELECT id, qt, greatest(max(dot), 0) AS mx FROM dots GROUP BY id, qt
),
scores AS (SELECT id, CAST(sum(mx) AS BIGINT) AS score
           FROM per_term GROUP BY id)
SELECT id, score FROM scores ORDER BY score DESC, id LIMIT {k}
"""


def render_hash_embed_sql(dim: int = 64) -> str:
    """DuckDB oracle for ``hashing_embed_sparse`` over ``documents`` —
    the identical md5 bucket/sign derivation, pure integers."""
    return f"""
WITH tok AS (
  SELECT doc_id AS id, md5(unnest(string_split(lower(text), ' '))) AS hx
  FROM documents
)
SELECT id,
       CAST({_sql_hex2int('hx', 1, 15)} % {dim} AS INTEGER) AS bucket,
       CAST(sum(CASE WHEN {_sql_hex2int('hx', 16, 1)} % 2 = 0
                     THEN 1 ELSE -1 END) AS BIGINT) AS val
FROM tok
GROUP BY id, bucket
HAVING sum(CASE WHEN {_sql_hex2int('hx', 16, 1)} % 2 = 0
                THEN 1 ELSE -1 END) <> 0
ORDER BY id, bucket
"""


def render_selfsearch_sql(query_id: int, k: int = 10,
                          dim: int = 64) -> str:
    """DuckDB oracle for ``hash_embed_selfsearch`` — integer dot/norms,
    one float division, same (cos desc, id) ranking."""
    return f"""
WITH tok AS (
  SELECT doc_id AS id, md5(unnest(string_split(lower(text), ' '))) AS hx
  FROM documents
),
sp AS (
  SELECT id,
         CAST({_sql_hex2int('hx', 1, 15)} % {dim} AS INTEGER) AS bucket,
         CAST(sum(CASE WHEN {_sql_hex2int('hx', 16, 1)} % 2 = 0
                       THEN 1 ELSE -1 END) AS BIGINT) AS val
  FROM tok GROUP BY id, bucket
  HAVING sum(CASE WHEN {_sql_hex2int('hx', 16, 1)} % 2 = 0
                  THEN 1 ELSE -1 END) <> 0
),
norms AS (SELECT id, sum(val * val) AS nsq FROM sp GROUP BY id),
q AS (SELECT bucket, val AS qval FROM sp WHERE id = {query_id}),
qn AS (SELECT nsq AS qnsq FROM norms WHERE id = {query_id}),
dots AS (SELECT sp.id, sum(sp.val * q.qval) AS dot
         FROM sp JOIN q USING (bucket) GROUP BY sp.id)
SELECT id,
       CAST(floor(dot / sqrt(CAST(norms.nsq * qn.qnsq AS DOUBLE))
                  * 1e6 + 0.5) AS BIGINT) AS cos_e6
FROM dots JOIN norms USING (id), qn
WHERE id <> {query_id}
ORDER BY dot / sqrt(CAST(norms.nsq * qn.qnsq AS DOUBLE)) DESC, id
LIMIT {k}
"""
