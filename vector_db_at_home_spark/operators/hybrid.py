"""Hybrid retrieval: lexical + vector legs fused by Reciprocal Rank
Fusion — the standard two-tower search a vector-store user reaches for
the moment pure-vector recall misses keyword intent (RRF per
Cormack/Clarke/Buettcher 2009; the fusion every mainstream hybrid search
ships).

Spark-first shape: both legs are pure DataFrame plans — the lexical leg
is an explode→filter→count aggregate (no UDF), the vector leg the same
codegen cosine expression the kNN kernel uses — each ranked by a window,
truncated to its top ``depth``, then full-outer-joined on the doc id and
scored ``Σ 1/(rrf_k + rank)``.  Rank fusion (not score fusion) is what
makes the result CROSS-ENGINE EXACT: ranks are integers derived from
deterministic orderings, so the fused score is the same double in Spark
and DuckDB and the whole query value-hashes.

At scale: the lexical leg shuffles (term-filtered tokens → per-doc
counts); the vector leg is an unshuffled scan; each leg truncates to
its top ``depth`` via a DISTRIBUTED ``orderBy().limit`` (Spark's
TakeOrderedAndProject: per-partition heads, merged — never a
full-table single-partition window) before the rank window runs over
the ≤depth survivors; the fusion joins two ≤depth-row lists —
broadcast territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.distance import cosine_similarity

RRF_K = 60


def hybrid_search_rrf(docs: DataFrame, emb: DataFrame, terms: list[str],
                      qvec, k: int = 10, depth: int = 50,
                      doc_id_col: str = "doc_id", text_col: str = "text",
                      vec_id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Top-``k`` ids fusing a term-frequency lexical leg over ``docs``
    with a cosine vector leg over ``emb`` (ids shared), RRF with the
    standard k=60.  ``qvec`` is a DataFrame of one row ``(qvec)`` (kept
    as a broadcast join, never a driver literal, so the query vector may
    itself be the output of a plan).

    Output: ``(id, lex_rank, vec_rank, rrf_e6)`` — ranks NULL where a
    leg did not retrieve the doc within ``depth``; ``rrf_e6`` =
    ``floor(1e6·score + 0.5)``, hash-stable cross-engine.

    Query terms normalize through the corpus tokenizer (space mode —
    ``normalize_query_terms``, ADVICE r9), so a term with a space in
    it splits into the same token list the indexed path matches."""
    from ..functions.tokenize import normalize_query_terms

    lterms = normalize_query_terms(terms, "space")
    if not lterms:
        raise ValueError("hybrid_search_rrf requires query terms")
    # literal single-space split, matching the oracle's string_split
    # exactly (the corpus is single-spaced; \s+ would silently diverge
    # from the oracle on tab/multi-space text)
    toks = F.split(F.lower(F.col(text_col)), " ")
    tf = (
        docs.select(
            F.col(doc_id_col).alias("id"),
            F.size(F.filter(toks, lambda t: t.isin(lterms))).alias("tf"),
        )
        .filter(F.col("tf") > 0)
    )
    return rrf_fuse(tf, emb, qvec, k, depth, vec_id_col, vec_col)


def rrf_fuse(tf: DataFrame, emb: DataFrame, qvec, k: int, depth: int,
             vec_id_col: str = "vec_id",
             vec_col: str = "embedding",
             vec_candidates: DataFrame | None = None) -> DataFrame:
    """The ranking tail shared by :func:`hybrid_search_rrf` and the
    pruned-index lexical leg (``hybrid_search_rrf_indexed``): given the
    lexical ``tf (id, tf)`` hits, rank both legs, truncate to
    ``depth``, fuse by RRF.  One function so the corpus-scan and
    indexed paths are expression-identical — same windows, same
    integer ranks, same e6 key.

    ``vec_candidates`` (optional ``(id)`` frame, r11 — the two-tower
    path): restrict the vector leg to a candidate set via a broadcast
    semi-join BEFORE the cosine computes — the exact re-score runs
    over candidate rows only, with the same expression/window as the
    full scan, so a candidate set covering the true top-``depth``
    yields bit-identical output."""
    # distributed top-depth FIRST (TakeOrderedAndProject — per-partition
    # heads merged, no full shuffle), THEN the rank window over the ≤depth
    # survivors; ranking the raw leg directly would single-partition the
    # whole table
    w_lex = Window.orderBy(F.col("tf").desc(), F.col("id").asc())
    lex = (
        tf.orderBy(F.col("tf").desc(), F.col("id").asc()).limit(depth)
        .withColumn("lex_rank", F.row_number().over(w_lex))
        .select("id", "lex_rank")
    )

    vec_src = emb
    if vec_candidates is not None:
        vec_src = emb.join(
            F.broadcast(vec_candidates.select(
                F.col("id").alias(vec_id_col))),
            vec_id_col, "left_semi")
    sims = (
        vec_src.crossJoin(F.broadcast(qvec))
        .select(
            F.col(vec_id_col).alias("id"),
            cosine_similarity(F.col(vec_col), F.col("qvec")).alias("sim"),
        )
    )
    w_vec = Window.orderBy(F.col("sim").desc(), F.col("id").asc())
    vec = (
        sims.orderBy(F.col("sim").desc(), F.col("id").asc()).limit(depth)
        .withColumn("vec_rank", F.row_number().over(w_vec))
        .select("id", "vec_rank")
    )

    score = (
        F.coalesce(1.0 / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("vec_rank")), F.lit(0.0))
    )
    return (
        lex.join(vec, "id", "full_outer")
        .select(
            "id", "lex_rank", "vec_rank",
            F.floor(score * 1e6 + F.lit(0.5)).cast("long").alias("rrf_e6"),
        )
        .orderBy(F.col("rrf_e6").desc(), F.col("id").asc())
        .limit(k)
    )


def hybrid_search_rrf_indexed(idx, emb: DataFrame, terms: list[str],
                              qvec, k: int = 10, depth: int = 50,
                              vec_id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """:func:`hybrid_search_rrf` with the LEXICAL leg served from a
    loaded inverted index (``invindex.InvIndex``) instead of a corpus
    rescan: per-doc matched-token counts come from each query term's
    partition-pruned postings read (``bucket = N`` literal, ~1/B of
    the store per term) summed across terms — the same number the
    corpus scan's ``size(filter(toks, isin))`` computes, because the
    postings hold every token occurrence.  The vector leg and the RRF
    fusion are the shared :func:`rrf_fuse` tail, so results are
    identical to the corpus-scan path by construction (same oracle).

    Together with ``invindex.bm25_search_indexed`` this makes the full
    two-tower serving stack pruned on the lexical side; the vector leg
    stays the exact cosine scan here — swap in the IVF/graph tier when
    approximate recall is acceptable (those are separate, recalled
    queries).  Crash-window append duplicates collapse via the per-term
    ``(id, pos)`` distinct, exactly like the phrase and BM25 paths."""
    tf = _indexed_tf(idx, terms, "hybrid_search_rrf_indexed")
    return rrf_fuse(tf, emb, qvec, k, depth, vec_id_col, vec_col)


def _indexed_tf(idx, terms: list[str], caller: str) -> DataFrame:
    """The pruned lexical leg shared by the indexed hybrid paths:
    per-doc matched-token counts from each query term's
    partition-pruned postings read."""
    from ..functions.tokenize import normalize_query_terms

    lterms = normalize_query_terms(terms, idx.tokenize_mode)
    if not lterms:
        raise ValueError(f"{caller} requires query terms")
    from .invindex import _bucket

    B = idx.n_buckets
    per_term = None
    for t in dict.fromkeys(lterms):  # isin counts each token once
        s = (
            idx.postings
            .filter((F.col("bucket") == _bucket(F.lit(t), B))
                    & (F.col("term") == t))
            .select("id", "pos")
            .distinct()
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        per_term = s if per_term is None else per_term.unionByName(s)
    return per_term.groupBy("id").agg(F.sum("c").cast("int").alias("tf"))


def hybrid_search_rrf_two_tower(idx, ivf, emb: DataFrame,
                                terms: list[str], qvec,
                                k: int = 10, depth: int = 50,
                                n_probes: int = 4,
                                candidate_slack: int = 16,
                                vec_id_col: str = "vec_id",
                                vec_col: str = "embedding") -> DataFrame:
    """Hybrid RRF with BOTH towers through persisted indexes (r11):
    the lexical leg from the inverted index's partition-pruned postings
    (exactly :func:`hybrid_search_rrf_indexed`'s leg), the vector leg's
    CANDIDATES from an IVF index over the L2-NORMALIZED embeddings
    (cosine order ≡ negative-L2 order on the unit sphere), each
    candidate re-scored with the SAME exact cosine expression and
    ranked by the shared :func:`rrf_fuse` tail — so whenever the
    candidate set covers the true cosine top-``depth``, the output is
    bit-identical to the corpus-scan :func:`hybrid_search_rrf` (same
    oracle).  Exhaustive probes (``n_probes >= ivf.n_cells``) guarantee
    coverage: the IVF leg then returns the global L2 top
    ``depth + candidate_slack`` over normalized vectors, a superset of
    the cosine top-``depth`` (the slack absorbs float-noise order swaps
    between the two formulas at the cut — ties on identical vectors
    resolve by the same ``id ASC`` in both).  Bounded probes trade
    recall the standard IVF way.

    At 100 TB: the lexical tower reads ~q/B of the postings store, the
    vector tower reads the probed cells of the cell-partitioned index
    plus a broadcast-semi-join point-read of the ≤depth+slack candidate
    rows from the embedding table (row-group pruned when the table is
    id-clustered) — neither tower rescans its corpus.

    Sizing ``candidate_slack`` (ADVICE r11): the slack absorbs rank
    swaps AT THE DEPTH CUT between the IVF leg's normalized-L2 ordering
    and the exact-cosine re-score — the two orderings agree
    mathematically, so swaps come only from float noise among
    NEAR-TIED scores straddling the cut.  The bit-parity claim with the
    corpus-scan path therefore holds whenever fewer than ``slack``
    candidates are near-tied with the rank-``depth`` score; a corpus
    with a denser tie cluster at the cut (e.g. many duplicated or
    quantized embeddings scoring identically) needs ``candidate_slack``
    sized past that cluster — set it ≥ the multiplicity of the most
    duplicated embedding value you admit, or re-run with doubled slack
    and compare top-``k`` when serving corpora with heavy embedding
    duplication.  (Exact ties on IDENTICAL vectors are safe at any
    slack: both orderings break them by the same ``id ASC``.)"""
    from .ann import ivf_search

    nrm = F.sqrt(F.aggregate(
        F.transform(F.col("qvec"), lambda x: x.cast("double")),
        F.lit(0.0), lambda a, x: a + x * x))
    qs = qvec.select(
        F.lit(0).cast("long").alias("query_id"),
        F.when(nrm == 0.0,
               F.transform(F.col("qvec"), lambda x: x.cast("double")))
        .otherwise(F.transform(F.col("qvec"),
                               lambda x: x.cast("double") / nrm))
        .alias("qvec"),
    )
    cand = ivf_search(ivf, qs, k=depth + candidate_slack,
                      n_probes=n_probes).select("id")
    tf = _indexed_tf(idx, terms, "hybrid_search_rrf_two_tower")
    return rrf_fuse(tf, emb, qvec, k, depth, vec_id_col, vec_col,
                    vec_candidates=cand)


def hybrid_search_rrf_indexed_batch(idx, emb: DataFrame,
                                    queries: DataFrame, qvecs: DataFrame,
                                    k: int = 10, depth: int = 50,
                                    vec_id_col: str = "vec_id",
                                    vec_col: str = "embedding"
                                    ) -> DataFrame:
    """Batch-query hybrid RRF with the lexical tower through the
    persisted inverted index (r12 — completes the batch serving family:
    BM25, phrase, MaxSim and now the hybrid fuse all take query sets):
    ``queries`` is a SMALL ``(query_id, terms array<string>)`` frame,
    ``qvecs`` the matching ``(query_id, qvec)`` query vectors; output
    one ``(query_id, id, lex_rank, vec_rank, rrf_e6)`` top-k block per
    query, each row bit-identical to the single-query
    :func:`hybrid_search_rrf_indexed` call (pytest-pinned — ranks are
    integers from per-query windows over the same orderings, so the
    fused score is the same double).

    One plan serves the whole batch: the lexical tower is ONE pruned
    postings read for the union of all queries' DISTINCT terms
    (duplicate terms count once, the ``isin`` semantics) fanned out by
    a broadcast ``(query_id, term)`` join; the vector tower is ONE scan
    of the embedding table against the broadcast query-vector set (the
    same amortization ``knn_search`` does); both legs rank with
    ``row_number`` windows PARTITIONED BY query_id — per-query
    truncation without per-query plans — and the RRF fuse joins on
    ``(query_id, id)``."""
    from pyspark.sql import Window

    from ..functions.tokenize import normalize_query_terms
    from .invindex import (
        _collect_query_batch,
        _pruned_union_postings,
    )

    spark = queries.sparkSession
    rows = _collect_query_batch(
        queries.select("query_id", "terms"),
        "hybrid_search_rrf_indexed_batch")
    qplan = []
    for r in rows:
        lt = normalize_query_terms(list(r.terms), idx.tokenize_mode)
        if not lt:
            raise ValueError(
                "hybrid_search_rrf_indexed_batch: query "
                f"{r.query_id} has no terms after normalization")
        qplan.append((r.query_id, sorted(set(lt))))   # isin: once each
    qterms = spark.createDataFrame(
        [(qid, t) for qid, ts in qplan for t in ts],
        "query_id long, term string",
    )
    uniq = sorted({t for _, ts in qplan for t in ts})
    per_term = (
        _pruned_union_postings(idx, uniq)
        .select("term", "id", "pos")
        .distinct()                      # crash-window append duplicates
        .groupBy("term", "id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tf = (
        per_term.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "id")
        .agg(F.sum("c").cast("int").alias("tf"))
    )
    w_lex = Window.partitionBy("query_id").orderBy(
        F.col("tf").desc(), F.col("id").asc())
    lex = tf.withColumn("lex_rank", F.row_number().over(w_lex)) \
        .filter(F.col("lex_rank") <= depth) \
        .select("query_id", "id", "lex_rank")

    sims = (
        emb.crossJoin(F.broadcast(qvecs.select("query_id", "qvec")))
        .select(
            "query_id",
            F.col(vec_id_col).alias("id"),
            cosine_similarity(F.col(vec_col), F.col("qvec")).alias("sim"),
        )
    )
    w_vec = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("id").asc())
    vec = sims.withColumn("vec_rank", F.row_number().over(w_vec)) \
        .filter(F.col("vec_rank") <= depth) \
        .select("query_id", "id", "vec_rank")

    score = (
        F.coalesce(1.0 / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("vec_rank")), F.lit(0.0))
    )
    fused = lex.join(vec, ["query_id", "id"], "full_outer").select(
        "query_id", "id", "lex_rank", "vec_rank",
        F.floor(score * 1e6 + F.lit(0.5)).cast("long").alias("rrf_e6"),
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.col("rrf_e6").desc(), F.col("id").asc())
    return (
        fused.withColumn("__rn", F.row_number().over(w_f))
        .filter(F.col("__rn") <= k)
        .select("query_id", "id", "lex_rank", "vec_rank", "rrf_e6")
        .orderBy("query_id", F.col("rrf_e6").desc(), F.col("id").asc())
    )


def render_hybrid_rrf_batch_sql(queries: list[tuple[int, list[str]]],
                                k: int = 10, depth: int = 50) -> str:
    """DuckDB oracle for the batch hybrid — the single-query oracle
    generalized: query vectors are the embeddings whose ``vec_id``
    equals the query_id (the registry's convention), the term sets a
    VALUES literal, every window partitioned by query_id."""
    from ..functions.tokenize import normalize_query_terms

    qvals = ", ".join(
        f"({qid}, '" + t.replace("'", "''") + "')"
        for qid, terms in queries
        for t in sorted(set(normalize_query_terms(terms, "space")))
    )
    ids = ", ".join(str(qid) for qid, _ in queries)
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
           FROM embeddings WHERE vec_id IN ({ids})),
qterms(query_id, term) AS (VALUES {qvals}),
dtok AS (
  SELECT doc_id AS id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
tf AS (
  SELECT qt.query_id, d.id, CAST(count(*) AS INTEGER) AS tf
  FROM dtok d JOIN qterms qt USING (term)
  GROUP BY qt.query_id, d.id
),
lex AS (
  SELECT query_id, id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY tf DESC, id) AS lex_rank
  FROM tf QUALIFY lex_rank <= {depth}
),
sims AS (
  SELECT q.query_id, e.vec_id AS id,
         (SELECT sum(u.a * u.b)
          FROM (SELECT unnest(e.embedding) AS a, unnest(q.qvec) AS b) u)
         / (sqrt((SELECT sum(u.a * u.a)
                  FROM (SELECT unnest(e.embedding) AS a) u))
            * sqrt((SELECT sum(u.b * u.b)
                    FROM (SELECT unnest(q.qvec) AS b) u))) AS sim
  FROM embeddings e CROSS JOIN q
),
vec AS (
  SELECT query_id, id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, id) AS vec_rank
  FROM sims QUALIFY vec_rank <= {depth}
),
fused AS (
  SELECT coalesce(lex.query_id, vec.query_id) AS query_id,
         coalesce(lex.id, vec.id) AS id, lex_rank, vec_rank,
         CAST(floor((coalesce(CAST(1 AS DOUBLE) / (60 + lex_rank), 0)
                     + coalesce(CAST(1 AS DOUBLE) / (60 + vec_rank), 0))
                    * 1e6 + 0.5) AS BIGINT) AS rrf_e6
  FROM lex FULL OUTER JOIN vec
       ON lex.query_id = vec.query_id AND lex.id = vec.id
)
SELECT CAST(query_id AS BIGINT) AS query_id, id, lex_rank, vec_rank,
       rrf_e6
FROM fused
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY rrf_e6 DESC, id) <= {k}
ORDER BY query_id, rrf_e6 DESC, id
"""


def render_hybrid_rrf_sql(terms: list[str], k: int = 10,
                          depth: int = 50) -> str:
    """DuckDB oracle for ``hybrid_search_rrf`` over the test tables
    (query vector = embedding of vec_id 0, as the registry query uses)."""
    from ..functions.tokenize import normalize_query_terms

    term_list = ", ".join(
        "'" + t.replace("'", "''") + "'"
        for t in normalize_query_terms(terms, "space"))
    return f"""
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
tf AS (
  SELECT doc_id AS id,
         len(list_filter(string_split(lower(text), ' '),
                         t -> t IN ({term_list}))) AS tf
  FROM documents
),
lex AS (
  SELECT id, row_number() OVER (ORDER BY tf DESC, id) AS lex_rank
  FROM tf WHERE tf > 0 QUALIFY lex_rank <= {depth}
),
sims AS (
  SELECT e.vec_id AS id,
         (SELECT sum(u.a * u.b)
          FROM (SELECT unnest(e.embedding) AS a, unnest(q.qvec) AS b) u)
         / (sqrt((SELECT sum(u.a * u.a)
                  FROM (SELECT unnest(e.embedding) AS a) u))
            * sqrt((SELECT sum(u.b * u.b)
                    FROM (SELECT unnest(q.qvec) AS b) u))) AS sim
  FROM embeddings e CROSS JOIN q
),
vec AS (
  SELECT id, row_number() OVER (ORDER BY sim DESC, id) AS vec_rank
  FROM sims QUALIFY vec_rank <= {depth}
)
SELECT coalesce(lex.id, vec.id) AS id, lex_rank, vec_rank,
       CAST(floor((coalesce(CAST(1 AS DOUBLE) / (60 + lex_rank), 0)
                   + coalesce(CAST(1 AS DOUBLE) / (60 + vec_rank), 0))
                  * 1e6 + 0.5)
            AS BIGINT) AS rrf_e6
FROM lex FULL OUTER JOIN vec ON lex.id = vec.id
ORDER BY rrf_e6 DESC, id
LIMIT {k}
"""
