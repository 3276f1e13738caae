"""Distributed BPE training (Sennrich, Haddow & Birch 2016, ACL —
public): learn merge rules from corpus statistics, the step real LLM
pipelines run before ``tokenize`` can exist (the repo's
``textstats.tokenize_bpeish`` APPLIES a fixed scheme; this TRAINS one).

BPE trains on word TYPES weighted by corpus frequency: count adjacent
symbol pairs across all words, merge the most frequent pair everywhere,
repeat.  The distributed shape per round is one explode + one partial
agg (pair counts) + one 1-row argmax + one codegen ``replace`` over the
word table — the only driver traffic is the single winning pair per
round (a scalar decision, the same cadence as a KMeans centroid update;
contrast PageRank where the whole recurrence is data-parallel and zero
driver actions are needed).

Representation — the trick that makes the DuckDB oracle exact: a word's
symbol sequence is a STRING with every symbol wrapped in ``\\x1f`` (unit
separator, absent from any text corpus): ``abc`` →
``␟a␟␟b␟␟c␟``.  Applying merge (a, b) is then one LITERAL
``replace(rep, ␟a␟␟b␟, ␟ab␟)`` — and SQL ``replace`` scans
left-to-right non-overlapping, which IS BPE's greedy merge order
(``aaa`` + merge(a,a) → ``(aa)(a)``), so Spark and DuckDB replicate the
whole training loop value-for-value with no UDF on either side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"


def _word_freqs(docs: DataFrame, text_col: str,
                tokenize_mode: str = "space") -> DataFrame:
    from ..functions.tokenize import tokens_col

    return (
        docs.select(
            F.explode(tokens_col(F.lower(F.col(text_col)), tokenize_mode))
            .alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _rep(col: Column) -> Column:
    # wrap every codepoint: 'abc' -> '␟a␟␟b␟␟c␟'
    return F.regexp_replace(col, "(.)", SEP + "$1" + SEP)


def _symbols(rep: Column) -> Column:
    return F.split(rep.substr(F.lit(2), F.length(rep) - 2),
                   SEP + SEP)


def _pair_counts(words: DataFrame) -> DataFrame:
    syms = _symbols(F.col("rep"))
    pairs = words.select(
        F.explode(
            F.when(
                F.size(syms) >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size(syms) - 2),
                    lambda i: F.struct(
                        F.element_at(syms, i + 1).alias("a"),
                        F.element_at(syms, i + 2).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast(
                "array<struct<a:string,b:string>>")),
        ).alias("p"),
        "freq",
    )
    return (
        pairs.select("p.a", "p.b", "freq")
        .groupBy("a", "b")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


#: Word-TYPE count below which training collects the vocabulary once and
#: finishes every merge locally (the knn.py:_MAX_QUERY_ROWS-style driver
#: ceiling).  1M types ≈ tens of MB on the driver — comfortable; above it
#: the exact distributed rounds run instead.
_LOCAL_VOCAB_CEILING = 1_000_000


def bpe_train_merges(docs: DataFrame, text_col: str,
                     n_merges: int = 8,
                     local_vocab_ceiling: int = _LOCAL_VOCAB_CEILING,
                     tokenize_mode: str = "space",
                     stats: dict | None = None) -> DataFrame:
    """Train ``n_merges`` BPE merge rules; returns the merge table
    ``(round, left_sym, right_sym, pair_count)`` — integers and strings
    only, bit-identical across engines (ties broken ``cnt DESC, a ASC,
    b ASC`` in binary collation on both sides; Python string comparison
    is codepoint order == UTF-8 byte order, so the local path ties
    identically).

    HYBRID execution (VERDICT r7 task 3): one corpus aggregation reduces
    100 TB of text to its word-TYPE table — whose ROW COUNT never
    changes across merges (replace rewrites reps in place).  When that
    vocabulary fits under ``local_vocab_ceiling`` it is collected ONCE
    and all ``n_merges`` rounds run locally with byte-identical greedy
    semantics (incremental pair counts + a lazy max-heap — the standard
    tokenizer-trainer loop), eliminating the 2-Spark-jobs-per-merge
    cadence that made a realistic 30k-merge vocabulary driver-bound
    (measured: 1,024 merges at sf0.1 in seconds vs ~35 min of job
    round-trips; tools/bpe_scale_smoke.py).  Above the ceiling the
    distributed rounds run, BATCHED (VERDICT r8 task 3) via an exact
    affected-sub-corpus greedy replay — provably identical to
    sequential greedy (see :func:`_train_merges_distributed`), dozens
    to hundreds of merges per distributed round on realistic count
    distributions, single-merge fallback in degenerate rounds.  One
    explode + partial-agg pair count + bounded collects + codegen
    literal replace chain per round — no UDF, driver data bounded by
    the same ceiling discipline as the hybrid path.  ``stats``
    (optional dict) receives ``{"path": "local"|"distributed",
    "rounds": N}``."""
    spark = docs.sparkSession
    wf = _word_freqs(docs, text_col, tokenize_mode) \
        .localCheckpoint(eager=True)
    if wf.count() <= local_vocab_ceiling:
        merges = _train_merges_local(
            [(r["w"], int(r["freq"])) for r in wf.collect()], n_merges)
        if stats is not None:
            stats["path"], stats["rounds"] = "local", 1
    else:
        merges = _train_merges_distributed(wf, n_merges, stats=stats)
    return spark.createDataFrame(
        merges, "round int, left_sym string, right_sym string, "
                "pair_count long",
    )


def _train_merges_distributed(wf: DataFrame,
                              n_merges: int,
                              batch_scan: int = 4096,
                              top_j: int = 256,
                              w_cap: int = _LOCAL_VOCAB_CEILING,
                              stats: dict | None = None,
                              ) -> list[tuple[int, str, str, int]]:
    """Distributed rounds with PROVABLY-SEQUENTIAL merge batching
    (VERDICT r8 task 3), via an AFFECTED-SUB-CORPUS simulation: per
    round, one distributed pair count feeds an exact driver-side greedy
    replay over only the words that can change, and the resulting merge
    batch is applied back to the full corpus in one codegen replace
    chain.  Per round:

    1. count pairs, collect the top ``batch_scan`` rows sorted
       ``(cnt DESC, a ASC, b ASC)``; every uncollected pair has count
       ≤ ``c_k`` (the last collected row);
    2. collect the current global SYMBOL set (bounded: the alphabet
       plus one symbol per past merge);
    3. collect W = the words containing any of the top ``top_j`` pairs
       (shrinking ``top_j`` 4x at a time if W would exceed ``w_cap``
       word types — the same driver ceiling the hybrid local path
       uses);
    4. run the incremental greedy trainer (the ``_train_merges_local``
       machinery) on W ALONE, with each top-K pair's count corrected by
       a constant ``outside = global − local(W)`` term;
    5. apply the simulated merges, in order, as one literal-replace
       chain over the distributed word table.

    Why the simulation is EXACT sequential greedy:

    - a word containing no merged pair is a replace no-op, so merging
      a top-J pair rewrites only W (every word containing a top-J pair
      is in W by construction) — all count DELTAS happen inside W and
      the sim tracks them exactly; the ``outside`` term never changes;
    - merges only create adjacencies INVOLVING the new symbol, so an
      original-symbol pair can never gain occurrences: every pair
      outside the collected top-K stays ≤ ``c_k`` forever;
    - a pair involving a FRESH created symbol (one not in the global
      symbol set) cannot occur outside W at all — its count is fully
      known (outside 0) and it is freely mergeable;
    - the sim therefore stops (ending the round and forcing a
      distributed recount) exactly when sequential greedy's next pick
      is not certain or not locally applicable: when the winner's
      count falls to ``c_k`` (an uncollected pair could tie or win),
      when the winner is a known top-K pair outside top-J (its
      occurrences extend beyond W, so the rewrite cannot be simulated),
      or just after a merge whose created symbol COLLIDES with an
      existing one (e.g. (a, bc) and (ab, c) both spell "abc" — the
      collided pairs' outside occurrences poison further bookkeeping);
    - ties among fully-known pairs resolve by the exact
      ``(cnt DESC, a ASC, b ASC)`` order both engines use, so unlike
      prefix-style batching this replay takes no tie penalty, handles
      self-pairs ("aaa" runs) through the real per-word apply, and
      keeps batching straight through interference.

    The recorded per-merge counts are the sim's exact global counts —
    identical to what single-step sequential rounds would record
    (pytest-pinned against ``_train_merges_local`` on tie-free,
    tie-heavy, self-pair, truncated-scan and randomized corpora).
    Driver traffic per round: top-K pair rows + the symbol set + the W
    word subset (≤ ``w_cap``); when even ``top_j = 1`` overflows
    ``w_cap`` the round degrades to the classic single top-pair merge,
    which is always correct."""
    import heapq
    from collections import Counter
    from functools import reduce
    from operator import or_

    words = wf.select(_rep(F.col("w")).alias("rep"), "freq") \
        .localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        rows = (
            _pair_counts(words)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(),
                     F.col("b").asc())
            .limit(batch_scan)
            .collect()
        )
        if not rows:
            break
        rounds += 1
        complete = len(rows) < batch_scan
        c_k = -1 if complete else int(rows[-1]["cnt"])
        global_cnt = {(r["a"], r["b"]): int(r["cnt"]) for r in rows}

        # global symbol set: alphabet + one symbol per past merge
        syms = {
            r["s"] for r in words.select(
                F.explode(_symbols(F.col("rep"))).alias("s")
            ).distinct().collect()
        }

        # adaptive affected-word collect
        j = min(top_j, len(rows))
        wrows = None
        while j >= 1:
            cond = reduce(or_, [
                F.col("rep").contains(SEP + r["a"] + SEP + SEP
                                      + r["b"] + SEP)
                for r in rows[:j]
            ])
            cand = words.filter(cond)
            if cand.count() <= w_cap:
                wrows = cand.collect()
                break
            j //= 4
        topj_set = {(r["a"], r["b"]) for r in rows[:j]} if wrows else set()

        if wrows:
            batch = _sim_merges(
                [(r["rep"], int(r["freq"])) for r in wrows],
                n_merges - len(merges), global_cnt, topj_set, syms, c_k,
            )
        else:
            batch = []
        if not batch:
            # degenerate round: classic single top-pair merge
            r0 = rows[0]
            batch = [(r0["a"], r0["b"], int(r0["cnt"]))]

        rep = F.col("rep")
        for a, b, cnt in batch:
            merges.append((len(merges), a, b, cnt))
            rep = F.replace(
                rep,
                F.lit(SEP + a + SEP + SEP + b + SEP),
                F.lit(SEP + a + b + SEP),
            )
        words = words.select(rep.alias("rep"), "freq") \
            .localCheckpoint(eager=True)
    if stats is not None:
        stats["path"], stats["rounds"] = "distributed", rounds
    return merges


def _sim_merges(rep_freqs: list[tuple[str, int]], budget: int,
                global_cnt: dict, topj: set, syms: set,
                c_k: int) -> list[tuple[str, str, int]]:
    """Exact greedy replay over the affected sub-corpus W (see
    ``_train_merges_distributed`` for the soundness argument).  Same
    incremental count/heap machinery as ``_train_merges_local``, with
    three gates: a pair's GLOBAL count is its W-local count plus a
    constant outside term (known only for collected top-K pairs and for
    pairs involving fresh created symbols, where it is 0); the winner
    must strictly beat ``c_k`` (the uncollected-pair ceiling); and the
    winner must be rewritable inside W alone (top-J or fresh-symbol
    pairs).  Returns ``(a, b, global_count)`` merges in order."""
    import heapq
    from collections import Counter

    words: list[list[str]] = [
        rep[1:-1].split(SEP + SEP) for rep, _ in rep_freqs
    ]
    freqs = [f for _, f in rep_freqs]
    local = Counter()
    pair_words: dict = {}
    for wi, s in enumerate(words):
        for p, c in Counter(zip(s, s[1:])).items():
            local[p] += c * freqs[wi]
            pair_words.setdefault(p, set()).add(wi)
    outside = {p: g - local.get(p, 0) for p, g in global_cnt.items()}
    fresh: set = set()

    def known(p) -> bool:
        return p in outside or p[0] in fresh or p[1] in fresh

    def gcnt(p) -> int:
        return local.get(p, 0) + outside.get(p, 0)

    def mergeable(p) -> bool:
        return p in topj or p[0] in fresh or p[1] in fresh

    heap = [(-gcnt(p), p[0], p[1]) for p in outside]
    heapq.heapify(heap)
    out: list[tuple[str, str, int]] = []
    while len(out) < budget:
        best = None
        while heap:
            negc, a, b = heapq.heappop(heap)
            p = (a, b)
            cur = gcnt(p)
            if cur <= 0 or not known(p):
                continue
            if cur == -negc:
                best = (a, b, cur)
                break
            heapq.heappush(heap, (-cur, a, b))
        if best is None:
            break
        a, b, cnt = best
        if cnt <= c_k:
            break           # an uncollected pair could tie or win
        if not mergeable((a, b)):
            break           # winner's occurrences extend beyond W
        out.append((a, b, cnt))
        ab = a + b
        collided = ab in syms or ab in fresh
        if not collided:
            fresh.add(ab)
        # apply the merge to W, incrementally (the local-trainer loop)
        touched: set = set()
        for wi in sorted(pair_words.get((a, b), set())):
            old = words[wi]
            new, i, n = [], 0, len(old)
            while i < n:
                if i < n - 1 and old[i] == a and old[i + 1] == b:
                    new.append(ab)
                    i += 2
                else:
                    new.append(old[i])
                    i += 1
            oc = Counter(zip(old, old[1:]))
            nc = Counter(zip(new, new[1:]))
            f = freqs[wi]
            for p, c in oc.items():
                if nc.get(p) != c:
                    local[p] += (nc.get(p, 0) - c) * f
                    touched.add(p)
                if p not in nc:
                    pair_words[p].discard(wi)
            for p, c in nc.items():
                if oc.get(p) != c:
                    if p not in oc:
                        local[p] += c * f
                        pair_words.setdefault(p, set()).add(wi)
                    touched.add(p)
            words[wi] = new
        local.pop((a, b), None)
        outside.pop((a, b), None)
        pair_words.pop((a, b), None)
        if collided:
            break           # new pairs' outside occurrences unknown
        for p in touched:
            if known(p) and gcnt(p) > 0:
                heapq.heappush(heap, (-gcnt(p), p[0], p[1]))
    return out


def _train_merges_local(word_freqs: list[tuple[str, int]],
                        n_merges: int) -> list[tuple[int, str, str, int]]:
    """Driver-side finisher, byte-identical to the distributed rounds
    (pytest-pinned): same all-adjacent-positions pair counting (``aaa``
    counts (a,a) twice), same left-to-right non-overlapping greedy
    apply (``aaa`` + merge(a,a) → ``(aa)(a)`` — the SQL ``replace``
    order), same ``(cnt DESC, a ASC, b ASC)`` selection.  Incremental:
    each merge re-counts only the words that CONTAIN the winning pair;
    a lazy max-heap (stale entries re-pushed at their current count on
    pop) keeps selection O(log P) amortized."""
    import heapq
    from collections import Counter

    words: list[list[str]] = [list(w) for w, _ in word_freqs]
    freqs: list[int] = [f for _, f in word_freqs]
    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        for p, c in Counter(zip(syms, syms[1:])).items():
            pair_counts[p] += c * freqs[wi]
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-c, a, b) for (a, b), c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(n_merges):
        best = None
        while heap:
            negc, a, b = heapq.heappop(heap)
            cur = pair_counts.get((a, b), 0)
            if cur == -negc:
                best = (a, b, cur)
                break
            if cur > 0:
                # stale entry (count decreased since push): re-push the
                # TRUE count so the pair stays selectable
                heapq.heappush(heap, (-cur, a, b))
        if best is None:
            break
        a, b, cnt = best
        merges.append((rnd, a, b, cnt))
        ab = a + b
        touched: set[tuple[str, str]] = set()
        for wi in sorted(pair_words.get((a, b), set())):
            old = words[wi]
            new, i, n = [], 0, len(old)
            while i < n:
                if i < n - 1 and old[i] == a and old[i + 1] == b:
                    new.append(ab)
                    i += 2
                else:
                    new.append(old[i])
                    i += 1
            oc = Counter(zip(old, old[1:]))
            nc = Counter(zip(new, new[1:]))
            f = freqs[wi]
            for p, c in oc.items():
                if nc.get(p) != c:
                    pair_counts[p] += (nc.get(p, 0) - c) * f
                    touched.add(p)
                if p not in nc:
                    pair_words[p].discard(wi)
            for p, c in nc.items():
                if oc.get(p) != c:
                    if p not in oc:
                        pair_counts[p] += c * f
                        pair_words.setdefault(p, set()).add(wi)
                    touched.add(p)
            words[wi] = new
        pair_counts.pop((a, b), None)
        pair_words.pop((a, b), None)
        for p in touched:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p[0], p[1]))
            else:
                pair_counts.pop(p, None)
                pair_words.pop(p, None)
    return merges


def bpe_apply(docs: DataFrame, text_col: str, id_col: str,
              merges: list[tuple[str, str]],
              tokenize_mode: str = "space") -> DataFrame:
    """Tokenize with a trained merge list: ``(id, word_pos, tokens)``
    per word — the learned subword segmentation.  ``detokenize`` is
    ``concat_ws('', tokens)`` per word joined on spaces (pytest pins the
    round trip).  Same literal-replace chain as training, applied in
    merge order."""
    from ..functions.tokenize import tokens_col

    w = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens_col(F.lower(F.col(text_col)), tokenize_mode))
        .alias("word_pos", "w"),
    ).filter(F.col("w") != "")
    rep = _rep(F.col("w"))
    for a, b in merges:
        rep = F.replace(rep, F.lit(SEP + a + SEP + SEP + b + SEP),
                        F.lit(SEP + a + b + SEP))
    return w.select("id", "word_pos", _symbols(rep).alias("tokens"))


def render_bpe_train_sql(n_merges: int = 8) -> str:
    """DuckDB oracle: the training loop unrolled as MATERIALIZED CTEs
    (the PageRank recipe) — same representation, same replace, same
    tie-break."""
    union = " UNION ALL ".join(
        f"SELECT round, a, b, cnt FROM m{r}" for r in range(n_merges)
    )
    return (
        "WITH " + ",".join(_train_cte_parts(n_merges))
        + f"""
SELECT round, a AS left_sym, b AS right_sym, cnt AS pair_count
FROM ({union}) ORDER BY round
"""
    )


def _train_cte_parts(n_merges: int) -> list[str]:
    """The training chain as CTE strings (w0..w{n-1}, p*, m*) — shared by
    the train and tokenize oracles."""
    sep = "chr(31)"
    parts = [f"""
w0 AS MATERIALIZED (
  SELECT regexp_replace(w, '(.)', {sep} || '\\1' || {sep}, 'g') AS rep,
         freq
  FROM (
    SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ) WHERE w <> '' GROUP BY w
  )
)"""]
    for r in range(n_merges):
        parts.append(f"""
p{r} AS MATERIALIZED (
  SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT t.toks[u.i] AS a, t.toks[u.i + 1] AS b, t.freq
    FROM (
      SELECT string_split(substr(rep, 2, length(rep) - 2),
                          {sep} || {sep}) AS toks, freq
      FROM w{r}
    ) t, unnest(range(1, len(t.toks))) AS u(i)
  ) GROUP BY a, b
)""")
        parts.append(f"""
m{r} AS MATERIALIZED (
  SELECT {r} AS round, a, b, cnt FROM p{r}
  ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
)""")
        if r + 1 < n_merges:
            # LEFT JOIN ON TRUE, not a cross join: when a degenerate
            # corpus exhausts merge pairs early, m{r} is EMPTY and a
            # cross join would silently empty every later word table
            # (the Spark leg breaks out of the loop and keeps its words)
            parts.append(f"""
w{r + 1} AS MATERIALIZED (
  SELECT CASE WHEN m{r}.a IS NULL THEN w{r}.rep
              ELSE replace(w{r}.rep,
                           {sep} || m{r}.a || {sep} || {sep} || m{r}.b || {sep},
                           {sep} || m{r}.a || m{r}.b || {sep}) END AS rep,
         w{r}.freq
  FROM w{r} LEFT JOIN m{r} ON TRUE
)""")
    return parts


def render_bpe_tokenize_sql(n_merges: int = 8, doc_limit: int = 50) -> str:
    """DuckDB oracle for the train→apply round trip: re-run the training
    chain, apply the FINAL merge to get every word type's fully-merged
    representation, strip separators to recover the raw word, and join
    each doc's word stream against that map — per-doc word and token
    counts value-hash, and the separator-strip IS the detokenize
    round-trip proof (a rep that didn't reassemble to its word would
    break the join and the counts)."""
    sep = "chr(31)"
    r = n_merges - 1
    parts = _train_cte_parts(n_merges)
    parts.append(f"""
wfinal AS MATERIALIZED (
  SELECT CASE WHEN m{r}.a IS NULL THEN w{r}.rep
              ELSE replace(w{r}.rep,
                           {sep} || m{r}.a || {sep} || {sep} || m{r}.b || {sep},
                           {sep} || m{r}.a || m{r}.b || {sep}) END AS rep,
         w{r}.freq
  FROM w{r} LEFT JOIN m{r} ON TRUE
)""")
    parts.append(f"""
wmap AS (
  SELECT replace(rep, {sep}, '') AS w,
         CAST(len(string_split(substr(rep, 2, length(rep) - 2),
                               {sep} || {sep})) AS BIGINT)
           AS n_word_tokens
  FROM wfinal
)""")
    parts.append(f"""
docw AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
    FROM documents WHERE doc_id < {doc_limit}
  ) WHERE w <> ''
)""")
    return (
        "WITH " + ",".join(parts)
        + """
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(m.n_word_tokens) AS BIGINT) AS n_tokens,
       CAST(1 AS BOOLEAN) AS detok_roundtrip
FROM docw d JOIN wmap m ON m.w = d.w
GROUP BY d.doc_id ORDER BY d.doc_id
"""
    )
