"""Text-analysis operators for training-data pipelines.

All pure built-in expressions (whole-stage codegen, no Python):
- ``token_stats``      — token/char counts, mean token length
- ``quality_score``    — length/punct/stopword/dup-ratio heuristics
- ``language_id``      — stopword-profile n-gram-free heuristic language ID
- ``doc_fingerprint``  — polynomial rolling hash over characters
- ``tokenize_bpeish``  — regex word+punct tokenization (BPE-ish pre-tokenizer)
- ``ngram_logprob_score`` — stupid-backoff bigram LM quality signal
                         (CCNet-style perplexity proxy)
- ``strip_boilerplate_lines`` — MassiveText-style cross-doc repeated-line
                         removal (order-preserving)

Every operator keeps the formula simple enough to mirror exactly in the
DuckDB oracle (same split semantics, same rational arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles (public common words).  The heuristic
# counts token hits per profile and argmaxes — the standard cheap language-ID
# baseline for corpus triage.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "para"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "dans", "pour", "que"],
    "zh": ["的", "了", "是", "我", "不", "在", "有", "他", "这", "中"],
}

#: BPE-ish pre-tokenizer: word pieces or single non-space-non-word chars
#: (the GPT-2 pre-tokenizer shape, minus unicode categories).
BPEISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

ROLLING_BASE = 31
ROLLING_MOD = 1_000_000_007


def _tokens(text_col: str, tokenize_mode: str = "space") -> Column:
    from ..functions.tokenize import tokens_col

    return tokens_col(F.col(text_col), tokenize_mode)


def token_stats(df: DataFrame, text_col: str, id_col: str,
                tokenize_mode: str = "space") -> DataFrame:
    """Per-doc token statistics: ``(id, n_tokens, n_distinct_tokens, n_chars,
    mean_token_len)``.

    ``tokenize_mode`` (r8, default unchanged): ``"regex"`` tokenizes with
    the shared cross-engine word pattern (``functions.tokenize``) —
    punctuation stops inflating the distinct count on real corpora.  In
    regex mode ``mean_token_len`` is the exact sum-of-token-lengths over
    count (the space-mode separator identity no longer holds), NULL on a
    token-free doc."""
    toks = _tokens(text_col, tokenize_mode)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    if tokenize_mode == "space":
        # mean token length = (chars - separators) / tokens, exact rational
        mean_len = F.round(
            (n_chars - (n_tokens - 1)).cast("double") / n_tokens, 6
        )
    else:
        tok_chars = F.aggregate(toks, F.lit(0),
                                lambda acc, t: acc + F.length(t))
        mean_len = F.when(
            n_tokens > 0,
            F.round(tok_chars.cast("double") / n_tokens, 6),
        )
    return df.select(
        F.col(id_col).alias("id"),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        n_chars.cast("long").alias("n_chars"),
        mean_len.alias("mean_token_len"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic quality signals: ``(id, n_tokens, distinct_ratio,
    punct_ratio, stopword_ratio, quality)``.

    quality = distinct_ratio * (1 - punct_ratio) * clamp(n_tokens / 100, 0, 1)
    — a toy but deterministic composite of the standard corpus-filter
    signals (repetition, punctuation density, length).
    """
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), "[^A-Za-z0-9 ]", "")
    )
    en = STOPWORDS["en"]
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(en))
    )
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    punct_ratio = n_punct.cast("double") / n_chars
    length_factor = F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
    return df.select(
        F.col(id_col).alias("id"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_hits.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(distinct_ratio * (1.0 - punct_ratio) * length_factor, 6).alias(
            "quality"
        ),
    )


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-profile language ID: ``(id, pred_lang, score)``.

    score(lang) = number of tokens found in that language's stopword list;
    predicted = argmax, ties broken alphabetically (deterministic).
    """
    toks = _tokens(text_col)
    scores = F.array(
        *[
            F.struct(
                F.size(F.filter(toks, lambda t: t.isin(words))).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(STOPWORDS.items())
        ]
    )
    # array_max on struct compares fieldwise: (score, lang); to get
    # alphabetical tie-break on max score, compare (score, reversed-rank) —
    # simplest deterministic form: sort desc by score then asc by lang.
    best = F.array_sort(
        scores,
        lambda a, b: F.when(a["score"] > b["score"], -1)
        .when(a["score"] < b["score"], 1)
        .when(a["lang"] < b["lang"], -1)
        .when(a["lang"] > b["lang"], 1)
        .otherwise(0),
    )[0]
    return df.select(
        F.col(id_col).alias("id"),
        best["lang"].alias("pred_lang"),
        best["score"].cast("long").alias("score"),
    )


def doc_fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint over characters:
    ``h = fold(h * 31 + codepoint(c) mod 1e9+7)`` — ``(id, fingerprint)``.

    Pure ``aggregate`` over the char array; stays well inside bigint range
    (acc < 1e9+7, so acc*31 + c < 2^35 — safe under ANSI mode).
    """
    chars = F.split(F.col(text_col), "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + F.ascii(c)) % ROLLING_MOD,
    )
    return df.select(F.col(id_col).alias("id"), fp.alias("fingerprint"))


def tokenize_bpeish(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Regex pre-tokenization (BPE-ish): ``(id, n_pieces, n_word_pieces,
    n_other_pieces)`` — counts, not the piece arrays, to keep outputs
    scalar-typed for the oracle hash."""
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPEISH_PATTERN), 0)
    words = F.filter(pieces, lambda p: p.rlike("^[A-Za-z]+$"))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(pieces).cast("long").alias("n_pieces"),
        F.size(words).cast("long").alias("n_word_pieces"),
        (F.size(pieces) - F.size(words)).cast("long").alias("n_other_pieces"),
    )


def corpus_lang_summary(df: DataFrame, text_col: str, lang_col: str) -> DataFrame:
    """Per-language corpus aggregates over the labeled lang column:
    ``(lang, n_docs, total_tokens, avg_chars)`` — the per-lang triage view."""
    toks = _tokens(text_col)
    return (
        df.groupBy(F.col(lang_col).alias("lang"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(toks)).alias("total_tokens"),
            F.round(
                F.sum(F.length(F.col(text_col))).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("avg_chars"),
        )
        .orderBy("lang")
    )


def strip_boilerplate_lines(df: DataFrame, text_col: str, id_col: str,
                            max_line_docs: int = 10,
                            min_line_chars: int = 10) -> DataFrame:
    """Line-level boilerplate removal (the MassiveText/Gopher recipe,
    public knowledge): a LINE occurring in more than ``max_line_docs``
    distinct documents is navigation/footer/cookie-banner boilerplate —
    strip it from every document while keeping the rest of the doc.

    Lines shorter than ``min_line_chars`` are never stripped (short lines
    collide by chance, and headings/bullets are legitimate).  Document
    structure (line order) is preserved via posexplode + re-aggregation
    ordered by position.

    Plan: explode to (id, pos, line) → md5 the line so the frequency
    aggregation shuffles 16-byte keys → distinct-doc count per line hash →
    join the hot set back (usually tiny — only lines crossing the
    threshold — so AQE picks a broadcast join; left unhinted because a
    boilerplate-heavy web crawl can make it genuinely large) → re-assemble
    with ``array_join(sort_array)``.

    Output: ``(id, text, n_lines_kept, n_lines_dropped)``.
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("lh", F.md5("line"))
    freq = (
        lines.filter(F.length("line") >= min_line_chars)
        .groupBy("lh")
        .agg(F.count_distinct("id").alias("ndocs"))
        .filter(F.col("ndocs") > max_line_docs)
        .select("lh")
    )
    tagged = lines.join(freq.withColumn("__hot", F.lit(True)), "lh", "left")
    kept = tagged.withColumn(
        "drop",
        F.col("__hot").isNotNull() & (F.length("line") >= min_line_chars),
    )
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("drop"),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda s: s.line,
            ),
            "\n",
        ).alias("text"),
        F.sum(F.when(~F.col("drop"), 1).otherwise(0)).alias("n_lines_kept"),
        F.sum(F.when(F.col("drop"), 1).otherwise(0)).alias("n_lines_dropped"),
    )
    return rebuilt.orderBy("id")


def ngram_logprob_score(df: DataFrame, text_col: str, id_col: str,
                        ref_df: DataFrame | None = None,
                        backoff_alpha: float = 0.4) -> DataFrame:
    """Language-model quality score (CCNet-style filtering signal, public
    knowledge): per-doc mean bigram log-probability under a stupid-backoff
    bigram model (Brants et al. 2007) trained on ``ref_df`` (default: the
    corpus itself).  Gibberish and boilerplate-shredded text scores low;
    fluent text scores high — the standard cheap perplexity proxy used to
    rank web documents for pretraining.

    ``P(w2|w1) = count(w1 w2)/count(w1)`` when the bigram was seen, else
    ``alpha · count(w2)/total`` (unseen w2 → alpha/total).  Everything is a
    keyed aggregation or join: bigram/unigram count tables (map-side
    combined), two joins back onto the doc bigram stream, one final
    per-doc aggregation.  The count tables are corpus-vocabulary-sized —
    genuine distributed joins, no broadcast assumption.

    Output: ``(id, n_bigrams, avg_logprob)`` — rounded to 6 decimals;
    docs with fewer than 2 tokens get NULL avg_logprob (no bigrams).

    Prefer an external ``ref_df`` (the CCNet recipe trains on Wikipedia):
    under a self-trained MLE model a doc whose tokens appear nowhere else
    scores P=1 on its own bigrams (hapax-over-hapax), masking exactly the
    gibberish the score should catch.
    """
    ref = ref_df if ref_df is not None else df

    def bigrams(frame: DataFrame, with_id: bool) -> DataFrame:
        toks = _tokens(text_col)
        starts = F.when(
            F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
        ).otherwise(F.array().cast("array<int>"))
        pair = F.explode(
            F.transform(
                starts,
                lambda i: F.struct(
                    F.element_at(toks, i).alias("w1"),
                    F.element_at(toks, i + 1).alias("w2"),
                ),
            )
        ).alias("bg")
        cols = [F.col(id_col).alias("id"), pair] if with_id else [pair]
        return frame.select(*cols).select(
            *(["id"] if with_id else []), "bg.w1", "bg.w2"
        )

    uni = ref.select(F.explode(_tokens(text_col)).alias("tok")) \
        .groupBy("tok").agg(F.count(F.lit(1)).alias("uc"))
    totals = uni.agg(F.sum("uc").alias("total"))
    big = bigrams(ref, with_id=False).groupBy("w1", "w2") \
        .agg(F.count(F.lit(1)).alias("bc"))

    doc_bg = bigrams(df, with_id=True)
    uni1 = uni.select(F.col("tok").alias("w1"), F.col("uc").alias("uc1"))
    uni2 = uni.select(F.col("tok").alias("w2"), F.col("uc").alias("uc2"))
    scored = (
        doc_bg.join(big, ["w1", "w2"], "left")
        .join(uni1, "w1", "left")
        .join(uni2, "w2", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            F.when(
                F.col("bc").isNotNull(),
                F.log(F.col("bc").cast("double") / F.col("uc1")),
            ).otherwise(
                F.log(
                    F.lit(backoff_alpha)
                    * F.coalesce(F.col("uc2").cast("double"), F.lit(1.0))
                    / F.col("total")
                )
            ).alias("lp"),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return (
        ids.join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "avg_logprob",
        )
        .orderBy("id")
    )


def repetition_signals(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher/MassiveText-style repetition quality signals per doc:
    ``(id, n_bigrams, dup_word_frac, top_bigram_frac, dup_bigram_frac)``.

    - ``dup_word_frac``   — 1 − distinct/total words (word-level rep);
    - ``top_bigram_frac`` — occurrences of the most frequent word bigram
      over all bigram occurrences (catches looping boilerplate);
    - ``dup_bigram_frac`` — fraction of bigram occurrences whose bigram
      appears more than once (broad-spectrum repetition).

    Docs with fewer than 2 tokens have no bigrams: fractions are 0.
    Plan: one explode + two keyed aggregations (bigram strings shuffle
    once, doc-keyed partials after); at 100 TB hash the bigram first if
    its width dominates (same lever as the shingle pipeline).
    """
    toks = _tokens(text_col)
    starts = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
    ).otherwise(F.array().cast("array<int>"))
    bg = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, 2)))
        ).alias("bigram"),
    )
    counts = bg.groupBy("id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy("id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_c"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_c"),
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )
    return (
        base.join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
            .alias("n_bigrams"),
            F.round(
                1.0 - F.col("n_distinct").cast("double") / F.col("n_tokens"), 6
            ).alias("dup_word_frac"),
            F.round(
                F.coalesce(
                    F.col("top_c").cast("double") / F.col("n_bigrams"),
                    F.lit(0.0),
                ), 6
            ).alias("top_bigram_frac"),
            F.round(
                F.coalesce(
                    F.col("dup_c").cast("double") / F.col("n_bigrams"),
                    F.lit(0.0),
                ), 6
            ).alias("dup_bigram_frac"),
        )
        .orderBy("id")
    )


#: PII patterns — conservative, lookaround-free so Java regex (Spark) and
#: RE2 (DuckDB) agree byte-for-byte on every match.
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scrub(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """PII detection + redaction (the standard pre-training scrub): counts
    and a redacted text per doc — ``(id, n_emails, n_ipv4, clean_text)``
    with emails → ``<EMAIL>`` and IPv4s → ``<IP>``.  Pure codegen'd
    regexes (no UDF); patterns chosen to mean the same thing in Java
    regex and RE2 so the oracle replicates matches exactly."""
    emails = F.regexp_extract_all(F.col(text_col), F.lit(PII_EMAIL_PATTERN),
                                  F.lit(0))
    clean1 = F.regexp_replace(F.col(text_col), PII_EMAIL_PATTERN, "<EMAIL>")
    ips = F.regexp_extract_all(F.col(text_col), F.lit(PII_IPV4_PATTERN),
                               F.lit(0))
    clean2 = F.regexp_replace(clean1, PII_IPV4_PATTERN, "<IP>")
    return df.select(
        F.col(id_col).alias("id"),
        F.size(emails).cast("long").alias("n_emails"),
        F.size(ips).cast("long").alias("n_ipv4"),
        clean2.alias("clean_text"),
    ).orderBy("id")


#: Gopher rule 7's required stopwords (Rae et al. 2021, §A1.1 — public):
#: a doc must contain at least 2 of these to pass.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The Gopher/MassiveText rule-based document filter (Rae et al.
    2021, §A1.1) as named per-rule boolean flags plus the conjunction.

    Every threshold is a ratio in the paper; here each compare is
    CROSS-MULTIPLIED into the exact integer domain (``mean word length
    ≥ 3`` ⇒ ``word_chars ≥ 3·n_words``), so no division exists anywhere
    and the whole operator value-hashes against a SQL re-derivation.
    Rules:

    1. 50 ≤ word count ≤ 100 000
    2. 3 ≤ mean word length ≤ 10
    3. symbol-to-word ratio ≤ 0.1  (symbols: ``#`` and ``...``)
    4. ≤ 90% of lines start with a bullet (``-``/``*``/``•``)
    5. ≤ 30% of lines end with an ellipsis (``...``/``…``)
    6. ≥ 80% of words contain ≥ 1 alphabetic character
    7. ≥ 2 of the 8 required stopwords appear

    One projection, whole-stage codegen, no shuffle — the triage pass a
    100 TB corpus runs before anything expensive."""
    toks = _tokens(text_col)
    n_words = F.size(toks).cast("long")
    n_chars = F.length(F.col(text_col)).cast("long")
    word_chars = n_chars - (n_words - 1)  # single-space split: chars minus seps
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(lines, lambda l: F.substring(l, 1, 1).isin("-", "*", "•"))
    ).cast("long")
    n_ellipsis = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    ).cast("long")
    n_alpha = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    ).cast("long")
    n_hash = n_chars - F.length(
        F.regexp_replace(F.col(text_col), "#", "")
    ).cast("long")
    # '...' occurrences: non-overlapping left-to-right replace (same
    # semantics in both engines), length delta exactly divisible by 3
    n_dots = (
        n_chars - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
    ).cast("long") / F.lit(3)
    n_sym = (n_hash + n_dots).cast("long")
    n_stop = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    ).cast("long")

    f_words = (n_words >= 50) & (n_words <= 100_000)
    f_meanlen = (word_chars >= 3 * n_words) & (word_chars <= 10 * n_words)
    f_sym = 10 * n_sym <= n_words
    f_bullet = 10 * n_bullet <= 9 * n_lines
    f_ellipsis = 10 * n_ellipsis <= 3 * n_lines
    f_alpha = 5 * n_alpha >= 4 * n_words
    f_stop = n_stop >= 2
    return df.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"),
        word_chars.alias("word_chars"),
        n_sym.alias("n_symbols"),
        n_alpha.alias("n_alpha_words"),
        n_stop.alias("n_required_stopwords"),
        f_words.alias("flag_word_count"),
        f_meanlen.alias("flag_mean_word_len"),
        f_sym.alias("flag_symbol_ratio"),
        f_bullet.alias("flag_bullet_lines"),
        f_ellipsis.alias("flag_ellipsis_lines"),
        f_alpha.alias("flag_alpha_words"),
        f_stop.alias("flag_stopwords"),
        (f_words & f_meanlen & f_sym & f_bullet & f_ellipsis & f_alpha
         & f_stop).alias("gopher_pass"),
    ).orderBy("id")


def chunk_documents(df: DataFrame, text_col: str, id_col: str,
                    chunk_tokens: int = 32, overlap: int = 8) -> DataFrame:
    """Sliding-window chunking for training-sequence prep:
    ``(doc_id, chunk_id, n_tokens, chunk_text)`` — windows of
    ``chunk_tokens`` words advancing by ``chunk_tokens − overlap``; the
    final window may be shorter.  A pure explode projection (no shuffle,
    no UDF): the chunk fan-out happens at the scan, the standard shape
    for the 100 TB corpus → context-window pipeline."""
    if chunk_tokens <= 0 or overlap < 0 or overlap >= chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = _tokens(text_col)
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)),
                        F.lit(stride))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.transform(starts, lambda s: F.slice(toks, s, chunk_tokens))
        ).alias("chunk_id", "__chunk"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size("__chunk").cast("long").alias("n_tokens"),
        F.concat_ws(" ", F.col("__chunk")).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_id")
