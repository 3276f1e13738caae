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


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc token statistics: ``(id, n_tokens, n_distinct_tokens, n_chars,
    mean_token_len)``."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        n_chars.cast("long").alias("n_chars"),
        # mean token length = (chars - separators) / tokens, exact rational
        F.round(
            (n_chars - (n_tokens - 1)).cast("double") / n_tokens, 6
        ).alias("mean_token_len"),
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
