"""Text-analysis operator tests with hand-computed expectations."""

from __future__ import annotations

import pytest

from vector_db_at_home_spark.operators.textstats import (
    ROLLING_BASE,
    ROLLING_MOD,
    doc_fingerprint,
    language_id,
    quality_score,
    token_stats,
    tokenize_bpeish,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "hello, world! 42 times."),
        (2, "der hund und die katze und der vogel"),
        (3, "x"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_stats(docs):
    r = {x.id: x for x in token_stats(docs, "text", "doc_id").collect()}
    assert r[0].n_tokens == 6
    assert r[0].n_distinct_tokens == 5  # 'the' twice
    assert r[0].n_chars == 22
    # (22 - 5) / 6
    assert r[0].mean_token_len == pytest.approx(17 / 6, abs=1e-6)
    assert r[3].n_tokens == 1 and r[3].mean_token_len == 1.0


def test_quality_score(docs):
    r = {x.id: x for x in quality_score(docs, "text", "doc_id").collect()}
    assert r[0].distinct_ratio == pytest.approx(5 / 6, abs=1e-6)
    assert r[0].punct_ratio == 0.0
    # 'the' appears twice and both are stopwords; 'on' is not in the list
    assert r[0].stopword_ratio == pytest.approx(2 / 6, abs=1e-6)
    # doc 1 has , ! . → 3 punct chars of 23
    assert r[1].punct_ratio == pytest.approx(3 / 23, abs=1e-6)


def test_language_id(docs):
    r = {x.id: x for x in language_id(docs, "text", "doc_id").collect()}
    assert r[0].pred_lang == "en" and r[0].score == 2
    assert r[2].pred_lang == "de"
    # doc 3: all scores 0 → alphabetical tie-break → 'de'
    assert r[3].pred_lang == "de" and r[3].score == 0


def test_doc_fingerprint_formula(docs):
    r = {x.id: x.fingerprint for x in doc_fingerprint(docs, "text", "doc_id").collect()}

    def ref(s):
        h = 0
        for c in s:
            h = (h * ROLLING_BASE + ord(c)) % ROLLING_MOD
        return h

    assert r[0] == ref("the cat sat on the mat")
    assert r[3] == ref("x")
    # distinct docs → distinct fingerprints here
    assert len(set(r.values())) == 4


def test_tokenize_bpeish(docs):
    r = {x.id: x for x in tokenize_bpeish(docs, "text", "doc_id").collect()}
    # "hello, world! 42 times." → hello , world ! 42 times . = 7 pieces
    assert r[1].n_pieces == 7
    assert r[1].n_word_pieces == 3
    assert r[1].n_other_pieces == 4


def test_corpus_lang_summary(spark):
    """corpus_lang_summary lost its registry slot to the driver's 50-query
    cap — pinned here instead: per-lang doc counts, token totals, avg chars."""
    from vector_db_at_home_spark.operators.textstats import corpus_lang_summary

    rows = [
        (0, "aa bb cc", "en"),
        (1, "dd ee", "en"),
        (2, "ff", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.lang: r for r in corpus_lang_summary(df, "text", "lang").collect()}
    assert out["en"].n_docs == 2 and out["en"].total_tokens == 5
    assert out["en"].avg_chars == (8 + 5) / 2
    assert out["de"].n_docs == 1 and out["de"].total_tokens == 1
