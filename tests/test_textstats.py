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


def test_ngram_logprob_scores_fluent_above_gibberish(spark):
    """LM quality signal: text made of corpus-frequent bigrams scores
    higher than a doc of never-repeated token salad; short docs get NULL."""
    from vector_db_at_home_spark.operators.textstats import ngram_logprob_score

    fluent = "the cat sat on the mat"
    ref = spark.createDataFrame(
        [(i, fluent) for i in range(50)]
        + [(90 + i, "the dog sat on the rug") for i in range(8)],
        "doc_id long, text string",
    )
    rows = [(i, fluent) for i in range(8)]
    rows += [(100, "zq xv bn mk lp qw"), (101, "word")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: (r.n_bigrams, r.avg_logprob)
           for r in ngram_logprob_score(df, "text", "doc_id",
                                        ref_df=ref).collect()}
    assert len(out) == 10
    assert out[0][0] == 5 and out[100][0] == 5
    assert out[0][1] > out[100][1]          # fluent >> gibberish
    assert out[101] == (0, None)            # single token → no bigrams
    # repeated fluent docs score identically (deterministic)
    assert out[0] == out[7]


def test_ngram_logprob_matches_duckdb(spark):
    """Engine-portable: DuckDB reproduces the stupid-backoff scores
    value-for-value on real documents."""
    import duckdb

    from vector_db_at_home_spark.operators.textstats import ngram_logprob_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {(r.id, r.n_bigrams, r.avg_logprob)
           for r in ngram_logprob_score(docs, "text", "doc_id").collect()}
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    want = set(con.execute("""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
uni AS (SELECT u.tok, count(*) AS uc FROM
        (SELECT unnest(t) AS tok FROM toks) u GROUP BY u.tok),
tot AS (SELECT sum(uc) AS total FROM uni),
bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
       FROM toks, unnest(range(1, len(t))) r(i)),
bc AS (SELECT w1, w2, count(*) AS bc FROM bg GROUP BY w1, w2),
lp AS (SELECT g.doc_id,
              CASE WHEN bc.bc IS NOT NULL
                   THEN ln(CAST(bc.bc AS DOUBLE) / u1.uc)
                   ELSE ln(0.4 * COALESCE(CAST(u2.uc AS DOUBLE), 1.0) / tot.total)
              END AS lp
       FROM bg g
       LEFT JOIN bc ON bc.w1 = g.w1 AND bc.w2 = g.w2
       LEFT JOIN uni u1 ON u1.tok = g.w1
       LEFT JOIN uni u2 ON u2.tok = g.w2
       CROSS JOIN tot),
per AS (SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 6) AS avg_logprob
        FROM lp GROUP BY doc_id)
SELECT d.doc_id, COALESCE(per.n_bigrams, 0), per.avg_logprob
FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN per USING (doc_id)
""").fetchall())
    assert got == want and len(got) > 0


def test_strip_boilerplate_lines(spark):
    """A footer line shared by 15 docs strips everywhere; unique content
    and short lines survive; line order is preserved."""
    from vector_db_at_home_spark.operators.textstats import (
        strip_boilerplate_lines,
    )

    footer = "subscribe to our newsletter for updates today"
    docs = [(i, f"unique content number {i} here\n{footer}\nok")
            for i in range(15)]
    docs.append((99, "standalone document with no boilerplate at all"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.id: r for r in
           strip_boilerplate_lines(df, "text", "doc_id",
                                   max_line_docs=10).collect()}
    assert out[3].text == "unique content number 3 here\nok"
    assert out[3].n_lines_dropped == 1 and out[3].n_lines_kept == 2
    assert out[99].text == "standalone document with no boilerplate at all"
    assert out[99].n_lines_dropped == 0
    # "ok" is shared by 15 docs but below min_line_chars → kept
    assert all("\nok" in out[i].text or out[i].text.endswith("ok")
               for i in range(15))


def test_strip_boilerplate_threshold_not_crossed(spark):
    from vector_db_at_home_spark.operators.textstats import (
        strip_boilerplate_lines,
    )

    shared = "this shared line appears in exactly three documents"
    df = spark.createDataFrame(
        [(i, f"body {i}\n{shared}") for i in range(3)],
        "doc_id long, text string",
    )
    out = strip_boilerplate_lines(df, "text", "doc_id",
                                  max_line_docs=10).collect()
    assert all(r.n_lines_dropped == 0 for r in out)
    assert all(shared in r.text for r in out)


def test_repetition_signals_known_values(spark):
    from vector_db_at_home_spark.operators.textstats import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),        # bigrams: ab ba ab ba ab -> top 'a b'x3
            (2, "x y z"),              # all distinct
            (3, "w"),                  # no bigrams
            (4, "q q q q"),            # 'q q' x3
        ],
        "id long, text string",
    )
    got = {r.id: r for r in repetition_signals(df, "text", "id").collect()}
    r1 = got[1]
    assert r1.n_bigrams == 5
    assert r1.dup_word_frac == round(1 - 2 / 6, 6)
    assert r1.top_bigram_frac == 0.6          # 3/5 'a b'
    assert r1.dup_bigram_frac == 1.0          # every bigram repeats
    r2 = got[2]
    assert (r2.n_bigrams, r2.dup_word_frac, r2.top_bigram_frac,
            r2.dup_bigram_frac) == (2, 0.0, 0.5, 0.0)
    r3 = got[3]
    assert (r3.n_bigrams, r3.top_bigram_frac, r3.dup_bigram_frac) == (0, 0.0, 0.0)
    r4 = got[4]
    assert (r4.n_bigrams, r4.top_bigram_frac, r4.dup_bigram_frac) == (3, 1.0, 1.0)


def test_pii_scrub_detects_and_redacts(spark):
    from vector_db_at_home_spark.operators.textstats import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@example.co.uk or 192.168.0.1 ok"),
            (2, "no pii here just words"),
            (3, "two mails a@b.io c@d.org and ips 10.0.0.1 8.8.8.8"),
            (4, "version 1.2.3 is not an ip, nor is a@b (no tld)"),
        ],
        "id long, text string",
    )
    got = {r.id: r for r in pii_scrub(df, "text", "id").collect()}
    assert got[1].n_emails == 1 and got[1].n_ipv4 == 1
    assert "<EMAIL>" in got[1].clean_text and "<IP>" in got[1].clean_text
    assert "alice" not in got[1].clean_text
    assert got[2].n_emails == 0 and got[2].n_ipv4 == 0
    assert got[2].clean_text == "no pii here just words"
    assert got[3].n_emails == 2 and got[3].n_ipv4 == 2
    assert got[4].n_emails == 0 and got[4].n_ipv4 == 0


def test_chunk_documents_windows_and_overlap(spark):
    import pytest

    from vector_db_at_home_spark.operators.textstats import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "solo")], "id long, text string"
    )
    rows = chunk_documents(df, "text", "id", chunk_tokens=4,
                           overlap=1).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # stride 3: starts 1,4,7,10 -> windows of 4,4,4,1 tokens
    c1 = by_doc[1]
    assert [r.n_tokens for r in c1] == [4, 4, 4, 1]
    assert c1[0].chunk_text == "t0 t1 t2 t3"
    assert c1[1].chunk_text == "t3 t4 t5 t6"   # 1-token overlap
    assert c1[3].chunk_text == "t9"
    assert [r.chunk_id for r in c1] == [0, 1, 2, 3]
    # every original token appears in some chunk
    seen = set(" ".join(r.chunk_text for r in c1).split())
    assert seen == set(toks)
    assert [r.chunk_text for r in by_doc[2]] == ["solo"]
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "id", chunk_tokens=4, overlap=4)


def test_gopher_quality_flags_rules(spark):
    from vector_db_at_home_spark.operators.textstats import (
        gopher_quality_flags,
    )

    good = ("the quick brown fox jumps with energy and grace that have "
            "been admired " * 6).strip()          # 78 words, stopword-rich
    short = "the cat sat with that hat"            # fails word count only
    bullets = "\n".join(["- item one of the list"] * 10)
    symbols = ("the " * 50).strip() + " " + "# # # # # # # # # #"
    numeric = " ".join(str(i) for i in range(60)) + " the of"
    nostop = ("alpha beta gamma delta epsilon zeta " * 10).strip()
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, bullets), (4, symbols), (5, numeric),
         (6, nostop)],
        "id long, text string",
    )
    out = {r.id: r for r in gopher_quality_flags(df, "text", "id").collect()}

    assert out[1].gopher_pass
    assert not out[2].flag_word_count and out[2].flag_stopwords
    assert not out[3].flag_bullet_lines and not out[3].gopher_pass
    assert not out[4].flag_symbol_ratio and out[4].n_symbols == 10
    assert not out[5].flag_alpha_words      # 60 of 62 words digit-only
    assert not out[6].flag_stopwords and out[6].n_required_stopwords == 0
    # integer bookkeeping: word_chars = chars minus separators
    assert out[2].n_words == 6 and out[2].word_chars == len(short) - 5


def test_gopher_ellipsis_and_mean_len(spark):
    from vector_db_at_home_spark.operators.textstats import (
        gopher_quality_flags,
    )

    dots = "\n".join(["the line of text that trails off..."] * 5)
    longwords = ("supercalifragilistic " * 60).strip()
    df = spark.createDataFrame(
        [(1, dots), (2, longwords)], "id long, text string"
    )
    out = {r.id: r for r in gopher_quality_flags(df, "text", "id").collect()}
    assert not out[1].flag_ellipsis_lines   # 100% of lines end with ...
    assert not out[2].flag_mean_word_len    # mean word length 20 > 10


def test_gopher_flags_match_python_reference_on_fuzz_corpus(spark):
    """Differential fuzz: 60 seeded random unicode docs through the Spark
    operator vs a plain-Python restatement of every rule (same literal
    split / non-overlapping replace / distinct-stopword semantics)."""
    import random
    import re

    from vector_db_at_home_spark.operators.textstats import (
        GOPHER_STOPWORDS,
        gopher_quality_flags,
    )

    rng = random.Random(99)
    pieces = ["the", "of", "have", "méta", "Ωmega", "x1", "42", "#",
              "...", "…", "-", "*", "•item", "", "naïve", "#tag"]
    docs = []
    for i in range(60):
        n = rng.randint(1, 120)
        words = [rng.choice(pieces) for _ in range(n)]
        text = " ".join(words)
        # sprinkle newlines to exercise the line rules
        if rng.random() < 0.7 and " " in text:
            chars = list(text)
            for _ in range(rng.randint(1, 5)):
                jdx = rng.randrange(len(chars))
                if chars[jdx] == " ":
                    chars[jdx] = "\n"
            text = "".join(chars)
        docs.append((i, text))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.id: r for r in gopher_quality_flags(df, "text",
                                                 "doc_id").collect()}

    stop = set(GOPHER_STOPWORDS)
    for i, text in docs:
        toks = text.split(" ")
        n_words = len(toks)
        word_chars = len(text) - (n_words - 1)
        lines = text.split("\n")
        n_bullet = sum(1 for l in lines if l[:1] in ("-", "*", "•"))
        n_ellipsis = sum(1 for l in lines
                         if l.endswith("...") or l.endswith("…"))
        n_alpha = sum(1 for t in toks if re.search("[A-Za-z]", t))
        n_sym = text.count("#") + \
            (len(text) - len(text.replace("...", ""))) // 3
        n_stop = len({t.lower() for t in toks} & stop)
        r = got[i]
        assert (r.n_words, r.word_chars, r.n_symbols, r.n_alpha_words,
                r.n_required_stopwords) == \
            (n_words, word_chars, n_sym, n_alpha, n_stop), (i, text)
        assert r.flag_word_count == (50 <= n_words <= 100_000)
        assert r.flag_mean_word_len == \
            (3 * n_words <= word_chars <= 10 * n_words)
        assert r.flag_symbol_ratio == (10 * n_sym <= n_words)
        assert r.flag_bullet_lines == (10 * n_bullet <= 9 * len(lines))
        assert r.flag_ellipsis_lines == (10 * n_ellipsis <= 3 * len(lines))
        assert r.flag_alpha_words == (5 * n_alpha >= 4 * n_words)
        assert r.flag_stopwords == (n_stop >= 2)
