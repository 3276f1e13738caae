"""Shared tokenizer (r8, functions/tokenize.py): regex mode across all
four consumer families, space-mode defaults unchanged."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _punct_docs(spark):
    return spark.createDataFrame(
        [
            (1, "Hello, world! The cat. sat"),
            (2, "the cat, the cat; the CAT."),
            (3, "no--punct here"),
            (4, "...!!!"),
        ],
        "doc_id long, text string",
    )


def test_tokens_col_modes(spark):
    from vector_db_at_home_spark.functions.tokenize import (
        tokens_col,
        tokens_py,
    )

    df = _punct_docs(spark).select(
        "doc_id",
        tokens_col(F.col("text"), "space").alias("sp"),
        tokens_col(F.col("text"), "regex").alias("rx"),
        "text",
    )
    rows = {r.doc_id: r for r in df.collect()}
    assert rows[1].sp == ["Hello,", "world!", "The", "cat.", "sat"]
    assert rows[1].rx == ["Hello", "world", "The", "cat", "sat"]
    assert rows[4].rx == []
    # driver-side twin agrees with the Spark column on every doc
    for r in rows.values():
        assert tokens_py(r.text, "space") == r.sp
        assert tokens_py(r.text, "regex") == r.rx
    with pytest.raises(ValueError):
        tokens_col(F.col("text"), "bogus")
    with pytest.raises(ValueError):
        tokens_py("x", "bogus")


def test_token_stats_regex_mode(spark):
    from vector_db_at_home_spark.operators.textstats import token_stats

    got = {r.id: r for r in
           token_stats(_punct_docs(spark), "text", "doc_id",
                       tokenize_mode="regex").collect()}
    assert got[1].n_tokens == 5
    assert got[1].n_distinct_tokens == 5
    # mean = (5+5+3+3+3)/5 = 3.8
    assert abs(got[1].mean_token_len - 3.8) < 1e-9
    assert got[4].n_tokens == 0 and got[4].mean_token_len is None
    # space defaults unchanged: "Hello," is one 6-char token
    sp = {r.id: r for r in
          token_stats(_punct_docs(spark), "text", "doc_id").collect()}
    assert sp[1].n_tokens == 5 and sp[1].n_distinct_tokens == 5
    assert sp[4].n_tokens == 1  # "...!!!" is one space token


def test_phrase_search_regex_matches_across_punctuation(spark):
    from vector_db_at_home_spark.operators.invindex import phrase_search

    docs = _punct_docs(spark)
    # space mode: every "cat" carries punctuation, so the phrase is
    # invisible — exactly the real-corpus weakness regex mode closes
    sp = {r.id: r.n_matches
          for r in phrase_search(docs, "the cat", "text", "doc_id")
          .collect()}
    assert sp == {}
    # regex mode: punctuation no longer blocks adjacency
    rx = {r.id: r.n_matches
          for r in phrase_search(docs, "the cat", "text", "doc_id",
                                 tokenize_mode="regex").collect()}
    assert rx == {1: 1, 2: 3}


def test_invindex_persists_tokenize_mode(spark, tmp_path):
    from vector_db_at_home_spark.operators.invindex import (
        invindex_append,
        invindex_load,
        invindex_save,
        phrase_search_indexed,
    )

    docs = _punct_docs(spark)
    path = str(tmp_path / "inv_rx")
    invindex_save(docs.filter("doc_id <= 2"), "text", "doc_id", path,
                  n_buckets=4, tokenize_mode="regex")
    idx = invindex_load(spark, path)
    assert idx.tokenize_mode == "regex"
    got = {r.id: r.n_matches
           for r in phrase_search_indexed(idx, "the cat").collect()}
    assert got == {1: 1, 2: 3}
    # appends follow the pinned mode
    invindex_append(spark, path, docs.filter("doc_id > 2"),
                    "text", "doc_id")
    got2 = {r.id: r.n_matches
            for r in phrase_search_indexed(
                invindex_load(spark, path), "the cat").collect()}
    assert got2 == {1: 1, 2: 3}


def test_tfidf_and_bpe_regex_mode(spark):
    from vector_db_at_home_spark.operators.bpe import bpe_train_merges
    from vector_db_at_home_spark.operators.tfidf import term_frequencies

    docs = _punct_docs(spark)
    tf = term_frequencies(docs, "text", "doc_id",
                          tokenize_mode="regex")
    toks = {r.token for r in tf.collect()}
    assert "cat" in toks and "cat." not in toks and "cat," not in toks
    # BPE regex mode: vocabulary is punctuation-free, so the first
    # merges come from clean word types ("the"/"cat" repeats)
    m = bpe_train_merges(docs, "text", n_merges=4,
                         tokenize_mode="regex").collect()
    assert len(m) == 4
    syms = {r.left_sym for r in m} | {r.right_sym for r in m}
    assert all(not set(s) & set(".,;!-") for s in syms)
