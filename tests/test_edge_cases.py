"""Robustness edge cases across operators: empty inputs, single rows,
degenerate parameters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_at_home_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from vector_db_at_home_spark.operators.fuzzysearch import fuzzy_search_by_doc
from vector_db_at_home_spark.operators.knn import knn_search
from vector_db_at_home_spark.operators.tfidf import tfidf
from vector_db_at_home_spark.schema import QUERY_SCHEMA, VECTOR_SCHEMA


@pytest.fixture()
def empty_store(spark):
    return spark.createDataFrame([], VECTOR_SCHEMA)


def test_knn_empty_queries(spark, empty_store):
    one = spark.createDataFrame([(0, [1.0, 0.0], "{}")],
                                "id long, vec array<float>, doc string")
    res = knn_search(one, spark.createDataFrame([], QUERY_SCHEMA), k=1,
                     impl="pandas")
    assert res.count() == 0


def test_knn_empty_index_expr(spark, empty_store):
    qs = spark.createDataFrame([(0, [1.0, 0.0])], QUERY_SCHEMA)
    assert knn_search(empty_store, qs, k=1, impl="expr").count() == 0


def test_knn_single_row_index(spark):
    one = spark.createDataFrame([(7, [1.0, 2.0], "{}")],
                                "id long, vec array<float>, doc string")
    qs = spark.createDataFrame([(0, [1.0, 2.0])], QUERY_SCHEMA)
    for impl in ("expr", "pandas"):
        rows = knn_search(one, qs, k=1, impl=impl).collect()
        assert [(r.id, r.distance) for r in rows] == [(7, 0.0)]


def test_fuzzy_empty_store(spark, empty_store):
    res = fuzzy_search_by_doc(empty_store, ["x"], k=3)
    assert res.count() == 0


def test_fuzzy_empty_query_string(spark):
    store = spark.createDataFrame([(0, [1.0], "abc"), (1, [1.0], "")],
                                  "id long, vec array<float>, doc string")
    rows = fuzzy_search_by_doc(store, [""], k=2).collect()
    # empty vs empty = similarity 100 → distance 0; empty vs 'abc' = 0 sim
    by_id = {r.id: r.distance for r in rows}
    assert by_id[1] == 0.0
    assert by_id[0] == 100.0


def test_dedup_empty(spark):
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(empty_docs, "text", "doc_id").count() == 0
    assert ngram_jaccard_pairs(empty_docs, "text", "doc_id").count() == 0
    assert minhash_lsh_pairs(empty_docs, "text", "doc_id").count() == 0


def test_tfidf_single_doc(spark):
    one = spark.createDataFrame([(0, "a b a")], "doc_id long, text string")
    rows = {r.token: r for r in tfidf(one, "text", "doc_id").collect()}
    assert rows["a"].tf == 2 and rows["a"].df_count == 1


def test_jaccard_identical_single_tokens(spark):
    # docs shorter than the shingle width produce no pairs, not errors
    docs = spark.createDataFrame([(0, "x"), (1, "x")], "doc_id long, text string")
    assert ngram_jaccard_pairs(docs, "text", "doc_id", n=3).count() == 0


def test_streaming_dedup(spark, tmp_path):
    from vector_db_at_home_spark.streaming.events import (
        dedup_events_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    d = str(tmp_path / "dup_feed")
    ev = spark.createDataFrame(
        [(i % 5, f"2024-01-01 10:00:{i:02d}", 1, "view", 1.0, "{}")
         for i in range(20)],  # 5 distinct event_ids, heavily duplicated
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    ev.coalesce(2).write.parquet(d)
    stream = read_events_stream(spark, d, max_files_per_trigger=10)
    run_stream_to_memory(dedup_events_stream(stream), "dedup_ev",
                         output_mode="append")
    out = spark.table("dedup_ev").collect()
    assert sorted(r.event_id for r in out) == [0, 1, 2, 3, 4]


def test_events_gapfill_zero_fills(spark, tmp_path):
    """Gap-fill on constructed gaps: drop one full day and one (day, type)
    slot; the dense calendar must restore them with n_events = 0 (the real
    test data is gap-free, so this is the only non-vacuous check)."""
    import os

    from vector_db_at_home_spark.operators.relational import events_gapfill

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = str(tmp_path / "ev_data")
    (ev.filter(~(F.dayofmonth("ts") == 5))
       .filter(~((F.dayofmonth("ts") == 7) & (F.col("event_type") == "click")))
       .write.parquet(d))
    base = str(tmp_path / "sfdir")
    os.makedirs(base)
    os.symlink(d, base + "/events.parquet")
    out = events_gapfill(spark, base)
    zeros = out.filter("n_events = 0").collect()
    zero_days = {(r.day, r.event_type) for r in zeros}
    assert ("2024-01-07", "click") in zero_days
    assert sum(1 for day, _ in zero_days if day == "2024-01-05") == 5
    # non-gap slots keep their true counts
    total = out.agg(F.sum("n_events")).first()[0]
    expected = (ev.filter(~(F.dayofmonth("ts") == 5))
                .filter(~((F.dayofmonth("ts") == 7)
                          & (F.col("event_type") == "click"))).count())
    assert total == expected


def test_round7_operators_empty_and_degenerate_inputs(spark, tmp_path):
    """Round-7 operators on empty/degenerate inputs: no crashes, sane
    results."""
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.bpe import (
        bpe_apply,
        bpe_train_merges,
    )
    from vector_db_at_home_spark.operators.invindex import phrase_search
    from vector_db_at_home_spark.operators.ranking_eval import (
        ranking_metrics,
    )

    empty_docs = spark.createDataFrame([], "doc_id long, text string")

    # phrase search: empty corpus and no-match phrase -> 0 rows
    assert phrase_search(empty_docs, "a b", "text", "doc_id").count() == 0
    docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    assert phrase_search(docs, "not here", "text", "doc_id").count() == 0
    # phrase longer than every document -> 0 rows
    assert phrase_search(docs, "x y z w v", "text", "doc_id").count() == 0

    # BPE: single-char words exhaust merges early; merge table truncates
    # instead of crashing, apply still round-trips
    tiny = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    m = bpe_train_merges(tiny, "text", n_merges=10).collect()
    assert len(m) == 0          # no adjacent pairs inside 1-char words
    toks = bpe_apply(tiny, "text", "doc_id", []).collect()
    assert sorted(t for r in toks for t in r.tokens) == ["a", "a", "b", "b"]
    # empty corpus trains nothing
    assert bpe_train_merges(empty_docs, "text", 3).count() == 0

    # ranking metrics: empty qrels -> empty output (no divide-by-zero);
    # empty runs -> zero metrics for every qrel'd query
    runs = spark.createDataFrame([(0, 1, 1)],
                                 "query_id long, id long, rank long")
    no_qrels = spark.createDataFrame([], "query_id long, id long")
    assert ranking_metrics(runs, no_qrels, k=5).count() == 0
    no_runs = spark.createDataFrame([], "query_id long, id long, rank long")
    qrels = spark.createDataFrame([(0, 1)], "query_id long, id long")
    r = ranking_metrics(no_runs, qrels, k=5).first()
    assert (r.n_rel, r.mrr_e6, r.ndcg_e6) == (1, 0, 0)


def test_round7_substring_state_empty_batch(spark, tmp_path):
    """Incremental substring dedup with an EMPTY batch: zero rows out,
    state untouched; an append of an empty frame is a no-op."""
    from vector_db_at_home_spark.operators.dedup import (
        substring_dedup_incremental,
        substring_state_append,
        substring_state_build,
    )

    docs = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten")],
        "doc_id long, text string")
    state = str(tmp_path / "ss_empty")
    substring_state_build(docs, state, "text", "doc_id", window=8)
    before = spark.read.parquet(f"{state}/spans").count()

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert substring_dedup_incremental(spark, state, empty,
                                       "text", "doc_id").count() == 0
    substring_state_append(spark, state, empty, "text", "doc_id")
    assert spark.read.parquet(f"{state}/spans").count() == before


def test_round7_graph_ann_more_k_than_nodes(spark):
    """Beam search with k exceeding the node count returns everything
    reachable, no crash."""
    from vector_db_at_home_spark.operators.knngraph import (
        graph_ann_search,
        knn_graph_nndescent,
    )

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)],
        "id long, vec array<double>")
    g = knn_graph_nndescent(df, "id", "vec", k=3)
    qs = spark.createDataFrame([(99, [0.0, 1.0])],
                               "query_id long, qvec array<double>")
    res = graph_ann_search(df, g, qs, k=50).collect()
    assert {r.id for r in res} == {0, 1, 2, 3, 4}
