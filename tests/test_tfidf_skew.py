"""TF-IDF, skew-handling, and store time-travel tests."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_db_at_home_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left,
)
from vector_db_at_home_spark.operators.tfidf import tfidf, top_terms_per_doc


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "apple banana apple"),
        (1, "banana cherry"),
        (2, "apple apple apple durian"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_values(docs):
    out = {(r.id, r.token): r for r in tfidf(docs, "text", "doc_id").collect()}
    n = 3
    # apple: tf=2 in doc0, df=2
    r = out[(0, "apple")]
    assert r.tf == 2 and r.df_count == 2
    assert r.tfidf == pytest.approx(
        round(2 * (math.log((n + 1) / (2 + 1)) + 1), 6), abs=1e-9
    )
    # durian: unique to doc2 → highest idf
    assert out[(2, "durian")].df_count == 1


def test_top_terms_rank(docs):
    top = top_terms_per_doc(docs, "text", "doc_id", k=1).collect()
    by_doc = {r.id: r.token for r in top}
    assert by_doc[2] == "apple"  # tf=3 beats durian's idf here
    assert by_doc[0] == "apple"


def test_salted_aggregate_equals_direct(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    direct = {
        (r.event_type,): (r.n, round(r.s, 6), r.mn, r.mx)
        for r in ev.groupBy("event_type")
        .agg(F.count("value").alias("n"), F.sum("value").alias("s"),
             F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        (r.event_type,): (r.n, round(r.s, 6), r.mn, r.mx)
        for r in salted_aggregate(
            ev, ["event_type"],
            {"n": ("count", "value"), "s": ("sum", "value"),
             "mn": ("min", "value"), "mx": ("max", "value")},
            salt_col="event_id", n_salts=8,
        ).collect()
    }
    assert direct == salted


def test_salted_join_equals_plain_join(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet") \
        .withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(cust, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_broadcast_left(
        orders, cust, key="o_custkey", row_salt_col="o_orderkey", n_salts=4
    ).select("o_orderkey", "c_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_store_time_travel(spark, tmp_path):
    from vector_db_at_home_spark.store import VectorStore

    vs = VectorStore(spark, tmp_path / "tt", dim=4)
    vs.insert(np.ones((3, 4), dtype=np.float32))
    v_before = vs._current_version()
    vs.delete([1])
    assert vs.count() == 2
    assert set(vs.versions()) >= {v_before, vs._current_version()}
    old = vs.df_at_version(v_before)
    assert old.count() == 3  # pre-delete state still readable
    with pytest.raises(ValueError, match="unknown version"):
        vs.df_at_version(999)


def test_bm25_matches_python_reference(spark):
    """bm25_search vs an independent float implementation of the same
    formula on a toy corpus — rank AND e4 values agree."""
    import math

    from vector_db_at_home_spark.operators.tfidf import bm25_search

    corpus = {
        1: "the vector engine handles vector merge and vector batch jobs",
        2: "merge conflicts are resolved during the merge window",
        3: "a batch of documents with no relevant words at all",
        4: "vector vector vector vector vector",
        5: "completely unrelated text about weather patterns",
    }
    df = spark.createDataFrame(list(corpus.items()), "id long, text string")
    terms = ["vector", "merge", "batch"]
    got = {r.id: r.score_e4 for r in
           bm25_search(df, terms, "text", "id", k=5).collect()}

    toks = {i: t.split(" ") for i, t in corpus.items()}
    N = len(corpus)
    T = sum(len(t) for t in toks.values())
    want = {}
    for i, tk in toks.items():
        s = 0.0
        for term in terms:
            tf = tk.count(term)
            if tf == 0:
                continue
            dfq = sum(1 for t2 in toks.values() if term in t2)
            idf = math.log((2 * N + 2) / (2 * dfq + 1))
            s += idf * (22 * tf * T) / (10 * tf * T + 3 * T + 9 * len(tk) * N)
        if s > 0:
            want[i] = math.floor(s * 1e4 + 0.5)
    assert got == want
    # saturation: doc 4 (tf=5, short) beats doc 1's vector leg but the
    # multi-term doc 1 wins overall
    assert got[1] == max(got.values())
