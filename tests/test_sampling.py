"""Deterministic sampling/splitting/packing tests (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_at_home_spark.operators.sampling import (
    hash_sample,
    hash_split,
    pack_documents,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def rows(spark):
    return spark.range(0, 10_000).select(
        F.col("id"),
        (F.col("id") % 5).alias("stratum"),
        (F.pmod(F.col("id") * 37, F.lit(900)) + 10).alias("n_tokens"),
    )


def test_hash_split_fractions_and_determinism(rows):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(rows, "id", w).groupBy("split").count().collect()
    counts = {r.split: r["count"] for r in a}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 10_000 - 0.8) < 0.02
    assert abs(counts["val"] / 10_000 - 0.1) < 0.01
    b = hash_split(rows, "id", w).groupBy("split").count().collect()
    assert {r.split: r["count"] for r in b} == counts


def test_hash_split_stable_under_table_growth(spark, rows):
    """A row's split depends only on its id — the no-leakage property: the
    assignment must not change when the table is filtered or regrown."""
    w = {"train": 0.7, "test": 0.3}
    full = {r.id: r.split for r in hash_split(rows, "id", w).collect()}
    half = hash_split(rows.filter(F.col("id") % 2 == 0), "id", w).collect()
    assert all(full[r.id] == r.split for r in half)


def test_hash_split_bad_weights_raise(rows):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(rows, "id", {"a": 0.5, "b": 0.4})


def test_hash_split_matches_duckdb_oracle(spark, rows):
    """The split is engine-portable: DuckDB reproduces the exact
    assignment from the same md5-derived bucket."""
    import duckdb

    got = {(r.id, r.split) for r in
           hash_split(rows.limit(500), "id", {"train": 0.8, "test": 0.2})
           .select("id", "split").collect()}
    want = set(
        duckdb.sql(
            """
            SELECT id,
                   CASE WHEN CAST(('0x' || substr(md5(id::VARCHAR || '_split'), 1, 15))
                             AS BIGINT) % 1000000 < 200000
                        THEN 'test' ELSE 'train' END AS split
            FROM range(500) t(id)
            """
        ).fetchall()
    )
    assert got == want


def test_hash_sample_exact_n_and_deterministic(rows):
    a = hash_sample(rows, "id", 250).collect()
    b = hash_sample(rows, "id", 250).collect()
    assert len(a) == 250
    assert [r.id for r in a] == [r.id for r in b]
    assert a[0].asDict().keys() == {"id", "stratum", "n_tokens"}


def test_stratified_hash_sample_fractions(rows):
    out = stratified_hash_sample(
        rows, "id", "stratum", {0: 0.5, 1: 0.1}, default_fraction=0.0
    )
    counts = {r.stratum: r["count"]
              for r in out.groupBy("stratum").count().collect()}
    assert set(counts) <= {0, 1}          # default 0 drops strata 2-4
    assert abs(counts[0] / 2000 - 0.5) < 0.05
    assert abs(counts[1] / 2000 - 0.1) < 0.03


def test_pack_documents_invariants(rows):
    out = pack_documents(rows, "id", "n_tokens", max_tokens=1024,
                         n_groups=8).collect()
    # every doc assigned exactly once
    assert sorted(r.id for r in out) == list(range(10_000))
    toks = {r.id: None for r in out}
    orig = {i: (i * 37 % 900) + 10 for i in range(10_000)}
    from collections import defaultdict

    bins = defaultdict(int)
    for r in out:
        bins[r.bin_id] += orig[r.id]
    # no bin over budget (no doc here exceeds max_tokens)
    assert max(bins.values()) <= 1024
    # bin_tokens column agrees with the recomputed sums
    for r in out:
        assert bins[r.bin_id] == r.bin_tokens
    # FFD should pack tightly: mean utilization well above half
    util = sum(bins.values()) / (len(bins) * 1024)
    assert util > 0.8


def test_pack_documents_oversized_docs_get_singleton_bins(spark):
    df = spark.createDataFrame(
        [(1, 5000), (2, 100), (3, 100)], "id long, n_tokens long"
    )
    out = pack_documents(df, "id", "n_tokens", max_tokens=1024,
                         n_groups=1).collect()
    by_id = {r.id: r.bin_id for r in out}
    assert by_id[1] not in (by_id[2], by_id[3])  # oversized isolated
    assert {r.bin_tokens for r in out if r.id == 1} == {5000}


def test_pack_documents_deterministic(rows):
    a = sorted((r.id, r.bin_id) for r in
               pack_documents(rows, "id", "n_tokens", 512).collect())
    b = sorted((r.id, r.bin_id) for r in
               pack_documents(rows, "id", "n_tokens", 512).collect())
    assert a == b


def test_mixture_resample_hits_target_shares(spark):
    """Skewed raw corpus (80/15/5) resampled to a 1/3-each mixture of
    3000 rows: per-domain counts land near 1000 each, deterministic."""
    from vector_db_at_home_spark.operators.sampling import mixture_resample

    df = spark.range(0, 20_000).select(
        F.col("id"),
        F.when(F.col("id") % 20 < 16, "web")
        .when(F.col("id") % 20 < 19, "code")
        .otherwise("books").alias("domain"),
    )
    out = mixture_resample(df, "id", "domain",
                           {"web": 1.0, "code": 1.0, "books": 1.0},
                           target_rows=3000)
    counts = {r.domain: r["count"]
              for r in out.groupBy("domain").count().collect()}
    for d in ("web", "code", "books"):
        assert abs(counts[d] - 1000) < 120, counts
    again = mixture_resample(df, "id", "domain",
                             {"web": 1.0, "code": 1.0, "books": 1.0},
                             target_rows=3000)
    assert sorted(r.id for r in out.collect()) == \
        sorted(r.id for r in again.collect())


def test_mixture_resample_caps_at_domain_size(spark):
    """A domain smaller than its target share keeps ALL its rows (no
    replacement) instead of duplicating."""
    from vector_db_at_home_spark.operators.sampling import mixture_resample

    df = spark.range(0, 1_000).select(
        F.col("id"),
        F.when(F.col("id") < 950, "big").otherwise("tiny").alias("domain"),
    )
    out = mixture_resample(df, "id", "domain",
                           {"big": 0.5, "tiny": 0.5}, target_rows=800)
    counts = {r.domain: r["count"]
              for r in out.groupBy("domain").count().collect()}
    assert counts["tiny"] == 50            # all of it, capped at size
    assert abs(counts["big"] - 400) < 60   # its share of the target
    # dropped domains: absent from weights → absent from output
    out2 = mixture_resample(df, "id", "domain", {"big": 1.0}, target_rows=100)
    assert out2.filter(F.col("domain") == "tiny").count() == 0


def test_mixture_resample_bad_weights(spark):
    from vector_db_at_home_spark.operators.sampling import mixture_resample

    df = spark.range(5).select(F.col("id"), F.lit("d").alias("domain"))
    with pytest.raises(ValueError, match="positive"):
        mixture_resample(df, "id", "domain", {"d": 0.0}, target_rows=5)
