"""PLAID-style centroid-gated MaxSim pruning (r12, VERDICT r11 task 4):
the cell-bound skip must be EXACT — bit-identical top-k to the full
indexed read in every regime (fresh save, appended new tokens, deletes,
compaction) — and must fall back, never approximate, when the 0-score
membership tail could matter."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


class FakeStore:
    def __init__(self, df_):
        self._df = df_

    def df(self):
        return self._df


def _rows(df):
    return [(r.id, r.score) for r in df.collect()]


def test_pruned_equals_indexed_lifecycle(spark, tmp_path):
    """Save(8 cells) → append(new docs incl. unseen tokens) → delete →
    compact: the pruned serve matches the full indexed serve exactly at
    every step, and actually skips cells on the real corpus."""
    from vector_db_at_home_spark.operators.featurize import (
        maxsim_index_append,
        maxsim_index_compact_saved,
        maxsim_index_load,
        maxsim_index_save,
        maxsim_index_sync_deletes,
        maxsim_search_indexed,
        maxsim_search_indexed_pruned,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "plaid")
    maxsim_index_save(docs.filter(F.col("doc_id") % 7 != 0),
                      "text", "doc_id", path, dim=16, n_buckets=16,
                      n_token_cells=8)
    # the appended slice re-introduces docs whose tokens may be unseen
    maxsim_index_append(spark, path, docs.filter(F.col("doc_id") % 7 == 0),
                        "text", "doc_id")

    def check(tag, terms=("vector", "merge", "batch")):
        idx = maxsim_index_load(spark, path)
        c = {}
        got = _rows(maxsim_search_indexed_pruned(idx, list(terms), k=10,
                                                 counters=c))
        want = _rows(maxsim_search_indexed(idx, list(terms), k=10))
        assert got == want, (tag, terms)
        return c

    c = check("after append")
    assert c["fallback"] is None
    assert 1 <= c["n_cells_alive"] <= c["n_cells_total"] == 8

    live = docs.filter(F.col("doc_id") % 11 != 3) \
        .select(F.col("doc_id").alias("id"))
    assert maxsim_index_sync_deletes(spark, FakeStore(live), path) > 0
    c = check("after deletes")          # tombstones filter, no fallback
    assert c["fallback"] is None

    maxsim_index_compact_saved(spark, path)
    c = check("after compact")
    assert c["fallback"] is None
    # a different query shape exercises other cells
    check("multi", terms=("stream", "dup"))


def test_pruned_skips_cells_on_derived_vocab(spark, tmp_path):
    """The regime the layer exists for: a derived vocabulary
    (word+suffix tokens) where the pbk hash scatters every query term's
    morphological neighbors across all buckets — the cell gate must
    skip most cells while staying bit-identical."""
    from vector_db_at_home_spark.operators.featurize import (
        maxsim_index_load,
        maxsim_index_save,
        maxsim_search_indexed,
        maxsim_search_indexed_pruned,
    )

    words = ["vector", "merge", "batch", "store", "query", "index",
             "token", "stream"]
    base = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(words[i % len(words)]),
                       F.pmod(F.xxhash64(F.col("id") + i), F.lit(50)))
              for i in range(12)],
        ).alias("text"),
    )
    docs = base.withColumn(
        "text",
        F.when(F.col("doc_id") % 40 == 0,
               F.concat(F.col("text"), F.lit(" vector merge")))
        .otherwise(F.col("text")))
    path = str(tmp_path / "derived")
    maxsim_index_save(docs, "text", "doc_id", path, dim=16,
                      n_buckets=32, n_token_cells=16)
    idx = maxsim_index_load(spark, path)
    c = {}
    got = _rows(maxsim_search_indexed_pruned(idx, ["vector", "merge"],
                                             k=10, counters=c))
    want = _rows(maxsim_search_indexed(idx, ["vector", "merge"], k=10))
    assert got == want
    assert c["fallback"] is None
    assert c["n_cells_alive"] < c["n_cells_total"]  # something skipped


def test_pruned_fallbacks(spark, tmp_path):
    from vector_db_at_home_spark.operators.featurize import (
        maxsim_index_load,
        maxsim_index_save,
        maxsim_search_indexed,
        maxsim_search_indexed_pruned,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"),
         (3, "eta theta iota")],
        "doc_id long, text string",
    )
    # no cell layer saved → full read
    p1 = str(tmp_path / "nocells")
    maxsim_index_save(docs, "text", "doc_id", p1, dim=16, n_buckets=4)
    idx1 = maxsim_index_load(spark, p1)
    c = {}
    got = _rows(maxsim_search_indexed_pruned(idx1, ["alpha"], k=2,
                                             counters=c))
    assert c["fallback"] == "no_cell_layer"
    assert got == _rows(maxsim_search_indexed(idx1, ["alpha"], k=2))

    # membership tail: fewer than k positive docs → full read, and the
    # 0-score members appear exactly as the full path surfaces them
    p2 = str(tmp_path / "tail")
    maxsim_index_save(docs, "text", "doc_id", p2, dim=16, n_buckets=4,
                      n_token_cells=2)
    idx2 = maxsim_index_load(spark, p2)
    c = {}
    got = _rows(maxsim_search_indexed_pruned(idx2, ["alpha"], k=3,
                                             counters=c))
    assert c["fallback"] in ("membership_tail", "no_positive_cells")
    assert got == _rows(maxsim_search_indexed(idx2, ["alpha"], k=3))
