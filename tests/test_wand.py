"""Block-Max WAND BM25 serving (r12, VERDICT r11 task 2): top-k-safe
pruning must be EXACT — bit-identical rows to the full indexed read on
every corpus — while actually skipping blocks on skewed term
distributions, and falling back (never answering wrongly) whenever the
bounds can't be trusted (pending tombstones, pre-blockmax stores,
underfilled seeds)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


class FakeStore:
    def __init__(self, df_):
        self._df = df_

    def df(self):
        return self._df


def _rows(df):
    return [(r.id, r.score_e4) for r in df.collect()]


def test_wand_equals_indexed_real_corpus(spark, tmp_path):
    from vector_db_at_home_spark.operators.invindex import (
        bm25_search_indexed,
        bm25_search_indexed_wand,
        invindex_append,
        invindex_load,
        invindex_save,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "wand")
    invindex_save(docs.filter(F.col("doc_id") % 7 != 0),
                  "text", "doc_id", path, n_buckets=16, block_size=64)
    invindex_append(spark, path, docs.filter(F.col("doc_id") % 7 == 0),
                    "text", "doc_id")
    idx = invindex_load(spark, path)
    for terms in (["vector", "merge", "batch"], ["dup"],
                  ["the", "the", "dup"], ["query window sort"]):
        c = {}
        got = _rows(bm25_search_indexed_wand(idx, terms, k=10, counters=c))
        want = _rows(bm25_search_indexed(idx, terms, k=10))
        assert got == want, terms
        assert c["fallback"] is None, (terms, c)
        assert 1 <= c["n_survivors"] <= c["n_blocks"]


def test_wand_prunes_skewed_corpus(spark, tmp_path):
    """A rare high-idf term concentrated in a few id blocks: WAND must
    skip most blocks (the whole point) and still match the full read
    bit-for-bit."""
    from vector_db_at_home_spark.operators.invindex import (
        bm25_search_indexed,
        bm25_search_indexed_wand,
        invindex_load,
        invindex_save,
    )

    rows = []
    for i in range(2048):
        text = "filler words common stuff everywhere always"
        if i < 40:  # needle lives in the first id block(s)
            text = "needle " * (1 + i % 3) + text
        rows.append((i, text.strip()))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "skew")
    invindex_save(docs, "text", "doc_id", path, n_buckets=8,
                  block_size=64)
    idx = invindex_load(spark, path)
    c = {}
    got = _rows(bm25_search_indexed_wand(idx, ["needle", "filler"],
                                         k=10, theta_blocks=2,
                                         counters=c))
    want = _rows(bm25_search_indexed(idx, ["needle", "filler"], k=10))
    assert got == want
    assert c["fallback"] is None
    assert c["n_blocks"] == 32             # 2048 docs / 64
    assert c["n_survivors"] <= 2           # only the needle blocks
    assert c["cnt_survivors"] < c["cnt_total"] / 10  # >90% postings skipped


def test_wand_tombstone_fallback_then_compact_restores(spark, tmp_path):
    from vector_db_at_home_spark.operators.invindex import (
        bm25_search_indexed,
        bm25_search_indexed_wand,
        invindex_compact_saved,
        invindex_load,
        invindex_save,
        invindex_sync_deletes,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    path = str(tmp_path / "tomb")
    invindex_save(docs, "text", "doc_id", path, n_buckets=8,
                  block_size=32)
    live = docs.filter(F.col("doc_id") % 11 != 3) \
        .select(F.col("doc_id").alias("id"))
    assert invindex_sync_deletes(spark, FakeStore(live), path) > 0

    idx = invindex_load(spark, path)
    assert idx.has_tombstones
    c = {}
    got = _rows(bm25_search_indexed_wand(idx, ["vector", "merge"],
                                         k=10, counters=c))
    assert c["fallback"] == "tombstones"   # bounds would overcount
    assert got == _rows(bm25_search_indexed(idx, ["vector", "merge"],
                                            k=10))

    invindex_compact_saved(spark, path)    # folds deletes, rebuilds bounds
    idx2 = invindex_load(spark, path)
    assert not idx2.has_tombstones
    c2 = {}
    got2 = _rows(bm25_search_indexed_wand(idx2, ["vector", "merge"],
                                          k=10, counters=c2))
    assert c2["fallback"] is None
    assert got2 == got                     # deletes stayed folded
    assert got2 == _rows(bm25_search_indexed(idx2, ["vector", "merge"],
                                             k=10))


def test_wand_prebockmax_store_falls_back(spark, tmp_path):
    """A store whose meta has no block_size (pre-r12) must serve via
    the full read, not fail or mis-prune."""
    from vector_db_at_home_spark.operators.invindex import (
        bm25_search_indexed,
        bm25_search_indexed_wand,
        invindex_load,
        invindex_save,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    path = str(tmp_path / "old")
    invindex_save(docs, "text", "doc_id", path, n_buckets=8)
    import shutil

    shutil.rmtree(f"{path}/blockmax")      # simulate a pre-r12 store
    # meta still carries block_size; the loader requires BOTH
    idx = invindex_load(spark, path)
    assert idx.blockmax is None
    c = {}
    got = _rows(bm25_search_indexed_wand(idx, ["vector"], k=5,
                                         counters=c))
    assert c["fallback"] == "no_blockmax"
    assert got == _rows(bm25_search_indexed(idx, ["vector"], k=5))
