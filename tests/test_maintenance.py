"""Saved-index compaction tests: fewer files, identical content,
crash-window recovery."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F


def _parquet_files(root):
    return [
        os.path.join(r, f)
        for r, _, files in os.walk(root)
        for f in files
        if f.endswith(".parquet")
    ]


def test_ivfsq_compact_after_syncs(spark, tmp_path):
    """Repeated sync appends accumulate small files; compaction shrinks
    the file count, preserves every row, and the compacted index
    searches identically."""
    from vector_db_at_home_spark.operators.maintenance import (
        ivfsq_compact_saved,
    )
    from vector_db_at_home_spark.operators.sq import (
        ivfsq_build,
        ivfsq_load,
        ivfsq_save,
        ivfsq_search,
        ivfsq_sync_with_store,
    )
    from vector_db_at_home_spark.store import VectorStore

    rng = np.random.default_rng(3)
    store = VectorStore(spark, tmp_path / "st", dim=8)
    store.insert(rng.normal(size=(30, 8)).astype("float32"))
    path = str(tmp_path / "sqidx")
    ivfsq_save(
        ivfsq_build(store.df().select("id", "vec"),
                    id_col="id", vec_col="vec", n_cells=4),
        path,
    )
    for _ in range(4):
        store.insert(rng.normal(size=(10, 8)).astype("float32"))
        assert ivfsq_sync_with_store(spark, store, path,
                                     id_col="id", vec_col="vec") == 10
    before_files = len(_parquet_files(f"{path}/codes"))
    re = ivfsq_load(spark, path)
    qs = store.df().filter(F.col("id") == 42).select(
        F.lit(42).alias("query_id"), F.col("vec").alias("qvec")
    )
    pre = ivfsq_search(re, qs, k=3, n_probes=4).collect()
    # materialize the pre-compaction content NOW: the lazy frame would
    # otherwise re-list the directory after the rewrite replaced it
    a = {(r.id, r.cell, r.scale, tuple(r.codes))
         for r in re.codes.collect()}

    ivfsq_compact_saved(spark, path, target_partitions=4)
    after_files = len(_parquet_files(f"{path}/codes"))
    assert after_files < before_files
    re2 = ivfsq_load(spark, path)
    assert re2.codes.count() == 70
    post = ivfsq_search(re2, qs, k=3, n_probes=4).collect()
    assert [(r.query_id, r.id) for r in pre] \
        == [(r.query_id, r.id) for r in post]
    b = {(r.id, r.cell, r.scale, tuple(r.codes))
         for r in re2.codes.collect()}
    assert a == b


def test_compact_crash_window_recovery(spark, tmp_path):
    """A crash between the two renames leaves the table at _old_<name>;
    recover_compact_crash restores it and the next compact succeeds."""
    import shutil

    from vector_db_at_home_spark.operators.maintenance import (
        compact_saved_table,
        recover_compact_crash,
    )

    tdir = str(tmp_path / "tbl")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("cell")
    ).write.partitionBy("cell").parquet(tdir)
    # simulate the crash shape: live table parked at _old_, stage exists
    shutil.move(tdir, str(tmp_path / "_old_tbl"))
    os.makedirs(str(tmp_path / "_compact_tbl"))
    recover_compact_crash(spark, tdir)
    assert os.path.isdir(tdir)
    assert not os.path.exists(str(tmp_path / "_old_tbl"))
    assert not os.path.exists(str(tmp_path / "_compact_tbl"))
    assert spark.read.parquet(tdir).count() == 100
    compact_saved_table(spark, tdir, target_partitions=2,
                        partition_by="cell")
    assert spark.read.parquet(tdir).count() == 100


def test_ivf_and_pq_compact_wrappers(spark, tmp_path):
    from vector_db_at_home_spark.operators.ann import (
        ivf_build,
        ivf_load,
        ivf_save,
        ivf_sync_with_store,
    )
    from vector_db_at_home_spark.operators.maintenance import (
        ivf_compact_saved,
        pq_compact_saved,
    )
    from vector_db_at_home_spark.operators.pq import (
        pq_build,
        pq_load,
        pq_save,
        pq_sync_with_store,
    )
    from vector_db_at_home_spark.store import VectorStore

    rng = np.random.default_rng(5)
    store = VectorStore(spark, tmp_path / "st2", dim=8)
    store.insert(rng.normal(size=(40, 8)).astype("float32"))
    ivf_path = str(tmp_path / "ivf")
    ivf_save(ivf_build(store.df().select("id", "vec"),
                       id_col="id", vec_col="vec", n_cells=4), ivf_path)
    pq_path = str(tmp_path / "pq")
    pq_save(pq_build(store.df().select("id", "vec"),
                     id_col="id", vec_col="vec", m=4), pq_path)
    store.insert(rng.normal(size=(12, 8)).astype("float32"))
    assert ivf_sync_with_store(spark, store, ivf_path,
                               id_col="id", vec_col="vec") == 12
    assert pq_sync_with_store(spark, store, pq_path,
                              id_col="id", vec_col="vec") == 12
    ivf_compact_saved(spark, ivf_path, target_partitions=2)
    pq_compact_saved(spark, pq_path, target_partitions=2)
    assert ivf_load(spark, ivf_path).assigned.count() == 52
    assert pq_load(spark, pq_path).codes.count() == 52
