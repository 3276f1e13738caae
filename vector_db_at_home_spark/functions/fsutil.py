"""Filesystem helpers that work on any Hadoop-supported filesystem.

State directories (MinHash corpus state, saved indexes, batch markers)
may live on HDFS/S3A at cluster scale; driver-local ``os`` calls are
silently wrong there (ADVICE r4: an ``os.path.exists`` probe on a remote
URI is always false).  These helpers go through the JVM Hadoop
``FileSystem`` API with a local-filesystem fallback for environments
without a JVM gateway (e.g. Spark Connect against a local checkout).
"""

from __future__ import annotations


def _hadoop_fs(spark, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def fs_exists(spark, path: str) -> bool:
    try:
        fs, p = _hadoop_fs(spark, path)
        return bool(fs.exists(p))
    except Exception:
        import os

        return os.path.exists(path)


def fs_touch(spark, path: str) -> None:
    """Create an empty marker file (parents included)."""
    try:
        fs, p = _hadoop_fs(spark, path)
        fs.create(p, True).close()
    except Exception:
        import os

        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write("done")


def fs_rename(spark, src: str, dst: str) -> None:
    """Atomic-per-FS rename (the commit primitive parquet jobs rely on)."""
    try:
        fs, s = _hadoop_fs(spark, src)
        _fs2, d = _hadoop_fs(spark, dst)
        if not fs.rename(s, d):
            raise IOError(f"rename {src} -> {dst} refused")
    except Exception:
        import os

        os.rename(src, dst)


def fs_rmtree(spark, path: str) -> None:
    """Recursive delete, ignore-missing."""
    try:
        fs, p = _hadoop_fs(spark, path)
        if fs.exists(p):
            fs.delete(p, True)
    except Exception:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
