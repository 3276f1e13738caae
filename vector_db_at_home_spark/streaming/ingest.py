"""Streaming ingest into the VectorStore — closes the loop from a live
vector feed to searchable storage.

``stream_into_store`` runs a Structured Streaming query whose sink is the
store's append path via ``foreachBatch``: each micro-batch allocates
contiguous ids (max+1, preserving the reference's allocation semantics
under the stream's serialized batch execution) and appends parquet files to
the current snapshot.  Searches on the store see each batch as soon as its
files land; ``store.compact()`` handles the accumulated small files.

At production scale the same pattern holds with the feed on Kafka and the
store on object storage — foreachBatch is the canonical exactly-once-per-
batch bridge from streams to non-streaming sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import VECTOR_SCHEMA
from ..store import VectorStore


def stream_into_store(stream_df: DataFrame, store: VectorStore,
                      vec_col: str = "vec", doc_col: str = "doc",
                      checkpoint_dir: str | None = None):
    """Start a streaming query appending ``(vec, doc)`` rows to the store.

    ``stream_df`` must carry an ``array<float>`` vector column and a string
    doc column.  Returns the StreamingQuery; callers trigger/await it.
    Batches execute serially, so max(id)+1 allocation stays race-free — the
    same single-writer model as the reference (vector_store.py:195-212).
    """

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        prepared = batch_df.select(
            F.col(vec_col).cast("array<float>").alias("vec"),
            F.coalesce(F.col(doc_col), F.lit("{}")).alias("doc"),
        )
        rows = prepared.collect()
        if not rows:
            return
        max_id = store.df().agg(F.max("id")).first()[0]
        start = 0 if max_id is None else max_id + 1
        out = store.spark.createDataFrame(
            [(start + i, [float(x) for x in r.vec], r.doc)
             for i, r in enumerate(rows)],
            VECTOR_SCHEMA,
        )
        out.write.mode("append").parquet(
            store._snapshot_dir(store._current_version())
        )
        store._invalidate_cache()

    writer = stream_df.writeStream.foreachBatch(append_batch).outputMode("append")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()
