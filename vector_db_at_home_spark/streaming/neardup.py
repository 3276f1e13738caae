"""Streaming ingest with near-duplicate rejection against the live store.

The production ingestion loop for a training corpus: every arriving batch
is (1) exact-deduped within itself and against the store by content digest,
(2) near-dup-screened against the CURRENT store with the incremental
MinHash join (``dedup.minhash_lsh_pairs_incremental`` — the store is
scanned, never self-joined), and (3) only the survivors are appended.
Because batches execute serially under Structured Streaming's foreachBatch
contract, each batch sees every previously accepted doc — no
read-your-writes race.

This composes three proven pieces (streaming ingest, exact dedup,
incremental MinHash) rather than re-implementing any; the per-batch cost
is bounded by the batch's own shingles plus its band collisions with the
store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..store import VectorStore
from .ingest import stream_into_store


def stream_into_store_neardup(stream_df: DataFrame, store: VectorStore,
                              vec_col: str = "vec", doc_col: str = "doc",
                              jaccard_threshold: float = 0.7,
                              shingle_n: int = 3,
                              checkpoint_dir: str | None = None,
                              trigger: dict | None = None,
                              max_doc_freq: int | None = None,
                              max_band_bucket: int | None = None,
                              state_dir: str | None = None):
    """Start a streaming query appending only novel ``(vec, doc)`` rows.

    Rejection rules, applied per micro-batch in order:

    1. within-batch exact dedup — first row per content digest wins;
    2. exact dedup vs the store — digest anti-join;
    3. near-dup vs the store — docs whose verified n-gram Jaccard against
       ANY stored doc ≥ ``jaccard_threshold`` are dropped (MinHash-banded
       candidates, exact verification, so precision is exact and recall is
       the banding bound).

    Within-batch NEAR-dups are deliberately admitted in the same batch
    (both may be novel vs the store; ordering a greedy drop inside an
    unordered batch would be arbitrary) — they reject each other's future
    re-deliveries once stored.

    ``state_dir`` (recommended beyond toy stores): persist the corpus-side
    MinHash state there (``dedup.minhash_corpus_state_build`` on the first
    batch, ``_append`` for each batch's survivors) so the near-dup screen
    costs O(batch + collisions) instead of re-deriving the whole store's
    signatures every micro-batch (measured 11× wall / 20× shuffle at 1M
    docs — SCALE.md).  The doc-frequency/bucket caps are frozen at state
    build; rebuild on your compaction cadence.  ``None`` keeps the
    recompute-per-batch form (exact caps every batch)."""
    from ..operators.dedup import minhash_lsh_pairs_incremental

    def screen(batch_df: DataFrame) -> DataFrame:
        digested = batch_df.withColumn(
            "__digest", F.md5(F.coalesce(F.col(doc_col), F.lit("{}")))
        )
        # (1) within-batch exact: one row per digest
        batch_u = digested.dropDuplicates(["__digest"])
        corpus = store.df().select(
            F.col("id"), F.coalesce(F.col("doc"), F.lit("{}")).alias("doc")
        )
        # (2) exact vs store
        stored_digests = corpus.select(F.md5("doc").alias("__digest"))
        batch_u = batch_u.join(stored_digests, "__digest", "left_anti")
        # (3) near-dup vs store: stable per-batch ids via the digest hash
        keyed = batch_u.withColumn(
            "__bid",
            F.conv(F.substring("__digest", 1, 15), 16, 10).cast("long"),
        )
        if keyed.isEmpty():
            return keyed.drop("__digest", "__bid")
        batch_docs = keyed.select(
            F.col("__bid").alias("doc_id"),
            F.coalesce(F.col(doc_col), F.lit("{}")).alias("text"),
        )
        corpus_docs = corpus.select(
            F.col("id").alias("doc_id"), F.col("doc").alias("text")
        )
        if state_dir is not None:
            import os

            from ..operators.dedup import (
                minhash_corpus_state_build,
                minhash_lsh_pairs_incremental_prepared,
            )

            spark = batch_df.sparkSession
            if not os.path.exists(os.path.join(state_dir, "bands")):
                minhash_corpus_state_build(
                    corpus_docs, state_dir, "text", "doc_id", n=shingle_n,
                    max_doc_freq=max_doc_freq,
                    max_band_bucket=max_band_bucket,
                )
            hits = minhash_lsh_pairs_incremental_prepared(
                spark, state_dir, batch_docs, "text", "doc_id",
                threshold=jaccard_threshold,
            )
        else:
            hits = minhash_lsh_pairs_incremental(
                batch_docs, corpus_docs,
                "text", "doc_id", n=shingle_n, threshold=jaccard_threshold,
                max_doc_freq=max_doc_freq, max_band_bucket=max_band_bucket,
            )
        dupped = hits.select(F.col("new_id").alias("__bid")).distinct()
        survivors = keyed.join(F.broadcast(dupped), "__bid", "left_anti")
        # materialize so the expensive incremental-MinHash join runs exactly
        # once even though append_batch fires two actions (validation
        # count, then write) on the returned frame
        survivors = survivors.localCheckpoint(eager=True)
        if state_dir is not None:
            from ..operators.dedup import minhash_corpus_state_append

            minhash_corpus_state_append(
                batch_df.sparkSession, state_dir,
                survivors.select(
                    F.col("__bid").alias("doc_id"),
                    F.coalesce(F.col(doc_col), F.lit("{}")).alias("text"),
                ),
                "text", "doc_id",
            )
        return survivors.drop("__digest", "__bid")

    return stream_into_store(
        stream_df, store, vec_col=vec_col, doc_col=doc_col,
        checkpoint_dir=checkpoint_dir, trigger=trigger,
        prepare=screen,
    )
