"""Streaming deduplication — exact dedup for a live document feed.

A training-data ingest stream re-delivers documents (re-crawls, retries,
at-least-once sources); the batch `exact_dedup` can't help until data is at
rest.  Structured Streaming's stateful ``dropDuplicates`` keeps one state
entry per key seen; unbounded streams need the watermarked variant so state
is evicted once the key is older than the lateness bound (a re-delivery
later than the watermark is the source's SLA violation, not ours).

Two operators:

- ``dedup_stream`` — keyed on the md5 content digest (computed in the
  stream projection, so state stores a 32-char key, never the document).
  With ``watermark_delay`` the state is bounded by the event-time horizon
  (``dropDuplicatesWithinWatermark``); without it, state grows with
  distinct keys (only for bounded/replay streams).
- ``dedup_stream_counts`` — the monitoring side: per-window ingest volume
  vs distinct volume (duplicate rate over time) via windowed
  count / approx_count_distinct on the digest.

At cluster scale state lives in the state store (RocksDB-backed per
partition, keyed by digest hash) and the shuffle is the same digest
hash-partitioning the batch operator uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(stream_df: DataFrame, text_col: str,
                 ts_col: str | None = None,
                 watermark_delay: str | None = None) -> DataFrame:
    """First-delivery-wins exact dedup over a streaming DataFrame.

    Adds a ``digest`` column (md5 of the text — the batch ``exact_dedup``'s
    key, so batch and stream agree on identity) and drops rows whose digest
    was already seen.  ``watermark_delay`` (e.g. ``"10 minutes"``) with
    ``ts_col`` bounds the dedup state to the watermark horizon.
    """
    out = stream_df.withColumn("digest", F.md5(F.col(text_col)))
    if watermark_delay is not None:
        if ts_col is None:
            raise ValueError("watermark_delay requires ts_col")
        return out.withWatermark(ts_col, watermark_delay) \
            .dropDuplicatesWithinWatermark(["digest"])
    return out.dropDuplicates(["digest"])


def dedup_stream_counts(stream_df: DataFrame, text_col: str, ts_col: str,
                        window: str = "1 hour",
                        watermark_delay: str = "10 minutes") -> DataFrame:
    """Duplicate-rate monitoring: per event-time window, rows ingested vs
    approximate distinct digests.  Mergeable sketch aggregation — the
    exact distinct would hold every digest per open window in state."""
    digested = stream_df.withColumn("digest", F.md5(F.col(text_col)))
    return (
        digested.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.approx_count_distinct("digest").alias("n_distinct_approx"),
        )
        .select("win.start", "win.end", "n_rows", "n_distinct_approx")
    )
