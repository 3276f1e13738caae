"""Structured Streaming extensions over the events table.

The reference is strictly batch/eager (SURVEY.md §2.5: no streaming of any
kind) — this module is a north-star extension: the same event-analytics
queries expressed as incremental streaming plans, so the engine covers
watermarks, event-time windows, late data, and custom state.

Design notes for scale:
- File source (``readStream.parquet``) with ``maxFilesPerTrigger`` models a
  landing-zone ingest; in production swap for Kafka — the plan is identical.
- Watermark bounds state: aggregation state for windows older than the
  watermark is dropped, so state size is O(windows within the lateness
  horizon), not O(stream length).
- ``applyInPandasWithState`` sessionization keeps one state entry per active
  (user) key, with processing-time timeouts to close idle sessions — the
  canonical custom-stateful-operator shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, src_dir: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over parquet event files (landing-zone model)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def events_stream_windowed_counts(events: DataFrame,
                                  window: str = "1 hour",
                                  watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling-window counts with late-data handling.

    Incremental form of ``relational.events_windowed_agg``: partial aggs are
    maintained in state, late events within the watermark update their
    window, older ones are dropped.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator: per-user sessionization with an inactivity
    gap, via ``applyInPandasWithState`` (update mode).

    Emits one row per CLOSED session (a new event more than ``gap_minutes``
    after the previous one closes the running session).  State per user is a
    4-tuple — O(active users) total.
    """
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdf_iter, state):
        user_id = key[0]
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us, last_us, n, total = None, None, 0, 0.0
        closed: list[tuple] = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                t_us = int(pd.Timestamp(ts).value // 1000)
                if last_us is not None and t_us - last_us > gap_us:
                    closed.append((user_id, start_us, last_us, n, total))
                    start_us, n, total = t_us, 0, 0.0
                if start_us is None:
                    start_us = t_us
                last_us = t_us
                n += 1
                total += float(value) if value is not None else 0.0
        state.update((start_us, last_us, n, total))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1] * 1000) for c in closed],
                    "session_end": [pd.Timestamp(c[2] * 1000) for c in closed],
                    "n_events": [c[3] for c in closed],
                    "total_value": [c[4] for c in closed],
                }
            )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def dedup_events_stream(events: DataFrame,
                        watermark: str = "1 day") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes — the streaming form of the batch exact-dedup
    operator: state is O(keys within the lateness horizon), not O(stream)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_stream_to_memory(stream_df: DataFrame, query_name: str,
                         output_mode: str = "append") -> None:
    """Execute a streaming plan to completion over the available files
    (availableNow trigger) into an in-memory sink table named
    ``query_name`` — the test/verification harness."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
