"""Stream-stream and stream-static joins.

Completes the streaming-join surface:

- ``stream_static_enrich`` — streaming events joined to a static dimension
  (broadcast per micro-batch; the dimension may be re-read each batch so
  slowly-changing dims stay fresh).
- ``stream_stream_interval_join`` — two event streams joined on a key with
  an event-time interval condition.  BOTH sides carry watermarks, and the
  time-range predicate bounds the join state: Spark retains each side's
  rows only while the other side's watermark can still produce a match —
  without the interval condition, stream-stream state grows forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(events: DataFrame, dim: DataFrame,
                         key: str) -> DataFrame:
    """Enrich a stream with a static (or slowly-changing) dimension table.
    Plain inner join — Catalyst broadcasts the static side into each
    micro-batch; no streaming state at all."""
    return events.join(F.broadcast(dim), key)


def stream_stream_interval_join(left: DataFrame, right: DataFrame,
                                key: str,
                                left_time: str = "ts",
                                right_time: str = "ts",
                                watermark: str = "1 hour",
                                max_lag: str = "30 minutes") -> DataFrame:
    """Join two streams on ``key`` where the right event happens within
    ``(left_time, left_time + max_lag]`` — e.g. clicks following views.

    Both watermarks + the interval predicate make the state BOUNDED:
    each view is dropped from state once the click-stream watermark passes
    ``view.ts + max_lag``; each click once the view-stream watermark passes
    ``click.ts``.
    """
    lt, rt = f"__lt_{left_time}", f"__rt_{right_time}"
    l_w = left.withWatermark(left_time, watermark).withColumnRenamed(
        left_time, lt
    )
    r_w = right.withWatermark(right_time, watermark).withColumnRenamed(
        right_time, rt
    )
    cond = (
        (l_w[key] == r_w[key])
        & (F.col(rt) > F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {max_lag}"))
    )
    return (
        l_w.join(r_w, cond)
        .drop(r_w[key])
        .withColumnRenamed(lt, left_time)
        .withColumnRenamed(rt, right_time)
    )
