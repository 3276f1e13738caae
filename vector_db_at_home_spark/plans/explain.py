"""Physical-plan introspection: make scale properties testable.

The 100 TB design brief is enforced here, not just documented: tests assert
that filters reach the Parquet scan (``PushedFilters``), small dims
broadcast (``BroadcastHashJoin``), per-group top-k inserts
``WindowGroupLimit``, and scan schemas are pruned to the referenced columns.
A plan regression (e.g. a filter that stops pushing down) fails CI instead
of surfacing as a 100× slowdown on a real cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().simpleString()


def assert_plan_contains(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    for n in needles:
        assert n in plan, f"expected {n!r} in plan:\n{plan}"


def has_pushed_filters(df: DataFrame, column: str) -> bool:
    """True if some filter on ``column`` is pushed into the Parquet scan."""
    plan = formatted_plan(df)
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if column in m.group(1):
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in each scan's ReadSchema (column-pruning evidence)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def broadcast_join_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")


def shuffle_exchange_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


def has_window_group_limit(df: DataFrame) -> bool:
    return "WindowGroupLimit" in formatted_plan(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Distinct whole-stage-codegen regions (Spark 4 formatted plans mark
    operators with ``[codegen id : N]``; AQE plans only after execution)."""
    plan = formatted_plan(df)
    ids = set(re.findall(r"codegen id : (\d+)", plan))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)
