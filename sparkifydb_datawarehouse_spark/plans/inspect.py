"""Physical-plan inspection helpers.

These parse the executed-plan string (stable enough across Spark 3/4
for the properties asserted here). They exist so "the filter is pushed
down" and "this join broadcasts" are TESTED invariants, not hopes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_JOIN_NODE = re.compile(
    r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)\b"
)


def executed_plan(df: DataFrame, execute: bool = True) -> str:
    """The physical plan string. With execute=True the plan is run
    first so AQE's final plan (not the tentative one) is returned."""
    if execute:
        df.write.mode("overwrite").format("noop").save()
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans.

    The plan printer truncates long field lists with `...` (no closing
    bracket), so stop at whichever comes first — `]` or the ellipsis.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return re.findall(r"PushedFilters: \[(.*?)(?:\]|\.\.\.)", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema structs per scan — what actually gets read off disk
    (column pruning shows up here)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return re.findall(r"ReadSchema: (struct<[^>]*>)", plan)


def join_strategies(df: DataFrame, execute: bool = True) -> list[str]:
    """Join operator names in execution order (post-AQE if execute)."""
    return _JOIN_NODE.findall(executed_plan(df, execute=execute))
