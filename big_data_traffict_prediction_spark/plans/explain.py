"""Physical-plan audits.

"Would this plan survive a 100× scale-up?" is checked here, in code,
not by eyeballing: every structural claim the operator docstrings make
(filter pushed to the scan, dim join broadcast, top-k not a global
sort, no Python in the hot path) has an assertion tests can run
against the formatted plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    return bool(m and m.group(1).strip())


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually requested from parquet (column pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(c.split(":")[0] for c in m.group(1).split(",") if c)
    return cols


def _node_count(plan: str, node: str) -> int:
    """Count physical operators by their detail-section headers
    ("(5) Exchange") — each node prints twice in formatted output
    (tree line + detail header), so a raw substring count doubles."""
    return len(re.findall(rf"^\(\d+\) {node}\b", plan, re.MULTILINE))


def broadcast_join_count(df: DataFrame) -> int:
    return _node_count(formatted_plan(df), "BroadcastHashJoin")


def shuffle_count(df: DataFrame) -> int:
    return _node_count(formatted_plan(df), "Exchange")


def nested_loop_join_count(df: DataFrame) -> int:
    """BroadcastNestedLoopJoin / CartesianProduct operators — the
    theta-join shapes that do NOT scale (one unbounded task)."""
    plan = formatted_plan(df)
    return _node_count(plan, "BroadcastNestedLoopJoin") + _node_count(
        plan, "CartesianProduct"
    )


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def python_eval_count(df: DataFrame) -> int:
    """Row-at-a-time Python UDF operators in the plan (should be 0
    everywhere; ArrowEvalPython/FlatMapGroupsInPandas are the blessed
    vectorized exceptions)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\bBatchEvalPython\b", plan))


def audit(df: DataFrame) -> dict:
    plan = formatted_plan(df)
    return {
        "pushed_filters": has_pushed_filters(df),
        "read_schema": read_schema_columns(df),
        "broadcast_joins": _node_count(plan, "BroadcastHashJoin"),
        "sort_merge_joins": _node_count(plan, "SortMergeJoin"),
        "shuffles": _node_count(plan, "Exchange"),
        "take_ordered": "TakeOrderedAndProject" in plan,
        "python_row_udfs": python_eval_count(df),
        "wholestage_codegen_spans": len(re.findall(r"WholeStageCodegen", plan)),
    }
