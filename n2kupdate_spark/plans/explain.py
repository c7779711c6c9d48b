"""Physical-plan inspection helpers.

The 100 TB design goal is enforced as *tests over plans* (tests/
test_plans.py): filters must reach the parquet scan, projections must prune
the read schema, dimension joins must broadcast, and hot paths must sit in
whole-stage codegen. `.explain()` output is the ground truth Catalyst
gives us; these helpers parse the formatted text.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame, *needles: str) -> bool:
    """True if the scan node reports non-empty PushedFilters (optionally
    containing each needle, e.g. a column name)."""
    plan = explain_str(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    if not m or not m.group(1).strip():
        return False
    return all(n in m.group(1) for n in needles)


def read_schema_columns(df: DataFrame, table_hint: str | None = None) -> list[list[str]]:
    """Column lists of each scan's ReadSchema (what parquet actually reads)."""
    plan = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider spans = fewer = better)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))))
