from n2kupdate_spark.plans.explain import (
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    read_schema_columns,
    whole_stage_codegen_spans,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "has_pushed_filters",
    "read_schema_columns",
    "whole_stage_codegen_spans",
]
