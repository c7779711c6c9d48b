from n2kupdate_spark.plans.explain import (
    capture_pre_ckpt_plans,
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    read_schema_columns,
    whole_stage_codegen_spans,
)

__all__ = [
    "capture_pre_ckpt_plans",
    "explain_str",
    "has_broadcast_join",
    "has_pushed_filters",
    "read_schema_columns",
    "whole_stage_codegen_spans",
]
