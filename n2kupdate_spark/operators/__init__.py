from n2kupdate_spark.operators.merge import (
    merge_scd1,
    merge_insert_ignore,
    merge_set_replace,
    merge_scd2_close,
    merge_scd2_changes,
    merge_scd3,
    merge_scd4,
    merge_scd6,
    full_outer_diff,
)
from n2kupdate_spark.operators.relational import asof_join, dedup_keep_latest

__all__ = [
    "merge_scd1",
    "merge_insert_ignore",
    "merge_set_replace",
    "merge_scd2_close",
    "merge_scd2_changes",
    "merge_scd3",
    "merge_scd4",
    "merge_scd6",
    "full_outer_diff",
    "asof_join",
    "dedup_keep_latest",
]
