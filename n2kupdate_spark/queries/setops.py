"""B8 — set operations (SURVEY.md §2 B8).

Reference analog: union of child/parent frames before staging; set-difference
detects membership rows to close in set-replacement merges (⟨pub⟩
R/store_location_group_location.R [M]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from n2kupdate_spark.queries import fixtures as FX
from n2kupdate_spark.queries._registry import register


@register(
    "setop_union_all",
    oracle=f"""
    WITH t AS ({FX.MEMBERSHIP_TARGET_SQL}), i AS ({FX.MEMBERSHIP_INCOMING_SQL})
    SELECT grp, member FROM t UNION ALL SELECT grp, member FROM i
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two batches (duplicates preserved)."""
    return FX.membership_target(spark, sf_dir).unionByName(
        FX.membership_incoming(spark, sf_dir)
    )


@register(
    "setop_union_distinct",
    oracle=f"""
    WITH t AS ({FX.MEMBERSHIP_TARGET_SQL}), i AS ({FX.MEMBERSHIP_INCOMING_SQL})
    SELECT grp, member FROM t UNION SELECT grp, member FROM i
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (distinct pairs)."""
    return (
        FX.membership_target(spark, sf_dir)
        .unionByName(FX.membership_incoming(spark, sf_dir))
        .distinct()
    )


@register(
    "setop_except",
    oracle=f"""
    WITH t AS ({FX.MEMBERSHIP_TARGET_SQL}), i AS ({FX.MEMBERSHIP_INCOMING_SQL})
    SELECT grp, member FROM t EXCEPT SELECT grp, member FROM i
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target pairs absent from the incoming batch — the close/delete set of
    the reference's set-replacement merge."""
    return FX.membership_target(spark, sf_dir).subtract(
        FX.membership_incoming(spark, sf_dir)
    )


@register(
    "setop_intersect",
    oracle=f"""
    WITH t AS ({FX.MEMBERSHIP_TARGET_SQL}), i AS ({FX.MEMBERSHIP_INCOMING_SQL})
    SELECT grp, member FROM t INTERSECT SELECT grp, member FROM i
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs present in both target and incoming (the keep set)."""
    return FX.membership_target(spark, sf_dir).intersect(
        FX.membership_incoming(spark, sf_dir)
    )
