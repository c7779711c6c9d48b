"""B8 — set operations (SURVEY.md §2 B8).

Reference analog: union of child/parent frames before staging; set-difference
detects membership rows to close in set-replacement merges (⟨pub⟩
R/store_location_group_location.R [M]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n2kupdate_spark.queries import fixtures as FX
from n2kupdate_spark.queries._registry import register
from n2kupdate_spark.sources import load


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


@register(
    "reshape_pivot",
    oracle="""
    SELECT o_orderpriority,
           ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 4) AS O,
           ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 4) AS F,
           ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 4) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot with an explicit value list (never inferred: value
    discovery is an extra full pass AND nondeterministic column order at
    scale). Semantically = conditional aggregation, which is the oracle."""
    o = load(spark, sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 4))
    )


@register(
    "reshape_unpivot",
    oracle="""
    WITH t AS (
        SELECT o_orderkey, o_totalprice AS price,
               CAST(o_orderkey % 3 AS DOUBLE) AS fee
        FROM orders
    )
    SELECT o_orderkey, name, value
    FROM t UNPIVOT (value FOR name IN (price, fee))
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt). Pure row-local reshape — no shuffle; rows
    expand ×(number of unpivoted columns)."""
    o = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]).select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        (F.col("o_orderkey") % 3).cast("double").alias("fee"),
    )
    return o.unpivot("o_orderkey", ["price", "fee"], "name", "value")


@register(
    "setop_except_all",
    oracle=f"""
    WITH t AS ({FX.MEMBERSHIP_TARGET_SQL}), i AS ({FX.MEMBERSHIP_INCOMING_SQL})
    SELECT grp, member FROM t EXCEPT ALL SELECT grp, member FROM i
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (multiset semantics: each target occurrence is
    cancelled by at most one incoming occurrence) — the form that preserves
    duplicate counts where EXCEPT would collapse them. Planned as an
    aggregate-on-key + count arithmetic, one shuffle."""
    return FX.membership_target(spark, sf_dir).exceptAll(
        FX.membership_incoming(spark, sf_dir)
    )


@register(
    "setop_intersect_all",
    oracle=f"""
    WITH t AS ({FX.MEMBERSHIP_TARGET_SQL}), i AS ({FX.MEMBERSHIP_INCOMING_SQL})
    SELECT grp, member FROM t INTERSECT ALL SELECT grp, member FROM i
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (min of per-side multiplicities per row)."""
    return FX.membership_target(spark, sf_dir).intersectAll(
        FX.membership_incoming(spark, sf_dir)
    )
