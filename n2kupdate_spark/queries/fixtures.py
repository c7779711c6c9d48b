"""Derived staging/target fixtures for the merge-family operators.

The reference mutates a live PostgreSQL database; our merge operators are
pure transforms, so "current state" and "incoming batch" are *derived
identically in Spark and in the DuckDB oracle* from the customer table
(FIXTURES.md §2) — that keeps every merge hash-checkable:

- dim_target      : customers with c_custkey % 3 <> 0
- dim_incoming    : customers with c_custkey % 2 = 0, acctbal bumped +10
                    (overlap keys → the update branch; %6==0-ish keys → insert)
- membership_*    : (grp=c_nationkey, member=c_custkey) pairs; incoming skips
                    nations with c_nationkey % 5 == 1 so set-replacement has
                    untouched groups.
- BATCH_TS        : constant '2026-01-01 00:00:00' (never now() —
                    SURVEY.md §7.4.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n2kupdate_spark.sources import load

BATCH_TS = "2026-01-01 00:00:00"

DIM_TARGET_SQL = "SELECT * FROM customer WHERE c_custkey % 3 <> 0"
DIM_INCOMING_SQL = (
    "SELECT c_custkey, c_name, c_nationkey, ROUND(c_acctbal + 10, 2) AS c_acctbal, "
    "c_mktsegment FROM customer WHERE c_custkey % 2 = 0"
)
#: Incoming batch where only some overlapping keys actually change
#: (c_custkey % 4 == 0 gets an acctbal bump) — exercises the
#: unchanged / changed / absent / new branches of attribute-diffing merges.
DIM_INCOMING_PARTIAL_SQL = (
    "SELECT c_custkey, c_name, c_nationkey, "
    "ROUND(c_acctbal + CASE WHEN c_custkey % 4 = 0 THEN 10 ELSE 0 END, 2) AS c_acctbal, "
    "c_mktsegment FROM customer WHERE c_custkey % 2 = 0"
)
#: Pre-existing SCD4 history: versions archived by an earlier batch
#: (an acctbal 50 lower than today's), keyed independently of the
#: target slice so pass-through is exercised for keys both inside and
#: outside the current table.
DIM_HISTORY_SQL = (
    "SELECT c_custkey, c_name, c_nationkey, ROUND(c_acctbal - 50, 2) AS c_acctbal, "
    "c_mktsegment, '2025-06-01 00:00:00' AS archived_at "
    "FROM customer WHERE c_custkey % 9 = 0"
)
#: SCD6-shaped target: one open current row per key (valid 2025-01-01 →
#: NULL) plus, for c_custkey % 5 == 0, one closed history row holding an
#: acctbal 50 lower (valid 2024-06-01 → 2025-01-01) — both carrying the
#: dimension-wide current_acctbal mirror an earlier type-1 sweep left at
#: today's value. % 5 (not the SCD4 fixture's % 9) because % 9 ⊂ % 3 and
#: the target slice excludes % 3 == 0 — a % 9 history would be empty.
SCD6_TARGET_SQL = (
    "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, "
    "c_acctbal AS current_acctbal, "
    "'2025-01-01 00:00:00' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to, "
    "TRUE AS is_current "
    "FROM customer WHERE c_custkey % 3 <> 0 "
    "UNION ALL "
    "SELECT c_custkey, c_name, c_nationkey, ROUND(c_acctbal - 50, 2), "
    "c_mktsegment, c_acctbal, "
    "'2024-06-01 00:00:00', '2025-01-01 00:00:00', FALSE "
    "FROM customer WHERE c_custkey % 3 <> 0 AND c_custkey % 5 = 0"
)
MEMBERSHIP_TARGET_SQL = (
    "SELECT c_nationkey AS grp, c_custkey AS member FROM customer WHERE c_custkey % 3 <> 0"
)
MEMBERSHIP_INCOMING_SQL = (
    "SELECT c_nationkey AS grp, c_custkey AS member FROM customer "
    "WHERE c_custkey % 2 = 0 AND c_nationkey % 5 <> 1"
)


def dim_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 != 0)


def dim_incoming(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 2 == 0)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.round(F.col("c_acctbal") + 10, 2).alias("c_acctbal"),
            "c_mktsegment",
        )
    )


def dim_incoming_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 2 == 0)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.round(
                F.col("c_acctbal")
                + F.when(F.col("c_custkey") % 4 == 0, F.lit(10.0)).otherwise(F.lit(0.0)),
                2,
            ).alias("c_acctbal"),
            "c_mktsegment",
        )
    )


def dim_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 9 == 0)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.round(F.col("c_acctbal") - 50, 2).alias("c_acctbal"),
            "c_mktsegment",
            F.lit("2025-06-01 00:00:00").alias("archived_at"),
        )
    )


def scd6_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 != 0)
    cur = base.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.col("c_acctbal").alias("current_acctbal"),
        F.lit("2025-01-01 00:00:00").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    hist = base.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") - 50, 2).alias("c_acctbal"),
        "c_mktsegment",
        F.col("c_acctbal").alias("current_acctbal"),
        F.lit("2024-06-01 00:00:00").alias("valid_from"),
        F.lit("2025-01-01 00:00:00").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    return cur.unionByName(hist)


def membership_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 != 0)
        .select(F.col("c_nationkey").alias("grp"), F.col("c_custkey").alias("member"))
    )


def membership_incoming(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") % 2 == 0) & (F.col("c_nationkey") % 5 != 1))
        .select(F.col("c_nationkey").alias("grp"), F.col("c_custkey").alias("member"))
    )
