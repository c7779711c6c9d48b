"""B2 — projection / filter / validation (SURVEY.md §2 B2).

Reference analog: column normalization + ``assertthat`` input guards that
open every store function — coerce to declared columns, reject NA keys,
check value domains (⟨pub⟩ every R/store_*.R [H]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n2kupdate_spark.queries._registry import register
from n2kupdate_spark.sources import load


@register(
    "project_rename",
    oracle="SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment FROM customer",
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select + rename + reorder (the reference's column normalization)."""
    return load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "project_cast_keys",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR) AS orderkey_s,
           CAST(o_custkey AS VARCHAR) AS custkey_s,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate_s
    FROM orders
    """,
)
def project_cast_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Everything-as-character key normalization (``character_df`` analog).
    Restricted to int/date columns — double→string formatting is
    engine-specific (SURVEY.md §7.4.6)."""
    return load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("orderkey_s"),
        F.col("o_custkey").cast("string").alias("custkey_s"),
        F.col("o_orderdate").cast("date").cast("string").alias("orderdate_s"),
    )


@register(
    "filter_predicate",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus IN ('F', 'O') AND o_totalprice BETWEEN 1000 AND 50000)
       OR o_orderpriority LIKE '1-%'
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound AND/OR/IN/BETWEEN/LIKE predicate (merge-SQL WHERE analog)."""
    df = load(spark, sf_dir, "orders")
    return df.filter(
        (F.col("o_orderstatus").isin("F", "O") & F.col("o_totalprice").between(1000, 50000))
        | F.col("o_orderpriority").like("1-%")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "filter_null_guard",
    oracle="""
    SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS segment
    FROM customer
    WHERE NULLIF(c_mktsegment, 'BUILDING') IS NOT NULL
    """,
)
def filter_null_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-key guard (``assert_that(noNA(...))`` analog). The testdata has
    no natural NULLs, so one is induced with NULLIF to prove the route."""
    df = load(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("segment")
    )
    return df.filter(F.col("segment").isNotNull())


@register(
    "validate_domain",
    oracle="""
    SELECT event_id, event_type
    FROM events
    WHERE event_type NOT IN ('click', 'view', 'purchase', 'signup')
    """,
)
def validate_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-domain check: rows violating the allowed set are routed out
    (the reference errors; an engine side-outputs them)."""
    allowed = ["click", "view", "purchase", "signup"]
    return (
        load(spark, sf_dir, "events")
        .filter(~F.col("event_type").isin(allowed))
        .select("event_id", "event_type")
    )
