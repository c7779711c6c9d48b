"""B3 — hashing / fingerprint / dedup (SURVEY.md §2 B3).

Reference analog: ``digest::sha1`` over ordered natural-key values — the
surrogate key and idempotence mechanism of every store function (⟨pub⟩
R/store_*.R [H]). md5/sha256 are the oracle-checkable variants
(DuckDB has no sha1 — SURVEY.md §7.4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n2kupdate_spark.functions import fingerprint, ts_seconds
from n2kupdate_spark.operators import dedup_keep_latest
from n2kupdate_spark.queries._registry import register
from n2kupdate_spark.sources import load


@register(
    "fingerprint_md5",
    oracle="""
    SELECT c_custkey,
           md5(concat_ws('|', CAST(c_custkey AS VARCHAR), c_name, c_mktsegment)) AS fp
    FROM customer
    """,
)
def fingerprint_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        fingerprint(["c_custkey", "c_name", "c_mktsegment"], "md5").alias("fp"),
    )


@register(
    "fingerprint_sha256",
    oracle="""
    SELECT s_suppkey,
           sha256(concat_ws('|', CAST(s_suppkey AS VARCHAR), s_name)) AS fp
    FROM supplier
    """,
)
def fingerprint_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        fingerprint(["s_suppkey", "s_name"], "sha256").alias("fp"),
    )


@register("fingerprint_sha1")  # rows-only: DuckDB 1.0 has no sha1
def fingerprint_sha1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faithful SHA-1 fingerprint (the reference's exact hash)."""
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        fingerprint(["c_custkey", "c_name", "c_mktsegment"], "sha1").alias("fp"),
    )


@register(
    "dedup_exact",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate removal on the natural key (distinct over key columns
    only — deterministic, unlike dropDuplicates over partial columns)."""
    return load(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@register(
    "dedup_keep_latest",
    oracle="""
    SELECT user_id, event_id, event_type,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id
        ORDER BY CAST(epoch(date_trunc('second', ts)) AS BIGINT) DESC, event_id DESC
    ) = 1
    """,
)
def dedup_keep_latest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per key keeping the most recent (the reference's "current
    version" semantics). Ordered by (epoch-second, event_id) on both engines
    so sub-second precision differences can't flip the winner."""
    df = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", ts_seconds("ts").alias("ts_s")
    )
    return dedup_keep_latest(
        df, ["user_id"], [F.col("ts_s").desc(), F.col("event_id").desc()]
    )
