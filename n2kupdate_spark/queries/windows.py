"""B6 windows + B7 sort/limit/top-k (SURVEY.md §2).

Reference analog: "current = latest version per analysis" ranking (⟨pub⟩
R/store_analysis_version.R [M]). Every window here carries a total-order
tiebreak so results are deterministic (SURVEY.md §7.4.4).

Scale notes: a window partitioned by a key is one shuffle on that key;
global top-k uses orderBy+limit which Spark executes as
TakeOrderedAndProject (per-partition heap + driver merge of k rows — no
global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from n2kupdate_spark.functions import ts_seconds
from n2kupdate_spark.queries._registry import register
from n2kupdate_spark.sources import load


@register(
    "window_topn_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS rn
        FROM orders
    ) WHERE rn <= 5
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 orders by value within each priority class."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id
               ORDER BY CAST(epoch(date_trunc('second', ts)) AS BIGINT) ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 4) AS run_value
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user value over event time (ROWS frame)."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", ts_seconds("ts").alias("ts_s")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_s").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id", "event_id", F.round(F.sum("value").over(w), 4).alias("run_value")
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, ts_s,
           lag(ts_s) OVER w AS prev_ts_s,
           lead(event_id) OVER w AS next_event_id,
           ts_s - COALESCE(lag(ts_s) OVER w, ts_s) AS gap_s
    FROM (
        SELECT user_id, event_id,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s
        FROM events
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_s ASC, event_id ASC)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous/next-row deltas per user (event gap analysis)."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", ts_seconds("ts").alias("ts_s")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts_s").asc(), F.col("event_id").asc())
    return e.select(
        "user_id",
        "event_id",
        "ts_s",
        F.lag("ts_s").over(w).alias("prev_ts_s"),
        F.lead("event_id").over(w).alias("next_event_id"),
        (F.col("ts_s") - F.coalesce(F.lag("ts_s").over(w), F.col("ts_s"))).alias("gap_s"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, od_s,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY od_s ASC
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ), 4) AS moving_30d_total
    FROM (
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(epoch(date_trunc('second', o_orderdate)) AS BIGINT) AS od_s
        FROM orders
    )
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day moving spend per customer — a RANGE frame over epoch seconds
    (peer rows at the same instant aggregate together regardless of order)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        ts_seconds("o_orderdate").alias("od_s"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("od_s").asc())
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "od_s",
        F.round(F.sum("o_totalprice").over(w), 4).alias("moving_30d_total"),
    )


@register(
    "window_ntile_pct",
    oracle="""
    SELECT c_custkey,
           ntile(4) OVER w AS quartile,
           ROUND(percent_rank() OVER w, 4) AS pct_rank
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def window_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles + percentile rank of customers by balance. Single global
    window: fine for a dimension; facts would need a partitioned variant."""
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
    )


@register(
    "topk_order_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
)
def topk_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 most expensive line items, full-order tiebreak.
    Physically TakeOrderedAndProject: per-partition top-k heaps, then a
    driver merge of k·partitions rows — no global sort."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(100)
    )


@register(
    "sort_multi_key",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 500
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort, LIMITed so the selected set is order-independent and
    hash-checkable (the driver's value hash ignores row order)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.col("o_orderpriority").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(500)
    )


@register(
    "window_first_last",
    oracle="""
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_val,
           last_value(value) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val,
           nth_value(value, 2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value with explicit frames: last_value needs the
    full-partition frame (the default frame stops at CURRENT ROW — a classic
    correctness trap both engines share). Deterministic via event_id tiebreak."""
    e = load(spark, sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w_full).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


@register(
    "window_gaps_islands",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_type) OVER w IS NOT DISTINCT FROM event_type
                    THEN 0 ELSE 1 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
        SELECT user_id, event_type,
               SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS island_id
        FROM flagged
    ),
    runs AS (
        SELECT user_id, event_type, island_id, COUNT(*) AS streak
        FROM islands GROUP BY user_id, event_type, island_id
    )
    SELECT user_id, event_type,
           COUNT(*) AS n_islands, MAX(streak) AS max_streak
    FROM runs GROUP BY user_id, event_type
    """,
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive same-type events per
    user (streak detection — the sessionization cousin keyed on value
    change, not time gap). Island ids via the change-flag cumulative sum;
    one shuffle on user_id serves every window. Deterministic through the
    (ts, event_id) total order."""
    e = load(spark, sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 0)
        .otherwise(1)
        .alias("chg"),
    )
    islands = flagged.select(
        "user_id",
        "event_type",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island_id"),
    )
    runs = islands.groupBy("user_id", "event_type", "island_id").agg(
        F.count(F.lit(1)).alias("streak")
    )
    return runs.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_islands"), F.max("streak").alias("max_streak")
    )


@register(
    "window_cume_dist",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           ROUND(cume_dist() OVER w, 4) AS cd,
           ROUND(avg(o_totalprice) OVER (PARTITION BY o_orderpriority), 4)
               AS prio_avg
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distribution of order value within each priority class,
    alongside the class average (two window specs, one partitioning — Spark
    plans a single exchange on o_orderpriority feeding both Window
    operators). Completes the ranking-function surface next to
    ntile/percent_rank/row_number."""
    o = load(spark, sf_dir, "orders",
             columns=["o_orderpriority", "o_orderkey", "o_totalprice"])
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    wp = Window.partitionBy("o_orderpriority")
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.cume_dist().over(w), 4).alias("cd"),
        F.round(F.avg("o_totalprice").over(wp), 4).alias("prio_avg"),
    )
