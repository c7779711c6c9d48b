"""B4 — join family (SURVEY.md §2 B4).

Reference analogs: FK resolution joins (staging JOIN target ON fingerprint,
⟨pub⟩ R/store_datasource.R [H]), anti-join insert detection
(``INSERT … WHERE NOT EXISTS``, every store function), semi-join update
candidates, full-diff set-replacement.

Physical strategy is Catalyst's: small dims broadcast (explicit hint where
we know the side is small), big joins sort-merge on the shuffled key, AQE
converts to broadcast at runtime when a side turns out small. Asserted in
tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n2kupdate_spark.functions import ts_seconds
from n2kupdate_spark.operators import asof_join
from n2kupdate_spark.queries import fixtures as FX
from n2kupdate_spark.queries._registry import register
from n2kupdate_spark.sources import load


@register(
    "join_lookup_inner",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def join_lookup_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK resolution against a small dimension — broadcast hash join."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .select("c_custkey", "c_name", "n_name")
    )


@register(
    "join_star_multiway",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, n.n_name, r.r_name
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_star_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake traversal lineitem→orders→customer→nation→region (the
    multi-parent resolution of store_anomaly/store_observation). Dims are
    broadcast; the lineitem⋈orders join shuffles on the fact key."""
    l = load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])
    o = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    c = load(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_orderkey", "l_linenumber", "o_custkey", "n_name", "r_name")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT o.o_orderkey, c.c_name
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 5 = 0) c
      ON o.o_custkey = c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep unmatched left rows (missing-parent detection)."""
    o = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0)
    return o.join(c, o.o_custkey == c.c_custkey, "left").select("o_orderkey", "c_name")


@register(
    "join_anti_new_rows",
    oracle=f"""
    WITH target AS ({FX.DIM_TARGET_SQL}), incoming AS ({FX.DIM_INCOMING_SQL})
    SELECT i.c_custkey, i.c_name
    FROM incoming i
    WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.c_custkey = i.c_custkey)
    """,
)
def join_anti_new_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The insert set: incoming rows with no key match in the target
    (``INSERT … SELECT … WHERE NOT EXISTS`` — every store function)."""
    return (
        FX.dim_incoming(spark, sf_dir)
        .join(FX.dim_target(spark, sf_dir), on="c_custkey", how="left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "join_semi_existing",
    oracle=f"""
    WITH target AS ({FX.DIM_TARGET_SQL}), incoming AS ({FX.DIM_INCOMING_SQL})
    SELECT i.c_custkey, i.c_name
    FROM incoming i
    WHERE EXISTS (SELECT 1 FROM target t WHERE t.c_custkey = i.c_custkey)
    """,
)
def join_semi_existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The update-candidate set: incoming rows already present in target."""
    return (
        FX.dim_incoming(spark, sf_dir)
        .join(FX.dim_target(spark, sf_dir), on="c_custkey", how="left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "join_full_outer_diff",
    oracle=f"""
    WITH target AS ({FX.DIM_TARGET_SQL}), incoming AS ({FX.DIM_INCOMING_SQL})
    SELECT COALESCE(t.c_custkey, i.c_custkey) AS c_custkey,
           t.c_acctbal AS c_acctbal_old,
           i.c_acctbal AS c_acctbal_new,
           CASE WHEN t.c_custkey IS NULL THEN 'insert'
                WHEN i.c_custkey IS NULL THEN 'delete'
                WHEN t.c_acctbal IS DISTINCT FROM i.c_acctbal THEN 'update'
                ELSE 'unchanged' END AS change
    FROM target t FULL OUTER JOIN incoming i ON t.c_custkey = i.c_custkey
    """,
)
def join_full_outer_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full incoming-vs-target diff classified insert/update/delete —
    the union of the reference's merge branches, as one relation."""
    from n2kupdate_spark.operators import full_outer_diff

    diff = full_outer_diff(
        FX.dim_target(spark, sf_dir),
        FX.dim_incoming(spark, sf_dir),
        keys=["c_custkey"],
        compare_cols=["c_acctbal"],
    )
    return diff.select(
        "c_custkey",
        F.col("c_acctbal_old"),
        F.col("c_acctbal_new"),
        "change",
    )


@register(
    "join_theta_range",
    oracle="""
    SELECT a.n_name AS n1, b.n_name AS n2, a.n_regionkey
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi part on region + strict inequality on the key
    (unordered same-region nation pairs)."""
    a = load(spark, sf_dir, "nation").alias("a")
    b = load(spark, sf_dir, "nation").alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_name").alias("n1"), F.col("b.n_name").alias("n2"), F.col("a.n_regionkey")
    )


@register(
    "join_interval_overlap",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey
    FROM supplier s JOIN customer c
      ON c.c_acctbal >= s.s_acctbal - 100 AND c.c_acctbal < s.s_acctbal + 100
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join: customer balance falls in a ±100 band around
    each supplier balance — executed as a *grid-bucketed equi-join*, not a
    nested loop: each fixed-width interval is exploded onto the (≤2) grid
    cells it covers, each point hashes to exactly one cell, the cell id is
    an equi-key (hash/SMJ — shuffle-scalable), and the exact band predicate
    filters within cells. This is the standard range-join decomposition; a
    BNLJ here would be O(N·M) and was the one red flag the round-1 plan
    audit found."""
    W = 200.0  # grid cell width == band width
    s = load(spark, sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])
    c = load(spark, sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    s_cells = s.withColumn(
        "cell",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col("s_acctbal") - 100) / W),
                    F.floor((F.col("s_acctbal") + 100) / W),
                )
            )
        ),
    )
    c_cells = c.withColumn("cell", F.floor(F.col("c_acctbal") / W))
    return (
        c_cells.join(F.broadcast(s_cells), "cell")
        .filter(
            (F.col("c_acctbal") >= F.col("s_acctbal") - 100)
            & (F.col("c_acctbal") < F.col("s_acctbal") + 100)
        )
        .select("s_suppkey", "c_custkey")
    )


@register(
    "join_asof",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, event_type,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s
        FROM events
    )
    SELECT p.event_id, p.user_id, p.ts_s,
           c.event_id AS click_id, c.ts_s AS click_ts_s
    FROM (SELECT * FROM e WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
      ON c.user_id = p.user_id AND c.ts_s <= p.ts_s
    QUALIFY row_number() OVER (
        PARTITION BY p.event_id
        ORDER BY c.ts_s DESC NULLS LAST, c.event_id DESC NULLS LAST
    ) = 1
    """,
)
def join_asof_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent click at
    or before it. Spark side uses the union+running-last formulation (one
    shuffle, no pair explosion — see operators.relational.asof_join); the
    oracle uses the quadratic join+QUALIFY formulation, which is fine at
    sf0.01 but is exactly what we avoid at scale."""
    e = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", ts_seconds("ts").alias("ts_s")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts_s")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_s").alias("r_ts_s"),
        F.col("event_id").alias("click_id"),
        F.col("ts_s").alias("click_ts_s"),
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts_s",
        right_ts="r_ts_s",
        payload_cols=["click_id", "click_ts_s"],
        right_tiebreak="click_id",
    )


@register(
    "join_cross_small",
    oracle="SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian of two tiny dims (BroadcastNestedLoop). Guarded use only —
    never on fact tables."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "join_skew_salted",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS cnt,
           ROUND(SUM(l.l_extendedprice), 4) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join: the build side is replicated across SALT buckets
    and the probe side routes by a deterministic salt (l_linenumber % S), so
    one hot join key spreads over S shuffle partitions instead of one
    straggler task. Same result as the plain join (the oracle) — salting is
    a physical rewrite, not a semantic one. At 100 TB, AQE's skew-join
    splitting does this adaptively; explicit salting is the static fallback
    for when a key is *known* hot (e.g. the null/default key)."""
    S = 8
    l = load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_extendedprice"])
    o = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    salts = F.array(*[F.lit(i) for i in range(S)])
    o_rep = o.withColumn("salt", F.explode(salts))
    l_salted = l.withColumn("salt", (F.col("l_linenumber") % S).cast("int"))
    return (
        l_salted.join(o_rep, (F.col("l_orderkey") == F.col("o_orderkey")) & (l_salted.salt == o_rep.salt))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("l_extendedprice"), 4).alias("revenue"))
    )


@register(
    "join_lateral_topn",
    oracle="""
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n,
    LATERAL (SELECT c_name, c_acctbal FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_name LIMIT 2) t
    """,
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (Spark 4 SQL): per outer row, an inner
    query referencing the outer's columns — here top-2 customers by
    balance per nation, the per-row-parameterized shape a plain join +
    window also expresses (window_topn_per_group) but which LATERAL states
    directly and which generalizes to per-row LIMITs/UDTF args. Catalyst
    decorrelates this to a window-over-join plan, so the lateral form pays
    no nested-loop penalty at scale; DuckDB runs the identical SQL."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation_lat n,
        LATERAL (SELECT c_name, c_acctbal FROM customer_lat c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        """
    )


@register("join_asof_nearest")  # rows-only (r9 capacity policy): ≡
# pandas merge_asof(direction=...) on the same frames — the independent
# reference engine for the full direction surface —
# tests/test_merge_props.py
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction (r15 — completes the pandas
    merge_asof surface: backward is the registered join_asof, forward
    its mirror, nearest picks whichever side is closer in time, exact
    ties backward): each purchase matched to the user's click closest
    in time, past or future — the attribution shape for "which click
    belongs to this purchase" when post-purchase confirmation clicks
    are as plausible as pre-purchase intent clicks.

    Scale: same union+running-last plan as join_asof with a SECOND
    SORT (not a second shuffle — both direction windows partition on
    the key); still zero pair explosion."""
    e = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", ts_seconds("ts").alias("ts_s")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_s"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_s").alias("r_ts_s"),
        F.col("event_id").alias("click_id"),
        F.col("ts_s").alias("click_ts_s"),
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts_s",
        right_ts="r_ts_s",
        payload_cols=["click_id", "click_ts_s"],
        right_tiebreak="click_id",
        direction="nearest",
    )
