"""B5 — aggregations (SURVEY.md §2 B5).

``agg_group_sums`` is the flagship (TPC-H Q1 shape) — ``entry()`` runs it.
All aggregation is Spark hash aggregation with map-side partial aggregation
before the shuffle (Catalyst emits partial+final automatically); every
computed double is rounded to 4 decimals for oracle parity (SURVEY.md §7.4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n2kupdate_spark.queries._registry import register
from n2kupdate_spark.sources import load


@register(
    "agg_group_sums",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: pricing summary (TPC-H Q1 shape) over lineitem."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS nations,
           COUNT(*) AS customers
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per group (expand+two-phase agg in Spark)."""
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("nations"),
            F.count(F.lit(1)).alias("customers"),
        )
    )


@register(
    "agg_histogram_bins",
    oracle="""
    SELECT CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) AS bin_id,
           CAST(CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) * 5000 AS DOUBLE)
             AS bin_lo,
           COUNT(*) AS n,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS bin_min,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS bin_max
    FROM lineitem GROUP BY 1
    """,
)
def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width numeric histogram (5000-wide price bins) with per-bin
    min/max — the one-pass distribution profile that sizes skew salts,
    picks range-partition bounds, and sanity-checks value drift before a
    100 TB job commits to a layout. Pure map + one partial-agged shuffle
    of ≤ #bins groups; output is bounded by the value range, not the row
    count. Bin id is explicit FLOOR(x/w) in both engines: DuckDB's ``//``
    is integer division only for INTEGER operands — on DOUBLEs it is
    plain ``/`` (probed: ``2500.03 // 5000`` → 0.500006), so the usual
    ``//``-vs-F.floor oracle rule does NOT apply to double columns."""
    li = load(spark, sf_dir, "lineitem", columns=["l_extendedprice"])
    bin_id = F.floor(F.col("l_extendedprice") / 5000).cast("long")
    return (
        li.select("l_extendedprice", bin_id.alias("bin_id"))
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").cast("double").alias("bin_min"),
            F.max("l_extendedprice").cast("double").alias("bin_max"),
        )
        .select(
            "bin_id",
            (F.col("bin_id") * 5000).cast("double").alias("bin_lo"),
            "n",
            "bin_min",
            "bin_max",
        )
    )


@register("agg_approx_distinct")  # rows-only: HLL sketches are engine-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type (HyperLogLog++). The sketch
    estimate differs across engines by design → rows-only check. At 100 TB
    this replaces exact countDistinct wherever ±2% error is acceptable —
    one pass, tiny fixed state, no expand."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
    )


@register(
    "agg_grouping_rollup",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS lvl,
           ROUND(SUM(o_totalprice), 4) AS total,
           COUNT(*) AS cnt
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (status → status×priority → grand total)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") + F.grouping("o_orderpriority")).alias("lvl"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "lvl",
            "total",
            "cnt",
        )
    )


@register(
    "agg_grouping_cube",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           GROUPING(l_returnflag) + GROUPING(l_linestatus) AS lvl,
           ROUND(SUM(l_quantity), 4) AS qty,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping combinations over two low-cardinality keys."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") + F.grouping("l_linestatus")).alias("lvl"),
            F.round(F.sum("l_quantity"), 4).alias("qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "lvl",
            "qty",
            "cnt",
        )
    )


@register(
    "agg_filtered_pivot",
    oracle="""
    SELECT user_id,
           ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'click'), 0), 4) AS click_value,
           ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'purchase'), 0), 4) AS purchase_value,
           COUNT(*) FILTER (WHERE event_type = 'error') AS errors
    FROM events GROUP BY user_id
    """,
)
def agg_filtered_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (CASE/FILTER pivot) — one pass, no joins."""
    e = load(spark, sf_dir, "events")
    click = F.when(F.col("event_type") == "click", F.col("value"))
    purch = F.when(F.col("event_type") == "purchase", F.col("value"))
    err = F.when(F.col("event_type") == "error", 1)
    return e.groupBy("user_id").agg(
        F.round(F.coalesce(F.sum(click), F.lit(0.0)), 4).alias("click_value"),
        F.round(F.coalesce(F.sum(purch), F.lit(0.0)), 4).alias("purchase_value"),
        F.count(err).alias("errors"),
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 4) AS total
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation predicate (HAVING)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("o_totalprice"), 4).alias("total"))
        .filter(F.col("cnt") >= 12)
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group sorted distinct list (deterministic: sorted, distinct),
    serialized '|'-joined so the result is a flat string column — array
    columns crash the driver canonicalizer's hash step (r1 finding), and the
    string form is hash-checked instead of downgraded to rows-only."""
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias(
                "segments"
            )
        )
    )


@register(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) + 0 AS cov_qty_price,
           ROUND(corr(l_quantity, l_extendedprice), 4) + 0 AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per group (stddev/variance/covariance/
    correlation) — single-pass partial+final aggregation in both engines;
    rounded to 4dp to absorb summation-order float drift."""
    l = load(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_qty_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
    )


@register(
    "agg_percentile_exact",
    oracle="""
    SELECT o_orderpriority,
           ROUND(CAST(quantile_cont(o_totalprice, 0.25) AS DOUBLE), 4) AS p25,
           ROUND(CAST(quantile_cont(o_totalprice, 0.50) AS DOUBLE), 4) AS p50,
           ROUND(CAST(quantile_cont(o_totalprice, 0.90) AS DOUBLE), 4) AS p90
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, both linear interpolation). Exact percentiles
    sort within each group — at 100 TB prefer ``approx_percentile``
    (KLL/GK sketch, mergeable, no sort); this is the correctness anchor."""
    o = load(spark, sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.90)), 4).alias("p90"),
    )


@register("agg_approx_quantile")  # rows-only: sketch layouts are engine-specific
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles per group — the 100 TB path for
    agg_percentile_exact: approx_percentile's KLL-style sketch is mergeable
    map-side (no per-group sort), so the shuffle carries fixed-size sketches
    instead of all values."""
    o = load(spark, sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    return o.groupBy("o_orderpriority").agg(
        F.round(F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)), 4).alias("p50_approx"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "agg_string_concat",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segs
    FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
    GROUP BY c_nationkey
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg WITHIN GROUP == string_agg with
    ORDER BY): deterministic because the order clause totally orders the
    distinct inputs."""
    c = load(spark, sf_dir, "customer", columns=["c_nationkey", "c_mktsegment"]).distinct()
    return c.groupBy("c_nationkey").agg(
        F.expr("listagg(c_mktsegment, ',') WITHIN GROUP (ORDER BY c_mktsegment)").alias("segs")
    )


@register(
    "scalar_subquery_agg",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 4) AS price
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) * 2 FROM orders)
    """,
)
def scalar_subquery_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate — Catalyst plans the subquery once
    (one extra stage, its scalar broadcast into the filter), not per row."""
    o = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    o.createOrReplaceTempView("n2k_orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 4) AS price
        FROM n2k_orders_sq
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 2 FROM n2k_orders_sq)
        """
    )


@register(
    "agg_mode_per_group",
    oracle="""
    SELECT o_custkey, o_orderpriority AS mode_priority, cnt
    FROM (
        SELECT o_custkey, o_orderpriority, COUNT(*) AS cnt,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY COUNT(*) DESC, o_orderpriority) AS rk
        FROM orders GROUP BY o_custkey, o_orderpriority
    )
    WHERE rk = 1
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group: count-then-rank with a value
    tiebreak — the deterministic form of a statistical mode (engines'
    native ``mode()`` break ties arbitrarily). Two shuffles: the count
    aggregation, then the per-group rank window."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    counts = o.groupBy("o_custkey", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_custkey").orderBy(F.desc("cnt"), "o_orderpriority")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("o_custkey", F.col("o_orderpriority").alias("mode_priority"), "cnt")
    )


@register("agg_hll_sketch_merge")  # rows-only: sketch estimates are engine-specific
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL, built
    into Spark): per-priority sketches of the customer set, then the GLOBAL
    estimate computed by UNIONING the sketches — never re-reading the data.
    This is the 100 TB pattern for distinct counts across rollup levels:
    sketch once per partition/day, merge upward; exact distinct at each
    level would re-shuffle the full key set every time. Output carries the
    exact count_distinct beside each estimate so the error is visible
    (estimates are deterministic for fixed input; no cross-engine oracle —
    DuckDB's approx_count_distinct is a different sketch)."""
    o = load(spark, sf_dir, "orders", columns=["o_orderpriority", "o_custkey"])
    per = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count_distinct("o_custkey").alias("exact_nd"),
    )
    level = per.select(
        "o_orderpriority",
        F.hll_sketch_estimate("sk").alias("est_nd"),
        "exact_nd",
    )
    merged = per.agg(
        F.lit("__ALL__").alias("o_orderpriority"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_nd"),
        F.lit(None).cast("long").alias("exact_nd"),
    )
    return level.unionByName(merged)


@register("agg_theta_sketch_sets")  # rows-only: sketch estimates are engine-specific
def agg_theta_sketch_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count SET ALGEBRA on mergeable sketches (Apache
    DataSketches Theta, built into Spark 4): per-event-type theta sketches
    of the user set, then |view|, |click|, |view ∪ click|, |view ∩ click|
    computed purely from the sketches — the 100 TB pattern for audience
    overlap ("users who did A and B") where exact intersection would
    shuffle both full key sets. Exact values ride beside each estimate;
    below the sketch's nominal capacity (4096 entries at the default
    lgK=12) theta is EXACT, so the test pins est == exact at test scale
    while production-scale error stays within the documented ~1.6% bound."""
    ev = load(spark, sf_dir, "events", columns=["event_type", "user_id"])
    sk = ev.filter(F.col("event_type").isin("view", "click")).groupBy(
        "event_type"
    ).agg(
        F.expr("theta_sketch_agg(user_id)").alias("sk"),
        F.count_distinct("user_id").alias("exact_nd"),
    )
    wide = (
        sk.groupBy()
        .pivot("event_type", ["view", "click"])
        .agg(F.first("sk").alias("sk"), F.first("exact_nd").alias("nd"))
    )
    exacts = ev.agg(
        F.count_distinct(
            F.when(F.col("event_type").isin("view", "click"), F.col("user_id"))
        ).alias("u"),
    ).first()
    inter_exact = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id")
        .intersect(
            ev.filter(F.col("event_type") == "click").select("user_id")
        )
        .count()
    )
    return wide.select(
        F.expr("stack(4, "
               "'view', theta_sketch_estimate(view_sk), view_nd, "
               "'click', theta_sketch_estimate(click_sk), click_nd, "
               f"'union', theta_sketch_estimate(theta_union(view_sk, click_sk)), {int(exacts['u'])}L, "
               f"'intersection', theta_sketch_estimate(theta_intersection(view_sk, click_sk)), {inter_exact}L"
               ") AS (set_op, est_nd, exact_nd)")
    )


@register("agg_kll_quantile_merge")  # rows-only: sketch estimates are engine-specific
def agg_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketches (Apache DataSketches KLL): per-flag KLL
    sketches of l_quantity, per-group p50/p95 read from each sketch, and a
    GLOBAL p50/p95 read from the MERGED sketch — quantiles across rollup
    levels without re-reading data, the same upward-merge shape as
    agg_hll_sketch_merge but for distributions. KLL's guarantee is on RANK
    (±1.65% at the default k), not value; the accuracy pin in
    tests/test_sketch_accuracy.py therefore checks the rank of each
    estimated quantile against the exact CDF."""
    li = load(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    per = li.groupBy("l_returnflag").agg(
        F.expr("kll_sketch_agg_double(l_quantity)").alias("sk")
    )
    level = per.select(
        "l_returnflag",
        F.expr("kll_sketch_get_quantile_double(sk, 0.5)").alias("p50"),
        F.expr("kll_sketch_get_quantile_double(sk, 0.95)").alias("p95"),
    )
    merged = per.agg(
        F.lit("__ALL__").alias("l_returnflag"),
        F.expr(
            "kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.5)"
        ).alias("p50"),
        F.expr(
            "kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.95)"
        ).alias("p95"),
    )
    return level.unionByName(merged)


@register("agg_bootstrap_ci")  # rows-only: replica weights are
# engine-spec'd (splitmix64 Poisson); determinism + recompute + coverage
# pins in tests/test_parity.py
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority mean order value with a 95% percentile-bootstrap CI
    and bootstrap SE via 200 POISSON replicas (the large-scale
    bootstrap: per-row Poisson(1) multiplicities replace coordinated
    resamples, so every replica folds in ONE partial-agged pass — the
    uncertainty number an A/B readout or data-quality dashboard puts
    next to agg_welch_ttest's test statistic). Deterministic:
    weights derive from splitmix64(o_orderkey, replica) — partitioning
    and retries cannot change an interval. See
    operators/bootstrap.py::bootstrap_mean_ci."""
    from n2kupdate_spark.operators.bootstrap import bootstrap_mean_ci

    o = load(
        spark, sf_dir, "orders",
        columns=["o_orderpriority", "o_orderkey", "o_totalprice"],
    )
    return bootstrap_mean_ci(
        o, "o_orderpriority", "o_orderkey", "o_totalprice"
    ).orderBy("o_orderpriority")


@register("agg_tdigest_quantile_merge")  # rows-only: sketch estimates
# are engine-specific; rank-accuracy + determinism + merge-associativity
# pins in tests/test_sketch_accuracy.py
def agg_tdigest_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable t-digest quantile sketches (Dunning & Ertl,
    arXiv:1902.04023 — implemented from the paper; Spark 4 ships KLL
    but no t-digest): per-flag digests of l_quantity built as (flag,
    content-hash bucket) partials inside Arrow tasks, per-group p50/p95
    read from each merged digest, and the GLOBAL p50/p95 from the
    upward merge — the agg_kll_quantile_merge shape with the K1 scale
    function's tail-concentrated accuracy (p99.9s come out tighter at
    the same size). Only centroid arrays (groups × buckets × O(δ)
    doubles) hit the driver — the CMS bounded-model-state pattern."""
    from n2kupdate_spark.operators.tdigest import tdigest_quantiles_by_group

    li = load(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    return tdigest_quantiles_by_group(
        li, "l_returnflag", "l_quantity", quantiles=(0.5, 0.95)
    )


@register("agg_cms_heavy_hitters")  # rows-only: sketch estimates are engine-specific
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimation: ONE fixed-size (eps=0.1% of
    stream length, confidence 99%) mergeable sketch over the full event stream answers per-key
    count queries — the streaming/mergeable companion to the exact
    diag_key_skew profile. At 100 TB the sketch is what fits: per-executor
    sketches merge upward like HLL while exact per-key counts would
    shuffle every key. Output: the exact top-5 heavy keys with exact and
    estimated counts; CMS guarantees est ≥ exact (never undercounts) and
    est ≤ exact + eps·N with probability 1−δ — both pinned in
    tests/test_sketch_accuracy.py. The sketch binary is deserialized
    driver-side (Spark ships the sketch class but no SQL read function);
    the heavy work — sketching — is distributed."""
    ev = load(spark, sf_dir, "events", columns=["user_id"])
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "user_id")
        .limit(5)
        .collect()
    )
    sk_bytes = bytes(
        ev.agg(
            F.expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").alias("sk")
        ).first()["sk"]
    )
    jvm = spark._jvm
    bis = jvm.java.io.ByteArrayInputStream(sk_bytes)
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    rows = [
        (int(r["user_id"]), int(r["exact_cnt"]), int(cms.estimateCount(int(r["user_id"]))))
        for r in top
    ]
    return spark.createDataFrame(
        rows, "user_id long, exact_cnt long, est_cnt long"
    )


@register("agg_gini_concentration")  # rows-only debut (capacity policy
# §5.2) — cross-engine verified anyway: equivalent DuckDB SQL through
# the driver's canonical-rows compare in tests/test_parity.py (the
# markov precedent).
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue per nation — the standard
    concentration statistic (Gini 1912, the exact sorted-rank identity
    G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n): a nation near 0 spreads
    revenue evenly across customers, near 1 concentrates it in a few
    whales — the same statistic curation stacks report for domain
    concentration. Customers with orders only (revenue > 0 universe);
    single-customer nations read G = 0 by the identity. Rank ties
    break by customer id — any total order gives the same Σ i·x₍ᵢ₎
    over equal values, so the tiebreak is for determinism, not
    semantics.

    Scale shape: one partial-agged shuffle collapses orders to one row
    per customer; one id-keyed join attaches the nation; the rank
    window and the final aggregate share the nation hash partitioning
    (#customers-row window input, partitioned by nation — never a
    global sort); scale-first 4dp."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    c = load(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    rev = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    tagged = rev.join(
        c.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey"), "o_custkey"
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("rev").asc(), F.col("o_custkey").asc()
    )
    ranked = tagged.select(
        "c_nationkey", "rev", F.row_number().over(w).alias("i")
    )
    return ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.round(F.sum("rev") * 10000) / 10000).alias("total_revenue"),
        (
            F.round(
                (
                    2.0 * F.sum(F.col("i") * F.col("rev"))
                    / (F.count(F.lit(1)) * F.sum("rev"))
                    - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1))
                )
                * 10000
            )
            / 10000
            + 0.0
        ).alias("gini"),
    )


def _cohort_moments(ev):
    """The conditional-moments pass shared by agg_welch_ttest and
    agg_power_mde (review r14: they had diverged-by-copy): ONE
    partial-agged aggregate carries count/sum/sum-of-squares for both
    user_id-parity cohorts of every event type; returns (agg frame,
    mean_a, mean_b, var_a, var_b) with sample variances NULL-guarded
    for single-row cohorts (n−1 = 0 would throw under ANSI mode —
    Spark 4 default — instead of dividing to ±inf)."""
    a = F.col("user_id") % 2 == 0
    agg = ev.groupBy("event_type").agg(
        F.sum(a.cast("long")).alias("na"),
        F.sum(F.when(a, F.col("value"))).alias("sa"),
        F.sum(F.when(a, F.col("value") * F.col("value"))).alias("qa"),
        F.sum((~a).cast("long")).alias("nb"),
        F.sum(F.when(~a, F.col("value"))).alias("sb"),
        F.sum(F.when(~a, F.col("value") * F.col("value"))).alias("qb"),
    )
    ma, mb = F.col("sa") / F.col("na"), F.col("sb") / F.col("nb")
    va = F.when(
        F.col("na") > 1,
        (F.col("qa") - F.col("na") * ma * ma) / (F.col("na") - 1),
    )
    vb = F.when(
        F.col("nb") > 1,
        (F.col("qb") - F.col("nb") * mb * mb) / (F.col("nb") - 1),
    )
    return agg, ma, mb, va, vb


@register("agg_welch_ttest")  # rows-only debut (capacity policy §5.2)
# — cross-engine verified anyway: equivalent DuckDB SQL through the
# driver's canonical-rows compare in tests/test_parity.py.
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (Welch 1947 — the A/B-testing
    default; never assumes equal variances) comparing event values
    between the deterministic user_id-parity cohorts, per event type:
    t = (x̄_a − x̄_b)/√(s²_a/n_a + s²_b/n_b) with the Welch–Satterthwaite
    degrees of freedom, flagged at |t| ≥ 1.96 (≈ two-sided 5% at these
    df). The hash-parity cohort split is the standard A/A shape — on
    unmanipulated data the flags should be mostly quiet, which is
    itself the calibration check an experimentation stack runs first.

    Scale shape: ONE partial-agged shuffle computes all four moments
    for both cohorts of every type (conditional sums in a single
    #types-row aggregate — never one pass per cohort); the t/df algebra
    runs on that tiny table. Scale-first 4dp; sample variance
    (n−1 denominator)."""
    ev = load(
        spark, sf_dir, "events", columns=["event_type", "user_id", "value"]
    ).filter(F.col("value").isNotNull())
    agg, ma, mb, va, vb = _cohort_moments(ev)
    ea, eb = va / F.col("na"), vb / F.col("nb")
    t = (ma - mb) / F.sqrt(ea + eb)
    df = (ea + eb) * (ea + eb) / (
        ea * ea / (F.col("na") - 1) + eb * eb / (F.col("nb") - 1)
    )
    r4 = lambda c: F.round(c * 10000) / 10000 + 0.0  # noqa: E731
    return agg.select(
        "event_type",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        r4(ma).alias("mean_a"),
        r4(mb).alias("mean_b"),
        r4(t).alias("t_stat"),
        r4(df).alias("welch_df"),
        (F.abs(t) >= 1.96).alias("significant"),
    )


@register("agg_power_mde")  # rows-only (r9 capacity policy): ≡ numpy
# same-formula recompute + planted closed-form pins —
# tests/test_parity.py
def agg_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B power analysis per event type — the experiment-DESIGN table
    next to agg_welch_ttest (which judges a finished test) and
    agg_bootstrap_ci (which bounds an estimate): at the classical
    two-sided α = 5% / 80% power operating point (z = 1.96 / 0.8416),
    the MINIMUM DETECTABLE EFFECT the current cohort sizes support,

        mde = (z_α/2 + z_β) · √(s²_a/n_a + s²_b/n_b),

    both absolute and as % of the pooled mean, plus the per-cohort n
    required to detect a 1%-of-mean lift:
    n = (z_α/2 + z_β)² · (s²_a + s²_b) / δ². A team reads this row
    BEFORE launching: "at today's traffic we can only see 4% lifts;
    seeing 1% needs 16× the sample".

    Scale: the SAME single conditional-moments pass as the Welch op
    (one partial-agged #types-row aggregate); all power algebra on the
    tiny table. Scale-first 4dp."""
    ev = load(
        spark, sf_dir, "events", columns=["event_type", "user_id", "value"]
    ).filter(F.col("value").isNotNull())
    agg, _ma, _mb, va, vb = _cohort_moments(ev)
    Z = 1.96 + 0.8416  # z_{α/2} + z_β at 5% two-sided / 80% power
    mde = F.lit(Z) * F.sqrt(va / F.col("na") + vb / F.col("nb"))
    pooled_mean = (F.col("sa") + F.col("sb")) / (F.col("na") + F.col("nb"))
    # zero-centered metrics make pooled_mean 0 — the %-of-mean framing
    # is then undefined (NULL), not a divide-by-zero crash (ANSI mode)
    delta_1pct = F.when(pooled_mean != 0, pooled_mean * 0.01)
    n_needed = F.ceil(
        F.lit(Z * Z) * (va + vb) / (delta_1pct * delta_1pct)
    ).cast("long")
    r4 = lambda c: F.round(c * 10000) / 10000 + 0.0  # noqa: E731
    return agg.select(
        "event_type",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        r4(mde).alias("mde_abs"),
        r4(
            F.when(pooled_mean != 0, mde / pooled_mean * 100)
        ).alias("mde_pct_of_mean"),
        n_needed.alias("n_per_cohort_for_1pct"),
    )


@register("agg_chi2_independence")  # rows-only (r9 capacity policy):
# ≡ numpy same-formula recompute + planted dependence pins —
# tests/test_parity.py
def agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² test of independence between event type and the
    user-parity cohort — the CATEGORICAL member of the inference
    family (welch tests means, the proportion z-test rates; this tests
    whether a categorical distribution differs between cohorts at
    all): χ² = Σ (O−E)²/E over the #types × 2 contingency table with
    E = row·col/N, df = (#types−1), flagged at the 5% critical value
    for that df (Wilson–Hilferty approximation of the χ² quantile —
    closed-form, no scipy). NOTE the fixture genuinely flags (χ² ≈
    12.3 at 4 df): the synthetic generator ties event-type mix to the
    user, so type is NOT independent of user parity there — detecting
    that is the op working, not an A/A false positive (the planted
    uniform-independent pin is where quietness is asserted; the
    proportion z-test independently confirms `purchase` as the
    driver).

    Scale: ONE partial-agged (type, cohort) count shuffle (the
    contingency table is #types × 2 — tiny), all algebra on it; the
    critical value is driver-side arithmetic inlined as a literal.
    Emits one row: n, n_cells, chi2 4dp, df, crit_5pct 4dp,
    dependent."""
    ev = load(
        spark, sf_dir, "events", columns=["event_type", "user_id"]
    ).filter(F.col("user_id").isNotNull())  # NULL parity is no cohort —
    # dropped like the conditional sums in _cohort_moments, not a KeyError
    cells = ev.groupBy(
        "event_type", (F.col("user_id") % 2 == 0).alias("__a")
    ).agg(F.count(F.lit(1)).alias("c"))
    rows = cells.collect()  # #types × 2 — bounded contingency table
    types = sorted({r["event_type"] for r in rows})
    n = sum(r["c"] for r in rows)
    col_tot = {True: 0, False: 0}
    row_tot = {t: 0 for t in types}
    obs = {}
    for r in rows:
        obs[(r["event_type"], r["__a"])] = r["c"]
        col_tot[r["__a"]] += r["c"]
        row_tot[r["event_type"]] += r["c"]
    chi2 = 0.0
    for t in types:
        for a in (True, False):
            e = row_tot[t] * col_tot[a] / n
            o = obs.get((t, a), 0)
            if e > 0:
                chi2 += (o - e) ** 2 / e
    df = len(types) - 1
    if df < 1:
        # a single observed type has nothing to be dependent ON —
        # defined result, not a 1/0 in the quantile formula
        return spark.createDataFrame(
            [(int(n), len(types) * 2, 0.0, 0, None, False)],
            "n long, n_cells int, chi2 double, df int, crit_5pct double, "
            "dependent boolean",
        )
    # Wilson–Hilferty: χ²_q(df) ≈ df·(1 − 2/(9df) + z_q·√(2/(9df)))³
    z95 = 1.6449  # one-sided 95th percentile of N(0,1)
    crit = df * (1 - 2 / (9 * df) + z95 * (2 / (9 * df)) ** 0.5) ** 3
    import numpy as np

    r4 = lambda v: float(np.round(v * 10000) / 10000 + 0.0)  # noqa: E731
    return spark.createDataFrame(
        [(int(n), len(types) * 2, r4(chi2), int(df), r4(crit), bool(chi2 > crit))],
        "n long, n_cells int, chi2 double, df int, crit_5pct double, dependent boolean",
    )


@register("agg_proportion_ztest")  # rows-only (r9 capacity policy):
# ≡ numpy same-formula recompute + planted lift pins —
# tests/test_parity.py
def agg_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test per event type — the BINARY-metric A/B
    test (the single most-run test in experimentation: conversion is a
    rate, not a mean): the metric is each USER's conversion indicator
    — emitted ≥ 14 events of the type (every user emits every type at
    least once on this fixture, so the at-least-once indicator
    saturates at 1.0 and says nothing; the per-(user, type) count sits
    at ~13 at EVERY sf — events scale with users — so the ≥14
    threshold splits near-half at all scales) — compared between the
    parity cohorts with the pooled-variance z
    z = (p_a − p_b)/√(p̂(1−p̂)(1/n_a + 1/n_b)), flagged two-sided 5%.
    A/A calibration shape like the Welch op — quiet flags expected on
    unmanipulated data.

    Scale: one partial-agged (user, type) count collapse (the bounded
    activity matrix, never event volume), one #users-bounded
    cohort count, one conditional-count aggregate per type; all z
    algebra on the #types-row table. Degenerate pools (p̂ ∈ {0,1})
    read NULL z, not a crash."""
    ev = load(spark, sf_dir, "events", columns=["event_type", "user_id"])
    users = ev.select("user_id").distinct()
    cohort_n = users.groupBy(
        (F.col("user_id") % 2 == 0).alias("__a")
    ).agg(F.count(F.lit(1)).alias("n"))
    totals = {r["__a"]: r["n"] for r in cohort_n.collect()}
    na, nb = int(totals.get(True, 0)), int(totals.get(False, 0))
    if na == 0 or nb == 0:
        # one cohort empty: no comparison exists — typed empty frame,
        # not a 1/0 at plan-build time (the documented no-crash contract)
        return spark.createDataFrame(
            [],
            "event_type string, n_a long, n_b long, conv_a long, "
            "conv_b long, rate_a double, rate_b double, z_stat double, "
            "significant boolean",
        )
    converted = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 14)
    )
    # aggregate over ALL types (left join back), not only converting
    # ones: a zero-conversion metric must read a row with NULL z, not
    # vanish from the dashboard (review r14)
    agg = (
        ev.select("event_type")
        .distinct()
        .join(
            converted.groupBy("event_type").agg(
                F.sum((F.col("user_id") % 2 == 0).cast("long")).alias("ca"),
                F.sum((F.col("user_id") % 2 != 0).cast("long")).alias("cb"),
            ),
            "event_type",
            "left",
        )
        .select(
            "event_type",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    pa = F.col("ca") / F.lit(na)
    pb = F.col("cb") / F.lit(nb)
    pool = (F.col("ca") + F.col("cb")) / F.lit(float(na + nb))
    se = F.sqrt(pool * (1 - pool) * (1.0 / na + 1.0 / nb))
    z = F.when(se > 0, (pa - pb) / se)
    r4 = lambda c: F.round(c * 10000) / 10000 + 0.0  # noqa: E731
    return agg.select(
        "event_type",
        F.lit(na).alias("n_a"),
        F.lit(nb).alias("n_b"),
        F.col("ca").cast("long").alias("conv_a"),
        F.col("cb").cast("long").alias("conv_b"),
        r4(pa).alias("rate_a"),
        r4(pb).alias("rate_b"),
        r4(z).alias("z_stat"),
        F.coalesce(F.abs(z) >= 1.96, F.lit(False)).alias("significant"),
    )


@register("agg_mann_whitney_u")  # rows-only (r9 capacity policy): ≡
# numpy sort-based-rank recompute + planted shift/tie pins —
# tests/test_parity.py
def agg_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test between the user_id-parity cohorts
    per event type — the NONPARAMETRIC member of the inference family
    (welch assumes means matter; this detects any stochastic-dominance
    shift, the robust default when value distributions are skewed or
    heavy-tailed, which engagement metrics always are). Midranks for
    ties, U_a = R_a − n_a(n_a+1)/2, large-sample normal approximation
    with the standard tie correction
    σ² = n_a·n_b/12 · [(n+1) − Σ(t³−t)/(n(n−1))], z = (U_a − μ)/σ
    (no continuity correction — the large-sample form), flagged at
    |z| ≥ 1.96.

    Scale shape: ranks are NEVER materialized per row — one
    (type, value, cohort-conditional) count aggregate collapses the
    data to #distinct-values rows, midranks come from a cumulative
    window over that collapsed table ordered by value, and the rank
    sum / tie term / z algebra is a second #types-row aggregate. Two
    partial-agged shuffles + one small window, independent of row
    count. Scale-first 4dp."""
    from pyspark.sql import Window

    # NULL user_id rows belong to NEITHER cohort — the _cohort_moments
    # convention every sibling inference op follows (review r15: they
    # silently landed in cohort B via the t − ta complement before)
    ev = load(
        spark, sf_dir, "events", columns=["event_type", "user_id", "value"]
    ).filter(F.col("value").isNotNull() & F.col("user_id").isNotNull())
    a = (F.col("user_id") % 2 == 0).cast("long")
    per_val = ev.groupBy("event_type", "value").agg(
        F.sum(a).alias("ta"),
        F.count(F.lit(1)).alias("t"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_val.select(
        "event_type",
        "ta",
        "t",
        # midrank of a tie group = (#before) + (t+1)/2
        (F.sum("t").over(w) - F.col("t") + (F.col("t") + 1) / 2).alias("midrank"),
    )
    agg = ranked.groupBy("event_type").agg(
        F.sum("ta").cast("long").alias("n_a"),
        (F.sum("t") - F.sum("ta")).cast("long").alias("n_b"),
        F.sum(F.col("ta") * F.col("midrank")).alias("ra"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    n = na + nb
    u = F.col("ra") - na * (na + 1) / 2
    mu = na * nb / 2
    sigma = F.sqrt(
        na * nb / 12
        * ((n + 1) - F.try_divide(F.col("tie3"), n * (n - 1)))
    )
    z = F.when(sigma > 0, (u - mu) / sigma)
    r4 = lambda c: F.round(c * 10000) / 10000 + 0.0  # noqa: E731
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        r4(u).alias("u_stat"),
        r4(z).alias("z_stat"),
        F.coalesce(F.abs(z) >= 1.96, F.lit(False)).alias("significant"),
    )


@register("agg_kruskal_wallis")  # rows-only (r9 capacity policy): ≡
# numpy sort-based-rank recompute + planted shift pins —
# tests/test_parity.py
def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H test — the k-SAMPLE extension of Mann–Whitney
    (one-way ANOVA on ranks): does the value distribution differ across
    EVENT TYPES at all? The single-row omnibus answer a dashboard reads
    before drilling into pairwise tests (running k² pairwise MWUs
    without it is the classic multiple-comparisons trap).
    H = [12/(n(n+1)) · Σ R_g²/n_g − 3(n+1)] / [1 − Σ(t³−t)/(n³−n)]
    with midranks for ties, compared to the χ²(k−1) 5% critical value
    via the Wilson–Hilferty approximation (the chi2 op's convention).

    Scale shape: same collapsed-rank design as agg_mann_whitney_u —
    one (value, per-type-conditional) count aggregate over a GLOBAL
    value order (one small window over #distinct values), a #types-row
    rank-sum aggregate, then single-row algebra. Emits one row:
    (k, n, h_stat, df, significant). Scale-first 4dp."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events", columns=["event_type", "value"]).filter(
        F.col("value").isNotNull()
    )
    # the collapsed table feeds BOTH the global rank spine and the
    # per-type rank sums — checkpoint the boundary or Catalyst inlines
    # the event scan + (value,type) shuffle into each consumer (the
    # kn-fit lesson; #distinct-(value,type) rows, already shuffle-sized)
    per_val = (
        ev.groupBy("value", "event_type")
        .agg(F.count(F.lit(1)).alias("tg"))
        .localCheckpoint()
    )
    tot = per_val.groupBy("value").agg(F.sum("tg").alias("t"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked_vals = tot.select(
        "value",
        "t",
        (F.sum("t").over(w) - F.col("t") + (F.col("t") + 1) / 2).alias("midrank"),
    )
    per_type = (
        per_val.join(ranked_vals, "value")
        .groupBy("event_type")
        .agg(
            F.sum("tg").alias("ng"),
            F.sum(F.col("tg") * F.col("midrank")).alias("rg"),
        )
    )
    # ONE scalar collected and inlined as a literal (the IDF/BNLJ rule —
    # a 1×1 crossJoin of two aggregates still plans the
    # BroadcastNestedLoopJoin the fleet audit rejects, review r15)
    tie3 = float(
        ranked_vals.agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        ).collect()[0][0]
    )
    one = per_type.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum(F.col("rg") * F.col("rg") / F.col("ng")).alias("sr2"),
    )
    n, k = F.col("n"), F.col("k")
    h_raw = F.lit(12.0) / (n * (n + 1)) * F.col("sr2") - 3 * (n + 1)
    tie_corr = F.lit(1.0) - F.try_divide(F.lit(tie3), n * n * n - n)
    h = F.try_divide(h_raw, tie_corr)
    df = (k - 1).cast("double")
    # Wilson–Hilferty: chi2_crit(df, .95) ≈ df·(1 − 2/(9df) + 1.6449·√(2/(9df)))³
    whf = F.lit(1.0) - 2 / (9 * df) + F.lit(1.6449) * F.sqrt(2 / (9 * df))
    crit = df * whf * whf * whf
    r4 = lambda c: F.round(c * 10000) / 10000 + 0.0  # noqa: E731
    return one.select(
        "k",
        "n",
        r4(h).alias("h_stat"),
        df.cast("long").alias("df"),
        F.coalesce(h >= crit, F.lit(False)).alias("significant"),
    )


@register("agg_spearman_corr")  # rows-only (r9 capacity policy): ≡
# numpy argsort-midrank recompute + planted monotone/independent pins —
# tests/test_parity.py
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per group — the nonparametric
    dependence measure next to the MWU/KW rank tests: Pearson's r
    computed on MIDRANKS of each variable (ties averaged), so it reads
    any monotone relationship without assuming linearity and shrugs
    off the heavy tails that wreck raw Pearson on revenue-like
    columns. Demo: per language, character count vs whitespace word
    count of each document — a genuinely monotone-but-nonlinear pair
    (the TPC-H-ish numeric columns in this fixture are independent by
    construction; verified corr ≈ −0.02), so a strongly positive rho
    is the planted truth.

    Scale shape: midranks per variable come from rank() + tie-count
    windows; BOTH variables' windows partition on the same group key,
    so the whole rank stage runs off ONE exchange (verified: a single
    hashpartitioning(lang) in the plan), and rho is F.corr on the
    ranked frame — one partial-agged #groups-row aggregate. No
    collapsed-value table needed because the window is per GROUP
    (bounded fan-in per key), not global. Scale-first 4dp."""
    from pyspark.sql import Window

    # empty/whitespace-only text counts 0 words — split('') returns ['']
    # (size 1), which would shift every midrank in the group (review r15)
    wc = F.when(F.trim(F.col("text")) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    d = load(spark, sf_dir, "documents", columns=["lang", "text", "n_chars"]).select(
        "lang",
        F.col("n_chars").cast("double").alias("x"),
        wc.cast("double").alias("y"),
    )

    def midrank(col: str):
        wr = Window.partitionBy("lang").orderBy(col)
        wt = Window.partitionBy("lang", col)
        # min-rank + (ties−1)/2 = average position of the tie run
        return F.rank().over(wr) + (F.count(F.lit(1)).over(wt) - 1) / 2

    ranked = d.select(
        "lang", midrank("x").alias("rx"), midrank("y").alias("ry")
    )
    r4 = lambda c: F.round(c * 10000) / 10000 + 0.0  # noqa: E731
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        r4(F.corr("rx", "ry")).alias("spearman_rho"),
    )


@register("agg_mg_heavy_hitters")  # rows-only (r9 capacity policy):
# certified two-sided bounds + exact-top recovery pinned —
# tests/test_sketch_accuracy.py
def agg_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries heavy hitters over events.user_id — the
    DETERMINISTIC-bound member of the sketch family (CMS never
    undercounts with a probabilistic overcount; MG never OVERcounts
    and certifies its undercount via its own decrement ledger — hard
    two-sided bounds, no failure probability; mergeable per Agarwal
    et al., PODS 2012). Emits the top-5 (item, est_lo, err_bound) with
    est_lo ≤ true ≤ est_lo + err_bound guaranteed.

    Scale: per-batch exact counts compress to ≤ k=256 survivors
    map-side, one item-keyed partial-agged sum of ≤ #batches×k rows,
    one final compress — the CMS cost shape with a certificate
    attached. See operators/misra_gries.py."""
    from n2kupdate_spark.operators.misra_gries import mg_heavy_hitters

    ev = load(spark, sf_dir, "events", columns=["user_id"])
    return mg_heavy_hitters(ev, "user_id", k=256, top=5)


@register("agg_cliffs_delta")  # rows-only (r9 capacity policy): ≡
# numpy pairwise-comparison recompute + planted dominance pins —
# tests/test_parity.py
def agg_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta per event type — the EFFECT SIZE that belongs next
    to agg_mann_whitney_u's significance flag (a large-n test flags
    microscopic shifts; δ says whether anyone should care):
    δ = P(a > b) − P(a < b) over all cross-cohort pairs, computed
    WITHOUT materializing pairs via the rank identity δ = 2U/(n_a·n_b)
    − 1 from the same tie-midrank U. Banded per Romano et al. 2006:
    |δ| < .147 negligible, < .33 small, < .474 medium, else large.

    Scale: identical collapsed-rank plan to agg_mann_whitney_u (two
    partial-agged shuffles + one #distinct-values window) — the O(n²)
    pairwise definition never runs; the identity is exact, ties
    included (pinned against the literal pairwise count in the test)."""
    from pyspark.sql import Window

    ev = load(
        spark, sf_dir, "events", columns=["event_type", "user_id", "value"]
    ).filter(F.col("value").isNotNull() & F.col("user_id").isNotNull())
    a = (F.col("user_id") % 2 == 0).cast("long")
    per_val = ev.groupBy("event_type", "value").agg(
        F.sum(a).alias("ta"),
        F.count(F.lit(1)).alias("t"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_val.select(
        "event_type",
        "ta",
        "t",
        (F.sum("t").over(w) - F.col("t") + (F.col("t") + 1) / 2).alias("midrank"),
    )
    agg = ranked.groupBy("event_type").agg(
        F.sum("ta").cast("long").alias("n_a"),
        (F.sum("t") - F.sum("ta")).cast("long").alias("n_b"),
        F.sum(F.col("ta") * F.col("midrank")).alias("ra"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    u = F.col("ra") - na * (na + 1) / 2
    delta = F.try_divide(F.lit(2.0) * u, (na * nb).cast("double")) - 1.0
    # δ is a small-integer ratio — exact 4dp halves are live: half-up
    # floor in op AND pin (review r15)
    r4 = lambda c: F.floor(c * 10000 + 0.5) / 10000 + 0.0  # noqa: E731
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        r4(delta).alias("cliffs_delta"),
        # a single-cohort group has no cross-cohort pairs: δ is NULL and
        # so is the band (review r15: otherwise() made NULL read 'large')
        F.when(delta.isNull(), F.lit(None).cast("string"))
        .when(F.abs(delta) < 0.147, F.lit("negligible"))
        .when(F.abs(delta) < 0.33, F.lit("small"))
        .when(F.abs(delta) < 0.474, F.lit("medium"))
        .otherwise(F.lit("large"))
        .alias("magnitude"),
    )


def _phi(x):
    """Standard-normal CDF Φ(x) as a Column for ARBITRARY sign, via the
    Abramowitz–Stegun 7.1.26 erf polynomial (|ε| ≤ 1.5e-7 — exact at
    4dp; Spark has no erf builtin and a Python UDF would be the slow
    path for no accuracy gain). Shared by agg_fdr_bh and
    agg_tost_equivalence so the two cannot diverge-by-copy (the
    _cohort_moments lesson): Φ(x) = ½(1 + sign(x)·erf(|x|/√2))."""
    ax = F.abs(x) / F.sqrt(F.lit(2.0))
    u = 1.0 / (1.0 + 0.3275911 * ax)
    poly = (
        0.254829592 * u
        - 0.284496736 * u * u
        + 1.421413741 * u * u * u
        - 1.453152027 * u * u * u * u
        + 1.061405429 * u * u * u * u * u
    )
    erf = 1.0 - poly * F.exp(-ax * ax)
    return 0.5 * (1.0 + F.signum(x) * erf)


@register("agg_fdr_bh")  # rows-only (r9 capacity policy): ≡ python
# same-formula recompute + planted p-vector pins — tests/test_parity.py
def agg_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR correction across the per-type Welch
    tests — the MULTIPLE-COMPARISONS completion of the inference family
    (k types ⇒ k tests ⇒ ~k·5% false flags under per-test α; running
    the family without a correction is the classic dashboard sin the
    Kruskal–Wallis omnibus only partially guards): two-sided normal
    p ≈ 2(1−Φ(|t|)) from the same conditional-moments t as
    agg_welch_ttest, Φ via the Abramowitz–Stegun 7.1.26 erf polynomial
    (|ε| ≤ 1.5e-7 — exact at 4dp; Spark has no erf builtin, and a
    Python UDF here would be the slow path for no accuracy gain), then
    the BH(α = 0.05) step-up: flag all p-ranks ≤ the largest i with
    p₍ᵢ₎ ≤ i·α/m. Emits (event_type, t_stat, p_value, p_rank,
    bh_threshold, significant_fdr).

    Scale: ONE conditional-moments partial-agged pass (shared shape
    with welch/power), then every p/rank/step-up expression runs on
    the #types-row table — two tiny windows, zero extra scans.
    Scale-first 4dp."""
    from pyspark.sql import Window

    ALPHA = 0.05
    ev = load(
        spark, sf_dir, "events", columns=["event_type", "user_id", "value"]
    ).filter(F.col("value").isNotNull())
    agg, ma, mb, va, vb = _cohort_moments(ev)
    t = (ma - mb) / F.sqrt(va / F.col("na") + vb / F.col("nb"))
    p = 2.0 * (1.0 - _phi(F.abs(t)))  # 2(1 − Φ(|t|)), shared A–S helper
    staged = agg.select("event_type", t.alias("__t"), p.alias("__p"))
    # A NULL p (t undefined — an empty or single-row cohort) is NOT a
    # tested hypothesis: it must not take a rank, inflate m, or shift the
    # step-up cutoff (advice r15: Spark asc = NULLS FIRST put it at rank 1
    # and flagged it whenever cutoff ≥ 1). Sort nulls last, rank/count
    # only real p's, and emit NULL for every BH column of an untested row.
    w_rank = Window.orderBy(
        F.col("__p").asc_nulls_last(), F.col("event_type").asc()
    )
    w_all = w_rank.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = staged.select(
        "event_type",
        "__t",
        "__p",
        F.when(
            F.col("__p").isNotNull(), F.row_number().over(w_rank)
        ).alias("p_rank"),
        F.count(F.col("__p")).over(w_all).alias("__m"),
    )
    thr = F.col("p_rank") * ALPHA / F.col("__m")  # NULL rank ⇒ NULL thr
    cutoff = F.max(
        F.when(F.col("__p") <= thr, F.col("p_rank")).otherwise(F.lit(0))
    ).over(w_all)
    r4 = lambda c: F.round(c * 10000) / 10000 + 0.0  # noqa: E731
    return ranked.select(
        "event_type",
        r4(F.col("__t")).alias("t_stat"),
        r4(F.col("__p")).alias("p_value"),
        "p_rank",
        r4(thr).alias("bh_threshold"),
        F.when(
            F.col("__p").isNotNull(), F.col("p_rank") <= cutoff
        ).alias("significant_fdr"),
    )


def _wh_chi2_crit(df_col):
    """Wilson–Hilferty χ²(df) 5% critical value as a Column — the
    family convention (agg_chi2_independence / agg_kruskal_wallis):
    crit ≈ df·(1 − 2/(9df) + 1.6449·√(2/(9df)))³."""
    whf = F.lit(1.0) - 2 / (9 * df_col) + F.lit(1.6449) * F.sqrt(2 / (9 * df_col))
    return df_col * whf * whf * whf


def _oneway_f_table(per_group):
    """Single-row one-way F algebra over a per-group moments table
    (columns ng/sg/qg): k, n, ss_between, ss_within, f_stat,
    df_between, df_within, significant. Shared by agg_anova_oneway
    (raw values) and agg_levene_bf (|x − median| deviations) so the
    two cannot diverge-by-copy (the _cohort_moments lesson, r14).

    The 5% gate uses the large-N limit F(k−1, N−k) → χ²(k−1)/(k−1)
    via Wilson–Hilferty — exact as N−k → ∞ and conservative-adjacent
    at the fixture's thousands-per-group; documented rather than
    hidden (no scipy in the env, and an incomplete-beta expansion in
    SQL would add failure modes for no 4dp gain at these n)."""
    one = per_group.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        F.sum(F.col("sg") * F.col("sg") / F.col("ng")).alias("b"),
    )
    k, n = F.col("k"), F.col("n")
    ssw = F.col("q") - F.col("b")
    ssb = F.col("b") - F.col("s") * F.col("s") / n
    dfb = (k - 1).cast("double")
    dfw = (n - k).cast("double")
    f = F.try_divide(F.try_divide(ssb, dfb), F.try_divide(ssw, dfw))
    crit = _wh_chi2_crit(dfb) / dfb
    r4 = lambda c: F.floor(c * 10000 + 0.5) / 10000 + 0.0  # noqa: E731
    # ssw = 0 with ssb > 0 is F = +inf — the MOST significant case, not
    # a NULL-coalesced False (review r16: internally-constant groups at
    # different levels, e.g. {1,1},{2,2},{3,3}, were reported quiet);
    # ssw = ssb = 0 (all values identical) stays not-significant. The
    # tiny-eps guard absorbs float residue in the raw-sums algebra.
    degenerate_sig = (ssw <= 1e-9 * F.greatest(ssb, F.lit(1.0))) & (ssb > 0)
    return one.select(
        "k",
        "n",
        r4(ssb).alias("ss_between"),
        r4(ssw).alias("ss_within"),
        r4(f).alias("f_stat"),
        dfb.cast("long").alias("df_between"),
        dfw.cast("long").alias("df_within"),
        F.when(degenerate_sig, F.lit(True))
        .otherwise(F.coalesce(f >= crit, F.lit(False)))
        .alias("significant"),
    )


@register("agg_anova_oneway")  # rows-only (r9 capacity policy): ≡
# numpy same-formula recompute + planted shift/quiet pins —
# tests/test_parity.py
def agg_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F test of event value across event types — the
    PARAMETRIC omnibus next to agg_kruskal_wallis (KW reads ranks and
    any distributional shift; ANOVA reads MEANS with more power when
    values are roughly normal — the pair a dashboard runs together,
    agreeing ⇒ trust, disagreeing ⇒ look at the tails):
    F = [SSB/(k−1)] / [SSW/(N−k)], flagged at the 5% large-N critical
    value χ²(k−1)/(k−1) (Wilson–Hilferty, the family convention).
    Emits one row: (k, n, ss_between, ss_within, f_stat, df_between,
    df_within, significant).

    Scale: ONE (type) partial-agged moments pass (n, Σx, Σx²) — the
    Welch/power cost shape extended to k groups — then all F algebra
    on the #types-row table; no window, no second scan."""
    ev = load(spark, sf_dir, "events", columns=["event_type", "value"]).filter(
        F.col("value").isNotNull()
    )
    per_group = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("ng"),
        F.sum("value").alias("sg"),
        F.sum(F.col("value") * F.col("value")).alias("qg"),
    )
    return _oneway_f_table(per_group)


@register("agg_levene_bf")  # rows-only (r9 capacity policy): ≡ numpy
# same-formula recompute + planted heteroscedastic/quiet pins —
# tests/test_parity.py
def agg_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe variance-homogeneity test (Levene 1960 with the
    Brown & Forsythe 1974 MEDIAN center — the robust default SAS/R
    ship): one-way F on the absolute deviations z = |x − median_g|.
    The precondition check of the classical-inference family — classic
    ANOVA and pooled-variance tests assume equal group variances;
    THIS is the test that says whether that assumption holds, and a
    flag here is the signal to reach for agg_welch_ttest (which never
    assumes it). Median-centering (not mean) keeps the test level
    under heavy tails. Emits the same single-row F table as
    agg_anova_oneway.

    Scale: one exact per-type median aggregate (percentile — a
    #types-row result), broadcast-joined back onto the scan (map-side,
    no second event shuffle for the join), then ONE (type) moments
    pass on z and #types-row algebra — two partial-agged passes total,
    both keyed on the same column."""
    from pyspark.sql.functions import broadcast

    ev = load(spark, sf_dir, "events", columns=["event_type", "value"]).filter(
        F.col("value").isNotNull()
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("__med")
    )
    z = ev.join(broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("__med")).alias("z")
    )
    per_group = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("ng"),
        F.sum("z").alias("sg"),
        F.sum(F.col("z") * F.col("z")).alias("qg"),
    )
    return _oneway_f_table(per_group)


@register("agg_cohens_d")  # rows-only (r9 capacity policy): ≡ numpy
# same-formula recompute + planted exact-effect pins —
# tests/test_parity.py
def agg_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d / Hedges' g standardized mean difference between the
    user-parity cohorts per event type — the PARAMETRIC effect size
    next to agg_cliffs_delta's rank-based one (and the magnitude
    answer to agg_welch_ttest's significance flag: at fixture n a
    microscopic shift flags; d says whether anyone should care).
    d = (x̄_a − x̄_b)/s_pooled with the pooled sample sd; Hedges' g
    applies the small-sample bias correction J ≈ 1 − 3/(4(n_a+n_b)−9)
    (Hedges 1981). Magnitude banded per Cohen 1988 at |d| 0.2/0.5/0.8
    (negligible/small/medium/large). Degenerate pools (either cohort
    < 2 rows, or zero pooled variance) emit NULL d/g and a NULL band.

    Scale: the SAME single conditional-moments partial-agged pass as
    welch/power/FDR (shared _cohort_moments — one shuffle carries all
    four moments of both cohorts); band/bias algebra on #types rows."""
    ev = load(
        spark, sf_dir, "events", columns=["event_type", "user_id", "value"]
    ).filter(F.col("value").isNotNull())
    agg, ma, mb, va, vb = _cohort_moments(ev)
    na, nb = F.col("na"), F.col("nb")
    pooled_var = F.try_divide(
        (na - 1) * va + (nb - 1) * vb, na + nb - 2
    )
    sp = F.sqrt(pooled_var)
    d = F.when(sp > 0, (ma - mb) / sp)
    j = F.lit(1.0) - 3.0 / (4.0 * (na + nb) - 9.0)
    g = d * j
    band = F.when(
        d.isNotNull(),
        F.when(F.abs(d) < 0.2, F.lit("negligible"))
        .when(F.abs(d) < 0.5, F.lit("small"))
        .when(F.abs(d) < 0.8, F.lit("medium"))
        .otherwise(F.lit("large")),
    )
    r4 = lambda c: F.floor(c * 10000 + 0.5) / 10000 + 0.0  # noqa: E731
    return agg.select(
        "event_type",
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        r4(d).alias("cohens_d"),
        r4(g).alias("hedges_g"),
        band.alias("magnitude"),
    )


@register("agg_jarque_bera")  # rows-only (r9 capacity policy): ≡ numpy
# same-formula recompute + planted skewed/quiet pins —
# tests/test_parity.py
def agg_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality screen of event value per event type —
    the SECOND precondition check of the classical-inference family
    (agg_levene_bf asks "are the variances equal?"; THIS asks "is each
    group even roughly normal?" — the assumption ANOVA/t/d lean on,
    and a flag here is the signal to trust the rank-based twins
    (Kruskal–Wallis / MWU / Cliff's δ) over their parametric
    counterparts). JB = n/6·(S² + K²/4) from sample skewness
    S = m₃/m₂^1.5 and excess kurtosis K = m₄/m₂² − 3; under H₀ JB is
    asymptotically χ²(2), whose survival function is EXACTLY
    exp(−JB/2) — so unlike the Wilson–Hilferty F gates this p-value
    is closed-form exact (in the asymptote), no scipy and no
    approximation formula. Rejected at p < 0.05. Degenerate groups
    (n < 8 — the JB asymptote is meaningless below that — or zero
    variance) emit NULL stats and a NULL flag.

    Scale: ONE (type) partial-agged pass carrying the four raw power
    sums Σx..Σx⁴ (the welch/ANOVA cost shape — map-side combine, one
    shuffle of #types rows), central-moment/JB algebra on the
    #types-row table. Raw-sum cancellation is benign at the value
    column's O(1e3) magnitudes (double carries ~15.9 digits; x⁴ sums
    stay < 1e18 at sf1000)."""
    ev = load(spark, sf_dir, "events", columns=["event_type", "value"]).filter(
        F.col("value").isNotNull()
    )
    v = F.col("value")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    n = F.col("n")
    m = F.col("s1") / n
    m2 = F.col("s2") / n - m * m
    m3 = F.col("s3") / n - 3 * m * F.col("s2") / n + 2 * m * m * m
    m4 = (
        F.col("s4") / n
        - 4 * m * F.col("s3") / n
        + 6 * m * m * F.col("s2") / n
        - 3 * m * m * m * m
    )
    ok = (n >= 8) & (m2 > 0)
    skew = F.when(ok, m3 / F.pow(m2, 1.5))
    kurt = F.when(ok, m4 / (m2 * m2) - 3.0)
    jb = n / 6.0 * (skew * skew + kurt * kurt / 4.0)
    p = F.exp(-jb / 2.0)
    r4 = lambda c: F.floor(c * 10000 + 0.5) / 10000 + 0.0  # noqa: E731
    return agg.select(
        "event_type",
        n.cast("long").alias("n"),
        r4(skew).alias("skewness"),
        r4(kurt).alias("kurt_excess"),
        r4(jb).alias("jb_stat"),
        r4(p).alias("p_value"),
        (p < 0.05).alias("normal_rejected"),
    )


@register("agg_pairwise_welch_holm")  # rows-only (r9 capacity policy):
# ≡ independent python recompute + planted shift/quiet pins —
# tests/test_parity.py
def agg_pairwise_welch_holm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Welch t-tests across event types with Holm step-down
    FWER correction — the POST-HOC drill-down the omnibus family was
    missing (agg_anova_oneway / agg_kruskal_wallis say "SOMETHING
    differs"; THIS says WHICH pairs, at a controlled family-wise error
    rate). Per unordered type pair (a < b): Welch t on the per-type
    means (never pooled variance — the agg_welch_ttest convention),
    two-sided p from the large-N normal limit via exact math.erf, then
    Holm (1979) step-down: rank p ascending, p_holm = min(1,
    cummax((m−rank+1)·p)), flagged at p_holm < 0.05. Holm controls
    FWER ("probability of ANY false flag") where agg_fdr_bh's BH
    controls FDR ("share of flags that are false") — the two
    corrections a results dashboard shows side by side. Degenerate
    types (a cohort with n < 2 or zero variance) are NOT tested: they
    take no rank, don't inflate m, and emit NULL stats — the
    agg_fdr_bh NULL-p lesson (advice r15).

    Scale: ONE (type) partial-agged moments pass (the ANOVA cost
    shape); the k(k−1)/2 pair/Holm algebra runs driver-side on the
    #types-row collect — bounded by construction (#event-types rows,
    the agg_chi2_independence precedent), never a self-theta-join that
    would plan the BNLJ the fleet plan-audit rejects."""
    import math

    ev = load(spark, sf_dir, "events", columns=["event_type", "value"]).filter(
        F.col("value").isNotNull()
    )
    per = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("ng"),
            F.sum("value").alias("sg"),
            F.sum(F.col("value") * F.col("value")).alias("qg"),
        )
        .collect()
    )
    stats = {}
    for r in per:
        n, s, q = r["ng"], r["sg"], r["qg"]
        mean = s / n
        var = (q - n * mean * mean) / (n - 1) if n > 1 else None
        stats[r["event_type"]] = (n, mean, var)
    pairs = []
    for a in sorted(stats):
        for b in sorted(stats):
            if a >= b:
                continue
            na, ma, va = stats[a]
            nb, mb, vb = stats[b]
            if va is None or vb is None or (va / na + vb / nb) <= 0:
                pairs.append((a, b, na, nb, ma, mb, None, None))
                continue
            t = (ma - mb) / math.sqrt(va / na + vb / nb)
            p = 2.0 * (1.0 - 0.5 * (1.0 + math.erf(abs(t) / math.sqrt(2.0))))
            pairs.append((a, b, na, nb, ma, mb, t, p))
    tested = sorted(
        (p for p in pairs if p[7] is not None),
        key=lambda r: (r[7], r[0], r[1]),
    )
    m = len(tested)
    holm, cummax = {}, 0.0
    for i, r in enumerate(tested):
        cummax = max(cummax, (m - i) * r[7])
        holm[(r[0], r[1])] = (i + 1, min(1.0, cummax))
    r4 = lambda v: None if v is None else math.floor(v * 10000 + 0.5) / 10000 + 0.0  # noqa: E731
    out = []
    for a, b, na, nb, ma, mb, t, p in pairs:
        rank, ph = holm.get((a, b), (None, None))
        out.append(
            (a, b, na, nb, r4(ma), r4(mb), r4(t), r4(p), rank, r4(ph),
             None if ph is None else bool(ph < 0.05))
        )
    return spark.createDataFrame(
        sorted(out),
        "type_a: string, type_b: string, n_a: long, n_b: long, "
        "mean_a: double, mean_b: double, t_stat: double, p_value: double, "
        "p_rank: int, p_holm: double, significant_holm: boolean",
    )


@register("agg_tost_equivalence")  # rows-only (r9 capacity policy):
# ≡ numpy same-formula recompute + planted equivalent/shifted pins —
# tests/test_parity.py
def agg_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (Schuirmann 1987 — the bioequivalence
    standard) between the user-parity cohorts per event type: the
    question agg_welch_ttest CANNOT answer — failing to find a
    difference is NOT evidence of sameness (low power produces the
    same silence). TOST inverts the burden: H₀ is "the cohorts DIFFER
    by at least the margin δ", and only data can reject it. Margin
    δ = 0.2·s_pooled (Cohen's negligible-effect bound — the d < 0.2
    band agg_cohens_d labels 'negligible', so the two ops share one
    yardstick). Two one-sided z tests in the large-N limit:
    t_lower = (diff + δ)/se rejects "diff ≤ −δ", t_upper =
    (diff − δ)/se rejects "diff ≥ +δ"; p_tost = max(1 − Φ(t_lower),
    Φ(t_upper)); equivalent ⟺ p_tost < 0.05. Degenerate cohorts
    (n < 2 or zero pooled sd) emit NULL. Emits (event_type, n_a, n_b,
    diff, margin, t_lower, t_upper, p_tost, equivalent).

    Scale: the SAME single conditional-moments pass as
    welch/power/FDR/d (shared _cohort_moments — one shuffle carries
    all four moments of both cohorts); Φ via the shared Abramowitz–
    Stegun helper; all TOST algebra on #types rows."""
    ev = load(
        spark, sf_dir, "events", columns=["event_type", "user_id", "value"]
    ).filter(F.col("value").isNotNull())
    agg, ma, mb, va, vb = _cohort_moments(ev)
    na, nb = F.col("na"), F.col("nb")
    pooled_var = F.try_divide((na - 1) * va + (nb - 1) * vb, na + nb - 2)
    sp = F.sqrt(pooled_var)
    delta = 0.2 * sp
    se = F.sqrt(va / na + vb / nb)
    diff = ma - mb
    ok = (sp > 0) & (se > 0)
    t_lo = F.when(ok, (diff + delta) / se)
    t_hi = F.when(ok, (diff - delta) / se)
    p_tost = F.greatest(1.0 - _phi(t_lo), _phi(t_hi))
    r4 = lambda c: F.floor(c * 10000 + 0.5) / 10000 + 0.0  # noqa: E731
    return agg.select(
        "event_type",
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        r4(diff).alias("diff"),
        r4(delta).alias("margin"),
        r4(t_lo).alias("t_lower"),
        r4(t_hi).alias("t_upper"),
        r4(p_tost).alias("p_tost"),
        (p_tost < 0.05).alias("equivalent"),
    )
