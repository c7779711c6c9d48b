"""Composite analytic pipelines — full multi-operator query shapes.

Each entry chains scan → filter → multi-way join → aggregate → sort/limit in
one plan, the way a real user of the engine composes the §2 operators. Shapes
follow classic TPC-H queries (Q3/Q4/Q5/Q10) adapted to the testdata columns
(FIXTURES.md §1: no o_shippriority / l_commitdate, so those clauses are
dropped; semantics of the join/agg skeleton are unchanged).

Scale notes (100 TB): the fact-fact join (lineitem⋈orders) shuffles on the
order key — at scale both facts should be bucketed on it so the join is
co-located (tests/test_plans.py::test_bucketed_join_avoids_shuffle proves the
technique). Dimensions (nation/region/customer-filtered) stay broadcast; AQE
re-plans the post-filter sides at runtime. Top-k is TakeOrderedAndProject:
per-partition heaps of k rows, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n2kupdate_spark.queries._registry import register
from n2kupdate_spark.sources import load

def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "composite_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           CAST(epoch(o.o_orderdate) AS BIGINT) AS orderdate_s
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def composite_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue for one market segment,
    top 10 by revenue. The segment filter shrinks customer before the join
    (Catalyst pushes it into the scan), so customer broadcasts; only the
    lineitem⋈orders edge shuffles. Tiebreak on l_orderkey makes the LIMIT
    deterministic (SURVEY.md §7.4.4)."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = load(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]).filter(
        F.col("o_orderdate") < cutoff
    )
    l = load(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").alias("orderdate_s"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "composite_order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def composite_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS (any lineitem shipped after its
    order date) → left-semi join with a non-equi conjunct, then count per
    priority. Spark decorrelates this to one semi join: the equi part
    (l_orderkey = o_orderkey) drives the hash/SMJ strategy, the inequality
    rides along as the join residual — no per-row subquery execution."""
    o = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]).filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "composite_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def composite_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue where customer and supplier share a nation,
    one region, one year. Six tables, one shuffle edge (lineitem⋈orders);
    supplier/nation/region broadcast, and the customer-nation = supplier-
    nation constraint is a residual on the broadcast supplier join."""
    c = load(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    o = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = load(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    s = load(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
    )


@register(
    "composite_returned_item_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def composite_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost revenue from returned items per customer, one
    quarter, top 20. Same single-shuffle skeleton as Q3 with the aggregation
    keyed on the customer side; the returnflag filter is pushed into the
    lineitem parquet scan (dictionary/row-group pruning)."""
    c = load(spark, sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
    o = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    l = load(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "composite_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def composite_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from promotional parts.
    Conditional aggregation over a fact-dim join: the month filter prunes
    lineitem row groups at the scan, part broadcasts, and the CASE rides
    inside the partial aggregate — one shuffle of exactly one row per
    partition. Rounding the final ratio (not the operands) keeps the 4dp
    hash stable across summation orders."""
    l = load(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part", columns=["p_partkey", "p_type"])
    rev = _revenue()
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


@register(
    "composite_large_order_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(epoch(o.o_orderdate) AS BIGINT) AS orderdate_s,
           ROUND(o.o_totalprice, 4) AS totalprice,
           ROUND(big.sum_qty, 4) AS sum_qty
    FROM (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 300) big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def composite_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with orders whose total quantity exceeds
    300, top 100 by order value. Aggregate → filter → join back: the
    groupBy(l_orderkey) shuffle leaves the data hash-partitioned on the
    same key the orders join needs, so Spark reuses that partitioning and
    only shuffles the (much smaller) orders side. l_quantity is
    integer-valued, so the HAVING threshold is exact in both engines."""
    l = load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = load(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    c = load(spark, sf_dir, "customer", columns=["c_custkey", "c_name"])
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("orderdate_s"),
            F.round("o_totalprice", 4).alias("totalprice"),
            F.round("sum_qty", 4).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "composite_nation_volume_pairs",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def composite_nation_volume_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipped-goods revenue between two trading nations by
    year and direction. nation joins twice under different roles (supplier
    side, customer side) — each a broadcast pre-filtered to the two nations
    of interest, so the disjunctive pair constraint is a cheap residual on
    already-tiny build sides rather than a post-join filter over the full
    fact fan-out."""
    pair = ["NATION_1", "NATION_2"]
    l = load(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    o = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    c = load(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    s = load(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    n1 = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
    )


@register(
    "composite_disjunctive_part_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
    """,
)
def composite_disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning both
    join sides. Catalyst factors the single-side conjuncts out of the
    disjunction (p_brand IN (...) pushes into the part scan, quantity range
    into lineitem), so the scans shrink before the broadcast join and only
    the genuinely cross-table residual is evaluated post-join."""
    l = load(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    p = load(spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).filter(
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
    )
    return joined.agg(
        F.round(F.sum(_revenue()), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "composite_above_customer_avg",
    oracle="""
    WITH ca AS (
        SELECT o_custkey, AVG(o_totalprice) AS avg_price
        FROM orders GROUP BY o_custkey
    )
    SELECT o.o_orderkey, o.o_custkey,
           ROUND(o.o_totalprice, 4) AS totalprice,
           ROUND(ca.avg_price * 10000) / 10000 AS cust_avg
    FROM orders o JOIN ca ON o.o_custkey = ca.o_custkey
    WHERE o.o_totalprice > 1.5 * ca.avg_price
    """,
)
def composite_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate-subquery shape: orders priced >1.5× their OWN
    customer's average order value (outlier/fraud screening). The naive SQL
    is `WHERE o_totalprice > 1.5 * (SELECT AVG(...) WHERE o_custkey =
    o.o_custkey)` — a per-row correlated subquery; written (and planned)
    as decorrelation: one aggregate over the same table + a self-join on
    the correlation key, so it costs two shuffles on o_custkey total —
    Catalyst reuses the exchange for both sides at scale (same key,
    same partitioning) instead of evaluating N subqueries."""
    o = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    ca = o.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        o.join(ca, "o_custkey")
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            # scale-first: averages are arbitrary ratios — F.round(x,4) and
            # DuckDB ROUND split on half-looking boundaries (see mlprep)
            (F.round(F.col("avg_price") * 10000, 0) / 10000).alias("cust_avg"),
        )
    )
