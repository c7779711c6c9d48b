"""One-off probe (VERDICT r4 item 5): the fact-fact composite family at
10× scale, plain vs bucketed layout.

`composite_large_order_customers` (TPC-H Q18 shape) is the heaviest
agg→HAVING→join pipeline in the repo: groupBy(l_orderkey) over the biggest
fact, then a join back to orders on the same key. This probe measures

  1. the plain pipeline at sf0.1 and at 10× replicated lineitem/orders
     (keys remapped so the join fan-out stays realistic), and
  2. the same pipeline over both facts BUCKETED on the order key — the
     recurring-job layout where the aggregate's exchange AND the fact⋈fact
     join's exchanges all disappear (the scan's bucketed distribution
     satisfies every downstream requirement; plan-asserted zero
     `Exchange hashpartitioning` in tests/test_plans.py).

Results recorded in BASELINE.md §5."""

from __future__ import annotations

import re
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def replicate(df: DataFrame, key_col: str, copies: int, shift: int) -> DataFrame:
    """Union `copies` shifted copies: every copy remaps the order key by
    i*shift so per-key group sizes and join fan-out match the original."""
    return df.select(
        F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("__i"), "*"
    ).withColumn(
        key_col, (F.col(key_col) + F.col("__i") * F.lit(shift)).cast("long")
    ).drop("__i")


def q18(li: DataFrame, o: DataFrame, c: DataFrame) -> DataFrame:
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            F.round("sum_qty", 4).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


def timed(df: DataFrame) -> tuple[float, int]:
    t0 = time.time()
    n = df.count()
    return time.time() - t0, n


def main() -> None:
    sf = "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .appName("probe-q18-10x")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{sf}/lineitem.parquet").select("l_orderkey", "l_quantity")
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = spark.read.parquet(f"{sf}/customer.parquet").select("c_custkey", "c_name")
    shift = o.agg(F.max("o_orderkey")).first()[0] + 1

    # warm the JVM/codegen on the 1x shape, then measure
    q18(li, o, c).count()
    t1, n1 = timed(q18(li, o, c))
    print(f"plain 1x:  {t1:.2f}s rows={n1}")

    li10 = replicate(li, "l_orderkey", 10, shift).localCheckpoint(eager=True)
    o10 = replicate(o, "o_orderkey", 10, shift).localCheckpoint(eager=True)
    t10, n10 = timed(q18(li10, o10, c))
    print(f"plain 10x: {t10:.2f}s rows={n10} ratio={t10 / t1:.2f}x")

    # bucketed layout: one-time write cost, then the recurring job runs
    # with zero hash exchanges (agg + fact-fact join both satisfied by the
    # scan's bucketed distribution)
    for t in ("probe_li10_b", "probe_o10_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    t0 = time.time()
    li10.write.bucketBy(32, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("probe_li10_b")
    o10.withColumnRenamed("o_orderkey", "l_orderkey").write.bucketBy(
        32, "l_orderkey"
    ).sortBy("l_orderkey").mode("overwrite").saveAsTable("probe_o10_b")
    t_layout = time.time() - t0
    print(f"bucketed layout write (one-time): {t_layout:.2f}s")

    lib = spark.table("probe_li10_b")
    ob = spark.table("probe_o10_b").withColumnRenamed("l_orderkey", "o_orderkey")
    qb = q18(lib, ob, c)
    tb, nb = timed(qb)
    assert nb == n10, (nb, n10)
    plan = qb._jdf.queryExecution().executedPlan().toString()
    n_hash_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    print(
        f"bucketed 10x: {tb:.2f}s rows={nb} "
        f"hash_exchanges={n_hash_ex} vs_plain={tb / t10:.2f}x"
    )
    for t in ("probe_li10_b", "probe_o10_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.stop()


if __name__ == "__main__":
    main()
