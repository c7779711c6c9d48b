"""One-off probe (VERDICT r3 item 7): skew-salted CC vs plain propagation
on a synthetic star graph — the power-law worst case where every
symmetrized edge carries the hub id, so the unsalted propagation join
lands the entire graph on ONE reduce key. Results recorded in
BASELINE.md §5."""

import time

from pyspark.sql import SparkSession, functions as F

from n2kupdate_spark.operators.dedup import (
    connected_components,
    connected_components_salted,
)


def star(spark, leaves):
    nodes = spark.range(leaves + 1).select(F.col("id"))
    edges = (
        spark.range(1, leaves + 1)
        .select(F.lit(0).cast("long").alias("id1"), F.col("id").alias("id2"))
    )
    return nodes, edges


def run(fn, nodes, edges, **kw):
    t0 = time.time()
    out = fn(nodes, edges, id_col="id", **kw)
    n_clusters = out.select("cluster_id").distinct().count()
    dt = time.time() - t0
    assert n_clusters == 1, n_clusters
    return dt


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("probe-cc-star")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for leaves in (50_000, 500_000):
        nodes, edges = star(spark, leaves)
        nodes = nodes.localCheckpoint(eager=True)
        edges = edges.localCheckpoint(eager=True)
        # warm JVM once at the small size
        t_plain = run(connected_components, nodes, edges)
        t_salted = run(connected_components_salted, nodes, edges, salt=8)
        print(
            f"leaves={leaves}: plain={t_plain:.2f}s salted={t_salted:.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
