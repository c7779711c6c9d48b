"""r16 probe #2: HITS — broadcast loop joins, fused init aggs, AQE toggle.

v1: current hits_scores
v4: size-gated F.broadcast(h)/F.broadcast(a) in the loop joins + fused
    (n_edges, frob) single-pass agg + no second checkpoint of the scaled
    edge list (scale folded into the join projection)
v6: v4 with AQE disabled during the loop (restored after)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from n2kupdate_spark.operators.dedup import hits_scores
from n2kupdate_spark.session import get_spark
from n2kupdate_spark.sources import load


def _edges(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    o = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    return li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst")
    )


def hits_v4(edges: DataFrame, iters: int = 6, aqe_off: bool = False) -> DataFrame:
    spark = edges.sparkSession
    e = (
        edges.select(
            F.col("src").alias("__s"), F.col("dst").alias("__d"), F.lit(1.0).alias("__w")
        )
        .filter(F.col("__s").isNotNull() & F.col("__d").isNotNull())
        .groupBy("__s", "__d")
        .agg(F.sum("__w").alias("__w"))
        .localCheckpoint(eager=True)
    )
    # fused single-pass: edge count (for the gate, elsewhere) + frobenius
    stats = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sqrt(F.sum(F.col("__w") * F.col("__w"))).alias("frob"),
    ).collect()[0]
    frob = stats["frob"]
    e = e.select("__s", "__d", (F.col("__w") / F.lit(frob)).alias("__w"))
    h = e.select("__s").distinct().select("__s", F.lit(1.0).alias("__h"))
    h = h.localCheckpoint(eager=True)
    if aqe_off:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        a = None
        for _ in range(iters):
            a = (
                e.join(F.broadcast(h), "__s")
                .groupBy("__d")
                .agg(F.sum(F.col("__w") * F.col("__h")).alias("__a"))
            )
            h = (
                e.join(F.broadcast(a), "__d")
                .groupBy("__s")
                .agg(F.sum(F.col("__w") * F.col("__a")).alias("__h"))
            ).localCheckpoint(eager=True)
        a = a.localCheckpoint(eager=True)
    finally:
        if aqe_off:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
    hn = h.agg(F.sqrt(F.sum(F.col("__h") * F.col("__h")))).collect()[0][0]
    an = a.agg(F.sqrt(F.sum(F.col("__a") * F.col("__a")))).collect()[0][0]
    r6 = lambda c: F.floor(c * 1e6 + 0.5) / 1e6 + 0.0  # noqa: E731
    hub = h.select(
        F.lit("hub").alias("side"), F.col("__s").alias("id"),
        r6(F.col("__h") / F.lit(hn if hn else 1.0)).alias("score"),
    )
    auth = a.select(
        F.lit("authority").alias("side"), F.col("__d").alias("id"),
        r6(F.col("__a") / F.lit(an if an else 1.0)).alias("score"),
    )
    return hub.unionByName(auth)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r16-hits-probe2")
    spark.sparkContext.setLogLevel("ERROR")
    warm = "/root/testdata/sf0.001"
    variants = {
        "v1_current": lambda sf: hits_scores(_edges(spark, sf), iters=6),
        "v4_bcast": lambda sf: hits_v4(_edges(spark, sf), 6, False),
        "v6_bcast_noaqe": lambda sf: hits_v4(_edges(spark, sf), 6, True),
    }
    for name, fn in variants.items():
        fn(warm).write.format("noop").mode("overwrite").save()
    for name, fn in variants.items():
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        samples.sort()
        print(f"{name}: median={samples[1]} min={samples[0]} all={samples}")
    base = variants["v1_current"](sf_dir).collect()
    ref = {(r["side"], r["id"]): r["score"] for r in base}
    for name in ("v4_bcast", "v6_bcast_noaqe"):
        got = {(r["side"], r["id"]): r["score"] for r in variants[name](sf_dir).collect()}
        print(f"{name} == v1: {got == ref} (rows {len(got)} vs {len(ref)})")
        if got != ref:
            diff = [k for k in ref if ref[k] != got.get(k)][:5]
            print("  first diffs:", [(k, ref[k], got.get(k)) for k in diff])


if __name__ == "__main__":
    main()
