"""r16 probe: HITS loop — per-iteration join strategy A/B.

Hypothesis (guide §2.4 / §3): hits_scores joins the checkpointed ~550k-row
edge list against a tiny score vector twice per double-step; the
checkpointed list has no recognized partitioning, so every join re-shuffles
the edge list (SMJ both sides), and the per-iteration eager localCheckpoint
serializes ~12 jobs of scheduling latency.

Variants (identical math, identical rounding):
  v1: current operators/dedup.py::hits_scores
  v2: twin edge copies pre-partitioned by __s and __d (localCheckpoint
      preserves outputPartitioning), keep per-iteration checkpoints
  v3: v2 but NO intermediate checkpoints — one deep lazy plan, evaluated
      once at the end (straight-line DAG: each intermediate has exactly
      one consumer, so nothing recomputes)

Checks exact equality of the rounded outputs v1 vs v2 vs v3 at sf0.1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from n2kupdate_spark.operators.dedup import DRIVER_EDGE_THRESHOLD, _edge_gated, _iter_ckpt, hits_scores
from n2kupdate_spark.session import get_spark
from n2kupdate_spark.sources import load


def _edges(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    o = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    return li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst")
    )


def hits_v23(edges: DataFrame, iters: int = 6, ckpt_every_iter: bool = False) -> DataFrame:
    spark = edges.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select(
            F.col("src").alias("__s"), F.col("dst").alias("__d"), F.lit(1.0).alias("__w")
        )
        .filter(F.col("__s").isNotNull() & F.col("__d").isNotNull())
        .groupBy("__s", "__d")
        .agg(F.sum("__w").alias("__w"))
        .localCheckpoint(eager=True)
    )
    frob = e.agg(F.sqrt(F.sum(F.col("__w") * F.col("__w")))).collect()[0][0]
    scaled = e.select("__s", "__d", (F.col("__w") / F.lit(frob)).alias("__w"))
    e_s = scaled.repartition(nparts, "__s").localCheckpoint(eager=True)
    e_d = scaled.repartition(nparts, "__d").localCheckpoint(eager=True)
    h = e_s.select("__s").distinct().select("__s", F.lit(1.0).alias("__h"))
    if ckpt_every_iter:
        h = h.localCheckpoint(eager=True)
    a = None
    for _ in range(iters):
        a = (
            e_s.join(h, "__s")
            .groupBy("__d")
            .agg(F.sum(F.col("__w") * F.col("__h")).alias("__a"))
        )
        h = (
            e_d.join(a, "__d")
            .groupBy("__s")
            .agg(F.sum(F.col("__w") * F.col("__a")).alias("__h"))
        )
        if ckpt_every_iter:
            h = h.localCheckpoint(eager=True)
    h = h.localCheckpoint(eager=True)
    a = a.localCheckpoint(eager=True)
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
    spark = get_spark(app_name="r16-hits-probe")
    spark.sparkContext.setLogLevel("ERROR")

    variants = {
        "v1_current": lambda: hits_scores(_edges(spark, sf_dir), iters=6),
        "v2_twins_ckpt": lambda: hits_v23(_edges(spark, sf_dir), 6, True),
        "v3_twins_lazy": lambda: hits_v23(_edges(spark, sf_dir), 6, False),
    }
    # warm-up once each at sf0.001
    warm = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    li = load(spark, warm, "lineitem", columns=["l_orderkey", "l_suppkey"])
    hits_scores(_edges(spark, warm), iters=6).write.format("noop").mode("overwrite").save()
    hits_v23(_edges(spark, warm), 6, True).write.format("noop").mode("overwrite").save()
    hits_v23(_edges(spark, warm), 6, False).write.format("noop").mode("overwrite").save()

    for name, fn in variants.items():
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        samples.sort()
        print(f"{name}: median={samples[1]} min={samples[0]} all={samples}")

    # exact output comparison
    base = variants["v1_current"]().collect()
    ref = {(r["side"], r["id"]): r["score"] for r in base}
    for name in ("v2_twins_ckpt", "v3_twins_lazy"):
        got = {(r["side"], r["id"]): r["score"] for r in variants[name]().collect()}
        same = got == ref
        print(f"{name} == v1: {same} (rows {len(got)} vs {len(ref)})")
        if not same:
            diff = [k for k in ref if ref[k] != got.get(k)][:5]
            print("  first diffs:", [(k, ref[k], got.get(k)) for k in diff])


if __name__ == "__main__":
    main()
