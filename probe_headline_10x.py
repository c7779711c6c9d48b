"""Full-headline 10× scale sweep (VERDICT r6 item 6).

The per-family 10× probes (probe_fuzzy_10x, probe_q18_10x, probe_ts_grid,
text ops) each scale ONE pipeline; this sweep runs the ENTIRE 20-query
headline set of bench.py over a 10×-replicated sf0.1 so no query's constant
factor can hide super-linear behavior behind a family it was never probed
in. Replication preserves each query's work character:

- region/nation copied as-is (fixed-size dimensions at every TPC-H SF, so
  join fanout per fact row is unchanged);
- customer/supplier/part/orders/lineitem/events replicated 10× with every
  PK/FK shifted by copy × 10M — referential integrity holds within each
  copy, join selectivity and group cardinality scale exactly 10×;
- documents replicated with doc_id shifted and EVERY token copy-prefixed
  (probe_fuzzy_10x's bijective shingle remap): within-copy Jaccard is
  exact, cross-copy shingle sets are disjoint, so near-dup pair counts
  scale exactly 10×, never quadratically;
- embeddings replicated with vec_id shifted by 10M (divisible by the
  `vec_id % 100 = 0` query predicate, so the candidate query pool also
  scales — the LIMIT 256 truncation keeps Q fixed, isolating corpus
  scale-up, which is the documented contract of sim_cosine_topk).

Replica is built once under /tmp and reused. Median-of-3 per query at both
scales in one warm session; a healthy engine shows every ratio well under
10× on 32 cores (fixed overheads amortize; shuffles stay partition-
parallel) and NOTHING above ~10× (super-linear = a scale bug).

Run: python probe_headline_10x.py      Results recorded in BASELINE.md §5.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F

from bench import HEADLINE
from n2kupdate_spark.queries import QUERIES
from n2kupdate_spark.session import get_spark
from n2kupdate_spark.sources import load

SF = "/root/testdata/sf0.1"
X10_DIR = "/tmp/n2k_sf0p1_x10"
COPIES = 10
SHIFT = 10_000_000

#: key columns to shift per replicated copy, per table
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def replicate(df: DataFrame, keys: list[str], mark_text: bool) -> DataFrame:
    out = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))).alias("__i"), "*"
    )
    for k in keys:
        out = out.withColumn(k, F.col(k) + F.col("__i").cast("long") * F.lit(SHIFT))
    if mark_text:
        out = out.withColumn(
            "text",
            F.regexp_replace(
                F.col("text"),
                r"(\S+)",
                F.concat(F.lit("c"), F.col("__i").cast("string"), F.lit(r"$1")),
            ),
        )
    return out.drop("__i")


def build_replica(spark) -> None:
    # Replicated tables are written as COPIES files — "10× the data" at
    # a fixed per-file size IS the production layout (a crawl grows by
    # adding files, not by growing one file), and parquet row groups
    # don't split, so a 1-file replica (the pre-r13 layout) capped every
    # zero-shuffle map at ONE task and made pure-map ops read as
    # falsely linear at 10× (r13 probe fix; rows recorded before/after
    # the change are flagged in BASELINE §5).
    if os.path.isdir(f"{X10_DIR}/lineitem.parquet"):
        return
    for t in ("region", "nation"):
        load(spark, SF, t).write.mode("overwrite").parquet(f"{X10_DIR}/{t}.parquet")
    for t, keys in SHIFT_COLS.items():
        replicate(load(spark, SF, t), keys, mark_text=(t == "documents")).repartition(
            COPIES
        ).write.mode("overwrite").parquet(f"{X10_DIR}/{t}.parquet")


def bench_pair(spark, reps: int = 3) -> tuple[dict[str, float], dict[str, float]]:
    """Time every headline query at BOTH scales with interleaved reps
    (1×,10×,1×,10×,…) and take the per-scale MIN. Interleaving keeps the
    two measurements adjacent in time, so box-load drift and JVM warm-up
    cancel out of the ratio (a sequential 1×-phase-then-10×-phase design
    charged all the JIT/heap-growth cost to the 1× phase and produced
    ratios < 1); min-of-reps is robust to transient interference spikes."""
    import gc

    t1: dict[str, float] = {}
    t10: dict[str, float] = {}
    for name in HEADLINE:
        s1, s10 = [], []
        for _ in range(reps):
            for sf_dir, out in ((SF, s1), (X10_DIR, s10)):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                out.append(time.perf_counter() - t0)
        t1[name], t10[name] = round(min(s1), 3), round(min(s10), 3)
        # Drop Python refs to per-query DataFrames so ContextCleaner can
        # release eagerly-checkpointed RDD blocks between queries — at 10×
        # the dedup family's checkpoints otherwise accumulate across reps.
        gc.collect()
    return t1, t10


def main() -> None:
    spark = get_spark(app_name="probe-headline-10x")
    spark.sparkContext.setLogLevel("ERROR")
    build_replica(spark)
    # warm-up: every query once at sf0.001 (same policy as bench.py)
    for name in HEADLINE:
        QUERIES[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    t1, t10 = bench_pair(spark)
    rows = []
    for name in HEADLINE:
        ratio = round(t10[name] / t1[name], 2) if t1[name] else float("nan")
        rows.append((name, t1[name], t10[name], ratio))
        print(f"{name:32s} {t1[name]:7.2f}s {t10[name]:8.2f}s  {ratio:5.2f}x")
    tot1, tot10 = sum(t1.values()), sum(t10.values())
    print(f"{'TOTAL':32s} {tot1:7.2f}s {tot10:8.2f}s  {tot10 / tot1:5.2f}x")
    print(json.dumps({"sf0.1": t1, "x10": t10}))


if __name__ == "__main__":
    main()
