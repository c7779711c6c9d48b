"""Hot-source probe for pack_sequences sub-sharding (judge r7 item 3).

The per-source cumsum window parallelizes across sources, but a corpus
where ONE source dominates funnels that source through a single task's
sort — the last single-task funnel on the corpus path. ``shards>1``
range-splits each group at approx-quantile cuts of the order key,
cumsums per (group, shard), and rebuilds exact offsets from a tiny
prefix-summed totals frame (output identical — property-tested in
tests/test_mlprep_props.py). This probe measures the wall-clock win on
an adversarially skewed frame: 2M rows, 70% in one source, cold tail
spread over 64 sources.

Interleaved min-of-3 (box-load drift cancels out of the ratio), noop
sink. Run: python probe_pack_hot.py   Results recorded in BASELINE.md §5.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from n2kupdate_spark.operators.corpus import pack_sequences
from n2kupdate_spark.session import get_spark

N = 2_000_000
HOT_FRAC = 0.7


def build_frame(spark):
    n_hot = int(N * HOT_FRAC)
    df = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_hot, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 64).cast("string")))
        .alias("source"),
        (7 + (F.col("id") * 13) % 91).cast("int").alias("n_tokens"),
    )
    return df.repartition(32).localCheckpoint(eager=True)


def main() -> None:
    spark = get_spark(app_name="probe-pack-hot")
    spark.sparkContext.setLogLevel("ERROR")
    rows = build_frame(spark)

    def run(shards: int) -> None:
        pack_sequences(
            rows, budget=512, group_col="source", order_cols=("doc_id",),
            token_col="n_tokens", shards=shards,
        ).write.format("noop").mode("overwrite").save()

    run(1)
    run(32)  # warm-up both paths
    t1, t32 = [], []
    for _ in range(3):
        t0 = time.perf_counter(); run(1); t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(32); t32.append(time.perf_counter() - t0)
    out = {
        "rows": N,
        "hot_frac": HOT_FRAC,
        "single_window_sec": round(min(t1), 3),
        "sharded32_sec": round(min(t32), 3),
        "speedup": round(min(t1) / min(t32), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
