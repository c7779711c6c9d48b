"""Probe: recurring merges over bucketed layouts at sf0.1 (judge r6 item 4).

The recurring-upsert production shape: the dimension/fact target and each
staging batch live bucketed on the merge key, so the merge's joins consume
the layout with zero hash exchanges. Measures merge_scd1 and
merge_scd2_changes over orders (150 k rows, 10% incoming batch) plain vs
bucketed, with broadcast disabled to model fact-scale batches (where no
side fits a broadcast threshold). Median of 3.
"""

from __future__ import annotations

import statistics
import time

from pyspark.sql import functions as F

from n2kupdate_spark.operators import merge_scd1, merge_scd2_changes
from n2kupdate_spark.session import get_spark
from n2kupdate_spark.sources import load
from n2kupdate_spark.sources.catalog import write_bucketed

SF = "/root/testdata/sf0.1"
KEY = ["o_orderkey"]
COMPARE = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]

spark = get_spark(app_name="probe-bucketed-merge", shuffle_partitions=32)
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

orders = load(spark, SF, "orders").drop("o_orderdate")
target = orders.select(
    *KEY, *COMPARE,
    F.lit("2025-01-01 00:00:00").alias("valid_from"),
    F.lit(None).cast("string").alias("valid_to"),
)
incoming = orders.filter(F.col("o_orderkey") % 10 == 0).select(
    *KEY,
    "o_custkey",
    "o_orderstatus",
    F.round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
    "o_orderpriority",
)

write_bucketed(target, "n2k_probe_mrg_t", KEY, 16)
write_bucketed(incoming, "n2k_probe_mrg_i", KEY, 16)


def timed(fn, reps=3):
    runs = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return statistics.median(runs)


def scd1_plain():
    merge_scd1(target.drop("valid_from", "valid_to"), incoming, KEY).count()


def scd1_bucketed():
    merge_scd1(
        spark.table("n2k_probe_mrg_t").drop("valid_from", "valid_to"),
        spark.table("n2k_probe_mrg_i"),
        KEY,
    ).count()


def scd2_plain():
    merge_scd2_changes(target, incoming, KEY, COMPARE, "2026-01-01 00:00:00").count()


def scd2_bucketed():
    merge_scd2_changes(
        spark.table("n2k_probe_mrg_t"),
        spark.table("n2k_probe_mrg_i"),
        KEY,
        COMPARE,
        "2026-01-01 00:00:00",
    ).count()


try:
    p1, b1 = timed(scd1_plain), timed(scd1_bucketed)
    p2, b2 = timed(scd2_plain), timed(scd2_bucketed)
    print(
        f"merge_scd1: plain={p1:.2f}s bucketed={b1:.2f}s ({b1 / p1:.2f}x)  "
        f"merge_scd2_changes: plain={p2:.2f}s bucketed={b2:.2f}s ({b2 / p2:.2f}x)"
    )
finally:
    for t in ("n2k_probe_mrg_t", "n2k_probe_mrg_i"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
