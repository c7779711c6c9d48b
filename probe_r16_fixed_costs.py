"""r16 probe: fixed driver-side costs paid inside every timed query build.

Times (on an idle box):
  1. sources.load() — first call vs repeat calls per table (schema
     inference + file listing + tune() re-set cost),
  2. the fan_out partition-deficit check (df.rdd.getNumPartitions() is a
     full plan->RDD conversion),
  3. tune(spark) alone,
  4. spark.read.parquet with the declared schema vs inferred.

The point: a bench rep re-builds its query from scratch, so any constant
cost here is multiplied by (#queries x reps x loads-per-query) in the
headline number — ~220 load() calls per bench run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from n2kupdate_spark.session import get_spark, tune  # noqa: E402
from n2kupdate_spark.sources import load  # noqa: E402
from n2kupdate_spark.sources.catalog import SCHEMAS, table_path  # noqa: E402


def t(fn, n=20):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r16-fixed-costs")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"tune(spark) repeat: {t(lambda: tune(spark))*1000:.1f} ms")

    for name in ("documents", "lineitem", "events", "embeddings", "orders"):
        d = t(lambda: load(spark, sf, name), 10)
        print(f"load({name}) repeat: {d*1000:.1f} ms")

    d = t(lambda: spark.read.parquet(table_path(sf, "documents")), 10)
    print(f"read.parquet(documents) inferred: {d*1000:.1f} ms")
    d = t(
        lambda: spark.read.schema(SCHEMAS["documents"]).parquet(
            table_path(sf, "documents")
        ),
        10,
    )
    print(f"read.parquet(documents) declared: {d*1000:.1f} ms")

    df = load(spark, sf, "documents").select("doc_id", "text")
    d = t(lambda: df.rdd.getNumPartitions(), 10)
    print(f"df.rdd.getNumPartitions() on a scan: {d*1000:.1f} ms")

    from n2kupdate_spark.operators.parallel import fan_out

    d = t(lambda: fan_out(df, "doc_id"), 10)
    print(f"fan_out(df, doc_id) build: {d*1000:.1f} ms")


if __name__ == "__main__":
    main()
