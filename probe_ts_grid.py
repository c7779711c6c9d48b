"""One-off probe (VERDICT r4 item 7): grid-growth bound of the time-series
regularization ops (`ts_resample_ffill` / `ts_gap_interpolate`).

Their output size is Σ_per_key (span/step + 1) — bounded by TIME SPAN, not
by input row count. That is the scale hazard: one corrupt epoch-0 timestamp
widens a single key's span to ~56 years and its grid to ~490k hourly rows,
regardless of how few observations the key has. This probe measures

  1. the healthy grid at sf0.1 (rows, wall),
  2. the same data with ONE event timestamp corrupted to epoch 0 — the
     single-bad-row blow-up, and
  3. the span clamp a 100 TB caller needs: g0 := greatest(g0, g1 −
     max_span_steps·step), which restores the bound no matter what the
     data contains.

Results recorded in BASELINE.md §5; the contract is documented on both
query docstrings (queries/mlprep.py)."""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

STEP = 3600  # hourly grid, matching the registered queries


def resample_ffill(e: DataFrame, max_span_steps: int | None = None) -> DataFrame:
    """Mirror of queries/mlprep.py::ts_resample_ffill's plan (union of grid
    and points + one window pass), with the optional span clamp under test."""
    g0 = (F.ceil(F.min("ts_s") / STEP) * STEP).cast("long")
    g1 = (F.floor(F.max("ts_s") / STEP) * STEP).cast("long")
    bounds = e.groupBy("user_id").agg(g0.alias("g0"), g1.alias("g1"))
    if max_span_steps is not None:
        bounds = bounds.withColumn(
            "g0", F.greatest("g0", F.col("g1") - F.lit(max_span_steps * STEP))
        )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("g0", "g1", F.lit(STEP).cast("long"))).alias("ts_s")
    )
    unioned = e.select(
        "user_id", "ts_s", "value", F.lit(0).alias("is_grid"), "event_id"
    ).unionByName(
        grid.select(
            "user_id", "ts_s", F.lit(None).cast("double").alias("value"),
            F.lit(1).alias("is_grid"), F.lit(None).cast("long").alias("event_id"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts_s").asc(), F.col("is_grid").asc(),
            F.coalesce(F.col("event_id"), F.lit(-1)).asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.select(
            "user_id", "ts_s", "is_grid",
            F.last("value", ignorenulls=True).over(w).alias("value_ffill"),
        )
        .filter(F.col("is_grid") == 1)
        .drop("is_grid")
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
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .appName("probe-ts-grid")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from n2kupdate_spark.sources import load

    e = (
        load(spark, sf, "events", columns=["user_id", "event_id", "value", "ts"])
        .select(
            "user_id", "event_id", "value",
            F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
        )
        .localCheckpoint(eager=True)
    )
    n_events = e.count()
    n_keys = e.select("user_id").distinct().count()
    resample_ffill(e).count()  # warm
    t, n = timed(resample_ffill(e))
    print(f"healthy:   events={n_events} keys={n_keys} grid_rows={n} wall={t:.2f}s")

    # corrupt ONE timestamp of ONE key to epoch 0 (the classic bad-parse value)
    victim = e.orderBy("event_id").limit(1).select("event_id").first()[0]
    bad = e.withColumn(
        "ts_s", F.when(F.col("event_id") == victim, F.lit(0).cast("long")).otherwise(F.col("ts_s"))
    )
    t_bad, n_bad = timed(resample_ffill(bad))
    print(f"one epoch-0 row: grid_rows={n_bad} (+{n_bad - n}) wall={t_bad:.2f}s")

    # the guard: clamp every key's span to 90 days of hourly steps
    t_g, n_g = timed(resample_ffill(bad, max_span_steps=24 * 90))
    print(f"clamped (90d):   grid_rows={n_g} wall={t_g:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
