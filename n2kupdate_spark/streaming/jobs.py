"""B10 — Structured Streaming execution (SURVEY.md §2 B10).

The reference's whole purpose is *incremental idempotent update* of a
warehouse; in Spark that is a stream: source → event-time windowed
transforms bounded by watermarks → ``foreachBatch`` running the same merge
transforms (operators/merge.py) against the sink. The batch-equivalent
logical plans are oracle-checked in queries/streaming_batch.py; this module
is the streaming runtime wiring, smoke-tested in tests/test_streaming.py.

Scale notes: state stores (dedup, windows) are bounded by the watermark —
without it, state grows with the key space forever. foreachBatch executes
merges once per micro-batch with the batch's epoch id available for
exactly-once sinks that can record it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n2kupdate_spark.sources.catalog import SCHEMAS


def events_file_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream with the events schema (parquet files dropped into
    ``source_dir`` become micro-batches). The explicit schema is mandatory
    for streaming reads — no inference pass exists."""
    return spark.readStream.schema(SCHEMAS["events"]).parquet(source_dir)


def stream_tumbling_agg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Per-hour counts by event type with late data bounded by the
    watermark (stream_tumbling_counts + stream_watermark_late)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "total_value")
    )


def stream_dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful dedup by event_id within the watermark horizon — the
    streaming form of the reference's fingerprint idempotence
    (stream_dedup_watermark)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def stream_upsert_foreachbatch(
    events: DataFrame,
    merge_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """The n2kupdate analog: every micro-batch is staged and merged by
    ``merge_fn(batch_df, epoch_id)`` — e.g. a closure over
    ``sources.jdbc.upsert`` or ``operators.merge.merge_scd1`` + a table
    write. Returns the started StreamingQuery."""
    writer = (
        events.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge_fn)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
