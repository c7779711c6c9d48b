"""Streaming state-store growth probe (VERDICT r6 item 5).

The 100 TB streaming safety property is that state is bounded by the
watermark HORIZON, not by input length: a stream that has seen a year of
events must hold only the last hour's keys/windows/sessions in the state
store. This probe scripts 12 one-file micro-batches whose event time
advances 45 min per batch (20 fresh keys each, so 240 distinct keys total)
through one availableNow run with maxFilesPerTrigger=1, and records
``stateOperators[0].numRowsTotal`` per micro-batch for the three stateful
shapes: dropDuplicatesWithinWatermark, the tumbling-window agg, and the
built-in session_window agg. A healthy series ramps while the watermark is
still -inf, then PLATEAUS at the horizon as eviction matches admission.

Run: python probe_state_growth.py
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
import tempfile

from n2kupdate_spark.session import get_spark
from n2kupdate_spark.sources.catalog import SCHEMAS
from n2kupdate_spark.streaming import (
    events_file_stream,
    stream_dedup_within_watermark,
    stream_session_window_agg,
    stream_tumbling_agg,
)

N_BATCHES, KEYS = 12, 20
BASE = dt.datetime(2025, 1, 1, 0, 0)


def write_batches(spark, src: str) -> None:
    for i in range(N_BATCHES):
        rows = [
            (
                i * 1000 + j,
                BASE + dt.timedelta(minutes=45 * i, seconds=j),
                1,
                "view",
                float(i * 1000 + j),
                None,
            )
            for j in range(KEYS)
        ]
        spark.createDataFrame(rows, SCHEMAS["events"]).coalesce(1).write.mode(
            "append"
        ).parquet(src)


def state_series(spark, stream_df, ckpt: str) -> tuple[list[int], int]:
    """Drain ``stream_df`` one file per micro-batch; return the per-batch
    state-row series and the number of rows emitted downstream."""
    emitted = []
    q = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, eid: emitted.append(df.count()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    series = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    return series, sum(emitted)


def main() -> None:
    spark = get_spark(app_name="state-growth-probe", shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="n2k_stateprobe_")
    src = f"{work}/src"
    write_batches(spark, src)
    out = {"n_batches": N_BATCHES, "keys_per_batch": KEYS, "spacing_min": 45}
    shapes = {
        "dedup": lambda s: stream_dedup_within_watermark(s, "1 hour"),
        "tumbling": lambda s: stream_tumbling_agg(s, "1 hour"),
        "session": lambda s: stream_session_window_agg(s, "30 minutes", "1 hour"),
    }
    for name, fn in shapes.items():
        stream = events_file_stream(spark, src, max_files_per_trigger=1)
        series, n_out = state_series(spark, fn(stream), f"{work}/ckpt_{name}")
        out[name] = {"state_rows": series, "emitted": n_out}
        print(name, series, "emitted:", n_out)
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
