"""Table-maintenance operators: small-file compaction.

Operational reality at 100 TB: every incremental writer (streaming
foreachBatch sinks, per-batch staging dumps, partitioned appends)
fragments tables into files far below the scan-efficient size, and every
subsequent scan pays per-file open/footer overhead plus tiny row groups
that defeat min/max pruning. Engines in this space (Delta OPTIMIZE, Hive
concatenate, Iceberg rewrite_data_files) ship compaction as a first-class
maintenance op; this module is that op for plain parquet directories.

Scale notes: sizing uses the Hadoop FileSystem API (works on HDFS/S3/
local alike) and one `ContentSummary` call — no data read on the driver.
The rewrite itself is one distributed job: scan → repartition(n) → write,
where n = ceil(bytes / target). With `sort_by`, files are range-sorted so
parquet min/max column stats become selective (the poor man's Z-order for
one key prefix) — `repartitionByRange` + `sortWithinPartitions` keeps the
global order without a final single-partition pass.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dir_stats(spark: SparkSession, path: str) -> dict:
    """(files, bytes) of a directory via the Hadoop FileSystem API —
    storage-agnostic (local/HDFS/S3) and driver-metadata-only."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    summary = fs.getContentSummary(hpath)
    return {"files": int(summary.getFileCount()), "bytes": int(summary.getLength())}


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 128,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet directory ``src`` into ``dst`` with files sized
    toward ``target_mb``. Returns before/after stats. ``sort_by`` addition-
    ally range-partitions + sorts within files, making column min/max
    stats selective for scans filtered on those columns.

    The rewrite preserves rows and schema exactly (asserted in
    tests/test_sources.py); it does not run in place — atomic swap of
    ``dst`` over ``src`` is the caller's move-or-rename, which is
    storage-specific (HDFS rename vs S3 manifest swap)."""
    before = dir_stats(spark, src)
    n_files = max(1, math.ceil(before["bytes"] / (target_mb * 1024 * 1024)))
    df: DataFrame = spark.read.parquet(src)
    if sort_by:
        df = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(dst)
    after = dir_stats(spark, dst)
    return {"before": before, "after": after, "target_files": n_files}
