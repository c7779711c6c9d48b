"""Scan-parallelism helpers shared by the operator library.

The deficit this fixes: a parquet scan yields at most one task per file
row-group, so a heavy per-row map (gram explode, tokenizer, decoder)
FUSED into the scan stage of a one-file table runs on one core while
the rest of the box idles (guide §2.6 idle capacity / §6 input splits —
the r13 10×-probe lesson, now shared instead of per-op).

At production scale a table is many files and the scan already carries
at least as many partitions as cores — then :func:`fan_out` is the
identity and costs nothing. The round-robin exchange only fires on a
partition deficit, where the shuffled bytes are small by construction
(a table small enough to be one file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's core count
    (or ``min_partitions``) IF its current plan has fewer partitions —
    otherwise return it unchanged. Use immediately before a heavy
    narrow map whose input may be a single-file scan; never changes
    values, only placement (downstream aggregations are
    placement-independent, and Spark's sort-before-repartition keeps
    the assignment deterministic under task retry)."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
