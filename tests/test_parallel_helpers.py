"""Pins for the shared parallelism/driver-boundary helpers
(operators/parallel.py) and the load() plan-cache token edge cases —
the r16-ADVICE fixes and the r17 fan_out probe memoization."""

from __future__ import annotations

import math

from n2kupdate_spark.operators.parallel import (
    _NPART_MEMO,
    _plan_partitions,
    fan_out,
    local_frame,
)
from n2kupdate_spark.sources.catalog import _stat_token


def test_local_frame_nan_falls_back_to_classic_path(spark):
    """NaN floats must survive local_frame: pyarrow's from_pandas would
    silently turn NaN into NULL, so such rows take the classic
    createDataFrame path (r16 ADVICE)."""
    rows = [(1, float("nan")), (2, 1.5)]
    out = {r["a"]: r["v"] for r in local_frame(spark, rows, "a int, v double").collect()}
    assert math.isnan(out[1])
    assert out[2] == 1.5


def test_local_frame_arrow_path_matches_classic(spark):
    rows = [(1, "x", 2.5), (2, "y", -0.0)]
    got = local_frame(spark, rows, "a int, b string, c double").collect()
    want = spark.createDataFrame(rows, "a int, b string, c double").collect()
    assert got == want


def test_plan_partitions_memoizes_per_semantic_plan(spark, sf_dir):
    """Two builds of the same logical frame share one memo entry, and the
    memoized count equals the real physical partition count."""
    from n2kupdate_spark.sources import load

    _NPART_MEMO.clear()
    d1 = load(spark, sf_dir, "documents").select("doc_id")
    n1 = _plan_partitions(d1)
    assert n1 == d1.rdd.getNumPartitions()
    size_after_first = len(_NPART_MEMO)
    # a fresh, semantically identical frame: no new entry
    d2 = load(spark, sf_dir, "documents").select("doc_id")
    assert _plan_partitions(d2) == n1
    assert len(_NPART_MEMO) == size_after_first
    # fan_out still widens a single-file scan and keeps values intact
    wide = fan_out(d1, "doc_id")
    assert wide.rdd.getNumPartitions() >= 2
    assert sorted(r["doc_id"] for r in wide.collect()) == sorted(
        r["doc_id"] for r in d1.collect()
    )


def test_stat_token_refuses_nested_directories(tmp_path):
    """A nested/partitioned layout must NOT be cacheable: leaf rewrites
    inside a subdirectory don't bump the parent entry's mtime/size
    (r16 ADVICE)."""
    flat = tmp_path / "flat"
    flat.mkdir()
    (flat / "part-0.parquet").write_bytes(b"x")
    assert _stat_token(str(flat)) is not None
    nested = tmp_path / "nested"
    (nested / "k=1").mkdir(parents=True)
    (nested / "k=1" / "part-0.parquet").write_bytes(b"x")
    assert _stat_token(str(nested)) is None
