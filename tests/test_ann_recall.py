"""ANN quality gates: the approximate variants must actually approximate —
recall@10 vs the exact brute-force baseline is pinned from below. Bounds are
intentionally loose (these are recall/latency tradeoff knobs, not exactness
claims) but high enough to catch a broken bucketing join or a seed change
silently zeroing overlap."""

from __future__ import annotations

from n2kupdate_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_ann_recall_bounds(spark):
    rows = {
        r["method"]: r
        for r in QUERIES["sim_ann_recall_eval"](spark, SF).collect()
    }
    assert set(rows) == {"lsh", "ivf"}
    floors = {"lsh": 0.85, "ivf": 0.85}  # measured 0.90 / 0.96 at sf0.001, 0.945 / 0.89 at sf0.1 (24x5 bands, nprobe=10, deterministic seeds)
    for method, row in rows.items():
        assert row["n_queries"] >= 4, method
        assert row["recall_at_10"] >= floors[method], (method, row["recall_at_10"])
