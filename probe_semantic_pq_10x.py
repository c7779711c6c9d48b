"""10x scale probe for the PQ-backed semantic dedup path (r10).

Compares ``dedup_semantic_pq`` (SDC-shortlisted candidates over m=32
codes + exact float re-rank) against the float path
``dedup_semantic_clusters`` on probe_headline_10x's replica, interleaved
min-of-3 so box-load drift cancels out of the ratios. The local wall
number is NOT the point of the codes path — at the fixture's 64-dim /
m=32 shape the code payload is only 4x smaller than the floats, and the
exact re-rank join adds a stage the float path doesn't have; the win is
the pair-generation shuffle's byte volume (dim*8/(m*4): 24x at 768-dim
production embeddings) and the per-task memory footprint of hot
clusters. Both walls and the per-run shuffle-write volume (summed from
the Spark UI REST API, which local mode serves) are recorded so the
trade is measured, not asserted.

Run: python probe_semantic_pq_10x.py    Results recorded in BASELINE.md sec.5.
"""

from __future__ import annotations

import json
import time
import urllib.request

from probe_headline_10x import SF, X10_DIR, build_replica

from n2kupdate_spark.queries import QUERIES
from n2kupdate_spark.session import get_spark


def _shuffle_write_bytes(spark) -> int:
    """Total shuffle-write bytes across all completed stages, from the
    local Spark UI's REST API (monotonic within an app, so deltas around
    a run isolate that run's shuffle volume)."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            stages = json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def main() -> None:
    spark = get_spark(
        app_name="probe-semantic-pq-10x",
        extra_confs={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_replica(spark)

    def run(name: str, sf: str) -> tuple[float, int]:
        """(wall seconds, shuffle-write byte delta) for one execution."""
        b0 = _shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        QUERIES[name](spark, sf).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        b1 = _shuffle_write_bytes(spark)
        return wall, (b1 - b0 if b0 >= 0 and b1 >= 0 else -1)

    # resume rows: the index build lands in rep 1 (cache miss) and
    # min-of-3 discards it, so those numbers are steady-state per-batch
    names = [
        "dedup_semantic_clusters",
        "dedup_semantic_pq",
        "dedup_semantic_resume",
        "dedup_semantic_resume_pq",
    ]
    for n in names:  # warm-up
        run(n, "/root/testdata/sf0.001")
    t1: dict = {}
    t10: dict = {}
    sh10: dict = {}
    for n in names:
        s1, s10, b10 = [], [], []
        for _ in range(3):
            s1.append(run(n, SF)[0])
            w, b = run(n, X10_DIR)
            s10.append(w)
            b10.append(b)
        t1[n], t10[n] = round(min(s1), 3), round(min(s10), 3)
        sh10[n] = max(b10)  # per-run delta; max = least-truncated sample
        print(
            f"{n:28s} {t1[n]:7.2f}s {t10[n]:8.2f}s  {t10[n] / t1[n]:5.2f}x"
            f"  shuffleW(x10)={sh10[n] / 1e6:8.1f} MB"
        )
    print(json.dumps({"sf0.1": t1, "x10": t10, "shuffle_write_x10_bytes": sh10}))


if __name__ == "__main__":
    main()
