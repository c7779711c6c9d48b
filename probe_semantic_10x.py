"""10× scale probe for the round-9 SemDeDup composition
(dedup_semantic_clusters: spherical-k-means assignment + within-cluster
block-pair cosine pruning).

Reuses probe_headline_10x's replica (embeddings vec_id shifted by 10M per
copy) and its interleaved min-of-reps timing so box-load drift cancels out
of the ratio. Expected shape at 10×: the centroid fit is bounded (sample +
one Lloyd pass ∝ corpus scan), the assignment is a map, and pair cost
follows Σ n_cluster² — the replica multiplies every cluster's population
~10×, so pair work grows ~100× in the worst case but stays bucketed into
block-pair tasks; wall clock should land well under that because the
fixture's pair density at tau=0.3 is sparse and the matmul is vectorized.
What this probe guards: the ratio must come from collision mass, not from
a driver-side or single-task bottleneck (no super-linear stage outside the
pair scorer).

Run: python probe_semantic_10x.py       Results recorded in BASELINE.md §5.
"""

from __future__ import annotations

import json
import time

from probe_headline_10x import SF, X10_DIR, build_replica

from n2kupdate_spark.queries import QUERIES
from n2kupdate_spark.session import get_spark

OP = "dedup_semantic_clusters"


def main() -> None:
    spark = get_spark(app_name="probe-semantic-10x")
    spark.sparkContext.setLogLevel("ERROR")
    build_replica(spark)
    QUERIES[OP](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()  # warm-up
    s1, s10 = [], []
    for _ in range(3):
        for sf_dir, out in ((SF, s1), (X10_DIR, s10)):
            t0 = time.perf_counter()
            QUERIES[OP](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out.append(time.perf_counter() - t0)
    t1, t10 = round(min(s1), 3), round(min(s10), 3)
    print(f"{OP:28s} {t1:7.2f}s {t10:8.2f}s  {t10 / t1:5.2f}x")
    print(json.dumps({"sf0.1": t1, "x10": t10}))


if __name__ == "__main__":
    main()
