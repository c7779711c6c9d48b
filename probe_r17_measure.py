"""r17 optimization round: per-query measurement + plan capture.

Same protocol as probe_r16_measure.py (noop sink, median-of-N + min,
sf0.001 warm-up), plus the r17 plan-audit fix: the dumped plan file
contains the FINAL plan followed by every BUILD-PHASE plan captured
pre-checkpoint (r16 verdict "What's wrong" #3 — EXPLAIN cannot see
through truncated lineage, so checkpointed pipelines' dumps showed only
`Scan ExistingRDD`).

Usage:
  python probe_r17_measure.py [--plans-dir plans/r17 --suffix _before] q1 q2 ...
  python probe_r17_measure.py --headline
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from n2kupdate_spark.plans import capture_pre_ckpt_plans, explain_str  # noqa: E402
from n2kupdate_spark.queries import QUERIES  # noqa: E402
from n2kupdate_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    names = list(args.queries)
    if args.headline:
        from bench import HEADLINE

        names = list(HEADLINE)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_sf = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="r17-measure")
    spark.sparkContext.setLogLevel("ERROR")

    if not args.no_warmup:
        for name in names:
            QUERIES[name](spark, warm_sf).write.format("noop").mode("overwrite").save()
        for name in ("dedup_incremental_resume", "dedup_semantic_resume_pq"):
            if name in names:
                QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, dict[str, float]] = {}
    for name in names:
        fn = QUERIES[name]
        samples: list[float] = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"r17-measure:{name}#{rep}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        samples.sort()
        timings[name] = {
            "median": round(samples[len(samples) // 2], 3),
            "min": round(samples[0], 3),
            "max": round(samples[-1], 3),
        }
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            with capture_pre_ckpt_plans() as captured:
                df = fn(spark, sf_dir)
            parts = [explain_str(df)]
            for i, plan in enumerate(captured):
                parts.append(
                    f"\n\n===== build-phase plan {i + 1}/{len(captured)} "
                    f"(captured pre-checkpoint) =====\n\n{plan}"
                )
            with open(
                os.path.join(args.plans_dir, f"{name}{args.suffix}.txt"), "w"
            ) as fh:
                fh.write("".join(parts))
        print(f"## {name}: median={timings[name]['median']} min={timings[name]['min']}",
              file=sys.stderr)

    total_med = round(sum(t["median"] for t in timings.values()), 3)
    total_min = round(sum(t["min"] for t in timings.values()), 3)
    print(json.dumps({"total_median": total_med, "total_min": total_min,
                      "sf": sf_dir, "reps": args.reps, "queries": timings}))


if __name__ == "__main__":
    main()
