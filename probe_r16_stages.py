"""r16 probe: per-stage profile of one query (REST scrape).

Usage: python probe_r16_stages.py <query> [sf_dir]

Runs the query once (after an sf0.001 warm-up), then prints every stage
of the run: numTasks, executorRunTime, input/shuffle bytes, name. The
point: find stages where numTasks is far below the core count while
executorRunTime dominates — the single-file-scan serialization shape
(guide §2.6 idle capacity / §6 input splits).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from n2kupdate_spark.queries import QUERIES  # noqa: E402
from n2kupdate_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(
        app_name="r16-stage-profile", extra_confs={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    QUERIES[name](spark, warm).write.format("noop").mode("overwrite").save()

    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        before = {s["stageId"] for s in json.load(r)}

    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    new = [s for s in stages if s["stageId"] not in before]
    new.sort(key=lambda s: -s.get("executorRunTime", 0))
    print(f"query={name} wall={wall:.2f}s stages={len(new)}")
    print(f"{'stage':>6} {'tasks':>5} {'runMs':>8} {'cpuMs':>8} {'inMB':>7} "
          f"{'shRdMB':>7} {'shWrMB':>7}  name")
    tot = 0
    for s in new:
        tot += s.get("executorRunTime", 0)
        print(
            f"{s['stageId']:>6} {s['numTasks']:>5} "
            f"{s.get('executorRunTime', 0):>8} "
            f"{s.get('executorCpuTime', 0) // 1_000_000:>8} "
            f"{s.get('inputBytes', 0) / 1e6:>7.1f} "
            f"{s.get('shuffleReadBytes', 0) / 1e6:>7.1f} "
            f"{s.get('shuffleWriteBytes', 0) / 1e6:>7.1f}  "
            f"{s.get('name', '')[:70]}"
        )
    print(f"total executorRunTime: {tot} ms across {len(new)} stages "
          f"(wall x32 budget = {wall * 32000:.0f} ms)")


if __name__ == "__main__":
    main()
