"""r17: targeted 10x scale probe for the r16/r17 width/hash/fit changes
(VERDICT r16 item 9 — "prove it scales"). Reuses probe_headline_10x's
bijective replica builder and protocol (median-of-3, noop sink, one warm
session), but only over the touched families: the shingle/pair pipeline,
the ts bucketed-apply family, and the r17 KN fit chain.

Run: python probe_r17_10x.py      Results recorded in BASELINE.md §5.
"""

from __future__ import annotations

import json
import time

from n2kupdate_spark.queries import QUERIES
from n2kupdate_spark.session import get_spark
from probe_headline_10x import SF, X10_DIR, build_replica

TARGETS = [
    # shingle/pair pipeline (fan_out keying, full_width pair aggregates,
    # hashed shingles — r16) + the graph consumers that ride it
    "dedup_ngram_jaccard",
    "dedup_jaccard_stop_shingles",
    "graph_domain_pagerank",
    "graph_label_propagation",
    # ts bucketed-apply family (explicit width before applyInPandas — r16)
    "ts_changepoint_cusum",
    "ts_downsample_lttb",
    "agg_tdigest_quantile_merge",
    # r17 KN one-scan fit + overlapped aggregates
    "text_perplexity_kn",
    "corpus_quality_report",
]


def main() -> None:
    spark = get_spark(app_name="probe-r17-10x")
    spark.sparkContext.setLogLevel("ERROR")
    build_replica(spark)
    for name in TARGETS:
        QUERIES[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    out = {}
    for sf_dir, key in ((SF, "sf0.1"), (X10_DIR, "x10")):
        for name in TARGETS:
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
            out.setdefault(key, {})[name] = round(sorted(samples)[1], 2)
    for name in TARGETS:
        r = out["x10"][name] / out["sf0.1"][name]
        print(f"{name:32s} {out['sf0.1'][name]:7.2f}s {out['x10'][name]:8.2f}s  {r:5.2f}x")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
