"""10x scale probe for the round-9 SemDeDup family.

Two measurements, both on probe_headline_10x's replica (embeddings vec_id
shifted by 10M per copy), interleaved min-of-3 so box-load drift cancels
out of the ratio:

- ``dedup_semantic_clusters`` (the registered query): centroid fit is
  bounded (sample + one Lloyd scan), assignment is a map, pair cost
  follows sum n_cluster^2 in block-pair bucketed tasks.
- ``gate_semantic`` (the pipeline composition's NEW machinery: survivor
  semi-join -> semantic dedup -> anti-join), driven with an explicit
  survivor frame of every doc that has a vector. The registered
  ``corpus_semantic_prepare`` cannot be probed end-to-end on this
  replica: its copy-prefixed tokens (``c0the``) destroy the Gopher
  stopword rule, so the text gates pass 0 docs at 10x and the semantic
  stage would measure an empty no-op (the same fixture artifact
  BASELINE.md sec.5 records for the decontamination probe - production
  gates don't token-prefix their corpus). The gate chain's own 10x
  behavior is already probed via corpus_prepare_pipeline.

Run: python probe_semantic_10x.py       Results recorded in BASELINE.md sec.5.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from probe_headline_10x import SF, X10_DIR, build_replica

from n2kupdate_spark.operators.corpus import gate_semantic
from n2kupdate_spark.queries import QUERIES
from n2kupdate_spark.session import get_spark
from n2kupdate_spark.sources import load


def _gate_semantic_run(spark, sf_dir: str) -> None:
    vecs = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "source"])
    gate_semantic(docs, vecs, n_cells=16, tau=0.3).write.format("noop").mode(
        "overwrite"
    ).save()


def main() -> None:
    spark = get_spark(app_name="probe-semantic-10x")
    spark.sparkContext.setLogLevel("ERROR")
    build_replica(spark)

    runs = {
        "dedup_semantic_clusters": lambda sf: QUERIES["dedup_semantic_clusters"](
            spark, sf
        ).write.format("noop").mode("overwrite").save(),
        "gate_semantic(all-docs)": lambda sf: _gate_semantic_run(spark, sf),
        # steady-state resume: the index build lands in rep 1 (cache miss)
        # and min-of-3 discards it, so the number is the per-batch cost
        "dedup_semantic_resume": lambda sf: QUERIES["dedup_semantic_resume"](
            spark, sf
        ).write.format("noop").mode("overwrite").save(),
    }
    for fn in runs.values():  # warm-up
        fn("/root/testdata/sf0.001")
    t1, t10 = {}, {}
    for name, fn in runs.items():
        s1, s10 = [], []
        for _ in range(3):
            for sf_dir, out in ((SF, s1), (X10_DIR, s10)):
                t0 = time.perf_counter()
                fn(sf_dir)
                out.append(time.perf_counter() - t0)
        t1[name], t10[name] = round(min(s1), 3), round(min(s10), 3)
        print(f"{name:28s} {t1[name]:7.2f}s {t10[name]:8.2f}s  "
              f"{t10[name] / t1[name]:5.2f}x")
    print(json.dumps({"sf0.1": t1, "x10": t10}))


if __name__ == "__main__":
    main()
