"""Probe: persisted-index resume vs one-shot incremental at sf0.1.

The recurring-ingest question (judge r6 item 3): run-1 persists the corpus
shingle index; every later run shingles ONLY the incoming batch (5% here)
and resumes from the index. The one-shot incremental op answers the same
question but re-shingles the full corpus each batch — its cost is corpus-
sized forever. Prints wall-clock for both, the build cost, and asserts the
pair sets are identical.
"""

from __future__ import annotations

import shutil
import tempfile
import time

from pyspark.sql import functions as F

from n2kupdate_spark.operators.dedup import (
    persist_shingle_index,
    shingle_jaccard_pairs_capped_incremental,
    shingle_jaccard_pairs_capped_resume,
    word_shingles,
)
from n2kupdate_spark.session import get_spark
from n2kupdate_spark.sources import load

SF = "/root/testdata/sf0.1"

spark = get_spark(app_name="probe-incremental-resume", shuffle_partitions=32)
docs = load(spark, SF, "documents").select(
    "doc_id", "text", (F.col("doc_id") % 20 == 0).alias("is_new")
)

t0 = time.time()
full = shingle_jaccard_pairs_capped_incremental(
    word_shingles(docs, "text"), "is_new", "doc_id", 0.1, 5
)
full_pairs = {(r["id1"], r["id2"], r["jaccard"]) for r in full.collect()}
t_full = time.time() - t0

idx = tempfile.mkdtemp(prefix="n2k_idx_probe_")
try:
    t0 = time.time()
    persist_shingle_index(
        word_shingles(docs.filter(~F.col("is_new")), "text"), idx, "doc_id", max_df=5
    )
    t_build = time.time() - t0

    t0 = time.time()
    res = shingle_jaccard_pairs_capped_resume(
        word_shingles(docs.filter("is_new"), "text"), idx, "doc_id", 0.1, 5
    )
    res_pairs = {(r["id1"], r["id2"], r["jaccard"]) for r in res.collect()}
    t_res = time.time() - t0
finally:
    shutil.rmtree(idx, ignore_errors=True)

assert res_pairs == full_pairs, (
    f"pair sets diverge: {len(res_pairs)} vs {len(full_pairs)}"
)
print(
    f"pairs={len(full_pairs)} one-shot incremental={t_full:.2f}s "
    f"index build (one-time)={t_build:.2f}s resume={t_res:.2f}s "
    f"resume/incremental={t_res / t_full:.2f}x"
)
