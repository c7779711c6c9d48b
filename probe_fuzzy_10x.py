"""One-off probe: MinHash-LSH near-dup detection at 10× corpus scale.

`dedup_text_fuzzy` is the 100 TB near-dup workhorse (shingle → sign →
band → bucket-join → verify). Its scale claim is that cost follows
docs × bands (signatures are one Arrow matmul per batch; candidate pairs
are generated inside LSH buckets, never all-pairs). This probe tests the
claim the way probe_q18_10x.py tests bucketing: run the full pipeline on
the sf0.1 documents table and on a 10× replica (ids shifted per copy,
EVERY token prefixed with the copy marker — a bijective remap of each
copy's shingle set, so within-copy Jaccard is preserved exactly and
cross-copy shingle sets are disjoint). The 10× corpus therefore carries
exactly 10× the near-dup pairs (asserted), and the wall-clock ratio
isolates pure data scale-up: well under 10× on 32 cores means fixed
overheads amortize and nothing quadratic is hiding in the banding.

A first cut that salted only ONE leading token left copies ≥50%-similar:
the true pair count exploded ~1000× (250,600 pairs) while wall-clock grew
only 4.8× — worth keeping as a measured worst-case-density data point:
verify cost follows REAL pair density, and even a thousand-fold pair
blow-up did not produce a thousand-fold runtime.

Run: python probe_fuzzy_10x.py     Results recorded in BASELINE.md §5.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from n2kupdate_spark.operators.dedup import minhash_dedup_pairs
from n2kupdate_spark.session import get_spark
from n2kupdate_spark.sources import load

SF = "/root/testdata/sf0.1"
COPIES = 10
SHIFT = 10_000_000


def replicate_docs(docs: DataFrame) -> DataFrame:
    """10 shifted copies, every token prefixed with the copy marker: a
    bijective remap of each copy's shingle universe — within-copy Jaccard
    values are EXACTLY the original's, cross-copy shingle sets are
    disjoint (no cross-copy candidates even at the banding layer)."""
    marked = F.regexp_replace(
        F.col("text"), r"(\S+)", F.concat(F.lit("c"), F.col("__i").cast("string"), F.lit(r"$1"))
    )
    return (
        docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))).alias("__i"),
            "doc_id", "text",
        )
        .select(
            (F.col("doc_id") + F.col("__i") * F.lit(SHIFT)).alias("doc_id"),
            marked.alias("text"),
        )
    )


def run(docs: DataFrame) -> tuple[float, int]:
    t0 = time.time()
    n = minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5).count()
    return time.time() - t0, n


def main() -> None:
    spark = get_spark(app_name="probe-fuzzy-10x")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, SF, "documents").select("doc_id", "text")

    run(docs)  # warm JVM/codegen once so 1× isn't charged the startup
    t1, n1 = run(docs)
    big = replicate_docs(docs).localCheckpoint(eager=True)
    n_docs = big.count()
    t10, n10 = run(big)
    print(f"1x : docs={docs.count():>6}  pairs={n1:>6}  {t1:6.2f}s")
    print(f"10x: docs={n_docs:>6}  pairs={n10:>6}  {t10:6.2f}s")
    assert n10 == COPIES * n1, (n1, n10)  # disjoint copies: exactly 10x pairs
    print(f"wall-clock ratio at 10x data: {t10 / t1:.2f}x (linear would be ~10x)")


if __name__ == "__main__":
    main()
