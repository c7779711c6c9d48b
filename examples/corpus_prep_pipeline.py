"""Worked example: end-to-end training-corpus preparation on this engine.

Composes the LLM-data-pipeline surface (SURVEY.md §2 Part C/D) into the
standard corpus-prep flow a training-data team runs before tokenization:

  1. quality gate       — length/stopword/lexical-diversity features
                          (text_quality_score internals)
  2. exact dedup        — md5 content fingerprint, keep lowest doc_id
  3. near-dup dedup     — capped shingle Jaccard pairs → connected
                          components → keep cluster representative
  4. leakage-safe split — deterministic md5-bucket train/valid/test
  5. write + compact    — lang-partitioned parquet, then small-file
                          compaction of the train split

Every stage is the registered operator the oracle gate checks; this file
just chains them the way a user would. Run:

    python examples/corpus_prep_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from n2kupdate_spark.operators.dedup import (  # noqa: E402
    connected_components_auto,
    shingle_jaccard_pairs_capped,
    word_shingles,
)
from n2kupdate_spark.session import get_spark  # noqa: E402
from n2kupdate_spark.sources import compact_parquet, dir_stats, load  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="n2k_corpus_")
    spark = get_spark(app_name="corpus-prep")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, sf, "documents")
    n0 = docs.count()

    # 1. quality gate: cheap map-side features, no shuffle
    toks = F.split(F.col("text"), " ")
    gated = (
        docs.withColumn("n_tokens", F.size(toks))
        .withColumn("n_distinct", F.size(F.array_distinct(toks)))
        .filter(
            (F.col("n_chars") >= 100)
            & (F.col("n_tokens") >= 20)
            & (F.col("n_distinct") / F.col("n_tokens") >= 0.3)  # lexical diversity
        )
        .drop("n_tokens", "n_distinct")
    )
    n1 = gated.count()

    # 2. exact dedup: one fingerprint shuffle, keep lowest doc_id per hash
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact = gated.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")
    n2 = exact.count()

    # 3. near-dup clusters: capped Jaccard pairs -> CC -> keep min doc_id.
    #    The CC dispatcher probes hub degree itself; edges are bucketed,
    #    never all-pairs (operators/dedup.py).
    sh = word_shingles(exact.select("doc_id", "text"))
    pairs = shingle_jaccard_pairs_capped(sh, "doc_id", threshold=0.5, max_df=5)
    nodes = exact.select(F.col("doc_id").alias("id"))
    comp = connected_components_auto(nodes, pairs, id_col="id")
    keep = comp.groupBy("cluster_id").agg(F.min("id").alias("doc_id"))
    survivors = exact.join(keep.select("doc_id"), "doc_id", "left_semi")
    n3 = survivors.count()

    # 4. deterministic split: md5 bucket of doc_id -> 80/10/10; stable
    #    under reruns and partitioning (sample_hash_split's convention)
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
                    ).cast("long") % 100
    split = survivors.withColumn(
        "split",
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test"),
    )

    # 5. write lang-partitioned, compact the train split
    raw = f"{out}/corpus"
    split.write.partitionBy("split", "lang").mode("overwrite").parquet(raw)
    train_dir = f"{raw}/split=train"
    before = dir_stats(spark, train_dir)
    stats = compact_parquet(spark, train_dir, f"{out}/train_compacted", target_mb=128)

    splits = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    print(f"input docs        : {n0}")
    print(f"after quality gate: {n1}  (-{n0 - n1})")
    print(f"after exact dedup : {n2}  (-{n1 - n2})")
    print(f"after near-dedup  : {n3}  (-{n2 - n3})")
    print(f"splits            : {splits}")
    print(f"train files       : {before['files']} -> {stats['after']['files']}")
    print(f"output            : {out}")

    # 6. (round 7) the parameterized gate library, end to end: Gopher
    #    quality rules, n-gram decontamination against an eval table with
    #    an overlap budget, exact dedup, mixture weighting, and 512-token
    #    sequence packing — one call, every knob an argument. Swap the
    #    demo eval slice for your benchmark table in production.
    from n2kupdate_spark.operators.corpus import prepare_corpus

    is_eval = F.col("doc_id") % 97 == 0
    summary = prepare_corpus(
        docs.select("doc_id", "source", "text").filter(~is_eval),
        eval_docs=docs.select("doc_id", "source", "text").filter(is_eval),
        weights={"src0": 2.0, "src1": 1.0, "src2": 0.5},
        default_weight=0.25,
        decontam_budget=5,
        seq_budget=512,
    )
    agg = summary.agg(
        F.sum("n_docs").alias("docs"),
        F.sum("n_rows").alias("rows"),
        F.sum("total_tokens").alias("tokens"),
        F.sum("n_sequences").alias("seqs"),
    ).first()
    print(
        f"prepare_corpus    : {agg['docs']} docs -> {agg['rows']} mixture rows "
        f"-> {agg['seqs']} packed 512-token sequences ({agg['tokens']} tokens)"
    )


if __name__ == "__main__":
    main()
