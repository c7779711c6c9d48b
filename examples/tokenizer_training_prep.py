"""Worked example: from raw corpus to shuffled, token-budgeted training
shards — the tokenizer-aware back half of corpus preparation.

Composes the r9 tokenizer/shuffle surface on top of the gate chain the
sibling example (corpus_prep_pipeline.py) covers:

  1. normalize    — dedup-grade canonical text (pure codegen;
                    operators/corpus.py::normalize_text)
  2. learn BPE    — one word-type count shuffle + bounded driver merge
                    loop (operators/tokenizer.py::learn_bpe_merges)
  3. encode       — broadcast merge ranks, map-only Arrow encode with a
                    per-batch word cache (bpe_encode); n_bpe_tokens is
                    the REAL sequence-budget unit (the whitespace proxy
                    undercounts rare-word cost)
  4. pack         — concat-then-chunk packing driven by the LEARNED
                    token counts (operators/corpus.py::pack_sequences)
  5. shuffle      — content-addressed shard + key stamping, written as
                    per-shard parquet with in-file key order
                    (shuffle_shards / write_shuffled_shards); re-run
                    with a different seed for a fresh epoch permutation

Scale shape at every step is a map or a bounded collect except the two
deliberate shuffles (word-type count; per-source packing window) — the
same plan at 100 TB, just wider.

    python examples/tokenizer_training_prep.py [sf_dir]   # default sf0.01
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from n2kupdate_spark.operators.corpus import (  # noqa: E402
    normalize_text,
    pack_sequences,
    shuffle_shards,
    write_shuffled_shards,
)
from n2kupdate_spark.operators.tokenizer import (  # noqa: E402
    bpe_encode,
    learn_bpe_merges,
    learn_unigram_vocab,
    learn_wordpiece_vocab,
    unigram_encode,
    wordpiece_encode,
)
from n2kupdate_spark.session import get_spark  # noqa: E402
from n2kupdate_spark.sources import load  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="n2k_tok_")
    spark = get_spark(app_name="tokenizer-training-prep")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, sf, "documents", columns=["doc_id", "source", "text"])

    # 1. canonical text (the fixture is born-normalized; real corpora are
    #    not — the column is free either way)
    norm = normalize_text(docs).drop("text").withColumnRenamed(
        "norm_text", "text"
    )

    # 2a. family bake-off (r12): all three published learners share the
    #     same bounded type-table fit, so comparing fertility before
    #     committing to a vocabulary costs three cheap fits + map encodes
    merges = learn_bpe_merges(norm, num_merges=200)
    ug = learn_unigram_vocab(norm, vocab_size=40)
    wp = learn_wordpiece_vocab(norm, num_merges=200)
    for fam, enc_df, col in (
        ("bpe", bpe_encode(norm, merges), "n_bpe_tokens"),
        ("unigram", unigram_encode(norm, ug), "n_ug_tokens"),
        ("wordpiece", wordpiece_encode(norm, wp), "n_wp_tokens"),
    ):
        t = enc_df.agg(F.sum(col)).collect()[0][0]
        print(f"  {fam:9s}: {t} corpus tokens")

    # 2b-3. commit to BPE for the rest of the pipeline, encode with it
    enc = bpe_encode(norm, merges, carry_cols=("source",))
    fertility = enc.agg(
        (F.sum("n_bpe_tokens") / F.count(F.lit(1))).alias("tok_per_doc")
    ).collect()[0]["tok_per_doc"]
    print(f"learned {len(merges)} merges; avg {fertility:.1f} bpe tokens/doc")

    # 4. pack fixed-context sequences on the LEARNED counts
    packed = pack_sequences(
        enc.select("doc_id", "source", F.col("n_bpe_tokens").alias("n_tokens")),
        budget=512,
        group_col="source",
        order_cols=("doc_id",),
        token_col="n_tokens",
    )
    n_seqs = packed.agg(
        F.countDistinct("source", "seq_id").alias("n")
    ).collect()[0]["n"]
    print(f"packed into {n_seqs} sequences of 512 bpe tokens")

    # 5. deterministic global shuffle, materialized; epoch 2 would pass
    #    seed="epoch2" for a fresh reproducible permutation
    write_shuffled_shards(packed, out, n_shards=8, seed="epoch1")
    sizes = (
        shuffle_shards(packed, 8, seed="epoch1")
        .groupBy("shard")
        .count()
        .orderBy("shard")
        .collect()
    )
    print("shard sizes:", [r["count"] for r in sizes])
    print(f"shards written under {out}/shard=*/")


if __name__ == "__main__":
    main()
