"""Block-pair decomposition of pairwise_cosine_by_group (VERDICT r3 #2).

The scale fix salts each label group into nb = ceil(n_g / block_rows)
buckets and scores every unordered bucket pair as its own bounded
applyInPandas task. These tests prove the decomposition is *invisible* to
callers: for any block_rows the emitted pair set is identical to the
single-batch plan, so the existing DuckDB oracles keep hash-matching.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from n2kupdate_spark.operators.similarity import pairwise_cosine_by_group
from n2kupdate_spark.sources import load


def _pair_set(df):
    return {
        (r["label"], r["id1"], r["id2"], round(r["cos_sim"], 4))
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def labeled(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        (F.col("vec_id") % 5).cast("int").alias("label"),
        F.col("embedding").alias("v"),
    )
    e.localCheckpoint()  # stable input across both plans
    return e


def test_block_pairs_equal_single_batch(labeled):
    # block_rows larger than any group → nb=1 → the old one-task-per-group
    # plan; block_rows=7 forces every sf0.001 group into many bucket pairs.
    single = _pair_set(
        pairwise_cosine_by_group(labeled, "label", "vec_id", "v", tau=0.25,
                                 block_rows=1_000_000)
    )
    blocked = _pair_set(
        pairwise_cosine_by_group(labeled, "label", "vec_id", "v", tau=0.25,
                                 block_rows=7)
    )
    assert single, "fixture produced no pairs — tau too high for testdata"
    assert blocked == single


def test_block_pairs_no_duplicate_pairs(labeled):
    out = pairwise_cosine_by_group(
        labeled, "label", "vec_id", "v", tau=0.25, block_rows=7
    )
    total = out.count()
    distinct = out.select("label", "id1", "id2").distinct().count()
    assert total == distinct, "a pair was emitted by more than one block task"


def test_block_pairs_matmul_chunking_orthogonal(labeled):
    # the row-chunk (`block`) must not interact with the bucket salt
    a = _pair_set(
        pairwise_cosine_by_group(labeled, "label", "vec_id", "v", tau=0.25,
                                 block=3, block_rows=7)
    )
    b = _pair_set(
        pairwise_cosine_by_group(labeled, "label", "vec_id", "v", tau=0.25,
                                 block=2048, block_rows=1_000_000)
    )
    assert a == b


def test_brute_topk_q_chunk_equals_unchunked(spark, sf_dir):
    """q_chunk bounds the closure size for large query sets by scoring the
    vector table once per chunk; per-query results depend only on that
    query's own scores, so the chunked union must equal the unchunked
    result EXACTLY after final ranking (VERDICT r5 item 6)."""
    from pyspark.sql import Window

    from n2kupdate_spark.operators.similarity import brute_topk_matmul

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = e.filter(F.col("vec_id") % 50 == 0).orderBy("vec_id").limit(40).collect()

    def ranked(cand):
        w = Window.partitionBy("q_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id").asc()
        )
        return sorted(
            map(
                tuple,
                cand.select(
                    "q_id", "neighbor_id", "cos_sim",
                    F.row_number().over(w).alias("rn"),
                ).filter(F.col("rn") <= 10).collect(),
            )
        )

    plain = ranked(brute_topk_matmul(e, queries, "vec_id", "v", k=10))
    # chunk size 7 forces 6 chunks with a ragged tail; q_chunk larger than
    # Q must be a no-op pass-through
    chunked = ranked(brute_topk_matmul(e, queries, "vec_id", "v", k=10, q_chunk=7))
    nop = ranked(brute_topk_matmul(e, queries, "vec_id", "v", k=10, q_chunk=4096))
    assert chunked == plain
    assert nop == plain


def test_incremental_jaccard_equals_filtered_full_run(spark, sf_dir):
    """The incremental op must be invisible semantics-wise: its output ==
    the FULL capped-Jaccard run filtered to pairs touching a new doc, with
    identical Jaccard values (df cap and set sizes computed over the full
    universe in both)."""
    from n2kupdate_spark.operators.dedup import (
        shingle_jaccard_pairs_capped,
        shingle_jaccard_pairs_capped_incremental,
        word_shingles,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("doc_id") % 10 == 0).alias("is_new")
    )
    sh = word_shingles(docs, "text").localCheckpoint(eager=True)

    full = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in shingle_jaccard_pairs_capped(sh, "doc_id", 0.1, 5).collect()
        if r["id1"] % 10 == 0 or r["id2"] % 10 == 0
    }
    inc = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in shingle_jaccard_pairs_capped_incremental(
            sh, "is_new", "doc_id", 0.1, 5
        ).collect()
    }
    assert inc == full


def test_resume_from_persisted_index_equals_incremental(spark, sf_dir, tmp_path):
    """The persisted-index path must be invisible semantics-wise: persisting
    the corpus index and resuming with only the batch's shingles yields the
    EXACT pair set + Jaccards of the one-shot incremental op over the full
    universe (df cap and sizes re-derived from the rolled-up index)."""
    from n2kupdate_spark.operators.dedup import (
        persist_shingle_index,
        shingle_jaccard_pairs_capped_incremental,
        shingle_jaccard_pairs_capped_resume,
        word_shingles,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("doc_id") % 10 == 0).alias("is_new")
    )
    sh = word_shingles(docs, "text").localCheckpoint(eager=True)
    idx = str(tmp_path / "idx")
    persist_shingle_index(sh.filter(~F.col("is_new")), idx, "doc_id", max_df=5)

    resumed = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in shingle_jaccard_pairs_capped_resume(
            sh.filter("is_new"), idx, "doc_id", 0.1, 5
        ).collect()
    }
    inc = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in shingle_jaccard_pairs_capped_incremental(
            sh, "is_new", "doc_id", 0.1, 5
        ).collect()
    }
    assert resumed == inc
    assert resumed, "fixture produced no near-dup pairs — test is vacuous"


def test_chained_resume_rolls_index_forward(spark, sf_dir, tmp_path):
    """update_index_path must hand the NEXT increment an index equivalent to
    a fresh full-corpus build: postings (bucket→member set), the stoplist
    bucket set, and per-doc sizes all match, and a second batch resumed off
    the rolled index equals the one-shot incremental over the grown
    universe. Since r8 the roll-forward is IN-PLACE (same root, manifest
    version v+1) and prior versions stay pinned-readable."""
    from n2kupdate_spark.operators.dedup import (
        _load_index,
        index_versions,
        persist_shingle_index,
        shingle_jaccard_pairs_capped_incremental,
        shingle_jaccard_pairs_capped_resume,
        word_shingles,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("doc_id") % 4).alias("part")
    )
    sh = word_shingles(docs, "text").localCheckpoint(eager=True)
    base, b1, b2 = (
        sh.filter(F.col("part") <= 1),
        sh.filter(F.col("part") == 2),
        sh.filter(F.col("part") == 3),
    )
    idx = str(tmp_path / "i0")
    assert persist_shingle_index(base, idx, "doc_id", max_df=5) == 1
    # roll forward IN-PLACE: same root, committed as version 2
    shingle_jaccard_pairs_capped_resume(
        b1, idx, "doc_id", 0.1, 5, update_index_path=idx
    ).collect()
    assert index_versions(spark, idx) == [1, 2]

    fresh = str(tmp_path / "fresh")
    persist_shingle_index(base.unionByName(b1), fresh, "doc_id", max_df=5)

    def maps(path, version=None):
        _, postings, stop, sizes = _load_index(spark, path, version)
        return (
            {
                r["bucket"]: tuple(sorted(r["members"]))
                for r in postings.collect()
            },
            # stoplist df values are not compared: the rolled stoplist
            # keeps the count as of when the bucket crossed (later drops
            # don't increment it) — membership in the drop set is what
            # the algorithm consumes.
            {r["bucket"] for r in stop.collect()},
            {r["doc_id"]: r["n"] for r in sizes.collect()},
        )

    assert maps(idx) == maps(fresh)
    # the pre-roll version stays pinned-readable and equals a fresh
    # base-only build
    base_only = str(tmp_path / "b0")
    persist_shingle_index(base, base_only, "doc_id", max_df=5)
    assert maps(idx, version=1) == maps(base_only)

    chained = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in shingle_jaccard_pairs_capped_resume(
            b2, idx, "doc_id", 0.1, 5
        ).collect()
    }
    inc = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in shingle_jaccard_pairs_capped_incremental(
            sh.withColumn("is_new", F.col("part") == 3), "is_new", "doc_id", 0.1, 5
        ).collect()
    }
    assert chained == inc


def test_torn_index_rollforward_is_invisible(spark, sf_dir, tmp_path):
    """A roll-forward killed between table writes and the marker commit
    must leave the prior version fully readable and never poison later
    publishes: torn v-dirs are absent from index_versions, resume reads
    the committed version, and the next publish SKIPS the torn version
    number instead of writing into half-written directories."""
    from n2kupdate_spark.operators.dedup import (
        index_versions,
        persist_shingle_index,
        shingle_jaccard_pairs_capped_incremental,
        shingle_jaccard_pairs_capped_resume,
        word_shingles,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("doc_id") % 10 == 0).alias("is_new")
    )
    sh = word_shingles(docs, "text").localCheckpoint(eager=True)
    idx = str(tmp_path / "idx")
    persist_shingle_index(sh.filter(~F.col("is_new")), idx, "doc_id", max_df=5)

    # simulate the kill: a v2 postings dir exists (even manifest-published
    # per-table), but the root marker never landed
    spark.range(5).write.parquet(f"{idx}/postings/v0000000002")
    from n2kupdate_spark.sources.maintenance import publish_manifest

    publish_manifest(spark, f"{idx}/postings/v0000000002", version=1)
    assert index_versions(spark, idx) == [1]

    resumed = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in shingle_jaccard_pairs_capped_resume(
            sh.filter("is_new"), idx, "doc_id", 0.1, 5, update_index_path=idx
        ).collect()
    }
    inc = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in shingle_jaccard_pairs_capped_incremental(
            sh, "is_new", "doc_id", 0.1, 5
        ).collect()
    }
    assert resumed == inc and resumed
    # the retry committed PAST the torn number
    assert index_versions(spark, idx) == [1, 3]


@pytest.mark.parametrize("block_rows", [3, 7, 4096])
def test_cross_cosine_by_group_exact_vs_numpy(spark, block_rows):
    """cross_cosine_by_group (the semantic resume's batch-vs-corpus
    scorer) must emit EXACTLY the numpy-computed (probe, base) pair set
    at every bucket decomposition: block_rows=3/7 force multi-bucket
    salting with probe replication, 4096 keeps one bucket per group —
    all three must agree with brute force and with each other, including
    groups with no base rows (no pairs) and no probe rows."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.similarity import cross_cosine_by_group

    rng = np.random.RandomState(7)
    n, dim, tau = 120, 8, 0.5
    V = rng.normal(size=(n, dim))
    V[40:60] = V[0:20] + rng.normal(scale=0.05, size=(20, dim))  # true pairs
    groups = rng.randint(0, 5, size=n)
    side = rng.rand(n) < 0.4  # ~40% probe
    side[groups == 3] = True   # group 3: probe-only (no base rows)
    side[groups == 4] = False  # group 4: base-only (no probe rows)

    rows = [
        (int(i), int(groups[i]), [float(x) for x in V[i]], bool(side[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id long, g int, v array<double>, p boolean")
    probe, base = df.filter("p").drop("p"), df.filter("NOT p").drop("p")

    got = {
        (r["probe_id"], r["base_id"]): r["cos_sim"]
        for r in cross_cosine_by_group(
            probe, base, "g", "vec_id", "v", tau=tau, block_rows=block_rows
        ).collect()
    }

    U = V / np.linalg.norm(V, axis=1)[:, None]
    S = np.round(U @ U.T, 4) + 0.0
    want = {
        (i, j): float(S[i, j])
        for i in range(n) if side[i]
        for j in range(n) if not side[j]
        if groups[i] == groups[j] and S[i, j] >= tau
    }
    assert set(got) == set(want), (
        block_rows, len(got), len(want),
        list(set(got) ^ set(want))[:5],
    )
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9
    assert want, "fixture must produce true cross pairs"


def test_hashed_shingles_equal_string_shingles(spark, sf_dir):
    """word_shingles(hashed=True) must be invisible to the pair
    generators: per-doc distinct counts match the string form, and the
    exact-Jaccard pair set (ids + 4dp values) is identical — the long
    hash is a pure re-encoding of the gram for consumers that only
    bucket and count (r16 optimization)."""
    from n2kupdate_spark.operators.dedup import (
        shingle_jaccard_pairs,
        word_shingles,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    sh_s = word_shingles(docs, "text")
    sh_h = word_shingles(docs, "text", hashed=True)

    counts_s = {r["doc_id"]: r["n"] for r in
                sh_s.select("doc_id", F.size("shingles").alias("n")).collect()}
    counts_h = {r["doc_id"]: r["n"] for r in
                sh_h.select("doc_id", F.size("shingles").alias("n")).collect()}
    assert counts_h == counts_s

    pairs_s = {(r["id1"], r["id2"], r["jaccard"]) for r in
               shingle_jaccard_pairs(sh_s, "doc_id", threshold=0.1).collect()}
    pairs_h = {(r["id1"], r["id2"], r["jaccard"]) for r in
               shingle_jaccard_pairs(sh_h, "doc_id", threshold=0.1).collect()}
    assert pairs_h == pairs_s
