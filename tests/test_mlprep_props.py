"""Distribution-level properties of the round-7 training-data gates, on
synthetic frames larger and more adversarial than the fixtures: the parity
oracle pins exact values on testdata; these pin the CONTRACTS — mixture
rates converge to the weights, packing layouts tile exactly."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_mixture_realized_rates_converge_to_weights(spark):
    """Over 20k synthetic docs per source, the realized copy rate of each
    source must sit within 3% of its weight — the md5 bucket is uniform,
    so floor(w) + fractional-bucket realizes the weight in expectation,
    and determinism means this is a fixed number, not a flaky sample."""
    from n2kupdate_spark.queries.mlprep import _MIX_DEFAULT_W4, _MIX_W4

    n = 20_000
    docs = spark.range(n * 4).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    docs.createOrReplaceTempView("mixprop_docs")
    # 8 hex chars, matching the op: a 16-bit bucket mod 10000 is biased
    # (2^16 % 10000 = 5536 → weight 0.5 realized as 53.8%); this test is
    # what caught it.
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10000
    )
    w4 = F.lit(_MIX_DEFAULT_W4)
    for s, w in _MIX_W4.items():
        w4 = F.when(F.col("source") == s, F.lit(w)).otherwise(w4)
    n_copies = F.floor(w4 / 10000).cast("int") + F.when(
        bucket < w4 % 10000, 1
    ).otherwise(0)
    realized = {
        r["source"]: r["copies"] / n
        for r in docs.select("source", n_copies.alias("c"))
        .groupBy("source")
        .agg(F.sum("c").alias("copies"))
        .collect()
    }
    for src, got in realized.items():
        want = _MIX_W4.get(src, _MIX_DEFAULT_W4) / 10000
        assert abs(got - want) <= 0.03, (src, got, want)


def test_pack_sequences_layout_tiles_exactly(spark, sf_dir):
    """Recompute the packing layout in pandas from the op's own inputs and
    require exact agreement, plus the tiling invariants a packing writer
    depends on: within a source, seq_id is nondecreasing in doc order,
    offsets live in [0, 512), and every offset equals the running total
    mod 512 — i.e. the docs tile the concatenated token stream with no
    gaps and no overlaps."""
    from n2kupdate_spark.queries import QUERIES

    pdf = (
        QUERIES["pack_sequences_greedy"](spark, sf_dir)
        .toPandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    assert len(pdf) > 0
    for source, grp in pdf.groupby("source"):
        cum = 0
        last_seq = -1
        for row in grp.itertuples(index=False):
            assert row.seq_id == cum // 512, (source, row)
            assert row.seq_offset == cum % 512, (source, row)
            assert row.seq_id >= last_seq, (source, row)
            last_seq = row.seq_id
            cum += row.n_tokens


def test_prepare_corpus_parameters_are_live(spark, sf_dir):
    """The library API must actually honor its parameters (the registered
    query pins only the demo constants): halving the sequence budget
    cannot decrease any source's packed-sequence count, and an
    overlap budget of 0 (drop ANY shared gram) keeps at most as many docs
    as the default budget."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.corpus import prepare_corpus
    from n2kupdate_spark.sources import load

    d = load(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    is_eval = F.col("doc_id") % 97 == 0
    kw = dict(
        eval_docs=d.filter(is_eval),
        weights={"src0": 2.0, "src1": 1.0, "src2": 0.5},
        default_weight=0.25,
    )
    base = {r["source"]: r for r in prepare_corpus(d.filter(~is_eval), **kw).collect()}
    small = {
        r["source"]: r
        for r in prepare_corpus(d.filter(~is_eval), seq_budget=64, **kw).collect()
    }
    assert base and set(small) == set(base)
    for src in base:
        assert small[src]["n_sequences"] >= base[src]["n_sequences"], src
        assert small[src]["n_rows"] == base[src]["n_rows"], src  # budget ⟂ survivors

    strict = {
        r["source"]: r["n_docs"]
        for r in prepare_corpus(d.filter(~is_eval), decontam_budget=1, **kw).collect()
    }
    for src, n_docs in strict.items():
        assert n_docs <= base[src]["n_docs"], src


def test_prepare_corpus_counts_straddled_sequences(spark):
    """n_sequences is ceil(total_tokens / budget), not max(seq_id)+1: a
    row straddling a budget boundary covers sequences it never STARTS in.
    Two docs of [10, 600] tokens at budget 512 concat to 610 tokens → 2
    sequences, though both rows start inside sequence 0 (advisor r7
    finding: the old max(seq_id)+1 reported 1, and the oracle encoded the
    same formula so the parity gate couldn't see it)."""
    from n2kupdate_spark.operators.corpus import prepare_corpus

    docs = spark.createDataFrame(
        [(1, "s", "w " * 10), (2, "s", "w " * 600)],
        ["doc_id", "source", "text"],
    ).select("doc_id", "source", F.trim("text").alias("text"))
    out = prepare_corpus(
        docs,
        eval_docs=docs.limit(0),
        weights={},
        default_weight=1.0,
        # texts share no 3-grams with an empty eval set; gopher off via
        # permissive thresholds so both docs survive to packing
        gopher_kwargs=dict(
            min_words=1,
            max_words=10**6,
            min_mean_word_len=0.0,
            max_mean_word_len=100.0,
            min_stop_hits=0,
            max_top_bigram_frac=1.0,
        ),
        seq_budget=512,
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row["total_tokens"] == 610
    assert row["n_sequences"] == 2, row


def test_pack_sequences_subsharded_equals_single_window(spark):
    """shards>1 must be a pure parallelism knob: range-sharding at
    approx-quantile cuts + per-shard cumsum + exact base offsets
    reconstructs the one-window prefix sum EXACTLY, for every cut
    placement — on an adversarial frame (one source holding ~70% of the
    rows, heavy duplicate doc_ids so cut points land ON repeated keys,
    and a secondary order column doing the tie-breaking)."""
    from n2kupdate_spark.operators.corpus import pack_sequences

    rows = []
    for i in range(4000):
        # hot source: doc_id collides every 10 rows → cuts hit ties
        rows.append((i // 10, i % 10, "hot", 7 + (i * 13) % 91))
    for i in range(1200):
        rows.append((i, 0, f"cold{i % 5}", 3 + (i * 7) % 50))
    df = spark.createDataFrame(
        rows, ["doc_id", "copy_n", "source", "n_tokens"]
    ).repartition(16)

    kw = dict(
        budget=512,
        group_col="source",
        order_cols=("doc_id", "copy_n"),
        token_col="n_tokens",
    )
    key = ["source", "doc_id", "copy_n"]
    base = pack_sequences(df, **kw).toPandas().sort_values(key).reset_index(drop=True)
    for shards in (2, 7, 32):
        sub = (
            pack_sequences(df, shards=shards, **kw)
            .toPandas()
            .sort_values(key)
            .reset_index(drop=True)
        )
        assert list(sub.columns) == list(base.columns), shards
        assert (sub.values == base.values).all(), f"shards={shards} diverged"


def test_reservoir_prefilter_equals_plain_window(spark):
    """The hash-prefix pre-filter must be a pure cost knob: at any factor
    — including an adversarial 0.5 where E[survivors] = k/2 forces mass
    fallback — the output equals the plain one-window reservoir, on a
    frame mixing a hot key (50k rows), mid keys, and keys SMALLER than k
    (every row kept, rk dense)."""
    from n2kupdate_spark.operators.corpus import reservoir_per_key

    rows = [(i, "hot") for i in range(50_000)]
    rows += [(100_000 + i, f"mid{i % 7}") for i in range(2_100)]
    rows += [(200_000 + i, "tiny") for i in range(5)]  # < k rows
    df = spark.createDataFrame(rows, ["doc_id", "source"]).repartition(16)

    key = ["source", "rk"]
    plain = (
        reservoir_per_key(df, "source", "doc_id", k=20, prefilter_factor=None)
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    assert (plain[plain.source == "tiny"].rk.values == [1, 2, 3, 4, 5]).all()
    for factor in (8.0, 0.5):
        fast = (
            reservoir_per_key(df, "source", "doc_id", k=20, prefilter_factor=factor)
            .toPandas().sort_values(key).reset_index(drop=True)
        )
        assert (fast.values == plain.values).all(), f"factor={factor} diverged"


def test_reservoir_is_mergeable_bottom_k(spark):
    """The content-addressed reservoir is a MERGEABLE bottom-k sketch —
    the property that makes it a 100 TB rollup: the reservoir of a UNION
    equals the reservoir of the two sides' reservoirs merged (so
    per-shard/per-day samples combine upward without rescanning raw
    data), and adding rows never changes survivors except by displacing
    the highest hashes."""
    from n2kupdate_spark.operators.corpus import reservoir_per_key

    a = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(0, 3000, 2)], ["doc_id", "source"]
    )
    b = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(1, 3000, 2)], ["doc_id", "source"]
    )

    def res(df):
        return reservoir_per_key(df, "source", "doc_id", k=20, prefilter_factor=None)

    direct = res(a.unionByName(b)).toPandas()
    merged = res(
        res(a).select("doc_id", "source").unionByName(
            res(b).select("doc_id", "source")
        )
    ).toPandas()
    key = ["source", "rk"]
    direct = direct.sort_values(key).reset_index(drop=True)
    merged = merged.sort_values(key).reset_index(drop=True)
    assert (direct.values == merged.values).all()


def test_sample_mixture_temperature_pinned(spark, sf_dir):
    """Value pin for the rows-only sample_mixture_temperature op: the
    per-language copy factors must equal the α=0.3 temperature formula
    ((n^α/Σn^α)/(n/Σn)) computed independently, and the realized row
    counts must equal a python recompute of the md5-bucket copy rule for
    every doc — the dominant language's factor < 1 (true down-sampling)
    and every tail language's > 1."""
    import hashlib

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    got = {
        r["lang"]: (r["n_docs"], r["n_rows"], r["copy_factor"])
        for r in QUERIES["sample_mixture_temperature"](spark, sf_dir).collect()
    }
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "lang"]).collect()
    counts: dict[str, int] = {}
    for r in docs:
        counts[r["lang"]] = counts.get(r["lang"], 0) + 1
    total = sum(counts.values())
    ptot = sum(n ** 0.3 for n in counts.values())
    factors = {
        s: (n ** 0.3 / ptot) / (n / total) for s, n in counts.items()
    }
    dominant = max(counts, key=counts.get)
    assert factors[dominant] < 1 < min(
        f for s, f in factors.items() if s != dominant
    )
    want: dict[str, list] = {s: [0, 0] for s in counts}
    for r in docs:
        w4 = int(round(factors[r["lang"]] * 10000))
        bucket = (
            int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16) % 10000
        )
        copies = w4 // 10000 + (1 if bucket < w4 % 10000 else 0)
        if copies > 0:
            want[r["lang"]][0] += 1
            want[r["lang"]][1] += copies
    for s in counts:
        assert got[s][0] == want[s][0] and got[s][1] == want[s][1], (s, got[s], want[s])
        assert abs(got[s][2] - round(factors[s], 4)) < 1e-9
    # tempered corpus stays ~input-sized (the rule's defining property)
    realized = sum(v[1] for v in got.values())
    assert 0.9 <= realized / total <= 1.1


def test_sample_mixture_unimax_pinned(spark, sf_dir):
    """Value pin for the rows-only sample_mixture_unimax op: factors must
    equal an independent waterfill (uniform budget, 4-epoch cap,
    leftover re-spread over uncapped sources) and realized counts the
    md5-bucket rule per doc; dominant language down-samples, every
    factor ≤ 4, corpus size preserved within the bucket-rounding band."""
    import hashlib

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    got = {
        r["lang"]: (r["n_docs"], r["n_rows"], r["copy_factor"])
        for r in QUERIES["sample_mixture_unimax"](spark, sf_dir).collect()
    }
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "lang"]).collect()
    counts: dict[str, int] = {}
    for r in docs:
        counts[r["lang"]] = counts.get(r["lang"], 0) + 1
    total = sum(counts.values())
    # independent waterfill, smallest capacity first
    alloc: dict[str, float] = {}
    active = sorted(counts, key=lambda s: (counts[s], s))
    remaining = float(total)
    while active:
        share = remaining / len(active)
        s = active[0]
        if 4.0 * counts[s] <= share:
            alloc[s] = 4.0 * counts[s]
            remaining -= alloc[s]
            active.pop(0)
        else:
            for s in active:
                alloc[s] = share
            break
    factors = {s: alloc[s] / counts[s] for s in counts}
    dominant = max(counts, key=counts.get)
    assert factors[dominant] < 1
    assert all(f <= 4.0 + 1e-9 for f in factors.values())
    want: dict[str, list] = {s: [0, 0] for s in counts}
    for r in docs:
        w4 = int(round(factors[r["lang"]] * 10000))
        bucket = (
            int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16) % 10000
        )
        copies = w4 // 10000 + (1 if bucket < w4 % 10000 else 0)
        if copies > 0:
            want[r["lang"]][0] += 1
            want[r["lang"]][1] += copies
    for s in counts:
        assert got[s][0] == want[s][0] and got[s][1] == want[s][1], (s, got[s], want[s])
        assert abs(got[s][2] - round(factors[s], 4)) < 1e-9
    realized = sum(v[1] for v in got.values())
    assert 0.9 <= realized / total <= 1.1


def _bfd_reference(items, budget):
    """Independent best-fit-decreasing: items = [(id, toks)], returns
    {id: (bin, overflow)} with the op's exact tie rules (descending toks,
    id asc; best-fit ties to lowest bin id)."""
    import bisect

    bins: list[tuple[int, int]] = []
    n_bins = 0
    out = {}
    for did, toks in sorted(items, key=lambda t: (-t[1], t[0])):
        if toks > budget:
            out[did] = (n_bins, True)
            n_bins += 1
            continue
        i = bisect.bisect_left(bins, (toks, -1))
        if i < len(bins):
            rem, b = bins.pop(i)
            rem -= toks
        else:
            rem, b = budget - toks, n_bins
            n_bins += 1
        if rem > 0:
            bisect.insort(bins, (rem, b))
        out[did] = (b, False)
    return out


def test_pack_sequences_bestfit_pinned(spark, sf_dir):
    """The operator's full placement map must equal an independent python
    BFD per (source, chunk) — including with a tiny chunk_docs that
    forces multi-chunk groups — and every realized bin must respect the
    no-split budget; the registered query's per-source summary must be
    the exact arithmetic of that map."""
    from n2kupdate_spark.operators.corpus import pack_sequences_bestfit as bfd
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    budget = 128
    d = load(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    t = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    rows = t.collect()
    for chunk_docs in (4096, 8):
        got = {
            r["doc_id"]: (r["source"], r["n_tokens"], r["seq_id"], r["overflow"])
            for r in bfd(
                t, budget=budget, group_col="source", chunk_docs=chunk_docs
            ).collect()
        }
        assert len(got) == len(rows)
        # reference: per source, descending order cut into chunk_docs
        # chunks, BFD within each, seq_id = chunk*chunk_docs + local bin
        by_src: dict[str, list] = {}
        for r in rows:
            by_src.setdefault(r["source"], []).append((r["doc_id"], r["n_tokens"]))
        want = {}
        for src, items in by_src.items():
            ordered = sorted(items, key=lambda t_: (-t_[1], t_[0]))
            for ci in range(0, len(ordered), chunk_docs):
                chunk = ci // chunk_docs
                ref = _bfd_reference(ordered[ci : ci + chunk_docs], budget)
                for did, (b, ov) in ref.items():
                    want[did] = (src, chunk * chunk_docs + b, ov)
        for did, (src, toks, seq, ov) in got.items():
            assert want[did] == (src, seq, ov), (did, got[did], want[did])
        # no-split invariant: every non-overflow bin sums ≤ budget
        fills: dict[tuple, int] = {}
        for did, (src, toks, seq, ov) in got.items():
            if not ov:
                fills[(src, seq)] = fills.get((src, seq), 0) + toks
        assert fills and all(v <= budget for v in fills.values())
    # query summary = arithmetic over the chunk_docs=4096 map
    summary = {
        r["source"]: (
            r["n_docs"], r["n_seqs"], r["total_tokens"],
            r["fill_ratio"], r["n_overflow"],
        )
        for r in QUERIES["pack_sequences_bestfit"](spark, sf_dir).collect()
    }
    for src, items in by_src.items():
        ref = _bfd_reference(sorted(items, key=lambda t_: (-t_[1], t_[0])), budget)
        n_seqs = len({b for b, _ in ref.values()})
        tot = sum(tk for _, tk in items)
        exp_fill = round(tot / (n_seqs * budget) * 10000) / 10000
        n_over = sum(1 for _, ov in ref.values() if ov)
        assert summary[src] == (len(items), n_seqs, tot, exp_fill, n_over), (
            src, summary[src]
        )


def test_sample_dsir_weights_pinned(spark, sf_dir):
    """sample_dsir_weights (rows-only, r9): recompute every importance
    weight from raw text in plain python — hashlib md5 bucketing, add-1
    smoothed target/raw distributions, log-likelihood ratio — and require
    4dp agreement on log_weight and avg_log_ratio plus exact n_tokens.
    Also pin the directional contract: the mean avg_log_ratio of the
    target slice must exceed the non-target mean (the target looks more
    like itself than the raw mix does — holds for ANY non-identical
    distributions by Gibbs' inequality applied to the empirical
    estimates)."""
    import hashlib

    import numpy as np

    from n2kupdate_spark.queries import QUERIES

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    ).collect()
    POS = {"src0", "src1", "src2", "src3", "src4"}
    t = np.ones(256)
    r = np.ones(256)
    feats, is_t = {}, {}
    for row in docs:
        c = {}
        for tok in row.text.split(" "):
            if tok:
                b = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % 256
                c[b] = c.get(b, 0) + 1
        if c:
            feats[row.doc_id] = c
        is_t[row.doc_id] = row.source in POS
        for b, n in c.items():
            r[b] += n
            if is_t[row.doc_id]:
                t[b] += n
    log_ratio = np.log(t / t.sum()) - np.log(r / r.sum())

    got = {r2.doc_id: r2 for r2 in QUERIES["sample_dsir_weights"](spark, sf_dir).collect()}
    assert set(got) == set(feats)
    for i, c in feats.items():
        n_tok = sum(c.values())
        lw = float(sum(log_ratio[b] * n for b, n in c.items()))
        assert got[i].n_tokens == n_tok, i
        assert abs(got[i].log_weight - round(lw, 4)) <= 1.01e-4, (i, got[i].log_weight, lw)
        assert abs(got[i].avg_log_ratio - round(lw / n_tok, 4)) <= 1.01e-4, i
    mean_t = float(np.mean([got[i].avg_log_ratio for i in feats if is_t[i]]))
    mean_nt = float(np.mean([got[i].avg_log_ratio for i in feats if not is_t[i]]))
    assert mean_t > mean_nt, (mean_t, mean_nt)


def test_prepare_corpus_optin_gates_pinned(spark, sf_dir):
    """The r9 opt-in stages of prepare_corpus (fuzzy decontamination +
    model-based quality gate) must equal an independent stage-by-stage
    composition of the same operators — pinning the PLUMBING: stage
    order, column threading, join types, and the summary arithmetic on
    the doubly-gated corpus. Also asserts both gates actually bite (the
    opt-in summary differs from the default path's) so a silently
    disabled flag cannot pass."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.corpus import (
        apply_mixture,
        decontaminate_fuzzy,
        gate_documents,
        pack_sequences,
        prepare_corpus,
        quality_classifier_scores,
    )
    from n2kupdate_spark.queries.mlprep import _MIX_DEFAULT_W4, _MIX_W4

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    is_eval = F.expr("doc_id % 97 = 0")
    seed = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    train = d.filter(~is_eval).withColumn("__pos", seed)
    evald = d.filter(is_eval)
    weights = {k: v / 10000 for k, v in _MIX_W4.items()}
    default_w = _MIX_DEFAULT_W4 / 10000

    got = prepare_corpus(
        train, eval_docs=evald, weights=weights, default_weight=default_w,
        seq_budget=512, fuzzy_decontam_threshold=0.5,
        quality_positive_col="__pos",
    ).toPandas().sort_values("source").reset_index(drop=True)

    exact = gate_documents(train, evald)
    near = (
        decontaminate_fuzzy(exact.select("doc_id", "text"), evald, threshold=0.5)
        .filter(F.col("contaminated") == 1)
        .select("doc_id")
    )
    exact = exact.join(near, "doc_id", "left_anti")
    # anti-join on keep==0, mirroring the r10 fix: the classifier never
    # scores token-less docs, so the gate may only REMOVE scored-bad ids
    bad = (
        quality_classifier_scores(
            exact.select("doc_id", "text", "__pos"), "__pos"
        )
        .filter(F.col("keep") == 0)
        .select("doc_id")
    )
    exact = exact.join(bad, "doc_id", "left_anti")
    mixed = apply_mixture(
        exact.select(
            "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
        ),
        weights, default_w, "doc_id", "source",
    )
    packed = pack_sequences(
        mixed, budget=512, group_col="source",
        order_cols=("doc_id", "copy_n"), token_col="n_tokens",
    )
    want = packed.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.ceil(F.sum("n_tokens") / F.lit(512.0)).cast("int").alias("n_sequences"),
    ).toPandas().sort_values("source").reset_index(drop=True)
    assert got.equals(want), (got, want)

    base = prepare_corpus(
        train.drop("__pos"), eval_docs=evald, weights=weights,
        default_weight=default_w, seq_budget=512,
    ).toPandas()
    assert int(got["n_docs"].sum()) < int(base["n_docs"].sum()), (
        "opt-in gates did not bite"
    )


def test_shuffle_shards_pinned(spark, sf_dir):
    """shuffle_shards: per-row hashlib byte-equality (shard AND key),
    invariance under input partitioning, epoch-seed independence with
    preserved balance, and every shard populated at corpus scale."""
    import hashlib

    from n2kupdate_spark.operators.corpus import shuffle_shards

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    got = {
        r["doc_id"]: (r["shard"], r["shuffle_key"])
        for r in shuffle_shards(d, 16).collect()
    }
    for doc_id, (shard, key) in got.items():
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        assert key == h, doc_id
        assert shard == int(h[:8], 16) % 16, doc_id

    # partitioning invariance: 1 partition vs 13 → identical assignment
    again = {
        r["doc_id"]: (r["shard"], r["shuffle_key"])
        for r in shuffle_shards(d.repartition(13), 16).collect()
    }
    assert again == got

    # every shard populated, none dominant (md5 uniformity at n=500+)
    from collections import Counter

    sizes = Counter(s for s, _ in got.values())
    assert len(sizes) == 16
    assert max(sizes.values()) < 3 * min(sizes.values()), sizes

    # epoch reshuffle: a different seed is a fresh permutation (most
    # rows move shard) with the same per-row determinism
    ep1 = {
        r["doc_id"]: r["shard"]
        for r in shuffle_shards(d, 16, seed="epoch1").collect()
    }
    moved = sum(1 for k in got if ep1[k] != got[k][0])
    assert moved > len(got) // 2, moved
    for doc_id, shard in ep1.items():
        h = hashlib.md5(f"epoch1{doc_id}".encode()).hexdigest()
        assert shard == int(h[:8], 16) % 16, doc_id


def test_write_shuffled_shards_layout(spark, sf_dir, tmp_path):
    """The materialized shuffle: one dir per shard, every FILE internally
    in shuffle_key order (the writer recipe must not let the dynamic-
    partition writer re-sort away the key order), union of dirs == the
    exact stamped assignment."""
    import glob

    import pyarrow.parquet as pq

    from n2kupdate_spark.operators.corpus import (
        shuffle_shards,
        write_shuffled_shards,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = str(tmp_path / "shuffled")
    write_shuffled_shards(d, out, n_shards=8)

    dirs = sorted(glob.glob(f"{out}/shard=*"))
    assert [p.rsplit("=", 1)[1] for p in dirs] == [str(i) for i in range(8)]
    seen = {}
    for p in dirs:
        shard = int(p.rsplit("=", 1)[1])
        for f in glob.glob(f"{p}/*.parquet"):
            t = pq.read_table(f, columns=["doc_id", "shuffle_key"])
            keys = t.column("shuffle_key").to_pylist()
            assert keys == sorted(keys), f  # in-file key order
            for doc_id, k in zip(t.column("doc_id").to_pylist(), keys):
                seen[doc_id] = (shard, k)
    want = {
        r["doc_id"]: (r["shard"], r["shuffle_key"])
        for r in shuffle_shards(d, 8).collect()
    }
    assert seen == want


def test_normalize_text_nfkc_pinned(spark):
    """The opt-in NFKC path: Arrow-batched stdlib unicodedata compat
    normalization in front of the JVM fold — fullwidth forms, ligatures,
    and composed accents must land exactly where a plain-python
    NFKC→lower→strip→collapse pipeline puts them; None stays None-safe
    (empty norm)."""
    import re
    import unicodedata

    from n2kupdate_spark.operators.corpus import normalize_text

    rows = [
        (1, "ＦＵＬＬＷＩＤＴＨ １２３"),          # fullwidth letters+digits
        (2, "ﬁne ﬂight ﬃ"),                     # latin ligatures
        (3, "Café déjà-vu!!"),            # combining accent + composed
        (4, "  Mixed   CASE,   punct... "),
        (5, "①②③ Ⅷ ㎞"),                        # circled digits, roman, unit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["norm_text"]
        for r in normalize_text(df, nfkc=True).collect()
    }

    def ref(t):
        t = unicodedata.normalize("NFKC", t).lower()
        t = re.sub("[^a-z0-9 ]", " ", t)
        return re.sub(" +", " ", t).strip()

    for doc_id, text in rows:
        assert got[doc_id] == ref(text), (doc_id, got[doc_id], ref(text))
    # the unicode actually moved: fullwidth digits became ascii
    assert got[1] == "fullwidth 123"
    assert got[2].startswith("fine flight")


def test_normalize_composes_with_exact_dedup(spark):
    """The composition the operator exists for: case/punctuation variants
    of one document must collapse to a single survivor once exact dedup
    fingerprints norm_text instead of text."""
    from pyspark.sql import Window

    from n2kupdate_spark.operators.corpus import normalize_text

    df = spark.createDataFrame(
        [
            (1, "The quick brown fox."),
            (2, "the QUICK  brown fox"),
            (3, "The quick, brown fox!!"),
            (4, "an entirely different document"),
        ],
        "doc_id long, text string",
    )
    n = normalize_text(df)
    w = Window.partitionBy(F.md5("norm_text")).orderBy("doc_id")
    kept = sorted(
        r["doc_id"]
        for r in n.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    )
    assert kept == [1, 4], kept


def test_quality_gate_keeps_tokenless_docs(spark):
    """r9 advice (low): quality_classifier_scores never scores docs with
    zero non-empty tokens (they have no feature rows), so prepare_corpus's
    quality stage must ANTI-join on scored-bad ids rather than semi-join
    on scored-good ids — a token-less doc that passed every other gate
    (here: Gopher thresholds relaxed to admit it) must survive the
    quality gate exactly as it does on the default path.

    The fixture doc is a single space, not "": split(" ") yields two
    EMPTY tokens, which is enough bigram mass to get a gopher_metrics
    row (docs with <2 split-tokens are absent from it by documented
    contract, on every path) while still carrying zero non-empty tokens
    — exactly the class the classifier never scores."""
    from n2kupdate_spark.operators.corpus import prepare_corpus

    rows = [
        (1, "s1", "the cat sat of the mat and stretched out in the warm sun", True),
        (2, "s1", "a dog ran to the park and is barking in the cold rain", True),
        (3, "s1", "the bird flew of the nest and is singing in the tall tree", True),
        (4, "s2", "zzz qqq www eee rrr ttt yyy uuu of the and is in aaa bbb", False),
        (5, "s2", "mmm nnn ooo ppp qqq rrr sss of the and is in ttt uuu", False),
        (6, "s2", "vvv www xxx yyy zzz aaa bbb of the and is in ccc ddd", False),
        (99, "szero", " ", False),  # token-less: no feature rows, never scored
    ]
    train = spark.createDataFrame(
        rows, "doc_id long, source string, text string, __pos boolean"
    )
    evald = spark.createDataFrame(
        [(1000, "unrelated holdout sentence nothing shared here")],
        "doc_id long, text string",
    )
    relaxed = dict(
        min_words=0, min_mean_word_len=0.0, max_mean_word_len=1e9,
        min_stop_hits=0, max_top_bigram_frac=1.0,
    )
    kwargs = dict(
        eval_docs=evald, weights={}, default_weight=1.0, seq_budget=512,
        gopher_kwargs=relaxed,
    )
    base = prepare_corpus(train, **kwargs).toPandas()
    gated = prepare_corpus(train, quality_positive_col="__pos", **kwargs).toPandas()
    assert "szero" in set(base["source"]), "fixture: doc 99 must pass the gates"
    assert "szero" in set(gated["source"]), (
        "token-less doc silently dropped by the quality stage"
    )


def test_gate_documents_bloom_method_pinned(spark, sf_dir):
    """r10: gate_documents(decontam_method="bloom") vs the exact method.
    Two contracts: (1) bloom survivors ⊆ exact survivors (the Bloom gate
    flags a SUPERSET of grams, so with the same budget it can only drop
    MORE docs — never re-admit one); (2) at the registered sizing the
    fixture's eval gram count is far below the filter's capacity, so the
    two gates agree EXACTLY. An unknown method raises."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.corpus import gate_documents
    from n2kupdate_spark.sources import load

    d = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    is_eval = F.expr("doc_id % 97 = 0")
    train, evald = d.filter(~is_eval), d.filter(is_eval)
    exact = {
        r.doc_id for r in gate_documents(train, evald, decontam_budget=1).collect()
    }
    bloom = {
        r.doc_id
        for r in gate_documents(
            train, evald, decontam_budget=1, decontam_method="bloom"
        ).collect()
    }
    assert bloom <= exact
    assert bloom == exact  # no collisions at registered sizing on fixture
    # r11: the two-stage bloom_exact method equals the exact gate BY
    # CONSTRUCTION (stage-2 verify), not merely by generous sizing
    bloom_exact = {
        r.doc_id
        for r in gate_documents(
            train, evald, decontam_budget=1, decontam_method="bloom_exact"
        ).collect()
    }
    assert bloom_exact == exact
    with _pytest.raises(ValueError, match="decontam_method"):
        gate_documents(train, evald, decontam_method="minhash").collect()


def test_prepare_corpus_zlib_gate_pinned(spark, sf_dir):
    """r10 opt-in compression-ratio gate: prepare_corpus(zlib_ratio_bounds)
    must equal the independent composition gate_documents →
    information_signals filter → mixture → packing → summary, the gate
    must actually bite on the fixture (summary differs from the default
    path), and docs are only ever REMOVED relative to the default."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.corpus import (
        apply_mixture,
        gate_documents,
        information_signals,
        pack_sequences,
        prepare_corpus,
    )
    from n2kupdate_spark.queries.mlprep import _MIX_DEFAULT_W4, _MIX_W4

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    is_eval = F.expr("doc_id % 97 = 0")
    train, evald = d.filter(~is_eval), d.filter(is_eval)
    weights = {k: v / 10000 for k, v in _MIX_W4.items()}
    default_w = _MIX_DEFAULT_W4 / 10000
    bounds = (0.0, 0.5)  # fixture zlib ratios span ~0.39-1.13: the gate bites

    got = (
        prepare_corpus(
            train, eval_docs=evald, weights=weights, default_weight=default_w,
            seq_budget=512, zlib_ratio_bounds=bounds,
        )
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    base = (
        prepare_corpus(
            train, eval_docs=evald, weights=weights, default_weight=default_w,
            seq_budget=512,
        )
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert not got.equals(base), "bounds did not bite; pin is vacuous"
    assert (got.set_index("source")["n_docs"]
            <= base.set_index("source")["n_docs"]).all()

    exact = gate_documents(train, evald)
    noisy = (
        information_signals(exact.select("doc_id", "text"))
        .filter(~F.col("zlib_ratio").between(*bounds))
        .select("doc_id")
    )
    exact = exact.join(noisy, "doc_id", "left_anti")
    mixed = apply_mixture(
        exact.select("doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")),
        weights, default_w, "doc_id", "source",
    )
    packed = pack_sequences(
        mixed, budget=512, group_col="source",
        order_cols=("doc_id", "copy_n"), token_col="n_tokens",
    )
    want = (
        packed.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.ceil(F.sum("n_tokens") / F.lit(512.0)).cast("int").alias("n_sequences"),
        )
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert got.equals(want), (got, want)


def test_prepare_corpus_bloom_exact_equals_exact_two_sfs(spark):
    """r11 (verdict item 3): the whole prepare_corpus pipeline under
    decontam_method="bloom_exact" must produce EXACTLY the summary the
    default exact method produces — at two scales, since gram-overlap
    structure is scale-sensitive (sf0.001 and sf0.01 have different
    eval-slice gram populations)."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.corpus import prepare_corpus
    from n2kupdate_spark.sources import load

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        d = load(spark, sf, "documents")
        is_eval = F.expr("doc_id % 97 = 0")
        train, evald = d.filter(~is_eval), d.filter(is_eval)
        kwargs = dict(weights={"src0": 2.0}, default_weight=1.0, seq_budget=512)
        base = {
            r.source: (r.n_docs, r.n_rows, r.total_tokens, r.n_sequences)
            for r in prepare_corpus(train, evald, **kwargs).collect()
        }
        two_stage = {
            r.source: (r.n_docs, r.n_rows, r.total_tokens, r.n_sequences)
            for r in prepare_corpus(
                train, evald, decontam_method="bloom_exact", **kwargs
            ).collect()
        }
        assert two_stage == base, sf


def test_select_token_budget_sharded_equals_single_window(spark):
    """select_token_budget shards>1 must be a pure parallelism knob: the
    percentile-cut range sharding + per-shard cumsum + exact base
    offsets reconstructs the single global-order window EXACTLY — on an
    adversarial frame (heavy weight ties so cuts land ON tied values,
    doc_id doing the tie-break, budget landing mid-tie-group). Also pins
    the prefix rule's boundary: the first excluded doc would overflow
    the budget, and every selected doc's cum_tokens is the true running
    sum."""
    from n2kupdate_spark.operators.corpus import select_token_budget

    rows = []
    for i in range(5000):
        # 10 distinct weights → ~500-row tie groups; token sizes vary
        rows.append((i, (i * 7) % 10 / 10.0, 3 + (i * 13) % 50))
    df = spark.createDataFrame(rows, ["doc_id", "weight", "n_tokens"]).repartition(16)
    total = sum(r[2] for r in rows)
    budget = total // 4

    key = ["doc_id"]
    base = (
        select_token_budget(df, budget)
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    # independent recompute of the prefix rule
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    cum, want = 0, {}
    for rank, (i, w, n) in enumerate(ordered, start=1):
        cum += n
        if cum > budget:
            break
        want[i] = (rank, cum)
    assert {
        int(r.doc_id): (int(r.sel_rank), int(r.cum_tokens))
        for r in base.itertuples()
    } == want

    for shards in (2, 5, 32):
        sub = (
            select_token_budget(df, budget, shards=shards)
            .toPandas().sort_values(key).reset_index(drop=True)
        )
        assert list(sub.columns) == list(base.columns), shards
        assert (sub.values == base.values).all(), f"shards={shards} diverged"


def test_select_token_budget_empty_and_allnull_sharded(spark):
    """r12 (ADVICE): shards>1 on an EMPTY frame used to crash driver-side
    (percentile_approx → NULL → float(None) TypeError) while shards=1
    returned a typed empty frame — the sharded path must degrade to the
    same clean answer. Same guard covers the all-NULL-weights frame,
    where there are no cut points either."""
    from pyspark.sql import types as T

    from n2kupdate_spark.operators.corpus import select_token_budget

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("weight", T.DoubleType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )
    empty = spark.createDataFrame([], schema)
    for shards in (1, 4):
        out = select_token_budget(empty, 100, shards=shards)
        assert out.columns == ["doc_id", "weight", "n_tokens", "sel_rank", "cum_tokens"]
        assert out.count() == 0, shards

    allnull = spark.createDataFrame(
        [(1, None, 10), (2, None, 20)], schema
    )
    single = sorted(map(tuple, select_token_budget(allnull, 100).collect()))
    sharded = sorted(map(tuple, select_token_budget(allnull, 100, shards=4).collect()))
    assert sharded == single


def test_langid_hashgram_planted_signal_separates(spark):
    """r12: langid_hashgram_scores must actually LEARN — plant a
    distinctive marker word per language, train on the even half, and
    demand 100% held-out accuracy at the registered query's config
    (l2=3.0). Also pins determinism (same output twice) and the conf
    range."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.corpus import langid_hashgram_scores

    rows = []
    for i in range(300):
        lang = ["aa", "bb", "cc"][i % 3]
        marker = {"aa": "zebra", "bb": "yonder", "cc": "xylophone"}[lang]
        rows.append((i, lang, f"batch table {marker} join {marker} scan"))
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"]).withColumn(
        "is_train", F.col("doc_id") % 2 == 0
    )
    out = langid_hashgram_scores(
        df, train_col="is_train", sample_per_class=64, l2=3.0
    )
    got = {r["doc_id"]: (r["pred_lang"], r["conf"]) for r in out.collect()}
    held = [i for i, _, _ in rows if i % 2 == 1]
    assert all(got[i][0] == ["aa", "bb", "cc"][i % 3] for i in held)
    assert all(0.0 <= got[i][1] <= 1.0 for i in got)
    again = {
        r["doc_id"]: (r["pred_lang"], r["conf"])
        for r in langid_hashgram_scores(
            df, train_col="is_train", sample_per_class=64, l2=3.0
        ).collect()
    }
    assert again == got


def test_langid_hashgram_beats_marker_heuristic(spark):
    """r12 (judge item 3): on the fixture's held-out slice (doc_id%5==4)
    the trained hashgram classifier's accuracy must be >= the fixed
    marker-token heuristic's, at every sf. The fixture's labels carry no
    real n-gram signal, so this pins the prior-corrected degradation
    path (without the case-control intercept correction the balanced
    fit sample scattered to 0.17 at sf0.1 vs the marker's 0.36)."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.corpus import langid_hashgram_scores
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    for sf in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        d = load(spark, sf, "documents").withColumn(
            "is_train", F.col("doc_id") % 5 < 4
        )
        o = langid_hashgram_scores(
            d, train_col="is_train", sample_per_class=512, l2=3.0
        )
        j = o.join(d, "doc_id").filter(~F.col("is_train"))
        acc = j.filter(F.col("pred_lang") == F.col("lang")).count() / j.count()
        m = QUERIES["text_langid_ngram"](spark, sf).filter(
            F.col("doc_id") % 5 == 4
        )
        macc = m.filter(F.col("pred_lang") == F.col("lang")).count() / m.count()
        assert acc >= macc, f"{sf}: hashgram {acc:.4f} < marker {macc:.4f}"


def test_fit_quality_classifier_divergence_guard():
    """r12: lr*l2 >= 2 makes the GD weight-decay factor expansive —
    weights blow up to NaN and predictions silently turn NULL. The fit
    must refuse instead."""
    import numpy as np
    import pytest as _pytest

    from n2kupdate_spark.operators.corpus import fit_quality_classifier

    X = np.ones((4, 2))
    y = np.array([0.0, 1.0, 0.0, 1.0])
    with _pytest.raises(ValueError, match="expansive"):
        fit_quality_classifier(X, y, lr=0.3, l2=10.0)
    fit_quality_classifier(X, y, lr=0.3, l2=3.0)  # stable region: fine


def test_domain_quality_weights_feed_apply_mixture(spark):
    """r12 domain-axis curation, step 3: the rollup's domain_weight
    column is directly consumable as apply_mixture's per-key weight dict
    (source_col='host'). Pins the full composition on the fixture:
    every host's docs get floor(w) or floor(w)+1 copies, the +1 set is
    the md5-bucket rule's (content-addressed — recomputed here in
    python), and hosts absent from the dict get the default."""
    import hashlib

    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.corpus import apply_mixture
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.queries.mlprep import _HOST_RE, _pseudo_url
    from n2kupdate_spark.sources import load

    sf = "/root/testdata/sf0.001"
    rollup = QUERIES["curation_domain_quality"](spark, sf)
    # scale weights into a mixing range: weight 2.x => 2-3 copies
    weights = {
        r["host"]: round(1.0 + r["domain_weight"], 4)
        for r in rollup.collect()
        if r["host"] is not None
    }
    some_hosts = sorted(weights)[:50]
    weights = {h: weights[h] for h in some_hosts}

    docs = load(spark, sf, "documents").select(
        "doc_id",
        F.regexp_extract(_pseudo_url(), _HOST_RE, 1).alias("host"),
    )
    mixed = apply_mixture(
        docs, weights, default_weight=1.0, source_col="host"
    )
    counts = {
        r["doc_id"]: r["n"]
        for r in mixed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for row in docs.collect():
        w = weights.get(row["host"], 1.0)
        w4 = int(round(w * 10000))
        bucket = (
            int(hashlib.md5(str(row["doc_id"]).encode()).hexdigest()[:8], 16)
            % 10000
        )
        want = w4 // 10000 + (1 if bucket < w4 % 10000 else 0)
        assert counts.get(row["doc_id"], 0) == want, row


def test_tokenizer_bakeoff_consistent_with_per_doc_queries(spark, sf_dir):
    """r12: diag_tokenizer_bakeoff's corpus totals must equal the sums of
    the three registered per-doc tokenize queries (same budgets by
    construction), and its fertility = total_chars/total_tokens at 4dp.
    Also pins the family set and that every vocab_size is positive."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.queries import QUERIES

    bake = {
        r["family"]: r
        for r in QUERIES["diag_tokenizer_bakeoff"](spark, sf_dir).collect()
    }
    assert set(bake) == {"bpe", "unigram", "wordpiece"}
    per_doc = {
        "bpe": ("text_bpe_tokenize", "n_bpe_tokens"),
        "unigram": ("text_unigram_tokenize", "n_ug_tokens"),
        "wordpiece": ("text_wordpiece_tokenize", "n_wp_tokens"),
    }
    for fam, (qname, col) in per_doc.items():
        agg = (
            QUERIES[qname](spark, sf_dir)
            .agg(
                F.sum(col).cast("long").alias("t"),
                F.sum("n_chars").cast("long").alias("c"),
            )
            .first()
        )
        row = bake[fam]
        assert row["total_tokens"] == agg["t"], fam
        assert row["vocab_size"] > 0
        want = round(int(agg["c"]) / int(agg["t"]) * 10000) / 10000
        assert row["chars_per_token"] == want, fam


def test_chunk_documents_matches_python_reference(spark):
    """r12: chunk_documents vs an independent python recompute on
    adversarial lengths — n = 0, 1, size−1, size, size+1, exact multiple
    of stride, huge — plus the structural invariants: consecutive chunks
    share exactly `overlap` tokens, every token is covered, the last
    window ends on the final token, concatenating each chunk's slice
    reproduces the doc."""
    import pytest as _pytest

    from n2kupdate_spark.operators.corpus import chunk_documents

    size, overlap = 16, 4
    stride = size - overlap
    lengths = [0, 1, 15, 16, 17, 28, 40, 100]
    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(n)))
        for i, n in enumerate(lengths)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got: dict = {}
    for r in chunk_documents(df, size=size, overlap=overlap).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_tok"], r["n_chunk_tokens"], r["chunk_text"])
        )

    for i, n in enumerate(lengths):
        toks = [f"t{i}_{j}" for j in range(n)]
        if n == 0:
            assert i not in got
            continue
        n_chunks = 1 if n <= size else -(-(n - size) // stride) + 1
        want = []
        for ci in range(n_chunks):
            s = ci * stride
            piece = toks[s : s + size]
            want.append((ci, s + 1, len(piece), " ".join(piece)))
        assert sorted(got[i]) == want, (i, n)
        # invariants
        last = want[-1]
        assert last[1] - 1 + last[2] == n  # final window ends on last token
        covered = set()
        for ci, s1, nc, _ in want:
            covered.update(range(s1 - 1, s1 - 1 + nc))
        assert covered == set(range(n))
        for (c1, s1, n1, t1), (c2, s2, n2, t2) in zip(want, want[1:]):
            shared = (s1 - 1 + n1) - (s2 - 1)
            assert shared == overlap  # exact overlap between neighbours

    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, size=8, overlap=8)


def test_lttb_downsample_matches_reference(spark):
    """r12: the distributed LTTB vs the canonical pure-python
    flot-downsample reference on random, constant, spiky and short
    series — identical kept indices per key — plus the structural
    invariants: first/last always kept, output sorted by ts, count =
    min(n, n_out), an extreme spike is always retained (the aliasing
    case naive every-kth sampling fails), n_out<3 rejected."""
    import math
    import random

    import pytest as _pytest

    from n2kupdate_spark.operators.timeseries import lttb_downsample

    def ref_lttb(ts, vals, threshold):
        n = len(ts)
        if threshold >= n:
            return list(range(n))
        every = (n - 2) / (threshold - 2)
        a = 0
        kept = [0]
        for i in range(threshold - 2):
            avg_s = int(math.floor((i + 1) * every) + 1)
            avg_e = min(int(math.floor((i + 2) * every) + 1), n)
            cx = sum(ts[avg_s:avg_e]) / (avg_e - avg_s)
            cy = sum(vals[avg_s:avg_e]) / (avg_e - avg_s)
            r0 = int(math.floor(i * every) + 1)
            r1 = int(math.floor((i + 1) * every) + 1)
            best, best_area = r0, -1.0
            for j in range(r0, r1):
                area = abs(
                    (ts[a] - cx) * (vals[j] - vals[a])
                    - (ts[a] - ts[j]) * (cy - vals[a])
                )
                if area > best_area:
                    best, best_area = j, area
            kept.append(best)
            a = best
        kept.append(n - 1)
        return kept

    random.seed(11)
    series = {
        0: sorted((random.uniform(0, 1000), random.gauss(0, 1)) for _ in range(80)),
        1: [(float(i), 1.0) for i in range(40)],           # constant
        2: [(float(i), 0.0 if i != 33 else 500.0) for i in range(60)],  # spike
        3: [(float(i), float(i % 3)) for i in range(10)],  # short, > n_out
        4: [(float(i), float(i)) for i in range(7)],       # n <= n_out: all
    }
    rows = [
        (k, t, v) for k, pts in series.items() for t, v in pts
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_s", "value"])
    n_out = 8
    got: dict = {}
    for r in lttb_downsample(df, n_out=n_out).collect():
        got.setdefault(r["user_id"], []).append(
            (r["sel_rank"], r["ts_s"], r["value"])
        )
    for k, pts in series.items():
        ts = [t for t, _ in pts]
        vals = [v for _, v in pts]
        want_idx = ref_lttb(ts, vals, n_out)
        want = [(i, ts[j], vals[j]) for i, j in enumerate(want_idx)]
        assert sorted(got[k]) == want, k
        out_ts = [t for _, t, _ in sorted(got[k])]
        assert out_ts[0] == ts[0] and out_ts[-1] == ts[-1]
        assert out_ts == sorted(out_ts)
        assert len(out_ts) == min(len(ts), n_out)
    # the spike is kept
    assert any(v == 500.0 for _, _, v in got[2])

    with _pytest.raises(Exception, match="n_out"):
        lttb_downsample(df, n_out=2).collect()


def test_corpus_passage_search_matches_python_recompute(spark):
    """r12: the chunk → hashed-tf embed → cosine top-3 retrieval
    composition recomputed end-to-end in plain python (chunk windows,
    md5 buckets, dense tf vectors, exact cosine, (score desc, id asc)
    rank, same-document passages excluded) — exact set equality of
    (q_pid, neighbor_pid, 4dp score, rank). The per-batch top-24 prune
    is safe under the same-doc exclusion because a doc yields ≤ ~6
    passages at these settings, so ≥ 18 cross-doc candidates survive
    per batch per query."""
    import hashlib
    import math

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.queries.mlprep import _PASSAGE_PID_MULT
    from n2kupdate_spark.sources import load

    sf = "/root/testdata/sf0.001"
    got = {
        (r["q_pid"], r["rn"]): (r["neighbor_pid"], r["cos_sim"])
        for r in QUERIES["corpus_passage_search"](spark, sf).collect()
    }

    size, overlap = 64, 8
    stride = size - overlap
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf, "documents", columns=["doc_id", "text"]).collect()
    }
    vecs = {}
    for did, text in docs.items():
        toks = [t for t in text.split(" ") if t]
        n = len(toks)
        if n == 0:
            continue
        n_chunks = 1 if n <= size else -(-(n - size) // stride) + 1
        for ci in range(n_chunks):
            piece = toks[ci * stride : ci * stride + size]
            v = [0.0] * 64
            for t in piece:
                b = int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % 64
                v[b] += 1.0
            vecs[did * _PASSAGE_PID_MULT + ci] = v

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da = math.sqrt(sum(x * x for x in a)) or 1.0
        db = math.sqrt(sum(x * x for x in b)) or 1.0
        s = round(num / (da * db), 4)
        return s + 0.0

    q_pids = sorted(p for p in vecs if (p // _PASSAGE_PID_MULT) % 97 == 0)[:64]
    want = {}
    for q in q_pids:
        scored = sorted(
            (
                (-cos(vecs[q], v), p)
                for p, v in vecs.items()
                if p != q and p // _PASSAGE_PID_MULT != q // _PASSAGE_PID_MULT
            ),
        )[:3]
        for rn, (negs, p) in enumerate(scored, start=1):
            want[(q, rn)] = (p, -negs)
    assert got == want


def test_cusum_changepoints_reference_and_planted_shift(spark):
    """r12: tabular CUSUM vs an independent python recompute on mixed
    series, plus behavior pins: (1) a planted +1.2σ mean shift alarms
    within a few points of the shift (direction 'up') while a per-point
    |z|>=3 test over the same series fires on only a ~12% sliver of
    post-shift points (the small-persistent-shift case CUSUM exists
    for — cumulative drift is unbounded while each point sits near
    baseline); (2) a stationary series produces no
    alarms at h=5; (3) a downward shift alarms 'down'; (4) short and
    constant-baseline series emit nothing."""
    import math
    import random

    from n2kupdate_spark.operators.timeseries import cusum_changepoints

    rng = random.Random(3)

    def noise():
        return rng.gauss(0.0, 1.0)

    series = {
        # 40 baseline + 60 shifted by +1.2 (sigma≈1): must alarm 'up'
        0: [10.0 + noise() for _ in range(40)] + [11.2 + noise() for _ in range(60)],
        # stationary: no alarms
        1: [5.0 + noise() for _ in range(100)],
        # downward shift
        2: [3.0 + noise() for _ in range(40)] + [1.0 + noise() for _ in range(60)],
        # too short
        3: [1.0, 2.0, 3.0],
        # constant baseline (sigma 0)
        4: [7.0] * 50,
        # exactly calib+1 points with a huge post-calibration jump:
        # the single walkable point must alarm (r12 ADVICE — the old
        # calib+2 floor dropped this series while the stream alarmed)
        5: [10.0 + noise() for _ in range(20)] + [25.0],
    }
    rows = [
        (k, float(i), v) for k, vals in series.items() for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_s", "value"])
    got: dict = {}
    for r in cusum_changepoints(df, calib=20).collect():
        got.setdefault(r["user_id"], []).append(
            (r["ts_s"], r["direction"], r["s_value"])
        )

    # independent recompute
    def ref(vals, calib=20, k=0.5, h=5.0):
        if len(vals) <= calib:
            return []
        mu = sum(vals[:calib]) / calib
        sig = math.sqrt(sum((x - mu) ** 2 for x in vals[:calib]) / calib)
        if sig <= 0:
            return []
        sp = sn = 0.0
        out = []
        for i in range(calib, len(vals)):
            sp = max(0.0, sp + (vals[i] - mu - k * sig))
            sn = max(0.0, sn + (mu - vals[i] - k * sig))
            if sp > h * sig:
                out.append((float(i), "up", round(sp, 4)))
                sp = sn = 0.0
            elif sn > h * sig:
                out.append((float(i), "down", round(sn, 4)))
                sp = sn = 0.0
        return out

    for kkey, vals in series.items():
        want = ref(vals)
        assert sorted(got.get(kkey, [])) == sorted(want), kkey

    # planted-shift behavior
    ups = [t for t, d, _ in got[0] if d == "up"]
    assert ups and 40 <= min(ups) <= 55  # alarms shortly after the shift
    assert 1 not in got  # stationary silent
    assert any(d == "down" for _, d, _ in got[2])
    assert 3 not in got and 4 not in got
    # calib+1 boundary: the lone post-calibration point alarms
    assert got[5] == [(20.0, "up", got[5][0][2])] and got[5][0][2] > 0
    # the z-score foil: per-point 3-sigma testing catches only a sliver
    # of the shifted regime that CUSUM flags outright
    mu = sum(series[0][:20]) / 20
    sig = math.sqrt(sum((x - mu) ** 2 for x in series[0][:20]) / 20)
    frac = sum(1 for x in series[0][40:] if abs(x - mu) / sig >= 3.0) / 60
    assert frac < 0.2


def test_stratified_neyman_matches_python_recompute(spark):
    """r12: Neyman allocation + md5-rank membership recomputed
    independently in python at two sfs — exact row-set equality — plus
    the design properties: allocations sum to the budget, caps
    respected, and on a constructed frame a high-variance stratum
    receives MORE than its proportional share (the point of Neyman over
    proportional)."""
    import hashlib
    import math

    from n2kupdate_spark.operators.corpus import stratified_neyman
    from n2kupdate_spark.sources import load

    def ref(rows, total_n):
        # rows: (id, stratum, value)
        strata: dict = {}
        for i, s, v in rows:
            strata.setdefault(s, []).append((i, v))
        stats = {}
        for s, pts in strata.items():
            vals = [v for _, v in pts]
            mu = sum(vals) / len(vals)
            sd = math.sqrt(sum((x - mu) ** 2 for x in vals) / len(vals))
            stats[s] = (len(pts), sd)
        n_total = sum(n for n, _ in stats.values())
        budget = min(total_n, n_total)
        weights = {s: n * sd for s, (n, sd) in stats.items()}
        if sum(weights.values()) <= 0:
            weights = {s: float(n) for s, (n, _) in stats.items()}
        caps = {s: n for s, (n, _) in stats.items()}
        # same largest-remainder-with-caps spec, independent code
        alloc = {s: 0 for s in weights}
        active = [s for s in sorted(weights) if caps[s] > 0]
        remaining = budget
        while remaining > 0 and active:
            tw = sum(weights[s] for s in active)
            if tw <= 0:
                shares = {s: remaining / len(active) for s in active}
            else:
                shares = {s: remaining * weights[s] / tw for s in active}
            floors = {s: min(int(shares[s]), caps[s] - alloc[s]) for s in active}
            give = sum(floors.values())
            for s in sorted(active, key=lambda k: (-(shares[k] - int(shares[k])), k)):
                if give >= remaining:
                    break
                if alloc[s] + floors[s] < caps[s]:
                    floors[s] += 1
                    give += 1
            for s in active:
                alloc[s] += floors[s]
            remaining -= give
            active = [s for s in active if alloc[s] < caps[s]]
            if give == 0 and remaining > 0 and active:
                for s in sorted(active):
                    if remaining == 0:
                        break
                    alloc[s] += 1
                    remaining -= 1
                active = [s for s in active if alloc[s] < caps[s]]
        picked = set()
        for s, pts in strata.items():
            ranked = sorted(
                pts, key=lambda p: (hashlib.md5(str(p[0]).encode()).hexdigest(), p[0])
            )
            picked.update((i, s) for i, _ in ranked[: alloc[s]])
        return picked, alloc

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        e = load(spark, sf, "events", columns=["event_id", "event_type", "value"])
        rows = [(r["event_id"], r["event_type"], r["value"]) for r in e.collect()]
        budget = len(rows) // 10
        got = {
            (r["event_id"], r["event_type"])
            for r in stratified_neyman(
                e, budget, "event_type", "event_id", "value"
            ).collect()
        }
        want, alloc = ref(rows, budget)
        assert got == want, sf
        assert sum(alloc.values()) == budget

    # Neyman beats proportional where variance is skewed: stratum 'hi'
    # has 10x the sigma of 'lo' at equal size -> gets ~10/11 of budget
    rows = [(i, "hi", float((i * 13) % 100)) for i in range(200)] + [
        (1000 + i, "lo", float((i % 10) / 10.0)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    out = stratified_neyman(df, 40, "event_type", "event_id", "value")
    by = {r["event_type"]: r["n"] for r in out.groupBy("event_type").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    lo = by.get("lo", 0)
    assert by["hi"] >= 36 and by["hi"] + lo == 40  # σ-heavy stratum dominates


def test_stratified_neyman_edges(spark):
    """r12: degenerate inputs return typed results, never crash — empty
    frame (no strata: the literal allocation map would otherwise type as
    VOID), single row, zero budget, budget exceeding N (everything
    selected)."""
    from pyspark.sql import types as T

    from n2kupdate_spark.operators.corpus import stratified_neyman

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    empty = spark.createDataFrame([], schema)
    out = stratified_neyman(empty, 10, "event_type", "event_id", "value")
    assert out.columns == ["event_id", "event_type", "rk"]
    assert out.count() == 0
    one = spark.createDataFrame([(1, "a", 5.0)], schema)
    assert stratified_neyman(one, 10, "event_type", "event_id", "value").count() == 1
    assert stratified_neyman(one, 0, "event_type", "event_id", "value").count() == 0
    four = spark.createDataFrame(
        [(i, "ab"[i % 2], float(i)) for i in range(4)], schema
    )
    assert stratified_neyman(four, 99, "event_type", "event_id", "value").count() == 4


def test_sample_weighted_topk_matches_python_recompute(spark):
    """r12: Efraimidis–Spirakis membership, keys (4dp) and ranks
    recomputed independently in python (md5-derived u, ln(u)/w ordering,
    id tiebreak) at two sfs — exact equality — plus the design pins:
    heavy weights dominate inclusion, w <= 0 / NULL never drawn,
    deterministic rerun."""
    import hashlib
    import math

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load
    from pyspark.sql import functions as F

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = [
            (r["doc_id"], r["es_key"], r["sel_rank"])
            for r in QUERIES["sample_weighted_topk"](spark, sf).collect()
        ]
        docs = load(spark, sf, "documents", columns=["doc_id", "text"]).collect()
        scored = []
        for r in docs:
            toks = r["text"].split(" ")  # F.split keeps empties too
            w = len(set(toks)) / len(toks)
            u = max(
                int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:13], 16)
                / float(16**13),
                1.0 / float(16**13),
            )
            scored.append((math.log(u) / w, r["doc_id"], w))
        scored.sort(key=lambda t: (-t[0], t[1]))
        k = len(docs) // 10
        want = [
            (i, round(key * 10000) / 10000, rk)
            for rk, (key, i, _) in enumerate(scored[:k], start=1)
        ]
        assert got == want, sf


def test_url_normalize_matches_python_reference(spark):
    """r12: normalize_urls vs an independent python normalizer (same
    RFC-3986 rule set, separate parsing code) on BOTH the registered
    query's messy fixture URLs at two sfs AND a hand-built adversarial
    set; every rule pinned non-vacuous (case, default port, non-default
    port kept, fragment, tracking scrub, param sort, trailing slash)."""
    import re

    from n2kupdate_spark.operators.corpus import normalize_urls
    from n2kupdate_spark.queries import QUERIES

    def ref(url):
        m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?([^#]*))?(#.*)?$", url)
        scheme, hostport, path, _, query, _ = m.groups()
        scheme = scheme.lower()
        hostport = hostport.lower()
        if scheme == "http" and hostport.endswith(":80"):
            hostport = hostport[:-3]
        if scheme == "https" and hostport.endswith(":443"):
            hostport = hostport[:-4]
        if path == "":
            path = "/"  # RFC 3986 §6.2.3 empty path ≡ "/" (r13)
        if path != "/" and path.endswith("/"):
            path = path[:-1]
        kept = []
        for p in (query or "").split("&"):
            if not p:
                continue
            k = p.split("=")[0]
            if k.startswith("utm_") or k in ("gclid", "fbclid", "msclkid"):
                continue
            kept.append(p)
        kept.sort()
        return scheme + "://" + hostport + path + ("?" + "&".join(kept) if kept else "")

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = QUERIES["curation_url_normalize"](spark, sf).collect()
        for r in rows:
            assert r["url_norm"] == ref(r["url"]), r["url"]
            assert r["changed"] == (r["url"] != r["url_norm"])
        # each rule fires somewhere in the fixture
        assert any("HTTPS" in r["url"] for r in rows)
        assert any(":443" in r["url"] for r in rows)
        assert any(":8443" in r["url_norm"] for r in rows)  # real port kept
        assert any("#" in r["url"] for r in rows)
        assert any("utm_" in r["url"] and "utm_" not in r["url_norm"] for r in rows)

    adversarial = [
        "HTTP://A.B:80/x/",
        "https://a.b:443/",
        "https://a.b/?utm_a=1&utm_b=2",      # tracking-only query drops the '?'
        "https://a.b/p?c=2&b&a=1",           # bare param sorts too
        "ftp://Weird.Host:80/f/",            # non-http scheme: port kept
        "https://a.b",                       # empty path ≡ "/" (r12 ADVICE)
        "https://a.b?x=1",                   # empty path + query
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(adversarial)], ["i", "url"])
    got = {r["i"]: r["url_norm"] for r in normalize_urls(df).collect()}
    for i, u in enumerate(adversarial):
        assert got[i] == ref(u), u
    # "https://a.b" and "https://a.b/" must land on ONE canonical key
    assert got[5] == "https://a.b/"

    # empty scrub tuples mean "scrub nothing", not a TypeError (r12 ADVICE)
    got0 = {
        r["i"]: r["url_norm"]
        for r in normalize_urls(
            df, tracking_prefixes=(), tracking_params=()
        ).collect()
    }
    assert got0[2] == "https://a.b/?utm_a=1&utm_b=2"
    assert got0[0] == ref(adversarial[0])


def test_extract_html_matches_python_reference(spark):
    """r13 (judge item 3): extract_html_text vs an independent python
    extractor (same jusText-style rule set — script/style/comment/CDATA
    removal, block segmentation, entity decode with &amp; last,
    length + link-density keep rule — separate parsing code) over the
    registered query's pseudo-HTML at two sfs AND a hand-built
    adversarial set; per-rule non-vacuity asserted, plus composition:
    the extracted column feeds gopher_metrics unchanged."""
    import re

    from n2kupdate_spark.operators.corpus import extract_html_text
    from n2kupdate_spark.queries import QUERIES

    BLOCK = re.compile(
        r"</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article|aside|"
        r"header|footer|nav|blockquote|pre|br)\b[^>]*>",
        re.I,
    )
    ENTS = [
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
    ]

    def block_text(b):
        # pre-decode visible text (gating lengths are pre-decode, r13)
        t = re.sub(r"<[^>]*>", " ", b, flags=re.S)
        return re.sub(r"\s+", " ", t).strip()

    def decode(t):
        for e, c in ENTS:
            t = t.replace(e, c)
        return re.sub(r"\s+", " ", t).strip()

    def ref(html, min_chars=25, max_ld=0.33):
        for pat in (
            r"<script\b[^>]*>.*?</script>",
            r"<style\b[^>]*>.*?</style>",
        ):
            html = re.sub(pat, " ", html, flags=re.I | re.S)
        html = re.sub(r"<!--.*?-->", " ", html, flags=re.S)
        html = re.sub(r"<!\[CDATA\[.*?\]\]>", " ", html, flags=re.S)
        stats = []
        for b in BLOCK.split(html):
            t = block_text(b)
            if not t:
                continue
            al = len(
                block_text(
                    " ".join(
                        re.findall(r"<a\b[^>]*>(.*?)</a>", b, flags=re.I | re.S)
                    )
                )
            )
            stats.append((t, al))
        kept = [t for t, al in stats if len(t) >= min_chars and al <= len(t) * max_ld]
        total = sum(len(t) for t, _ in stats)
        kept_c = sum(len(t) for t in kept)
        frac = round((1.0 - kept_c / total) * 10000) / 10000 + 0.0 if total else 0.0
        return decode(" ".join(kept)), len(stats), len(kept), frac

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        # rebuild the fixture html to feed ref() — same expression the
        # query uses, materialized once
        from n2kupdate_spark.queries.text import _pseudo_html
        from n2kupdate_spark.sources import load

        d = load(spark, sf, "documents", columns=["doc_id", "text"]).select(
            "doc_id", _pseudo_html().alias("html")
        )
        htmls = {r["doc_id"]: r["html"] for r in d.collect()}
        got = {
            r["doc_id"]: (
                r["extracted_text"], r["n_blocks"], r["n_kept"],
                r["boilerplate_frac"],
            )
            for r in QUERIES["text_extract_html"](spark, sf).collect()
        }
        assert set(got) == set(htmls)
        for did, html in htmls.items():
            assert got[did] == ref(html), did
        # per-rule non-vacuity over the fixture
        assert any("<!--" in h for h in htmls.values())
        assert any("CDATA" in h for h in htmls.values())
        assert any("&amp;lt;" in h for h in htmls.values())
        assert all("not content" not in t for t, *_ in got.values())
        assert all("cdata junk" not in t for t, *_ in got.values())
        assert all("color: red" not in t for t, *_ in got.values())
        assert all("Home About Blog" not in t for t, *_ in got.values())
        # the author-escaped &amp;lt; decodes ONCE to literal "&lt;"
        four = next(d_ for d_ in sorted(htmls) if d_ % 4 == 0)
        assert "&lt; stays literal" in got[four][0]
        assert "< stays literal" not in got[four][0].replace("&lt;", "")

    adversarial = [
        # nested block tags + inline survivors
        "<div><div><p>nested blocks still split into clean text pieces "
        "with <b>inline</b> tags kept as text</p></div></div>",
        # script containing fake closing tags and comparisons
        '<script>if (a < b) { s = "</p><p>fake"; }</script><p>real text '
        "that is long enough to pass the length gate</p>",
        # link farm: dropped by density even though long
        '<p><a href="/1">one link text here</a> <a href="/2">two link '
        'text here</a> <a href="/3">three link text here</a></p>',
        # entities only
        "<p>&quot;quoted&quot; &#39;s &amp; ampersand &nbsp; plus enough "
        "padding text to clear the gate</p>",
        # comment hiding a block + CDATA hiding text
        "<!-- <p>ghost</p> --><![CDATA[<p>ghost2</p>]]><p>visible text "
        "long enough to clear the length gate</p>",
        # unclosed/malformed tag soup
        "<p>broken <b>markup with a stray < angle and enough text to "
        "clear the length gate</p>",
        # empty page
        "<html><head><title>x</title></head><body></body></html>",
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(adversarial)], ["i", "html"]
    )
    got2 = {
        r["i"]: (
            r["extracted_text"], r["n_blocks"], r["n_kept"],
            r["boilerplate_frac"],
        )
        for r in extract_html_text(df, "html").collect()
    }
    for i, h in enumerate(adversarial):
        assert got2[i] == ref(h), (i, got2[i], ref(h))
    assert got2[2][2] == 0  # link farm dropped
    # near-empty page: only the 1-char title survives tag-strip, so
    # nothing is kept and ALL visible chars are boilerplate
    assert got2[6][0] == "" and got2[6][3] == 1.0

    # composition: extracted text feeds the existing gates unchanged
    from n2kupdate_spark.operators.corpus import gopher_metrics

    ex = extract_html_text(
        spark.createDataFrame(
            [(1, "<p>" + " ".join(["tok"] * 60) + "</p>")], ["doc_id", "html"]
        ),
        "html",
    ).select("doc_id", F.col("extracted_text").alias("text"))
    assert gopher_metrics(ex).count() == 1


def test_kn_perplexity_matches_python_reference(spark):
    """r13 (judge item 2): interpolated Kneser-Ney bigram perplexity vs
    an independent python KN implementation (same Chen-Goodman eq. 4.24
    spec, separate code) — exact (doc, n, 4dp logprob, 4dp ppl)
    equality at two sfs; plus behavior pins: OOV tokens fold to <unk>
    under a tiny vocab (model stays total), bigram-table pruning scores
    through the backoff form exactly, and a text made of corpus-common
    bigrams scores lower ppl than one of corpus-rare pairings."""
    import math
    from collections import Counter, defaultdict

    from n2kupdate_spark.operators.corpus import kn_perplexity
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    BOS, UNK = "<s>", "<unk>"

    def fit_ref(texts, max_vocab=65536, max_bigrams=1 << 20):
        toks = {i: [t for t in s.split(" ") if t] for i, s in texts.items()}
        uni = Counter(t for ts in toks.values() for t in ts)
        vocab = set(
            w for w, _ in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[
                :max_vocab
            ]
        )

        def m(w):
            return w if (w == BOS or w in vocab) else UNK

        trans = {
            i: [(m(a), m(b)) for a, b in zip([BOS] + ts[:-1], ts)]
            for i, ts in toks.items()
            if ts
        }
        big = Counter(p for ps in trans.values() for p in ps)
        n1 = sum(1 for c in big.values() if c == 1)
        n2 = sum(1 for c in big.values() if c == 2)
        D = n1 / (n1 + 2.0 * n2) if (n1 + 2 * n2) > 0 else 0.5
        tt = len(big)
        c1 = defaultdict(int)
        nt = defaultdict(int)
        nprec = defaultdict(int)
        for (a, b), c in big.items():
            c1[a] += c
            nt[a] += 1
            nprec[b] += 1
        pcont = {b: k / tt for b, k in nprec.items()}
        kept = set(
            p
            for p, _ in sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))[
                :max_bigrams
            ]
        )

        def logp(a, b):
            lam = D * nt[a] / c1[a] if c1[a] else None
            pc = pcont.get(b, 0.0)
            if (a, b) in kept:
                return math.log(
                    max(big[(a, b)] - D, 0.0) / c1[a] + (D * nt[a] / c1[a]) * pc
                )
            return math.log(lam * pc if lam is not None else pc)

        out = {}
        for i, ps in trans.items():
            lps = [logp(a, b) for a, b in ps]
            avg = sum(lps) / len(lps)
            out[i] = (
                len(lps),
                round(avg * 10000) / 10000 + 0.0,
                round(math.exp(-avg) * 10000) / 10000 + 0.0,
            )
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        texts = {
            r["doc_id"]: r["text"]
            for r in load(spark, sf, "documents", columns=["doc_id", "text"]).collect()
        }
        want = fit_ref(texts)
        got = {
            r["doc_id"]: (r["n_transitions"], r["avg_logprob"], r["ppl"])
            for r in QUERIES["text_perplexity_kn"](spark, sf).collect()
        }
        assert got == want, sf

    # OOV folding: vocab of 3 forces rare words to <unk>, model stays
    # total and equals the reference under the same cap
    mini = {
        0: "a b a b a c",
        1: "a b rare1 rare2 a b",
        2: "c a b a",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in mini.items()], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_transitions"], r["avg_logprob"], r["ppl"])
        for r in kn_perplexity(df, max_vocab=3).collect()
    }
    assert got == fit_ref(mini, max_vocab=3)

    # pruning: keep only the top 2 bigrams — every pruned transition
    # scores through backoff, still matching the reference exactly
    got = {
        r["doc_id"]: (r["n_transitions"], r["avg_logprob"], r["ppl"])
        for r in kn_perplexity(df, max_bigrams=2).collect()
    }
    assert got == fit_ref(mini, max_bigrams=2)

    # fluency direction: common-bigram text beats rare-pairing text
    base = {i: "the cat sat on the mat" for i in range(20)}
    base[100] = "the cat sat on the mat"          # fluent probe
    base[101] = "mat the on cat the sat"          # scrambled probe
    dfb = spark.createDataFrame(
        [(i, t) for i, t in base.items()], ["doc_id", "text"]
    )
    ppl = {r["doc_id"]: r["ppl"] for r in kn_perplexity(dfb).collect()}
    assert ppl[100] < ppl[101]


def test_gate_documents_kn_ppl_gate(spark):
    """r13: the optional kn_ppl_max gate in gate_documents drops exactly
    the docs whose corpus-KN perplexity exceeds the threshold, on top of
    the unchanged gates — survivor set ≡ manual composition."""
    from n2kupdate_spark.operators.corpus import gate_documents, kn_perplexity
    from n2kupdate_spark.sources import load

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents", columns=["doc_id", "text"])
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    ppl = {r["doc_id"]: r["ppl"] for r in kn_perplexity(docs).collect()}
    thr = sorted(ppl.values())[int(len(ppl) * 0.8)]  # drop ~top-20% tail
    base = {r["doc_id"] for r in gate_documents(docs, eval_docs).collect()}
    gated = {
        r["doc_id"]
        for r in gate_documents(docs, eval_docs, kn_ppl_max=thr).collect()
    }
    assert gated == {d for d in base if ppl[d] <= thr}
    assert gated < base  # the gate demonstrably dropped someone


def test_ts_bucketed_apply_equals_per_key(spark):
    """r13: the two-level-key Arrow batching (pmod(hash,B) groups,
    per-key pandas sub-groups) produces BIT-IDENTICAL output to direct
    per-key grouping for both ts ops, at the registered fixture and at
    a skewed B=2 bucket count where collisions are guaranteed."""
    from n2kupdate_spark.operators.timeseries import (
        cusum_changepoints,
        lttb_downsample,
    )
    from n2kupdate_spark.sources import load

    sf = "/root/testdata/sf0.01"
    ev = load(spark, sf, "events", columns=["event_id", "user_id", "ts", "value"]).select(
        "event_id", "user_id", F.col("ts").cast("long").alias("ts_s"), "value"
    )
    for op, kw in (
        (lttb_downsample, dict(order_col="event_id")),
        (cusum_changepoints, dict(order_col="event_id")),
    ):
        base = {tuple(r) for r in op(ev, group_buckets=0, **kw).collect()}
        for b in (None, 2):
            got = {tuple(r) for r in op(ev, group_buckets=b, **kw).collect()}
            assert got == base, (op.__name__, b)
        assert base  # non-vacuous


def test_kn_buckets_match_python_ntile(spark):
    """r13: the CCNet head/middle/tail split recomputed in python from
    the (already reference-pinned) KN scorer output — exact bucket
    equality at two sfs, plus the design contracts: per-lang thirds
    sized like NTILE(3), head ppl ≤ tail ppl within every language."""
    from collections import defaultdict

    from n2kupdate_spark.queries import QUERIES

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ppl = {
            r["doc_id"]: r["ppl"]
            for r in QUERIES["text_perplexity_kn"](spark, sf).collect()
        }
        got = {
            r["doc_id"]: (r["lang"], r["ppl"], r["bucket"])
            for r in QUERIES["text_perplexity_kn_buckets"](spark, sf).collect()
        }
        assert set(got) == set(ppl)
        by_lang = defaultdict(list)
        for did, (lang, p, b) in got.items():
            assert p == ppl[did]
            by_lang[lang].append((p, did, b))
        for lang, rows in by_lang.items():
            rows.sort()
            n = len(rows)
            base, extra = divmod(n, 3)
            sizes = [base + (1 if i < extra else 0) for i in range(3)]
            want = ["head"] * sizes[0] + ["middle"] * sizes[1] + ["tail"] * sizes[2]
            assert [b for _, _, b in rows] == want, lang
            heads = [p for p, _, b in rows if b == "head"]
            tails = [p for p, _, b in rows if b == "tail"]
            assert max(heads) <= min(tails), lang


def test_dedup_lines_c4_matches_python_reference(spark):
    """r13: C4-style global line dedup vs an independent python
    recompute (same fixture derivation + keep-first spec, separate
    code) — exact (text, n_lines, n_kept, 4dp removed_frac) equality at
    two sfs; planted-duplicate contracts: the constant boilerplate
    footer survives in exactly ONE document corpus-wide, each shared
    intro line survives once per div-9 group, and a majority of docs
    are untouched (the dedup is selective, not a shredder)."""
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.queries.dedupq import _BOILER_LINE
    from n2kupdate_spark.sources import load

    def fixture_lines(doc_id, text):
        toks = [t for t in text.split(" ") if t]
        third = max(1, len(toks) // 3)
        l1 = " ".join(toks[:third])
        l2 = " ".join(toks[third : 2 * third])
        l3 = " ".join(toks[2 * third :])
        if doc_id % 3 == 0:
            l1 = f"shared intro block {doc_id // 9}"
        lines = [l1, l2, l3]
        if doc_id % 5 == 0:
            lines.append(_BOILER_LINE)
        return lines

    def ref(texts):
        seen = set()
        out = {}
        for did in sorted(texts):
            lines = fixture_lines(did, texts[did])
            kept = []
            for ln in lines:
                if len(ln) < 1:
                    kept.append(ln)
                    continue
                if ln in seen:
                    continue
                seen.add(ln)
                kept.append(ln)
            if kept:
                rf = round((len(lines) - len(kept)) / len(lines) * 10000) / 10000
                out[did] = ("\n".join(kept), len(lines), len(kept), rf + 0.0)
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        texts = {
            r["doc_id"]: r["text"]
            for r in load(spark, sf, "documents", columns=["doc_id", "text"]).collect()
        }
        want = ref(texts)
        got = {
            r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"], r["removed_frac"])
            for r in QUERIES["dedup_lines_c4"](spark, sf).collect()
        }
        assert got == want, sf
        survivors = [d for d, (t, *_id) in got.items() if _BOILER_LINE in t]
        assert survivors == [0]
        untouched = sum(1 for v in got.values() if v[3] == 0.0)
        assert untouched > len(got) / 2
        # each shared-intro line survives exactly once corpus-wide
        from collections import Counter

        intro_counts = Counter(
            ln
            for t, *_ in got.values()
            for ln in t.split("\n")
            if ln.startswith("shared intro block ")
        )
        assert intro_counts and set(intro_counts.values()) == {1}


def test_diag_gate_sweep_matches_python_recompute(spark):
    """r13: the gate-threshold sweep table ≡ a python recompute from the
    two already-pinned scorers (gopher n_words, KN ppl) — exact 9-row
    equality at two sfs including the percentile cutoffs (numpy linear
    interpolation ≡ Spark exact percentile) — plus monotonicity: more
    words required / tighter ppl never ADDS survivors."""
    import numpy as np

    from n2kupdate_spark.operators.corpus import gopher_metrics, kn_perplexity
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        d = load(spark, sf, "documents", columns=["doc_id", "text"])
        words = {r["doc_id"]: r["n_words"] for r in gopher_metrics(d).collect()}
        ppl = {r["doc_id"]: r["ppl"] for r in kn_perplexity(d).collect()}
        vals = np.array([ppl[i] for i in sorted(ppl)])
        n_docs = len(words)
        want = {}
        for mw in (30, 50, 70):
            for pct in (50, 75, 90):
                cut = round(float(np.percentile(vals, pct)) * 10000) / 10000
                n = sum(
                    1
                    for i in words
                    if words[i] >= mw and i in ppl and ppl[i] <= cut
                )
                want[(mw, f"p{pct}")] = (
                    cut,
                    n,
                    round(n / n_docs * 10000) / 10000 + 0.0,
                )
        got = {
            (r["min_words"], r["ppl_pct"]): (
                r["ppl_cutoff"], r["n_survivors"], r["survivor_frac"],
            )
            for r in QUERIES["diag_gate_sweep"](spark, sf).collect()
        }
        assert got == want, sf
        for pct in ("p50", "p75", "p90"):
            ns = [got[(mw, pct)][1] for mw in (30, 50, 70)]
            assert ns == sorted(ns, reverse=True)
        for mw in (30, 50, 70):
            ns = [got[(mw, p)][1] for p in ("p50", "p75", "p90")]
            assert ns == sorted(ns)


def test_corpus_crawl_pipeline_composition(spark):
    """r13: the crawl-half composite ≡ python-side composition of its
    library stages run independently (extract_html_text with newline
    block separator → dedup_lines_global → gate_documents with the
    composite's documented fixture adaptations), aggregated to the
    funnel table in plain python. Also pins the funnel is non-trivial:
    every stage demonstrably removes something at sf0.001."""
    from collections import defaultdict

    from n2kupdate_spark.operators.corpus import (
        extract_html_text,
        gate_documents,
    )
    from n2kupdate_spark.operators.dedup import dedup_lines_global
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.queries.text import _EVAL_PRED_SQL, _pseudo_html
    from n2kupdate_spark.sources import load

    sf = "/root/testdata/sf0.001"
    d = load(spark, sf, "documents", columns=["doc_id", "source", "text"])
    pages = d.select("doc_id", "source", _pseudo_html().alias("html"))
    pages = pages.withColumn(
        "html",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("html"),
                F.lit(
                    "<footer><p>all rights reserved - subscribe to the "
                    "weekly newsletter for updates and offers</p></footer>"
                ),
            ),
        ).otherwise(F.col("html")),
    )
    extracted = extract_html_text(pages, "html", block_sep="\n").select(
        "doc_id", F.col("extracted_text").alias("text")
    )
    deduped = dedup_lines_global(extracted).select(
        "doc_id", F.regexp_replace("text", "\n", " ").alias("text")
    )
    clean = deduped.join(d.select("doc_id", "source"), "doc_id")
    is_eval = F.expr(_EVAL_PRED_SQL)
    survivors = gate_documents(
        clean.filter(~is_eval),
        eval_docs=clean.filter(is_eval),
        gopher_kwargs={"min_words": 30},
        decontam_budget=8,
    ).collect()

    src_of = {r["doc_id"]: r["source"] for r in d.collect()}
    want = defaultdict(lambda: [0, 0, 0, 0])
    for did, s in src_of.items():
        want[s][0] += 1
    for r in clean.collect():
        want[r["source"]][1] += 1
    for r in survivors:
        want[r["source"]][2] += 1
        want[r["source"]][3] += len(r["text"])
    got = {
        r["source"]: [
            r["n_pages"], r["n_after_crawl"], r["n_final"], r["chars_final"]
        ]
        for r in QUERIES["corpus_crawl_pipeline"](spark, sf).collect()
    }
    assert got == {s: list(v) for s, v in want.items()}
    tp = sum(v[0] for v in got.values())
    tf = sum(v[2] for v in got.values())
    assert 0 < tf < tp  # the funnel removes something and keeps something
    # the planted footer survives extraction+dedup exactly once corpus-wide
    foot = "all rights reserved - subscribe to the weekly newsletter"
    n_foot = sum(1 for r in deduped.collect() if foot in r["text"])
    assert n_foot == 1


def test_r13_ops_empty_input_degenerate(spark):
    """r13: the round's new fit/eval ops degrade to TYPED EMPTY frames
    on empty or feature-less input instead of crashing driver-side
    (int(None) / float(None) / np.stack([]) — the empty-input class the
    r11/r12 advice flagged in other ops)."""
    from n2kupdate_spark.operators.corpus import (
        extract_html_text,
        kn_perplexity,
    )
    from n2kupdate_spark.operators.dedup import dedup_lines_global

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert kn_perplexity(empty).collect() == []
    assert kn_perplexity(
        spark.createDataFrame([(1, ""), (2, "  ")], ["doc_id", "text"])
    ).collect() == []
    assert dedup_lines_global(empty).collect() == []
    assert (
        extract_html_text(
            spark.createDataFrame([], "doc_id long, html string"), "html"
        ).collect()
        == []
    )

    # embed_mrl_recall with an empty embeddings table
    import n2kupdate_spark.queries.ann as ann_mod
    from n2kupdate_spark.queries.ann import embed_mrl_recall

    real_load = ann_mod.load
    try:
        ann_mod.load = lambda s, sf, tbl, columns=None: spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        out = embed_mrl_recall(spark, "unused")
        assert out.collect() == []
        assert [f.name for f in out.schema.fields] == [
            "prefix_dim", "recall_at_10", "n_queries",
        ]
    finally:
        ann_mod.load = real_load

    # diag_gate_sweep with an all-empty-text corpus
    import n2kupdate_spark.queries.diagnostics as diag_mod
    from n2kupdate_spark.queries.diagnostics import diag_gate_sweep

    real_load2 = diag_mod.load
    try:
        diag_mod.load = lambda s, sf, tbl, columns=None: spark.createDataFrame(
            [(1, ""), (2, "")], ["doc_id", "text"]
        )
        out = diag_gate_sweep(spark, "unused")
        assert out.collect() == []
    finally:
        diag_mod.load = real_load2


def test_blocklist_filter_matches_python_reference(spark):
    """r13: the C4 blocklist gate ≡ an independent python recompute at
    two sfs, plus the rule contracts: whole-token only (the planted
    substring collider "zorblaxes" never flags), case-insensitive (the
    uppercased marker flags), empty blocklist = nothing blocked, and
    multi-hit docs count every occurrence."""
    from n2kupdate_spark.operators.corpus import blocklist_filter
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.queries.text import _BLOCKLIST_DEMO
    from n2kupdate_spark.sources import load

    terms = {t.lower() for t in _BLOCKLIST_DEMO}

    def fixture_text(doc_id, text):
        if doc_id % 14 == 0:
            text += " ZORBLAX"
        elif doc_id % 7 == 0:
            text += " zorblax quuxbad"
        if doc_id % 11 == 0:
            text += " zorblaxes"
        return text

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        texts = {
            r["doc_id"]: fixture_text(r["doc_id"], r["text"])
            for r in load(spark, sf, "documents", columns=["doc_id", "text"]).collect()
        }
        want = {}
        for did, t in texts.items():
            n = sum(1 for tok in t.lower().split(" ") if tok in terms)
            want[did] = (n, n > 0)
        got = {
            r["doc_id"]: (r["n_blocked_terms"], r["blocked"])
            for r in QUERIES["text_blocklist_filter"](spark, sf).collect()
        }
        assert got == want, sf
        # planted contracts
        assert all(got[d][1] for d in got if d % 7 == 0)
        assert all(
            not got[d][1] for d in got if d % 11 == 0 and d % 7 != 0
        )  # substring collider never flags
        assert any(got[d][0] == 2 for d in got if d % 7 == 0 and d % 14 != 0)

    # empty blocklist: nothing blocked, typed columns intact
    df = spark.createDataFrame([(1, "a zorblax b")], ["doc_id", "text"])
    out = blocklist_filter(df, ()).collect()
    assert out == [(1, 0, False)] or (
        out[0]["n_blocked_terms"] == 0 and out[0]["blocked"] is False
    )


def test_winsorize_clamp_matches_numpy(spark):
    """r13: per-key winsorization ≡ an independent numpy recompute
    (np.percentile linear interpolation ≡ Spark exact percentile) at
    two sfs, plus the clamp algebra: output within [p05, p95] per key,
    clipped ⇔ value outside the band, unclipped values pass through
    (4dp), row count preserved, and winsorize(winsorize(x)) is a
    fixpoint for the already-clamped column."""
    import numpy as np
    from collections import defaultdict

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = load(spark, sf, "events", columns=["user_id", "ts", "value"]).select(
            "user_id",
            F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
            "value",
        ).collect()
        by_user = defaultdict(list)
        for r in ev:
            by_user[r["user_id"]].append(r["value"])
        bands = {
            u: (float(np.percentile(vs, 5)), float(np.percentile(vs, 95)))
            for u, vs in by_user.items()
        }
        got = QUERIES["ts_winsorize_clamp"](spark, sf).collect()
        assert len(got) == len(ev)
        want_rows = set()
        for r in ev:
            lo, hi = bands[r["user_id"]]
            c = max(lo, min(hi, r["value"]))
            want_rows.add(
                (r["user_id"], r["ts_s"], r["value"],
                 round(c * 10000) / 10000 + 0.0, r["value"] != c)
            )
        got_rows = {
            (r["user_id"], r["ts_s"], r["value"], r["value_w"], r["clipped"])
            for r in got
        }
        assert got_rows == want_rows, sf
        for r in got:
            lo, hi = bands[r["user_id"]]
            assert lo - 1e-9 <= r["value_w"] <= hi + 1e-9
            if not r["clipped"]:
                assert r["value_w"] == round(r["value"] * 10000) / 10000 + 0.0
        assert any(r["clipped"] for r in got)  # non-vacuous


def test_gate_documents_blocklist_gate(spark):
    """r13: the optional blocklist_terms gate in gate_documents drops
    exactly the docs the standalone blocklist_filter flags, on top of
    the unchanged gates — survivor set ≡ manual composition."""
    from n2kupdate_spark.operators.corpus import blocklist_filter, gate_documents
    from n2kupdate_spark.sources import load

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents", columns=["doc_id", "text"]).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 9 == 0, F.concat("text", F.lit(" plantedbad"))
        ).otherwise(F.col("text")).alias("text"),
    )
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    base = {r["doc_id"] for r in gate_documents(docs, eval_docs).collect()}
    gated = {
        r["doc_id"]
        for r in gate_documents(
            docs, eval_docs, blocklist_terms=("plantedbad",)
        ).collect()
    }
    flagged = {
        r["doc_id"]
        for r in blocklist_filter(docs, ("plantedbad",)).collect()
        if r["blocked"]
    }
    assert gated == base - flagged
    assert gated < base  # the gate demonstrably dropped someone


def test_contamination_report_matches_python_and_duality(spark):
    """r13: the eval-side contamination report ≡ an independent python
    recompute at two sfs, its budget constant is in lockstep with the
    decontamination composite's, and DUALITY holds: the total of
    (eval, train) leaking pairs seen from the eval side equals the
    number seen from the train side under the same budget."""
    from collections import defaultdict

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.queries.mlprep import _DECONTAM_BUDGET
    from n2kupdate_spark.queries.text import _DECONTAM_BUDGET_R
    from n2kupdate_spark.sources import load

    assert _DECONTAM_BUDGET_R == _DECONTAM_BUDGET  # lockstep guard

    def grams(text, n=3):
        toks = [t for t in text.split(" ") if t]
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = {
            r["doc_id"]: r["text"]
            for r in load(spark, sf, "documents", columns=["doc_id", "text"]).collect()
        }
        ev = {d: grams(t) for d, t in docs.items() if d % 97 == 0}
        tr = {d: grams(t) for d, t in docs.items() if d % 97 != 0}
        want = {}
        pair_total = 0
        for e, eg in ev.items():
            overlaps = []
            for t, tg in tr.items():
                sh = len(eg & tg)
                if sh >= _DECONTAM_BUDGET_R:
                    overlaps.append(sh)
            pair_total += len(overlaps)
            want[e] = (
                len(overlaps),
                max(overlaps) if overlaps else 0,
                sum(overlaps),
            )
        got = {
            r["doc_id"]: (
                r["n_leaking_train_docs"],
                r["max_shared_grams"],
                r["total_shared_grams"],
            )
            for r in QUERIES["text_contamination_report"](spark, sf).collect()
        }
        assert got == want, sf
        assert set(got) == set(ev)  # zeros kept: every eval item present
        # duality with the train-side gate at the same budget
        train_side = sum(
            1
            for e, eg in ev.items()
            for t, tg in tr.items()
            if len(eg & tg) >= _DECONTAM_BUDGET_R
        )
        assert sum(v[0] for v in got.values()) == train_side == pair_total


def test_ewma_matches_pandas_ewm(spark):
    """r13: per-key EWMA ≡ pandas ewm(alpha, adjust=False).mean() — an
    independent implementation of the same recursion — at the registered
    fixture, plus: bucketed ≡ per-key dispatch, smoothing reduces
    variance on a noisy planted series, and a constant series is a
    fixpoint."""
    import numpy as np
    import pandas as pd

    from n2kupdate_spark.operators.timeseries import ewma_smooth
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    sf = "/root/testdata/sf0.01"
    ev = load(spark, sf, "events", columns=["user_id", "event_id", "value", "ts"]).select(
        "user_id", "event_id", "value",
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
    ).toPandas()
    want = {}
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_s", "event_id"], kind="mergesort")
        sm = g["value"].ewm(alpha=0.2, adjust=False).mean().to_numpy()
        sm = np.round(sm * 10000) / 10000 + 0.0
        for (_, r), y in zip(g.iterrows(), sm):
            want[(uid, r["ts_s"], r["value"])] = y
    got = {
        (r["user_id"], r["ts_s"], r["value"]): r["ewma"]
        for r in QUERIES["ts_ewma_smooth"](spark, sf).collect()
    }
    assert got == want

    # bucketed ≡ per-key, incl. forced collisions
    e = load(spark, sf, "events", columns=["user_id", "event_id", "value", "ts"]).select(
        "user_id", "event_id", "value",
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
    )
    base = {tuple(r) for r in ewma_smooth(e, order_col="event_id", group_buckets=0).collect()}
    for b in (None, 2):
        assert {tuple(r) for r in ewma_smooth(e, order_col="event_id", group_buckets=b).collect()} == base

    # behavior: constant series fixpoint; noisy series variance shrinks
    rows = [(1, i, 5.0, i) for i in range(30)]
    rng = np.random.RandomState(7)
    rows += [(2, i, float(10 + rng.randn()), i) for i in range(200)]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "value", "ts_s"])
    out = ewma_smooth(df, order_col="event_id").collect()
    c = [r for r in out if r["user_id"] == 1]
    assert all(r["ewma"] == 5.0 for r in c)
    noisy = [r for r in out if r["user_id"] == 2]
    raw_var = float(np.var([r["value"] for r in noisy]))
    sm_var = float(np.var([r["ewma"] for r in noisy]))
    assert sm_var < raw_var * 0.5


def test_fineweb_quality_matches_python_recompute(spark):
    """r13: the three FineWeb filters ≡ an independent python recompute
    (same fixture derivation, separate code) — exact full-table equality
    at two sfs — plus: every rule fires BOTH ways on the fixture, a
    zero-line doc fails all three, and the operator's thresholds are the
    published ones."""
    import re

    from n2kupdate_spark.operators.corpus import fineweb_quality
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.queries.dedupq import _BOILER_LINE
    from n2kupdate_spark.sources import load

    def fixture_lines(doc_id, text):
        toks = [t for t in text.split(" ") if t]
        third = max(1, len(toks) // 3)
        l1 = " ".join(toks[:third])
        l2 = " ".join(toks[third : 2 * third])
        l3 = " ".join(toks[2 * third :])
        if doc_id % 3 == 0:
            l1 = f"shared intro block {doc_id // 9}"
        lines = [l1, l2, l3]
        if doc_id % 5 == 0:
            lines.append(_BOILER_LINE)
        if doc_id % 7 < 4:
            lines = [ln + "." for ln in lines]
        if doc_id % 11 == 0:
            lines = lines + [lines[-1]]
        if doc_id % 13 == 0:
            lines = ["- alpha", "- beta", "- gamma", "- delta", "- epsilon",
                     "- zeta", "- eta", "- theta",
                     "the one genuinely long sentence on this page carries "
                     "enough characters to clear the short-line bar."]
        return [ln.strip() for ln in lines if ln.strip()]

    def ref(doc_id, text):
        lines = fixture_lines(doc_id, text)
        n = len(lines)
        if n == 0:
            return (0, 0.0, 0.0, 0.0, False, False, False, False)
        chars = sum(len(ln) for ln in lines)
        from collections import Counter

        cnt = Counter(lines)
        dup_chars = sum((c - 1) * len(ln) for ln, c in cnt.items())
        punct = sum(1 for ln in lines if re.search(r'[.!?"]$', ln))
        short = sum(1 for ln in lines if len(ln) < 30)
        r4 = lambda x: round(x * 10000) / 10000 + 0.0  # noqa: E731
        pf, df, sfr = r4(punct / n), r4(dup_chars / chars), r4(short / n)
        pp, dp, sp = pf > 0.12, df < 0.10, sfr < 0.67
        return (n, pf, df, sfr, pp, dp, sp, pp and dp and sp)

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        texts = {
            r["doc_id"]: r["text"]
            for r in load(spark, sf, "documents", columns=["doc_id", "text"]).collect()
        }
        want = {did: ref(did, t) for did, t in texts.items()}
        got = {
            r["doc_id"]: (
                r["n_lines"], r["punct_line_frac"], r["dup_line_char_frac"],
                r["short_line_frac"], r["punct_pass"], r["dup_pass"],
                r["short_pass"], r["fineweb_pass"],
            )
            for r in QUERIES["text_quality_fineweb"](spark, sf).collect()
        }
        assert got == want, sf
        # every rule fires both ways on the fixture
        for i in (4, 5, 6):
            assert any(v[i] for v in got.values()), i
            assert any(not v[i] for v in got.values()), i
        assert any(v[7] for v in got.values())
        assert any(not v[7] for v in got.values())

    # zero-line + adversarial unit rows
    rows = [
        (1, ""),                        # zero nonempty lines -> all fail
        (2, "   \n \n"),               # whitespace only -> all fail
        (3, "A full sentence that is long enough to clear the bar.\n"
            "Another properly terminated sentence, also long enough."),
        (4, "dup line dup line dup line\ndup line dup line dup line\n"
            "a genuinely different long line that ends properly."),
        (5, "A proper CRLF-terminated sentence of decent length here.\r\n"
            "\tAnother tab-indented sentence that also terminates well.\r\n"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    u = {r["doc_id"]: r for r in fineweb_quality(df).collect()}
    assert u[1]["n_lines"] == 0 and not u[1]["fineweb_pass"]
    assert u[2]["n_lines"] == 0 and not u[2]["fineweb_pass"]
    assert u[3]["fineweb_pass"]
    assert not u[4]["dup_pass"] and u[4]["dup_line_char_frac"] > 0.10
    # CRLF must not smuggle \r past the punct anchor; tabs strip
    assert u[5]["n_lines"] == 2 and u[5]["punct_line_frac"] == 1.0
    assert u[5]["fineweb_pass"]


def test_autocorr_matches_python_and_plan(spark):
    """r13: per-key ACF ≡ an independent python recompute of the DIRECT
    centered formula (the Spark side uses the algebraic expansion — a
    different computation of the same statistic) at two sfs; behavior:
    a planted period-4 series peaks at lag 4, white noise stays small,
    constant/short series emit nothing; plan: the lag window and the
    per-key aggregate share ONE exchange."""
    import numpy as np

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.queries.mlprep import _autocorrelation
    from n2kupdate_spark.sources import load

    def ref_acf(vals, max_lag=10):
        x = np.asarray(vals, dtype=float)
        n = len(x)
        m = x.mean()
        c0 = float(((x - m) ** 2).sum())
        out = {}
        if c0 <= 0:
            return out
        for k in range(1, max_lag + 1):
            if n <= k:
                break
            ck = float(((x[:-k] - m) * (x[k:] - m)).sum())
            out[k] = (n, float(np.round(ck / c0 * 10000) / 10000 + 0.0))
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = (
            load(spark, sf, "events", columns=["user_id", "event_id", "value", "ts"])
            .select(
                "user_id", "event_id", "value",
                F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
            )
            .toPandas()
        )
        want = {}
        for uid, g in ev.groupby("user_id"):
            g = g.sort_values(["ts_s", "event_id"], kind="mergesort")
            for k, (n, a) in ref_acf(g["value"].tolist()).items():
                want[(uid, k)] = (n, a)
        got = {
            (r["user_id"], r["lag"]): (r["n"], r["acf"])
            for r in QUERIES["ts_autocorr"](spark, sf).collect()
        }
        assert got == want, sf

    # behavior: planted period-4 signal, white noise, constant, short
    rng = np.random.RandomState(11)
    rows = []
    for i in range(400):
        rows.append((1, i, float([0.0, 5.0, 0.0, -5.0][i % 4] + 0.01 * rng.randn()), i))
    for i in range(400):
        rows.append((2, i, float(rng.randn()), i))
    rows += [(3, i, 7.0, i) for i in range(50)]          # constant: no rows
    rows += [(4, i, float(i), i) for i in range(3)]      # short: lags 1..2 only
    # key 5: white noise with every 7th observation NULLed — nulls are
    # dropped BEFORE the lag pairing, so the result must equal the ACF
    # of the compacted non-null series (n counts non-null only)
    noisy = [None if i % 7 == 0 else float(rng.randn()) for i in range(200)]
    rows += [(5, i, v, i) for i, v in enumerate(noisy)]
    df = spark.createDataFrame(rows, "user_id: long, event_id: long, value: double, ts_s: long")
    out = _autocorrelation(df, order_cols=("ts_s", "event_id"))
    got = {(r["user_id"], r["lag"]): r["acf"] for r in out.collect()}
    assert got[(1, 4)] > 0.95 and got[(1, 8)] > 0.95
    assert got[(1, 2)] < -0.9  # anti-phase at half period
    assert all(abs(got[(2, k)]) < 0.15 for k in range(1, 11))
    assert not any(u == 3 for (u, _k) in got)
    assert {k for (u, k) in got if u == 4} == {1, 2}
    want5 = ref_acf([v for v in noisy if v is not None])
    got5 = {
        r["lag"]: (r["n"], r["acf"])
        for r in out.filter(F.col("user_id") == 5).collect()
    }
    assert got5 == want5

    # plan: exactly ONE exchange (window + agg share the user hash)
    plan = QUERIES["ts_autocorr"](spark, "/root/testdata/sf0.01")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_readability_matches_python_recompute(spark):
    """r13: Flesch metrics ≡ an independent python recompute (same
    fixture decoration, separate scoring code) — exact full-table
    equality at two sfs — plus direction pins: a short-simple-word text
    reads dramatically easier than a polysyllabic run-on, vowel-less
    words still count one syllable, unpunctuated text floors at one
    sentence, empty text scores NULL."""
    import re

    from n2kupdate_spark.operators.corpus import readability_scores
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    def ref(doc_id, text):
        toks = [t for t in text.split(" ") if t]
        k = 7 + doc_id % 5
        toks = [w + "." if (i + 1) % k == 0 else w for i, w in enumerate(toks)]
        decorated = " ".join(toks)
        if doc_id % 3 == 0:
            decorated += (" extraordinarily sophisticated characterization of "
                          "multidimensional organizations.")
        import re as _re

        words = [w for w in _re.split(r"\s+", decorated.lower()) if w]
        n_w = len(words)
        if n_w == 0:
            return (0, 1, None, None, None)
        n_s = max(1, len(re.findall(r"[.!?]+", decorated)))
        n_sy = sum(max(1, len(re.findall(r"[aeiouy]+", w))) for w in words)
        import math

        # floor(x*1e4 + 0.5): the half-up-via-floor convention the
        # operator documents (exact-half ratios are common here; see
        # readability_scores), association mirrored term for term
        r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000 + 0.0  # noqa: E731
        wps, spw = n_w / n_s, n_sy / n_w
        ease = r4(206.835 - 1.015 * wps - 84.6 * spw)
        grade = r4(0.39 * wps + 11.8 * spw - 15.59)
        return (n_w, n_s, n_sy, ease, grade)

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        texts = {
            r["doc_id"]: r["text"]
            for r in load(spark, sf, "documents", columns=["doc_id", "text"]).collect()
        }
        want = {did: ref(did, t) for did, t in texts.items()}
        got = {
            r["doc_id"]: (r["n_words"], r["n_sentences"], r["n_syllables"],
                          r["flesch_ease"], r["fk_grade"])
            for r in QUERIES["text_readability"](spark, sf).collect()
        }
        assert got == want, sf

    rows = [
        (1, "the cat sat. the dog ran. we go up."),
        (2, "extraordinarily sophisticated multidimensional characterization "
            "nevertheless accommodates incomprehensible organizational "
            "responsibilities notwithstanding unintelligible recommendations"),
        (3, "xyzzy grr pfft"),   # two y-groups in xyzzy; grr/pfft floor at 1
        (4, "no punctuation here at all"),
        (6, "the cat sat.\nthe dog ran.\nwe go up."),  # ≡ doc 1 via \s+ split
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    u = {r["doc_id"]: r for r in readability_scores(df).collect()}
    assert u[1]["flesch_ease"] > 90 and u[1]["fk_grade"] < 2
    assert u[2]["flesch_ease"] < 0 and u[2]["fk_grade"] > 20
    assert u[3]["n_syllables"] == 4
    assert u[4]["n_sentences"] == 1
    assert u[5]["n_words"] == 0 and u[5]["flesch_ease"] is None
    assert (u[6]["n_words"], u[6]["flesch_ease"]) == (u[1]["n_words"], u[1]["flesch_ease"])


def test_dedup_overlap_matches_python_sets(spark):
    """r13: the dedup-strategy Venn ≡ a python set recompute from the
    three registered (independently pinned) dedup outputs, at two sfs;
    plus the structural contract exact ⊆ near (identical text is
    Jaccard 1.0, so no Venn cell has exact=True, near=False) and a
    non-trivial semantic-only cell (the marginal value of the
    embedding pass is visible on the fixture)."""
    from n2kupdate_spark.queries import QUERIES

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        fp_rows = QUERIES["dedup_text_exact"](spark, sf).collect()
        by_fp = {}
        for r in fp_rows:
            by_fp.setdefault(r["fp"], []).append(r["doc_id"])
        exact = {d for ids in by_fp.values() for d in ids if d != min(ids)}
        near = {
            r["doc_id"]
            for r in QUERIES["dedup_cc_clusters"](spark, sf).collect()
            if r["doc_id"] != r["cluster_id"]
        }
        sem = {r["drop_id"] for r in QUERIES["dedup_semantic_clusters"](spark, sf).collect()}
        want = {}
        for d in exact | near | sem:
            key = (d in exact, d in near, d in sem)
            want[key] = want.get(key, 0) + 1
        got = {
            (r["exact"], r["near"], r["semantic"]): r["n_docs"]
            for r in QUERIES["diag_dedup_overlap"](spark, sf).collect()
        }
        assert got == want, sf
        assert not any(e and not n for (e, n, _s) in got), "exact must imply near"
        assert got.get((False, False, True), 0) > 0, "semantic-only cell empty"
        labels = {
            r["methods"]
            for r in QUERIES["diag_dedup_overlap"](spark, sf).collect()
        }
        assert all("+" in m or m in ("exact", "near", "semantic") for m in labels)


def test_langid_confusion_matches_python(spark):
    """r13: the held-out confusion matrix ≡ a python recompute from the
    already-pinned classifier output at two sfs; marginals: recall_frac
    sums to 1 per true lang, precision_frac to 1 per predicted lang,
    cell counts sum to the holdout size."""
    from n2kupdate_spark.queries import QUERIES

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        scored = [
            (r["lang"], r["pred_lang"])
            for r in QUERIES["text_langid_hashgram"](spark, sf).collect()
            if r["holdout"]
        ]
        cells = {}
        for t, p in scored:
            cells[(t, p)] = cells.get((t, p), 0) + 1
        import math

        tmarg = {}
        pmarg = {}
        for (t, p), n in cells.items():
            tmarg[t] = tmarg.get(t, 0) + n
            pmarg[p] = pmarg.get(p, 0) + n
        # floor-half-up to mirror the op (exact halves are common on
        # small-integer marginals; python round() is half-even)
        want = {
            (t, p): (
                n,
                math.floor(n * 10000.0 / tmarg[t] + 0.5) / 10000,
                math.floor(n * 10000.0 / pmarg[p] + 0.5) / 10000,
            )
            for (t, p), n in cells.items()
        }
        got = {
            (r["lang"], r["pred_lang"]): (r["n"], r["recall_frac"], r["precision_frac"])
            for r in QUERIES["diag_langid_confusion"](spark, sf).collect()
        }
        assert got == want, sf
        assert sum(n for n, _r, _p in got.values()) == len(scored)
        for t in tmarg:
            assert abs(sum(r for (tt, _p), (_n, r, _pr) in got.items() if tt == t) - 1.0) < 1e-3


def test_zipf_fit_matches_numpy(spark):
    """r13: the Zipf fit row ≡ an independent numpy polyfit recompute
    from the collected token counts at two sfs, and a PLANTED perfect
    Zipf corpus (freq ∝ 1/rank^1.2) recovers exponent 1.2 with R² ≈ 1
    while a uniform-frequency corpus fits slope ≈ 0."""
    import numpy as np

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.queries.diagnostics import text_zipf_fit
    from n2kupdate_spark.sources import load

    def ref(counts, k=200):
        import re
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        x = np.log(np.arange(1, len(top) + 1, dtype=float))
        y = np.log(np.array([c for _w, c in top], dtype=float))
        n = len(x)
        sx, sy = x.sum(), y.sum()
        sxy, sxx, syy = (x * y).sum(), (x * x).sum(), (y * y).sum()
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        r4 = lambda v: round(v * 10000) / 10000 + 0.0  # noqa: E731
        return (len(counts), n, r4(-slope), r4(intercept), r4(r2))

    import re as _re

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        counts = {}
        for r in load(spark, sf, "documents", columns=["text"]).collect():
            for w in _re.split(r"\s+", r["text"].lower()):
                if w:
                    counts[w] = counts.get(w, 0) + 1
        want = ref(counts)
        row = QUERIES["text_zipf_fit"](spark, sf).collect()[0]
        got = (row["n_types"], row["n_fit"], row["zipf_exponent"],
               row["intercept"], row["r2"])
        assert got == want, sf

    # planted perfect Zipf with s = 1.2 over 50 types
    rows = []
    did = 0
    for rank in range(1, 51):
        c = max(1, round(10000 / rank ** 1.2))
        rows.append((did, " ".join([f"w{rank:03d}"] * c)))
        did += 1
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    import n2kupdate_spark.sources as srcs

    orig = srcs.load
    try:
        srcs.load = lambda spark_, sf_, t, columns=None: df.select(columns or df.columns)
        import n2kupdate_spark.queries.diagnostics as diag
        orig_load = diag.load
        diag.load = srcs.load
        row = text_zipf_fit(spark, "ignored").collect()[0]
        assert abs(row["zipf_exponent"] - 1.2) < 0.02, row
        assert row["r2"] > 0.999
        # uniform frequencies -> slope ~ 0
        rows_u = [(i, " ".join([f"u{i:03d}"] * 40)) for i in range(50)]
        dfu = spark.createDataFrame(rows_u, "doc_id: long, text: string")
        diag.load = lambda spark_, sf_, t, columns=None: dfu.select(columns or dfu.columns)
        row_u = text_zipf_fit(spark, "ignored").collect()[0]
        assert abs(row_u["zipf_exponent"]) < 1e-9
    finally:
        srcs.load = orig
        diag.load = orig_load


def test_corpus_quality_report_matches_python(spark):
    """r13: the per-source dashboard ≡ a python rollup recomputed from
    the four pinned scorer outputs at two sfs (4dp means compared with a
    1-ulp-at-4dp tolerance — the feeds are pinned exactly; only the
    rollup's summation order is engine-specific)."""
    import numpy as np

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        src = {
            r["doc_id"]: r["source"]
            for r in load(spark, sf, "documents", columns=["doc_id", "source"]).collect()
        }
        gop = {r["doc_id"]: r["gopher_pass"] for r in QUERIES["text_quality_gopher"](spark, sf).collect()}
        fw = {r["doc_id"]: r["fineweb_pass"] for r in QUERIES["text_quality_fineweb"](spark, sf).collect()}
        rd = {r["doc_id"]: r["flesch_ease"] for r in QUERIES["text_readability"](spark, sf).collect()}
        kn = {r["doc_id"]: r["ppl"] for r in QUERIES["text_perplexity_kn"](spark, sf).collect()}
        per_src = {}
        for d, s in src.items():
            per_src.setdefault(s, []).append(d)
        want = {}
        for s, ids in per_src.items():
            want[s] = (
                len(ids),
                round(float(np.mean([float(gop.get(d) or 0) for d in ids])) * 10000) / 10000,
                round(float(np.mean([float(fw.get(d) or 0) for d in ids])) * 10000) / 10000,
                round(float(np.mean([rd[d] for d in ids if rd.get(d) is not None])) * 10000) / 10000,
                round(float(np.mean([kn[d] for d in ids if kn.get(d) is not None])) * 10000) / 10000,
            )
        got = {
            r["source"]: (r["n_docs"], r["gopher_pass_frac"], r["fineweb_pass_frac"],
                          r["mean_flesch_ease"], r["mean_kn_ppl"])
            for r in QUERIES["corpus_quality_report"](spark, sf).collect()
        }
        assert set(got) == set(want), sf
        for s in want:
            assert got[s][0] == want[s][0], (sf, s)
            for i in range(1, 5):
                assert abs(got[s][i] - want[s][i]) <= 1e-4 + 1e-9, (sf, s, i, got[s], want[s])
        # every metric column is non-degenerate somewhere
        assert any(v[1] > 0 for v in got.values()) and any(v[1] < 1 for v in got.values())


def test_holt_winters_matches_python_and_forecasts(spark):
    """r13: per-type Holt–Winters ≡ an independent python recompute of
    the textbook recursions (separate code, same init spec) at two sfs
    incl. the 24-hour forecast tail; bucketed ≡ per-key dispatch;
    behavior: a planted exactly-periodic series fits with near-zero
    residuals after warmup and its future forecast continues the
    pattern; series shorter than two seasons emit nothing."""
    import numpy as np

    from n2kupdate_spark.operators.timeseries import holt_winters
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    def ref_hw(xs, tss, m=24, a=0.2, b_=0.1, g=0.3, horizon=24, step=3600):
        n = len(xs)
        if n < 2 * m:
            return []
        l = float(np.mean(xs[:m]))
        b = float((np.mean(xs[m:2 * m]) - np.mean(xs[:m])) / m)
        s = [x - float(np.mean(xs[:m])) for x in xs[:m]]
        out = []
        for t in range(m, n):
            si = t % m
            f = l + b + s[si]
            ln = a * (xs[t] - s[si]) + (1 - a) * (l + b)
            b = b_ * (ln - l) + (1 - b_) * b
            s[si] = g * (xs[t] - ln) + (1 - g) * s[si]
            l = ln
            r4 = lambda v: round(v * 10000) / 10000 + 0.0  # noqa: E731
            out.append((tss[t], xs[t], r4(f), r4(xs[t] - f)))
        for k in range(1, horizon + 1):
            f = l + k * b + s[(n + k - 1) % m]
            r4 = lambda v: round(v * 10000) / 10000 + 0.0  # noqa: E731
            out.append((tss[-1] + k * step, None, r4(f), None))
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = (
            load(spark, sf, "events", columns=["ts", "event_type"])
            .select(
                "event_type",
                (F.floor(F.unix_timestamp(F.date_trunc("second", F.col("ts"))) / 3600) * 3600)
                .cast("long").alias("h"),
            )
            .groupBy("event_type", "h").count()
            .collect()
        )
        counts = {}
        for r in ev:
            counts.setdefault(r["event_type"], {})[r["h"]] = r["count"]
        lo = min(h for d in counts.values() for h in d)
        hi = max(h for d in counts.values() for h in d)
        hours = list(range(lo, hi + 1, 3600))
        want = {}
        for t, d in counts.items():
            xs = [float(d.get(h, 0)) for h in hours]
            for ts_s, obs, fit, resid in ref_hw(xs, hours):
                want[(t, ts_s)] = (obs, fit, resid)
        got = {}
        for r in QUERIES["ts_holt_winters"](spark, sf).collect():
            obs = None if r["observed"] is None or (r["observed"] != r["observed"]) else r["observed"]
            got[(r["event_type"], r["ts_s"])] = (
                obs, r["fitted"],
                None if r["resid"] is None or (r["resid"] != r["resid"]) else r["resid"],
            )
        assert got == want, sf

    # planted: exact period-24 sawtooth + level — residuals vanish, the
    # forecast continues the pattern; a short series emits nothing
    rows = []
    for i in range(24 * 6):
        rows.append(("p", i * 3600, float(100 + (i % 24))))
    rows += [("short", i * 3600, 5.0) for i in range(30)]
    df = spark.createDataFrame(rows, "key: string, ts_s: long, value: double")
    out = holt_winters(df, period=24, horizon=24, key_col="key").collect()
    assert not any(r["key"] == "short" for r in out)
    p = sorted((r for r in out if r["key"] == "p"), key=lambda r: r["ts_s"])
    insample = [r for r in p if r["observed"] is not None and r["observed"] == r["observed"]]
    tail = insample[-24:]
    assert all(abs(r["resid"]) < 0.05 for r in tail), [r["resid"] for r in tail]
    fut = [r for r in p if r["observed"] is None or r["observed"] != r["observed"]]
    assert len(fut) == 24
    for r in fut:
        phase = (r["ts_s"] // 3600) % 24
        assert abs(r["fitted"] - (100 + phase)) < 0.2, (phase, r["fitted"])


def test_ks_drift_matches_python_and_flags_shift(spark):
    """r13: the grid-restricted KS table ≡ a python same-grid recompute
    (equal-width grid from the same min/max) at two sfs;
    behavior on planted data: a shifted type flags, an identically-
    distributed type does not, and the grid statistic never exceeds the
    exact KS computed by brute force (the lower-bound contract)."""
    import numpy as np

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.queries.diagnostics import diag_ks_drift
    from n2kupdate_spark.sources import load

    def ref(values_by_type):
        allv = np.concatenate(list(values_by_type.values()))
        lo, hi = float(allv.min()), float(allv.max())
        width = (hi - lo) or 1.0

        def buckets(vals):
            b = np.floor((np.asarray(vals) - lo) * 200.0 / width)
            b = np.clip(b, 0, 199).astype(int)
            return np.bincount(b, minlength=200)

        gcum = np.cumsum(buckets(allv))
        gn = len(allv)
        out = {}
        r4 = lambda v: round(v * 10000) / 10000 + 0.0  # noqa: E731
        for t, vals in values_by_type.items():
            n = len(vals)
            nr = gn - n
            tcum = np.cumsum(buckets(vals))
            d = float(np.max(np.abs(tcum / n - (gcum - tcum) / nr)))
            crit = 1.358 * float(np.sqrt((n + nr) / (n * nr)))
            out[t] = (n, nr, r4(d), r4(crit), d > crit)
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        by_type = {}
        for r in load(spark, sf, "events", columns=["event_type", "value"]).collect():
            if r["value"] is not None:  # mirrors the op's null filter
                by_type.setdefault(r["event_type"], []).append(float(r["value"]))
        want = ref({t: np.array(v) for t, v in by_type.items()})
        got = {
            r["event_type"]: (r["n"], r["n_rest"], r["ks_stat"], r["ks_crit"], r["drifted"])
            for r in QUERIES["diag_ks_drift"](spark, sf).collect()
        }
        assert got == want, sf

    # planted, frame A: two identically-distributed types -> silent both
    # ways; frame B adds a shifted type -> it flags, and (the documented
    # vs-REST property) the shifted mass contaminates the others'
    # complement, so their flags speak to the MIXTURE changing
    rng = np.random.RandomState(5)
    rows_a = []
    for i, v in enumerate(rng.randn(800)):
        rows_a.append(("same" if i % 2 else "other", float(v)))
    rows_b = rows_a + [("shift", float(v)) for v in rng.randn(300) + 3.0]
    import n2kupdate_spark.queries.diagnostics as diag

    orig = diag.load
    try:
        dfa = spark.createDataFrame(rows_a, "event_type: string, value: double")
        diag.load = lambda spark_, sf_, t, columns=None: dfa.select(columns or dfa.columns)
        got_a = {r["event_type"]: r for r in diag_ks_drift(spark, "ignored").collect()}
        dfb = spark.createDataFrame(rows_b, "event_type: string, value: double")
        diag.load = lambda spark_, sf_, t, columns=None: dfb.select(columns or dfb.columns)
        got = {r["event_type"]: r for r in diag_ks_drift(spark, "ignored").collect()}
    finally:
        diag.load = orig
    assert not got_a["same"]["drifted"] and not got_a["other"]["drifted"]
    assert got["shift"]["drifted"]
    assert got["shift"]["ks_stat"] > 2 * got["shift"]["ks_crit"]

    def exact_ks(a, b):
        a, b = np.sort(a), np.sort(b)
        allv = np.concatenate([a, b])
        ca = np.searchsorted(a, allv, side="right") / len(a)
        cb = np.searchsorted(b, allv, side="right") / len(b)
        return float(np.max(np.abs(ca - cb)))

    shift_vals = np.array([v for t, v in rows_b if t == "shift"])
    rest_vals = np.array([v for t, v in rows_b if t != "shift"])
    assert got["shift"]["ks_stat"] <= exact_ks(shift_vals, rest_vals) + 1e-4


def test_window_funnel_matches_python_and_chains(spark):
    """r13: windowFunnel ≡ an independent python replay of the greedy
    chain DP at two sfs; hand-built chain battery: complete in-window
    chain → 3, same chain with the last step past the window → 2, a
    LATER restart rescues the window (the latest-start rule), stage
    skipping doesn't count, intervening noise is ignored, bucketed ≡
    per-key."""
    from n2kupdate_spark.operators.timeseries import window_funnel
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    PATTERN = ("view", "click", "purchase")
    W = 86400

    def ref(rows):  # rows: [(ts, type)] pre-sorted
        start = [None, None, None]
        best = 0
        idx = {t: i for i, t in enumerate(PATTERN)}
        for ts, et in rows:
            i = idx.get(et)
            if i is None:
                continue
            if i == 0:
                start[0] = ts if start[0] is None else max(start[0], ts)
            elif start[i - 1] is not None and ts - start[i - 1] <= W:
                start[i] = start[i - 1] if start[i] is None else max(start[i], start[i - 1])
            if start[i] is not None:
                best = max(best, i + 1)
        return best

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = (
            load(spark, sf, "events", columns=["user_id", "event_type", "ts", "event_id"])
            .select(
                "user_id", "event_type", "event_id",
                F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
            )
            .toPandas()
        )
        want = {}
        for uid, g in ev.groupby("user_id"):
            g = g.sort_values(["ts_s", "event_id"], kind="mergesort")
            want[uid] = ref(list(zip(g["ts_s"], g["event_type"])))
        got = {
            r["user_id"]: r["max_level"]
            for r in QUERIES["events_window_funnel"](spark, sf).collect()
        }
        assert got == want, sf
        assert set(got.values()) - {0} , "funnel must be non-vacuous"

    H = 3600
    rows = [
        # u1: full chain inside 24h
        (1, 0, "view"), (1, H, "click"), (1, 2 * H, "purchase"),
        # u2: purchase lands outside the 24h window of the view
        (2, 0, "view"), (2, H, "click"), (2, 25 * H, "purchase"),
        # u3: late RESTART rescues it (latest-start rule): the second
        # view re-bases the window so the purchase fits
        (3, 0, "view"), (3, 20 * H, "view"), (3, 21 * H, "click"), (3, 30 * H, "purchase"),
        # u4: skipping stage 2 cannot reach level 3
        (4, 0, "view"), (4, H, "purchase"),
        # u5: noise between stages is ignored
        (5, 0, "view"), (5, 1, "error"), (5, 2, "signup"), (5, 3, "click"),
        (5, 4, "error"), (5, 5, "purchase"),
        # u6: wrong order entirely
        (6, 0, "purchase"), (6, 1, "click"), (6, 2, "view"),
    ]
    df = spark.createDataFrame(
        [(u, float(t), i, e) for i, (u, t, e) in enumerate(rows)],
        "user_id: long, ts_s: double, event_id: long, event_type: string",
    )
    got = {
        r["user_id"]: r["max_level"]
        for r in window_funnel(df, PATTERN, W, order_col="event_id").collect()
    }
    assert got == {1: 3, 2: 2, 3: 3, 4: 1, 5: 3, 6: 1}
    for b in (0, 2):
        gb = {
            r["user_id"]: r["max_level"]
            for r in window_funnel(df, PATTERN, W, order_col="event_id", group_buckets=b).collect()
        }
        assert gb == got

    # r14: REPEATED types (ClickHouse accepts repeated conditions;
    # "view → view → buy" needs two DISTINCT views — one event never
    # fills two stages). Checked against a brute-force subsequence
    # search (itertools.combinations — a genuinely different algorithm
    # than the greedy DP) plus hand pins.
    import itertools

    RPAT = ("view", "view", "purchase")

    def brute(rows, pattern, w):  # rows: [(ts, type)] pre-sorted
        for k in range(len(pattern), 0, -1):
            for combo in itertools.combinations(range(len(rows)), k):
                if all(rows[j][1] == pattern[s] for s, j in enumerate(combo)) and (
                    rows[combo[-1]][0] - rows[combo[0]][0] <= w
                ):
                    return k
        return 0

    rrows = [
        (10, 0.0, "view"), (10, 1.0, "purchase"),            # one view: 1
        (11, 0.0, "view"), (11, H, "view"), (11, 2 * H, "purchase"),  # 3
        (12, 0.0, "view"), (12, 25 * H, "view"), (12, 26 * H, "purchase"),  # 1? brute decides
        (13, 0.0, "view"), (13, H, "view"),                  # no purchase: 2
        (14, 0.0, "purchase"), (14, H, "view"), (14, 2 * H, "view"),  # order: 2
    ]
    rdf = spark.createDataFrame(
        [(u, float(t), i, e) for i, (u, t, e) in enumerate(rrows)],
        "user_id: long, ts_s: double, event_id: long, event_type: string",
    )
    rgot = {
        r["user_id"]: r["max_level"]
        for r in window_funnel(rdf, RPAT, W, order_col="event_id").collect()
    }
    rwant = {}
    for u in sorted({u for u, _t, _e in rrows}):
        seq = sorted(
            [(t, e) for uu, t, e in rrows if uu == u], key=lambda p: p[0]
        )
        rwant[u] = brute(seq, RPAT, W)
    assert rgot == rwant, (rgot, rwant)
    assert rgot[10] == 1 and rgot[11] == 3 and rgot[13] == 2

    # random fuzz vs brute force on the repeated pattern
    import random as _random

    rng = _random.Random(17)
    frows = []
    for u in range(30):
        for i in range(rng.randrange(1, 9)):
            frows.append(
                (u, float(rng.randrange(0, 30) * H), rng.choice(
                    ["view", "click", "purchase", "error"]
                ))
            )
    fdf = spark.createDataFrame(
        [(u, float(t), i, e) for i, (u, t, e) in enumerate(frows)],
        "user_id: long, ts_s: double, event_id: long, event_type: string",
    )
    fgot = {
        r["user_id"]: r["max_level"]
        for r in window_funnel(fdf, RPAT, W, order_col="event_id").collect()
    }
    for u in range(30):
        seq = sorted([(t, e) for uu, t, e in frows if uu == u], key=lambda p: p[0])
        assert fgot[u] == brute(seq, RPAT, W), (u, seq)


def test_ngram_novelty_matches_python_replay(spark):
    """r13: per-doc novelty ≡ an independent python first-occurrence
    replay (walk docs in id order, claim unseen grams) at two sfs;
    contracts: the lowest-id doc of an exact-duplicate pair scores the
    novelty, its twin scores 0 on the shared mass; total novel grams ≡
    corpus distinct grams; short docs emit (0, 0, 0.0)."""
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    def py_grams(text):
        # mirrors gram_array: F.split on ' ' KEEPS empty tokens (the
        # convention the older dedup replay at test line ~1581 follows)
        toks = text.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        texts = {
            r["doc_id"]: r["text"]
            for r in load(spark, sf, "documents", columns=["doc_id", "text"]).collect()
        }
        seen = set()
        want = {}
        for did in sorted(texts):
            gs = py_grams(texts[did])
            novel = {g for g in gs if g not in seen}
            seen |= gs
            import math

            frac = (
                math.floor(len(novel) * 10000.0 / len(gs) + 0.5) / 10000
                if gs
                else 0.0
            )
            want[did] = (len(gs), len(novel), frac)
        got = {
            r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty_frac"])
            for r in QUERIES["text_ngram_novelty"](spark, sf).collect()
        }
        assert got == want, sf
        assert sum(v[1] for v in got.values()) == len(seen)
        assert any(v[2] == 1.0 for v in got.values())
        assert any(v[2] < 1.0 for v in got.values())


def test_mann_kendall_matches_python_and_planted(spark):
    """r13: per-key Mann–Kendall ≡ an independent python recompute
    (direct pairwise double loop — different computation of S than the
    operator's sign-matrix fold) at two sfs; planted: a noisy-but-
    monotonic ramp reads 'increasing', its negation 'decreasing', white
    noise 'no trend', an all-tied series z=0 via the tie-corrected
    variance, n<3 degenerates cleanly; bucketed ≡ per-key."""
    import numpy as np

    from n2kupdate_spark.operators.timeseries import mann_kendall
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    def ref(vals):
        n = len(vals)
        if n < 3:
            return (n, 0, 0.0, 0.0, "no trend")
        s = 0
        for i in range(n):
            for j in range(i + 1, n):
                s += (vals[j] > vals[i]) - (vals[j] < vals[i])
        from collections import Counter

        ties = [c for c in Counter(vals).values() if c > 1]
        var = (
            n * (n - 1) * (2 * n + 5)
            - sum(t * (t - 1) * (2 * t + 5) for t in ties)
        ) / 18.0
        r4 = lambda v: float(np.round(v * 10000) / 10000 + 0.0)  # noqa: E731
        if var <= 0:
            return (n, s, 0.0, 0.0, "no trend")
        z = (s - 1) / var ** 0.5 if s > 0 else ((s + 1) / var ** 0.5 if s < 0 else 0.0)
        t = "increasing" if z >= 1.96 else ("decreasing" if z <= -1.96 else "no trend")
        return (n, s, r4(var), r4(z), t)

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = (
            load(spark, sf, "events", columns=["user_id", "event_id", "value", "ts"])
            .select(
                "user_id", "event_id", "value",
                F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
            )
            .toPandas()
        )
        want = {}
        for uid, g in ev.groupby("user_id"):
            g = g.sort_values(["ts_s", "event_id"], kind="mergesort")
            want[uid] = ref(g["value"].tolist())
        got = {
            r["user_id"]: (r["n"], r["s_stat"], r["var_s"], r["z"], r["trend"])
            for r in QUERIES["ts_trend_mann_kendall"](spark, sf).collect()
        }
        assert got == want, sf

    rng = np.random.RandomState(9)
    rows = []
    ramp = [0.05 * i + float(rng.randn()) * 0.3 for i in range(80)]
    rows += [(1, i, v, i) for i, v in enumerate(ramp)]
    rows += [(2, i, -v, i) for i, v in enumerate(ramp)]
    rows += [(3, i, float(rng.randn()), i) for i in range(80)]
    rows += [(4, i, 7.0, i) for i in range(40)]
    rows += [(5, i, float(i), i) for i in range(2)]
    # key 6: the ramp with every 5th observation NULLed — the test must
    # treat nulls as absent (n counts non-null only), not crash on NaN
    nullramp = [None if i % 5 == 0 else ramp[i] for i in range(80)]
    rows += [(6, i, v, i) for i, v in enumerate(nullramp)]
    df = spark.createDataFrame(rows, "user_id: long, event_id: long, value: double, ts_s: long")
    out = {r["user_id"]: r for r in mann_kendall(df, order_col="event_id").collect()}
    assert out[1]["trend"] == "increasing" and out[2]["trend"] == "decreasing"
    assert out[3]["trend"] == "no trend"
    assert out[4]["trend"] == "no trend" and out[4]["z"] == 0.0
    assert out[5]["n"] == 2 and out[5]["trend"] == "no trend"
    want6 = ref([v for v in nullramp if v is not None])
    assert (out[6]["n"], out[6]["s_stat"], out[6]["var_s"], out[6]["z"], out[6]["trend"]) == want6
    for b in (0, 2):
        ob = {r["user_id"]: tuple(r) for r in mann_kendall(df, order_col="event_id", group_buckets=b).collect()}
        assert ob == {r["user_id"]: tuple(r) for r in out.values()}


def test_script_mix_matches_python_and_planted(spark):
    """r14: per-doc Unicode script composition ≡ an independent python
    per-codepoint recompute at two sfs (pure-ASCII fixture: every
    letter Latin); planted multi-script battery: Cyrillic and Han docs
    classify to their script, Greek lands in `other`, a 50/50
    Latin/Cyrillic tie breaks to latin (the fixed column order),
    zero-letter docs emit NULLs."""
    import math

    from n2kupdate_spark.operators.corpus import script_mix
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    def cls(ch):
        if not ch.isalpha():
            return None
        o = ord(ch)
        if 65 <= o <= 90 or 97 <= o <= 122 or 0x00C0 <= o <= 0x024F:
            return "latin"
        if 0x0400 <= o <= 0x04FF:
            return "cyrillic"
        if 0x4E00 <= o <= 0x9FFF:
            return "han"
        if 0x0600 <= o <= 0x06FF:
            return "arabic"
        return "other"

    ORDER = ["latin", "cyrillic", "han", "arabic", "other"]

    def ref(text):
        c = dict.fromkeys(ORDER, 0)
        for ch in text:
            k = cls(ch)
            if k:
                c[k] += 1
        n = sum(c.values())
        if n == 0:
            return (0,) + (None,) * 5 + (None,)
        fr = tuple(math.floor(c[k] * 10000.0 / n + 0.5) / 10000 for k in ORDER)
        dom = max(ORDER, key=lambda k: (c[k], -ORDER.index(k)))
        return (n,) + fr + (dom,)

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        texts = {
            r["doc_id"]: r["text"]
            for r in load(spark, sf, "documents", columns=["doc_id", "text"]).collect()
        }
        want = {d: ref(t) for d, t in texts.items()}
        got = {
            r["doc_id"]: (
                r["n_letters"], r["latin_frac"], r["cyrillic_frac"],
                r["han_frac"], r["arabic_frac"], r["other_frac"],
                r["dominant_script"],
            )
            for r in QUERIES["text_script_mix"](spark, sf).collect()
        }
        assert got == want, sf

    planted = [
        (1, "Привет мир, это тест."),                      # cyrillic
        (2, "这是一个中文测试文档。"),                        # han
        (3, "مرحبا بالعالم"),                               # arabic
        (4, "αβγδ greek is other"),                         # greek + latin
        (5, "abcde абвгд"),                                 # exact 5/5 tie
        (6, "12345 !!! ...."),                              # zero letters
        (7, "mixed текст with 中文 and عربى words"),
        # Arabic-Indic DIGITS are script=Arabic but NOT letters: they
        # must count toward neither numerator nor denominator (review
        # r14 — unintersected \p{IsArabic} read arabic_frac 1.33 here)
        (8, "abc ٠١٢٣"),
    ]
    df = spark.createDataFrame(planted, "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in script_mix(df).collect()}
    for d, t in planted:
        w = ref(t)
        g = got[d]
        assert (
            g["n_letters"], g["latin_frac"], g["cyrillic_frac"], g["han_frac"],
            g["arabic_frac"], g["other_frac"], g["dominant_script"],
        ) == w, (d, t, w, dict(g.asDict()))
    assert got[1]["dominant_script"] == "cyrillic"
    assert got[2]["dominant_script"] == "han"
    assert got[3]["dominant_script"] == "arabic"
    assert got[4]["other_frac"] and got[4]["other_frac"] > 0
    assert got[5]["dominant_script"] == "latin"  # tie -> column order
    assert got[6]["n_letters"] == 0 and got[6]["dominant_script"] is None
    assert got[8]["n_letters"] == 3 and got[8]["latin_frac"] == 1.0
    assert got[8]["arabic_frac"] == 0.0 and got[8]["other_frac"] == 0.0


def test_compression_ratio_matches_zlib_and_bands(spark):
    """r14: per-doc compressibility ≡ a direct python zlib recompute at
    two sfs (same library — the documented determinism contract);
    planted band pins: a 100× repeated token compresses below 0.1, a
    seeded random-hex soup stays above natural prose, prose sits
    between, empty doc emits NULLs, and unicode text measures utf-8
    BYTES, not chars."""
    import math
    import zlib

    from n2kupdate_spark.operators.corpus import compression_signals
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    def ref(t):
        raw = (t or "").encode("utf-8")
        if not raw:
            return (0, None, None)
        c = len(zlib.compress(raw, 6))
        return (len(raw), c, math.floor(c * 10000.0 / len(raw) + 0.5) / 10000)

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        texts = {
            r["doc_id"]: r["text"]
            for r in load(spark, sf, "documents", columns=["doc_id", "text"]).collect()
        }
        want = {d: ref(t) for d, t in texts.items()}
        got = {
            r["doc_id"]: (r["n_bytes"], r["n_compressed"], r["compress_ratio"])
            for r in QUERIES["text_compression_ratio"](spark, sf).collect()
        }
        assert got == want, sf

    import random as _random

    rng = _random.Random(3)
    soup = "".join(rng.choice("0123456789abcdef") for _ in range(2000))
    prose = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sailors argue about the weather in a small harbor town "
    ) * 5
    planted = [
        (1, "spam " * 100),
        (2, soup),
        (3, prose),
        (4, ""),
        (5, "héllo wörld ünïcode"),
    ]
    df = spark.createDataFrame(planted, "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in compression_signals(df).collect()}
    for d, t in planted:
        w = ref(t)
        g = got[d]
        assert (g["n_bytes"], g["n_compressed"], g["compress_ratio"]) == w, d
    assert got[1]["compress_ratio"] < 0.1          # repetition crushes
    assert got[2]["compress_ratio"] > got[3]["compress_ratio"]  # soup > prose
    assert got[4]["n_bytes"] == 0 and got[4]["compress_ratio"] is None
    assert got[5]["n_bytes"] == len("héllo wörld ünïcode".encode("utf-8"))


def test_psi_drift_matches_python_and_planted(spark):
    """r14: per-type PSI ≡ an independent python same-grid recompute at
    two sfs (10 equal-width bins on the global [min,max], ε=1e-4 share
    clamp); planted: a cohort shifted wholly out of the others' range
    reads far past the 0.25 'shifted' band while identically-
    distributed cohorts read stable; bands follow the published rule of
    thumb."""
    import math

    import numpy as np

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.queries.diagnostics import diag_psi_drift
    from n2kupdate_spark.sources import load

    def ref(rows):  # rows: [(type, value)]
        vals = np.array([v for _t, v in rows], dtype=float)
        lo, hi = vals.min(), vals.max()
        width = (hi - lo) or 1.0
        b = np.minimum(9, np.maximum(0, np.floor((vals - lo) * 10.0 / width))).astype(int)
        types = sorted({t for t, _v in rows})
        tarr = np.array([t for t, _v in rows])
        out = {}
        for t in types:
            mask = tarr == t
            n, nr = int(mask.sum()), int((~mask).sum())
            psi = 0.0
            for k in range(10):
                p = max(1e-4, (b[mask] == k).sum() / n)
                q = max(1e-4, (b[~mask] == k).sum() / nr)
                psi += (p - q) * math.log(p / q)
            band = "stable" if psi < 0.1 else ("moderate" if psi <= 0.25 else "shifted")
            out[t] = (n, nr, float(np.round(psi * 10000) / 10000 + 0.0), band)
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["event_type"], float(r["value"]))
            for r in load(spark, sf, "events", columns=["event_type", "value"])
            .filter(F.col("value").isNotNull())
            .collect()
        ]
        want = ref(rows)
        got = {
            r["event_type"]: (r["n"], r["n_rest"], r["psi"], r["psi_band"])
            for r in QUERIES["diag_psi_drift"](spark, sf).collect()
        }
        assert got == want, sf

    # planted: types a/b iid uniform[0,1); type c shifted to [10,11)
    rng = np.random.RandomState(5)
    planted = (
        [("a", float(v)) for v in rng.rand(400)]
        + [("b", float(v)) for v in rng.rand(400)]
        + [("c", float(v) + 10.0) for v in rng.rand(400)]
    )
    df = spark.createDataFrame(planted, "event_type: string, value: double")
    import n2kupdate_spark.queries.diagnostics as diagq

    orig = diagq.load
    try:
        diagq.load = lambda spark_, sf_, t, columns=None: df
        got = {r["event_type"]: r for r in diag_psi_drift(spark, "ignored").collect()}
    finally:
        diagq.load = orig
    want = ref(planted)
    for t in ("a", "b", "c"):
        g = got[t]
        assert (g["n"], g["n_rest"], g["psi"], g["psi_band"]) == want[t], t
    assert got["c"]["psi_band"] == "shifted" and got["c"]["psi"] > 1.0
    # a and b are iid, but c's mass contaminates their complements (the
    # vs-rest semantics the KS op documents) — their DIRECT a-vs-b PSI
    # is what must read stable
    ab = [r for r in planted if r[0] in ("a", "b")]
    assert ref(ab)["a"][3] == "stable" and ref(ab)["b"][3] == "stable"
    df_ab = spark.createDataFrame(ab, "event_type: string, value: double")
    try:
        diagq.load = lambda spark_, sf_, t, columns=None: df_ab
        got_ab = {r["event_type"]: r for r in diag_psi_drift(spark, "ignored").collect()}
    finally:
        diagq.load = orig
    assert got_ab["a"]["psi_band"] == "stable" and got_ab["b"]["psi_band"] == "stable"


def test_robust_zscore_mad_matches_numpy_and_planted(spark):
    """r14: per-key modified z-score ≡ a numpy same-convention
    recompute (median, MAD = median |x−med|, Mz = 0.6745·(x−med)/MAD,
    |Mz|>3.5 rule) at two sfs; planted: one 100× spike in an otherwise
    tame series flags — and the CLASSICAL mean/std z on the same series
    is dragged below 3.5 by its own outlier (the reason MAD exists);
    an all-constant key (MAD 0) emits NULL mz and flags nothing; plan:
    both percentile windows share ONE exchange."""
    import numpy as np

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    def ref(vals):
        x = np.asarray(vals, dtype=float)
        med = np.percentile(x, 50)
        mad = np.percentile(np.abs(x - med), 50)
        out = []
        for v in x:
            if mad > 0:
                raw = 0.6745 * (v - med) / mad
                mz = float(np.floor(raw * 10000 + 0.5) / 10000 + 0.0)
                out.append((mz, abs(raw) > 3.5))
            else:
                out.append((None, False))
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = (
            load(spark, sf, "events", columns=["user_id", "ts", "value"])
            .select(
                "user_id",
                F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
                "value",
            )
            .filter(F.col("value").isNotNull())
            .toPandas()
        )
        want = {}
        for uid, g in ev.groupby("user_id"):
            for (_i, row), (mz, fl) in zip(g.iterrows(), ref(g["value"].tolist())):
                want[(uid, row["ts_s"], row["value"])] = (mz, fl)
        got = {
            (r["user_id"], r["ts_s"], r["value"]): (r["mz"], r["outlier"])
            for r in QUERIES["ts_robust_zscore_mad"](spark, sf).collect()
        }
        assert got == want, sf

    # planted: tame uniform series + one 100x spike; constant key
    import n2kupdate_spark.queries.mlprep as mlq

    rows = [(1, float(i), float(10 + (i % 7))) for i in range(60)]
    rows.append((1, 60.0, 1000.0))
    rows += [(2, float(i), 5.0) for i in range(30)]
    pdf = spark.createDataFrame(rows, "user_id: long, ts: double, value: double")
    # route through the registered query by monkeypatching load; ts is
    # already seconds here so wrap as timestamp
    df = pdf.select(
        "user_id", F.to_timestamp(F.from_unixtime("ts")).alias("ts"), "value"
    )
    orig = mlq.load
    try:
        mlq.load = lambda spark_, sf_, t, columns=None: df
        got = {
            (r["user_id"], r["value"]): r
            for r in QUERIES["ts_robust_zscore_mad"](spark, "ignored").collect()
        }
    finally:
        mlq.load = orig
    assert got[(1, 1000.0)]["outlier"] is True
    vals = np.array([10 + (i % 7) for i in range(60)] + [1000.0])
    classical = abs(vals[-1] - vals.mean()) / vals.std(ddof=1)
    assert classical < 8.0  # σ inflated by the spike itself
    assert got[(1, 1000.0)]["mz"] > 100  # MAD immune to the spike
    assert got[(2, 5.0)]["mz"] is None and got[(2, 5.0)]["outlier"] is False

    plan = (
        QUERIES["ts_robust_zscore_mad"](spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_hw_backtest_matches_python_and_planted(spark):
    """r14: the rolling-origin backtest ≡ an independent python
    recompute (own HW recursion, own MAE/sMAPE/naive scoring) at two
    sfs; planted: on a clean trending seasonal signal HW beats the
    seasonal-naive baseline (positive skill at every origin), and a
    too-short key emits nothing."""
    import numpy as np

    from n2kupdate_spark.operators.timeseries import holt_winters_backtest
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    M, H, A, B_, G = 24, 24, 0.2, 0.1, 0.3

    def hw_fc(x):
        l = x[:M].mean()
        b = (x[M : 2 * M].mean() - x[:M].mean()) / M
        s = (x[:M] - x[:M].mean()).astype(float).copy()
        for t in range(M, len(x)):
            si = t % M
            ln = A * (x[t] - s[si]) + (1 - A) * (l + b)
            b = B_ * (ln - l) + (1 - B_) * b
            s[si] = G * (x[t] - ln) + (1 - G) * s[si]
            l = ln
        n = len(x)
        return np.array([l + k * b + s[(n + k - 1) % M] for k in range(1, H + 1)])

    r4 = lambda v: float(np.floor(v * 10000 + 0.5) / 10000 + 0.0)  # noqa: E731

    def ref(ts, x, n_origins=3):
        out = {}
        n = len(x)
        for k in range(n_origins, 0, -1):
            cut = n - k * H
            if cut < 2 * M or cut + H > n:
                continue
            fc = hw_fc(x[:cut])
            actual = x[cut : cut + H]
            naive = x[cut - M : cut - M + H]
            mae = np.abs(fc - actual).mean()
            nmae = np.abs(naive - actual).mean()
            den = np.abs(fc) + np.abs(actual)
            ok = den > 0
            smape = ((2 * np.abs(fc - actual))[ok] / den[ok]).mean() if ok.any() else 0.0
            skill = 1 - mae / nmae if nmae > 0 else 0.0
            out[int(ts[cut])] = (cut, r4(mae), r4(smape), r4(nmae), r4(skill))
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = (
            load(spark, sf, "events", columns=["ts", "event_type"])
            .select(
                "event_type",
                (F.floor(F.unix_timestamp(F.date_trunc("second", F.col("ts"))) / 3600) * 3600)
                .cast("long").alias("ts_s"),
            )
            .groupBy("event_type", "ts_s")
            .count()
            .toPandas()
        )
        lo, hi = ev["ts_s"].min(), ev["ts_s"].max()
        grid = np.arange(lo, hi + 1, 3600)
        want = {}
        for et, g in ev.groupby("event_type"):
            series = dict(zip(g["ts_s"], g["count"]))
            x = np.array([float(series.get(t, 0)) for t in grid])
            for ots, tup in ref(grid, x).items():
                want[(et, ots)] = tup
        got = {
            (r["event_type"], r["origin_ts"]): (
                r["n_train"], r["mae"], r["smape"], r["naive_mae"], r["skill"]
            )
            for r in QUERIES["ts_backtest_holt_winters"](spark, sf).collect()
        }
        assert got == want, sf

    # planted: trend + clean daily season, tiny noise → HW wins at every
    # origin; a 40-point key (< 2 seasons + eval) emits nothing
    rng = np.random.RandomState(4)
    rows = []
    for i in range(24 * 10):
        v = 0.5 * i + 10 * np.sin(2 * np.pi * (i % 24) / 24) + 0.01 * rng.randn()
        rows.append(("long", i * 3600, float(v)))
    rows += [("short", i * 3600, 1.0) for i in range(40)]
    df = spark.createDataFrame(rows, "key: string, ts_s: long, value: double")
    got = {
        (r["key"], r["origin_ts"]): r
        for r in holt_winters_backtest(df, period=24, n_origins=3).collect()
    }
    assert not any(k == "short" for k, _o in got)
    longs = [r for (k, _o), r in got.items() if k == "long"]
    assert len(longs) == 3
    for r in longs:
        assert r["skill"] > 0.5, dict(r.asDict())  # trend kills the naive


def test_theta_backtest_matches_python_and_planted(spark):
    """r16: the Theta rolling-origin backtest ≡ an independent python
    recompute (own SES loop + explicit-sums least squares — not
    polyfit — own MAE/sMAPE/naive scoring) at two sfs; planted: on a
    clean linear trend Theta beats the seasonal-naive baseline at
    every origin (positive skill), a too-short key emits nothing, and
    the origin set is IDENTICAL to the HW backtest's on the same
    series (the comparable-skill contract of the shared harness)."""
    import numpy as np

    from n2kupdate_spark.operators.timeseries import (
        holt_winters_backtest,
        theta_backtest,
    )
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    M, H, A = 24, 24, 0.2
    r4 = lambda v: float(np.floor(v * 10000 + 0.5) / 10000 + 0.0)  # noqa: E731

    def theta_fc(x):
        n = len(x)
        # explicit-sums OLS slope (not polyfit — a different lstsq path)
        t = np.arange(n, dtype=float)
        b = (n * (t * x).sum() - t.sum() * x.sum()) / (
            n * (t * t).sum() - t.sum() ** 2
        )
        lvl = x[0]
        for v in x[1:]:
            lvl = A * v + (1 - A) * lvl
        decay = (1 - A) ** n / A
        return np.array(
            [lvl + (b / 2) * (h - 1 + 1 / A - decay) for h in range(1, H + 1)]
        )

    def ref(ts, x, n_origins=3):
        out = {}
        n = len(x)
        for k in range(n_origins, 0, -1):
            cut = n - k * H
            if cut < 2 * M or cut + H > n:
                continue
            fc = theta_fc(x[:cut])
            actual = x[cut : cut + H]
            naive = x[cut - M : cut][np.arange(H) % M]
            mae = np.abs(fc - actual).mean()
            nmae = np.abs(naive - actual).mean()
            den = np.abs(fc) + np.abs(actual)
            ok = den > 0
            smape = ((2 * np.abs(fc - actual))[ok] / den[ok]).mean() if ok.any() else 0.0
            skill = 1 - mae / nmae if nmae > 0 else 0.0
            out[int(ts[cut])] = (cut, r4(mae), r4(smape), r4(nmae), r4(skill))
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = (
            load(spark, sf, "events", columns=["ts", "event_type"])
            .select(
                "event_type",
                (F.floor(F.unix_timestamp(F.date_trunc("second", F.col("ts"))) / 3600) * 3600)
                .cast("long").alias("ts_s"),
            )
            .groupBy("event_type", "ts_s")
            .count()
            .toPandas()
        )
        lo, hi = ev["ts_s"].min(), ev["ts_s"].max()
        grid = np.arange(lo, hi + 1, 3600)
        want = {}
        for et, g in ev.groupby("event_type"):
            series = dict(zip(g["ts_s"], g["count"]))
            x = np.array([float(series.get(t, 0)) for t in grid])
            for ots, tup in ref(grid, x).items():
                want[(et, ots)] = tup
        got = {
            (r["event_type"], r["origin_ts"]): (
                r["n_train"], r["mae"], r["smape"], r["naive_mae"], r["skill"]
            )
            for r in QUERIES["ts_backtest_theta"](spark, sf).collect()
        }
        assert got == want, sf

    # planted: clean linear trend — the seasonal naive repeats yesterday
    # (one full H=M=24 step behind the trend) while Theta extrapolates;
    # a 40-point key (< 2 seasons + eval) emits nothing
    rng = np.random.RandomState(16)
    rows = []
    for i in range(24 * 10):
        rows.append(("long", i * 3600, float(3.0 * i + 0.01 * rng.randn())))
    rows += [("short", i * 3600, 1.0) for i in range(40)]
    df = spark.createDataFrame(rows, "key: string, ts_s: long, value: double")
    got = {
        (r["key"], r["origin_ts"]): r
        for r in theta_backtest(df, period=24, n_origins=3).collect()
    }
    assert not any(k == "short" for k, _o in got)
    longs = [r for (k, _o), r in got.items() if k == "long"]
    assert len(longs) == 3
    for r in longs:
        assert r["skill"] > 0.5, dict(r.asDict())  # trend kills the naive
    # shared-harness contract: identical origin/n_train sets vs HW on the
    # same series — the comparable-skill guarantee
    hw = {
        (r["key"], r["origin_ts"]): r["n_train"]
        for r in holt_winters_backtest(df, period=24, n_origins=3).collect()
    }
    assert {k: r["n_train"] for k, r in got.items()} == hw


def test_sample_weighted_per_key_matches_python(spark):
    """r14: the stratified weighted sampler ≡ an independent python
    recompute of the full spec (md5-derived u, ln(u)/w key, per-key
    top-k, id-asc ties) at two sfs; contracts: EVERY stratum with ≥ k
    positive-weight rows yields exactly k (the coverage a global draw
    can't promise), weight ≤ 0/NULL rows never drawn, determinism
    across reruns, and a planted heavy weight is drawn within its
    stratum (w → ∞ ⇒ key → 0⁻, the E-S guarantee)."""
    import hashlib
    import math

    import numpy as np

    from n2kupdate_spark.operators.corpus import sample_weighted_per_key
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    def es_key(doc_id, w):
        u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16) / float(16**13)
        u = max(u, 1.0 / float(16**13))
        return math.log(u) / w

    def ref(rows, k=5):
        by = {}
        for key, i, w in rows:
            if w is not None and w > 0:
                by.setdefault(key, []).append((es_key(i, float(w)), i, w))
        out = {}
        for key, items in by.items():
            items.sort(key=lambda t: (-t[0], t[1]))
            for r, (ek, i, w) in enumerate(items[:k], 1):
                out[(key, i)] = (
                    w, float(np.round(ek * 1000000) / 1000000), r
                )
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["source"], r["doc_id"], r["n_chars"])
            for r in load(spark, sf, "documents", columns=["doc_id", "source", "n_chars"]).collect()
        ]
        want = ref(rows)
        got = {
            (r["source"], r["doc_id"]): (r["n_chars"], r["es_key"], r["sel_rank"])
            for r in QUERIES["sample_weighted_per_key"](spark, sf).collect()
        }
        assert got == want, sf
        again = {
            (r["source"], r["doc_id"]): (r["n_chars"], r["es_key"], r["sel_rank"])
            for r in QUERIES["sample_weighted_per_key"](spark, sf).collect()
        }
        assert again == got
        counts = {}
        for (src, _i) in got:
            counts[src] = counts.get(src, 0) + 1
        full = {s_ for s_, n in
                __import__("collections").Counter(s_ for s_, _i, w in rows if w and w > 0).items()
                if n >= 5}
        assert all(counts[s_] == 5 for s_ in full)

    planted = (
        [("a", i, 1.0) for i in range(50)]
        + [("a", 999, 1e9)]                  # heavy: must be drawn in 'a'
        + [("b", 100 + i, 2.0) for i in range(3)]  # small stratum: all 3
        + [("c", 200, None), ("c", 201, 0.0), ("c", 202, -1.0), ("c", 203, 5.0)]
    )
    df = spark.createDataFrame(planted, "k: string, doc_id: long, w: double")
    got = {
        (r["k"], r["doc_id"]): r["sel_rank"]
        for r in sample_weighted_per_key(df, 5, "w", "k", "doc_id").collect()
    }
    assert ("a", 999) in got
    assert {i for (kk, i) in got if kk == "b"} == {100, 101, 102}
    assert {i for (kk, i) in got if kk == "c"} == {203}  # only positive weight


def test_step_latency_matches_python_and_planted(spark):
    """r14: per-hop conversion latency ≡ an independent python
    first-completion replay (first view, first click ≥ it, first
    purchase ≥ that; exact numpy percentiles) at two sfs; planted:
    known hop latencies come back exactly, a click BEFORE the first
    view does not convert (ordering matters), a user with view+click
    but no purchase counts only in the first hop."""
    import numpy as np

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    r4 = lambda v: float(np.round(v * 10000) / 10000 + 0.0)  # noqa: E731

    def ref(rows):
        by = {}
        for u, et, t in rows:
            by.setdefault(u, []).append((t, et))
        lat1, lat2 = [], []
        for u, evs in by.items():
            views = [t for t, e in evs if e == "view"]
            if not views:
                continue
            t1 = min(views)
            clicks = [t for t, e in evs if e == "click" and t >= t1]
            if not clicks:
                continue
            t2 = min(clicks)
            lat1.append(t2 - t1)
            purchases = [t for t, e in evs if e == "purchase" and t >= t2]
            if purchases:
                lat2.append(min(purchases) - t2)
        out = {}
        for hop, lats in (("view->click", lat1), ("click->purchase", lat2)):
            if lats:
                out[hop] = (
                    len(lats),
                    r4(float(np.percentile(lats, 50))),
                    r4(float(np.percentile(lats, 90))),
                )
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["user_id"], r["event_type"], float(r["ts_s"]))
            for r in load(spark, sf, "events", columns=["user_id", "event_type", "ts"])
            .select("user_id", "event_type",
                    F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"))
            .collect()
        ]
        want = ref(rows)
        got = {
            r["hop"]: (r["n_converted"], r["median_s"], r["p90_s"])
            for r in QUERIES["events_step_latency"](spark, sf).collect()
        }
        assert got == want, sf

    import n2kupdate_spark.queries.streaming_batch as sb

    planted = [
        (1, "view", 100.0), (1, "click", 160.0), (1, "purchase", 460.0),
        (2, "click", 50.0), (2, "view", 100.0), (2, "click", 300.0),  # early click ignored
        (3, "view", 0.0), (3, "click", 10.0),                          # no purchase
    ]
    df = spark.createDataFrame(
        planted, "user_id: long, event_type: string, ts: double"
    ).select("user_id", "event_type", F.to_timestamp(F.from_unixtime("ts")).alias("ts"))
    orig = sb.load
    try:
        sb.load = lambda spark_, sf_, t, columns=None: df
        got = {
            r["hop"]: r for r in QUERIES["events_step_latency"](spark, "ignored").collect()
        }
    finally:
        sb.load = orig
    # hops: u1 60/300; u2 200/-; u3 10/-
    assert got["view->click"]["n_converted"] == 3
    assert got["view->click"]["median_s"] == 60.0
    assert got["click->purchase"]["n_converted"] == 1
    assert got["click->purchase"]["median_s"] == 300.0


def test_active_users_rolling_matches_python_sets(spark):
    """r14: DAU/WAU/MAU ≡ an independent python SET replay (per day,
    the union of distinct-user sets over the trailing 1/7/30 calendar
    days) at two sfs — the set semantics a rolling SUM would corrupt
    (pinned: a user active twice in one week counts once in WAU);
    planted: known overlapping actives come back exactly, stickiness =
    DAU/MAU floor-half-up."""
    import datetime as dt
    import math

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    def ref(pairs):  # {(user, date)}
        active = sorted({d for _u, d in pairs})
        bydate = {}
        for u, d in pairs:
            bydate.setdefault(d, set()).add(u)
        # emitted domain = every day in [first, last] activity within
        # 30 days AFTER some active day (quiet mid-stream days read
        # dau=0; both sf fixtures are gap-free so this equals the
        # active-day set there — the planted battery exercises gaps)
        out_days = []
        d = active[0]
        while d <= active[-1]:
            if any(
                d - dt.timedelta(days=off) in bydate for off in range(30)
            ):
                out_days.append(d)
            d += dt.timedelta(days=1)
        out = {}
        for d in out_days:
            dau = bydate.get(d, set())
            wau, mau = set(), set()
            for off in range(30):
                src = d - dt.timedelta(days=off)
                if src in bydate:
                    mau |= bydate[src]
                    if off <= 6:
                        wau |= bydate[src]
            out[d] = (
                len(dau), len(wau), len(mau),
                math.floor(len(dau) * 10000.0 / len(mau) + 0.5) / 10000,
            )
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        pairs = {
            (r["user_id"], r["day"])
            for r in load(spark, sf, "events", columns=["user_id", "ts"])
            .select("user_id", F.to_date("ts").alias("day"))
            .distinct()
            .collect()
        }
        want = ref(pairs)
        got = {
            r["day"]: (r["dau"], r["wau"], r["mau"], r["stickiness"])
            for r in QUERIES["events_active_users_rolling"](spark, sf).collect()
        }
        assert got == want, sf

    import n2kupdate_spark.queries.streaming_batch as sb

    d0 = dt.date(2024, 3, 1)
    planted = []
    # u1 active days 0 and 3 (same week: WAU counts once); u2 day 0
    # only; u3 day 35 (outside u1/u2's 30d windows)
    for u, offs in ((1, [0, 3, 3]), (2, [0]), (3, [35])):
        for o in offs:
            planted.append((u, dt.datetime.combine(d0 + dt.timedelta(days=o), dt.time(12))))
    df = spark.createDataFrame(planted, "user_id: long, ts: timestamp")
    orig = sb.load
    try:
        sb.load = lambda spark_, sf_, t, columns=None: df
        got = {
            r["day"]: (r["dau"], r["wau"], r["mau"])
            for r in QUERIES["events_active_users_rolling"](spark, "ignored").collect()
        }
    finally:
        sb.load = orig
    assert got[d0] == (2, 2, 2)
    assert got[d0 + dt.timedelta(days=3)] == (1, 2, 2)  # u1 once in WAU
    assert got[d0 + dt.timedelta(days=6)] == (0, 2, 2)
    assert got[d0 + dt.timedelta(days=7)] == (0, 1, 2)  # day0 left the week
    assert got[d0 + dt.timedelta(days=35)] == (1, 1, 1)  # u3 alone


def test_interleave_mixture_matches_python_and_prefix_property(spark):
    """r14: stride interleaving ≡ an independent python recompute
    (md5-ordered per-source rank, r/w key, α=0.5 tempered weights) at
    two sfs; property on a planted skewed corpus: every prefix of the
    (key, source, doc_id) order tracks the target mixture within
    #sources docs per source — the guarantee batch concatenation
    lacks; determinism across reruns."""
    import hashlib

    import numpy as np

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    def ref(rows):  # [(doc_id, source)]
        counts = {}
        for _i, s_ in rows:
            counts[s_] = counts.get(s_, 0) + 1
        tempered = {s_: n ** 0.5 for s_, n in counts.items()}
        tot = sum(tempered.values())
        weights = {s_: v / tot for s_, v in tempered.items()}
        by = {}
        for i, s_ in rows:
            by.setdefault(s_, []).append(i)
        out = {}
        for s_, ids in by.items():
            ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
            for r, i in enumerate(ids, 1):
                out[i] = (
                    s_,
                    float(np.round(r / weights[s_] * 1000000) / 1000000),
                )
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["doc_id"], r["source"])
            for r in load(spark, sf, "documents", columns=["doc_id", "source"]).collect()
        ]
        want = ref(rows)
        got = {
            r["doc_id"]: (r["source"], r["stride_key"])
            for r in QUERIES["corpus_interleave_mixture"](spark, sf).collect()
        }
        assert got == want, sf

    # planted skew: 400/100/25 docs → weights ∝ 20/10/5; every prefix
    # of the stride order holds each source within #sources of target
    import n2kupdate_spark.queries.mlprep as mlq

    planted = (
        [(i, "big") for i in range(400)]
        + [(1000 + i, "mid") for i in range(100)]
        + [(2000 + i, "small") for i in range(25)]
    )
    df = spark.createDataFrame(planted, "doc_id: long, source: string")
    orig = mlq.load
    try:
        mlq.load = lambda spark_, sf_, t, columns=None: df
        ordered = (
            QUERIES["corpus_interleave_mixture"](spark, "ignored")
            .orderBy("stride_key", "source", "doc_id")
            .collect()
        )
    finally:
        mlq.load = orig
    counts = {"big": 400, "mid": 100, "small": 25}
    tempered = {s_: n ** 0.5 for s_, n in counts.items()}
    tot = sum(tempered.values())
    target = {s_: v / tot for s_, v in tempered.items()}
    seen = {s_: 0 for s_ in counts}
    # the mixture-tracking guarantee holds until the FIRST source runs
    # out of docs (its key range ends at count/w ⇒ n ≈ count/w): past
    # that point the remaining sources legitimately overshoot their
    # nominal share of n — here `small` exhausts at n ≈ 25·(1/w) = 175
    horizon = min(counts[s_] / target[s_] for s_ in counts)
    for n, r in enumerate(ordered, 1):
        seen[r["source"]] += 1
        if n <= horizon:
            for s_ in counts:
                # within the horizon stride keeps each source within
                # O(1) of its share (key ties + mid-tie prefix cuts add
                # a few units — 2·#sources is a safe envelope)
                assert abs(seen[s_] - n * target[s_]) <= 2 * len(counts), (
                    n, s_, seen[s_], n * target[s_]
                )
    assert sum(seen.values()) == 525
    assert seen == counts  # every doc appears exactly once


def test_psi_drift_single_event_type_no_crash(spark):
    """r15 (ADVICE): a corpus with ONE event type makes the rest
    cohort empty (n == gn) — try_divide must read the rest share as
    NULL so the eps clamp floors it, instead of the ANSI
    DIVIDE_BY_ZERO the raw division threw. PSI is then the one-sided
    fold Σ (p−ε)·ln(p/ε) over the dense 10-bin grid — pinned against
    the same python recompute the main test uses."""
    import math

    import numpy as np

    import n2kupdate_spark.queries.diagnostics as diag_mod
    from n2kupdate_spark.queries import QUERIES

    rng = np.random.RandomState(9)
    vals = [float(v) for v in rng.uniform(0.0, 10.0, 500)]
    df = spark.createDataFrame(
        [("only", v) for v in vals], "event_type: string, value: double"
    )
    orig = diag_mod.load
    try:
        diag_mod.load = lambda spark_, sf_, t, columns=None: df
        rows = QUERIES["diag_psi_drift"](spark, "ignored").collect()
    finally:
        diag_mod.load = orig
    assert len(rows) == 1
    r = rows[0]
    assert r["event_type"] == "only" and r["n"] == 500 and r["n_rest"] == 0
    lo, hi, n = min(vals), max(vals), len(vals)
    width = (hi - lo) / 10
    counts = [0] * 10
    for v in vals:
        b = min(9, int((v - lo) / width)) if width > 0 else 0
        counts[b] += 1
    eps = 1e-4
    psi = sum(
        (max(eps, c / n) - eps) * math.log(max(eps, c / n) / eps)
        for c in counts
    )
    assert r["psi"] == float(np.round(psi * 10000) / 10000 + 0.0)
    assert r["psi_band"] == "shifted"  # vs an empty rest, everything is


def test_hw_backtest_long_horizon_baseline_no_peek(spark):
    """r15 (ADVICE): with horizon > period the seasonal-naive baseline
    must TILE the last pre-cut season — the old x[cut−m : cut−m+h]
    slice overlapped the eval window, scoring the baseline against
    actuals it had already seen and biasing naive_mae/skill. Pinned
    against a python recompute of the tiled form on a planted series."""
    import numpy as np

    from n2kupdate_spark.operators.timeseries import holt_winters_backtest

    M, H = 6, 12  # horizon = 2 seasons — the parameterization that peeked
    rng = np.random.RandomState(11)
    rows = []
    x = []
    for i in range(M * 20):
        v = 0.3 * i + 5 * np.sin(2 * np.pi * (i % M) / M) + 0.01 * rng.randn()
        rows.append(("k", i * 3600, float(v)))
        x.append(float(v))
    x = np.array(x)
    df = spark.createDataFrame(rows, "key: string, ts_s: long, value: double")
    got = {
        r["origin_ts"]: r
        for r in holt_winters_backtest(
            df, period=M, horizon=H, n_origins=2
        ).collect()
    }
    n = len(x)
    r4 = lambda v: float(np.floor(v * 10000 + 0.5) / 10000 + 0.0)  # noqa: E731
    checked = 0
    for k in (2, 1):
        cut = n - k * H
        if cut < 2 * M or cut + H > n:
            continue
        naive = x[cut - M : cut][np.arange(H) % M]
        # the tiled baseline must NOT equal the peeking slice on a
        # trending series (they agree only for h <= m) — guard that
        # this test actually exercises the fixed branch
        assert not np.allclose(naive, x[cut - M : cut - M + H])
        nmae = r4(float(np.abs(naive - x[cut : cut + H]).mean()))
        assert got[int(3600 * cut)]["naive_mae"] == nmae, cut
        checked += 1
    assert checked == 2


def test_survival_km_matches_python_and_planted(spark):
    """r15: the Kaplan–Meier curve ≡ an independent python dict-based
    product-limit recompute from raw (user, ts, type, value) rows at
    two sfs (monotone non-increasing, censoring rows never drop the
    curve); planted textbook cohort: durations/censor flags chosen so
    hand-computed S(t) values are exact rationals, plus the classic
    censoring-matters check — dropping censored subjects instead of
    censoring them would read a different (wrong) curve."""
    import numpy as np

    import n2kupdate_spark.queries.streaming_batch as sbq
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    # half-up floor — S(t) is a product of small-integer ratios (review r15)
    r4 = lambda v: float(np.floor(v * 10000 + 0.5) / 10000 + 0.0)  # noqa: E731

    def ref(rows):
        # rows: (user, s, type, value) — replicate the spec independently
        first, conv = {}, {}
        end = max(s for _u, s, _t, _v in rows)
        for u, s, t, v in rows:
            first[u] = min(first.get(u, s), s)
            if t == "purchase" and v is not None and v >= 150.0:
                conv[u] = min(conv.get(u, s), s)
        subjects = []
        for u, f in first.items():
            if u in conv:
                subjects.append(((conv[u] - f) // 86400, True))
            else:
                subjects.append(((end - f) // 86400, False))
        days = sorted({d for d, _c in subjects})
        out = {}
        surv = 1.0
        for d in days:
            n_risk = sum(1 for dd, _c in subjects if dd >= d)
            n_conv = sum(1 for dd, c in subjects if dd == d and c)
            n_cens = sum(1 for dd, c in subjects if dd == d and not c)
            surv = surv * (1 - n_conv / n_risk)
            out[d] = (n_risk, n_conv, n_cens, r4(surv))
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (int(r["user_id"]), int(r["s"]), r["event_type"], r["value"])
            for r in load(spark, sf, "events")
            .selectExpr(
                "user_id",
                "CAST(unix_timestamp(date_trunc('second', ts)) AS LONG) AS s",
                "event_type",
                "value",
            )
            .collect()
        ]
        want = ref(rows)
        got = {
            r["day"]: (r["n_risk"], r["n_converted"], r["n_censored"], r["survival"])
            for r in QUERIES["events_survival_km"](spark, sf).collect()
        }
        assert got == want, sf
        curve = [v[3] for _d, v in sorted(got.items())]
        assert all(a >= b for a, b in zip(curve, curve[1:]))  # monotone

    # textbook cohort (11 subjects; censoring duration is end − first
    # event by spec, so censored subjects get their duration via a LATE
    # first event): conversions at day 1 (2 of 11) → S = 9/11; one
    # subject censored at duration 2 (first event day 3, never
    # converts); conversions at day 3 (2 of 8 then at risk)
    # → S = 9/11 · 6/8; six subjects censored at duration 5.
    DAY = 86400
    rows = []
    uid = 0

    def add_conv(day):
        nonlocal uid
        uid += 1
        rows.append((uid, 0, "view", 1.0))
        rows.append((uid, day * DAY, "purchase", 200.0))

    def add_cens(duration):
        nonlocal uid
        uid += 1
        rows.append((uid, (5 - duration) * DAY, "view", 1.0))

    add_conv(1)
    add_conv(1)
    add_cens(2)
    add_conv(3)
    add_conv(3)
    for _ in range(5):
        add_cens(5)
    # anchor pins the observation end to day 5 (also censored at 5)
    uid += 1
    rows.append((uid, 0, "view", 1.0))
    rows.append((uid, 5 * DAY, "view", 1.0))
    df = spark.createDataFrame(
        rows, "user_id: long, s: long, event_type: string, value: double"
    )
    # the query reads ts via ts_seconds — feed it a frame with a ts column
    planted = df.selectExpr(
        "user_id", "timestamp_seconds(s) AS ts", "event_type", "value"
    )
    orig = sbq.load
    try:
        sbq.load = lambda spark_, sf_, t, columns=None: planted
        got = {
            r["day"]: (r["n_risk"], r["n_converted"], r["n_censored"], r["survival"])
            for r in QUERIES["events_survival_km"](spark, "ignored").collect()
        }
    finally:
        sbq.load = orig
    # 11 subjects: day1 2 conv of 11 → 9/11; day2 1 censored; day3 2 conv
    # of 8 → 9/11·6/8; day5 censored tail (6 subjects: 5 + anchor)
    s1 = r4(9 / 11)
    s3 = r4(9 / 11 * 6 / 8)
    assert got[1] == (11, 2, 0, s1)
    assert got[2] == (9, 0, 1, s1)      # censoring does NOT drop the curve
    assert got[3] == (8, 2, 0, s3)
    assert got[5] == (6, 0, 6, s3)
    # censoring-matters: dropping the day-2 censored subject would give
    # S(3) = 9/11 · 5/7 ≠ the censored-correct 9/11 · 6/8
    assert s3 != r4(9 / 11 * 5 / 7)


def test_benford_fit_matches_python_and_planted(spark):
    """r15: the Benford table ≡ a python same-formula recompute
    (math.floor/log10 on the same doubles) at two sfs; planted: a
    log-uniform sample (the canonical Benford-conforming law) reads
    'acceptable', a uniform sample reads 'nonconforming', zero-count
    digits stay as explicit rows."""
    import math

    import numpy as np

    import n2kupdate_spark.queries.diagnostics as diag_mod
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    # half-up floor convention — shares are small-integer ratios and hit
    # exact 4dp halves (82/320) where np.round half-to-even diverges
    r4 = lambda v: float(np.floor(v * 10000 + 0.5) / 10000 + 0.0)  # noqa: E731

    def ref(rows):
        by = {}
        for g, x in rows:
            if x > 0:
                d = int(math.floor(x / 10 ** math.floor(math.log10(x))))
                by.setdefault(g, {}).setdefault(d, 0)
                by[g][d] += 1
        out = {}
        for g, counts in by.items():
            n = sum(counts.values())
            mad = sum(
                abs(counts.get(d, 0) / n - math.log10(1 + 1 / d)) for d in range(1, 10)
            ) / 9
            band = (
                "acceptable" if mad < 0.006
                else "marginal" if mad < 0.012
                else "nonconforming"
            )
            for d in range(1, 10):
                c = counts.get(d, 0)
                out[(g, d)] = (
                    c,
                    r4(c / n),
                    r4(math.log10(1 + 1 / d)),
                    r4(c / n - math.log10(1 + 1 / d)),
                    r4(mad),
                    band,
                )
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["o_orderpriority"], float(r["o_totalprice"]))
            for r in load(
                spark, sf, "orders", columns=["o_orderpriority", "o_totalprice"]
            ).collect()
        ]
        want = ref(rows)
        got = {
            (r["o_orderpriority"], r["digit"]): (
                r["n"], r["obs_share"], r["exp_share"], r["dev"], r["mad"],
                r["conformity"],
            )
            for r in QUERIES["diag_benford_fit"](spark, sf).collect()
        }
        assert got == want, sf

    rng = np.random.RandomState(17)
    # log-uniform over 6 decades: first digits follow Benford exactly in
    # law; 30k draws keep the sample MAD inside the 'acceptable' band
    lognorm = [("benford", float(10 ** rng.uniform(0, 6))) for _ in range(30000)]
    # uniform on [1, 10): every first digit equally likely — maximally
    # non-Benford; also plants zero-count digits via a [1,3) slice
    uniform = [("uniform", float(rng.uniform(1, 10))) for _ in range(5000)]
    narrow = [("narrow", float(rng.uniform(1, 3))) for _ in range(2000)]
    df = spark.createDataFrame(
        lognorm + uniform + narrow, "o_orderpriority: string, o_totalprice: double"
    )
    orig = diag_mod.load
    try:
        diag_mod.load = lambda spark_, sf_, t, columns=None: df
        rows = QUERIES["diag_benford_fit"](spark, "ignored").collect()
    finally:
        diag_mod.load = orig
    got = {(r["o_orderpriority"], r["digit"]): r for r in rows}
    assert got[("benford", 1)]["conformity"] == "acceptable"
    assert got[("uniform", 1)]["conformity"] == "nonconforming"
    # narrow range: digits 3..9 have zero counts but explicit rows
    for d in range(3, 10):
        assert got[("narrow", d)]["n"] == 0
        assert got[("narrow", d)]["obs_share"] == 0.0
    assert got[("narrow", 1)]["conformity"] == "nonconforming"
    # the dense spine must always emit exactly 9 digits per group
    assert sum(1 for (g, _d) in got if g == "benford") == 9


def test_theta_forecast_matches_python_and_planted(spark):
    """r15: the Theta forecast ≡ an independent python recompute of the
    SES-with-drift closed form (own SES loop, own least-squares slope
    via explicit sums — not np.polyfit) at two sfs; planted: on a pure
    linear trend the h-step forecast grows at HALF the slope (the
    theta signature — SES flatness averaged with the trend line), and
    a 2-point key emits nothing."""
    import numpy as np

    from n2kupdate_spark.operators.timeseries import theta_forecast
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    A = 0.2
    r4 = lambda v: float(np.floor(v * 10000 + 0.5) / 10000 + 0.0)  # noqa: E731

    def ref(ts, x, horizon=24, step=3600):
        n = len(x)
        if n < 3:
            return {}
        t_mean = (n - 1) / 2
        x_mean = sum(x) / n
        b = sum((i - t_mean) * (v - x_mean) for i, v in enumerate(x)) / sum(
            (i - t_mean) ** 2 for i in range(n)
        )
        lvl = x[0]
        for v in x[1:]:
            lvl = A * v + (1 - A) * lvl
        decay = (1 - A) ** n / A
        return {
            int(ts[-1] + h * step): (
                r4(lvl + (b / 2) * (h - 1 + 1 / A - decay)),
                r4(lvl),
                r4(b / 2),
            )
            for h in range(1, horizon + 1)
        }

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        hourly = (
            load(spark, sf, "events", columns=["ts", "event_type"])
            .selectExpr(
                "event_type",
                "CAST(floor(unix_timestamp(date_trunc('second', ts)) / 3600) * 3600 AS LONG) AS ts_s",
            )
            .groupBy("event_type", "ts_s")
            .count()
            .toPandas()
        )
        lo, hi = hourly["ts_s"].min(), hourly["ts_s"].max()
        grid = list(range(int(lo), int(hi) + 1, 3600))
        want = {}
        for et, g in hourly.groupby("event_type"):
            series = dict(zip(g["ts_s"], g["count"]))
            x = [float(series.get(t, 0)) for t in grid]
            for ts_out, tup in ref(grid, x).items():
                want[(et, ts_out)] = tup
        got = {
            (r["event_type"], r["ts_s"]): (r["forecast"], r["level"], r["half_drift"])
            for r in QUERIES["ts_theta_forecast"](spark, sf).collect()
        }
        assert got == want, sf

    rows = [("lin", i * 3600, float(7.0 + 2.0 * i)) for i in range(50)]
    rows += [("short", 0, 1.0), ("short", 3600, 2.0)]
    df = spark.createDataFrame(rows, "key: string, ts_s: long, value: double")
    out = theta_forecast(df, horizon=10, alpha=0.2).collect()
    assert not any(r["key"] == "short" for r in out)
    lin = sorted((r for r in out if r["key"] == "lin"), key=lambda r: r["ts_s"])
    assert len(lin) == 10
    assert all(abs(r["half_drift"] - 1.0) < 1e-9 for r in lin)  # slope 2 → drift 1
    # consecutive forecasts step by half the true slope
    steps = [b["forecast"] - a["forecast"] for a, b in zip(lin, lin[1:])]
    assert all(abs(s - 1.0) < 1e-6 for s in steps)


def test_keyphrase_rake_matches_python_and_planted(spark):
    """r15: RAKE top-3 ≡ an independent python dict recompute of the
    published algorithm (token-walk phrase builder — a different
    candidate-extraction path from the engine's lookaround regexp) at
    two sfs; planted: the canonical multi-word-collocation example —
    a repeated strong collocation outranks frequent singletons, and
    stopwords never appear inside any emitted phrase."""
    import numpy as np

    import n2kupdate_spark.queries.text as textq
    from n2kupdate_spark.operators.corpus import GOPHER_STOPWORDS
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    STOPS = set(GOPHER_STOPWORDS)
    r4 = lambda v: float(np.floor(v * 10000 + 0.5) / 10000 + 0.0)  # noqa: E731

    def ref(rows, k=3):
        import re

        out = {}
        for doc_id, text in rows:
            cleaned = re.sub(r"[^\w\s]", "\x01", text or "")
            runs = []
            for seg in cleaned.split("\x01"):
                cur = []
                for tok in seg.split():
                    if tok in STOPS:
                        if cur:
                            runs.append(cur)
                        cur = []
                    else:
                        cur.append(tok)
                if cur:
                    runs.append(cur)
            freq, deg = {}, {}
            for run in runs:
                for w in run:
                    freq[w] = freq.get(w, 0) + 1
                    deg[w] = deg.get(w, 0) + len(run)
            scores = {}
            for run in runs:
                ph = " ".join(run)
                scores[ph] = (len(run), sum(deg[w] / freq[w] for w in run))
            ranked = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))
            for rank, (ph, (nw, sc)) in enumerate(ranked[:k], 1):
                out[(doc_id, ph)] = (nw, r4(sc), rank)
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["doc_id"], r["text"])
            for r in load(spark, sf, "documents", columns=["doc_id", "text"]).collect()
        ]
        want = ref(rows)
        got = {
            (r["doc_id"], r["phrase"]): (r["n_words"], r["score"], r["rank"])
            for r in QUERIES["text_keyphrase_rake"](spark, sf).collect()
        }
        assert got == want, sf

    planted = [
        (
            1,
            "linear diophantine equations of strict inequations and "
            "nonstrict inequations the criteria of linear diophantine "
            "equations and algorithms of minimal generating sets",
        ),
        (2, "the a of to is in and"),  # stopwords only → no phrases
        # review r15: literal '|' , punctuation, newline/tab/double-space —
        # punctuation splits candidates, whitespace normalizes, and the
        # delimiter can never collide with content
        (3, "big data | machine learning, deep\nlearning\tand  big data"),
        # advice r15: a stopword ABUTTING punctuation ('of,' / ',the')
        # must still act as a delimiter — the \s-only lookaround bug kept
        # it inside the phrase
        (4, "end of, the start"),
        (5, "x,the end and middle of,and stuff"),
    ]
    df = spark.createDataFrame(planted, "doc_id: long, text: string")
    orig = textq.load
    try:
        textq.load = lambda spark_, sf_, t, columns=None: df
        rows = QUERIES["text_keyphrase_rake"](spark, "ignored").collect()
    finally:
        textq.load = orig
    got = {(r["doc_id"], r["rank"]): r for r in rows}
    # the repeated 3-word collocation wins (deg-weighted — the RAKE claim)
    assert got[(1, 1)]["phrase"] == "linear diophantine equations"
    assert not any(d == 2 for d, _r in got)  # stopword-only doc: nothing
    for r in rows:
        assert not (set(r["phrase"].split()) & STOPS)
    # doc 3: '|' and ',' split candidates; whitespace variants normalize —
    # the repeated 2-word phrase wins and no phrase carries raw whitespace
    assert got[(3, 1)]["phrase"] == "big data"
    want3 = ref([p for p in planted if p[0] == 3])
    got3 = {(d, ph): v for (d, ph), v in (
        ((r["doc_id"], r["phrase"]), (r["n_words"], r["score"], r["rank"]))
        for r in rows if r["doc_id"] == 3
    )}
    assert got3 == want3
    for r in rows:
        assert "\n" not in r["phrase"] and "\t" not in r["phrase"]
        assert "  " not in r["phrase"] and "|" not in r["phrase"]
    # docs 4/5: punctuation-abutting stopwords split (engine ≡ the
    # token-walk ref, which always treated them as delimiters)
    for did in (4, 5):
        want_d = ref([p for p in planted if p[0] == did])
        got_d = {
            (r["doc_id"], r["phrase"]): (r["n_words"], r["score"], r["rank"])
            for r in rows
            if r["doc_id"] == did
        }
        assert got_d == want_d, did
    assert got[(4, 1)]["phrase"] == "end" and got[(4, 2)]["phrase"] == "start"


def test_pelt_changepoints_match_exact_dp_and_planted(spark):
    """r15: the PELT query ≡ an independent EXACT un-pruned O(n²) DP
    recompute of the penalized segmentation (same cost/penalty spec,
    no pruning — equality proves PELT's pruning is lossless on real
    data) at two sfs, twins included; planted: two well-separated mean
    shifts recovered at exactly the planted indices with correct
    segment means, pure noise stays quiet under the BIC penalty, and a
    3-point key emits nothing."""
    import numpy as np

    from n2kupdate_spark.operators.timeseries import pelt_changepoints
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    r4 = lambda v: float(np.floor(v * 10000 + 0.5) / 10000 + 0.0)  # noqa: E731

    def exact_dp(x, penalty):
        n = len(x)
        cs = np.concatenate([[0.0], np.cumsum(x)])
        cs2 = np.concatenate([[0.0], np.cumsum(np.square(x))])

        def cost(s, t):
            return float(cs2[t] - cs2[s] - (cs[t] - cs[s]) ** 2 / (t - s))

        Fv = [-penalty] + [0.0] * n
        last = [0] * (n + 1)
        for t in range(1, n + 1):
            Fv[t], last[t] = min(
                (Fv[s] + cost(s, t) + penalty, s) for s in range(t)
            )
        cps, t = [], n
        while t > 0:
            s = last[t]
            if s > 0:
                cps.append(s)
            t = s
        return sorted(cps)

    def ref_rows(key, ts, x):
        n = len(x)
        if n < 4:
            return {}
        sigma2 = float(np.mean(np.diff(x) ** 2)) / 2.0
        pen = 2.0 * max(sigma2, 1e-12) * np.log(n)
        cps = exact_dp(np.asarray(x, dtype=float), pen)
        bounds = [0] + cps + [n]
        out = {}
        for i, cp in enumerate(cps):
            out[(key, cp)] = (
                int(ts[cp]),
                r4(float(np.mean(x[bounds[i] : cp]))),
                r4(float(np.mean(x[cp : bounds[i + 2]]))),
            )
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        hourly = (
            load(spark, sf, "events", columns=["ts", "event_type"])
            .selectExpr(
                "event_type",
                "CAST(floor(unix_timestamp(date_trunc('second', ts)) / 3600) * 3600 AS LONG) AS ts_s",
            )
            .groupBy("event_type", "ts_s")
            .count()
            .toPandas()
        )
        lo, hi = int(hourly["ts_s"].min()), int(hourly["ts_s"].max())
        mean_cnt = float(hourly["count"].mean())
        step = max(5.0, 4.0 * mean_cnt**0.5)
        grid = list(range(lo, hi + 1, 3600))
        want = {}
        xxh = {
            r["event_type"]: int(r["h"])
            for r in spark.createDataFrame(
                [(t,) for t in hourly["event_type"].unique()], "event_type: string"
            )
            .selectExpr("event_type", "pmod(xxhash64(event_type), 480) AS h")
            .collect()
        }
        for et, g in hourly.groupby("event_type"):
            series = dict(zip(g["ts_s"], g["count"]))
            x = np.array([float(series.get(t, 0)) for t in grid])
            want.update(ref_rows(et, grid, x))
            cp_ts = lo + (xxh[et] + 168) * 3600
            tw = x + np.where(np.array(grid) >= cp_ts, step, 0.0)
            want.update(ref_rows(f"{et}#shifted", grid, tw))
        got = {
            (r["event_type"], r["cp_index"]): (
                r["ts_s"], r["mean_before"], r["mean_after"]
            )
            for r in QUERIES["ts_changepoint_pelt"](spark, sf).collect()
        }
        assert got == want, sf
        # every planted twin must fire at least one changepoint
        fired = {k for k, _i in got if k.endswith("#shifted")}
        assert fired == {f"{t}#shifted" for t in xxh}, sf

    rng = np.random.RandomState(23)
    x = np.concatenate(
        [rng.randn(60) + 0.0, rng.randn(50) + 6.0, rng.randn(40) - 4.0]
    )
    rows = [("plant", i * 3600, float(v)) for i, v in enumerate(x)]
    rows += [("noise", i * 3600, float(v)) for i, v in enumerate(rng.randn(150))]
    rows += [("tiny", i * 3600, float(i)) for i in range(3)]
    df = spark.createDataFrame(rows, "key: string, ts_s: long, value: double")
    got = {}
    for r in pelt_changepoints(df).collect():
        got.setdefault(r["key"], []).append(
            (r["cp_index"], r["mean_before"], r["mean_after"])
        )
    assert "tiny" not in got
    assert "noise" not in got  # BIC penalty holds on pure noise
    cps = sorted(got["plant"])
    assert [c for c, _b, _a in cps] == [60, 110]
    assert abs(cps[0][1] - 0.0) < 0.5 and abs(cps[0][2] - 6.0) < 0.5
    assert abs(cps[1][2] - (-4.0)) < 0.5


def test_rolling_quantile_matches_python_and_planted(spark):
    """r15: rolling median/p90 ≡ an independent python recompute
    (explicit trailing-window sort, lower order statistic ⌈q·n⌉) at
    two sfs; planted: a step series' rolling median lags the step by
    exactly ⌈N/2⌉ points (the median's breakdown robustness), a spike
    never moves the median but owns the p90 while in window, and the
    first rows read growing n_window."""
    import numpy as np

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    N = 20

    def ref(rows):
        out = {}
        by = {}
        for u, eid, ts, v in rows:
            by.setdefault(u, []).append((ts, eid, v))
        for u, items in by.items():
            items.sort()
            for i, (ts, eid, v) in enumerate(items):
                win = sorted(x for _t, _e, x in items[max(0, i - N + 1) : i + 1])
                n = len(win)
                pick = lambda q: win[max(1, int(np.ceil(q * n))) - 1]  # noqa: E731
                out[(u, eid)] = (ts, v, pick(0.5), pick(0.9), n)
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (int(r["user_id"]), int(r["event_id"]), int(r["ts_s"]), float(r["value"]))
            for r in load(spark, sf, "events")
            .selectExpr(
                "user_id", "event_id",
                "CAST(unix_timestamp(date_trunc('second', ts)) AS LONG) AS ts_s",
                "ROUND(value, 4) AS value",
            )
            .filter("value IS NOT NULL")
            .collect()
        ]
        want = ref(rows)
        got = {
            (r["user_id"], r["event_id"]): (
                r["ts_s"], r["value"], r["roll_median"], r["roll_p90"], r["n_window"]
            )
            for r in QUERIES["ts_rolling_quantile"](spark, sf).collect()
        }
        assert got == want, sf

    import n2kupdate_spark.queries.mlprep as mlq

    rows = []
    for i in range(60):
        v = 1.0 if i < 30 else 101.0       # step at i=30
        if i in (8, 9, 10):
            v = 1000.0                     # 3-point spike burst (>10% of window)
        rows.append((7, i, 1_700_000_000 + i * 60, v))
    df = spark.createDataFrame(
        rows, "user_id: long, event_id: long, s: long, value: double"
    ).selectExpr("user_id", "event_id", "timestamp_seconds(s) AS ts", "value")
    orig = mlq.load
    try:
        mlq.load = lambda spark_, sf_, t, columns=None: df
        got = {
            r["event_id"]: r
            for r in QUERIES["ts_rolling_quantile"](spark, "ignored").collect()
        }
    finally:
        mlq.load = orig
    # 3 spikes in an 11-row window: ⌈0.9·11⌉ = 10th order stat IS a spike
    # while the median never moves (breakdown robustness)
    assert got[10]["roll_median"] == 1.0 and got[10]["roll_p90"] == 1000.0
    assert got[29]["roll_median"] == 1.0          # burst left the window
    # lower-median convention: the flip needs ⌈N/2⌉+1 = 11 post-step
    # points in the 20-window — at i=39 it still reads 1.0, at 40 it flips
    assert got[39]["roll_median"] == 1.0
    assert got[40]["roll_median"] == 101.0
    assert got[0]["n_window"] == 1 and got[19]["n_window"] == 20
    assert got[59]["n_window"] == 20


def test_ar_forecast_and_backtest_match_python_and_planted(spark):
    """r16: the AR(25) Yule–Walker forecaster + its rolling-origin
    backtest ≡ an independent python recompute (own autocovariance
    loop, own Toeplitz build + solve, own forecast recursion, own
    MAE/sMAPE/naive scoring) at two sfs; planted: a seeded AR(1)
    series recovers φ₁ ≈ 0.9; an exact period-24 sinusoid recovers the
    difference-equation coefficient 2cos(2π/24) ≈ 1.9276 and continues
    the wave (max err < 0.15); a constant series forecasts its mean
    exactly; a 40-point key emits nothing; a period-16 cycle (ANTI-
    phase to the lag-24 naive) earns skill > 0.8 at every origin while
    the period-24 sinusoid (naive near-EXACT) hits the documented −999
    skill floor; origin/n_train sets are IDENTICAL across all three
    backtests (HW / Theta / AR) on the same series — the
    comparable-skill contract."""
    import numpy as np

    from n2kupdate_spark.operators.timeseries import (
        ar_backtest,
        ar_forecast,
        holt_winters_backtest,
        theta_backtest,
    )
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    P, H, M = 25, 24, 24
    r4 = lambda v: float(np.floor(v * 10000 + 0.5) / 10000 + 0.0)  # noqa: E731

    def ref_fit(x):
        n = len(x)
        pe = int(min(P, max(1, n // 2)))
        mu = float(x.mean())
        xc = x - mu
        gam = np.array(
            [float(np.dot(xc[: n - k], xc[k:])) / n for k in range(pe + 1)]
        )
        if gam[0] <= 0:
            return mu, None, pe
        R = np.empty((pe, pe))
        for i in range(pe):
            for j in range(pe):
                R[i, j] = gam[abs(i - j)]
        phi = np.linalg.solve(R + np.eye(pe) * gam[0] * 1e-8, gam[1 : pe + 1])
        return mu, phi, pe

    def ref_fc(x, h):
        mu, phi, pe = ref_fit(x)
        if phi is None:
            return np.full(h, mu)
        hist = list(x - mu)[-pe:]
        out = []
        for _ in range(h):
            v = float(np.dot(phi, np.array(hist[-pe:])[::-1]))
            out.append(mu + v)
            hist.append(v)
        return np.array(out)

    def ref_bt(ts, x, n_origins=3):
        out = {}
        n = len(x)
        for k in range(n_origins, 0, -1):
            cut = n - k * H
            if cut < 2 * M or cut + H > n:
                continue
            fc = ref_fc(x[:cut], H)
            actual = x[cut : cut + H]
            naive = x[cut - M : cut][np.arange(H) % M]
            mae = np.abs(fc - actual).mean()
            nmae = np.abs(naive - actual).mean()
            den = np.abs(fc) + np.abs(actual)
            ok = den > 0
            smape = ((2 * np.abs(fc - actual))[ok] / den[ok]).mean() if ok.any() else 0.0
            skill = max(1 - mae / nmae, -999.0) if nmae > 0 else 0.0
            out[int(ts[cut])] = (cut, r4(mae), r4(smape), r4(nmae), r4(skill))
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = (
            load(spark, sf, "events", columns=["ts", "event_type"])
            .select(
                "event_type",
                (F.floor(F.unix_timestamp(F.date_trunc("second", F.col("ts"))) / 3600) * 3600)
                .cast("long").alias("ts_s"),
            )
            .groupBy("event_type", "ts_s")
            .count()
            .toPandas()
        )
        lo, hi = ev["ts_s"].min(), ev["ts_s"].max()
        grid = np.arange(lo, hi + 1, 3600)
        want_fc, want_bt = {}, {}
        for et, g in ev.groupby("event_type"):
            series = dict(zip(g["ts_s"], g["count"]))
            x = np.array([float(series.get(t, 0)) for t in grid])
            if len(x) >= 2 * P:
                fc = ref_fc(x, H)
                for h in range(H):
                    want_fc[(et, int(grid[-1] + (h + 1) * 3600))] = r4(float(fc[h]))
            for ots, tup in ref_bt(grid, x).items():
                want_bt[(et, ots)] = tup
        got_fc = {
            (r["event_type"], r["ts_s"]): r["forecast"]
            for r in QUERIES["ts_ar_forecast"](spark, sf).collect()
        }
        assert got_fc.keys() == want_fc.keys(), sf
        for k in want_fc:
            assert abs(got_fc[k] - want_fc[k]) <= 1e-4, (sf, k, got_fc[k], want_fc[k])
        got_bt = {
            (r["event_type"], r["origin_ts"]): (
                r["n_train"], r["mae"], r["smape"], r["naive_mae"], r["skill"]
            )
            for r in QUERIES["ts_backtest_ar"](spark, sf).collect()
        }
        assert got_bt == want_bt, sf

    n = 240
    rng = np.random.RandomState(3)
    ar1 = np.zeros(n)
    for t in range(1, n):
        ar1[t] = 0.9 * ar1[t - 1] + rng.randn()
    sine = np.sin(2 * np.pi * np.arange(n) / 24.0)
    rng16 = np.random.RandomState(5)
    c16 = 10.0 + 5.0 * np.sin(2 * np.pi * np.arange(n) / 16.0) + 0.05 * rng16.randn(n)
    rows = (
        [("ar1", i * 3600, float(ar1[i])) for i in range(n)]
        + [("sine", i * 3600, float(sine[i])) for i in range(n)]
        + [("c16", i * 3600, float(c16[i])) for i in range(n)]
        + [("const", i * 3600, 7.5) for i in range(120)]
        + [("short", i * 3600, 1.0) for i in range(40)]
    )
    df = spark.createDataFrame(rows, "key: string, ts_s: long, value: double")
    fc = {}
    for r in ar_forecast(df, horizon=24, p=P).collect():
        fc.setdefault(r["key"], []).append(r)
    for k in fc:
        fc[k].sort(key=lambda r: r["ts_s"])
    assert "short" not in fc  # < 2p points: below the covariance floor
    assert 0.85 < fc["ar1"][0]["phi_lag1"] < 0.95  # φ recovered
    # sin satisfies x_t = 2cos(ω)x_{t−1} − x_{t−2}; YW finds the recursion
    assert abs(fc["sine"][0]["phi_lag1"] - 2 * np.cos(2 * np.pi / 24)) < 0.05
    cont = np.array([r["forecast"] for r in fc["sine"]])
    true_future = np.sin(2 * np.pi * np.arange(n, n + 24) / 24.0)
    assert np.abs(cont - true_future).max() < 0.15
    for r in fc["const"]:
        assert r["forecast"] == 7.5 and r["mean_level"] == 7.5

    bt = {
        (r["key"], r["origin_ts"]): r
        for r in ar_backtest(df, period=24, n_origins=3, p=P).collect()
    }
    c16_rows = [r for (k, _), r in bt.items() if k == "c16"]
    assert len(c16_rows) == 3
    for r in c16_rows:
        assert r["skill"] > 0.8, dict(r.asDict())  # anti-phase naive loses
    for (k, _), r in bt.items():
        if k == "sine":
            assert r["skill"] == -999.0, dict(r.asDict())  # documented floor
    ar_o = {k: r["n_train"] for k, r in bt.items()}
    hw_o = {
        (r["key"], r["origin_ts"]): r["n_train"]
        for r in holt_winters_backtest(df, period=24, n_origins=3).collect()
    }
    th_o = {
        (r["key"], r["origin_ts"]): r["n_train"]
        for r in theta_backtest(df, period=24, n_origins=3).collect()
    }
    assert ar_o == hw_o == th_o  # the comparable-skill contract


def test_period_detect_matches_python_and_planted(spark):
    """r16: the periodogram dominant-period row ≡ an independent
    python recompute (own explicit-sums detrend, own rfft power walk)
    at two sfs; planted: an exact period-24 sinusoid over n=240 reads
    period_steps == 24.0 with share ≈ 1; a period-16 cycle reads 16.0
    THROUGH a superimposed linear trend (the detrend's job); seeded
    white noise is not periodic; constant and 7-point keys emit
    nothing."""
    import numpy as np

    from n2kupdate_spark.operators.timeseries import period_detect
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    r4 = lambda v: float(np.floor(v * 10000 + 0.5) / 10000 + 0.0)  # noqa: E731

    def ref(x):
        n = len(x)
        if n < 8:
            return None
        t = np.arange(n, dtype=float)
        den = n * (t * t).sum() - t.sum() ** 2
        slope = (n * (t * x).sum() - t.sum() * x.sum()) / den
        resid = x - (x.mean() + slope * (t - t.mean()))
        if not (resid.var() > 0):
            return None
        p = np.abs(np.fft.rfft(resid)) ** 2
        if len(p) <= 2:
            return None
        k = int(np.argmax(p[2:])) + 2
        total = float(p[1:].sum())
        share = float(p[k] / total) if total > 0 else 0.0
        return (n, r4(n / k), r4(share), r4(float(p[k])), bool(share >= 0.2))

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = (
            load(spark, sf, "events", columns=["ts", "event_type"])
            .select(
                "event_type",
                (F.floor(F.unix_timestamp(F.date_trunc("second", F.col("ts"))) / 3600) * 3600)
                .cast("long").alias("ts_s"),
            )
            .groupBy("event_type", "ts_s")
            .count()
            .toPandas()
        )
        lo, hi = ev["ts_s"].min(), ev["ts_s"].max()
        grid = np.arange(lo, hi + 1, 3600)
        want = {}
        for et, g in ev.groupby("event_type"):
            series = dict(zip(g["ts_s"], g["count"]))
            x = np.array([float(series.get(t, 0)) for t in grid])
            r = ref(x)
            if r is not None:
                want[et] = r
        got = {
            r["event_type"]: (
                r["n"], r["period_steps"], r["power_share"], r["peak_power"],
                r["is_periodic"],
            )
            for r in QUERIES["ts_period_detect"](spark, sf).collect()
        }
        assert got.keys() == want.keys(), sf
        for k in want:
            assert got[k][0] == want[k][0] and got[k][4] is want[k][4], (sf, k)
            for a, b in zip(got[k][1:4], want[k][1:4]):
                assert abs(a - b) <= max(1e-4, 1e-9 * abs(b)), (sf, k, got[k], want[k])

    n = 240
    rng = np.random.RandomState(9)
    rows = (
        [("s24", i * 3600, float(np.sin(2 * np.pi * i / 24.0))) for i in range(n)]
        + [("s16trend", i * 3600, float(0.05 * i + 3.0 * np.sin(2 * np.pi * i / 16.0)))
           for i in range(n)]
        + [("noise", i * 3600, float(rng.randn())) for i in range(n)]
        + [("const", i * 3600, 4.0) for i in range(n)]
        + [("tiny", i * 3600, float(i % 3)) for i in range(7)]
    )
    df = spark.createDataFrame(rows, "key: string, ts_s: long, value: double")
    got = {r["key"]: r.asDict() for r in period_detect(df).collect()}
    assert set(got) == {"s24", "s16trend", "noise"}  # const/tiny emit nothing
    assert got["s24"]["period_steps"] == 24.0 and got["s24"]["is_periodic"] is True
    assert got["s24"]["power_share"] > 0.95
    assert got["s16trend"]["period_steps"] == 16.0, got["s16trend"]
    assert got["s16trend"]["is_periodic"] is True
    assert got["noise"]["is_periodic"] is False, got["noise"]
