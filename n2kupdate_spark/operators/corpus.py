"""Parameterized pre-training corpus gates — the library API behind the
registered demo queries (queries/text.py, queries/mlprep.py).

Every function is DataFrame-in / DataFrame-out with the corpus specifics
(quality thresholds, eval set, mixture weights, sequence budget) as
parameters, so a production caller points them at real tables instead of
re-deriving the fixture-bound query bodies. The registered queries are
thin wrappers calling these with the demo constants, so the DuckDB oracle
gate continuously verifies THIS code, not a parallel copy.

Scale notes live on each function; the common theme: gates are maps or
broadcast joins, the only wide stages are per-doc counts and the
per-source packing window, and the expensive stages are designed to run
after cheap filters have shrunk the corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from n2kupdate_spark.operators.parallel import fan_out

#: Gopher rule thresholds (Rae et al. 2021 §A1.1, adapted to single-line
#: fixture text). Override per-call via ``gopher_metrics`` parameters.
GOPHER_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def gopher_metrics(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stop_hits: int = 2,
    max_top_bigram_frac: float = 0.2,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    widen: bool = True,
) -> DataFrame:
    """Per-doc Gopher quality metrics + combined ``gopher_pass`` flag:
    word-count bounds, mean word length bounds, distinct-stop-word
    presence, and the repetition rule (most frequent bigram ≤ the given
    fraction of bigram slots). Metrics are a pure map except the
    repetition rule, whose (doc, bigram) counts shuffle with map-side
    partial aggregation — shuffled bytes ∝ per-doc distinct bigrams, not
    corpus tokens. Docs with <2 tokens have no bigrams and are absent.
    Rounding is scale-first (ROUND(x*1e4)/1e4) for cross-engine parity."""
    # Both the bigram branch and the metrics map are heavy per-doc work
    # that fuses into the scan; on a one-file table that is ONE task while
    # 31 cores idle (r16, guide §2.6). Keyed fan_out = pure hash exchange.
    # ``widen=False`` for mid-pipeline callers (gate_documents): there the
    # input is not a bare scan and per-branch exchanges measured net-slower.
    if widen:
        docs = fan_out(docs, id_col, fraction=0.5)
    toks = F.split(text_col, " ")
    n = F.size(toks)
    n_big = n - 1
    zipped = F.arrays_zip(
        F.slice(toks, 1, n_big).alias("w0"), F.slice(toks, 2, n_big).alias("w1")
    )
    bigrams = F.transform(zipped, lambda s: F.concat_ws(" ", s["w0"], s["w1"]))
    bc = (
        docs.filter(n >= 2)
        .select(id_col, F.explode(bigrams).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = bc.groupBy(id_col).agg(
        (F.round(F.max("c").cast("double") / F.sum("c") * 10000, 0) / 10000).alias(
            "top_bigram_frac"
        )
    )
    # ONE array literal per call (a per-element F.lit costs one py4j
    # round-trip each — guide §1/§7.3 driver-side wall; r16)
    stop = F.lit(list(stopwords))
    m = docs.select(
        id_col,
        n.alias("n_words"),
        (
            F.round(
                F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t)) / n * 10000,
                0,
            )
            / 10000
        ).alias("mean_word_len"),
        F.size(F.filter(stop, lambda s: F.array_contains(toks, s))).alias("stop_hits"),
    )
    out = m.join(top, id_col)
    gopher_pass = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("stop_hits") >= min_stop_hits)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    )
    return out.select(
        id_col, "n_words", "mean_word_len", "stop_hits", "top_bigram_frac",
        gopher_pass.cast("int").alias("gopher_pass"),
    )


def decontaminate_ngram(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-training-doc count of distinct word n-grams shared with the
    eval corpus, plus an any-overlap flag. The eval side is a benchmark
    suite — thousands of docs, not billions — so its distinct-gram set is
    BROADCAST and the training corpus never shuffles until the per-doc
    count; training grams are per-doc-distinct by construction
    (word_shingles), so no corpus-sized distinct is needed. Docs with < n
    tokens have no grams and are absent. Published pipelines use n in
    8-13, where any single hit is decisive; at short n apply an overlap
    budget on ``n_shared_grams`` instead (see prepare_corpus)."""
    from n2kupdate_spark.operators.dedup import word_shingles

    grams = word_shingles(train_docs.select(id_col, text_col), text_col, n=n).select(
        id_col, F.explode("shingles").alias("g")
    )
    eval_g = (
        word_shingles(eval_docs.select(text_col), text_col, n=n)
        .select(F.explode("shingles").alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        grams.join(F.broadcast(eval_g), "g", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("int").alias("n_shared_grams"),
            F.max(F.coalesce(F.col("hit"), F.lit(0))).cast("int").alias("contaminated"),
        )
    )


def decontaminate_fuzzy(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Fuzzy benchmark decontamination: flag training documents whose
    shingle-set Jaccard against ANY eval document reaches ``threshold`` —
    the MinHash/LSH complement of :func:`decontaminate_ngram`. Exact
    n-gram overlap misses paraphrased or lightly-edited benchmark leaks;
    published pipelines therefore also run a near-duplicate check between
    the training corpus and the eval suite (the same MinHash machinery
    used for corpus-internal dedup, pointed across the train/eval split).

    Returns one row per training doc that had ≥1 LSH candidate:
    ``(id, n_eval_near, max_jaccard, contaminated)`` where ``n_eval_near``
    counts eval docs at or above the threshold, ``max_jaccard`` is the
    exact (not estimated) maximum over the doc's candidates, and
    ``contaminated = 1`` iff ``max_jaccard >= threshold``. Docs with no
    band collision are absent — at LSH's operating point those have
    Jaccard far below any sane threshold (banding theory: a 0.7-Jaccard
    pair collides with p > 0.999 at 16 bands × 2 rows; the pinned recall
    test covers exactly this bound, tests/test_sketch_accuracy.py).

    Scale shape — the train side NEVER self-joins and never shuffles at
    corpus size: signatures are map-only (Arrow-vectorized, see
    minhash_signature); the eval suite is benchmark-sized (thousands of
    docs), so its band table AND its shingle sets are broadcast; candidate
    generation is a broadcast-hash probe of the train band stream
    (bipartite train×eval only — never train×train); the exact-verify
    join touches only candidate train docs (candidate id set broadcast
    back as a semi-filter); the single keyed aggregation is
    candidate-sized. At 100 TB of training text this is one map pass plus
    a collision-bounded tail."""
    from n2kupdate_spark.operators.dedup import (
        band_table,
        minhash_signature,
        word_shingles,
    )

    sh_t = word_shingles(train_docs.select(id_col, text_col), text_col, n=n)
    sh_e = word_shingles(eval_docs.select(id_col, text_col), text_col, n=n).localCheckpoint(
        eager=True
    )
    bands_t = band_table(minhash_signature(sh_t), id_col)
    bands_e = band_table(minhash_signature(sh_e), id_col).withColumnRenamed(
        id_col, "__eval_id"
    )
    cands = (
        bands_t.join(F.broadcast(bands_e), ["band_idx", "band_hash"])
        .select(id_col, "__eval_id")
        .distinct()
    )
    # Exact verify: candidate ids are collision-bounded (≪ corpus), so the
    # train-shingle lookup is a broadcast semi-probe, not a corpus shuffle.
    sh_e_sets = sh_e.select(
        F.col(id_col).alias("__eval_id"), F.col("shingles").alias("__esh")
    )
    # sh_t is deliberately NOT checkpointed: materializing corpus-sized
    # shingle arrays would dominate storage at scale, while the verify
    # branch re-scans only to feed a broadcast-filtered sliver.
    verified = sh_t.join(F.broadcast(cands), id_col).join(
        F.broadcast(sh_e_sets), "__eval_id"
    )
    inter = F.size(F.array_intersect("shingles", "__esh")).cast("double")
    union = (F.size("shingles") + F.size("__esh")).cast("double") - inter
    j = inter / union
    return (
        verified.select(id_col, "__eval_id", j.alias("__j"))
        .groupBy(id_col)
        .agg(
            F.sum((F.col("__j") >= threshold).cast("int")).cast("int").alias("n_eval_near"),
            F.round(F.max("__j"), 4).alias("max_jaccard"),
            F.max((F.col("__j") >= threshold).cast("int")).cast("int").alias("contaminated"),
        )
    )


def eval_bloom_filter(
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Bloom filter over the eval corpus's distinct word n-grams, as a
    DataFrame of set 64-bit words: ``(word_idx int, word long)`` with at
    most ``m_bits / 64`` rows — 16 Ki rows / 128 KiB at the default
    m = 2^20 — regardless of how many grams the eval suite contains.

    Built fully distributed: distinct eval grams → k positions each
    (xxhash64 with seeds 0..k-1, pmod m) → bit_or-aggregated into words.
    No driver collect; the result is small enough to broadcast into the
    probe joins of :func:`decontaminate_bloom`. Rows for words with no
    set bit are absent (a left-join probe treats absent as all-zeros)."""
    from n2kupdate_spark.operators.dedup import word_shingles

    g = (
        word_shingles(eval_docs.select(text_col), text_col, n=n)
        .select(F.explode("shingles").alias("g"))
        .distinct()
    )
    pos = g.select(
        F.explode(
            F.array(*[F.pmod(F.xxhash64("g", F.lit(i)), F.lit(m_bits)) for i in range(k)])
        ).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def decontaminate_bloom(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Benchmark decontamination through a Bloom filter: per-training-doc
    count of distinct word n-grams whose k Bloom probes ALL hit, plus an
    any-hit flag — same output shape as :func:`decontaminate_ngram` with
    ``n_shared_grams`` → ``n_flagged_grams``.

    Why a Bloom variant at all: :func:`decontaminate_ngram` broadcasts the
    eval suite's distinct gram STRINGS, whose size grows with the eval
    battery (a modern multi-benchmark suite reaches GBs of distinct
    grams — too big to broadcast). Here the broadcast is the fixed-size
    bitset — ``m_bits / 8`` bytes (128 KiB at the default), INDEPENDENT of
    eval-suite size — and the probe is k broadcast-hash joins on 64-bit
    word indexes, entirely JVM-side whole-stage codegen: no Python, no
    corpus-sized shuffle before the per-doc count, no row multiplication
    (the k probes are k columns, not k exploded rows).

    Guarantees (the Bloom contract, both directions pinned in
    tests/test_sketch_accuracy.py):
    - NO false negatives: every gram actually shared with the eval set is
      flagged (both sides use the same hash family), so the flagged doc
      set is a SUPERSET of decontaminate_ngram's — safe for filtering.
    - Bounded false positives: after inserting N distinct eval grams, a
      non-shared gram is flagged with p ≈ (1 - e^(-kN/m))^k — at the
      default m = 2^20, k = 4 and a 100k-gram eval suite, p ≈ 1e-4;
      size m ≈ 1.44 · k · N bits upward for larger suites.

    Use as the scale path directly (accepting the tiny FP over-removal,
    the usual production trade) or as a pre-filter whose survivors feed
    the exact gate (:func:`decontaminate_bloom_exact`) — the exact join
    then touches only the Bloom-flagged sliver. Docs with < n tokens
    have no grams and are absent."""
    cur = _bloom_probe_grams(train_docs, eval_docs, id_col, text_col, n, m_bits, k)
    return (
        cur.select(id_col, F.col("__hit").cast("int").alias("__hit"))
        .groupBy(id_col)
        .agg(
            F.sum("__hit").cast("int").alias("n_flagged_grams"),
            F.max("__hit").cast("int").alias("contaminated"),
        )
    )


def _bloom_probe_grams(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Shared Bloom-probe core: per-doc-distinct train grams ``(id, g)``
    with a boolean ``__hit`` column — true iff all k probes against the
    eval bitset hit. Pure JVM codegen: k broadcast-hash joins on the
    constant ``m_bits / 8``-byte word table."""
    from n2kupdate_spark.operators.dedup import word_shingles

    # Tiny (≤ m/64 rows) and probed k times: checkpoint so the k joins
    # don't each re-scan the eval corpus.
    bloom = eval_bloom_filter(
        eval_docs, text_col=text_col, n=n, m_bits=m_bits, k=k
    ).localCheckpoint(eager=True)
    cur = word_shingles(train_docs.select(id_col, text_col), text_col, n=n).select(
        id_col, F.explode("shingles").alias("g")
    )
    hit = F.lit(True)
    for i in range(k):
        cur = cur.withColumn(f"__p{i}", F.pmod(F.xxhash64("g", F.lit(i)), F.lit(m_bits)))
        b = bloom.select(
            F.col("word_idx").alias(f"__wi{i}"), F.col("word").alias(f"__w{i}")
        )
        cur = cur.join(
            F.broadcast(b),
            (F.col(f"__p{i}") / 64).cast("int") == F.col(f"__wi{i}"),
            "left",
        )
        # Absent word row (left-join null) = no bits set in that word.
        hit = hit & F.coalesce(
            F.expr(f"(__w{i} & shiftleft(1L, cast(__p{i} % 64 AS int))) != 0"),
            F.lit(False),
        )
    return cur.select(id_col, "g", hit.alias("__hit"))


def decontaminate_bloom_exact(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Two-stage benchmark decontamination (r10 verdict item 3): Bloom
    pre-filter → exact gram verification on the flagged sliver only.
    Output is IDENTICAL to :func:`decontaminate_ngram` — zero false
    positives, zero false negatives — at Bloom-scale memory cost.

    Why the composition wins at 100 TB with a GB-scale eval battery:
    - :func:`decontaminate_ngram` must BROADCAST every distinct eval gram
      string — GBs for a modern multi-benchmark suite; dead on arrival.
    - :func:`decontaminate_bloom` broadcasts only the 128 KiB bitset but
      over-drops at the FP rate.
    - Here stage 1 probes the constant bitset (JVM codegen, no corpus
      shuffle), and stage 2 exact-joins ONLY the Bloom-flagged grams —
      truly-shared grams plus the bounded-FP sliver, ≪ corpus-sized —
      against the eval gram set. That join is a plain shuffle join whose
      train side is the sliver, so neither a GB broadcast nor a
      corpus-sized shuffle exists anywhere in the plan. Bloom's
      no-false-negative guarantee (same hash family both sides) means
      every truly-shared gram reaches stage 2, so correctness is exact.

    Per-doc rows match decontaminate_ngram exactly: every doc with ≥ n
    tokens appears, with the count of its distinct grams shared with the
    eval set (flagged-but-unverified grams contribute 0)."""
    probed = _bloom_probe_grams(
        train_docs, eval_docs, id_col, text_col, n, m_bits, k
    )
    eval_g = (
        _eval_grams(eval_docs, text_col, n)
        .withColumn("__shared", F.lit(1))
    )
    # Stage 2: the flagged sliver re-checks exactly; unflagged grams are
    # guaranteed non-shared (no false negatives) and contribute 0 via the
    # left join's null. The join is NOT broadcast-hinted — at production
    # eval-battery size the optimizer picks a shuffle join keyed on the
    # sliver, which is the point.
    verified = probed.filter(F.col("__hit")).join(eval_g, "g", "left")
    counts = verified.groupBy(id_col).agg(
        F.sum(F.coalesce(F.col("__shared"), F.lit(0))).cast("int").alias("__n")
    )
    universe = probed.select(id_col).distinct()
    return universe.join(counts, id_col, "left").select(
        id_col,
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_shared_grams"),
        (F.coalesce(F.col("__n"), F.lit(0)) > 0).cast("int").alias("contaminated"),
    )


def _eval_grams(eval_docs: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct word n-grams of the eval corpus, one column ``g``."""
    from n2kupdate_spark.operators.dedup import word_shingles

    return (
        word_shingles(eval_docs.select(text_col), text_col, n=n)
        .select(F.explode("shingles").alias("g"))
        .distinct()
    )


def fit_quality_classifier(
    X: "np.ndarray",
    y: "np.ndarray",
    iters: int = 300,
    lr: float = 0.3,
    l2: float = 1e-2,
) -> tuple["np.ndarray", float]:
    """Deterministic driver-side logistic regression (full-batch gradient
    descent, zero init, fixed iteration count, L2 on weights only) —
    the published web-corpus quality classifier is exactly this shape: a
    linear model over hashed bag-of-words features, fit on a curated
    positive set vs a crawl negative sample, then applied to every
    document. Exposed separately from the distributed pipeline so the
    pytest pin can recompute scores from raw text through the same fit.
    Returns (w[n_features], bias).

    STABILITY CONTRACT: lr must keep the iteration contractive — at
    lr=1.0 on hashed-tf features the map is chaotic and amplifies
    float-reduction-order noise (row permutations of X produced scores
    differing by 0.47 after 200 iters; measured on the sf0.1 fixture),
    while lr<=0.5 reproduces to 5e-15 across row orders. The default
    (300, 0.3) sits well inside the stable region; anyone retuning lr
    upward must re-run the cross-order check in the pin test.

    The L2 term has its own hard stability bound: the weight-decay
    factor per step is (1 − lr·l2), so lr·l2 ≥ 2 makes the iteration
    expansive — weights oscillate to overflow and every score is NaN
    (observed at lr=0.3, l2=10 while tuning langid_hashgram_scores).
    Guarded explicitly because the failure is silent otherwise: NaN
    scores argmax to NULL predictions downstream, not to an error."""
    if lr * l2 >= 2.0:
        raise ValueError(
            f"fit_quality_classifier: lr*l2 = {lr * l2:g} >= 2 makes "
            "gradient descent expansive (weights diverge to NaN) — "
            "lower lr or l2"
        )
    n, d = X.shape
    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * ((X.T @ g) / n + l2 * w)
        b -= lr * float(g.mean())
    return w, b


def _sparse_fit_matrix(
    joined: DataFrame, id_col: str, n_buckets: int, label_col: str
):
    """Arrow-collect a (id, bucket, c, label) sparse fit table and build
    the dense sublinear-tf matrix with vectorized numpy. Replaces a
    per-Row python loop (130k+ Row conversions cost ~2 s at sf0.1 —
    r16, guide §4.2's "hand whole batches to numpy" applied to the
    DRIVER side of the boundary). Bit-identical: np.unique sorts
    exactly like sorted() on homogeneous ids, cells are the same
    1 + ln(c). Returns (ids, pos, X, labels) where pos/labels align
    with the collected rows (ids[pos[k]] is row k's id)."""
    tbl = joined.toArrow()
    id_np = tbl[id_col].to_numpy(zero_copy_only=False)
    uniq, pos = np.unique(id_np, return_inverse=True)
    X = np.zeros((len(uniq), n_buckets), dtype=np.float64)
    if len(uniq):
        X[pos, tbl["bucket"].to_numpy(zero_copy_only=False)] = 1.0 + np.log(
            tbl["c"].to_numpy(zero_copy_only=False)
        )
    return uniq.tolist(), pos, X, tbl[label_col].to_pylist()



def quality_classifier_scores(
    docs: DataFrame,
    positive_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    sample_per_class: int = 2048,
    iters: int = 300,
    lr: float = 0.3,
    l2: float = 1e-2,
) -> DataFrame:
    """Quality-classifier corpus filter: fit a logistic regression on
    hashed bag-of-words features — positives from the caller-marked
    curated seed (``positive_col`` boolean; in production a curated
    corpus, here any deterministic slice), negatives sampled from the
    rest — then score EVERY document and emit
    ``(id, quality_score, keep)`` with ``keep = score >= 0.5``. This is
    the published pipeline shape for model-based quality filtering of
    web corpora (linear classifier over hashed n-gram features, curated
    positives vs crawl negatives).

    Determinism: the fit sample is the first ``sample_per_class`` ids per
    class in id order; the fit is seeded-free full-batch GD with fixed
    iterations (numpy float64). Features are sublinear tf (1 + ln c) over
    md5-derived token buckets — the same engine-portable bucket function
    as text_feature_hashing, recomputable in plain python for the pin.

    Scale shape: featurization is explode + one (id, bucket)-keyed
    partial-agged shuffle (≤ n_buckets rows per doc); the fit collects
    ONLY the 2·sample_per_class sampled docs' sparse vectors (driver
    traffic bounded regardless of corpus size — the bounded-fit pattern
    shared with fit_spherical_centroids); scoring is a per-row weight
    lookup against the broadcast 256-float literal plus one id-keyed sum
    — no joins, no second pass over text. Docs with zero non-empty
    tokens have no feature rows and are absent from the output."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 4), 16, 10).cast("long")
        % n_buckets
    )
    sparse = (
        docs.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .filter(F.col("term") != "")
        .select(id_col, bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Sample only docs that HAVE features (≥1 non-empty token): a
    # token-less doc would otherwise occupy a sample slot but contribute
    # no rows to the collected sparse matrix — silently shrinking the
    # training set and making the fit irreproducible from the op's
    # documented semantics (caught by the sf0.1 recompute pin, where
    # empty-token docs exist). Map-side predicate, no extra shuffle.
    labels = docs.filter(
        F.exists(F.split(F.col(text_col), " "), lambda t: t != "")
    ).select(id_col, F.col(positive_col).cast("int").alias("__y"))
    fit_ids = (
        labels.filter(F.col("__y") == 1).orderBy(id_col).limit(sample_per_class)
    ).unionByName(
        labels.filter(F.col("__y") == 0).orderBy(id_col).limit(sample_per_class)
    )
    ids, pos, X, ys = _sparse_fit_matrix(
        sparse.join(F.broadcast(fit_ids), id_col), id_col, n_buckets, "__y"
    )
    yv = np.zeros(len(ids), dtype=np.float64)
    yv[pos] = np.asarray(ys, dtype=np.float64)
    if len(ids) == 0 or yv.min() == yv.max():
        raise ValueError(
            "quality_classifier_scores: fit sample needs both classes — "
            "check the positive_col predicate against the corpus"
        )
    w, b = fit_quality_classifier(X, yv, iters=iters, lr=lr, l2=l2)

    w_lit = F.lit(w.tolist())  # one py4j call, bit-identical (r16)
    contrib = F.element_at(w_lit, (F.col("bucket") + 1).cast("int")) * (
        F.lit(1.0) + F.log(F.col("c").cast("double"))
    )
    return (
        sparse.withColumn("__contrib", contrib)
        .groupBy(id_col)
        .agg(
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.sum("__contrib") + F.lit(float(b))))), 4
            ).alias("quality_score")
        )
        .withColumn("keep", (F.col("quality_score") >= 0.5).cast("int"))
    )


def langid_hashgram_scores(
    docs: DataFrame,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    n_buckets: int = 256,
    sample_per_class: int = 2048,
    train_col: str | None = None,
    iters: int = 300,
    lr: float = 0.3,
    l2: float = 1e-2,
) -> DataFrame:
    """Trained language ID over hashed character n-grams — the published
    fastText-style recipe (linear classifier, word-internal char n-gram
    features, hashing trick) in place of the fixed marker-stopword
    heuristic (queries/text.py::text_langid_ngram): one-vs-rest logistic
    regressions (the bounded-fit machinery of
    :func:`fit_quality_classifier`, one y per language over ONE shared
    feature matrix) fit on rows where ``train_col`` is true (default:
    all rows), then EVERY doc scored map-only. Emits
    (``id_col``, ``pred_lang``, ``conf``) — argmax language with
    alphabetical tiebreak, conf = round(sigmoid(z_best), 4).

    Determinism: the fit sample is the first ``sample_per_class`` ids
    per language in id order; languages sort alphabetically; the GD is
    the stability-contracted fixed-iteration fit. Features are sublinear
    tf (1 + ln c) over md5-derived buckets of within-word character
    ``ngram``-grams (words shorter than ``ngram`` contribute nothing;
    docs with NO features are absent from the output, same contract as
    quality_classifier_scores).

    Prior correction: the per-class cap deliberately BALANCES the fit
    sample (collecting a proportional sample of a skewed 100 TB corpus
    would drown the driver in the majority language), which silently
    erases the class priors a language-ID argmax needs when the n-gram
    evidence is weak. Each one-vs-rest intercept is therefore shifted by
    the log sampling-odds ratio ln(π/(1−π)) − ln(s/(1−s)) (the published
    case-control correction — King & Zeng 2001), where π is the
    language's share of the TRAIN slice and s its share of the fit
    sample — so under heavy regularization the argmax degrades to the
    true prior ranking, not to sampling noise.

    Scale shape: gram explode + ONE (id, bucket)-keyed partial-agged
    shuffle, materialized once via eager localCheckpoint because both
    the fit collect and the scoring pass consume it (≤ n_buckets rows
    per doc); the fit collects only the sampled docs' sparse vectors
    (driver traffic ≤ langs · sample_per_class · n_buckets regardless
    of corpus size); scoring is a broadcast-literal weight lookup per
    (id, bucket) row + one id-keyed sum — per-language columns in one
    agg, no joins, no second gram pass, no Python UDF anywhere. The
    label side costs one more scan (no explode) feeding a single
    #langs-row aggregate that serves both the language list and the
    prior correction."""
    guard = (
        f"CASE WHEN length(w) >= {ngram} "
        f"THEN transform(sequence(1, length(w) - {ngram - 1}), "
        f"i -> substring(w, i, {ngram})) "
        f"ELSE CAST(array() AS array<string>) END"
    )
    grams = F.explode(
        F.expr(
            f"flatten(transform(split({text_col}, ' '), w -> {guard}))"
        )
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 4), 16, 10).cast("long")
        % n_buckets
    )
    # The (id, bucket) tf table is consumed TWICE — the bounded fit
    # collect and the full scoring pass — so materialize it once
    # (eager localCheckpoint): without this the gram explode + shuffle,
    # the dominant corpus-scale cost, would run twice (r12 review).
    # fan_out: the gram explode is the heavy map — without it a
    # single-file scan runs it on one core (r16, guide §2.6).
    sparse = (
        # keyless round-robin measured STABLE here (3.3s median converged);
        # keying this exchange on the id made rep walls swing 10-21s (r16
        # 10-rep probe — plausibly the doc_id-clustered gram aggregate's
        # bigger per-task hash maps); the 2-column rows keep the
        # round-robin pre-sort cheap, so keyless wins at this site
        fan_out(docs.select(id_col, text_col))
        .select(id_col, grams.alias("gram"))
        .select(id_col, bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )

    featured = docs.filter(
        F.exists(
            F.split(F.col(text_col), " "), lambda w: F.length(w) >= ngram
        )
    )
    if train_col is not None:
        featured = featured.filter(F.col(train_col))
    labels = featured.select(id_col, F.col(lang_col).alias("__lang"))
    # one labels aggregate serves both the language list and the prior
    # correction below (was two separate scans — r12 review)
    train_counts = {
        r["__lang"]: r["n"]
        for r in labels.groupBy("__lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    langs = sorted(train_counts)
    if len(langs) < 2:
        raise ValueError(
            "langid_hashgram_scores: need >= 2 languages in the training "
            "slice"
        )
    per_lang = [
        labels.filter(F.col("__lang") == l)
        .orderBy(id_col)
        .limit(sample_per_class)
        for l in langs
    ]
    fit_ids = per_lang[0]
    for d in per_lang[1:]:
        fit_ids = fit_ids.unionByName(d)
    ids, pos, X, langs_rows = _sparse_fit_matrix(
        sparse.join(F.broadcast(fit_ids), id_col), id_col, n_buckets, "__lang"
    )
    doc_lang: dict = {ids[p]: l for p, l in zip(pos, langs_rows)}
    n_train = sum(train_counts.values())
    sample_counts = {l: 0 for l in langs}
    for i in ids:
        sample_counts[doc_lang[i]] += 1
    W = np.zeros((len(langs), n_buckets), dtype=np.float64)
    B = np.zeros(len(langs), dtype=np.float64)
    for li, l in enumerate(langs):
        y = np.array([1.0 if doc_lang[i] == l else 0.0 for i in ids])
        if y.min() == y.max():
            raise ValueError(
                f"langid_hashgram_scores: language {l!r} has no "
                "counter-examples in the fit sample"
            )
        W[li], B[li] = fit_quality_classifier(X, y, iters=iters, lr=lr, l2=l2)
        pi = train_counts[l] / n_train
        s = sample_counts[l] / len(ids)
        B[li] += float(
            np.log(pi / (1.0 - pi)) - np.log(s / (1.0 - s))
        )

    tf = F.lit(1.0) + F.log(F.col("c").cast("double"))
    aggs = []
    for li, l in enumerate(langs):
        w_lit = F.lit(W[li].tolist())  # one py4j call, bit-identical (r16)
        aggs.append(
            F.sum(
                F.element_at(w_lit, (F.col("bucket") + 1).cast("int")) * tf
            ).alias(f"__z_{li}")
        )
    scored = sparse.groupBy(id_col).agg(*aggs)
    zs = [
        (F.col(f"__z_{li}") + F.lit(float(B[li]))) for li in range(len(langs))
    ]
    best = F.greatest(*zs) if len(zs) > 1 else zs[0]
    pred = F.lit(None).cast("string")
    # alphabetical tiebreak: first lang attaining the max wins
    for li in range(len(langs) - 1, -1, -1):
        pred = F.when(zs[li] == best, F.lit(langs[li])).otherwise(pred)
    conf = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-best)), 4)
    return scored.select(
        id_col, pred.alias("pred_lang"), conf.alias("conf")
    )


def importance_weights(
    docs: DataFrame,
    target_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """Hashed-n-gram importance weights for data selection (the published
    importance-resampling method: estimate a target distribution from a
    small curated set and a raw distribution from the corpus, both over
    hashed n-gram buckets, then weight every document by its
    log-likelihood ratio — documents that look like the target get high
    weight and are preferentially sampled into the training mix).

    ``target_col`` marks the curated target slice (in production a
    separate curated table unioned in). Emits per doc: ``n_tokens``,
    ``log_weight`` = Σ_tokens ln(p_target(bucket)/p_raw(bucket)), and
    ``avg_log_ratio`` = log_weight / n_tokens (the length-normalized form
    to rank on when doc lengths vary wildly — raw log_weight scales with
    doc length). Both distributions are add-1 smoothed over the bucket
    vocabulary so no ratio is 0 or ∞. Docs with zero non-empty tokens are
    absent. A caller then ranks/samples on the weight (deterministic
    top-fraction, or Gumbel-noise resampling as published — left to the
    caller because the noise policy is a training-recipe choice, not an
    engine semantic).

    Scale shape: BOTH distribution estimates are n_buckets-row aggregates
    (map-side partial, collected as 2·n_buckets floats — driver traffic
    fixed at any corpus size); the scoring pass reuses the classifier's
    shape — one (doc, bucket) partial-agged shuffle, a broadcast-literal
    log-ratio lookup, one per-doc sum. Unigram buckets here; hashing
    (uni+bi)-grams into the same bucket space is a one-line change to the
    token stream and changes nothing downstream."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 4), 16, 10).cast("long")
        % n_buckets
    )
    toks = docs.select(
        id_col,
        F.col(target_col).cast("int").alias("__t"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    bucketed = toks.select(id_col, "__t", bucket.alias("bucket"))
    dist = (
        bucketed.groupBy("bucket")
        .agg(
            F.sum("__t").alias("t_c"),
            F.count(F.lit(1)).alias("r_c"),
        )
        .collect()
    )
    t = np.ones(n_buckets, dtype=np.float64)  # add-1 smoothing
    r = np.ones(n_buckets, dtype=np.float64)
    for row in dist:
        t[row["bucket"]] += row["t_c"]
        r[row["bucket"]] += row["r_c"]
    log_ratio = np.log(t / t.sum()) - np.log(r / r.sum())

    lr_lit = F.lit(log_ratio.tolist())  # one py4j call, bit-identical (r16)
    per_doc = (
        bucketed.groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "__w",
            F.element_at(lr_lit, (F.col("bucket") + 1).cast("int"))
            * F.col("c").cast("double"),
        )
    )
    return per_doc.groupBy(id_col).agg(
        F.sum("c").cast("int").alias("n_tokens"),
        F.round(F.sum("__w"), 4).alias("log_weight"),
        (F.round(F.sum("__w") / F.sum("c") * 10000, 0) / 10000).alias("avg_log_ratio"),
    )


def mixture_copy_counts(
    weights: dict[str, float],
    default_weight: float,
    id_col: str = "doc_id",
    source_col: str = "source",
):
    """Column expression: deterministic per-row copy count realizing
    per-source mixture weights — floor(weight) copies plus one more iff
    the row's md5 bucket falls under the fractional part. Content-
    addressed (same md5-bucket contract as the hash splits), so every
    engine/run/cluster size agrees on which docs repeat. The bucket uses
    8 md5 hex chars (32 bits): a 16-bit bucket mod 10000 is biased by
    2^16 % 10000 = 5536 (weight 0.5 realized 53.8%); at 32 bits the bias
    is ~1e-6. Weights are fixed-point ×10000, so comparisons are exact
    integer arithmetic."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % 10000
    )
    w4 = F.lit(int(round(default_weight * 10000)))
    for s, w in reversed(list(weights.items())):
        w4 = F.when(F.col(source_col) == s, F.lit(int(round(w * 10000)))).otherwise(w4)
    return F.floor(w4 / 10000).cast("int") + F.when(bucket < w4 % 10000, 1).otherwise(0)


def apply_mixture(
    docs: DataFrame,
    weights: dict[str, float],
    default_weight: float,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Realize mixture weights as rows: each doc appears ``n_copies``
    times with a 1-based ``copy_n``. Pure map + explode — no shuffle, no
    state; the mixture of a 100 TB corpus is decided row-locally."""
    n_copies = mixture_copy_counts(weights, default_weight, id_col, source_col)
    return (
        docs.withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") > 0)
        .withColumn("copy_n", F.explode(F.sequence(F.lit(1), F.col("n_copies"))))
        .withColumn("copy_n", F.col("copy_n").cast("int"))
        .drop("n_copies")
    )


def reservoir_per_key(
    rows: DataFrame,
    key_col: str = "source",
    id_col: str = "doc_id",
    k: int = 20,
    prefilter_factor: float | None = 8.0,
) -> DataFrame:
    """Deterministic per-key reservoir: the ``k`` rows per key whose
    md5(id) sorts lowest (content-addressed — identical across engines,
    runs, and cluster sizes, and growth-stable: a row only leaves the
    sample when a lower-hash row arrives). Emits (id, key, rk).

    ``prefilter_factor`` is the 100 TB path: instead of window-sorting
    EVERY key's full row set, one #keys-sized count aggregate sets a
    per-key hash-prefix bound B with E[survivors] = factor·k, the scan
    keeps only rows whose 32-bit md5 prefix falls below B, and the top-k
    window runs over those slivers. EXACT by construction, not
    approximate: md5 is compared prefix-first, so whenever ≥ k rows of a
    key pass the prefix bound, the k lowest full hashes are all among
    them (a row failing the bound is lexicographically above every row
    passing it); keys where the filter underfills (< k survivors — a
    tail-probability event at factor 8, plus any key with ≤ factor·k
    rows, where the filter buys nothing) fall back to their full row
    set. Equality with the plain window is property-tested even at an
    adversarial factor 0.5 that forces mass fallback
    (tests/test_mlprep_props.py), and the registered
    ``sample_reservoir_per_key`` query runs THIS path against a
    plain-window SQL oracle, so the exactness claim is re-proven by the
    hash-match gate every round. ``None`` disables (plain window)."""
    hsh = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(key_col).orderBy(hsh.asc(), F.col(id_col).asc())
    base = rows.select(id_col, key_col)
    if prefilter_factor is None:
        return base.select(
            id_col, key_col, F.row_number().over(w).alias("rk")
        ).filter(F.col("rk") <= k)

    prefix = F.conv(F.substring(hsh, 1, 8), 16, 10).cast("long")
    counts = base.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
    # bound on the 32-bit prefix: ceil keeps E[survivors] ≥ factor·k even
    # for tiny n; bound ≥ 2^32 means "keep everything" (small keys)
    bound = F.least(
        F.lit(float(2**32)),
        F.ceil(F.lit(float(prefilter_factor) * k) / F.col("__n") * (2**32)),
    ).cast("long")
    bounds = F.broadcast(counts.select(key_col, bound.alias("__b")))
    # materialize the survivor SLIVER once (E[rows] = keys × factor·k):
    # everything after — the underfill check and the top-k window — runs
    # on this checkpointed frame, so the corpus is scanned exactly twice
    # (counts, filter) instead of once per downstream consumer
    survivors = (
        base.join(bounds, key_col)
        .filter(prefix < F.col("__b"))
        .select(id_col, key_col)
        .localCheckpoint(eager=True)
    )
    got = survivors.groupBy(key_col).agg(F.count(F.lit(1)).alias("__g"))
    # underfilled keys (survivors < k) and zero-survivor keys: a
    # tail-probability event at factor 8 — the driver collects the
    # (expected-empty, #keys-bounded) list and, in the common case,
    # skips the fallback scan ENTIRELY
    under = [
        r[0]
        for r in got.filter(F.col("__g") < k).select(key_col).collect()
    ] + [
        r[0]
        for r in counts.join(got, key_col, "left_anti").select(key_col).collect()
    ]
    pool = survivors
    if under:
        pool = survivors.filter(~F.col(key_col).isin(under)).unionByName(
            base.filter(F.col(key_col).isin(under))
        )
    return (
        pool.select(id_col, key_col, F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= k)
    )


def pack_sequences(
    rows: DataFrame,
    budget: int = 512,
    group_col: str = "source",
    order_cols: tuple[str, ...] = ("doc_id",),
    token_col: str = "n_tokens",
    shards: int = 1,
) -> DataFrame:
    """Concat-then-chunk sequence packing: lay each group's rows end to
    end in ``order_cols`` order and cut ``budget``-token sequences from
    the running total, appending (seq_id, seq_offset) — the placement map
    a packing writer needs to emit fixed-context training rows (rows
    straddling a boundary split at seq_offset downstream; no padding
    waste by construction). The cumulative-sum window partitions per
    GROUP (training pipelines pack within shards/domains anyway), so the
    sort parallelizes across groups instead of funneling the corpus
    through one global-order window. Integer division is explicit
    floor-div for cross-engine parity.

    ``shards`` > 1 removes the remaining funnel — a single DOMINANT
    group (one source that is 40% of a 100 TB corpus) otherwise sorts
    through one task. Each group is range-split on the FIRST order
    column into up to ``shards`` contiguous sub-shards at
    ``percentile_approx`` cut points; the cumsum windows per
    (group, shard) — parallel — and exact per-shard base offsets come
    from a tiny groups×shards totals frame, prefix-summed and broadcast
    back. The output is IDENTICAL to the single-window form for every
    cut placement (the prefix sum is reconstructed exactly, so the
    approximate quantiles only affect load balance, never values —
    property-tested in tests/test_mlprep_props.py). Rows sharing the
    first order column always land in one shard (cuts compare strictly),
    so later order columns still sub-order within a shard. Requires a
    numeric first order column when shards > 1; costs one extra
    aggregate job + one broadcast join."""
    if shards <= 1:
        w = (
            Window.partitionBy(group_col)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        start = F.sum(token_col).over(w).cast("long") - F.col(token_col)
        return rows.select(
            "*",
            F.floor(start / budget).cast("int").alias("seq_id"),
            (start % budget).cast("int").alias("seq_offset"),
        )

    key = F.col(order_cols[0]).cast("double")
    cuts = rows.groupBy(group_col).agg(
        F.percentile_approx(
            key, [i / shards for i in range(1, shards)], 1000
        ).alias("__cuts")
    )
    # shard id = number of cut points strictly below the key: contiguous
    # in the group order, equal keys colocated, ≤ `shards` shards.
    sharded = rows.join(F.broadcast(cuts), group_col).withColumn(
        "__shard", F.size(F.filter("__cuts", lambda c: c < key))
    )
    w_shard = (
        Window.partitionBy(group_col, "__shard")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_in_shard = F.sum(token_col).over(w_shard).cast("long")
    # exact base offset per shard: totals of all PRECEDING shards in the
    # same group — a groups×shards frame, window-summed on the driver
    # scale and broadcast back
    totals = sharded.groupBy(group_col, "__shard").agg(
        F.sum(token_col).cast("long").alias("__tot")
    )
    w_pref = (
        Window.partitionBy(group_col)
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = totals.select(
        group_col,
        "__shard",
        F.coalesce(F.sum("__tot").over(w_pref), F.lit(0)).alias("__base"),
    )
    start = F.col("__base") + F.col("__cum") - F.col(token_col)
    return (
        sharded.withColumn("__cum", cum_in_shard)
        .join(F.broadcast(bases), [group_col, "__shard"])
        .select(
            *rows.columns,
            F.floor(start / budget).cast("int").alias("seq_id"),
            (start % budget).cast("int").alias("seq_offset"),
        )
    )


def pack_sequences_bestfit(
    rows: DataFrame,
    budget: int = 512,
    group_col: str = "source",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    chunk_docs: int = 4096,
) -> DataFrame:
    """NO-SPLIT sequence packing by best-fit-decreasing: every doc lands
    whole in exactly one ``budget``-token bin (the published alternative
    to concat-then-chunk — packing without splitting removes the
    cross-document attention contamination and truncation loss that
    boundary splits cause; see the best-fit packing line of work,
    e.g. arXiv:2404.10830). Docs are ordered LONGEST-FIRST (the
    "decreasing" that gives BFD its near-optimal fill) and each is
    placed in the open bin with the SMALLEST remaining capacity that
    still fits (ties: lowest bin id), else opens a new bin. Docs with
    ``n_tokens > budget`` can't fit whole under no-split
    rules: each becomes its own bin with ``overflow = true`` (callers
    truncate or reroute those downstream).

    Scale design — BFD is a sequential heuristic, so the distributed
    form bounds the sequential unit instead of pretending it
    parallelizes: within each group the descending order is cut into
    ``chunk_docs``-sized chunks (one row_number window per group — the
    same per-group window shape as :func:`pack_sequences`) and each
    (group, chunk) packs independently inside one ``applyInPandas``
    task — O(chunk_docs · log bins) python per task, Arrow-batched,
    parallel across groups × chunks. Chunking costs at most one
    underfilled bin tail per chunk (the only bins a cross-chunk BFD
    could have merged), a waste bounded by chunks/bins — negligible at
    chunk_docs=4096 — and keeps every task's memory flat no matter how
    large the group. Deterministic everywhere: descending-tokens order
    tie-broken by id, best-fit ties by bin id, so the placement map is
    reproducible across runs and cluster sizes (property-pinned against
    an independent python BFD in tests/test_mlprep_props.py).

    Emits the input columns + ``seq_id`` (unique within group:
    chunk·chunk_docs + local bin — local bins ≤ docs per chunk, so no
    collision) and ``overflow``.
    """
    import bisect

    import pandas as pd

    w = Window.partitionBy(group_col).orderBy(
        F.col(token_col).desc(), F.col(id_col).asc()
    )
    chunked = rows.withColumn(
        "__chunk",
        ((F.row_number().over(w) - 1) / chunk_docs).cast("int"),
    )
    out_fields = chunked.schema.fields
    schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
        + ", seq_id bigint, overflow boolean"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [token_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        chunk = int(pdf["__chunk"].iloc[0])
        base = chunk * chunk_docs
        open_bins: list[tuple[int, int]] = []  # sorted (remaining, bin_id)
        n_bins = 0
        seq_ids, overflows = [], []
        for toks in pdf[token_col].astype("int64"):
            toks = int(toks)
            if toks > budget:
                seq_ids.append(base + n_bins)
                overflows.append(True)
                n_bins += 1
                continue
            # best fit: smallest remaining >= toks; ties lowest bin id
            i = bisect.bisect_left(open_bins, (toks, -1))
            if i < len(open_bins):
                rem, b = open_bins.pop(i)
                rem -= toks
            else:
                rem, b = budget - toks, n_bins
                n_bins += 1
            if rem > 0:
                bisect.insort(open_bins, (rem, b))
            seq_ids.append(base + b)
            overflows.append(False)
        pdf = pdf.copy()
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["overflow"] = overflows
        return pdf

    return (
        chunked.groupBy(group_col, "__chunk")
        .applyInPandas(_pack, schema)
        .drop("__chunk")
    )


def pack_sequences_bpe(
    docs: DataFrame,
    budget: int = 512,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_docs: int = 4096,
    merges: list[tuple[str, str]] | None = None,
    num_merges: int = 200,
    max_word_types: int = 50_000,
) -> DataFrame:
    """Tokenizer-aware no-split packing: budget bins in LEARNED BPE
    tokens, not whitespace tokens. :func:`pack_sequences_bestfit` packs
    whatever count column it is handed; handing it the whitespace proxy
    systematically under-budgets rare-word-heavy docs (subword fertility
    >1 exactly where whitespace counting is blindest), so a 512-"token"
    bin can overflow the real model context. This composition closes the
    loop: learn merges (or take a caller-supplied list — production
    reuses the frozen tokenizer, so packing N corpora costs ONE learn),
    encode every doc map-only with broadcast ranks
    (:func:`~n2kupdate_spark.operators.tokenizer.bpe_encode`, the group
    column riding through ``carry_cols`` so no post-encode join), and
    best-fit-decreasing pack on ``n_bpe_tokens``.

    Scale shape is the sum of its audited parts: one bounded word-type
    shuffle for the learn (skipped when ``merges`` is given), a
    shuffle-free Arrow encode whose cost follows distinct words per
    batch, and the per-(group, chunk) BFD window — nothing new is added
    by the composition. Emits (``id_col``, ``group_col``,
    ``n_bpe_tokens``, ``seq_id``, ``overflow``); pinned against the
    independent python learn→encode→BFD chain in
    tests/test_tokenizer.py::test_pack_sequences_bpe_pinned."""
    from n2kupdate_spark.operators.tokenizer import bpe_encode, learn_bpe_merges

    if merges is None:
        merges = learn_bpe_merges(
            docs, num_merges, text_col=text_col, max_word_types=max_word_types
        )
    enc = bpe_encode(
        docs.select(id_col, group_col, text_col),
        merges,
        id_col=id_col,
        text_col=text_col,
        carry_cols=(group_col,),
    ).select(id_col, group_col, "n_bpe_tokens")
    return pack_sequences_bestfit(
        enc,
        budget=budget,
        group_col=group_col,
        id_col=id_col,
        token_col="n_bpe_tokens",
        chunk_docs=chunk_docs,
    )


def gate_documents(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    decontam_n: int = 3,
    decontam_budget: int = 5,
    gopher_kwargs: dict | None = None,
    exclude_eval_ids: bool = True,
    decontam_method: str = "exact",
    kn_ppl_max: float | None = None,
    blocklist_terms: tuple[str, ...] | None = None,
) -> DataFrame:
    """The filtering front half of :func:`prepare_corpus` — Gopher gate →
    optional C4 blocklist gate → optional Kneser–Ney perplexity gate →
    n-gram decontamination (overlap budget) → optional eval-id
    exclusion → exact dedup (md5, keep lowest id) — returning the
    SURVIVING docs with their original columns. ``blocklist_terms``
    (r13), when set, drops every doc containing ANY blocklisted word
    (whole-token, case-insensitive — :func:`blocklist_filter`, the C4
    §2.2 rule). ``kn_ppl_max`` (r13, judge item 2), when set, fits
    :func:`kn_perplexity` on the INPUT corpus and drops docs whose
    bigram-KN perplexity exceeds it — the CCNet-style fluency gate
    (CCNet gates on LM perplexity buckets; here the LM is fit on the
    corpus itself rather than an external reference, so the gate drops
    the corpus's own least-fluent tail). Factored out so the streaming ingest
    (streaming/jobs.py::stream_corpus_publish) applies the identical
    gates per micro-batch that the batch pipeline applies per corpus; the
    registered `corpus_prepare_pipeline` oracle keeps verifying this code
    through prepare_corpus.

    ``decontam_method`` picks the overlap gate: ``"exact"`` (default,
    broadcast eval gram strings — the oracle-verified path), ``"bloom"``
    (:func:`decontaminate_bloom`, fixed 128 KiB bitset probes — the path
    for eval suites too large to broadcast as strings; its flagged-gram
    count is a superset of exact's, so the same budget drops at least
    the same docs, plus bounded-FP extras), or ``"bloom_exact"``
    (:func:`decontaminate_bloom_exact`, the r11 two-stage composition:
    Bloom pre-filter then exact verification of the flagged sliver —
    EQUALS the exact gate's output at Bloom-scale broadcast cost)."""
    passing = (
        gopher_metrics(docs, id_col, text_col, **{"widen": False, **(gopher_kwargs or {})})
        .filter(F.col("gopher_pass") == 1)
        .select(id_col)
    )
    if blocklist_terms:
        unblocked = (
            blocklist_filter(docs, blocklist_terms, id_col, text_col)
            .filter(~F.col("blocked"))
            .select(id_col)
        )
        passing = passing.join(unblocked, id_col)
    if kn_ppl_max is not None:
        fluent = (
            kn_perplexity(docs, id_col, text_col, widen=False)
            .filter(F.col("ppl") <= float(kn_ppl_max))
            .select(id_col)
        )
        passing = passing.join(fluent, id_col)
    if decontam_method == "bloom":
        overlap = decontaminate_bloom(docs, eval_docs, id_col, text_col, n=decontam_n)
        overlap_col = "n_flagged_grams"
    elif decontam_method == "bloom_exact":
        overlap = decontaminate_bloom_exact(
            docs, eval_docs, id_col, text_col, n=decontam_n
        )
        overlap_col = "n_shared_grams"
    elif decontam_method == "exact":
        overlap = decontaminate_ngram(docs, eval_docs, id_col, text_col, n=decontam_n)
        overlap_col = "n_shared_grams"
    else:
        raise ValueError(f"unknown decontam_method {decontam_method!r}")
    contaminated = (
        overlap.filter(F.col(overlap_col) >= decontam_budget).select(id_col)
    )
    clean = docs.join(passing, id_col).join(contaminated, id_col, "left_anti")
    if exclude_eval_ids:
        clean = clean.join(eval_docs.select(id_col).distinct(), id_col, "left_anti")
    w_fp = Window.partitionBy(F.md5(text_col)).orderBy(id_col)
    return (
        clean.withColumn("rn", F.row_number().over(w_fp))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def gate_semantic(
    docs: DataFrame,
    vectors: DataFrame,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "v",
    n_cells: int = 16,
    tau: float = 0.95,
    block_rows: int = 4096,
) -> DataFrame:
    """Semantic-dedup gate for the corpus pipeline (SemDeDup composed —
    judge r8 growth edge): restrict ``vectors`` to docs still alive in
    ``docs`` (left-semi on id), run :func:`~n2kupdate_spark.operators.
    similarity.semantic_dedup` on that slice, and anti-join the drop set
    away. Docs WITHOUT a vector pass untouched — at real scale only a
    fraction of a crawl carries embeddings, and a missing vector is no
    evidence of duplication.

    Run this AFTER the cheap text gates (Gopher/decontamination/exact
    dedup): clustering then fits the shrunk corpus, and the expensive
    within-cluster pair scan sees only survivors — the same
    stage-ordering rule the rest of the pipeline follows."""
    from n2kupdate_spark.operators.similarity import semantic_dedup

    alive = vectors.join(
        docs.select(F.col(id_col).alias(vec_id_col)), vec_id_col, "left_semi"
    )
    drops = semantic_dedup(
        alive, vec_id_col, vec_col, n_cells=n_cells, tau=tau, block_rows=block_rows
    ).select(F.col("drop_id").alias(id_col))
    return docs.join(drops, id_col, "left_anti")


def prepare_corpus(
    docs: DataFrame,
    eval_docs: DataFrame,
    weights: dict[str, float],
    default_weight: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    decontam_n: int = 3,
    decontam_budget: int = 5,
    seq_budget: int = 512,
    gopher_kwargs: dict | None = None,
    exclude_eval_ids: bool = True,
    pack_shards: int = 1,
    trim_substring_k: int | None = None,
    fuzzy_decontam_threshold: float | None = None,
    quality_positive_col: str | None = None,
    decontam_method: str = "exact",
    zlib_ratio_bounds: tuple[float, float] | None = None,
    pack_method: str = "whitespace",
    bpe_merges: list[tuple[str, str]] | None = None,
    bpe_num_merges: int = 200,
) -> DataFrame:
    """End-to-end preparation: Gopher gate → decontamination (overlap
    budget) → exact dedup (md5, keep lowest id) → optional exact-
    substring trim → mixture weighting → sequence packing → per-source
    summary (surviving docs, mixture rows, total tokens, packed
    sequence count). Cheap filters run first so the dedup shuffle and
    packing window see the shrunk corpus.

    ``trim_substring_k`` switches on the suffix-array-style substring
    stage (duplicate_spans + remove_spans at that window width, corpus-
    wide ≥2 occurrences over the SURVIVORS): duplicated spans are cut
    from the surviving docs before mixture/packing, so token totals and
    sequence counts reflect the deduplicated text — completing the
    published dedup ladder (exact doc → near-dup → semantic → substring)
    inside one composition. Off by default; the registered
    corpus_prepare_pipeline oracle verifies the default path, the
    trimmed path is pinned against an independent composition in
    tests/test_dedup_spans.py.

    ``fuzzy_decontam_threshold`` switches on the MinHash near-duplicate
    decontamination stage (:func:`decontaminate_fuzzy` at that Jaccard
    threshold): survivors of the exact gates that are NEAR-duplicates of
    any eval doc are dropped too — the paraphrased-leak gap the exact
    n-gram budget cannot close. The contaminated id set is
    collision-bounded, so its anti-join broadcasts.

    ``quality_positive_col`` switches on the model-based quality gate
    (:func:`quality_classifier_scores` with that boolean column of
    ``docs`` as the curated-positive seed): the classifier is fit on and
    scores the exact-gate SURVIVORS (the production fit set is curated +
    already-cleaned crawl — scoring pre-gate text would let boilerplate
    the other gates already reject shape the decision boundary), and docs
    with ``keep = 0`` are dropped before mixture/packing via one id-keyed
    semi-join. Both stages are off by default; the registered oracle
    verifies the default path and the opt-in paths are pinned against an
    independent stage-by-stage composition (tests/test_mlprep_props.py).

    ``decontam_method="bloom"`` swaps the exact n-gram overlap gate for
    the fixed-memory Bloom probe (:func:`decontaminate_bloom`) — same
    budget semantics over a flagged-gram count that is a SUPERSET of the
    exact gate's, for eval suites whose distinct-gram strings are too
    large to broadcast (pin: tests/test_mlprep_props.py — bloom survivors
    ⊆ exact survivors always, equal at the registered sizing on the
    fixture where the filter has no collisions).
    ``decontam_method="bloom_exact"`` (r11) composes both: Bloom
    pre-filter, exact gram join over the flagged sliver only — output
    EQUALS the exact gate's with neither a GB gram broadcast nor a
    corpus-sized exact shuffle (pin: tests/test_mlprep_props.py, whole
    pipeline equality vs decontam_method="exact" at two sfs).

    ``zlib_ratio_bounds=(lo, hi)`` switches on the compression-ratio
    gate: survivors whose :func:`information_signals` zlib ratio falls
    outside the bounds are dropped before mixture/packing — the
    published gibberish/boilerplate proxy, composed after the exact
    gates so the one Python pass sees the shrunk corpus (pin:
    tests/test_mlprep_props.py, independent composition).

    ``pack_method="bpe"`` (r11, mirroring the decontam_method plumbing)
    budgets mixture token totals and sequence packing in LEARNED BPE
    tokens instead of whitespace tokens: merges are learned on the
    SURVIVORS (or taken from ``bpe_merges`` — production reuses the
    frozen tokenizer, one learn for N corpora) and every surviving doc
    is encoded map-only with broadcast ranks, so ``total_tokens`` /
    ``n_sequences`` reflect what the model context actually sees —
    whitespace counting under-budgets rare-word-heavy docs exactly where
    subword fertility is highest. Composes with ``trim_substring_k``
    (the encode sees the TRIMMED text remove_spans rebuilds). Pin:
    composition ≡ independent stage-by-stage recompute at two sfs
    (tests/test_tokenizer.py).

    ``exclude_eval_ids`` governs id-space semantics: when the eval set is
    a SLICE of the training corpus (the demo fixture, or leakage-guarding
    an in-corpus holdout), its ids must also be dropped from the output —
    the default. When ``eval_docs`` is an EXTERNAL benchmark table, its
    ids live in an unrelated space and excluding matching training ids
    would silently drop innocent docs — pass ``False`` there; the n-gram
    overlap gate is id-agnostic either way."""
    exact = gate_documents(
        docs,
        eval_docs,
        id_col=id_col,
        text_col=text_col,
        decontam_n=decontam_n,
        decontam_budget=decontam_budget,
        gopher_kwargs=gopher_kwargs,
        exclude_eval_ids=exclude_eval_ids,
        decontam_method=decontam_method,
    )
    if fuzzy_decontam_threshold is not None:
        near = (
            decontaminate_fuzzy(
                exact.select(id_col, text_col),
                eval_docs,
                id_col=id_col,
                text_col=text_col,
                n=decontam_n,
                threshold=fuzzy_decontam_threshold,
            )
            .filter(F.col("contaminated") == 1)
            .select(id_col)
        )
        exact = exact.join(F.broadcast(near), id_col, "left_anti")
    if quality_positive_col is not None:
        # left_anti on keep==0, NOT left_semi on keep==1 (r9 advice,
        # low): quality_classifier_scores omits docs with zero non-empty
        # tokens from its output, so a semi-join against the kept set
        # would silently drop token-less docs the classifier never
        # scored — the gate must only remove docs it scored as bad.
        bad = (
            quality_classifier_scores(
                exact.select(id_col, text_col, quality_positive_col),
                quality_positive_col,
                id_col=id_col,
                text_col=text_col,
            )
            .filter(F.col("keep") == 0)
            .select(id_col)
        )
        exact = exact.join(bad, id_col, "left_anti")
    if zlib_ratio_bounds is not None:
        # compression-ratio gate (the CCNet/Dolma-style gibberish &
        # boilerplate proxy): hyper-compressible text is repetition,
        # near-incompressible is noise/binary junk. One Arrow map pass
        # over the SURVIVORS (information_signals: zero shuffle) + an
        # id-keyed anti-join; not broadcast-forced — adversarial bounds
        # can make the violator side corpus-sized.
        lo, hi = zlib_ratio_bounds
        noisy = (
            information_signals(exact.select(id_col, text_col), id_col, text_col)
            .filter(~F.col("zlib_ratio").between(lo, hi))
            .select(id_col)
        )
        exact = exact.join(noisy, id_col, "left_anti")
    if trim_substring_k:
        from n2kupdate_spark.operators.dedup import duplicate_spans, remove_spans

        spans = duplicate_spans(
            exact.select(id_col, text_col), k=trim_substring_k, min_count=2
        )
        # keep remove_spans' exact count: a fully-covered doc trims to
        # "" which would re-split to one phantom token
        exact = remove_spans(exact, spans, id_col=id_col, text_col=text_col)
        tokens = F.col("n_tokens_after")
    else:
        tokens = F.size(F.split(text_col, " "))
    if pack_method == "bpe":
        from n2kupdate_spark.operators.tokenizer import bpe_encode, learn_bpe_merges

        if bpe_merges is None:
            bpe_merges = learn_bpe_merges(
                exact, bpe_num_merges, text_col=text_col
            )
        # map-only encode of the (possibly trimmed) survivor text; the
        # source column rides through carry_cols so no post-encode join
        tok_docs = bpe_encode(
            exact.select(id_col, source_col, text_col),
            bpe_merges,
            id_col=id_col,
            text_col=text_col,
            carry_cols=(source_col,),
        ).select(id_col, source_col, F.col("n_bpe_tokens").alias("n_tokens"))
    elif pack_method == "whitespace":
        tok_docs = exact.select(id_col, source_col, tokens.alias("n_tokens"))
    else:
        raise ValueError(f"unknown pack_method {pack_method!r}")
    mixed = apply_mixture(
        tok_docs,
        weights, default_weight, id_col, source_col,
    )
    packed = pack_sequences(
        mixed, budget=seq_budget, group_col=source_col,
        order_cols=(id_col, "copy_n"), token_col="n_tokens",
        shards=pack_shards,
    )
    # n_sequences must be ceil(total_tokens / budget), NOT max(seq_id)+1:
    # seq_id marks the sequence containing each row's START, so a row
    # straddling one or more budget boundaries covers later sequences it
    # never starts in (rows [10, 600] at budget 512 cut 2 sequences but
    # max(seq_id)+1 reports 1).
    return packed.groupBy(source_col).agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.ceil(F.sum("n_tokens") / F.lit(float(seq_budget))).cast("int").alias(
            "n_sequences"
        ),
    )


def select_token_budget(
    docs: DataFrame,
    token_budget: int,
    weight_col: str = "weight",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shards: int = 1,
) -> DataFrame:
    """Budget-constrained data selection: keep the highest-``weight_col``
    documents whose running token total fits ``token_budget`` — the
    "train on the best N tokens" step every quality-scored pipeline ends
    with (DSIR/classifier/perplexity scores in, a fixed token budget
    out). Selection rule is the prefix form: order by (weight DESC,
    id ASC) and keep every doc whose INCLUSIVE running ``token_col`` sum
    is ≤ budget — deterministic, oracle-expressible, no knapsack
    re-ordering. Emits the selected docs with ``sel_rank`` (1-based
    position in the selection order) and ``cum_tokens``.

    Scale shape: a naive global ORDER BY window funnels the corpus
    through ONE task. ``shards`` > 1 applies the pack_sequences
    range-sharding trick to the weight axis: percentile_approx cuts
    split the corpus into contiguous weight-descending shards, the
    cumsum windows per shard (parallel), and exact per-shard base
    offsets come from a tiny shards-sized totals frame. The budget then
    PRUNES: any shard whose base offset already exceeds the budget is
    dropped BEFORE its window runs — at a 1% selection rate on 100 TB,
    ~99% of the corpus never enters a sort. Identical output to the
    single-window form for every cut placement (exact prefix-sum
    reconstruction; property-tested)."""

    def _single_window() -> DataFrame:
        w = (
            Window.orderBy(F.col(weight_col).desc(), F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = F.sum(token_col).over(w).cast("long")
        rk = F.row_number().over(
            Window.orderBy(F.col(weight_col).desc(), F.col(id_col).asc())
        )
        return (
            docs.select("*", cum.alias("cum_tokens"), rk.alias("sel_rank"))
            .filter(F.col("cum_tokens") <= token_budget)
            .select(*docs.columns, "sel_rank", "cum_tokens")
        )

    if shards <= 1:
        return _single_window()

    key = F.col(weight_col).cast("double")
    # Driver-inlined cut points (shards−1 doubles — the docs.count()
    # literal pattern): joining the 1-row percentile frame would plan a
    # BroadcastNestedLoopJoin (Catalyst constant-folds the condition),
    # which the fleet plan audit rightly rejects.
    cut_vals = docs.select(
        F.percentile_approx(
            key, [i / shards for i in range(1, shards)], 1000
        )
    ).first()[0]
    if cut_vals is None:
        # empty input (or all-null weights): percentile_approx yields
        # NULL, so there is nothing to shard — the single-window plan
        # returns the same typed (possibly empty) frame instead of a
        # driver-side TypeError on float(None)
        return _single_window()
    cut_arr = F.lit([float(c) for c in cut_vals])
    # weight-DESC shard id = number of cut points strictly ABOVE the key;
    # equal weights colocate, id tie-break happens inside the shard.
    sharded = docs.withColumn(
        "__shard", F.size(F.filter(cut_arr, lambda c: c > key))
    )
    # Exact per-shard base offsets from a shards-sized totals frame,
    # COLLECTED (bounded: ≤ shards rows — the docs.count() literal
    # pattern) and inlined as literal maps: a broadcast self-join back
    # onto `sharded` both hits Spark's self-join attribute ambiguity and
    # would defeat the prune-before-sort below.
    totals = {
        int(r["__shard"]): (int(r["__tot"]), int(r["__cnt"]))
        for r in sharded.groupBy("__shard")
        .agg(
            F.sum(token_col).cast("long").alias("__tot"),
            F.count(F.lit(1)).alias("__cnt"),
        )
        .collect()
    }
    base_tok, base_cnt, run_t, run_n = {}, {}, 0, 0
    for s in sorted(totals):
        base_tok[s], base_cnt[s] = run_t, run_n
        run_t += totals[s][0]
        run_n += totals[s][1]
    # budget pruning: a shard whose base offset already exceeds the
    # budget cannot select anything — it never enters the window sort.
    # At a 1% selection rate this drops ~99% of the corpus pre-sort.
    eligible = sorted(s for s, b in base_tok.items() if b < token_budget)
    if not eligible:
        empty = docs.limit(0)
        return empty.select(
            *docs.columns,
            F.lit(None).cast("int").alias("sel_rank"),
            F.lit(None).cast("long").alias("cum_tokens"),
        )
    map_tok = F.create_map(
        *[x for s in eligible for x in (F.lit(s), F.lit(base_tok[s]))]
    )
    map_cnt = F.create_map(
        *[x for s in eligible for x in (F.lit(s), F.lit(base_cnt[s]))]
    )
    w_shard = (
        Window.partitionBy("__shard")
        .orderBy(F.col(weight_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sharded.filter(F.col("__shard").isin(*[int(s) for s in eligible]))
        .select(
            "*",
            F.sum(token_col).over(w_shard).cast("long").alias("__cum"),
            F.row_number().over(w_shard).alias("__rn"),
        )
        .withColumn(
            "cum_tokens",
            (map_tok[F.col("__shard")] + F.col("__cum")).cast("long"),
        )
        .withColumn(
            "sel_rank", (map_cnt[F.col("__shard")] + F.col("__rn")).cast("int")
        )
        .filter(F.col("cum_tokens") <= token_budget)
        .select(*docs.columns, "sel_rank", "cum_tokens")
    )


def temperature_weights(
    docs: DataFrame,
    alpha: float = 0.3,
    source_col: str = "source",
) -> dict[str, float]:
    """Temperature-scaled per-source mixture weights (the multilingual
    up/down-sampling rule published for XLM / mBERT / mT5-class corpora:
    sample source i with probability ∝ n_i^α, α ∈ (0, 1] — α=1 is
    natural proportions, α→0 uniform). Returned as the per-source COPY
    FACTOR dict :func:`apply_mixture` consumes: factor_i =
    (temp_share_i / natural_share_i), i.e. how many times each source's
    docs repeat so the realized corpus approximates the tempered
    distribution while keeping total size ≈ input size.

    Scale: one #sources-bounded count aggregate collected to the driver
    (sources are a bounded dimension — the diag_key_skew/IDF-literal
    pattern); everything downstream is apply_mixture's map + explode."""
    counts = {
        r[source_col]: r["n"]
        for r in docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(counts.values()) or 1
    shares = temperature_shares(counts, alpha)
    return {s: shares[s] / (counts[s] / total) for s in counts}


def temperature_shares(counts: dict, alpha: float) -> dict:
    """The n^α / Σn^α tempered SHARE computation both temperature
    consumers use (copy factors above; the stride interleaver's
    per-source weights) — one place for the formula (review r14)."""
    powed = {s: n ** alpha for s, n in counts.items()}
    ptot = sum(powed.values()) or 1.0
    return {s: v / ptot for s, v in powed.items()}


def unimax_weights(
    docs: DataFrame,
    max_epochs: float = 4.0,
    source_col: str = "source",
) -> dict[str, float]:
    """UniMax mixture weights (arXiv:2304.09151 — the published
    successor to temperature sampling for multilingual corpora): spread
    the total budget as UNIFORMLY across sources as possible, but never
    repeat any source more than ``max_epochs`` times. Exact waterfill:
    sources too small to absorb a uniform share are capped at
    max_epochs·n_i and their leftover budget re-spreads uniformly over
    the still-uncapped (larger) sources, iterated to a fixpoint — so
    head sources down-sample toward equal shares while tail sources are
    bounded at max_epochs (temperature sampling's unbounded tail
    repetition is exactly what UniMax fixes). Budget = input corpus
    size, so the realized mixture stays ≈ input-sized like the other
    mixture rules here.

    Returns the per-source COPY FACTOR dict :func:`apply_mixture`
    consumes (factor_i = alloc_i / n_i ∈ (0, max_epochs]). Scale: one
    #sources-bounded count aggregate collected to the driver; the
    waterfill is O(#sources log #sources) python; everything downstream
    is apply_mixture's map + explode.
    """
    counts = {
        r[source_col]: r["n"]
        for r in docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    budget = float(sum(counts.values()))
    alloc: dict[str, float] = {}
    active = sorted(counts, key=lambda s: (counts[s], s))
    remaining = budget
    # waterfill smallest-capacity-first: one pass suffices because once
    # the uniform share drops below a source's cap, it stays below for
    # every LARGER source re-spread
    while active:
        share = remaining / len(active)
        s = active[0]
        cap = max_epochs * counts[s]
        if cap <= share:
            alloc[s] = cap
            remaining -= cap
            active.pop(0)
        else:
            for s in active:
                alloc[s] = share
            break
    return {s: alloc[s] / counts[s] for s in counts}


def repetition_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_n: int = 10,
    top_thresholds: dict[int, float] | None = None,
    max_dup_frac: float = 0.10,
) -> DataFrame:
    """The full Gopher repetition-signal family (Rae et al. 2021 §A1.1
    — the rules beyond the single top-bigram check in gopher_metrics):
    per doc, the fraction of CHARACTERS contained in the most frequent
    word n-gram for each n in ``top_ns`` (count × gram chars / doc
    chars; most-frequent ties broken toward more chars then
    lexicographically largest — deterministic) and the fraction of
    characters covered by word ``dup_n``-grams that repeat WITHIN the
    doc (overlapping occurrences merged into maximal spans first, so no
    character is double-counted — the coverage semantics the published
    implementations use; span chars include the inner separator
    spaces). ``repetition_pass`` applies Gopher's thresholds (defaults:
    top-2/3/4 ≤ 0.20/0.18/0.16, dup-10 coverage ≤ 0.10).

    Scale shape: the top-n counts ride ONE shuffle for all ns (the
    per-n gram frames union before the (doc, n, gram) partial-agged
    groupBy, then a per-doc max over a struct — no joins); the dup
    coverage reuses the duplicate_spans machinery with per-DOC
    duplication scope (positioned grams → (doc, gram-hash) count ≥ 2 →
    island merge) and folds each merged span's token slice to chars
    JVM-side. Docs shorter than a given n score 0 for that signal (no
    grams — nothing can repeat)."""
    from pyspark.sql import Window

    from n2kupdate_spark.operators.dedup import gram_array

    top_thresholds = top_thresholds or {2: 0.20, 3: 0.18, 4: 0.16}
    toks = F.split(F.col(text_col), " ")
    base = docs.select(
        id_col, F.length(text_col).alias("__chars"), text_col
    )

    # --- top-n char fractions: one unioned gram frame, one groupBy ---
    frames = None
    for n in top_ns:
        f = base.filter(F.size(toks) >= n).select(
            id_col,
            "__chars",
            F.lit(n).alias("n"),
            F.explode(gram_array(text_col, n)).alias("g"),
        )
        frames = f if frames is None else frames.unionByName(f)
    counted = frames.groupBy(id_col, "__chars", "n", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    # all per-n maxes fold into ONE per-doc aggregate (a conditional
    # struct-max per n) instead of a per-(doc, n) max + pivot — two
    # exchanges fewer, and hash(doc) re-use carries into the final join
    top = counted.groupBy(id_col).agg(
        *[
            F.max(
                F.when(
                    F.col("n") == n,
                    F.struct("c", F.length("g").alias("l"), "g"),
                )
            ).alias(f"__t{n}")
            for n in top_ns
        ],
        F.first("__chars").alias("__tc"),
    ).select(
        id_col,
        *[
            (
                F.round(
                    F.col(f"__t{n}.c") * F.col(f"__t{n}.l") / F.col("__tc") * 10000,
                    0,
                )
                / 10000
            ).alias(str(n))
            for n in top_ns
        ],
    )

    # --- dup-n char coverage: per-DOC duplicated positioned grams ---
    pos = base.filter(F.size(toks) >= dup_n).select(
        id_col, F.posexplode(gram_array(text_col, dup_n)).alias("i", "g")
    ).select(id_col, "i", F.xxhash64("g").alias("h"))
    dup = (
        pos.groupBy(id_col, "h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select(id_col, "h")
    )
    marked = pos.join(dup, [id_col, "h"]).select(id_col, "i")
    ord_w = Window.partitionBy(id_col).orderBy("i")
    island = F.sum(
        F.when(F.col("i") > F.lag("i").over(ord_w) + dup_n, 1).otherwise(0)
    ).over(ord_w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spans = (
        marked.withColumn("island", island)
        .groupBy(id_col, "island")
        .agg(F.min("i").alias("start"), (F.max("i") + dup_n).alias("end"))
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("start", "end")).alias("__spans"))
    )
    # span chars = token lengths in the slice + inner spaces; #spans/doc
    # is small by construction (merged islands need a dup_n-token gap),
    # so the split-per-span re-eval inside the outer lambda is bounded
    covered = F.aggregate(
        F.coalesce("__spans", F.array().cast("array<struct<start:int,end:int>>")),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.aggregate(
            F.slice(F.split(F.col(text_col), " "), b["start"] + 1, b["end"] - b["start"]),
            F.lit(0).cast("long"),
            lambda a, t: a + F.length(t),
        )
        + (b["end"] - b["start"] - 1).cast("long"),
    )
    out = (
        base.join(top, id_col, "left")
        .join(spans, id_col, "left")
        .withColumn("__cov", covered)
        .select(
            id_col,
            *[
                F.coalesce(F.col(str(n)), F.lit(0.0)).alias(f"top{n}_char_frac")
                for n in top_ns
            ],
            (
                F.round(F.col("__cov") / F.col("__chars") * 10000, 0) / 10000
            ).alias(f"dup{dup_n}_char_frac"),
        )
    )
    passed = F.lit(True)
    for n in top_ns:
        passed = passed & (F.col(f"top{n}_char_frac") <= top_thresholds[n])
    passed = passed & (F.col(f"dup{dup_n}_char_frac") <= max_dup_frac)
    return out.withColumn("repetition_pass", passed.cast("int"))


def shuffle_shards(
    rows: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Content-addressed global training shuffle: every row gets a
    ``shard`` in [0, n_shards) and a within-shard ``shuffle_key`` —
    both pure functions of md5(seed || id), nothing else. This is the
    final pre-training step (break source/time ordering so every
    fixed-context batch is an unbiased corpus sample) done WITHOUT a
    global sort or any RNG state: a 100 TB shuffle is one map to stamp
    the columns plus one hash exchange to colocate shards; within-shard
    order comes from sorting each shard partition locally on the key
    (sortWithinPartitions — never a total order across the corpus).

    Determinism is the point: the same (id, seed) lands in the same
    shard at the same position on any cluster size, input partitioning,
    engine, or retry — resumable and auditable where rand()-based
    shuffles are none of these. Per-EPOCH reshuffling is ``seed``:
    epoch's seed ⇒ a fresh independent permutation, reproducible
    forever. The 32-bit md5 prefix keeps the modulo bias ≤ ~1e-6 (the
    mixture_copy_counts analysis); the full digest as ``shuffle_key``
    makes within-shard collisions (order nondeterminism) need ~2^64
    rows per shard. Writers: ``df.repartition(n, "shard").
    sortWithinPartitions("shard", "shuffle_key")`` then
    ``partitionBy("shard")`` — hash collisions of shard→partition only
    affect balance, never placement or order."""
    h = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    return rows.select("*", shard.alias("shard"), h.alias("shuffle_key"))


def write_shuffled_shards(
    rows: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "",
) -> None:
    """Materialize the shuffle: parquet partitioned by ``shard``, rows
    inside every file in ``shuffle_key`` order. The recipe matters:
    repartition on shard colocates each shard, sortWithinPartitions
    (shard, key) then SATISFIES the partition-writer's required
    ordering prefix, so FileFormatWriter performs no re-sort of its own
    and the key order survives into the files — pinned by reading the
    files back file-by-file in tests/test_mlprep_props.py. A training
    reader streams shard dirs in file order and gets the deterministic
    permutation; hash collisions shard→task only affect balance."""
    (
        shuffle_shards(rows, n_shards, id_col=id_col, seed=seed)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_key")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


def normalize_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    nfkc: bool = False,
) -> DataFrame:
    """Stamp ``norm_text``: the canonical form duplicate detection should
    hash/shingle (case and punctuation variants of one document must
    collide). Default path is pure JVM codegen
    (functions/scalars.py::norm_text — lowercase, strip, collapse);
    ``nfkc=True`` prepends Unicode NFKC compatibility normalization
    (fullwidth forms, ligatures, composed accents) via an Arrow-batched
    pandas_udf over stdlib ``unicodedata`` — the one step Spark has no
    built-in for, deliberately OFF by default so ASCII corpora never pay
    the Python boundary. Map-only either way; composes in front of any
    dedup/fingerprint operator via its ``text_col`` parameter."""
    from n2kupdate_spark.functions.scalars import norm_text

    src = F.col(text_col)
    if nfkc:
        import pandas as pd  # noqa: F401 — pandas_udf resolves the hints
        from pyspark.sql.functions import pandas_udf

        # NOTE: the type hints must name module-global `pd` under
        # `from __future__ import annotations`; resolved via the local
        # import above being passed through the closure's globals by
        # binding the hint objects eagerly (no string annotations here
        # because this function object is built at call time).
        def _nfkc_fn(s):
            import unicodedata

            return s.map(
                lambda t: unicodedata.normalize("NFKC", t)
                if t is not None
                else None
            )

        _nfkc_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
        src = pandas_udf(_nfkc_fn, "string")(src)
    return docs.withColumn("norm_text", norm_text(src))


def information_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    zlib_level: int = 6,
) -> DataFrame:
    """Per-doc information-theoretic quality signals — the published
    complement to rule-based (Gopher) and model-based (classifier)
    filtering: machine-generated spam and boilerplate sit at the entropy
    extremes, and near-incompressible or hyper-compressible text is a
    strong repetition/gibberish proxy used by web-corpus pipelines
    (CCNet-family and Dolma-style compression-ratio gates).

    Emits ``(id, n_chars, char_entropy, word_entropy, zlib_ratio)``:
    Shannon entropy in bits of the character and word unigram
    distributions, and ``len(zlib(utf8)) / len(utf8)`` at the given
    level (bytes over bytes — a character denominator would inflate the
    ratio for multi-byte scripts and bias a zlib gate against them). Null/empty docs get 0.0 entropies and ratio 0.0 (nothing to
    compress), and are KEPT — a quality gate must see them to reject
    them. All values round to 4dp for pin stability.

    Scale shape: ONE Arrow-batched ``mapInPandas`` pass — zero shuffle,
    zero collect, no gram explosion (the entropy accumulates in a
    per-batch Python dict, never a (doc, gram) row stream). Python is
    unavoidable here only because of zlib; the entropies ride the same
    batch loop for free rather than paying a second pass or a char-level
    explode (which at 100 TB would shuffle 100 TB of single characters).
    """
    import pandas as pd

    schema = (
        f"{id_col} long, n_chars int, char_entropy double, "
        "word_entropy double, zlib_ratio double"
    )

    def _batches(it):
        import zlib
        from collections import Counter

        import numpy as np

        def entropy_bits(counts):
            n = sum(counts)
            if n == 0:
                return 0.0
            p = np.asarray(counts, dtype=np.float64) / n
            return float(-(p * np.log2(p)).sum())

        for pdf in it:
            out = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if t is None or len(t) == 0:
                    out.append((i, 0, 0.0, 0.0, 0.0))
                    continue
                ce = entropy_bits(list(Counter(t).values()))
                we = entropy_bits(list(Counter(t.split(" ")).values()))
                # bytes/bytes, not bytes/chars: a chars denominator
                # inflates the ratio for multi-byte scripts, so a
                # zlib_ratio_bounds gate would disproportionately drop
                # non-ASCII documents (r10 advice).
                raw = t.encode("utf-8")
                zr = len(zlib.compress(raw, zlib_level)) / len(raw)
                out.append((i, len(t), round(ce, 4), round(we, 4), round(zr, 4)))
            yield pd.DataFrame(
                out,
                columns=[id_col, "n_chars", "char_entropy", "word_entropy", "zlib_ratio"],
            )

    return docs.select(id_col, text_col).mapInPandas(_batches, schema)


def chunk_documents(
    docs: DataFrame,
    size: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split every document into overlapping token windows — the
    long-document preparation step both pretraining (context-window
    slicing) and retrieval indexing (passage chunking) need: windows of
    ``size`` whitespace tokens starting every ``size − overlap`` tokens,
    so consecutive chunks share exactly ``overlap`` tokens and every
    token of every doc appears in at least one chunk (the last window
    ends exactly at the doc's final token). A doc with ≤ ``size`` tokens
    yields one chunk; a doc with zero non-empty tokens yields none.
    Chunk count: 1 if n ≤ size else ceil((n − size)/stride) + 1.

    Emits (``id_col``, chunk_id 0-based, start_tok 1-based,
    n_chunk_tokens, chunk_text). Entirely JVM codegen — split + filter +
    sequence + explode + slice + array_join; no shuffle, no Python: a
    100 TB chunking pass is pure scan-parallel map work, and the output
    inherits the scan's partitioning (chunks of a doc stay in its
    partition). Coverage/overlap/boundary properties pinned against an
    independent python reference in tests/test_mlprep_props.py."""
    if overlap >= size:
        raise ValueError(
            f"chunk_documents: overlap ({overlap}) must be < size ({size})"
        )
    stride = size - overlap
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    n = F.size(toks)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.when(n <= size, F.lit(1)).otherwise(
            F.ceil((n - F.lit(size)) / F.lit(float(stride))).cast("int") + 1
        )
    )
    base = docs.select(
        id_col, toks.alias("__toks"), n_chunks.alias("__nc")
    ).filter(F.col("__nc") > 0)
    exploded = base.select(
        id_col,
        "__toks",
        F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride + 1
    chunk = F.slice(F.col("__toks"), start, size)
    return exploded.select(
        id_col,
        "chunk_id",
        start.alias("start_tok"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def stratified_neyman(
    rows: DataFrame,
    total_n: int,
    stratum_col: str,
    id_col: str,
    val_col: str,
) -> DataFrame:
    """Budgeted stratified sampling with NEYMAN ALLOCATION (Neyman 1934,
    the optimum-allocation result every sampling textbook teaches):
    split a fixed sample budget across strata ∝ N_h·σ_h, so
    high-variance strata get proportionally MORE of the budget than
    plain proportional allocation — the minimum-variance estimator of
    the population mean at a fixed n. The practical corpus use: sampling
    a validation set where volatile sources deserve more scrutiny per
    row than uniform ones.

    Allocation is exact-integer: largest-remainder rounding makes the
    n_h sum to ``min(total_n, N)``, per-stratum caps n_h ≤ N_h are
    enforced with iterative redistribution of the excess (strata order:
    remainder desc, stratum asc — deterministic), and a stratum with
    σ_h = 0 (or a single row) still receives its floor share via the
    N_h·σ_h → 0 limit (it simply competes with weight 0; if EVERY
    stratum has zero weight the allocation degrades to proportional).
    Selection within a stratum is the content-addressed md5-rank rule
    shared with reservoir_per_key — identical membership on every
    engine/run/cluster size. Emits (``id_col``, ``stratum_col``, rk).

    Scale shape: ONE #strata-row aggregate (count + population σ,
    map-side partial) collected driver-side; the allocation arithmetic
    is #strata-bounded; selection is one per-stratum window over
    md5-ranked rows with the allocation inlined as a literal map — no
    joins, one shuffle. Pinned against an independent python recompute
    (allocation AND membership) at two sfs in
    tests/test_mlprep_props.py."""
    stats = {
        r["__s"]: (int(r["__n"]), float(r["__sd"] or 0.0))
        for r in rows.groupBy(F.col(stratum_col).alias("__s"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.stddev_pop(val_col).alias("__sd"),
        )
        .collect()
    }
    n_total = sum(n for n, _ in stats.values())
    budget = min(total_n, n_total)
    weights = {s: n * sd for s, (n, sd) in stats.items()}
    if sum(weights.values()) <= 0.0:
        weights = {s: float(n) for s, (n, _) in stats.items()}
    alloc = _largest_remainder_capped(
        weights, {s: n for s, (n, _) in stats.items()}, budget
    )
    if not alloc:
        # empty input: F.create_map() would type its keys as VOID and
        # break the lookup — return the typed empty frame directly
        return rows.select(id_col, stratum_col).limit(0).select(
            "*", F.lit(None).cast("int").alias("rk")
        )

    hsh = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(stratum_col).orderBy(hsh.asc(), F.col(id_col).asc())
    alloc_map = F.create_map(
        *[x for s in sorted(alloc) for x in (F.lit(s), F.lit(alloc[s]))]
    )
    return (
        rows.select(id_col, stratum_col)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= alloc_map[F.col(stratum_col)])
    )


def _largest_remainder_capped(
    weights: dict, caps: dict, budget: int
) -> dict:
    """Exact-integer proportional allocation: largest-remainder rounding
    of ``budget`` across ``weights``, with per-key ``caps`` enforced by
    iterative redistribution (a capped key's excess re-allocates over
    the uncapped rest — terminates in ≤ #keys rounds). Deterministic
    tie order (remainder desc, key asc). Driver-side over #strata keys."""
    keys = sorted(weights)
    alloc = {k: 0 for k in keys}
    active = [k for k in keys if caps[k] > 0]
    remaining = budget
    while remaining > 0 and active:
        tot_w = sum(weights[k] for k in active)
        if tot_w <= 0.0:
            tot_w = float(len(active))
            shares = {k: remaining / len(active) for k in active}
        else:
            shares = {k: remaining * weights[k] / tot_w for k in active}
        floors = {k: min(int(shares[k]), caps[k] - alloc[k]) for k in active}
        give = sum(floors.values())
        rema = sorted(
            active,
            key=lambda k: (-(shares[k] - int(shares[k])), k),
        )
        for k in rema:
            if give >= remaining:
                break
            if alloc[k] + floors[k] < caps[k]:
                floors[k] += 1
                give += 1
        for k in active:
            alloc[k] += floors[k]
        remaining -= give
        active = [k for k in active if alloc[k] < caps[k]]
        if give == 0 and remaining > 0 and active:
            # all floors zero (tiny remainder): hand out 1 each by rule
            for k in sorted(active):
                if remaining == 0:
                    break
                alloc[k] += 1
                remaining -= 1
            active = [k for k in active if alloc[k] < caps[k]]
    return alloc


def _es_key(id_col: str, weight_col: str):
    """The shared Efraimidis–Spirakis selection key (review r14: it was
    copy-pasted into both samplers — the determinism contract lives
    HERE once): u content-addressed from 13 hex chars of md5(id)
    (clamped to the smallest positive step so ln stays finite), key =
    ln(u)/w in log space (same ordering as u^(1/w), no underflow)."""
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(16**13))
    )
    u = F.greatest(u, F.lit(1.0 / float(16**13)))
    return F.log(u) / F.col(weight_col).cast("double")


def sample_weighted_topk(
    rows: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, the one-pass algorithm): each row draws u ∈ (0,1) and keeps
    key u^(1/w); the k LARGEST keys are a weight-proportional sample —
    the published way to realize importance weights as an actual
    training subset (the Gumbel-resampling step
    :func:`importance_weights` documents as the caller's job; this is
    that caller). Computed in log space (ln(u)/w — the same ordering,
    no underflow at tiny weights) with u CONTENT-ADDRESSED from
    md5(id) (13 hex chars / 16¹³), so membership is deterministic
    across runs/engines/cluster sizes like every sampler here; rows
    with weight ≤ 0 or NULL can never be drawn. Emits
    (``id_col``, ``weight_col``, es_key, sel_rank 1-based).

    Scale shape: one map computes the key; the global top-k plans as
    TakeOrderedAndProject (per-partition partial top-k merged on the
    driver — no global sort, no single-task window); the final rank is
    a window over k rows. Pinned against an independent python
    recompute + planted-weight inclusion in tests/test_mlprep_props.py."""
    w = F.col(weight_col).cast("double")
    key = _es_key(id_col, weight_col)
    scored = (
        rows.filter(w.isNotNull() & (w > 0))
        .select(id_col, weight_col, key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), F.col(id_col).asc())
        .limit(k)
    )
    rk = F.row_number().over(
        Window.orderBy(F.col("es_key").desc(), F.col(id_col).asc())
    )
    return scored.select(
        id_col,
        weight_col,
        (F.round(F.col("es_key") * 10000) / 10000).alias("es_key"),
        rk.alias("sel_rank"),
    )


def sample_weighted_per_key(
    rows: DataFrame,
    k: int,
    weight_col: str,
    key_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """PER-KEY weighted sampling without replacement — the stratified
    sibling of :func:`sample_weighted_topk` (which draws one global
    sample) and of the uniform per-key reservoir: k rows PER KEY drawn
    with probability ∝ weight, the shape a mixture-building pipeline
    actually wants ("5 quality-weighted docs from EVERY source/
    language", not "the 5 heaviest overall" — a global draw starves
    small strata entirely). Same Efraimidis–Spirakis key, same
    content-addressed u from md5(id) (deterministic across runs/
    engines/partitionings), same weight ≤ 0 / NULL exclusion. Emits
    (key, id, weight, es_key 6dp, sel_rank 1-based within key).

    Scale shape: one map computes the key, then ONE key-partitioned
    rank window keeps rank ≤ k — per-stratum top-k in a single
    shuffle; skewed strata are rank windows over their own partition
    only (AQE splits an oversized one), never a global sort."""
    w = F.col(weight_col).cast("double")
    key = _es_key(id_col, weight_col)
    rk = F.row_number().over(
        Window.partitionBy(key_col).orderBy(
            F.col("es_key").desc(), F.col(id_col).asc()
        )
    )
    return (
        rows.filter(w.isNotNull() & (w > 0))
        .select(key_col, id_col, weight_col, key.alias("es_key"))
        .select(key_col, id_col, weight_col, "es_key", rk.alias("sel_rank"))
        .filter(F.col("sel_rank") <= k)
        # 6dp, not the usual 4: with length-scale weights (hundreds+)
        # ln(u)/w sits at 1e-3..1e-5 and 4dp would collapse every key
        # to one of a few values — selection always ranks the UNROUNDED
        # key; the rounding is display/pin canonicalization only
        .select(
            key_col,
            id_col,
            weight_col,
            (F.round(F.col("es_key") * 1000000) / 1000000).alias("es_key"),
            "sel_rank",
        )
    )


def normalize_urls(
    rows: DataFrame,
    url_col: str = "url",
    tracking_prefixes: tuple[str, ...] = ("utm_",),
    tracking_params: tuple[str, ...] = ("gclid", "fbclid", "msclkid"),
) -> DataFrame:
    """URL canonicalization — the step crawl-level dedup starts with
    (two fetches of one resource must map to one key before any content
    dedup runs). The standard normalization set (RFC 3986 §6 syntax
    invariants + the universal tracking-param scrub): lowercase scheme
    and host, strip default ports (:80 http / :443 https), drop the
    fragment, remove tracking query params (``utm_*`` prefixes and the
    click-id set), SORT the surviving params (order-insensitive
    canonical form), and trim a trailing slash off non-root paths.
    Emits the input plus ``url_norm``.

    Entirely JVM codegen — regexp captures + split/filter/sort/join
    higher-order functions, no UDF: at 100 TB this is a pure map the
    scan absorbs. Pinned against an independent python recompute on
    adversarial forms (mixed case, explicit default/non-default ports,
    tracking-only queries, fragments, root/non-root slashes) in
    tests/test_mlprep_props.py."""
    scheme = F.lower(F.regexp_extract(url_col, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(url_col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(url_col, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    # RFC 3986 §6.2.3: with an authority present, an EMPTY path is
    # equivalent to "/" — unify them or "https://host" and
    # "https://host/" stay two keys for one resource (r12 ADVICE)
    path = (
        F.when(path == "", F.lit("/"))
        .when(path == "/", path)
        .otherwise(F.regexp_replace(path, "/$", ""))
    )
    query = F.regexp_extract(url_col, r"\?([^#]*)", 1)

    def _is_tracking(name):
        # seeded with lit(False) so EMPTY prefix/param tuples mean
        # "scrub nothing" instead of a None-call TypeError (r12 ADVICE);
        # F.array() of zero literals is VOID-typed, so the param-set
        # term is only added when the tuple is non-empty
        cond = F.lit(False)
        for pfx in tracking_prefixes:
            cond = cond | F.startswith(name, F.lit(pfx))
        if tracking_params:
            cond = cond | F.array_contains(
                F.array(*[F.lit(t) for t in tracking_params]), name
            )
        return cond

    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~_is_tracking(F.split(p, "=").getItem(0)),
        )
    )
    qstr = F.array_join(kept, "&")
    norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )
    return rows.withColumn("url_norm", norm)


#: Block-level HTML tags — boundaries for boilerplate segmentation
#: (jusText/trafilatura segment on the same set; inline tags like <a>,
#: <b>, <span> do NOT split a block, their text stays with the block).
_HTML_BLOCK_SPLIT = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article|aside|"
    r"header|footer|nav|blockquote|pre|br)\b[^>]*>"
)

#: Minimal entity set, decoded AFTER tag stripping; ``&amp;`` is decoded
#: LAST and exactly once, so an author-escaped ``&amp;lt;`` correctly
#: yields the literal text ``&lt;`` instead of double-decoding to ``<``.
_HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def _html_block_text(b) -> "F.Column":
    """Visible text of one block: strip remaining (inline) tags,
    collapse whitespace, trim. Entity decode is deliberately NOT here —
    the keep rules gate on pre-decode lengths (a heuristic threshold is
    insensitive to the ±few chars an entity decode shifts) so the
    6-replace decode chain runs ONCE per document on the kept text
    instead of once per block AND once per anchor (r13: cut the
    per-block regex passes from 8 + 7·anchors to 3 + 3)."""
    t = F.regexp_replace(b, r"(?s)<[^>]*>", " ")
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def _html_anchor_chars(b) -> "F.Column":
    """Characters of visible text inside <a> elements of one block —
    the numerator of the block's link density, normalized exactly like
    the block text so the ratio compares like with like. All anchors
    are joined first so the tag-strip/collapse passes run once per
    block, not once per anchor."""
    return F.length(
        _html_block_text(
            F.array_join(
                F.regexp_extract_all(
                    b, F.lit(r"(?is)<a\b[^>]*>(.*?)</a>"), F.lit(1)
                ),
                " ",
            )
        )
    )


def _html_decode_entities(t, collapse_pat: str = r"\s+") -> "F.Column":
    """The once-per-document entity decode (&amp; LAST, exactly once),
    followed by one more collapse/trim pass because &nbsp; decodes to a
    space that can double up. ``collapse_pat`` narrows to horizontal
    whitespace (``[^\\S\\n]+``) when the caller joins blocks with
    newlines, so the separator survives the pass."""
    for ent, ch in _HTML_ENTITIES:
        t = F.regexp_replace(t, ent, ch)
    return F.trim(F.regexp_replace(t, collapse_pat, " "))


def extract_html_text(
    rows: DataFrame,
    html_col: str = "html",
    min_block_chars: int = 25,
    max_link_density: float = 0.33,
    out_col: str = "extracted_text",
    block_sep: str = " ",
) -> DataFrame:
    """HTML boilerplate extraction — the step every real crawl pipeline
    runs BEFORE the quality gates this library already has (jusText,
    Pomikálek 2011 / trafilatura-style rule set, the deterministic
    core without the stopword model): (1) drop non-content elements
    wholesale — <script>, <style>, comments, CDATA sections (removed
    FIRST, so markup hidden inside them can never leak into text or
    confuse the splitter); (2) segment on block-level tags (inline tags
    keep their text); (3) per block, strip tags and collapse
    whitespace; (4) keep a block iff its text is ≥ ``min_block_chars``
    AND its link density (anchor-text chars / block chars) ≤
    ``max_link_density`` — the link-density rule that kills
    nav/footer/related-links boilerplate while keeping paragraphs that
    merely contain a link; (5) decode the common entities ONCE on the
    kept text (&amp; last, exactly once — gating on pre-decode lengths
    keeps the 6-replace chain per document instead of per
    block-and-anchor; a heuristic length threshold is insensitive to
    the ±few chars decode shifts). Appends ``out_col`` (kept blocks
    joined by a space, entity-decoded), ``n_blocks`` (blocks with any
    visible text), ``n_kept``, and ``boilerplate_frac`` (4dp char
    fraction dropped, pre-decode lengths).

    Scale: pure JVM map — regexp_replace chains, one split, and
    transform/filter/aggregate HOFs over the per-row block array; no
    shuffle, no Python, absorbed by the scan at 100 TB. The block
    array is materialized in its own projection so downstream HOFs
    reference the computed column instead of re-splitting per use.

    Known limitation (regex-based, shared with the python reference
    pin): a bare ``<`` in BODY text followed by a later ``>`` is eaten
    as if it were a tag (``x < 2 && y > 1`` loses the middle) — real
    pages escape these as entities (which this op decodes correctly);
    tolerating raw unescaped angle brackets needs a true HTML parser,
    which is the spec'd trade of the deterministic regexp core."""
    nocode = F.col(html_col)
    for pat in (
        r"(?is)<script\b[^>]*>.*?</script>",
        r"(?is)<style\b[^>]*>.*?</style>",
        r"(?s)<!--.*?-->",
        r"(?s)<!\[CDATA\[.*?\]\]>",
    ):
        nocode = F.regexp_replace(nocode, pat, " ")
    base = rows.withColumn("_blocks", F.split(nocode, _HTML_BLOCK_SPLIT))
    base = base.withColumn(
        "_stats",
        F.transform(
            F.col("_blocks"),
            lambda b: F.struct(
                _html_block_text(b).alias("t"),
                _html_anchor_chars(b).alias("al"),
            ),
        ),
    ).drop("_blocks")
    base = (
        base.withColumn(
            "_nonempty",
            F.filter(F.col("_stats"), lambda s: F.length(s["t"]) > 0),
        )
        .drop("_stats")
        .withColumn(
            "_kept",
            F.filter(
                F.col("_nonempty"),
                lambda s: (F.length(s["t"]) >= min_block_chars)
                & (
                    s["al"].cast("double")
                    <= F.length(s["t"]) * F.lit(float(max_link_density))
                ),
            ),
        )
    )
    total_chars = F.aggregate(
        F.col("_nonempty"), F.lit(0), lambda a, s: a + F.length(s["t"])
    )
    kept_chars = F.aggregate(
        F.col("_kept"), F.lit(0), lambda a, s: a + F.length(s["t"])
    )
    frac = F.when(
        total_chars > 0,
        F.round(
            (F.lit(1.0) - kept_chars.cast("double") / total_chars.cast("double"))
            * 10000
        )
        / 10000,
    ).otherwise(F.lit(0.0))
    return (
        base.withColumn(
            out_col,
            _html_decode_entities(
                F.array_join(
                    F.transform(F.col("_kept"), lambda s: s["t"]), block_sep
                ),
                collapse_pat=r"\s+" if block_sep == " " else r"[^\S\n]+",
            ),
        )
        .withColumn("n_blocks", F.size("_nonempty"))
        .withColumn("n_kept", F.size("_kept"))
        .withColumn("boilerplate_frac", frac)
        .drop("_nonempty", "_kept")
    )


def kn_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_vocab: int = 65536,
    max_bigrams: int = 1 << 20,
    bos: str = "<s>",
    unk: str = "<unk>",
    widen: bool = True,
) -> DataFrame:
    """Interpolated Kneser–Ney bigram LM perplexity per document (Chen &
    Goodman 1999 eq. 4.24; the CCNet/KenLM-class quality scorer the
    unsmoothed :func:`~n2kupdate_spark.queries.text._bigram_lm_scores`
    MLE approximates): P(w₂|w₁) = max(c(w₁w₂)−D, 0)/c(w₁) +
    λ(w₁)·P_cont(w₂), with absolute discount D = n₁/(n₁+2n₂) from the
    bigram count-of-counts (0.5 when n₁=n₂=0), backoff mass λ(w₁) =
    D·N₁₊(w₁•)/c(w₁), and the continuation distribution P_cont(w₂) =
    N₁₊(•w₂)/N₁₊(••) — the "how many distinct contexts" estimate that
    makes KN the published best-in-class smoother. Each document is
    scored over its (⟨s⟩ w₁..wₙ) transitions; OOV tokens (outside the
    top ``max_vocab`` unigrams, count-desc/word-asc tie-break) map to
    ``unk`` BEFORE counting, so the model is closed over a bounded
    vocabulary. Emits (``id_col``, n_transitions, avg_logprob 4dp,
    ppl 4dp) where ppl = exp(−mean ln P).

    Scale shape (the verdict-prescribed recipe): THREE corpus-keyed
    shuffles total — unigram counts (∝ vocab), bigram counts (∝ bigram
    types; eagerly localCheckpointed because four fit aggregates
    consume it), and the final per-doc average. The KN tables are
    engine-side aggregates bounded by the vocab (per-context and
    per-continuation rows ≤ V+1) and broadcast to the scoring pass;
    only the count-of-counts scalars (n₁, n₂, N₁₊(••)) are collected
    and inlined as literals (the MLlib-IDF pattern — a lit-keyed join
    would plan BNLJ). The probability table is pruned to the top
    ``max_bigrams`` by count before broadcast (KenLM prunes the same
    way); pruned/unseen bigrams score through the backoff form
    λ(w₁)·P_cont(w₂) via coalesce, so scoring is total. The transition
    stream is deliberately recomputed for the scoring pass (two scans)
    instead of materializing a corpus-sized checkpoint."""
    # The transition explode runs TWICE (fit + scoring) and the vocab
    # explode once — all fused into the scan stage, one task on a
    # one-file table (r16, guide §2.6). Keyed fan_out widens all three;
    # ``widen=False`` for mid-pipeline callers (gate_documents).
    if widen:
        docs = fan_out(docs, id_col, fraction=0.5)
    arr = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    n = F.size(arr)
    ext = F.concat(F.array(F.lit(bos)), arr)
    zipped = F.arrays_zip(
        F.slice(ext, 1, n).alias("w1"), arr.alias("w2")
    )
    transitions = (
        docs.select(id_col, zipped.alias("_z"))
        .filter(F.size("_z") >= 1)
        .select(id_col, F.explode("_z").alias("b"))
        .select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    # The whole FIT now runs off ONE corpus scan (r17; was two — a
    # vocab explode plus a mapped-transition count): raw (w1, w2)
    # bigram counts aggregate first and everything fit-side derives
    # from that bounded checkpoint. The w2 stream of the transitions IS
    # the token stream (w2 = every word of every doc exactly once, BOS
    # never lands in w2), so unigram counts — and the vocab — fall out
    # of the raw table with a cheap re-aggregate instead of their own
    # corpus pass; the unk-mapped bigram table is the vocab-join +
    # re-sum of the same checkpoint (Σ counts over a mapped preimage ==
    # count of the mapped stream). The eager checkpoints stay because
    # four fit aggregates consume `big` and two joins consume `vocab`
    # (r13: without them Catalyst inlines the fit into every consumer).
    raw = (
        transitions.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=True)
    )
    vocab = (
        raw.groupBy("w2")
        .agg(F.sum("c2").alias("c"))
        .orderBy(F.desc("c"), F.asc("w2"))
        .limit(max_vocab)
        .select(F.col("w2").alias("w"))
        .localCheckpoint(eager=True)
    )
    v1 = F.broadcast(
        vocab.select(F.col("w").alias("w1"), F.lit(1).alias("k1"))
    )
    v2 = F.broadcast(
        vocab.select(F.col("w").alias("w2"), F.lit(1).alias("k2"))
    )
    _map_w1 = (
        F.when(F.col("w1") == bos, F.lit(bos))
        .when(F.col("k1").isNotNull(), F.col("w1"))
        .otherwise(F.lit(unk))
        .alias("w1m")
    )
    _map_w2 = (
        F.when(F.col("k2").isNotNull(), F.col("w2"))
        .otherwise(F.lit(unk))
        .alias("w2m")
    )
    tr = (
        transitions.join(v1, "w1", "left")
        .join(v2, "w2", "left")
        .select(id_col, _map_w1, _map_w2)
    )
    big = (
        raw.join(v1, "w1", "left")
        .join(v2, "w2", "left")
        .select(_map_w1, _map_w2, "c2")
        .groupBy("w1m", "w2m")
        .agg(F.sum("c2").alias("c2"))
        .localCheckpoint(eager=True)
    )
    # The three fit aggregates below — count-of-counts scalars, the
    # per-context table and the per-continuation counts — are
    # independent reads of the SAME checkpointed bigram table: overlap
    # them in a small driver pool (guide §2.6) instead of three
    # sequential driver-blocking jobs. ctx/cont are each consumed twice
    # (prob-table build + the scoring backoff joins); both are
    # vocab-bounded, so the eager checkpoint costs ≤ V+1 rows and
    # removes a recompute-from-checkpointed-big exchange pair per
    # consumer (r13). cont checkpoints raw COUNTS so it needn't wait
    # for tt; the pcont division is applied lazily below with the same
    # operand types/order as before — bit-identical. On the tt == 0
    # early return the two table jobs are wasted-but-trivial (empty
    # checkpoint input).
    from concurrent.futures import ThreadPoolExecutor

    def _coc():
        return big.agg(
            F.sum(F.when(F.col("c2") == 1, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("c2") == 2, 1).otherwise(0)).alias("n2"),
            F.count(F.lit(1)).alias("tt"),
        ).first()

    def _ctx():
        return (
            big.groupBy("w1m")
            .agg(F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("nt"))
            .localCheckpoint(eager=True)
        )

    def _cont_counts():
        return (
            big.groupBy("w2m")
            .agg(F.count(F.lit(1)).cast("double").alias("__cnt"))
            .localCheckpoint(eager=True)
        )

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_coc = pool.submit(_coc)
        f_ctx = pool.submit(_ctx)
        f_cont = pool.submit(_cont_counts)
        coc, ctx, cont_counts = f_coc.result(), f_ctx.result(), f_cont.result()
    tt = int(coc["tt"])
    if tt == 0:
        # empty / all-empty-text corpus: no transitions exist, so no doc
        # can be scored — the typed empty frame, not an int(None) crash
        # (the r11 empty-shard / r12 empty-tuple ADVICE class)
        return docs.select(id_col).limit(0).select(
            id_col,
            F.lit(0).cast("long").alias("n_transitions"),
            F.lit(0.0).alias("avg_logprob"),
            F.lit(0.0).alias("ppl"),
        )
    n1, n2 = int(coc["n1"]), int(coc["n2"])
    d_disc = n1 / (n1 + 2.0 * n2) if (n1 + 2 * n2) > 0 else 0.5
    cont = cont_counts.select(
        "w2m", (F.col("__cnt") / F.lit(float(tt))).alias("pcont")
    )
    kept = big.orderBy(F.desc("c2"), "w1m", "w2m").limit(max_bigrams)
    # ctx/cont are vocab-bounded — broadcast them here too, or Catalyst
    # plans sort-merge joins (an exchange pair each) for the table build
    probs = (
        kept.join(F.broadcast(ctx), "w1m")
        .join(F.broadcast(cont), "w2m")
        .select(
            "w1m",
            "w2m",
            F.log(
                F.greatest(F.col("c2") - F.lit(float(d_disc)), F.lit(0.0))
                / F.col("c1")
                + (F.lit(float(d_disc)) * F.col("nt") / F.col("c1"))
                * F.col("pcont")
            ).alias("blogp"),
        )
    )
    backoff = F.log(
        F.coalesce(
            (F.lit(float(d_disc)) * F.col("nt") / F.col("c1")) * F.col("pcont"),
            F.col("pcont"),
        )
    )
    scored = (
        tr.join(F.broadcast(probs), ["w1m", "w2m"], "left")
        .join(F.broadcast(ctx), "w1m", "left")
        .join(F.broadcast(cont), "w2m", "left")
        .select(id_col, F.coalesce(F.col("blogp"), backoff).alias("lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        (F.round(F.avg("lp") * 10000) / 10000).alias("avg_logprob"),
        (F.round(F.exp(-F.avg("lp")) * 10000) / 10000).alias("ppl"),
    )


def blocklist_filter(
    docs: DataFrame,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style blocklist gate (Raffel et al. 2020 §2.2: pages
    containing any word from a caller-supplied blocklist are dropped
    wholesale — the other famous C4 cleaning step next to global line
    dedup). Matching is whole-token, case-insensitive (the published
    rule is word-level, so "class" never matches a blocked "ass").
    Emits every input doc with ``n_blocked_terms`` (total blocked-token
    occurrences) and ``blocked`` (the drop flag). The TERMS ARE THE
    CALLER'S: real deployments ship a vetted list; nothing is baked in.

    Scale shape: tokens explode and broadcast-hash-join the (tiny)
    blocklist table, then ONE id-keyed partial-agged count — shuffle
    rows ∝ blocked-token occurrences only (the join filters first), and
    the un-hit fast path is a map. A literal-array membership test per
    token would cost O(|list|) per token at the multi-thousand-term
    production list size; the broadcast join stays O(1) per token."""
    if not terms:
        return docs.select(
            id_col,
            F.lit(0).cast("long").alias("n_blocked_terms"),
            F.lit(False).alias("blocked"),
        )
    spark = docs.sparkSession
    bl = F.broadcast(
        spark.createDataFrame(
            [(t.lower(),) for t in sorted(set(terms))], "term string"
        )
    )
    toks = docs.select(
        id_col,
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")
    hits = toks.join(bl, "term").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_blocked_terms")
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce("n_blocked_terms", F.lit(0)).cast("long").alias(
            "n_blocked_terms"
        ),
        (F.coalesce("n_blocked_terms", F.lit(0)) > 0).alias("blocked"),
    )


def contamination_report(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    budget: int = 1,
) -> DataFrame:
    """EVAL-side contamination report — the reverse view of
    :func:`decontaminate_ngram`: per BENCHMARK item, how many training
    docs share ≥ ``budget`` distinct word ``n``-grams with it, the worst
    single-doc overlap, and the total shared-gram incidence. This is the
    table an eval-set maintainer reads (which benchmark items are so
    leaked their scores are meaningless) while the decontamination gate
    answers the trainer's question (which training docs to drop) —
    published eval-integrity audits (GPT-3 appendix C class) report
    exactly this per-benchmark view. Every eval doc appears (zeros when
    clean). Emits (``id_col``, n_leaking_train_docs, max_shared_grams,
    total_shared_grams).

    Scale: both gram sets are per-doc-distinct (word_shingles); the eval
    side is a benchmark suite — thousands of items — so its (eval_id,
    gram) pairs BROADCAST and the train corpus never shuffles until the
    (eval, train) pair counts; pair rows exist only for actual overlaps,
    so the aggregate is collision-sized, not |train|×|eval|."""
    from n2kupdate_spark.operators.dedup import word_shingles

    tg = word_shingles(train_docs.select(id_col, text_col), text_col, n=n).select(
        F.col(id_col).alias("__tid"), F.explode("shingles").alias("g")
    )
    eg = word_shingles(eval_docs.select(id_col, text_col), text_col, n=n).select(
        F.col(id_col).alias("__eid"), F.explode("shingles").alias("g")
    )
    pair = (
        tg.join(F.broadcast(eg), "g")
        .groupBy("__eid", "__tid")
        .agg(F.count(F.lit(1)).alias("__shared"))
        .filter(F.col("__shared") >= budget)
    )
    per_eval = pair.groupBy("__eid").agg(
        F.count(F.lit(1)).alias("n_leaking_train_docs"),
        F.max("__shared").alias("max_shared_grams"),
        F.sum("__shared").alias("total_shared_grams"),
    )
    return (
        eval_docs.select(F.col(id_col))
        .join(per_eval, F.col(id_col) == F.col("__eid"), "left")
        .select(
            id_col,
            F.coalesce("n_leaking_train_docs", F.lit(0)).cast("long").alias(
                "n_leaking_train_docs"
            ),
            F.coalesce("max_shared_grams", F.lit(0)).cast("long").alias(
                "max_shared_grams"
            ),
            F.coalesce("total_shared_grams", F.lit(0)).cast("long").alias(
                "total_shared_grams"
            ),
        )
    )


def fineweb_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    punct_min: float = 0.12,
    dup_max: float = 0.10,
    short_max: float = 0.67,
    short_chars: int = 30,
) -> DataFrame:
    """The three published FineWeb quality filters (Penedo et al. 2024,
    arXiv:2406.17557 §3.6 — the line-level rules selected by ablation on
    top of the Gopher/C4 batteries this library already ships, operating
    on the LINE structure those doc- and n-gram-level gates ignore):

    1. fraction of lines ending in terminal punctuation (``[.!?"]`` —
       the C4 end-of-sentence set) must EXCEED ``punct_min`` (a page
       whose lines rarely end in punctuation is nav/listing debris);
    2. fraction of characters in duplicated lines (occurrences after
       the first, chars counted over nonempty-line chars) must stay
       UNDER ``dup_max`` (within-doc boilerplate repetition);
    3. fraction of lines shorter than ``short_chars`` chars must stay
       UNDER ``short_max`` (link-list / bullet-farm pages).

    Lines are ``\\r?\\n``-split (CRLF text must not smuggle a ``\\r``
    past the terminal-punctuation anchor or into line lengths),
    edge-whitespace-stripped (regexp, not ``F.trim`` — trim removes
    0x20 only and would keep tabs), empties dropped. Docs with zero
    nonempty lines fail all three (every fraction reads 0 / vacuous —
    pinned). Emits every doc with the three fractions (4dp
    scale-first) + per-rule pass flags + the conjunction
    ``fineweb_pass``.

    Scale shape: one split+trim map feeds a posexplode, then TWO
    partial-agged shuffles — (doc, line) occurrence counts (shuffle
    bytes ∝ line bytes, the dedup_lines_global shape; a corpus-wide hot
    line is NOT hot here because the key includes the doc id), then the
    per-doc rollup where every signal folds into one aggregate pass
    (punct/short fractions weight each distinct line by its count — no
    second scan of the raw text). One id-keyed left join re-admits
    zero-line docs."""
    # The split/strip/posexplode line map fuses into the scan — one task
    # on a one-file table (r16, guide §2.6). Keyed fan_out = hash exchange.
    docs = fan_out(docs, id_col, fraction=0.5)
    lines = F.filter(
        F.transform(
            F.split(F.col(text_col), "\r?\n"),
            lambda x: F.regexp_replace(x, r"^\s+|\s+$", ""),
        ),
        lambda x: x != "",
    )
    exploded = docs.select(id_col, lines.alias("__lines")).select(
        id_col, F.explode("__lines").alias("__line")
    )
    per_line = exploded.groupBy(id_col, "__line").agg(
        F.count(F.lit(1)).alias("__c")
    )
    llen = F.length("__line")
    per_doc = per_line.groupBy(id_col).agg(
        F.sum("__c").alias("__n_lines"),
        F.sum(F.col("__c") * llen).alias("__chars"),
        F.sum((F.col("__c") - 1) * llen).alias("__dup_chars"),
        F.sum(
            F.when(F.col("__line").rlike('[.!?"]$'), F.col("__c")).otherwise(0)
        ).alias("__punct"),
        F.sum(
            F.when(llen < short_chars, F.col("__c")).otherwise(0)
        ).alias("__short"),
    )
    r4 = lambda c: F.round(c * 10000) / 10000  # noqa: E731
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("__n_lines", F.lit(0)).cast("long").alias("n_lines"),
            r4(F.coalesce(F.col("__punct") / F.col("__n_lines"), F.lit(0.0))).alias(
                "punct_line_frac"
            ),
            r4(
                F.coalesce(F.col("__dup_chars") / F.col("__chars"), F.lit(0.0))
            ).alias("dup_line_char_frac"),
            r4(F.coalesce(F.col("__short") / F.col("__n_lines"), F.lit(0.0))).alias(
                "short_line_frac"
            ),
        )
        .select(
            id_col,
            "n_lines",
            "punct_line_frac",
            "dup_line_char_frac",
            "short_line_frac",
            (F.col("n_lines") > 0)
            .alias("__nonempty"),
        )
        .select(
            id_col,
            "n_lines",
            "punct_line_frac",
            "dup_line_char_frac",
            "short_line_frac",
            (F.col("__nonempty") & (F.col("punct_line_frac") > punct_min)).alias(
                "punct_pass"
            ),
            (F.col("__nonempty") & (F.col("dup_line_char_frac") < dup_max)).alias(
                "dup_pass"
            ),
            (F.col("__nonempty") & (F.col("short_line_frac") < short_max)).alias(
                "short_pass"
            ),
        )
        .withColumn(
            "fineweb_pass",
            F.col("punct_pass") & F.col("dup_pass") & F.col("short_pass"),
        )
    )


def readability_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch readability metrics (Flesch 1948 / Kincaid et al. 1975 —
    the quality-scoring axis every curation stack reports next to the
    Gopher/FineWeb gates): per doc, word count, sentence count
    (runs of ``[.!?]``, floored at 1 so unpunctuated text scores as a
    single run-on sentence instead of dividing by zero), syllable count
    by the standard vowel-group heuristic (runs of ``[aeiouy]`` in the
    lowercased text, plus one per vowel-less word — every word carries
    at least one syllable), then

        flesch_ease = 206.835 − 1.015·(words/sentences)
                              − 84.6·(syllables/words)
        fk_grade    = 0.39·(words/sentences)
                      + 11.8·(syllables/words) − 15.59

    both 4dp, rounded as floor(x·1e4 + 0.5) — half-up via floor, NOT
    F.round: the words/sentences ratio is frequently an exact binary
    .5 multiple (any /2^k sentence count), and on exact halves
    numpy/python round half-to-EVEN while Spark rounds half-up off the
    shortest decimal repr — floor(+0.5) is bit-deterministic in every
    engine given the same double (negatives round toward +inf;
    documented convention). Zero-word docs emit NULL scores (nothing
    to read). Pure JVM map — two regexp_count passes + one token-array
    filter, no Python; fan_out widens the map off a one-file scan
    (r16, guide §2.6) and is the identity at production file counts."""
    docs = fan_out(docs, id_col, fraction=0.5)
    low = F.lower(F.col(text_col))
    # \s+ split, not single-space: a newline- or tab-separated word pair
    # must not merge into one pseudo-word (it would deflate n_words while
    # the whole-text syllable regexp still counts both words' vowels)
    words = F.filter(F.split(low, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    n_sent = F.greatest(F.lit(1), F.regexp_count(F.col(text_col), F.lit("[.!?]+")))
    n_syll = F.regexp_count(low, F.lit("[aeiouy]+")) + F.size(
        F.filter(words, lambda w: ~w.rlike("[aeiouy]"))
    )
    wps = n_words / n_sent
    spw = n_syll / n_words
    r4 = lambda c: F.floor(c * 10000 + 0.5) / 10000 + 0.0  # noqa: E731
    return docs.select(
        id_col,
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        F.when(n_words > 0, n_syll).cast("long").alias("n_syllables"),
        F.when(n_words > 0, r4(F.lit(206.835) - 1.015 * wps - 84.6 * spw)).alias(
            "flesch_ease"
        ),
        F.when(n_words > 0, r4(0.39 * wps + 11.8 * spw - F.lit(15.59))).alias(
            "fk_grade"
        ),
    )


def script_mix(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unicode-script composition per document — the pre-langid
    language-mix signal (a "mixed Latin/Cyrillic" page is the classic
    spam/keyword-stuffing shape, and CJK mass in a nominally-English
    crawl slice is a routing bug): per doc, the count of letter
    characters (``\\p{L}``) and the fraction of them in each of the
    four highest-volume script families — Latin, Cyrillic, Han,
    Arabic — plus the remainder bucket ``other`` (Greek, Hangul,
    Devanagari, … — split those out when a corpus needs them), and the
    DOMINANT script (max letter count, ties broken by the fixed column
    order latin → cyrillic → han → arabic → other so the result is
    deterministic). Zero-letter docs emit NULL fractions and NULL
    dominant (nothing to classify).

    Fractions are 4dp floor-half-up (``floor(x·1e4 + 0.5)``, the
    readability_scores convention — letter counts are frequently /2^k
    on fixtures, the exact-half class where HALF_UP engines disagree
    with half-even ones).

    Scale: a pure JVM map — five ``regexp_count`` passes over the text
    column, no shuffle, no Python; rows inherit the scan's
    partitioning. At 100 TB this is scan-bound, exactly like the other
    per-doc scorers it feeds dashboards with."""
    n_letters = F.regexp_count(F.col(text_col), F.lit(r"\p{L}"))
    # each script class INTERSECTED with \p{L} (Java char-class &&):
    # scripts contain non-letters — Arabic-Indic DIGITS are script=
    # Arabic but category Nd — and counting them against a letter
    # denominator would push fractions past 1.0 and other_frac negative
    # (review r14: planted "abc٠١٢٣" pin)
    counts = {
        "latin": F.regexp_count(F.col(text_col), F.lit(r"[\p{IsLatin}&&\p{L}]")),
        "cyrillic": F.regexp_count(
            F.col(text_col), F.lit(r"[\p{IsCyrillic}&&\p{L}]")
        ),
        "han": F.regexp_count(F.col(text_col), F.lit(r"[\p{IsHan}&&\p{L}]")),
        "arabic": F.regexp_count(F.col(text_col), F.lit(r"[\p{IsArabic}&&\p{L}]")),
    }
    named = docs.select(
        id_col,
        n_letters.alias("__nl"),
        *[c.alias(f"__c_{k}") for k, c in counts.items()],
    ).select(
        id_col,
        "__nl",
        *[F.col(f"__c_{k}") for k in counts],
        (
            F.col("__nl")
            - F.col("__c_latin")
            - F.col("__c_cyrillic")
            - F.col("__c_han")
            - F.col("__c_arabic")
        ).alias("__c_other"),
    )
    order = ["latin", "cyrillic", "han", "arabic", "other"]
    max_c = F.greatest(*[F.col(f"__c_{k}") for k in order])
    dominant = F.lit(None).cast("string")
    for k in reversed(order):
        dominant = F.when(F.col(f"__c_{k}") == max_c, F.lit(k)).otherwise(dominant)
    r4 = lambda c: F.floor(c * 10000.0 + 0.5) / 10000 + 0.0  # noqa: E731
    nz = F.col("__nl") > 0
    return named.select(
        id_col,
        F.col("__nl").cast("long").alias("n_letters"),
        *[
            F.when(nz, r4(F.col(f"__c_{k}") / F.col("__nl"))).alias(f"{k}_frac")
            for k in order
        ],
        F.when(nz, dominant).alias("dominant_script"),
    )


def compression_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compressibility — the cheap information-
    density gate crawl-cleaning stacks run next to the repetition
    metrics (RefinedWeb/MassiveText report it as a boilerplate /
    gibberish axis): ``compress_ratio = deflate_bytes / utf8_bytes``.
    Templated or repeated text compresses far below natural prose
    (ratio ≪ 0.5 on repeats), while random character soup refuses to
    compress (ratio → 1+, deflate framing can exceed the input);
    natural language sits in a stable band between them, so BOTH tails
    are anomalies. Emits (id, n_bytes, n_compressed, compress_ratio
    4dp floor-half-up); empty docs emit (0, NULL, NULL).

    Determinism note: deflate output length is a property of the zlib
    build + fixed ``level`` — stable within an environment (the test
    recompute uses the same library), not a cross-engine contract; the
    DOWNSTREAM band thresholds are what a pipeline pins.

    Scale: Python is unavoidable (deflate), so this is the Arrow path —
    one ``mapInPandas`` pass, zero shuffle, no per-row Python overhead
    beyond the C-implemented ``zlib.compress`` call itself; rows
    inherit the scan's partitioning, so at 100 TB it is scan-bound
    exactly like the JVM per-doc scorers."""
    import math
    import zlib

    schema = (
        f"{id_col} {docs.schema[id_col].dataType.simpleString()}, "
        "n_bytes long, n_compressed long, compress_ratio double"
    )

    def _batches(it):
        import pandas as pd

        for pdf in it:
            ids, nb, nc, rat = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                raw = (t or "").encode("utf-8")
                ids.append(i)
                nb.append(len(raw))
                if raw:
                    c = len(zlib.compress(raw, level))
                    nc.append(c)
                    rat.append(math.floor(c * 10000.0 / len(raw) + 0.5) / 10000)
                else:
                    nc.append(None)
                    rat.append(None)
            yield pd.DataFrame(
                {id_col: ids, "n_bytes": nb, "n_compressed": nc,
                 "compress_ratio": rat}
            )

    return docs.select(id_col, text_col).mapInPandas(_batches, schema=schema)
