"""Data-ops diagnostics — the profiling a 100 TB pipeline runs BEFORE
committing to a shuffle strategy or a load.

Two standard tools, both SQL-oracle-checked like any other operator:

- ``diag_key_skew``: key-distribution profile of a prospective join/agg
  key. The skew ratio (key count × number of keys / total rows, i.e.
  how many times hotter than the mean a key runs) is the number that
  decides between a plain hash join, AQE skew splitting, and explicit
  salting (operators/joins join_skew_salted, dedup CC salting) — at
  100 TB a single 100× key makes one reduce task the whole job's
  critical path, and this profile is how it is found BEFORE the 6-hour
  run, not after.
- ``diag_column_profile``: per-column null / distinct profile of a table
  in ONE pass (null rate gates validate_domain-style cleaning; distinct
  count sizes dimension broadcasts and dictionary encodings).

Scale notes: key counts are one partial-aggregated shuffle; the corpus
totals the skew ratio needs are inlined as literals (driver-side scalars,
MLlib-IDF style — a 1-row-aggregate join would plan a
BroadcastNestedLoopJoin, which the fleet plan audit rejects). The column
profile is a single multi-countDistinct aggregate unpivoted via ``stack``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from n2kupdate_spark.operators.parallel import local_frame as _local_frame

from n2kupdate_spark.queries._registry import register
from n2kupdate_spark.sources import load


@register(
    "diag_key_skew",
    oracle="""
    WITH c AS (
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ),
    s AS (SELECT COUNT(*) AS n_keys, SUM(cnt) AS total FROM c)
    SELECT user_id, cnt,
           ROUND(cnt * 10000.0 / total) / 10000 AS share,
           ROUND(cnt * n_keys * 10000.0 / total) / 10000 AS skew_ratio
    FROM c, s
    ORDER BY cnt DESC, user_id
    LIMIT 10
    """,
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heaviest events.user_id keys with share-of-total and
    skew ratio (count ÷ mean count). Both derived scalars are computed as
    one driver-side aggregate and inlined as literals; rounding is
    scale-first (ROUND(x·1e4)/1e4) so Spark and DuckDB round the same
    binary double (SURVEY.md §7.4.3)."""
    counts = (
        load(spark, sf_dir, "events", columns=["user_id"])
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("cnt").alias("total")
    ).first()
    n_keys, total = float(stats["n_keys"]), float(stats["total"])
    return (
        counts.select(
            "user_id",
            "cnt",
            (F.round(F.col("cnt") * 10000.0 / F.lit(total)) / 10000).alias("share"),
            (
                F.round(F.col("cnt") * F.lit(n_keys) * 10000.0 / F.lit(total)) / 10000
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("cnt"), "user_id")
        .limit(10)
    )


#: Columns profiled by diag_column_profile — shared by the Spark plan and
#: the oracle generator below so the two sides cannot drift.
_PROFILE_COLS = ("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")

_COLUMN_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, COUNT({c}) AS n_non_null,
        COUNT(*) - COUNT({c}) AS n_null,
        COUNT(DISTINCT {c}) AS n_distinct FROM orders"""
    for c in _PROFILE_COLS
)


@register("diag_column_profile", oracle=_COLUMN_PROFILE_ORACLE)
def diag_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null / distinct profile of the orders table's non-key columns in a
    single aggregate pass (one job, one shuffle), unpivoted to one row per
    column via ``stack``."""
    orders = load(spark, sf_dir, "orders", columns=list(_PROFILE_COLS))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    wide = orders.agg(*aggs)
    stack_args = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS)
    return wide.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (col_name, n_non_null, n_distinct)",
    ).select(
        "col_name",
        "n_non_null",
        (F.col("n_rows") - F.col("n_non_null")).alias("n_null"),
        "n_distinct",
    )


@register("diag_embedding_drift")  # rows-only (r9 capacity policy): the
# codebook geometry is engine-specific; profile pinned vs numpy in
# tests/test_ann_recall.py
def diag_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell embedding-drift profile (operators/similarity.py::
    embedding_drift): base corpus (vec_id % 5 != 0) vs incoming batch
    (vec_id % 5 == 0) assigned into the SAME base-fit codebook — the
    refit signal for the fixed-codebook consumers (semantic resume,
    IVF, PQ). Two map-only assignment scans + n_cells-bounded
    aggregates; profiling cost is two scans at any corpus size."""
    from n2kupdate_spark.operators.similarity import embedding_drift

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return embedding_drift(
        e.filter(F.col("vec_id") % 5 != 0),
        e.filter(F.col("vec_id") % 5 == 0),
        n_cells=16,
    )


@register("diag_vocab_drift")  # rows-only (r9 capacity policy): both
# merge tables are pinned against the reference learner and the diff is
# pinned by an independent dict recompute — tests/test_tokenizer.py
def diag_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary drift between the established corpus
    (doc_id below the midpoint — the shipped tokenizer's training slice)
    and the full corpus including the newer half: which subword merges a
    refit would add, drop, or re-rank. The operational question it
    answers: is the shipped vocabulary still the one this corpus would
    learn, or is fertility about to regress on the new data? Two
    bounded type-table fits + a driver-side diff of two ≤num_merges
    tables; corpus cost is two count shuffles regardless of scale."""
    from n2kupdate_spark.operators.tokenizer import (
        learn_bpe_merges,
        vocab_drift,
    )

    d = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    mid = d.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    old = learn_bpe_merges(d.filter(F.col("doc_id") < mid), num_merges=150)
    new = learn_bpe_merges(d, num_merges=150)
    return _local_frame(spark,
        vocab_drift(old, new),
        schema="merged string, rank_old int, rank_new int, status string",
    )


@register("diag_tokenizer_bakeoff")  # rows-only (r9 capacity policy):
# each family's learner/encoder is independently reference-pinned in
# tests/test_tokenizer.py; the bake-off totals are pinned against the
# three per-doc tokenize queries in tests/test_mlprep_props.py
def diag_tokenizer_bakeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-family tokenizer bake-off on the SAME corpus — the
    comparison table a training stack builds before committing to a
    vocabulary: per family (bpe / unigram / wordpiece), the vocabulary
    size actually learned, total tokens emitted over the corpus, and
    corpus-level fertility (total chars / total tokens; higher = fewer
    tokens per character = cheaper training). BPE and WordPiece get the
    same merge budget; unigram's vocab budget is its registered demo
    size — the table states each family's size so the comparison is
    honest about unequal budgets.

    Scale: three bounded type-table fits (driver-side, corpus-size-
    independent) + three broadcast-table map encodes, then a 3-row
    aggregate — the per-doc encodes never shuffle."""
    from n2kupdate_spark.operators.tokenizer import (
        EOW,
        bpe_encode,
        learn_bpe_merges,
        learn_unigram_vocab,
        learn_wordpiece_vocab,
        unigram_encode,
        wordpiece_encode,
    )
    # budgets shared with the per-doc tokenize queries by IMPORT, not by
    # copied literals (r12 review) — the consistency pin in
    # tests/test_mlprep_props.py depends on them staying in lockstep
    from n2kupdate_spark.queries.text import _BPE_MERGES, _UG_VOCAB

    d = load(spark, sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    merges = learn_bpe_merges(d, num_merges=_BPE_MERGES)
    ug = learn_unigram_vocab(d, vocab_size=_UG_VOCAB)
    wp = learn_wordpiece_vocab(d, num_merges=_BPE_MERGES)
    # base chars aggregated ENGINE-side: per-row array_distinct bounds
    # the explode at alphabet size per doc, the distinct partial-aggs,
    # and the collect is alphabet-sized — distinct WORD types are
    # unbounded at corpus scale, so collecting them (pre-r13 shape)
    # violated the bounded-driver-traffic contract (r12 ADVICE).
    # Space is the word delimiter in every learner, so stripping it
    # first yields exactly the union of word characters. Distinct merge
    # products can collide on the joined string, so vocab sizes count
    # the SET of symbols, not the merge-list length.
    base_chars = {
        r["ch"]
        for r in d.select(
            F.explode(
                F.array_distinct(F.split(F.regexp_replace("text", " ", ""), ""))
            ).alias("ch")
        )
        .filter(F.col("ch") != "")
        .distinct()
        .collect()
    }
    sizes = {
        "bpe": len(base_chars | {EOW} | {a + b for a, b in merges}),
        "unigram": len(ug),
        "wordpiece": len(set(wp)),
    }
    encs = {
        "bpe": bpe_encode(d, merges, carry_cols=("n_chars",)).select(
            F.col("n_bpe_tokens").alias("n_tokens"), "n_chars"
        ),
        "unigram": unigram_encode(d, ug, carry_cols=("n_chars",)).select(
            F.col("n_ug_tokens").alias("n_tokens"), "n_chars"
        ),
        "wordpiece": wordpiece_encode(d, wp, carry_cols=("n_chars",)).select(
            F.col("n_wp_tokens").alias("n_tokens"), "n_chars"
        ),
    }
    rows = []
    for fam in ("bpe", "unigram", "wordpiece"):
        agg = encs[fam].agg(
            F.sum("n_tokens").cast("long").alias("t"),
            F.sum("n_chars").cast("long").alias("c"),
        ).first()
        if agg["t"] is None or int(agg["t"]) == 0:
            # empty / all-whitespace corpus: degrade to a typed empty
            # frame like the sibling queries (r12 review) instead of a
            # TypeError on int(None)
            continue
        rows.append(
            (
                fam,
                sizes[fam],
                int(agg["t"]),
                round(int(agg["c"]) / int(agg["t"]) * 10000) / 10000,
            )
        )
    return _local_frame(spark,
        rows,
        schema="family string, vocab_size int, total_tokens long, "
        "chars_per_token double",
    )


@register("diag_gate_sweep")  # rows-only (r9 capacity policy, headroom
# preserved): the whole sweep table ≡ a python recompute from the two
# already-pinned scorers in tests/test_mlprep_props.py
def diag_gate_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-threshold tuning table (r13) — the grid a curation team
    actually builds before committing filter settings: for every
    (min_words × KN-perplexity-percentile-cutoff) combination, how many
    documents survive and what fraction of the corpus that is. Word
    bounds come from the Gopher metrics, fluency cutoffs from the
    corpus-KN perplexity at its own exact p50/p75/p90 (quantile-relative
    cutoffs transfer across corpora where absolute ppl does not). Emits
    (min_words, ppl_pct, ppl_cutoff, n_survivors, survivor_frac 4dp) —
    9 rows.

    Scale: both scorers' bounded shuffles + ONE 3-double percentile
    collect (inlined as literals — the IDF/BNLJ rule) + one
    explode-a-9-struct-literal map and a 9-group aggregate: sweeping
    thresholds costs one extra pass over the per-doc metric rows, never
    one pass per grid cell."""
    from n2kupdate_spark.operators.corpus import gopher_metrics, kn_perplexity

    d = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    scored = (
        gopher_metrics(d)
        .select("doc_id", "n_words")
        .join(kn_perplexity(d).select("doc_id", "ppl"), "doc_id")
        .localCheckpoint(eager=True)  # consumed by the percentile agg AND the sweep
    )
    cuts = scored.agg(
        *[
            F.expr(f"percentile(ppl, {p})").alias(f"p{int(p * 100)}")
            for p in (0.5, 0.75, 0.9)
        ]
    ).first()
    n_docs = scored.count()
    if n_docs == 0:
        # no scoreable docs → no percentiles to sweep: the typed empty
        # table, not a float(None) crash (the empty-input ADVICE class)
        return scored.limit(0).select(
            F.lit(0).alias("min_words"),
            F.lit("").alias("ppl_pct"),
            F.lit(0.0).alias("ppl_cutoff"),
            F.lit(0).cast("long").alias("n_survivors"),
            F.lit(0.0).alias("survivor_frac"),
        )
    grid = F.array(
        *[
            F.struct(
                F.lit(mw).alias("min_words"),
                F.lit(f"p{pct}").alias("ppl_pct"),
                F.lit(
                    round(float(cuts[f"p{pct}"]) * 10000) / 10000
                ).alias("ppl_cutoff"),
            )
            for mw in (30, 50, 70)
            for pct in (50, 75, 90)
        ]
    )
    return (
        scored.select(F.explode(grid).alias("g"), "n_words", "ppl")
        .groupBy("g.min_words", "g.ppl_pct", "g.ppl_cutoff")
        .agg(
            F.sum(
                F.when(
                    (F.col("n_words") >= F.col("g.min_words"))
                    & (F.col("ppl") <= F.col("g.ppl_cutoff")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_survivors")
        )
        .select(
            "min_words",
            "ppl_pct",
            "ppl_cutoff",
            "n_survivors",
            (F.round(F.col("n_survivors") / F.lit(float(n_docs)) * 10000) / 10000).alias(
                "survivor_frac"
            ),
        )
    )


@register("diag_dedup_overlap")  # rows-only (r9 capacity policy): the
# ≤7-row Venn table ≡ a python set recompute from the three registered
# (independently pinned) dedup outputs — tests/test_mlprep_props.py
def diag_dedup_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-strategy Venn — the table a curation team reads before
    deciding which dedup passes to stack: for every non-empty
    combination of the three registered axes (EXACT fingerprint
    keep-lowest, NEAR word-3-gram-Jaccard connected components
    keep-lowest, SEMANTIC embedding-cosine keep-lowest), how many docs
    that exact combination — and only it — would drop. Exact ⊂ near is
    the expected containment (identical text is Jaccard 1.0);
    semantic-only counts are the docs ONLY embedding similarity
    catches — the marginal value of the expensive pass. Emits
    (methods '+-joined', exact/near/semantic flags, n_docs) per
    non-empty Venn cell.

    Scale: each drop set is the bounded output of its already-audited
    pipeline (PLANS.md); the Venn itself is one union + one id-keyed
    flag aggregate + a ≤7-group count — costs are the three upstream
    dedups, the overlay adds two small shuffles."""
    from concurrent.futures import ThreadPoolExecutor

    from n2kupdate_spark.queries.ann import dedup_semantic_clusters
    from n2kupdate_spark.queries.dedupq import dedup_cc_clusters
    from n2kupdate_spark.queries.text import dedup_text_exact
    from pyspark.sql import Window

    # The three drop-set pipelines are INDEPENDENT, but each runs eager
    # driver-orchestrated work while it builds (the CC probe/collect, the
    # semantic centroid + pair fits) — built sequentially, their driver
    # phases serialize on an idle cluster (guide §2.6 "overlap
    # independent jobs"). Build each branch in its own driver thread and
    # materialize its (tiny, ≤#docs-row) drop set with an eager
    # localCheckpoint; the Venn overlay then composes the materialized
    # frames. Same rows per branch (A/B hash-pinned) — only the job
    # SCHEDULE changes: branch walls overlap instead of adding.
    def _exact():
        fp = dedup_text_exact(spark, sf_dir)
        w = Window.partitionBy("fp")
        return (
            fp.withColumn("__keep", F.min("doc_id").over(w))
            .filter(F.col("doc_id") != F.col("__keep"))
            .select("doc_id", F.lit("exact").alias("m"))
            .localCheckpoint(eager=True)
        )

    def _near():
        return (
            dedup_cc_clusters(spark, sf_dir)
            .filter(F.col("doc_id") != F.col("cluster_id"))
            .select("doc_id", F.lit("near").alias("m"))
            .localCheckpoint(eager=True)
        )

    def _sem():
        return (
            dedup_semantic_clusters(spark, sf_dir)
            .select(F.col("drop_id").alias("doc_id"), F.lit("semantic").alias("m"))
            .localCheckpoint(eager=True)
        )

    with ThreadPoolExecutor(max_workers=3) as pool:
        exact_drops, near_drops, sem_drops = pool.map(
            lambda f: f(), (_exact, _near, _sem)
        )
    tagged = exact_drops.unionByName(near_drops).unionByName(sem_drops)
    flags = tagged.groupBy("doc_id").agg(
        F.max(F.col("m") == "exact").alias("exact"),
        F.max(F.col("m") == "near").alias("near"),
        F.max(F.col("m") == "semantic").alias("semantic"),
    )
    return (
        flags.groupBy("exact", "near", "semantic")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.concat_ws(
                "+",
                F.when(F.col("exact"), F.lit("exact")),
                F.when(F.col("near"), F.lit("near")),
                F.when(F.col("semantic"), F.lit("semantic")),
            ).alias("methods"),
            "exact",
            "near",
            "semantic",
            "n_docs",
        )
    )


@register("diag_langid_confusion")  # rows-only (r9 capacity policy):
# table ≡ a python recompute from the pinned classifier output —
# tests/test_mlprep_props.py
def diag_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation harness — the confusion matrix + per-class
    precision/recall a curation team reads before trusting a lang
    filter: over the HELD-OUT slice of the trained classifier
    (text_langid_hashgram's doc_id-hash 20%), one row per (lang,
    pred_lang) cell with count, the true-class recall contribution and
    the predicted-class precision contribution (4dp scale-first).
    Off-diagonal mass IS the filter's collateral damage: a lang gate at
    this accuracy drops exactly the recall-miss fraction of every
    class it keeps.

    Scale: the classifier's bounded fit + map scoring (already audited)
    feeds ONE #langs²-bounded partial-agged count; the marginals ride
    two windows OVER the counts table (≤ #langs² rows — tiny at any
    corpus size)."""
    from pyspark.sql import Window

    from n2kupdate_spark.queries.text import text_langid_hashgram

    scored = text_langid_hashgram(spark, sf_dir).filter(F.col("holdout"))
    cells = scored.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("lang")
    wp = Window.partitionBy("pred_lang")
    return cells.select(
        "lang",
        "pred_lang",
        "n",
        # floor-half-up, not F.round: n/marginal with small-integer
        # marginals lands on exact halves (the SKILL.md /2^k class) where
        # Spark HALF_UP and python half-even split
        (F.floor(F.col("n") * 10000.0 / F.sum("n").over(wt) + 0.5) / 10000).alias(
            "recall_frac"
        ),
        (F.floor(F.col("n") * 10000.0 / F.sum("n").over(wp) + 0.5) / 10000).alias(
            "precision_frac"
        ),
    )


@register("text_zipf_fit")  # rows-only (r9 capacity policy): ≡ numpy
# least-squares recompute + planted perfect-Zipf exponent pins —
# tests/test_mlprep_props.py
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus unigram distribution (Zipf 1949;
    the log-log regression every corpus-linguistics intro runs) — the
    vocabulary-shape diagnostic next to diag_vocab_drift: least-squares
    slope of log(freq) on log(rank) over the top-200 word types, so
    zipf_exponent ≈ 1 is natural-language-shaped, a flattened head is
    boilerplate/dedup-failure mass, a cliff is template vocabulary.
    Emits ONE row: total word types, fitted types, exponent (−slope),
    intercept, R² (all 4dp scale-first).

    Scale: one explode + ONE vocab-bounded partial-agged count shuffle;
    the fit itself reads only the TakeOrderedAndProject top-200 (count
    desc, word asc — total order), ranks them with a 200-row window and
    folds the five regression sums in one aggregate. The type-count
    scalar is collected and inlined as a literal (the IDF/BNLJ rule)."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents", columns=["text"])
    words = d.select(
        F.explode(F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")).alias(
            "w"
        )
    )
    # Checkpoint the vocab aggregate BEFORE taking .count(): without it
    # the top-200 branch re-inlines the whole explode+shuffle and the
    # heaviest stage runs twice (the kn_perplexity re-inline class).
    counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("c")).localCheckpoint()
    n_types = counts.count()  # vocab-bounded scalar, inlined below
    k = 200
    top = counts.orderBy(F.col("c").desc(), F.col("w").asc()).limit(k)
    ranked = top.select(
        F.log(
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), F.col("w").asc()))
            .cast("double")
        ).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r_num = n * sxy - sx * sy
    r2 = (r_num * r_num) / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    r4 = lambda c: F.round(c * 10000) / 10000 + 0.0  # noqa: E731
    return sums.select(
        F.lit(int(n_types)).alias("n_types"),
        n.cast("long").alias("n_fit"),
        r4(-slope).alias("zipf_exponent"),
        r4(intercept).alias("intercept"),
        r4(r2).alias("r2"),
    )


@register("corpus_quality_report")  # rows-only (r9 capacity policy):
# rollup ≡ python recompute from the four pinned scorer outputs —
# tests/test_mlprep_props.py
def corpus_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality dashboard — the one table a curation review
    actually opens: for every source, doc count plus the four
    already-registered quality axes rolled up side by side — Gopher
    pass rate, FineWeb pass rate, mean Flesch reading ease, mean
    Kneser–Ney perplexity (all 4dp scale-first). Each feed is the
    registered scorer's own output on its own pinned fixture (the
    dashboard aggregates what its feeds emit; each feed is
    independently pinned), joined back on doc_id.

    Scale: four id-keyed joins of per-doc scorer outputs (each scorer's
    plan already audited in PLANS.md) + ONE #sources-row partial-agged
    rollup — the overlay itself never shuffles more than the per-doc
    metric rows. The four scorers consume ONE shared fanned-out text
    frame (operators/parallel.py): calling the registered query fns
    here would give each branch its own repartition subtree (the
    decorated branches canonicalize differently, so Catalyst cannot
    reuse the exchanges) — measured +1.5 s at sf0.1 (r16). The per-doc
    decorations are applied AFTER the shared exchange, so each scorer
    sees byte-identical input to its registered twin."""
    from n2kupdate_spark.operators.corpus import (
        fineweb_quality,
        gopher_metrics,
        kn_perplexity,
        readability_scores,
    )
    from n2kupdate_spark.operators.parallel import fan_out
    from n2kupdate_spark.queries.text import _fineweb_lines, _readability_text

    base = load(spark, sf_dir, "documents", columns=["doc_id", "source"])
    d = fan_out(
        load(spark, sf_dir, "documents", columns=["doc_id", "text"]),
        "doc_id",
        fraction=0.5,
    )
    gop = gopher_metrics(d).select("doc_id", "gopher_pass")
    fw = fineweb_quality(
        d.select("doc_id", _fineweb_lines().alias("text"))
    ).select("doc_id", "fineweb_pass")
    rd = readability_scores(
        d.select("doc_id", _readability_text().alias("text"))
    ).select("doc_id", "flesch_ease")
    kn = kn_perplexity(d).select("doc_id", "ppl")
    joined = (
        base.join(gop, "doc_id", "left")
        .join(fw, "doc_id", "left")
        .join(rd, "doc_id", "left")
        .join(kn, "doc_id", "left")
    )
    r4 = lambda c: F.round(c * 10000) / 10000 + 0.0  # noqa: E731
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        r4(F.avg(F.col("gopher_pass").cast("double"))).alias("gopher_pass_frac"),
        r4(F.avg(F.col("fineweb_pass").cast("double"))).alias("fineweb_pass_frac"),
        r4(F.avg("flesch_ease")).alias("mean_flesch_ease"),
        r4(F.avg("ppl")).alias("mean_kn_ppl"),
    )


@register("diag_ks_drift")  # rows-only (r9 capacity policy): ≡ python
# same-grid recompute + planted shifted-distribution pins —
# tests/test_mlprep_props.py
def diag_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor — a GRID-RESTRICTED two-sample
    Kolmogorov–Smirnov statistic per event type: D̂ = max over a fixed
    199-point EQUAL-WIDTH grid spanning [min, max] of
    |CDF_type − CDF_rest|, flagged against the classical α = 0.05
    critical value 1.358·√((n₁+n₂)/(n₁·n₂)) (Smirnov 1948). Grid
    restriction is the deliberate scale trade: the EXACT statistic
    needs a global sort of the value column, and even an exact-
    percentile grid materializes per-distinct-value maps in the
    aggregation buffer — unboundable on a continuous column at 100 TB
    (measured: the percentile-grid variant of this op cost 7.4 s at
    sf0.1, ~5× this one). An equal-width grid needs only the min/max
    partial agg, evaluates both CDFs in ONE pass, and still
    LOWER-BOUNDS the exact D — a grid flag is always real drift; the
    trade is sensitivity to features narrower than a grid cell
    (heavy-tailed columns concentrate in few cells — pre-transform
    such columns). Emits per type: n, n_rest, ks_stat, critical value,
    drifted. Vs-REST semantics, with the property that implies: one
    large drifting segment contaminates every other type's complement,
    so several simultaneous flags mean "the mixture changed", not
    "every type changed" (pinned in the planted test).

    Scale: one min/max aggregate (2 doubles collected, inlined as
    literals — the IDF/BNLJ rule), then ONE (type, bucket) partial-agged
    count shuffle (#types × 200 cells — a monotone bucket transform, so
    the bucketed KS is still ≤ the exact KS); CDFs, maxima and flags are
    window/agg algebra over that tiny table. A 199-conditional-sums
    formulation was measured FIRST and rejected: the generated aggregate
    code dominated wall (7–9 s at sf0.1 vs ~1 s for this plan)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events", columns=["event_type", "value"]).filter(
        F.col("value").isNotNull()  # greatest(0, NULL) would otherwise
        # silently count NULLs as bucket-0 mass (greatest/least skip nulls)
    )
    vlo, vhi, gn = ev.agg(
        F.min("value"), F.max("value"), F.count(F.lit(1))
    ).collect()[0]
    vlo, vhi, gn = float(vlo), float(vhi), int(gn)
    width = (vhi - vlo) or 1.0
    bucket = F.least(
        F.lit(199),
        F.greatest(
            F.lit(0), F.floor((F.col("value") - F.lit(vlo)) * 200.0 / F.lit(width))
        ),
    ).cast("int")
    cells = ev.groupBy("event_type", bucket.alias("b")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # densify to EVERY (type, bucket) cell — the max CDF gap can sit at a
    # bucket where this type has no rows (its CDF is flat there while the
    # rest's keeps climbing); the dense grid is #types × 200, trivially
    # tiny, built by exploding the bucket range off the type list (the
    # zero-join spine pattern)
    dense = (
        cells.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(199))).alias("b"),
        )
        .join(cells, ["event_type", "b"], "left")
        .select("event_type", "b", F.coalesce("c", F.lit(0)).alias("c"))
    )
    wcum = Window.partitionBy("event_type").orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    gcum = (
        cells.groupBy("b")
        .agg(F.sum("c").alias("gc"))
        .select(
            "b",
            F.sum("gc")
            .over(Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum_g"),
        )
    )
    staged = dense.join(gcum, "b").select(
        "event_type",
        F.col("cum_g"),
        F.sum("c").over(wcum).alias("cum_t"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    n_rest = F.lit(gn) - F.col("n")
    diff = F.abs(
        F.col("cum_t") / F.col("n") - (F.col("cum_g") - F.col("cum_t")) / n_rest
    )
    per_type = staged.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max(diff).alias("d"),
    )
    n_rest2 = F.lit(gn) - F.col("n")
    crit = 1.358 * F.sqrt((F.col("n") + n_rest2) / (F.col("n") * n_rest2))
    r4 = lambda c: F.round(c * 10000) / 10000 + 0.0  # noqa: E731
    return per_type.select(
        "event_type",
        "n",
        n_rest2.cast("long").alias("n_rest"),
        r4(F.col("d")).alias("ks_stat"),
        r4(crit).alias("ks_crit"),
        (F.col("d") > crit).alias("drifted"),
    )


@register("diag_psi_drift")  # rows-only (r9 capacity policy): ≡ python
# same-grid recompute + planted shifted-distribution pins —
# tests/test_mlprep_props.py
def diag_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type — the credit-scoring /
    model-monitoring drift number every production scorecard reports
    next to a KS test (and the one with an industry-standard action
    rule): PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) between each type's
    value distribution (actual) and the REST of the corpus (expected),
    over 10 EQUAL-WIDTH bins spanning the global [min, max]. Shares are
    clamped at ε = 1e-4 before the log (the standard zero-bin
    protection — an empty bin must contribute finite mass, not ±inf).
    Bands per the published rule of thumb: < 0.1 stable, 0.1–0.25
    moderate shift, > 0.25 shifted. Emits per type: n, n_rest, psi
    (4dp), psi_band.

    Equal-width bins are the same deliberate scale trade diag_ks_drift
    documents: decile bins of the reference need an exact global sort
    (unboundable on a continuous column at 100 TB), while equal-width
    needs only the min/max partial agg and one pass — and PSI's banding
    convention tolerates any fixed binning as long as expected and
    actual share the grid (they do, by construction).

    Scale: one min/max+count aggregate (3 scalars collected, inlined
    as literals — the IDF/BNLJ rule), ONE (type, bin) partial-agged
    count shuffle (#types × 10 cells), a 10-bin dense spine exploded
    off the type list (zero joins), and the PSI fold is agg algebra on
    that tiny table. No collects on the data path."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events", columns=["event_type", "value"]).filter(
        F.col("value").isNotNull()
    )
    vlo, vhi, gn = ev.agg(
        F.min("value"), F.max("value"), F.count(F.lit(1))
    ).collect()[0]
    vlo, vhi, gn = float(vlo), float(vhi), int(gn)
    width = (vhi - vlo) or 1.0
    nbins = 10
    bucket = F.least(
        F.lit(nbins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col("value") - F.lit(vlo)) * float(nbins) / F.lit(width)),
        ),
    ).cast("int")
    cells = ev.groupBy("event_type", bucket.alias("b")).agg(
        F.count(F.lit(1)).alias("c")
    )
    gtot = cells.groupBy("b").agg(F.sum("c").alias("gc"))
    dense = (
        cells.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(nbins - 1))).alias("b"),
        )
        .join(cells, ["event_type", "b"], "left")
        .select("event_type", "b", F.coalesce("c", F.lit(0)).alias("c"))
        .join(gtot, "b")
    )
    n_t = F.sum("c").over(Window.partitionBy("event_type"))
    staged = dense.select(
        "event_type",
        F.col("c"),
        (F.col("gc") - F.col("c")).alias("rc"),
        n_t.alias("n"),
    )
    eps = 1e-4
    p = F.greatest(F.lit(eps), F.col("c") / F.col("n"))
    # single-event-type corpora make the rest-cohort empty (n == gn);
    # try_divide reads NULL there instead of an ANSI DIVIDE_BY_ZERO,
    # and the eps clamp then floors it like any other empty cell
    q = F.greatest(
        F.lit(eps), F.try_divide(F.col("rc"), F.lit(gn) - F.col("n"))
    )
    per_type = staged.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.sum((p - q) * F.log(p / q)).alias("__psi"),
    )
    r4 = lambda c: F.round(c * 10000) / 10000 + 0.0  # noqa: E731
    return per_type.select(
        "event_type",
        "n",
        (F.lit(gn) - F.col("n")).cast("long").alias("n_rest"),
        r4(F.col("__psi")).alias("psi"),
        F.when(F.col("__psi") < 0.1, F.lit("stable"))
        .when(F.col("__psi") <= 0.25, F.lit("moderate"))
        .otherwise(F.lit("shifted"))
        .alias("psi_band"),
    )


@register("diag_benford_fit")  # rows-only (r9 capacity policy): ≡
# python same-formula recompute + planted log-uniform/uniform pins —
# tests/test_mlprep_props.py
def diag_benford_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformity per order priority — the
    forensic-accounting data-quality screen (Nigrini 2012): natural
    multi-scale amounts follow P(d) = log₁₀(1 + 1/d); synthetic,
    capped, or fabricated amounts don't, so the deviation profile is
    a one-pass anomaly flag on any money-like column BEFORE it feeds
    revenue aggregates. Emits per (priority, digit 1–9): count,
    observed vs expected share, deviation, plus the group's MAD
    (mean |obs − exp| over the 9 digits) and Nigrini's published
    conformity bands (< .006 acceptable, < .012 marginal, else
    nonconforming — the two tighter bands folded, since a 5-band read
    adds nothing at this fixture size). The TPC-H-ish uniform price
    generator is EXPECTED to read nonconforming — the diagnostic
    detecting the fixture's synthetic prices is the op working; the
    conforming branch is pinned on a planted log-uniform sample.

    Scale shape: first digit is a pure JVM expression
    (floor(x/10^floor(log₁₀ x)) — same doubles in the python pin),
    ONE partial-agged (priority, digit) count shuffle (≤ #groups×9
    rows), a 9-digit dense spine exploded off the group list (zero
    joins, zero-count digits kept), and the share/MAD algebra + one
    group window on that bounded table. Scale-first 4dp."""
    from pyspark.sql import Window

    o = load(
        spark, sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"]
    ).filter(F.col("o_totalprice") > 0)
    digit = F.floor(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0), F.floor(F.log10(F.col("o_totalprice"))))
    ).cast("int")
    cells = o.select("o_orderpriority", digit.alias("digit")).groupBy(
        "o_orderpriority", "digit"
    ).agg(F.count(F.lit(1)).alias("c"))
    dense = (
        cells.select("o_orderpriority")
        .distinct()
        .select(
            "o_orderpriority",
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("digit"),
        )
        .join(cells, ["o_orderpriority", "digit"], "left")
        .select(
            "o_orderpriority", "digit", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    wg = Window.partitionBy("o_orderpriority")
    n = F.sum("c").over(wg)
    obs = F.col("c") / n
    exp_ = F.log10(1 + 1 / F.col("digit").cast("double"))
    staged = dense.select(
        "o_orderpriority",
        "digit",
        "c",
        obs.alias("__obs"),
        exp_.alias("__exp"),
    )
    mad = F.avg(F.abs(F.col("__obs") - F.col("__exp"))).over(wg)
    # shares are ratios of small integers — exact 4dp halves are COMMON
    # (82/320 = .25625), so half-up floor(x·1e4 + .5) in both engines
    # (the r13 readability lesson), not round()
    r4 = lambda c: F.floor(c * 10000 + 0.5) / 10000 + 0.0  # noqa: E731
    return staged.select(
        "o_orderpriority",
        "digit",
        F.col("c").alias("n"),
        r4(F.col("__obs")).alias("obs_share"),
        r4(F.col("__exp")).alias("exp_share"),
        r4(F.col("__obs") - F.col("__exp")).alias("dev"),
        r4(mad).alias("mad"),
        F.when(mad < 0.006, F.lit("acceptable"))
        .when(mad < 0.012, F.lit("marginal"))
        .otherwise(F.lit("nonconforming"))
        .alias("conformity"),
    )
