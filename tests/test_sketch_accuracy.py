"""Value-level accuracy pins for the ops no SQL oracle can hash (SURVEY §2
rows-only legend): sketch estimates are engine-specific by design, but their
ERROR vs the exact answer is a contract — a mistuned sketch (wrong rsd,
wrong lgK, wrong merge) sails through a rows-only check while being
arbitrarily wrong. Same philosophy as the hashlib pin for fingerprint_sha1:
verify against an independent ground truth computed in-process."""

from __future__ import annotations

from pyspark.sql import functions as F

from n2kupdate_spark.queries import QUERIES
from n2kupdate_spark.sources import load


def test_approx_distinct_within_rsd_bound(spark, sf_dir):
    """HLL++ with rsd=0.02: every per-group estimate must land within 3
    standard errors (6%) of the exact distinct count — the bound the op's
    docstring advertises for replacing exact countDistinct at 100 TB."""
    got = {
        r.event_type: r.approx_users
        for r in QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.nd
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("nd"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        rel = abs(est - exact[k]) / exact[k]
        assert rel <= 0.06, f"{k}: estimate {est} vs exact {exact[k]} ({rel:.1%})"


def test_approx_quantile_within_rank_tolerance(spark, sf_dir):
    """approx_percentile(accuracy=10000) guarantees rank error ≤ n/accuracy.
    Check the estimated p50 sits between the exact values at ranks
    floor/ceil of n/2 ± n/10000 ± 1 per group — a rank-space bound, which is
    what the sketch actually promises (value-space tolerance would be data-
    dependent)."""
    import math

    o = load(spark, sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    groups = {
        r.o_orderpriority: sorted(x[0] for x in r.vals)
        for r in o.groupBy("o_orderpriority")
        .agg(F.collect_list(F.struct("o_totalprice")).alias("vals"))
        .collect()
    }
    got = {
        r.o_orderpriority: r.p50_approx
        for r in QUERIES["agg_approx_quantile"](spark, sf_dir).collect()
    }
    assert set(got) == set(groups)
    for k, est in got.items():
        vals = groups[k]
        n = len(vals)
        # Spark's continuous percentile target index for p=0.5 is (n-1)/2;
        # the sketch may be off by n/accuracy ranks either side.
        slack = math.ceil(n / 10000) + 1
        lo = vals[max(0, (n - 1) // 2 - slack)]
        hi = vals[min(n - 1, (n - 1) // 2 + 1 + slack)]
        assert lo - 1e-4 <= est <= hi + 1e-4, f"{k}: {est} outside [{lo}, {hi}]"


def test_hll_sketch_merge_estimates_and_union(spark, sf_dir):
    """DataSketches HLL: per-group estimates within 5% of the exact counts
    the query already carries, and the MERGED global estimate within 5% of
    the true global distinct — the union step is the whole point of the op
    (sketch once, merge upward) and the easiest thing to get silently wrong."""
    rows = QUERIES["agg_hll_sketch_merge"](spark, sf_dir).collect()
    exact_global = (
        load(spark, sf_dir, "orders", columns=["o_custkey"])
        .select(F.count_distinct("o_custkey"))
        .first()[0]
    )
    seen_global = False
    for r in rows:
        if r.o_orderpriority == "__ALL__":
            seen_global = True
            rel = abs(r.est_nd - exact_global) / exact_global
            assert rel <= 0.05, f"merged estimate {r.est_nd} vs {exact_global}"
        else:
            rel = abs(r.est_nd - r.exact_nd) / r.exact_nd
            assert rel <= 0.05, f"{r.o_orderpriority}: {r.est_nd} vs {r.exact_nd}"
    assert seen_global, [r.o_orderpriority for r in rows]


def test_minhash_estimate_error_within_theory(spark, sf_dir):
    """The K=32 MinHash signature's Jaccard estimate: mean absolute error
    over the LSH candidate pairs must respect the 1/sqrt(K) ≈ 0.18 theory
    bound (with slack for the small-pair-count regime), and the estimate
    must not be systematically biased vs the exact shingle Jaccard."""
    row = QUERIES["dedup_minhash_est_eval"](spark, sf_dir).first()
    assert row.n_pairs > 0
    assert row.mean_abs_err <= 0.18, row
    assert abs(row.mean_est - row.mean_exact) <= 0.10, row


def test_lsh_fuzzy_recall_on_high_jaccard_pairs(spark, sf_dir):
    """Banding theory for 16 bands x 2 rows: a pair at Jaccard j collides on
    >= 1 band with prob 1-(1-j^2)^16 — > 0.999 for j >= 0.7. So every exact
    pair at j >= 0.7 must appear in dedup_text_fuzzy's output (which
    verifies exactly and filters at 0.5 — i.e. misses can only come from
    LSH banding, which theory says won't happen at this j)."""
    from n2kupdate_spark.operators.dedup import shingle_jaccard_pairs, word_shingles

    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    sh = word_shingles(docs, "text")
    exact_high = {
        (r.id1, r.id2)
        for r in shingle_jaccard_pairs(sh, "doc_id", threshold=0.7).collect()
    }
    got = {
        (r.id1, r.id2)
        for r in QUERIES["dedup_text_fuzzy"](spark, sf_dir).collect()
    }
    assert exact_high, "fixture should contain at least one high-Jaccard pair"
    missed = exact_high - got
    assert not missed, f"LSH missed {len(missed)} of {len(exact_high)} j>=0.7 pairs"


def test_simhash_band_join_matches_bruteforce(spark, sf_dir):
    """The distributed part of dedup_simhash — 8x8-bit band blocking + pair
    generation — must return EXACTLY the hamming<=3 pairs a driver-side
    brute force over the same signatures finds (blocking guarantees recall
    to hamming 7, so at the op's max_hamming=3 no pair may be missing and
    the explicit filter means none may be extra)."""
    import numpy as np

    from n2kupdate_spark.operators.dedup import simhash_near_pairs, simhash_signature

    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    sig = simhash_signature(docs, "doc_id").localCheckpoint(eager=True)
    rows = sig.collect()
    ids = np.array([r.doc_id for r in rows])
    sigs = np.array([r.simhash for r in rows], dtype=np.int64).astype(np.uint64)
    # brute-force hamming over all pairs (n ~ 500 at sf0.001)
    want = set()
    for i in range(len(ids)):
        ham = np.array(
            [bin(int(sigs[i] ^ s)).count("1") for s in sigs[i + 1:]]
        )
        for j in np.nonzero(ham <= 3)[0]:
            a, b = ids[i], ids[i + 1 + j]
            want.add((min(a, b), max(a, b)))
    got = {
        (min(r.id1, r.id2), max(r.id1, r.id2))
        for r in simhash_near_pairs(sig, "doc_id", max_hamming=3).collect()
    }
    assert got == want, (
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )


def test_source_orc_roundtrip_values_match_parquet(spark, sf_dir):
    """ORC has no oracle reader, so pin the round-trip against the parquet
    source directly: byte-identical rows (the op writes nation as ORC and
    reads it back with pushdown + pruning)."""
    got = sorted(
        map(tuple, QUERIES["source_orc"](spark, sf_dir).collect())
    )
    want = sorted(
        map(
            tuple,
            load(spark, sf_dir, "nation")
            .filter(F.col("n_regionkey") >= 0)
            .select("n_nationkey", "n_name", "n_regionkey")
            .collect(),
        )
    )
    assert got == want


def test_theta_sketch_set_algebra_exact_below_capacity(spark, sf_dir):
    """Theta set-op estimates: below the sketch's nominal capacity (4096
    entries at default lgK) theta sketches are exact, so every estimate —
    including the UNION and INTERSECTION computed purely from sketches —
    must equal the exact distinct counts carried beside it. (At production
    cardinalities the error bound is ~1.6%; exactness here pins that the
    set algebra is wired correctly, the property that actually breaks
    when someone swaps union/intersection operands.)"""
    rows = {r["set_op"]: r for r in QUERIES["agg_theta_sketch_sets"](spark, sf_dir).collect()}
    assert set(rows) == {"view", "click", "union", "intersection"}
    for op, r in rows.items():
        assert r["est_nd"] == r["exact_nd"], (op, r)
    # set-algebra sanity: |A∪B| ≥ max(|A|,|B|), |A∩B| ≤ min(|A|,|B|)
    assert rows["union"]["est_nd"] >= max(rows["view"]["est_nd"], rows["click"]["est_nd"])
    assert rows["intersection"]["est_nd"] <= min(rows["view"]["est_nd"], rows["click"]["est_nd"])


def test_kll_quantile_merge_rank_error_bounded(spark, sf_dir):
    """KLL guarantees RANK accuracy (±1.65% at the default k), not value
    accuracy: for each estimated quantile, the fraction of the group's
    actual values ≤ estimate must sit within 2.5% of the target rank (a
    little slack over the bound for the doubled error of the merged
    sketch)."""
    got = QUERIES["agg_kll_quantile_merge"](spark, sf_dir).collect()
    li = load(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    for r in got:
        grp = li if r["l_returnflag"] == "__ALL__" else li.filter(
            F.col("l_returnflag") == r["l_returnflag"]
        )
        n = grp.count()
        for prob, col in ((0.5, "p50"), (0.95, "p95")):
            rank = grp.filter(F.col("l_quantity") <= r[col]).count() / n
            assert abs(rank - prob) <= 0.025, (r["l_returnflag"], col, rank)


def test_cms_heavy_hitters_never_undercounts_bounded_over(spark, sf_dir):
    """Count-min guarantees: est ≥ exact always (hash collisions only ADD),
    and est ≤ exact + eps·N with the configured confidence. Both pinned
    for the exact top-5 keys; N is the full stream length and eps=0.001
    (the op's fixed sketch width)."""
    rows = QUERIES["agg_cms_heavy_hitters"](spark, sf_dir).collect()
    n_events = load(spark, sf_dir, "events").count()
    assert len(rows) == 5
    for r in rows:
        assert r["est_cnt"] >= r["exact_cnt"], r
        assert r["est_cnt"] <= r["exact_cnt"] + 0.001 * n_events, (r, n_events)


def test_fuzzy_decontaminate_bipartite_pins(spark, sf_dir):
    """text_decontaminate_fuzzy (rows-only, r9): pin the bipartite
    contamination scan against a brute-force train×eval Jaccard computed
    in-process. Three contracts: (1) ZERO false positives — the op
    verifies exactly, so every flagged doc's true max Jaccard must reach
    the 0.5 threshold; (2) banding recall — every train doc whose true
    max Jaccard is ≥ 0.7 MUST be flagged (16 bands × 2 rows collide with
    p > 0.999 at j = 0.7; see test_lsh_fuzzy_recall_on_high_jaccard_pairs);
    (3) exact values — for those high-j docs the reported max_jaccard
    equals the brute-force max at 4dp (the top partner is necessarily an
    LSH candidate at that j)."""
    from n2kupdate_spark.operators.dedup import word_shingles

    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    sh = {
        r.doc_id: set(r.shingles)
        for r in word_shingles(docs, "text").collect()
    }
    eval_ids = {i for i in sh if i % 97 == 0}
    true_max = {}
    for i, s in sh.items():
        if i in eval_ids:
            continue
        best = 0.0
        for e in eval_ids:
            es = sh[e]
            inter = len(s & es)
            if inter:
                best = max(best, inter / (len(s) + len(es) - inter))
        true_max[i] = best
    high = {i for i, j in true_max.items() if j >= 0.7}
    assert high, "fixture must contain >=1 train doc near an eval doc"

    got = {
        r.doc_id: r
        for r in QUERIES["text_decontaminate_fuzzy"](spark, sf_dir).collect()
    }
    flagged = {i for i, r in got.items() if r.contaminated == 1}
    false_pos = [i for i in flagged if true_max[i] < 0.5]
    assert not false_pos, f"false positives: {false_pos[:5]}"
    missed = high - flagged
    assert not missed, f"missed {len(missed)} of {len(high)} j>=0.7 docs"
    for i in high:
        assert abs(got[i].max_jaccard - round(true_max[i], 4)) <= 1e-9, (
            i, got[i].max_jaccard, true_max[i]
        )


def test_bloom_decontaminate_contract_pins(spark, sf_dir):
    """text_decontaminate_bloom (rows-only, r10): pin the Bloom contract
    in both directions against the SQL-oracled exact gate.

    (1) No false negatives — at the registered sizing (m=2^20, k=4) the
    flagged-gram count per doc is ≥ the exact shared-gram count and every
    exactly-contaminated doc is flagged: the same hash family inserts and
    probes, so membership NEVER misses (superset by construction, safe as
    a filter). (2) Bounded false positives — an undersized filter
    (m=4096, k=2) forces measurable collisions; the per-gram FP rate over
    the non-shared gram population must stay within 3x the analytic
    (1 - e^(-kN/m))^k bound (N = distinct eval grams), and must be > 0 so
    this half of the test demonstrably bites."""
    import math

    from n2kupdate_spark.operators.corpus import decontaminate_bloom
    from n2kupdate_spark.operators.dedup import word_shingles

    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    exact = {
        r.doc_id: r
        for r in QUERIES["text_decontaminate_ngram"](spark, sf_dir).collect()
    }
    got = {
        r.doc_id: r
        for r in QUERIES["text_decontaminate_bloom"](spark, sf_dir).collect()
    }
    assert set(got) == set(exact)  # same <3-token absence semantics
    for i, e in exact.items():
        b = got[i]
        assert b.n_flagged_grams >= e.n_shared_grams, (i, b, e)
        assert b.contaminated >= e.contaminated, (i, b, e)

    train = docs.filter("doc_id % 97 != 0")
    evald = docs.filter("doc_id % 97 = 0")
    n_eval_grams = (
        word_shingles(evald, "text")
        .select(F.explode("shingles").alias("g"))
        .distinct()
        .count()
    )
    per_doc_grams = {
        r.doc_id: r.n
        for r in word_shingles(train, "text")
        .select("doc_id", F.size("shingles").alias("n"))
        .collect()
    }
    m, k = 4096, 2
    tiny = {
        r.doc_id: r.n_flagged_grams
        for r in decontaminate_bloom(train, evald, n=3, m_bits=m, k=k).collect()
    }
    fp = sum(tiny[i] - exact[i].n_shared_grams for i in tiny)
    nonshared = sum(per_doc_grams[i] - exact[i].n_shared_grams for i in tiny)
    p_bound = (1.0 - math.exp(-k * n_eval_grams / m)) ** k
    assert fp > 0, "undersized filter produced no collisions; test is vacuous"
    assert fp / nonshared <= 3.0 * p_bound, (fp, nonshared, p_bound)


def test_bloom_exact_decontaminate_equals_exact_gate(spark, sf_dir):
    """text_decontaminate_bloom_exact (rows-only, r11): the two-stage
    composition must EQUAL the SQL-oracled exact gate row-for-row —
    including n_shared_grams values and <3-token absence semantics.

    The decisive half: at an UNDERSIZED stage-1 filter (m=4096, k=2 —
    proven above to produce real collisions on this fixture) the output
    must STILL equal the exact gate's, because stage 2's exact join
    kills every Bloom false positive while no-false-negatives guarantees
    every truly-shared gram reaches it."""
    from n2kupdate_spark.operators.corpus import decontaminate_bloom_exact

    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    exact = {
        r.doc_id: (r.n_shared_grams, r.contaminated)
        for r in QUERIES["text_decontaminate_ngram"](spark, sf_dir).collect()
    }
    got = {
        r.doc_id: (r.n_shared_grams, r.contaminated)
        for r in QUERIES["text_decontaminate_bloom_exact"](spark, sf_dir).collect()
    }
    assert got == exact

    train = docs.filter("doc_id % 97 != 0")
    evald = docs.filter("doc_id % 97 = 0")
    tiny = {
        r.doc_id: (r.n_shared_grams, r.contaminated)
        for r in decontaminate_bloom_exact(
            train, evald, n=3, m_bits=4096, k=2
        ).collect()
    }
    assert tiny == exact, "stage-2 exact verify failed to kill a Bloom FP"


def test_tdigest_rank_error_determinism_and_merge(spark, sf_dir):
    """r14: the from-paper t-digest (operators/tdigest.py). Three
    contracts: (1) RANK accuracy — the empirical rank of each estimated
    quantile within 1.5% of target (δ=100 t-digests are far tighter
    than KLL at these ranks; the bound has slack for the two-level
    merge); (2) DETERMINISM — two full runs produce identical rows
    (the content-hash bucketing / sort-before-cluster contract); (3)
    MERGE shape — a flat merge is ORDER-invariant (byte-identical under
    any permutation of the partials; tree associativity is explicitly
    NOT claimed — the pipeline merges flat per level), and a digest of
    a known uniform grid reads its analytic quantiles to within the
    same rank bound."""
    import numpy as np

    from n2kupdate_spark.operators.tdigest import (
        build_digest,
        digest_quantile,
        merge_digests,
    )

    got = QUERIES["agg_tdigest_quantile_merge"](spark, sf_dir).collect()
    li = load(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    for r in got:
        grp = li if r["l_returnflag"] == "__ALL__" else li.filter(
            F.col("l_returnflag") == r["l_returnflag"]
        )
        n = grp.count()
        assert r["n"] == n
        for prob, col in ((0.5, "p50"), (0.95, "p95")):
            rank = grp.filter(F.col("l_quantity") <= r[col]).count() / n
            assert abs(rank - prob) <= 0.015, (r["l_returnflag"], col, rank)

    again = QUERIES["agg_tdigest_quantile_merge"](spark, sf_dir).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))

    # flat-merge ORDER invariance on random partials: any permutation,
    # same bytes (tree associativity is not claimed — see the operator
    # docstring; the pipeline merges flat per level)
    rng = np.random.RandomState(8)
    parts = [
        build_digest(np.sort(rng.randn(sz)), np.ones(sz))
        for sz in (500, 1200, 64, 3000)
    ]
    b = merge_digests(parts)
    for perm in ([3, 1, 0, 2], [2, 3, 0, 1], [1, 0, 3, 2]):
        p = merge_digests([parts[i] for i in perm])
        assert np.array_equal(p[0], b[0]) and np.array_equal(p[1], b[1]), perm
    # a nested merge is a valid digest of the pooled mass (weight
    # conserved exactly) even though its centroids may differ
    nested = merge_digests([merge_digests(parts[:2]), merge_digests(parts[2:])])
    total = sum(float(p[1].sum()) for p in parts)
    assert abs(float(nested[1].sum()) - total) < 1e-6

    # analytic check: uniform grid 0..9999
    g = np.arange(10000, dtype=float)
    m, w = build_digest(g, np.ones(10000))
    assert len(m) < 200  # ~delta centroids, not n
    for q in (0.01, 0.5, 0.95, 0.999):
        est = digest_quantile(m, w, q)
        rank = (g <= est).sum() / 10000
        assert abs(rank - q) <= 0.01, (q, est, rank)


def test_mg_heavy_hitters_certified_bounds(spark, sf_dir):
    """r15: Misra–Gries bounds are CERTIFIED, not probabilistic — for
    every emitted item: est_lo ≤ exact ≤ est_lo + err_bound, and
    err_bound ≤ n/(k+1) (the classic MG guarantee). When the column's
    cardinality fits the summary (≤ k) the answer is EXACT with
    err_bound 0. Planted skew with a tiny k=4 summary: the dominant
    item survives compression and its bounds still bracket the truth;
    every true-frequency > 2n/(k+1) item is present."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.misra_gries import mg_heavy_hitters
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    ev = load(spark, sf_dir, "events", columns=["user_id"]).filter(
        F.col("user_id").isNotNull()
    )
    exact = {
        r["user_id"]: r["c"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(exact.values())
    k = 256
    rows = QUERIES["agg_mg_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        t = exact[r["item"]]
        assert r["est_lo"] <= t <= r["est_lo"] + r["err_bound"], dict(r.asDict())
        # provable end-to-end bound: per-batch Σthr ≤ n/(k+1) plus one
        # final compress ≤ n/(k+1)
        assert r["err_bound"] <= 2 * (n // (k + 1)) + 2
    if len(exact) <= k:
        # summary never compressed: exact answer, zero ledger
        assert all(r["err_bound"] == 0 and exact[r["item"]] == r["est_lo"] for r in rows)
        top_true = sorted(exact.items(), key=lambda kv: (-kv[1], str(kv[0])))[:5]
        assert [(r["item"], r["est_lo"]) for r in rows] == top_true

    # planted skew through a k=4 summary: 60% of rows one item
    planted = [("hot",)] * 600 + [(f"cold{i % 40}",) for i in range(400)]
    df = spark.createDataFrame(planted, "w: string").repartition(8)
    got = {r["item"]: r for r in mg_heavy_hitters(df, "w", k=4, top=3).collect()}
    n_p = 1000
    assert "hot" in got  # true freq 600 > 2n/(k+1) = 400 — MUST survive
    hot = got["hot"]
    assert hot["est_lo"] <= 600 <= hot["est_lo"] + hot["err_bound"]
    assert hot["err_bound"] <= 2 * (n_p // (4 + 1))  # sum-then-trim slack
