"""Local replica of the driver's t2 gate: run every registered Spark query
and its DuckDB oracle, compare row count + (sorted) schema + order-
insensitive canonical values. Rows-only queries are just executed.

Canonicalization mirrors SURVEY.md §7.4: floats compared at 4dp (queries
already round), timestamps via isoformat, arrays recursively.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import numpy as np
import pytest

from n2kupdate_spark.queries import ORACLE, QUERIES


def _canon_val(v):
    if v is None:
        return "∅"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if f == 0.0:
            f = 0.0  # fold -0.0 (engines disagree on round(-1e-9) sign)
        return f"{f:.4f}"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_val(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def canonical_rows(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_val(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows


def test_fingerprint_sha1_matches_hashlib(spark, sf_dir):
    """Value-level pin for the one op no oracle can hash (judge r4 item 3):
    DuckDB has no sha1, so recompute every fingerprint with hashlib over the
    same ``concat_ws('|', ...)`` preimage and require byte equality. This is
    the reference's exact hash (digest::sha1), so the preimage convention —
    '|' separator, nulls skipped by concat_ws, integer cast to string — is
    part of the contract, not an implementation detail."""
    import hashlib

    rows = QUERIES["fingerprint_sha1"](spark, sf_dir).collect()
    assert len(rows) > 0
    base = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_mktsegment"
    ).collect()
    expected = {}
    for r in base:
        # concat_ws semantics: null values are skipped entirely (no empty slot)
        parts = [
            str(v) for v in (r.c_custkey, r.c_name, r.c_mktsegment) if v is not None
        ]
        expected[r.c_custkey] = hashlib.sha1(
            "|".join(parts).encode("utf-8")
        ).hexdigest()
    bad = [(r.c_custkey, r.fp, expected[r.c_custkey]) for r in rows if r.fp != expected[r.c_custkey]]
    assert not bad, f"{len(bad)} sha1 mismatches; first 3: {bad[:3]}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    sdf = QUERIES[name](spark, sf_dir)
    spdf = sdf.toPandas()

    if name not in ORACLE:
        # rows-only contract: must execute and be deterministic across reruns
        spdf2 = QUERIES[name](spark, sf_dir).toPandas()
        assert len(spdf) == len(spdf2), f"{name}: nondeterministic row count"
        return

    opdf = oracle_con.execute(ORACLE[name]).fetchdf()
    assert len(spdf) == len(opdf), (
        f"{name}: row count {len(spdf)} (spark) != {len(opdf)} (oracle)"
    )
    s_cols, s_rows = canonical_rows(spdf)
    o_cols, o_rows = canonical_rows(opdf)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != {o_cols}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )


def test_gate_report_budget_retune_stays_synced(spark, sf_dir, oracle_con, monkeypatch):
    """r8 advice (low): corpus_gate_report's Spark side must read
    _DECONTAM_BUDGET (not literal 5s) so a retune cannot silently split
    op from oracle. Exercise a NON-default budget end-to-end: with the
    constant monkeypatched, the Spark plan and a freshly interpolated
    oracle must still agree row-for-row."""
    from n2kupdate_spark.queries import mlprep

    monkeypatch.setattr(mlprep, "_DECONTAM_BUDGET", 2)
    spdf = mlprep.corpus_gate_report(spark, sf_dir).toPandas()
    opdf = oracle_con.execute(mlprep._gate_report_oracle()).fetchdf()
    assert len(spdf) == len(opdf) > 0
    s_cols, s_rows = canonical_rows(spdf)
    o_cols, o_rows = canonical_rows(opdf)
    assert s_cols == o_cols
    assert s_rows == o_rows
    # a budget this tight must actually change the report vs the default —
    # ORACLE["corpus_gate_report"] was interpolated at import with budget 5
    opdf_default = oracle_con.execute(ORACLE["corpus_gate_report"]).fetchdf()
    assert not opdf.sort_values(s_cols).reset_index(drop=True).equals(
        opdf_default.sort_values(s_cols).reset_index(drop=True)
    )


def test_perplexity_buckets_match_duckdb_ntile(spark, sf_dir, oracle_con):
    """text_perplexity_buckets (rows-only, r9 capacity policy): run the
    equivalent DuckDB NTILE(3) query — built ON TOP of the already
    hash-verified text_bigram_lm_score oracle — and compare frames
    exactly. Oracle-grade evidence without an SQL-oracle registry slot;
    determinism rests on the total ntile ordering (rounded score DESC,
    doc_id), interpolated identically on both engines."""
    base = ORACLE["text_bigram_lm_score"]
    sql = f"""
    WITH scored AS ({base}),
    b AS (SELECT s.doc_id, d.lang, s.lm_score,
                 NTILE(3) OVER (PARTITION BY d.lang
                                ORDER BY s.lm_score DESC, s.doc_id) AS t
          FROM scored s JOIN documents d USING (doc_id))
    SELECT doc_id, lang, lm_score,
           CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
    FROM b
    """
    spdf = QUERIES["text_perplexity_buckets"](spark, sf_dir).toPandas()
    opdf = oracle_con.execute(sql).fetchdf()
    assert len(spdf) == len(opdf) > 0
    s_cols, s_rows = canonical_rows(spdf)
    o_cols, o_rows = canonical_rows(opdf)
    assert s_cols == o_cols
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"{len(mismatches)} mismatches; first 3: {mismatches[:3]}"


def test_quality_classifier_matches_python_recompute(spark, sf_dir):
    """text_quality_classifier (rows-only, r9): recompute every score from
    raw text in plain python — hashlib md5 bucketing, sublinear tf, the
    same exported deterministic fit — and require 4dp agreement (small
    tolerance for float sum order) plus keep-flag agreement away from the
    0.5 boundary. No separation assert here: the fixture assigns sources
    independently of content (verified: fit-sample AUC ≈ 0.51 at sf0.1
    where docs outnumber features), so separation is proven on a
    planted-signal corpus instead —
    test_quality_classifier_separates_planted_signal."""
    import hashlib

    import numpy as np

    from n2kupdate_spark.operators.corpus import fit_quality_classifier

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    ).collect()
    feats, labels = {}, {}
    for r in docs:
        c = {}
        for t in r.text.split(" "):
            if t:
                b = int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % 256
                c[b] = c.get(b, 0) + 1
        if c:
            feats[r.doc_id] = c
        labels[r.doc_id] = 1 if r.source in {"src0", "src1", "src2", "src3", "src4"} else 0
    pos = sorted(i for i in feats if labels[i] == 1)[:2048]
    neg = sorted(i for i in feats if labels[i] == 0)[:2048]
    # canonical (sorted) row order, matching the op: the fit is
    # row-order-stable at the default lr (pinned below), but the pin
    # should not rely on that headroom
    fit_ids = sorted(pos + neg)
    X = np.zeros((len(fit_ids), 256))
    y = np.array([labels[i] for i in fit_ids], dtype=np.float64)
    for k, i in enumerate(fit_ids):
        for b, c in feats[i].items():
            X[k, b] = 1.0 + np.log(c)
    w, bias = fit_quality_classifier(X, y)

    def score(i):
        z = bias + sum(w[b] * (1.0 + np.log(c)) for b, c in feats[i].items())
        return 1.0 / (1.0 + np.exp(-z))

    got = {
        r.doc_id: r
        for r in QUERIES["text_quality_classifier"](spark, sf_dir).collect()
    }
    assert set(got) == set(feats)
    for i, r in got.items():
        exp = score(i)
        assert abs(r.quality_score - round(exp, 4)) <= 1.01e-4, (i, r.quality_score, exp)
        if abs(exp - 0.5) > 1e-3:
            assert r.keep == int(exp >= 0.5), (i, exp, r.keep)

def test_quality_classifier_separates_planted_signal(spark):
    """Contract test for the fit itself: on a corpus where the curated
    class HAS a distinguishing token distribution (the production
    situation — curated text does not look like raw crawl), every
    positive must outscore every negative and the keep flag must track
    the classes. Uses a planted-marker synthetic corpus so the assert is
    about the operator, not the fixture's (signal-free) source labels."""
    from n2kupdate_spark.operators.corpus import quality_classifier_scores

    rows = []
    for i in range(40):
        # positives: curated-ish vocabulary; negatives: spammy repetition
        if i % 2 == 0:
            rows.append((i, "the curated careful prose reads well " * 3, True))
        else:
            rows.append((i, "buy cheap now click buy cheap now click " * 3, False))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "__pos"])
    got = {
        r.doc_id: r for r in quality_classifier_scores(docs, "__pos").collect()
    }
    pos_scores = [got[i].quality_score for i in range(0, 40, 2)]
    neg_scores = [got[i].quality_score for i in range(1, 40, 2)]
    assert min(pos_scores) > max(neg_scores)
    assert all(got[i].keep == 1 for i in range(0, 40, 2))
    assert all(got[i].keep == 0 for i in range(1, 40, 2))


def test_markov_transitions_duckdb_pinned(spark, sf_dir, oracle_con):
    """events_markov_transitions (rows-only, r10): run the equivalent
    DuckDB SQL through the SAME canonical-rows compare the driver's
    oracle gate uses — cross-engine value verification without a rotation
    slot. Also pins the row-count invariant: transitions sum to
    (events - distinct users), since exactly the last event per user has
    no successor."""
    spdf = QUERIES["events_markov_transitions"](spark, sf_dir).toPandas()
    opdf = oracle_con.execute(
        """
        WITH seq AS (
          SELECT event_type,
                 lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_type
          FROM events
        ), c AS (
          SELECT event_type, next_type, COUNT(*) AS n
          FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
               ROUND(n * 10000.0 / SUM(n) OVER (PARTITION BY event_type)) / 10000 AS p
        FROM c
        """
    ).fetchdf()
    assert len(spdf) == len(opdf)
    s_cols, s_rows = canonical_rows(spdf)
    o_cols, o_rows = canonical_rows(opdf)
    assert s_cols == o_cols
    assert s_rows == o_rows
    n_events, n_users = oracle_con.execute(
        "SELECT COUNT(*), COUNT(DISTINCT user_id) FROM events"
    ).fetchone()
    assert int(spdf["n"].sum()) == n_events - n_users


def test_hard_negatives_duckdb_pinned(spark, sf_dir, oracle_con):
    """embed_hard_negatives (rows-only, r10): the equivalent DuckDB
    list_cosine_similarity SQL through the driver's canonical-rows
    compare, plus the defining invariants — no negative shares its
    query's label, and every returned similarity is <= the same query's
    unrestricted top-1 (a hard negative can tie but never beat the best
    overall neighbor)."""
    spdf = QUERIES["embed_hard_negatives"](spark, sf_dir).toPandas()
    opdf = oracle_con.execute(
        """
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
             q AS (SELECT vec_id AS q_id, v AS qv, label AS ql FROM e
                   WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT 256)
        SELECT q_id, neg_id, cos_sim, rn FROM (
            SELECT q.q_id, e.vec_id AS neg_id,
                   ROUND(list_cosine_similarity(q.qv, e.v), 4) + 0 AS cos_sim,
                   row_number() OVER (
                       PARTITION BY q.q_id
                       ORDER BY ROUND(list_cosine_similarity(q.qv, e.v), 4) + 0 DESC,
                                e.vec_id ASC
                   ) AS rn
            FROM q CROSS JOIN e
            WHERE e.vec_id <> q.q_id AND e.label <> q.ql
        ) WHERE rn <= 10
        """
    ).fetchdf()
    assert len(spdf) == len(opdf) > 0
    s_cols, s_rows = canonical_rows(spdf)
    o_cols, o_rows = canonical_rows(opdf)
    assert s_cols == o_cols and s_rows == o_rows

    labels = dict(
        oracle_con.execute("SELECT vec_id, label FROM embeddings").fetchall()
    )
    assert all(labels[r.neg_id] != labels[r.q_id] for r in spdf.itertuples())
    best = {
        r.q_id: r.cos_sim
        for r in QUERIES["sim_cosine_topk"](spark, sf_dir).collect()
        if r.rn == 1
    }
    top_neg = spdf[spdf.rn == 1].set_index("q_id").cos_sim
    assert all(top_neg[q] <= best[q] for q in top_neg.index)


def test_ts_anomaly_zscore_matches_duckdb(spark, sf_dir, oracle_con):
    """ts_anomaly_zscore (rows-only, r12): full-result equality vs a
    DuckDB recompute of the same rolling frame (ROWS BETWEEN 20
    PRECEDING AND 1 PRECEDING over (ts, event_id) order, stddev_samp,
    min-5-priors + sigma>0 gating, scale-first 4dp) — the cross-engine
    check runs every pytest without burning a driver oracle slot (the
    perplexity-buckets precedent)."""
    from n2kupdate_spark.queries import QUERIES

    got = {
        r["event_id"]: (
            r["n_prior"],
            r["z_score"],
            r["is_anomaly"],
        )
        for r in QUERIES["ts_anomaly_zscore"](spark, sf_dir).collect()
    }
    want_rows = oracle_con.execute(
        """
        WITH e AS (
            SELECT event_id, user_id, value,
                   CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s
            FROM events
        ),
        scored AS (
            SELECT event_id,
                   COUNT(value) OVER w AS n_prior,
                   AVG(value) OVER w AS m,
                   STDDEV_SAMP(value) OVER w AS sd,
                   value
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id
                         ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id, CAST(n_prior AS INT) AS n_prior,
               CASE WHEN n_prior >= 5 AND sd IS NOT NULL AND sd > 0
                    THEN ROUND((value - m) / sd * 10000) / 10000 END AS z,
               COALESCE(ABS(CASE WHEN n_prior >= 5 AND sd IS NOT NULL
                                      AND sd > 0
                                 THEN ROUND((value - m) / sd * 10000) / 10000
                            END) >= 3.0, FALSE) AS is_anomaly
        FROM scored
        """
    ).fetchall()
    want = {r[0]: (r[1], r[2], r[3]) for r in want_rows}
    assert got.keys() == want.keys()
    mismatches = [
        (k, got[k], want[k]) for k in got if got[k] != want[k]
    ]
    assert not mismatches, mismatches[:5]
    assert any(v[2] for v in got.values())  # the rule demonstrably fires


def test_events_attribution_duckdb_pinned(spark, sf_dir, oracle_con):
    """events_attribution (rows-only, r13): the equivalent DuckDB SQL
    through the driver's canonical-rows compare (the markov precedent),
    plus conservation — every model's total credit equals the total
    conversion count, and linear_value totals equal total purchase
    value."""
    spdf = QUERIES["events_attribution"](spark, sf_dir).toPandas()
    opdf = oracle_con.execute(
        """
        WITH staged AS (
          SELECT user_id, event_type, value, ts, event_id,
                 event_type = 'purchase' AS is_conv,
                 COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS j
          FROM events
        ), jstats AS (
          SELECT event_type, value, is_conv,
                 SUM(CASE WHEN NOT is_conv THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id, j) AS n_touch,
                 MAX(CASE WHEN is_conv THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id, j) AS has_conv,
                 MAX(CASE WHEN is_conv THEN value END)
                   OVER (PARTITION BY user_id, j) AS conv_value,
                 SUM(CASE WHEN NOT is_conv THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id, j ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_idx
          FROM staged
        ), credit AS (
          SELECT CASE WHEN is_conv THEN '(direct)' ELSE event_type END AS channel,
                 CASE WHEN is_conv OR t_idx = 1 THEN 1 ELSE 0 END AS first_c,
                 CASE WHEN is_conv OR t_idx = n_touch THEN 1 ELSE 0 END AS last_c,
                 CASE WHEN is_conv THEN 1.0 ELSE 1.0 / n_touch END AS lin,
                 CASE WHEN is_conv THEN value ELSE conv_value / n_touch END AS lin_v
          FROM jstats
          WHERE has_conv = 1 AND (NOT is_conv OR n_touch = 0)
        )
        SELECT channel,
               CAST(SUM(first_c) AS BIGINT) AS first_touch,
               CAST(SUM(last_c) AS BIGINT) AS last_touch,
               ROUND(SUM(lin) * 10000) / 10000 AS linear_credit,
               ROUND(SUM(lin_v) * 10000) / 10000 AS linear_value
        FROM credit GROUP BY channel
        """
    ).fetchdf()
    assert len(spdf) == len(opdf) > 0
    s_cols, s_rows = canonical_rows(spdf)
    o_cols, o_rows = canonical_rows(opdf)
    assert s_cols == o_cols
    assert s_rows == o_rows
    n_conv, total_v = oracle_con.execute(
        "SELECT COUNT(*), SUM(value) FROM events WHERE event_type = 'purchase'"
    ).fetchone()
    assert int(spdf["first_touch"].sum()) == n_conv
    assert int(spdf["last_touch"].sum()) == n_conv
    assert abs(float(spdf["linear_credit"].sum()) - n_conv) < 0.01
    assert abs(float(spdf["linear_value"].sum()) - float(total_v)) < 0.01


def test_events_attribution_planted_journeys(spark):
    """Behavior pin on hand-built journeys: first/last/linear land where
    the model says; a touchless purchase is (direct); trailing touches
    after the final purchase earn nothing."""
    from n2kupdate_spark.queries.streaming_batch import _attribute

    rows = [
        # user 1: view, click, signup, purchase(60) -> linear 1/3 each
        (1, 10, 1, "view", 0.0),
        (2, 20, 1, "click", 0.0),
        (3, 30, 1, "signup", 0.0),
        (4, 40, 1, "purchase", 60.0),
        # user 1 second journey: click then purchase(10)
        (5, 50, 1, "click", 0.0),
        (6, 60, 1, "purchase", 10.0),
        # user 1 trailing touch: never credited
        (7, 70, 1, "view", 0.0),
        # user 2: touchless purchase -> (direct)
        (8, 15, 2, "purchase", 5.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id: long, ts: long, user_id: long, event_type: string, value: double"
    )
    got = {r["channel"]: r for r in _attribute(ev).collect()}
    assert set(got) == {"view", "click", "signup", "(direct)"}
    assert (got["view"]["first_touch"], got["view"]["last_touch"]) == (1, 0)
    assert (got["click"]["first_touch"], got["click"]["last_touch"]) == (1, 1)
    assert (got["signup"]["first_touch"], got["signup"]["last_touch"]) == (0, 1)
    assert got["(direct)"]["first_touch"] == got["(direct)"]["last_touch"] == 1
    assert got["view"]["linear_credit"] == round(1 / 3, 4)
    assert got["click"]["linear_credit"] == round(1 / 3 + 1, 4)
    assert got["signup"]["linear_credit"] == round(1 / 3, 4)
    assert got["view"]["linear_value"] == 20.0
    assert got["click"]["linear_value"] == 30.0
    assert got["signup"]["linear_value"] == 20.0
    assert got["(direct)"]["linear_value"] == 5.0


def test_events_rfm_segments_duckdb_pinned(spark, sf_dir, oracle_con):
    """events_rfm_segments (rows-only, r13): the equivalent DuckDB SQL
    through the driver's canonical-rows compare — NTILE parity holds
    because every quintile orders by a TOTAL key (metric, user_id) —
    plus structural invariants: one row per purchasing user, every
    score in 1..5, quintile sizes differ by at most one."""
    spdf = QUERIES["events_rfm_segments"](spark, sf_dir).toPandas()
    opdf = oracle_con.execute(
        """
        WITH anchor AS (SELECT MAX(ts) AS a FROM events),
        per_user AS (
          SELECT user_id,
                 CAST(date_diff('day', CAST(MAX(ts) AS DATE),
                                CAST((SELECT a FROM anchor) AS DATE)) AS BIGINT)
                   AS recency_days,
                 COUNT(*) AS frequency,
                 ROUND(SUM(value) * 10000) / 10000 AS monetary
          FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ),
        scored AS (
          SELECT user_id, recency_days, frequency, monetary,
                 NTILE(5) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
                 NTILE(5) OVER (ORDER BY frequency ASC, user_id) AS f_score,
                 NTILE(5) OVER (ORDER BY monetary ASC, user_id) AS m_score
          FROM per_user
        )
        SELECT user_id, recency_days, frequency, monetary,
               CAST(r_score AS INT) AS r_score,
               CAST(f_score AS INT) AS f_score,
               CAST(m_score AS INT) AS m_score,
               CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                 || CAST(m_score AS VARCHAR) AS segment
        FROM scored
        """
    ).fetchdf()
    assert len(spdf) == len(opdf) > 0
    s_cols, s_rows = canonical_rows(spdf)
    o_cols, o_rows = canonical_rows(opdf)
    assert s_cols == o_cols
    assert s_rows == o_rows
    n_buyers = oracle_con.execute(
        "SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'purchase'"
    ).fetchone()[0]
    assert len(spdf) == n_buyers
    for c in ("r_score", "f_score", "m_score"):
        sizes = spdf[c].value_counts()
        assert set(sizes.index) == {1, 2, 3, 4, 5}
        assert sizes.max() - sizes.min() <= 1


def test_ts_seasonal_decompose_duckdb_pinned(spark, sf_dir, oracle_con):
    """ts_seasonal_decompose (rows-only, r13): the equivalent DuckDB SQL
    through the driver's canonical-rows compare, plus the defining
    invariants: observed ≡ trend + seasonal + resid wherever trend
    exists, the 24 seasonal indices are identical across days and sum
    to ~0, the spine is dense (one row per hour, no gaps), and exactly
    the 12 leading + 12 trailing edge hours carry NULL trend."""
    spdf = QUERIES["ts_seasonal_decompose"](spark, sf_dir).toPandas()
    opdf = oracle_con.execute(
        """
        WITH ev AS (
          SELECT CAST(FLOOR(epoch(date_trunc('second', ts)) / 3600) * 3600 AS BIGINT)
                   AS hour_s
          FROM events
        ), hourly AS (
          SELECT hour_s, COUNT(*) AS observed FROM ev GROUP BY hour_s
        ), bounds AS (
          SELECT MIN(hour_s) AS lo, MAX(hour_s) AS hi FROM hourly
        ), spine AS (
          SELECT UNNEST(range((SELECT lo FROM bounds),
                              (SELECT hi FROM bounds) + 1, 3600)) AS hour_s
        ), dense AS (
          SELECT s.hour_s, CAST(COALESCE(h.observed, 0) AS BIGINT) AS observed
          FROM spine s LEFT JOIN hourly h USING (hour_s)
        ), trended AS (
          SELECT hour_s, observed,
                 CAST(FLOOR(hour_s / 3600) % 24 AS INT) AS phase,
                 (CASE WHEN COUNT(*) OVER f1 = 24 THEN AVG(observed) OVER f1 END
                  + CASE WHEN COUNT(*) OVER f2 = 24 THEN AVG(observed) OVER f2 END
                 ) / 2 AS t
          FROM dense
          WINDOW f1 AS (ORDER BY hour_s ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING),
                 f2 AS (ORDER BY hour_s ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)
        ), pm AS (
          SELECT phase, AVG(observed - t) AS m
          FROM trended WHERE t IS NOT NULL GROUP BY phase
        ), centered AS (
          SELECT phase, m - (SELECT AVG(m) FROM pm) AS s FROM pm
        )
        SELECT hour_s, t.phase, observed,
               ROUND(t.t * 10000) / 10000 + 0 AS trend,
               ROUND(c.s * 10000) / 10000 + 0 AS seasonal,
               CASE WHEN t.t IS NOT NULL
                    THEN ROUND((observed - t.t - c.s) * 10000) / 10000 + 0 END AS resid
        FROM trended t JOIN centered c ON t.phase = c.phase
        """
    ).fetchdf()
    assert len(spdf) == len(opdf) > 48
    s_cols, s_rows = canonical_rows(spdf)
    o_cols, o_rows = canonical_rows(opdf)
    assert s_cols == o_cols
    assert s_rows == o_rows
    # dense hourly spine, no gaps
    hs = sorted(spdf["hour_s"])
    assert set(np.diff(hs)) == {3600}
    # additivity wherever trend exists (4dp rounding tolerance)
    mid = spdf[spdf["trend"].notna()]
    assert len(mid) == len(spdf) - 24
    gap = (mid["observed"] - mid["trend"] - mid["seasonal"] - mid["resid"]).abs()
    assert float(gap.max()) < 2e-4
    # seasonal indices: periodic (one value per phase) and centered
    per_phase = spdf.groupby("phase")["seasonal"].nunique()
    assert set(per_phase) == {1}
    assert abs(float(spdf.groupby("phase")["seasonal"].first().sum())) < 24 * 1e-4 + 1e-6
    # exactly the 12 leading + 12 trailing hours lack trend
    edge = spdf[spdf["trend"].isna()].sort_values("hour_s")
    assert list(edge["hour_s"]) == hs[:12] + hs[-12:]


def test_events_path_trigrams_duckdb_pinned(spark, sf_dir, oracle_con):
    """events_path_trigrams (rows-only, r13): the equivalent DuckDB SQL
    through the driver's canonical-rows compare — the top-20 cut is
    deterministic because the order is total (n desc, path asc) — plus
    the row-count invariant: total trigrams = events − 2·users (each
    user's last two events start no trigram)."""
    spdf = QUERIES["events_path_trigrams"](spark, sf_dir).toPandas()
    opdf = oracle_con.execute(
        """
        WITH seq AS (
          SELECT event_type,
                 lead(event_type, 1) OVER w AS e2,
                 lead(event_type, 2) OVER w AS e3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), c AS (
          SELECT event_type || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
          FROM seq WHERE e3 IS NOT NULL GROUP BY 1
        )
        SELECT path, CAST(n AS BIGINT) AS n,
               ROUND(n * 10000.0 / SUM(n) OVER ()) / 10000 AS frac
        FROM c ORDER BY n DESC, path ASC LIMIT 20
        """
    ).fetchdf()
    assert len(spdf) == len(opdf) == 20
    s_cols, s_rows = canonical_rows(spdf)
    o_cols, o_rows = canonical_rows(opdf)
    assert s_cols == o_cols
    assert s_rows == o_rows
    want_tri, n_tri = oracle_con.execute(
        """SELECT (SELECT SUM(GREATEST(c - 2, 0)) FROM (
                     SELECT COUNT(*) AS c FROM events GROUP BY user_id)),
                  (SELECT COUNT(*) FROM (
                     SELECT lead(event_type, 2) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS e3
                     FROM events) WHERE e3 IS NOT NULL)"""
    ).fetchone()
    # per-user trigram starts are max(0, c-2) — a plain n_events-2*users
    # over-counts users with fewer than 2 events
    assert n_tri == want_tri


def test_source_fixed_width_duckdb_pinned(spark, sf_dir, oracle_con):
    """source_fixed_width (rows-only, r13): the equivalent DuckDB
    substring/trim/cast SQL over the same file through the driver's
    canonical-rows compare, plus: every row parses (no NULLs from the
    casts) and the result equals the CSV fixture rows exactly (the two
    fixtures share the same logical content)."""
    from n2kupdate_spark.queries.scans import _CSV_ROWS, _FW_PATH

    spdf = QUERIES["source_fixed_width"](spark, sf_dir).toPandas()
    opdf = oracle_con.execute(
        f"""
        SELECT CAST(TRIM(SUBSTRING(line, 1, 6)) AS BIGINT) AS id,
               TRIM(SUBSTRING(line, 7, 12)) AS name,
               CAST(TRIM(SUBSTRING(line, 19, 8)) AS DOUBLE) AS score
        FROM read_csv('{_FW_PATH}', columns={{'line': 'VARCHAR'}},
                      delim='|', header=false, quote='')
        """
    ).fetchdf()
    assert len(spdf) == len(opdf) == len(_CSV_ROWS)
    s_cols, s_rows = canonical_rows(spdf)
    o_cols, o_rows = canonical_rows(opdf)
    assert s_cols == o_cols
    assert s_rows == o_rows
    assert not spdf["id"].isna().any() and not spdf["score"].isna().any()
    got = {(r.id, r.name, r.score) for r in spdf.itertuples(index=False)}
    assert got == set(_CSV_ROWS)


def test_agg_gini_concentration_duckdb_pinned(spark, sf_dir, oracle_con):
    """agg_gini_concentration (rows-only, r13): the equivalent DuckDB
    SQL through the driver's canonical-rows compare, plus the bounds
    0 ≤ G < 1 and a hand-computed planted check of the sorted-rank
    identity."""
    spdf = QUERIES["agg_gini_concentration"](spark, sf_dir).toPandas()
    opdf = oracle_con.execute(
        """
        WITH rev AS (
          SELECT o_custkey, SUM(o_totalprice) AS rev
          FROM orders GROUP BY o_custkey
        ), tagged AS (
          SELECT c.c_nationkey, r.rev, r.o_custkey FROM rev r
          JOIN customer c ON c.c_custkey = r.o_custkey
        ), ranked AS (
          SELECT c_nationkey, rev,
                 ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                    ORDER BY rev ASC, o_custkey ASC) AS i
          FROM tagged
        )
        SELECT c_nationkey, COUNT(*) AS n_customers,
               ROUND(SUM(rev) * 10000) / 10000 AS total_revenue,
               ROUND((2.0 * SUM(i * rev) / (COUNT(*) * SUM(rev))
                      - (COUNT(*) + 1.0) / COUNT(*)) * 10000) / 10000 + 0
                 AS gini
        FROM ranked GROUP BY c_nationkey
        """
    ).fetchdf()
    assert len(spdf) == len(opdf) > 0
    s_cols, s_rows = canonical_rows(spdf)
    o_cols, o_rows = canonical_rows(opdf)
    assert s_cols == o_cols
    assert s_rows == o_rows
    assert (spdf["gini"] >= 0).all() and (spdf["gini"] < 1).all()
    # planted identity check: values 1,2,3,4 -> G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    x = [1.0, 2.0, 3.0, 4.0]
    g = 2 * sum((i + 1) * v for i, v in enumerate(sorted(x))) / (len(x) * sum(x)) - (len(x) + 1) / len(x)
    assert abs(g - 0.25) < 1e-12


def test_agg_welch_ttest_duckdb_pinned(spark, sf_dir, oracle_con):
    """agg_welch_ttest (rows-only, r13): the equivalent DuckDB SQL
    through the driver's canonical-rows compare, plus the A/A
    calibration contract on the hash-parity split (unmanipulated data:
    at most one of the five types may flag at the 5% level) and a
    planted separated-cohorts check that the statistic actually fires."""
    spdf = QUERIES["agg_welch_ttest"](spark, sf_dir).toPandas()
    opdf = oracle_con.execute(
        """
        WITH agg AS (
          SELECT event_type,
                 SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
                 SUM(CASE WHEN user_id % 2 = 0 THEN value END) AS sa,
                 SUM(CASE WHEN user_id % 2 = 0 THEN value * value END) AS qa,
                 SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS nb,
                 SUM(CASE WHEN user_id % 2 = 1 THEN value END) AS sb,
                 SUM(CASE WHEN user_id % 2 = 1 THEN value * value END) AS qb
          FROM events WHERE value IS NOT NULL GROUP BY event_type
        ), calc AS (
          SELECT event_type, na, nb, sa / na AS ma, sb / nb AS mb,
                 ((qa - na * (sa/na) * (sa/na)) / (na - 1)) / na AS ea,
                 ((qb - nb * (sb/nb) * (sb/nb)) / (nb - 1)) / nb AS eb
          FROM agg
        )
        SELECT event_type,
               CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               ROUND(ma * 10000) / 10000 + 0 AS mean_a,
               ROUND(mb * 10000) / 10000 + 0 AS mean_b,
               ROUND((ma - mb) / SQRT(ea + eb) * 10000) / 10000 + 0 AS t_stat,
               ROUND((ea + eb) * (ea + eb)
                     / (ea * ea / (na - 1) + eb * eb / (nb - 1)) * 10000) / 10000 + 0
                 AS welch_df,
               ABS((ma - mb) / SQRT(ea + eb)) >= 1.96 AS significant
        FROM calc
        """
    ).fetchdf()
    assert len(spdf) == len(opdf) > 0
    s_cols, s_rows = canonical_rows(spdf)
    o_cols, o_rows = canonical_rows(opdf)
    assert s_cols == o_cols
    assert s_rows == o_rows
    assert int(spdf["significant"].sum()) <= 1  # A/A calibration
    # planted power check via the same algebra in python
    import numpy as np

    rng = np.random.RandomState(4)
    a = rng.randn(400) + 1.0
    b = rng.randn(300)
    ea = a.var(ddof=1) / len(a)
    eb = b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(ea + eb)
    assert abs(t) > 5  # the statistic separates a genuinely shifted cohort


def test_bootstrap_ci_matches_python_and_coverage(spark):
    """r14: Poisson-bootstrap CIs ≡ an independent pure-python
    recompute of the full spec (scalar-int splitmix64 + inverse-CDF
    Poisson(1) — no numpy in the reference path) at two sfs, exact row
    equality; DETERMINISM — two runs identical; planted coverage — a
    N(5,1) cohort's 95% CI contains 5, and quadrupling n shrinks the
    interval roughly in half."""
    import math

    import numpy as np

    from n2kupdate_spark.operators.bootstrap import bootstrap_mean_ci
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    MASK = (1 << 64) - 1

    def sm64(x):
        z = (x + 0x9E3779B97F4A7C15) & MASK
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
        return z ^ (z >> 31)

    CDF = []
    acc = 0.0
    for k in range(12):
        acc += math.exp(-1.0) / math.factorial(k)
        CDF.append(acc)

    def pois(oid, b, n_reps):
        u = sm64((oid * n_reps + b) & MASK) / 2**64
        for k, t in enumerate(CDF):
            if u < t:
                return k
        return 12

    def ref(rows, n_reps=200, alpha=0.05):
        groups = {}
        for g, oid, x in rows:
            groups.setdefault(g, []).append((oid, x))
        out = {}
        for g, items in groups.items():
            n = len(items)
            sx = sum(x for _i, x in items)
            means = []
            for b in range(n_reps):
                sw = swx = 0.0
                for oid, x in items:
                    w = pois(oid, b, n_reps)
                    sw += w
                    swx += w * x
                if sw > 0:
                    means.append(swx / sw)
            means.sort()
            B = len(means)
            lo = means[max(1, math.ceil(alpha / 2 * B)) - 1]
            hi = means[min(B, math.ceil((1 - alpha / 2) * B)) - 1]
            mu = sum(means) / B
            se = math.sqrt(sum((m - mu) ** 2 for m in means) / (B - 1))
            r4 = lambda v: float(np.round(v * 10000) / 10000 + 0.0)  # noqa: E731
            out[g] = (n, r4(sx / n), r4(lo), r4(hi), r4(se))
        return out

    # the scalar per-replica reference and the vectorized matrix must
    # agree per (id, b) — poisson_weights IS the spec the matrix claims
    from n2kupdate_spark.operators.bootstrap import (
        poisson_weight_matrix,
        poisson_weights,
    )

    ids = np.array([1, 7, 123456789, 2**40 + 3], dtype=np.int64)
    Wm = poisson_weight_matrix(ids, 16)
    for b in range(16):
        assert (Wm[:, b] == poisson_weights(ids, b, 16)).all(), b

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["o_orderpriority"], int(r["o_orderkey"]), float(r["o_totalprice"]))
            for r in load(
                spark, sf, "orders",
                columns=["o_orderpriority", "o_orderkey", "o_totalprice"],
            ).collect()
        ]
        want = ref(rows)
        got = {
            r["o_orderpriority"]: (r["n"], r["mean"], r["ci_lo"], r["ci_hi"], r["se"])
            for r in QUERIES["agg_bootstrap_ci"](spark, sf).collect()
        }
        assert got == want, sf
        again = {
            r["o_orderpriority"]: (r["n"], r["mean"], r["ci_lo"], r["ci_hi"], r["se"])
            for r in QUERIES["agg_bootstrap_ci"](spark, sf).collect()
        }
        assert again == got

    rng = np.random.RandomState(12)
    small = [("s", i, float(5.0 + rng.randn())) for i in range(200)]
    big = [("b", i + 1000, float(5.0 + v)) for i, v in enumerate(rng.randn(800))]
    df = spark.createDataFrame(
        small + big, "grp: string, rid: long, v: double"
    )
    got = {
        r["grp"]: r
        for r in bootstrap_mean_ci(df, "grp", "rid", "v").collect()
    }
    sm = {"s": float(np.mean([v for _g, _i, v in small])),
          "b": float(np.mean([v for _g, _i, v in big]))}
    for g in ("s", "b"):
        # the percentile CI centers on the SAMPLE mean (a 95% CI misses
        # the true 5.0 for ~5% of seeds — that would be a flaky pin);
        # analytic width 2·1.96·σ/√n within generous slack
        assert got[g]["ci_lo"] <= sm[g] <= got[g]["ci_hi"], g
        w = got[g]["ci_hi"] - got[g]["ci_lo"]
        expect = 2 * 1.96 / math.sqrt({"s": 200, "b": 800}[g])
        assert 0.6 * expect <= w <= 1.5 * expect, (g, w, expect)
    w_small = got["s"]["ci_hi"] - got["s"]["ci_lo"]
    w_big = got["b"]["ci_hi"] - got["b"]["ci_lo"]
    assert w_big < w_small * 0.75  # ~sqrt(4)=2x narrower, slack for noise


def test_power_mde_matches_numpy_and_closed_form(spark):
    """r14: the power table ≡ a numpy same-formula recompute at two
    sfs; closed-form pin: a planted N(100, σ=10) pair of 1000-row
    cohorts must read mde_abs ≈ 2.8·√(2)·10/√1000 ≈ 1.24 and
    n_per_cohort_for_1pct ≈ 2.8²·2·100/1 ≈ 1569; the mde shrinks
    with √n (quadrupling both cohorts halves it)."""
    import numpy as np

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    from pyspark.sql import functions as F

    Z = 1.96 + 0.8416
    r4 = lambda v: float(np.round(v * 10000) / 10000 + 0.0)  # noqa: E731

    def ref(rows):
        out = {}
        by = {}
        for t, u, v in rows:
            by.setdefault(t, ([], []))[u % 2].append(v)
        for t, (even, odd) in by.items():
            a, b = np.array(even), np.array(odd)
            va, vb = a.var(ddof=1), b.var(ddof=1)
            mde = Z * np.sqrt(va / len(a) + vb / len(b))
            pm = (a.sum() + b.sum()) / (len(a) + len(b))
            d = pm * 0.01
            n = int(np.ceil(Z * Z * (va + vb) / (d * d)))
            out[t] = (len(a), len(b), r4(mde), r4(mde / pm * 100), n)
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["event_type"], int(r["user_id"]), float(r["value"]))
            for r in load(spark, sf, "events", columns=["event_type", "user_id", "value"])
            .filter(F.col("value").isNotNull())
            .collect()
        ]
        want = ref(rows)
        got = {
            r["event_type"]: (
                r["n_a"], r["n_b"], r["mde_abs"], r["mde_pct_of_mean"],
                r["n_per_cohort_for_1pct"],
            )
            for r in QUERIES["agg_power_mde"](spark, sf).collect()
        }
        # cohort assignment is even/odd user_id in BOTH — but a/b order
        # must match the query's (even = a)
        assert got == want, sf

    rng = np.random.RandomState(6)
    mk = lambda n, uoff: [  # noqa: E731
        ("t", uoff + i, float(100 + 10 * rng.randn())) for i in range(n)
    ]
    import n2kupdate_spark.queries.aggregates as aggq

    for n, name in ((1000, "n1k"), (4000, "n4k")):
        rows = mk(n, 0) + mk(n, 1)  # even ids cohort a, odd cohort b
        planted = [(t, 2 * i + (u % 2), v) for i, (t, u, v) in enumerate(rows)]
        df = spark.createDataFrame(planted, "event_type: string, user_id: long, value: double")
        orig = aggq.load
        try:
            aggq.load = lambda spark_, sf_, t, columns=None: df
            row = QUERIES["agg_power_mde"](spark, "ignored").collect()[0]
        finally:
            aggq.load = orig
        if name == "n1k":
            mde1k = row["mde_abs"]
            assert abs(row["mde_abs"] - Z * np.sqrt(2) * 10 / np.sqrt(n)) < 0.15
            assert abs(row["n_per_cohort_for_1pct"] - Z * Z * 200) < Z * Z * 200 * 0.15
        else:
            assert abs(row["mde_abs"] - mde1k / 2) < 0.1  # sqrt(4) = 2x


def test_chi2_and_proportion_ztest_match_python(spark):
    """r14: the categorical inference pair. (1) χ² ≡ a numpy recompute
    of the contingency algebra at two sfs (the fixture GENUINELY flags
    — type mix is user-tied — and the recompute confirms the value);
    (2) proportion z ≡ a recompute of the pooled-variance formula at
    two sfs; planted: an independent uniform table reads quiet on χ²,
    a planted rate lift flags on z while equal rates stay quiet, and a
    saturated pool reads NULL z."""
    import math

    import numpy as np

    from pyspark.sql import functions as F

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    r4 = lambda v: float(np.round(v * 10000) / 10000 + 0.0)  # noqa: E731

    def ref_chi2(rows):  # [(type, user)]
        from collections import Counter

        obs = Counter((t, u % 2 == 0) for t, u in rows)
        types = sorted({t for t, _u in rows})
        n = len(rows)
        rt = Counter(t for t, _u in rows)
        ct = Counter(u % 2 == 0 for _t, u in rows)
        chi2 = 0.0
        for t in types:
            for a in (True, False):
                e = rt[t] * ct[a] / n
                if e > 0:
                    chi2 += (obs.get((t, a), 0) - e) ** 2 / e
        df = len(types) - 1
        crit = df * (1 - 2 / (9 * df) + 1.6449 * math.sqrt(2 / (9 * df))) ** 3
        return (n, len(types) * 2, r4(chi2), df, r4(crit), chi2 > crit)

    def ref_z(rows, thresh=14):
        from collections import Counter

        cnt = Counter((t, u) for t, u in rows)
        users = {u for _t, u in rows}
        na = sum(1 for u in users if u % 2 == 0)
        nb = len(users) - na
        out = {}
        for t in sorted({t for t, _u in rows}):
            ca = sum(1 for (tt, u), c in cnt.items() if tt == t and c >= thresh and u % 2 == 0)
            cb = sum(1 for (tt, u), c in cnt.items() if tt == t and c >= thresh and u % 2 != 0)
            pa, pb = ca / na, cb / nb
            pool = (ca + cb) / (na + nb)
            se = math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
            z = (pa - pb) / se if se > 0 else None
            out[t] = (
                na, nb, ca, cb, r4(pa), r4(pb),
                r4(z) if z is not None else None,
                (abs(z) >= 1.96) if z is not None else False,
            )
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["event_type"], int(r["user_id"]))
            for r in load(spark, sf, "events", columns=["event_type", "user_id"]).collect()
        ]
        got = tuple(QUERIES["agg_chi2_independence"](spark, sf).collect()[0])
        assert got == ref_chi2(rows), sf
        gotz = {
            r["event_type"]: tuple(r)[1:]
            for r in QUERIES["agg_proportion_ztest"](spark, sf).collect()
        }
        assert gotz == ref_z(rows), sf

    # planted: uniform-independent table reads quiet on chi2
    import n2kupdate_spark.queries.aggregates as aggq

    rng = np.random.RandomState(15)
    planted = [
        (["a", "b", "c"][rng.randint(3)], int(u))
        for u in range(400) for _ in range(10)
    ]
    df = spark.createDataFrame(planted, "event_type: string, user_id: long")
    orig = aggq.load
    try:
        aggq.load = lambda spark_, sf_, t, columns=None: df
        row = QUERIES["agg_chi2_independence"](spark, "ignored").collect()[0]
    finally:
        aggq.load = orig
    assert row["dependent"] is False, dict(row.asDict())

    # planted z: cohort a converts at 0.8, b at 0.2 on type 'x' (odd
    # users with u%10<3 are only u%10==1 — 1 of 5 odd residues); type
    # 'y' equal rates; type 'z' saturates (NULL z)
    zrows = []
    for u in range(200):
        k = 20 if (u % 2 == 0 and u % 10 < 8) or (u % 2 == 1 and u % 10 < 3) else 5
        zrows += [("x", u)] * k
        zrows += [("y", u)] * (20 if u % 4 < 2 else 5)  # 0.5 in BOTH cohorts
        zrows += [("z", u)] * 20
    zdf = spark.createDataFrame(zrows, "event_type: string, user_id: long")
    try:
        aggq.load = lambda spark_, sf_, t, columns=None: zdf
        gotz = {
            r["event_type"]: r
            for r in QUERIES["agg_proportion_ztest"](spark, "ignored").collect()
        }
    finally:
        aggq.load = orig
    assert gotz["x"]["significant"] is True and gotz["x"]["z_stat"] > 1.96
    assert gotz["y"]["significant"] is False
    assert gotz["z"]["z_stat"] is None  # saturated pool


def test_power_mde_zero_pooled_mean_reads_null(spark):
    """r15 (ADVICE): a zero-centered metric (pooled mean exactly 0)
    must read NULL for the %-of-mean framing and the 1%-lift n —
    under ANSI mode (Spark 4 default) the unguarded division threw
    DIVIDE_BY_ZERO and failed the whole query."""
    import n2kupdate_spark.queries.aggregates as aggq
    from n2kupdate_spark.queries import QUERIES

    rows = []
    for u in range(100):
        # even users (cohort a) alternate ±2, odd users ±1 — both
        # cohort sums are 0, so the pooled mean is exactly 0 while the
        # variances (and therefore mde_abs) stay positive
        v = (2.0 if u % 2 == 0 else 1.0) * (1 if (u // 2) % 2 == 0 else -1)
        rows.append(("zero", u, v))
    df = spark.createDataFrame(
        rows, "event_type: string, user_id: long, value: double"
    )
    orig = aggq.load
    try:
        aggq.load = lambda spark_, sf_, t, columns=None: df
        got = {
            r["event_type"]: r
            for r in QUERIES["agg_power_mde"](spark, "ignored").collect()
        }
    finally:
        aggq.load = orig
    r = got["zero"]
    assert r["mde_abs"] is not None and r["mde_abs"] > 0
    assert r["mde_pct_of_mean"] is None  # undefined, not a crash
    assert r["n_per_cohort_for_1pct"] is None


def test_bootstrap_ci_string_ids_match_prehashed_longs(spark):
    """r15 (ADVICE): a string id column (url-keyed data) must work —
    xxhash64 seeds the replica hash, equal to pre-hashing the ids to
    long by hand; previously the int64 cast died deep inside the Arrow
    task with an opaque error. Determinism across reruns holds."""
    import numpy as np
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.bootstrap import bootstrap_mean_ci

    rng = np.random.RandomState(7)
    rows = [
        ("g", f"https://example.org/doc/{i}", float(5.0 + rng.randn()))
        for i in range(300)
    ]
    rows += [("h", f"key-{i}", float(2.0 + rng.randn())) for i in range(200)]
    df = spark.createDataFrame(rows, "grp: string, url: string, v: double")
    got = {r["grp"]: r for r in bootstrap_mean_ci(df, "grp", "url", "v").collect()}
    pre = df.select("grp", F.xxhash64("url").alias("rid"), "v")
    want = {r["grp"]: r for r in bootstrap_mean_ci(pre, "grp", "rid", "v").collect()}
    for g in ("g", "h"):
        assert got[g].asDict() == want[g].asDict(), g
        assert got[g]["ci_lo"] <= got[g]["mean"] <= got[g]["ci_hi"], g
    again = {r["grp"]: r for r in bootstrap_mean_ci(df, "grp", "url", "v").collect()}
    assert {g: r.asDict() for g, r in again.items()} == {
        g: r.asDict() for g, r in got.items()
    }


def test_mann_whitney_u_matches_numpy_and_planted(spark):
    """r15: MWU ≡ an independent numpy recompute (argsort-based
    midranks — a different algorithmic path from the engine's
    collapsed count-cumsum ranks) at two sfs; planted: a stochastic
    shift between cohorts must flag, an identical-distribution pair
    must not, and a heavily-tied frame exercises the tie-corrected σ."""
    import numpy as np
    from pyspark.sql import functions as F

    import n2kupdate_spark.queries.aggregates as aggq
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    r4 = lambda v: float(np.round(v * 10000) / 10000 + 0.0)  # noqa: E731

    def midranks(vals):
        order = np.argsort(vals, kind="mergesort")
        ranks = np.empty(len(vals))
        sv = vals[order]
        i = 0
        while i < len(sv):
            j = i
            while j + 1 < len(sv) and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    def ref(rows):
        by = {}
        for t, u, v in rows:
            by.setdefault(t, ([], []))[u % 2].append(v)
        out = {}
        for t, (even, odd) in by.items():
            x = np.array(even + odd, dtype=float)
            na, nb = len(even), len(odd)
            rk = midranks(x)
            ra = rk[:na].sum()
            u_ = ra - na * (na + 1) / 2
            mu = na * nb / 2
            _vals, counts = np.unique(x, return_counts=True)
            tie3 = float((counts.astype(float) ** 3 - counts).sum())
            n = na + nb
            var = na * nb / 12 * ((n + 1) - (tie3 / (n * (n - 1)) if n > 1 else 0.0))
            z = (u_ - mu) / np.sqrt(var) if var > 0 else None
            out[t] = (
                na, nb, r4(u_),
                None if z is None else r4(z),
                bool(z is not None and abs(z) >= 1.96),
            )
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["event_type"], int(r["user_id"]), float(r["value"]))
            for r in load(spark, sf, "events", columns=["event_type", "user_id", "value"])
            .filter(F.col("value").isNotNull())
            .collect()
        ]
        want = ref(rows)
        got = {
            r["event_type"]: (
                r["n_a"], r["n_b"], r["u_stat"], r["z_stat"], r["significant"]
            )
            for r in QUERIES["agg_mann_whitney_u"](spark, sf).collect()
        }
        assert got == want, sf

    rng = np.random.RandomState(21)
    rows = []
    for u in range(400):
        # "shift": cohort a stochastically larger; "same": identical law;
        # "tied": values from a 4-point lattice — the tie-corrected branch
        base = rng.randn()
        rows.append(("shift", u, float(base + (0.6 if u % 2 == 0 else 0.0))))
        rows.append(("same", u, float(rng.randn())))
        rows.append(("tied", u, float(rng.randint(0, 4))))
    df = spark.createDataFrame(rows, "event_type: string, user_id: long, value: double")
    orig = aggq.load
    try:
        aggq.load = lambda spark_, sf_, t, columns=None: df
        got = {
            r["event_type"]: r
            for r in QUERIES["agg_mann_whitney_u"](spark, "ignored").collect()
        }
    finally:
        aggq.load = orig
    assert got["shift"]["significant"] is True and got["shift"]["z_stat"] > 1.96
    assert got["same"]["significant"] is False
    want = ref([(t, u, v) for t, u, v in rows if t == "tied"])["tied"]
    assert (
        got["tied"]["u_stat"], got["tied"]["z_stat"]
    ) == (want[2], want[3])


def test_kruskal_wallis_matches_numpy_and_planted(spark):
    """r15: KW H ≡ an independent numpy recompute (argsort midranks,
    scipy's tie-corrected formula) at two sfs; planted: one shifted
    group among five must flag the omnibus, five identical groups must
    not."""
    import numpy as np
    from pyspark.sql import functions as F

    import n2kupdate_spark.queries.aggregates as aggq
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    r4 = lambda v: float(np.round(v * 10000) / 10000 + 0.0)  # noqa: E731

    def ref(rows):
        groups = {}
        for t, v in rows:
            groups.setdefault(t, []).append(v)
        labels = sorted(groups)
        x = np.concatenate([np.array(groups[t], dtype=float) for t in labels])
        sizes = [len(groups[t]) for t in labels]
        order = np.argsort(x, kind="mergesort")
        ranks = np.empty(len(x))
        sv = x[order]
        i = 0
        while i < len(sv):
            j = i
            while j + 1 < len(sv) and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        n = len(x)
        sr2, pos = 0.0, 0
        for sz in sizes:
            sr2 += ranks[pos : pos + sz].sum() ** 2 / sz
            pos += sz
        _vals, counts = np.unique(x, return_counts=True)
        tie3 = float((counts.astype(float) ** 3 - counts).sum())
        h = (12.0 / (n * (n + 1)) * sr2 - 3 * (n + 1)) / (1 - tie3 / (n**3 - n))
        k = len(labels)
        dfree = float(k - 1)
        whf = 1 - 2 / (9 * dfree) + 1.6449 * np.sqrt(2 / (9 * dfree))
        return (k, n, r4(h), int(dfree), bool(h >= dfree * whf**3))

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["event_type"], float(r["value"]))
            for r in load(spark, sf, "events", columns=["event_type", "value"])
            .filter(F.col("value").isNotNull())
            .collect()
        ]
        want = ref(rows)
        [got] = QUERIES["agg_kruskal_wallis"](spark, sf).collect()
        assert (got["k"], got["n"], got["h_stat"], got["df"], got["significant"]) == want, sf

    rng = np.random.RandomState(8)
    shifted = [("g4", float(rng.randn() + 1.0)) for _ in range(200)]
    flat = [(f"g{i % 4}", float(rng.randn())) for i in range(800)]
    null_rows = [(f"g{i % 5}", float(rng.randn())) for i in range(1000)]
    df_build = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "event_type: string, value: double"
    )
    orig = aggq.load
    try:
        aggq.load = lambda spark_, sf_, t, columns=None: df_build(flat + shifted)
        [got_shift] = QUERIES["agg_kruskal_wallis"](spark, "ignored").collect()
        aggq.load = lambda spark_, sf_, t, columns=None: df_build(null_rows)
        [got_null] = QUERIES["agg_kruskal_wallis"](spark, "ignored").collect()
    finally:
        aggq.load = orig
    assert got_shift["significant"] is True and got_shift["k"] == 5
    assert got_null["significant"] is False


def test_spearman_corr_matches_numpy_and_planted(spark):
    """r15: per-group Spearman rho ≡ an independent numpy recompute
    (argsort midranks + np.corrcoef — a different rank path from the
    engine's rank()+tie-count windows) at two sfs; planted: a perfect
    monotone nonlinear pair reads 1.0, a reversed pair −1.0, an
    independent pair ≈ 0, and a tied lattice matches the midrank
    recompute exactly."""
    import numpy as np
    from pyspark.sql import functions as F

    import n2kupdate_spark.queries.aggregates as aggq
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    r4 = lambda v: float(np.round(v * 10000) / 10000 + 0.0)  # noqa: E731

    def midranks(vals):
        order = np.argsort(vals, kind="mergesort")
        ranks = np.empty(len(vals))
        sv = np.asarray(vals)[order]
        i = 0
        while i < len(sv):
            j = i
            while j + 1 < len(sv) and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    def ref(rows):
        by = {}
        for g, x, y in rows:
            by.setdefault(g, []).append((x, y))
        out = {}
        for g, pts in by.items():
            xs = np.array([p[0] for p in pts], dtype=float)
            ys = np.array([p[1] for p in pts], dtype=float)
            rho = float(np.corrcoef(midranks(xs), midranks(ys))[0, 1])
            out[g] = (len(pts), r4(rho))
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (
                r["lang"],
                float(r["n_chars"]),
                float(len([t for t in (r["text"] or "").strip().split() if t])),
            )
            for r in load(spark, sf, "documents", columns=["lang", "text", "n_chars"]).collect()
        ]
        want = ref(rows)
        got = {
            r["lang"]: (r["n"], r["spearman_rho"])
            for r in QUERIES["agg_spearman_corr"](spark, sf).collect()
        }
        assert got == want, sf
        assert all(rho > 0.9 for _n, rho in got.values())  # planted monotone truth

    rng = np.random.RandomState(13)
    # planted frames fed through the REGISTERED query: text is built as
    # "w " * k so the engine's whitespace word count is exactly k
    x = rng.uniform(1, 100, 300)
    rows = []
    for i, v in enumerate(x):
        rows.append(("mono", int(v * 10), "w " * (int(v) + 1)))          # y monotone in x
        rows.append(("anti", int(v * 10), "w " * (101 - int(v))))        # y anti-monotone
        rows.append(("indep", int(v * 10), "w " * (1 + int(rng.uniform(0, 50)))))
        rows.append(("tied", int(v) % 5, "w " * (1 + int(v) % 3)))       # lattice ties
    df = spark.createDataFrame(rows, "lang: string, n_chars: long, text: string")
    orig = aggq.load
    try:
        aggq.load = lambda spark_, sf_, t, columns=None: df
        got = {
            r["lang"]: (r["n"], r["spearman_rho"])
            for r in QUERIES["agg_spearman_corr"](spark, "ignored").collect()
        }
    finally:
        aggq.load = orig
    want = ref(
        [
            (g, float(nc), float(len(t.strip().split())))
            for g, nc, t in rows
        ]
    )
    assert got == want
    assert got["mono"][1] > 0.99
    assert got["anti"][1] < -0.99
    assert abs(got["indep"][1]) < 0.15


def test_cliffs_delta_matches_pairwise_and_planted(spark):
    """r15: Cliff's δ via the rank identity ≡ the LITERAL O(n²)
    pairwise count P(a>b) − P(a<b) (the definition, ties counted as
    neither) at two sfs — proving the identity exact under ties;
    planted: full dominance reads δ = 1, reversed −1, identical
    distributions ≈ 0/negligible, a known small shift lands in its
    Romano band."""
    import numpy as np
    from pyspark.sql import functions as F

    import n2kupdate_spark.queries.aggregates as aggq
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    r4 = lambda v: float(np.floor(v * 10000 + 0.5) / 10000 + 0.0)  # noqa: E731

    def band(d):
        ad = abs(d)
        return (
            "negligible" if ad < 0.147 else "small" if ad < 0.33
            else "medium" if ad < 0.474 else "large"
        )

    # half-up floor — δ is a small-integer ratio (review r15)

    def ref(rows):
        by = {}
        for t, u, v in rows:
            by.setdefault(t, ([], []))[u % 2].append(v)
        out = {}
        for t, (ea, eb) in by.items():
            A, B = np.array(ea)[:, None], np.array(eb)[None, :]
            gt = (A > B).sum()
            lt = (A < B).sum()
            d = (gt - lt) / (len(ea) * len(eb))
            out[t] = (len(ea), len(eb), r4(d), band(r4(d)))
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["event_type"], int(r["user_id"]), float(r["value"]))
            for r in load(spark, sf, "events", columns=["event_type", "user_id", "value"])
            .filter(F.col("value").isNotNull())
            .collect()
        ]
        want = ref(rows)
        got = {
            r["event_type"]: (r["n_a"], r["n_b"], r["cliffs_delta"], r["magnitude"])
            for r in QUERIES["agg_cliffs_delta"](spark, sf).collect()
        }
        assert got == want, sf

    rng = np.random.RandomState(19)
    rows = []
    for u in range(400):
        rows.append(("dom", u, float(u % 2 + 2 * (1 - u % 2) * 10 + (u % 2) * 0)))
        rows.append(("same", u, float(rng.randint(0, 5))))  # heavy ties
    # dom: cohort a (even u) all 20s, cohort b (odd u) all 1s — δ = 1
    df = spark.createDataFrame(rows, "event_type: string, user_id: long, value: double")
    orig = aggq.load
    try:
        aggq.load = lambda spark_, sf_, t, columns=None: df
        got = {
            r["event_type"]: r
            for r in QUERIES["agg_cliffs_delta"](spark, "ignored").collect()
        }
    finally:
        aggq.load = orig
    assert got["dom"]["cliffs_delta"] == 1.0 and got["dom"]["magnitude"] == "large"
    # single-cohort group (all even user_ids): no cross pairs — NULL δ and
    # NULL band, never 'large' (review r15)
    solo = spark.createDataFrame(
        [("solo", 2 * i, 1.0 * i) for i in range(20)],
        "event_type: string, user_id: long, value: double",
    )
    orig2 = aggq.load
    try:
        aggq.load = lambda spark_, sf_, t, columns=None: solo
        [r_solo] = QUERIES["agg_cliffs_delta"](spark, "ignored").collect()
    finally:
        aggq.load = orig2
    assert r_solo["cliffs_delta"] is None and r_solo["magnitude"] is None
    want_same = ref([(t, u, v) for t, u, v in rows if t == "same"])["same"]
    assert (got["same"]["cliffs_delta"], got["same"]["magnitude"]) == (
        want_same[2], want_same[3]
    )
    assert abs(got["same"]["cliffs_delta"]) < 0.147


def test_fdr_bh_matches_python_and_planted(spark):
    """r15: BH table ≡ a python same-formula recompute (A–S erf, own
    step-up walk) at two sfs; planted: strongly shifted cohorts flag
    under FDR while null types stay quiet, the step-up property holds
    (every rank ≤ the largest passing rank flags, including ranks whose
    OWN p exceeds their threshold), and an all-null planted frame
    flags nothing."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    import n2kupdate_spark.queries.aggregates as aggq
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    r4 = lambda v: float(np.round(v * 10000) / 10000 + 0.0)  # noqa: E731
    ALPHA = 0.05

    def phi_as(x):
        u = 1.0 / (1.0 + 0.3275911 * x)
        poly = u * (0.254829592 + u * (-0.284496736 + u * (1.421413741
                + u * (-1.453152027 + u * 1.061405429))))
        return 0.5 * (1.0 + (1.0 - poly * math.exp(-x * x)))

    def ref(rows):
        by = {}
        for t, u, v in rows:
            by.setdefault(t, ([], []))[u % 2].append(v)
        stats = []
        for t, (a, b) in by.items():
            A, B = np.array(a), np.array(b)
            tt = (A.mean() - B.mean()) / math.sqrt(
                A.var(ddof=1) / len(A) + B.var(ddof=1) / len(B)
            )
            p = 2.0 * (1.0 - phi_as(abs(tt) / math.sqrt(2.0)))
            stats.append((t, tt, p))
        stats.sort(key=lambda s: (s[2], s[0]))
        m = len(stats)
        cutoff = max(
            (i for i, (_t, _tt, p) in enumerate(stats, 1) if p <= i * ALPHA / m),
            default=0,
        )
        return {
            t: (r4(tt), r4(p), i, r4(i * ALPHA / m), i <= cutoff)
            for i, (t, tt, p) in enumerate(stats, 1)
        }

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["event_type"], int(r["user_id"]), float(r["value"]))
            for r in load(spark, sf, "events", columns=["event_type", "user_id", "value"])
            .filter(F.col("value").isNotNull())
            .collect()
        ]
        want = ref(rows)
        got = {
            r["event_type"]: (
                r["t_stat"], r["p_value"], r["p_rank"], r["bh_threshold"],
                r["significant_fdr"],
            )
            for r in QUERIES["agg_fdr_bh"](spark, sf).collect()
        }
        assert got == want, sf

    rng = np.random.RandomState(27)
    rows = []
    for u in range(600):
        base = float(rng.randn())
        rows.append(("big1", u, base + (1.0 if u % 2 == 0 else 0.0)))
        rows.append(("big2", u, base + (0.8 if u % 2 == 0 else 0.0)))
        for i in range(4):
            rows.append((f"null{i}", u, float(rng.randn())))
    # advice r15: a type whose t is UNDEFINED (single-cohort data → NULL p)
    # must not take p_rank 1, inflate m, or read significant — it emits
    # NULL rank/threshold/flag and leaves every other type's BH row as if
    # it were absent
    rows.append(("solo", 0, 1.0))
    rows.append(("solo", 2, 2.0))
    df = spark.createDataFrame(rows, "event_type: string, user_id: long, value: double")
    orig = aggq.load
    try:
        aggq.load = lambda spark_, sf_, t, columns=None: df
        got = {
            r["event_type"]: r for r in QUERIES["agg_fdr_bh"](spark, "ignored").collect()
        }
        allnull = spark.createDataFrame(
            [(f"n{i % 6}", u, float(rng.randn())) for i, u in enumerate(range(3000))],
            "event_type: string, user_id: long, value: double",
        )
        aggq.load = lambda spark_, sf_, t, columns=None: allnull
        got_null = {
            r["event_type"]: r for r in QUERIES["agg_fdr_bh"](spark, "ignored").collect()
        }
    finally:
        aggq.load = orig
    assert got["big1"]["significant_fdr"] is True
    assert got["big2"]["significant_fdr"] is True
    assert not any(got[f"null{i}"]["significant_fdr"] for i in range(4))
    # the untested type: NULL p ⇒ NULL rank/threshold/flag, and it does
    # not inflate m (6 tested hypotheses ⇒ max threshold = 6·α/6 = α)
    solo = got.pop("solo")
    assert solo["p_value"] is None
    assert solo["p_rank"] is None
    assert solo["bh_threshold"] is None
    assert solo["significant_fdr"] is None
    # step-up property on the engine output itself: flags are exactly the
    # prefix up to the largest rank whose own p passes
    rows_sorted = sorted(got.values(), key=lambda r: r["p_rank"])
    assert [r["p_rank"] for r in rows_sorted] == list(range(1, 7))
    assert abs(rows_sorted[-1]["bh_threshold"] - ALPHA) < 1e-12
    cutoff = max((r["p_rank"] for r in rows_sorted if r["p_value"] <= r["bh_threshold"]), default=0)
    assert all((r["p_rank"] <= cutoff) == r["significant_fdr"] for r in rows_sorted)
    assert not any(r["significant_fdr"] for r in got_null.values())


def test_anova_oneway_matches_python_and_planted(spark):
    """r16: the one-way ANOVA row ≡ a numpy same-formula recompute
    (own group loop, own SSB/SSW/F and Wilson–Hilferty gate) at two
    sfs; planted: five identical-law groups stay quiet, one shifted
    group flags the omnibus."""
    import numpy as np
    from pyspark.sql import functions as F

    import n2kupdate_spark.queries.aggregates as aggq
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    r4 = lambda v: float(np.floor(v * 10000 + 0.5) / 10000 + 0.0)  # noqa: E731

    def ref(rows):
        by = {}
        for t, v in rows:
            by.setdefault(t, []).append(v)
        groups = [np.array(g) for g in by.values()]
        k = len(groups)
        n = sum(len(g) for g in groups)
        grand = sum(g.sum() for g in groups) / n
        ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
        ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        dfb = float(k - 1)
        whf = 1 - 2 / (9 * dfb) + 1.6449 * np.sqrt(2 / (9 * dfb))
        crit = dfb * whf**3 / dfb
        return (k, n, r4(ssb), r4(ssw), r4(f), k - 1, n - k, bool(f >= crit))

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["event_type"], float(r["value"]))
            for r in load(spark, sf, "events", columns=["event_type", "value"])
            .filter(F.col("value").isNotNull())
            .collect()
        ]
        (got,) = QUERIES["agg_anova_oneway"](spark, sf).collect()
        assert (
            got["k"], got["n"], got["ss_between"], got["ss_within"],
            got["f_stat"], got["df_between"], got["df_within"],
            got["significant"],
        ) == ref(rows), sf

    rng = np.random.RandomState(65)
    quiet = [(f"g{i % 5}", 0, float(rng.randn())) for i in range(3000)]
    loud = [
        (f"g{i % 5}", 0, float(rng.randn() + (0.5 if i % 5 == 0 else 0.0)))
        for i in range(3000)
    ]
    orig = aggq.load
    try:
        for rows, want_flag in ((quiet, False), (loud, True)):
            df = spark.createDataFrame(
                rows, "event_type: string, user_id: long, value: double"
            )
            aggq.load = lambda s, sf_, t, columns=None, _df=df: _df.select(
                *(columns or _df.columns)
            )
            (got,) = QUERIES["agg_anova_oneway"](spark, "ignored").collect()
            assert got["significant"] is want_flag, dict(got.asDict())
        # ssw = 0, ssb > 0: internally-constant groups at different
        # levels are F = +inf — the MOST significant case (review r16:
        # the NULL-coalesced flag used to read False)
        const = [(f"g{i % 3}", 0, float(i % 3)) for i in range(300)]
        df = spark.createDataFrame(
            const, "event_type: string, user_id: long, value: double"
        )
        aggq.load = lambda s, sf_, t, columns=None, _df=df: _df.select(
            *(columns or _df.columns)
        )
        (got,) = QUERIES["agg_anova_oneway"](spark, "ignored").collect()
        assert got["significant"] is True and got["f_stat"] is None, dict(
            got.asDict()
        )
        # ssw = ssb = 0 (every value identical): no evidence, stays quiet
        flat = [(f"g{i % 3}", 0, 7.0) for i in range(300)]
        df = spark.createDataFrame(
            flat, "event_type: string, user_id: long, value: double"
        )
        aggq.load = lambda s, sf_, t, columns=None, _df=df: _df.select(
            *(columns or _df.columns)
        )
        (got,) = QUERIES["agg_anova_oneway"](spark, "ignored").collect()
        assert got["significant"] is False, dict(got.asDict())
    finally:
        aggq.load = orig


def test_levene_bf_matches_python_and_planted(spark):
    """r16: the Brown–Forsythe row ≡ a numpy recompute (own medians,
    own |x−med| ANOVA) at two sfs; planted: equal-variance groups with
    WILDLY different means stay quiet (median-centering makes BF
    mean-insensitive — the point of the test), one inflated-variance
    group flags."""
    import numpy as np
    from pyspark.sql import functions as F

    import n2kupdate_spark.queries.aggregates as aggq
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    r4 = lambda v: float(np.floor(v * 10000 + 0.5) / 10000 + 0.0)  # noqa: E731

    def ref(rows):
        by = {}
        for t, v in rows:
            by.setdefault(t, []).append(v)
        zg = [np.abs(np.array(g) - np.median(g)) for g in by.values()]
        k = len(zg)
        n = sum(len(z) for z in zg)
        grand = sum(z.sum() for z in zg) / n
        ssb = sum(len(z) * (z.mean() - grand) ** 2 for z in zg)
        ssw = sum(((z - z.mean()) ** 2).sum() for z in zg)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        dfb = float(k - 1)
        whf = 1 - 2 / (9 * dfb) + 1.6449 * np.sqrt(2 / (9 * dfb))
        crit = dfb * whf**3 / dfb
        return (k, n, r4(ssb), r4(ssw), r4(f), bool(f >= crit))

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["event_type"], float(r["value"]))
            for r in load(spark, sf, "events", columns=["event_type", "value"])
            .filter(F.col("value").isNotNull())
            .collect()
        ]
        (got,) = QUERIES["agg_levene_bf"](spark, sf).collect()
        assert (
            got["k"], got["n"], got["ss_between"], got["ss_within"],
            got["f_stat"], got["significant"],
        ) == ref(rows), sf

    rng = np.random.RandomState(62)
    # same unit variance, means 0/10/50/200/1000 → BF must stay quiet
    means = [0.0, 10.0, 50.0, 200.0, 1000.0]
    quiet = [
        (f"g{i % 5}", 0, float(rng.randn() + means[i % 5])) for i in range(3000)
    ]
    # one group at 3x sd → flags
    loud = [
        (
            f"g{i % 5}",
            0,
            float(rng.randn() * (3.0 if i % 5 == 2 else 1.0) + means[i % 5]),
        )
        for i in range(3000)
    ]
    orig = aggq.load
    try:
        for rows, want_flag in ((quiet, False), (loud, True)):
            df = spark.createDataFrame(
                rows, "event_type: string, user_id: long, value: double"
            )
            aggq.load = lambda s, sf_, t, columns=None, _df=df: _df.select(
                *(columns or _df.columns)
            )
            (got,) = QUERIES["agg_levene_bf"](spark, "ignored").collect()
            assert got["significant"] is want_flag, dict(got.asDict())
        # group-constant deviations with DIFFERENT spreads: {0,2} vs
        # {0,100} — every |x−median| is constant within its group, so
        # ssw = 0 while the spreads clearly differ → must flag (r16)
        spread = [("a", 0, float(0 if i % 2 else 2)) for i in range(100)] + [
            ("b", 0, float(0 if i % 2 else 100)) for i in range(100)
        ]
        df = spark.createDataFrame(
            spread, "event_type: string, user_id: long, value: double"
        )
        aggq.load = lambda s, sf_, t, columns=None, _df=df: _df.select(
            *(columns or _df.columns)
        )
        (got,) = QUERIES["agg_levene_bf"](spark, "ignored").collect()
        assert got["significant"] is True, dict(got.asDict())
    finally:
        aggq.load = orig


def test_cohens_d_matches_python_and_planted(spark):
    """r16: the Cohen's-d table ≡ a numpy same-formula recompute
    (own cohort split, pooled sd, Hedges J) at two sfs; planted: an
    exact closed-form effect (unit-variance cohorts one sd apart →
    d ≈ 1, 'large'), equal cohorts → d = 0 'negligible', and a
    single-row cohort emits NULL d/g/band."""
    import numpy as np
    from pyspark.sql import functions as F

    import n2kupdate_spark.queries.aggregates as aggq
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    r4 = lambda v: float(np.floor(v * 10000 + 0.5) / 10000 + 0.0)  # noqa: E731

    def ref(rows):
        by = {}
        for t, u, v in rows:
            by.setdefault(t, ([], []))[u % 2].append(v)
        out = {}
        for t, (a, b) in by.items():
            A, B = np.array(a), np.array(b)
            na, nb = len(A), len(B)
            if na < 2 or nb < 2:
                out[t] = (na, nb, None, None, None)
                continue
            sp2 = ((na - 1) * A.var(ddof=1) + (nb - 1) * B.var(ddof=1)) / (
                na + nb - 2
            )
            sp = np.sqrt(sp2)
            if not sp > 0:
                out[t] = (na, nb, None, None, None)
                continue
            d = (A.mean() - B.mean()) / sp
            j = 1 - 3 / (4 * (na + nb) - 9)
            band = (
                "negligible" if abs(d) < 0.2
                else "small" if abs(d) < 0.5
                else "medium" if abs(d) < 0.8
                else "large"
            )
            out[t] = (na, nb, r4(d), r4(d * j), band)
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["event_type"], int(r["user_id"]), float(r["value"]))
            for r in load(
                spark, sf, "events", columns=["event_type", "user_id", "value"]
            )
            .filter(F.col("value").isNotNull())
            .collect()
        ]
        want = ref(rows)
        got = {
            r["event_type"]: (
                r["n_a"], r["n_b"], r["cohens_d"], r["hedges_g"], r["magnitude"]
            )
            for r in QUERIES["agg_cohens_d"](spark, sf).collect()
        }
        assert got == want, sf

    rng = np.random.RandomState(63)
    rows = []
    for u in range(800):
        base = float(rng.randn())
        rows.append(("one_sd", u, base + (1.0 if u % 2 == 0 else 0.0)))
        # both parity cohorts see the IDENTICAL multiset {0..6 cycling}
        # (users 2j and 2j+1 share a value), so d is exactly 0
        rows.append(("zero", u, float(u // 2 % 7)))
    rows += [("solo", 0, 5.0), ("solo", 2, 6.0)]  # cohort b empty
    df = spark.createDataFrame(rows, "event_type: string, user_id: long, value: double")
    orig = aggq.load
    try:
        aggq.load = lambda s, sf_, t, columns=None: df.select(
            *(columns or df.columns)
        )
        got = {
            r["event_type"]: r
            for r in QUERIES["agg_cohens_d"](spark, "ignored").collect()
        }
    finally:
        aggq.load = orig
    assert got["one_sd"]["magnitude"] == "large"
    assert abs(got["one_sd"]["cohens_d"] - 1.0) < 0.15
    assert got["zero"]["cohens_d"] == 0.0
    assert got["zero"]["magnitude"] == "negligible"
    assert got["solo"]["cohens_d"] is None
    assert got["solo"]["hedges_g"] is None
    assert got["solo"]["magnitude"] is None


def test_jarque_bera_matches_python_and_planted(spark):
    """r16: the JB normality screen ≡ a numpy same-formula recompute
    (own central moments from raw arrays, own exp(−JB/2) p) at two
    sfs; planted: seeded normal draws stay quiet, exponential draws
    (skew 2, excess kurtosis 6) flag hard, an n=7 group and a
    zero-variance group emit NULL stats."""
    import numpy as np
    from pyspark.sql import functions as F

    import n2kupdate_spark.queries.aggregates as aggq
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    def r4(v):
        return None if v is None else float(np.floor(v * 10000 + 0.5) / 10000 + 0.0)

    def ref(rows):
        by = {}
        for t, v in rows:
            by.setdefault(t, []).append(v)
        out = {}
        for t, g in by.items():
            x = np.array(g, dtype=np.float64)
            n = len(x)
            m2 = ((x - x.mean()) ** 2).mean()
            if n < 8 or m2 <= 0:
                out[t] = (n, None, None, None, None, None)
                continue
            skew = ((x - x.mean()) ** 3).mean() / m2**1.5
            kurt = ((x - x.mean()) ** 4).mean() / m2**2 - 3.0
            jb = n / 6.0 * (skew**2 + kurt**2 / 4.0)
            p = float(np.exp(-jb / 2.0))
            out[t] = (n, r4(skew), r4(kurt), r4(jb), r4(p), bool(p < 0.05))
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["event_type"], float(r["value"]))
            for r in load(spark, sf, "events", columns=["event_type", "value"])
            .filter(F.col("value").isNotNull())
            .collect()
        ]
        got = {
            r["event_type"]: (
                r["n"], r["skewness"], r["kurt_excess"], r["jb_stat"],
                r["p_value"], r["normal_rejected"],
            )
            for r in QUERIES["agg_jarque_bera"](spark, sf).collect()
        }
        want = ref(rows)
        # raw-power-sum vs two-pass central moments differ in the last
        # ulps; compare at the op's own 4dp grid with a 1-ulp-of-grid slack
        assert got.keys() == want.keys(), sf
        for t in want:
            gw, ww = got[t], want[t]
            assert gw[0] == ww[0] and gw[5] is ww[5], (sf, t, gw, ww)
            for a, b in zip(gw[1:5], ww[1:5]):
                assert (a is None) == (b is None), (sf, t, gw, ww)
                if a is not None:
                    assert abs(a - b) <= 1e-4, (sf, t, gw, ww)

    rng = np.random.RandomState(7)
    planted = (
        [("normal", 0, float(v)) for v in rng.randn(4000)]
        + [("expo", 0, float(v)) for v in rng.exponential(1.0, 4000)]
        + [("tiny", 0, float(v)) for v in rng.randn(7)]
        + [("const", 0, 3.25)] * 50
    )
    orig = aggq.load
    try:
        df = spark.createDataFrame(
            planted, "event_type: string, user_id: long, value: double"
        )
        aggq.load = lambda s, sf_, t, columns=None, _df=df: _df.select(
            *(columns or _df.columns)
        )
        got = {
            r["event_type"]: r.asDict()
            for r in QUERIES["agg_jarque_bera"](spark, "ignored").collect()
        }
    finally:
        aggq.load = orig
    assert got["normal"]["normal_rejected"] is False, got["normal"]
    assert got["expo"]["normal_rejected"] is True, got["expo"]
    # exponential population: skew 2, excess kurtosis 6 — sample values land near
    assert 1.5 < got["expo"]["skewness"] < 2.6, got["expo"]
    assert got["expo"]["p_value"] == 0.0, got["expo"]
    for t in ("tiny", "const"):
        assert got[t]["jb_stat"] is None and got[t]["normal_rejected"] is None, got[t]
    assert got["tiny"]["n"] == 7 and got["const"]["n"] == 50


def test_pairwise_welch_holm_matches_python_and_planted(spark):
    """r16: the Holm post-hoc table ≡ an independent python recompute
    (own per-pair Welch loop over raw value lists, own step-down walk)
    at two sfs; invariants: p_holm ≥ p, nondecreasing in rank, capped
    at 1; planted: three identical-law groups quiet, one shifted group
    flags EXACTLY its three pairs, a single-row group is untested
    (NULL, takes no rank, doesn't inflate m)."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    import n2kupdate_spark.queries.aggregates as aggq
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    def r4(v):
        return None if v is None else math.floor(v * 10000 + 0.5) / 10000 + 0.0

    def ref(rows):
        by = {}
        for t, v in rows:
            by.setdefault(t, []).append(v)
        raw = []
        for a in sorted(by):
            for b in sorted(by):
                if a >= b:
                    continue
                xa, xb = np.array(by[a]), np.array(by[b])
                if len(xa) < 2 or len(xb) < 2:
                    raw.append([a, b, None, None])
                    continue
                va, vb = xa.var(ddof=1), xb.var(ddof=1)
                se2 = va / len(xa) + vb / len(xb)
                if se2 <= 0:
                    raw.append([a, b, None, None])
                    continue
                t = (xa.mean() - xb.mean()) / math.sqrt(se2)
                p = math.erfc(abs(t) / math.sqrt(2.0))
                raw.append([a, b, t, p])
        tested = sorted(
            (r for r in raw if r[3] is not None), key=lambda r: (r[3], r[0], r[1])
        )
        m = len(tested)
        want, cm = {}, 0.0
        for i, r in enumerate(tested):
            cm = max(cm, (m - i) * r[3])
            want[(r[0], r[1])] = (r4(r[2]), r4(r[3]), i + 1, r4(min(1.0, cm)),
                                  min(1.0, cm) < 0.05)
        for r in raw:
            if r[3] is None:
                want[(r[0], r[1])] = (None, None, None, None, None)
        return want

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["event_type"], float(r["value"]))
            for r in load(spark, sf, "events", columns=["event_type", "value"])
            .filter(F.col("value").isNotNull())
            .collect()
        ]
        got = {
            (r["type_a"], r["type_b"]): (
                r["t_stat"], r["p_value"], r["p_rank"], r["p_holm"],
                r["significant_holm"],
            )
            for r in QUERIES["agg_pairwise_welch_holm"](spark, sf).collect()
        }
        want = ref(rows)
        assert got.keys() == want.keys(), sf
        for k in want:
            ga, wa = got[k], want[k]
            assert ga[2] == wa[2] and ga[4] is wa[4], (sf, k, ga, wa)
            for x, y in zip((ga[0], ga[1], ga[3]), (wa[0], wa[1], wa[3])):
                assert (x is None) == (y is None), (sf, k, ga, wa)
                if x is not None:
                    assert abs(x - y) <= 1e-4, (sf, k, ga, wa)
        ranked = sorted(
            (v for v in got.values() if v[2] is not None), key=lambda v: v[2]
        )
        for prev, cur in zip(ranked, ranked[1:]):
            assert cur[3] >= prev[3] - 1e-12  # step-down monotone
        for v in ranked:
            assert v[3] <= 1.0 and (v[1] is None or v[3] >= v[1] - 1e-12)

    rng = np.random.RandomState(11)
    planted = (
        [(f"g{i % 3}", 0, float(rng.randn())) for i in range(3000)]
        + [("shift", 0, float(rng.randn() + 1.0)) for i in range(1000)]
        + [("lone", 0, 5.0)]
    )
    orig = aggq.load
    try:
        df = spark.createDataFrame(
            planted, "event_type: string, user_id: long, value: double"
        )
        aggq.load = lambda s, sf_, t, columns=None, _df=df: _df.select(
            *(columns or _df.columns)
        )
        got = {
            (r["type_a"], r["type_b"]): r.asDict()
            for r in QUERIES["agg_pairwise_welch_holm"](spark, "ignored").collect()
        }
    finally:
        aggq.load = orig
    assert len(got) == 10  # 5 types -> 10 unordered pairs
    for (a, b), r in got.items():
        touches_shift = "shift" in (a, b)
        touches_lone = "lone" in (a, b)
        if touches_lone:
            assert r["significant_holm"] is None and r["p_rank"] is None, r
        elif touches_shift:
            assert r["significant_holm"] is True, r
        else:
            assert r["significant_holm"] is False, r
    m = max(r["p_rank"] for r in got.values() if r["p_rank"] is not None)
    assert m == 6  # lone never ranked: m counts only tested pairs


def test_tost_equivalence_matches_python_and_planted(spark):
    """r16: the TOST table ≡ a numpy same-formula recompute (own
    conditional moments, own math.erf Φ, own max-p walk) at two sfs;
    planted: same-law cohorts at n=4000 are declared EQUIVALENT, a
    1σ-shifted cohort is NOT (and also fails welch-style symmetry:
    t_lower huge, t_upper also > 0 — the shift pushes both one-sided
    tests the same way), a single-row cohort emits NULL."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    import n2kupdate_spark.queries.aggregates as aggq
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    def r4(v):
        return None if v is None else float(np.floor(v * 10000 + 0.5) / 10000 + 0.0)

    def phi(x):
        return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))

    def ref(rows):
        by = {}
        for t, u, v in rows:
            cs = by.setdefault(t, {0: [], 1: []})
            if u is None:  # NULL user_id: neither cohort (_cohort_moments)
                continue
            cs[0 if int(u) % 2 == 0 else 1].append(v)
        out = {}
        for t, cs in by.items():
            xa, xb = np.array(cs[0]), np.array(cs[1])
            na, nb = len(xa), len(xb)
            if na < 2 or nb < 2:
                out[t] = (na, nb, None)
                continue
            va, vb = xa.var(ddof=1), xb.var(ddof=1)
            sp = math.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
            se = math.sqrt(va / na + vb / nb)
            if sp <= 0 or se <= 0:
                out[t] = (na, nb, None)
                continue
            diff = xa.mean() - xb.mean()
            delta = 0.2 * sp
            t_lo = (diff + delta) / se
            t_hi = (diff - delta) / se
            p = max(1.0 - phi(t_lo), phi(t_hi))
            out[t] = (na, nb, (r4(diff), r4(delta), r4(t_lo), r4(t_hi),
                              r4(p), bool(p < 0.05)))
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = [
            (r["event_type"], r["user_id"], float(r["value"]))
            for r in load(
                spark, sf, "events", columns=["event_type", "user_id", "value"]
            ).filter(F.col("value").isNotNull()).collect()
        ]
        want = ref(rows)
        got = {
            r["event_type"]: r.asDict()
            for r in QUERIES["agg_tost_equivalence"](spark, sf).collect()
        }
        assert got.keys() == want.keys(), sf
        for t in want:
            g = got[t]
            na, nb, w = want[t]
            assert (g["n_a"], g["n_b"]) == (na, nb), (sf, t)
            if w is None:
                assert g["p_tost"] is None and g["equivalent"] is None, (sf, t, g)
                continue
            assert g["equivalent"] is w[5], (sf, t, g, w)
            for a, b in zip(
                (g["diff"], g["margin"], g["t_lower"], g["t_upper"], g["p_tost"]),
                w[:5],
            ):
                assert abs(a - b) <= 1e-4, (sf, t, g, w)

    rng = np.random.RandomState(21)
    planted = (
        [("same", i, float(rng.randn())) for i in range(8000)]
        + [("shift", i, float(rng.randn() + (1.0 if i % 2 == 0 else 0.0)))
           for i in range(8000)]
        + [("tiny", 0, 1.0), ("tiny", 1, 2.0), ("tiny", 3, 2.5)]
    )
    orig = aggq.load
    try:
        df = spark.createDataFrame(
            planted, "event_type: string, user_id: long, value: double"
        )
        aggq.load = lambda s, sf_, t, columns=None, _df=df: _df.select(
            *(columns or _df.columns)
        )
        got = {
            r["event_type"]: r.asDict()
            for r in QUERIES["agg_tost_equivalence"](spark, "ignored").collect()
        }
    finally:
        aggq.load = orig
    assert got["same"]["equivalent"] is True, got["same"]
    assert got["shift"]["equivalent"] is False, got["shift"]
    assert got["shift"]["t_upper"] > 0, got["shift"]  # both pushed same way
    assert got["tiny"]["p_tost"] is None and got["tiny"]["equivalent"] is None
