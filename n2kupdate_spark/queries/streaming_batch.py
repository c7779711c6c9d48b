"""B10 — streaming operators, batch-equivalent forms (SURVEY.md §2 B10).

The reference has no streaming, but its purpose — incremental idempotent
update — is exactly Structured Streaming + foreachBatch merge. These are the
*batch* forms of the streaming aggregations (same logical plans Structured
Streaming runs incrementally); the streaming execution itself (watermarks,
dropDuplicatesWithinWatermark, foreachBatch upsert) lives in
n2kupdate_spark/streaming/ and is smoke-tested in tests/test_streaming.py.

Windowing math is done on epoch seconds so Spark's window() grid (epoch-
aligned, UTC) and the oracle's arithmetic agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from n2kupdate_spark.functions import ts_seconds
from n2kupdate_spark.queries._registry import register
from n2kupdate_spark.sources import load


@register(
    "stream_tumbling_counts",
    oracle="""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_s,
           event_type,
           COUNT(*) AS cnt,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour tumbling counts by event type (streaming: groupBy(window(ts,
    '1 hour'), type) + watermark; identical logical agg here in batch)."""
    e = load(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            ts_seconds(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


@register(
    "stream_sliding_counts",
    oracle="""
    SELECT (CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 900) * 900 - g.k * 900 AS window_start_s,
           COUNT(*) AS cnt
    FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) g
    GROUP BY 1
    """,
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 minutes: each event lands in exactly 4
    windows. Spark uses native window(ts, '1h', '15m') (the streaming
    operator); the oracle enumerates the 4 slide offsets arithmetically."""
    e = load(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "15 minutes")
    return (
        e.groupBy(win.alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(ts_seconds(F.col("w.start")).alias("window_start_s"), "cnt")
    )


@register(
    "stream_session_agg",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, value,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s
        FROM events
    ),
    flagged AS (
        SELECT *,
               CASE WHEN ts_s - lag(ts_s) OVER w > 1800 OR lag(ts_s) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_s ASC, event_id ASC)
    ),
    sessions AS (
        SELECT *,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_s ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           MIN(ts_s) AS session_start_s,
           MAX(ts_s) AS session_end_s,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def stream_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap (streaming:
    session_window(ts, '30 minutes'); here the deterministic lag+cumsum
    formulation both engines share)."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", ts_seconds("ts").alias("ts_s")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts_s").asc(), F.col("event_id").asc())
    flagged = e.withColumn(
        "new_session",
        F.when(
            (F.col("ts_s") - F.lag("ts_s").over(w) > 1800) | F.lag("ts_s").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(cum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts_s").alias("session_start_s"),
        F.max("ts_s").alias("session_end_s"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@register(
    "events_funnel_steps",
    oracle="""
    WITH w1 AS (
        SELECT user_id, event_type, ts,
               MIN(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t_view
        FROM events
    ),
    w2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
                      OVER (PARTITION BY user_id) AS t_click
        FROM w1
    ),
    w3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
                      OVER (PARTITION BY user_id) AS t_purchase
        FROM w2
    ),
    u AS (
        SELECT user_id, MAX(t_view) AS t_view, MAX(t_click) AS t_click,
               MAX(t_purchase) AS t_purchase
        FROM w3 GROUP BY user_id
    )
    SELECT COUNT(t_view) AS n_viewers,
           COUNT(t_click) AS n_clickers,
           COUNT(t_purchase) AS n_purchasers,
           COUNT(*) AS n_users
    FROM u
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click after view → purchase after
    click): how many users reach each stage, respecting event order. Three
    stacked window-min expressions share ONE hash partitioning on user_id —
    Spark plans a single exchange feeding three Window operators and the
    per-user rollup, so the funnel costs one shuffle of the events table no
    matter how many stages the funnel has (vs one self-join per stage in
    the naive form, which is what the oracle's CTE chain mirrors
    logically)."""
    e = load(spark, sf_dir, "events", columns=["user_id", "event_type", "ts"])
    w = Window.partitionBy("user_id")
    staged = (
        e.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").alias("n_viewers"),
        F.count("t_click").alias("n_clickers"),
        F.count("t_purchase").alias("n_purchasers"),
        F.count(F.lit(1)).alias("n_users"),
    )


@register(
    "window_session_builtin",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, value,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s
        FROM events
    ),
    flagged AS (
        SELECT *,
               CASE WHEN ts_s - lag(ts_s) OVER w > 1800 OR lag(ts_s) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_s ASC, event_id ASC)
    ),
    sessions AS (
        SELECT *,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_s ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts_s) AS session_start_s,
           MAX(ts_s) + 1800 AS session_end_s,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def window_session_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's BUILT-IN session_window() in batch mode — the same 30-minute
    sessions as stream_session_agg's manual lag+cumsum form, but planned as
    one SessionWindow aggregation (and usable unchanged under
    readStream+watermark). Boundary semantics the oracle mirrors, PINNED BY
    EXPERIMENT on Spark 4.1 (r6): the session window is END-INCLUSIVE for
    merging — an event at exactly prev_ts + gap JOINS the session (events
    at 00:00 and 00:30 with a 30-min gap merge; 01:00:01 starts anew), so
    a new session begins only when the gap EXCEEDS 1800 s (strict > in the
    oracle's flag). The sf0.001/0.01 fixtures contain no exact-1800 gap —
    both flag forms agree there; the single exact-boundary gap at sf0.1
    (user 511) is what exposed the earlier >= form. Window end = last
    event + gap. One shuffle on user_id either way."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "value", F.date_trunc("second", F.col("ts")).alias("ts")
    )
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp("sw.start").alias("session_start_s"),
            F.unix_timestamp("sw.end").alias("session_end_s"),
            "n_events",
            "total_value",
        )
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH e AS (
        SELECT user_id,
               CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS week_s
        FROM events
    ),
    cohorted AS (
        SELECT user_id, week_s,
               MIN(week_s) OVER (PARTITION BY user_id) AS cohort_s
        FROM e
    )
    SELECT cohort_s,
           CAST((week_s - cohort_s) / 604800 AS BIGINT) AS week_offset,
           COUNT(DISTINCT user_id) AS n_users
    FROM cohorted
    GROUP BY cohort_s, week_offset
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week
    (cohort), counted in every subsequent week they return — the standard
    growth-analytics triangle. One window to stamp each user's cohort +
    one distinct-count aggregate; both shuffles are on user_id/cohort
    keys. Weeks are Monday-truncated in both engines; offsets in whole
    weeks."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp(F.date_trunc("week", F.col("ts"))).alias("week_s"),
    )
    w = Window.partitionBy("user_id")
    cohorted = e.withColumn("cohort_s", F.min("week_s").over(w))
    return (
        cohorted.groupBy(
            "cohort_s",
            ((F.col("week_s") - F.col("cohort_s")) / 604800)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH stats AS (
        SELECT user_id, event_id,
               ROUND(value, 4) AS value,
               AVG(value) OVER w AS mu,
               stddev_samp(value) OVER w AS sigma
        FROM events
        WINDOW w AS (PARTITION BY user_id)
    )
    SELECT user_id, event_id, value,
           ROUND((value - mu) / sigma * 10000) / 10000 AS zscore
    FROM stats
    WHERE sigma > 0 AND ABS((value - mu) / sigma) > 2.5
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outliers (|z| > 2.5) — the statistical form of the
    reference's anomaly tables (store_anomaly flags per-analysis outliers;
    here the flagging rule itself is computed in-engine). One unbounded
    window per user computes mean and stddev in a single user_id exchange;
    the filter then keeps only the anomalous rows, so output ∝ outliers,
    not events. Scale-first rounding on the ratio column (z-scores are
    arbitrary ratios — the 4dp boundary class)."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.round("value", 4).alias("value"), F.col("value").alias("__raw")
    )
    w = Window.partitionBy("user_id")
    stats = e.select(
        "user_id",
        "event_id",
        "value",
        F.avg("__raw").over(w).alias("mu"),
        F.stddev_samp("__raw").over(w).alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        stats.filter((F.col("sigma") > 0) & (F.abs(z) > 2.5))
        .select(
            "user_id",
            "event_id",
            "value",
            (F.round(z * 10000, 0) / 10000).alias("zscore"),
        )
    )


@register(
    "ts_rollup_from_partials",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value) * 10000) / 10000 AS sum_value,
           ROUND(MIN(value) * 10000) / 10000 AS min_value,
           ROUND(MAX(value) * 10000) / 10000 AS max_value,
           ROUND(ROUND(SUM(value) * 10000) / 10000 / COUNT(*) * 10000) / 10000 AS avg_value
    FROM events GROUP BY day
    """,
)
def ts_rollup_from_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup: DAILY aggregates derived from
    HOURLY partials, never re-reading raw rows — the continuous-aggregate
    pattern (TimescaleDB hypertable rollups, Druid/Pinot star-tree levels)
    where each coarser grain merges the next finer one's mergeable state
    (sum/count/min/max; avg re-derived as sum/count at read time, never
    averaged-of-averages). The ORACLE computes the daily level directly
    from raw events, so the hash match proves the partial-merge is
    LOSSLESS, not just plausible.

    avg derives from the ROUNDED sum (the value a stored 4dp partial
    would hold): raw-sum division hit the 4dp boundary at sf0.01 — day
    2024-01-30's mean is exactly 42.55825 and the two engines' different
    addition orders rounded it apart.

    Scale: at 100 TB the hourly partials are the materialized table
    (bounded by hours × keys, not events); every day/week/month reader
    aggregates partials — this query is that reader's exact plan: one
    partial-agged shuffle over hour rows, input size ∝ hours. Float note:
    summing hourly sums reorders additions vs the oracle's raw-row sum;
    at 4dp this is harmless for value-scale data (SURVEY §7.4.2)."""
    e = load(spark, sf_dir, "events", columns=["ts", "value"])
    hourly = (
        e.select(F.date_trunc("hour", "ts").alias("h"), "value")
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
    )
    return (
        hourly.groupBy(F.date_format(F.date_trunc("day", "h"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum("cnt").alias("n_events"),
            (F.round(F.sum("s") * 10000, 0) / 10000).alias("sum_value"),
            (F.round(F.min("mn") * 10000, 0) / 10000).alias("min_value"),
            (F.round(F.max("mx") * 10000, 0) / 10000).alias("max_value"),
            (
                F.round(
                    F.round(F.sum("s") * 10000, 0) / 10000 / F.sum("cnt") * 10000, 0
                )
                / 10000
            ).alias("avg_value"),
        )
    )


@register("events_markov_transitions")  # rows-only debut (capacity policy
# §5.2) — but cross-engine verified anyway: the pytest pin runs the
# equivalent DuckDB SQL through the same canonical-rows compare the
# driver uses (tests/test_parity.py), without spending a rotation slot.
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    for each (event_type → next event_type) pair, the transition count and
    probability — the standard user-behavior model behind funnel
    diagnostics and synthetic-session generation. Ordering is
    deterministic: (ts, event_id) within user.

    Scale shape: one user-keyed window shuffle for the lead(), one
    partial-agged count shuffle, and the per-source normalization runs as
    a window over the COUNTS table (|event_type|² rows — tiny at any
    corpus size). Probability uses scale-first rounding (×1e4, round,
    /1e4) for cross-engine 4dp parity."""
    ev = load(spark, sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select("user_id", "event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
    )
    counts = trans.groupBy("event_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n",
        (F.round(F.col("n") * 10000.0 / F.sum("n").over(tot), 0) / 10000).alias("p"),
    )


@register("events_attribution")  # rows-only debut (capacity policy §5.2)
# — but cross-engine verified anyway: the equivalent DuckDB SQL runs
# through the driver's canonical-rows compare in tests/test_parity.py
# (the events_markov_transitions precedent), plus a planted-journey
# python replay pin.
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution — the marketing-analytics
    staple over event journeys: every `purchase` is attributed to the
    touch events (any non-purchase type) since the user's PREVIOUS
    purchase, under the three standard models at once: first-touch
    (100% to the journey's earliest touch), last-touch (100% to the
    latest touch before the conversion), and linear (1/n to each).
    Conversions with no preceding touch credit the synthetic
    `(direct)` channel in every model, so total credit per model
    equals total conversions (conservation — pinned). Touches after a
    user's final purchase belong to an unconverted journey and earn
    nothing. `linear_value` additionally splits each conversion's
    `value` across its touches. Ordering is deterministic: (ts,
    event_id) within user.

    Scale shape: TWO window shuffles — one user-keyed pass assigns
    journey ids (count of prior conversions, an unbounded-preceding
    running sum), one (user, journey)-keyed pass computes journey
    stats (touch count, touch index, conversion value) where the
    ordered and orderless frames share a single exchange+sort — then
    one partial-agged #channels-row aggregate. No joins, no collects;
    credit assignment is pure per-row arithmetic. Fraction sums use
    scale-first rounding (×1e4, round, /1e4) for cross-engine 4dp
    parity."""
    ev = load(
        spark,
        sf_dir,
        "events",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    return _attribute(ev)


def _attribute(ev: DataFrame, conv_type: str = "purchase") -> DataFrame:
    """Core of :func:`events_attribution` over any (event_id, ts,
    user_id, event_type, value) frame — split out so the planted-journey
    behavior pin drives it directly (tests/test_parity.py)."""
    is_conv = F.col("event_type") == conv_type
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    staged = ev.select(
        "user_id",
        "event_type",
        "value",
        "ts",
        "event_id",
        is_conv.alias("is_conv"),
        F.coalesce(
            F.sum(is_conv.cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("j"),
    )
    wj = Window.partitionBy("user_id", "j")
    wjo = wj.orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    touch = ~F.col("is_conv")
    jstats = staged.select(
        "user_id",
        "event_type",
        "value",
        "is_conv",
        F.sum(touch.cast("long")).over(wj).alias("n_touch"),
        F.max(F.col("is_conv").cast("int")).over(wj).alias("has_conv"),
        F.max(F.when(F.col("is_conv"), F.col("value"))).over(wj).alias("conv_value"),
        F.sum(touch.cast("long")).over(wjo).alias("t_idx"),
    )
    credit = jstats.filter(
        (F.col("has_conv") == 1)
        & (~F.col("is_conv") | (F.col("n_touch") == 0))
    ).select(
        F.when(F.col("is_conv"), F.lit("(direct)"))
        .otherwise(F.col("event_type"))
        .alias("channel"),
        F.when(F.col("is_conv") | (F.col("t_idx") == 1), F.lit(1))
        .otherwise(F.lit(0))
        .alias("first_c"),
        F.when(F.col("is_conv") | (F.col("t_idx") == F.col("n_touch")), F.lit(1))
        .otherwise(F.lit(0))
        .alias("last_c"),
        F.when(F.col("is_conv"), F.lit(1.0))
        .otherwise(F.lit(1.0) / F.col("n_touch"))
        .alias("lin"),
        F.when(F.col("is_conv"), F.col("value"))
        .otherwise(F.col("conv_value") / F.col("n_touch"))
        .alias("lin_v"),
    )
    return credit.groupBy("channel").agg(
        F.sum("first_c").cast("long").alias("first_touch"),
        F.sum("last_c").cast("long").alias("last_touch"),
        (F.round(F.sum("lin") * 10000, 0) / 10000).alias("linear_credit"),
        (F.round(F.sum("lin_v") * 10000, 0) / 10000).alias("linear_value"),
    )


@register("events_rfm_segments")  # rows-only debut (capacity policy
# §5.2) — cross-engine verified anyway: equivalent DuckDB SQL through
# the driver's canonical-rows compare in tests/test_parity.py (the
# markov/attribution precedent).
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic lifecycle model over
    purchase events: per user, Recency (days from last purchase to the
    corpus's max event ts — a deterministic anchor), Frequency
    (purchase count) and Monetary (summed purchase value, 4dp), each
    scored 1–5 by exact quintile (NTILE(5)) with 5 = best (most
    recent / most frequent / highest spend), concatenated into the
    3-digit segment code ('555' = champions, '111' = lost).
    Tie-breaking is total and deterministic: every NTILE orders by
    (metric, user_id).

    Scale shape: one partial-agged shuffle collapses events to ONE row
    per purchasing user; the three NTILE windows then run over that
    #users-row aggregate — orders of magnitude smaller than the event
    log (window input is users, never events). The windows are
    unpartitioned (exact global quintiles need a total order); at a
    billion-user scale swap NTILE for approx_percentile cutoff joins —
    the exact form is the oracle-checkable contract."""
    ev = load(
        spark, sf_dir, "events", columns=["user_id", "event_type", "value", "ts"]
    )
    anchor = ev.agg(F.max("ts")).collect()[0][0]  # bounded: one scalar
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.datediff(F.lit(anchor), F.max("ts")).cast("long").alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            # scale-first: F.round(x, 4) rounds the shortest-decimal repr
            # and splits from DuckDB ROUND(x, 4) on boundary sums — and a
            # divergent monetary would flip NTILE sort positions, not
            # just one cell
            (F.round(F.sum("value") * 10000, 0) / 10000).alias("monetary"),
        )
    )
    r = Window.orderBy(F.col("recency_days").desc(), F.col("user_id"))
    f = Window.orderBy(F.col("frequency").asc(), F.col("user_id"))
    m = Window.orderBy(F.col("monetary").asc(), F.col("user_id"))
    scored = per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5).over(r).alias("r_score"),
        F.ntile(5).over(f).alias("f_score"),
        F.ntile(5).over(m).alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


@register("events_path_trigrams")  # rows-only debut (capacity policy
# §5.2) — cross-engine verified anyway: equivalent DuckDB SQL through
# the driver's canonical-rows compare in tests/test_parity.py (the
# markov/attribution/rfm precedent).
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining — the top-20 three-step event-type paths users
    actually walk ((e₁ → e₂ → e₃) sliding windows over each user's
    (ts, event_id)-ordered stream, counted corpus-wide): the standard
    product-analytics "path analysis" view one level deeper than
    events_markov_transitions' single-step matrix — a high-count
    trigram that the Markov factorization under-predicts is exactly a
    behavioral dependency the first-order model misses. Emits (path
    'a>b>c', n, frac of all trigrams 4dp), top-20 under the TOTAL order
    (n desc, path asc) so the cut is deterministic.

    Scale shape: ONE user-keyed window shuffle (two stacked leads share
    the partition sort), one partial-agged trigram count (cardinality ≤
    |event_type|³ — bounded by the type universe, not traffic), and a
    TakeOrderedAndProject top-20; the total-trigram scalar rides the
    same tiny counts table as a window sum, never a second scan."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    counts = tri.groupBy(
        F.concat_ws(">", "event_type", "e2", "e3").alias("path")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy()
    return (
        counts.select(
            "path",
            "n",
            (F.round(F.col("n") * 10000.0 / F.sum("n").over(tot)) / 10000).alias(
                "frac"
            ),
        )
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(20)
    )


@register("events_window_funnel")  # rows-only (§2 legend: the greedy
# chain DP is sequential, no SQL form); ≡ an independent python replay
# + hand-built chain battery in tests/test_mlprep_props.py
def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel (ClickHouse windowFunnel semantics): per
    user, the deepest view → click → purchase chain completed within 24
    hours of ITS OWN first step — the conversion metric
    events_funnel_steps cannot express (its stages are unconstrained in
    time). Emits (user_id, max_level 0–3).

    Scale: one bucketed Arrow dispatch, O(events × stages)/key,
    len(pattern) doubles of state — see
    operators/timeseries.py::window_funnel."""
    from n2kupdate_spark.operators.timeseries import window_funnel

    ev = load(
        spark, sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"]
    ).select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
    )
    return window_funnel(
        ev, pattern=("view", "click", "purchase"), window_s=86400,
        order_col="event_id",
    )


@register("events_step_latency")  # rows-only (r9 capacity policy):
# ≡ an independent python first-completion replay at two sfs + planted
# chain pins — tests/test_mlprep_props.py
def events_step_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert between funnel steps — the LATENCY view the
    funnel family lacks (events_funnel_steps counts who converts,
    events_window_funnel bounds the whole chain; this says how LONG
    each hop takes): per user, the first 'view', then the first
    'click' AT/after it, then the first 'purchase' at/after that (the
    first-completion chain — the standard product-analytics
    definition); per hop, the converted-user count and the exact
    median/p90 latency in seconds. A growing view→click median is a
    UX regression alarm no conversion-rate metric shows.

    Scale: THREE chained conditional-min windows over the SAME user
    partition (Catalyst reuses one exchange — each step's first-time
    is min(ts WHERE type = s AND ts ≥ prev) over the user window), a
    per-user collapse, then an exact-percentile aggregate over the
    2-row hop table. No Python, no collects; user-window state is two
    longs per row."""
    ev = load(
        spark, sf_dir, "events", columns=["user_id", "event_type", "ts"]
    ).select("user_id", "event_type", ts_seconds("ts").alias("ts_s"))
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts_s"))).over(w)
    s1 = ev.select("user_id", "event_type", "ts_s", t1.alias("__t1"))
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts_s") >= F.col("__t1")),
            F.col("ts_s"),
        )
    ).over(w)
    s2 = s1.select("*", t2.alias("__t2"))
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts_s") >= F.col("__t2")),
            F.col("ts_s"),
        )
    ).over(w)
    s3 = s2.select("*", t3.alias("__t3"))
    per_user = s3.groupBy("user_id").agg(
        F.first("__t1").alias("t1"),
        F.first("__t2").alias("t2"),
        F.first("__t3").alias("t3"),
    )
    hops = per_user.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("view->click").alias("hop"),
                    (F.col("t2") - F.col("t1")).alias("lat"),
                ),
                F.struct(
                    F.lit("click->purchase").alias("hop"),
                    (F.col("t3") - F.col("t2")).alias("lat"),
                ),
            )
        ).alias("h")
    ).select("h.hop", "h.lat").filter(F.col("lat").isNotNull())
    return (
        hops.groupBy("hop")
        .agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.expr("percentile(lat, 0.5)").alias("__med"),
            F.expr("percentile(lat, 0.9)").alias("__p90"),
        )
        .select(
            "hop",
            "n_converted",
            (F.round(F.col("__med") * 10000) / 10000 + 0.0).alias("median_s"),
            (F.round(F.col("__p90") * 10000) / 10000 + 0.0).alias("p90_s"),
        )
        .orderBy("hop")
    )


@register("events_active_users_rolling")  # rows-only (r9 capacity
# policy): ≡ an independent python set-replay at two sfs + planted
# overlap pins — tests/test_mlprep_props.py
def events_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU — the engagement dashboard every product ships:
    per day, DISTINCT active users that day, over the trailing 7 days,
    and over the trailing 30 days (calendar windows ending at the day,
    inclusive). Rolling DISTINCT is not a rolling sum (the same user
    active twice in a week counts once), so no window-sum shortcut is
    correct — the stickiness ratio DAU/MAU is exactly the number such
    a shortcut corrupts.

    Scale shape: the event log first collapses to DISTINCT (user, day)
    pairs (one partial-agged shuffle — the bounded "activity matrix",
    ≤ users × days rows regardless of event volume); each pair then
    CONTRIBUTES itself to the ≤7 / ≤30 target days it falls inside via
    a bounded explode (×30 worst case on the already-collapsed pairs,
    never on raw events), and per-day count_distinct folds partial-
    agged. Emitted day domain (review r14 — the precise rule): every
    day from the first activity to the last that lies within 30 days
    AFTER some active day — a quiet day mid-stream reads dau = 0 with
    its trailing actives (the dashboard wants the zero), days before
    the first or after the last activity emit nothing, and a gap
    longer than 30 days emits nothing past its 30th day.

    The activity matrix is localCheckpointed before the max-day scalar
    read so the clamp costs a cached scan, not a second event-log
    collapse (the kn-fit-table rule)."""
    ev = load(spark, sf_dir, "events", columns=["user_id", "ts"]).select(
        "user_id", F.to_date(F.col("ts")).alias("day")
    )
    # ≤ users × days; checkpointed because BOTH the max-day scalar and
    # the explode consume it
    pairs = ev.distinct().localCheckpoint(eager=True)
    contrib = pairs.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(29))).alias("__off"),
        F.col("day").alias("__active_day"),
    ).select(
        "user_id",
        "__active_day",
        F.date_add(F.col("__active_day"), F.col("__off")).alias("day"),
        "__off",
    )
    # clamp to days that actually exist in the data so the tail emits
    # no phantom future days
    max_day = pairs.agg(F.max("day")).collect()[0][0]
    contrib = contrib.filter(F.col("day") <= F.lit(max_day))
    rolled = contrib.groupBy("day").agg(
        F.count_distinct(F.when(F.col("__off") == 0, F.col("user_id"))).alias("dau"),
        F.count_distinct(
            F.when(F.col("__off") <= 6, F.col("user_id"))
        ).alias("wau"),
        F.count_distinct("user_id").alias("mau"),
    )
    return rolled.select(
        "day",
        "dau",
        "wau",
        "mau",
        (F.floor(F.col("dau") * 10000.0 / F.col("mau") + 0.5) / 10000).alias(
            "stickiness"
        ),
    ).orderBy("day")


@register("events_survival_km")  # rows-only (r9 capacity policy): ≡
# python dict-based KM recompute + textbook planted cohort —
# tests/test_mlprep_props.py
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier time-to-conversion curve from the raw event log —
    the survival-analysis member of the events family
    (retention_cohorts reads a grid of return RATES; this estimates
    the conversion-time FUNCTION with censoring handled correctly,
    which naive "%% converted by day t" numbers get wrong for every
    user whose observation window is still open): subject = user,
    the event = first HIGH-VALUE purchase (value ≥ 150 — ~45%% of the
    fixture's users ever have one, so both branches are real at every
    sf), duration = days from the user's first event to that purchase,
    CENSORED at (observation end − first event) for users still
    without one when the data ends. Product-limit estimate
    S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ), nᵢ = subjects with duration ≥ tᵢ
    (Kaplan & Meier 1958). Emits per duration day:
    (day, n_risk, n_converted, n_censored, survival) — S(t) here reads
    "probability a user is still conversion-free after t days".

    Scale shape: one (user)-keyed conditional first/min collapse (the
    only data-sized shuffle — the conversion time rides the same
    aggregate as the entry time, never a second pass), the observation
    end inlined as a literal (single-scalar driver agg — the IDF/BNLJ
    rule), a (day) count aggregate to #distinct-days rows, then the
    at-risk reverse cumsum and the product-limit fold (F.product
    window — same left-to-right double multiply order as numpy
    cumprod, so pins compare exactly) run on that bounded table.
    Scale-first 4dp."""
    from pyspark.sql import Window

    VALUE_MIN = 150.0
    ev = load(
        spark, sf_dir, "events", columns=["user_id", "ts", "event_type", "value"]
    ).select("user_id", ts_seconds("ts").alias("s"), "event_type", "value")
    conv = (F.col("event_type") == "purchase") & (F.col("value") >= VALUE_MIN)
    per_user = ev.groupBy("user_id").agg(
        F.min("s").alias("first_s"),
        F.min(F.when(conv, F.col("s"))).alias("conv_s"),
    )
    end_s = int(ev.agg(F.max("s")).collect()[0][0])  # 1 scalar — inlined
    subjects = per_user.select(
        F.floor(
            (F.coalesce(F.col("conv_s"), F.lit(end_s)) - F.col("first_s")) / 86400
        ).alias("day"),
        F.col("conv_s").isNotNull().alias("converted"),
    )
    days = subjects.groupBy("day").agg(
        F.sum(F.col("converted").cast("long")).alias("n_converted"),
        F.sum((~F.col("converted")).cast("long")).alias("n_censored"),
    )
    w_risk = (
        Window.orderBy(F.col("day").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_surv = (
        Window.orderBy(F.col("day").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_risk = days.withColumn(
        "n_risk", F.sum(F.col("n_converted") + F.col("n_censored")).over(w_risk)
    )
    # S(t) is a product of small-integer ratios — exact 4dp halves are
    # live (n_risk = 32 ⇒ 1/32 factors): half-up floor in op AND pin
    r4 = lambda c: F.floor(c * 10000 + 0.5) / 10000 + 0.0  # noqa: E731
    return at_risk.select(
        "day",
        "n_risk",
        "n_converted",
        "n_censored",
        r4(
            F.product(1 - F.col("n_converted") / F.col("n_risk")).over(w_surv)
        ).alias("survival"),
    ).orderBy("day")
