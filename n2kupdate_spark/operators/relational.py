"""Relational operators Spark lacks as single built-ins: as-of join and
keep-latest dedup, built from window functions so they scale with the shuffle.

Reference anchors: "current analysis_version = latest version per analysis"
(⟨pub⟩ R/store_analysis_version.R [M], SURVEY.md §2 B3/B4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence,
) -> DataFrame:
    """One row per key, keeping the first row under ``order_by`` (pass
    descending columns for "latest"). ``order_by`` must be a total order
    within each key for deterministic results (SURVEY.md §7.4.4).

    Scale: single hash-partition shuffle on ``keys``; no join. Skewed keys
    are handled by AQE; for pathological skew pre-aggregate with ``max_by``.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    right_tiebreak: str,
    tolerance: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row gets the payload of the most recent right
    row with ``right_ts <= left_ts`` for the same key (left-outer semantics:
    unmatched left rows keep NULL payloads). ``tolerance`` (same units
    as the ts columns, r14) additionally requires
    ``left_ts − right_ts <= tolerance`` — the pandas ``merge_asof``
    parameter: a quote older than the staleness budget is worse than
    no quote, so it nulls out rather than silently joining (INCLUSIVE
    bound, matching pandas; pinned against merge_asof in
    tests/test_merge_props.py).

    Implementation is the *union + running last_value* formulation, not a
    join: tag right rows side=0 and left rows side=1, sort each key partition
    by (ts, side, tiebreak), and carry the latest right row forward with
    ``last(ignorenulls=True)`` over an unbounded-preceding frame. Right rows
    tied on ts resolve to the greatest ``right_tiebreak``.

    The payload is carried as ONE struct per right row, not per-column:
    per-column ``last(ignorenulls)`` would let a newer right row with a NULL
    field fail to supersede an older non-null value — and could mix fields
    from different right rows. The struct is non-null whenever a right row
    exists (even with all-NULL fields), so the carried value is always the
    latest row atomically and its NULLs propagate, matching DuckDB/pandas
    ASOF semantics (property-tested in tests/test_merge_props.py).

    ``direction`` (r15 — the full pandas ``merge_asof`` surface):
    ``"backward"`` (default, the semantics above), ``"forward"`` (the
    EARLIEST right row with ``right_ts >= left_ts`` — tolerance bounds
    ``right_ts − left_ts``), ``"nearest"`` (whichever of the two is
    closer in time; exact ties take the backward row, matching pandas —
    pinned against merge_asof for all three in
    tests/test_merge_props.py). Same-ts right duplicates follow the
    pandas positional convention for a (ts, tiebreak)-sorted frame:
    backward resolves to the GREATEST ``right_tiebreak`` (last
    positional), forward to the SMALLEST (first positional).

    Scale: one shuffle on the key, zero row explosion — the join+filter+
    row_number formulation materializes every (left, right-earlier) pair,
    which is quadratic per key; this is linear and is the standard
    merge-as-of pattern at 100 TB. ``nearest`` adds a second SORT over
    the same key partitioning, not a second shuffle (both windows
    partition on ``on``).
    """
    from pyspark.sql import types as T

    on = list(on)
    payload_cols = list(payload_cols)
    r_types = {f.name: f.dataType for f in right.schema.fields}
    payload_t = T.StructType(
        [T.StructField(c, r_types[c]) for c in payload_cols]
        + [T.StructField("__rts", T.DoubleType())]
    )

    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_tiebreak).alias("__tb"),
        # the right row's own ts rides INSIDE the carried struct so the
        # tolerance gate can age-check the carried row at the left row
        F.struct(
            *[F.col(c).alias(c) for c in payload_cols],
            F.col(right_ts).cast("double").alias("__rts"),
        ).alias("__p"),
    )
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_types[right_tiebreak]).alias("__tb"),
        F.lit(None).cast(payload_t).alias("__p"),
    )
    # Align schemas: right side lacks left's columns.
    for c in left_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r = r.select(*l.columns)

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    unioned = l.unionByName(r)
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward mirror: scanning ts DESC, the carried right row is the
    # EARLIEST right_ts >= left_ts; at equal ts rights sort before lefts
    # (inclusive bound). Same-ts right duplicates resolve to the
    # SMALLEST tiebreak (tb DESC ⇒ smallest seen last) — pandas
    # merge_asof takes the FIRST positional duplicate going forward and
    # the LAST going backward, so with the frame sorted by (ts, tb)
    # forward = smallest tb, backward = greatest tb (review r15, pinned
    # with explicit duplicate rows in tests/test_merge_props.py)
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").desc(), F.col("__side").asc(), F.col("__tb").desc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cols = list(unioned.columns)
    carried = unioned
    if direction in ("backward", "nearest"):
        carried = carried.select(
            *carried.columns,
            F.last(F.col("__p"), ignorenulls=True).over(w_back).alias("__cb"),
        )
    if direction in ("forward", "nearest"):
        carried = carried.select(
            *carried.columns,
            F.last(F.col("__p"), ignorenulls=True).over(w_fwd).alias("__cf"),
        )

    lts = F.col("__ts").cast("double")

    def _age(c):  # age in epoch-second units, NULL when no carried row
        return F.abs(lts - F.col(c).getField("__rts"))

    if direction == "backward":
        chosen = F.col("__cb")
    elif direction == "forward":
        chosen = F.col("__cf")
    else:
        back_age, fwd_age = _age("__cb"), _age("__cf")
        chosen = (
            F.when(F.col("__cb").isNull(), F.col("__cf"))
            .when(F.col("__cf").isNull(), F.col("__cb"))
            # exact tie -> backward (pandas convention)
            .when(fwd_age < back_age, F.col("__cf"))
            .otherwise(F.col("__cb"))
        )
    carried = carried.select(*cols, chosen.alias("__cp"))
    fresh = (
        F.lit(True)
        if tolerance is None
        # cast __ts like __rts was: timestamp − double fails analysis,
        # and the tolerance is defined in epoch-second units anyway
        else _age("__cp") <= F.lit(float(tolerance))
    )
    out = carried.filter(F.col("__side") == 1).select(
        *left_cols,
        *[
            F.when(fresh, F.col("__cp").getField(c)).alias(c)
            for c in payload_cols
        ],
    )
    return out
