"""The merge/upsert family — the reference's core semantics as pure
DataFrame transforms.

Reference analog (SURVEY.md §2 B11, §3.1): every n2kupdate ``store_*``
function stages a batch then runs server-side merge SQL — insert-missing
(anti-join), update-changed (SCD1), close-removed (SCD2 / set-replacement)
— inside a transaction (⟨pub⟩ R/store_language.R, R/store_analysis.R,
R/store_location_group_location.R [H/M]).

Here each merge is a *pure function of (current_state, incoming_batch)*:
  - idempotent: ``merge(merge(t, b), b) == merge(t, b)`` (tested),
  - retry-safe and oracle-checkable (no side effects, no now()),
  - executed as joins/unions, so Catalyst plans them and they scale with the
    shuffle (no driver-side row loops — SURVEY.md §7.1 design rule).

The JDBC execution of the same logic (staging table + server-side MERGE) is
``n2kupdate_spark.sources.jdbc`` — that sink *uses* these semantics.

Scale notes: every transform is key-partitioned joins + unions only. The
incoming batch is typically ≪ target; Spark/AQE broadcast the small side
automatically. ``merge_set_replace`` touches only groups present in the
batch, so the common "replace one group's membership" case never rewrites
unrelated groups' rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_scd1(target: DataFrame, incoming: DataFrame, keys: Sequence[str]) -> DataFrame:
    """SCD type-1 upsert: new keys inserted, existing keys' attributes
    overwritten by the incoming row.

    Reference: dimension-table INSERT-missing + UPDATE-changed pattern
    (⟨pub⟩ R/store_language.R et al. [H]).
    """
    keys = list(keys)
    kept = target.join(incoming.select(*keys), on=keys, how="left_anti")
    return incoming.unionByName(kept)


def merge_insert_ignore(target: DataFrame, incoming: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Append-only insert-if-absent: existing keys keep their *target* row.

    Reference: versioned-entity append — analysis version chains are
    append-only (⟨pub⟩ R/store_analysis.R [M]).
    """
    keys = list(keys)
    new_rows = incoming.join(target.select(*keys), on=keys, how="left_anti")
    return target.unionByName(new_rows)


def merge_set_replace(
    target: DataFrame, incoming: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Set-replacement membership merge: for every group present in the
    incoming batch, the membership set is replaced wholesale; groups absent
    from the batch are untouched.

    Reference: ``store_location_group_location`` / ``store_species_group_species``
    (⟨pub⟩ [M], SURVEY.md §2 B11 ``merge_set_replace``).
    """
    group_cols = list(group_cols)
    touched = incoming.select(*group_cols).distinct()
    untouched = target.join(touched, on=group_cols, how="left_anti")
    return incoming.unionByName(untouched)


def merge_scd2_close(
    target: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    batch_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD type-2 / validity-window merge over membership rows.

    ``target`` carries ``valid_from``/``valid_to`` (NULL = open); ``incoming``
    is the new full key set. Open target rows absent from incoming are closed
    at ``batch_ts``; keys new to the target are opened at ``batch_ts``;
    matching open rows are untouched. Closed target rows pass through.

    ``batch_ts`` is an explicit string literal, never now() — the reference
    uses a destroy-timestamp; we make it a parameter so the merge is
    deterministic and oracle-checkable (SURVEY.md §7.4.7).
    """
    keys = list(keys)
    open_rows = target.filter(F.col(valid_to).isNull())
    closed_rows = target.filter(F.col(valid_to).isNotNull())

    still_open = open_rows.join(incoming.select(*keys), on=keys, how="left_semi")
    to_close = open_rows.join(incoming.select(*keys), on=keys, how="left_anti").withColumn(
        valid_to, F.lit(batch_ts)
    )
    opened = (
        incoming.join(open_rows.select(*keys), on=keys, how="left_anti")
        .withColumn(valid_from, F.lit(batch_ts))
        .withColumn(valid_to, F.lit(None).cast("string"))
    )
    return (
        closed_rows  # history rows pass through untouched
        .unionByName(still_open)
        .unionByName(to_close)
        .unionByName(opened.select(*still_open.columns))
    )


def merge_scd2_changes(
    target: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    batch_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD type-2 merge WITH attribute-change detection — the full classic:

    - open target rows whose key is absent from incoming → closed at
      ``batch_ts``;
    - open rows whose key matches with *identical* compare_cols → untouched;
    - open rows whose key matches with *different* compare_cols → closed at
      ``batch_ts`` AND a new version opened at ``batch_ts`` with the
      incoming attributes (close-and-reopen);
    - keys new to the target → opened at ``batch_ts``;
    - already-closed history rows pass through.

    This is :func:`merge_scd2_close` (presence-only) extended with the
    update-changed branch of :func:`merge_scd1` — i.e. the versioned form
    of the reference's insert-missing/update-changed/close-removed triple
    in one transform. Attribute comparison is null-safe (``eqNullSafe``).
    Contract: ``target`` columns are exactly keys + compare_cols +
    validity columns; ``incoming`` is keys + compare_cols.

    Scale: ONE full-outer join of open rows vs the batch, keyed on the key
    columns alone, followed by a projection that emits each joined row's
    0-2 output versions as an exploded array — no window, no driver work;
    idempotent (re-applying the same batch changes nothing —
    property-tested). The single-join shape matters twice at 100 TB: the
    earlier union-of-filtered-branches formulation made Catalyst plan the
    join once PER BRANCH (4 scans + 4 shuffles of the target), and folding
    the branch predicates into join conditions turned the null-safe
    attribute comparisons into extra equi-join keys — which broke
    co-located (bucketed-on-key) layouts with re-shuffles. With the join
    on the keys only, a target and staging batch bucketed on the merge key
    run this merge with zero exchanges (tests/test_plans.py)."""
    keys = list(keys)
    compare_cols = list(compare_cols)
    open_rows = target.filter(F.col(valid_to).isNull())
    closed_rows = target.filter(F.col(valid_to).isNotNull())

    i = incoming.select(
        *keys,
        F.lit(1).alias("__in_inc"),
        *[F.col(c).alias(f"__i_{c}") for c in compare_cols],
    )
    j = open_rows.withColumn("__in_tgt", F.lit(1)).join(i, on=keys, how="full")

    changed: Column = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"__i_{c}"))
    in_tgt = F.col("__in_tgt").isNotNull()
    in_inc = F.col("__in_inc").isNotNull()

    def _version(cols: list[Column], vf: Column, vt: Column) -> Column:
        return F.struct(
            *[c.alias(f"_{n}") for n, c in zip(compare_cols, cols)],
            vf.cast("string").alias("_vf"),
            vt.cast("string").alias("_vt"),
        )

    tgt_attrs = [F.col(c) for c in compare_cols]
    inc_attrs = [F.col(f"__i_{c}") for c in compare_cols]
    null_ts = F.lit(None).cast("string")
    keep_open = _version(tgt_attrs, F.col(valid_from), null_ts)
    close_tgt = _version(tgt_attrs, F.col(valid_from), F.lit(batch_ts))
    open_inc = _version(inc_attrs, F.lit(batch_ts), null_ts)

    versions = (
        F.when(in_tgt & in_inc & ~changed, F.array(keep_open))
        .when(in_tgt & in_inc & changed, F.array(close_tgt, open_inc))
        .when(in_tgt & ~in_inc, F.array(close_tgt))
        .otherwise(F.array(open_inc))
    )
    merged_open = (
        j.select(*keys, F.explode(versions).alias("__v"))
        .select(
            *keys,
            *[F.col(f"__v._{c}").alias(c) for c in compare_cols],
            F.col("__v._vf").alias(valid_from),
            F.col("__v._vt").alias(valid_to),
        )
    )
    tgt_cols = keys + compare_cols + [valid_from, valid_to]
    return closed_rows.select(*tgt_cols).unionByName(merged_open)


def full_outer_diff(
    target: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    change_col: str = "change",
) -> DataFrame:
    """Full diff of incoming vs target: classify each key as
    insert / update / delete / unchanged.

    Reference: the union of the merge branches in every store function —
    made explicit so a pipeline can route rows (SURVEY.md §2
    ``join_full_outer_diff``).

    Output: key columns + ``change`` + target/incoming values of the compared
    columns (``<c>_old`` / ``<c>_new``).
    """
    keys = list(keys)
    t = target.select(
        *[F.col(k) for k in keys],
        F.lit(1).alias("__in_target"),
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
    )
    i = incoming.select(
        *[F.col(k) for k in keys],
        F.lit(1).alias("__in_incoming"),
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
    )
    joined = t.join(i, on=keys, how="full")

    changed: Column = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))

    classify = (
        F.when(F.col("__in_target").isNull(), F.lit("insert"))
        .when(F.col("__in_incoming").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.withColumn(change_col, classify).drop("__in_target", "__in_incoming")


def scd2_asof(
    history: DataFrame,
    as_of: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time reconstruction over an SCD2 validity-window history:
    the rows live at ``as_of`` are those with ``valid_from <= as_of`` and an
    open or later-closing window. The read-side complement of
    :func:`merge_scd2_close` — together they give write/read round-trip over
    versioned state (the reference's destroy-timestamp tables are queried
    exactly this way ⟨pub⟩ R/store_species_group_species.R [M]).

    Timestamps are ISO-format strings, so lexicographic comparison is
    chronological in every engine. A pure filter: partition-pruning-friendly
    at scale if the history is stored partitioned on date(valid_from)."""
    return history.filter(
        (F.col(valid_from) <= F.lit(as_of))
        & (F.col(valid_to).isNull() | (F.col(valid_to) > F.lit(as_of)))
    )


def merge_scd3(
    target: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    tracked_col: str,
    prev_col: str | None = None,
) -> DataFrame:
    """SCD type-3 merge: the dimension keeps the CURRENT value of one
    tracked attribute plus its immediately-previous value in a
    ``prev_`` column — the "limited history" design (Kimball's SCD3)
    for attributes where downstream only ever asks "what was it
    before?" (a segment migration, a reclassification) and a full SCD2
    row chain is overkill.

    Branch semantics (the standard SCD1/SCD3 hybrid — non-tracked
    attributes follow SCD1):
      - overlap, tracked attribute CHANGED (null-safe compare): the
        incoming row wins, ``prev`` := the target's old current value;
      - overlap, unchanged: the target row passes through untouched
        (``prev`` keeps whatever history it held — re-applying the same
        batch is a no-op, the family's idempotence contract);
      - target-only keys: untouched;
      - incoming-only keys: inserted with ``prev`` NULL (no history).

    Pure joins/unions on the key columns — AQE broadcasts the batch
    side; no window, no sort."""
    keys = list(keys)
    prev_col = prev_col or f"prev_{tracked_col}"
    dtype = target.schema[tracked_col].dataType
    inc = incoming.select(
        *keys,
        *[c for c in incoming.columns if c not in keys],
    )
    t_alias, i_alias = target.alias("__t"), inc.alias("__i")
    overlap = t_alias.join(i_alias, on=keys, how="inner")
    changed = overlap.filter(
        ~F.col(f"__i.{tracked_col}").eqNullSafe(F.col(f"__t.{tracked_col}"))
    ).select(
        *keys,
        *[
            F.col(f"__i.{c}").alias(c)
            for c in inc.columns
            if c not in keys
        ],
        F.col(f"__t.{tracked_col}").cast(dtype).alias(prev_col),
    )
    unchanged = overlap.filter(
        F.col(f"__i.{tracked_col}").eqNullSafe(F.col(f"__t.{tracked_col}"))
    ).select(*[F.col(f"__t.{c}").alias(c) for c in target.columns])
    target_only = target.join(inc.select(*keys), on=keys, how="left_anti")
    new_rows = inc.join(target.select(*keys), on=keys, how="left_anti").withColumn(
        prev_col, F.lit(None).cast(dtype)
    )
    cols = target.columns
    return (
        changed.select(*cols)
        .unionByName(unchanged.select(*cols))
        .unionByName(target_only.select(*cols))
        .unionByName(new_rows.select(*cols))
    )


def merge_scd4(
    current: DataFrame,
    history: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    batch_ts: str,
    archived_col: str = "archived_at",
) -> tuple[DataFrame, DataFrame]:
    """SCD type-4 merge: a CURRENT table that always holds exactly the
    latest row per key (SCD1 overwrite semantics) plus a separate full
    HISTORY table that archives every superseded version — Kimball's
    "history table" design for dimensions queried mostly at their
    current state, where the audit trail must exist but must not slow
    the hot current-table joins (the reason it beats SCD2 at scale:
    the current table stays #keys-sized while history grows append-only
    and partition-prunes on date(archived_at)).

    Returns ``(new_current, new_history)`` — both pure transforms of
    the three inputs, computed from ONE key-partitioned diff:
      - overlap, any ``compare_cols`` CHANGED (null-safe): incoming row
        replaces the current row; the superseded current row is
        appended to history stamped ``archived_col = batch_ts``;
      - overlap, unchanged: current row passes through, NO history row
        (re-applying the same batch is a no-op — the family's
        idempotence contract);
      - current-only keys: untouched, no history row;
      - incoming-only keys: inserted into current; no history row
        (there is no prior version to archive);
      - existing history rows always pass through untouched.

    ``history`` must carry the current table's columns plus
    ``archived_col``; ``batch_ts`` is an explicit literal, never now()
    (deterministic + oracle-checkable, SURVEY.md §7.4.7).

    Scale: pure key joins + unions — the batch side broadcasts under
    AQE; history is touched only by an append (no join against it), so
    the merge cost is independent of accumulated history size."""
    keys = list(keys)
    compare_cols = list(compare_cols)
    cur_cols = current.columns
    t_alias, i_alias = current.alias("__t"), incoming.alias("__i")
    overlap = t_alias.join(i_alias, on=keys, how="inner")
    diff = F.lit(False)
    for c in compare_cols:
        diff = diff | ~F.col(f"__i.{c}").eqNullSafe(F.col(f"__t.{c}"))
    changed_new = overlap.filter(diff).select(
        *keys,
        *[F.col(f"__i.{c}").alias(c) for c in incoming.columns if c not in keys],
    )
    changed_old = overlap.filter(diff).select(
        *[F.col(f"__t.{c}").alias(c) for c in cur_cols]
    ).withColumn(archived_col, F.lit(batch_ts))
    unchanged = overlap.filter(~diff).select(
        *[F.col(f"__t.{c}").alias(c) for c in cur_cols]
    )
    current_only = current.join(incoming.select(*keys), on=keys, how="left_anti")
    new_rows = incoming.join(current.select(*keys), on=keys, how="left_anti")
    new_current = (
        changed_new.select(*cur_cols)
        .unionByName(unchanged.select(*cur_cols))
        .unionByName(current_only.select(*cur_cols))
        .unionByName(new_rows.select(*cur_cols))
    )
    new_history = history.unionByName(changed_old.select(*history.columns))
    return new_current, new_history


def merge_scd6(
    target: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    tracked_col: str,
    batch_ts: str,
    current_col: str | None = None,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    flag_col: str = "is_current",
) -> DataFrame:
    """SCD type-6 merge (Kimball's 1+2+3 hybrid — the last SCD variant
    after the family's 1/2/3/4): the dimension keeps a full type-2 row
    chain (``valid_from``/``valid_to``/``is_current``) where every row
    carries BOTH the tracked attribute's row-scoped HISTORICAL value
    (``tracked_col`` — type 2) and its dimension-wide CURRENT value
    (``current_col``, default ``current_<tracked>`` — type 1,
    retroactively overwritten on every version of the key, history
    included). That dual column is the type-3 "current vs historical"
    answer without a second dimension: point-in-time joins read
    ``tracked_col``, as-is-today rollups read ``current_col`` on ANY
    version — no self-join to the current row.

    Branch semantics (change detection on the CURRENT row's tracked
    value, null-safe):
      - overlap, tracked CHANGED: the current row is closed
        (``valid_to`` = batch_ts, ``is_current`` = false) keeping its
        historical value; a fresh current row opens at batch_ts with
        the incoming attributes; and the type-1 sweep rewrites
        ``current_col`` := the new value on EVERY version of the key —
        the closed row and all prior history rows included;
      - overlap, unchanged: every version passes through untouched
        (re-applying the same batch is a no-op — the family's
        idempotence contract);
      - target-only keys: untouched;
      - incoming-only keys: inserted as an open current row with
        ``current_col`` = ``tracked_col``; no history.

    ``batch_ts`` is an explicit literal, never now() (deterministic +
    oracle-checkable, SURVEY.md §7.4.7).

    Scale: pure key joins/unions — the batch side broadcasts under
    AQE. The type-1 sweep is a LEFT join of history against the
    (batch-sized) changed-key set, not a scan-and-rewrite of the whole
    dimension: cost tracks batch size, and on a partitioned lakehouse
    table the same plan feeds a MERGE touching only affected key
    partitions."""
    keys = list(keys)
    current_col = current_col or f"current_{tracked_col}"
    cols = target.columns
    cur = target.filter(F.col(flag_col))
    hist = target.filter(~F.col(flag_col))
    c_alias, i_alias = cur.alias("__t"), incoming.alias("__i")
    changed = (
        c_alias.join(i_alias, on=keys, how="inner")
        .filter(
            ~F.col(f"__i.{tracked_col}").eqNullSafe(F.col(f"__t.{tracked_col}"))
        )
        .select(
            *keys,
            *[
                F.col(f"__i.{c}").alias(c)
                for c in incoming.columns
                if c not in keys
            ],
        )
    )
    chg_keys = changed.select(*keys)
    # __chg marks a matched changed key so the history sweep can write a
    # NULL new value: a COALESCE there would silently keep the stale
    # mirror on a value→NULL change (review r16) — exactly the
    # disagreement the sweep exists to prevent.
    new_val = changed.select(
        *keys,
        F.col(tracked_col).alias("__new_val"),
        F.lit(True).alias("__chg"),
    )
    closed = (
        cur.alias("__t")
        .join(new_val, on=keys, how="inner")
        .select(
            *[
                F.col(f"__t.{c}").alias(c)
                for c in cols
                if c not in (current_col, to_col, flag_col)
            ],
            F.col("__new_val").alias(current_col),
            F.lit(batch_ts).alias(to_col),
            F.lit(False).alias(flag_col),
        )
    )
    fresh = changed.select(
        *keys,
        *[c for c in incoming.columns if c not in keys],
        F.col(tracked_col).alias(current_col),
        F.lit(batch_ts).alias(from_col),
        F.lit(None).cast(target.schema[to_col].dataType).alias(to_col),
        F.lit(True).alias(flag_col),
    )
    cur_pass = cur.join(chg_keys, on=keys, how="left_anti")
    new_rows = incoming.join(cur.select(*keys), on=keys, how="left_anti").select(
        *incoming.columns,
        F.col(tracked_col).alias(current_col),
        F.lit(batch_ts).alias(from_col),
        F.lit(None).cast(target.schema[to_col].dataType).alias(to_col),
        F.lit(True).alias(flag_col),
    )
    hist_swept = (
        hist.alias("__h")
        .join(new_val, on=keys, how="left")
        .select(
            *[
                F.col(f"__h.{c}").alias(c)
                for c in cols
                if c != current_col
            ],
            F.when(F.col("__chg"), F.col("__new_val"))
            .otherwise(F.col(f"__h.{current_col}"))
            .alias(current_col),
        )
    )
    return (
        closed.select(*cols)
        .unionByName(fresh.select(*cols))
        .unionByName(cur_pass.select(*cols))
        .unionByName(new_rows.select(*cols))
        .unionByName(hist_swept.select(*cols))
    )
