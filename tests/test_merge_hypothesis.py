"""Property-based merge-algebra tests (hypothesis): for arbitrary
target/batch pairs, the merge family must satisfy its defining invariants —
not just on the FIXTURES split. Bounded example counts keep Spark overhead
sane; shrinking still gives minimal counterexamples on failure."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from n2kupdate_spark.operators import (
    merge_insert_ignore,
    merge_scd1,
    merge_set_replace,
)

KEYS = st.integers(min_value=0, max_value=9)
VALS = st.text(alphabet="abc", min_size=0, max_size=2)

rows = st.lists(st.tuples(KEYS, VALS), max_size=12).map(
    # one row per key: merges assume key-unique inputs (the reference
    # dedups on fingerprint before staging)
    lambda rs: list({k: (k, v) for k, v in rs}.values())
)

members = st.lists(st.tuples(KEYS, KEYS), max_size=12, unique=True)

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rs, schema="k int, v string"):
    return spark.createDataFrame(rs, schema) if rs else spark.createDataFrame([], schema)


def _canon(df):
    return sorted(map(tuple, df.toPandas().itertuples(index=False, name=None)))


@given(target=rows, batch=rows)
@SET
def test_scd1_upsert_laws(spark, target, batch):
    t, b = _df(spark, target), _df(spark, batch)
    out = merge_scd1(t, b, keys=["k"])
    got = dict(_canon(out))
    # law 1: result keys = target keys ∪ batch keys
    assert set(got) == {k for k, _ in target} | {k for k, _ in batch}
    # law 2: batch wins on overlap; untouched target rows survive
    expect = dict(target) | dict(batch)
    assert got == expect
    # law 3: idempotence
    assert _canon(merge_scd1(out, b, keys=["k"])) == _canon(out)


@given(target=rows, batch=rows)
@SET
def test_insert_ignore_laws(spark, target, batch):
    t, b = _df(spark, target), _df(spark, batch)
    out = merge_insert_ignore(t, b, keys=["k"])
    got = dict(_canon(out))
    # target wins on overlap (append-only); batch fills gaps only
    expect = dict(batch) | dict(target)
    assert got == expect
    assert _canon(merge_insert_ignore(out, b, keys=["k"])) == _canon(out)


@given(target=members, batch=members)
@SET
def test_set_replace_laws(spark, target, batch):
    schema = "grp int, member int"
    t, b = _df(spark, target, schema), _df(spark, batch, schema)
    out = set(_canon(merge_set_replace(t, b, group_cols=["grp"])))
    batch_groups = {g for g, _ in batch}
    # groups in the batch are replaced wholesale; absent groups untouched
    expect = {(g, m) for g, m in target if g not in batch_groups} | set(batch)
    assert out == expect


BATCHES = st.lists(rows, min_size=1, max_size=3)
_TS_SEQ = ["2025-01-01 00:00:00", "2025-02-01 00:00:00", "2025-03-01 00:00:00"]


@given(batches=BATCHES)
@SET
def test_scd2_changes_event_log_round_trip(spark, batches):
    """merge_scd2_changes and the lead()-window rebuild (scd2_window_rebuild,
    queries/merges.py) are mutual inverses: flatten the merged history into a
    change-event log (one event per version open, plus a tombstone per
    close-without-reopen) and the rebuild's lead() windows reproduce every
    version's [valid_from, valid_to) exactly. This pins the invariant that
    a closed version's valid_to always equals the NEXT event on its key —
    i.e. the history has no gaps and no overlaps."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators import merge_scd2_changes

    schema = "k int, v string, valid_from string, valid_to string"
    hist = spark.createDataFrame([], schema)
    for batch, ts in zip(batches, _TS_SEQ):
        hist = merge_scd2_changes(
            hist, _df(spark, batch), keys=["k"], compare_cols=["v"], batch_ts=ts
        )
    versions = _canon(hist)  # (k, v, valid_from, valid_to)

    opens = {(k, vf) for k, _, vf, _ in versions}
    events = [(k, vf, v) for k, v, vf, _ in versions]
    # deletion tombstone: a close whose ts opens no new version on the key
    events += [
        (k, vt, None)
        for k, _, _, vt in versions
        if vt is not None and (k, vt) not in opens
    ]
    e = _df(spark, events, "k int, ts string, v string")
    w = Window.partitionBy("k").orderBy("ts")
    rebuilt = {
        (k, ts): vt
        for k, ts, v, vt in _canon(
            e.select("k", "ts", "v", F.lead("ts").over(w).alias("valid_to"))
        )
        if v is not None  # tombstones are log entries, not versions
    }
    assert len(rebuilt) == len(versions)
    for k, _, vf, vt in versions:
        assert rebuilt[(k, vf)] == vt
