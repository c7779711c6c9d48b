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
