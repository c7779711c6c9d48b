"""Reference-API parity tests for the store_* facade (SURVEY.md §5.1's
per-function template): junk input → error; minimal valid input stores;
storing twice is a no-op (idempotence); attribute change updates; absent
membership rows are removed on set-replacement."""

from __future__ import annotations

import duckdb
import pytest

from n2kupdate_spark.api import N2kStore, ValidationError
from n2kupdate_spark.sources.jdbc import DbApiBackend


@pytest.fixture()
def store(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE language (code VARCHAR, description VARCHAR, fingerprint VARCHAR)")
    con.execute(
        "CREATE TABLE species_group_species "
        "(species_group VARCHAR, species VARCHAR, fingerprint VARCHAR)"
    )
    con.execute(
        "CREATE TABLE analysis (file_fingerprint VARCHAR, model_set VARCHAR, "
        "first_year INT, last_year INT, duration INT, fingerprint VARCHAR)"
    )
    yield N2kStore(backend=DbApiBackend(con)), con
    con.close()


def _lang(spark, rows):
    return spark.createDataFrame(rows, "code string, description string")


def test_junk_input_rejected_before_write(spark, store):
    st, con = store
    with pytest.raises(ValidationError, match="missing required"):
        st.store_language(spark.createDataFrame([("nl",)], "code string"))
    with pytest.raises(ValidationError, match="unexpected columns"):
        st.store_language(
            spark.createDataFrame([("nl", "Dutch", 1)], "code string, description string, junk int")
        )
    with pytest.raises(ValidationError, match="NULL natural-key"):
        st.store_language(_lang(spark, [(None, "mystery")]))
    assert con.execute("SELECT COUNT(*) FROM language").fetchone()[0] == 0


def test_minimal_store_and_idempotence(spark, store):
    st, con = store
    batch = _lang(spark, [("nl", "Dutch"), ("fr", "French")])
    out = st.store_language(batch)
    assert "fingerprint" in out.columns  # input returned augmented
    assert con.execute("SELECT COUNT(*) FROM language").fetchone()[0] == 2
    st.store_language(batch)  # storing the same frame twice: no new rows
    assert con.execute("SELECT COUNT(*) FROM language").fetchone()[0] == 2


def test_update_branch_overwrites_attribute(spark, store):
    st, con = store
    st.store_language(_lang(spark, [("nl", "Dutch")]))
    st.store_language(_lang(spark, [("nl", "Nederlands")]))
    rows = con.execute("SELECT code, description FROM language").fetchall()
    assert rows == [("nl", "Nederlands")]  # SCD1: overwritten, not duplicated


def test_set_replacement_closes_absent_members(spark, store):
    st, con = store
    df1 = spark.createDataFrame(
        [("g1", "sp1"), ("g1", "sp2"), ("g2", "spX")],
        "species_group string, species string",
    )
    st.store_species_group_species(df1)
    # g1 loses sp2, gains sp3; g2 untouched (not in the batch)
    df2 = spark.createDataFrame(
        [("g1", "sp1"), ("g1", "sp3")], "species_group string, species string"
    )
    st.store_species_group_species(df2)
    got = sorted(
        con.execute("SELECT species_group, species FROM species_group_species").fetchall()
    )
    assert got == [("g1", "sp1"), ("g1", "sp3"), ("g2", "spX")]


def test_versioned_analysis_append_only(spark, store):
    st, con = store
    a = spark.createDataFrame(
        [("fp1", "ms1", 2000, 2020, 21)],
        "file_fingerprint string, model_set string, first_year int, last_year int, duration int",
    )
    st.store_analysis(a)
    # same natural key, *changed* attribute: append-only → original kept
    a2 = spark.createDataFrame(
        [("fp1", "ms1", 2000, 2021, 22)],
        "file_fingerprint string, model_set string, first_year int, last_year int, duration int",
    )
    st.store_analysis(a2)
    assert con.execute("SELECT COUNT(*) FROM analysis").fetchone()[0] == 1
    assert con.execute("SELECT last_year FROM analysis").fetchone()[0] == 2020
