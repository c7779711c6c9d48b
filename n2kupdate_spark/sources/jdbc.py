"""Staging-table + server-side-merge upsert sink — the n2kupdate analog.

Reference lifecycle (SURVEY.md §3.1, ⟨pub⟩ every R/store_*.R [H]):
validate → fingerprint → bulk-write a hash-named staging table → run
insert-missing / update-changed / close-removed SQL inside one transaction
→ drop staging. This module reproduces that design for Spark:

- **Executors write staging in parallel** (``df.write.jdbc`` — partitioned
  inserts), never the driver; at 100 TB the staging write is the scan.
- **The driver runs one set-based merge statement** over the staging table
  — the database's planner does the join, exactly as PostgreSQL does for
  the reference.
- Staging names embed a run id (the reference hashes for the same reason:
  concurrent loads can't collide) and are dropped on success.

Connectivity is pluggable: ``SparkJdbcBackend`` uses real JDBC on a
cluster; ``DbApiBackend`` drives any DBAPI connection (tested against
DuckDB in tests/test_jdbc_sink.py — this container ships no JDBC driver,
and the DBAPI staging write collects batches, so it is for tests/small
dims only; the generated merge SQL is identical either way).
"""

from __future__ import annotations

import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame


# --- merge SQL generation (shared by both backends) ------------------------

def _cols(df: DataFrame) -> list[str]:
    return list(df.columns)


def sql_merge_scd1(target: str, staging: str, keys: Sequence[str], columns: Sequence[str]) -> list[str]:
    """UPDATE-changed + INSERT-missing (⟨pub⟩ R/store_language.R pattern)."""
    keys = list(keys)
    attrs = [c for c in columns if c not in keys]
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    set_clause = ", ".join(f"{c} = s.{c}" for c in attrs)
    collist = ", ".join(columns)
    stmts = []
    if attrs:
        stmts.append(
            f"UPDATE {target} t SET {set_clause} FROM {staging} s WHERE {on}"
        )
    stmts.append(
        f"INSERT INTO {target} ({collist}) "
        f"SELECT {collist} FROM {staging} s "
        f"WHERE NOT EXISTS (SELECT 1 FROM {target} t WHERE {on})"
    )
    return stmts


def sql_merge_insert_ignore(
    target: str, staging: str, keys: Sequence[str], columns: Sequence[str]
) -> list[str]:
    """INSERT-missing only (append-only version chains)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    collist = ", ".join(columns)
    return [
        f"INSERT INTO {target} ({collist}) "
        f"SELECT {collist} FROM {staging} s "
        f"WHERE NOT EXISTS (SELECT 1 FROM {target} t WHERE {on})"
    ]


def sql_merge_set_replace(
    target: str, staging: str, group_cols: Sequence[str], columns: Sequence[str]
) -> list[str]:
    """Replace membership wholesale for groups present in staging
    (⟨pub⟩ R/store_location_group_location.R pattern)."""
    gs = list(group_cols)
    on = " AND ".join(f"t.{g} = s.{g}" for g in gs)
    collist = ", ".join(columns)
    return [
        f"DELETE FROM {target} t WHERE EXISTS (SELECT 1 FROM {staging} s WHERE {on})",
        f"INSERT INTO {target} ({collist}) SELECT {collist} FROM {staging}",
    ]


def sql_merge_scd2_close(
    target: str,
    staging: str,
    keys: Sequence[str],
    batch_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> list[str]:
    """Close open rows absent from staging; open rows new to the target."""
    ks = list(keys)
    on = " AND ".join(f"t.{k} = s.{k}" for k in ks)
    keylist = ", ".join(ks)
    return [
        f"UPDATE {target} t SET {valid_to} = '{batch_ts}' "
        f"WHERE t.{valid_to} IS NULL "
        f"AND NOT EXISTS (SELECT 1 FROM {staging} s WHERE {on})",
        f"INSERT INTO {target} ({keylist}, {valid_from}, {valid_to}) "
        f"SELECT {keylist}, '{batch_ts}', NULL FROM {staging} s "
        f"WHERE NOT EXISTS (SELECT 1 FROM {target} t "
        f"WHERE {on} AND t.{valid_to} IS NULL)",
    ]


MERGE_SQL = {
    "scd1": sql_merge_scd1,
    "insert_ignore": sql_merge_insert_ignore,
    "set_replace": sql_merge_set_replace,
}


# --- backends --------------------------------------------------------------

class DbApiBackend:
    """Execute the sink against any DBAPI connection (DuckDB, psycopg2…).

    The staging write round-trips through Arrow batches on the driver —
    test/small-dim scale only; the merge statements are the same SQL the
    JDBC backend runs.
    """

    def __init__(self, con):
        self.con = con

    def write_staging(self, df: DataFrame, staging: str) -> None:
        pdf = df.toPandas()
        if hasattr(self.con, "register"):  # duckdb fast path
            self.con.register(f"__stage_{staging}", pdf)
            self.con.execute(
                f"CREATE OR REPLACE TABLE {staging} AS SELECT * FROM __stage_{staging}"
            )
            self.con.unregister(f"__stage_{staging}")
        else:
            cols = ", ".join(df.columns)
            ph = ", ".join(["?"] * len(df.columns))
            self.con.execute(f"CREATE TABLE {staging} AS SELECT * FROM (VALUES ) LIMIT 0")
            self.con.executemany(
                f"INSERT INTO {staging} ({cols}) VALUES ({ph})",
                [tuple(r) for r in pdf.itertuples(index=False, name=None)],
            )

    def execute(self, stmts: Sequence[str]) -> None:
        self.con.execute("BEGIN TRANSACTION")
        try:
            for s in stmts:
                self.con.execute(s)
            self.con.execute("COMMIT")
        except Exception:
            self.con.execute("ROLLBACK")
            raise

    def drop_staging(self, staging: str) -> None:
        self.con.execute(f"DROP TABLE IF EXISTS {staging}")


class SparkJdbcBackend:
    """Cluster path: executors write staging via JDBC partitioned inserts;
    the driver runs the merge over a JVM DriverManager connection."""

    def __init__(self, url: str, properties: dict[str, str] | None = None):
        self.url = url
        self.properties = properties or {}

    def write_staging(self, df: DataFrame, staging: str) -> None:
        df.write.mode("overwrite").jdbc(self.url, staging, properties=self.properties)

    def execute(self, stmts: Sequence[str]) -> None:
        spark = __import__("pyspark").sql.SparkSession.getActiveSession()
        jvm = spark._jvm
        con = jvm.java.sql.DriverManager.getConnection(
            self.url, self.properties.get("user", ""), self.properties.get("password", "")
        )
        try:
            con.setAutoCommit(False)
            st = con.createStatement()
            for s in stmts:
                st.execute(s)
            con.commit()
        except Exception:
            con.rollback()
            raise
        finally:
            con.close()

    def drop_staging(self, staging: str) -> None:
        self.execute([f"DROP TABLE IF EXISTS {staging}"])


def upsert(
    df: DataFrame,
    target: str,
    keys: Sequence[str],
    backend,
    mode: str = "scd1",
    staging_prefix: str = "staging",
    run_id: str | None = None,
    clean: bool = True,
    **mode_kwargs,
) -> str:
    """Idempotent upsert of ``df`` into ``target``: stage → merge → clean.

    Returns the staging table name (kept when ``clean=False``, mirroring the
    reference's ``clean`` argument).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    staging = f"{staging_prefix}_{target.replace('.', '_')}_{run_id}"
    backend.write_staging(df, staging)
    if mode == "scd2_close":
        stmts = sql_merge_scd2_close(target, staging, keys, **mode_kwargs)
    else:
        stmts = MERGE_SQL[mode](target, staging, keys, _cols(df))
    backend.execute(stmts)
    if clean:
        backend.drop_staging(staging)
    return staging
