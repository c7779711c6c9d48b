"""Probe: COPY vs collapsed-VALUES staging throughput on live PostgreSQL.

Round 6 moved the psql shim's bulk staging from collapsed multi-row VALUES
INSERTs to ``\\copy … FROM STDIN WITH (FORMAT csv)`` — the same wire path
as the reference's ``DBI::dbWriteTable``. This probe quantifies the change
the way probe_q18_10x.py quantifies bucketing: spin a throwaway PG 15,
stage the same synthetic batch through both paths, report rows/s.

Run: python probe_pg_copy.py   (skips cleanly if no PG binaries)
Results recorded in BASELINE.md §7.
"""

from __future__ import annotations

import os
import shutil
import socket
import subprocess
import sys
import tempfile
import time

N_ROWS = 200_000


def main() -> None:
    for b in ("psql", "initdb", "pg_ctl"):
        if not (shutil.which(b) or os.path.exists(f"/usr/local/bin/{b}")):
            print(f"SKIP: {b} not available")
            return
    tmp = tempfile.mkdtemp(prefix="n2kpg_probe_")
    data = os.path.join(tmp, "data")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    try:
        shutil.chown(tmp, "postgres", "postgres")
    except (PermissionError, LookupError):
        print("SKIP: cannot hand the data dir to the postgres user")
        shutil.rmtree(tmp, ignore_errors=True)
        return

    def as_pg(cmd: str) -> subprocess.CompletedProcess:
        return subprocess.run(
            ["su", "postgres", "-c", cmd],
            capture_output=True, text=True, cwd="/tmp", timeout=120,
        )

    initdb = shutil.which("initdb") or "/usr/local/bin/initdb"
    pg_ctl = shutil.which("pg_ctl") or "/usr/local/bin/pg_ctl"
    try:
        if as_pg(f"{initdb} -D {data} -A trust --no-sync").returncode != 0:
            print("SKIP: initdb failed")
            return
        if as_pg(
            f"{pg_ctl} -D {data} -l {tmp}/log -w "
            f"-o '-k {tmp} -p {port} -c listen_addresses= -F' start"
        ).returncode != 0:
            print("SKIP: pg_ctl start failed")
            return

        from n2kupdate_spark.sources.pg_psql import PsqlConnection

        con = PsqlConnection(host=tmp, port=port)
        # synthetic staging batch: id, two text cols (one with quotes),
        # a double — the shape of a dim staging write
        rows = [
            (i, f"name_{i}", f"it's desc {i}, with commas", i * 0.25)
            for i in range(N_ROWS)
        ]
        ddl = (
            "CREATE TABLE {t} (id BIGINT, name VARCHAR, descr VARCHAR, "
            "val DOUBLE PRECISION)"
        )

        con.execute(ddl.format(t="t_copy"))
        t0 = time.time()
        con.copy_from_csv("t_copy", ["id", "name", "descr", "val"], rows)
        t_copy = time.time() - t0
        n = int(con.execute("SELECT COUNT(*) FROM t_copy").fetchone()[0])
        assert n == N_ROWS, n

        con.execute(ddl.format(t="t_values"))
        t0 = time.time()
        con.executemany("INSERT INTO t_values VALUES (?,?,?,?)", rows)
        t_values = time.time() - t0
        n = int(con.execute("SELECT COUNT(*) FROM t_values").fetchone()[0])
        assert n == N_ROWS, n

        con.close()
        print(
            f"rows={N_ROWS}  copy={t_copy:.2f}s ({N_ROWS / t_copy:,.0f} rows/s)  "
            f"values={t_values:.2f}s ({N_ROWS / t_values:,.0f} rows/s)  "
            f"speedup={t_values / t_copy:.2f}x"
        )
    finally:
        as_pg(f"{pg_ctl} -D {data} -m immediate stop")
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
