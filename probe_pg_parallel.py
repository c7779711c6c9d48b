"""Probe: driver-streamed vs executor-parallel COPY staging throughput.

Round 7 added ``PgParallelBackend``: each task COPYs its partition into a
private per-task table over its own psql session, and the driver
consolidates server-side in one transaction. On a real cluster the win is
structural (the driver leaves the data path entirely; staging bandwidth
scales with executors). This probe quantifies what is measurable on one
box: N concurrent COPY backends parse CSV in parallel server-side, vs one
COPY fed by the driver-streamed ``DbApiBackend`` path.

Stages the sf0.1 lineitem fact (600 k rows) through both backends against
a throwaway PostgreSQL 15 and reports wall + rows/s.

Run: python probe_pg_parallel.py   (skips cleanly if no PG binaries)
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

SF = "/root/testdata/sf0.1"


def main() -> None:
    for b in ("psql", "initdb", "pg_ctl"):
        if not (shutil.which(b) or os.path.exists(f"/usr/local/bin/{b}")):
            print(f"SKIP: {b} not available")
            return
    if not os.path.exists(f"{SF}/lineitem.parquet"):
        print("SKIP: sf0.1 fixtures not present")
        return
    tmp = tempfile.mkdtemp(prefix="n2kpg_par_")
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

        from n2kupdate_spark.session import get_spark
        from n2kupdate_spark.sources.jdbc import DbApiBackend, PgParallelBackend
        from n2kupdate_spark.sources.pg_psql import PsqlConnection

        spark = get_spark(app_name="probe-pg-parallel")
        spark.sparkContext.setLogLevel("ERROR")
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        n_rows = li.count()  # also warms the scan

        streamed = DbApiBackend(PsqlConnection(host=tmp, port=port))
        t0 = time.time()
        streamed.write_staging(li, "stage_streamed")
        t_streamed = time.time() - t0
        n = int(streamed.con.execute("SELECT COUNT(*) FROM stage_streamed").fetchone()[0])
        assert n == n_rows, n

        for par in (4, 8):
            backend = PgParallelBackend(host=tmp, port=port, max_parallel=par)
            t0 = time.time()
            backend.write_staging(li, f"stage_par{par}")
            t_par = time.time() - t0
            n = int(
                backend.con.execute(f"SELECT COUNT(*) FROM stage_par{par}").fetchone()[0]
            )
            assert n == n_rows, n
            backend.con.close()
            print(
                f"parallel x{par}: {t_par:.2f}s ({n_rows / t_par:,.0f} rows/s)  "
                f"vs streamed {t_streamed:.2f}s ({n_rows / t_streamed:,.0f} rows/s)  "
                f"speedup={t_streamed / t_par:.2f}x"
            )
        streamed.con.close()
    finally:
        as_pg(f"{pg_ctl} -D {data} -m immediate stop")
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
