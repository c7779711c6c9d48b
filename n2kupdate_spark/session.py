"""SparkSession factory + runtime tuning.

Reference analog: ``connect_ut_db()`` (⟨pub⟩ R/connect_ut_db.R [M], SURVEY.md
§2 Part A) — the one place connection/session setup lives. Here the "database"
is Spark itself, so this module owns engine tuning instead of credentials.

Scale notes (100 TB target, SURVEY.md §4):
- AQE on: runtime re-planning (broadcast conversion, partition coalescing,
  skew-join splitting) is the main lever when static stats are wrong at scale.
- UTC session timezone: all timestamp semantics are instant-based; required
  for oracle parity (SURVEY.md §7.4.3) and for cluster nodes in mixed zones.
- shuffle partitions default 32 for local[32] testing; a real cluster run
  should set this ~2-3× total cores or rely on AQE coalescing from a higher
  initial value.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

#: Configs that are safe to set on a live session (runtime-settable).
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    # rejects outright; read it as nanosecond longs and convert in the loader
    # (sources/catalog.py) — SURVEY.md §7.4.3.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Parquet TIMESTAMP(isAdjustedToUTC=false) would otherwise load as
    # TimestampNTZ; with a UTC session both readings denote the same instant
    # and TimestampType keeps epoch-seconds math uniform across tables.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def get_spark(
    app_name: str = "n2kupdate-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``extra_confs`` overlays create-time configs (probes use it to turn
    the UI back on for REST metric scrapes); it only takes effect when
    this call actually creates the JVM."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # In local mode the driver JVM IS the executor; the 1g default heap
        # starves 32 concurrent task slots and OOMs once eagerly-checkpointed
        # RDD blocks accumulate across a long session (found by the 10×
        # headline sweep). Only applies when this factory creates the JVM —
        # an externally built session (the verification driver) keeps its own.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return tune(spark)


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to an externally created session.

    The verification driver passes its *own* SparkSession into
    ``entry()``/``queries()``; every query path calls this so oracle-facing
    semantics (UTC, AQE) hold regardless of who built the session.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime conf on this build: keep going
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make ``n2kupdate_spark`` importable on executor Python workers.

    The verification driver builds its session from an arbitrary cwd, so
    workers unpickling our UDFs/UDTFs would otherwise hit
    ``ModuleNotFoundError: n2kupdate_spark`` (observed live). Zip the package
    (content-hashed name → re-adding is idempotent, edits get a fresh name)
    and addPyFile it — the runtime equivalent of --py-files on a cluster.
    """
    sc = spark.sparkContext
    if getattr(sc, "_n2k_pkg_shipped", None):
        return
    pkg_dir = pathlib.Path(__file__).resolve().parent
    srcs = sorted(pkg_dir.rglob("*.py"))
    digest = hashlib.md5()
    for p in srcs:
        digest.update(str(p.relative_to(pkg_dir)).encode())
        digest.update(p.read_bytes())
    zpath = os.path.join(
        tempfile.gettempdir(), f"n2kupdate_spark_{digest.hexdigest()[:12]}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for p in srcs:
                z.write(p, str(pathlib.Path("n2kupdate_spark") / p.relative_to(pkg_dir)))
        os.replace(tmp, zpath)
    try:
        sc.addPyFile(zpath)
    except Exception:
        pass  # already registered in this JVM from a prior module load
    sc._n2k_pkg_shipped = True
