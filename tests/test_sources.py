"""Source-ingestion behaviors not visible through the oracle projection."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from n2kupdate_spark.queries import scans


def test_source_json_quarantines_corrupt_line(spark, sf_dir):
    """PERMISSIVE mode routes the bad trailing line into the quarantine
    column instead of failing the scan; the registered query drops the
    engine-specific _corrupt payload, so assert it here."""
    scans._write_source_files()
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("k", T.IntegerType()),
            T.StructField("tag", T.StringType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(scans._JSON_PATH)
    )
    rows = raw.collect()
    assert len(rows) == 26
    corrupt = [r for r in rows if r["_corrupt"] is not None]
    assert len(corrupt) == 1
    assert corrupt[0]["id"] is None and "bad json" in corrupt[0]["_corrupt"]


def test_source_csv_matches_fixture(spark, sf_dir):
    df = scans.source_csv(spark, sf_dir)
    assert df.count() == len(scans._CSV_ROWS)
    got = {r["id"]: (r["name"], r["score"]) for r in df.collect()}
    assert got[25] == ("name_25", 37.5)


def test_source_json_clean_rows_match(spark, sf_dir):
    df = scans.source_json(spark, sf_dir)
    assert df.count() == 26  # 25 clean + 1 all-NULL quarantined row
    assert df.filter(F.col("id").isNull()).count() == 1


def test_compact_parquet_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    """Small-file compaction (maintenance op): 64-way fragmented events
    table compacts to the target file count with rows and schema exactly
    preserved; the sort_by variant keeps a global range order so parquet
    min/max stats stay selective."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.sources import load
    from n2kupdate_spark.sources.maintenance import compact_parquet, dir_stats

    src = str(tmp_path / "fragmented")
    ev = load(spark, sf_dir, "events")
    ev.repartition(64).write.parquet(src)
    assert dir_stats(spark, src)["files"] >= 64  # data files + _SUCCESS

    dst = str(tmp_path / "compacted")
    stats = compact_parquet(spark, src, dst, target_mb=128)
    # tiny test table -> everything fits one target file
    assert stats["target_files"] == 1
    back = spark.read.parquet(dst)
    assert back.count() == ev.count()
    assert {f.name: f.dataType for f in back.schema.fields} == {
        f.name: f.dataType for f in ev.schema.fields
    }

    dst2 = str(tmp_path / "compacted_sorted")
    compact_parquet(spark, src, dst2, target_mb=128, sort_by=["ts"])
    back2 = spark.read.parquet(dst2)
    assert back2.count() == ev.count()
    # global order preserved within the single output file
    ts = [r[0] for r in back2.select("ts").limit(1000).collect()]
    assert ts == sorted(ts)


def test_register_bucketed_remakes_twin_when_source_regenerated(spark, tmp_path):
    """A rewritten source parquet dir must yield a NEW bucketed twin — the
    freshness token in the twin name is what prevents bucketed_layout from
    silently serving rows of the pre-regeneration fixture (ADVICE r6), and
    the superseded twin must be dropped from the catalog."""
    import shutil

    from n2kupdate_spark.sources import load
    from n2kupdate_spark.sources.catalog import register_bucketed

    sf = str(tmp_path)
    src = load(spark, "/root/testdata/sf0.001", "customer")
    src.write.mode("overwrite").parquet(f"{sf}/customer.parquet")

    t1 = register_bucketed(spark, sf, "customer", ["c_custkey"], 4)
    n1 = spark.table(t1).count()

    # regenerate the fixture with different content (half the rows)
    half = src.filter(F.col("c_custkey") % 2 == 0)
    half.write.mode("overwrite").parquet(f"{sf}/customer2.parquet")
    shutil.rmtree(f"{sf}/customer.parquet")
    shutil.move(f"{sf}/customer2.parquet", f"{sf}/customer.parquet")

    t2 = register_bucketed(spark, sf, "customer", ["c_custkey"], 4)
    try:
        assert t2 != t1, "twin name must change when the source is regenerated"
        assert spark.table(t2).count() == half.count() != n1
        assert not spark.catalog.tableExists(t1), "superseded twin must be dropped"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t2}")


def test_compact_parquet_zorder_prunes_both_columns(spark, tmp_path):
    """Z-order clustering (maintenance op): after zorder_by=["x","y"]
    compaction, file-level min/max ranges must be selective on BOTH
    columns — a range filter on either column intersects only a fraction
    of the files — whereas a linear sort_by=["x"] gives perfect pruning on
    x and NO pruning on y. Checked against the actual parquet footers
    (column-chunk min/max via pyarrow), i.e. the same statistics a scan's
    row-group pruning uses. Data is two independent pseudo-random uniform
    columns so neither layout gets accidental correlation help."""
    import glob

    import pyarrow.parquet as pq

    from n2kupdate_spark.sources.maintenance import compact_parquet

    n = 200_000
    df = (
        spark.range(n)
        .select(
            ((F.col("id") * 48271) % 100_000).alias("x"),
            ((F.col("id") * 7919 + 13) % 100_000).alias("y"),
        )
    )
    src = str(tmp_path / "frag")
    df.repartition(32).write.parquet(src)
    frag_bytes = sum(
        __import__("os").path.getsize(f) for f in glob.glob(f"{src}/*.parquet")
    )
    # target ~64 files from the measured size (fractional MB: the fixture
    # is small; compact_parquet's math is pure bytes/target). 64 files on a
    # 256x256 bucket grid = ~8x8 Z-tiles, enough resolution for the curve's
    # locality to show in file min/max ranges.
    target_mb = frag_bytes / 64 / 1024 / 1024

    def files_overlapping(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
        total, hit = 0, 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            total += 1
            if min(mins) <= hi and max(maxs) >= lo:
                hit += 1
        return hit, total

    zdst = str(tmp_path / "zorder")
    compact_parquet(spark, src, zdst, target_mb=target_mb, zorder_by=["x", "y"])
    sdst = str(tmp_path / "xsort")
    compact_parquet(spark, src, sdst, target_mb=target_mb, sort_by=["x"])

    # 10%-selectivity range filter on each column
    lo, hi = 40_000, 50_000
    zx, zn = files_overlapping(zdst, "x", lo, hi)
    zy, _ = files_overlapping(zdst, "y", lo, hi)
    sx, sn = files_overlapping(sdst, "x", lo, hi)
    sy, _ = files_overlapping(sdst, "y", lo, hi)
    assert zn >= 32 and sn >= 32  # enough files for pruning to mean anything
    assert sx <= max(2, sn // 4), (sx, sn)  # linear sort: near-perfect on x...
    assert sy == sn  # ...and NONE on y (every file spans the y domain)
    # Z-order: BOTH columns prune — a 10% window on either column touches
    # at most ~half the files (unaligned range cuts cost some tiles: a 10%
    # window can straddle 3 of 8 bands, plus the boundary files whose
    # Z-range spans a band edge; an aligned-tile ideal would be ~2 of 8).
    # File cuts are deterministic (explicit quantile pass in
    # compact_parquet), so this bound is exact-repeatable, not a flake
    # margin around sampled boundaries.
    assert zx <= int(zn * 0.5) and zy <= int(zn * 0.5), (zx, zy, zn)

    # row/content preservation (same checksum both layouts)
    a = spark.read.parquet(zdst).agg(
        F.count(F.lit(1)), F.sum("x"), F.sum("y")
    ).collect()[0]
    b = spark.read.parquet(src).agg(
        F.count(F.lit(1)), F.sum("x"), F.sum("y")
    ).collect()[0]
    assert tuple(a) == tuple(b)

    # Idempotent re-compaction: the file layout (per-file row count +
    # min/max footer stats) is a pure function of the input — quantile
    # cuts + perfect-token hash placement, no sampled range boundaries
    # anywhere. Re-running must reproduce it exactly.
    def footer_layout(path: str):
        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            assert md.num_rows > 0, f"zero-row shard {f}"
            per_col = []
            for col in ("x", "y"):
                i = md.schema.names.index(col)
                st = [md.row_group(r).column(i).statistics for r in range(md.num_row_groups)]
                per_col.append((min(s.min for s in st), max(s.max for s in st)))
            out.append((md.num_rows, tuple(per_col)))
        return sorted(out)

    zdst2 = str(tmp_path / "zorder2")
    compact_parquet(spark, src, zdst2, target_mb=target_mb, zorder_by=["x", "y"])
    assert footer_layout(zdst2) == footer_layout(zdst)


def test_manifest_publish_read_isolates_torn_directories(spark, tmp_path):
    """Manifest-based atomic publication: readers scan exactly the files
    the chosen manifest names, so (a) garbage/in-flight files beside them
    are invisible, (b) a later publish flips readers atomically, and (c)
    prior versions stay readable while their files survive — the object-
    store-safe swap compact_parquet's docstring promises."""
    from n2kupdate_spark.sources.maintenance import publish_manifest, read_manifest

    d = str(tmp_path / "tbl")
    spark.range(100).withColumnRenamed("id", "v").coalesce(2).write.parquet(d)
    m1 = publish_manifest(spark, d)
    assert m1.endswith("_manifest-0000000001.json")
    assert read_manifest(spark, d).count() == 100

    # a torn/concurrent write drops extra files into the directory: a
    # directory listing would see 100 + 7 rows; the manifest reader must not
    spark.range(7).withColumnRenamed("id", "v").coalesce(1).write.mode(
        "append"
    ).parquet(d)
    assert spark.read.parquet(d).count() == 107  # listing sees the tear
    assert read_manifest(spark, d).count() == 100  # manifest does not

    # publishing commits the new set; old version stays pinned
    publish_manifest(spark, d)
    assert read_manifest(spark, d).count() == 107
    assert read_manifest(spark, d, version=1).count() == 100

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_manifest(spark, d, version=99)
    with _pytest.raises(FileNotFoundError):
        read_manifest(spark, str(tmp_path / "nope"))


def test_vacuum_unreferenced_keeps_pinned_versions(spark, tmp_path):
    """Vacuum drops manifests beyond keep_versions and deletes data files
    no kept manifest references; files shared by kept versions survive."""
    from n2kupdate_spark.sources.maintenance import (
        publish_manifest,
        read_manifest,
        vacuum_unreferenced,
    )

    d = str(tmp_path / "tbl")
    spark.range(100).withColumnRenamed("id", "v").coalesce(2).write.parquet(d)
    publish_manifest(spark, d)                      # v1: 2 files
    spark.range(7).withColumnRenamed("id", "v").coalesce(1).write.mode(
        "append"
    ).parquet(d)
    publish_manifest(spark, d)                      # v2: 3 files (superset)
    spark.range(3).withColumnRenamed("id", "v").coalesce(1).write.mode(
        "append"
    ).parquet(d)                                    # orphan, never published

    stats = vacuum_unreferenced(spark, d, keep_versions=2)
    assert stats["kept_versions"] == [1, 2]
    assert stats["dropped_manifests"] == 0
    assert stats["removed_files"] == 1              # only the orphan
    assert read_manifest(spark, d).count() == 107
    assert read_manifest(spark, d, version=1).count() == 100

    stats2 = vacuum_unreferenced(spark, d, keep_versions=1)
    assert stats2["dropped_manifests"] == 1
    assert stats2["removed_files"] == 0             # v2 references all of v1's files
    assert read_manifest(spark, d).count() == 107
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_manifest(spark, d, version=1)          # vacuumed version fails fast


def test_compact_parquet_bloom_filters_written(spark, tmp_path):
    """bloom_cols must actually reach the parquet writer: the bloom
    build costs measurable footer bytes (~1.2 bits/NDV... bytes at the
    configured NDV), so the bloomed rewrite of identical data must be
    LARGER than the plain one while rows and checksums stay identical.
    (Neither this pyarrow nor this DuckDB exposes bloom offsets, so the
    pin is behavioral: size delta + exact content equality.)"""
    from n2kupdate_spark.sources.maintenance import compact_parquet, dir_stats

    src = str(tmp_path / "src")
    spark.range(200_000).selectExpr("id AS k", "id % 97 AS v").repartition(
        8
    ).write.parquet(src)

    plain = str(tmp_path / "plain")
    bloomed = str(tmp_path / "bloomed")
    compact_parquet(spark, src, plain, target_mb=8)
    compact_parquet(
        spark, src, bloomed, target_mb=8, bloom_cols=["k"], bloom_ndv=200_000
    )
    b_plain = dir_stats(spark, plain)["bytes"]
    b_bloom = dir_stats(spark, bloomed)["bytes"]
    assert b_bloom > b_plain + 50_000, (b_plain, b_bloom)

    a = spark.read.parquet(plain).agg(
        F.count(F.lit(1)), F.sum("k"), F.sum("v")
    ).collect()[0]
    b = spark.read.parquet(bloomed).agg(
        F.count(F.lit(1)), F.sum("k"), F.sum("v")
    ).collect()[0]
    assert tuple(a) == tuple(b)


def test_manifest_publish_is_temp_then_rename(spark, tmp_path):
    """The commit point is an atomic rename, not a create: a publisher
    that dies after writing its temp file leaves nothing visible (the
    dotfile temp matches neither the _manifest-* glob nor Hadoop's
    hidden-file filter), version numbering ignores it, a later vacuum
    sweeps it, and publishing an ALREADY-COMMITTED version refuses
    instead of silently overwriting (advisor r7: bare fs.create made the
    manifest visible empty/partial the moment it was created)."""
    from n2kupdate_spark.sources.maintenance import (
        publish_manifest,
        read_manifest,
        vacuum_unreferenced,
    )

    d = tmp_path / "tbl"
    spark.range(50).withColumnRenamed("id", "v").coalesce(1).write.parquet(str(d))
    publish_manifest(spark, str(d))

    # simulate a crashed publisher: truncated temp manifest on disk
    stale = d / "._manifest-0000000002.json.tmp"
    stale.write_text('{"version": 2, "files": [')  # torn JSON
    assert read_manifest(spark, str(d)).count() == 50  # invisible to readers

    # version allocation must skip the temp (next commit is 2, not 3)
    m2 = publish_manifest(spark, str(d))
    assert m2.endswith("_manifest-0000000002.json")
    assert read_manifest(spark, str(d), version=2).count() == 50

    # re-publishing a committed version refuses (rename onto existing)
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        publish_manifest(spark, str(d), version=2)

    vacuum_unreferenced(spark, str(d), keep_versions=2)
    assert not stale.exists()  # crashed publisher's temp swept
    assert sorted(p.name for p in d.glob("._manifest-*.tmp")) == []


def test_manifest_declared_schema_pins_evolution(spark, tmp_path):
    """Each manifest version carries the table's declared StructType
    (derived once at publish via a footer scan, or caller-supplied), and
    read_manifest applies it with spark.read.schema — so an evolved
    table reads with the pinned schema, files written BEFORE a column
    existed come back NULL-filled for it, and no mergeSchema / footer
    merge happens at read time (the 100 TB planning-cost caveat
    source_schema_evolution's docstring carries is moot for
    manifest-published tables)."""
    import json

    from pyspark.sql import functions as F

    from n2kupdate_spark.sources.maintenance import publish_manifest, read_manifest

    d = tmp_path / "tbl"
    spark.range(10).select(
        F.col("id"), (F.col("id") * 2).alias("a")
    ).coalesce(1).write.parquet(str(d))
    publish_manifest(spark, str(d))  # v1 schema: (id, a)

    spark.range(10, 15).select(
        F.col("id"), (F.col("id") * 2).alias("a"), F.lit("new").alias("b")
    ).coalesce(1).write.mode("append").parquet(str(d))
    publish_manifest(spark, str(d))  # v2 schema: (id, a, b) via mergeSchema-at-publish

    # manifest JSON carries the schema field
    mfiles = sorted(d.glob("_manifest-*.json"))
    assert len(mfiles) == 2
    v2doc = json.loads(mfiles[1].read_text())
    assert [f["name"] for f in v2doc["schema"]["fields"]] == ["id", "a", "b"]

    # v2 read: evolved schema, old files NULL-filled for b — with a plain
    # reader (no mergeSchema option anywhere)
    cur = read_manifest(spark, str(d))
    assert cur.columns == ["id", "a", "b"]
    assert cur.count() == 15
    assert cur.filter(F.col("b").isNull()).count() == 10

    # v1 stays pinned to its own schema: no b column at all
    old = read_manifest(spark, str(d), version=1)
    assert old.columns == ["id", "a"]
    assert old.count() == 10

    # caller-supplied schema wins over derivation (projection-style pin)
    from pyspark.sql.types import LongType, StructField, StructType

    publish_manifest(
        spark, str(d), schema=StructType([StructField("id", LongType(), True)])
    )
    assert read_manifest(spark, str(d)).columns == ["id"]


def test_append_manifest_vacuum_cleans_batch_subdirs(spark, tmp_path):
    """publish_append_manifest grows a table batch-subdir by batch-subdir;
    vacuum must reach INTO those subdirs: stray unreferenced files are
    removed, fully-unreferenced subdirs are dropped, and referenced batch
    files survive every kept version."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.sources.maintenance import (
        manifest_versions,
        publish_append_manifest,
        read_manifest,
        vacuum_unreferenced,
    )

    d = tmp_path / "tbl"
    for v, lo in ((1, 0), (2, 100)):
        spark.range(lo, lo + 50).withColumnRenamed("id", "v").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / f"batch-{v:010d}"))
        publish_append_manifest(spark, str(d), f"batch-{v:010d}", version=v)
    assert manifest_versions(spark, str(d)) == [1, 2]
    assert read_manifest(spark, str(d)).count() == 100
    assert read_manifest(spark, str(d), version=1).count() == 50

    # stray unpublished junk: a file inside a referenced subdir and a
    # whole never-published subdir
    spark.range(5).coalesce(1).write.parquet(str(d / "junk"))
    (d / "batch-0000000001" / "stray.parquet").write_bytes(b"garbage")
    junk_part = next((d / "junk").glob("part-*.parquet"))
    (d / "batch-0000000002" / "orphan.parquet").write_bytes(junk_part.read_bytes())

    stats = vacuum_unreferenced(spark, str(d), keep_versions=2)
    assert stats["removed_files"] >= 3  # junk part + stray + orphan
    assert not (d / "junk").exists()  # emptied subdir dropped
    assert read_manifest(spark, str(d)).count() == 100  # table intact
    assert read_manifest(spark, str(d), version=1).count() == 50


def test_compact_manifest_table_closes_ingest_loop(spark, tmp_path):
    """The streaming-ingest maintenance loop end-to-end: N append-batch
    versions (many small files) → compact_manifest_table rewrites the
    current snapshot into one right-sized subdir and publishes it as the
    next version (rows and content exactly preserved, file count
    collapsed) → older versions keep reading until vacuum retires their
    batch dirs — after which the compacted table still reads bit-equal."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.sources.maintenance import (
        compact_manifest_table,
        manifest_versions,
        publish_append_manifest,
        read_manifest,
        vacuum_unreferenced,
    )

    d = tmp_path / "tbl"
    for v in (1, 2, 3):
        spark.range((v - 1) * 100, v * 100).select(
            F.col("id"), (F.col("id") * 2).alias("x")
        ).repartition(4).write.parquet(str(d / f"batch-{v:010d}"))
        publish_append_manifest(spark, str(d), f"batch-{v:010d}", version=v)
    assert read_manifest(spark, str(d)).count() == 300

    want = sorted(
        (r["id"], r["x"]) for r in read_manifest(spark, str(d)).collect()
    )
    stats = compact_manifest_table(spark, str(d), target_mb=512)
    assert stats["version"] == 4
    assert stats["before"]["files"] == 12  # 3 batches × 4 shards
    assert stats["after"]["files"] == 1    # tiny table → one file
    cur = read_manifest(spark, str(d))
    assert sorted((r["id"], r["x"]) for r in cur.collect()) == want
    assert read_manifest(spark, str(d), version=3).count() == 300  # pre-compact pinned

    stats2 = vacuum_unreferenced(spark, str(d), keep_versions=1)
    assert stats2["removed_files"] == 12  # every batch file retired
    assert not sorted(d.glob("batch-*"))  # emptied batch dirs dropped
    assert sorted((r["id"], r["x"]) for r in read_manifest(spark, str(d)).collect()) == want
    assert manifest_versions(spark, str(d)) == [4]


def test_manifest_stats_prune_files_before_planning(spark, tmp_path):
    """Manifest-level pruning (the Iceberg read-side win): the publisher
    records per-file [min,max] for stats_cols (one distributed job, never
    a per-file loop) and read_manifest(where=...) drops non-overlapping
    files BEFORE Spark plans the scan. On a Z-ordered two-column layout a
    10% range on EITHER column must prune to <45% of files, the pruned
    read must still contain every matching row (conservative superset),
    and files without stats must never be pruned."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.sources.maintenance import (
        compact_manifest_table,
        publish_append_manifest,
        read_manifest,
    )

    from n2kupdate_spark.sources.maintenance import dir_stats

    d = tmp_path / "tbl"
    n = 200_000
    # x random-ish, y independent — the layout zorder exists for
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") * 48271 % 65536).alias("x"),
        ((F.col("id") * 16807 + 7) % 65536).alias("y"),
    )
    df.repartition(6).write.parquet(str(d / "batch-0000000001"))
    publish_append_manifest(spark, str(d), "batch-0000000001", version=1)

    # ~64 files for pruning granularity (the footer-pruning test's setup)
    target_mb = dir_stats(spark, str(d / "batch-0000000001"))["bytes"] / 64 / 1024 / 1024
    stats = compact_manifest_table(
        spark, str(d), target_mb=target_mb, zorder_by=["x", "y"]
    )
    assert stats["after"]["files"] >= 40

    import json

    mdoc = json.loads(
        sorted(d.glob("_manifest-*.json"))[-1].read_text()
    )
    assert all("stats" in f and set(f["stats"]) == {"x", "y"} for f in mdoc["files"])

    full = read_manifest(spark, str(d))
    n_files = stats["after"]["files"]
    for col in ("x", "y"):
        lo, hi = 30000, 36553  # ~10% of the 65536 domain
        pruned = read_manifest(spark, str(d), where=[(col, lo, hi)])
        n_pruned_files = pruned.select(
            F.input_file_name()
        ).distinct().count()
        assert n_pruned_files < 0.45 * n_files, (col, n_pruned_files, n_files)
        want = sorted(
            r["id"] for r in full.filter(F.col(col).between(lo, hi)).collect()
        )
        got = sorted(
            r["id"] for r in pruned.filter(F.col(col).between(lo, hi)).collect()
        )
        assert got == want, col

    # no-overlap predicate -> zero files but a schema'd empty frame
    none = read_manifest(spark, str(d), where=[("x", 100_000, None)])
    assert none.count() == 0 and none.columns == full.columns

    # files lacking stats are never pruned: append a stats-less batch
    spark.range(n, n + 10).select(
        F.col("id"), F.lit(999_999).alias("x"), F.lit(0).alias("y")
    ).coalesce(1).write.parquet(str(d / "batch-extra"))
    publish_append_manifest(spark, str(d), "batch-extra")  # no stats_cols
    still = read_manifest(spark, str(d), where=[("x", 100_000, None)])
    assert still.count() == 10  # the stats-less file survives pruning


def test_rollback_manifest_restores_without_deleting(spark, tmp_path):
    """rollback_manifest commits a NEW version copying the target's file
    list — readers flip back atomically, the bad version stays readable
    for forensics, and a vacuum afterwards retires the bad version's
    files while the restored (shared) files survive."""
    from n2kupdate_spark.sources.maintenance import (
        manifest_versions,
        publish_append_manifest,
        read_manifest,
        rollback_manifest,
        vacuum_unreferenced,
    )

    d = tmp_path / "tbl"
    spark.range(100).coalesce(1).write.parquet(str(d / "batch-0000000001"))
    publish_append_manifest(spark, str(d), "batch-0000000001", version=1)
    # the "bad" publish: a corrupt-looking batch
    spark.range(100, 101).coalesce(1).write.parquet(str(d / "batch-0000000002"))
    publish_append_manifest(spark, str(d), "batch-0000000002", version=2)
    assert read_manifest(spark, str(d)).count() == 101

    rollback_manifest(spark, str(d), to_version=1)
    assert manifest_versions(spark, str(d)) == [1, 2, 3]
    assert read_manifest(spark, str(d)).count() == 100          # restored
    assert read_manifest(spark, str(d), version=2).count() == 101  # forensics

    # vacuum to the restored state: v3 (+v2 within keep window) decide refs
    vacuum_unreferenced(spark, str(d), keep_versions=1)
    assert manifest_versions(spark, str(d)) == [3]
    assert read_manifest(spark, str(d)).count() == 100
    assert not (d / "batch-0000000002").exists()  # bad batch retired


def test_manifest_stats_no_suffix_name_collision(spark, tmp_path):
    """r8 advice (medium): _attach_stats must match URIs only with the
    path separator — a bare-suffix fallback let '11.parquet' satisfy an
    endswith('1.parquet') probe, stamping the wrong [min,max] onto
    '1.parquet' and making where= pruning silently drop files. Pin: two
    files where one name is a strict suffix of the other get each their
    OWN range, and a pruned read on the suffix-victim's range is exact."""
    import glob as _glob
    import json
    import shutil

    from n2kupdate_spark.sources.maintenance import publish_manifest, read_manifest

    d = tmp_path / "tbl"
    d.mkdir()
    for fname, lo, hi in (("1.parquet", 0, 10), ("11.parquet", 100, 110)):
        tmp = tmp_path / f"tmp_{fname}"
        spark.range(lo, hi).withColumnRenamed("id", "v").coalesce(1).write.parquet(
            str(tmp)
        )
        shutil.move(_glob.glob(f"{tmp}/part-*.parquet")[0], str(d / fname))
    publish_manifest(spark, str(d), stats_cols=["v"])

    doc = json.loads((d / "_manifest-0000000001.json").read_text())
    stats = {f["name"]: f["stats"]["v"] for f in doc["files"]}
    assert stats["1.parquet"] == [0, 9], stats
    assert stats["11.parquet"] == [100, 109], stats
    # range unique to 1.parquet: wrong stats on it would prune it away
    got = sorted(
        r["v"] for r in read_manifest(spark, str(d), where=[("v", 0, 9)]).collect()
    )
    assert got == list(range(10))


def test_atomic_put_json_unique_temp_no_clobber(spark, tmp_path):
    """r8 advice (low): the commit temp name is unique per writer. A
    concurrent writer's in-progress bytes under the OLD shared temp name
    (.{name}.tmp) must never be overwritten or committed by another
    publisher — the rename-onto-existing refusal is the only race left."""
    import json

    from n2kupdate_spark.sources.maintenance import atomic_put_json

    d = tmp_path / "tbl"
    d.mkdir()
    torn = d / "._doc.json.tmp"  # writer A, mid-write, shared-name era
    torn.write_text('{"torn": tru')
    atomic_put_json(spark, str(d), "_doc.json", {"ok": 1})
    assert json.loads((d / "_doc.json").read_text()) == {"ok": 1}
    assert torn.read_text() == '{"torn": tru'  # untouched, never committed


def test_concurrent_publisher_version_race_pinned(spark, tmp_path):
    """Optimistic-concurrency pin (r8 verdict growth edge): two appenders
    that both observed max_version=1 race for version 2. Exactly one
    rename commits; the loser gets FileExistsError (never torn state,
    never a silent overwrite) and retrying with default allocation lands
    its batch as the NEXT version with the winner's files preserved."""
    import pytest as _pytest

    from n2kupdate_spark.sources.maintenance import (
        manifest_versions,
        publish_append_manifest,
        read_manifest,
    )

    d = tmp_path / "tbl"
    spark.range(10).withColumnRenamed("id", "v").coalesce(1).write.parquet(
        str(d / "batch-0000000001")
    )
    publish_append_manifest(spark, str(d), "batch-0000000001", version=1)
    spark.range(10, 20).withColumnRenamed("id", "v").coalesce(1).write.parquet(
        str(d / "batch-a")
    )
    spark.range(20, 30).withColumnRenamed("id", "v").coalesce(1).write.parquet(
        str(d / "batch-b")
    )
    publish_append_manifest(spark, str(d), "batch-a", version=2)  # winner
    with _pytest.raises(FileExistsError):
        publish_append_manifest(spark, str(d), "batch-b", version=2)  # loser

    assert manifest_versions(spark, str(d)) == [1, 2]
    got_v2 = sorted(r["v"] for r in read_manifest(spark, str(d)).collect())
    assert got_v2 == list(range(20))  # winner's commit, intact

    # loser retries with commit-time allocation -> version 3, both batches in
    publish_append_manifest(spark, str(d), "batch-b")
    assert manifest_versions(spark, str(d)) == [1, 2, 3]
    got_v3 = sorted(r["v"] for r in read_manifest(spark, str(d)).collect())
    assert got_v3 == list(range(30))


def test_avro_pure_python_round_trip_all_types(spark, tmp_path):
    """The no-jar Avro datasource (sources/avro_py.py) round-trips the
    full supported type surface EXACTLY: longs/ints/doubles/floats/
    booleans/strings/bytes, nulls in every column (the ["null", T]
    union), arrays and maps, multi-block files, and a deflate-coded
    file decodes identically to its null-codec twin. A corrupted sync
    marker must raise, not mis-parse."""
    import io
    import json
    import struct as _struct
    import zlib

    import pytest as _pytest
    from pyspark.sql import Row

    from n2kupdate_spark.sources.avro_py import (
        _parse_header,
        read_avro,
        write_avro_local,
    )

    rows = [
        Row(i=1, l=2**40, d=1.5, f=2.5, b=True, s="héllo", raw=b"\x00\x01",
            arr=[1, 2, 3], m={"a": 1.0, "b": 2.0}),
        Row(i=None, l=None, d=None, f=None, b=None, s=None, raw=None,
            arr=None, m=None),
        Row(i=-7, l=-1, d=-0.25, f=0.0, b=False, s="", raw=b"",
            arr=[], m={}),
    ]
    df = spark.createDataFrame(
        rows,
        "i int, l long, d double, f float, b boolean, s string, raw binary, "
        "arr array<int>, m map<string,double>",
    )
    path = str(tmp_path / "t.avro")
    assert write_avro_local(df, path, block_records=2) == 3  # multi-block
    back = read_avro(spark, path)
    assert back.schema == df.schema

    def canon(r):
        d = r.asDict(recursive=True)
        d["raw"] = bytes(d["raw"]) if d["raw"] is not None else None
        return tuple(
            tuple(sorted(v.items())) if isinstance(v, dict) else
            tuple(v) if isinstance(v, list) else v
            for _, v in sorted(d.items())
        )

    assert sorted(map(canon, back.collect()), key=repr) == sorted(
        map(canon, df.collect()), key=repr
    )

    # deflate codec: rewrite the same blocks deflate-coded; identical rows
    raw = open(path, "rb").read()
    buf = io.BytesIO(raw)
    schema, codec, sync = _parse_header(buf)
    assert codec == "null"
    out = io.BytesIO()
    out.write(b"Obj\x01")
    from n2kupdate_spark.sources.avro_py import _encode, _read_long, _write_long

    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"deflate"}
    _encode({"type": "map", "values": "bytes"}, meta, out)
    out.write(sync)
    while True:
        h = buf.read(1)
        if not h:
            break
        buf.seek(-1, 1)
        n = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        assert buf.read(16) == sync
        comp = zlib.compress(block)[2:-4]  # raw deflate (no zlib wrapper)
        _write_long(out, n)
        _write_long(out, len(comp))
        out.write(comp)
        out.write(sync)
    dpath = str(tmp_path / "t_deflate.avro")
    open(dpath, "wb").write(out.getvalue())
    assert sorted(map(canon, read_avro(spark, dpath).collect()), key=repr) == sorted(
        map(canon, df.collect()), key=repr
    )

    # corrupted sync marker -> loud failure
    bad = bytearray(raw)
    bad[-3] ^= 0xFF
    bpath = str(tmp_path / "t_bad.avro")
    open(bpath, "wb").write(bytes(bad))
    with _pytest.raises(Exception, match="sync|corrupt"):
        read_avro(spark, bpath).collect()


def test_source_avro_query_matches_parquet(spark, sf_dir):
    """The registered source_avro op returns exactly the parquet-loaded
    nation table (same projection), twice (determinism)."""
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    want = sorted(
        (r["n_nationkey"], r["n_name"], r["n_regionkey"])
        for r in load(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect()
    )
    for _ in range(2):
        got = sorted(
            (r["n_nationkey"], r["n_name"], r["n_regionkey"])
            for r in QUERIES["source_avro"](spark, sf_dir).collect()
        )
        assert got == want and len(got) == 25


def test_avro_distributed_write_round_trip(spark, sf_dir, tmp_path):
    """write_avro: each task streams its partition into its own OCF part
    file; read_avro over the directory returns exactly the input rows
    (documents table, 4 partitions), and nulls survive the union."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.sources import load
    from n2kupdate_spark.sources.avro_py import read_avro, write_avro

    d = load(spark, sf_dir, "documents").withColumn(
        "lang", F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("lang"))
    ).repartition(4)
    out = str(tmp_path / "docs_avro")
    n = write_avro(d, out)
    assert n == d.count()
    import glob as _glob

    assert len(_glob.glob(f"{out}/part-*.avro")) == 4
    back = read_avro(spark, out)
    key = lambda r: (r["doc_id"],)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, d.collect()))
    nulls = back.filter(F.col("lang").isNull()).count()
    assert nulls == d.filter(F.col("lang").isNull()).count() > 0


def test_avro_varint_zigzag_property():
    """Hypothesis: every int64 round-trips through the Avro zigzag
    varint encoder/decoder byte-exactly (the primitive every other
    avro_py codepath builds on)."""
    import io

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from n2kupdate_spark.sources.avro_py import _read_long, _write_long

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    def roundtrip(n):
        out = io.BytesIO()
        _write_long(out, n)
        assert _read_long(io.BytesIO(out.getvalue())) == n

    roundtrip()


def test_avro_python_datasource_format(spark, sf_dir, tmp_path):
    """r11: the Spark-4 Python DataSource wrapper (format("n2k_avro")).
    Pins: (1) spark.read.format over a multi-file directory returns
    exactly write_avro's input rows (nulls included) with the same
    schema read_avro resolves; (2) parallelism is one InputPartition per
    OCF file (the documented no-jar trade); (3) the source works from
    pure SQL via CREATE ... USING n2k_avro; (4) a missing path raises."""
    import glob as _glob

    import pytest as _pytest
    from pyspark.sql import functions as F

    from n2kupdate_spark.sources import load
    from n2kupdate_spark.sources.avro_ds import AvroPyDataSource
    from n2kupdate_spark.sources.avro_py import read_avro, write_avro

    spark.dataSource.register(AvroPyDataSource)

    d = load(spark, sf_dir, "documents").withColumn(
        "lang", F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("lang"))
    ).repartition(3)
    out = str(tmp_path / "docs_avro_ds")
    write_avro(d, out)
    n_files = len(_glob.glob(f"{out}/part-*.avro"))
    assert n_files == 3

    got = spark.read.format("n2k_avro").load(out)
    assert got.schema == read_avro(spark, out).schema
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, d.collect()))
    assert got.filter(F.col("lang").isNull()).count() == d.filter(
        F.col("lang").isNull()
    ).count() > 0
    # one partition per file
    assert got.rdd.getNumPartitions() == n_files

    # SQL surface
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW avro_ds_docs "
        f"USING n2k_avro OPTIONS (path '{out}')"
    )
    assert spark.sql("SELECT COUNT(*) AS n FROM avro_ds_docs").first()["n"] == d.count()

    with _pytest.raises(Exception, match="no avro files|path"):
        spark.read.format("n2k_avro").load(str(tmp_path / "nope")).collect()


def test_avro_ds_mixed_schema_directory_raises(spark, tmp_path):
    """r12 (ADVICE): n2k_avro resolves the schema from the directory's
    FIRST file; a directory mixing evolved Avro schemas used to die with
    an opaque executor KeyError mid-decode. Now each task checks its own
    file's header against the resolved schema and raises a ValueError
    naming the file and the missing field(s)."""
    import shutil

    import pytest as _pytest

    from n2kupdate_spark.sources.avro_ds import AvroPyDataSource
    from n2kupdate_spark.sources.avro_py import write_avro

    spark.dataSource.register(AvroPyDataSource)

    a = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "extra"]).coalesce(1)
    b = spark.createDataFrame([(3,), (4,)], ["id"]).coalesce(1)
    write_avro(a, str(tmp_path / "a"))
    write_avro(b, str(tmp_path / "b"))
    mixed = tmp_path / "mixed"
    mixed.mkdir()
    import glob as _glob

    # 'a' sorts first → schema (id, extra) resolved from it; 'b' lacks extra
    shutil.copy(_glob.glob(str(tmp_path / "a" / "part-*.avro"))[0], mixed / "a.avro")
    shutil.copy(_glob.glob(str(tmp_path / "b" / "part-*.avro"))[0], mixed / "b.avro")

    df = spark.read.format("n2k_avro").load(str(mixed))
    assert [f.name for f in df.schema.fields] == ["id", "extra"]
    with _pytest.raises(Exception, match="missing in.*b\\.avro|same record schema"):
        df.collect()


def test_avro_ds_mixed_type_directory_raises(spark, tmp_path):
    """r12 review follow-up: the mixed-schema guard must catch a shared
    field whose TYPE evolved, not just a missing field — otherwise the
    task still dies with an opaque ArrowTypeError downstream."""
    import shutil

    import pytest as _pytest

    from n2kupdate_spark.sources.avro_ds import AvroPyDataSource
    from n2kupdate_spark.sources.avro_py import write_avro

    spark.dataSource.register(AvroPyDataSource)

    a = spark.createDataFrame([(1, 5)], ["id", "v"]).coalesce(1)
    b = spark.createDataFrame([(2, "s")], ["id", "v"]).coalesce(1)
    write_avro(a, str(tmp_path / "a"))
    write_avro(b, str(tmp_path / "b"))
    mixed = tmp_path / "mixed"
    mixed.mkdir()
    import glob as _glob

    shutil.copy(_glob.glob(str(tmp_path / "a" / "part-*.avro"))[0], mixed / "a.avro")
    shutil.copy(_glob.glob(str(tmp_path / "b" / "part-*.avro"))[0], mixed / "b.avro")

    df = spark.read.format("n2k_avro").load(str(mixed))
    with _pytest.raises(Exception, match="type mismatch.*b\\.avro|same record schema"):
        df.collect()


def test_xml_pure_python_round_trip_all_types(spark, tmp_path):
    """r13: the stdlib-ElementTree XML datasource round-trips the common
    scalar surface byte-exact — incl. NULLs (absent element), the
    ""/NULL distinction, markup characters in values (& < > \" '),
    unicode, booleans, decimals-as-declared-doubles, dates and
    timestamps — and a malformed document raises loudly."""
    import datetime as dt

    import pytest
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from n2kupdate_spark.sources.xml_py import read_xml, write_xml_local

    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("dt", T.DateType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    rows = [
        Row(i=1, s="plain", d=1.5, b=True,
            dt=dt.date(2026, 1, 2), ts=dt.datetime(2026, 1, 2, 3, 4, 5)),
        Row(i=2, s="mark<up> & \"quotes\" 'too'", d=-0.0001220703125, b=False,
            dt=None, ts=None),
        Row(i=None, s=None, d=None, b=None, dt=None, ts=None),
        Row(i=4, s="", d=2.0, b=True, dt=dt.date(1999, 12, 31), ts=None),
        Row(i=5, s="unicodé ✓ Ω", d=3.14159, b=False, dt=None, ts=None),
    ]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "t.xml")
    write_xml_local(df, path)
    back = read_xml(spark, path, schema).collect()
    assert sorted(
        [tuple(r) for r in back], key=lambda t: (t[0] is None, t[0])
    ) == sorted([tuple(r) for r in rows], key=lambda t: (t[0] is None, t[0]))
    # "" survived as "" and NULL as NULL
    by_i = {r["i"]: r for r in back}
    assert by_i[4]["s"] == "" and by_i[None]["s"] is None

    bad = tmp_path / "bad.xml"
    bad.write_bytes(b"<rows><row><i>1</i></row>")  # unclosed root
    with pytest.raises(Exception, match="ParseError|no element found|mismatch"):
        read_xml(spark, str(bad), schema).collect()


def test_xml_distributed_write_round_trip(spark, sf_dir, tmp_path):
    """r13: the distributed XML writer emits one part file per
    partition and the reader reassembles the exact table with one
    parse task per file (per-file parallelism — the avro_py layout)."""
    import glob as _glob

    from n2kupdate_spark.sources import load
    from n2kupdate_spark.sources.xml_py import read_xml, write_xml

    nation = load(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_xml")
    write_xml(nation.repartition(4), out)
    parts = _glob.glob(out + "/part-*.xml")
    assert len(parts) == 4
    back = read_xml(spark, out, nation.schema)
    assert back.rdd.getNumPartitions() >= 1
    a = sorted(tuple(r) for r in back.collect())
    b = sorted(tuple(r) for r in nation.collect())
    assert a == b


def test_xml_query_matches_parquet_nation(spark, sf_dir):
    """r13: the registered source_xml query equals the parquet nation
    projection row-for-row."""
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    got = sorted(tuple(r) for r in QUERIES["source_xml"](spark, sf_dir).collect())
    want = sorted(
        tuple(r)
        for r in load(spark, sf_dir, "nation")
        .filter("n_regionkey >= 0")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect()
    )
    assert got == want


def test_xml_python_datasource_format(spark, sf_dir, tmp_path):
    """r13: the n2k_xml Spark 4 Python DataSource — format() with a
    DECLARED schema equals the write_xml input row-for-row; one
    partition per file; no-schema read infers an all-string struct
    (names only — the source refuses to guess types); SQL USING works;
    missing path raises."""
    import pytest

    from n2kupdate_spark.sources import load
    from n2kupdate_spark.sources.xml_ds import XmlPyDataSource
    from n2kupdate_spark.sources.xml_py import write_xml

    spark.dataSource.register(XmlPyDataSource)
    nation = load(spark, sf_dir, "nation")
    out = str(tmp_path / "nx")
    write_xml(nation.repartition(3), out)

    back = spark.read.schema(nation.schema).format("n2k_xml").load(out)
    assert back.rdd.getNumPartitions() == 3
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in nation.collect()
    )

    inferred = spark.read.format("n2k_xml").load(out)
    assert all(f.dataType.simpleString() == "string" for f in inferred.schema.fields)
    assert {f.name for f in inferred.schema.fields} <= {
        f.name for f in nation.schema.fields
    }
    assert inferred.count() == nation.count()

    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW nx_sql USING n2k_xml OPTIONS (path '{out}')"
    )
    assert spark.table("nx_sql").count() == nation.count()

    with pytest.raises(Exception):
        spark.read.schema(nation.schema).format("n2k_xml").load(
            str(tmp_path / "missing")
        ).collect()


def test_parquet_layout_report_vs_duckdb_metadata(spark):
    """r14: the layout advisor's footer arithmetic ≡ a DuckDB
    parquet_metadata() recompute (a genuinely independent reader of the
    same footers) on both demo twins; geometry: the Z-ordered twin's
    point_read_frac ≈ 1/n_files while the hash twin reads ≈ 1.0 — the
    number that proves a zorder rewrite earned its cost; a column with
    a constant value reads exactly 1.0 (nothing prunable)."""
    import glob
    import os

    import duckdb
    import numpy as np

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.queries.scans import _LAYOUT_BASE
    from n2kupdate_spark.sources.maintenance import parquet_layout_report

    got = {
        (r["layout"], r["column"]): r
        for r in QUERIES["diag_parquet_layout"](spark, "/root/testdata/sf0.01").collect()
    }

    con = duckdb.connect()
    import hashlib as _hl

    sfkey = _hl.md5(b"/root/testdata/sf0.01").hexdigest()[:8]
    for layout, sub in (("hash_orderkey", "plain"), ("zorder_totalprice", "zorder")):
        pat = os.path.join(_LAYOUT_BASE, sfkey, sub, "*.parquet")
        md = con.execute(
            f"""
            SELECT file_name, row_group_id,
                   CAST(stats_min_value AS DOUBLE) AS vmin,
                   CAST(stats_max_value AS DOUBLE) AS vmax
            FROM parquet_metadata('{pat}')
            WHERE path_in_schema = 'o_totalprice'
            """
        ).fetchall()
        n_files = len({m[0] for m in md})
        n_groups = len(md)
        gmin = min(m[2] for m in md)
        gmax = max(m[3] for m in md)
        frac = sum(m[3] - m[2] for m in md) / ((gmax - gmin) * n_groups)
        want = float(np.round(frac * 10000) / 10000 + 0.0)
        g = got[(layout, "o_totalprice")]
        assert (g["n_files"], g["n_row_groups"]) == (n_files, n_groups), layout
        assert g["point_read_frac"] == want, (layout, g["point_read_frac"], want)
    assert got[("hash_orderkey", "o_totalprice")]["point_read_frac"] > 0.9
    zfrac = got[("zorder_totalprice", "o_totalprice")]["point_read_frac"]
    assert zfrac < 2.0 / 8  # ~1/n_files with quantile-cut slack

    # constant column: nothing prunable, frac exactly 1.0
    const_dir = os.path.join(_LAYOUT_BASE, "const")
    spark.range(1000).selectExpr("id", "CAST(42.0 AS DOUBLE) AS c").repartition(4).write.mode(
        "overwrite"
    ).parquet(const_dir)
    rep = {
        r["column"]: r for r in parquet_layout_report(spark, const_dir, ["c"]).collect()
    }
    assert rep["c"]["point_read_frac"] == 1.0
    assert len(glob.glob(os.path.join(const_dir, "*.parquet"))) == rep["c"]["n_files"]


def test_schema_diff_vs_duckdb_describe(spark):
    """r14: the drift report ≡ a DuckDB DESCRIBE recompute over the
    same two datasets (independent footer reader; type names mapped
    through a fixed spark↔duckdb table) — every drift class present:
    extra removed, flag added, v type_changed, id unchanged. Also the
    degenerate self-diff: everything unchanged."""
    import os

    import duckdb

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.queries.scans import _EVO2_DIR, _EVO_DIR
    from n2kupdate_spark.sources.maintenance import schema_diff_report

    got = {
        r["column"]: (r["type_a"], r["type_b"], r["status"])
        for r in QUERIES["diag_schema_diff"](spark, "ignored").collect()
    }
    assert got["extra"][2] == "removed"
    assert got["flag"][2] == "added"
    assert got["v"] == ("bigint", "double", "type_changed")
    assert got["id"] == ("bigint", "bigint", "unchanged")

    duck2spark = {"BIGINT": "bigint", "DOUBLE": "double",
                  "VARCHAR": "string", "BOOLEAN": "boolean"}
    con = duckdb.connect()

    def duck_schema(path):
        out = {}
        for name, typ, *_ in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{path}/*.parquet', union_by_name=true)"
        ).fetchall():
            out[name] = duck2spark[typ]
        return out

    a, b = duck_schema(_EVO_DIR), duck_schema(_EVO2_DIR)
    want = {}
    for c in sorted(set(a) | set(b)):
        ta, tb = a.get(c), b.get(c)
        st = ("added" if ta is None else "removed" if tb is None
              else "type_changed" if ta != tb else "unchanged")
        want[c] = (ta, tb, st)
    assert got == want

    self_diff = {
        r["column"]: r["status"]
        for r in schema_diff_report(spark, _EVO_DIR, _EVO_DIR).collect()
    }
    assert set(self_diff.values()) == {"unchanged"}


def test_murmur3_long_matches_spark_hash(spark):
    """The pure-python Murmur3 behind _perfect_partition_tokens must be
    bit-identical to the JVM hash HashPartitioning applies to longs —
    positive, negative, and >2^32 values — or perfect-token placement
    would silently scatter (r16: the distributed probe was replaced by
    this driver-side computation)."""
    from n2kupdate_spark.sources.maintenance import (
        _murmur3_long,
        _perfect_partition_tokens,
    )

    vals = list(range(0, 200)) + [-1, -5, -123456789012, 10**12, 2**40 + 7]
    df = spark.createDataFrame([(v,) for v in vals], "id long").select(
        "id", F.hash(F.col("id")).alias("h")
    )
    for r in df.collect():
        assert _murmur3_long(r["id"]) == r["h"], r["id"]

    # and the derived tokens land each on its own partition slot
    for n in (2, 8, 17):
        toks = _perfect_partition_tokens(spark, n)
        assert sorted(_murmur3_long(t) % n for t in toks) == list(range(n))


def test_load_plan_cache_hits_and_invalidates(spark, sf_dir, tmp_path):
    """The load() logical-plan cache (r16): repeat loads serve the SAME
    resolved plan (no re-inference), projected variants match a fresh
    read, and regenerating the source parquet invalidates the entry —
    the cached plan must never survive a fixture rewrite."""
    import shutil
    import os

    from n2kupdate_spark.sources import load
    from n2kupdate_spark.sources.catalog import _PLAN_CACHE

    d1 = load(spark, sf_dir, "documents")
    d2 = load(spark, sf_dir, "documents")
    assert d1 is d2  # cache hit: identical plan object
    proj = load(spark, sf_dir, "documents", columns=["doc_id"])
    assert proj.columns == ["doc_id"]
    assert proj.count() == d1.count()

    # copy the fixture into a writable dir, load, then REGENERATE with
    # fewer rows: the next load must see the new contents, not the plan
    # cached against the old files
    wdir = str(tmp_path / "sfcopy")
    os.makedirs(wdir)
    for t in ("documents",):
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{wdir}/{t}.parquet")
    n_before = load(spark, wdir, "documents").count()
    half = load(spark, sf_dir, "documents").limit(max(1, n_before // 2))
    half.write.mode("overwrite").parquet(str(tmp_path / "half.parquet"))
    os.remove(f"{wdir}/documents.parquet")
    shutil.copytree(str(tmp_path / "half.parquet"), f"{wdir}/documents.parquet")
    n_after = load(spark, wdir, "documents").count()
    assert n_after == max(1, n_before // 2)
    assert any(k[1] == wdir for k in _PLAN_CACHE)
