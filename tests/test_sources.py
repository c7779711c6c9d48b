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
