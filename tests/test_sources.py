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
