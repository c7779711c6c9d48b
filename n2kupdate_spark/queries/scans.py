"""B1 — scans & sources (SURVEY.md §2 B1).

Reference analog: each store function reads caller-provided frames and only
the declared columns survive normalization (``character_df``-style coercion,
⟨pub⟩ R/ internal helpers [M]). Here scans are parquet reads where Catalyst
pushes projection and predicates into the format — `.explain()` shows
ReadSchema (pruning) and PushedFilters; asserted in tests/test_plans.py.
"""

from __future__ import annotations

import csv
import io
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from n2kupdate_spark.queries._registry import register
from n2kupdate_spark.sources import load


@register(
    "scan_parquet",
    oracle="SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of a registered table (pass-through columns, no compute)."""
    return load(spark, sf_dir, "part")


@register(
    "scan_prune_columns",
    oracle="SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem",
)
def scan_prune_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan reading only 3 of 11 lineitem columns — the projection reaches
    the parquet reader (ReadSchema pruning)."""
    return load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_extendedprice"])


@register(
    "scan_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity < 5 AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushed into the parquet scan (row-group stats pruning)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") < 5) & (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")))
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


#: Deterministic CSV payload for source_csv.
_CSV_ROWS = [(i, f"name_{i}", round(i * 1.5, 2)) for i in range(1, 26)]
_CSV_PATH = os.path.join(tempfile.gettempdir(), "n2kupdate_spark_source.csv")
_JSON_PATH = os.path.join(tempfile.gettempdir(), "n2kupdate_spark_source.jsonl")


def _write_source_files() -> None:
    """Materialize the deterministic CSV/JSONL fixtures. Called at import
    time (not just inside the query fns) so the DuckDB oracle can read the
    same files regardless of whether the driver runs Spark or oracle first."""
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(["id", "name", "score"])
    w.writerows(_CSV_ROWS)
    with open(_CSV_PATH, "w") as f:
        f.write(buf.getvalue())
    with open(_JSON_PATH, "w") as f:
        for i in range(1, 26):
            f.write('{"id": %d, "k": %d, "tag": "t%d"}\n' % (i, i * 7 % 5, i % 3))
        f.write('{"id": bad json line\n')  # exercised: quarantined, not fatal


_write_source_files()


@register(
    "source_csv",
    oracle=f"""
    SELECT id, name, score
    FROM read_csv('{_CSV_PATH}', header=true,
                  columns={{'id': 'BIGINT', 'name': 'VARCHAR', 'score': 'DOUBLE'}})
    """,
)
def source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingestion with an explicit schema (no inference pass — at scale,
    schema inference is a full read). Oracle: DuckDB read_csv over the same
    file with the same typed column spec."""
    _write_source_files()
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    return spark.read.schema(schema).option("header", "true").csv(_CSV_PATH)


@register(
    "source_json",
    oracle=f"""
    SELECT id, k, tag
    FROM read_json('{_JSON_PATH}', format='newline_delimited',
                   columns={{'id': 'BIGINT', 'k': 'INTEGER', 'tag': 'VARCHAR'}},
                   ignore_errors=true)
    """,
)
def source_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines ingestion with an explicit schema (the events.props column
    ingested as first-class JSON records). At scale, explicit schemas skip
    the inference read AND let corrupt records route to a quarantine column
    (PERMISSIVE + columnNameOfCorruptRecord) instead of failing the scan.
    Both engines surface the corrupt trailing line as one all-NULL row
    (Spark PERMISSIVE; DuckDB ignore_errors), so the 26-row result
    hash-matches; the quarantine column itself is asserted in
    tests/test_sources.py (engine-specific payload, excluded from the
    oracle projection)."""
    _write_source_files()
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("k", T.IntegerType()),
            T.StructField("tag", T.StringType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(_JSON_PATH)
        .select("id", "k", "tag")
    )
