"""Table registry: name → parquet path + fixed StructType, with validation.

Reference analog: every ``store_*`` function in n2kupdate begins by asserting
the presence and type of each expected column before touching the database
(``assertthat::has_name`` / ``is.character`` guards — ⟨pub⟩ every
R/store_*.R [H], SURVEY.md §1.3). This module is that schema system for our
engine: one declared StructType per registered table, asserted at load.

Scale notes: schemas are declared, never inferred — at 100 TB, schema
inference is a full-data pass; an explicit registry makes reads zero-cost and
guarantees column pruning works from the first plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from n2kupdate_spark.session import tune

#: All driver-registered tables (TESTDATA.md; schemas verified in FIXTURES.md §1).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


SCHEMAS: dict[str, T.StructType] = {
    "region": _s(("r_regionkey", T.IntegerType()), ("r_name", T.StringType())),
    "nation": _s(
        ("n_nationkey", T.IntegerType()),
        ("n_name", T.StringType()),
        ("n_regionkey", T.IntegerType()),
    ),
    "customer": _s(
        ("c_custkey", T.LongType()),
        ("c_name", T.StringType()),
        ("c_nationkey", T.IntegerType()),
        ("c_acctbal", T.DoubleType()),
        ("c_mktsegment", T.StringType()),
    ),
    "supplier": _s(
        ("s_suppkey", T.LongType()),
        ("s_name", T.StringType()),
        ("s_nationkey", T.IntegerType()),
        ("s_acctbal", T.DoubleType()),
    ),
    "part": _s(
        ("p_partkey", T.LongType()),
        ("p_name", T.StringType()),
        ("p_brand", T.StringType()),
        ("p_type", T.StringType()),
        ("p_size", T.IntegerType()),
        ("p_retailprice", T.DoubleType()),
    ),
    "orders": _s(
        ("o_orderkey", T.LongType()),
        ("o_custkey", T.LongType()),
        ("o_orderstatus", T.StringType()),
        ("o_totalprice", T.DoubleType()),
        ("o_orderdate", T.TimestampType()),
        ("o_orderpriority", T.StringType()),
    ),
    "lineitem": _s(
        ("l_orderkey", T.LongType()),
        ("l_partkey", T.LongType()),
        ("l_suppkey", T.LongType()),
        ("l_linenumber", T.IntegerType()),
        ("l_quantity", T.DoubleType()),
        ("l_extendedprice", T.DoubleType()),
        ("l_discount", T.DoubleType()),
        ("l_tax", T.DoubleType()),
        ("l_returnflag", T.StringType()),
        ("l_linestatus", T.StringType()),
        ("l_shipdate", T.TimestampType()),
    ),
    "events": _s(
        ("event_id", T.LongType()),
        ("ts", T.TimestampType()),
        ("user_id", T.LongType()),
        ("event_type", T.StringType()),
        ("value", T.DoubleType()),
        ("props", T.StringType()),
    ),
    "documents": _s(
        ("doc_id", T.LongType()),
        ("text", T.StringType()),
        ("lang", T.StringType()),
        ("source", T.StringType()),
        ("n_chars", T.LongType()),
    ),
    "embeddings": _s(
        ("vec_id", T.LongType()),
        ("embedding", T.ArrayType(T.FloatType())),
        ("label", T.IntegerType()),
    ),
}


class SchemaValidationError(ValueError):
    """Raised when a loaded DataFrame does not match its registered schema."""


def table_path(sf_dir: str, name: str) -> str:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; registered: {TABLES}")
    return f"{sf_dir}/{name}.parquet"


def validate_schema(df: DataFrame, name: str) -> DataFrame:
    """Fail fast if ``df`` deviates from the registered schema (SURVEY.md §2
    ``validate_schema``). Mirrors the reference's input guards: name presence
    and type equality, order-insensitive."""
    expected = {f.name: f.dataType for f in SCHEMAS[name].fields}
    actual = {f.name: f.dataType for f in df.schema.fields}
    missing = sorted(set(expected) - set(actual))
    extra = sorted(set(actual) - set(expected))
    if missing or extra:
        raise SchemaValidationError(f"{name}: missing columns {missing}, unexpected columns {extra}")
    mistyped = {
        c: (str(actual[c]), str(expected[c]))
        for c in expected
        if actual[c] != expected[c]
    }
    if mistyped:
        raise SchemaValidationError(f"{name}: type mismatches {mistyped}")
    return df


def load(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    validate: bool = True,
) -> DataFrame:
    """Load a registered table; optionally project early (column pruning
    reaches the parquet scan via Catalyst)."""
    tune(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    # Parquet TIMESTAMP(NANOS) arrives as a nanosecond long (see session.py
    # RUNTIME_CONFS); convert to a microsecond TimestampType. Truncation to
    # µs is lossless here (testdata carries zero sub-µs digits) and oracle-
    # facing queries truncate to seconds anyway (SURVEY.md §7.4.3).
    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if validate:
        validate_schema(df, name)
    if columns:
        df = df.select(*columns)
    return df
