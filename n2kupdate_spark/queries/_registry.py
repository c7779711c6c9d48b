"""Registry wiring SURVEY.md §2 operator ids → (Spark query, DuckDB oracle).

Each operator id from the §2 contract registers a callable
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) the equivalent
ANSI SQL the DuckDB oracle runs on the same parquet views. The driver
hash-matches the two (row count + schema + order-insensitive value hash), so
every computed column is aliased identically on both sides and every float
is rounded to 4 decimals (SURVEY.md §7.4).
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an operator query; ``oracle=None`` → rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco
