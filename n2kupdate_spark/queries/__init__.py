"""Operator-query registry (SURVEY.md §2 contract).

Importing this package populates QUERIES / ORACLE from every group module.
"""

from n2kupdate_spark.queries._registry import ORACLE, QUERIES, register

# Each import registers its group's operators (order = SURVEY.md §2 order).
from n2kupdate_spark.queries import (  # noqa: E402,F401
    scans,
    projection,
    fingerprints,
    joins,
    aggregates,
    windows,
    setops,
    scalars,
    merges,
    streaming_batch,
    text,
    vectors,
    udfs,
    dedupq,
    ann,
    mlprep,
    composite,
)

__all__ = ["QUERIES", "ORACLE", "register"]
