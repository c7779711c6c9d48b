"""Scale-design assertions over physical plans (SURVEY.md §4): these fail
if a code change silently loses predicate pushdown, column pruning, or
broadcast joins — the properties that make the operators viable at 100 TB."""

from __future__ import annotations

from n2kupdate_spark.plans import (
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    read_schema_columns,
)
from n2kupdate_spark.queries import QUERIES


def test_filter_reaches_parquet_scan(spark, sf_dir):
    df = QUERIES["scan_filter_pushdown"](spark, sf_dir)
    assert has_pushed_filters(df, "l_quantity"), explain_str(df)


def test_projection_prunes_read_schema(spark, sf_dir):
    df = QUERIES["scan_prune_columns"](spark, sf_dir)
    schemas = read_schema_columns(df)
    assert schemas and all(len(cols) == 3 for cols in schemas), schemas


def test_flagship_prunes_unused_columns(spark, sf_dir):
    df = QUERIES["agg_group_sums"](spark, sf_dir)
    (cols,) = read_schema_columns(df)
    # 7 of 11 lineitem columns are needed; the scan must not read the rest
    assert set(cols) == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    }, cols


def test_dimension_join_broadcasts(spark, sf_dir):
    df = QUERIES["join_lookup_inner"](spark, sf_dir)
    assert has_broadcast_join(df), explain_str(df)


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = QUERIES["join_star_multiway"](spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan, plan


def test_topk_uses_take_ordered(spark, sf_dir):
    df = QUERIES["topk_order_limit"](spark, sf_dir)
    assert "TakeOrderedAndProject" in explain_str(df)


def test_asof_join_has_no_join_explosion(spark, sf_dir):
    """The as-of union+window formulation must not contain any join node —
    that's the point (no quadratic pair materialization)."""
    df = QUERIES["join_asof"](spark, sf_dir)
    plan = explain_str(df)
    assert "Join" not in plan, plan
    assert "Window" in plan
