from n2kupdate_spark.sources.catalog import (
    SCHEMAS,
    TABLES,
    bucketed_layout,
    load,
    register_bucketed,
    table_path,
    validate_schema,
    write_bucketed,
)
from n2kupdate_spark.sources.maintenance import compact_parquet, dir_stats

__all__ = [
    "TABLES",
    "SCHEMAS",
    "load",
    "table_path",
    "validate_schema",
    "bucketed_layout",
    "register_bucketed",
    "write_bucketed",
    "compact_parquet",
    "dir_stats",
]
