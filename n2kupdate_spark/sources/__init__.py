from n2kupdate_spark.sources.catalog import TABLES, SCHEMAS, load, table_path, validate_schema

__all__ = ["TABLES", "SCHEMAS", "load", "table_path", "validate_schema"]
