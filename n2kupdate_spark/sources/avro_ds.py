"""Avro as a first-class Spark 4 Python DataSource (``format("n2k_avro")``).

:mod:`n2kupdate_spark.sources.avro_py` decodes Avro OCF without the
spark-avro module jar, but as a plain function (binaryFile +
mapInPandas) it lives outside Spark's source machinery. This module
wraps the same decode core in the Spark 4 ``pyspark.sql.datasource``
API, which buys the integration a function cannot provide:

- ``spark.read.format("n2k_avro").load(path)`` and SQL
  ``CREATE ... USING n2k_avro`` work like any built-in source;
- Catalyst plans ONE InputPartition PER FILE (OCF is splittable only at
  sync markers; per-file tasks are the jar-free trade), so parallelism,
  task retry, and locality come from the scheduler instead of a manual
  ``binaryFile`` scan;
- the reader yields Arrow ``RecordBatch``es, so rows cross the
  Python→JVM boundary vectorized — same transport the mapInPandas path
  uses.

Schema resolution happens once, driver-side, from the first file's
header (``avro.schema`` metadata precedes all data) — every file under
the path must therefore carry the SAME record schema; a file whose
header lacks a resolved field fails its task with an explicit
mixed-schema ValueError naming the file (not an opaque KeyError).
Codecs/type
surface are exactly avro_py's (null/deflate; records, arrays, maps,
null-unions, enum→string, fixed→bytes). Paths are driver/executor-
visible filesystems (POSIX/NFS — the no-jar deployment this exists
for); object stores need the real spark-avro module.

Register once per session::

    spark.dataSource.register(AvroPyDataSource)
    spark.read.format("n2k_avro").load("/data/events.avro")
"""

from __future__ import annotations

import glob
import io
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

from n2kupdate_spark.sources.avro_py import (
    _avro_to_spark_type,
    _iter_records,
    _parse_header,
)


def _list_files(path: str) -> list[str]:
    """Expand a file / directory / glob into a sorted file list (sorted
    so partition numbering is deterministic run to run)."""
    if os.path.isdir(path):
        found = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
        ]
    elif os.path.isfile(path):
        found = [path]
    else:
        found = [f for f in glob.glob(path) if os.path.isfile(f)]
    if not found:
        raise FileNotFoundError(f"no avro files under {path!r}")
    return sorted(found)


class AvroFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class AvroPyReader(DataSourceReader):
    def __init__(self, options: dict, schema: T.StructType) -> None:
        self._path = options.get("path")
        if not self._path:
            raise ValueError("n2k_avro requires a path (load(path) or OPTIONS)")
        self._schema = schema

    def partitions(self):
        # one partition per OCF file: the scheduler fans files across
        # executors; within a file, blocks decode sequentially (the
        # format's no-jar splittability trade, same as avro_py)
        return [AvroFilePartition(f) for f in _list_files(self._path)]

    def read(self, partition: AvroFilePartition):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self._schema)
        cols = [f.name for f in self._schema.fields]
        with open(partition.path, "rb") as fh:
            content = fh.read()
        # the driver resolved the schema from the directory's FIRST file;
        # a directory mixing evolved Avro schemas would otherwise surface
        # as an opaque executor KeyError / ArrowTypeError — check this
        # file's own header once (names AND types, r12 review: a shared
        # field whose type evolved is just as mixed as a missing one)
        # and fail with the actual contract violation instead
        file_schema, _, _ = _parse_header(io.BytesIO(content))
        file_struct, _ = _avro_to_spark_type(file_schema)
        file_types = {f.name: f.dataType for f in file_struct.fields}
        missing = [c for c in cols if c not in file_types]
        if missing:
            raise ValueError(
                f"n2k_avro: field(s) {missing} missing in "
                f"{partition.path!r} — schema is resolved from the "
                "directory's first file, so every file must carry the "
                "same record schema (write evolved schemas to separate "
                "directories, or use sources/avro_py's per-file path)"
            )
        mistyped = [
            (f.name, f.dataType.simpleString(), file_types[f.name].simpleString())
            for f in self._schema.fields
            if file_types[f.name] != f.dataType
        ]
        if mistyped:
            detail = ", ".join(
                f"{n}: resolved {a} but file has {b}" for n, a, b in mistyped
            )
            raise ValueError(
                f"n2k_avro: field type mismatch in {partition.path!r} "
                f"({detail}) — schema is resolved from the directory's "
                "first file, so every file must carry the same record "
                "schema (write evolved schemas to separate directories)"
            )
        rows = [{c: rec[c] for c in cols} for rec in _iter_records(content)]
        if rows:
            table = pa.Table.from_pylist(rows, schema=arrow_schema)
            yield from table.to_batches(max_chunksize=8192)


class AvroPyDataSource(DataSource):
    """``format("n2k_avro")`` — pure-Python Avro OCF reader."""

    @classmethod
    def name(cls) -> str:
        return "n2k_avro"

    def schema(self) -> T.StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("n2k_avro requires a path (load(path) or OPTIONS)")
        first = _list_files(path)[0]
        with open(first, "rb") as fh:
            head = fh.read(1 << 20)  # header precedes all data
        schema_json, _, _ = _parse_header(io.BytesIO(head))
        struct_type, _ = _avro_to_spark_type(schema_json)
        if not isinstance(struct_type, T.StructType):
            raise ValueError("top-level avro schema must be a record")
        return struct_type

    def reader(self, schema: T.StructType) -> AvroPyReader:
        return AvroPyReader(self.options, schema)
