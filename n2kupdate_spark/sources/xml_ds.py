"""XML as a first-class Spark 4 Python DataSource (``format("n2k_xml")``).

:mod:`n2kupdate_spark.sources.xml_py` parses XML without the spark-xml
package, but as a plain function it lives outside Spark's source
machinery. This wraps the same ElementTree core in the Spark 4
``pyspark.sql.datasource`` API (the :mod:`avro_ds` architecture):

- ``spark.read.schema(ddl).format("n2k_xml").load(path)`` and SQL
  ``CREATE ... USING n2k_xml`` work like any built-in source;
- Catalyst plans ONE InputPartition PER FILE (XML is not safely
  splittable mid-document), so parallelism/retry/locality come from the
  scheduler;
- the reader yields Arrow ``RecordBatch``es — vectorized transport.

Schema: the caller should DECLARE it (XML carries no types). When no
schema is given, ``schema()`` infers an ALL-STRING struct from the
first file's first row element's child tags, in document order — the
honest no-type fallback (strings, never guessed numerics); declare the
real types to get them. Row convention is xml_py's: one ``row`` element
per record, NULL = absent child, present-but-empty = "".

Register once per session::

    spark.dataSource.register(XmlPyDataSource)
    spark.read.schema("id long, name string").format("n2k_xml").load(dir)
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from n2kupdate_spark.sources.avro_ds import _list_files
from n2kupdate_spark.sources.xml_py import _xml_bytes_to_rows


class XmlFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class XmlPyReader(DataSourceReader):
    def __init__(self, options: dict, schema: T.StructType) -> None:
        self._path = options.get("path")
        if not self._path:
            raise ValueError("n2k_xml requires a path (load(path) or OPTIONS)")
        self._schema = schema
        self._row_tag = options.get("rowtag", "row")

    def partitions(self):
        return [XmlFilePartition(f) for f in _list_files(self._path)]

    def read(self, partition: XmlFilePartition):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self._schema)
        with open(partition.path, "rb") as fh:
            content = fh.read()
        rows = list(_xml_bytes_to_rows(content, self._schema, self._row_tag))
        if rows:
            table = pa.Table.from_pylist(rows, schema=arrow_schema)
            yield from table.to_batches(max_chunksize=8192)


class XmlPyDataSource(DataSource):
    """``format("n2k_xml")`` — pure-Python (ElementTree) XML reader."""

    @classmethod
    def name(cls) -> str:
        return "n2k_xml"

    def schema(self) -> T.StructType:
        # no declared schema: infer COLUMN NAMES ONLY (all strings) from
        # the first file's first row element — XML carries no types and
        # this source refuses to guess them
        path = self.options.get("path")
        if not path:
            raise ValueError("n2k_xml requires a path (load(path) or OPTIONS)")
        row_tag = self.options.get("rowtag", "row")
        with open(_list_files(path)[0], "rb") as fh:
            root = ET.fromstring(fh.read())
        first = next(root.iter(row_tag), None)
        if first is None:
            raise ValueError(
                f"n2k_xml: no <{row_tag}> element in the first file — "
                "declare a schema or pass rowTag"
            )
        names = []
        for child in first:
            if child.tag not in names:
                names.append(child.tag)
        return T.StructType([T.StructField(n, T.StringType()) for n in names])

    def reader(self, schema: T.StructType) -> XmlPyReader:
        return XmlPyReader(self.options, schema)
