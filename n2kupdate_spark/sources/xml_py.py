"""Pure-Python XML datasource (stdlib ElementTree) — the no-package
fallback for the classic enterprise feed format.

``spark-xml`` (the Databricks package) is not on this box, and XML is
still a standard interchange surface for exactly the registry/warehouse
systems the reference package fed (the reference's own domain ships
Natura-2000 XML exports). The format is simple enough to decode with the
stdlib, so this module mirrors the :mod:`n2kupdate_spark.sources.avro_py`
architecture:

- EXECUTORS parse whole files from ``spark.read.format("binaryFile")``
  rows inside ``mapInPandas`` — one ElementTree parse per file, Arrow
  batches out, no driver data path. The unit of parallelism is the file
  (XML is not safely splittable mid-document; the standard ingest layout
  is many modest files, and ``write_xml`` emits exactly that);
- the caller DECLARES the Spark schema (XML carries no types — the
  honest contract; spark-xml's inference is itself an extra full scan).

Row convention: one ``row_tag`` element per record; each child element
is a column, the element's text its value. NULL is an ABSENT child;
a PRESENT child with no text is the empty string — so the ""/NULL
distinction survives a round-trip (``<c/>`` parses to ``""``, no
``<c>`` at all parses to NULL). ElementTree escapes/unescapes markup
characters on both sides, so values containing ``< > & " '`` round-trip
byte-exact.

Supported column types (the common scalar surface): string, boolean,
int/long/short/byte, float/double, decimal (as string→Decimal), date
and timestamp (ISO-8601 text). Nested structs/arrays are out of scope —
flatten upstream, as every XML→warehouse loader does.

``write_xml_local`` is the matching single-file driver-side writer for
tests and small exports; ``write_xml`` is the DISTRIBUTED writer (one
part file per task, plain file IO from executors — POSIX-visible paths).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_TEXT_TYPES = (T.StringType,)


def _parse_value(text: str | None, dtype: T.DataType):
    """Parse one element's text into a python value for ``dtype``.
    ``text`` is None for a present-but-empty element (ElementTree's
    reading of ``<c/>`` / ``<c></c>``) — the empty string by the row
    convention; only an ABSENT element is NULL, and the caller handles
    absence before calling here."""
    if isinstance(dtype, T.StringType):
        return text if text is not None else ""
    if text is None or text == "":
        return None  # empty text cannot carry a non-string scalar
    if isinstance(dtype, T.BooleanType):
        return text.strip().lower() in ("true", "1")
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return int(text)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return float(text)
    if isinstance(dtype, T.DecimalType):
        from decimal import Decimal

        return Decimal(text)
    if isinstance(dtype, T.DateType):
        from datetime import date

        return date.fromisoformat(text.strip())
    if isinstance(dtype, T.TimestampType):
        from datetime import datetime

        return datetime.fromisoformat(text.strip())
    raise TypeError(f"xml_py: unsupported column type {dtype.simpleString()}")


def _format_value(val, dtype: T.DataType) -> str:
    if isinstance(dtype, T.BooleanType):
        return "true" if val else "false"
    if isinstance(dtype, (T.DateType, T.TimestampType)):
        return val.isoformat()
    if isinstance(dtype, T.DoubleType) or isinstance(dtype, T.FloatType):
        return repr(float(val))  # shortest round-trip repr
    return str(val)


def _rows_to_xml_bytes(
    rows, schema: T.StructType, row_tag: str, root_tag: str
) -> bytes:
    root = ET.Element(root_tag)
    for r in rows:
        el = ET.SubElement(root, row_tag)
        for f in schema.fields:
            v = r[f.name]
            if v is None:
                continue  # NULL = absent element
            child = ET.SubElement(el, f.name)
            child.text = _format_value(v, f.dataType)
    return ET.tostring(root, encoding="utf-8", xml_declaration=True)


def _xml_bytes_to_rows(content: bytes, schema: T.StructType, row_tag: str):
    root = ET.fromstring(content)
    fields = [(f.name, f.dataType) for f in schema.fields]
    for el in root.iter(row_tag):
        row = {}
        for name, dtype in fields:
            child = el.find(name)
            row[name] = None if child is None else _parse_value(child.text, dtype)
        yield row


def write_xml_local(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
) -> None:
    """Driver-side single-file writer (tests / small-dimension exports)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = _rows_to_xml_bytes(df.collect(), df.schema, row_tag, root_tag)
    with open(path, "wb") as fh:
        fh.write(payload)


def write_xml(
    df: DataFrame,
    out_dir: str,
    row_tag: str = "row",
    root_tag: str = "rows",
) -> None:
    """DISTRIBUTED writer: one ``part-NNNNN.xml`` per partition, plain
    file IO from executors (POSIX-visible paths — the same contract as
    ``write_avro``). Emits the many-modest-files layout the reader
    parallelizes over."""
    os.makedirs(out_dir, exist_ok=True)
    schema = df.schema

    def write_part(idx, it):
        rows = list(it)
        if rows:
            payload = _rows_to_xml_bytes(rows, schema, row_tag, root_tag)
            with open(os.path.join(out_dir, f"part-{idx:05d}.xml"), "wb") as fh:
                fh.write(payload)
        return iter([])

    df.rdd.mapPartitionsWithIndex(write_part).count()


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    row_tag: str = "row",
) -> DataFrame:
    """Read XML file(s) into a DataFrame with the DECLARED schema: one
    ElementTree parse per file on the executors (binaryFile scan →
    mapInPandas), Arrow batches out. ``path`` may be a file, directory,
    or glob — binaryFile semantics. Malformed XML raises loudly
    (ParseError from the owning task), never yields partial rows."""
    import pandas as pd

    names = [f.name for f in schema.fields]

    def decode_files(it):
        for pdf in it:
            for content in pdf["content"]:
                rows = list(_xml_bytes_to_rows(bytes(content), schema, row_tag))
                yield pd.DataFrame(
                    {n: [r[n] for r in rows] for n in names}
                    if rows
                    else {n: [] for n in names}
                )

    src = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xml")
        .load(path)
        .select("content")
    )
    return src.mapInPandas(decode_files, schema=schema)
