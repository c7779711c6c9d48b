"""Pure-Python Avro datasource — the no-jar fallback.

This distribution ships Spark's avro DATA jars but not the external
``spark-avro`` module, so ``spark.read.format("avro")`` raises
(BASELINE.md §7, re-probed every round). The format itself is public and
simple (Avro 1.11 spec: Object Container File = magic + metadata map +
sync marker + blocks of binary-encoded records), so this module decodes
it without the jar:

- the DRIVER reads one file's header (Hadoop FS API — local/HDFS/S3
  alike) to resolve the writer schema into a Spark ``StructType``;
- EXECUTORS decode whole files from ``spark.read.format("binaryFile")``
  rows inside ``mapInPandas`` — one Python decode pass per file, Arrow
  batches out, no driver data path. At 100 TB the unit of parallelism is
  the file (Avro OCF is splittable only at sync markers; per-file tasks
  are the jar-free trade and the standard ingest layout is many
  ~128 MB files anyway).

Supported subset (the common data surface): null, boolean, int, long,
float, double, bytes, string, enum (as string), fixed (as bytes),
records, arrays, maps, and unions (decoded by branch; a
``[null, X]`` union maps to nullable X — other unions take the decoded
branch value as-is). Codecs: ``null`` and ``deflate``. Logical types
decode as their underlying primitive. This covers round-tripping every
fixture table; swap to ``format("avro")`` the round the module jar
appears — the reader contract (path in, DataFrame out) is identical.

``write_avro_local`` is the matching single-file writer (driver-side,
null codec) for tests and small-dimension exports; ``write_avro`` is the
DISTRIBUTED writer for POSIX-visible paths (one part file per task,
plain file IO from executors — object stores need the jar).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------- binary


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (the Avro int/long encoding)."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _decode(schema, buf: io.BytesIO):
    """Decode one value of ``schema`` (parsed JSON) from ``buf``."""
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):  # union: branch index then value
        return _decode(schema[_read_long(buf)], buf)
    else:
        t = schema["type"]

    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return buf.read(_read_long(buf))
    if t == "string":
        return buf.read(_read_long(buf)).decode("utf-8")
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "record":
        return {f["name"]: _decode(f["type"], buf) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_decode(schema["items"], buf))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = buf.read(_read_long(buf)).decode("utf-8")
                out[k] = _decode(schema["values"], buf)
        return out
    raise ValueError(f"unsupported avro type: {t!r}")


def _encode(schema, val, out: io.BytesIO) -> None:
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):
        # writer supports the [null, X] nullable idiom
        if val is None and "null" in schema:
            _write_long(out, schema.index("null"))
            return
        branch = next(
            i for i, s in enumerate(schema)
            if s != "null"
        )
        _write_long(out, branch)
        _encode(schema[branch], val, out)
        return
    else:
        t = schema["type"]

    if t == "null":
        return
    elif t == "boolean":
        out.write(b"\x01" if val else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(val))
    elif t == "float":
        out.write(struct.pack("<f", float(val)))
    elif t == "double":
        out.write(struct.pack("<d", float(val)))
    elif t == "bytes":
        _write_long(out, len(val))
        out.write(val)
    elif t == "string":
        b = val.encode("utf-8")
        _write_long(out, len(b))
        out.write(b)
    elif t == "record":
        for f in schema["fields"]:
            _encode(f["type"], val[f["name"]], out)
    elif t == "array":
        if val:
            _write_long(out, len(val))
            for v in val:
                _encode(schema["items"], v, out)
        _write_long(out, 0)
    elif t == "map":
        if val:
            _write_long(out, len(val))
            for k, v in val.items():
                kb = k.encode("utf-8")
                _write_long(out, len(kb))
                out.write(kb)
                _encode(schema["values"], v, out)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported avro type for write: {t!r}")


# ------------------------------------------------------------- container


def _parse_header(buf: io.BytesIO) -> tuple[dict, str, bytes]:
    """(writer schema JSON, codec, sync marker) from an OCF header."""
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta = _decode({"type": "map", "values": "bytes"}, buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec}")
    return schema, codec, buf.read(16)


def _iter_records(content: bytes):
    buf = io.BytesIO(content)
    schema, codec, sync = _parse_header(buf)
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        n = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        for _ in range(n):
            yield _decode(schema, bbuf)
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")


_AVRO_TO_SPARK = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
    "enum": T.StringType(),
    "fixed": T.BinaryType(),
}


def _avro_to_spark_type(schema) -> tuple[T.DataType, bool]:
    """(Spark type, nullable) for an Avro schema node."""
    if isinstance(schema, str):
        return _AVRO_TO_SPARK[schema], schema == "null"
    if isinstance(schema, list):
        branches = [s for s in schema if s != "null"]
        nullable = "null" in schema
        if len(branches) == 1:
            dt, _ = _avro_to_spark_type(branches[0])
            return dt, nullable
        raise ValueError("multi-branch non-null unions are not mapped")
    t = schema["type"]
    if t == "record":
        fields = []
        for f in schema["fields"]:
            dt, nullable = _avro_to_spark_type(f["type"])
            fields.append(T.StructField(f["name"], dt, nullable))
        return T.StructType(fields), False
    if t == "array":
        dt, nl = _avro_to_spark_type(schema["items"])
        return T.ArrayType(dt, nl), False
    if t == "map":
        dt, nl = _avro_to_spark_type(schema["values"])
        return T.MapType(T.StringType(), dt, nl), False
    return _AVRO_TO_SPARK[t], False


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read Avro OCF file(s) into a DataFrame without the spark-avro jar.

    Driver resolves the schema from ONE file's header; executors decode
    whole files inside ``mapInPandas`` (Arrow batches out). ``path`` is
    anything ``binaryFile`` accepts (file, dir, glob)."""
    import pandas as pd

    bf = spark.read.format("binaryFile").load(path)
    first = bf.select("path").limit(1).collect()
    if not first:
        raise FileNotFoundError(f"no files under {path}")
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(first[0]["path"])
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    flen = fs.getFileStatus(p).getLen()
    stream = fs.open(p)
    try:
        # header only: the metadata map precedes all data; 1 MB covers any
        # sane schema (toByteArray with a size expects EXACTLY that many)
        head = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(
                stream, min(int(flen), 1 << 20)
            )
        )
    finally:
        stream.close()
    schema_json, _, _ = _parse_header(io.BytesIO(head))
    struct_type, _ = _avro_to_spark_type(schema_json)
    if not isinstance(struct_type, T.StructType):
        raise ValueError("top-level avro schema must be a record")
    cols = [f.name for f in struct_type.fields]

    def decode_files(it):
        for pdf in it:
            for content in pdf["content"]:
                recs = list(_iter_records(bytes(content)))
                yield pd.DataFrame(
                    {c: [r[c] for r in recs] for c in cols}
                ) if recs else pd.DataFrame({c: [] for c in cols})

    return bf.select("content").mapInPandas(decode_files, schema=struct_type)


_SPARK_TO_AVRO = {
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.BinaryType(): "bytes",
    T.StringType(): "string",
}


def _spark_to_avro_schema(st: T.StructType, name: str = "row") -> dict:
    def field_type(dt: T.DataType):
        # container elements wrap in the null-union too: Spark arrays and
        # maps are nullable-element by default, and the round-tripped
        # schema must match the original StructType exactly
        if isinstance(dt, T.StructType):
            return _spark_to_avro_schema(dt, name=f"{name}_r")
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": ["null", field_type(dt.elementType)]}
        if isinstance(dt, T.MapType):
            return {"type": "map", "values": ["null", field_type(dt.valueType)]}
        return _SPARK_TO_AVRO[dt]

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": ["null", field_type(f.dataType)]}
            for f in st.fields
        ],
    }


def write_avro_local(df: DataFrame, path: str, block_records: int = 1000) -> int:
    """Driver-side single-file Avro OCF writer (null codec) — the
    test/round-trip and small-export companion of :func:`read_avro`.
    Every field is written as the nullable ``["null", T]`` union (Spark
    columns are nullable by default). Returns the row count. Collects to
    the driver — bounded use only; distributed writes stay on parquet
    until the spark-avro jar lands."""
    import os

    schema = _spark_to_avro_schema(df.schema)
    rows = [r.asDict(recursive=True) for r in df.collect()]
    sync = b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f"
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": b"null",
    }
    _encode({"type": "map", "values": "bytes"}, meta, out)
    out.write(sync)
    for lo in range(0, len(rows), block_records):
        chunk = rows[lo:lo + block_records]
        body = io.BytesIO()
        for r in chunk:
            _encode(schema, r, body)
        _write_long(out, len(chunk))
        _write_long(out, body.tell())
        out.write(body.getvalue())
        out.write(sync)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(out.getvalue())
    return len(rows)


def write_avro(df: DataFrame, dir_path: str, block_records: int = 1000) -> int:
    """DISTRIBUTED Avro OCF writer for POSIX-visible paths: each task
    streams its partition's Arrow batches into one part file (header
    once, one block per batch chunk) via plain file IO — on
    local[/NFS]-visible storage every executor can write directly; object
    stores need the spark-avro jar (this is the honest jar-free trade,
    same as the reader's per-file parallelism). Pandas nulls (None/NaN)
    are written as the null union branch — a true float NaN therefore
    round-trips as null; route NaN-preserving data through parquet.
    Returns the total row count (from a tiny (path, n) result set).

    Task-commit protocol (r9 advice, medium): each task streams into a
    DOT-temp file (``.part-...avro.<uuid>.tmp`` — invisible to Spark/
    Hadoop file listing, so a killed task's truncated output is never
    read) and atomically renames it to a DETERMINISTIC per-partition
    final name (``part-<pid>.avro``) only on successful completion.
    A retried or speculative task therefore overwrites — never
    duplicates — its partition's part, and ``read_avro`` sees either the
    complete file or nothing."""
    import os
    import uuid

    import pandas as pd
    from pyspark import TaskContext

    schema = _spark_to_avro_schema(df.schema)
    cols = df.columns
    os.makedirs(dir_path, exist_ok=True)
    sync = b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f"

    def write_partition(batches):
        f, n_total, fname, tmpname = None, 0, None, None
        for pdf in batches:
            pdf = pdf.where(pd.notnull(pdf), None)
            recs = pdf.to_dict("records")
            if f is None:
                pid = TaskContext.get().partitionId()
                fname = os.path.join(dir_path, f"part-{pid:05d}.avro")
                tmpname = os.path.join(
                    dir_path, f".part-{pid:05d}.avro.{uuid.uuid4().hex}.tmp"
                )
                f = open(tmpname, "wb")
                f.write(MAGIC)
                head = io.BytesIO()
                meta = {
                    "avro.schema": json.dumps(schema).encode("utf-8"),
                    "avro.codec": b"null",
                }
                _encode({"type": "map", "values": "bytes"}, meta, head)
                f.write(head.getvalue())
                f.write(sync)
            for lo in range(0, len(recs), block_records):
                chunk = recs[lo:lo + block_records]
                body = io.BytesIO()
                for r in chunk:
                    _encode(schema, {c: r[c] for c in cols}, body)
                blk = io.BytesIO()
                _write_long(blk, len(chunk))
                _write_long(blk, body.tell())
                f.write(blk.getvalue())
                f.write(body.getvalue())
                f.write(sync)
            n_total += len(recs)
        if f is not None:
            f.close()
            os.replace(tmpname, fname)  # atomic commit point
            yield pd.DataFrame({"path": [fname], "n": [n_total]})

    out = df.mapInPandas(write_partition, schema="path string, n long")
    return int(sum(r["n"] for r in out.collect()))
