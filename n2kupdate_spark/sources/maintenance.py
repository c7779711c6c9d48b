"""Table-maintenance operators: small-file compaction.

Operational reality at 100 TB: every incremental writer (streaming
foreachBatch sinks, per-batch staging dumps, partitioned appends)
fragments tables into files far below the scan-efficient size, and every
subsequent scan pays per-file open/footer overhead plus tiny row groups
that defeat min/max pruning. Engines in this space (Delta OPTIMIZE, Hive
concatenate, Iceberg rewrite_data_files) ship compaction as a first-class
maintenance op; this module is that op for plain parquet directories.

Scale notes: sizing uses the Hadoop FileSystem API (works on HDFS/S3/
local alike) and one `ContentSummary` call — no data read on the driver.
The rewrite itself is one distributed job: scan → repartition(n) → write,
where n = ceil(bytes / target). With `sort_by`, files are range-sorted so
parquet min/max column stats become selective (the poor man's Z-order for
one key prefix) — `repartitionByRange` + `sortWithinPartitions` keeps the
global order without a final single-partition pass.
"""

from __future__ import annotations

import math
from functools import lru_cache

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def dir_stats(spark: SparkSession, path: str) -> dict:
    """(files, bytes) of a directory via the Hadoop FileSystem API —
    storage-agnostic (local/HDFS/S3) and driver-metadata-only."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    summary = fs.getContentSummary(hpath)
    return {"files": int(summary.getFileCount()), "bytes": int(summary.getLength())}


#: Bits per column in the Z-value (2^bits equi-depth buckets per column).
_Z_BITS = 8


def _zvalue(df: DataFrame, cols: list[str], bits: int = _Z_BITS) -> Column:
    """Interleaved-bit Z-value over ``cols`` (numeric), the clustering key
    Delta's OPTIMIZE ZORDER BY computes. Per column: an equi-depth bucket
    id in [0, 2^bits) from approxQuantile boundaries (ONE sampling pass for
    all columns, driver holds 2^bits scalars per column — no global sort,
    no single-task window); rank-based bucketing keeps pruning selective
    under skew where equi-width would collapse. The bucket lookup is a
    count of boundaries ≤ value over a literal array (JVM-side HOF; the
    lambda body is a bare comparison, so the per-element re-evaluation
    caveat doesn't bite). Bits are then interleaved so files cut along
    contiguous Z-ranges bound EVERY column's min/max tightly at once."""
    n_bounds = (1 << bits) - 1
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    quantiles = df.stat.approxQuantile(cols, probs, 0.001)
    buckets = []
    for c, qs in zip(cols, quantiles):
        bounds = F.lit([float(q) for q in qs])
        v = F.col(c).cast("double")
        bucket = F.least(
            F.size(F.filter(bounds, lambda b: b <= v)), F.lit(n_bounds)
        )
        buckets.append(F.coalesce(bucket, F.lit(0)))  # NULLs cluster low
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("long")
            z = z.bitwiseOR(F.shiftleft(bit, i * len(buckets) + (len(buckets) - 1 - j)))
    return z


_M32 = 0xFFFFFFFF


def _murmur3_long(x: int, seed: int = 42) -> int:
    """Spark's Murmur3_x86_32.hashLong (seed 42 — what HashPartitioning
    applies to a LongType column), in pure python: the value's two
    32-bit halves are mixed as two 4-byte blocks, then finalized at
    length 8. Verified bit-identical to ``F.hash(longcol)`` over
    positive/negative/>2^32 values (tests/test_sources.py)."""

    def rotl(v: int, r: int) -> int:
        return ((v << r) | (v >> (32 - r))) & _M32

    def mixk1(k1: int) -> int:
        return (rotl((k1 * 0xCC9E2D51) & _M32, 15) * 0x1B873593) & _M32

    def mixh1(h1: int, k1: int) -> int:
        return (rotl(h1 ^ k1, 13) * 5 + 0xE6546B64) & _M32

    x &= 0xFFFFFFFFFFFFFFFF
    h1 = mixh1(seed, mixk1(x & _M32))
    h1 = mixh1(h1, mixk1(x >> 32))
    h1 ^= 8
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


@lru_cache(maxsize=64)
def _perfect_tokens_cached(n: int) -> tuple[int, ...]:
    found: dict[int, int] = {}
    x = 0
    while len(found) < n:
        p = _murmur3_long(x) % n  # python % is pmod (nonneg) for n > 0
        if p not in found:
            found[p] = x
        x += 1
    return tuple(found[k] for k in range(n))


def _perfect_partition_tokens(spark: SparkSession, n: int) -> list[int]:
    """For each partition slot 0..n-1, the smallest long whose Murmur3
    hash (the same seed-42 hash HashPartitioning uses) lands on it — so
    ``repartition(n, token_col)`` places each token's rows alone in their
    own partition with zero sampling. Computed driver-side with the
    verified pure-python Murmur3 above and memoized per ``n`` — the
    original ran a distributed probe-and-collect job per compact call
    (r16: one scheduling round-trip saved per call; same tokens, since
    both scan candidates in ascending order). ``spark`` stays in the
    signature for call-site compatibility."""
    return list(_perfect_tokens_cached(n))


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: float = 128,
    sort_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_ndv: int = 1_000_000,
) -> dict:
    """Rewrite the parquet directory ``src`` into ``dst`` with files sized
    toward ``target_mb``. Returns before/after stats. ``sort_by`` addition-
    ally range-partitions + sorts within files, making column min/max
    stats selective for scans filtered on those columns — perfect pruning
    on the leading sort key, none on the others. ``zorder_by`` (numeric
    columns, mutually exclusive with ``sort_by``) instead clusters files
    along an interleaved-bit Z-curve so min/max pruning stays selective on
    EVERY listed column at once — the Delta OPTIMIZE ZORDER analog, and at
    100 TB the difference between 'fast when you filter on date' and 'fast
    when you filter on date OR user OR key' (measured: tests/test_sources.py
    pins Z-order pruning both filter columns to a fraction of the files
    where a linear sort prunes only its leading key).

    The rewrite preserves rows and schema exactly (asserted in
    tests/test_sources.py); it does not run in place. For the atomic
    publish step — object stores have no atomic directory rename — pair
    with :func:`publish_manifest` / :func:`read_manifest`: write ``dst``,
    publish its manifest, and readers flip to the new file set with one
    atomic object write.

    Determinism: the ``zorder_by`` layout is a pure function of the input
    (explicit quantile cuts + perfect-token placement — see below);
    ``sort_by`` still rides ``repartitionByRange``'s randomly-seeded
    sample, so its FILE BOUNDARIES (not contents or order) can shift
    between identical runs. Multi-column sort keys are why: a range
    partitioner may split equal leading-key runs by the secondary key,
    which single-column quantile cuts cannot reproduce without skewing
    heavy-tie files."""
    if sort_by and zorder_by:
        raise ValueError("sort_by and zorder_by are mutually exclusive")
    before = dir_stats(spark, src)
    n_files = max(1, math.ceil(before["bytes"] / (target_mb * 1024 * 1024)))
    _compact_write(
        spark, spark.read.parquet(src), n_files, dst,
        sort_by=sort_by, zorder_by=zorder_by,
        bloom_cols=bloom_cols, bloom_ndv=bloom_ndv,
    )
    after = dir_stats(spark, dst)
    return {"before": before, "after": after, "target_files": n_files}


def _compact_write(
    spark: SparkSession,
    df: DataFrame,
    n_files: int,
    dst: str,
    sort_by: list[str] | None,
    zorder_by: list[str] | None,
    bloom_cols: list[str] | None,
    bloom_ndv: int,
) -> None:
    """The layout core of :func:`compact_parquet`, on an explicit
    DataFrame — shared with :func:`compact_manifest_table`, whose input
    is a manifest snapshot rather than a directory listing."""
    if zorder_by:
        # File cuts come from an explicit equi-depth quantile pass over the
        # Z-value, not from repartitionByRange's sampled boundaries:
        # the range exchange draws a RANDOMLY SEEDED reservoir sample per
        # run (seeded off the RDD id), so cutting with it made the output
        # layout — and its min/max pruning quality — nondeterministic
        # across reruns of the same input. Even range-partitioning the
        # DISCRETE file id still merges a sampled-away adjacent pair of
        # buckets on some runs. So placement avoids range exchange
        # entirely: each file id is remapped to a token whose Murmur3 hash
        # lands exactly on its own partition (hash partitioning samples
        # nothing), making every output file's row SET a pure function of
        # the input — idempotent re-compaction reproduces the same file
        # boundaries and footer stats every run (asserted in
        # tests/test_sources.py).
        # Materialize the Z-valued frame once (eager): the cut-quantile
        # pass and the placement+sort+write job would otherwise EACH
        # rescan the input and re-evaluate the 2^bits-bound bucket HOFs
        # (r16 decompose: the z write dominated diag_parquet_layout's
        # build). MEMORY_AND_DISK semantics keep this safe at compaction
        # scale — it replaces a full recompute, not adds one.
        # fan_out BEFORE the Z map: on a single-file input the 255-
        # boundary bucket HOF ran on ONE task (1.3 s at sf0.1 — r16
        # stage profile); the exchange sits below the map, so the
        # checkpoint evaluates it at width. _zvalue's own equi-depth
        # quantile pass still runs over the UNEXCHANGED input, keeping
        # its sketch — and so the bucket bounds — byte-identical.
        from n2kupdate_spark.operators.parallel import fan_out

        wide = fan_out(df, *zorder_by)
        df = wide.withColumn("__z", _zvalue(df, zorder_by)).localCheckpoint(
            eager=True
        )
        if n_files > 1:
            # prob 0.0 rides the same pass: cuts at/below the distribution
            # min (heavy Z-ties) are dropped, and duplicate cuts deduped,
            # so every bucket is nonempty — merged buckets yield fewer,
            # fuller files rather than zero-row parquet shards.
            probs = [0.0] + [i / n_files for i in range(1, n_files)]
            qs = df.stat.approxQuantile("__z", probs, 0.001)
            cuts = sorted({c for c in qs[1:] if c > qs[0]})
            n_parts = len(cuts) + 1
            bounds = F.array(*[F.lit(float(c)) for c in cuts])
            zd = F.col("__z").cast("double")
            file_id = F.size(F.filter(bounds, lambda b: b <= zd))
            tokens = _perfect_partition_tokens(spark, n_parts)
            # LongType literals, NOT ints: Murmur3 hashes int32 and int64
            # values differently, and the probe hashed longs — an int
            # token column would scatter buckets across arbitrary
            # partitions (observed: ~(1-1/e)·n distinct, collisions+empties).
            tok = F.element_at(
                F.array(*[F.lit(t).cast("long") for t in tokens]),
                file_id + F.lit(1),
            )
            df = (
                df.withColumn("__zt", tok)
                .repartition(n_parts, "__zt")
                .sortWithinPartitions("__zt", "__z")
                .drop("__z", "__zt")
            )
        else:
            df = df.repartition(1).sortWithinPartitions("__z").drop("__z")
    elif sort_by:
        df = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n_files)
    writer = df.write.mode("overwrite")
    # Parquet bloom filters (the Delta/Iceberg point-lookup knob): min/max
    # stats prune RANGE predicates but are useless for `key = X` on
    # uniformly distributed high-cardinality columns — every file's
    # [min, max] spans X. A bloom filter per column chunk answers
    # "definitely absent" for equality probes, so a needle lookup touches
    # ~1 file instead of all of them; at 100 TB that is the difference
    # between a point read and a table scan. Costs ~1.2 bytes/NDV of
    # footer per column chunk; size NDV to the expected per-FILE distinct
    # count, not the table's.
    for c in bloom_cols or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(bloom_ndv)
        )
    writer.parquet(dst)


# -- Manifest-based atomic publication (round 7) --------------------------
#
# compact_parquet (and every rewrite-style maintenance op) ends with "swap
# dst over src", but object stores have no atomic directory rename: a
# reader listing the directory mid-swap sees a torn mix of old and new
# files. The standard fix — what Delta/Iceberg commit logs are at heart —
# is to never list directories at read time: writers publish an explicit
# file list (manifest) with a single atomic PUT, readers scan exactly the
# files the manifest names. Stale data files beside the manifest are
# invisible until a vacuum removes them.


def _file_stats(
    spark: SparkSession, paths: list[str], cols: list[str]
) -> dict[str, dict[str, list]]:
    """Per-file [min, max] for ``cols`` over the given parquet files —
    ONE distributed job (scan grouped by input_file_name), never a
    per-file driver loop. Returns {uri_suffix_keyed_by_full_path:
    {col: [lo, hi]}} with only JSON-representable values (int/float/str;
    other types are skipped for that file+col)."""
    df = spark.read.parquet(*paths)
    present = [c for c in cols if c in df.columns]
    if not present:
        return {}
    aggs = []
    for c in present:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    rows = df.groupBy(F.input_file_name().alias("__f")).agg(*aggs).collect()
    out: dict[str, dict[str, list]] = {}
    for r in rows:
        stats = {}
        for c in present:
            lo, hi = r[f"__lo_{c}"], r[f"__hi_{c}"]
            if isinstance(lo, (int, float, str)) and isinstance(hi, (int, float, str)):
                stats[c] = [lo, hi]
        if stats:
            out[r["__f"]] = stats
    return out


def _attach_stats(
    spark: SparkSession, data_dir: str, entries: list[dict], stats_cols
) -> None:
    """Resolve _file_stats URIs back to manifest-relative names and stamp
    a ``stats`` field onto each entry that has one. Matching requires the
    path separator: ``uri.endswith("/" + name)`` — _file_stats keys are
    full URIs, so the separator form always suffices, and a bare-suffix
    match would let ``...11.parquet`` claim ``1.parquet``'s stats and
    prune on the wrong [min,max] (r8 advice, medium)."""
    if not stats_cols or not entries:
        return
    paths = [f"{data_dir}/{e['name']}" for e in entries]
    by_uri = _file_stats(spark, paths, list(stats_cols))
    for e in entries:
        for uri, stats in by_uri.items():
            if uri.endswith("/" + e["name"]):
                e["stats"] = stats
                break


def _read_manifest_doc(fs, jvm, path: str) -> dict:
    """Read one committed manifest JSON (driver-side metadata read)."""
    import json

    stream = fs.open(jvm.org.apache.hadoop.fs.Path(path))
    try:
        raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(raw.decode())


def publish_manifest(
    spark: SparkSession,
    data_dir: str,
    version: int | None = None,
    schema: "StructType | None" = None,
    stats_cols: list[str] | None = None,
) -> str:
    """Write ``_manifest-<version>.json`` into ``data_dir`` listing its
    current ``*.parquet`` files (name, length) plus the table's DECLARED
    schema. Returns the manifest path. ``version`` defaults to (highest
    existing version + 1); readers pick the highest version, so
    publishing IS the commit.

    Commit protocol: the JSON is written to a per-writer dotfile temp
    name (``._manifest-<v>.json.<pid>-<rand>.tmp`` — excluded by both
    the ``_manifest-*`` glob and Hadoop's hidden-file filter, unique so
    concurrent publishers can't clobber each other's in-progress bytes)
    and then ``fs.rename``d to its final name. Rename is atomic on HDFS and local filesystems, so a
    concurrent ``read_manifest`` never observes an empty/truncated
    manifest (a bare ``fs.create`` makes the file visible the moment it
    is created). On S3-like stores rename is copy+delete but a single
    PUT is already atomic there — the temp file is then merely a little
    extra traffic, never a correctness loss.

    Schema: ``schema`` pins the version's StructType explicitly; when
    omitted it is derived once here via a mergeSchema footer scan of the
    listed files. Either way the manifest carries the schema, so
    ``read_manifest`` NEVER footer-scans — at 100 TB / millions of files
    that moves schema resolution from every read's planning phase to one
    publish-time pass, and makes column evolution a metadata operation
    (old files are NULL-filled for columns they predate). The listing
    uses the Hadoop FileSystem API (local/HDFS/S3 alike); only metadata
    moves through the driver."""
    import json

    jvm = spark._jvm
    hdir = jvm.org.apache.hadoop.fs.Path(data_dir)
    fs = hdir.getFileSystem(spark._jsc.hadoopConfiguration())
    files = []
    for st in fs.listStatus(hdir):
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            files.append({"name": name, "length": int(st.getLen())})
    manifests = _list_manifests(fs, jvm, data_dir)
    if version is None:
        version = (manifests[-1][0] + 1) if manifests else 1
    files.sort(key=lambda f: f["name"])
    if schema is None and files:
        schema = (
            spark.read.option("mergeSchema", "true")
            .parquet(*[f"{data_dir}/{f['name']}" for f in files])
            .schema
        )
    _attach_stats(spark, data_dir, files, stats_cols)
    doc = {"version": version, "files": files}
    # Full-list republication on a table with a stream-epoch watermark
    # must not lose it (idempotence survives any publish interleaving).
    if manifests:
        prev = _read_manifest_doc(fs, jvm, manifests[-1][1])
        if "max_epoch" in prev:
            doc["max_epoch"] = int(prev["max_epoch"])
    if schema is not None:
        doc["schema"] = json.loads(schema.json())
    return atomic_put_json(spark, data_dir, f"_manifest-{version:010d}.json", doc)


def publish_append_manifest(
    spark: SparkSession,
    data_dir: str,
    new_subdir: str,
    version: int | None = None,
    stats_cols: list[str] | None = None,
    epoch: int | None = None,
) -> str:
    """Append-commit: version ``v``'s file list = the PREVIOUS version's
    list + the ``*.parquet`` files under ``data_dir/new_subdir`` (recorded
    with their subdir-relative names, which read_manifest resolves). This
    is the incremental-ingest commit: each batch lands in its own
    immutable subdir (idempotently rewritable on retry), and the manifest
    flip makes it visible atomically — a reader never sees a torn batch,
    and a crashed publisher leaves the prior version intact. The declared
    schema is the previous version's schema merged by name with the new
    files' (footer scan over the NEW subdir only — publish cost follows
    the batch, not the table).

    ``epoch`` decouples streaming idempotence from version numbering
    (r8 advice, high): a streaming sink passes its epoch id, the doc
    records it plus a carried-forward ``max_epoch`` watermark, and the
    retry check is :func:`last_committed_epoch` — NOT "is version v
    committed". Versions then always allocate as max+1 at commit time,
    so interleaved compactions/rollbacks (which also take max+1) can
    never collide a version number with a pending epoch and silently
    drop its batch."""
    import json

    from pyspark.sql.types import StructType

    jvm = spark._jvm
    hdir = jvm.org.apache.hadoop.fs.Path(data_dir)
    fs = hdir.getFileSystem(spark._jsc.hadoopConfiguration())
    manifests = _list_manifests(fs, jvm, data_dir)
    prev_files: list[dict] = []
    prev_schema: StructType | None = None
    prev_max_epoch = -1
    if manifests:
        prev = _read_manifest_doc(fs, jvm, manifests[-1][1])
        prev_files = prev["files"]
        prev_max_epoch = int(prev.get("max_epoch", -1))
        if "schema" in prev:
            prev_schema = StructType.fromJson(prev["schema"])
    if version is None:
        version = (manifests[-1][0] + 1) if manifests else 1

    sub = jvm.org.apache.hadoop.fs.Path(data_dir, new_subdir)
    new_files = []
    new_paths = []
    for st in fs.listStatus(sub):
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            new_files.append(
                {"name": f"{new_subdir}/{name}", "length": int(st.getLen())}
            )
            new_paths.append(f"{data_dir}/{new_subdir}/{name}")
    new_files.sort(key=lambda f: f["name"])
    _attach_stats(spark, data_dir, new_files, stats_cols)  # NEW files only
    schema = prev_schema
    if new_paths:
        new_schema = (
            spark.read.option("mergeSchema", "true").parquet(*new_paths).schema
        )
        if schema is None:
            schema = new_schema
        else:
            have = {f.name for f in schema.fields}
            schema = StructType(
                list(schema.fields)
                + [f for f in new_schema.fields if f.name not in have]
            )
    doc = {"version": version, "files": prev_files + new_files}
    if epoch is not None:
        doc["epoch"] = int(epoch)
    if epoch is not None or prev_max_epoch >= 0:
        doc["max_epoch"] = max(prev_max_epoch, -1 if epoch is None else int(epoch))
    if schema is not None:
        doc["schema"] = json.loads(schema.json())
    return atomic_put_json(spark, data_dir, f"_manifest-{version:010d}.json", doc)


def compact_manifest_table(
    spark: SparkSession,
    data_dir: str,
    target_mb: float = 128,
    sort_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_ndv: int = 1_000_000,
    stats_cols: list[str] | None = None,
) -> dict:
    """OPTIMIZE for manifest tables — the missing maintenance step of the
    streaming-ingest loop: append-manifest commits (stream_corpus_publish)
    accumulate one small subdir per micro-batch, and scans pay per-file
    open + tiny-row-group overhead forever. This rewrites the CURRENT
    version's file set (read via the manifest — concurrent appends are
    invisible) into one right-sized ``compact-<v>`` subdir with
    :func:`compact_parquet`'s layout engine (same sort_by / zorder_by /
    bloom knobs), then publishes version v listing ONLY the compacted
    files. Readers flip atomically at the manifest rename; prior versions
    keep reading their batch files until ``vacuum_unreferenced`` retires
    them (it reaches into subdirs). Sizing comes from the manifest's own
    byte lengths — no directory listing, no data through the driver.

    Returns {before, after, target_files, version}."""
    import json
    import math as _math

    jvm = spark._jvm
    hdir = jvm.org.apache.hadoop.fs.Path(data_dir)
    fs = hdir.getFileSystem(spark._jsc.hadoopConfiguration())
    manifests = _list_manifests(fs, jvm, data_dir)
    if not manifests:
        raise FileNotFoundError(f"no _manifest-*.json under {data_dir}")
    cur = _read_manifest_doc(fs, jvm, manifests[-1][1])
    before = {
        "files": len(cur["files"]),
        "bytes": sum(f["length"] for f in cur["files"]),
    }
    n_files = max(1, _math.ceil(before["bytes"] / (target_mb * 1024 * 1024)))
    df = read_manifest(spark, data_dir)
    version = manifests[-1][0] + 1
    subdir = f"compact-{version:010d}"
    _compact_write(
        spark, df, n_files, f"{data_dir}/{subdir}",
        sort_by=sort_by, zorder_by=zorder_by,
        bloom_cols=bloom_cols, bloom_ndv=bloom_ndv,
    )
    sub = jvm.org.apache.hadoop.fs.Path(data_dir, subdir)
    files = []
    for st in fs.listStatus(sub):
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            files.append({"name": f"{subdir}/{name}", "length": int(st.getLen())})
    files.sort(key=lambda f: f["name"])
    # stats default to the clustering columns — a zorder/sort compaction
    # exists precisely so range predicates on those columns prune
    _attach_stats(spark, data_dir, files, stats_cols or zorder_by or sort_by)
    doc = {
        "version": version,
        "files": files,
        "schema": json.loads(df.schema.json()),
    }
    # Preserve the stream-epoch watermark: a compaction that dropped it
    # would let a retried epoch re-commit its batch (duplicate rows).
    if "max_epoch" in cur:
        doc["max_epoch"] = int(cur["max_epoch"])
    atomic_put_json(spark, data_dir, f"_manifest-{version:010d}.json", doc)
    return {
        "before": before,
        "after": {"files": len(files), "bytes": sum(f["length"] for f in files)},
        "target_files": n_files,
        "version": version,
    }


def rollback_manifest(spark: SparkSession, data_dir: str, to_version: int) -> str:
    """Undo a bad publish WITHOUT deleting anything: commit a NEW highest
    version whose file list (and schema/stats) is a verbatim copy of
    ``to_version``'s. Readers flip back atomically at the manifest
    rename; the bad version stays pinned-readable for forensics until a
    vacuum retires it, and the roll-back itself is just another version —
    re-rollable, auditable, crash-safe like every other commit here
    (Iceberg's rollback_to_snapshot semantics)."""
    import json

    jvm = spark._jvm
    hdir = jvm.org.apache.hadoop.fs.Path(data_dir)
    fs = hdir.getFileSystem(spark._jsc.hadoopConfiguration())
    manifests = _list_manifests(fs, jvm, data_dir)
    src = next((m for m in manifests if m[0] == to_version), None)
    if src is None:
        raise FileNotFoundError(
            f"manifest version {to_version} not found under {data_dir}"
        )
    doc = _read_manifest_doc(fs, jvm, src[1])
    latest = _read_manifest_doc(fs, jvm, manifests[-1][1])
    new_version = manifests[-1][0] + 1
    doc["version"] = new_version
    doc["rolled_back_from"] = to_version
    # The epoch watermark comes from the LATEST version, not the one being
    # restored: a rollback undoes DATA deliberately, but the undone epochs
    # were committed once — a stream retry must still skip them, and new
    # epochs are strictly higher anyway.
    if "max_epoch" in latest:
        doc["max_epoch"] = int(latest["max_epoch"])
    elif "max_epoch" in doc:
        del doc["max_epoch"]
    return atomic_put_json(spark, data_dir, f"_manifest-{new_version:010d}.json", doc)


def manifest_versions(spark: SparkSession, data_dir: str) -> list[int]:
    """Committed manifest versions under ``data_dir`` (sorted; empty list
    for a directory with no manifests — the exactly-once skip check for
    epoch-keyed streaming publishes)."""
    jvm = spark._jvm
    hdir = jvm.org.apache.hadoop.fs.Path(data_dir)
    try:
        fs = hdir.getFileSystem(spark._jsc.hadoopConfiguration())
    except Exception:
        return []
    return [v for v, _ in _list_manifests(fs, jvm, data_dir)]


def last_committed_epoch(spark: SparkSession, data_dir: str) -> int:
    """Stream-epoch watermark of ``data_dir``'s LATEST manifest (−1 when
    no manifest or no watermark). This is the exactly-once retry check
    for epoch-keyed streaming publishes: skip a batch iff its epoch id is
    ≤ this value. Decoupled from version numbers so compactions and
    rollbacks (which allocate max_version+1 on the same table) can never
    make a pending epoch's version look already-committed (r8 advice,
    high)."""
    jvm = spark._jvm
    hdir = jvm.org.apache.hadoop.fs.Path(data_dir)
    try:
        fs = hdir.getFileSystem(spark._jsc.hadoopConfiguration())
    except Exception:
        return -1
    manifests = _list_manifests(fs, jvm, data_dir)
    if not manifests:
        return -1
    return int(_read_manifest_doc(fs, jvm, manifests[-1][1]).get("max_epoch", -1))


def atomic_put_json(spark: SparkSession, data_dir: str, name: str, doc: dict) -> str:
    """Commit ``doc`` as ``data_dir/name`` via dotfile-temp + rename — the
    manifest commit primitive, exposed for other commit markers (the
    dedup resume index's root marker). Rename is atomic on HDFS/local; a
    pre-existing destination refuses with FileExistsError instead of
    silently overwriting a committed object. The temp name is unique per
    writer (pid + random suffix): a SHARED temp path would let two
    concurrent publishers of the same name overwrite each other's
    in-progress bytes, so the winner's rename could commit the loser's
    torn document (r8 advice, low) — with unique temps the rename-onto-
    existing refusal is the only possible race outcome."""
    import json
    import os
    import uuid

    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(data_dir).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    final = jvm.org.apache.hadoop.fs.Path(data_dir, name)
    tmp = jvm.org.apache.hadoop.fs.Path(
        data_dir, f".{name}.{os.getpid()}-{uuid.uuid4().hex[:8]}.tmp"
    )
    out = fs.create(tmp, True)
    out.write(bytearray(json.dumps(doc).encode()))
    out.close()
    if not fs.rename(tmp, final):
        fs.delete(tmp, False)
        raise FileExistsError(
            f"{name} already exists under {data_dir} "
            "(concurrent publisher?) — rename refused"
        )
    return str(final)


def _list_manifests(fs, jvm, data_dir: str) -> list[tuple[int, str]]:
    out = []
    for st in fs.globStatus(jvm.org.apache.hadoop.fs.Path(data_dir, "_manifest-*.json")) or []:
        name = st.getPath().getName()
        out.append((int(name[len("_manifest-"):-len(".json")]), str(st.getPath())))
    return sorted(out)


def read_manifest(
    spark: SparkSession,
    data_dir: str,
    version: int | None = None,
    where: list[tuple] | None = None,
) -> DataFrame:
    """Read the table AS OF a manifest: scan exactly the files the
    manifest (highest version by default) names — never a directory
    listing, so concurrent rewrites/compactions are invisible until their
    own manifest publish commits them. Passing ``version`` gives cheap
    snapshot reads of prior publishes while their files survive.

    When the manifest carries a declared schema (every publish since r8
    does), the read applies it via ``spark.read.schema(...)`` — zero
    footer scans at planning time, and files written before a column was
    added come back NULL-filled for it, Iceberg/Delta-style. Manifests
    from before the schema field fall back to plain parquet inference.

    ``where`` is MANIFEST-LEVEL pruning (the Iceberg read-side win): a
    list of ``(col, lo, hi)`` range predicates (either bound may be
    None) matched against the per-file [min, max] the publisher recorded
    via ``stats_cols``. Files whose range cannot overlap are dropped from
    the scan BEFORE Spark plans it — at 100 TB / millions of files this
    skips file opens and footer reads entirely, where parquet row-group
    pruning still pays a per-file touch. Conservative: files without
    stats for a predicate column are always kept, so the result is a
    superset of the matching rows — callers still apply the real filter
    (and Catalyst pushes it into the surviving scans)."""
    import json

    from pyspark.sql.types import StructType

    jvm = spark._jvm
    hdir = jvm.org.apache.hadoop.fs.Path(data_dir)
    fs = hdir.getFileSystem(spark._jsc.hadoopConfiguration())
    manifests = _list_manifests(fs, jvm, data_dir)
    if not manifests:
        raise FileNotFoundError(f"no _manifest-*.json under {data_dir}")
    chosen = (
        manifests[-1]
        if version is None
        else next((m for m in manifests if m[0] == version), None)
    )
    if chosen is None:
        raise FileNotFoundError(f"manifest version {version} not found under {data_dir}")
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(chosen[1]))
    try:
        raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    meta = json.loads(raw.decode())
    entries = meta["files"]
    if where:
        def overlaps(e: dict) -> bool:
            stats = e.get("stats", {})
            for col, lo, hi in where:
                if col not in stats:
                    continue  # no stats -> cannot prune this file
                fmin, fmax = stats[col]
                if lo is not None and fmax < lo:
                    return False
                if hi is not None and fmin > hi:
                    return False
            return True
        entries = [e for e in entries if overlaps(e)]
    reader = spark.read
    schema = StructType.fromJson(meta["schema"]) if "schema" in meta else None
    if schema is not None:
        reader = reader.schema(schema)
    if not entries:
        if schema is None:
            raise FileNotFoundError(
                f"manifest pruning left no files and no declared schema under {data_dir}"
            )
        return spark.createDataFrame([], schema)
    return reader.parquet(*[f"{data_dir}/{e['name']}" for e in entries])


def vacuum_unreferenced(
    spark: SparkSession, data_dir: str, keep_versions: int = 2
) -> dict:
    """Complete the manifest lifecycle: drop manifests older than the
    newest ``keep_versions`` and delete every ``*.parquet`` no kept
    manifest references (superseded compaction inputs, aborted writes).
    Returns counts. Safe ordering — old MANIFESTS are deleted before the
    files they referenced, so a reader pinned to a kept version never
    loses a file; readers of vacuumed versions fail fast on the missing
    manifest rather than mid-scan. Metadata-only on the driver."""
    import json

    jvm = spark._jvm
    hdir = jvm.org.apache.hadoop.fs.Path(data_dir)
    fs = hdir.getFileSystem(spark._jsc.hadoopConfiguration())
    manifests = _list_manifests(fs, jvm, data_dir)
    if not manifests:
        raise FileNotFoundError(f"no _manifest-*.json under {data_dir}")
    kept, dropped = manifests[-keep_versions:], manifests[:-keep_versions]
    referenced: set[str] = set()
    for _, mpath in kept:
        stream = fs.open(jvm.org.apache.hadoop.fs.Path(mpath))
        try:
            raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()
        referenced.update(f["name"] for f in json.loads(raw.decode())["files"])
    for _, mpath in dropped:
        fs.delete(jvm.org.apache.hadoop.fs.Path(mpath), False)
    removed = 0
    for st in fs.listStatus(hdir):
        name = st.getPath().getName()
        if name.endswith(".parquet") and name not in referenced:
            fs.delete(st.getPath(), False)
            removed += 1
        elif name.startswith("._manifest-") and name.endswith(".tmp"):
            # a publisher that died between create and rename leaves its
            # temp manifest behind; it was never visible to readers, so
            # vacuuming it is always safe
            fs.delete(st.getPath(), False)
        elif st.isDirectory() and not name.startswith((".", "_")):
            # append-manifest batch subdirs: vacuum their unreferenced
            # files too (names are recorded subdir-relative), and drop
            # the subdir once empty
            live = 0
            for sub in fs.listStatus(st.getPath()):
                sname = sub.getPath().getName()
                rel = f"{name}/{sname}"
                if sname.endswith(".parquet") and rel not in referenced:
                    fs.delete(sub.getPath(), False)
                    removed += 1
                elif not sname.startswith((".", "_")):  # _SUCCESS etc. don't pin
                    live += 1
            if live == 0:
                fs.delete(st.getPath(), True)
    return {
        "kept_versions": [v for v, _ in kept],
        "dropped_manifests": len(dropped),
        "removed_files": removed,
    }


def parquet_layout_report(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """Footer-stats pruning-quality report — the layout advisor a
    100 TB lake runs BEFORE trusting min/max pruning (and after
    :func:`compact_parquet` to prove the rewrite helped): for each
    requested NUMERIC column, read every row group's min/max from the
    parquet footers and fold them into

        point_read_frac = Σ_g (max_g − min_g) / (W · n_groups),

    the expected fraction of row groups a uniform random point
    predicate must read — ~1/n_groups when the column is perfectly
    clustered (each group covers a disjoint slice), ~1.0 when every
    group spans the whole range (pruning is useless no matter what the
    query does). Row groups with missing stats count as full-range
    (they can never be pruned — honesty over optimism); a zero-width
    global range reads 1.0 (nothing is prunable on a constant).
    Emits one row per column: (column, n_files, n_row_groups,
    point_read_frac 4dp).

    Scale: file paths distribute to executors and each Arrow task
    opens ONLY the footers of its files (pyarrow metadata reads, no
    data pages) — at millions of files this is a metadata-parallel
    scan, never a driver loop; the per-group (col, min, max) rows that
    shuffle are #groups × #columns, trivially small."""
    import pandas as pd  # noqa: F401

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    files = []
    while it.hasNext():
        f = it.next().getPath().toString()
        if f.endswith(".parquet"):
            files.append(f)
    # coalesce to the file count: createDataFrame slices a local list into
    # defaultParallelism partitions, so an 8-file report dispatched 32
    # Arrow/Python tasks — 24 of them empty worker round-trips (r16)
    fdf = spark.createDataFrame([(f,) for f in sorted(files)], "path string")
    n_slices = max(1, min(len(files), spark.sparkContext.defaultParallelism))
    fdf = fdf.coalesce(n_slices)
    want = set(columns)

    def _footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                local = p[len("file:"):] if p.startswith("file:") else p
                md = pq.ParquetFile(local).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        name = col.path_in_schema
                        if name not in want:
                            continue
                        st = col.statistics
                        has = bool(st is not None and st.has_min_max)
                        try:
                            vmin = float(st.min) if has else None
                            vmax = float(st.max) if has else None
                        except Exception:
                            # pyarrow can't decode min/max for some
                            # physical/logical type combos — count the
                            # group as unprunable rather than crash
                            has, vmin, vmax = False, None, None
                        rows.append(
                            {
                                "col": name,
                                "file": p,
                                "vmin": vmin,
                                "vmax": vmax,
                                "has_stats": has,
                            }
                        )
            yield pd.DataFrame(
                rows,
                columns=["col", "file", "vmin", "vmax", "has_stats"],
            )

    groups = fdf.mapInPandas(
        _footers,
        schema="col string, file string, vmin double, vmax double, has_stats boolean",
    )
    agg = groups.groupBy("col").agg(
        F.countDistinct("file").alias("n_files"),
        F.count(F.lit(1)).alias("n_row_groups"),
        F.min("vmin").alias("gmin"),
        F.max("vmax").alias("gmax"),
        F.sum(
            F.when(F.col("has_stats"), F.col("vmax") - F.col("vmin"))
        ).alias("w_sum"),
        F.sum((~F.col("has_stats")).cast("long")).alias("n_nostats"),
    )
    width = F.col("gmax") - F.col("gmin")
    frac = F.when(
        width > 0,
        (F.col("w_sum") + F.col("n_nostats") * width)
        / (width * F.col("n_row_groups")),
    ).otherwise(F.lit(1.0))
    return agg.select(
        F.col("col").alias("column"),
        F.col("n_files").cast("long").alias("n_files"),
        F.col("n_row_groups").cast("long").alias("n_row_groups"),
        (F.round(frac * 10000) / 10000 + 0.0).alias("point_read_frac"),
    )


def schema_diff_report(
    spark: SparkSession, path_a: str, path_b: str
) -> DataFrame:
    """Schema-drift report between two parquet datasets — the
    contract-monitoring table a lakehouse checks before a reader
    breaks (the diagnostic companion of the schema-evolution source:
    that op READS through drift, this one REPORTS it): per column,
    the type on each side and a status — ``added`` (B only),
    ``removed`` (A only), ``type_changed``, or ``unchanged``. Emits
    one row per column in either side, column-name order.

    Scale: schemas come from the parquet FOOTER of each dataset
    (unified with ``read.parquet``'s mergeSchema semantics per side:
    all of a side's files participate), so cost is footer reads —
    metadata only, never data pages; output is #columns rows."""
    a = dict(spark.read.option("mergeSchema", "true").parquet(path_a).dtypes)
    b = dict(spark.read.option("mergeSchema", "true").parquet(path_b).dtypes)
    rows = []
    for c in sorted(set(a) | set(b)):
        ta, tb = a.get(c), b.get(c)
        if ta is None:
            status = "added"
        elif tb is None:
            status = "removed"
        elif ta != tb:
            status = "type_changed"
        else:
            status = "unchanged"
        rows.append((c, ta, tb, status))
    return spark.createDataFrame(
        rows, "column string, type_a string, type_b string, status string"
    )
