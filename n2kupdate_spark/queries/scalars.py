"""B9 — scalar function surface (SURVEY.md §2 B9).

Reference analog: description normalization (trim/lower), spawn/validity
timestamp handling, status classification in merge SQL (⟨pub⟩ R/store_*.R
[M]). All expressions are JVM built-ins inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from n2kupdate_spark.queries._registry import register
from n2kupdate_spark.sources import load


@register(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lc,
           substr(p_type, 1, 5) AS type5,
           length(p_name) AS name_len,
           concat_ws('/', p_brand, p_type) AS brand_type,
           regexp_extract(p_brand, '[0-9]+', 0) AS brand_num
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/substr/length/concat_ws/regexp_extract (POSIX-simple regex —
    SURVEY.md §7.4.6)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lc"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
    )


@register(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch_start
    FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/date_trunc/datediff over the order timestamp (UTC)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    )


@register(
    "scalar_math",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice, 1) AS price_r1,
           CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           ABS(o_totalprice - 10000) AS dist_10k,
           ROUND(ln(o_totalprice), 4) AS price_ln,
           ROUND(sqrt(o_totalprice), 4) AS price_sqrt
    FROM orders WHERE o_totalprice > 0
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/ceil/floor/abs/ln/sqrt (transcendentals rounded to 4dp)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 1).alias("price_r1"),
        F.ceil("o_totalprice").cast("long").alias("price_ceil"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        F.abs(F.col("o_totalprice") - 10000).alias("dist_10k"),
        F.round(F.log("o_totalprice"), 4).alias("price_ln"),
        F.round(F.sqrt("o_totalprice"), 4).alias("price_sqrt"),
    )


@register(
    "scalar_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 100000 THEN 'large'
                WHEN o_totalprice >= 10000 THEN 'medium'
                ELSE 'small' END AS tier
    FROM orders
    """,
)
def scalar_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional classification (merge-SQL status branches)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 100000, "large")
        .when(F.col("o_totalprice") >= 10000, "medium")
        .otherwise("small")
        .alias("tier"),
    )


@register(
    "json_extract_field",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    """,
)
def json_extract_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed field extraction from a JSON string column (events.props)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@register(
    "array_basic",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 4) + 0 AS first_val,
           ROUND(CAST(embedding[64] AS DOUBLE), 4) + 0 AS last_val
    FROM embeddings
    """,
)
def array_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array length / element access over the embedding column (1-indexed in
    both engines; floats cast to double then rounded)."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        F.round(F.element_at("embedding", 64).cast("double"), 4).alias("last_val"),
    )


@register(
    "map_from_json",
    oracle="""
    SELECT event_id,
           (SELECT string_agg(j.key || '=' || (props->>j.key), '|' ORDER BY j.key)
            FROM unnest(json_keys(props)) AS j(key)) AS props_ser,
           CAST(props->>'k' AS INTEGER) AS k
    FROM events
    """,
)
def map_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON props column into a typed MapType, look up a key, and
    emit the whole map serialized as sorted 'key=value' pairs — the typed
    map is demonstrated, but the OUTPUT is flat strings so the op is
    hash-checked (r1 lesson: map/array result columns crash the driver
    canonicalizer; was rows-only). The oracle rebuilds the same
    serialization generically from json_keys, so new keys in the data
    can't silently diverge the two sides."""
    e = load(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.IntegerType()))
    entries = F.array_sort(F.map_entries(m))
    ser = F.array_join(
        F.transform(entries, lambda kv: F.concat_ws("=", kv["key"], kv["value"])),
        "|",
    )
    return e.select(
        "event_id",
        ser.alias("props_ser"),
        m.getItem("k").alias("k"),
    )


@register(
    "scalar_null_handling",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_discount, 0.0), -1.0) AS discount_or_flag,
           CASE WHEN NULLIF(l_tax, 0.0) IS NULL THEN 1 ELSE 0 END AS tax_free,
           IFNULL(NULLIF(l_returnflag, 'N'), 'NONE') AS flag_norm
    FROM lineitem
    """,
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-propagation scalars (coalesce/nullif/ifnull) — the reference's
    no-NA guards inverted: sentinel values become NULL then defaults."""
    l = load(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_discount", "l_tax", "l_returnflag"],
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif("l_discount", F.lit(0.0)), F.lit(-1.0)).alias("discount_or_flag"),
        F.when(F.nullif("l_tax", F.lit(0.0)).isNull(), 1).otherwise(0).alias("tax_free"),
        F.ifnull(F.nullif("l_returnflag", F.lit("N")), F.lit("NONE")).alias("flag_norm"),
    )


@register(
    "scalar_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255 AS lo_byte,
           event_id | 4096 AS with_flag,
           xor(event_id, 1365) AS xored,
           event_id << 2 AS shl2,
           event_id >> 3 AS shr3,
           CAST(bit_count(event_id) AS INT) AS popcnt
    FROM events
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface (& | xor << >> popcount) — flag fields, hash
    splitting, and signature banding all live on these; every expression
    stays in whole-stage codegen."""
    e = load(spark, sf_dir, "events", columns=["event_id"])
    c = F.col("event_id")
    return e.select(
        "event_id",
        c.bitwiseAND(F.lit(255)).alias("lo_byte"),
        c.bitwiseOR(F.lit(4096)).alias("with_flag"),
        c.bitwiseXOR(F.lit(1365)).alias("xored"),
        F.shiftleft(c, 2).alias("shl2"),
        F.shiftright(c, 3).alias("shr3"),
        F.bit_count(c).alias("popcnt"),
    )


@register(
    "scalar_regex",
    oracle="""
    SELECT doc_id,
           regexp_extract(source, '[0-9]+') AS src_num,
           regexp_replace(lang, '^e', 'E') AS lang_e,
           CAST(regexp_matches(source, '^(web|book)') AS INT) AS is_webbook,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_alpha_runs
    FROM documents
    """,
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface: extract / replace / match-test / extract-all-count.
    Patterns are kept to the POSIX-compatible subset where Java regex
    (Spark) and RE2 (DuckDB) agree — no backrefs, no lookaround — which is
    also the subset that stays fast at scale (RE2-class patterns are
    linear-time; catastrophic backtracking is a real 100 TB outage class)."""
    d = load(spark, sf_dir, "documents", columns=["doc_id", "source", "lang", "text"])
    return d.select(
        "doc_id",
        F.regexp_extract("source", "[0-9]+", 0).alias("src_num"),
        F.regexp_replace("lang", "^e", "E").alias("lang_e"),
        F.when(F.col("source").rlike("^(web|book)"), 1).otherwise(0).alias("is_webbook"),
        F.size(F.regexp_extract_all("text", F.lit("[A-Za-z]+"), F.lit(0)))
        .cast("long")
        .alias("n_alpha_runs"),
    )


@register(
    "json_variant_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)) * 10000) / 10000 AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def json_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics over the VARIANT type (Spark 4): the JSON
    column is parsed ONCE into Spark's binary variant encoding and every
    downstream access is a typed ``variant_get`` path lookup — at 100 TB
    this is the difference between one parse per row and one string parse
    per extraction per row (``get_json_object`` re-parses each call; the
    string-path twin is ``json_extract_field``). Aggregates per event_type
    over the extracted value prove the typed lookup composes with
    whole-stage-codegen aggregation; scale-first rounding keeps the avg
    oracle-stable (SURVEY.md §7.4.3)."""
    e = load(spark, sf_dir, "events", columns=["event_type", "props"])
    v = e.select("event_type", F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "long")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        (F.round(F.avg(k) * 10000) / 10000).alias("avg_k"),
    )


@register(
    "recursive_date_spine",
    oracle="""
    WITH RECURSIVE spine(d) AS (
        SELECT CAST(MIN(ts) AS DATE) AS d FROM events
        UNION ALL
        SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM spine
        WHERE d < (SELECT CAST(MAX(ts) AS DATE) FROM events)
    )
    SELECT strftime(d, '%Y-%m-%d') AS event_day,
           CAST(COUNT(e.ts) AS BIGINT) AS n_events
    FROM spine LEFT JOIN events e ON CAST(e.ts AS DATE) = spine.d
    GROUP BY d
    """,
)
def recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): a gap-free calendar spine
    from the data's own min/max day, LEFT-joined back so empty days appear
    with n_events = 0 — the canonical recursive-query shape every
    time-series rollup needs (a plain GROUP BY silently drops empty days;
    ts_resample_ffill is the per-key windowed cousin). Recursion depth =
    day span, bounded by the data's time range, not its row count — and
    the spine is one row per day, so the recursive frontier stays tiny at
    any SF. Day is emitted as a string: Spark DATE and DuckDB DATE
    canonicalize differently through pandas (date vs midnight timestamp)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events_rcte")
    # Heap-order recursion (x → 2x+1, 2x+2) instead of d → d+1: every
    # integer in [0, span] is produced EXACTLY once (complete-binary-heap
    # node ids), so the union needs no dedup and the recursion depth is
    # ⌈log₂ span⌉ rounds instead of span rounds — Spark runs one job per
    # recursive step, and the day-at-a-time form scheduled ~300 sequential
    # tiny jobs at sf0.1 (5.5 s warm; a multi-year 100 TB span would be
    # thousands). Same spine, same result (oracle hash-checked) — this is
    # the standard log-depth rewrite for frontier-style recursions.
    return spark.sql(
        """
        WITH RECURSIVE ix(x) AS (
            SELECT 0 AS x
            UNION ALL
            SELECT nx FROM (
                SELECT explode(array(x * 2 + 1, x * 2 + 2)) AS nx FROM ix
            )
            WHERE nx <= (SELECT datediff(CAST(MAX(ts) AS DATE),
                                         CAST(MIN(ts) AS DATE))
                         FROM events_rcte)
        )
        SELECT date_format(d, 'yyyy-MM-dd') AS event_day,
               COUNT(e.ts) AS n_events
        FROM (SELECT date_add((SELECT CAST(MIN(ts) AS DATE)
                               FROM events_rcte), x) AS d
              FROM ix) spine
        LEFT JOIN events_rcte e ON CAST(e.ts AS DATE) = spine.d
        GROUP BY d
        """
    )


@register(
    "array_hof_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * 10000) / 10000 AS sq_norm,
           ROUND(CAST(list_max(embedding) AS DOUBLE) * 10000) / 10000 AS max_val
    FROM embeddings
    """,
)
def array_hof_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as user surface (filter/transform/
    aggregate/array_max) — the JVM-side lambda path that keeps per-element
    logic OUT of Python (SURVEY.md §4: UDFs are the slow path; these run
    inside codegen). Lambda bodies are bare element expressions, so the
    per-element re-evaluation caveat (word_shingles lesson) doesn't bite.
    Scale-first rounding on the float accumulations; DuckDB's list_*
    twins compute the oracle."""
    e = load(spark, sf_dir, "embeddings")
    d = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        (
            F.round(
                F.aggregate(
                    F.transform(d, lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                * 10000
            )
            / 10000
        ).alias("sq_norm"),
        (F.round(F.array_max("embedding").cast("double") * 10000) / 10000).alias(
            "max_val"
        ),
    )
