"""Training-data preparation operators (north-star extension surface):
deterministic dataset splitting and time-series regularization — the two
reshaping steps every large-scale ML pipeline runs between raw tables and
model input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from n2kupdate_spark.queries._registry import register
from n2kupdate_spark.sources import load

#: Hash-bucket expression shared (textually) by both engines: first 16 bits
#: of md5 of the stringified id → bucket 0..99. Content-addressed, so the
#: split is stable under repartitioning, re-runs, and data reordering —
#: the property random() splits lack (SURVEY.md §7.4.4 determinism rule).
_BUCKET_SQL = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100"


@register(
    "sample_hash_split",
    oracle=f"""
    SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, {_BUCKET_SQL} AS bucket FROM documents)
    """,
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split by md5 bucket of the
    document id. Pure map (no shuffle); identical assignment on any engine,
    cluster size, or run — the reproducibility contract random sampling
    can't give."""
    d = load(spark, sf_dir, "documents", columns=["doc_id"])
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "valid")
        .otherwise("test")
    )
    return d.select("doc_id", bucket.alias("bucket")).select(
        "doc_id", "bucket", split.alias("split")
    )


@register(
    "ts_resample_ffill",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, value,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s
        FROM events
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(
                   CAST(ceil(MIN(ts_s) / 3600.0) * 3600 AS BIGINT),
                   CAST(floor(MAX(ts_s) / 3600.0) * 3600 AS BIGINT),
                   3600)) AS ts_s
        FROM e GROUP BY user_id
    ),
    unioned AS (
        SELECT user_id, ts_s, value, 0 AS is_grid, event_id FROM e
        UNION ALL
        SELECT user_id, ts_s, NULL, 1, NULL FROM grid
    ),
    filled AS (
        SELECT user_id, ts_s, is_grid,
               last_value(value IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY ts_s ASC, is_grid ASC, COALESCE(event_id, -1) ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value_ffill
        FROM unioned
    )
    SELECT user_id, ts_s AS grid_ts_s, ROUND(value_ffill, 4) AS value_ffill
    FROM filled WHERE is_grid = 1
    """,
)
def ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's event series onto an hourly grid with forward
    fill (last observation carried forward) — time-series regularization
    for sequence-model training. Union-of-grid-and-points + one window pass:
    no joins, one shuffle on user_id; grid rows ∝ span/step, generated
    executor-side via sequence(). Tiebreaks (is_grid, event_id) make the
    carried value deterministic when events share a timestamp."""
    e = load(spark, sf_dir, "events", columns=["user_id", "event_id", "value", "ts"]).select(
        "user_id",
        "event_id",
        "value",
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
    )
    grid = (
        e.groupBy("user_id")
        .agg(
            (F.ceil(F.min("ts_s") / 3600.0) * 3600).cast("long").alias("g0"),
            (F.floor(F.max("ts_s") / 3600.0) * 3600).cast("long").alias("g1"),
        )
        .select(
            "user_id",
            F.explode(F.sequence("g0", "g1", F.lit(3600).cast("long"))).alias("ts_s"),
        )
    )
    unioned = e.select(
        "user_id", "ts_s", "value", F.lit(0).alias("is_grid"), "event_id"
    ).unionByName(
        grid.select(
            "user_id",
            "ts_s",
            F.lit(None).cast("double").alias("value"),
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("long").alias("event_id"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts_s").asc(),
            F.col("is_grid").asc(),
            F.coalesce(F.col("event_id"), F.lit(-1)).asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "user_id",
        "ts_s",
        "is_grid",
        F.last("value", ignorenulls=True).over(w).alias("value_ffill"),
    )
    return filled.filter(F.col("is_grid") == 1).select(
        "user_id",
        F.col("ts_s").alias("grid_ts_s"),
        F.round("value_ffill", 4).alias("value_ffill"),
    )


@register(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang
    FROM (SELECT doc_id, lang, {_BUCKET_SQL} AS bucket FROM documents)
    WHERE bucket < CASE lang WHEN 'en' THEN 10
                             WHEN 'de' THEN 20
                             ELSE 50 END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-stratum rates (rebalancing a
    language-skewed corpus: keep 10% of en, 20% of de, 50% of the rest).
    Same content-addressed md5 bucket as sample_hash_split, so membership
    is stable across runs/partitionings and strata stay consistent with
    the train/valid/test split. Pure map-side filter — no shuffle, and at
    100 TB the predicate prunes rows inside the scan stage."""
    d = load(spark, sf_dir, "documents", columns=["doc_id", "lang"])
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
    )
    rate = (
        F.when(F.col("lang") == "en", 10)
        .when(F.col("lang") == "de", 20)
        .otherwise(50)
    )
    return d.withColumn("bucket", bucket).filter(F.col("bucket") < rate).select(
        "doc_id", "lang"
    )


@register(
    "text_length_histogram",
    oracle="""
    SELECT lang,
           CAST(floor(n_chars / 50.0) * 50 AS BIGINT) AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang, bucket_lo
    """,
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution per language in fixed 50-char buckets —
    the first diagnostic every corpus-curation pass runs (truncation
    thresholds, tokenizer budget planning). Bucketing is a pure map; the
    histogram is one partial+final hash aggregate on (lang, bucket), whose
    cardinality is bounded by langs × buckets regardless of corpus size —
    the reduce side stays tiny even at 100 TB."""
    d = load(spark, sf_dir, "documents", columns=["lang", "n_chars"])
    bucket = (F.floor(F.col("n_chars") / 50.0) * 50).cast("long")
    return d.groupBy("lang", bucket.alias("bucket_lo")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
