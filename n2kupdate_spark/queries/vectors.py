"""Part C — similarity search over ``embeddings`` (SURVEY.md §2 C).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant (operators/similarity.py) is the scale path. All dot/norm math uses
JVM higher-order functions in double precision — no Python in the row path;
scores are rounded to 4dp and tie-broken by vec_id on both engines
(SURVEY.md §7.4.2/§7.4.4).

Scale notes: brute force is O(Q·N) after broadcasting the Q query vectors —
fine for small Q even at large N (it is one scan of N). For large Q·N, the
LSH variant buckets both sides and only scores within-bucket pairs; the
pairs-threshold op stays within-label (a self-join on the label key, never
a global cross join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from n2kupdate_spark.functions import cosine, l2_norm
from n2kupdate_spark.queries._registry import register
from n2kupdate_spark.sources import load

#: Query-vector selector shared by Spark and oracle: every 100th vec.
_QUERY_PRED_SQL = "vec_id % 100 = 0"
#: Hard cap on the brute-force query set. The q matrix is collected to the
#: driver and shipped in task closures, so it must be O(1) in data size:
#: 256 × 64 doubles = 128 KiB regardless of N. (Unbounded, q grows as N/100
#: — ~5 GB of driver memory at 1e9 vectors: the r1 scale finding.) The cap
#: is a deterministic TRUNCATION (ORDER BY vec_id LIMIT, mirrored in the
#: oracle) — a caller whose query set exceeds it gets the first _Q_MAX by
#: id, not an error. For larger query sets use
#: ``operators.similarity.brute_topk_matmul(..., q_chunk=_Q_MAX)``, which
#: scores the full set in closure-bounded chunks (exactly equal results,
#: one scan per chunk), or the LSH/IVF path, which keeps queries
#: distributed.
_Q_MAX = 256
#: Neighbors returned per query vector — interpolated into the oracle and
#: used by the Spark plan below, so both sides rank/keep the same k
#: (tests/test_driver_window.py asserts the rendered oracle carries these
#: exact literals).
_TOP_K = 10


@register(
    "sim_cosine_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE {_QUERY_PRED_SQL}
               ORDER BY vec_id LIMIT {_Q_MAX})
    SELECT q_id, vec_id AS neighbor_id, cos_sim, rn
    FROM (
        SELECT q.q_id, e.vec_id,
               ROUND(list_cosine_similarity(q.qv, e.v), 4) + 0 AS cos_sim,
               row_number() OVER (
                   PARTITION BY q.q_id
                   ORDER BY ROUND(list_cosine_similarity(q.qv, e.v), 4) + 0 DESC, e.vec_id ASC
               ) AS rn
        FROM q CROSS JOIN e
        WHERE e.vec_id <> q.q_id
    ) WHERE rn <= {_TOP_K}
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors for each query vector, scored by
    one numpy matmul per Arrow batch (operators/similarity.py
    ``brute_topk_matmul``): the small query matrix rides to executors in the
    task closure, each vector batch contributes only its per-batch top-k per
    query, and the final window ranks ~batches × Q × k survivors instead of
    Q × N scored rows. Ordering is on the *rounded* score + vec_id so both
    engines rank identically."""
    from n2kupdate_spark.operators.similarity import brute_topk_matmul

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    query_rows = (
        e.filter(F.col("vec_id") % 100 == 0)
        .orderBy("vec_id")
        .limit(_Q_MAX)  # bounded collect: ≤ _Q_MAX × dim doubles on the driver
        .collect()
    )
    cand = brute_topk_matmul(e, query_rows, "vec_id", "v", k=_TOP_K)
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return cand.select("q_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= _TOP_K
    )


@register(
    "sim_pairs_threshold",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
           ROUND(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.v, b.v), 4) >= 0.25
    """,
)
def sim_pairs_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All within-label pairs with cosine ≥ 0.25 (τ chosen at ~p99 of the
    within-label similarity distribution). The label equi-key bounds the
    pair space — no global cross product — and scoring is one blocked numpy
    matmul per label group (operators/similarity.py
    ``pairwise_cosine_by_group``) instead of an interpreted HOF fold per
    pair (measured ~5× faster at sf0.1)."""
    from n2kupdate_spark.operators.similarity import pairwise_cosine_by_group

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    return pairwise_cosine_by_group(e, "label", "vec_id", "v", tau=0.25).select(
        "label", "id1", "id2", "cos_sim"
    )


@register(
    "multimodal_doc_join",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars,
           CAST(len(e.embedding) AS INT) AS dim,
           ROUND(sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x * x))), 4) AS norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def multimodal_doc_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join text docs to their vectors (doc_id = vec_id) with combined
    features. INNER join deliberately: at sf0.1 3,000 of 5,000 docs have no
    vector (FIXTURES.md §3) — inner keeps the op scale-factor-portable."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id, "inner")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.size("embedding").alias("dim"),
            F.round(l2_norm("embedding"), 4).alias("norm"),
        )
    )


@register(
    "embed_norm_stats",
    oracle="""
    WITH n AS (
        SELECT label,
               sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS norm
        FROM embeddings
    )
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(AVG(norm), 4) AS avg_norm,
           ROUND(MIN(norm), 4) AS min_norm,
           ROUND(MAX(norm), 4) AS max_norm
    FROM n GROUP BY label
    """,
)
def embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector-norm aggregates (cluster geometry sanity stats)."""
    e = load(spark, sf_dir, "embeddings").select("label", l2_norm("embedding").alias("norm"))
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("norm"), 4).alias("avg_norm"),
        F.round(F.min("norm"), 4).alias("min_norm"),
        F.round(F.max("norm"), 4).alias("max_norm"),
    )


@register(
    "embed_quantize_int8",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         s AS (SELECT vec_id, v,
                      list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
               FROM e),
         q AS (SELECT vec_id, scale,
                      list_transform(v, x -> CAST(round(x / scale) AS BIGINT)) AS codes
               FROM s WHERE scale > 0)
    SELECT vec_id,
           ROUND(scale, 6) AS scale_q,
           CAST(list_sum(codes) AS BIGINT) AS sum_codes,
           CAST(len(list_filter(codes, c -> abs(c) >= 127)) AS BIGINT) AS n_maxcode
    FROM q
    """,
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column — the
    standard 4× compression step before large-scale ANN serving (codes in
    [-127, 127], per-vector scale = max|x|/127). Emits the per-vector scale
    and integer checksums of the code vector so the quantization arithmetic
    is oracle-checked exactly (integer sums, no float drift). Pure map:
    no shuffle, Arrow-free, all JVM higher-order functions — at 100 TB this
    runs at scan speed and writes 1/4 the bytes."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    scale = (F.array_max(F.transform("v", lambda x: F.abs(x))) / 127.0).alias("scale")
    s = e.select("vec_id", "v", scale).filter(F.col("scale") > 0)
    codes = F.transform("v", lambda x: F.round(x / F.col("scale"), 0).cast("long"))
    q = s.select("vec_id", "scale", codes.alias("codes"))
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale_q"),
        F.aggregate("codes", F.lit(0).cast("long"), lambda a, c: a + c).alias(
            "sum_codes"
        ),
        F.size(F.filter("codes", lambda c: F.abs(c) >= 127)).cast("long").alias(
            "n_maxcode"
        ),
    )


@register("embed_hard_negatives")  # rows-only debut (capacity policy
# §5.2) — cross-engine verified anyway: the pytest pin runs the
# equivalent DuckDB list_cosine_similarity SQL through the driver's own
# canonical-rows compare (tests/test_parity.py).
def embed_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retrieval/contrastive training: for each
    query vector (every 100th, the shared predicate), the 10 most-similar
    embeddings with a DIFFERENT label — the near-boundary negatives that
    published retrieval recipes mine from the corpus because random
    negatives are too easy to teach the margin. Emits
    (q_id, neg_id, cos_sim, rn) ranked on the rounded score with neg_id
    tiebreak.

    Scale design: same shape as sim_cosine_topk — the bounded query
    matrix rides in task closures, one numpy matmul per Arrow batch, and
    the label-mismatch mask is applied INSIDE the batch scorer so a
    same-label crowd can't evict true hard negatives from the per-batch
    top-k prefilter; the final window ranks ~batches × Q × k survivors.
    See operators/similarity.py:hard_negative_topk."""
    from n2kupdate_spark.operators.similarity import hard_negative_topk

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    query_rows = (
        e.filter(F.expr(_QUERY_PRED_SQL))
        .select("vec_id", "v", "label")
        .orderBy("vec_id")
        .limit(_Q_MAX)
        .collect()
    )
    cand = hard_negative_topk(e, query_rows, "vec_id", "v", "label", k=_TOP_K)
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("neg_id").asc()
    )
    return cand.select(
        "q_id", "neg_id", "cos_sim", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= _TOP_K)
