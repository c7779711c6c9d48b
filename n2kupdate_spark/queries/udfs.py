"""B12 — UDF / UDAF / UDTF surface (SURVEY.md §2 B12).

Reference analog: the client-side ``digest::sha1`` fingerprint is effectively
a scalar UDF applied before staging [M]. Everything here demonstrates the
*slow path done right*: Arrow-batched (never row-at-a-time pickling), and
used only where built-ins genuinely can't express the logic — each docstring
notes the built-in that would replace it in production.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from n2kupdate_spark.queries._registry import register
from n2kupdate_spark.sources import load


@register(
    "udf_scalar_py",
    oracle="""
    SELECT doc_id,
           md5(trim(lower(regexp_replace(text, ' +', ' ', 'g')))) AS canon_fp
    FROM documents
    """,
)
def udf_scalar_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Python UDF: canonicalize text (lower, collapse whitespace,
    trim) then md5 — the reference's normalize-then-fingerprint move done
    client-side. Arrow-optimized; in production this exact logic stays
    JVM-side (regexp_replace + md5), which is what the oracle mirrors."""
    import hashlib
    import re

    @F.udf(returnType=T.StringType(), useArrow=True)
    def canon_fp(text: str) -> str:
        canon = re.sub(" +", " ", text.lower()).strip()
        return hashlib.md5(canon.encode("utf-8")).hexdigest()

    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", canon_fp("text").alias("canon_fp"))


@register(
    "udf_pandas_vectorized",
    oracle="""
    SELECT vec_id,
           ROUND(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 4) AS norm
    FROM embeddings
    """,
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF: L2 norm per embedding, computed over Arrow
    batches with numpy (one ufunc call per batch, no per-row Python)."""
    import numpy as np

    @pandas_udf(T.DoubleType())
    def l2(v: pd.Series) -> pd.Series:
        return v.map(lambda a: float(np.sqrt(np.dot(a, a))) if a is not None else None)

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return e.select("vec_id", F.round(l2("v"), 4).alias("norm"))


@register(
    "udaf_grouped_pandas",
    oracle="""
    WITH n AS (
        SELECT label,
               sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS norm
        FROM embeddings
    )
    SELECT label, COUNT(*) AS n_vecs, ROUND(AVG(norm), 4) AS mean_norm
    FROM n GROUP BY label
    """,
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped custom aggregate via applyInPandas: per-label vector count +
    mean norm. Each group arrives as one pandas frame (Arrow transfer);
    state never touches the driver."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("label", T.IntegerType()),
            T.StructField("n_vecs", T.LongType()),
            T.StructField("mean_norm", T.DoubleType()),
        ]
    )

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        norms = pdf["v"].map(lambda a: float(np.sqrt(np.dot(a, a))))
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "n_vecs": [len(pdf)],
                "mean_norm": [round(float(norms.mean()), 4)],
            }
        )

    e = load(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    return e.groupBy("label").applyInPandas(agg, schema)


@register(
    "udtf_py",
    oracle="""
    SELECT doc_id, CAST(pos AS INT) AS pos, term
    FROM (
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1) AS pos,
               unnest(string_split(text, ' ')) AS term
        FROM documents
    )
    WHERE doc_id < 50 AND term <> ''
    """,
)
def udtf_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one doc row → (pos, term) rows.
    Production tokenization uses posexplode(split(...)) — the oracle mirrors
    that; the UDTF exists to exercise the one-to-many Python surface."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, term: string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                if tok:
                    yield i + 1, tok

    spark.udtf.register("n2k_tokenize", Tokenize)
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("n2k_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.term
        FROM n2k_udtf_docs d, LATERAL n2k_tokenize(d.text) t
        """
    )
