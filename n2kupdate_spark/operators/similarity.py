"""Approximate nearest neighbour search over embedding columns.

Brute-force cosine (queries/vectors.py::sim_cosine_topk) is the correctness
baseline — one broadcast of Q query vectors and a single scan of N. This
module adds the scale paths:

- random-hyperplane LSH (``rp_lsh_topk``): sign-projection signatures bucket
  both sides; only same-bucket pairs are scored. Sub-linear candidate sets;
  recall tunable via bands × bits.
- IVF coarse quantization (``ivf_topk``): deterministic seeded centroids
  (k-means single Lloyd pass done distributed), vectors assigned to nearest
  centroid; queries probe the nprobe nearest cells only.

Both are deterministic (seeded numpy projections, fixed iteration counts) →
rows-only checks; the exact scorer they wrap is the same HOF cosine used by
the oracle-checked brute-force op.

Scale: at 100 TB the pattern is: centroids/hyperplanes broadcast (tiny),
signature/assignment computed in one scan, candidates shuffled by bucket id
— never an N×Q cross join.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from n2kupdate_spark.functions import cosine

#: LSH layout: BANDS bands of BITS sign-bits each.
RP_BANDS = 4
RP_BITS = 8


def _hyperplanes(dim: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(RP_BANDS * RP_BITS, dim))


def _band_keys(vec_col: str, planes: np.ndarray):
    """Per-band integer bucket keys from sign projections (JVM HOF dot)."""
    keys = []
    for band in range(RP_BANDS):
        bits = []
        for i in range(RP_BITS):
            plane = planes[band * RP_BITS + i]
            proj = F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in plane]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
        key = bits[0]
        for b in bits[1:]:
            key = key + b
        keys.append(key)
    return keys


def rp_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    query_id_col: str,
    vec_col: str = "v",
    query_vec_col: str = "qv",
    k: int = 10,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k by cosine: score only pairs sharing ≥1 LSH band.

    Output schema matches the brute-force op (q_id, neighbor_id, cos_sim,
    rn) so callers can swap exact↔approximate."""
    planes = _hyperplanes(dim)

    def explode_bands(df: DataFrame, idc: str, vc: str) -> DataFrame:
        keys = _band_keys(vc, planes)
        bands = F.array(
            *[
                F.struct(F.lit(i).alias("band_idx"), keys[i].alias("band_key"))
                for i in range(RP_BANDS)
            ]
        )
        return df.select(idc, vc, F.explode(bands).alias("b")).select(
            idc, vc, "b.band_idx", "b.band_key"
        )

    v_b = explode_bands(vectors, id_col, vec_col)
    q_b = explode_bands(queries, query_id_col, query_vec_col)

    cands = (
        F.broadcast(q_b)
        .join(
            v_b,
            (q_b.band_idx == v_b.band_idx)
            & (q_b.band_key == v_b.band_key)
            & (F.col(query_id_col) != F.col(id_col)),
        )
        .select(query_id_col, id_col, query_vec_col, vec_col)
        .distinct()
    )
    scored = cands.select(
        F.col(query_id_col).alias("q_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(query_vec_col, vec_col), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.select(
        "q_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= k)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    query_id_col: str,
    vec_col: str = "v",
    query_vec_col: str = "qv",
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    dim: int = 64,
    seed: int = 11,
) -> DataFrame:
    """IVF: assign vectors to seeded random centroids (one distributed
    Lloyd refinement), probe the nprobe nearest cells per query.

    Centroids are broadcast both times; assignment is a scan + argmin over
    n_cells dot products — no shuffle beyond the final per-cell join."""
    rng = np.random.RandomState(seed)
    cents = rng.normal(size=(n_cells, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    def cell_scores(vc: str, centroids: np.ndarray):
        return F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        F.col(vc),
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for c in centroids
            ]
        )

    def best_cell(vc: str, centroids: np.ndarray):
        scores = cell_scores(vc, centroids)
        # argmax as array_position of the max (1-based; deterministic:
        # first occurrence wins on exact ties)
        return F.array_position(scores, F.array_max(scores)).cast("int")

    # One Lloyd refinement: mean of assigned vectors per cell (distributed),
    # collected only as n_cells × dim floats — bounded driver traffic.
    assigned = vectors.withColumn("cell", best_cell(vec_col, cents))
    means = (
        assigned.select("cell", F.posexplode(vec_col).alias("i", "x"))
        .groupBy("cell", "i")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    refined = cents.copy()
    by_cell: dict[int, dict[int, float]] = {}
    for r in means:
        by_cell.setdefault(r["cell"] - 1, {})[r["i"]] = r["m"]
    for cell, comps in by_cell.items():
        vec = np.array([comps.get(i, refined[cell][i]) for i in range(dim)])
        n = np.linalg.norm(vec)
        if n > 0:
            refined[cell] = vec / n

    v_cells = vectors.withColumn("cell", best_cell(vec_col, refined))

    # Probe the nprobe best cells per query: posexplode the per-cell scores
    # and keep the top-nprobe (score desc, cell asc tiebreak).
    q_scores = queries.withColumn("__scores", cell_scores(query_vec_col, refined))
    q_exp = q_scores.select(
        query_id_col, query_vec_col, F.posexplode("__scores").alias("__pos", "__s")
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("__s").desc(), F.col("__pos").asc())
    q_cells = (
        q_exp.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select(query_id_col, query_vec_col, (F.col("__pos") + 1).cast("int").alias("cell"))
    )

    cands = (
        F.broadcast(q_cells)
        .join(v_cells, ["cell"])
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, id_col, query_vec_col, vec_col)
        .distinct()
    )
    scored = cands.select(
        F.col(query_id_col).alias("q_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(query_vec_col, vec_col), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.select(
        "q_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= k)
