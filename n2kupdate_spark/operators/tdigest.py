"""t-digest quantile sketches (Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests", arXiv:1902.04023) — the OTHER
mergeable quantile sketch next to KLL (queries/aggregates.py::
agg_kll_quantile_merge): KLL bounds RANK error uniformly; the t-digest's
K1 scale function concentrates capacity at the tails, so extreme
quantiles (p99.9 latencies, contamination score cutoffs) come out far
tighter at the same sketch size. Spark 4 ships KLL SQL functions but no
t-digest — this is the from-scratch implementation of the published
algorithm.

Determinism contract (the reason this file exists instead of a pip
library): a digest built here is a pure function of the value
multiset AND the sketch spec (δ, bucket count, hash columns) — values
sort before clustering, bucket assignment is a content hash (never a
partition id), and merges concat + re-sort by (mean, weight) +
re-cluster, so physical partitioning and merge order cannot change the
result. (Changing the bucket COUNT legitimately changes which partial
digests exist and therefore the merged centroids — a sketch spec
parameter, like δ.) Two runs over the same data produce byte-identical
centroid arrays (pinned in tests/test_sketch_accuracy.py).

Scale shape: partial digests build inside Arrow ``applyInPandas`` tasks
keyed by (group, deterministic value-hash bucket) — each task sees
``~n/(groups·buckets)`` rows and emits ≤ ~2δ centroids; only centroid
arrays (groups × buckets × O(δ) doubles) leave the executors, the
canonical bounded-model-state collect (the CMS/codebook class). The
upward merge is associative re-clustering on those tiny arrays.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from n2kupdate_spark.operators.parallel import local_frame as _local_frame

from n2kupdate_spark.operators.parallel import full_width


def _k1(q: float, delta: float) -> float:
    """The K1 scale function k(q) = δ/(2π)·asin(2q−1): its unit steps
    bound cluster mass ∝ q(1−q) — tight clusters at both tails, wide in
    the middle, which is exactly where quantile queries tolerate it."""
    return delta / (2.0 * np.pi) * np.arcsin(np.clip(2.0 * q - 1.0, -1.0, 1.0))


def build_digest(
    x: np.ndarray, w: np.ndarray, delta: float = 100.0
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right clustering of a SORTED weighted sequence:
    extend the open cluster while the k-span it would cover stays ≤ 1,
    else seal it. Returns (means, weights) arrays, means ascending."""
    order = np.lexsort((w, x))
    x, w = x[order], w[order]
    n_total = float(w.sum())
    if n_total <= 0:
        return np.empty(0), np.empty(0)
    means, weights = [], []
    cur_mean, cur_w = float(x[0]), float(w[0])
    w_before = 0.0
    k_lo = _k1(0.0, delta)
    for xi, wi in zip(x[1:], w[1:]):
        q_new = (w_before + cur_w + wi) / n_total
        if _k1(q_new, delta) - k_lo <= 1.0:
            cur_w += wi
            cur_mean += (xi - cur_mean) * wi / cur_w
        else:
            means.append(cur_mean)
            weights.append(cur_w)
            w_before += cur_w
            k_lo = _k1(w_before / n_total, delta)
            cur_mean, cur_w = float(xi), float(wi)
    means.append(cur_mean)
    weights.append(cur_w)
    return np.asarray(means), np.asarray(weights)


def merge_digests(
    parts: list[tuple[np.ndarray, np.ndarray]], delta: float = 100.0
) -> tuple[np.ndarray, np.ndarray]:
    """ORDER-INVARIANT flat merge: concat centroids, re-sort,
    re-cluster — permuting ``parts`` cannot change the result (sorting
    erases concat order). NOT tree-associative: an intermediate merge
    re-clusters (lossily), so merge(merge(a,b), merge(c,d)) may differ
    from merge([a,b,c,d]) — both are valid digests of the same data,
    but only ONE shape is deterministic across runs. The pipeline
    therefore always merges in a single flat call per level (all of a
    group's bucket partials at once; all group digests at once), which
    pins the result to the sketch spec alone."""
    ms = np.concatenate([p[0] for p in parts if len(p[0])] or [np.empty(0)])
    ws = np.concatenate([p[1] for p in parts if len(p[1])] or [np.empty(0)])
    if not len(ms):
        return ms, ws
    return build_digest(ms, ws, delta)


def digest_quantile(means: np.ndarray, weights: np.ndarray, q: float):
    """Standard t-digest quantile read: centroid i's mass is centered at
    cum_before + w_i/2; interpolate linearly between adjacent centers,
    clamping to the end centroids outside their centers. An EMPTY
    digest (zero rows / all-null input) reads None, not a crash."""
    if not len(means):
        return None
    n = float(weights.sum())
    target = q * n
    centers = np.cumsum(weights) - weights / 2.0
    if target <= centers[0]:
        return float(means[0])
    if target >= centers[-1]:
        return float(means[-1])
    i = int(np.searchsorted(centers, target, side="right")) - 1
    span = centers[i + 1] - centers[i]
    frac = (target - centers[i]) / span if span > 0 else 0.0
    return float(means[i] + frac * (means[i + 1] - means[i]))


def tdigest_quantiles_by_group(
    df: DataFrame,
    group_col: str,
    val_col: str,
    quantiles: tuple = (0.5, 0.95),
    delta: float = 100.0,
    buckets: int = 32,
    hash_cols: tuple | None = None,
    all_label: str = "__ALL__",
) -> DataFrame:
    """Per-group t-digest quantiles plus the global quantiles read from
    the MERGED digest — the rollup-without-rereading shape of the HLL /
    KLL merge ops. ``hash_cols`` picks the deterministic bucket key
    (defaults to the value column itself — content-addressed, ties land
    in one bucket together which is harmless since sorting erases
    bucket boundaries anyway).

    Plan: ONE (group, bucket)-keyed Arrow dispatch builds partial
    digests from sorted task-local values; centroid arrays collect
    (bounded: groups × buckets × O(δ) doubles) and merge driver-side —
    the sketch-family pattern (agg_cms_heavy_hitters deserializes
    driver-side the same way); the heavy work, sorting + clustering n
    rows, is distributed.

    The OUTPUT group column is always STRING: the merged-rollup label
    (``all_label``) shares the column, so non-string group values are
    rendered with str() (a NULL group stays NULL) — the trade every
    rollup-label table makes. Empty input yields just the all_label
    row with n = 0 and NULL quantiles."""
    import pandas as pd

    hcols = list(hash_cols) if hash_cols else [val_col]
    staged = df.select(
        F.col(group_col).alias("__g"),
        F.col(val_col).cast("double").alias("__v"),
        F.pmod(F.xxhash64(*hcols), F.lit(buckets)).cast("int").alias("__b"),
    ).filter(F.col("__v").isNotNull())

    def _one(pdf: "pd.DataFrame") -> "pd.DataFrame":
        v = np.sort(pdf["__v"].to_numpy(dtype=float), kind="stable")
        m, w = build_digest(v, np.ones(len(v)), delta)
        return pd.DataFrame(
            {
                "__g": [pdf["__g"].iloc[0]],
                "means": [m.tolist()],
                "weights": [w.tolist()],
            }
        )

    gtype = df.schema[group_col].dataType.simpleString()
    # full_width: see operators/parallel.py — AQE byte-coalescing would
    # starve the digest-build pandas stage (r16)
    parts = full_width(staged, "__g", "__b").groupBy("__g", "__b").applyInPandas(
        _one, schema=f"__g {gtype}, means array<double>, weights array<double>"
    )
    by_group: dict = {}
    for r in parts.collect():
        by_group.setdefault(r["__g"], []).append(
            (np.asarray(r["means"]), np.asarray(r["weights"]))
        )
    def _q4(m, w, q):
        v = digest_quantile(m, w, q)
        return None if v is None else float(np.round(v * 10000) / 10000 + 0.0)

    rows = []
    group_digests = []
    # None-safe deterministic group order (NULL groups sort first)
    for g in sorted(by_group, key=lambda g: (g is not None, str(g))):
        m, w = merge_digests(by_group[g], delta)
        group_digests.append((m, w))
        label = None if g is None else str(g)
        rows.append(
            (label, int(w.sum()))
            + tuple(_q4(m, w, q) for q in quantiles)
        )
    gm, gw = merge_digests(group_digests or [(np.empty(0), np.empty(0))], delta)
    rows.append(
        (all_label, int(gw.sum()) if len(gw) else 0)
        + tuple(_q4(gm, gw, q) for q in quantiles)
    )
    qcols = ", ".join(f"p{int(round(q * 100))} double" for q in quantiles)
    return _local_frame(df.sparkSession, 
        rows, f"{group_col} string, n long, {qcols}"
    )
