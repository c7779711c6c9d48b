"""Poisson bootstrap — the bootstrap that works on a cluster.

The classical bootstrap resamples n rows WITH replacement B times, which
is a non-starter on distributed data (each replica needs a global
coordinated sample). The Poisson bootstrap (the standard large-scale
reformulation: for n → ∞, each row's multiplicity in a resample is
Poisson(1) independently — e.g. Chamandy et al., "Estimating uncertainty
for massive data streams", Google tech report 2012) replaces the
coordinated draw with a PER-ROW, PER-REPLICA weight, so every replica
statistic folds in one partial-aggregated pass: one Arrow map emits
(group, replica, Σw, Σw·x) partials per batch, one (group, replica)-keyed
sum merges them, and the B replica means per group are a bounded table
(G×B rows) for the percentile read. Nothing global, nothing resampled,
map-side combine by construction.

Determinism contract: the Poisson weight of (row, replica) is derived
from a splitmix64 mix of the row's ID column and the replica index —
content-addressed, so partitioning, batch boundaries and retries cannot
change any weight; two runs produce identical intervals (pinned in
tests/test_parity.py §r14).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _pois1_cdf() -> np.ndarray:
    """Poisson(1) CDF thresholds for k = 0..11 — inverse-CDF sampling
    from a uniform hash. P(X > 11) < 1e-9; the tail clamps to 11."""
    import math

    return np.cumsum([math.exp(-1.0) / math.factorial(k) for k in range(12)])


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """The splitmix64 finalizer (Steele, Lea & Flood 2014; public
    domain constants) — a strong 64-bit mixer, vectorized in uint64."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def poisson_weights(ids: np.ndarray, b: int, n_reps: int) -> np.ndarray:
    """Deterministic Poisson(1) multiplicity of every row in replica
    ``b``: u = splitmix64(id·R + b) / 2⁶⁴, k = inverse-CDF(u)."""
    h = _splitmix64(
        ids.astype(np.uint64) * np.uint64(n_reps) + np.uint64(b)
    )
    u = h.astype(np.float64) / float(2**64)
    return np.searchsorted(_pois1_cdf(), u, side="right").astype(np.int64)


def poisson_weight_matrix(ids: np.ndarray, n_reps: int) -> np.ndarray:
    """All replicas at once: the (n_rows × n_reps) multiplicity matrix,
    one vectorized splitmix64 + searchsorted over the OUTER product of
    ids and replica indices — identical values to per-replica
    :func:`poisson_weights` (same u per (id, b)), ~n_reps× fewer
    python-level passes."""
    keys = ids.astype(np.uint64)[:, None] * np.uint64(n_reps) + np.arange(
        n_reps, dtype=np.uint64
    )[None, :]
    u = _splitmix64(keys).astype(np.float64) / float(2**64)
    return np.searchsorted(_pois1_cdf(), u, side="right").astype(np.int64)


def bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    id_col: str,
    val_col: str,
    n_reps: int = 200,
    alpha: float = 0.05,
) -> DataFrame:
    """Per-group mean with a percentile-bootstrap (1−α) CI and the
    bootstrap SE — via ``n_reps`` Poisson replicas. Emits (group, n,
    mean, ci_lo, ci_hi, se), 4dp scale-first.

    ``id_col`` seeds the deterministic replica hash. Integral ids
    (tiny/small/int/bigint) feed splitmix64 directly; any other type
    (string url keys, decimals, timestamps…) is hashed to int64 with
    ``xxhash64`` FIRST — same determinism contract (one fixed weight
    per (id, replica)), no integer-id precondition for the caller.

    Plan: ONE Arrow ``mapInPandas`` pass folds each batch into
    (group, replica, Σw, Σw·x, Σ1, Σx) partial rows (≤ G·B rows per
    batch — the whole replica axis is one numpy outer product per
    group, :func:`poisson_weight_matrix`, not a per-replica python
    loop), one (group, replica)-keyed partial-agged sum, then the
    percentile read runs on the bounded G×B table via sort_array over
    a collect_list that is B-bounded BY CONSTRUCTION (never a
    data-sized array — the §2 collect_list rule). Empty replicas
    (every weight 0 — probability e⁻ⁿ, real only for tiny groups)
    drop from the percentile read."""
    import pandas as pd

    def _fold(batches):
        for pdf in batches:
            ids = pdf["__rid"].to_numpy(dtype=np.int64)
            x = pdf[val_col].to_numpy(dtype=np.float64)
            g = pdf[group_col].to_numpy()
            frames = []
            for grp in pd.unique(g):
                m = g == grp
                gid, gx = ids[m], x[m]
                # ONE vectorized outer pass per group: (rows × reps)
                # weight matrix, column sums — no per-replica python loop
                W = poisson_weight_matrix(gid, n_reps)
                frames.append(
                    pd.DataFrame(
                        {
                            "__g": grp,
                            "__b": np.arange(n_reps, dtype=np.int32),
                            "__sw": W.sum(axis=0),
                            "__swx": (W * gx[:, None]).sum(axis=0),
                            "__n": np.int64(len(gx)),
                            "__sx": float(gx.sum()),
                        }
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {
                    "__g": pd.Series(dtype=object),
                    "__b": pd.Series(dtype=np.int32),
                    "__sw": pd.Series(dtype=np.int64),
                    "__swx": pd.Series(dtype=np.float64),
                    "__n": pd.Series(dtype=np.int64),
                    "__sx": pd.Series(dtype=np.float64),
                }
            )

    gtype = df.schema[group_col].dataType.simpleString()
    # integral ids seed splitmix64 as-is; everything else (string keys,
    # decimals…) goes through xxhash64 → int64 first — previously a
    # string id died deep inside the Arrow task with an opaque cast error
    id_type = df.schema[id_col].dataType.typeName()
    rid = (
        F.col(id_col).cast("long")
        if id_type in ("byte", "short", "integer", "long")
        else F.xxhash64(F.col(id_col))
    )
    parts = (
        # id carries the replica hash — a NULL id has no deterministic
        # weight (xxhash64 would silently hash it to the seed); NULL
        # groups likewise drop (SQL groupBy would keep them, but a NULL
        # cohort has no dashboard meaning here — documented, not
        # silent: this filter, BEFORE the hash projection)
        df.filter(
            F.col(val_col).isNotNull()
            & F.col(id_col).isNotNull()
            & F.col(group_col).isNotNull()
        )
        .select(group_col, rid.alias("__rid"), val_col)
        .mapInPandas(
            _fold,
            schema=(
                f"__g {gtype}, __b int, __sw long, __swx double, "
                "__n long, __sx double"
            ),
        )
    )
    reps = parts.groupBy("__g", "__b").agg(
        F.sum("__sw").alias("sw"),
        F.sum("__swx").alias("swx"),
        F.sum("__n").alias("n"),
        F.sum("__sx").alias("sx"),
    )
    rep_means = reps.filter(F.col("sw") > 0).select(
        "__g", "n", "sx", (F.col("swx") / F.col("sw")).alias("m")
    )
    lo_idx = F.ceil(F.lit(alpha / 2) * F.size("ms")).cast("int")
    hi_idx = F.ceil(F.lit(1 - alpha / 2) * F.size("ms")).cast("int")
    r4 = lambda c: F.round(c * 10000) / 10000 + 0.0  # noqa: E731
    agg = rep_means.groupBy("__g").agg(
        F.max("n").alias("n"),
        F.max("sx").alias("sx"),
        F.sort_array(F.collect_list("m")).alias("ms"),  # B-bounded
        F.stddev_samp("m").alias("se"),
    )
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        r4(F.col("sx") / F.col("n")).alias("mean"),
        r4(F.element_at("ms", F.greatest(F.lit(1), lo_idx))).alias("ci_lo"),
        r4(F.element_at("ms", F.least(F.size("ms"), hi_idx))).alias("ci_hi"),
        r4(F.col("se")).alias("se"),
    )
