"""ANN quality gates: the approximate variants must actually approximate —
recall@10 vs the exact brute-force baseline is pinned from below. Bounds are
intentionally loose (these are recall/latency tradeoff knobs, not exactness
claims) but high enough to catch a broken bucketing join or a seed change
silently zeroing overlap."""

from __future__ import annotations

from n2kupdate_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_ann_recall_bounds(spark):
    rows = {
        r["method"]: r
        for r in QUERIES["sim_ann_recall_eval"](spark, SF).collect()
    }
    assert set(rows) == {"lsh", "ivf", "pq"}
    # measured at sf0.001 / sf0.1: lsh 0.90 / 0.945 (24x5 bands),
    # ivf 0.96 / 0.89 (nprobe=10), pq 1.0 / 0.99 (m=16, ksub=64,
    # shortlist=150 + exact re-rank); deterministic seeds throughout
    floors = {"lsh": 0.85, "ivf": 0.85, "pq": 0.9}
    for method, row in rows.items():
        assert row["n_queries"] >= 4, method
        assert row["recall_at_10"] >= floors[method], (method, row["recall_at_10"])


def test_kmeans_cluster_assignments_are_exact_argmax(spark):
    """Value pin for the rows-only embed_kmeans_clusters query: recompute
    the assignment in numpy against the op's OWN centroids (same seeds →
    same fit) and require exact agreement — cluster = argmax centroid dot
    (first-wins tiebreak), cos_to_centroid = that dot / ‖v‖ rounded. Also:
    every cluster nonempty (k-means++ seeding collapsed a cell ⇒ fail) and
    the run is deterministic."""
    import numpy as np
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.similarity import fit_spherical_centroids
    from n2kupdate_spark.sources import load

    out = {
        r["vec_id"]: (r["cluster"], r["cos_to_centroid"])
        for r in QUERIES["embed_kmeans_clusters"](spark, SF).collect()
    }
    e = load(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    C = fit_spherical_centroids(e, "vec_id", "v")
    vecs = {r["vec_id"]: np.asarray(r["v"], dtype=np.float64) for r in e.collect()}
    assert set(out) == set(vecs)
    seen_clusters = set()
    for vid, v in vecs.items():
        scores = C @ v
        want_cluster = int(np.argmax(scores)) + 1  # 1-based, first-wins
        nrm = np.linalg.norm(v)
        want_cos = round(float(scores.max() / nrm), 4) if nrm > 0 else None
        got_cluster, got_cos = out[vid]
        assert got_cluster == want_cluster, (vid, got_cluster, want_cluster)
        assert got_cos is not None and abs(got_cos - want_cos) <= 1e-4, (
            vid, got_cos, want_cos,
        )
        seen_clusters.add(got_cluster)
    assert seen_clusters == set(range(1, len(C) + 1)), seen_clusters


def test_pca_projection_is_exact_and_sample_variance_monotone(spark):
    """embed_pca_project's value pin: every projection equals the numpy
    (v − mean) @ Wᵀ against the op's own (mean, components) at 4dp, and on
    the FITTING sample the per-component variances are non-increasing —
    an exact SVD property (singular values descend), so any basis
    mis-ordering or sign/centering bug trips it deterministically."""
    import numpy as np
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.similarity import fit_pca_components
    from n2kupdate_spark.sources import load

    out = {
        r["vec_id"]: np.asarray(r["pc"], dtype=np.float64)
        for r in QUERIES["embed_pca_project"](spark, SF).collect()
    }
    e = load(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    mu, W = fit_pca_components(e, "vec_id", "v", k=8)
    vecs = {r["vec_id"]: np.asarray(r["v"], dtype=np.float64) for r in e.collect()}
    assert set(out) == set(vecs)
    for vid, v in vecs.items():
        want = np.round((v - mu) @ W.T, 4) + 0.0
        assert np.array_equal(out[vid], want), (vid, out[vid], want)

    sample_ids = sorted(vecs)[:512]
    S = np.stack([vecs[i] for i in sample_ids])
    proj = (S - mu) @ W.T
    var = proj.var(axis=0)
    assert all(var[i] + 1e-9 >= var[i + 1] for i in range(len(var) - 1)), var
    assert var[0] > 0
