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
    assert set(rows) == {"lsh", "ivf", "pq", "ivfpq", "jl"}
    # measured at sf0.001 / sf0.1: lsh 0.90 / 0.945 (24x5 bands),
    # ivf 0.96 / 0.89 (nprobe=10), pq 1.0 / 0.99 (m=16, ksub=64,
    # shortlist=150 + exact re-rank), ivfpq 0.96 / 0.885 (r10: the
    # residual-PQ shortlist costs only ~0.005 vs pure IVF at the same
    # nprobe while scanning m-byte codes instead of floats — the coarse
    # quantizer, shared with IVF, is the recall bound), jl 1.0 / 0.855
    # (r11: 32-dim projection + 400-shortlist exact re-rank — the r11
    # sweep on these near-worst-case embeddings is in the query
    # docstring); deterministic seeds throughout
    floors = {"lsh": 0.85, "ivf": 0.85, "pq": 0.9, "ivfpq": 0.85, "jl": 0.8}
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


def test_kmeans_pp_degenerate_and_clamped_init():
    """r8 advice (low): k-means++ sampling clamps np.searchsorted to the
    last index (fp rounding can leave cumsum[-1] < rand → index == n →
    IndexError), and the total<=0 fallback handles fully-degenerate
    input. Exercise both init loops on adversarial shapes: identical
    vectors (all-zero distances) and a near-degenerate cloud whose
    cumulative weights are dominated by one point (the rounding regime)."""
    import numpy as np

    from n2kupdate_spark.operators.similarity import _kmeans_pp_spherical

    # identical vectors: every d2 == 0 → the total<=0 branch every pick
    same = np.tile(np.array([1.0, 2.0, 3.0, 4.0]), (32, 1))
    C = _kmeans_pp_spherical(same, n_cells=4, seed=3)
    assert C.shape == (4, 4) and np.isfinite(C).all()

    # one far outlier: probability mass ~entirely on a single cumsum step,
    # the regime where cumsum[-1) < rand rounding bites; must never raise
    near = np.ones((64, 8)) + 1e-12 * np.random.RandomState(0).rand(64, 8)
    near[0] = -np.ones(8)
    C2 = _kmeans_pp_spherical(near, n_cells=8, seed=5)
    assert C2.shape == (8, 8) and np.isfinite(C2).all()


def test_semantic_dedup_kept_dropped_set_pinned(spark):
    """Value pin for the rows-only dedup_semantic_clusters query
    (SemDeDup): recompute the ENTIRE kept/dropped set independently in
    numpy — assign with the op's own deterministic centroids (same seeds
    → same fit), enumerate every within-cluster pair at round(cos,4) ≥
    tau, drop each id that has a lower-id neighbor, rep = the MINIMUM
    such neighbor — and require exact set equality plus per-row rep and
    cos_sim agreement. Also pins determinism across reruns."""
    import numpy as np
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.similarity import fit_spherical_centroids
    from n2kupdate_spark.sources import load

    tau = 0.3
    got = {
        r["drop_id"]: (r["rep_id"], r["cluster"], r["cos_sim"])
        for r in QUERIES["dedup_semantic_clusters"](spark, SF).collect()
    }
    assert got, "no drops at sf0.001 — fixture has near-dups at cos≥0.3"

    e = load(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    rows = sorted(e.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    V = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    C = fit_spherical_centroids(e, "vec_id", "v", n_cells=16)
    # best_cell: argmax of raw-vector dot, first-wins (numpy argmax too)
    cell = np.argmax(V @ C.T, axis=1)
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0] = 1.0
    U = V / norms[:, None]
    S = np.round(U @ U.T, 4) + 0.0
    want = {}
    for j in range(len(ids)):
        lower = [
            i for i in range(j)
            if cell[i] == cell[j] and S[i, j] >= tau and ids[i] < ids[j]
        ]
        if lower:
            rep = min(lower, key=lambda i: ids[i])
            want[int(ids[j])] = (int(ids[rep]), int(cell[j]) + 1, float(S[rep, j]))
    assert set(got) == set(want), (
        f"drop-set mismatch: extra={set(got) - set(want)}, "
        f"missing={set(want) - set(got)}"
    )
    for d, (rep, cl, cs) in want.items():
        assert got[d][0] == rep and got[d][1] == cl, (d, got[d], (rep, cl, cs))
        assert abs(got[d][2] - cs) < 1e-9, (d, got[d][2], cs)

    rerun = {
        r["drop_id"]: (r["rep_id"], r["cluster"], r["cos_sim"])
        for r in QUERIES["dedup_semantic_clusters"](spark, SF).collect()
    }
    assert rerun == got


def test_semantic_dedup_pq_equals_float_path(spark):
    """Pin for the rows-only dedup_semantic_pq query (VERDICT r9 item 5):
    the PQ codes path — SDC-shortlisted candidates at tau − margin,
    exact float re-rank — must produce the EXACT kept/dropped set of the
    float path, row for row (drop_id, rep_id, cluster, cos_sim). The
    fixture's max SDC error over true pairs is 0.095 at m=32 (measured;
    operators/similarity.py::semantic_dedup docstring), strictly inside
    the 0.12 margin, so no true pair escapes the shortlist and the
    exact re-rank makes the rest byte-identical. Also pins determinism
    across reruns (seeded codebook fit + id tiebreaks)."""
    flt = {
        r["drop_id"]: (r["rep_id"], r["cluster"], r["cos_sim"])
        for r in QUERIES["dedup_semantic_clusters"](spark, SF).collect()
    }
    pq = {
        r["drop_id"]: (r["rep_id"], r["cluster"], r["cos_sim"])
        for r in QUERIES["dedup_semantic_pq"](spark, SF).collect()
    }
    assert flt, "no drops at sf0.001 — fixture has near-dups at cos≥0.3"
    assert pq == flt, (
        f"PQ/float drop-set mismatch: extra={set(pq) - set(flt)}, "
        f"missing={set(flt) - set(pq)}"
    )
    rerun = {
        r["drop_id"]: (r["rep_id"], r["cluster"], r["cos_sim"])
        for r in QUERIES["dedup_semantic_pq"](spark, SF).collect()
    }
    assert rerun == pq


def test_semantic_resume_pq_equals_float_resume_both_sfs(spark):
    """Pin for the rows-only dedup_semantic_resume_pq query: the
    codes-domain resume — candidates from persisted PQ codes at the
    PROVABLE per-pair threshold tau − (e_p + e_b + e_p·e_b), cogrouped
    exact re-rank — must equal the float resume row-for-row at BOTH
    fixture scales. sf0.1 is the load-bearing scale here: the one-shot's
    fixed 0.12 margin misses one rep assignment there (out-of-sample
    quantization error 0.122 > margin, measured), and the adaptive bound
    is exactly what closes that class of miss — this test is the
    guarantee's regression pin. Also pins rerun determinism (cached
    index + seeded encodes)."""
    for sf in (SF, "/root/testdata/sf0.1"):
        flt = {
            r["drop_id"]: (r["rep_id"], r["cluster"], r["cos_sim"])
            for r in QUERIES["dedup_semantic_resume"](spark, sf).collect()
        }
        pq = {
            r["drop_id"]: (r["rep_id"], r["cluster"], r["cos_sim"])
            for r in QUERIES["dedup_semantic_resume_pq"](spark, sf).collect()
        }
        assert flt, f"no drops at {sf} — fixture has near-dups at cos≥0.3"
        assert pq == flt, (
            f"{sf}: PQ/float resume mismatch: "
            f"extra={set(pq) - set(flt)}, missing={set(flt) - set(pq)}, "
            f"valdiff={ {k: (flt[k], pq[k]) for k in set(flt) & set(pq) if flt[k] != pq[k]} }"
        )
        rerun = {
            r["drop_id"]: (r["rep_id"], r["cluster"], r["cos_sim"])
            for r in QUERIES["dedup_semantic_resume_pq"](spark, sf).collect()
        }
        assert rerun == pq


def test_corpus_semantic_prepare_composition_pinned(spark):
    """Pin for the rows-only corpus_semantic_prepare composite: the
    per-source summary must equal the python-set composition of its two
    library stages run independently — text survivors from
    gate_documents, drop ids from semantic_dedup over the survivor-
    restricted vectors — and the arithmetic must be internally exact
    (n_final = n_text_survivors - n_semantic_dropped, every source)."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.corpus import gate_documents
    from n2kupdate_spark.operators.similarity import semantic_dedup
    from n2kupdate_spark.queries.mlprep import _DECONTAM_BUDGET, _DECONTAM_N
    from n2kupdate_spark.queries.text import _EVAL_PRED_SQL
    from n2kupdate_spark.sources import load

    got = {
        r["source"]: (r["n_text_survivors"], r["n_semantic_dropped"], r["n_final"])
        for r in QUERIES["corpus_semantic_prepare"](spark, SF).collect()
    }
    assert got and any(v[1] > 0 for v in got.values()), (
        "fixture must exercise the semantic stage (tau=0.3 near-dups exist)"
    )
    for src, (n_text, n_drop, n_final) in got.items():
        assert n_final == n_text - n_drop, (src, got[src])

    d = load(spark, SF, "documents", columns=["doc_id", "source", "text"])
    is_eval = F.expr(_EVAL_PRED_SQL)
    text_ok = gate_documents(
        d.filter(~is_eval), d.filter(is_eval).select("doc_id", "text"),
        decontam_n=_DECONTAM_N, decontam_budget=_DECONTAM_BUDGET,
    )
    alive = {(r["doc_id"], r["source"]) for r in text_ok.select("doc_id", "source").collect()}
    vecs = load(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).filter(F.col("vec_id").isin([i for i, _ in alive]))
    drops = {
        r["drop_id"]
        for r in semantic_dedup(vecs, "vec_id", "v", n_cells=16, tau=0.3).collect()
    }
    want = {}
    for src in {s for _, s in alive}:
        ids = {i for i, s in alive if s == src}
        nd = len(ids & drops)
        want[src] = (len(ids), nd, len(ids) - nd)
    assert got == want, {
        s: (got.get(s), want.get(s)) for s in set(got) | set(want)
        if got.get(s) != want.get(s)
    }


def test_semantic_dedup_empty_input_returns_empty(spark):
    """An upstream gate can legitimately empty a batch; semantic_dedup
    must return an EMPTY drop set with the schema intact (the centroid
    fit raises a clear error instead of numpy's stack crash)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.similarity import (
        fit_spherical_centroids,
        semantic_dedup,
    )
    from n2kupdate_spark.sources import load

    e = load(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).filter(F.lit(False))
    out = semantic_dedup(e, "vec_id", "v")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "drop_id", "rep_id", "cluster", "cos_sim"
    ]
    with _pytest.raises(ValueError, match="empty input"):
        fit_spherical_centroids(e, "vec_id", "v")


def test_semantic_index_persist_resume_pinned(spark, tmp_path):
    """Incremental semantic dedup: persist the base corpus's index
    (codebook + survivors), resume a disjoint higher-id batch against it,
    and pin the ENTIRE resume drop set against an independent numpy
    recomputation of the documented rule — drop a batch vector iff it
    has a persisted-kept neighbor at round(cos,4) ≥ tau or a lower-id
    batch neighbor; rep = the minimum qualifying id. Also pins the
    in-place roll-forward: version 2's kept set is exactly
    kept ∪ (batch − drops), the codebook is byte-identical, and an
    EMPTY batch resumes to zero drops."""
    import numpy as np
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.dedup import _load_index, index_versions
    from n2kupdate_spark.operators.similarity import (
        _SEM_INDEX_TABLES,
        persist_semantic_index,
        semantic_dedup_resume,
    )
    from n2kupdate_spark.sources import load

    tau = 0.3
    idx = str(tmp_path / "sem_index")
    e = load(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    base, batch = e.filter(F.col("vec_id") < 250), e.filter(F.col("vec_id") >= 250)

    v1 = persist_semantic_index(base, idx, n_cells=16, tau=tau)
    assert v1 == 1 and index_versions(spark, idx) == [1]

    drops = {
        r["drop_id"]: (r["rep_id"], r["cluster"], r["cos_sim"])
        for r in semantic_dedup_resume(
            batch, idx, tau=tau, update_index_path=idx
        ).collect()
    }
    assert drops, "fixture batch must collide with the base at tau=0.3"

    # independent numpy recomputation from the PERSISTED tables
    _, cent_df, kept_df = _load_index(spark, idx, 1, tables=_SEM_INDEX_TABLES)
    C = np.stack([
        np.asarray(r["v"]) for r in sorted(cent_df.collect(), key=lambda r: r["cell"])
    ])
    kept_rows = sorted(kept_df.collect(), key=lambda r: r["vec_id"])
    batch_rows = sorted(batch.collect(), key=lambda r: r["vec_id"])

    def unit(M):
        n = np.linalg.norm(M, axis=1)
        n[n == 0] = 1.0
        return M / n[:, None]

    KV = np.stack([np.asarray(r["v"], dtype=np.float64) for r in kept_rows])
    BV = np.stack([np.asarray(r["v"], dtype=np.float64) for r in batch_rows])
    k_ids = [r["vec_id"] for r in kept_rows]
    k_cl = [r["cluster"] for r in kept_rows]
    b_ids = [r["vec_id"] for r in batch_rows]
    b_cl = list(np.argmax(BV @ C.T, axis=1) + 1)  # best_cell: first-wins argmax
    UK, UB = unit(KV), unit(BV)
    S_bk = np.round(UB @ UK.T, 4) + 0.0
    S_bb = np.round(UB @ UB.T, 4) + 0.0
    want = {}
    for j, bj in enumerate(b_ids):
        cands = [
            (k_ids[i], S_bk[j, i])
            for i in range(len(k_ids))
            if k_cl[i] == b_cl[j] and S_bk[j, i] >= tau
        ] + [
            (b_ids[i], S_bb[i, j])
            for i in range(j)
            if b_cl[i] == b_cl[j] and S_bb[i, j] >= tau
        ]
        if cands:
            rep, cs = min(cands, key=lambda t: t[0])
            want[bj] = (rep, int(b_cl[j]), float(cs))
    assert set(drops) == set(want), (
        f"extra={set(drops) - set(want)}, missing={set(want) - set(drops)}"
    )
    for d in want:
        assert drops[d][0] == want[d][0] and drops[d][1] == want[d][1], (
            d, drops[d], want[d]
        )
        assert abs(drops[d][2] - want[d][2]) < 1e-9

    # roll-forward: v2 kept = v1 kept + surviving batch; codebook unchanged
    assert index_versions(spark, idx) == [1, 2]
    _, cent2, kept2 = _load_index(spark, idx, 2, tables=_SEM_INDEX_TABLES)
    got_kept2 = {r["vec_id"] for r in kept2.collect()}
    want_kept2 = set(k_ids) | (set(b_ids) - set(want))
    assert got_kept2 == want_kept2
    assert sorted(
        (r["cell"], tuple(r["v"])) for r in cent2.collect()
    ) == sorted((r["cell"], tuple(r["v"])) for r in cent_df.collect())

    # empty batch: no drops, clean roll to v3 with identical kept rows
    out = semantic_dedup_resume(
        batch.filter(F.lit(False)), idx, tau=tau, update_index_path=idx
    )
    assert out.count() == 0
    assert index_versions(spark, idx) == [1, 2, 3]
    _, _, kept3 = _load_index(spark, idx, 3, tables=_SEM_INDEX_TABLES)
    assert {r["vec_id"] for r in kept3.collect()} == want_kept2


def test_vacuum_index_retires_old_versions(spark, tmp_path):
    """vacuum_index keeps the newest N committed versions: older markers
    and their v<NNN> dirs (plus torn dirs below the floor) are deleted,
    the kept versions stay fully readable, and a dir ABOVE the newest
    committed version — a possibly in-progress publisher — is never
    touched."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.dedup import (
        _load_index,
        index_versions,
        vacuum_index,
    )
    from n2kupdate_spark.operators.similarity import (
        _SEM_INDEX_TABLES,
        persist_semantic_index,
        semantic_dedup_resume,
    )
    from n2kupdate_spark.sources import load

    idx = str(tmp_path / "idx")
    e = load(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    persist_semantic_index(e.filter(F.col("vec_id") < 200), idx, tau=0.3)
    semantic_dedup_resume(
        e.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 350)),
        idx, tau=0.3, update_index_path=idx,
    ).count()
    semantic_dedup_resume(
        e.filter(F.col("vec_id") >= 350), idx, tau=0.3, update_index_path=idx
    ).count()
    assert index_versions(spark, idx) == [1, 2, 3]
    # torn leftovers: below the future floor and above the newest commit
    (tmp_path / "idx" / "kept" / "v0000000000").mkdir(parents=True)
    (tmp_path / "idx" / "kept" / "v0000000009").mkdir(parents=True)

    stats = vacuum_index(spark, idx, keep_versions=1, tables=_SEM_INDEX_TABLES)
    assert stats["removed_versions"] == [1, 2]
    assert index_versions(spark, idx) == [3]
    _, cents, kept = _load_index(spark, idx, tables=_SEM_INDEX_TABLES)
    assert cents.count() == 16 and kept.count() > 0  # v3 fully readable
    assert not (tmp_path / "idx" / "kept" / "v0000000001").exists()
    assert not (tmp_path / "idx" / "kept" / "v0000000000").exists()  # torn swept
    assert (tmp_path / "idx" / "kept" / "v0000000009").exists()  # in-progress kept
    assert not (tmp_path / "idx" / "centroids" / "v0000000002").exists()


def test_embedding_drift_profile_pinned(spark):
    """Value pin for the rows-only diag_embedding_drift query: recompute
    the whole per-cell profile in numpy — both sides assigned into the
    base-fit codebook (raw-dot argmax, first-wins), per-cell counts,
    shares over each side's total, and mean cosine-to-assigned-centroid
    — and require exact agreement at the op's 4dp rounding."""
    import numpy as np
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.similarity import fit_spherical_centroids
    from n2kupdate_spark.sources import load

    got = {
        r["cell"]: (
            r["n_base"], r["n_new"], r["share_base"], r["share_new"],
            r["avg_cos_base"], r["avg_cos_new"],
        )
        for r in QUERIES["diag_embedding_drift"](spark, SF).collect()
    }
    assert got

    e = load(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    base = e.filter(F.col("vec_id") % 5 != 0)
    C = fit_spherical_centroids(base, "vec_id", "v", n_cells=16)
    rows = e.collect()
    want_cells: dict[int, dict] = {}
    tot = {True: 0, False: 0}
    acc: dict[tuple, list] = {}
    for r in rows:
        v = np.asarray(r["v"], dtype=np.float64)
        assert np.linalg.norm(v) > 0
        is_base = r["vec_id"] % 5 != 0
        s = v @ C.T
        cell = int(np.argmax(s)) + 1
        cos = float(s.max() / np.linalg.norm(v))
        tot[is_base] += 1
        acc.setdefault((cell, is_base), []).append(cos)
    for (cell, is_base), cs in acc.items():
        d = want_cells.setdefault(cell, {"nb": 0, "nn": 0, "cb": 0.0, "cn": 0.0})
        if is_base:
            d["nb"], d["cb"] = len(cs), sum(cs) / len(cs)
        else:
            d["nn"], d["cn"] = len(cs), sum(cs) / len(cs)
    want = {
        cell: (
            d["nb"], d["nn"],
            round(d["nb"] / tot[True], 4), round(d["nn"] / tot[False], 4),
            round(d["cb"], 4), round(d["cn"], 4),
        )
        for cell, d in want_cells.items()
    }
    assert set(got) == set(want)
    for cell in want:
        for gi, wi in zip(got[cell], want[cell]):
            assert abs(gi - wi) < 2e-4, (cell, got[cell], want[cell])


def test_semantic_resume_replayed_batch_matches_first_run(spark, tmp_path):
    """Self-pair guard (r9 advice, high): a REPLAYED batch — one whose
    survivors already rolled into the index's kept table because the
    consumer crashed between the index roll-forward and its own commit —
    must resume to the SAME drop set as the first run. Without the
    probe_id != base_id filter in semantic_dedup_resume every surviving
    batch vector pairs with itself in kept at cos=1.0 ≥ tau and the whole
    batch drops; with it, survivors' only same-id pairs are filtered as
    replay artifacts (batch and corpus ids are contractually disjoint, so
    a same-id cross pair can only be a replay) and keep-lowest guarantees
    no OTHER kept neighbor sits within tau. The re-roll stays
    content-idempotent (v3 kept ≡ v2 kept)."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.dedup import _load_index, index_versions
    from n2kupdate_spark.operators.similarity import (
        _SEM_INDEX_TABLES,
        persist_semantic_index,
        semantic_dedup_resume,
    )
    from n2kupdate_spark.sources import load

    tau = 0.3
    idx = str(tmp_path / "sem_index")
    e = load(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    base, batch = e.filter(F.col("vec_id") < 250), e.filter(F.col("vec_id") >= 250)

    persist_semantic_index(base, idx, n_cells=16, tau=tau)
    first = {
        r["drop_id"]: (r["rep_id"], r["cluster"], r["cos_sim"])
        for r in semantic_dedup_resume(
            batch, idx, tau=tau, update_index_path=idx
        ).collect()
    }
    assert first, "fixture batch must collide with the base at tau=0.3"
    n_batch = batch.count()
    assert len(first) < n_batch, "fixture batch must have survivors"
    _, _, kept2 = _load_index(spark, idx, 2, tables=_SEM_INDEX_TABLES)
    kept2_ids = {r["vec_id"] for r in kept2.collect()}

    # replay the FULL batch against the already-rolled index
    replay = {
        r["drop_id"]: (r["rep_id"], r["cluster"], r["cos_sim"])
        for r in semantic_dedup_resume(
            batch, idx, tau=tau, update_index_path=idx
        ).collect()
    }
    assert replay == first, (
        f"replay drops diverged: extra={set(replay) - set(first)}, "
        f"missing={set(first) - set(replay)}"
    )
    assert index_versions(spark, idx) == [1, 2, 3]
    _, _, kept3 = _load_index(spark, idx, 3, tables=_SEM_INDEX_TABLES)
    assert {r["vec_id"] for r in kept3.collect()} == kept2_ids


def test_jl_projection_pinned(spark, sf_dir):
    """embed_jl_project (rows-only, r11): (1) every projection equals the
    numpy recompute against the SAME seed-determined matrix (the op's
    whole premise: the matrix is a pure function of (dim, out_dim,
    seed), so an independent materialization must agree bit-for-bit
    before rounding); (2) the JL guarantee is MEASURED, not assumed —
    over all pairs among the first 40 vectors, squared-distance ratios
    ‖Rx−Ry‖²/‖x−y‖² center on 1 (mean within 10%) and stay inside a
    chi²₁₆/16 envelope; (3) deterministic across runs."""
    import numpy as np
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.similarity import jl_projection_matrix
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    vecs = {r.vec_id: np.asarray(r.v, dtype=np.float64) for r in e.collect()}
    dim = len(next(iter(vecs.values())))
    R = jl_projection_matrix(dim, out_dim=16, seed=17)

    got = {
        r.vec_id: np.asarray(r.jl) for r in QUERIES["embed_jl_project"](spark, sf_dir).collect()
    }
    assert set(got) == set(vecs)
    for i, v in vecs.items():
        want = np.round(v @ R.T, 4) + 0.0
        assert np.array_equal(got[i], want), i

    # measured distance preservation on the raw (unrounded) projection
    ids = sorted(vecs)[:40]
    ratios = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            x, y = vecs[ids[a]], vecs[ids[b]]
            d2 = float(((x - y) ** 2).sum())
            if d2 == 0.0:
                continue
            p2 = float((((x @ R.T) - (y @ R.T)) ** 2).sum())
            ratios.append(p2 / d2)
    ratios = np.asarray(ratios)
    assert abs(float(ratios.mean()) - 1.0) <= 0.10, float(ratios.mean())
    # chi²₁₆/16 support: P(<0.15)≈4e-6, P(>3)≈2e-4 per pair — on this
    # FIXED fixture+seed the observed range sits well inside
    assert float(ratios.min()) > 0.15 and float(ratios.max()) < 3.0, (
        float(ratios.min()), float(ratios.max()),
    )

    again = {
        r.vec_id: np.asarray(r.jl) for r in QUERIES["embed_jl_project"](spark, sf_dir).collect()
    }
    assert all(np.array_equal(again[i], got[i]) for i in got)


def test_mrl_recall_harness(spark):
    """r13: the Matryoshka truncation eval. Structural contracts on the
    registered query (full-dim row ≡ 1.0 by construction, recall
    monotone nondecreasing in prefix width, query count = the vec_id
    slice) + a PLANTED positive control: vectors whose information is
    front-loaded in the first 8 dims (tail = tiny id-derived noise)
    must score prefix-8 recall ≥ 0.9 — proving the harness measures
    front-loading rather than reading low on any input — while the
    registered fixture's random-ish embeddings stay the honest
    negative control (prefix-8 recall < 0.5)."""
    import numpy as np

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.queries.ann import embed_mrl_recall

    sf = "/root/testdata/sf0.001"
    rows = {
        r["prefix_dim"]: (r["recall_at_10"], r["n_queries"])
        for r in QUERIES["embed_mrl_recall"](spark, sf).collect()
    }
    dims = sorted(rows)
    assert rows[dims[-1]][0] == 1.0  # full dim is the exact baseline
    recalls = [rows[d][0] for d in dims]
    assert recalls == sorted(recalls)  # more prefix never hurts
    assert len({n for _, n in rows.values()}) == 1  # same query slice
    assert rows[8][0] < 0.5  # fixture = honest negative control

    # planted MRL-like corpus: 200 vectors, 64-dim, all signal in the
    # first 8 dims, deterministic tiny tail noise
    rng = np.random.RandomState(11)
    head = rng.randn(200, 8)
    tail = rng.randn(200, 56) * 1e-3
    vecs = np.hstack([head, tail])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    import pyspark.sql.functions as F  # noqa: F401

    import n2kupdate_spark.queries.ann as ann_mod
    import n2kupdate_spark.sources as sources_mod

    real_load = ann_mod.load
    try:
        ann_mod.load = lambda spark_, sf_, tbl, columns=None: df
        planted = {
            r["prefix_dim"]: r["recall_at_10"]
            for r in embed_mrl_recall(spark, sf).collect()
        }
    finally:
        ann_mod.load = real_load
    assert planted[8] >= 0.9, planted
    assert planted[64] == 1.0


def test_d4_diversify_matches_numpy_and_planted_structure(spark):
    """r13: D4 diversification — full (cell, 4dp proto, kept) table ≡ an
    independent numpy recompute from the SAME deterministic centroid fit
    (assignment argmax, cosine, per-cell (score desc, id) rank, ceil
    drop) on the fixture; plus a planted corpus — a tight clump + far
    outliers — where the clump CORE drops and every outlier survives;
    drop_frac=0 keeps everything; per-cell drop counts are exactly
    ceil(frac·n)."""
    import math
    from collections import defaultdict

    import numpy as np
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.similarity import (
        d4_diversify,
        fit_spherical_centroids,
    )
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    sf = "/root/testdata/sf0.001"
    vecs = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = fit_spherical_centroids(vecs, "vec_id", "v", n_cells=16, seed=11)
    rows = {r["vec_id"]: np.asarray(r["v"], dtype=np.float64) for r in vecs.collect()}
    want = {}
    per_cell = defaultdict(list)
    for vid in rows:
        s = cents @ rows[vid]
        cell = int(np.argmax(s)) + 1
        nrm = float(np.linalg.norm(rows[vid]))
        proto = round(float(s.max()) / nrm * 10000) / 10000 + 0.0 if nrm > 0 else 0.0
        want[vid] = (cell, proto)
        per_cell[cell].append((-proto, vid))
    kept_want = {}
    for cell, members in per_cell.items():
        members.sort()
        n_drop = math.ceil(0.25 * len(members))
        for rank, (_, vid) in enumerate(members, start=1):
            kept_want[vid] = rank > n_drop
    got = {
        r["vec_id"]: (r["cell"], r["proto_score"], r["kept"])
        for r in QUERIES["sample_d4_diverse"](spark, sf).collect()
    }
    assert set(got) == set(want)
    for vid in got:
        assert got[vid] == (want[vid][0], want[vid][1], kept_want[vid]), vid

    # planted structure: 40 near-identical clump vectors + 8 orthogonal-ish
    # outliers; one cell, drop_frac=0.25 → 12 drops, ALL from the clump
    rng = np.random.RandomState(5)
    base = rng.randn(8)
    clump = [base + rng.randn(8) * 0.01 for _ in range(40)]
    outliers = [rng.randn(8) * 3 for _ in range(8)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(clump + outliers)],
        "vec_id long, v array<double>",
    )
    out = {r["vec_id"]: r for r in d4_diversify(df, n_cells=1, drop_frac=0.25).collect()}
    dropped = {i for i, r in out.items() if not r["kept"]}
    assert len(dropped) == 12  # ceil(0.25 * 48)
    assert dropped <= set(range(40))  # every drop is a clump member
    assert all(out[i]["kept"] for i in range(40, 48))  # outliers survive

    # drop_frac = 0 keeps everything
    out0 = d4_diversify(df, n_cells=1, drop_frac=0.0).collect()
    assert all(r["kept"] for r in out0)


def test_semantic_tau_sweep_consistency_and_recompute(spark):
    """r13: the τ sweep table ≡ a python recompute from the collected
    pair list at two sfs; the row at τ = 0.3 equals the registered
    dedup_semantic_clusters drop count EXACTLY (same geometry, same
    keep-lowest rule); drops are monotone non-increasing in τ."""
    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.similarity import (
        best_cell,
        fit_spherical_centroids,
        pairwise_cosine_by_group,
    )
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.queries.ann import _TAU_GRID
    from n2kupdate_spark.sources import load

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        e = load(spark, sf, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        n = e.count()
        cents = fit_spherical_centroids(e, "vec_id", "v", n_cells=16, seed=11)
        assigned = e.withColumn("cell", best_cell("v", cents))
        pairs = pairwise_cosine_by_group(
            assigned, "cell", "vec_id", "v", tau=min(_TAU_GRID)
        ).collect()
        best = {}
        for p in pairs:
            best[p["id2"]] = max(best.get(p["id2"], -2.0), p["cos_sim"])
        want = {}
        for t in _TAU_GRID:
            nd = sum(1 for c in best.values() if c >= t)
            want[t] = (nd, round(nd / n * 10000) / 10000 + 0.0)
        got = {
            r["tau"]: (r["n_dropped"], r["drop_frac"])
            for r in QUERIES["diag_semantic_tau_sweep"](spark, sf).collect()
        }
        assert got == want, sf
        counts = [got[t][0] for t in sorted(got)]
        assert counts == sorted(counts, reverse=True)
        assert got[0.3][0] == QUERIES["dedup_semantic_clusters"](spark, sf).count()


def test_embed_outlier_knn_matches_numpy(spark):
    """r13: per-label kNN-distance outlier scores ≡ a numpy brute-force
    recompute at two sfs (k_eff fallback and the singleton-scores-1.0
    convention included); planted geometry: a tight clump plus one far
    vector — the far vector's score is strictly the group's highest and
    clump members' scores are near zero."""
    import numpy as np

    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    K = 3

    def ref(groups):
        out = {}
        for label, rows in groups.items():
            ids = [i for i, _v in rows]
            V = np.stack([np.asarray(v, dtype=np.float64) for _i, v in rows])
            n = np.linalg.norm(V, axis=1)
            n[n == 0] = 1.0
            V = V / n[:, None]
            S = np.round(V @ V.T * 10000) / 10000  # 4dp like the pair op
            for a in range(len(ids)):
                sims = sorted(
                    [(S[a, b], -ids[b]) for b in range(len(ids)) if b != a],
                    key=lambda t: (-t[0], -t[1]),
                )
                if not sims:
                    out[ids[a]] = (0, 1.0)
                    continue
                k_eff = min(K, len(sims))
                knn = sims[k_eff - 1][0]
                out[ids[a]] = (
                    len(sims),
                    round((1.0 - knn) * 10000) / 10000 + 0.0,
                )
        return out

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        groups = {}
        for r in load(spark, sf, "embeddings").collect():
            groups.setdefault(r["label"], []).append(
                (r["vec_id"], [float(x) for x in r["embedding"]])
            )
        want = ref(groups)
        got = {
            r["vec_id"]: (r["n_neighbors"], r["outlier_score"])
            for r in QUERIES["embed_outlier_knn"](spark, sf).collect()
        }
        assert got == want, sf

    # planted: clump of 6 near-identical vectors + 1 orthogonal outlier
    # in one label; a singleton label scores 1.0
    rng = np.random.RandomState(2)
    base = np.zeros(8)
    base[0] = 1.0
    rows = []
    for i in range(6):
        v = base + 0.01 * rng.randn(8)
        rows.append((i, 7, [float(x) for x in v]))
    out = np.zeros(8)
    out[7] = 1.0
    rows.append((99, 7, [float(x) for x in out]))
    rows.append((100, 8, [1.0] * 8))  # singleton label
    df = spark.createDataFrame(rows, "vec_id: long, label: int, embedding: array<double>")
    import n2kupdate_spark.queries.ann as annq

    orig = annq.load
    try:
        annq.load = lambda spark_, sf_, t, columns=None: df
        got = {
            r["vec_id"]: r
            for r in QUERIES["embed_outlier_knn"](spark, "ignored").collect()
        }
    finally:
        annq.load = orig
    clump_scores = [got[i]["outlier_score"] for i in range(6)]
    assert max(clump_scores) < 0.01
    assert got[99]["outlier_score"] > 0.9
    assert got[99]["outlier_score"] > max(clump_scores)
    assert got[100]["outlier_score"] == 1.0 and got[100]["n_neighbors"] == 0


def test_knn_within_group_generic_id_types(spark):
    """r14 (ADVICE): knn_within_group's output schema derives the
    id/nb type from the caller's id column instead of pinning long —
    a string-keyed corpus (doc urls, uuids) must score identically to
    the same geometry under long ids, including the nb-ascending tie
    order, and the emitted schema must carry the caller's type."""
    import numpy as np

    from n2kupdate_spark.operators.similarity import knn_within_group

    rng = np.random.RandomState(7)
    vecs = [[float(x) for x in rng.randn(6)] for _ in range(12)]
    long_rows = [(1, i, v) for i, v in enumerate(vecs)]
    str_rows = [("g", f"doc{i:02d}", v) for i, v in enumerate(vecs)]

    dl = spark.createDataFrame(
        long_rows, "label: int, vec_id: long, v: array<double>"
    )
    ds = spark.createDataFrame(
        str_rows, "label: string, vec_id: string, v: array<double>"
    )
    ol = knn_within_group(dl, "label", "vec_id", "v", k=3)
    os_ = knn_within_group(ds, "label", "vec_id", "v", k=3)
    assert dict(os_.dtypes)["id"] == "string" and dict(os_.dtypes)["nb"] == "string"
    assert dict(ol.dtypes)["id"] == "bigint" and dict(ol.dtypes)["nb"] == "bigint"
    got_l = {(r["id"], r["nb"]): r["cos_sim"] for r in ol.collect()}
    got_s = {
        (int(r["id"][3:]), int(r["nb"][3:])): r["cos_sim"] for r in os_.collect()
    }
    # doc00..doc11 sort like 0..11, so the nb-asc tie order is identical
    assert got_l == got_s and len(got_l) == 12 * 3


def test_zca_whitening_matches_numpy_and_decorrelates(spark, sf_dir):
    """r15: whitened vectors ≡ the numpy matmul against the op's own
    (μ, W) on every row; W is symmetric and PSD (the ZCA signature —
    no component reordering or sign freedom); on the FITTING sample the
    whitened covariance is ≈ I (diagonal → 1 within ε tolerance,
    off-diagonal → 0); anisotropy shrinks (max/min component variance
    ratio drops toward 1)."""
    import numpy as np

    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.similarity import fit_zca_whitening
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    mu, W = fit_zca_whitening(e, "vec_id", "v")
    assert np.allclose(W, W.T)
    lam = np.linalg.eigvalsh(W)
    assert (lam > 0).all()

    rows = QUERIES["embed_whitening"](spark, sf_dir).collect()
    raw = {r["vec_id"]: np.array(r["v"]) for r in e.collect()}
    for r in rows[:200]:
        want = np.round((raw[r["vec_id"]] - mu) @ W.T, 4) + 0.0
        assert np.array_equal(np.array(r["white"]), want), r["vec_id"]

    sample_ids = sorted(raw)[:512]
    S = np.stack([raw[i] for i in sample_ids])
    white = (S - mu) @ W.T
    C = np.cov(white, rowvar=False, bias=True)
    d = np.diag(C)
    assert np.abs(d - 1.0).max() < 0.05           # unit variances (ε slack)
    off = C - np.diag(d)
    assert np.abs(off).max() < 0.05               # decorrelated
    C0 = np.cov(S - mu, rowvar=False, bias=True)
    aniso_before = np.diag(C0).max() / np.diag(C0).min()
    aniso_after = d.max() / d.min()
    assert aniso_after < aniso_before or abs(aniso_before - 1) < 1e-6


def test_procrustes_align_recovers_rotation(spark, sf_dir):
    """r15: the fitted Procrustes map is orthogonal and ≈ the planted
    rotation's inverse (R̂ ≈ R_trueᵀ within the 1% noise); per-row
    cos_before/cos_after ≡ a numpy recompute from the same seeds; the
    alignment pushes every vector's cosine ≥ 0.98 from ~chance; a
    clean no-noise planted pair recovers the rotation to 1e-9."""
    import numpy as np

    from pyspark.sql import functions as F

    from n2kupdate_spark.operators.similarity import fit_procrustes_rotation
    from n2kupdate_spark.queries import QUERIES
    from n2kupdate_spark.sources import load

    rows = QUERIES["embed_procrustes_align"](spark, sf_dir).collect()
    assert all(r["cos_after"] >= 0.98 for r in rows)
    befores = np.array([r["cos_before"] for r in rows])
    assert abs(befores.mean()) < 0.2  # ~chance before alignment

    raw = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    dim = len(next(iter(raw.values())))
    rng = np.random.RandomState(29)
    q, r_ = np.linalg.qr(rng.normal(size=(dim, dim)))
    R_TRUE = q * np.sign(np.diag(r_))
    NOISE = np.random.RandomState(31).normal(size=(64, dim)) * 0.01
    ids = sorted(raw)
    A = np.stack([raw[i] for i in ids])
    B = A @ R_TRUE + NOISE[np.array(ids) % 64]
    anchors = ids[:256]
    Aa = np.stack([raw[i] for i in anchors])
    Ba = Aa @ R_TRUE + NOISE[np.array(anchors) % 64]
    u, _s, vt = np.linalg.svd(Ba.T @ Aa)
    R = u @ vt
    assert np.allclose(R @ R.T, np.eye(dim), atol=1e-9)
    assert np.abs(R - R_TRUE.T).max() < 0.05  # inverse rotation, noise slack
    AL = B @ R
    nrm = lambda M: np.linalg.norm(M, axis=1) + 1e-12  # noqa: E731
    want_cb = np.round((A * B).sum(1) / (nrm(A) * nrm(B)) * 10000) / 10000 + 0.0
    want_ca = np.round((A * AL).sum(1) / (nrm(A) * nrm(AL)) * 10000) / 10000 + 0.0
    got = {r["vec_id"]: (r["cos_before"], r["cos_after"]) for r in rows}
    for j, i in enumerate(ids):
        assert got[i] == (want_cb[j], want_ca[j]), i

    # exact recovery with no noise: R̂ equals R_trueᵀ to 1e-9
    rng2 = np.random.RandomState(3)
    A2 = rng2.normal(size=(64, 8))
    q2, r2 = np.linalg.qr(rng2.normal(size=(8, 8)))
    RT = q2 * np.sign(np.diag(r2))
    df_a = spark.createDataFrame(
        [(i, [float(x) for x in A2[i]]) for i in range(64)], "vec_id: long, v: array<double>"
    )
    df_b = spark.createDataFrame(
        [(i, [float(x) for x in (A2 @ RT)[i]]) for i in range(64)],
        "vec_id: long, v: array<double>",
    )
    R2 = fit_procrustes_rotation(df_a, df_b, "vec_id", seed_sample=64)
    assert np.abs(R2 - RT.T).max() < 1e-9
