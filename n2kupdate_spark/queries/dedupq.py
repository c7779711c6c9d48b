"""Part C — fuzzy dedup queries over ``documents`` / ``embeddings``.

``dedup_ngram_jaccard`` is exact and SQL-mirrored (the correctness anchor);
MinHash-LSH and SimHash are the scale paths (probabilistic candidate
generation → rows-only checks, SURVEY.md §2 legend).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from n2kupdate_spark.operators.dedup import (
    dedup_lines_global,
    minhash_dedup_pairs,
    shingle_jaccard_pairs,
    simhash_near_pairs,
    simhash_signature,
    word_shingles,
)
from n2kupdate_spark.queries._registry import register
from n2kupdate_spark.sources import load


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w) - 1)]) AS shingles
        FROM toks WHERE len(w) >= 3
    ),
    inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    cand AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter
        FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id1, id2,
           ROUND(inter / (len(s1.shingles) + len(s2.shingles) - inter), 4) AS jaccard
    FROM cand
    JOIN sh s1 ON s1.doc_id = id1
    JOIN sh s2 ON s2.doc_id = id2
    WHERE ROUND(inter / (len(s1.shingles) + len(s2.shingles) - inter), 4) >= 0.1
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (≥ 0.1) via an inverted
    shingle index — candidate pairs share ≥1 shingle, so the join cost
    follows shingle collisions, never n². Pair generation happens inside
    per-shingle buckets (operators/dedup.py::shingle_jaccard_pairs), not by
    self-joining the exploded index."""
    # hashed shingles: the pair generator only buckets and counts grams,
    # so the long-hash form skips building every gram string (r16)
    sh = word_shingles(
        load(spark, sf_dir, "documents").select("doc_id", "text"), hashed=True
    )
    return shingle_jaccard_pairs(sh, "doc_id", threshold=0.1)


@register(
    "dedup_ngram_containment",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w) - 1)]) AS shingles
        FROM toks WHERE len(w) >= 3
    ),
    inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    cand AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter
        FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id1, id2,
           ROUND(inter / LEAST(len(s1.shingles), len(s2.shingles)), 4)
             AS containment
    FROM cand
    JOIN sh s1 ON s1.doc_id = id1
    JOIN sh s2 ON s2.doc_id = id2
    WHERE ROUND(inter / LEAST(len(s1.shingles), len(s2.shingles)), 4) >= 0.2
    """,
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup pairs by word-3-gram CONTAINMENT
    (inter / min set size, ≥ 0.2) — catches a document EMBEDDED in a
    larger one (wrapped reposts, eval-slices inside training docs),
    which Jaccard structurally misses (a fully-contained small doc scores
    containment 1.0 but Jaccard ~|A|/|B|). Same inverted-index plan as
    ``dedup_ngram_jaccard``: cost follows shingle collisions, never n²."""
    sh = word_shingles(
        load(spark, sf_dir, "documents").select("doc_id", "text"), hashed=True
    )
    from n2kupdate_spark.operators.dedup import shingle_containment_pairs

    return shingle_containment_pairs(sh, "doc_id", threshold=0.2)


@register("dedup_text_fuzzy")  # rows-only: LSH banding is engine-specific
def dedup_text_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (Jaccard ≥ 0.5 after exact verification).
    shingle → 32-min-hash signature → 16×2 bands → bucket join → verify."""
    return minhash_dedup_pairs(
        load(spark, sf_dir, "documents").select("doc_id", "text"), threshold=0.5
    )


@register("dedup_simhash")  # rows-only: signature bit-layout is engine-specific
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit signatures, 8×8-bit band blocking,
    exact hamming ≤ 3 filter (blocking guarantees recall up to hamming 7)."""
    sig = simhash_signature(
        load(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    return simhash_near_pairs(sig, "doc_id", max_hamming=3)


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
        SELECT a.vec_id AS keep_id, b.vec_id AS drop_id,
               ROUND(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(a.v, b.v), 4) >= 0.3
    )
    SELECT drop_id, MIN(keep_id) AS rep_id
    FROM pairs GROUP BY drop_id
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup removal: within each label, a vector with a
    lower-id neighbor at cosine ≥ 0.3 is dropped in favor of that (minimum)
    representative — the canonical-representative rule of corpus dedup.
    Pair scoring is the blocked-matmul group scorer (see
    sim_pairs_threshold), not a per-pair HOF fold."""
    from n2kupdate_spark.operators.similarity import pairwise_cosine_by_group

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    pairs = pairwise_cosine_by_group(e, "label", "vec_id", "v", tau=0.3)
    return pairs.groupBy(F.col("id2").alias("drop_id")).agg(
        F.min("id1").alias("rep_id")
    )


@register(
    "dedup_cc_clusters",
    oracle="""
    WITH RECURSIVE
    toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w) - 1)]) AS shingles
        FROM toks WHERE len(w) >= 3
    ),
    inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    cand AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter
        FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT id1, id2 FROM cand
        JOIN sh s1 ON s1.doc_id = id1 JOIN sh s2 ON s2.doc_id = id2
        WHERE ROUND(inter / (len(s1.shingles) + len(s2.shingles) - inter), 4) >= 0.1
    ),
    sym AS (SELECT id1 AS a, id2 AS b FROM edges
            UNION SELECT id2, id1 FROM edges),
    reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
    )
    SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
    """,
)
def dedup_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the near-dup
    pair graph (word-3-gram Jaccard ≥ 0.1). Every document gets the minimum
    doc_id reachable through near-dup edges as its cluster id — the
    transitive-closure step that turns pairwise dedup verdicts into
    keep-one-per-cluster decisions. Routed through the degree-probing
    dispatcher (operators/dedup.py::connected_components_auto): near-dup
    graphs are usually shallow and uniform (plain propagation), but a
    boilerplate-heavy corpus can grow a power-law hub that serializes the
    propagation join — the dispatcher measures the hub degree on the
    checkpointed edge list and salts only when it pays (BASELINE.md §5).
    Both branches reach the same fixpoint (property-tested vs union-find),
    so the recursive-CTE oracle applies unchanged."""
    from n2kupdate_spark.operators.dedup import connected_components_auto

    nodes = load(spark, sf_dir, "documents").select("doc_id")
    edges = dedup_ngram_jaccard(spark, sf_dir).select("id1", "id2")
    return connected_components_auto(nodes, edges, id_col="doc_id")


@register(
    "corpus_clean_pipeline",
    oracle="""
    WITH RECURSIVE
    q AS (SELECT doc_id, text, lang, source, n_chars FROM documents
          WHERE n_chars >= 100),
    hashed AS (SELECT *, md5(text) AS h FROM q),
    exact AS (
        SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY h
                                                    ORDER BY doc_id) AS rn
                       FROM hashed) WHERE rn = 1
    ),
    toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM exact),
    sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w) - 1)]) AS shingles
        FROM toks WHERE len(w) >= 3
    ),
    inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    cand AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter
        FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT id1, id2 FROM cand
        JOIN sh s1 ON s1.doc_id = id1 JOIN sh s2 ON s2.doc_id = id2
        WHERE ROUND(inter / (len(s1.shingles) + len(s2.shingles) - inter), 4) >= 0.2
    ),
    sym AS (SELECT id1 AS a, id2 AS b FROM edges UNION SELECT id2, id1 FROM edges),
    reach(src, dst) AS (
        SELECT doc_id, doc_id FROM exact
        UNION
        SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
    ),
    clusters AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
                 FROM reach GROUP BY src),
    kept AS (
        SELECT e.* FROM exact e JOIN clusters c ON e.doc_id = c.doc_id
        WHERE c.doc_id = c.cluster_id
    )
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM kept GROUP BY lang, source
    """,
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus cleaning — the composite every LLM data
    pipeline runs, chaining four §2 operators in one job:

      1. quality gate (n_chars ≥ 100; cheap map, runs first so every later
         stage sees fewer rows),
      2. exact dedup (md5(text) fingerprint, keep lowest doc_id),
      3. near-dup clustering (word-3-gram Jaccard ≥ 0.2 pairs via the
         inverted shingle index → connected components → keep each
         cluster's representative = its minimum doc_id),
      4. survivor summary per (lang, source).

    Scale: stages 1-2 are map + one fingerprint-keyed shuffle; stage 3's
    cost follows shingle collisions (never n²) and the CC loop's edge list
    is checkpointed once. The keep-decision join is on doc_id — the same
    key the cluster labels already carry."""
    from n2kupdate_spark.operators.dedup import (
    dedup_lines_global,
        connected_components,
        shingle_jaccard_pairs,
        word_shingles,
    )

    docs = load(
        spark, sf_dir, "documents",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).filter(F.col("n_chars") >= 100)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        # three consumers (shingle pipeline, CC vertex set, keep-join) —
        # materialize the scan+fingerprint window once
        .localCheckpoint(eager=True)
    )
    sh = word_shingles(exact.select("doc_id", "text"), hashed=True)
    edges = shingle_jaccard_pairs(sh, "doc_id", threshold=0.2).select("id1", "id2")
    clusters = connected_components(
        exact.select("doc_id"), edges, id_col="doc_id"
    )
    reps = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    kept = exact.join(reps, "doc_id")
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "dedup_cc_pointer_jump",
    oracle="""
    WITH RECURSIVE
    toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w) - 1)]) AS shingles
        FROM toks WHERE len(w) >= 3
    ),
    inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    cand AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter
        FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT id1, id2 FROM cand
        JOIN sh s1 ON s1.doc_id = id1 JOIN sh s2 ON s2.doc_id = id2
        WHERE ROUND(inter / (len(s1.shingles) + len(s2.shingles) - inter), 4) >= 0.1
    ),
    sym AS (SELECT id1 AS a, id2 AS b FROM edges
            UNION SELECT id2, id1 FROM edges),
    reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
    )
    SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
    """,
)
def dedup_cc_pointer_jump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same duplicate-cluster assignment as ``dedup_cc_clusters`` (identical
    oracle, identical fixpoint), computed with pointer jumping — O(log
    diameter) rounds instead of O(diameter). This is the variant a
    1000-executor cluster should run on web-scale near-dup graphs; keeping
    both registered proves the scale path is correctness-equal, not an
    approximation."""
    from n2kupdate_spark.operators.dedup import connected_components_pointer_jump

    nodes = load(spark, sf_dir, "documents").select("doc_id")
    edges = dedup_ngram_jaccard(spark, sf_dir).select("id1", "id2")
    return connected_components_pointer_jump(nodes, edges, id_col="doc_id")


@register(
    "dedup_jaccard_stop_shingles",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w) - 1)]) AS shingles
        FROM toks WHERE len(w) >= 3
    ),
    inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    freq AS (SELECT s, COUNT(*) AS df FROM inv GROUP BY s),
    keep AS (SELECT i.doc_id, i.s FROM inv i JOIN freq ON i.s = freq.s
             WHERE freq.df <= 5),
    n AS (SELECT doc_id, COUNT(*) AS n FROM keep GROUP BY doc_id),
    cand AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter
        FROM keep a JOIN keep b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id1, id2,
           ROUND(inter / (n1.n + n2.n - inter), 4) AS jaccard
    FROM cand
    JOIN n n1 ON n1.doc_id = id1
    JOIN n n2 ON n2.doc_id = id2
    WHERE ROUND(inter / (n1.n + n2.n - inter), 4) >= 0.1
    """,
)
def dedup_jaccard_stop_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with stop-shingle suppression: shingles in more than 5
    documents are dropped before pair generation, bounding every posting
    list — the skew defense that keeps shingle-index dedup linear on real
    corpora, where boilerplate shingles otherwise generate quadratic pair
    blow-ups in a handful of hot buckets. Jaccard is exact over the capped
    sets (sizes recounted post-filter), so the op stays hash-matched rather
    than becoming an approximation."""
    from n2kupdate_spark.operators.dedup import shingle_jaccard_pairs_capped

    sh = word_shingles(load(spark, sf_dir, "documents").select("doc_id", "text"))
    return shingle_jaccard_pairs_capped(sh, "doc_id", threshold=0.1, max_df=5)


@register(
    "dedup_incremental_jaccard",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w) - 1)]) AS shingles
        FROM toks WHERE len(w) >= 3
    ),
    inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    freq AS (SELECT s, COUNT(*) AS df FROM inv GROUP BY s),
    keep AS (SELECT i.doc_id, i.s FROM inv i JOIN freq ON i.s = freq.s
             WHERE freq.df <= 5),
    n AS (SELECT doc_id, COUNT(*) AS n FROM keep GROUP BY doc_id),
    cand AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter
        FROM keep a JOIN keep b ON a.s = b.s AND a.doc_id < b.doc_id
        WHERE a.doc_id % 10 = 0 OR b.doc_id % 10 = 0
        GROUP BY 1, 2
    )
    SELECT id1, id2,
           ROUND(inter / (n1.n + n2.n - inter), 4) AS jaccard
    FROM cand
    JOIN n n1 ON n1.doc_id = id1
    JOIN n n2 ON n2.doc_id = id2
    WHERE ROUND(inter / (n1.n + n2.n - inter), 4) >= 0.1
    """,
)
def dedup_incremental_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup detection — the recurring-ingest shape: docs with
    doc_id % 10 == 0 play the incoming batch (~10% of the corpus) and only
    pairs touching a batch doc are generated; corpus-corpus pairs are never
    scored. df cap and set sizes stay computed over the full universe, so
    every emitted Jaccard equals the full run's value (property-tested
    equal to dedup_jaccard_stop_shingles filtered the same way). For a
    batch that is p of the corpus, pair work falls ~(1-p)² — the reason an
    ingest pipeline reruns THIS, not the full op, every increment.

    The ``doc_id % 10`` predicate is this harness's stand-in for "arrived
    in the current batch" — the operator underneath
    (``operators.dedup.shingle_jaccard_pairs_capped_incremental``) takes
    ANY boolean ``is_new_col``; feed it your ingest flag, not the modulo.
    For recurring jobs, pair it with ``persist_shingle_index`` /
    ``shingle_jaccard_pairs_capped_resume`` (see
    ``dedup_incremental_resume``) so the corpus is never re-shingled."""
    from n2kupdate_spark.operators.dedup import (
    dedup_lines_global,
        shingle_jaccard_pairs_capped_incremental,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("doc_id") % 10 == 0).alias("is_new")
    )
    sh = word_shingles(docs, "text")
    return shingle_jaccard_pairs_capped_incremental(
        sh, "is_new", "doc_id", threshold=0.1, max_df=5
    )


#: One persisted-index location per sf_dir, replaced when the fixture's
#: freshness token changes (same shape ADVICE r6 prescribes for the tfidf
#: cache — no unbounded (sf_dir, token) key growth).
_resume_index_cache: dict[str, tuple] = {}


@register(
    "dedup_incremental_resume",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w) - 1)]) AS shingles
        FROM toks WHERE len(w) >= 3
    ),
    inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    freq AS (SELECT s, COUNT(*) AS df FROM inv GROUP BY s),
    keep AS (SELECT i.doc_id, i.s FROM inv i JOIN freq ON i.s = freq.s
             WHERE freq.df <= 5),
    n AS (SELECT doc_id, COUNT(*) AS n FROM keep GROUP BY doc_id),
    cand AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter
        FROM keep a JOIN keep b ON a.s = b.s AND a.doc_id < b.doc_id
        WHERE a.doc_id % 10 = 0 OR b.doc_id % 10 = 0
        GROUP BY 1, 2
    )
    SELECT id1, id2,
           ROUND(inter / (n1.n + n2.n - inter), 4) AS jaccard
    FROM cand
    JOIN n n1 ON n1.doc_id = id1
    JOIN n n2 ON n2.doc_id = id2
    WHERE ROUND(inter / (n1.n + n2.n - inter), 4) >= 0.1
    """,
)
def dedup_incremental_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recurring ingest with a PERSISTED corpus index: the corpus side's
    df-capped shingle index is built once per fixture generation (cached to
    /tmp, keyed by a data-freshness token) and every run shingles only the
    batch (doc_id % 10 == 0 here) and resumes from it — the scale shape the
    one-shot ``dedup_incremental_jaccard`` documents: at 100 TB the corpus
    is never re-shingled per increment. The same oracle applies because the
    resume path is numerically identical to the full incremental run
    (property-tested, tests/test_block_pairs.py; sf0.1 probe: resume is
    0.33x the one-shot incremental wall at a 5% batch)."""
    import hashlib
    import os

    from n2kupdate_spark.operators.dedup import (
    dedup_lines_global,
        index_versions,
        persist_shingle_index,
        shingle_jaccard_pairs_capped_resume,
    )
    from n2kupdate_spark.queries.text import _corpus_freshness

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("doc_id") % 10 == 0).alias("is_new")
    )
    token = _corpus_freshness(sf_dir)
    uid = getattr(os, "getuid", lambda: "u")()
    path = (
        f"/tmp/n2k_shingle_index_{uid}_"
        f"{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}"
    )
    cached = _resume_index_cache.get(sf_dir)
    # committed-version check, not isdir: a torn publish or a pre-r8
    # flat-layout leftover has table dirs but no root marker
    if cached != (token, path) or not index_versions(spark, path):
        persist_shingle_index(
            word_shingles(docs.filter(~F.col("is_new")), "text"),
            path,
            "doc_id",
            max_df=5,
        )
        _resume_index_cache[sf_dir] = (token, path)
    return shingle_jaccard_pairs_capped_resume(
        word_shingles(docs.filter("is_new"), "text"), path, "doc_id", 0.1, 5
    )


@register("dedup_minhash_est_eval")  # rows-only: evaluates the engine's own sketch
def dedup_minhash_est_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash accuracy harness (companion to sim_ann_recall_eval): over the
    LSH candidate pairs, compare the signature-estimated Jaccard (matching
    fraction of the K minhash components) against the exact shingle-set
    Jaccard, reporting pair count, mean/max absolute error, and the two
    means. This is what makes the K=32 signature width an engineering
    choice instead of a guess — expected |err| ~ 1/sqrt(K) ≈ 0.18 worst
    case, much tighter near 0/1. All inputs deterministic (fixed hash
    params); the comparison join is candidate-sized."""
    from n2kupdate_spark.operators.dedup import (
    dedup_lines_global,
        exact_jaccard,
        lsh_candidate_pairs,
        minhash_signature,
        word_shingles,
    )

    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    sh = word_shingles(docs, "text").localCheckpoint(eager=True)
    sig = minhash_signature(sh)
    cands = lsh_candidate_pairs(sig, "doc_id")

    s1 = sig.select(F.col("doc_id").alias("id1"), F.col("sig").alias("sig1"))
    s2 = sig.select(F.col("doc_id").alias("id2"), F.col("sig").alias("sig2"))
    match_frac = (
        F.size(
            F.filter(
                F.zip_with("sig1", "sig2", lambda a, b: a == b), lambda x: x
            )
        ).cast("double")
        / F.size("sig1")
    )
    est = (
        cands.join(s1, "id1")
        .join(s2, "id2")
        .select("id1", "id2", F.round(match_frac, 4).alias("est_jaccard"))
    )
    exact = exact_jaccard(cands, sh, "doc_id")
    both = est.join(exact, ["id1", "id2"])
    err = F.abs(F.col("est_jaccard") - F.col("jaccard"))
    return both.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg(err), 4).alias("mean_abs_err"),
        F.round(F.max(err), 4).alias("max_abs_err"),
        F.round(F.avg("est_jaccard"), 4).alias("mean_est"),
        F.round(F.avg("jaccard"), 4).alias("mean_exact"),
    )


@register("dedup_substring_spans")  # rows-only (r9 capacity policy): the
# full span list is pinned against a python recompute from raw text in
# tests/test_dedup_spans.py
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup report (the windowed suffix-array-dedup
    form, arXiv:2107.06499): per document, the merged spans of tokens
    covered by 8-token windows that repeat ≥2 times anywhere in the
    corpus (intra-doc repeats included) — summarized as span count,
    duplicated-token count and duplicated fraction (4dp, scale-first
    rounding). Only docs with ≥1 duplicated span appear. The cut-list
    writer consumes the underlying operator's (start, end) rows
    directly; see operators/dedup.py::duplicate_spans for the
    inverted-index + per-doc-window scale shape (shuffles: one 8-byte
    gram-hash count, one duplication-sized equi-join, one per-doc
    window)."""
    from n2kupdate_spark.operators.dedup import duplicate_spans

    d = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    spans = duplicate_spans(d, k=8, min_count=2)
    return (
        spans.groupBy("doc_id", "n_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("end") - F.col("start")).cast("long").alias("dup_tokens"),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("dup_tokens") / F.col("n_tokens") * 10000, 0) / 10000,
        )
    )


@register("dedup_substring_trim")  # rows-only (r9 capacity policy): the
# rewritten text is pinned token-exact against a python recompute in
# tests/test_dedup_spans.py
def dedup_substring_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal half of exact-substring dedup composed end to end:
    detect duplicated 8-token spans corpus-wide (duplicate_spans), cut
    them out of every doc (remove_spans — JVM higher-order filter, no
    python), and report per source: docs, docs trimmed, tokens before /
    after, and the corpus shrink fraction (4dp). The rewritten texts
    themselves are what a production caller writes back; the summary
    keeps the demo row count #sources-bounded."""
    from n2kupdate_spark.operators.dedup import duplicate_spans, remove_spans

    d = load(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    spans = duplicate_spans(d.select("doc_id", "text"), k=8, min_count=2)
    trimmed = remove_spans(d, spans)
    return trimmed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("n_tokens_after") < F.col("n_tokens_before")).alias(
            "n_trimmed"
        ),
        F.sum("n_tokens_before").cast("long").alias("tokens_before"),
        F.sum("n_tokens_after").cast("long").alias("tokens_after"),
        (
            F.round(
                (1 - F.sum("n_tokens_after") / F.sum("n_tokens_before")) * 10000, 0
            )
            / 10000
        ).alias("shrink_frac"),
    )


@register("graph_pagerank")  # rows-only (§2 legend: iterative algorithm —
# fixed-count power iteration has no SQL form; numpy-pinned in
# tests/test_graph.py)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the near-dup graph (r11): rank every
    document by its connectivity in the word-3-gram Jaccard ≥ 0.1 pair
    graph — the principled representative-selection signal (a cluster's
    highest-ranked member is its most-canonical doc, vs the arbitrary
    keep-lowest-id rule), and the same operator ranks domain/link graphs
    for crawl-quality weighting.

    Scale: per iteration one edge join + one sum-agg (the CC propagation
    plan shape), lineage truncated by localCheckpoint so 10 iterations
    never deepen the plan — ONE action per iteration since r12: the
    dangling (isolated-node) mass advances as a driver-side closed
    recurrence, no per-round aggregate (and never a 1-row join → no
    BNLJ). Deterministic: fixed iteration count, 4dp scale-first
    rounding at the end only. Pinned vs an independent numpy power
    iteration (same damping/iters) in tests/test_graph.py."""
    from n2kupdate_spark.operators.dedup import pagerank

    nodes = load(spark, sf_dir, "documents").select("doc_id")
    edges = dedup_ngram_jaccard(spark, sf_dir).select("id1", "id2")
    return pagerank(nodes, edges, id_col="doc_id", damping=0.85, iters=10)


@register("graph_domain_pagerank")  # rows-only (§2 legend: iterative
# algorithm — no SQL form); hub-vs-leaf ordering, mass conservation and
# planted-graph structure pinned in tests/test_graph.py
def graph_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-axis curation, step 4 (r12): PageRank over the HOST
    co-duplication graph — hosts are linked when they share a near-dup
    document pair (word-3-gram Jaccard ≥ 0.1), so a high-ranked host is
    one whose content is heavily mirrored across the crawl: exactly the
    boilerplate/SEO-farm signal a curation pipeline downweights, the
    domain-granular complement of doc-level graph_pagerank and of
    curation_domain_quality's content scores.

    Scale: the doc-level pair list is the bounded near-dup output; each
    endpoint maps to its host via the derived pseudo-URL (one id-keyed
    join per endpoint against the (doc_id, host) projection — the pair
    side is tiny next to the corpus, and the host map is a map-side
    derivation of the scan, so both joins shuffle only pair rows);
    self-loops drop, host pairs dedupe, and the fixed-iteration
    pagerank runs over #hosts nodes — graph size bounded by the host
    universe, not the corpus."""
    from n2kupdate_spark.operators.dedup import host_pagerank
    from n2kupdate_spark.queries.mlprep import _HOST_RE, _pseudo_url

    hosts = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_extract(_pseudo_url(), _HOST_RE, 1).alias("host"),
        )
    )
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("id1", "id2")
    return host_pagerank(hosts, pairs).orderBy("host")


@register("graph_triangle_count")  # rows-only (§2 legend: the degree-
# ordered wedge plan is join-expressible but the pin target is a python
# brute-force triangle enumeration — tests/test_graph.py)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient over the
    near-dup graph (word-3-gram Jaccard ≥ 0.1 pairs) — the transitivity
    view of the duplication structure pagerank ranks and CC partitions:
    a high-clustering node sits in a mirror-farm clique (all its
    neighbors also duplicate each other); a zero-clustering hub is
    template reuse radiating from one canonical source. Per node:
    degree, triangle count, clustering 2T/(deg·(deg−1)) 4dp.

    Scale: degree-ordered orientation bounds the wedge join at O(m^1.5)
    regardless of degree skew — see
    operators/dedup.py::triangle_counts."""
    from n2kupdate_spark.operators.dedup import triangle_counts

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("id1", "id2")
    return triangle_counts(pairs).withColumnRenamed("id", "doc_id")


@register("graph_k_core")  # rows-only (§2 legend: iterative, no SQL
# form); ≡ an independent python peel-by-rounds reference + dual-path
# equality — tests/test_graph.py
def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coreness per document over the near-dup graph (word-3-gram
    Jaccard ≥ 0.1 pairs) — the density axis next to triangle
    clustering and LPA communities: a high-core nucleus is the actual
    mirror farm, the 1-core fringe is incidental similarity, isolated
    docs read 0. Scale: iterated h-index with a histogram-based
    H computation (never a per-node neighbor array — hub-safe) +
    the ≤100k-edge Batagelj–Žaversnik driver escape — see
    operators/dedup.py::k_core_decomposition."""
    from n2kupdate_spark.operators.dedup import k_core_decomposition

    d = load(spark, sf_dir, "documents", columns=["doc_id"])
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("id1", "id2")
    return k_core_decomposition(d, pairs, id_col="doc_id")


@register("graph_bfs_distance")  # rows-only (§2 legend: iterative, no
# SQL form); ≡ an independent python BFS reference + dual-path
# equality — tests/test_graph.py
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance from a seed set through the near-dup graph
    (word-3-gram Jaccard ≥ 0.1 pairs) — contamination spread: seeds
    are every 50th doc (a stand-in for a flagged benchmark/spam list);
    hop 1 docs are direct near-dups of a seed, hop 2 near-dups of
    those, NULL means no duplication path to any seed. Scale:
    frontier-bounded level-synchronous BFS (the distance table only
    ever holds REACHED nodes) + the ≤100k-edge deque-BFS driver
    escape — see operators/dedup.py::bfs_distances."""
    from n2kupdate_spark.operators.dedup import bfs_distances

    d = load(spark, sf_dir, "documents", columns=["doc_id"])
    seeds = d.filter(F.col("doc_id") % 50 == 0)
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("id1", "id2")
    return bfs_distances(d, pairs, seeds, id_col="doc_id")


#: Constant boilerplate line planted on every 5th doc — after global
#: line dedup it must survive in exactly ONE document corpus-wide.
_BOILER_LINE = "subscribe to the newsletter for weekly updates"


def _pseudo_lines() -> "F.Column":
    """A line-structured payload per document (the payload-fixture
    pattern, line edition — the fixture text is single-space separated,
    so line structure is derived): the doc's tokens split into three
    lines of ~equal length; every 3rd doc's FIRST line replaced by a
    block shared across its doc_id-div-9 group (~3 docs share each —
    planted cross-doc duplicates); every 5th doc additionally carries
    the constant boilerplate footer line. All deterministic, both
    reproducible in the python reference pin."""
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    n = F.size(toks)
    third = F.greatest(F.lit(1), F.expr("size(filter(split(text, ' '), t -> t != '')) div 3"))
    l1 = F.array_join(F.slice(toks, F.lit(1), third), " ")
    l2 = F.array_join(F.slice(toks, third + 1, third), " ")
    l3 = F.array_join(F.slice(toks, third * 2 + 1, n - third * 2), " ")
    shared = F.concat(
        F.lit("shared intro block "),
        F.expr("doc_id div 9").cast("string"),
    )
    line1 = F.when(F.col("doc_id") % 3 == 0, shared).otherwise(l1)
    base = F.concat_ws("\n", line1, l2, l3)
    return F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(base, F.lit("\n"), F.lit(_BOILER_LINE)),
    ).otherwise(base)


@register("dedup_lines_c4")  # rows-only (r9 capacity policy, headroom
# preserved): full output ≡ an independent python recompute at two sfs
# + planted-duplicate survival counts in tests/test_mlprep_props.py
def dedup_lines_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style GLOBAL line dedup over the line-structured pseudo-corpus
    (Raffel et al. 2020 §2.2's "remove all but one of any span occurring
    more than once", at line granularity — the C4/FineWeb boilerplate
    killer that doc-level and fuzzy dedup both miss: a footer repeated
    across a million pages survives every whole-doc fingerprint).
    Keep-first is content-addressed ((doc_id, position) order), so
    re-runs keep the same copy. The fixture plants both duplicate
    classes (a constant footer on every 5th doc, a shared intro across
    each div-9 group of every 3rd doc) so the dedup is demonstrably
    selective. Emits (doc_id, text rebuilt, n_lines, n_kept,
    removed_frac).

    Scale: one posexplode map + ONE fingerprint-keyed window + one
    id-keyed reassembly — see operators/dedup.py::dedup_lines_global."""
    d = load(spark, sf_dir, "documents", columns=["doc_id", "text"]).select(
        "doc_id", _pseudo_lines().alias("text")
    )
    return dedup_lines_global(d)


@register("graph_label_propagation")  # rows-only (§2 legend: iterative
# algorithm, no SQL form); ≡ an independent python synchronous LPA in
# tests/test_graph.py
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the near-dup graph by deterministic
    synchronous label propagation (Raghavan 2007) — the granularity
    between dedup_cc_clusters (reachability fuses bridge-joined mirror
    farms) and raw pairs: densely-connected duplicate communities, per
    doc. Labels start as doc ids; 5 synchronous rounds, smallest-label
    tie-break, isolated docs keep their own id.

    Scale: per iteration one edge join + one partial-agged count + one
    struct-max argmax, lineage checkpointed flat — see
    operators/dedup.py::label_propagation."""
    from n2kupdate_spark.operators.dedup import label_propagation

    nodes = load(spark, sf_dir, "documents").select("doc_id")
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("id1", "id2")
    return label_propagation(nodes, pairs, id_col="doc_id")


@register("graph_modularity_score")  # rows-only (r9 capacity policy): ≡
# python dict-based Newman Q recompute + planted two-community pins —
# tests/test_graph.py
def graph_modularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the label-propagation communities over the
    near-dup graph — the ACCEPTANCE GATE for community structure
    (operators/dedup.py::modularity_score): Q ≈ 0 says the partition is
    no better than a degree-preserving random graph, so downstream
    per-community dedup/curation decisions would be noise; a clearly
    positive Q is what licenses them. Per community: node count,
    intra-edge count, degree sum, q contribution; the partition total
    rides under community = NULL (the rollup convention).

    Scale: one edge count (inlined literal), one exploded-degree count,
    one labels⋈edges endpoint join, #communities-row algebra — the
    LPA plan's own cost shape, re-run once as a scorer."""
    from n2kupdate_spark.operators.dedup import label_propagation, modularity_score

    nodes = load(spark, sf_dir, "documents").select("doc_id")
    # materialize the near-dup pair list ONCE — LPA and the scorer both
    # consume it, and without the checkpoint Catalyst would inline the
    # whole shingle pipeline into each consumer (the kn-fit lesson)
    pairs = (
        dedup_ngram_jaccard(spark, sf_dir).select("id1", "id2").localCheckpoint()
    )
    labels = label_propagation(nodes, pairs, id_col="doc_id")
    return modularity_score(labels, pairs, id_col="doc_id")


@register("graph_link_prediction")  # rows-only (r9 capacity policy): ≡
# python dict recompute + planted missing-edge pins — tests/test_graph.py
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 missing-link candidates over the near-dup graph by
    common-neighbors + Jaccard (Liben-Nowell & Kleinberg 2003) — the
    curation queue: "these two docs share duplicate-neighbors but the
    similarity threshold just missed their pair". The fixture's dup
    components are CLIQUES (every distance-2 pair is already an edge —
    a 0-row demo demonstrates nothing), so the demo deterministically
    WITHHOLDS every pair with (id1+id2) % 5 == 0 and scores the thinned
    graph: the withheld clique edges are exactly the recoverable
    missing links, and `was_withheld` reports the recovery per row —
    the link-prediction self-evaluation, planted by construction. See
    operators/dedup.py::link_prediction_scores (wedge join on the
    shared middle, anti-join against surviving edges, one exploded
    degree count)."""
    from n2kupdate_spark.operators.dedup import link_prediction_scores

    pairs = (
        dedup_ngram_jaccard(spark, sf_dir)
        .select(
            F.least("id1", "id2").alias("id1"),
            F.greatest("id1", "id2").alias("id2"),
        )
        .localCheckpoint()  # scored + withheld both consume it
    )
    withheld = pairs.filter((F.col("id1") + F.col("id2")) % 5 == 0)
    kept = pairs.filter((F.col("id1") + F.col("id2")) % 5 != 0)
    scored = link_prediction_scores(kept)
    return scored.join(
        withheld.select(
            F.col("id1").alias("a"), F.col("id2").alias("b"),
            F.lit(True).alias("was_withheld"),
        ),
        ["a", "b"],
        "left",
    ).select(
        "a", "b", "cn", "deg_a", "deg_b", "jaccard",
        F.coalesce("was_withheld", F.lit(False)).alias("was_withheld"),
    ).orderBy(F.col("cn").desc(), F.col("jaccard").desc(), "a", "b")


@register("graph_hits")  # rows-only (§2 legend: iterative algorithm —
# fixed-count alternating power iteration has no SQL form; numpy-pinned
# in tests/test_graph.py)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the DIRECTED
    customer→supplier purchase graph (edge weight = lineitem count) —
    the bipartite centrality PageRank can't express: a hub customer's
    purchases concentrate on strong-authority suppliers, an authority
    supplier is bought from by strong hubs (the mutually recursive
    pair that converges to the adjacency's principal singular
    vectors). The same operator scores crawler→site and
    query→document graphs in a curation stack.

    Scale: the edge list is a lineitem⋈orders key join collapsed to
    distinct (cust, supp) pairs; per double-step two keyed join+agg
    pairs against the checkpointed list (the pagerank plan shape),
    linearity lets the Frobenius pre-scale replace every per-round
    normalization (no per-iteration driver aggregate); below the
    shared _edge_gated bound the recursion runs on the driver — see
    operators/dedup.py::hits_scores. iters=6 measured bit-identical at
    6dp to iters=10 on this graph at sf0.1 (0/15,999 rows differ —
    the spectral gap of a dense purchase bipartite graph is wide), so
    the query stops at the fixed point instead of paying 8 more
    shuffles for no digit."""
    from n2kupdate_spark.operators.dedup import hits_scores

    li = load(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    o = load(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    edges = li.join(
        o, li["l_orderkey"] == o["o_orderkey"]
    ).select(
        F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    return hits_scores(edges, iters=6)


@register("graph_assortativity")  # rows-only (§2 legend: float
# correlation over a derived graph; numpy-pinned in tests/test_graph.py)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the near-dup graph — the
    one-number mixing diagnostic read NEXT to graph_triangle_count's
    transitivity and graph_modularity_score's community quality:
    disassortative (r < 0) duplication is hub-and-spoke template
    reuse; assortative (r > 0) duplication is a densely inter-mirrored
    core — two different curation responses (drop the hub's template
    vs drop the whole farm). See
    operators/dedup.py::degree_assortativity (edge-row joins + one
    6-sum moments aggregate; never node-squared)."""
    from n2kupdate_spark.operators.dedup import degree_assortativity

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("id1", "id2")
    return degree_assortativity(pairs)
