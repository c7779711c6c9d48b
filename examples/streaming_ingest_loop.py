"""Worked example: the full recurring-ingest lifecycle on this engine.

This is the production loop a corpus team runs continuously, composed
entirely from round-7/8 components (SURVEY.md §2):

  1. INGEST   — stream_corpus_publish: document micro-batches run the
                batch pipeline's own gates (Gopher → decontamination →
                exact dedup) PLUS the r9 incremental semantic stage
                (batch 1 seeds a persisted SemDeDup index, later batches
                resume + roll it forward) and commit EXACTLY-ONCE as
                epoch-keyed append-manifest versions — readers never see
                a torn batch.
  2. DEDUP    — the persisted shingle index resumes near-dup detection
                against each new batch (only the batch is shingled) and
                rolls itself forward IN PLACE as a new committed index
                version.
  3. OPTIMIZE — compact_manifest_table collapses the accumulated small
                batch files into right-sized files, published as the
                next manifest version (atomic flip).
  4. VACUUM   — vacuum_unreferenced retires the superseded batch dirs
                once no kept version references them; vacuum_index does
                the same for old shingle/semantic index versions.

Every commit point in the loop is an atomic manifest/marker rename, so a
crash at ANY step leaves the previous state fully readable — rerunning
the loop resumes cleanly (retried stream epochs skip their committed
versions; torn index roll-forwards are invisible).

    python examples/streaming_ingest_loop.py [sf_dir]   # default sf0.001
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from n2kupdate_spark.operators.dedup import (  # noqa: E402
    index_versions,
    persist_shingle_index,
    shingle_jaccard_pairs_capped_resume,
    word_shingles,
)
from n2kupdate_spark.session import get_spark  # noqa: E402
from n2kupdate_spark.sources import load  # noqa: E402
from n2kupdate_spark.sources.maintenance import (  # noqa: E402
    compact_manifest_table,
    manifest_versions,
    read_manifest,
    vacuum_unreferenced,
)
from n2kupdate_spark.streaming import (  # noqa: E402
    documents_file_stream,
    stream_corpus_publish,
)


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="streaming-ingest-loop")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="n2k_ingest_loop_")
    src, table, idx = f"{work}/src", f"{work}/corpus", f"{work}/dedup_index"

    docs = load(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 97 != 0)

    # --- 1. INGEST: two "crawl drops" arrive as files; each becomes a
    # micro-batch, gated and committed as one manifest version
    os.makedirs(src, exist_ok=True)
    for i, pred in enumerate((F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1), 1):
        tmp = f"{work}/tmp{i}"
        train.filter(pred).coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(f"{tmp}/{part}", f"{src}/drop{i}.parquet")
    vecs = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    sem_idx = f"{work}/semantic_index"
    q = stream_corpus_publish(
        documents_file_stream(spark, src, max_files_per_trigger=1),
        ev, table, f"{work}/ckpt",
        vectors=vecs, semantic_index_path=sem_idx, semantic_tau=0.3,
    )
    q.awaitTermination(120)
    print(f"ingested: manifest versions {manifest_versions(spark, table)}, "
          f"{read_manifest(spark, table).count()} gated docs; "
          f"semantic index versions {index_versions(spark, sem_idx)}")

    # --- 2. DEDUP: build the index from version 1, resume against the
    # version-2 delta, roll the index forward in place
    v1 = read_manifest(spark, table, version=1).select("doc_id", "text")
    v2 = read_manifest(spark, table).select("doc_id", "text")
    delta = v2.join(v1.select("doc_id"), "doc_id", "left_anti")
    persist_shingle_index(word_shingles(v1, "text"), idx)
    pairs = shingle_jaccard_pairs_capped_resume(
        word_shingles(delta, "text"), idx, update_index_path=idx
    )
    print(f"near-dup pairs batch-vs-corpus: {pairs.count()}; "
          f"index versions {index_versions(spark, idx)}")

    # --- 3. OPTIMIZE: collapse the per-batch small files, clustering on
    # doc_id and recording per-file [min,max] in the manifest
    stats = compact_manifest_table(
        spark, table, target_mb=128, sort_by=["doc_id"], stats_cols=["doc_id"]
    )
    print(f"compacted {stats['before']['files']} files -> "
          f"{stats['after']['files']} (version {stats['version']})")

    # --- 3b. manifest-level pruning: a doc_id range read plans only the
    # overlapping files (no file opens, no footer reads for the rest)
    pruned = read_manifest(spark, table, where=[("doc_id", None, 100)])
    n_files = pruned.select(F.input_file_name()).distinct().count()
    n_rows = pruned.filter(F.col("doc_id") <= 100).count()
    print(f"stats-pruned read: planned {n_files} file(s), "
          f"{n_rows} rows with doc_id<=100 (pruning is a conservative "
          f"superset; the filter still applies)")

    # --- 3c. oops-rollback: any publish can be undone as a NEW version
    from n2kupdate_spark.sources.maintenance import rollback_manifest

    rollback_manifest(spark, table, to_version=stats["version"])  # no-op demo
    print(f"rollback committed version {manifest_versions(spark, table)[-1]}")

    # --- 4. VACUUM: retire the superseded batch dirs and old index versions
    v = vacuum_unreferenced(spark, table, keep_versions=1)
    from n2kupdate_spark.operators.dedup import vacuum_index
    from n2kupdate_spark.operators.similarity import _SEM_INDEX_TABLES
    vi = vacuum_index(spark, idx, keep_versions=1)
    vs = vacuum_index(spark, sem_idx, keep_versions=1, tables=_SEM_INDEX_TABLES)
    print(f"vacuumed {v['removed_files']} table files, "
          f"{vi['removed_dirs']} shingle-index dirs, "
          f"{vs['removed_dirs']} semantic-index dirs; "
          f"{read_manifest(spark, table).count()} docs still served")

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
