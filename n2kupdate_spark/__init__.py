"""n2kupdate-spark: a PySpark-native analytics/ETL engine.

A from-scratch engine with the query and data-processing capabilities of the
reference package ``inbo/n2kupdate`` (an R client that validates, fingerprints
and idempotently merges data frames into a PostgreSQL warehouse — see
SURVEY.md §1), re-expressed Spark-first:

- relational/analytic operators as declarative DataFrame transforms
  (Catalyst plans them; we never hand-schedule),
- the reference's merge family (SCD1, SCD2-close, set-replacement,
  insert-ignore) as pure ``f(current_state, incoming_batch)`` transforms,
- content fingerprints (md5/sha256/sha1 over ordered natural keys) as the
  idempotence mechanism, mirroring the reference's ``digest::sha1`` design,
- a staging-table + server-side-merge JDBC sink (the n2kupdate analog),
- Structured Streaming for incremental loads,
- LLM-data-pipeline extensions: dedup (exact/MinHash/SimHash/Jaccard),
  similarity search, multimodal binary columns, text analysis.

Provenance: /root/reference was empty at build time (SURVEY.md §0); reference
anchors cite public ``inbo/n2kupdate`` file paths, confidence-tagged.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # PEP 562 lazy export: `from n2kupdate_spark import N2kStore` without
    # paying the pyspark import at package-import time.
    if name == "N2kStore":
        from n2kupdate_spark.api import N2kStore

        return N2kStore
    raise AttributeError(name)
