"""Content fingerprints — the reference's idempotence mechanism.

Reference analog: every n2kupdate store function computes
``fingerprint = digest::sha1(<ordered natural-key values>)`` client-side and
uses it as the stable surrogate key, so re-storing the same logical row is a
no-op (⟨pub⟩ internal helpers used by every R/store_*.R [H], SURVEY.md §1.2).

We keep the semantics (hash of ordered key values joined by a separator) but
default to md5/sha256 because the DuckDB oracle has no sha1
(SURVEY.md §7.4.1); ``algo='sha1'`` stays available for faithful parity.

Scale notes: fingerprints are computed with JVM-side built-ins inside
whole-stage codegen — no Python boundary — and, unlike monotonic ids, are
deterministic across runs, partitionings and retries, which is what makes
merge retries safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Separator between natural-key values inside the hashed string.
FINGERPRINT_SEP = "|"


def fingerprint(cols: list[str | Column], algo: str = "md5") -> Column:
    """Stable row fingerprint = hash of ordered key values.

    Null-safe: nulls hash as the empty string (concat_ws skips nulls), which
    matches DuckDB's concat_ws and keeps both engines byte-identical.
    """
    parts = [
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in cols
    ]
    joined = F.concat_ws(FINGERPRINT_SEP, *parts)
    if algo == "md5":
        return F.md5(joined)
    if algo == "sha256":
        return F.sha2(joined, 256)
    if algo == "sha1":
        return F.sha1(joined)
    raise ValueError(f"unsupported fingerprint algo {algo!r}")
