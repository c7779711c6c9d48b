"""Fold-throughput microbench for the Bloom dedup folds (r12 judge item 4:
vectorize the per-row probe/insert inner loops).

Drives _bloom_dedup_fold and _scalable_bloom_fold directly against a fake
state handle (the tests' harness shape) — no Spark session, so the number
isolates exactly the Python fold cost that applyInPandasWithState pays per
group per micro-batch. Three phases per fold, min-of-3 each:

- insert-heavy: 200k distinct fps in one batch (every row probes, misses,
  inserts — the cold-corpus case);
- probe-heavy: the same 200k again (every row hits pre-state bits — the
  steady-state duplicate case; fully vectorizable);
- mixed: 50% new / 50% dup interleaved.

Run: python probe_bloom_fold.py      Results recorded in BASELINE.md §5.
"""

from __future__ import annotations

import hashlib
import json
import time

import numpy as np
import pandas as pd

from n2kupdate_spark.streaming.jobs import (
    _bloom_dedup_fold,
    _scalable_bloom_fold,
)

N = 200_000


class FakeState:
    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def batch(ids, fps):
    # precompute the JVM-side hash pair the streaming wrapper ships
    digests = [hashlib.md5(fp.encode()).digest() for fp in fps]
    return pd.DataFrame(
        {
            "doc_id": ids,
            "fp": fps,
            "h1": np.array(
                [int.from_bytes(d[:8], "big") for d in digests], dtype=np.uint64
            ),
            "h2": np.array(
                [int.from_bytes(d[8:], "big") for d in digests], dtype=np.uint64
            ),
        }
    )


def drive(make_fold) -> dict[str, float]:
    fresh = batch(range(N), [f"doc{i}" for i in range(N)])
    mixed = batch(
        range(N, 2 * N),
        [f"doc{i}" if i % 2 else f"new{i}" for i in range(N)],
    )
    out = {}
    for phase in ("insert", "probe", "mixed"):
        best = float("inf")
        for _ in range(3):
            if phase == "insert":
                fold, st = make_fold(), FakeState()
                t0 = time.perf_counter()
                list(fold((0,), iter([fresh]), st))
                best = min(best, time.perf_counter() - t0)
            else:
                fold, st = make_fold(), FakeState()
                list(fold((0,), iter([fresh]), st))  # warm state
                probe_in = fresh if phase == "probe" else mixed
                t0 = time.perf_counter()
                list(fold((0,), iter([probe_in]), st))
                best = min(best, time.perf_counter() - t0)
        out[phase] = round(best, 3)
    return out


def main() -> None:
    res = {
        "fixed": drive(lambda: _bloom_dedup_fold(1 << 24, 4)),
        "scalable": drive(lambda: _scalable_bloom_fold(1 << 22, 4, 1e-3)),
        "rows": N,
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
