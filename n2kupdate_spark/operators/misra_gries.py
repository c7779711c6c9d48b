"""Misra–Gries mergeable heavy-hitters summary (Misra & Gries 1982;
mergeability per Agarwal, Cormode, Huang, Phillips, Wei & Yi, "Mergeable
Summaries", PODS 2012) — the DETERMINISTIC-bound counterpart of the
count-min sketch already in the family: CMS never UNDERcounts but its
overcount bound is probabilistic; MG never OVERcounts and its undercount
is a tracked, certified quantity (the summary carries its own total
decrement), so the caller gets hard two-sided bounds with no failure
probability.

Distributed shape: per Arrow batch, exact value counts (np.unique)
compress to ≤ k survivors by the MG rule — subtract the (k+1)-th largest
count from all, drop non-positives, add the subtracted mass to the
summary's decrement ledger. Batch summaries then merge by a plain
item-wise SUM (one partial-agged shuffle of ≤ #batches × k item rows
plus one ledger row per batch) and ONE final compress. Item-wise
sum-then-trim is a valid MG merge (the PODS 2012 argument: each input is
an underestimate vector; their sum underestimates the union; the final
trim adds at most its own threshold to the ledger), and doing the trim
once instead of pairwise only TIGHTENS the bound."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from n2kupdate_spark.operators.parallel import local_frame as _local_frame

#: item value used for the decrement-ledger rows (never a real item —
#: callers pass non-null item columns; nulls are filtered first).
_LEDGER = None


def _mg_compress(items, counts, k):
    """(items, counts, thr) after the MG k-compress. ``thr`` — the
    (k+1)-th largest count, subtracted from every item — is the MAX
    any single item's estimate lost in this compress (dropped items
    had count ≤ thr), so the certificate ledger sums THRESHOLDS, not
    removed mass: an item present in the final summary undercounts by
    at most Σ thr over the compresses it lived through, and an absent
    item's true count is ≤ Σ thr. Each thr ≤ n_input/(k+1) (k+1 items
    carry ≥ thr each), which is what keeps the ledger ≤ 2n/(k+1)
    end-to-end (per-batch Σ + one final compress)."""
    import numpy as np

    if len(items) <= k:
        return items, counts, 0
    thr = int(np.partition(counts, -(k + 1))[-(k + 1)])
    keep = counts > thr
    return items[keep], counts[keep] - thr, thr


def mg_heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 32,
    top: int = 5,
) -> DataFrame:
    """Top-``top`` heavy hitters of ``col`` with CERTIFIED bounds from a
    k-counter Misra–Gries summary: emits (item, est_lo, err_bound,
    guaranteed est_lo ≤ true ≤ est_lo + err_bound) — err_bound is the
    summary's own decrement ledger, not a probabilistic claim, and is
    itself ≤ n/(k+1) by the classic MG guarantee.

    Scale: one mapInPandas pass emits ≤ k item rows + 1 ledger row per
    batch; one item-keyed partial-agged sum; the final compress runs on
    the ≤ #batches × k merged table driver-side (bounded by construction
    — batches are Arrow-sized, and the merged table is ≤ #partitions × k
    after the map-side partial agg)."""
    import pandas as pd

    def partials(batches):
        import numpy as np

        for pdf in batches:
            vals = pdf[col].to_numpy()
            items, counts = np.unique(vals, return_counts=True)
            items, counts, thr = _mg_compress(items, counts, k)
            out = pd.DataFrame({"item": items, "cnt": counts.astype("int64")})
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {"item": [_LEDGER], "cnt": [np.int64(thr)]}
                    ),
                ]
            )
            yield out

    itype = df.schema[col].dataType.simpleString()
    merged = (
        df.select(col)
        .filter(F.col(col).isNotNull())
        .mapInPandas(partials, schema=f"item {itype}, cnt long")
        .groupBy("item")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    import numpy as np

    ledger = sum(int(r["cnt"]) for r in merged if r["item"] is None)
    pairs = [(r["item"], int(r["cnt"])) for r in merged if r["item"] is not None]
    if not pairs:
        return _local_frame(df.sparkSession, 
            [], f"item {itype}, est_lo long, err_bound long"
        )
    items = np.array([p[0] for p in pairs], dtype=object)
    counts = np.array([p[1] for p in pairs], dtype=np.int64)
    items, counts, thr_final = _mg_compress(items, counts, k)
    ledger += thr_final
    order = np.lexsort((items.astype(str), -counts))[:top]
    rows = [
        (items[i].item() if hasattr(items[i], "item") else items[i],
         int(counts[i]), int(ledger))
        for i in order
    ]
    return _local_frame(df.sparkSession, 
        rows, f"item {itype}, est_lo long, err_bound long"
    )
