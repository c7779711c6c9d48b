"""r16 probe: canonical output hashes for a set of queries, for A/B
output-identity checks around an optimization (old code vs new code).

Usage: python probe_r16_abhash.py OUT.json q1 q2 ... [--sfs sf0.01,sf0.1]

Hash = md5 over the sorted list of row reprs (column-name header included),
computed driver-side from collect(); bit-exact floats (repr round-trips).
Run once on the old tree and once on the new tree, then diff the jsons.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from n2kupdate_spark.queries import QUERIES  # noqa: E402
from n2kupdate_spark.session import get_spark  # noqa: E402


def canonical_hash(df) -> str:
    cols = df.columns
    rows = df.collect()
    lines = sorted(repr(tuple(r[c] for c in cols)) for r in rows)
    h = hashlib.md5()
    h.update(repr(cols).encode())
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return f"{len(rows)}:{h.hexdigest()}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sfs", default="sf0.01,sf0.1")
    ap.add_argument("--root", default="/root/testdata")
    args = ap.parse_args()

    spark = get_spark(app_name="r16-abhash")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, str]] = {}
    for sf in args.sfs.split(","):
        sf_dir = os.path.join(args.root, sf)
        for name in args.queries:
            try:
                out.setdefault(name, {})[sf] = canonical_hash(
                    QUERIES[name](spark, sf_dir)
                )
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                out.setdefault(name, {})[sf] = f"ERROR: {e}"
            print(f"{sf} {name} {out[name][sf][:60]}", file=sys.stderr)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
