"""Plan the next round's 50-query correctness window from recorded
evidence.

The driver hash-checks exactly the first 50 ``queries()`` entries per
round (CORRECTNESS_r0N.json), so queries/__init__.py::_ROUND_WINDOW
rotates which ops occupy the front. Every round so far the "which ops are
stalest" set was derived by hand from the CORRECTNESS files; this script
does that bookkeeping:

  python window_planner.py            # report freshness + propose r(N+1)

It prints, per registered SQL-oracle op: the freshest round with a green
driver row, flags anything that would exceed the ≤3-round freshness
invariant next round, and proposes a window (stalest first, newest-ops
next, then heaviest re-confirms) ready to paste into _ROUND_WINDOW.

FRESHNESS POLICY HISTORY: rounds 1–15 ran a ≤2-round staleness
invariant (3-round cycle, ceiling 150). r16 extended it to ≤3-round
staleness (4-round cycle, ceiling 200) per the r15 verdict: at 148/150
SQL-oracle ops the 3-round rotation had 2 slots of headroom and died
arithmetically on the next SQL-slot debut. Under the 4-round cycle
every oracle op still gets a driver hash-match at most 3 rounds old,
and headroom is 50+ slots.
Rows-only ops are excluded (they'd burn slots on `no_oracle` rows; their
value pins live in pytest).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from n2kupdate_spark.queries import ORACLE, QUERIES  # noqa: E402

#: Hard ceiling on SQL-oracle ops under the ≤3-round freshness invariant:
#: 50 driver slots × 4-round cycle (r16 policy — see the docstring's
#: history note; was 150 under the r1–r15 3-round cycle). CAPACITY
#: POLICY (decided r9, SURVEY §5.2): once headroom drops to
#: ROWS_ONLY_DEBUT_AT or below, NEW ops default to rows-only
#: registration (no oracle_sql entry) with pytest value pins
#: (test_parity.py local-oracle pins cost no slots). A new op may still
#: claim one of the remaining SQL-oracle slots only when a DuckDB
#: oracle is distinctly stronger evidence than a pin (novel SQL
#: semantics, boundary-heavy output); the claim must be noted in
#: SURVEY §2's row for that op.
SQL_ORACLE_CEILING = 200
ROWS_ONLY_DEBUT_AT = 8
CYCLE_ROUNDS = 4  # window must cover every op with freshest ≤ N - CYCLE_ROUNDS


def load_evidence() -> dict[str, int]:
    """op -> freshest round with a fully green driver row."""
    freshest: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        for name, row in json.load(open(path)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                freshest[name] = max(freshest.get(name, 0), rnd)
    return freshest


def check() -> int:
    """--check: validate the COMMITTED window (the registry's first 50)
    against the invariant — every never-checked op and every op whose
    freshest row would exceed CYCLE_ROUNDS-1 rounds next round must be
    inside it. Exit 0 iff the window holds; prints violations otherwise."""
    freshest = load_evidence()
    next_round = (max(freshest.values()) if freshest else 0) + 1
    sql_ops = [n for n in QUERIES if n in ORACLE]
    window = set(list(QUERIES)[:50])
    required = [
        n
        for n in sql_ops
        if n in freshest and freshest[n] <= next_round - CYCLE_ROUNDS
    ]
    missing = [n for n in required if n not in window]
    # ops born mid-round (no driver row yet) can't retroactively enter a
    # committed window; they front the NEXT rotation (r7/r8 precedent:
    # source_schema_evolution, corpus_gate_report) — informational only
    debuting = [n for n in sql_ops if n not in freshest and n not in window]
    print(f"window check for r{next_round}: first-50 covers "
          f"{len(required) - len(missing)}/{len(required)} stale ops")
    for n in missing:
        print(f"  VIOLATION: {n} (freshest r{freshest[n]}) not in the first 50")
    for n in debuting:
        # Pre-rotation this op belongs at the FRONT of the very next
        # committed window (the r{next_round} rotation this script
        # proposes) — r8's "in r{next_round+1}" wording contradicted the
        # proposal and is fixed per the r8 verdict ("What's wrong" #3).
        print(f"  info: {n} debuts outside the committed window — put it "
              f"first in the r{next_round} rotation (main-mode proposal "
              "already does)")
    over = len(sql_ops) - SQL_ORACLE_CEILING
    if over > 0:
        print(f"  VIOLATION: {len(sql_ops)} SQL-oracle ops exceed the "
              f"{SQL_ORACLE_CEILING} ceiling by {over} — the "
              f"≤{CYCLE_ROUNDS - 1}-round invariant is unsatisfiable; "
              "convert ops to rows-only pins")
    if not missing and over <= 0:
        print("  OK — every must-refresh op is windowed")
    return 1 if missing or over > 0 else 0


def main() -> None:
    freshest = load_evidence()
    latest_round = max(freshest.values()) if freshest else 0
    next_round = latest_round + 1
    sql_ops = [n for n in QUERIES if n in ORACLE]

    never = [n for n in sql_ops if n not in freshest]
    by_age = sorted(
        (n for n in sql_ops if n in freshest), key=lambda n: (freshest[n], n)
    )
    # invariant: at round N every op's freshest row must satisfy
    # freshest ≥ N-(CYCLE_ROUNDS-1) (a row exactly CYCLE_ROUNDS-1 rounds
    # old is still within, per the r6 verdict's counting). So the MUST
    # set for round N is freshest ≤ N-CYCLE_ROUNDS; ops one round newer
    # become next cycle's MUST and are the natural fillers if slots
    # remain — the stalest-first proposal keeps the rotation staggered
    # even in rounds where the MUST set is formally empty.
    must = [n for n in by_age if freshest[n] <= next_round - CYCLE_ROUNDS]

    print(f"registered queries: {len(QUERIES)} ({len(sql_ops)} SQL-oracle)")
    print(f"latest recorded round: r{latest_round}; planning for r{next_round}")
    headroom = SQL_ORACLE_CEILING - len(sql_ops)
    print(
        f"window capacity: {len(sql_ops)}/{SQL_ORACLE_CEILING} SQL-oracle "
        f"ops — headroom {headroom} "
        f"(~{headroom // CYCLE_ROUNDS}/round on a {CYCLE_ROUNDS}-round cycle)"
    )
    if headroom <= ROWS_ONLY_DEBUT_AT:
        print(
            "  CAPACITY POLICY IN EFFECT (r9 decision, SURVEY §5.2): new "
            "ops debut rows-only with pytest value pins by default; an "
            "SQL-oracle slot may be claimed only with a SURVEY §2 note "
            "justifying why an oracle beats a pin for that op."
        )
    print(f"\nnever driver-checked (new ops — window first): {len(never)}")
    for n in never:
        print(f"  {n}")
    print(
        f"\nmust re-window to keep ≤{CYCLE_ROUNDS - 1}-round freshness: "
        f"{len(must)}"
    )
    for n in must:
        print(f"  {n}  (freshest r{freshest[n]})")

    proposal = (never + must)[:50]
    fillers = [n for n in by_age if n not in set(proposal)]
    proposal += fillers[: 50 - len(proposal)]
    overflow = len(never) + len(must) - 50
    if overflow > 0:
        print(
            f"\nWARNING: {overflow} required ops do not fit one 50-slot window —"
            " the invariant needs two rounds or a driver-side change."
        )
    print(f"\nproposed _ROUND_WINDOW for r{next_round} ({len(proposal)} slots):")
    print("_ROUND_WINDOW = [")
    for n in proposal:
        print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    if "--check" in sys.argv:
        sys.exit(check())
    main()
