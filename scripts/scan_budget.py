"""Snapshot visible-FileScan counts per (query, table) for the whole
registry — the data file behind tests/test_plans.py's registry-wide
scan-budget guard (round-5 lock-in of the round-4 multi-scan audit,
SCALING.md "Multi-scan audit").

Why: the round-4 audit found 7 queries silently re-scanning a big table
3-7× because a derived frame was consumed twice (Spark never shares
subplans across branches). Checkpointing the small derived frame fixed
them, but only the 10 hand-audited queries had a regression bound
(`_MAX_SCANS`). This snapshot pins the CURRENT count for every (query,
big table) pair as a ceiling, so any future refactor that re-inflates a
plan fails a test instead of shipping a silent 2-7× scan regression.

Counts are VISIBLE scans in the pre-AQE executed plan: a localCheckpoint
hides its subtree's scan, which is exactly the semantics the guard wants
(the checkpoint IS the fix being protected).

Usage:
    python scripts/scan_budget.py            # diff against the snapshot
    python scripts/scan_budget.py --update   # rewrite tests/scan_budgets.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "scan_budgets.json",
)
SF = "/root/testdata/sf0.001"

# Tables whose scan count is worth budgeting: everything that scales with
# SF. The tiny dims (region, nation) are broadcast-cheap by construction
# and legitimately re-scanned, so they are excluded from the budget.
BUDGETED_TABLES = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def scan_counts(plan: str) -> dict[str, int]:
    counts: dict[str, int] = {}
    for t in BUDGETED_TABLES:
        # anchored on the path separator: a bare f"{t}.parquet" would
        # double-count any future table whose name is a suffix of another
        # (ADVICE r5 — e.g. 'part.parquet' inside 'counterpart.parquet')
        n = sum(
            1
            for ln in plan.splitlines()
            if "FileScan" in ln and f"/{t}.parquet" in ln
        )
        if n:
            counts[t] = n
    return counts


def shuffle_count(plan: str) -> int:
    """Visible shuffle Exchanges in the pre-AQE executed plan (hash/range/
    round-robin/single-partition). BroadcastExchange is NOT a shuffle —
    broadcasting a small side is the cheap strategy the shuffle budget
    exists to protect — and ReusedExchange is NOT one either (it re-reads
    an already-materialized exchange's output, adding no extra shuffle
    execution, and its one-line form repeats the child's 'Exchange
    hashpartitioning(...)' text — a substring test would count it, ADVICE
    r6). Match the node NAME at the start of the line, after the tree
    decoration. Checkpoints hide their subtree's exchanges, same
    semantics as scan_counts."""
    return sum(
        1
        for ln in plan.splitlines()
        if ln.lstrip(" +-*:()0123456789").startswith("Exchange ")
    )


SHUFFLE_SNAPSHOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "shuffle_budgets.json",
)


def build(spark) -> tuple[dict[str, dict[str, int]], dict[str, int]]:
    from job_etl_spark.queries import registry

    scans: dict[str, dict[str, int]] = {}
    shuffles: dict[str, int] = {}
    for name, q in sorted(registry().items()):
        df = q.fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        scans[name] = scan_counts(plan)
        shuffles[name] = shuffle_count(plan)
    return scans, shuffles


def main() -> int:
    os.environ.setdefault("JOBSPARK_SHUFFLE_PARTITIONS", "8")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from job_etl_spark.session import get_spark

    spark = get_spark("scan-budget")
    got, got_sh = build(spark)
    if "--update" in sys.argv:
        with open(SNAPSHOT, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
            f.write("\n")
        with open(SHUFFLE_SNAPSHOT, "w") as f:
            json.dump(got_sh, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {SNAPSHOT} + {SHUFFLE_SNAPSHOT}: {len(got)} queries")
        return 0
    with open(SNAPSHOT) as f:
        want = json.load(f)
    with open(SHUFFLE_SNAPSHOT) as f:
        want_sh = json.load(f)
    bad = []
    for name, counts in got.items():
        budget = want.get(name)
        if budget is None:
            bad.append(f"{name}: not in snapshot (run with --update)")
            continue
        for t, n in counts.items():
            if n > budget.get(t, 0):
                bad.append(f"{name}: {t} scans {n} > budget {budget.get(t, 0)}")
        if got_sh[name] > want_sh.get(name, 0):
            bad.append(
                f"{name}: {got_sh[name]} shuffles > budget {want_sh.get(name, 0)}"
            )
    for line in bad:
        print("REGRESSION", line)
    print(f"checked {len(got)} queries; {len(bad)} over budget")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
