"""Maintain tests/query_green_hashes.json — the per-query source hash as
of each query's last driver-green verification.

The driver verifies only the first 50 registry entries per round;
``queries.registry()`` self-rotates on the CORRECTNESS_r*.json history.
Round 6's verdict found the one hole in that rotation: a query REWRITTEN
after its last green (q49, rewritten r6, last green r4) ranked by
staleness only, so its driver re-confirmation could trail the rewrite by
two rounds. This sidecar closes it: ``registry()`` compares each query's
current ``source_hash`` (fn source + oracle SQL) against the hash stored
at its last green and ranks mismatches ahead of all merely-stale greens.

Workflow (run at ROUND START, before touching any query code, so the
stored hash reflects exactly the code the driver verified):

    python scripts/green_hashes.py --update   # refresh greens of the
                                              # latest CORRECTNESS round,
                                              # add missing entries
    python scripts/green_hashes.py            # report changed-since-green

A query edited mid-round then mismatches until the NEXT round-start
update that follows its driver green — precisely the interval during
which it must stay in the verification window.
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = Path(__file__).resolve().parents[1]
SIDECAR = ROOT / "tests" / "query_green_hashes.json"


def latest_round_greens() -> tuple[int, set[str]]:
    best_round, greens = 0, set()
    for path in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        rnd = int(m.group(1)) if m else 0
        if rnd <= best_round:
            continue
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        best_round = rnd
        greens = {
            name
            for name, row in data.items()
            if isinstance(row, dict)
            and (
                row.get("hash_match") is True
                or (row.get("hash_match") is None and row.get("rows_match") is True)
            )
        }
    return best_round, greens


def main() -> int:
    from job_etl_spark.queries import registry, source_hash

    reg = registry()
    current = {name: source_hash(q) for name, q in reg.items()}
    stored = json.loads(SIDECAR.read_text()) if SIDECAR.exists() else {}

    if "--rehash-all" in sys.argv:
        # Hash-SCHEME migration only (e.g. r8's helper-surface extension):
        # re-encode every stored entry under the current source_hash
        # definition. Valid ONLY when no query/helper code has changed
        # since the stored greens — it assumes the code on disk is exactly
        # what the driver verified, and re-stamps it under the new scheme.
        # non-hex sentinels (e.g. '*-pending-driver-green') mark a rewrite
        # that has NOT been re-verified — re-stamping one would erase the
        # exact marker the sidecar exists to track; carry them through.
        sentinels = sorted(
            n for n, h in stored.items()
            if not re.fullmatch(r"[0-9a-f]+", str(h))
        )
        dropped = sorted(n for n in stored if n not in current)
        changed = sorted(
            n for n in stored
            if n in current and n not in sentinels and stored[n] != current[n]
        )
        stored = {
            n: (stored[n] if n in sentinels else current[n])
            for n in sorted(current)
            if n in current
        }
        SIDECAR.write_text(json.dumps(stored, indent=1, sort_keys=True) + "\n")
        print(
            f"rehashed {SIDECAR.name}: {len(stored)} entries re-encoded "
            f"({len(changed)} differed under the new scheme, "
            f"{len(sentinels)} sentinels kept: {sentinels or '—'}, "
            f"{len(dropped)} removed-from-registry dropped)"
        )
        return 0

    if "--mark-pending" in sys.argv:
        # Stamp an explicit 'pending-driver-green' sentinel on queries the
        # builder structurally rewrote: the rotation ranks sentinels ahead
        # of hash-detected changes (a shared-helper edit ripples the hash
        # of ~every dependent at once, drowning the genuinely-rewritten
        # ones), so these are guaranteed a slot in the driver's first-50
        # verification window. --update clears a sentinel at the query's
        # next driver green.
        names = sys.argv[sys.argv.index("--mark-pending") + 1 :]
        unknown = sorted(n for n in names if n not in current)
        if unknown:
            print(f"not in registry: {', '.join(unknown)}", file=sys.stderr)
            return 2
        for n in names:
            stored[n] = "pending-driver-green"
        SIDECAR.write_text(json.dumps(stored, indent=1, sort_keys=True) + "\n")
        print(f"marked {len(names)} pending-driver-green: {', '.join(sorted(names))}")
        return 0

    if "--update" in sys.argv:
        rnd, greens = latest_round_greens()
        refreshed = sorted(n for n in greens if stored.get(n) != current[n])
        added = sorted(n for n in current if n not in stored and n not in greens)
        for n in greens:
            stored[n] = current[n]
        for n in added:
            # never-verified queries get their current hash so a LATER
            # rewrite is still detected; they rank as never-verified (-1)
            # until their first green regardless
            stored[n] = current[n]
        stored = {n: h for n, h in sorted(stored.items()) if n in current}
        SIDECAR.write_text(json.dumps(stored, indent=1, sort_keys=True) + "\n")
        print(
            f"updated {SIDECAR.name}: round r{rnd}, {len(greens)} greens, "
            f"{len(refreshed)} hashes refreshed, {len(added)} new entries"
        )
        return 0

    changed = sorted(
        n for n in current if n in stored and stored[n] != current[n]
    )
    missing = sorted(n for n in current if n not in stored)
    for n in changed:
        print(f"CHANGED-SINCE-GREEN {n}")
    for n in missing:
        print(f"NO-HASH {n}")
    print(f"{len(changed)} changed since last green, {len(missing)} unhashed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
