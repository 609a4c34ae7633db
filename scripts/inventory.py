"""Dump the declared query inventory as a markdown table:
name | module | oracle | in this round's driver window.

The driver verifies the first 50 registry entries per round (the
registry self-rotates on CORRECTNESS history); this script shows what
the current rotation will submit.

Usage: python scripts/inventory.py [--window-only]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window-only", action="store_true")
    args = ap.parse_args()

    from job_etl_spark.queries import registry

    reg = registry()
    print(f"# {len(reg)} declared queries (driver window = first 50)\n")
    print("| # | query | module | oracle | driver window |")
    print("|---|---|---|---|---|")
    for i, (name, q) in enumerate(reg.items()):
        in_window = i < 50
        if args.window_only and not in_window:
            continue
        mod = q.fn.__module__.rsplit(".", 1)[-1]
        print(
            f"| {i + 1} | {name} | {mod} | "
            f"{'yes' if q.oracle else 'rows-only'} | "
            f"{'✓' if in_window else ''} |"
        )


if __name__ == "__main__":
    main()
