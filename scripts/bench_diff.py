"""Per-query diff of the two most recent BENCH_HISTORY.jsonl entries.

Usage: python scripts/bench_diff.py [--threshold SECONDS]

Prints queries whose timing moved more than the threshold (default 0.5 s)
between the last two recorded runs, plus totals — the round-over-round
regression check the bench history exists for. Exit code 0 always (the
box is noisy; this is a report, not a gate)."""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument(
        "--history",
        default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_HISTORY.jsonl"),
    )
    args = ap.parse_args()
    with open(args.history) as f:
        runs = [json.loads(ln) for ln in f if ln.strip()]
    # compare same-sf runs only (sf0.001 quick checks vs sf0.1 rounds differ)
    by_sf: dict = {}
    for r in runs:
        by_sf.setdefault(r.get("sf"), []).append(r)
    # contention baseline: the fastest spin sample ever recorded at this
    # box approximates the idle single-thread speed; a session whose spin
    # is >1.3× that ran under load and its per-query moves are noise
    spins = [s for r in runs for s in r.get("spin_ms", []) if s]
    spin_base = min(spins) if spins else None

    def contended(r) -> str:
        # median of the session's samples (since r4 bench.py re-samples
        # every ~25 queries): one GC-coincident spike out of 8 samples
        # shouldn't condemn a session, but sustained elevation should
        ss = sorted(s for s in r.get("spin_ms", []) if s)
        if not ss or spin_base is None:
            return ""
        ratio = ss[len(ss) // 2] / spin_base
        return f" [CONTENDED spin x{ratio:.1f}]" if ratio > 1.3 else ""

    def spin_factor(r) -> float:
        # normalization factor: the session's median spin sample over the
        # all-time floor. Dividing a session's timings by this approximates
        # "what the number would read on an uncontended box" — coarse (GC
        # and scheduler contention do not scale 1:1 with a pure-Python
        # spin), so the raw numbers stay primary and the normalized column
        # is the tie-breaker for flagging regressions across weather.
        ss = sorted(s for s in r.get("spin_ms", []) if s)
        if not ss or not spin_base:
            return 1.0
        return max(1.0, ss[len(ss) // 2] / spin_base)

    for sf, rs in sorted(by_sf.items(), key=lambda kv: str(kv[0])):
        if len(rs) < 2:
            continue
        prev, cur = rs[-2], rs[-1]
        fp, fc = spin_factor(prev), spin_factor(cur)
        print(
            f"sf={sf}: total {prev['value']:.1f}s ({prev.get('rev')}{contended(prev)}) -> "
            f"{cur['value']:.1f}s ({cur.get('rev')}{contended(cur)}), "
            f"{len(cur['queries'])} queries"
        )
        if contended(prev) or contended(cur):
            print("  note: a compared session ran contended; treat moves as noise")
        if abs(fp - fc) > 0.05:
            print(
                f"  spin-normalized (median-spin/floor: prev x{fp:.2f}, cur x{fc:.2f}): "
                f"total {prev['value'] / fp:.1f}s -> {cur['value'] / fc:.1f}s"
            )
        moved = [
            (name, prev["queries"].get(name), t)
            for name, t in sorted(cur["queries"].items())
            if name in prev["queries"] and abs(t - prev["queries"][name]) > args.threshold
        ]
        for name, was, now in sorted(moved, key=lambda x: x[1] - x[2]):
            sign = "+" if now > was else "-"
            norm = ""
            if abs(fp - fc) > 0.05:
                nw, nn = was / fp, now / fc
                flag = "+" if nn > nw else "-"
                norm = f"   [norm {nw:5.2f} -> {nn:5.2f} {flag}]"
            print(f"  {sign} {name:32s} {was:6.2f} -> {now:6.2f}{norm}")
        added = sorted(set(cur["queries"]) - set(prev["queries"]))
        if added:
            print(f"  new: {', '.join(added)}")


if __name__ == "__main__":
    main()
