"""q132 exact-vs-approx NDV at scale (r6 verdict item 4).

q132_profile_table's declared (oracle-paired) path uses exact
countDistinct per profiled column — each adds an Expand duplication of
the scan rows, the documented 100 TB cost driver. The ``approx=True``
twin swaps every NDV to approx_count_distinct (HyperLogLog++, mergeable,
one map-side-partial pass, no Expand). This probe times both at 1x and
Nx on the scaled orders table so the trade is a measured number in
SCALING.md, not a narrative claim.

Usage: python scripts/ndv_probe.py [--sf /root/testdata/sf0.1]
       [--scaled /tmp/jobspark_scaled_x64] [--runs 3]
Requires the scaled build (orders materialized) from scaling_probe.py.
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--scaled", default="/tmp/jobspark_scaled_x64")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import pyarrow.parquet as _pq

    from job_etl_spark.queries.observability import q132_profile_table
    from job_etl_spark.session import get_spark

    def _rows(sfd: str) -> int:
        p = Path(sfd) / "orders.parquet"
        if p.is_dir():
            return sum(
                _pq.ParquetFile(f).metadata.num_rows
                for f in sorted(p.glob("*.parquet"))
            )
        return _pq.ParquetFile(p).metadata.num_rows

    scale = _rows(args.scaled) / _rows(args.sf)
    print(f"orders rows: 1x={_rows(args.sf)} Nx={_rows(args.scaled)} (x{scale:.1f})")

    spark = get_spark("jobspark-ndv-probe")
    spark.sparkContext.setLogLevel("ERROR")
    q132_profile_table(spark, args.sf).write.format("noop").mode("overwrite").save()

    print(f"{'variant':10s} {'t_1x':>8s} {'t_Nx':>8s} {'exponent':>9s} {'Nx exact/approx':>16s}")
    t_nx = {}
    for label, approx in (("exact", False), ("approx", True)):
        times = {}
        for tag, sfd in (("1x", args.sf), ("Nx", args.scaled)):
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                q132_profile_table(spark, sfd, approx=approx).write.format(
                    "noop"
                ).mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[tag] = best
        t_nx[label] = times["Nx"]
        exp = math.log(times["Nx"] / times["1x"]) / math.log(scale)
        ratio = (
            f"{t_nx['exact'] / t_nx['approx']:.2f}x" if "approx" in t_nx else ""
        )
        print(
            f"{label:10s} {times['1x']:8.2f} {times['Nx']:8.2f} {exp:9.2f} {ratio:>16s}",
            flush=True,
        )

    # accuracy at Nx: max relative NDV error across profiled columns
    exact = {
        r["column"]: r["ndv"]
        for r in q132_profile_table(spark, args.scaled).collect()
    }
    approx = {
        r["column"]: r["ndv"]
        for r in q132_profile_table(spark, args.scaled, approx=True).collect()
    }
    worst = max(abs(approx[c] - exact[c]) / max(exact[c], 1) for c in exact)
    print(f"max relative NDV error at Nx: {worst:.4f} (rsd=0.05)")


if __name__ == "__main__":
    raise SystemExit(main())
