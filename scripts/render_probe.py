"""Stage-split probe for the multimodal near-dup pipeline (q159/q160):
times (a) the signature stage (token-count prefilter + with_simhash),
(b) signatures + the Arrow-batched mapInPandas codec render, and (c) the
full banded near-dup pipeline, each at 1x and Nx — so the render stage's
own scaling exponent is measured separately from the banding generator
(the r5 verdict noted the render stage had never been probed on its own).

Usage: python scripts/render_probe.py [--scale 64] [--sf /root/testdata/sf0.1]
       [--scaled /tmp/jobspark_scaled_x64] [--runs 2]
Requires the scaled build from scripts/scaling_probe.py.
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _stages(spark, sf: str):
    from pyspark.sql import functions as F

    from job_etl_spark.ml.dedup import tokens_expr, with_simhash
    from job_etl_spark.ml.multimodal import image_neardup_pairs
    from job_etl_spark.queries.lifedata import (
        _Q159_MAX_HAMMING,
        _q159_render,
        parallel_table,
    )

    docs = parallel_table(spark, sf, "documents").where(
        F.size(tokens_expr("text")) > 0
    )
    sigs = with_simhash(docs, "text", "simhash").select(
        F.col("doc_id").alias("media_id"), "simhash"
    )
    media = sigs.mapInPandas(_q159_render, "media_id bigint, payload binary")
    full = image_neardup_pairs(media, max_hamming=_Q159_MAX_HAMMING)
    return {"sig": sigs, "sig+render": media, "full": full}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=64)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--scaled", default="/tmp/jobspark_scaled_x64")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from job_etl_spark.session import get_spark

    spark = get_spark("jobspark-render-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM
    _stages(spark, args.sf)["sig"].write.format("noop").mode("overwrite").save()

    # Derive the scale from the data itself (documents row-count ratio via
    # parquet footers) rather than trusting --scale: pointing --scaled at
    # an x16 build while leaving --scale 64 would silently print a wrong
    # exponent (ADVICE r6). --scale remains only as a sanity cross-check.
    import pyarrow.parquet as _pq

    def _rows(sfd: str) -> int:
        p = Path(sfd) / "documents.parquet"
        if p.is_dir():
            return sum(
                _pq.ParquetFile(f).metadata.num_rows
                for f in sorted(p.glob("*.parquet"))
            )
        return _pq.ParquetFile(p).metadata.num_rows

    measured_scale = _rows(args.scaled) / _rows(args.sf)
    print(
        f"base={args.sf} scaled={args.scaled} "
        f"measured_scale={measured_scale:.1f} (--scale {args.scale})"
    )
    if abs(measured_scale - args.scale) / args.scale > 0.05:
        print(
            f"WARNING: --scale {args.scale} disagrees with the measured "
            f"row ratio {measured_scale:.1f}; exponents use the MEASURED scale"
        )

    print(f"{'stage':12s} {'t_1x':>8s} {'t_Nx':>8s} {'exponent':>9s}")
    for stage in ("sig", "sig+render", "full"):
        times = {}
        for label, sfd in (("1x", args.sf), ("Nx", args.scaled)):
            best = float("inf")
            for _ in range(args.runs):
                df = _stages(spark, sfd)[stage]
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[label] = best
        exp = math.log(times["Nx"] / times["1x"]) / math.log(measured_scale)
        print(
            f"{stage:12s} {times['1x']:8.2f} {times['Nx']:8.2f} {exp:9.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
