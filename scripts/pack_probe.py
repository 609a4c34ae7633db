"""Greedy-packing shard-count probe: measure the within-shard quadratic.

``ml/packing.pack_greedy`` folds each shard with one ``F.aggregate`` pass
whose accumulator concatenates the output array — O(m) copy per step,
O(m²) per shard of size m. The module docstring's scale contract is
"shards are the knob: size them so m stays bounded" (shard count grows
with the corpus, m stays ~constant, total work stays linear). This probe
measures both sides of that contract on the Nx documents build:

- FIXED shards (q77's demo constant, 8): m grows N× → expect super-linear
- SCALED shards (8·N): m constant → expect ~linear

Usage: python scripts/pack_probe.py [--sf /root/testdata/sf0.1]
       [--scaled /tmp/jobspark_scaled_x64] [--runs 2]
Requires the scaled documents build from scripts/scaling_probe.py
(--tables documents suffices).
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
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--base-shards", type=int, default=8)
    args = ap.parse_args()

    import pyarrow.parquet as _pq
    from pyspark.sql import functions as F

    from job_etl_spark.ml.packing import pack_greedy
    from job_etl_spark.session import get_spark
    from job_etl_spark.tables import parallel_table

    def _rows(path: str) -> int:
        p = Path(path) / "documents.parquet"
        if p.is_dir():
            return sum(
                _pq.ParquetFile(f).metadata.num_rows for f in p.glob("*.parquet")
            )
        return _pq.ParquetFile(p).metadata.num_rows

    # derive the true scale from the data (render_probe lesson: a stale
    # --scaled dir with a wrong assumed scale silently corrupts exponents)
    scale = _rows(args.scaled) / _rows(args.sf)
    print(
        f"base={args.sf} scaled={args.scaled} measured_scale={scale:.1f}",
        flush=True,
    )

    spark = get_spark("jobspark-pack-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run(sf_dir: str, shards: int) -> float:
        docs = parallel_table(spark, sf_dir, "documents")
        packed = pack_greedy(
            docs,
            key_col="doc_id",
            weight_col="n_chars",
            shard_col=(F.col("doc_id") % shards).cast("bigint"),
            order_col="doc_id",
            capacity=2000,
        )
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            packed.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        return best

    # JVM warmup
    run(args.sf, args.base_shards)

    t1 = run(args.sf, args.base_shards)
    n_scaled = int(round(args.base_shards * scale))
    rows = [
        ("fixed shards", args.base_shards, run(args.scaled, args.base_shards)),
        ("scaled shards", n_scaled, run(args.scaled, n_scaled)),
    ]
    print(f"1x baseline ({args.base_shards} shards): {t1:.2f}s")
    print(f"{'variant':14s} {'shards':>7s} {'t_Nx':>8s} {'exponent':>9s}")
    for label, shards, t in rows:
        exp = math.log(t / t1) / math.log(scale)
        print(f"{label:14s} {shards:7d} {t:8.2f} {exp:9.2f}", flush=True)


if __name__ == "__main__":
    main()
