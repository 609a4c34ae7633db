"""Exercise ``max_bucket`` in anger: the adversarial-density guard sweep.

On the docskew table (N full salted copies of sf0.1 documents forced
into ONE (lang='en', source='web') block — `scaling_probe.py --mode
docskew` builds it), ``simhash_block_pairs``'s residual cost is
Σ_buckets B² with B ≈ n_block / 2^band_width. ``max_bucket`` drops
buckets above a cap, trading recall for a hard bound on per-task work.
Capping only ever REMOVES candidate pairs (a dropped bucket generates
nothing; surviving buckets are untouched), so the capped output is a
strict subset of the exact output and recall is the pair-count ratio.

This probe sweeps the cap and prints, per setting:
  - wall-clock (min of --runs)
  - pairs emitted + recall vs the exact (cap=None) run
  - buckets dropped / total buckets ≥ 2
plus the bucket-size distribution that makes the numbers interpretable.
Results + the resulting deployment policy are recorded in SCALING.md.

Usage: python scripts/max_bucket_probe.py [--scale 8] [--runs 2]
       [--caps 4096 1024 256]
(reuses /tmp/jobspark_scaled_docskew{scale} if present, else builds it)
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/jobspark_scaled")
    ap.add_argument("--scale", type=int, default=8)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--caps", type=int, nargs="*", default=[4096, 1024, 256])
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from job_etl_spark.ml.dedup import simhash_block_pairs, with_simhash
    from job_etl_spark.session import get_spark
    from scripts.scaling_probe import build_docskew

    spark = get_spark("jobspark-maxbucket")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = f"{args.out}_docskew{args.scale}"
    if not os.path.exists(f"{out_dir}/documents.parquet"):
        build_docskew(spark, args.sf, out_dir, args.scale)

    docs = spark.read.parquet(f"{out_dir}/documents.parquet")
    sigs = with_simhash(docs, "text", "simhash").select(
        "lang", "source", "doc_id", "simhash"
    )
    # one materialization of the signature table so every sweep setting
    # times CANDIDATE GENERATION, not the shared upstream minhash pipeline
    sigs = sigs.localCheckpoint()

    # bucket-size distribution at the exact setting: the Σ B² driver
    nb = 9  # max_hamming 8 → 9 bands (the q31 setting)
    base, extra = divmod(60, nb)
    bval = (
        f"shiftrightunsigned(simhash, CAST(_band * {base} + least(_band, {extra}) AS INT)) "
        f"& CAST(CASE WHEN _band < {extra} THEN {(1 << (base + 1)) - 1} "
        f"ELSE {(1 << base) - 1} END AS BIGINT)"
    )
    bsz = (
        sigs.select(
            "lang", "source", "simhash",
            F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("_band"),
        )
        .withColumn("_bval", F.expr(bval))
        .groupBy("lang", "source", "_band", "_bval")
        .count()
        .where(F.col("count") >= 2)
    )
    dist = bsz.agg(
        F.count("*").alias("buckets"),
        F.max("count").alias("max_B"),
        F.expr("percentile_approx(count, 0.99)").alias("p99_B"),
        F.sum(F.col("count") * F.col("count")).alias("sum_B2"),
    ).first()
    print(
        f"buckets>=2: {dist['buckets']}  max B: {dist['max_B']}  "
        f"p99 B: {dist['p99_B']}  ΣB²: {dist['sum_B2']}",
        flush=True,
    )
    caps_over = {
        c: bsz.where(F.col("count") > c).count() for c in args.caps
    }

    exact_pairs = None
    print(f"{'cap':>8s} {'t(s)':>8s} {'pairs':>10s} {'recall':>8s} {'dropped_buckets':>16s}")
    for cap in [None] + args.caps:
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            n = simhash_block_pairs(
                sigs, ("lang", "source"), max_hamming=8, max_bucket=cap
            ).count()
            best = min(best, time.perf_counter() - t0)
        if exact_pairs is None:
            exact_pairs = n
        recall = n / max(exact_pairs, 1)
        print(
            f"{str(cap):>8s} {best:8.1f} {n:10d} {recall:8.4f} "
            f"{caps_over.get(cap, 0):16d}",
            flush=True,
        )


if __name__ == "__main__":
    main()
