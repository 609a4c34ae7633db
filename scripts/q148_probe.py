"""A/B the q148 iteration-materialization variants (guide §1):

v0  per-iteration lazy localCheckpoint on ranks (the r11 form): each
    iteration's materialization is its own job cascade
v1  no per-iteration checkpoint (the r12 form): K=3 fixed, bounded
    lineage, ONE action plans all three iterations

Both run in the SAME session back-to-back so box weather and JVM warmup
cancel; parity of the top-20 rows is asserted every run.

Usage: python scripts/q148_probe.py [--sf /root/testdata/sf0.1] [--runs 4]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def build(spark, sf, mode):
    from job_etl_spark.queries.graphs import _PR_DAMP, _PR_ITERS, _PR_TOP, _edges, _r12
    from job_etl_spark.tables import table

    e = _edges(spark, sf)
    sym = e.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionAll(e.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
    sym = sym.localCheckpoint(eager=False)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=False
    )
    docs = table(spark, sf, "documents").select("doc_id")
    n = docs.count()
    teleport = 0.15 / n
    ranks = docs.select("doc_id", _r12(F.lit(1.0 / n)).alias("rank"))
    for _ in range(_PR_ITERS):
        contribs = (
            sym.join(ranks, sym.u == ranks.doc_id)
            .join(deg, "u")
            .select(
                F.col("v").alias("doc_id"),
                _r12(F.col("rank") / F.col("deg")).alias("contrib"),
            )
        )
        sums = contribs.groupBy("doc_id").agg(
            F.sum(F.col("contrib").cast("decimal(30,12)")).alias("s")
        )
        ranks = docs.join(sums, "doc_id", "left").select(
            "doc_id",
            _r12(
                F.lit(teleport)
                + F.lit(_PR_DAMP)
                * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
            ).alias("rank"),
        )
        if mode == "v0":
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.orderBy(F.desc("rank"), "doc_id").limit(_PR_TOP)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    from job_etl_spark.session import get_spark

    spark = get_spark("q148-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup (codegen/JVM)
    build(spark, args.sf, "v1").write.format("noop").mode("overwrite").save()

    ref = None
    for mode in ("v0", "v1", "v0", "v1"):
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = build(spark, args.sf, mode)
            rows = df.collect()
            times.append(time.perf_counter() - t0)
            got = [(r["doc_id"], r["rank"]) for r in rows]
            if ref is None:
                ref = got
            assert got == ref, f"{mode}: rows diverge"
        print(f"{mode}: min {min(times):.3f}s  runs {[f'{t:.3f}' for t in times]}")


if __name__ == "__main__":
    main()
