"""A/B the q157 composition variants (guide §1: measure, don't guess):

v0  two independent generator pipelines (the r11 form: tok=None)
v1  shared token frame, lazily checkpointed (one tokenize, 2-phase jobs)
v2  shared token frame passed UNmaterialized (same subplan in both arms —
    probes whether ReuseExchange dedupes the fan-out exchange)

Usage: python scripts/q157_probe.py [--sf /root/testdata/sf0.1] [--runs 4]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def build(spark, sf, mode):
    from job_etl_spark.queries.evaluation import _q157_tok
    from job_etl_spark.queries.lifedata import q29_minhash_lsh, q31_simhash_neardup

    if mode == "v0":
        tok = None
    elif mode == "v1":
        tok = _q157_tok(spark, sf).localCheckpoint(eager=False)
    else:
        tok = _q157_tok(spark, sf)
    mh = q29_minhash_lsh(spark, sf, tok=tok).select("doc_a", "doc_b").withColumn(
        "m", F.lit(1)
    )
    sh = q31_simhash_neardup(spark, sf, tok=tok).select("doc_a", "doc_b").withColumn(
        "s", F.lit(1)
    )
    j = mh.join(sh, ["doc_a", "doc_b"], "full_outer")
    return j.agg(
        F.count(F.when(F.col("m").isNotNull() & F.col("s").isNotNull(), 1)).alias("n_both"),
        F.count(F.when(F.col("m").isNotNull() & F.col("s").isNull(), 1)).alias("n_minhash_only"),
        F.count(F.when(F.col("m").isNull() & F.col("s").isNotNull(), 1)).alias("n_simhash_only"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    from job_etl_spark.session import get_spark

    spark = get_spark("q157-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1 << 20).selectExpr("sum(id*2) s").write.format("noop").mode("overwrite").save()

    rows = {m: build(spark, args.sf, m).collect() for m in ("v0", "v1", "v2")}
    assert rows["v0"] == rows["v1"] == rows["v2"], rows
    print("parity OK", rows["v0"])

    import gc

    jvm_gc = spark.sparkContext._jvm.System.gc
    for mode in ("v0", "v1", "v2", "v0", "v1", "v2"):
        best = float("inf")
        for _ in range(args.runs):
            df = build(spark, args.sf, mode)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
            gc.collect()
            jvm_gc()
        print(f"{mode}: min-of-{args.runs} {best:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
