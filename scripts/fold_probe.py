"""A/B probe for the simhash fold formulations (guide §1.2: measure the
per-task work before rewriting it).

Current form (ml/dedup.simhash_from_hashes_expr): per token, build a
60-wide contrib array (transform over powers) THEN zip_with-add it into
the accumulator — two interpreted array traversals + one intermediate
allocation per token.

Fused form: one zip_with(acc, powers) whose lambda tests the token hash
against the power directly — one traversal, no intermediate array.
Bit-identical: same integer adds in the same order, only the
intermediate materialization disappears.

Also probes the minhash signature: current = k independent transform+
array_min traversals of the hash array; fused = one aggregate over the
hashes carrying a k-wide running-min vector (zip_with against a
zipped (a,b) coefficient struct array).

Usage: python scripts/fold_probe.py [--sf /root/testdata/sf0.1] [--runs 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import Column
from pyspark.sql import functions as F


def fused_simhash(hs: Column, n_tokens: Column, bits: int = 60) -> Column:
    from job_etl_spark.functions.sqllit import lit_bigint_array

    powers = lit_bigint_array(1 << j for j in range(bits))

    def merge(acc, h):
        return F.zip_with(
            acc,
            powers,
            lambda s, p: s
            + F.when(h.bitwiseAND(p) != 0, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("bigint"),
        )

    sums = F.aggregate(hs, F.array_repeat(F.lit(0).cast("bigint"), bits), merge)
    packed = F.aggregate(
        F.zip_with(
            sums, powers, lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("bigint"))
        ),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    return F.when(n_tokens > 0, packed)


def fused_minhash(hashes: Column, k: int = 16) -> Column:
    from job_etl_spark.functions.sqllit import cached_expr, sql_bigint
    from job_etl_spark.ml.dedup import MINHASH_PRIME, minhash_coefficients

    a, b = minhash_coefficients(k)
    ab = cached_expr(
        "array("
        + ",".join(
            f"named_struct('a', {sql_bigint(x)}, 'b', {sql_bigint(y)})"
            for x, y in zip(a, b)
        )
        + ")"
    )
    init = F.array_repeat(F.lit(MINHASH_PRIME).cast("bigint"), k)
    sig = F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc, ab, lambda m, c: F.least(m, (c["a"] * h + c["b"]) % MINHASH_PRIME)
        ),
    )
    return F.when(F.size(hashes) > 0, sig)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from job_etl_spark.ml.dedup import (
        hexint,
        minhash_signature_expr,
        shingle_hashes_expr,
        shingles_expr,
        simhash_from_hashes_expr,
        tokens_expr,
    )
    from job_etl_spark.session import get_spark
    from job_etl_spark.tables import parallel_table

    spark = get_spark("fold-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = parallel_table(spark, args.sf, "documents")
    hs = docs.select(
        "doc_id", F.transform(tokens_expr("text"), hexint).alias("_hs"),
        F.size(tokens_expr("text")).alias("_n"),
    )
    sh = docs.where(F.size(tokens_expr("text")) >= 3).select(
        "doc_id",
        shingle_hashes_expr(shingles_expr(tokens_expr("text"))).alias("_sh"),
    )

    cases = {
        "simhash_current": hs.select(
            "doc_id", simhash_from_hashes_expr(F.col("_hs"), F.col("_n")).alias("sig")
        ),
        "simhash_fused": hs.select(
            "doc_id", fused_simhash(F.col("_hs"), F.col("_n")).alias("sig")
        ),
        "minhash_current": sh.select(
            "doc_id", minhash_signature_expr(F.col("_sh")).alias("sig")
        ),
        "minhash_fused": sh.select(
            "doc_id", fused_minhash(F.col("_sh")).alias("sig")
        ),
    }
    # parity first (cheap at sf0.01-level volume): fused must be row-identical
    a = cases["simhash_current"].orderBy("doc_id").collect()
    b = cases["simhash_fused"].orderBy("doc_id").collect()
    assert a == b, "simhash fused mismatch"
    a = cases["minhash_current"].orderBy("doc_id").collect()
    b = cases["minhash_fused"].orderBy("doc_id").collect()
    assert a == b, "minhash fused mismatch"
    print("parity OK")

    for name, df in cases.items():
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: min-of-{args.runs} {best:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
