"""Deterministic distributed sampling.

Every sampler here is RNG-free: membership derives from md5 of the row
key, so a sample is reproducible across runs, engines, partitionings and
retries — the property that matters when a 1000-executor job must be
resumable and auditable. (`rand()`-based sampling changes under AQE
re-planning and task retry; these do not.)

- ``deterministic_group_sample``: per-group uniform k-sample = the k
  smallest key hashes per group (the order statistics of a uniform hash
  ARE a uniform sample). Two-phase salted top-k, so no group — however
  hot — ever sorts in a single partition. Same shape as
  ``operators/sketch.kmv_sketch``; a sample and a distinct sketch are
  the same computation with different outputs.

Rate-based deterministic samplers (hash-threshold splits, stratified
rates, temperature mixtures) live as query shapes q59/q84/q90.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from job_etl_spark.ml.dedup import hexint


def deterministic_group_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    k: int,
    seed: str = "samp",
    salt_buckets: int = 64,
) -> DataFrame:
    """k rows per group, chosen by smallest md5(seed|key) — uniform,
    deterministic, skew-immune. Adds a ``sample_rank`` column (1..k by
    hash order).

    PRECONDITION: ``key_col`` must be unique per row (a primary key).
    Rows sharing a key share a hash, the ordering ties, and which
    physical row wins rank becomes partition-dependent — exactly the
    nondeterminism this operator exists to rule out. Dedup or add a
    discriminator to the key first."""
    h = hexint(F.concat(F.lit(f"{seed}|"), F.col(key_col).cast("string")))
    hashed = df.withColumn("_h", h)
    w1 = Window.partitionBy(*group_cols, F.col("_h") % salt_buckets).orderBy(
        "_h", key_col
    )
    cand = (
        hashed.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("_h", key_col)
    return (
        cand.withColumn("sample_rank", F.row_number().over(w2))
        .where(F.col("sample_rank") <= k)
        .drop("_h")
    )
