"""Skew mitigation (SURVEY §4.2.5: "salted joins only if skew appears").

First line of defense is AQE (``skewJoin.enabled`` is on in the session
factory): at runtime it splits oversized partitions. These helpers are
the manual fallback for the cases AQE can't fix — a skewed aggregation
key, or a skewed join where neither side broadcasts:

- ``salted_agg_count``: two-phase aggregation — partial count per
  (key, salt) spreads the hot key over N reducers, final sums the salts.
- ``salted_join``: the skewed side gets a random salt in [0, N); the
  other side is exploded N× so every (key, salt) pair still meets.
  Row→salt assignment needn't be deterministic — only uniform.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def salted_agg_count(
    df: DataFrame, keys: Sequence[str], salt_buckets: int = DEFAULT_SALT_BUCKETS
) -> DataFrame:
    """COUNT per key with a salted partial phase. Result == plain
    ``groupBy(keys).count()`` but the first shuffle spreads hot keys over
    ``salt_buckets`` partitions."""
    keys = list(keys)
    salted = df.withColumn("_salt", (F.rand(42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").alias("count"))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys and ``other`` is too big to
    broadcast: salt the skewed side, replicate the other side per salt,
    join on (keys + salt), drop the salt. Row multiplicity is preserved —
    each skewed row joins exactly the same matches as the plain join.

    Only skewed-side-preserving join types are supported: with
    right/full_outer, every unmatched ``other`` replica would emit its
    own null-padded row (×salt_buckets multiplicity)."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}; "
            "right/full joins would multiply unmatched other-side rows "
            "by salt_buckets"
        )
    keys = list(keys)
    s = skewed.withColumn("_salt", (F.rand(42) * salt_buckets).cast("int"))
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = s.join(o, keys + ["_salt"], how)
    return out.drop("_salt")
