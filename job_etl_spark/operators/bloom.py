"""Bloom-filter semi-join pruning — a hand-rolled runtime filter.

Spark's own runtime row-group filtering (`spark.sql.optimizer.runtime.
bloomFilter.enabled`) injects bloom filters only under its cost model;
this operator makes the pattern explicit and portable: build a bloom
filter over the (small) key side with ONE aggregate, broadcast it as a
literal bitmap, and prefilter the (huge) probe side BEFORE the exact
semi-join. At 100 TB the payoff is shuffle volume: the probe side that
reaches the join shrinks by the filter's selectivity, and the bitmap
itself costs ``m_bits/8`` bytes once per executor (a plan literal —
no shuffle, no broadcast join node).

The filter is exact-superset by construction (no false negatives), so
``bloom_semi_join == plain semi-join`` always — which is precisely the
oracle check in q92.

All hashing is md5-derived (engine-stable, like ml/dedup), k seeded
double-hashing bits over an ``m_bits`` bitmap packed into 64-bit words.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_BITS_DEFAULT = 1 << 16  # 8 KiB bitmap
K_HASHES = 2


def _bit_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions via double hashing: h1 + i·h2 mod m (Kirsch-
    Mitzenmacher), both halves of one md5 — one hash evaluation per key."""
    hex32 = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(hex32, 1, 15), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(hex32, 17, 15), 16, 10).cast("bigint")
    return [(h1 + F.lit(i) * h2) % F.lit(m_bits) for i in range(k)]


def build_bloom(
    df: DataFrame, key_col: str, m_bits: int = M_BITS_DEFAULT, k: int = K_HASHES
) -> list[int]:
    """Aggregate the build side into a bitmap of ``m_bits/64`` words.

    One explode (k rows/key) + one ``bit_or`` aggregate; the collect is
    bounded at ``m_bits/64`` rows (1024 for the default 64 Kib filter)
    regardless of build-side cardinality."""
    bits = F.explode(F.array(*_bit_positions(F.col(key_col), m_bits, k))).alias("bit")
    words = (
        df.select(bits)
        .select(
            (F.col("bit") / 64).cast("int").alias("word_idx"),
            F.expr("shiftleft(1L, cast(bit % 64 AS int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()  # bounded: ≤ m_bits/64 rows
    )
    bitmap = [0] * (m_bits // 64)
    for row in words:
        bitmap[int(row["word_idx"])] = int(row["word"])
    return bitmap


def might_contain(
    bitmap: list[int], key: Column, m_bits: int = M_BITS_DEFAULT, k: int = K_HASHES
) -> Column:
    """True iff every one of the key's k bits is set — no false negatives."""
    words = F.array(*[F.lit(w).cast("bigint") for w in bitmap])
    # j=63 wraps to the sign bit — Python's 1<<63 overflows LongType
    powers = F.array(
        *[
            F.lit((1 << j) if j < 63 else -(1 << 63)).cast("bigint")
            for j in range(64)
        ]
    )
    cond = F.lit(True)
    for bit in _bit_positions(key, m_bits, k):
        word = F.element_at(words, (bit / 64).cast("int") + 1)
        mask = F.element_at(powers, (bit % 64).cast("int") + 1)
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_HASHES,
) -> DataFrame:
    """Exact ``probe SEMI JOIN build`` with a bloom prefilter on the probe
    side. The prefilter is a plan literal, so it composes with predicate
    pushdown (md5 itself doesn't push, but the shuffled row count drops)."""
    build_key = build_key or probe_key
    bitmap = build_bloom(build.select(build_key), build_key, m_bits, k)
    pre = probe.where(might_contain(bitmap, F.col(probe_key), m_bits, k))
    return pre.join(
        build.select(F.col(build_key).alias(probe_key)).distinct(),
        probe_key,
        "left_semi",
    )
