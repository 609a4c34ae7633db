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
The bitmap is auto-sized to ~16 bits/key (count the build side, round up
to a power of two): an overloaded filter silently stops pruning — the
64 Kib default at 30k keys was 60% full and passed 36% of misses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_BITS_MIN = 1 << 16  # 8 KiB bitmap floor
M_BITS_MAX = 1 << 22  # 512 KiB cap — stays cheap as a plan literal
BITS_PER_KEY = 16  # ~0.4% FP at k=2
K_HASHES = 2


def _bit_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions from k seeded ``xxhash64`` evaluations (pmod for
    the negative half of the range). Unlike the md5 hashing everywhere
    else in this package, the bloom bits never need cross-engine parity —
    the filter is invisible in the result (exact semi-join after), so the
    fast JVM-native hash is the right choice: md5+conv measured ~4× the
    whole-probe cost at 600k rows."""
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def sized_m_bits(n_keys: int, bits_per_key: int = BITS_PER_KEY) -> int:
    m = M_BITS_MIN
    while m < n_keys * bits_per_key and m < M_BITS_MAX:
        m *= 2
    return m


def build_bloom(
    df: DataFrame,
    key_col: str,
    m_bits: int | None = None,
    k: int = K_HASHES,
) -> list[int]:
    """Aggregate the build side into a bitmap of ``m_bits/64`` words.

    ``m_bits=None`` (default) sizes the bitmap to ~BITS_PER_KEY bits/key
    in ONE pass (guide §2.3 — the r11 form ran a separate ``count()`` job
    over the build side whose only output was the sizing integer): the
    bitmap is aggregated at the CAP resolution while the key count rides
    the same job as an ``observe()`` metric, then the cap bitmap is
    folded down to the size the count implies. The fold is exact: every
    power-of-two ``m`` divides ``M_BITS_MAX``, so
    ``pmod(h, M_BITS_MAX) mod m == pmod(h, m)`` — bit ``p`` of the cap
    bitmap lands at ``p mod m``, and because 64 | m that is word
    ``word_idx mod (m/64)`` at the same in-word offset. OR-folding the
    cap words therefore reproduces bit-for-bit the bitmap a direct
    ``m``-sized build would produce. One explode (k rows/key) + one
    ``bit_or`` aggregate; the collect is bounded at ``M_BITS_MAX/64``
    rows (65536) regardless of build-side cardinality."""
    from pyspark.sql import Observation

    obs = None
    build_bits = m_bits
    if build_bits is None:
        build_bits = M_BITS_MAX
        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("n_keys"))
    bits = F.explode(F.array(*_bit_positions(F.col(key_col), build_bits, k))).alias("bit")
    words = (
        df.select(bits)
        .select(
            (F.col("bit") / 64).cast("int").alias("word_idx"),
            F.expr("shiftleft(1L, cast(bit % 64 AS int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()  # bounded: ≤ build_bits/64 rows
    )
    if obs is not None:
        m_bits = sized_m_bits(int(obs.get["n_keys"]))
    n_words = m_bits // 64
    bitmap = [0] * n_words
    for row in words:
        bitmap[int(row["word_idx"]) % n_words] |= int(row["word"])
    return bitmap


def might_contain(bitmap: list[int], key: Column, k: int = K_HASHES) -> Column:
    """True iff every one of the key's k bits is set — no false negatives.
    ``m_bits`` is implied by the bitmap length (64 bits/word)."""
    m_bits = len(bitmap) * 64
    # true array LITERALS (F.lit of a list), not CreateArray — CreateArray
    # re-materializes the 1024-element array PER ROW in codegen, which
    # turned the probe into the hot loop (measured 7 s vs <1 s on q92)
    words = F.lit(bitmap).cast("array<bigint>")
    # j=63 wraps to the sign bit — Python's 1<<63 overflows LongType
    powers = F.lit(
        [(1 << j) if j < 63 else -(1 << 63) for j in range(64)]
    ).cast("array<bigint>")
    cond = F.lit(True)
    for bit in _bit_positions(key, m_bits, k):
        word = F.element_at(words, (bit / 64).cast("int") + 1)
        mask = F.element_at(powers, (bit % 64).cast("int") + 1)
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_prefilter(
    probe: DataFrame, bitmap: list[int], key_col: str, k: int = K_HASHES
) -> DataFrame:
    """Keep probe rows whose k bloom bits are all set, via k broadcast
    hash joins against the non-zero bitmap words.

    Why joins and not ``might_contain``'s literal-array predicate: a
    complex-typed literal is re-evaluated per ROW in codegen, so probe
    cost grows with bitmap size (measured 0.8 s at 1024 words → 7.5 s at
    8192 on the same scan). The word table rides a broadcast exchange
    instead — sent once per executor, O(1) lookups, and zero words
    (bit range provably empty) never ship at all. Inner-joining on the
    word index IS the membership test: a missing word means no probe key
    hashing there can be present."""
    m_bits = len(bitmap) * 64
    spark = probe.sparkSession
    powers = F.lit(
        [(1 << j) if j < 63 else -(1 << 63) for j in range(64)]
    ).cast("array<bigint>")
    df = probe
    # ONE local word table, projected under per-hash names — the k joins
    # share the same non-zero words; building k identical DataFrames paid
    # the local-relation conversion k times
    word_table = spark.createDataFrame(
        [(w_idx, w) for w_idx, w in enumerate(bitmap) if w != 0],
        "_bl_w int, _bl_word bigint",
    )
    for i, bit in enumerate(_bit_positions(F.col(key_col), m_bits, k)):
        words = word_table.select(
            F.col("_bl_w").alias(f"_bl_w{i}"), F.col("_bl_word").alias(f"_bl_word{i}")
        )
        df = df.withColumn(f"_bl_w{i}", (bit / 64).cast("int")).withColumn(
            f"_bl_m{i}", F.element_at(powers, (bit % 64).cast("int") + 1)
        )
        df = df.join(F.broadcast(words), f"_bl_w{i}", "inner").where(
            F.col(f"_bl_word{i}").bitwiseAND(F.col(f"_bl_m{i}")) != 0
        )
    return df.drop(
        *[c for i in range(k) for c in (f"_bl_w{i}", f"_bl_m{i}", f"_bl_word{i}")]
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    m_bits: int | None = None,
    k: int = K_HASHES,
) -> DataFrame:
    """Exact ``probe SEMI JOIN build`` with a bloom prefilter on the probe
    side. The prefilter rides broadcast exchanges, so it composes with
    predicate pushdown (md5 itself doesn't push, but the row count
    entering the semi-join's shuffle drops by the filter selectivity)."""
    build_key = build_key or probe_key
    bitmap = build_bloom(build.select(build_key), build_key, m_bits, k)
    pre = bloom_prefilter(probe, bitmap, probe_key, k)
    return pre.join(
        build.select(F.col(build_key).alias(probe_key)).distinct(),
        probe_key,
        "left_semi",
    )
