"""Greedy sequence packing — batching documents into fixed-capacity
training examples (context windows).

LLM pretraining pipelines pack variable-length documents into
fixed-token-budget examples to avoid padding waste. Exact greedy packing
is a sequential fold (each placement depends on the running fill), which
does not distribute — so, as production pipelines do, we shard first:
documents are hash-sharded, ordered deterministically within the shard,
and packed greedily per shard. Sharding is the scale knob — shards pack
independently on executors, and the only shuffle is the groupBy(shard).

The per-shard fold follows the q63/simhash lesson: ONE ``F.aggregate``
pass over a collected array with a struct accumulator (HOFs are
interpreted — N passes cost N traversals), not an iterative join. A shard
must fit in one task's memory (arrays of (order, key, weight) structs);
size shards accordingly (e.g. doc_id % (corpus_bytes / 256 MB)).

Greedy rule: place each item into the current pack if it fits, else open
a new pack. An item wider than the capacity gets a pack of its own (never
split, never dropped — truncation is a separate, explicit policy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    shard_col: Column,
    order_col: str,
    capacity: int,
) -> DataFrame:
    """Assign every row a (shard, packno) — greedy first-fit-in-order.

    Returns one row per input row: (shard, <key_col>, <weight_col>, packno).
    Deterministic for a given (shard_col, order_col): array_sort fixes the
    fold order regardless of physical partitioning.
    """
    items = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(order_col).alias("ord"),
                F.col(key_col).alias("key"),
                F.col(weight_col).cast("long").alias("w"),
            )
        )
    )
    sharded = df.groupBy(shard_col.alias("shard")).agg(items.alias("items"))

    init = F.named_struct(
        F.lit("cur"), F.lit(0).cast("long"),
        F.lit("packno"), F.lit(0).cast("long"),
        F.lit("out"), F.array().cast("array<struct<key:bigint,w:bigint,packno:bigint>>"),
    )

    def step(acc: Column, it: Column) -> Column:
        fits = (acc["cur"] == 0) | ((acc["cur"] + it["w"]) <= capacity)
        packno = F.when(fits, acc["packno"]).otherwise(acc["packno"] + 1)
        cur = F.when(fits, acc["cur"] + it["w"]).otherwise(it["w"])
        entry = F.named_struct(
            F.lit("key"), it["key"], F.lit("w"), it["w"], F.lit("packno"), packno
        )
        return F.named_struct(
            F.lit("cur"), cur,
            F.lit("packno"), packno,
            F.lit("out"), F.concat(acc["out"], F.array(entry)),
        )

    folded = sharded.select(
        "shard",
        F.aggregate(F.col("items"), init, step)["out"].alias("out"),
    )
    row = F.explode("out").alias("r")
    return folded.select("shard", row).select(
        "shard",
        F.col("r.key").alias(key_col),
        F.col("r.w").alias(weight_col),
        F.col("r.packno").alias("packno"),
    )


def pack_stats(packed: DataFrame, weight_col: str, capacity: int) -> DataFrame:
    """Per-pack fill statistics — the waste metric packing exists to cut."""
    w = weight_col
    return packed.groupBy("shard", "packno").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(w).alias("pack_weight"),
        F.round(F.sum(w) / F.lit(float(capacity)), 4).alias("fill_ratio"),
    )
