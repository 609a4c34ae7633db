"""BPE merge induction — tokenizer training as a distributed job.

Each round: count adjacent token pairs (one explode + hash agg), take
the most frequent (1-row TakeOrdered; ties on pair text), rewrite the
corpus with the merge applied (map-only). The corpus is serialized with
DOUBLE spaces between tokens so the single-space-bounded search pattern
``' a  b '`` implements exact greedy left-to-right non-overlapping
replacement — 'a a a' merges once, 'a b a b' merges twice — with
identical semantics in Java and DuckDB ``replace()``.

At 100 TB each round is a full corpus pass; production tokenizer
training subsamples first (operators/sampling.py) — the algebra is
unchanged. Merged tokens join their parts with '+'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def serialize_corpus(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One column ``s``: double-space-joined whitespace tokens, lowered."""
    from job_etl_spark.functions.chunking import tokens_expr

    s = F.concat(F.lit("  "), F.array_join(tokens_expr(text_col), "  "), F.lit("  "))
    return docs.where(F.col(text_col).isNotNull()).select(s.alias("s"))


def learn_merges(corpus: DataFrame, rounds: int) -> list[tuple[int, str, int]]:
    """[(step, merged_token, pair_count)] — the merge table. ``corpus``
    is a ``serialize_corpus`` output; each winning pair is embedded as a
    plan literal (the bounded-collect codebook pattern)."""
    steps: list[tuple[int, str, int]] = []
    for step in range(rounds):
        toks = F.filter(F.split(F.col("s"), r"\s+"), lambda x: x != "")
        n = F.size(toks)
        pairs = corpus.select(
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
                    F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("pair")
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, n_occ = top[0]["pair"], int(top[0]["n"])
        merged = pair.replace(" ", "+")
        steps.append((step, merged, n_occ))
        # truncate lineage: without this, round r replays all r prior
        # rewrites over the source — O(R²) corpus passes and an R-deep
        # plan; checkpointing keeps it at one pass per round. LAZY: the
        # next round's pair-count collect is the action that materializes
        # it, so each round runs exactly ONE job instead of
        # checkpoint-then-count's two (the cluster.py _propagate rule);
        # the final round's rewrite is never materialized at all.
        corpus = apply_merge(corpus, pair).localCheckpoint(eager=False)
    return steps


def learn_merges_sampled(
    docs: DataFrame,
    rounds: int,
    k_per_group: int,
    group_cols: tuple[str, ...] = ("lang", "source"),
    key_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "bpe",
) -> list[tuple[int, str, int]]:
    """Subsampled BPE training — the 100 TB composition the module
    docstring promises: ``deterministic_group_sample`` (k docs per
    (lang, source) group, md5-ordered — uniform, deterministic,
    skew-immune, no RNG) feeds ``learn_merges``, so the R full corpus
    passes run over a bounded sample instead of the whole corpus.

    Validity regime: tokenizer statistics concentrate in the head of the
    pair-frequency distribution (natural corpora are Zipfian), so a
    uniform sample preserves the merge ORDER as long as head pair counts
    dominate sampling noise — the property the stability test pins on a
    skewed fixture. On a near-flat distribution (noise text) the head is
    not identifiable from any subsample, and subsampled training is as
    arbitrary as the tie-break; no sampling rate fixes that.

    Stratifying by (lang, source) keeps every slice represented at the
    same rate, so one dominant source can't silently own the tokenizer.
    """
    from job_etl_spark.operators.sampling import deterministic_group_sample

    sample = deterministic_group_sample(
        docs, list(group_cols), key_col, k_per_group, seed=seed
    ).drop("sample_rank")
    return learn_merges(serialize_corpus(sample, text_col), rounds)


def apply_merge(corpus: DataFrame, pair: str) -> DataFrame:
    """Map-only rewrite: ``' a  b '`` → ``' a+b '`` (greedy left-to-right
    non-overlapping; the double-space layout keeps neighbors matchable)."""
    merged = pair.replace(" ", "+")
    return corpus.select(
        F.replace(
            F.col("s"), F.lit(f" {pair.replace(' ', '  ')} "), F.lit(f" {merged} ")
        ).alias("s")
    )
