"""Similarity search over embedding columns.

- ``cosine_expr``: exact cosine via zip_with/aggregate — JVM-side, no UDF.
- ``brute_force_topk``: the exact baseline — broadcast the (small) query
  set against the full corpus, rank per query. One pass over the corpus.
- Random-hyperplane LSH (``plane_matrix`` + ``bucket_expr``): the scale
  path. P sign-bits of projections onto deterministic pseudo-random
  hyperplanes (md5-seeded, engine-reproducible) → a 2^P-way bucket id.
  Candidates come from a bucket-equality JOIN (hash-partitioned on the
  bucket), then exact cosine re-ranks within buckets — no all-pairs
  comparison, shuffle keyed on bucket only. Recall/cost tunes with P.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from job_etl_spark.functions.sqllit import (
    cached_expr,
    sql_double,
    sql_double_array,
    sql_int,
)

DEFAULT_PLANES = 8


def cosine_expr(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def py_cosine(a: list[float], b: list[float]) -> float | None:
    """Driver-side bit-exact replica of ``cosine_expr`` for bounded
    collected vectors: the dot is the same left-to-right IEEE fold as the
    Spark aggregate, the norms are ``_py_norm``, and the final division/
    multiplication are single IEEE ops on identical operands. Returns
    None where the expression yields NaN (a zero-norm side)."""
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    denom = _py_norm(a) * _py_norm(b)
    if denom == 0.0:
        return None
    return dot / denom


def _py_norm(vec: list[float]) -> float:
    # same left-to-right IEEE fold as the Spark aggregate, so the literal
    # is bit-identical to sqrt(aggregate(transform(v, x->x*x), 0.0, +))
    s = 0.0
    for x in vec:
        s += x * x
    import math

    return math.sqrt(s)


def plane_matrix(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-0.5, 0.5): component
    (p, d) = (int(md5("p,d")[:15], 16) % 1000)/1000 − 0.5. md5-seeded so
    any engine (or the DuckDB oracle) reproduces the exact same floats."""
    return [
        [
            (int(hashlib.md5(f"{p},{d}".encode()).hexdigest()[:15], 16) % 1000) / 1000.0 - 0.5
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit p set iff dot(vec, plane_p) > 0.

    Shaped as ONE higher-order transform over a literal (weight, plane)
    array rather than P unrolled aggregates: the dot-product lambda is
    codegen'd once and looped, so plan analysis + janino compile stay
    O(1) in P instead of O(P) — same IEEE arithmetic, same bucket ids.
    The literal array is rendered as one SQL string (functions/sqllit.py)
    so driver-side construction is one call, not P×dim py4j round trips."""
    mat = cached_expr(
        "array("
        + ",".join(
            f"named_struct('w',{sql_int(1 << p)},'v',{sql_double_array(plane)})"
            for p, plane in enumerate(planes)
        )
        + ")"
    )
    bits = F.transform(
        mat, lambda e: F.when(_dot(vec, e["v"]) > 0, e["w"]).otherwise(F.lit(0))
    )
    return F.aggregate(bits, F.lit(0), lambda s, x: s + x)


def banded_bucket_expr(vec: Column, band_planes: list[list[list[float]]]) -> Column:
    """All LSH bands in ONE expression: array<struct<band_id, bucket>>.
    Nested transform over a literal (band → (weight, plane)) structure —
    the dot-product lambda is compiled once, looped bands × planes times.
    Per-band bucket ids are identical to ``bucket_expr`` on that band."""
    bands = cached_expr(
        "array("
        + ",".join(
            f"named_struct('band_id',{sql_int(i)},'planes',array("
            + ",".join(
                f"named_struct('w',{sql_int(1 << p)},'v',{sql_double_array(plane)})"
                for p, plane in enumerate(band)
            )
            + "))"
            for i, band in enumerate(band_planes)
        )
        + ")"
    )
    return F.transform(
        bands,
        lambda b: F.struct(
            b["band_id"].alias("band_id"),
            F.aggregate(
                F.transform(
                    b["planes"],
                    lambda e: F.when(_dot(vec, e["v"]) > 0, e["w"]).otherwise(F.lit(0)),
                ),
                F.lit(0),
                lambda s, x: s + x,
            ).alias("bucket"),
        ),
    )


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "vec",
) -> DataFrame:
    """Exact top-k: queries broadcast (bounded query sets), corpus scanned
    once; per-query rank via window."""
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    pairs = corpus.crossJoin(F.broadcast(q)).where(F.col(id_col) != F.col("q_id"))
    sim = cosine_expr(F.col("q_vec"), F.col(vec_col))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        pairs.withColumn("sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("q_id", "rn", F.col(id_col).alias("neighbor_id"), "sim")
    )


def assign_centroid(
    vec: Column, centroids: list[tuple[int, list[float]]]
) -> Column:
    """Map-only coarse quantization: nearest centroid id by cosine, ties
    to the smallest id — an ``array_max`` over (sim, -id) structs built by
    ONE transform over the literal codebook, so the cosine lambda is
    codegen'd once and looped over C entries (not C unrolled copies).
    No shuffle, no window; scales as a pure projection. The row norm is
    hoisted out of the loop and centroid norms are precomputed literals
    (bit-identical to the in-plan fold). ``centroids`` is the collected
    codebook (bounded: C rows)."""
    if len(centroids) == 1:
        return F.lit(centroids[0][0]).cast("int")
    na = F.sqrt(
        F.aggregate(F.transform(vec, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    return (-_best_centroid(vec, na, _lit_book(centroids)).getField("n")).cast("int")


def _lit_book(centroids: list[tuple[int, list[float]]]) -> Column:
    """Literal codebook array<struct<i,nb,v>> rendered as ONE SQL string —
    one driver call instead of C×(dim+2) py4j round trips (sqllit.py);
    ``nb`` is the precomputed ``_py_norm``, bit-identical to the in-plan
    fold."""
    return cached_expr(
        "array("
        + ",".join(
            f"named_struct('i',{sql_int(cid)},'nb',{sql_double(_py_norm(cvec))},"
            f"'v',{sql_double_array(cvec)})"
            for cid, cvec in centroids
        )
        + ")"
    )


def _best_centroid(vec: Column, na: Column, book: Column) -> Column:
    """(s = best cosine, n = −winning id) struct for a literal codebook
    array; shared by assign_centroid and assign_centroid_sim."""
    return F.array_max(
        F.transform(
            book,
            lambda c: F.struct(
                # a zero (or underflowed) vector yields x/0 — ANSI Spark
                # throws, and a NaN would sort ABOVE every real cosine and
                # win every assignment where SQL engines' NULL loses.
                # try_divide → NULL, then NULL/NaN → −2 (< any cosine ≥ −1):
                # degenerate centroids never win in either engine, ties
                # still break to the smallest id.
                F.coalesce(
                    F.nanvl(
                        F.try_divide(_dot(vec, c["v"]), na * c["nb"]), F.lit(-2.0)
                    ),
                    F.lit(-2.0),
                ).alias("s"),
                (-c["i"]).alias("n"),
            ),
        )
    )


def assign_centroid_sim(
    vec: Column, centroids: list[tuple[int, list[float]]]
) -> Column:
    """Like assign_centroid, but returns a struct ``(cid int, sim double)``
    — the winning centroid AND its cosine, for consumers that need the
    assignment quality (k-means inertia, residual coding)."""
    na = F.sqrt(
        F.aggregate(F.transform(vec, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    best = _best_centroid(vec, na, _lit_book(centroids))
    return F.struct(
        (-best.getField("n")).cast("int").alias("cid"),
        best.getField("s").alias("sim"),
    )


def ivf_topk(
    corpus: DataFrame, query_pred, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "vec",
    n_centroids: int = 16, nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the classic ANN scale path:

    1. coarse codebook: a deterministic centroid set (the ``n_centroids``
       smallest-id vectors; swap in k-means centroids at deployment —
       the operator only needs SOME fixed codebook);
    2. assignment: every corpus row gets its nearest centroid via the
       shuffle-free ``assign_centroid`` projection → the corpus is
       implicitly partitioned into C inverted lists;
    3. probe: each query ranks the codebook and searches only its
       ``nprobe`` nearest lists — the candidate join is keyed on
       centroid_id, so per-query work drops from O(N) to O(N·nprobe/C);
    4. exact cosine re-rank inside the probed lists.

    Recall/cost tunes with (n_centroids, nprobe); nprobe == n_centroids
    degenerates to the exact brute force."""
    # the n_centroids smallest-id vectors (TakeOrdered — bounded collect);
    # a `id < n` predicate would break on sparse / non-zero-based id spaces
    cents = [
        (r["_cid"], r["_cvec"])
        for r in corpus.select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cvec"))
        .orderBy("_cid")
        .limit(n_centroids)
        .collect()
    ]
    if not cents:
        raise ValueError("ivf_topk: empty corpus — no codebook")
    assigned = corpus.withColumn(
        "centroid_id", assign_centroid(F.col(vec_col), cents)
    )
    queries = corpus.where(query_pred).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    cent_df = F.broadcast(
        queries.sparkSession.createDataFrame(
            [(cid, cvec) for cid, cvec in cents], "c_id int, c_vec array<double>"
        )
    )
    wprobe = Window.partitionBy("q_id").orderBy(F.desc("c_sim"), F.asc("c_id"))
    probes = (
        queries.crossJoin(cent_df)
        .withColumn("c_sim", cosine_expr(F.col("q_vec"), F.col("c_vec")))
        .withColumn("prn", F.row_number().over(wprobe))
        .where(F.col("prn") <= nprobe)
        .select("q_id", "q_vec", F.col("c_id").alias("centroid_id"))
    )
    pairs = assigned.join(F.broadcast(probes), "centroid_id").where(
        F.col(id_col) != F.col("q_id")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        pairs.withColumn("sim", cosine_expr(F.col("q_vec"), F.col(vec_col)))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("q_id", "rn", F.col(id_col).alias("neighbor_id"), "sim")
    )


def lsh_bucketed_topk(
    corpus: DataFrame, query_pred, k: int = 3,
    id_col: str = "vec_id", vec_col: str = "vec",
    n_planes: int = DEFAULT_PLANES, dim: int = 64,
) -> DataFrame:
    """Approximate top-k: bucket corpus + queries by hyperplane signs,
    join on bucket equality, exact-cosine re-rank inside buckets."""
    planes = plane_matrix(n_planes, dim)
    bucketed = corpus.withColumn("bucket", bucket_expr(F.col(vec_col), planes))
    q = bucketed.where(query_pred).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), "bucket"
    )
    pairs = bucketed.join(F.broadcast(q), "bucket").where(F.col(id_col) != F.col("q_id"))
    sim = cosine_expr(F.col("q_vec"), F.col(vec_col))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        pairs.withColumn("sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("q_id", "rn", F.col(id_col).alias("neighbor_id"), "sim")
    )
