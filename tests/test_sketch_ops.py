"""Mergeable-sketch + layout-key operators (tranche 3): CMS one-sided
error and merge algebra, KMV merge/exactness, Z-order locality and
2-D file skipping."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_etl_spark.operators.cms import build_cms, merge_cms, probe_cms
from job_etl_spark.operators.layout import (
    files_matching_predicate,
    sql_zorder_key,
    write_clustered,
    zorder_key,
)
from job_etl_spark.operators.sketch import kmv_estimate, kmv_sketch, merge_kmv
from job_etl_spark.tables import table
from tests.conftest import SF_SMOKE


def _events(spark):
    return table(spark, SF_SMOKE, "events").select(
        "event_id", F.col("user_id").cast("string").alias("uid")
    )


def test_cms_overestimates_never_under(spark):
    ev = _events(spark)
    sk = build_cms(ev, "uid", depth=4, width=64)  # narrow → forced collisions
    exact = ev.groupBy("uid").agg(F.count(F.lit(1)).alias("exact_n"))
    est = probe_cms(sk, exact, "uid", depth=4, width=64)
    rows = est.collect()
    assert rows and all(r["est"] >= r["exact_n"] for r in rows)


def test_cms_merge_equals_full_build(spark):
    ev = _events(spark)
    half = F.col("event_id") % 2
    merged = merge_cms(
        build_cms(ev.where(half == 0), "uid"),
        build_cms(ev.where(half == 1), "uid"),
    )
    full = build_cms(ev, "uid")
    as_map = lambda df: {(r["depth"], r["cell"]): r["n"] for r in df.collect()}
    assert as_map(merged) == as_map(full)


def test_cms_absent_key_estimates_zero_or_collision(spark):
    ev = _events(spark)
    sk = build_cms(ev, "uid", depth=4, width=4096)  # wide → few collisions
    ghost = ev.sparkSession.createDataFrame([("no-such-user-xyz",)], "uid string")
    [row] = probe_cms(sk, ghost, "uid", depth=4, width=4096).collect()
    assert row["est"] >= 0  # one-sided: only ever overshoots


def test_kmv_merge_equals_union_sketch(spark):
    ev = _events(spark).withColumn("g", F.lit("all"))
    half = F.col("event_id") % 2
    a = kmv_sketch(ev.where(half == 0), "uid", ["g"], k=16)
    b = kmv_sketch(ev.where(half == 1), "uid", ["g"], k=16)
    merged = sorted(r["h"] for r in merge_kmv(["g"], 16, a, b).collect())
    direct = sorted(r["h"] for r in kmv_sketch(ev, "uid", ["g"], k=16).collect())
    assert merged == direct


def test_kmv_small_group_is_exact(spark):
    ev = _events(spark).withColumn("g", F.lit("all"))
    n_exact = ev.select("uid").distinct().count()
    k = n_exact + 10  # sketch holds the whole domain
    est = kmv_estimate(kmv_sketch(ev, "uid", ["g"], k=k), ["g"], k=k)
    [row] = est.collect()
    assert row["n_kept"] == n_exact and row["est_distinct"] == float(n_exact)


def test_kmv_estimate_within_expected_error(spark):
    ev = _events(spark).withColumn("g", F.lit("all"))
    n_exact = ev.select("uid").distinct().count()
    k = 64
    [row] = kmv_estimate(kmv_sketch(ev, "uid", ["g"], k=k), ["g"], k=k).collect()
    # KMV relative error ~ 1/sqrt(k-2) ≈ 13% at k=64; allow 4 sigma
    assert abs(row["est_distinct"] - n_exact) / n_exact < 0.52


def test_zorder_key_matches_sql_twin(spark):
    df = spark.range(0, 256).select(
        (F.col("id") % 16).cast("int").alias("xb"),
        (F.col("id") / 16).cast("int").alias("yb"),
    )
    got = df.select("xb", "yb", zorder_key(["xb", "yb"], bits=4).alias("z")).collect()
    import duckdb

    con = duckdb.connect()
    expr = sql_zorder_key(["xb", "yb"], bits=4)
    for r in got:
        [(want,)] = con.execute(
            f"SELECT {expr} FROM (SELECT {r['xb']} AS xb, {r['yb']} AS yb)"
        ).fetchall()
        assert r["z"] == want
    # interleave sanity: (1,0) -> 2, (0,1) -> 1, (3,3) -> 15
    zmap = {(r["xb"], r["yb"]): r["z"] for r in got}
    assert zmap[(1, 0)] == 2 and zmap[(0, 1)] == 1 and zmap[(3, 3)] == 15


def test_zorder_layout_prunes_both_axes(spark, tmp_path):
    # clustered by z-order key: a tight predicate on EITHER axis must
    # skip most files; a single-axis sort would fail this on the 2nd axis
    n = 1 << 14
    df = spark.range(0, n).select(
        F.col("id"),
        (F.col("id") % 128).cast("int").alias("xb"),
        (F.floor(F.col("id") / 128)).cast("int").alias("yb"),
    )
    keyed = df.withColumn("z", zorder_key(["xb", "yb"], bits=7))
    path = str(tmp_path / "zorder")
    write_clustered(keyed, path, ["z"], num_files=16)
    hit_x, total_x = files_matching_predicate(path, "xb", 0, 15)
    hit_y, total_y = files_matching_predicate(path, "yb", 0, 15)
    assert total_x == total_y >= 16
    assert hit_x <= total_x / 2, (hit_x, total_x)
    assert hit_y <= total_y / 2, (hit_y, total_y)


def test_group_sample_is_deterministic_and_bounded(spark):
    from job_etl_spark.operators.sampling import deterministic_group_sample

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "lang", "source")
    s1 = deterministic_group_sample(docs, ["lang", "source"], "doc_id", k=3)
    s2 = deterministic_group_sample(docs, ["lang", "source"], "doc_id", k=3)
    r1 = sorted((r["lang"], r["source"], r["doc_id"], r["sample_rank"]) for r in s1.collect())
    assert r1 == sorted(
        (r["lang"], r["source"], r["doc_id"], r["sample_rank"]) for r in s2.collect()
    )
    per_group: dict = {}
    for lang, source, doc_id, rank in r1:
        per_group.setdefault((lang, source), []).append(rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 3
               for v in per_group.values())
    # a different seed draws a different sample
    s3 = deterministic_group_sample(docs, ["lang", "source"], "doc_id", k=3, seed="x")
    assert {r["doc_id"] for r in s3.collect()} != {r[2] for r in r1}


def test_bpe_greedy_merge_semantics(spark):
    from job_etl_spark.ml.bpe import learn_merges, serialize_corpus

    docs = spark.createDataFrame(
        [("a a a",), ("a b a b",), ("a b c",)], "text string"
    )
    steps = learn_merges(serialize_corpus(docs), rounds=2)
    # pair counts: (a,a)x2 (overlapping run counts both), (a,b)x3, (b,a)x1,
    # (b,c)x1 -> round 0 merges 'a b'; the rewrite is greedy non-overlapping:
    # 'a a a' untouched, 'a b a b' -> 'a+b a+b', 'a b c' -> 'a+b c'
    assert steps[0] == (0, "a+b", 3)
    # round 1: remaining pairs (a,a)x2, (a+b,a+b)x1, (a+b,c)x1 -> merge 'a a'
    # applied greedily: 'a a a' -> 'a+a a' (ONE merge, not two)
    assert steps[1] == (1, "a+a", 2)
    steps3 = learn_merges(serialize_corpus(docs), rounds=3)
    # round 2 candidates each count 1: 'a+a a', 'a+b a+b', 'a+b c' — tie
    # breaks on pair text ascending
    assert steps3[2] == (2, "a+a+a", 1)


def test_probe_cms_preserves_duplicate_key_rows(spark):
    ev = _events(spark)
    sk = build_cms(ev, "uid")
    dup = spark.createDataFrame([("1", "a"), ("1", "b"), ("2", "c")], "uid string, tag string")
    out = probe_cms(sk, dup, "uid").collect()
    assert len(out) == 3 and {r["tag"] for r in out} == {"a", "b", "c"}
    ests = {r["tag"]: r["est"] for r in out}
    assert ests["a"] == ests["b"]  # same key, same estimate


def test_kmv_sketch_ignores_null_keys(spark):
    df = spark.createDataFrame(
        [("g", "a"), ("g", "b"), ("g", None), ("g", "c")], "g string, k string"
    )
    sk = kmv_sketch(df, "k", ["g"], k=10)
    rows = sk.collect()
    assert len(rows) == 3 and all(r["h"] is not None for r in rows)
    [est] = kmv_estimate(sk, ["g"], k=10).collect()
    assert est["n_kept"] == 3 and est["est_distinct"] == 3.0


def test_assign_centroid_zero_vector_never_wins(spark):
    from job_etl_spark.ml.ann import assign_centroid

    cents = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame([([0.9, 0.1],), ([0.1, 0.9],)], "vec array<double>")
    got = [r["c"] for r in df.select(assign_centroid(F.col("vec"), cents).alias("c")).collect()]
    # the zero centroid's cosine is NaN -> mapped below any real cosine;
    # assignments go to the true nearest non-degenerate centroids
    assert got == [1, 2]


def test_mor_init_strips_tombstones(spark, tmp_path):
    from job_etl_spark.pipeline.runner import TableStore

    st = TableStore(spark, str(tmp_path))
    first = spark.createDataFrame(
        [(1, "a", False), (2, "b", True), (3, "c", False)],
        "k int, v string, _deleted boolean",
    )
    st.mor_init("t", first, ["k"])
    rows = sorted((r["k"], r["v"]) for r in st.mor_read("t").collect())
    assert rows == [(1, "a"), (3, "c")]
    # and later reads with deltas still work (schema has no _deleted)
    st.mor_upsert("t", spark.createDataFrame([(4, "d")], "k int, v string"))
    rows2 = sorted((r["k"], r["v"]) for r in st.mor_read("t").collect())
    assert rows2 == [(1, "a"), (3, "c"), (4, "d")]


def test_bpe_sampled_training_matches_full_on_skewed_corpus(spark):
    """learn_merges_sampled (VERDICT r4 item: the concrete 100 TB BPE
    path) must reproduce the FULL-corpus merge table on a corpus whose
    pair distribution is head-heavy — the regime where subsampled
    tokenizer training is valid. Fixture: Zipf-ish phrase frequencies
    ('new york' in most docs, 'machine learning' in half, ...) spread
    uniformly over (lang, source) strata so a per-group sample sees the
    same head order."""
    from job_etl_spark.ml.bpe import (
        learn_merges,
        learn_merges_sampled,
        serialize_corpus,
    )

    rows = []
    phrases = [
        ("new york city", 1),      # in every doc
        ("machine learning", 2),   # every 2nd doc
        ("data base", 3),          # every 3rd
        ("open source", 5),        # every 5th
    ]
    for i in range(240):
        parts = [p for p, period in phrases if i % period == 0]
        # per-doc noise: unique filler tokens that never form a repeated
        # pair, so the head stays dominant but the tail is nonempty
        parts.append(f"w{i}a w{i}b")
        rows.append((i, ["en", "de", "fr"][i % 3], f"s{i % 4}", " ".join(parts)))
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )

    full = learn_merges(serialize_corpus(docs), rounds=4)
    # 20 docs per (lang, source) stratum = 240/… -> 12 groups * 20 = 240?
    # k=10 halves the corpus; the head order survives
    sampled = learn_merges_sampled(docs, rounds=4, k_per_group=10)
    assert [m for _, m, _ in full] == [m for _, m, _ in sampled]
    # the table is the expected Zipf head, in frequency order
    assert [m for _, m, _ in full][:2] == ["new+york", "new+york+city"]
    # determinism: same seed, same sample, same table — bit-for-bit
    again = learn_merges_sampled(docs, rounds=4, k_per_group=10)
    assert sampled == again
    # a different seed may draw different docs but the same head order
    other = learn_merges_sampled(docs, rounds=4, k_per_group=10, seed="z")
    assert [m for _, m, _ in other] == [m for _, m, _ in full]
