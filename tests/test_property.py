"""Property-based cross-checks (hypothesis): the Spark-native expressions
must agree with independent pure-Python ports of the reference semantics
on randomized inputs. Each example is a BATCH of rows so Spark runs once
per example, not once per row.

Alphabet restricted to printable ASCII: the reference operates on API
strings, and Java/Python regex classes (\\s, \\b) only coincide there.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from job_etl_spark.functions.identity import hash_key_expr
from job_etl_spark.functions.numeric import salary_bounds_exprs
from job_etl_spark.functions.text import seniority_level_expr
from job_etl_spark.functions.timeparse import parse_timestamp_expr

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=30
)
_ASCII_WS = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126, include_characters="\t\n "),
    min_size=1,
    max_size=40,
)


# --- pure-Python twins (independent ports of the reference semantics) -----


def _py_ws_norm(s: str) -> str:
    return re.sub(r"[ \t\n\x0b\f\r]+", " ", s.strip())


def _py_hash_key(company: str, title: str, location: str) -> str:
    parts = "|".join(_py_ws_norm(x).lower() for x in (company, title, location))
    return hashlib.md5(parts.encode()).hexdigest()


def _py_seniority(title: str | None) -> str:
    if not title:
        return "unknown"
    t = title.lower()
    if " iii" in t or t.startswith("iii"):
        return "senior"
    if (
        " ii " in t or "level ii" in t or t.startswith("ii ") or t.endswith(" ii")
        or " ii," in t or " ii)" in t or " ii/" in t or "engineer ii" in t
    ):
        return "intermediate"
    if (
        "level i" in t or " i " in t or t.startswith("i ") or t.endswith(" i")
        or " i," in t or " i)" in t or " i/" in t or "engineer i " in t
        or "engineer i)" in t
    ):
        return "junior"
    m = re.search(r"\bl([4-9]|[1-9][0-9]+)\b", t)
    if m:
        n = int(m.group(1))
        if n >= 5:
            return "senior"
        if n == 4:
            return "intermediate"
    for pat in (r"\bchief\b", r"\bvp\b", r"\bvice president\b", r"\bhead of\b",
                r"\bdirector\b", r"\bmanager\b", r"\badvanced\b"):
        if re.search(pat, t):
            return "senior"
    if re.search(r"\bintern\b", t):
        return "junior"
    tiers = {
        "senior": [r"\bsenior\b", r"\bsr\.?\b", r"\blead\b", r"\bprincipal\b",
                   r"\bstaff\b", r"\barchitect\b"],
        "intermediate": [r"\bintermediate\b", r"\bmid-level\b", r"\bmid level\b", r"\bmid\b"],
        "junior": [r"\bjunior\b", r"\bjr\.?\b", r"\bassociate\b", r"\bentry-level\b",
                   r"\bentry level\b", r"\bentry\b"],
    }
    for level, pats in tiers.items():
        if any(re.search(p, t) for p in pats):
            return level
    return "unknown"


# --- properties ------------------------------------------------------------


@settings(**_SETTINGS)
@given(st.lists(st.tuples(_ASCII_WS, _ASCII_WS, _ASCII_WS), min_size=1, max_size=50))
def test_hash_key_matches_python_md5(spark, rows):
    df = spark.createDataFrame(rows, "c string, t string, l string")
    got = [r["h"] for r in df.select(hash_key_expr("c", "t", "l").alias("h")).collect()]
    want = [_py_hash_key(c, t, l) for c, t, l in rows]
    assert got == want


# seed vocabulary biases examples toward cascade-relevant strings
_TITLE_WORDS = st.sampled_from(
    ["engineer", "senior", "sr.", "ii", "iii", "i", "l4", "l5", "intern", "manager",
     "architect", "architecture", "mid", "entry", "junior", "jr", "staff", "data",
     "lead", "vp", "head", "of", "level", "x"]
)
_TITLES = st.lists(_TITLE_WORDS, min_size=0, max_size=6).map(lambda ws: " ".join(ws))


@settings(**_SETTINGS)
@given(st.lists(st.one_of(_TITLES, _ASCII_WS), min_size=1, max_size=80))
def test_seniority_cascade_matches_python_port(spark, titles):
    df = spark.createDataFrame([(t,) for t in titles], "t string")
    got = [r["s"] for r in df.select(seniority_level_expr("t").alias("s")).collect()]
    want = [_py_seniority(t) for t in titles]
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                           min_value=-1e9, max_value=1e9)),
            st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                           min_value=-1e9, max_value=1e9)),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_salary_swap_matches_python(spark, pairs):
    df = spark.createDataFrame(pairs, "a double, b double")
    lo, hi = salary_bounds_exprs("a", "b")
    got = [(r["lo"], r["hi"]) for r in df.select(lo.alias("lo"), hi.alias("hi")).collect()]
    want = [
        ((min(a, b), max(a, b)) if a is not None and b is not None else (a, b))
        for a, b in pairs
    ]
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=4_000_000_000).map(str),  # epoch
            st.datetimes(
                min_value=dt.datetime(1971, 1, 1), max_value=dt.datetime(2100, 1, 1)
            ).map(lambda d: d.replace(microsecond=0).isoformat() + "Z"),
            _ASCII,  # mostly invalid → NULL
            st.none(),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_timestamp_parse_matches_python(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [
        r["u"]
        for r in df.select(F.unix_seconds(parse_timestamp_expr("v")).alias("u")).collect()
    ]

    def py_parse(v):
        if v is None:
            return None
        s = v.strip()
        if re.fullmatch(r"-?[0-9]+(\.[0-9]+)?", s):
            return int(float(s))
        try:
            d = dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
        except ValueError:
            return None
        if d.tzinfo is None:
            d = d.replace(tzinfo=dt.timezone.utc)
        return int(d.timestamp())

    want = [py_parse(v) for v in values]
    assert got == want


# --- chunking: native array expression vs pure-Python twin ----------------


def _py_chunks(text: str | None, size: int = 32):
    if text is None:
        return []
    toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
    return [
        (w // size, len(toks[w : w + size]), " ".join(toks[w : w + size]))
        for w in range(0, len(toks), size)
    ]


@settings(**_SETTINGS)
@given(st.lists(st.one_of(_ASCII_WS, st.none()), min_size=1, max_size=20))
def test_chunking_matches_python(spark, texts):
    from job_etl_spark.functions.chunking import chunks_expr, tokens_expr

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["c"]["chunk_idx"]): (r["c"]["n_tokens"], r["c"]["chunk_text"])
        for r in df.select(
            "doc_id", F.explode(chunks_expr(tokens_expr("text"))).alias("c")
        ).collect()
    }
    expect = {
        (i, idx): (n, txt)
        for i, t in enumerate(texts)
        for idx, n, txt in _py_chunks(t)
    }
    assert got == expect


# --- banded range join vs naive nested-loop twin --------------------------


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 300)),
        min_size=1,
        max_size=15,
    ),
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 300)),
        min_size=1,
        max_size=15,
    ),
    st.integers(1, 120),
)
def test_banded_range_join_matches_naive_property(spark, lrows, rrows, band):
    from job_etl_spark.operators.range_join import banded_range_join

    lo, hi = -40, 25
    left = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(lrows)], "lid int, k string, lv long"
    )
    right = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rrows)], "rid int, k string, rv long"
    )
    expect = sorted(
        (li, ri)
        for li, lk, lv in ((i, k, v) for i, (k, v) in enumerate(lrows))
        for ri, rk, rv in ((i, k, v) for i, (k, v) in enumerate(rrows))
        if lk == rk and lv + lo <= rv <= lv + hi
    )
    got = banded_range_join(left, right, ["k"], "lv", "rv", lo, hi, band=band)
    assert sorted((r["lid"], r["rid"]) for r in got.collect()) == expect


# ---------------------------------------------------------------------------
# pure-stdlib PNG codec: encode → decode round-trips any 8-bit image
# exactly (all channel counts), and resize preserves dimensions contract
# ---------------------------------------------------------------------------
@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.sampled_from([1, 2, 3, 4]),
    st.randoms(use_true_random=False),
)
def test_png_roundtrip_property(w, h, ch, rnd):
    from job_etl_spark.ml import codecs

    px = bytes(rnd.randrange(256) for _ in range(w * h * ch))
    out = codecs.png_decode(codecs.png_encode(w, h, ch, px))
    assert out[:3] == (w, h, ch)
    assert bytes(out[3]) == px


@settings(max_examples=10, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=16),
)
def test_png_resize_dimension_contract(w, h, max_side):
    from job_etl_spark.ml import codecs

    px = bytes((i * 37) % 256 for i in range(w * h * 3))
    nw, nh, payload = codecs.png_resize(codecs.png_encode(w, h, 3, px), max_side)
    # never upscaled; longer side hits the target when downscaling
    assert nw <= max(w, max_side) and nh <= max(h, max_side)
    if max(w, h) > max_side:
        assert max(nw, nh) == max_side
    else:
        assert (nw, nh) == (w, h)
    w2, h2, ch2, _ = codecs.png_decode(payload)
    assert (w2, h2, ch2) == (nw, nh, 3)


# --- sketch / layout operators vs pure-Python references ------------------


def _py_hexint(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@given(
    st.lists(st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=1, max_size=60)
)
@settings(**_SETTINGS)
def test_cms_matches_python_reference(spark, keys):
    from job_etl_spark.operators.cms import build_cms, probe_cms

    D, W = 3, 32
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    sk = build_cms(df, "k", depth=D, width=W)
    got = {
        (r["depth"], r["cell"]): r["n"] for r in sk.collect()
    }
    want: dict = {}
    for k in keys:
        for d in range(D):
            cell = _py_hexint(f"{d}|{k}") % W
            want[(d, cell)] = want.get((d, cell), 0) + 1
    assert got == want
    uniq = sorted(set(keys))
    probed = probe_cms(
        sk, spark.createDataFrame([(k,) for k in uniq], "k string"), "k", D, W
    )
    est = {r["k"]: r["est"] for r in probed.collect()}
    for k in uniq:
        assert est[k] == min(want[(d, _py_hexint(f"{d}|{k}") % W)] for d in range(D))


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=80),
    st.integers(min_value=1, max_value=12),
)
@settings(**_SETTINGS)
def test_kmv_sketch_matches_python_reference(spark, ids, k):
    from job_etl_spark.operators.sketch import kmv_sketch

    df = spark.createDataFrame([(i,) for i in ids], "id bigint").withColumn(
        "g", F.lit("g")
    )
    got = sorted(r["h"] for r in kmv_sketch(df, "id", ["g"], k=k).collect())
    want = sorted({_py_hexint(str(i)) for i in ids})[:k]
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255), st.integers(min_value=0, max_value=255)
        ),
        min_size=1,
        max_size=64,
    )
)
@settings(**_SETTINGS)
def test_zorder_key_matches_python_interleave(spark, cells):
    from job_etl_spark.operators.layout import zorder_key

    def py_z(x: int, y: int) -> int:
        z = 0
        for b in range(8):
            z |= ((x >> b) & 1) << (2 * b + 1)
            z |= ((y >> b) & 1) << (2 * b)
        return z

    df = spark.createDataFrame(cells, "xb int, yb int")
    got = df.select("xb", "yb", zorder_key(["xb", "yb"], bits=8).alias("z")).collect()
    assert all(r["z"] == py_z(r["xb"], r["yb"]) for r in got)


@given(
    xs=st.lists(
        st.floats(
            min_value=-1.5, max_value=1.5, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(**_SETTINGS)
def test_py_dround_matches_spark_expr(spark, xs):
    """q162's driver-side greedy rounds with py_dround; it must be
    bit-identical to the dround Catalyst expression (and, transitively,
    to the DuckDB oracle's CAST(ROUND(...)) that 162 queries pin)."""
    from job_etl_spark.queries._util import dround, py_dround

    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i int, x double")
    got = {
        r["i"]: r["y"]
        for r in df.select("i", dround(F.col("x"), 6).alias("y")).collect()
    }
    for i, x in enumerate(xs):
        assert got[i] == py_dround(x, 6), (x, got[i], py_dround(x, 6))


# zero-norm vectors are outside the embedding domain (and raise under
# ANSI division) — keep every component's magnitude in [1e-3, 2] or 0,
# with at least one nonzero per vector
_VEC_COMPONENT = st.one_of(
    st.just(0.0),
    st.floats(min_value=1e-3, max_value=2.0),
    st.floats(min_value=-2.0, max_value=-1e-3),
)
_VEC = st.lists(_VEC_COMPONENT, min_size=8, max_size=8).filter(
    lambda v: any(x != 0.0 for x in v)
)


@given(vecs=st.lists(_VEC, min_size=2, max_size=12))
@settings(**_SETTINGS)
def test_py_cosine_matches_spark_expr(spark, vecs):
    """py_cosine (driver-side sequential fold) must be bit-identical to
    cosine_expr's aggregate fold on the same vectors."""
    from job_etl_spark.ml.ann import cosine_expr, py_cosine

    q = vecs[0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs[1:])], "i int, v array<double>"
    )
    qlit = F.array(*[F.lit(float(x)) for x in q])
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", cosine_expr(qlit, F.col("v")).alias("c")
        ).collect()
    }
    import math

    for i, v in enumerate(vecs[1:]):
        expect = py_cosine(q, v)
        g = got[i]
        if g is None or (isinstance(g, float) and math.isnan(g)):
            assert expect is None, (q, v, g, expect)
        else:
            assert g == expect, (q, v, g, expect)


# --- q140 prefix-count attribution vs brute-force pair replica -------------
# The r7 rewrite derives per-conversion touch counts and the latest touch
# from window passes with subtle ordering rules (endpoint rows sort before
# equal-t touches → strict < at conv_t, inclusive >= at conv_t − lookback).
# This pins those semantics against a direct pair enumeration on adversarial
# tiny inputs: shared timestamps, touches exactly AT conv_t and AT the
# lookback boundary, multiple convs per user at the same instant.

_Q140_L = 100  # small lookback so boundaries are exercised constantly


def _q140_brute(rows):
    """rows: (user, event_id, type, t); returns {type: (n_conv, last, lin)}
    with lin as an exact Fraction-of-decimals replica."""
    from decimal import ROUND_HALF_UP, Decimal

    convs = [(u, e, t) for (u, e, ty, t) in rows if ty == "purchase"]
    touches = [(u, e, ty, t) for (u, e, ty, t) in rows if ty != "purchase"]
    out = {}
    for cu, cid, ct in convs:
        pairs = [
            (ty, tt, tid)
            for (u, tid, ty, tt) in touches
            if u == cu and tt < ct and tt >= ct - _Q140_L
        ]
        if not pairs:
            continue
        n = len(pairs)
        unit = (Decimal(1) / Decimal(n)).quantize(
            Decimal(1).scaleb(-10), rounding=ROUND_HALF_UP
        )
        last_ty = max(pairs, key=lambda p: (p[1], p[2]))[0]
        for ty in {p[0] for p in pairs}:
            cnt = sum(1 for p in pairs if p[0] == ty)
            nc, lt, lin = out.get(ty, (0, 0, Decimal(0)))
            out[ty] = (nc + 1, lt + (1 if ty == last_ty else 0), lin + cnt * unit)
    return {
        ty: (nc, lt, float(lin.quantize(Decimal(1).scaleb(-6), rounding=ROUND_HALF_UP)))
        for ty, (nc, lt, lin) in out.items()
    }


@settings(**_SETTINGS)
@given(
    raw=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user: few → dense histories
            st.sampled_from(["view", "click", "cart", "purchase"]),
            st.integers(min_value=0, max_value=300),  # t: collisions + boundaries
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q140_windows_equal_pair_enumeration(spark, tmp_path_factory, raw):
    import os

    from job_etl_spark.queries import observability as obs

    rows = [(u, i, ty, t) for i, (u, ty, t) in enumerate(raw)]
    d = tmp_path_factory.mktemp("q140") / "sf"
    os.makedirs(d)
    spark.createDataFrame(
        [(e, u, ty, t) for (u, e, ty, t) in rows],
        "event_id long, user_id long, event_type string, ts_us long",
    ).selectExpr(
        "event_id", "user_id", "event_type", "timestamp_micros(ts_us) AS ts"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))

    orig = obs._Q140_LOOKBACK_US
    obs._Q140_LOOKBACK_US = _Q140_L
    try:
        got = {
            r["touch_type"]: (
                r["n_conversions_touched"],
                r["last_touch_credit"],
                r["linear_credit"],
            )
            for r in obs.q140_attribution(spark, str(d)).collect()
        }
    finally:
        obs._Q140_LOOKBACK_US = orig
    assert got == _q140_brute(rows)
