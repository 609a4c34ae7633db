"""Multimodal binary plumbing: schema, Arrow batching, REAL PNG/WAV
decode (pure-stdlib codecs), deterministic stub features, frame-sample
explode shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from job_etl_spark.ml import codecs
from job_etl_spark.ml.multimodal import as_media, decode_real, extract_features, sample_frames
from job_etl_spark.tables import table
from tests.conftest import SF_SMOKE


def _gradient_png(w: int = 64, h: int = 48) -> bytes:
    """RGB gradient fixture: R ramps left→right, G top→bottom, B constant."""
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes((x * 255 // max(1, w - 1), y * 255 // max(1, h - 1), 17))
    return codecs.png_encode(w, h, 3, bytes(px))


def _sine_wav(rate: int = 8000, seconds: float = 2.0, freq: float = 440.0) -> bytes:
    n = int(rate * seconds)
    samples = [int(30000 * math.sin(2 * math.pi * freq * i / rate)) for i in range(n)]
    return codecs.wav_encode(rate, samples)


def test_extract_features_over_binary(spark):
    docs = table(spark, SF_SMOKE, "documents").limit(50)
    media = as_media(docs, "doc_id", "text", "image")
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    r = rows[0]
    assert r["n_bytes"] > 0 and len(r["feature"]) == 8
    # histogram features normalized
    assert abs(sum(r["feature"]) - 1.0) < 1e-3
    # deterministic: rerun produces identical features
    again = {x["media_id"]: x["feature"] for x in extract_features(media).collect()}
    assert again[r["media_id"]] == r["feature"]


def test_sample_frames_shape(spark):
    docs = table(spark, SF_SMOKE, "documents").limit(10)
    media = as_media(docs, "doc_id", "text", "video")
    frames = sample_frames(media, every_n=10)
    pdf = frames.collect()
    assert all(row["frame_idx"] % 10 == 0 for row in pdf)
    assert all(row["frame_idx"] <= max(row["n_frames"] - 1, 0) for row in pdf)


def test_png_roundtrip_all_filters():
    """Decoder handles every PNG filter type: re-encode with filter 0 and
    compare pixels after decoding a synthetically filtered image."""
    w, h, ch = 32, 16, 3
    src = bytes((x * 7 + y * 13 + c * 29) % 256 for y in range(h) for x in range(w) for c in range(ch))
    payload = codecs.png_encode(w, h, ch, src)
    w2, h2, ch2, px = codecs.png_decode(payload)
    assert (w2, h2, ch2) == (w, h, ch)
    assert bytes(px) == src


def test_real_decode_png():
    d = decode_real(_gradient_png(), "image")
    assert (d["width"], d["height"], d["n_frames"]) == (64, 48, 1)
    # channel means: R and G ramp 0..255 → mean ≈ 0.5; B constant 17/255
    assert abs(d["feature"][0] - 0.5) < 0.02
    assert abs(d["feature"][1] - 0.5) < 0.02
    assert abs(d["feature"][2] - 17 / 255) < 0.005


def test_real_decode_wav():
    d = decode_real(_sine_wav(), "audio")
    assert d["width"] is None and d["n_frames"] == 2  # 2 s of audio
    rms, peak, zcr, dur = d["feature"][:4]
    # 440 Hz full-scale-ish sine: rms ≈ amp/√2, peak ≈ amp, zcr ≈ 2f/rate
    assert abs(rms - (30000 / 32768) / math.sqrt(2)) < 0.01
    assert abs(peak - 30000 / 32768) < 0.01
    assert abs(zcr - 2 * 440 / 8000) < 0.005
    assert abs(dur - 2 / 60) < 0.001


def test_real_decode_rejects_garbage():
    with pytest.raises(codecs.MediaDecodeError):
        decode_real(b"not media bytes", "image")


def test_corrupt_media_raises_decode_error_not_crash():
    """Every decode-path failure must surface as MediaDecodeError (the
    mapInPandas NULL-row contract) — not zlib/struct/ZeroDivision errors
    that would abort the Spark task."""
    import struct as _struct

    # PNG magic + non-zlib IDAT
    bad_idat = codecs.PNG_MAGIC + _struct.pack(">I", 13) + b"IHDR" + _struct.pack(
        ">IIBBBBB", 2, 2, 8, 2, 0, 0, 0
    ) + b"\x00" * 4 + _struct.pack(">I", 5) + b"IDAT" + b"junk!" + b"\x00" * 4
    with pytest.raises(codecs.MediaDecodeError):
        codecs.png_decode(bad_idat)
    # truncated IHDR
    trunc = codecs.PNG_MAGIC + _struct.pack(">I", 13) + b"IHDR" + b"\x00\x01"
    with pytest.raises(codecs.MediaDecodeError):
        codecs.png_decode(trunc)
    # WAV with zero channels / zero rate
    fmt = _struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    wav = (
        b"RIFF" + _struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    with pytest.raises(codecs.MediaDecodeError):
        codecs.wav_decode(wav)


def test_stereo_zcr_uses_one_channel():
    """Interleaved stereo with L=+sine, R=-sine: zcr must reflect the
    per-channel rate (2f/rate), not the L-vs-R sign flips."""
    rate, f = 8000, 440
    n = rate  # 1 s
    inter = []
    for i in range(n):
        s = int(30000 * math.sin(2 * math.pi * f * i / rate))
        inter.extend([s, -s])
    payload = codecs.wav_encode(rate, inter, n_channels=2)
    _, duration, feat = codecs.audio_features(payload)
    assert abs(duration - 1.0) < 0.001
    assert abs(feat[2] - 2 * f / rate) < 0.005


def test_extract_features_real_codec_in_spark(spark):
    """End-to-end: binary PNG/WAV payloads through Arrow-batched
    mapInPandas with the REAL codec; garbage rows yield NULLs."""
    rows = [
        (1, "image", _gradient_png()),
        (2, "audio", _sine_wav()),
        (3, "image", b"garbage payload"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    out = {r["media_id"]: r for r in extract_features(media, codec="real").collect()}
    assert (out[1]["width"], out[1]["height"]) == (64, 48)
    assert abs(out[1]["feature"][2] - 17 / 255) < 0.005
    assert out[2]["width"] is None and out[2]["n_frames"] == 2
    assert out[2]["feature"][1] == pytest.approx(30000 / 32768, abs=0.01)
    assert out[3]["width"] is None and out[3]["feature"] is None


def test_resize_images_real_codec_in_spark(spark):
    """Real pixel resize: 64x48 → longer side 32, gradient preserved."""
    from job_etl_spark.ml.multimodal import resize_images

    media = spark.createDataFrame(
        [(1, "image", _gradient_png()), (2, "image", b"garbage")],
        "media_id long, media_type string, payload binary",
    )
    out = {r["media_id"]: r for r in resize_images(media, max_side=32, codec="real").collect()}
    assert (out[1]["width"], out[1]["height"]) == (32, 24)
    w, h, ch, px = codecs.png_decode(bytes(out[1]["payload"]))
    assert (w, h, ch) == (32, 24, 3)
    # corners of the gradient survive the nearest-neighbor resize
    assert px[0] == 0 and px[2] == 17  # top-left: R=0, B=17
    right = (w - 1) * ch
    assert px[right] > 200  # top-right: R near 255
    assert out[2]["width"] is None and bytes(out[2]["payload"]) == b"garbage"


def test_resize_images_plumbing(spark):
    """Resize stub: aspect preserved, longer side == max_side, never
    upscaled, payload passes through the Arrow batch unchanged."""
    from job_etl_spark.ml.multimodal import as_media, resize_images
    from job_etl_spark.tables import table
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents").limit(20)
    media = as_media(docs, "doc_id", "text", "image")
    out = {r["media_id"]: r for r in resize_images(media, max_side=100).collect()}
    src = {r["media_id"]: r for r in media.collect()}
    assert set(out) == set(src) and len(out) == 20
    for mid, r in out.items():
        n = src[mid]["meta_n_bytes"]
        w0, h0 = max(n % 640, 1), max(n % 480, 1)
        assert max(r["width"], r["height"]) <= 100 or (w0 <= 100 and h0 <= 100)
        if max(w0, h0) > 100:
            assert max(r["width"], r["height"]) == 100  # hit the target side
        assert r["payload"] == src[mid]["payload"]


def _seeded_png(w=32, h=24, seed=0):
    from job_etl_spark.ml.codecs import png_encode

    px = bytes(
        ((x * 7 + y * 3 + seed * 31) % 256) for y in range(h) for x in range(w)
        for _ in range(3)
    )
    return png_encode(w, h, 3, px)


def test_perceptual_hash_brightness_invariant_and_discriminative():
    from job_etl_spark.ml.codecs import perceptual_hash, png_decode, png_encode

    base = _seeded_png(seed=1)
    w, h, ch, px = png_decode(base)
    brighter = png_encode(w, h, ch, bytes(min(255, p + 12) for p in px))
    assert perceptual_hash(base) == perceptual_hash(brighter)
    other = _seeded_png(seed=2)
    hamming = bin(perceptual_hash(base) ^ perceptual_hash(other)).count("1")
    assert hamming > 0  # different gradients differ


def test_image_neardup_pairs_finds_shifted_duplicate(spark):
    from job_etl_spark.ml.codecs import png_decode, png_encode
    from job_etl_spark.ml.multimodal import image_neardup_pairs

    base = _seeded_png(seed=3)
    w, h, ch, px = png_decode(base)
    shifted = png_encode(w, h, ch, bytes(min(255, p + 9) for p in px))
    distinct = _seeded_png(seed=4)
    rows = [(1, base), (2, shifted), (3, distinct), (4, b"not a png")]
    media = spark.createDataFrame(rows, "media_id bigint, payload binary")
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             image_neardup_pairs(media, max_hamming=4).collect()}
    assert (1, 2) in pairs          # brightness-shifted duplicate found
    assert all(3 not in p and 4 not in p for p in pairs)


def test_audio_fingerprint_volume_invariant_and_discriminative():
    import math

    from job_etl_spark.ml.codecs import audio_fingerprint, wav_encode

    n = 4000
    tone = [int(8000 * math.sin(i / 10.0) * (1 + math.sin(i / 400.0))) for i in range(n)]
    half = [s // 2 for s in tone]
    other = [int(8000 * math.sin(i / 7.0) * (1 + math.cos(i / 250.0))) for i in range(n)]
    f1 = audio_fingerprint(wav_encode(16000, tone))
    f2 = audio_fingerprint(wav_encode(16000, half))
    f3 = audio_fingerprint(wav_encode(16000, other))
    # halving volume halves every window energy — sign pattern unchanged
    assert bin(f1 ^ f2).count("1") <= 2
    assert bin(f1 ^ f3).count("1") > 8


def test_audio_neardup_volume_invariance(spark):
    """The energy-gradient fingerprint is sign-of-delta, so a uniformly
    volume-scaled clip near-dups its original; an unrelated clip does not."""
    from job_etl_spark.ml import codecs
    from job_etl_spark.ml.multimodal import audio_neardup_pairs

    import math
    base = [int(10000 * math.sin(i / 7)) for i in range(650)]
    quiet = [s // 3 for s in base]
    other = [int(10000 * math.sin(i / 2 + 1)) for i in range(650)]
    rows = [
        (1, codecs.wav_encode(8000, base)),
        (2, codecs.wav_encode(8000, quiet)),
        (3, codecs.wav_encode(8000, other)),
        (4, None),  # undecodable/null payloads are skipped, not fatal
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {(r.doc_a, r.doc_b) for r in audio_neardup_pairs(media, max_hamming=4).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_render_null_batchmate_preserves_wide_sig_bits(spark):
    """ADVICE r4 (high): one NULL bigint in an Arrow batch makes pandas
    deliver the whole simhash column as float64; 60-bit signatures exceed
    float64's 53-bit mantissa, so int(sig) would silently corrupt the low
    bits of every batchmate. The fix filters NULL sigs BEFORE mapInPandas
    (q159/q160 wiring), keeping the column int64. This test forces a
    >2^53 signature to share a batch with a NULL and asserts the rendered
    payload is bit-exact vs a pure-python render of the true int."""
    from job_etl_spark.ml.codecs import png_encode, wav_encode
    from job_etl_spark.queries.lifedata import (
        _Q159_PAD,
        _Q160_PAD,
        _Q160_RATE,
        _q159_render,
        _q160_render,
    )

    wide = 576460752303423499  # 2^59 + 11: float64 would round the low bits
    assert int(float(wide)) != wide  # precondition: the trap is real
    sigs = spark.createDataFrame(
        [(1, wide), (2, None)], "media_id bigint, simhash bigint"
    ).coalesce(1)  # one partition -> one Arrow batch holds both rows

    bits = [(wide >> k) & 1 for k in range(60)]
    want_png = png_encode(8, 8, 1, bytes(255 * b for b in bits + _Q159_PAD))
    samples = []
    for b in bits + _Q160_PAD:
        samples += [1000 * b, 1000 * b]
    want_wav = wav_encode(_Q160_RATE, samples)

    for render, want in ((_q159_render, want_png), (_q160_render, want_wav)):
        out = (
            sigs.where(F.col("simhash").isNotNull())
            .mapInPandas(render, "media_id bigint, payload binary")
            .collect()
        )
        rows = {r.media_id: bytes(r.payload) for r in out}
        assert set(rows) == {1}  # NULL-sig row excluded pre-Arrow
        assert rows[1] == want  # low bits intact despite the wide value


@pytest.mark.parametrize("render_name", ["_q159_render", "_q160_render"])
def test_render_raises_loudly_on_float64_batch(render_name):
    """ADVICE r5 (low): the renderers hard-require an int64 simhash batch.
    A caller that forgets the upstream NULL pre-filter delivers float64
    (NULL batchmate) — the renderer must raise TypeError, never silently
    truncate >2^53 signatures. Driver-less: feeds the generator directly."""
    import pandas as pd

    from job_etl_spark.queries import lifedata

    render = getattr(lifedata, render_name)
    wide = 576460752303423499  # >2^53: float64 rounds the low bits
    pdf = pd.DataFrame({"media_id": [1, 2], "simhash": [wide, None]})
    assert str(pdf["simhash"].dtype) == "float64"  # the trap dtype
    with pytest.raises(TypeError, match="int64"):
        list(render(iter([pdf])))


def test_fused_hash_equals_render_then_decode(spark):
    """r11 optimization guard: the fused single-stage codec hash
    (_q159_hash/_q160_hash — encode AND decode inside one Arrow stage, so
    the payload never crosses the Python->JVM boundary) must emit exactly
    the hash the unfused render->with_perceptual_hash/with_audio_fingerprint
    composition produced. Covers wide (>2^53) signatures so the int64
    precondition path is exercised too."""
    from job_etl_spark.ml.multimodal import with_audio_fingerprint, with_perceptual_hash
    from job_etl_spark.queries.lifedata import (
        _q159_hash,
        _q159_render,
        _q160_hash,
        _q160_render,
    )

    sigs = spark.createDataFrame(
        [(1, 576460752303423499), (2, 5), (3, (1 << 60) - 1), (4, 0)],
        "media_id bigint, simhash bigint",
    ).coalesce(1)

    for fused, render, wither, col in (
        (_q159_hash, _q159_render, with_perceptual_hash, "phash"),
        (_q160_hash, _q160_render, with_audio_fingerprint, "afp"),
    ):
        got = {
            r.media_id: r[col]
            for r in sigs.mapInPandas(fused, f"media_id bigint, {col} bigint").collect()
        }
        media = sigs.mapInPandas(render, "media_id bigint, payload binary")
        want = {r.media_id: r[col] for r in wither(media).select("media_id", col).collect()}
        assert got == want and len(got) == 4


def test_worker_package_shipping_is_cwd_independent():
    """r11: _q159_hash is pickled by reference, so executor Python workers
    must be able to import job_etl_spark. When the driver runs from a cwd
    outside the repo (the __spark_entry__ contract: only a driver-side
    sys.path insert), that import only works because the query ships the
    package via shipping.ensure_worker_package — this test drives that
    path end-to-end in a vanilla subprocess session from a temp cwd."""
    import subprocess
    import sys
    import tempfile

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from pyspark.sql import SparkSession\n"
        "spark = SparkSession.builder.master('local[2]').getOrCreate()\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "import __spark_entry__ as e\n"
        "n = e.queries()['q159_image_neardup'](spark, '/root/testdata/sf0.001').count()\n"
        "print('PAIRS', n)\n"
    )
    with tempfile.TemporaryDirectory() as cwd:
        out = subprocess.run(
            [sys.executable, "-c", code], cwd=cwd, capture_output=True, text=True,
            timeout=420,
        )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PAIRS" in out.stdout
