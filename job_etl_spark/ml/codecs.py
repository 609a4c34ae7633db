"""Pure-stdlib media codecs for the multimodal pipeline.

Real decoding without native deps (this container has no Pillow/librosa):

- PNG: full decode of 8-bit greyscale/RGB/GA/RGBA, all five scanline
  filters (None/Sub/Up/Average/Paeth, PNG spec §9), via ``zlib`` inflate —
  plus a matching encoder and a nearest-neighbor resizer, so the resize
  path is a real pixel transform, not metadata arithmetic.
- WAV: RIFF/fmt/data parse of PCM16 via ``struct``.

If Pillow IS importable it is preferred for images (identical outputs on
the supported subset); the stdlib path keeps every executor dependency-free.
These are executor-side kernels: they run inside Arrow-batched
``mapInPandas`` (ml/multimodal.py) and never touch the driver.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples per pixel

try:  # optional fast path; the stdlib implementation is the contract
    from PIL import Image as _PIL_Image  # type: ignore

    HAVE_PIL = True
except ImportError:  # pragma: no cover - container has no Pillow
    _PIL_Image = None
    HAVE_PIL = False


class MediaDecodeError(ValueError):
    """Unsupported or corrupt media payload."""


def _decode_errors(fn):
    """Normalize every decode-path failure (zlib.error on corrupt IDAT,
    struct.error on truncated headers, ZeroDivisionError on degenerate
    dimensions/rates, slicing errors) to MediaDecodeError — callers like
    ``extract_features(codec='real')`` NULL the row on MediaDecodeError;
    anything else would abort the whole Spark task."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except MediaDecodeError:
            raise
        except Exception as exc:  # noqa: BLE001 - contract: corrupt → MediaDecodeError
            raise MediaDecodeError(f"{fn.__name__}: {exc}") from exc

    return wrapped


def sniff(payload: bytes) -> str:
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------
def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


@_decode_errors
def png_decode(payload: bytes) -> tuple[int, int, int, bytearray]:
    """-> (width, height, channels, pixels) with pixels row-major
    interleaved 8-bit samples. Supports bit depth 8, no interlace."""
    if payload[:8] != PNG_MAGIC:
        raise MediaDecodeError("not a PNG payload")
    pos, width = 8, None
    height = channels = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8 or interlace != 0 or color_type not in _CHANNELS:
                raise MediaDecodeError(
                    f"unsupported PNG (depth={bit_depth}, color={color_type}, "
                    f"interlace={interlace}); stdlib codec handles 8-bit "
                    "non-interlaced grey/RGB/GA/RGBA"
                )
            channels = _CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise MediaDecodeError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise MediaDecodeError("PNG data length mismatch")
    pixels = bytearray(stride * height)
    prior = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        f = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prior[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prior[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(a, prior[i], c)) & 0xFF
        elif f != 0:
            raise MediaDecodeError(f"bad PNG filter byte {f}")
        pixels[y * stride : (y + 1) * stride] = line
        prior = line
    return width, height, channels, pixels


@_decode_errors
def png_encode(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Minimal valid PNG writer (filter 0 rows, one IDAT)."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(pixels[y * stride : (y + 1) * stride])

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@_decode_errors
def png_resize(payload: bytes, max_side: int) -> tuple[int, int, bytes]:
    """Nearest-neighbor thumbnail: longer side becomes ``max_side``
    (aspect preserved, never upscaled). -> (new_w, new_h, png_bytes)."""
    if HAVE_PIL:  # pragma: no cover - container has no Pillow
        import io

        img = _PIL_Image.open(io.BytesIO(payload))
        img.thumbnail((max_side, max_side))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return img.width, img.height, buf.getvalue()
    w, h, ch, px = png_decode(payload)
    scale = min(1.0, max_side / max(w, h))
    nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
    out = bytearray(nw * nh * ch)
    for y in range(nh):
        sy = min(h - 1, int(y * h / nh))
        src_row = sy * w * ch
        dst_row = y * nw * ch
        for x in range(nw):
            sx = min(w - 1, int(x * w / nw))
            out[dst_row + x * ch : dst_row + (x + 1) * ch] = px[
                src_row + sx * ch : src_row + (sx + 1) * ch
            ]
    return nw, nh, png_encode(nw, nh, ch, bytes(out))


@_decode_errors
def image_features(payload: bytes, dim: int = 8) -> tuple[int, int, list[float]]:
    """-> (width, height, feature): per-channel pixel means (0..1) padded
    to ``dim``, then overall pixel std in the next slot."""
    w, h, ch, px = png_decode(payload)
    n = w * h
    sums = [0] * ch
    for i in range(0, len(px), ch):
        for c in range(ch):
            sums[c] += px[i + c]
    means = [s / n / 255.0 for s in sums]
    mean_all = sum(px) / len(px)
    var = sum((b - mean_all) ** 2 for b in px) / len(px)
    feat = [round(m, 6) for m in means]
    feat.append(round((var**0.5) / 255.0, 6))
    feat.extend([0.0] * (dim - len(feat)))
    return w, h, feat[:dim]


# ---------------------------------------------------------------------------
# WAV (PCM16)
# ---------------------------------------------------------------------------
@_decode_errors
def wav_decode(payload: bytes) -> tuple[int, int, list[int]]:
    """-> (sample_rate, n_channels, samples) for PCM16 RIFF/WAVE."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaDecodeError("not a WAV payload")
    pos = 12
    rate = nch = None
    samples: list[int] = []
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
        if cid == b"fmt ":
            fmt, nch, rate, _, _, bits = struct.unpack("<HHIIHH", data[:16])
            if fmt != 1 or bits != 16 or nch < 1 or rate < 1:
                raise MediaDecodeError(
                    f"unsupported WAV (fmt={fmt}, bits={bits}, nch={nch}, rate={rate})"
                )
        elif cid == b"data":
            samples = list(struct.unpack(f"<{len(data) // 2}h", data[: len(data) & ~1]))
    if rate is None or not samples:
        raise MediaDecodeError("WAV missing fmt/data")
    return rate, nch, samples


@_decode_errors
def wav_encode(rate: int, samples: list[int], n_channels: int = 1) -> bytes:
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, n_channels, rate, rate * n_channels * 2, n_channels * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


@_decode_errors
def audio_features(payload: bytes, dim: int = 8) -> tuple[int, float, list[float]]:
    """-> (sample_rate, duration_s, feature): [rms, peak, zero-cross rate,
    duration/60] normalized, padded to ``dim``."""
    rate, nch, samples = wav_decode(payload)
    n = len(samples)
    duration = n / nch / rate
    rms = (sum(s * s for s in samples) / n) ** 0.5 / 32768.0
    peak = max(abs(s) for s in samples) / 32768.0
    ch0 = samples[::nch]  # zero-crossings on one channel — interleaved
    # samples would compare L against R
    zc = sum(1 for i in range(1, len(ch0)) if (ch0[i - 1] < 0) != (ch0[i] < 0))
    feat = [
        round(rms, 6),
        round(peak, 6),
        round(zc / max(1, len(ch0) - 1), 6),
        round(min(1.0, duration / 60.0), 6),
    ]
    feat.extend([0.0] * (dim - len(feat)))
    return rate, duration, feat[:dim]


def perceptual_hash(payload: bytes) -> int:
    """dHash: decode, resample to a 9×8 grayscale grid (nearest pixel),
    set bit (y*8+x) iff gray[x+1] > gray[x] in that row. 64-bit int.
    Gradient-based, so it is invariant to uniform brightness shifts and
    robust to mild noise — hamming distance over it is the standard
    image near-dup signal (reuse ml/dedup.hamming_distance)."""
    w, h, ch, px = png_decode(payload)
    gw, gh = 9, 8
    grid = []
    for gy in range(gh):
        row = []
        for gx in range(gw):
            x = min(w - 1, gx * w // gw)
            y = min(h - 1, gy * h // gh)
            o = (y * w + x) * ch
            if ch >= 3:
                g = (px[o] + px[o + 1] + px[o + 2]) // 3
            else:
                g = px[o]
            row.append(g)
        grid.append(row)
    bits = 0
    for gy in range(gh):
        for gx in range(gw - 1):
            if grid[gy][gx + 1] > grid[gy][gx]:
                bits |= 1 << (gy * 8 + gx)
    return bits


def audio_fingerprint(payload: bytes, n_windows: int = 65) -> int:
    """Energy-gradient audio hash (the WAV twin of ``perceptual_hash``):
    split the PCM stream into ``n_windows`` equal windows, compute each
    window's mean absolute amplitude, set bit i iff energy[i+1] >
    energy[i] — 64 bits for 65 windows. Sign-of-delta is invariant to
    uniform volume scaling and robust to mild noise; hamming distance
    over it is the near-dup signal (same comparison infrastructure as
    simhash/dHash)."""
    rate, n_ch, samples = wav_decode(payload)
    n = len(samples)
    if n < n_windows:
        raise MediaDecodeError(f"audio too short for fingerprint: {n} samples")
    energies = []
    for w in range(n_windows):
        lo = w * n // n_windows
        hi = (w + 1) * n // n_windows
        acc = 0
        for s in samples[lo:hi]:
            acc += s if s >= 0 else -s
        energies.append(acc / max(1, hi - lo))
    bits = 0
    for i in range(n_windows - 1):
        if energies[i + 1] > energies[i]:
            bits |= 1 << i
    return bits
