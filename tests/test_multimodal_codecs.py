"""Round 5: REAL stdlib media codecs (PNG via zlib, WAV via wave).

The PNG tests construct filtered scanlines directly from the spec's
filter formulas (independently of the decoder's unfilter code) — every
filter type must reconstruct the exact same pixels. The WAV tests
round-trip through the stdlib wave WRITER, an independent implementation
of the container.
"""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from gpq_tiles_spark.operators.multimodal import (
    PNG_MAGIC,
    _auto_image_decode,
    audio_features,
    decode_png,
    decode_wav,
)


def _filter_line(line, prev, f, ch):
    """Spec filter construction (the INVERSE of unfiltering): given the
    reconstructed bytes of this and the previous scanline, produce the
    on-the-wire filtered bytes for filter type f."""
    n = len(line)
    enc = np.empty(n, dtype=np.int64)
    for x in range(n):
        a = int(line[x - ch]) if x >= ch else 0   # left (reconstructed)
        b = int(prev[x])                          # up
        c = int(prev[x - ch]) if x >= ch else 0   # up-left
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        enc[x] = (int(line[x]) - pred) % 256
    return enc.astype(np.uint8)


def make_png(w, h, px, ctype=2, filters=None):
    """Minimal spec-conformant PNG writer for tests: 8-bit, non-interlaced,
    one IDAT, per-row filter choice."""
    ch = px.shape[2]
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        line = px[y].reshape(-1)
        f = filters[y] if filters is not None else 0
        raw.append(f)
        raw += _filter_line(line, prev, f, ch).tobytes()
        prev = line
    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _rand_px(rng, w, h, ch):
    return rng.integers(0, 256, (h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ctype,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_png_decode_exact_pixels_all_filters(ctype, ch):
    rng = np.random.default_rng(7 + ctype)
    w, h = 13, 11
    px = _rand_px(rng, w, h, ch)
    # per-row filters covering every type incl. the sequential ones
    filters = [(y * 3 + 1) % 5 for y in range(h)]
    filters[0] = 4  # Paeth on the first row (prev = zeros edge case)
    payload = make_png(w, h, px, ctype=ctype, filters=filters)
    gw, gh, gray = decode_png(payload)
    assert (gw, gh) == (w, h)
    pxf = px.astype(np.float32) / 255.0
    if ctype in (0, 4):
        want = pxf[:, :, 0]
    else:
        want = pxf[:, :, :3] @ np.array([0.299, 0.587, 0.114],
                                        dtype=np.float32)
    assert np.allclose(gray, want, atol=1e-6)


def test_png_decode_matches_filter0_reference():
    """The same image written with filter 0 everywhere and with mixed
    filters must decode identically (the wire differs, pixels must not)."""
    rng = np.random.default_rng(23)
    px = _rand_px(rng, 9, 7, 3)
    a = decode_png(make_png(9, 7, px, ctype=2))
    b = decode_png(make_png(9, 7, px, ctype=2,
                            filters=[1, 2, 3, 4, 0, 4, 3]))
    assert np.array_equal(a[2], b[2])


def test_png_crc_mismatch_raises():
    payload = bytearray(make_png(4, 4, _rand_px(np.random.default_rng(1), 4, 4, 1), ctype=0))
    payload[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))
    p2 = bytearray(make_png(4, 4, _rand_px(np.random.default_rng(2), 4, 4, 1), ctype=0))
    p2[40] ^= 0x01  # flip a data byte inside IHDR/IDAT region
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(p2))


def test_auto_decode_dispatches_and_gates():
    png = make_png(4, 4, _rand_px(np.random.default_rng(3), 4, 4, 1), ctype=0)
    w, h, _ = _auto_image_decode(png)
    assert (w, h) == (4, 4)
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError, match="PNG decodes natively"):
            _auto_image_decode(b"\xff\xd8\xff\xe0 not a real jpeg")


def make_wav(samples: np.ndarray, rate: int = 8000, n_ch: int = 1,
             sampwidth: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_ch)
        wf.setsampwidth(sampwidth)
        wf.setframerate(rate)
        if sampwidth == 2:
            wf.writeframes(samples.astype("<i2").tobytes())
        else:
            wf.writeframes(samples.astype(np.uint8).tobytes())
    return buf.getvalue()


def test_wav_decode_16bit_stereo_to_mono():
    left = np.array([0, 16384, -16384, 32767], dtype=np.int16)
    right = np.array([0, 0, -16384, 32767], dtype=np.int16)
    inter = np.empty(8, dtype=np.int16)
    inter[0::2] = left
    inter[1::2] = right
    rate, mono = decode_wav(make_wav(inter, rate=44100, n_ch=2))
    assert rate == 44100
    want = (left.astype(np.float32) + right.astype(np.float32)) / 2 / 32768.0
    assert np.allclose(mono, want, atol=1e-6)


def test_wav_decode_8bit():
    samples = np.array([128, 255, 0, 128], dtype=np.uint8)
    rate, mono = decode_wav(make_wav(samples, rate=8000, sampwidth=1))
    assert rate == 8000
    assert np.allclose(mono, [0.0, 127 / 128, -1.0, 0.0], atol=1e-6)


def test_audio_features_energy_profile(spark):
    """Half silence, half full-scale square wave -> segment RMS features
    ~[0]*8 + [1]*8, through the Arrow-batched extractor."""
    n = 8000
    sig = np.zeros(n, dtype=np.int16)
    sig[n // 2:] = np.where(np.arange(n // 2) % 2 == 0, 32767, -32767)
    df = spark.createDataFrame(
        [("a.wav", bytearray(make_wav(sig)))],
        "media_ref string, payload binary")
    rows = audio_features(df, n_features=16).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.sample_rate == 8000 and r.n_samples == n
    f = np.array(r.features)
    assert np.all(f[:8] < 1e-6) and np.all(f[8:] > 0.99)


def test_image_features_tiny_images_no_nan(spark):
    """Images under 4px a side must yield finite nearest-pixel features,
    not NaNs from empty pooling slices (round-5 self-review)."""
    from gpq_tiles_spark.operators.multimodal import image_features

    rng = np.random.default_rng(5)
    rows = [
        ("t1.png", bytearray(make_png(1, 1, _rand_px(rng, 1, 1, 1), ctype=0))),
        ("t2.png", bytearray(make_png(3, 2, _rand_px(rng, 3, 2, 3), ctype=2))),
        ("t3.png", bytearray(make_png(2, 5, _rand_px(rng, 2, 5, 1), ctype=0))),
    ]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    feats = image_features(df).collect()
    assert len(feats) == 3
    for f in feats:
        arr = np.array(f.features)
        assert len(arr) == 16 and np.isfinite(arr).all()


def test_png_truncated_raises_valueerror():
    payload = make_png(6, 6, _rand_px(np.random.default_rng(9), 6, 6, 1),
                       ctype=0)
    # cut into the IDAT chunk body (IEND is the trailing 12 bytes): the
    # chunk header still parses but its data+CRC run past the payload
    with pytest.raises(ValueError, match="truncated"):
        decode_png(payload[:len(payload) - 15])


def test_auto_decode_unsupported_png_variant_names_the_seam():
    """A PNG outside the native core profile (16-bit) must fall through to
    the PIL seam — and without PIL, raise naming the codec gap."""
    import struct
    import zlib

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)  # 16-bit gray
    raw = bytes(2 * (1 + 2 * 2))  # filter byte + 2px * 2B per row
    payload = (PNG_MAGIC + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        w, h, _ = _auto_image_decode(payload)
        assert (w, h) == (2, 2)
    else:
        with pytest.raises(NotImplementedError, match="depth=16"):
            _auto_image_decode(payload)
