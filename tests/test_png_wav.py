"""PNG (sources/png.py) and RIFF/WAVE PCM (sources/wav.py) codecs:
lossless round-trips across every scanline filter / sample format, and
the strict-mode Spark path for real payloads."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_warehouse_project_spark.sources.multimodal import (
    extract_media_features,
    media_schema,
)
from data_warehouse_project_spark.sources.png import (
    PngError,
    UnsupportedPngError,
    decode_png,
    encode_png,
)
from data_warehouse_project_spark.sources.wav import (
    UnsupportedWavError,
    WavError,
    decode_wav,
    encode_wav,
)


def _img(h, w, c, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, c) if c else (h, w), np.uint8)


# ------------------------------------------------------------------- png


def test_png_lossless_all_filters():
    """PNG is lossless: every filter type must reproduce the exact
    pixels — this exercises all five unfilter paths on random data."""
    img = _img(21, 17, 3)
    for ft in range(5):
        out = decode_png(encode_png(img, filter_type=ft))
        assert (out == img).all(), f"filter {ft} not lossless"


def test_png_gray_rgba_palette_16bit():
    gray = _img(9, 13, 0)
    assert (decode_png(encode_png(gray)) == gray).all()
    rgba = _img(8, 8, 4)
    assert (decode_png(encode_png(rgba)) == rgba).all()

    # hand-built palette image: 4 colors, 2x2
    import zlib

    def chunk(ctype, payload):
        body = ctype + payload
        return (
            struct.pack(">I", len(payload))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 7, 7])
    idat = zlib.compress(b"\x00\x00\x01" + b"\x00\x02\x03")
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (2, 2, 3)
    assert tuple(out[0, 0]) == (255, 0, 0) and tuple(out[1, 1]) == (7, 7, 7)

    # hand-built 16-bit gray: high byte kept on downscale
    row = struct.pack(">HH", 0xABCD, 0x0102)
    idat16 = zlib.compress(b"\x00" + row)
    png16 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", idat16)
        + chunk(b"IEND", b"")
    )
    out16 = decode_png(png16)
    assert out16.shape == (1, 2) and out16[0, 0] == 0xAB and out16[0, 1] == 0x01


def test_png_rejects_interlace_and_corrupt():
    img = _img(8, 8, 3)
    b = bytearray(encode_png(img))
    # IHDR payload starts at offset 16; interlace flag is its last byte
    assert b[12:16] == b"IHDR"
    b[16 + 12] = 1
    with pytest.raises(UnsupportedPngError):
        decode_png(bytes(b))
    with pytest.raises(PngError):
        decode_png(b"not a png")
    with pytest.raises(PngError):
        decode_png(encode_png(img)[:30])


# ------------------------------------------------------------------- wav


def test_wav_roundtrip_16bit():
    t = np.linspace(0, 1, 8000, endpoint=False)
    mono = 0.5 * np.sin(2 * np.pi * 440 * t)
    rate, out = decode_wav(encode_wav(8000, mono))
    assert rate == 8000 and out.shape == (8000, 1)
    assert np.abs(out[:, 0] - mono).max() < 1e-3  # 16-bit quantization

    stereo = np.stack([mono, -mono], axis=1)
    rate, out = decode_wav(encode_wav(8000, stereo))
    assert out.shape == (8000, 2)
    assert np.abs(out - stereo).max() < 1e-3


def test_wav_sample_formats():
    import struct as st

    def wav(tag, bits, payload, nch=1, rate=1000):
        fmt = st.pack("<HHIIHH", tag, nch, rate, rate * nch * bits // 8,
                      nch * bits // 8, bits)
        body = (b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
                + b"data" + st.pack("<I", len(payload)) + payload)
        return b"RIFF" + st.pack("<I", len(body)) + body

    # 8-bit unsigned: 128 is silence, 255 ~ +1
    rate, a = decode_wav(wav(1, 8, bytes([128, 255, 0])))
    assert abs(a[0, 0]) < 1e-6 and a[1, 0] > 0.98 and a[2, 0] < -0.99
    # 24-bit: max positive
    rate, a = decode_wav(wav(1, 24, b"\xff\xff\x7f" + b"\x00\x00\x80"))
    assert a[0, 0] > 0.999 and a[1, 0] == -1.0
    # float32 passthrough
    rate, a = decode_wav(wav(3, 32, st.pack("<2f", 0.25, -0.75)))
    assert a[0, 0] == 0.25 and a[1, 0] == -0.75
    # ADPCM refused
    with pytest.raises(UnsupportedWavError):
        decode_wav(wav(2, 4, b"\x00\x00"))
    with pytest.raises(WavError):
        decode_wav(b"RIFFxxxxNOPE")


# ------------------------------------------------- strict-mode Spark path


def test_png_wav_end_to_end_strict_spark(spark):
    flat = np.zeros((10, 20, 3), np.uint8)
    flat[:] = (10, 20, 30)
    square = np.full(4000, 0.5)  # 2s at 2kHz, RMS 0.5
    rows = [
        (1, "image", encode_png(flat, filter_type=4), "mem://a.png"),
        (2, "audio", encode_wav(2000, square), "mem://b.wav"),
    ]
    out = (
        extract_media_features(
            spark.createDataFrame(rows, media_schema()), strict=True
        )
        .orderBy("media_id")
        .collect()
    )
    png_row, wav_row = out
    assert (png_row["width"], png_row["height"]) == (20, 10)
    assert abs(png_row["feature"][0] - 20.0) < 1e-3  # gray mean of (10,20,30)
    assert abs(png_row["feature"][4] - 10.0) < 1e-3
    assert wav_row["duration_ms"] == 2000
    # int16-scale RMS of a 0.5 constant ~ 16384
    assert all(abs(f - 16384.0) < 40 for f in wav_row["feature"])

def test_corrupt_payloads_fall_back_not_crash(spark):
    """Structurally-corrupt PNG/WAV bytes must surface as the codec's
    own error type and route to the policy path: digest fallback in
    test mode (whole-batch mapInPandas survives), refusal in strict."""
    import struct as st

    bad_wav_odd = (  # 16-bit PCM with odd-length data chunk
        b"RIFF" + st.pack("<I", 30) + b"WAVE"
        + b"fmt " + st.pack("<I", 16) + st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + b"data" + st.pack("<I", 3) + b"\x01\x02\x03"
    )
    bad_png_trunc_ihdr = (
        b"\x89PNG\r\n\x1a\n" + st.pack(">I", 5) + b"IHDR" + b"\x00" * 5 + b"\x00" * 4
    )
    rows = [
        (1, "audio", bad_wav_odd, "mem://bad.wav"),
        (2, "image", bad_png_trunc_ihdr, "mem://bad.png"),
    ]
    media = spark.createDataFrame(rows, media_schema())
    out = extract_media_features(media).orderBy("media_id").collect()
    assert len(out) == 2  # batch survived; digest fallback engaged
    assert all(len(r["feature"]) == 8 for r in out)
    with pytest.raises(Exception, match="NotImplementedError|no decoder"):
        extract_media_features(media, strict=True).collect()


def test_gray_alpha_png_features_ignore_alpha(spark):
    """An LA image's features must match its pure-gray twin — alpha
    must not leak into the gray/quadrant means."""
    gray = np.full((8, 8), 100, np.uint8)
    la = np.stack([gray, np.full((8, 8), 255, np.uint8)], axis=2)
    rows = [
        (1, "image", encode_png(gray), "mem://gray.png"),
        (2, "image", encode_png_la(la), "mem://la.png"),
    ]
    out = (
        extract_media_features(
            spark.createDataFrame(rows, media_schema()), strict=True
        )
        .orderBy("media_id")
        .collect()
    )
    assert out[0]["feature"] == out[1]["feature"]
    assert abs(out[1]["feature"][0] - 100.0) < 1e-3


def encode_png_la(img):
    """Minimal gray+alpha (color type 4) writer for the test above."""
    import struct as st
    import zlib

    h, w, _ = img.shape

    def chunk(ctype, payload):
        body = ctype + payload
        return (
            st.pack(">I", len(payload)) + body
            + st.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    lines = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * 2)], axis=1
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", st.pack(">IIBBBBB", w, h, 8, 4, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(lines.tobytes()))
        + chunk(b"IEND", b"")
    )


# ------------------------------------------------------------- IMA ADPCM


def test_adpcm_roundtrip_mono_and_stereo():
    """IMA ADPCM (format 0x11) decodes for real: the 4-bit quantizer's
    steady-state error is bounded by the adaptive step (~3% on full-
    scale tones), and the fact chunk trims tail-block padding so shape
    round-trips exactly."""
    from data_warehouse_project_spark.sources.wav import encode_wav_adpcm

    t = np.arange(3000) / 8000.0
    mono = 0.6 * np.sin(2 * np.pi * 440 * t)
    rate, out = decode_wav(encode_wav_adpcm(8000, mono))
    assert rate == 8000 and out.shape == (3000, 1)
    assert float(np.abs(out[:, 0] - mono).max()) < 0.05
    stereo = np.stack(
        [0.5 * np.sin(2 * np.pi * 300 * t), 0.4 * np.cos(2 * np.pi * 500 * t)],
        axis=1,
    )
    rate, out = decode_wav(encode_wav_adpcm(16000, stereo, samples_per_block=249))
    assert rate == 16000 and out.shape == (3000, 2)
    assert float(np.abs(out - stereo).max()) < 0.05
    # tail block shorter than samples_per_block: fact-chunk trim
    short = 0.2 * np.sin(2 * np.pi * 100 * np.arange(40) / 8000.0)
    rate, out = decode_wav(encode_wav_adpcm(8000, short, samples_per_block=17))
    assert out.shape == (40, 1)
    assert float(np.abs(out[:, 0] - short).max()) < 0.05


def test_adpcm_rejects_malformed():
    from data_warehouse_project_spark.sources.wav import (
        WavError,
        encode_wav_adpcm,
    )

    with pytest.raises(ValueError, match="multiple of 8"):
        encode_wav_adpcm(8000, np.zeros(100), samples_per_block=10)
    good = bytearray(encode_wav_adpcm(8000, np.zeros(100)))
    i = good.find(b"data") + 8 + 2  # step-index byte of block 0
    good[i] = 200  # out-of-range step index
    with pytest.raises(WavError, match="step index"):
        decode_wav(bytes(good))


def test_adpcm_truncated_final_block():
    """Foreign encoders can legally truncate the final block: whole
    4-byte nibble groups in a short block must decode (not silently
    drop), and a fragment too short for even the channel headers must
    raise — never lose audio without a signal."""
    from data_warehouse_project_spark.sources.wav import (
        WavError,
        _decode_ima_adpcm,
    )

    # spb=17 mono → align 12: one full block, then a header + ONE of the
    # two nibble groups → 17 + 9 samples
    full = struct.pack("<hBB", 100, 4, 0) + bytes(range(8))
    short = struct.pack("<hBB", -50, 4, 0) + bytes(range(4))
    out = _decode_ima_adpcm(full + short, 1, 12, None)
    assert out.shape == (17 + 9, 1)
    assert out[17, 0] == -50  # the short block's header sample decoded
    # a trailing fragment shorter than the 4*nch header is an error
    with pytest.raises(WavError, match="truncated ADPCM block"):
        _decode_ima_adpcm(full + short[:3], 1, 12, None)
    # stereo: a short block must truncate to whole 4*nch groups so the
    # channels stay aligned (header(8) + 5 payload bytes → header only)
    st_full = (
        struct.pack("<hBB", 10, 0, 0)
        + struct.pack("<hBB", -10, 0, 0)
        + bytes(8)
    )
    out2 = _decode_ima_adpcm(st_full + st_full[:13], 2, 16, None)
    assert out2.shape == (9 + 1, 2)
    assert tuple(out2[9]) == (10, -10)


def test_adpcm_end_to_end_strict_spark(spark):
    """ADPCM WAV payloads flow through the strict mapInPandas path with
    true rate/duration — the refusal list no longer includes them."""
    from data_warehouse_project_spark.sources.wav import encode_wav_adpcm

    tone = 0.5 * np.sin(2 * np.pi * 220 * np.arange(4000) / 8000.0)
    rows = [(1, "audio", encode_wav_adpcm(8000, tone), "mem://t.adpcm.wav")]
    out = extract_media_features(
        spark.createDataFrame(rows, media_schema()), strict=True
    ).collect()
    assert out[0]["duration_ms"] == 500
    assert out[0]["feature"][0] > 0.1  # real RMS energy, not a digest


# ------------------------------------------------------------- G.711


def test_g711_tables_match_standard_anchors():
    from data_warehouse_project_spark.sources.wav import (
        _alaw_table,
        _mulaw_table,
    )

    mu, al = _mulaw_table(), _alaw_table()
    assert mu[0xFF] == 0 and mu[0x7F] == 0  # the two µ-law zeros
    assert mu[0x00] == -32124 and mu[0x80] == 32124  # extremes
    assert al[0xD5] == 8 and al[0x55] == -8  # A-law "zero" pair
    assert al.max() == 32256 and al.min() == -32256


def test_g711_roundtrip_and_requant_lossless():
    from data_warehouse_project_spark.sources.wav import encode_wav_g711

    t = np.arange(4000) / 8000.0
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    for law, tol in (("ulaw", 0.02), ("alaw", 0.02)):
        rate, out = decode_wav(encode_wav_g711(8000, tone, law))
        assert rate == 8000 and out.shape == (4000, 1)
        assert float(np.abs(out[:, 0] - tone).max()) < tol
        # nearest-decode-value quantizer: re-encoding decoded values
        # is exactly lossless
        _, out2 = decode_wav(encode_wav_g711(8000, out[:, 0], law))
        assert (out2 == out).all()
    # stereo + odd length (word-align pad must not corrupt the tail)
    st = np.stack([tone[:1001], -tone[:1001]], axis=1)
    rate, out = decode_wav(encode_wav_g711(8000, st, "alaw"))
    assert out.shape == (1001, 2)
    with pytest.raises(ValueError, match="law"):
        encode_wav_g711(8000, tone, "glaw")


# ------------------------------------------------- hypothesis sweeps

from hypothesis import HealthCheck, example, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _adpcm_signal(n, nch, seed):
    rng = np.random.default_rng(seed)
    # random walk with bounded per-sample delta: the signal class ADPCM
    # is designed for (white noise at full scale is unrepresentable by
    # ANY 4-bit delta coder, so it is not a meaningful property bound)
    steps = rng.integers(-2000, 2001, size=(n, nch))
    return np.clip(np.cumsum(steps, axis=0), -30000, 30000) / 32768.0


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    n=st.integers(1, 700),
    nch=st.integers(1, 2),
    spb=st.sampled_from([9, 17, 65, 505]),
    seed=st.integers(0, 2**31),
)
# worst cases from a 3000-draw offline sweep of the per-block-reseeded
# greedy-nearest encoder (errors 0.217 / 0.192 — the long-block
# mid-block transient class that motivated the tiered bound):
@example(n=487, nch=1, spb=505, seed=646444076)
@example(n=630, nch=2, spb=505, seed=773786671)
# short-block regression guard: the r7 once-seeded encoder hit 0.13
# here; per-block re-seeding holds it under 0.03 (1500-draw sweep):
@example(n=592, nch=2, spb=9, seed=33140991)
def test_hypothesis_adpcm_roundtrip_bounded(n, nch, spb, seed):
    from data_warehouse_project_spark.sources.wav import (
        decode_wav,
        encode_wav_adpcm,
    )

    sig = _adpcm_signal(n, nch, seed)
    rate, out = decode_wav(encode_wav_adpcm(8000, sig, samples_per_block=spb))
    assert out.shape == sig.shape if sig.ndim == 2 else (sig.shape[0], 1)
    err = float(np.abs(out - sig.reshape(out.shape)).max())
    # Tiered bound. Short blocks (spb ≤ 17): the encoder re-seeds the
    # step index from each block's own deltas, so adaptive lag is reset
    # every ≤16 samples — measured worst 0.049 over 1500 draws, bound
    # 0.1. Long blocks: a quiet stretch walks the index down to step 7;
    # a subsequent sustained ±2000/sample run then out-paces the
    # reconstruction while the step ramps (~2.3×/sample under |7|
    # codes), for an analytic transient of Σ(2000 − 1.75·step_k) ≈
    # 8000 PCM ≈ 0.25 — measured worst 0.217 over 3000 draws, bound
    # 0.3. NO greedy IMA encoder can beat this class: the exhaustive
    # nearest-reconstruction quantizer (which this encoder is) already
    # picks the best single-step move.
    bound = 0.1 if spb <= 17 else 0.3
    assert err < bound, f"ADPCM error {err} for spb={spb}"


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(seed=st.integers(0, 2**31), law=st.sampled_from(["ulaw", "alaw"]))
def test_hypothesis_g711_error_bounded_by_segment(seed, law):
    from data_warehouse_project_spark.sources.wav import (
        decode_wav,
        encode_wav_g711,
    )

    rng = np.random.default_rng(seed)
    sig = rng.uniform(-1, 1, size=rng.integers(1, 500))
    rate, out = decode_wav(encode_wav_g711(8000, sig, law))
    # logarithmic companding: absolute error grows with magnitude but
    # is bounded by half the top segment's step (~1024/32768)
    err = np.abs(out[:, 0] - sig)
    assert float(err.max()) <= 1024.5 / 32768.0


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    seed=st.integers(0, 2**31),
    law=st.sampled_from(["ulaw", "alaw"]),
    nch=st.integers(1, 2),
    amp=st.floats(1e-4, 1.2),  # spans sub-LSB through clipping
    n=st.integers(1, 400),
)
def test_hypothesis_g711_nearest_decode_value_exact(seed, law, nch, amp, n):
    """The encoder's claim is NEAREST-DECODE-VALUE quantization — for
    every sample the decoded output must sit at the 256-entry expansion
    table value closest to the input PCM (not merely within the
    segment-error bound), at every amplitude (sub-LSB noise through
    hard clipping), channel count and length. Checked against the
    standard-anchored tables directly, so an off-by-one in the
    searchsorted tie-break or a clip/bias drift fails here even when
    the error-bound sweep stays green. Corollary (requantization
    exactness): re-encoding the decoded signal is byte-lossless."""
    from data_warehouse_project_spark.sources.wav import (
        _alaw_table,
        _mulaw_table,
        decode_wav,
        encode_wav_g711,
    )

    rng = np.random.default_rng(seed)
    sig = amp * rng.uniform(-1, 1, size=(n, nch))
    enc = encode_wav_g711(8000, sig, law)
    rate, out = decode_wav(enc)
    assert out.shape == (n, nch)
    tbl = (_mulaw_table() if law == "ulaw" else _alaw_table()).astype(np.int64)
    pcm = np.clip(np.round(sig * 32767.0), -32768, 32767).astype(np.int64)
    got16 = np.round(out * 32768.0).astype(np.int64)  # exact: out = tbl/32768
    best = np.abs(tbl[None, None, :] - pcm[:, :, None]).min(axis=2)
    assert (np.abs(got16 - pcm) == best).all(), (
        f"{law}: decoded value not the nearest table entry"
    )
    # requantization exactness follows, but pin it end-to-end anyway
    enc2 = encode_wav_g711(8000, out, law)
    _, out2 = decode_wav(enc2)
    assert (out2 == out).all()


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(seed=st.integers(0, 2**31))
def test_hypothesis_wav_mutation_never_raises_raw(seed):
    """The untrusted-bytes contract: ANY mutation of a valid WAV (PCM,
    ADPCM or G.711) either still decodes or raises WavError — never a
    raw numpy/struct/index exception out of the codec."""
    from data_warehouse_project_spark.sources.wav import (
        WavError,
        decode_wav,
        encode_wav,
        encode_wav_adpcm,
        encode_wav_g711,
    )

    rng = np.random.default_rng(seed)
    tone = 0.4 * np.sin(2 * np.pi * 220 * np.arange(600) / 8000.0)
    base = [
        encode_wav(8000, tone),
        encode_wav_adpcm(8000, tone, samples_per_block=65),
        encode_wav_g711(8000, tone, "alaw"),
    ][int(rng.integers(0, 3))]
    b = bytearray(base)
    kind = int(rng.integers(0, 3))
    if kind == 0:  # truncate
        b = b[: int(rng.integers(0, len(b)))]
    elif kind == 1:  # flip random bytes
        for _ in range(int(rng.integers(1, 8))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
    else:  # splice garbage into the middle
        at = int(rng.integers(0, len(b)))
        b = b[:at] + bytes(rng.integers(0, 256, size=16, dtype=np.uint8)) + b[at:]
    try:
        decode_wav(bytes(b))
    except WavError:
        pass  # the contract: codec-typed errors only
