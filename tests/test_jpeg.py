"""Pure-numpy JPEG codec (sources/jpeg.py), baseline + progressive:
round-trip accuracy, subsampling, restart markers, bit-equality of the
two modes on shared coefficients, generative + mutation sweeps, and
rejection of genuinely-unsupported modes — plus the end-to-end
strict-mode Spark paths for real JPEG payloads."""

from __future__ import annotations

import numpy as np
import pytest

from data_warehouse_project_spark.sources.jpeg import (
    JpegError,
    UnsupportedJpegError,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
from data_warehouse_project_spark.sources.multimodal import (
    extract_media_features,
    media_schema,
)


def _gradient_rgb(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 255 // w), (yy * 255 // h), ((xx + yy) * 255 // (h + w))],
        axis=2,
    ).astype(np.uint8)


def test_roundtrip_flat_is_exact():
    img = np.full((16, 16), 128, np.uint8)
    assert (decode_jpeg(encode_jpeg(img, 90)) == img).all()
    flat = np.zeros((32, 32, 3), np.uint8)
    flat[:] = (200, 80, 40)
    out = decode_jpeg(encode_jpeg(flat, 90, subsampling="420"))
    assert np.abs(out.astype(int) - flat.astype(int)).max() == 0


def test_roundtrip_gradient_tight():
    img = np.linspace(0, 255, 23 * 37).reshape(23, 37).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, 95))
    assert out.shape == img.shape  # odd dims crop back exactly
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    rgb = _gradient_rgb(40, 56)
    out = decode_jpeg(encode_jpeg(rgb, 92))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4


def test_roundtrip_420_subsampling():
    rgb = _gradient_rgb(48, 64)
    bytes_420 = encode_jpeg(rgb, 92, subsampling="420")
    bytes_444 = encode_jpeg(rgb, 92, subsampling="444")
    out = decode_jpeg(bytes_420)
    assert out.shape == rgb.shape
    # chroma halving loses a bit more than 4:4:4 but stays close on a
    # smooth gradient; and the stream is genuinely smaller
    assert np.abs(out.astype(int) - rgb.astype(int)).mean() < 3.0
    assert len(bytes_420) < len(bytes_444)
    # odd dims exercise the decoder's crop after MCU-grid upsampling
    odd = rgb[:33, :41]
    out = decode_jpeg(encode_jpeg(odd, 90, subsampling="420"))
    assert out.shape == odd.shape


def test_restart_intervals():
    rgb = _gradient_rgb(48, 64)
    ref = decode_jpeg(encode_jpeg(rgb, 90))
    for ri in (1, 2, 5):
        out = decode_jpeg(encode_jpeg(rgb, 90, restart_interval=ri))
        # RSTn segmentation must not change decoded content
        assert (out == ref).all()
    out = decode_jpeg(encode_jpeg(rgb, 90, subsampling="420", restart_interval=3))
    assert out.shape == rgb.shape


def test_quality_monotone_size():
    rgb = _gradient_rgb(40, 40)
    sizes = [len(encode_jpeg(rgb, q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_rejects_non_baseline_and_corrupt():
    rgb = _gradient_rgb(16, 16)
    b = bytearray(encode_jpeg(rgb, 90))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC9  # rewrite SOF0 → SOF9 (arithmetic sequential)
    with pytest.raises(UnsupportedJpegError):
        decode_jpeg(bytes(b))
    b[i + 1] = 0xC2  # SOF2: now a SUPPORTED mode — but a baseline scan
    # header (Ss=0, Se=63) is malformed progressive, not unsupported
    with pytest.raises(JpegError):
        decode_jpeg(bytes(b))
    with pytest.raises(JpegError):
        decode_jpeg(encode_jpeg(rgb, 90)[:40])  # truncated
    with pytest.raises(JpegError):
        decode_jpeg(b"not a jpeg at all")


def test_progressive_roundtrip_matches_baseline_exactly():
    """Baseline and progressive encodings share quantized coefficients
    (same _prepare_encode), so after full decode the PIXELS must be
    bit-identical — any divergence is a bug in a progressive scan path
    (EOB runs, correction bits, the non-interleaved grid...)."""
    for img, sub in (
        (_gradient_rgb(32, 48), "444"),
        (_gradient_rgb(20, 36), "420"),  # luma ni-grid ≠ padded grid
        (_gradient_rgb(12, 20)[:, :, 0], "444"),  # grayscale, odd size
    ):
        base = decode_jpeg(encode_jpeg(img, 85, subsampling=sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, 85, subsampling=sub))
        assert base.shape == prog.shape
        assert (base == prog).all(), f"divergence for sub={sub}"


def test_progressive_roundtrip_accuracy():
    img = _gradient_rgb(40, 40)
    out = decode_jpeg(encode_jpeg_progressive(img, 95))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12
    flat = np.full((24, 24), 77, np.uint8)
    assert (decode_jpeg(encode_jpeg_progressive(flat, 90)) == flat).all()


def test_progressive_header_is_sof2():
    b = encode_jpeg_progressive(_gradient_rgb(16, 16), 85)
    assert b.find(b"\xff\xc2") > 0 and b.find(b"\xff\xc0") < 0
    # multiple SOS scans: DC first + DC refine + 3×(AC first, AC refine)
    assert b.count(b"\xff\xda") == 8
    with pytest.raises(JpegError):
        decode_jpeg(b[: len(b) // 2])  # truncated mid-scan


def test_jpeg_end_to_end_strict_spark(spark):
    """Real JPEG payloads flow through mapInPandas in STRICT mode: true
    dimensions and pixel-derived features, no fallback involved."""
    flat = np.zeros((24, 40, 3), np.uint8)
    flat[:] = (90, 150, 210)
    rows = [
        (1, "image", encode_jpeg(flat, 95), "mem://flat.jpg"),
        (2, "image", encode_jpeg(_gradient_rgb(32, 48), 90, subsampling="420"),
         "mem://grad.jpg"),
    ]
    out = (
        extract_media_features(
            spark.createDataFrame(rows, media_schema()), strict=True
        )
        .orderBy("media_id")
        .collect()
    )
    assert (out[0]["width"], out[0]["height"]) == (40, 24)
    assert (out[1]["width"], out[1]["height"]) == (48, 32)
    # flat image: 4 quadrant means == gray mean (_image_feature uses
    # the unweighted channel average), channel means == color
    gray = (90 + 150 + 210) / 3.0
    feat = out[0]["feature"]
    for q in feat[:4]:
        assert abs(q - gray) < 2.0
    for got, want in zip(feat[4:7], (90.0, 150.0, 210.0)):
        assert abs(got - want) < 2.0
    assert abs(feat[7]) < 2.0  # near-zero std


def test_progressive_jpeg_decodes_in_strict_spark(spark):
    """Progressive JPEG is now a REAL decode in strict mode (r6 verdict
    item 6): the same payload a web crawl delivers flows through
    mapInPandas with true dimensions and pixel-derived features."""
    flat = np.zeros((24, 40, 3), np.uint8)
    flat[:] = (90, 150, 210)
    rows = [(1, "image", encode_jpeg_progressive(flat, 95), "mem://p.jpg")]
    out = extract_media_features(
        spark.createDataFrame(rows, media_schema()), strict=True
    ).collect()
    assert (out[0]["width"], out[0]["height"]) == (40, 24)
    gray = (90 + 150 + 210) / 3.0
    assert abs(out[0]["feature"][0] - gray) < 2.0


def test_arithmetic_jpeg_still_refuses_in_strict_spark(spark):
    """Strict mode keeps rejecting what the codec genuinely cannot
    decode (arithmetic coding) — honesty preserved; the refusal list is
    now MP3 samples + H.264 + arithmetic/hierarchical JPEG."""
    b = bytearray(encode_jpeg(_gradient_rgb(16, 16), 90))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC9
    rows = [(1, "image", bytes(b), "mem://arith.jpg")]
    with pytest.raises(Exception, match="NotImplementedError|no decoder"):
        extract_media_features(
            spark.createDataFrame(rows, media_schema()), strict=True
        ).collect()


# ------------------------------------------------- hypothesis sweep

from hypothesis import HealthCheck, example, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _image_case(draw):
    h = draw(st.integers(8, 40))
    w = draw(st.integers(8, 40))
    gray = draw(st.booleans())
    sub = draw(st.sampled_from(["444", "420"]))
    quality = draw(st.sampled_from([50, 75, 85, 95]))
    seed = draw(st.integers(0, 2**31))
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    kind = draw(st.sampled_from(["noise", "gradient", "flat", "blocks"]))
    if kind == "noise":
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    elif kind == "flat":
        img = np.full(shape, int(rng.integers(0, 256)), np.uint8)
    elif kind == "blocks":
        img = np.kron(
            rng.integers(0, 256, size=(4, 4) if gray else (4, 4, 1)),
            np.ones((10, 10) if gray else (10, 10, 3)),
        )[:h, :w].astype(np.uint8)
        img = img.reshape(shape)
    else:
        yy, xx = np.mgrid[0:h, 0:w]
        g = ((xx * 7 + yy * 13) % 256).astype(np.uint8)
        img = g if gray else np.stack([g, g[::-1], 255 - g], axis=2)
    return img, sub, quality


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(case=_image_case())
def test_hypothesis_progressive_equals_baseline(case):
    """Generative sweep of the bit-equality gate: for ANY image,
    subsampling and quality, baseline and progressive encodings share
    quantized coefficients, so the decoded pixels must be identical —
    one differing pixel means a progressive scan path bug."""
    img, sub, quality = case
    base = decode_jpeg(encode_jpeg(img, quality, subsampling=sub))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality, subsampling=sub))
    assert base.shape == prog.shape
    assert (base == prog).all()


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(seed=st.integers(0, 2**31))
# r7 falsifying example: byte flips forged a DHT mapping a code to a DC
# size symbol >15, whose arbitrary-width magnitude accumulated pred past
# int64 → raw OverflowError at the progressive z[0] store (fixed by the
# T.81 F.1 size≤11 bound in both DC paths):
@example(seed=37932)
def test_hypothesis_jpeg_mutation_never_raises_raw(seed):
    """Untrusted-bytes contract for BOTH modes: any truncation, byte
    flip or splice of a valid baseline/progressive stream either still
    decodes or raises JpegError — never a raw numpy/struct/key/index
    exception."""
    rng = np.random.default_rng(seed)
    img = _gradient_rgb(24, 24)
    base = (
        encode_jpeg(img, 80)
        if rng.integers(0, 2)
        else encode_jpeg_progressive(img, 80)
    )
    b = bytearray(base)
    kind = int(rng.integers(0, 3))
    if kind == 0:
        b = b[: int(rng.integers(0, len(b)))]
    elif kind == 1:
        for _ in range(int(rng.integers(1, 8))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
    else:
        at = int(rng.integers(0, len(b)))
        b = b[:at] + bytes(rng.integers(0, 256, size=16, dtype=np.uint8)) + b[at:]
    try:
        decode_jpeg(bytes(b))
    except JpegError:
        pass
