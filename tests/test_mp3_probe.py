"""MP3 frame-header probe (sources/mp3.py): duration/rate metadata from
hand-built MPEG frames — real header math, no audio decode."""

from __future__ import annotations

import pytest

from data_warehouse_project_spark.sources.mp3 import Mp3Error, probe_mp3
from data_warehouse_project_spark.sources.multimodal import (
    extract_media_features,
    media_schema,
)


def _frame(bitrate_idx=9, sr_idx=0, padding=0, mono=True, fill=0x00):
    """One MPEG-1 Layer III frame: 0xFFFB header + computed body."""
    rate = [44100, 48000, 32000][sr_idx]
    kbps = [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320][
        bitrate_idx - 1
    ]
    size = 144 * kbps * 1000 // rate + padding
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = 0xC0 if mono else 0x00
    return bytes([0xFF, 0xFB, b2, b3]) + bytes([fill]) * (size - 4)


def test_cbr_walk_duration():
    data = _frame() * 10  # 10 frames @ 44100 Hz, 1152 samples each
    info = probe_mp3(data)
    assert info["sample_rate"] == 44100
    assert info["bitrate"] == 128000
    assert info["channels"] == 1
    assert info["n_frames"] == 10
    assert info["duration_ms"] == 10 * 1152 * 1000 // 44100  # 261
    assert info["vbr"] is False


def test_id3v2_tag_skipped():
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"x" * 10
    info = probe_mp3(tag + _frame() * 3)
    assert info["n_frames"] == 3


def test_truncated_stream_reports_walked_frames():
    data = _frame() * 5 + _frame()[:50]  # sixth frame cut short
    assert probe_mp3(data)["n_frames"] == 5


def test_xing_vbr_header():
    f = bytearray(_frame())
    off = 4 + 17  # MPEG1 mono side info
    f[off: off + 4] = b"Xing"
    f[off + 4: off + 8] = (1).to_bytes(4, "big")  # FRAMES flag
    f[off + 8: off + 12] = (100).to_bytes(4, "big")
    info = probe_mp3(bytes(f))
    assert info["n_frames"] == 100 and info["vbr"] is True
    assert info["duration_ms"] == 100 * 1152 * 1000 // 44100


def test_rejects_non_mpeg():
    with pytest.raises(Mp3Error):
        probe_mp3(b"certainly not audio")
    with pytest.raises(Mp3Error):
        probe_mp3(b"ID3\x04\x00\x00\x00\x00\x00\x02xxgarbage after tag")


def test_mp3_real_duration_in_test_mode_strict_still_refuses(spark):
    """Policy: test mode carries the REAL probed duration with digest
    features; strict mode keeps refusing (samples are not decoded)."""
    rows = [(1, "audio", _frame() * 20, "mem://song.mp3")]
    media = spark.createDataFrame(rows, media_schema())
    out = extract_media_features(media).collect()[0]
    assert out["duration_ms"] == 20 * 1152 * 1000 // 44100
    with pytest.raises(Exception, match="NotImplementedError|no decoder"):
        extract_media_features(media, strict=True).collect()
