"""MPEG audio (MP3) metadata probe — header walk, NO audio decode.

Full MP3 decode needs the ISO 11172-3 Huffman tables + polyphase
filterbank (an external-codec job, honestly out of scope here), but
training-data pipelines rarely decode audio to catalogue it: they probe
container metadata (what ffprobe does). Frame headers are public spec
and trivially parseable, so duration / sample-rate / bitrate are REAL:

- skips an ID3v2 tag (syncsafe length), then walks MPEG-1/2/2.5
  Layer I/II/III frame headers, accumulating samples-per-frame;
- honors a Xing/Info VBR header (total frame count) when present, so
  VBR files don't need a full walk to report duration;
- stops at the first malformed header (truncated downloads are common
  in crawled corpora) and reports what was walked.

``probe_mp3`` raises ``Mp3Error`` if the payload has no valid first
frame. Feature extraction for MP3 stays behind the strict-mode refusal
in sources/multimodal.py — the probe provides metadata, not samples.
"""

from __future__ import annotations


class Mp3Error(ValueError):
    """Not an MPEG audio stream (or no parseable first frame)."""


# bitrate tables (kbps), index 1..14; [version][layer]
_BITRATE = {
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATE = {1: [44100, 48000, 32000], 2: [22050, 24000, 16000],
                25: [11025, 12000, 8000]}
_SAMPLES_PER_FRAME = {(1, 1): 384, (1, 2): 1152, (1, 3): 1152,
                      (2, 1): 384, (2, 2): 1152, (2, 3): 576}


def _parse_header(b: bytes, pos: int) -> dict | None:
    """Parse the 4-byte frame header at ``pos``; None if invalid."""
    if pos + 4 > len(b):
        return None
    h = int.from_bytes(b[pos: pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:  # 11-bit sync
        return None
    ver_bits = (h >> 19) & 0x3
    version = {0: 25, 2: 2, 3: 1}.get(ver_bits)  # 1=MPEG1, 2, 25=2.5
    layer = {1: 3, 2: 2, 3: 1}.get((h >> 17) & 0x3)  # 3=Layer III
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 0x3
    padding = (h >> 9) & 0x1
    if version is None or layer is None or br_idx in (0, 15) or sr_idx == 3:
        return None
    vkey = 1 if version == 1 else 2
    bitrate = _BITRATE[(vkey, layer)][br_idx - 1] * 1000
    rate = _SAMPLE_RATE[version][sr_idx]
    spf = _SAMPLES_PER_FRAME[(vkey, layer)]
    if layer == 1:
        size = (12 * bitrate // rate + padding) * 4
    else:
        # Layer III MPEG2/2.5 uses 72 (spf 576); II and MPEG1-III use 144
        factor = spf // 8
        size = factor * bitrate // rate + padding
    mode = (h >> 6) & 0x3  # 3 = mono
    return {
        "size": size,
        "rate": rate,
        "spf": spf,
        "bitrate": bitrate,
        "channels": 1 if mode == 3 else 2,
        "version": version,
        "layer": layer,
    }


def probe_mp3(data: bytes) -> dict:
    """Walk the stream and return {duration_ms, sample_rate, bitrate,
    channels, n_frames, vbr} from frame headers alone."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:  # ID3v2: syncsafe length
        size = (
            (data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7 | (data[9] & 0x7F)
        )
        pos = 10 + size
    first = _parse_header(data, pos)
    if first is None:
        raise Mp3Error("no valid MPEG audio frame header")

    # Xing/Info VBR header sits inside the first frame after the side
    # info (MPEG1: 32B stereo / 17B mono; MPEG2: 17/9)
    side = {1: (17, 32), 2: (9, 17), 25: (9, 17)}[first["version"]]
    off = pos + 4 + (side[0] if first["channels"] == 1 else side[1])
    n_frames = None
    vbr = False
    tag = data[off: off + 4]
    if tag in (b"Xing", b"Info") and data[off + 7: off + 8]:
        flags = int.from_bytes(data[off + 4: off + 8], "big")
        if flags & 0x1 and len(data) >= off + 12:
            n_frames = int.from_bytes(data[off + 8: off + 12], "big")
            vbr = tag == b"Xing"

    if n_frames is None:  # walk CBR/truncated streams frame by frame
        n_frames = 0
        p = pos
        while True:
            h = _parse_header(data, p)
            if h is None or h["size"] <= 4 or p + h["size"] > len(data):
                break
            n_frames += 1
            p += h["size"]

    rate = first["rate"]
    duration_ms = int(n_frames * first["spf"] * 1000 // rate) if rate else 0
    return {
        "duration_ms": duration_ms,
        "sample_rate": rate,
        "bitrate": first["bitrate"],
        "channels": first["channels"],
        "n_frames": n_frames,
        "vbr": vbr,
    }
