"""Pure-numpy JPEG codec (ITU-T T.81, public spec): baseline
sequential AND progressive.

This container ships no image libraries, so the multimodal pipeline
implements the codecs real training corpora overwhelmingly carry —
baseline and progressive JPEG/JFIF — from the published standard:

- ``decode_jpeg``: SOF0/1 (baseline sequential) AND SOF2 (progressive,
  T.81 Annex G: spectral selection, successive approximation, EOB
  runs, correction-bit refinement — the dominant web-crawl variant),
  8-bit, 1 or 3 components, any sampling factors (4:4:4 / 4:2:2 /
  4:2:0 ...), multiple DQT/DHT segments (progressive re-defines tables
  between scans), restart intervals. Entropy decode is a canonical-
  Huffman bit reader; every scan accumulates into shared per-component
  coefficient arrays, and dequantized blocks are inverse-DCT'd in one
  vectorized einsum per component (the per-block Python loop is only
  the Huffman parse). Output: uint8 (H, W) gray or (H, W, 3) RGB.
- ``encode_jpeg``: baseline 4:4:4 (or grayscale/420) with the Annex K
  example quantization + Huffman tables, quality-scaled per the
  classic IJG curve. ``encode_jpeg_progressive``: SOF2 writer with a
  DC-first/DC-refine/AC-band/AC-refine scan script. Both exist so
  round-trip tests can exercise the decoder on REAL compressed bytes
  without external fixtures, and as writers for pipeline sinks.

Not supported (raise ``UnsupportedJpegError``): arithmetic coding,
hierarchical, lossless, 12-bit precision, CMYK. The caller decides
whether that is fatal (strict mode) or falls back.

Scale note: decode runs inside ``mapInPandas`` batches on the scan
partitioning (sources/multimodal.py) — payload bytes never shuffle; a
swap to a C-backed decoder changes only this module.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    """Corrupt or truncated JPEG stream."""


class UnsupportedJpegError(JpegError):
    """Valid JPEG, but a mode outside baseline sequential."""


# ---------------------------------------------------------------- tables

# zig-zag scan order: ZIGZAG[i] = natural (row-major) position of the
# i-th coefficient in scan order (T.81 Figure A.6)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 example quantization tables (luminance / chrominance)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix T: forward F = T B Tᵀ,
    inverse B = Tᵀ F T."""
    u = np.arange(8)[:, None].astype(np.float64)
    x = np.arange(8)[None, :].astype(np.float64)
    t = np.cos((2 * x + 1) * u * np.pi / 16.0)
    t[0, :] *= 1.0 / np.sqrt(2.0)
    return t * 0.5


_T = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) by the canonical algorithm (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the decoder's bit-at-a-time walk."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits): T.81 F.1.2.1 — negatives use the
    one's-complement of |v|."""
    if v == 0:
        return 0, 0
    size = int(v if v > 0 else -v).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """Classic IJG quality curve: 50 → base table, 100 → all ones."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def _pad_replicate(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    p = np.empty((ph, pw), dtype=np.float64)
    p[:h, :w] = plane
    p[h:, :w] = plane[h - 1: h, :]  # edge-replicate padding
    p[:, w:] = p[:, w - 1: w]
    return p


def _block_coefs(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """(bh*8, bw*8) float plane → (bh*bw, 64) quantized zig-zag coefs,
    one vectorized DCT pass; row-major block order."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ux,nmxy,vy->nmuv", _T, blocks, _T)
    q = np.round(coef / quant.reshape(8, 8)).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _write_block(writer: _BitWriter, z: np.ndarray, prev_dc: int,
                 dc_codes: dict, ac_codes: dict) -> int:
    """Entropy-code one block's zig-zag coefficients; returns its DC."""
    diff = int(z[0]) - prev_dc
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(z)[0])) if np.any(z[1:]) else 0
    for k in range(1, 64):
        v = int(z[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(z[0])


def _prepare_encode(
    img: np.ndarray, quality: int, subsampling: str
) -> dict:
    """Shared front half of the baseline and progressive encoders:
    color transform, sampling geometry, quantized zig-zag coefficients
    per component."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 pixels")
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ncomp = a.shape
    if ncomp not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")

    if ncomp == 3:
        rgb = a.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        planes = [y, cb, cr]
    else:
        planes = [a[..., 0].astype(np.float64)]

    sub = subsampling == "420" and ncomp == 3
    # (h_factor, v_factor) per component
    factors = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * ncomp
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    quants = [ql] + ([qc, qc] if ncomp == 3 else [])

    comp_coefs = []
    comp_bw = []
    for ci, plane in enumerate(planes):
        fh, fv = factors[ci]
        if sub and ci > 0:
            # box-average the padded full plane 2x2 → half resolution
            full = _pad_replicate(plane, mcus_y * 16, mcus_x * 16)
            plane = full.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
        ph, pw = mcus_y * fv * 8, mcus_x * fh * 8
        p = _pad_replicate(plane, ph, pw)
        comp_coefs.append(_block_coefs(p, quants[ci]))
        comp_bw.append(pw // 8)
    return {
        "h": h,
        "w": w,
        "ncomp": ncomp,
        "factors": factors,
        "hmax": hmax,
        "vmax": vmax,
        "mcus_x": mcus_x,
        "mcus_y": mcus_y,
        "ql": ql,
        "qc": qc,
        "coefs": comp_coefs,
        "bw": comp_bw,
    }


def _headers(
    prep: dict, sof_marker: int, restart_interval: int = 0
) -> bytearray:
    """SOI + JFIF + DQT + SOF + (optional DRI) — everything up to the
    Huffman tables, shared by both encoders."""
    ncomp, factors = prep["ncomp"], prep["factors"]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(prep["ql"][ZIGZAG].astype(np.uint8)))
    if ncomp == 3:
        out += seg(0xDB, b"\x01" + bytes(prep["qc"][ZIGZAG].astype(np.uint8)))
    comps = b"".join(
        struct.pack(
            ">BBB",
            i + 1,
            (factors[i][0] << 4) | factors[i][1],
            0 if i == 0 else 1,
        )
        for i in range(ncomp)
    )
    out += seg(
        0xC0 if sof_marker == 0xC0 else sof_marker,
        struct.pack(">BHHB", 8, prep["h"], prep["w"], ncomp) + comps,
    )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    return out


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB → baseline JFIF bytes
    (Annex K tables quality-scaled). ``subsampling``: "444" (one block
    per component per MCU) or "420" (2x2 luma sampling, chroma box-
    averaged to half resolution — the dominant layout in real corpora,
    and the test vector for the decoder's upsampling path)."""
    prep = _prepare_encode(img, quality, subsampling)
    h, w, ncomp = prep["h"], prep["w"], prep["ncomp"]
    factors, mcus_x, mcus_y = prep["factors"], prep["mcus_x"], prep["mcus_y"]
    comp_coefs, comp_bw = prep["coefs"], prep["bw"]
    ql, qc = prep["ql"], prep["qc"]

    enc_dc = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    enc_ac = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if ncomp == 3:
        cdc = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        cac = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
        enc_dc += [cdc, cdc]
        enc_ac += [cac, cac]

    writer = _BitWriter()
    prev_dc = [0] * ncomp
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                # byte-align, emit RSTn, reset DC predictors (T.81 F.1.2.3)
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + (mcu_i // restart_interval - 1) % 8])
                prev_dc = [0] * ncomp
            mcu_i += 1
            for ci in range(ncomp):
                fh, fv = factors[ci]
                for v in range(fv):
                    for hdx in range(fh):
                        row = my * fv + v
                        col = mx * fh + hdx
                        z = comp_coefs[ci][row * comp_bw[ci] + col]
                        prev_dc[ci] = _write_block(
                            writer, z, prev_dc[ci], enc_dc[ci], enc_ac[ci]
                        )
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([tc_th] + bits + vals))

    out = _headers(prep, 0xC0, restart_interval)
    out += dht(0x00, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(0x10, AC_LUMA_BITS, AC_LUMA_VALS)
    if ncomp == 3:
        out += dht(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos_comps = b"".join(
        struct.pack(">BB", i + 1, 0x00 if i == 0 else 0x11) for i in range(ncomp)
    )
    out += seg(0xDA, bytes([ncomp]) + sos_comps + b"\x00\x3f\x00")
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# a spec-legal fixed "flat" Huffman table carrying ALL 256 symbols (254
# at 8 bits, 2 at 9) so progressive AC scans can emit any EOBn /
# (run, size) symbol without per-image table optimization. Canonical
# assignment leaves the all-ones code of both lengths unused (C.2's
# reserved-prefix rule). Compression is mediocre — fine for a writer
# whose job is producing REAL progressive streams for the decoder.
_FLAT_BITS = [0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0, 0]
_FLAT_VALS = list(range(256))


def _shift_toward_zero(v: int, al: int) -> int:
    """T.81 G.1.2.2: AC successive approximation divides by 2^Al
    rounding TOWARD ZERO (DC uses an arithmetic shift instead)."""
    return v >> al if v >= 0 else -((-v) >> al)


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, subsampling: str = "444"
) -> bytes:
    """uint8 gray/RGB → progressive (SOF2) JFIF bytes.

    Scan script (exercises every Annex G decode path: spectral
    selection, successive approximation, EOB runs, correction bits):

    1. DC, all components interleaved, Ah=0 Al=1
    2. DC refinement, Ah=1 Al=0 (raw bits, no Huffman table)
    3. per component: AC band Ss=1..Se=63, Ah=0 Al=1  (EOB0 per block)
    4. per component: AC refinement Ss=1..Se=63, Ah=1 Al=0
    """
    prep = _prepare_encode(img, quality, subsampling)
    ncomp = prep["ncomp"]
    factors, mcus_x, mcus_y = prep["factors"], prep["mcus_x"], prep["mcus_y"]
    comp_coefs, comp_bw = prep["coefs"], prep["bw"]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([tc_th] + bits + vals))

    def sos(comp_specs: list[tuple[int, int, int]], ss: int, se: int,
            ah: int, al: int) -> bytes:
        body = bytes([len(comp_specs)])
        for cid, td, ta in comp_specs:
            body += struct.pack(">BB", cid, (td << 4) | ta)
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    enc_dc = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    if ncomp == 3:
        cdc = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        enc_dc += [cdc, cdc]
    flat = _canonical_codes(_FLAT_BITS, _FLAT_VALS)

    out = _headers(prep, 0xC2)
    out += dht(0x00, DC_LUMA_BITS, DC_LUMA_VALS)
    if ncomp == 3:
        out += dht(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += dht(0x10, _FLAT_BITS, _FLAT_VALS)

    def ni_grid(ci: int) -> tuple[int, int]:
        fh_, fv_ = factors[ci]
        w_sub = -(-prep["w"] * fh_ // prep["hmax"])
        h_sub = -(-prep["h"] * fv_ // prep["vmax"])
        return -(-h_sub // 8), -(-w_sub // 8)

    # scan 1: DC first, interleaved, Al=1 (arithmetic shift per G.1.2.1)
    w = _BitWriter()
    prev = [0] * ncomp
    for m in range(mcus_x * mcus_y):
        my, mx = divmod(m, mcus_x)
        for ci in range(ncomp):
            fh_, fv_ = factors[ci]
            for v in range(fv_):
                for hdx in range(fh_):
                    z = comp_coefs[ci][(my * fv_ + v) * comp_bw[ci]
                                       + mx * fh_ + hdx]
                    val = int(z[0]) >> 1
                    size, bits = _magnitude(val - prev[ci])
                    code, length = enc_dc[ci][size]
                    w.write(code, length)
                    if size:
                        w.write(bits, size)
                    prev[ci] = val
    w.flush()
    out += sos([(i + 1, 0 if i == 0 else min(i, 1), 0)
                for i in range(ncomp)], 0, 0, 0, 1)
    out += w.out

    # scan 2: DC refinement — one raw bit per block, same MCU order
    w = _BitWriter()
    for m in range(mcus_x * mcus_y):
        my, mx = divmod(m, mcus_x)
        for ci in range(ncomp):
            fh_, fv_ = factors[ci]
            for v in range(fv_):
                for hdx in range(fh_):
                    z = comp_coefs[ci][(my * fv_ + v) * comp_bw[ci]
                                       + mx * fh_ + hdx]
                    w.write(int(z[0]) & 1, 1)
    w.flush()
    out += sos([(i + 1, 0, 0) for i in range(ncomp)], 0, 0, 1, 0)
    out += w.out

    # scans 3..: AC first per component, Al=1, per-block EOB0
    for ci in range(ncomp):
        nbh, nbw = ni_grid(ci)
        w = _BitWriter()
        for b in range(nbh * nbw):
            r_, col = divmod(b, nbw)
            z = comp_coefs[ci][r_ * comp_bw[ci] + col]
            run = 0
            coded_any_tail = False
            for k in range(1, 64):
                t = _shift_toward_zero(int(z[k]), 1)
                if t == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = flat[0xF0]  # ZRL
                    w.write(code, length)
                    run -= 16
                size, bits = _magnitude(t)
                code, length = flat[(run << 4) | size]
                w.write(code, length)
                w.write(bits, size)
                run = 0
                coded_any_tail = True
            if run or not coded_any_tail:
                code, length = flat[0x00]  # EOB0 (run of exactly 1)
                w.write(code, length)
        w.flush()
        out += sos([(ci + 1, 0, 0)], 1, 63, 0, 1)
        out += w.out

    # scans 4..: AC refinement per component (G.1.2.3 mirror of the
    # decoder's correction-bit walk), per-block EOB0
    for ci in range(ncomp):
        nbh, nbw = ni_grid(ci)
        w = _BitWriter()
        for b in range(nbh * nbw):
            r_, col = divmod(b, nbw)
            z = comp_coefs[ci][r_ * comp_bw[ci] + col]
            absval = [abs(int(z[k])) for k in range(64)]
            # last newly-nonzero index: ZRL may only be emitted while a
            # (run, 1) symbol still follows (G.1.2.3 — libjpeg's EOB
            # gate); trailing runs are absorbed by the block's EOB
            eob_idx = max((k for k in range(1, 64) if absval[k] == 1), default=0)
            run = 0
            pending: list[int] = []  # correction bits awaiting a symbol
            for k in range(1, 64):
                t = absval[k]
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob_idx:
                    code, length = flat[0xF0]
                    w.write(code, length)
                    for bit in pending:
                        w.write(bit, 1)
                    pending = []
                    run -= 16
                if t > 1:
                    # history-nonzero: correction bit rides with the
                    # next coded symbol; does NOT reset the run
                    pending.append(t & 1)
                    continue
                # newly nonzero (|coef| == 1): (run, 1) + sign bit
                code, length = flat[(run << 4) | 1]
                w.write(code, length)
                w.write(1 if int(z[k]) > 0 else 0, 1)
                for bit in pending:
                    w.write(bit, 1)
                pending = []
                run = 0
            # EOB0 carries any trailing correction bits — but ONLY if
            # the block has a tail the decoder hasn't consumed (run of
            # zero-history positions or pending bits). A block whose
            # last newly-nonzero coefficient sits exactly at k=63 is
            # already complete; an unconditional EOB0 here desyncs the
            # next block's symbol stream (found by the hypothesis
            # sweep on noise images; libjpeg guards with r>0||BR>0)
            if run > 0 or pending:
                code, length = flat[0x00]
                w.write(code, length)
                for bit in pending:
                    w.write(bit, 1)
        w.flush()
        out += sos([(ci + 1, 0, 0)], 1, 63, 1, 0)
        out += w.out

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        while self.n <= 24:
            if self.pos >= len(d):
                raise JpegError("truncated entropy segment")
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt == 0x00:
                    self.pos += 2
                elif nxt is None:
                    raise JpegError("truncated entropy segment")
                else:
                    # a real marker: feed 1-padding so a well-formed
                    # stream finishes its last block; the scan loop
                    # checks markers via at_marker()
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Consume padding + a RSTn marker between restart intervals."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise JpegError("missing restart marker")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map size-bit magnitude to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline-sequential JPEG → uint8 (H, W) gray or (H, W, 3) RGB.

    Any structural parse failure on the untrusted byte stream surfaces
    as ``JpegError`` (``UnsupportedJpegError`` for valid-but-non-
    baseline modes), never a raw numpy/struct exception."""
    try:
        return _decode_impl(data)
    except JpegError:
        raise
    except (struct.error, ValueError, IndexError, KeyError, OverflowError) as e:
        # OverflowError: defense-in-depth for any residual path where a
        # corrupt stream drives a Python int past a numpy cell's range
        # (the known DC-size path is bounded at the source above)
        raise JpegError(f"corrupt JPEG stream: {e}") from e


def _alloc_frame(frame: dict) -> None:
    """Compute MCU geometry and allocate per-component coefficient
    arrays (shared by the baseline single-scan path and every
    progressive scan, which all accumulate into the same arrays)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcus_x"] = -(-frame["w"] // (8 * hmax))
    frame["mcus_y"] = -(-frame["h"] // (8 * vmax))
    for c in comps:
        c["bw"] = frame["mcus_x"] * c["h"]  # blocks across (MCU-padded)
        c["bh"] = frame["mcus_y"] * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)


def _ni_grid(frame: dict, c: dict) -> tuple[int, int]:
    """(nbh, nbw) block grid of a NON-interleaved scan: the component's
    own sampled dimensions, NOT the MCU-padded ones (T.81 A.2.2 — the
    classic progressive gotcha; indexing the padded grid here reads
    blocks the scan never coded)."""
    w_sub = -(-frame["w"] * c["h"] // frame["hmax"])
    h_sub = -(-frame["h"] * c["v"] // frame["vmax"])
    return -(-h_sub // 8), -(-w_sub // 8)


def _baseline_scan(
    data: bytes,
    pos: int,
    frame: dict,
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
) -> int:
    """Decode the single baseline scan; returns the stream position of
    the marker that ended the entropy segment."""
    comps = frame["comps"]
    mcus_x, mcus_y = frame["mcus_x"], frame["mcus_y"]
    reader = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    n_mcu = mcus_x * mcus_y
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_restart()
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcus_x)
        for c in comps:
            dc_tab = huff_dc[c["td"]]
            ac_tab = huff_ac[c["ta"]]
            for v in range(c["v"]):
                for hdx in range(c["h"]):
                    z = np.zeros(64, dtype=np.int64)
                    size = _huff_decode(reader, dc_tab)
                    if size > 11:
                        # T.81 table F.1: DC SSSS ≤ 11 at 8-bit
                        # precision. A corrupt DHT can map a code to any
                        # byte symbol; an unbounded size here feeds
                        # reader.bits() an arbitrary-width magnitude
                        # whose running pred overflows the int64 coef
                        # cell (raw OverflowError, breaking the typed-
                        # error contract).
                        raise JpegError(f"corrupt DC size {size}")
                    diff = _extend(reader.bits(size), size)
                    pred[c["id"]] += diff
                    z[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(reader, ac_tab)
                        run, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise JpegError("AC run past block end")
                        z[k] = _extend(reader.bits(size), size)
                        k += 1
                    row = my * c["v"] + v
                    col = mx * c["h"] + hdx
                    c["coef"][row * c["bw"] + col] = z
    return reader.pos


def _refine_nonzero(reader: _BitReader, z: np.ndarray, k: int, p1: int) -> None:
    """Apply one correction bit to an already-nonzero coefficient
    (T.81 G.2.2): a 1-bit grows the magnitude away from zero by p1."""
    if reader.bit() and not (abs(int(z[k])) & p1):
        z[k] += p1 if z[k] > 0 else -p1


def _dc_scan(
    reader: _BitReader,
    frame: dict,
    scan_comps: list[dict],
    huff_dc: dict,
    ah: int,
    al: int,
    restart_interval: int,
) -> None:
    """Progressive DC scan (first when Ah=0, refinement otherwise).
    Multi-component scans interleave in MCU order; a single-component
    scan walks the component's non-interleaved grid."""
    pred = {c["id"]: 0 for c in scan_comps}
    interleaved = len(scan_comps) > 1

    def one_block(c: dict, idx: int) -> None:
        z = c["coef"][idx]
        if ah == 0:
            size = _huff_decode(reader, huff_dc[c["td"]])
            if size > 11:
                # same T.81 F.1 bound as the baseline path — without it
                # a corrupt DHT symbol >15 accumulates pred past int64
                # and `z[0] = pred << al` raises raw OverflowError
                # (hypothesis seed=37932)
                raise JpegError(f"corrupt DC size {size}")
            diff = _extend(reader.bits(size), size)
            pred[c["id"]] += diff
            z[0] = pred[c["id"]] << al
        elif reader.bit():
            # append the next magnitude bit; Python's arbitrary-
            # precision ints OR like two's complement, which is
            # exactly the T.81 G.2.1 semantics for negative DC
            z[0] = int(z[0]) | (1 << al)

    if interleaved:
        mcus_x, mcus_y = frame["mcus_x"], frame["mcus_y"]
        for m in range(mcus_x * mcus_y):
            if restart_interval and m and m % restart_interval == 0:
                reader.align_restart()
                pred = {c["id"]: 0 for c in scan_comps}
            my, mx = divmod(m, mcus_x)
            for c in scan_comps:
                for v in range(c["v"]):
                    for hdx in range(c["h"]):
                        one_block(
                            c, (my * c["v"] + v) * c["bw"] + mx * c["h"] + hdx
                        )
    else:
        c = scan_comps[0]
        nbh, nbw = _ni_grid(frame, c)
        for b in range(nbh * nbw):
            if restart_interval and b and b % restart_interval == 0:
                reader.align_restart()
                pred = {c["id"]: 0}
            r, col = divmod(b, nbw)
            one_block(c, r * c["bw"] + col)


def _ac_scan(
    reader: _BitReader,
    frame: dict,
    c: dict,
    huff_ac: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> None:
    """Progressive AC scan over one component's non-interleaved grid:
    first pass (Ah=0) decodes (run, size) symbols with EOB-run
    aggregation; refinement (Ah>0) is the G.2.2 correction-bit walk."""
    ac_tab = huff_ac[c["ta"]]
    nbh, nbw = _ni_grid(frame, c)
    p1 = 1 << al
    eobrun = 0
    for b in range(nbh * nbw):
        if restart_interval and b and b % restart_interval == 0:
            reader.align_restart()
            eobrun = 0
        r, col = divmod(b, nbw)
        z = c["coef"][r * c["bw"] + col]
        if ah == 0:
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _huff_decode(reader, ac_tab)
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run < 15:  # EOBn: run of (1<<run)+bits end-of-bands
                        eobrun = (1 << run) - 1
                        if run:
                            eobrun += reader.bits(run)
                        break
                    k += 16  # ZRL
                    continue
                k += run
                if k > se:
                    raise JpegError("AC run past band end")
                z[k] = _extend(reader.bits(size), size) << al
                k += 1
        else:
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_decode(reader, ac_tab)
                    run, size = rs >> 4, rs & 0x0F
                    newval = 0
                    if size == 0:
                        if run < 15:
                            eobrun = 1 << run
                            if run:
                                eobrun += reader.bits(run)
                            break
                        # ZRL: skip 16 zero-history positions
                    else:
                        if size != 1:
                            raise JpegError("refinement size != 1")
                        newval = p1 if reader.bit() else -p1
                    # advance over `run` zero-history positions,
                    # correcting nonzero-history coefficients passed
                    while k <= se:
                        if z[k] != 0:
                            _refine_nonzero(reader, z, k, p1)
                        else:
                            if run == 0:
                                break
                            run -= 1
                        k += 1
                    if newval:
                        if k > se:
                            raise JpegError("refinement past band end")
                        z[k] = newval
                    k += 1
            if eobrun:
                # end-of-band: remaining nonzero coefficients of this
                # block still receive their correction bits
                while k <= se:
                    if z[k] != 0:
                        _refine_nonzero(reader, z, k, p1)
                    k += 1
                eobrun -= 1


def _decode_impl(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    progressive = False
    restart_interval = 0
    saw_scan = False

    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(data):
            raise JpegError("truncated segment header")
        seg_len = struct.unpack(">H", data[pos: pos + 2])[0]
        seg = data[pos + 2: pos + seg_len]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, offset=i).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, offset=i).astype(np.int64)
                    i += 128
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = tbl  # stored in zig-zag order
                quant[tq] = nat
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1: i + 17])
                n = sum(bits)
                vals = list(seg[i + 17: i + 17 + n])
                i += 17 + n
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, vals)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise UnsupportedJpegError(f"{prec}-bit precision")
            progressive = marker == 0xC2
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c: 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            if nc not in (1, 3):
                raise UnsupportedJpegError(f"{nc}-component image")
            frame = {"h": fh, "w": fw, "comps": comps}
            _alloc_frame(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedJpegError(f"SOF marker 0xFF{marker:02X} "
                                       "(arithmetic/hierarchical/lossless)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            by_id = {c["id"]: c for c in frame["comps"]}
            scan_comps = []
            for ci in range(ns):
                cs, tdta = seg[1 + 2 * ci: 3 + 2 * ci]
                if cs not in by_id:
                    raise JpegError(f"scan references unknown component {cs}")
                c = by_id[cs]
                c["td"], c["ta"] = tdta >> 4, tdta & 0x0F
                scan_comps.append(c)
            ss, se, ahal = seg[1 + 2 * ns: 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos += seg_len  # entropy data follows
            saw_scan = True
            if not progressive:
                pos = _baseline_scan(
                    data, pos, frame, huff_dc, huff_ac, restart_interval
                )
            elif ss == 0:
                if se != 0:
                    raise JpegError("DC scan with Se != 0")
                _r = _BitReader(data, pos)
                _dc_scan(_r, frame, scan_comps, huff_dc, ah, al, restart_interval)
                pos = _r.pos
            else:
                if ns != 1:
                    raise JpegError("interleaved progressive AC scan")
                _r = _BitReader(data, pos)
                _ac_scan(
                    _r, frame, scan_comps[0], huff_ac, ss, se, ah, al,
                    restart_interval,
                )
                pos = _r.pos
            continue
        pos += seg_len

    if frame is None or not saw_scan:
        raise JpegError("missing SOF/SOS")
    comps = frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    fw, fh = frame["w"], frame["h"]

    planes = []
    for c in comps:
        nat = np.zeros((c["coef"].shape[0], 64), dtype=np.int64)
        nat[:, ZIGZAG] = c["coef"]  # de-zig-zag
        deq = nat * quant[c["tq"]][None, :]
        blocks = deq.reshape(-1, 8, 8).astype(np.float64)
        # one vectorized inverse DCT for the whole component: B = Tᵀ F T
        pix = np.einsum("ux,nuv,vy->nxy", _T, blocks, _T) + 128.0
        bh, bw = c["bh"], c["bw"]
        plane = (
            pix.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full MCU grid, then crop to frame size
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
