"""Pure-python+numpy PNG codec (RFC 2083 / W3C PNG spec, public).

PNG's compression is DEFLATE, which the Python stdlib ships (``zlib``),
so unlike JPEG nothing needs reimplementing at the bit level — the work
is chunk framing and scanline unfiltering:

- ``decode_png``: 8-bit and 16-bit channels; color types 0 (gray),
  2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); all five scanline
  filters. None/Up are whole-row vectorized and Sub is a residue-class
  cumsum; Average/Paeth are the spec's left-neighbor recurrences —
  inherently sequential in x, run as list loops (a C-backed decoder is
  the production swap for Paeth-heavy high-resolution corpora).
  Interlaced (Adam7) images raise ``UnsupportedPngError``. Output:
  uint8 array (16-bit sources are scaled down), shape (H, W) or
  (H, W, C).
- ``encode_png``: filter-0 scanlines + one zlib stream — a minimal but
  fully standard writer, so tests round-trip real PNG bytes and
  pipeline sinks can emit them.

Scale note: like the JPEG codec this runs inside ``mapInPandas`` on the
scan partitioning (sources/multimodal.py) — payloads never shuffle.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Corrupt or truncated PNG stream."""


class UnsupportedPngError(PngError):
    """Valid PNG, but a mode outside this decoder's scope (Adam7
    interlace, bit depths below 8)."""


def _paeth_pred(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor over aligned neighbor arrays."""
    a32, b32, c32 = (x.astype(np.int32) for x in (a, b, c))
    p = a32 + b32 - c32
    pa, pb, pc = np.abs(p - a32), np.abs(p - b32), np.abs(p - c32)
    return np.where(
        (pa <= pb) & (pa <= pc), a32, np.where(pb <= pc, b32, c32)
    ).astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Any structural parse failure on the untrusted byte stream
    surfaces as ``PngError`` (``UnsupportedPngError`` for valid-but-
    uncovered modes), never a raw numpy/struct/zlib exception — the
    multimodal policy path catches the codec's own error types."""
    try:
        return _decode_impl(data)
    except PngError:
        raise
    except (struct.error, ValueError, IndexError) as e:
        raise PngError(f"corrupt PNG stream: {e}") from e


def _decode_impl(data: bytes) -> np.ndarray:
    if data[:8] != _SIG:
        raise PngError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos: pos + 8])
        chunk = data[pos + 8: pos + 8 + length]
        if len(chunk) < length:
            raise PngError("truncated chunk")
        pos += 12 + length  # skip CRC (not verified — content checksums
        #                     belong to the storage layer here)
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if comp != 0 or filt != 0:
                raise PngError("nonstandard compression/filter method")
            if interlace != 0:
                raise UnsupportedPngError("Adam7 interlace")
            if depth not in (8, 16):
                raise UnsupportedPngError(f"bit depth {depth}")
            if color not in _CHANNELS:
                raise PngError(f"bad color type {color}")
            if depth == 16 and color == 3:
                raise PngError("16-bit palette is invalid PNG")
            ihdr = (w, h, depth, color)
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise PngError("missing IHDR/IDAT")
    w, h, depth, color = ihdr
    nch = _CHANNELS[color]
    bpp = nch * (depth // 8)  # filter unit: bytes per pixel
    stride = w * bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"bad zlib stream: {e}") from e
    if len(raw) != h * (stride + 1):
        raise PngError("decompressed size mismatch")
    raw = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = raw[:, 0]
    lines = raw[:, 1:]

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = lines[y].copy()
        f = filters[y]
        if f == 0:  # None
            cur = line
        elif f == 1:  # Sub: cur[x] = line[x] + cur[x-bpp] — addition
            # mod 256 is associative, so each residue class mod bpp is
            # just a cumulative sum (vectorized; no per-byte loop)
            cur = line
            for ph in range(bpp):
                cur[ph::bpp] = np.cumsum(
                    cur[ph::bpp].astype(np.int64)
                ).astype(np.uint8)
        elif f == 2:  # Up
            cur = (line.astype(np.int32) + prev).astype(np.uint8)
        elif f == 3:  # Average — the spec recurrence depends on the
            # just-reconstructed left neighbor, so x is inherently
            # sequential; plain-list arithmetic avoids numpy's per-
            # element indexing overhead (~4x faster than array loops)
            cur_l = line.tolist()
            prev_l = prev.tolist()
            for x in range(stride):
                left = cur_l[x - bpp] if x >= bpp else 0
                cur_l[x] = (cur_l[x] + ((left + prev_l[x]) >> 1)) & 0xFF
            cur = np.asarray(cur_l, np.uint8)
        elif f == 4:  # Paeth — same sequential recurrence as Average
            cur_l = line.tolist()
            prev_l = prev.tolist()
            for x in range(stride):
                a = cur_l[x - bpp] if x >= bpp else 0
                c = prev_l[x - bpp] if x >= bpp else 0
                b = prev_l[x]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur_l[x] = (cur_l[x] + pred) & 0xFF
            cur = np.asarray(cur_l, np.uint8)
        else:
            raise PngError(f"bad filter {f} on row {y}")
        out[y] = cur
        prev = out[y]

    if depth == 16:
        # big-endian 16-bit samples → keep the high byte (standard 8-bit
        # downscale); reinterpret the unfiltered bytes
        a = out.reshape(h, w, nch, 2)[:, :, :, 0]
    else:
        a = out.reshape(h, w, nch)
    if color == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        a = palette[a[:, :, 0]]
    if a.shape[2] == 1:
        return np.ascontiguousarray(a[:, :, 0])
    return np.ascontiguousarray(a)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (H, W) gray / (H, W, 3) RGB / (H, W, 4) RGBA → PNG bytes
    (one zlib stream). ``filter_type`` applies that scanline filter to
    every row — 0 is the compact default; 1-4 exist chiefly so tests
    can exercise each of the decoder's unfilter paths with real
    streams."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise ValueError("encode_png expects uint8 pixels")
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    color = {1: 0, 3: 2, 4: 6}.get(nch)
    if color is None:
        raise ValueError("encode_png expects 1, 3 or 4 channels")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError("filter_type must be 0..4")
    flat = a.reshape(h, w * nch)
    bpp = nch
    left = np.zeros_like(flat)
    left[:, bpp:] = flat[:, :-bpp]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    upleft = np.zeros_like(flat)
    upleft[1:, bpp:] = flat[:-1, :-bpp]
    if filter_type == 0:
        resid = flat
    elif filter_type == 1:
        resid = flat - left
    elif filter_type == 2:
        resid = flat - up
    elif filter_type == 3:
        resid = flat - (
            (left.astype(np.int32) + up.astype(np.int32)) >> 1
        ).astype(np.uint8)
    else:
        resid = flat - _paeth_pred(left, up, upleft)
    lines = np.concatenate(
        [np.full((h, 1), filter_type, np.uint8), resid.astype(np.uint8)], axis=1
    )

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        body = ctype + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(lines.tobytes(), 6))
        + chunk(b"IEND", b"")
    )
