"""Spark-compatible XXH64: the exact hash ``F.xxhash64`` computes,
reimplemented in pure Python so DRIVER-side planners (the native data
source's ``partitions()``, which runs during Spark's own planning and
cannot launch jobs) can probe bloom sidecars built by executor-side
``xxhash64``.

Spark semantics reproduced here (catalyst XxHash64 / XXH64.java):
- multi-argument hashing CHAINS the running hash as the seed:
  ``xxhash64(a, b) = step(b, step(a, 42))``;
- integral types int/short/byte hash their 32-bit pattern via
  ``hashInt``; long via ``hashLong``; strings hash their UTF-8 bytes
  via the standard XXH64 byte stream;
- NULL children leave the running hash unchanged (the bloom layer
  never probes NULL, so this path is unused but kept for fidelity).

Pinned bit-for-bit against ``F.xxhash64`` in
tests/test_bloom_skipping.py over negatives, unicode, empty strings
and the salt-chained second hash.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    """XXH64.hashLong — one 8-byte block, Spark's long path."""
    v = value & _M  # two's complement view of a (possibly negative) long
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """XXH64.hashInt — Spark's int/short/byte path (32-bit pattern)."""
    v = value & 0xFFFFFFFF
    h = (seed + _P5 + 4) & _M
    h ^= (v * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """XXH64 over a byte stream — Spark's string (UTF-8) path."""
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M

        def lane(v: int, w: int) -> int:
            return (_rotl((v + w * _P2) & _M, 31) * _P1) & _M

        while off + 32 <= n:
            v1 = lane(v1, int.from_bytes(data[off:off + 8], "little"))
            v2 = lane(v2, int.from_bytes(data[off + 8:off + 16], "little"))
            v3 = lane(v3, int.from_bytes(data[off + 16:off + 24], "little"))
            v4 = lane(v4, int.from_bytes(data[off + 24:off + 32], "little"))
            off += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while off + 8 <= n:
        w = int.from_bytes(data[off:off + 8], "little")
        h ^= (_rotl((w * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        off += 8
    if off + 4 <= n:
        w = int.from_bytes(data[off:off + 4], "little")
        h ^= (w * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        off += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_step(value, spark_type: str, seed: int) -> int:
    """One child's contribution with the running hash as seed —
    chain these for multi-argument ``xxhash64``. ``spark_type`` is the
    Spark simple type name from a schema JSON. Unsigned result."""
    if value is None:
        return seed & _M
    if spark_type == "long":
        return hash_long(int(value), seed)
    if spark_type in ("integer", "short", "byte"):
        return hash_int(int(value), seed)
    if spark_type == "string":
        return hash_bytes(str(value).encode("utf-8"), seed)
    raise TypeError(f"xxh64: unsupported Spark type {spark_type!r}")


def spark_xxhash64(value, spark_type: str) -> int:
    """``F.xxhash64(col)`` of one value — SIGNED, like Spark's."""
    return _to_signed(spark_xxhash64_step(value, spark_type, SPARK_SEED))


def spark_xxhash64_salted(value, spark_type: str, salt: int) -> int:
    """``F.xxhash64(col, lit(salt))`` with an int32 salt — the bloom
    layer's second hash. SIGNED, like Spark's."""
    h = spark_xxhash64_step(value, spark_type, SPARK_SEED)
    return _to_signed(hash_int(salt, h))


# ----------------------------------------------------- numpy-vectorized
# The native writer's write TASKS build bloom sidecars as rows stream
# through them (sources/txbatch.py) — a sessionless pyarrow context
# where the scalar twin above would hash one value per Python call.
# These are the same algorithms lifted onto numpy uint64 arrays
# (overflow wraps silently, identical to the masked scalar math),
# pinned bit-for-bit against the scalar twin — and therefore against
# ``F.xxhash64`` itself — in tests/test_bloom_skipping.py.


def _np():
    import numpy as np

    return np


def _rotl_np(x, r: int):
    np = _np()
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix_np(h):
    np = _np()
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(_P2)
    h = h ^ (h >> np.uint64(29))
    h = h * np.uint64(_P3)
    h = h ^ (h >> np.uint64(32))
    return h


def hash_long_np(values, seed=SPARK_SEED):
    """XXH64.hashLong over an int64 array; ``seed`` is a scalar or a
    broadcastable uint64 array. Returns uint64."""
    np = _np()
    v = np.ascontiguousarray(values, dtype=np.int64).view(np.uint64)
    h = np.asarray(seed, dtype=np.uint64) + np.uint64((_P5 + 8) & _M)
    h = h ^ (_rotl_np(v * np.uint64(_P2), 31) * np.uint64(_P1))
    h = _rotl_np(h, 27) * np.uint64(_P1) + np.uint64(_P4)
    return _fmix_np(h)


def hash_int_np(patterns, seed=SPARK_SEED):
    """XXH64.hashInt over 32-bit patterns (uint32 array or scalar —
    sign-extend short/byte to int32 first); scalar or array seed."""
    np = _np()
    v = np.asarray(patterns, dtype=np.uint32).astype(np.uint64)
    h = np.asarray(seed, dtype=np.uint64) + np.uint64(_P5 + 4)
    h = h ^ (v * np.uint64(_P1))
    h = _rotl_np(h, 23) * np.uint64(_P2) + np.uint64(_P3)
    return _fmix_np(h)


def _word_np(mat, off: int, nbytes: int):
    np = _np()
    w = np.ascontiguousarray(mat[:, off:off + nbytes])
    dt = "<u8" if nbytes == 8 else "<u4"
    return w.view(dt).ravel().astype(np.uint64)


def _hash_bytes_fixed_np(mat, seed: int):
    """XXH64 of n equal-length byte rows (an (n, L) uint8 matrix) —
    the per-length kernel behind :func:`hash_bytes_np`."""
    np = _np()
    n, L = mat.shape
    p1, p2, p3, p4 = (np.uint64(p) for p in (_P1, _P2, _P3, _P4))
    off = 0
    if L >= 32:
        v1 = np.full(n, (seed + _P1 + _P2) & _M, dtype=np.uint64)
        v2 = np.full(n, (seed + _P2) & _M, dtype=np.uint64)
        v3 = np.full(n, seed & _M, dtype=np.uint64)
        v4 = np.full(n, (seed - _P1) & _M, dtype=np.uint64)
        while off + 32 <= L:
            v1 = _rotl_np(v1 + _word_np(mat, off, 8) * p2, 31) * p1
            v2 = _rotl_np(v2 + _word_np(mat, off + 8, 8) * p2, 31) * p1
            v3 = _rotl_np(v3 + _word_np(mat, off + 16, 8) * p2, 31) * p1
            v4 = _rotl_np(v4 + _word_np(mat, off + 24, 8) * p2, 31) * p1
            off += 32
        h = (
            _rotl_np(v1, 1) + _rotl_np(v2, 7)
            + _rotl_np(v3, 12) + _rotl_np(v4, 18)
        )
        for v in (v1, v2, v3, v4):
            h = h ^ (_rotl_np(v * p2, 31) * p1)
            h = h * p1 + p4
    else:
        h = np.full(n, (seed + _P5) & _M, dtype=np.uint64)
    h = h + np.uint64(L)
    while off + 8 <= L:
        h = h ^ (_rotl_np(_word_np(mat, off, 8) * p2, 31) * p1)
        h = _rotl_np(h, 27) * p1 + p4
        off += 8
    if off + 4 <= L:
        h = h ^ (_word_np(mat, off, 4) * p1)
        h = _rotl_np(h, 23) * p2 + p3
        off += 4
    while off < L:
        h = h ^ (mat[:, off].astype(np.uint64) * np.uint64(_P5))
        h = _rotl_np(h, 11) * p1
        off += 1
    return _fmix_np(h)


def hash_bytes_np(data, starts, lengths, seed=SPARK_SEED):
    """XXH64 of n variable-length byte slices
    ``data[starts[i] : starts[i] + lengths[i]]`` (``data`` a flat uint8
    array — e.g. an Arrow string array's value buffer with its offsets,
    zero Python work per value). Vectorized by grouping equal lengths:
    each distinct length gathers its rows into one (n_g, L) matrix and
    runs the fixed-length kernel once — UTF-8 corpora concentrate on
    few distinct lengths, so the group count stays tiny. Returns
    uint64, row-aligned with ``starts``."""
    np = _np()
    starts = np.asarray(starts, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    out = np.zeros(len(starts), dtype=np.uint64)
    for L in np.unique(lengths):
        idx = np.nonzero(lengths == L)[0]
        if L == 0:
            mat = np.zeros((len(idx), 0), dtype=np.uint8)
        else:
            mat = data[
                starts[idx][:, None]
                + np.arange(int(L), dtype=np.int64)[None, :]
            ]
        out[idx] = _hash_bytes_fixed_np(mat, seed)
    return out
