"""Vectorized murmur3 hashing (north star: "murmur3-hashes outlinks via
vectorized Arrow UDFs").

Implements MurmurHash3 x86_32 twice (seeds 0 and 1) and packs the two words
into a stable signed 64-bit ``url_hash``. Two implementations:

* :func:`murmur3_32_scalar` — straight-line reference implementation of the
  published algorithm (Appleby's MurmurHash3_x86_32), used only in tests as
  the independent oracle.
* :func:`murmur3_32` — numpy-vectorized over an Arrow batch: strings are
  packed into one padded uint8 matrix; the per-4-byte-block mix loops over
  *block index* (max ~32 iterations for URLs) while staying vectorized over
  *rows*. This is the hot path inside the pandas UDF — no per-row Python.

The hash is version-pinned by our own tests (known vectors + hypothesis
cross-check vs the scalar reference), unlike Spark's ``F.hash`` whose tail
handling is nonstandard; cross-round stability of the seen-set sharding must
not depend on the Spark version (SURVEY.md §1.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)
_U32 = np.uint32


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U32(r)) | (x >> _U32(32 - r))


def murmur3_32_scalar(data: bytes, seed: int = 0) -> int:
    """Reference MurmurHash3_x86_32 (per the public algorithm spec)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[4 * nblocks :]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def _pack(strings: "pd.Series | list[str]") -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 encode a batch of strings into (padded uint8 matrix, lengths).

    Fully vectorized fill: one C-level join of the encoded bytes, then a
    single fancy-indexed scatter into the padded matrix — no per-row Python
    in the fill (this runs on every url of every round; a row loop here cost
    ~1 µs/row and dominated the hashing UDF at millions of urls).
    """
    if isinstance(strings, pd.Series):
        strings = strings.tolist()
    encoded = [s.encode("utf-8") if s is not None else b"" for s in strings]
    n = len(encoded)
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=n)
    max_len = int(lens.max()) if n else 0
    pad = (max_len + 3) // 4 * 4
    mat = np.zeros((n, max(pad, 4)), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        flat = np.frombuffer(b"".join(encoded), dtype=np.uint8)
        offs = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        cols = np.arange(total, dtype=np.int64) - np.repeat(offs, lens)
        mat[rows, cols] = flat
    return mat, lens


def murmur3_32(strings, seed: int = 0) -> np.ndarray:
    """Vectorized MurmurHash3_x86_32 over a batch of strings → uint32 array."""
    return _murmur3_32_packed(*_pack(strings), seed)


def _murmur3_32_packed(mat: np.ndarray, lens: np.ndarray, seed: int = 0) -> np.ndarray:
    """Hash a pre-packed batch (lets murmur3_64 pack once for both seeds)."""
    n_rows = mat.shape[0]
    if n_rows == 0:
        return np.empty(0, dtype=np.uint32)
    words = mat.view("<u4")  # (rows, pad/4) little-endian 32-bit blocks
    nblocks = (lens // 4).astype(np.int64)
    h = np.full(n_rows, seed, dtype=np.uint32)
    for j in range(int(nblocks.max()) if n_rows else 0):
        live = nblocks > j
        k = words[:, j].copy()
        k *= _C1
        k = _rotl32(k, 15)
        k *= _C2
        h2 = h ^ k
        h2 = _rotl32(h2, 13)
        h2 = h2 * _U32(5) + _U32(0xE6546B64)
        h = np.where(live, h2, h)
    # tail (1-3 trailing bytes)
    rem = (lens % 4).astype(np.int64)
    tail_start = nblocks * 4
    idx = np.arange(n_rows)
    k = np.zeros(n_rows, dtype=np.uint32)
    m3 = rem >= 3
    if m3.any():
        k[m3] ^= mat[idx[m3], tail_start[m3] + 2].astype(np.uint32) << _U32(16)
    m2 = rem >= 2
    if m2.any():
        k[m2] ^= mat[idx[m2], tail_start[m2] + 1].astype(np.uint32) << _U32(8)
    m1 = rem >= 1
    if m1.any():
        k[m1] ^= mat[idx[m1], tail_start[m1]].astype(np.uint32)
        kt = k.copy()
        kt *= _C1
        kt = _rotl32(kt, 15)
        kt *= _C2
        h = np.where(m1, h ^ kt, h)
    # finalize
    h ^= lens.astype(np.uint32)
    h ^= h >> _U32(16)
    h *= _U32(0x85EBCA6B)
    h ^= h >> _U32(13)
    h *= _U32(0xC2B2AE35)
    h ^= h >> _U32(16)
    return h


def murmur3_64(strings) -> np.ndarray:
    """64-bit url hash: (murmur3_32(s, seed=0) << 32) | murmur3_32(s, seed=1),
    reinterpreted as signed int64 (Spark LongType)."""
    mat, lens = _pack(strings)  # pack once; both seeds reuse it
    hi = _murmur3_32_packed(mat, lens, seed=0).astype(np.uint64)
    lo = _murmur3_32_packed(mat, lens, seed=1).astype(np.uint64)
    return ((hi << np.uint64(32)) | lo).view(np.int64)


def murmur3_64_scalar(s: str) -> int:
    """Scalar twin of :func:`murmur3_64` (oracle / driver-side use)."""
    b = s.encode("utf-8")
    v = (murmur3_32_scalar(b, 0) << 32) | murmur3_32_scalar(b, 1)
    return v - (1 << 64) if v >= (1 << 63) else v


@pandas_udf(LongType())
def murmur3_64_udf(urls: pd.Series) -> pd.Series:
    """Arrow-batched murmur3_64; replaces per-row hashing entirely."""
    return pd.Series(murmur3_64(urls), dtype="int64")
