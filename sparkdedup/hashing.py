"""Vendored, NumPy-vectorized hash primitives + LSH parameter selection.

The sandbox has no ``xxhash`` package and per-row Python is banned on the
Spark hot path, so we vendor vectorized implementations of the public
xxHash algorithms (XXH32 / XXH64, spec:
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) that
operate on *batches* of byte strings inside Arrow/pandas UDF bodies.

Fidelity pins (tests/test_hashing.py): the reference's doctest values —
``ngram_hashes("a b c d", 2, min_length=1)`` == {145323813, 433422276,
459146835} (xxh32, /root/reference/text_dedup/minhash_spark.py:128-129)
and ``sha1_hash(b"hello world", 32)`` == 896314922
(/root/reference/text_dedup/utils/hashfunc.py:80-85).

``optimal_param`` reproduces the reference's b/r grid search
(minhash_spark.py:233-295, itself from datasketch) without scipy, using
fixed-grid quadrature; pinned to (25,10)@(0.7,256) and (21,12)@(0.75,256).
"""

from __future__ import annotations

import hashlib
import struct
from functools import lru_cache
from typing import List, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# XXH32 (public spec), vectorized over same-length byte-string batches
# ---------------------------------------------------------------------------

_P32_1 = np.uint32(2654435761)
_P32_2 = np.uint32(2246822519)
_P32_3 = np.uint32(3266489917)
_P32_4 = np.uint32(668265263)
_P32_5 = np.uint32(374761393)


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint32(r)
    return (x << r) | (x >> np.uint32(32 - int(r)))


def _u32le(mat: np.ndarray, off: int) -> np.ndarray:
    """Read a little-endian uint32 at byte offset `off` of every string.

    Matrices are TRANSPOSED (L, n): row `off` holds byte `off` of all n
    strings contiguously — sequential loads instead of stride-L gathers.
    """
    return (
        mat[off].astype(np.uint32)
        | (mat[off + 1].astype(np.uint32) << np.uint32(8))
        | (mat[off + 2].astype(np.uint32) << np.uint32(16))
        | (mat[off + 3].astype(np.uint32) << np.uint32(24))
    )


def xxh32_fixed(mat: np.ndarray, seed: int = 0) -> np.ndarray:
    """XXH32 of n equal-length byte strings given as a TRANSPOSED (L, n)
    uint8 matrix (byte position major; see _u32le)."""
    length, n = mat.shape
    seed = np.uint32(seed)
    with np.errstate(over="ignore"):
        if length >= 16:
            a1 = np.full(n, seed + _P32_1 + _P32_2, dtype=np.uint32)
            a2 = np.full(n, seed + _P32_2, dtype=np.uint32)
            a3 = np.full(n, seed, dtype=np.uint32)
            a4 = np.full(n, seed - _P32_1, dtype=np.uint32)
            p = 0
            while p + 16 <= length:
                a1 = _rotl32(a1 + _u32le(mat, p) * _P32_2, 13) * _P32_1
                a2 = _rotl32(a2 + _u32le(mat, p + 4) * _P32_2, 13) * _P32_1
                a3 = _rotl32(a3 + _u32le(mat, p + 8) * _P32_2, 13) * _P32_1
                a4 = _rotl32(a4 + _u32le(mat, p + 12) * _P32_2, 13) * _P32_1
                p += 16
            h = _rotl32(a1, 1) + _rotl32(a2, 7) + _rotl32(a3, 12) + _rotl32(a4, 18)
        else:
            h = np.full(n, seed + _P32_5, dtype=np.uint32)
            p = 0
        h = h + np.uint32(length)
        while p + 4 <= length:
            h = _rotl32(h + _u32le(mat, p) * _P32_3, 17) * _P32_4
            p += 4
        while p < length:
            h = _rotl32(h + mat[p].astype(np.uint32) * _P32_5, 11) * _P32_1
            p += 1
        h ^= h >> np.uint32(15)
        h *= _P32_2
        h ^= h >> np.uint32(13)
        h *= _P32_3
        h ^= h >> np.uint32(16)
    return h


# ---------------------------------------------------------------------------
# XXH64 (public spec), vectorized over same-length byte-string batches
# ---------------------------------------------------------------------------

_P64_1 = np.uint64(11400714785074694791)
_P64_2 = np.uint64(14029467366897019727)
_P64_3 = np.uint64(1609587929392839161)
_P64_4 = np.uint64(9650029242287828579)
_P64_5 = np.uint64(2870177450012600261)


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _u64le(mat: np.ndarray, off: int) -> np.ndarray:
    out = mat[off].astype(np.uint64)
    for i in range(1, 8):
        out |= mat[off + i].astype(np.uint64) << np.uint64(8 * i)
    return out


def _mrg64(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    acc ^= _rotl64(lane * _P64_2, 31) * _P64_1
    return acc * _P64_1 + _P64_4


def xxh64_fixed(mat: np.ndarray, seed: int = 0) -> np.ndarray:
    """XXH64 of n equal-length byte strings given as a TRANSPOSED (L, n)
    uint8 matrix (byte position major; see _u32le)."""
    length, n = mat.shape
    seed = np.uint64(seed)
    with np.errstate(over="ignore"):
        p = 0
        if length >= 32:
            a1 = np.full(n, seed + _P64_1 + _P64_2, dtype=np.uint64)
            a2 = np.full(n, seed + _P64_2, dtype=np.uint64)
            a3 = np.full(n, seed, dtype=np.uint64)
            a4 = np.full(n, seed - _P64_1, dtype=np.uint64)
            while p + 32 <= length:
                a1 = _rotl64(a1 + _u64le(mat, p) * _P64_2, 31) * _P64_1
                a2 = _rotl64(a2 + _u64le(mat, p + 8) * _P64_2, 31) * _P64_1
                a3 = _rotl64(a3 + _u64le(mat, p + 16) * _P64_2, 31) * _P64_1
                a4 = _rotl64(a4 + _u64le(mat, p + 24) * _P64_2, 31) * _P64_1
                p += 32
            h = _rotl64(a1, 1) + _rotl64(a2, 7) + _rotl64(a3, 12) + _rotl64(a4, 18)
            h = _mrg64(h, a1)
            h = _mrg64(h, a2)
            h = _mrg64(h, a3)
            h = _mrg64(h, a4)
        else:
            h = np.full(n, seed + _P64_5, dtype=np.uint64)
        h = h + np.uint64(length)
        while p + 8 <= length:
            h = _rotl64(h ^ (_rotl64(_u64le(mat, p) * _P64_2, 31) * _P64_1), 27) * _P64_1 + _P64_4
            p += 8
        if p + 4 <= length:
            h = _rotl64(h ^ (_u32le(mat, p).astype(np.uint64) * _P64_1), 23) * _P64_2 + _P64_3
            p += 4
        while p < length:
            h = _rotl64(h ^ (mat[p].astype(np.uint64) * _P64_5), 11) * _P64_1
            p += 1
        h ^= h >> np.uint64(33)
        h *= _P64_2
        h ^= h >> np.uint64(29)
        h *= _P64_3
        h ^= h >> np.uint64(32)
    return h


# ---------------------------------------------------------------------------
# Batched dispatch over variable-length byte strings
# ---------------------------------------------------------------------------


def _hash_spans(flat: np.ndarray, offsets: np.ndarray, lengths: np.ndarray, kernel, seed: int, dtype) -> np.ndarray:
    """Hash n byte-string *spans* of one flat uint8 buffer, vectorizing
    within equal-length groups.

    Shingles of a corpus cluster tightly in byte length, so the number
    of distinct lengths per batch is small; each group is gathered into
    one (n, L) matrix pass. This span form is the zero-allocation hot
    path: callers pass views into a single buffer instead of millions
    of small bytes objects.
    """
    n = len(offsets)
    out = np.empty(n, dtype=dtype)
    if n == 0:
        return out
    for length in np.unique(lengths):
        idx = np.nonzero(lengths == length)[0]
        if length == 0:
            out[idx] = kernel(np.empty((0, len(idx)), dtype=np.uint8), seed=seed)
            continue
        # transposed gather, sub-chunked so each (L, n_sub) matrix stays
        # ~1MB (cache-resident under wide-executor concurrency)
        n_sub = max(1024, (1 << 20) // int(length))
        for s0 in range(0, len(idx), n_sub):
            sub = idx[s0 : s0 + n_sub]
            mat = flat[np.arange(length)[:, None] + offsets[sub][None, :]]
            out[sub] = kernel(mat, seed=seed)
    return out


def _hash_bytes_batch(items: Sequence[bytes], kernel, seed: int, dtype) -> np.ndarray:
    """Hash a batch of byte strings (list form; see _hash_spans)."""
    n = len(items)
    if n == 0:
        return np.empty(0, dtype=dtype)
    lengths = np.fromiter((len(b) for b in items), count=n, dtype=np.int64)
    flat = np.frombuffer(b"".join(items), dtype=np.uint8)
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    return _hash_spans(flat, offsets, lengths, kernel, seed, dtype)


def xxh32_spans(flat: np.ndarray, offsets: np.ndarray, lengths: np.ndarray, seed: int = 0) -> np.ndarray:
    return _hash_spans(flat, offsets, lengths, xxh32_fixed, seed, np.uint32)


def xxh64_spans(flat: np.ndarray, offsets: np.ndarray, lengths: np.ndarray, seed: int = 0) -> np.ndarray:
    return _hash_spans(flat, offsets, lengths, xxh64_fixed, seed, np.uint64)


def xxh32_batch(items: Sequence[bytes], seed: int = 0) -> np.ndarray:
    """Vectorized xxh32 over a list of byte strings -> uint32 array."""
    return _hash_bytes_batch(items, xxh32_fixed, seed, np.uint32)


def xxh64_batch(items: Sequence[bytes], seed: int = 0) -> np.ndarray:
    """Vectorized xxh64 over a list of byte strings -> uint64 array."""
    return _hash_bytes_batch(items, xxh64_fixed, seed, np.uint64)


def sha1_hash(data: bytes, d: int = 32) -> int:
    """d-bit little-endian truncation of sha1 (reference hashfunc.py:62-92)."""
    digest = hashlib.sha1(data).digest()
    if d == 32:
        return struct.unpack("<I", digest[:4])[0]
    if d == 64:
        return struct.unpack("<Q", digest[:8])[0]
    return int.from_bytes(digest[: d // 8], byteorder="little")


# ---------------------------------------------------------------------------
# MinHash permutations
# ---------------------------------------------------------------------------


def generate_permutations(num_perm: int, mod_prime: int, seed: int, dtype=np.uint32) -> Tuple[np.ndarray, np.ndarray]:
    """Universal-hash coefficients (a, b); a ~ U[1, prime), b ~ U[0, prime).

    Matches the reference's construction order exactly
    (minhash_spark.py:409-412) so that identical seeds give identical
    signatures.
    """
    rng = np.random.RandomState(seed)
    a = rng.randint(1, mod_prime, size=(num_perm,), dtype=dtype)
    b = rng.randint(0, mod_prime, size=(num_perm,), dtype=dtype)
    return a, b


# ---------------------------------------------------------------------------
# LSH parameter selection (scipy-free)
# ---------------------------------------------------------------------------


def _integrate(f, lo: float, hi: float, steps: int = 2000) -> float:
    xs = np.linspace(lo, hi, steps)
    return float(np.trapz(f(xs), xs))


@lru_cache(maxsize=None)
def optimal_param(
    threshold: float,
    num_perm: int,
    false_positive_weight: float = 0.5,
    false_negative_weight: float = 0.5,
) -> Tuple[int, int]:
    """Optimal (b, r) minimizing weighted FP/FN area under the LSH S-curve.

    Grid search identical to the reference (minhash_spark.py:233-295);
    quadrature by dense trapezoid instead of scipy.integrate.quad.
    Pinned: (0.7, 256) -> (25, 10); (0.75, 256) -> (21, 12).
    """

    def fp_area(b: int, r: int) -> float:
        return _integrate(lambda s: 1 - (1 - s ** float(r)) ** float(b), 0.0, threshold)

    def fn_area(b: int, r: int) -> float:
        return _integrate(lambda s: 1 - (1 - (1 - s ** float(r)) ** float(b)), threshold, 1.0)

    min_error = float("inf")
    opt = (0, 0)
    for b in range(1, num_perm + 1):
        for r in range(1, num_perm // b + 1):
            error = fp_area(b, r) * false_positive_weight + fn_area(b, r) * false_negative_weight
            if error < min_error:
                min_error = error
                opt = (b, r)
    return opt
