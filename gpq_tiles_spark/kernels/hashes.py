"""Deterministic hash kernels used by drop rules and dedup.

* ``fmix64`` — Murmur3 64-bit finalizer, used for point thinning
  (reference feature_drop.rs:89-101).
* ``siphash13`` — SipHash-1-3 with key (0,0), byte-compatible with Rust's
  ``std::collections::hash_map::DefaultHasher``; used for the tiny-polygon
  diffuse drop hash over f64 coordinate bit patterns
  (reference feature_drop.rs:272-293). Golden vectors in
  tests/test_hashes.py were generated with rustc (std only).
* ``xxh64`` — XXH64 (public spec, https://xxhash.com); used as the tile
  content hash for dedup. The reference uses XXH3-64 (dedup.rs:48-59);
  any collision-resistant 64-bit content key gives identical dedup
  *semantics* (grouping), which is what the fixtures check.
"""

from __future__ import annotations

import numpy as np

_M64 = 0xFFFF_FFFF_FFFF_FFFF


def fmix64(x) -> np.ndarray:
    """Vectorized Murmur3 fmix64 over uint64 arrays."""
    x = np.asarray(x).astype(np.uint64)
    with np.errstate(over="ignore"):
        x = x ^ (x >> np.uint64(33))
        x = x * np.uint64(0xFF51AFD7ED558CCD)
        x = x ^ (x >> np.uint64(33))
        x = x * np.uint64(0xC4CEB9FE1A85EC53)
        x = x ^ (x >> np.uint64(33))
    return x


def fmix64_scalar(x: int) -> int:
    """Scalar Murmur3 fmix64 — bit-identical to ``fmix64`` on one value,
    without the numpy errstate/array overhead (hot in per-row id hashing)."""
    x &= _M64
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & _M64
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & _M64
    x ^= x >> 33
    return x


def _rotl(v: int, b: int) -> int:
    return ((v << b) | (v >> (64 - b))) & _M64


def _sipround(v0: int, v1: int, v2: int, v3: int) -> tuple[int, int, int, int]:
    v0 = (v0 + v1) & _M64
    v1 = _rotl(v1, 13) ^ v0
    v0 = _rotl(v0, 32)
    v2 = (v2 + v3) & _M64
    v3 = _rotl(v3, 16) ^ v2
    v0 = (v0 + v3) & _M64
    v3 = _rotl(v3, 21) ^ v0
    v2 = (v2 + v1) & _M64
    v1 = _rotl(v1, 17) ^ v2
    v2 = _rotl(v2, 32)
    return v0, v1, v2, v3


def siphash13(data: bytes, k0: int = 0, k1: int = 0) -> int:
    """SipHash-1-3 (1 compression round, 3 finalization rounds), key (k0,k1).

    Matches Rust DefaultHasher::new() (SipHash-1-3, keys (0,0)) over the same
    byte stream.
    """
    v0 = k0 ^ 0x736F6D6570736575
    v1 = k1 ^ 0x646F72616E646F6D
    v2 = k0 ^ 0x6C7967656E657261
    v3 = k1 ^ 0x7465646279746573

    n = len(data)
    end = n - (n % 8)
    for i in range(0, end, 8):
        m = int.from_bytes(data[i : i + 8], "little")
        v3 ^= m
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
        v0 ^= m

    # last block: remaining bytes + length in the top byte
    m = (n & 0xFF) << 56
    rem = data[end:]
    for j, b in enumerate(rem):
        m |= b << (8 * j)
    v3 ^= m
    v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    v0 ^= m

    v2 ^= 0xFF
    for _ in range(3):
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    return (v0 ^ v1 ^ v2 ^ v3) & _M64


def siphash13_coords(coords_list: list[np.ndarray]) -> int:
    """Hash of a polygon's rings exactly like the reference geometry_hash:
    for every ring in order (exterior first), for every coord, write
    x.to_bits() then y.to_bits() as 8-byte little-endian words
    (feature_drop.rs:272-293; Rust u64::hash writes native-endian = LE)."""
    buf = bytearray()
    for ring in coords_list:
        r = np.ascontiguousarray(np.asarray(ring, dtype=np.float64))
        buf += r.tobytes()  # row-major (x, y) pairs, little-endian f64 bits
    return siphash13(bytes(buf))


def content_hash64(data: bytes) -> int:
    """64-bit content key for tile dedup (X1). The reference uses XXH3-64
    (dedup.rs:48-59); dedup semantics (identical bytes -> identical key) are
    hash-agnostic, so we use hashlib's C-speed blake2b-8 here — the pure-
    Python xxh64 below costs ~1s/MB, which matters at millions of tiles."""
    import hashlib

    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5


def _xxround(acc: int, inp: int) -> int:
    acc = (acc + inp * _XXP2) & _M64
    acc = _rotl(acc, 31)
    return (acc * _XXP1) & _M64


def _xxmerge(acc: int, val: int) -> int:
    acc ^= _xxround(0, val)
    return ((acc * _XXP1) + _XXP4) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of bytes (public reference spec)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i <= n - 32:
            v1 = _xxround(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xxround(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _xxround(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _xxround(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _xxmerge(h, v1)
        h = _xxmerge(h, v2)
        h = _xxmerge(h, v3)
        h = _xxmerge(h, v4)
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        h ^= _xxround(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _XXP1 + _XXP4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _XXP1) & _M64
        h = (_rotl(h, 23) * _XXP2 + _XXP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XXP5) & _M64
        h = (_rotl(h, 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h
