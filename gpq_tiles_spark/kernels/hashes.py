"""Deterministic hash kernels used by drop rules and dedup.

* ``fmix64`` — Murmur3 64-bit finalizer, used for point thinning
  (reference feature_drop.rs:89-101).
* ``siphash13`` — SipHash-1-3 with key (0,0), byte-compatible with Rust's
  ``std::collections::hash_map::DefaultHasher``; used for the tiny-polygon
  diffuse drop hash over f64 coordinate bit patterns
  (reference feature_drop.rs:272-293). Golden vectors in
  tests/test_hashes.py were generated with rustc (std only).
* ``xxh64`` — XXH64 (public spec, https://xxhash.com); used for feature-id
  derivation and checkpoint fingerprints (engine-internal keys).
* ``content_hash64`` — XXH3-64 (kernels/xxh3.py), matching the reference's
  tile-dedup TileHasher exactly (dedup.rs:48-59).
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


def _sipround_vec(v0, v1, v2, v3):
    """One SipHash round over uint64 numpy lanes (wrapping adds/rotls)."""
    s13, s16, s17, s21, s32 = (np.uint64(13), np.uint64(16), np.uint64(17),
                               np.uint64(21), np.uint64(32))
    c13, c16, c17, c21, c32 = (np.uint64(51), np.uint64(48), np.uint64(47),
                               np.uint64(43), np.uint64(32))
    v0 = v0 + v1
    v1 = ((v1 << s13) | (v1 >> c13)) ^ v0
    v0 = (v0 << s32) | (v0 >> c32)
    v2 = v2 + v3
    v3 = ((v3 << s16) | (v3 >> c16)) ^ v2
    v0 = v0 + v3
    v3 = ((v3 << s21) | (v3 >> c21)) ^ v0
    v2 = v2 + v1
    v1 = ((v1 << s17) | (v1 >> c17)) ^ v2
    v2 = (v2 << s32) | (v2 >> c32)
    return v0, v1, v2, v3


# padded-lockstep footprint cap for siphash13_words_many (words; ~64 MB).
# Module-level so tests can shrink it to exercise the chunked path cheaply.
PAD_BUDGET_WORDS = 8 << 20


def siphash13_words_many(word_msgs: list[np.ndarray],
                         k0: int = 0, k1: int = 0) -> np.ndarray:
    """Lockstep-vectorized SipHash-1-3 over MANY word-aligned messages.

    Each entry is the message as little-endian uint64 words (byte length
    = 8 * len(words), i.e. ``len(data) % 8 == 0`` — the geometry-hash case:
    f64 coordinate bit patterns ARE the words). Bit-identical to
    ``siphash13(words.tobytes())`` per message. All lanes advance one word
    per column with numpy uint64 ops; lanes whose message has ended stop
    updating (state masked) — ~20 numpy ops per column over the whole
    batch instead of one Python sipround per word per message.
    """
    n = len(word_msgs)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    nw = np.array([len(w) for w in word_msgs], dtype=np.int64)
    # the padded lockstep matrix is (lanes x max_words): one outlier
    # geometry in a batch of small ones would multiply its length by the
    # whole batch. Bucket by size: sort lanes by word count and process
    # chunks whose padded footprint stays under PAD_BUDGET_WORDS — hashes
    # are independent per lane, so chunking changes nothing.
    if n > 1 and int(nw.max()) * n > PAD_BUDGET_WORDS:
        order = np.argsort(nw, kind="stable")
        out = np.empty(n, dtype=np.uint64)
        start = 0
        while start < n:
            end = start + 1
            # grow the chunk while its padded size stays in budget (the
            # chunk max is the LAST element -- lanes are length-sorted)
            while (end < n
                   and max(int(nw[order[end]]), 1) * (end - start + 1)
                   <= PAD_BUDGET_WORDS):
                end += 1
            idx = order[start:end]
            out[idx] = siphash13_words_many(
                [word_msgs[int(i)] for i in idx], k0, k1)
            start = end
        return out
    max_w = int(nw.max())
    mat = np.zeros((n, max_w), dtype=np.uint64)
    for i, w in enumerate(word_msgs):
        mat[i, : len(w)] = w
    v0 = np.full(n, np.uint64(k0 ^ 0x736F6D6570736575), dtype=np.uint64)
    v1 = np.full(n, np.uint64(k1 ^ 0x646F72616E646F6D), dtype=np.uint64)
    v2 = np.full(n, np.uint64(k0 ^ 0x6C7967656E657261), dtype=np.uint64)
    v3 = np.full(n, np.uint64(k1 ^ 0x7465646279746573), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for col in range(max_w):
            act = col < nw
            m = mat[:, col]
            n0, n1, n2, n3 = _sipround_vec(v0, v1, v2, v3 ^ m)
            n0 = n0 ^ m
            v0 = np.where(act, n0, v0)
            v1 = np.where(act, n1, v1)
            v2 = np.where(act, n2, v2)
            v3 = np.where(act, n3, v3)
        # last block: no remainder bytes, just (len & 0xFF) << 56
        last = ((nw.astype(np.uint64) * np.uint64(8)) & np.uint64(0xFF)) << np.uint64(56)
        v0, v1, v2, v3 = _sipround_vec(v0, v1, v2, v3 ^ last)
        v0 = v0 ^ last
        v2 = v2 ^ np.uint64(0xFF)
        for _ in range(3):
            v0, v1, v2, v3 = _sipround_vec(v0, v1, v2, v3)
    return v0 ^ v1 ^ v2 ^ v3


def coords_words(rings: list[np.ndarray]) -> np.ndarray:
    """The geometry-hash message of ``siphash13_coords`` as uint64 words:
    row-major (x, y) f64 bit patterns of every ring in order."""
    if len(rings) == 1:
        return np.ascontiguousarray(
            np.asarray(rings[0], dtype=np.float64)).view(np.uint64).ravel()
    return np.concatenate([
        np.ascontiguousarray(np.asarray(r, dtype=np.float64)).view(np.uint64).ravel()
        for r in rings
    ]) if rings else np.empty(0, dtype=np.uint64)


def content_hash64(data: bytes) -> int:
    """64-bit content key for tile dedup (X1): XXH3-64, the SAME algorithm
    the reference's TileHasher uses (dedup.rs:48-59). System libxxhash via
    ctypes when present (~1.9 GB/s, 3x the blake2b-8 this used before the
    parity swap); otherwise the bit-identical numpy fallback — both
    backends agree, so mixed clusters can't diverge on dedup keys."""
    from .xxh3 import xxh3_64

    return xxh3_64(data)


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
