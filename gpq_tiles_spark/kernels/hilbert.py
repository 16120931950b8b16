"""Space-filling-curve kernels: Z-order, tippecanoe Hilbert, PMTiles tile_id.

Three distinct curves, matching the reference exactly:

* ``encode_zorder``/``decode_zorder`` — 32+32 -> 64-bit Morton interleave, x at
  the even (higher) bit of each pair (reference spatial_index.rs:66-105).
* ``encode_hilbert``/``decode_hilbert`` — tippecanoe-compatible Hilbert on the
  n=2^32 grid; the quadrant rotation uses the *current* s (wrapping subtract)
  (reference spatial_index.rs:126-223).
* ``tile_id``/``tile_id_to_zxy`` — PMTiles v3 cumulative Hilbert: per-zoom
  Wikipedia hilbert xy2d whose rotation uses the FULL grid size n-1
  (reference pmtiles_writer.rs:174-216), plus the cumulative base
  sum(4^i, i=1..z-1) + 1.

All kernels are vectorized over numpy uint64 arrays (bit-level loops run over
the 32 (or z) levels, not over rows).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK32 = np.uint64(0xFFFF_FFFF)


def _u(v) -> np.ndarray:
    return np.asarray(v).astype(np.uint64)


def encode_zorder(wx, wy) -> np.ndarray:
    """Interleave two u32s into a u64 Morton code (x at even/higher bits)."""
    x = _u(wx) & _MASK32
    y = _u(wy) & _MASK32
    out = np.zeros_like(x, dtype=np.uint64)
    for i in range(32):
        bit_pos = _U64(31 - i)
        out_pos = _U64(62 - 2 * i)
        vx = (x >> bit_pos) & _U64(1)
        vy = (y >> bit_pos) & _U64(1)
        out |= ((vx << _U64(1)) | vy) << out_pos
    return out


def decode_zorder(index) -> tuple[np.ndarray, np.ndarray]:
    d = _u(index)
    wx = np.zeros_like(d, dtype=np.uint64)
    wy = np.zeros_like(d, dtype=np.uint64)
    for i in range(32):
        bit_pos = _U64(31 - i)
        out_pos = _U64(62 - 2 * i)
        pair = (d >> out_pos) & _U64(3)
        wx |= ((pair >> _U64(1)) & _U64(1)) << bit_pos
        wy |= (pair & _U64(1)) << bit_pos
    return wx, wy


def _rot_s(s: np.uint64, x: np.ndarray, y: np.ndarray, rx: np.ndarray, ry: np.ndarray):
    """Tippecanoe hilbert_rot: when ry==0 (and rx==1 reflect by s-1), swap x/y.

    Wrapping subtraction in u32 space (spatial_index.rs:126-140).
    """
    reflect = (ry == 0) & (rx == 1)
    s_minus_1 = _U64((int(s) - 1) & 0xFFFF_FFFF)
    with np.errstate(over="ignore"):
        nx = np.where(reflect, (s_minus_1 - x) & _MASK32, x)
        ny = np.where(reflect, (s_minus_1 - y) & _MASK32, y)
    swap = ry == 0
    x2 = np.where(swap, ny, nx)
    y2 = np.where(swap, nx, ny)
    return x2, y2


def encode_hilbert(wx, wy) -> np.ndarray:
    """Tippecanoe-compatible Hilbert index on the 2^32 grid."""
    x = _u(wx) & _MASK32
    y = _u(wy) & _MASK32
    d = np.zeros_like(x, dtype=np.uint64)
    s = _U64(1) << _U64(31)
    while int(s) > 0:
        rx = np.where((x & s) != 0, _U64(1), _U64(0))
        ry = np.where((y & s) != 0, _U64(1), _U64(0))
        d += s * s * ((_U64(3) * rx) ^ ry)
        x, y = _rot_s(s, x, y, rx, ry)
        s = _U64(int(s) >> 1)
    return d


def decode_hilbert(index) -> tuple[np.ndarray, np.ndarray]:
    t = _u(index)
    x = np.zeros_like(t, dtype=np.uint64)
    y = np.zeros_like(t, dtype=np.uint64)
    s = _U64(1)
    n = 1 << 32
    while int(s) < n:
        rx = _U64(1) & (t >> _U64(1))
        ry = _U64(1) & (t ^ rx)
        x, y = _rot_s(s, x, y, rx, ry)
        x = (x + s * rx) & _MASK32
        y = (y + s * ry) & _MASK32
        t = t >> _U64(2)
        s = _U64(int(s) << 1)
    return x, y


def _rot_full(n_minus_1: np.uint64, x, y, rx, ry):
    """PMTiles per-zoom rotation: reflect by the FULL grid size n-1
    (pmtiles_writer.rs:203-210)."""
    reflect = (ry == 0) & (rx == 1)
    nx = np.where(reflect, n_minus_1 - x, x)
    ny = np.where(reflect, n_minus_1 - y, y)
    swap = ry == 0
    return np.where(swap, ny, nx), np.where(swap, nx, ny)


def xy_to_hilbert_z(z: int, x, y) -> np.ndarray:
    """Per-zoom Hilbert index (Wikipedia xy2d with full-grid rotation)."""
    x = _u(x)
    y = _u(y)
    d = np.zeros_like(x, dtype=np.uint64)
    if z == 0:
        return d
    n = 1 << z
    n_minus_1 = _U64(n - 1)
    s = n >> 1
    while s > 0:
        su = _U64(s)
        rx = np.where((x & su) != 0, _U64(1), _U64(0))
        ry = np.where((y & su) != 0, _U64(1), _U64(0))
        d += su * su * ((_U64(3) * rx) ^ ry)
        x, y = _rot_full(n_minus_1, x, y, rx, ry)
        s >>= 1
    return d


def hilbert_z_to_xy(z: int, d) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of xy_to_hilbert_z (Wikipedia d2xy; rotation by s-1 while
    growing, matching the xy2d full-grid form as the standard inverse pair)."""
    t = _u(d)
    x = np.zeros_like(t, dtype=np.uint64)
    y = np.zeros_like(t, dtype=np.uint64)
    n = 1 << z
    s = 1
    while s < n:
        su = _U64(s)
        rx = _U64(1) & (t >> _U64(1))
        ry = _U64(1) & (t ^ rx)
        # d2xy rotation reflects by s-1 (current block), standard wiki pairing
        reflect = (ry == 0) & (rx == 1)
        nx = np.where(reflect, _U64(s - 1) - x, x)
        ny = np.where(reflect, _U64(s - 1) - y, y)
        swap = ry == 0
        x = np.where(swap, ny, nx)
        y = np.where(swap, nx, ny)
        x = x + su * rx
        y = y + su * ry
        t = t >> _U64(2)
        s <<= 1
    return x, y


def _base_id(z: int) -> int:
    """sum of 4^i for i in 1..z-1 (pmtiles_writer.rs:181)."""
    return sum(4**i for i in range(1, z))


def tile_id(z: int, x, y) -> np.ndarray:
    """PMTiles v3 tile id: 0 at z0, else base + hilbert + 1
    (pmtiles_writer.rs:175-185; spec examples (1,0,0)->1 .. (2,0,0)->5)."""
    x = _u(x)
    if z == 0:
        return np.zeros_like(x, dtype=np.uint64)
    return _U64(_base_id(z)) + xy_to_hilbert_z(z, x, y) + _U64(1)


def tile_id_mixed(z, x, y) -> np.ndarray:
    """tile_id for arrays with per-row zoom values."""
    z = np.asarray(z, dtype=np.int64)
    x = _u(x)
    y = _u(y)
    out = np.zeros_like(x, dtype=np.uint64)
    for zz in np.unique(z):
        m = z == zz
        out[m] = tile_id(int(zz), x[m], y[m])
    return out


_BASES = np.array([0] + [sum(4**i for i in range(1, z)) for z in range(1, 31)],
                  dtype=np.uint64)


def tile_id_to_zxy_vec(tids) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized inverse of tile_id: (z, x, y) arrays.

    z via searchsorted over the cumulative bases; per distinct z the Hilbert
    inverse runs vectorized over that z's rows.
    """
    t = np.asarray(tids).astype(np.uint64)
    # z = largest level with base(z) < tid  (tid in [base+1, base+4^z]);
    # side='left' resolves the base(z+1) == base(z) + 4^z boundary correctly
    z = np.searchsorted(_BASES, t, side="left").astype(np.int64) - 1
    z = np.where(t == 0, 0, z)
    x = np.zeros(len(t), dtype=np.uint64)
    y = np.zeros(len(t), dtype=np.uint64)
    for zz in np.unique(z):
        if zz == 0:
            continue
        m = z == zz
        d = t[m] - _BASES[int(zz)] - np.uint64(1)
        xs, ys = hilbert_z_to_xy(int(zz), d)
        x[m] = xs
        y[m] = ys
    return z, x.astype(np.int64), y.astype(np.int64)


def tile_id_to_zxy(tid: int) -> tuple[int, int, int]:
    """Scalar inverse of tile_id (driver-side reader use)."""
    if tid == 0:
        return 0, 0, 0
    z = 1
    while True:
        base = _base_id(z)
        count = 4**z
        if tid <= base + count:
            d = tid - base - 1
            x, y = hilbert_z_to_xy(z, np.uint64(d))
            return z, int(x), int(y)
        z += 1
