"""Web-Mercator tile math — vectorized numpy kernels.

Semantics match the reference engine's tile module
(/root/reference/crates/core/src/tile.rs:112-123 lng_lat_to_tile,
:23-42 TileCoord::bounds, :146-182 tiles_for_bbox incl. antimeridian split).
All functions operate on numpy arrays (float64 / int64) so they can run
inside Arrow-batched pandas UDFs with zero per-row Python.
"""

from __future__ import annotations

import numpy as np

U32_MAX = np.int64(0xFFFF_FFFF)


def _saturate_u32(v: np.ndarray) -> np.ndarray:
    """Rust `f64 as u32` semantics: truncate toward zero, saturate to [0, 2^32-1],
    NaN -> 0."""
    out = np.trunc(np.asarray(v, dtype=np.float64))
    out = np.where(np.isnan(out), 0.0, out)
    out = np.clip(out, 0.0, float(U32_MAX))
    return out.astype(np.int64)


def lng_lat_to_tile_xy(
    lng: np.ndarray, lat: np.ndarray, zoom: int
) -> tuple[np.ndarray, np.ndarray]:
    """(lng, lat) degrees -> (x, y) tile coords at `zoom`.

    x = floor((lng+180)/360 * 2^z); y = floor((1 - asinh(tan(lat))/pi)/2 * 2^z)
    (reference tile.rs:112-123). The float->u32 cast saturates like Rust.
    """
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.float64(2.0) ** np.int32(zoom)
    x = _saturate_u32(np.floor((lng + 180.0) / 360.0 * n))
    lat_rad = np.deg2rad(lat)
    y = _saturate_u32(np.floor((1.0 - np.arcsinh(np.tan(lat_rad)) / np.pi) / 2.0 * n))
    return x, y


def tile_bounds(
    x: np.ndarray, y: np.ndarray, zoom: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tile (x, y, z) -> (lng_min, lat_min, lng_max, lat_max) degrees.

    Inverse transform uses atan(sinh(pi*(1 - 2y/n))) (reference tile.rs:23-42).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = np.float64(2.0) ** np.int32(zoom)
    lng_min = x / n * 360.0 - 180.0
    lng_max = (x + 1.0) / n * 360.0 - 180.0

    def lat_of(yv: np.ndarray) -> np.ndarray:
        y_rad = np.pi * (1.0 - 2.0 * yv / n)
        return np.rad2deg(np.arctan(np.sinh(y_rad)))

    lat_max = lat_of(y)
    lat_min = lat_of(y + 1.0)
    return lng_min, lat_min, lng_max, lat_max


def tile_bounds_mixed(
    x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """tile_bounds with per-row zoom values (vectorized)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = np.ldexp(1.0, np.asarray(z, dtype=np.int32))
    lng_min = x / n * 360.0 - 180.0
    lng_max = (x + 1.0) / n * 360.0 - 180.0
    lat_max = np.rad2deg(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * y / n))))
    lat_min = np.rad2deg(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (y + 1.0) / n))))
    return lng_min, lat_min, lng_max, lat_max


def tile_ranges_for_bbox(
    lng_min: np.ndarray,
    lat_min: np.ndarray,
    lng_max: np.ndarray,
    lat_max: np.ndarray,
    zoom: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-bbox tile ranges at `zoom`, with antimeridian handling.

    Returns (x0a, x1a, x0b, x1b, y0, y1) int64 arrays. Range *a* is always
    valid (inclusive); range *b* is the second x-range when the bbox crosses
    the antimeridian (lng_min > lng_max), else x0b > x1b (empty).
    Mirrors reference tile.rs:146-182: y-range from lat_max (top) to lat_min
    (bottom); crossing splits into [lng_min, 180] U [-180, lng_max].
    """
    lng_min = np.asarray(lng_min, dtype=np.float64)
    lng_max = np.asarray(lng_max, dtype=np.float64)
    n_max = np.int64((1 << zoom) - 1)
    zeros = np.zeros_like(lng_min)

    _, y_top = lng_lat_to_tile_xy(lng_min, np.asarray(lat_max, dtype=np.float64), zoom)
    _, y_bot = lng_lat_to_tile_xy(lng_min, np.asarray(lat_min, dtype=np.float64), zoom)

    x_w, _ = lng_lat_to_tile_xy(lng_min, zeros, zoom)
    x_e, _ = lng_lat_to_tile_xy(lng_max, zeros, zoom)

    # Clamp to the valid tile grid [0, 2^z-1]: lng=180 would otherwise yield
    # x=2^z, whose tile_id aliases x=0 (the tile_id Hilbert encode is modular
    # in 2^z), corrupting a valid tile; lat beyond Web-Mercator range would
    # saturate y toward 2^32-1 and fan out billions of rows per feature.
    x_w = np.minimum(x_w, n_max)
    x_e = np.minimum(x_e, n_max)
    y_top = np.minimum(y_top, n_max)
    y_bot = np.minimum(y_bot, n_max)

    crosses = lng_min > lng_max
    x0a = x_w
    x1a = np.where(crosses, n_max, x_e)
    x0b = np.where(crosses, np.int64(0), np.int64(1))
    x1b = np.where(crosses, x_e, np.int64(0))  # empty (1 > 0) when not crossing
    return x0a, x1a, x0b, x1b, y_top, y_bot


def explode_tile_ranges(
    x0: np.ndarray, x1: np.ndarray, y0: np.ndarray, y1: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Expand per-row inclusive tile ranges into flat (row_idx, x, y) arrays.

    Fully vectorized fan-out: for row i emits every (x, y) with
    x0[i] <= x <= x1[i], y0[i] <= y <= y1[i]. Empty ranges (x0 > x1 or
    y0 > y1) emit nothing.
    """
    x0 = np.asarray(x0, dtype=np.int64)
    x1 = np.asarray(x1, dtype=np.int64)
    y0 = np.asarray(y0, dtype=np.int64)
    y1 = np.asarray(y1, dtype=np.int64)
    nx = np.maximum(x1 - x0 + 1, 0)
    ny = np.maximum(y1 - y0 + 1, 0)
    counts = nx * ny
    total = int(counts.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy()
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    # local index within each row's (ny x nx) block
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    nx_r = np.repeat(nx, counts)
    ys = np.repeat(y0, counts) + local // np.maximum(nx_r, 1)
    xs = np.repeat(x0, counts) + local % np.maximum(nx_r, 1)
    return row_idx, xs, ys


def lng_lat_to_world(lng: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Degrees -> 32-bit world coords (tippecanoe zoom-32 grid).

    lat clamped to +-89.9, lng normalized once into [-180, 180]
    (reference spatial_index.rs:251-272); wy uses ln(tan + sec) form.
    """
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lat = np.clip(lat, -89.9, 89.9)
    lng = np.where(lng < -180.0, lng + 360.0, lng)
    lng = np.where(lng > 180.0, lng - 360.0, lng)
    lat_rad = lat * np.pi / 180.0
    scale = np.float64(1 << 32)
    wx = _saturate_u32((lng + 180.0) / 360.0 * scale)
    wy = _saturate_u32(
        (1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * scale
    )
    return wx, wy
