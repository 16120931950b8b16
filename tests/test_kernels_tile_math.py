"""Kernel tests: tile math + curves + tile_id.

Expected values ported from the reference's own unit tests:
tile.rs:189-210/281-363, spatial_index.rs:420-855, pmtiles_writer.rs:167-173.
"""

import numpy as np
import pytest

from gpq_tiles_spark.kernels import hilbert as H
from gpq_tiles_spark.kernels import tile_math as T


def test_lng_lat_to_tile_origin():
    x, y = T.lng_lat_to_tile_xy(np.array([0.0]), np.array([0.0]), 0)
    assert (x[0], y[0]) == (0, 0)


def test_lng_lat_to_tile_zoom1():
    x, y = T.lng_lat_to_tile_xy(np.array([0.0]), np.array([0.0]), 1)
    assert (x[0], y[0]) == (1, 1)


@pytest.mark.parametrize("zoom", range(15))
def test_tile_center_round_trip(zoom):
    max_coord = (1 << zoom) - 1
    x = min(max_coord, 100)
    y = min(max_coord, 200)
    lng_min, lat_min, lng_max, lat_max = T.tile_bounds(np.array([x]), np.array([y]), zoom)
    cx = (lng_min + lng_max) / 2.0
    cy = (lat_min + lat_max) / 2.0
    xb, yb = T.lng_lat_to_tile_xy(cx, cy, zoom)
    assert (xb[0], yb[0]) == (x, y)


def test_tiles_for_bbox_antimeridian_z4():
    # Fiji: 170E..-170E crosses the antimeridian (tile.rs:301-329)
    x0a, x1a, x0b, x1b, y0, y1 = T.tile_ranges_for_bbox(
        np.array([170.0]), np.array([-20.0]), np.array([-170.0]), np.array([-10.0]), 4
    )
    ridx, xs, ys = T.explode_tile_ranges(
        np.concatenate([x0a, x0b]),
        np.concatenate([x1a, x1b]),
        np.concatenate([y0, y0]),
        np.concatenate([y1, y1]),
    )
    assert len(xs) > 0
    assert (xs >= 15).any() and (xs <= 1).any()


def test_tiles_for_bbox_antimeridian_z2_count():
    x0a, x1a, x0b, x1b, y0, y1 = T.tile_ranges_for_bbox(
        np.array([170.0]), np.array([-20.0]), np.array([-170.0]), np.array([-10.0]), 2
    )
    _, xs, _ = T.explode_tile_ranges(
        np.concatenate([x0a, x0b]),
        np.concatenate([x1a, x1b]),
        np.concatenate([y0, y0]),
        np.concatenate([y1, y1]),
    )
    assert len(np.unique(xs)) <= 3


def test_tiles_for_bbox_normal():
    x0a, x1a, x0b, x1b, y0, y1 = T.tile_ranges_for_bbox(
        np.array([-10.0]), np.array([40.0]), np.array([10.0]), np.array([50.0]), 4
    )
    ridx, xs, ys = T.explode_tile_ranges(x0a, x1a, y0, y1)
    assert len(xs) > 0
    # no second range
    assert x0b[0] > x1b[0]


def test_zorder_bit_positions():
    # tippecanoe quadkey vectors (spatial_index.rs:805-826)
    assert int(H.encode_zorder(1, 0)[()] ) & 0b11 == 0b10
    assert int(H.encode_zorder(0, 1)[()]) & 0b11 == 0b01
    assert int(H.encode_zorder(1, 1)[()]) & 0b11 == 0b11
    assert int(H.encode_zorder(0, 1 << 31)[()]) >> 62 == 0b01


@pytest.mark.parametrize(
    "wx,wy",
    [
        (0, 0), (1, 1), (100, 200),
        (0xFFFFFFFF, 0), (0, 0xFFFFFFFF), (0xFFFFFFFF, 0xFFFFFFFF),
        (12345678, 87654321), (1 << 31, 1 << 30), (1 << 16, 1 << 16),
    ],
)
def test_zorder_hilbert_round_trips(wx, wy):
    zi = H.encode_zorder(wx, wy)
    bx, by = H.decode_zorder(zi)
    assert (int(bx[()]), int(by[()])) == (wx, wy)
    hi = H.encode_hilbert(wx, wy)
    hx, hy = H.decode_hilbert(hi)
    assert (int(hx[()]), int(hy[()])) == (wx, wy)


def test_hilbert_origin():
    assert int(H.encode_hilbert(0, 0)[()]) == 0


def test_hilbert_locality_beats_zorder_adjacency():
    i1 = int(H.encode_zorder(1000, 1000)[()])
    i2 = int(H.encode_zorder(1001, 1000)[()])
    far = int(H.encode_zorder(0x7FFFFFFF, 0x7FFFFFFF)[()])
    assert abs(i1 - i2) < abs(i1 - far)


def test_pmtiles_tile_id_spec_examples():
    # pmtiles_writer.rs:167-173
    assert int(H.tile_id(0, 0, 0)[()]) == 0
    assert int(H.tile_id(1, 0, 0)[()]) == 1
    assert int(H.tile_id(1, 0, 1)[()]) == 2
    assert int(H.tile_id(1, 1, 1)[()]) == 3
    assert int(H.tile_id(1, 1, 0)[()]) == 4
    assert int(H.tile_id(2, 0, 0)[()]) == 5


def test_tile_id_round_trip():
    rng = np.random.default_rng(42)
    for z in [0, 1, 2, 3, 5, 8, 10, 14]:
        n = 1 << z
        xs = rng.integers(0, n, size=20)
        ys = rng.integers(0, n, size=20)
        tids = H.tile_id(z, xs, ys)
        for x, y, tid in zip(xs, ys, tids):
            zz, xb, yb = H.tile_id_to_zxy(int(tid))
            assert (zz, xb, yb) == (z, x, y)


def test_tile_id_mixed_matches_scalar():
    z = np.array([0, 1, 1, 2, 5])
    x = np.array([0, 1, 0, 3, 17])
    y = np.array([0, 0, 1, 2, 9])
    mixed = H.tile_id_mixed(z, x, y)
    for i in range(len(z)):
        assert int(mixed[i]) == int(H.tile_id(int(z[i]), x[i : i + 1], y[i : i + 1])[0])


def test_world_coords_clamp_and_wrap():
    wx, wy = T.lng_lat_to_world(np.array([0.0]), np.array([0.0]))
    assert int(wx[0]) == 1 << 31
    assert int(wy[0]) == 1 << 31
    # lat clamped to +-89.9, lng wrapped
    wx2, _ = T.lng_lat_to_world(np.array([190.0]), np.array([95.0]))
    wx3, _ = T.lng_lat_to_world(np.array([-170.0]), np.array([89.9]))
    assert int(wx2[0]) == int(wx3[0])
