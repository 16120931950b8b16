"""decode_geometry(encode_geometry(g)) round-trips to the quantized input
for every geometry type — the VERDICT r3 item-8 contract: golden comparisons
can check geometry structure, not just counts (reference decode analog:
crates/core/src/golden.rs:205-240 via geozero)."""

from __future__ import annotations

import numpy as np
import pytest

from gpq_tiles_spark.kernels.geom import (
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
)
from gpq_tiles_spark.kernels.mvt import (
    decode_geometry,
    encode_geometry,
    geo_to_tile_px,
    orient_rings,
)

BOUNDS = (-10.0, -10.0, 10.0, 10.0)  # lng_min, lat_min, lng_max, lat_max
EXTENT = 4096


def _px(coords):
    arr = geo_to_tile_px(np.asarray(coords, dtype=np.float64), *BOUNDS, EXTENT)
    return [(int(x), int(y)) for x, y in arr]


def _decode(g):
    cmds, gtype = encode_geometry(g, *BOUNDS, EXTENT)
    return decode_geometry({"type": gtype, "geometry": cmds, "tags": [], "id": None})


def test_point_roundtrip():
    g = (POINT, np.array([3.25, -4.5]))
    out = _decode(g)
    assert out == {"type": "Point", "coordinates": _px([[3.25, -4.5]])[0]}


def test_multipoint_roundtrip():
    pts = [[0.0, 0.0], [1.5, 2.5], [-3.0, 4.0]]
    out = _decode((MULTIPOINT, np.array(pts)))
    assert out == {"type": "MultiPoint", "coordinates": _px(pts)}


def test_linestring_roundtrip():
    ls = [[-5.0, -5.0], [0.0, 0.0], [5.0, 3.0], [6.0, -2.0]]
    out = _decode((LINESTRING, np.array(ls)))
    assert out == {"type": "LineString", "coordinates": _px(ls)}


def test_multilinestring_roundtrip():
    l1 = [[-5.0, -5.0], [0.0, 0.0], [5.0, 3.0]]
    l2 = [[2.0, 2.0], [3.0, 8.0]]
    out = _decode((MULTILINESTRING, [np.array(l1), np.array(l2)]))
    assert out == {"type": "MultiLineString", "coordinates": [_px(l1), _px(l2)]}


def _closed_px(ring):
    """Expected decoded ring: encoder applies orient_rings then quantizes."""
    return _px(ring)


def test_polygon_with_hole_roundtrip():
    ext = [[-8.0, -8.0], [8.0, -8.0], [8.0, 8.0], [-8.0, 8.0], [-8.0, -8.0]]
    hole = [[-2.0, -2.0], [-2.0, 2.0], [2.0, 2.0], [2.0, -2.0], [-2.0, -2.0]]
    rings = orient_rings([np.array(ext), np.array(hole)])
    out = _decode((POLYGON, [np.array(ext), np.array(hole)]))
    assert out["type"] == "Polygon"
    assert len(out["coordinates"]) == 2
    for got, want in zip(out["coordinates"], rings):
        assert got == _closed_px(want)


def test_multipolygon_roundtrip():
    p1 = [[[-8.0, -8.0], [-4.0, -8.0], [-4.0, -4.0], [-8.0, -4.0], [-8.0, -8.0]]]
    p2 = [[[2.0, 2.0], [8.0, 2.0], [8.0, 8.0], [2.0, 8.0], [2.0, 2.0]],
          [[4.0, 4.0], [4.0, 6.0], [6.0, 6.0], [6.0, 4.0], [4.0, 4.0]]]
    out = _decode((MULTIPOLYGON, [[np.array(r) for r in p1], [np.array(r) for r in p2]]))
    assert out["type"] == "MultiPolygon"
    assert len(out["coordinates"]) == 2
    assert len(out["coordinates"][0]) == 1
    assert len(out["coordinates"][1]) == 2
    want1 = orient_rings([np.array(r) for r in p1])
    want2 = orient_rings([np.array(r) for r in p2])
    for got, want in zip(out["coordinates"][0], want1):
        assert got == _closed_px(want)
    for got, want in zip(out["coordinates"][1], want2):
        assert got == _closed_px(want)


from hypothesis import given, settings
from hypothesis import strategies as st

from gpq_tiles_spark.kernels.mvt import decode_value, encode_value


@settings(max_examples=300, deadline=None)
@given(
    st.one_of(
        st.booleans(),
        st.integers(-(2**63), 2**63 - 1),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=64),
    )
)
def test_value_message_roundtrip(v):
    """decode_value(encode_value(v)) == v for every encodable kind
    (bool checked before int — Python bools ARE ints)."""
    out = decode_value(encode_value(v))
    assert type(out) is type(v) and out == v


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-9.9, max_value=9.9),
            st.floats(min_value=-9.9, max_value=9.9),
        ),
        min_size=2, max_size=40,
    )
)
def test_linestring_roundtrip_hypothesis(pts):
    """Any linestring whose quantized form keeps >= 2 distinct points
    round-trips through encode->decode to the quantized coordinates."""
    ls = np.asarray(pts, dtype=np.float64)
    out = _decode((LINESTRING, ls))
    want = _px(ls)
    assert out["type"] in ("LineString", "MultiLineString")
    if out["type"] == "LineString":
        # the encoder keeps every vertex (zero deltas included), so decode
        # reproduces the quantized input exactly
        assert out["coordinates"] == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_polygon_roundtrip_randomized(seed):
    """Random convex-ish polygons survive encode->decode bit-exactly."""
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 12))
    rad = rng.uniform(3.0, 9.0, 12)
    ring = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)
    ring = np.vstack([ring, ring[:1]])
    out = _decode((POLYGON, [ring]))
    assert out["type"] == "Polygon"
    want = orient_rings([ring])[0]
    assert out["coordinates"][0] == _px(want)
