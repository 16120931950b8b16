"""Geometry validity filtering — mirrors /root/reference/crates/core/src/validate.rs.

Constants (validate.rs:30-38): line >= 2 pts, ring >= 4 pts (3 unique +
closing), polygon unsigned area >= 1e-10. Multi-geometries are filtered
per-part and DOWNGRADED to the singular type when exactly one part survives
(validate.rs:247-253, :267-273).
"""

from __future__ import annotations

import numpy as np

from .geom import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
    polygon_unsigned_area,
)

MIN_POLYGON_RING_POINTS = 4
MIN_LINESTRING_POINTS = 2
MIN_POLYGON_AREA = 1e-10


def _valid_polygon(rings: list[np.ndarray]) -> bool:
    if len(rings) == 0 or len(rings[0]) < MIN_POLYGON_RING_POINTS:
        return False
    for hole in rings[1:]:
        if len(hole) < MIN_POLYGON_RING_POINTS:
            return False
    return polygon_unsigned_area(rings) >= MIN_POLYGON_AREA


def filter_valid_geometry(g: Geom) -> Geom | None:
    """Some(valid geometry, possibly downgraded) or None (validate.rs:195-275)."""
    t, d = g
    if t == POINT:
        return g
    if t == MULTIPOINT:
        return g if len(d) else None
    if t == LINESTRING:
        return g if len(d) >= MIN_LINESTRING_POINTS else None
    if t == MULTILINESTRING:
        valid = [ls for ls in d if len(ls) >= MIN_LINESTRING_POINTS]
        if not valid:
            return None
        if len(valid) == 1:
            return (LINESTRING, valid[0])
        return (MULTILINESTRING, valid)
    if t == POLYGON:
        return g if _valid_polygon(d) else None
    if t == MULTIPOLYGON:
        valid = [rings for rings in d if _valid_polygon(rings)]
        if not valid:
            return None
        if len(valid) == 1:
            return (POLYGON, valid[0])
        return (MULTIPOLYGON, valid)
    if t == GEOMETRYCOLLECTION:
        # per-part filter with the same downgrade-when-single rule
        valid = [v for v in (filter_valid_geometry(p) for p in d) if v is not None]
        if not valid:
            return None
        if len(valid) == 1:
            return valid[0]
        return (GEOMETRYCOLLECTION, valid)
    return g
