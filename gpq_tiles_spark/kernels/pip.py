"""Vectorized point-in-polygon (ray casting) — numpy kernel.

Even-odd rule over all rings (holes naturally excluded by parity); boundary
points follow the half-open convention of the crossing test. Vectorized over
(n_points x n_edges) per polygon, so a batch of candidate pairs grouped by
polygon runs with zero per-point Python.
"""

from __future__ import annotations

import numpy as np


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Crossing-number parity for one ring, vectorized (points x edges)."""
    r = np.asarray(ring, dtype=np.float64)
    x0, y0 = r[:-1, 0], r[:-1, 1]
    x1, y1 = r[1:, 0], r[1:, 1]
    # edge straddles the horizontal line at py (half-open: [min, max));
    # the x-intersection is computed ONLY for straddling pairs (typically a
    # handful per point) — same per-element fp ops, far fewer of them
    py_ = py[:, None]
    straddle = (y0[None, :] > py_) != (y1[None, :] > py_)
    si, sj = np.nonzero(straddle)
    if len(si) == 0:
        return np.zeros(len(px), dtype=bool)
    xint = x0[sj] + (py[si] - y0[sj]) / (y1[sj] - y0[sj]) * (x1[sj] - x0[sj])
    hits = si[px[si] < xint]
    return np.bincount(hits, minlength=len(px)) % 2 == 1


def points_in_polygon(px: np.ndarray, py: np.ndarray,
                      rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd over all rings: inside exterior XOR inside any hole."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    acc = np.zeros(len(px), dtype=bool)
    for ring in rings:
        if len(ring) < 4:
            continue
        acc ^= points_in_ring(px, py, ring)
    return acc


def points_in_geom(px: np.ndarray, py: np.ndarray, g) -> np.ndarray:
    """Dispatch for Polygon / MultiPolygon geometry tuples."""
    from . import geom as G

    t, d = g
    if t == G.POLYGON:
        return points_in_polygon(px, py, d)
    if t == G.MULTIPOLYGON:
        acc = np.zeros(len(px), dtype=bool)
        for rings in d:
            acc |= points_in_polygon(px, py, rings)
        return acc
    raise ValueError(f"points_in_geom expects polygonal geometry, got type {t}")
