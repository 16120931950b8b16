"""Douglas-Peucker and Visvalingam simplification — numpy kernels.

``simplify_for_zoom`` matches the reference's production-path semantics
(/root/reference/crates/core/src/simplify.rs:42-89): degree-based tolerance
``360 / 2^z / extent``; tolerance < 1e-10 returns the input unchanged; points
pass through; lines with < 2 points pass through; geo::Simplify (RDP,
endpoint-preserving, perpendicular distance to the chord segment) applied to
every ring/line.

Visvalingam-Whyatt is a north-star extension (SURVEY.md T18) — no reference
implementation; standard effective-area formulation.
"""

from __future__ import annotations

import numpy as np

from .geom import (
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
)


def zoom_tolerance_degrees(zoom: int, extent: int) -> float:
    """360 / 2^z / extent (simplify.rs:46-47)."""
    return 360.0 / float(1 << zoom) / float(extent)


def _point_segment_dist(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Euclidean distance from each point to segment ab (geo rdp uses segment
    distance, so closed rings where a == b degrade to point distance)."""
    ab = b - a
    denom = float(ab[0] * ab[0] + ab[1] * ab[1])
    if denom == 0.0:
        d = pts - a
        return np.hypot(d[:, 0], d[:, 1])
    t = ((pts - a) @ ab) / denom
    t = np.clip(t, 0.0, 1.0)
    proj = a + t[:, None] * ab
    d = pts - proj
    return np.hypot(d[:, 0], d[:, 1])


def rdp(coords: np.ndarray, epsilon: float) -> np.ndarray:
    """Iterative (stack-based) Ramer-Douglas-Peucker, keeps endpoints.

    Matches geo::Simplify: split where max perpendicular distance > epsilon.
    """
    pts = np.asarray(coords, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return pts
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[i + 1 : j]
        dists = _point_segment_dist(seg, pts[i], pts[j])
        k = int(np.argmax(dists))
        if dists[k] > epsilon:
            mid = i + 1 + k
            keep[mid] = True
            stack.append((i, mid))
            stack.append((mid, j))
    return pts[keep]


def simplify_for_zoom(g: Geom, zoom: int, extent: int,
                      algorithm: str = "dp") -> Geom:
    """Production-path simplification (degree tolerance, simplify.rs:42-89).

    algorithm='dp' (default) is the reference's Douglas-Peucker; 'visvalingam'
    [north-star extension T18] uses effective-area elimination with
    min_area = tolerance^2 (the standard DP->VW threshold mapping)."""
    tol = zoom_tolerance_degrees(zoom, extent)
    if tol < 1e-10:
        return g
    if algorithm == "visvalingam":
        def fn(coords):
            return visvalingam(coords, tol * tol)
    else:
        def fn(coords):
            return rdp(coords, tol)
    t, d = g
    if t in (POINT, MULTIPOINT):
        return g
    if t == LINESTRING:
        if len(d) < 2:
            return g
        return (LINESTRING, fn(d))
    if t == MULTILINESTRING:
        return (MULTILINESTRING, [ls if len(ls) < 2 else fn(ls) for ls in d])
    if t == POLYGON:
        return (POLYGON, [fn(r) for r in d])
    if t == MULTIPOLYGON:
        return (MULTIPOLYGON, [[fn(r) for r in rings] for rings in d])
    if t == 7:  # GEOMETRYCOLLECTION: simplify each part at the same zoom
        return (7, [simplify_for_zoom(p, zoom, extent, algorithm) for p in d])
    return g


def _to_tile_f64(coords: np.ndarray, lng_min, lat_min, lng_max, lat_max, extent: int):
    c = np.asarray(coords, dtype=np.float64)
    x = (c[:, 0] - lng_min) / (lng_max - lng_min) * extent
    y = (1.0 - (c[:, 1] - lat_min) / (lat_max - lat_min)) * extent
    return np.stack([x, y], axis=1)


def _from_tile_f64(px: np.ndarray, lng_min, lat_min, lng_max, lat_max, extent: int):
    p = np.asarray(px, dtype=np.float64)
    lng = lng_min + p[:, 0] / extent * (lng_max - lng_min)
    lat = lat_min + (1.0 - p[:, 1] / extent) * (lat_max - lat_min)
    return np.stack([lng, lat], axis=1)


def simplify_in_tile_coords(g: Geom, lng_min, lat_min, lng_max, lat_max,
                            extent: int = 4096,
                            pixel_tolerance: float = 1.0) -> Geom:
    """T17: transform to tile-local pixels (f64), DP with pixel tolerance,
    transform back — latitude-independent variant
    (reference simplify.rs:229-358; default tolerance 1.0 px)."""

    def ring_fn(r: np.ndarray) -> np.ndarray:
        if len(r) < 2:
            return r
        px = _to_tile_f64(r, lng_min, lat_min, lng_max, lat_max, extent)
        out = rdp(px, pixel_tolerance)
        return _from_tile_f64(out, lng_min, lat_min, lng_max, lat_max, extent)

    t, d = g
    if t in (POINT, MULTIPOINT):
        return g
    if t == LINESTRING:
        return (LINESTRING, ring_fn(d))
    if t == MULTILINESTRING:
        return (MULTILINESTRING, [ring_fn(ls) for ls in d])
    if t == POLYGON:
        return (POLYGON, [ring_fn(r) for r in d])
    if t == MULTIPOLYGON:
        return (MULTIPOLYGON, [[ring_fn(r) for r in rings] for rings in d])
    return g


def visvalingam(coords: np.ndarray, min_area: float) -> np.ndarray:
    """Visvalingam-Whyatt: iteratively remove the vertex with the smallest
    effective triangle area until all remaining areas >= min_area.
    [north-star extension — cite: BASELINE.json north_star]"""
    pts = np.asarray(coords, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return pts
    import heapq

    prev = np.arange(n) - 1
    nxt = np.arange(n) + 1
    alive = np.ones(n, dtype=bool)

    def tri_area(i: int) -> float:
        p, q, r = pts[prev[i]], pts[i], pts[nxt[i]]
        return abs((q[0] - p[0]) * (r[1] - p[1]) - (r[0] - p[0]) * (q[1] - p[1])) / 2.0

    heap = [(tri_area(i), i) for i in range(1, n - 1)]
    heapq.heapify(heap)
    areas = {i: a for a, i in heap}
    while heap:
        a, i = heapq.heappop(heap)
        if not alive[i] or areas.get(i) != a:
            continue
        if a >= min_area:
            break
        alive[i] = False
        p, q = prev[i], nxt[i]
        nxt[p] = q
        prev[q] = p
        for j in (p, q):
            if 0 < j < n - 1 and alive[j]:
                na = tri_area(j)
                areas[j] = na
                heapq.heappush(heap, (na, j))
    return pts[alive]
