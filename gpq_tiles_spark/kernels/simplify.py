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


def rdp_keep_mask(pts: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                  epsilon: float) -> np.ndarray:
    """Level-synchronous Ramer-Douglas-Peucker over MANY pieces at once.

    ``pts`` is an (m, 2) concatenation of rings/lines; piece k spans
    ``pts[starts[k]:ends[k]]``. Returns a boolean keep mask over the m
    points, bit-identical to running the classic recursive RDP per piece:
    the kept set is order-independent (each span's split point is a
    deterministic function of its endpoints), so processing all open spans
    of every piece in one vectorized wave per recursion LEVEL — segmented
    distance computation + segmented first-argmax via ``reduceat`` —
    reproduces the scalar result with O(log n) numpy passes instead of
    one Python call per span (the scalar version degrades to ~one call
    per VERTEX when epsilon keeps nearly everything, which is exactly the
    max-zoom pre-simplify regime on vertex-dense input).
    """
    x = np.ascontiguousarray(pts[:, 0], dtype=np.float64)
    y = np.ascontiguousarray(pts[:, 1], dtype=np.float64)
    m = len(x)
    keep = np.zeros(m, dtype=bool)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    ne = ends > starts
    keep[starts[ne]] = True
    keep[ends[ne] - 1] = True
    # pieces with < 3 points keep everything (scalar rdp returns input)
    two = ends - starts == 2
    keep[starts[two]] = True  # already set; explicit for clarity
    big = ends - starts >= 3
    si = starts[big]
    sj = ends[big] - 1
    imax = np.iinfo(np.int64).max
    while len(si):
        lens = sj - si - 1  # interior points per span (>= 1)
        tot = int(lens.sum())
        span_of = np.repeat(np.arange(len(si), dtype=np.int64), lens)
        base = np.zeros(len(si), dtype=np.int64)
        np.cumsum(lens[:-1], out=base[1:])
        pidx = si[span_of] + 1 + (np.arange(tot, dtype=np.int64) - base[span_of])
        ax = x[si][span_of]
        ay = y[si][span_of]
        abx = x[sj][span_of] - ax
        aby = y[sj][span_of] - ay
        denom = abx * abx + aby * aby
        apx = x[pidx] - ax
        apy = y[pidx] - ay
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (apx * abx + apy * aby) / denom
        np.clip(t, 0.0, 1.0, out=t)
        # same fp op order as the scalar kernel: p - (a + t*ab)
        dx = x[pidx] - (ax + t * abx)
        dy = y[pidx] - (ay + t * aby)
        d = np.hypot(dx, dy)
        deg = denom == 0.0
        if deg.any():
            # a == b: plain point distance (matches _point_segment_dist)
            d = np.where(deg, np.hypot(apx, apy), d)
        smax = np.maximum.reduceat(d, base)
        is_max = d == smax[span_of]
        cand = np.where(is_max, pidx, imax)
        kidx = np.minimum.reduceat(cand, base)  # FIRST max, like np.argmax
        split = smax > epsilon
        mids = kidx[split]
        keep[mids] = True
        nsi = np.concatenate([si[split], mids])
        nsj = np.concatenate([mids, sj[split]])
        open_ = nsj > nsi + 1
        si = nsi[open_]
        sj = nsj[open_]
    return keep


def rdp(coords: np.ndarray, epsilon: float) -> np.ndarray:
    """Ramer-Douglas-Peucker, keeps endpoints (single piece).

    Matches geo::Simplify: split where max perpendicular distance > epsilon.
    Thin wrapper over the segmented ``rdp_keep_mask`` kernel.
    """
    pts = np.asarray(coords, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return pts
    keep = rdp_keep_mask(
        pts.reshape(-1, 2),
        np.array([0], dtype=np.int64),
        np.array([n], dtype=np.int64),
        epsilon,
    )
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


def simplify_many(geoms: list[Geom], zoom: int, extent: int,
                  algorithm: str = "dp") -> list[Geom]:
    """Batched ``simplify_for_zoom``: every ring/line of every geometry goes
    through ONE segmented ``rdp_keep_mask`` call (identical results — the
    kernel is bit-identical per piece and pieces are independent).
    Non-DP algorithms and collections fall back to the scalar path."""
    tol = zoom_tolerance_degrees(zoom, extent)
    if tol < 1e-10:
        return list(geoms)
    if algorithm != "dp":
        return [simplify_for_zoom(g, zoom, extent, algorithm) for g in geoms]
    n = len(geoms)
    out: list[Geom | None] = [None] * n
    pieces: list[np.ndarray] = []
    specs: list[tuple] = []  # (geom_idx, gtype, structure of piece indices)

    def add(arr) -> int:
        pieces.append(np.asarray(arr, dtype=np.float64))
        return len(pieces) - 1

    for i, g in enumerate(geoms):
        t, d = g
        if t in (POINT, MULTIPOINT):
            out[i] = g
        elif t == LINESTRING:
            if len(d) < 2:
                out[i] = g
            else:
                specs.append((i, t, add(d)))
        elif t == MULTILINESTRING:
            specs.append((i, t, [None if len(ls) < 2 else add(ls) for ls in d]))
        elif t == POLYGON:
            specs.append((i, t, [add(r) for r in d]))
        elif t == MULTIPOLYGON:
            specs.append((i, t, [[add(r) for r in rings] for rings in d]))
        elif t == 7:  # GEOMETRYCOLLECTION: scalar recursion (rare)
            out[i] = simplify_for_zoom(g, zoom, extent, algorithm)
        else:
            out[i] = g
    if pieces:
        sizes = np.array([len(p) for p in pieces], dtype=np.int64)
        ends = np.cumsum(sizes)
        starts = ends - sizes
        cat = np.concatenate([p.reshape(-1, 2) for p in pieces], axis=0)
        mask = rdp_keep_mask(cat, starts, ends, tol)
        simp = [cat[starts[k]:ends[k]][mask[starts[k]:ends[k]]]
                for k in range(len(pieces))]
    for spec in specs:
        i, t, s = spec
        if t == LINESTRING:
            out[i] = (t, simp[s])
        elif t == MULTILINESTRING:
            out[i] = (t, [geoms[i][1][j] if k is None else simp[k]
                          for j, k in enumerate(s)])
        elif t == POLYGON:
            out[i] = (t, [simp[k] for k in s])
        else:  # MULTIPOLYGON
            out[i] = (t, [[simp[k] for k in rings] for rings in s])
    return out


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
