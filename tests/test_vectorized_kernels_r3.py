"""Round-3 vectorized-kernel parity: the segmented level-synchronous RDP
and the lockstep-batched SipHash must be BIT-identical to the scalar
formulations they replaced (reimplemented here as oracles — the scalar
RDP recursion mirrors pre-round-3 `simplify.rdp`; the scalar SipHash is
the rustc-golden-verified `hashes.siphash13`)."""

from __future__ import annotations

import numpy as np
import pytest

from gpq_tiles_spark.kernels.hashes import (
    coords_words,
    siphash13,
    siphash13_coords,
    siphash13_words_many,
)
from gpq_tiles_spark.kernels.simplify import (
    _point_segment_dist,
    rdp,
    rdp_keep_mask,
    simplify_for_zoom,
    simplify_many,
)


def _rdp_scalar(coords: np.ndarray, epsilon: float) -> np.ndarray:
    """Pre-round-3 stack-based scalar RDP (the parity oracle)."""
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
        seg = pts[i + 1: j]
        dists = _point_segment_dist(seg, pts[i], pts[j])
        k = int(np.argmax(dists))
        if dists[k] > epsilon:
            mid = i + 1 + k
            keep[mid] = True
            stack.append((i, mid))
            stack.append((mid, j))
    return pts[keep]


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_rdp_bit_identical_to_scalar(seed):
    rng = np.random.default_rng(seed)
    for _ in range(120):
        n = int(rng.integers(1, 700))
        scale = 10.0 ** int(rng.integers(-4, 3))
        pts = rng.normal(0, scale, (n, 2)).cumsum(axis=0)
        if rng.random() < 0.3 and n >= 4:
            pts[-1] = pts[0]  # closed ring -> degenerate chord a == b
        if rng.random() < 0.2:
            pts[int(rng.integers(0, n))] = pts[int(rng.integers(0, n))]
        eps = float(10.0 ** rng.uniform(-6, 1) * scale)
        exp = _rdp_scalar(pts, eps)
        got = rdp(pts, eps)
        assert exp.shape == got.shape
        assert np.array_equal(exp, got)


def test_rdp_keep_mask_segmented_matches_per_piece():
    rng = np.random.default_rng(11)
    for _ in range(60):
        k = int(rng.integers(1, 20))
        sizes = rng.integers(1, 80, k)
        pieces = [rng.normal(0, 1, (int(s), 2)).cumsum(axis=0) for s in sizes]
        eps = float(10.0 ** rng.uniform(-4, 1))
        cat = np.concatenate(pieces)
        ends = np.cumsum(sizes)
        starts = ends - sizes
        mask = rdp_keep_mask(cat, starts, ends, eps)
        for i, p in enumerate(pieces):
            got = p[mask[starts[i]:ends[i]]]
            exp = _rdp_scalar(p, eps) if len(p) >= 3 else p
            assert np.array_equal(exp, got)


def test_simplify_many_matches_scalar_simplify():
    rng = np.random.default_rng(3)
    from gpq_tiles_spark.kernels import geom as G

    geoms = []
    for _ in range(40):
        t = int(rng.integers(0, 4))
        if t == 0:
            geoms.append((G.POINT, rng.normal(0, 10, 2)))
        elif t == 1:
            geoms.append((G.LINESTRING,
                          rng.normal(0, 1, (int(rng.integers(2, 60)), 2)).cumsum(axis=0)))
        elif t == 2:
            rings = [rng.normal(0, 1, (int(rng.integers(4, 60)), 2)).cumsum(axis=0)
                     for _ in range(int(rng.integers(1, 3)))]
            geoms.append((G.POLYGON, rings))
        else:
            parts = [[rng.normal(0, 1, (int(rng.integers(4, 40)), 2)).cumsum(axis=0)]
                     for _ in range(int(rng.integers(1, 3)))]
            geoms.append((G.MULTIPOLYGON, parts))
    for zoom in (2, 8, 14):
        batch = simplify_many(geoms, zoom, 4096)
        for g, got in zip(geoms, batch):
            exp = simplify_for_zoom(g, zoom, 4096)
            assert exp[0] == got[0]
            def flat(d):
                if isinstance(d, np.ndarray):
                    return [d]
                out = []
                for e in d:
                    out.extend(flat(e))
                return out
            for a, b in zip(flat(exp[1]), flat(got[1])):
                assert np.array_equal(a, b)


def test_siphash_lockstep_bit_identical():
    rng = np.random.default_rng(17)
    msgs = [rng.integers(0, 2 ** 63, int(rng.integers(0, 60))).astype(np.uint64)
            for _ in range(150)]
    got = siphash13_words_many(msgs)
    for w, h in zip(msgs, got):
        assert int(h) == siphash13(w.tobytes())


def test_siphash_coords_words_path():
    rng = np.random.default_rng(23)
    for _ in range(30):
        rings = [rng.normal(0, 50, (int(rng.integers(3, 40)), 2))
                 for _ in range(int(rng.integers(1, 4)))]
        exp = siphash13_coords(rings)
        got = int(siphash13_words_many([coords_words(rings)])[0])
        assert exp == got
