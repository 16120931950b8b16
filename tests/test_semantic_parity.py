"""Semantic parity self-check harness — golden.rs:168-182 analog on the
synthetic corpus (the reference's realdata/golden fixtures are git-LFS stubs
in this sandbox, so parity is asserted as SEMANTIC invariants rather than
byte replay):

* base-zoom completeness: every point feature appears at max_zoom (D1 keeps
  all points at base);
* point-thinning rates: per-zoom point retention tracks the 0.4^dz rule;
* pyramid shape: tile counts grow, bounded by the 4x quadtree factor;
* area preservation: summed clipped polygon area at base zoom >= 0.80 of
  the original (golden.rs area-preservation band), and <= a buffered upper
  bound (clip adds buffer overlap at tile seams).

A drop-rule, clip, or fan-out regression shows up here as a semantic delta
even when every kernel unit test still passes.
"""

import numpy as np
import pytest

from gpq_tiles_spark.config import TilerConfig
from gpq_tiles_spark.extract import extract_features
from gpq_tiles_spark.kernels import geom as G
from gpq_tiles_spark.kernels import hilbert as H
from gpq_tiles_spark.kernels import tile_math as T

BASE_Z = 8


@pytest.fixture(scope="module")
def pyramid(spark, docs_table):
    """records (tile_id, feature_id, wkb) for z0..BASE_Z + input features."""
    from gpq_tiles_spark.pipeline import fanout_records

    feats = extract_features(spark.read.parquet(docs_table)).cache()
    cfg = TilerConfig(min_zoom=0, max_zoom=BASE_Z, shuffle_partitions=4)
    recs = fanout_records(feats, cfg).collect()
    feat_rows = feats.collect()
    z, x, y = H.tile_id_to_zxy_vec(np.array([r.tile_id for r in recs]))
    return feat_rows, recs, z, x, y


def test_base_zoom_point_completeness(pyramid):
    feat_rows, recs, z, x, y = pyramid
    pt_fids = {r.feature_id for r in feat_rows if r.geom_type == G.POINT}
    base_fids = {r.feature_id for r, zz in zip(recs, z) if zz == BASE_Z}
    assert pt_fids <= base_fids  # no point lost at base zoom


def test_point_thinning_tracks_rule(pyramid):
    feat_rows, recs, z, x, y = pyramid
    pt_fids = {r.feature_id for r in feat_rows if r.geom_type == G.POINT}
    n_pts = len(pt_fids)
    for zz in range(BASE_Z - 3, BASE_Z):
        kept = sum(1 for r, rz in zip(recs, z) if rz == zz and r.feature_id in pt_fids)
        expect = n_pts * 0.4 ** (BASE_Z - zz)
        # binomial-ish tolerance: the fmix64 thinning is per-feature i.i.d.
        sd = max((expect * (1 - 0.4 ** (BASE_Z - zz))) ** 0.5, 1.0)
        assert abs(kept - expect) <= 5 * sd, (zz, kept, expect)


def test_pyramid_tile_counts_bounded(pyramid):
    feat_rows, recs, z, x, y = pyramid
    tiles_per_z = {}
    for (zz, xx, yy) in zip(z, x, y):
        tiles_per_z.setdefault(int(zz), set()).add((int(xx), int(yy)))
    for zz in range(0, BASE_Z):
        n0 = len(tiles_per_z.get(zz, ()))
        n1 = len(tiles_per_z.get(zz + 1, ()))
        assert n0 >= 1
        assert n1 <= 4 * n0 + 4  # quadtree growth bound (+slack for buffers)


def _record_area(rec, zz, xx, yy, cfg):
    """Unsigned area of one record's geometry in degrees^2; empty-WKB
    markers are canonical interior rects (buffered tile bounds)."""
    if len(rec.wkb) == 0:
        x0, y0, x1, y1 = (
            float(v[0]) for v in T.tile_bounds(np.array([xx]), np.array([yy]), int(zz))
        )
        buf = (x1 - x0) * cfg.buffer_pixels / cfg.extent
        return (x1 - x0 + 2 * buf) * (y1 - y0 + 2 * buf)
    g = G.from_wkb(bytes(rec.wkb))
    if g[0] == G.POLYGON:
        return G.polygon_unsigned_area(g[1])
    if g[0] == G.MULTIPOLYGON:
        return sum(G.polygon_unsigned_area(r) for r in g[1])
    return 0.0


def test_area_preservation_at_base_zoom(pyramid):
    feat_rows, recs, z, x, y = pyramid
    cfg = TilerConfig(min_zoom=0, max_zoom=BASE_Z)
    from gpq_tiles_spark.kernels import drop as DK

    orig = {}
    for r in feat_rows:
        if r.geom_type in (G.POLYGON, G.MULTIPOLYGON):
            g = G.from_wkb(bytes(r.wkb))
            a = (G.polygon_unsigned_area(g[1]) if g[0] == G.POLYGON
                 else sum(G.polygon_unsigned_area(rr) for rr in g[1]))
            # only polygons safely ABOVE the tiny-polygon threshold at base
            # zoom: subpixel pieces are SUPPOSED to be diffuse-dropped (D3),
            # which legitimately loses area — golden.rs bands likewise apply
            # to features the drop rules keep
            xs, ys = T.lng_lat_to_tile_xy(
                np.array([(r.lng_min + r.lng_max) / 2]),
                np.array([(r.lat_min + r.lat_max) / 2]), BASE_Z)
            tx0, ty0, tx1, ty1 = T.tile_bounds(
                xs.astype(np.float64), ys.astype(np.float64), BASE_Z)
            a_px = a * (cfg.extent / float(tx1[0] - tx0[0])) * (
                cfg.extent / float(ty1[0] - ty0[0]))
            if a > 1e-9 and a_px >= 4 * DK.TINY_POLYGON_THRESHOLD:
                orig[r.feature_id] = a
    clipped = {}
    for rec, zz, xx, yy in zip(recs, z, x, y):
        if int(zz) != BASE_Z or rec.feature_id not in orig:
            continue
        clipped[rec.feature_id] = clipped.get(rec.feature_id, 0.0) + _record_area(
            rec, zz, xx, yy, cfg)
    assert orig, "fixture must contain polygons"
    n_checked = 0
    for fid, a0 in orig.items():
        a1 = clipped.get(fid, 0.0)
        ratio = a1 / a0
        # >= 0.80 of original preserved (golden.rs band); buffer overlap at
        # seams inflates the sum, bounded by the buffered-tile blowup
        assert ratio >= 0.80, (fid, ratio)
        assert ratio <= 2.5, (fid, ratio)
        n_checked += 1
    assert n_checked >= 10
