"""Semantic drop-rule banding against REAL tippecanoe output (VERDICT r3
item 2), anchored to the reference's own comparison harness
(crates/core/src/golden.rs:168-340 and context/ARCHITECTURE.md:55-66).

The golden input parquet is an LFS stub, but the open-buildings archive's
max-zoom tiles carry (quantization aside) the unsimplified source geometry —
tippecanoe ran with --simplify-only-low-zooms, so z10 is unsimplified. We
reconstruct the Andorra buildings corpus from BOTH z10 tiles (671 unique
polygons after boundary-straddle dedup by property key), run THIS engine's
convert() over it at z0-10, and band-compare the resulting pyramid per zoom
against the actual tippecanoe archive:

  * tile set: ours must cover every tippecanoe tile (z5-z10, 8 tiles);
    extra tiles only below z6 (we keep a survivor at z4 where tippecanoe
    drops everything — its own z0-z4 are empty).
  * per-zoom feature-count ratio at z7-z10 in [0.7, 1.1] (observed 1.00 /
    0.95 / 0.83 / 0.92; reference's published self-ratio is 0.78x at z8,
    0.81x at z10, and its own accepted band is 0.3-2.0x, golden.rs:239).
  * small-count zooms (z5/z6, <25 features) use an absolute-slack band.
  * z10 area preservation in [0.80, 1.05] (golden.rs:288-336 band).

A drop-rule (D1-D7), clip, or fan-out drift now shows up against an
EXTERNAL implementation, not a self-check.
"""

from __future__ import annotations

import collections
import os
import pickle

import numpy as np
import pytest

from gpq_tiles_spark.config import TilerConfig
from gpq_tiles_spark.extract import FEATURES_SCHEMA
from gpq_tiles_spark.kernels import geom as G
from gpq_tiles_spark.kernels import tile_math as T
from gpq_tiles_spark.kernels.hilbert import tile_id_to_zxy
from gpq_tiles_spark.kernels.mvt import (
    decode_geometry,
    decode_tile,
    feature_properties,
)
from gpq_tiles_spark.kernels.pmtiles import PMTilesReader, read_tile

ARCHIVE = "/root/reference/tests/fixtures/golden/open-buildings.pmtiles"
EXTENT = 4096
Z10_TILES = [(516, 377), (516, 378)]

pytestmark = pytest.mark.skipif(
    not os.path.isfile(ARCHIVE), reason="reference golden fixtures not present"
)


def _px_to_deg(pts, z: int, x: int, y: int) -> np.ndarray:
    """Invert geo_to_tile_px's per-tile linear quantization."""
    lng0, lat0, lng1, lat1 = (
        float(v[0]) for v in T.tile_bounds(np.array([x]), np.array([y]), z)
    )
    pts = np.asarray(pts, dtype=np.float64)
    lng = lng0 + pts[:, 0] / EXTENT * (lng1 - lng0)
    lat = lat0 + (1.0 - pts[:, 1] / EXTENT) * (lat1 - lat0)
    return np.stack([lng, lat], axis=1)


def _poly_area_px(g: dict) -> float:
    def ring(r):
        a = 0.0
        for k in range(len(r) - 1):
            a += r[k][0] * r[k + 1][1] - r[k + 1][0] * r[k][1]
        return a / 2.0

    if g["type"] == "Polygon":
        return abs(sum(ring(r) for r in g["coordinates"]))
    if g["type"] == "MultiPolygon":
        return abs(sum(ring(r) for poly in g["coordinates"] for r in poly))
    return 0.0


@pytest.fixture(scope="module")
def corpus():
    """(feature rows for FEATURES_SCHEMA, summed source polygon area px^2
    per z10 tile). Boundary-straddling buildings appear (buffer-clipped) in
    both z10 tiles; keep the larger-area copy per property key."""
    best: dict[tuple, tuple] = {}
    for x, y in Z10_TILES:
        lay = decode_tile(read_tile(ARCHIVE, 10, x, y))[0]
        for f in lay["features"]:
            g = decode_geometry(f)
            if g["type"] not in ("Polygon", "MultiPolygon"):
                continue
            props = feature_properties(f, lay["keys"], lay["values"])
            key = (
                props.get("boundary_id"),
                props.get("area_in_meters"),
                props.get("bf_source"),
                props.get("confidence"),
            )
            area = _poly_area_px(g)
            cur = best.get(key)
            if cur is None or area > cur[0]:
                best[key] = (area, x, y, g)
    rows = []
    for i, (key, (area, x, y, g)) in enumerate(
        sorted(best.items(), key=lambda kv: str(kv[0]))
    ):
        polys = [g["coordinates"]] if g["type"] == "Polygon" else g["coordinates"]
        geo_polys = [[_px_to_deg(r, 10, x, y) for r in rings] for rings in polys]
        gg = (
            (G.POLYGON, geo_polys[0])
            if len(geo_polys) == 1
            else (G.MULTIPOLYGON, geo_polys)
        )
        t, d = gg
        allpts = (
            np.vstack(d) if t == G.POLYGON else np.vstack([r for p in d for r in p])
        )
        rows.append(
            (
                i,
                str(i),
                0,
                bytearray(G.to_wkb(gg)),
                int(t),
                float(allpts[:, 0].min()),
                float(allpts[:, 1].min()),
                float(allpts[:, 0].max()),
                float(allpts[:, 1].max()),
            )
        )
    assert len(rows) == 671  # deterministic reconstruction
    return rows


@pytest.fixture(scope="module")
def pyramids(spark, corpus, tmp_path_factory):
    """Run convert() z0-10 over the reconstructed corpus; return per-tile
    feature counts for our archive and the tippecanoe archive, plus decoded
    z10 layers of ours."""
    from gpq_tiles_spark.pipeline import convert

    out = str(tmp_path_factory.mktemp("bands") / "ours.pmtiles")
    df = spark.createDataFrame(corpus, FEATURES_SCHEMA)
    convert(df, out, TilerConfig(min_zoom=0, max_zoom=10, shuffle_partitions=8))

    def counts(path):
        r = PMTilesReader(path)
        out_c = {}
        for tid in r.tile_ids():
            z, x, y = tile_id_to_zxy(tid)
            out_c[(z, x, y)] = len(decode_tile(r.get_tile_bytes(tid))[0]["features"])
        return out_c

    return counts(out), counts(ARCHIVE), out


def test_tile_set_covers_tippecanoe(pyramids):
    ours, tipp, _ = pyramids
    missing = set(tipp) - set(ours)
    assert not missing, f"tiles tippecanoe wrote but we did not: {missing}"
    extras = {t for t in set(ours) - set(tipp)}
    assert all(z < 6 for z, _, _ in extras), (
        f"unexpected extra tiles at mid/high zoom: {extras}"
    )


def test_per_zoom_feature_ratio_bands(pyramids):
    ours, tipp, _ = pyramids
    oz, tz = collections.Counter(), collections.Counter()
    for (z, _, _), n in ours.items():
        oz[z] += n
    for (z, _, _), n in tipp.items():
        tz[z] += n
    for z in range(5, 11):
        o, t = oz.get(z, 0), tz.get(z, 0)
        assert t > 0
        if t >= 25:  # z7-z10: statistically meaningful counts
            ratio = o / t
            assert 0.7 <= ratio <= 1.1, f"z{z}: ours={o} tipp={t} ratio={ratio:.3f}"
        else:  # z5/z6: single-digit counts, absolute slack
            assert abs(o - t) <= max(5, t), f"z{z}: ours={o} tipp={t}"


def test_z10_area_preserved(pyramids, corpus):
    """golden.rs:288-336 band: post-pipeline polygon area within
    [0.80, 1.05] of the source area (both in z10 tile px^2)."""
    _, _, ours_path = pyramids
    src_area = 0.0
    for row in corpus:
        g = G.from_wkb(bytes(row[3]))
        t, d = g
        polys = [d] if t == G.POLYGON else d
        for rings in polys:
            px = [
                [
                    tuple(p)
                    for p in _deg_to_px(np.asarray(r), 10, 516, 377)
                ]
                for r in rings
            ]
            src_area += _poly_area_px(
                {"type": "Polygon", "coordinates": px}
            )
    our_area = 0.0
    for x, y in Z10_TILES:
        raw = read_tile(ours_path, 10, x, y)
        if raw is None:
            continue
        lay = decode_tile(raw)[0]
        for f in lay["features"]:
            g = decode_geometry(f)
            if g["type"] in ("Polygon", "MultiPolygon"):
                # measure in the frame of the tile the feature landed in
                our_area += _poly_area_px(g)
    ratio = our_area / src_area
    assert 0.80 <= ratio <= 1.05, f"area ratio {ratio:.4f}"


def test_property_tags_round_trip_vs_tippecanoe(spark, tmp_path):
    """External anchor for the write_properties extension: rebuild the
    open-buildings z10 tile corpus WITH its tippecanoe-written properties,
    run the distributed property pipeline at z10, and require every
    kept feature's decoded tag dict to appear in tippecanoe's own tag
    multiset for the same tile (wire kinds may differ — tippecanoe uses
    uint/sint variants — so values are compared post-decode)."""
    from collections import Counter

    from gpq_tiles_spark.config import TilerConfig
    from gpq_tiles_spark.pipeline import convert, encode_props_column

    x, y = 516, 377
    lay = decode_tile(read_tile(ARCHIVE, 10, x, y))[0]
    rows = []
    tipp_props = Counter()
    for i, f in enumerate(lay["features"]):
        g = decode_geometry(f)
        if g["type"] not in ("Polygon", "MultiPolygon"):
            continue
        props = feature_properties(f, lay["keys"], lay["values"])
        key = (props.get("boundary_id"), round(float(props.get("area_in_meters")), 4),
               props.get("bf_source"))
        tipp_props[key] += 1
        polys = [g["coordinates"]] if g["type"] == "Polygon" else g["coordinates"]
        geo_polys = [[_px_to_deg(r, 10, x, y) for r in rings] for rings in polys]
        gg = (
            (G.POLYGON, geo_polys[0]) if len(geo_polys) == 1
            else (G.MULTIPOLYGON, geo_polys)
        )
        t, d = gg
        allp = np.vstack(d) if t == G.POLYGON else np.vstack([r for p in d for r in p])
        rows.append(
            (i, str(i), 0, bytearray(G.to_wkb(gg)), int(t),
             float(allp[:, 0].min()), float(allp[:, 1].min()),
             float(allp[:, 0].max()), float(allp[:, 1].max()),
             int(props["boundary_id"]), float(props["area_in_meters"]),
             str(props["bf_source"]))
        )
    schema = (
        "feature_id long, doc_id string, span_offset int, wkb binary, "
        "geom_type int, lng_min double, lat_min double, lng_max double, "
        "lat_max double, boundary_id long, area_in_meters double, "
        "bf_source string"
    )
    df = encode_props_column(
        spark.createDataFrame(rows, schema),
        ["boundary_id", "area_in_meters", "bf_source"],
    )
    out = str(tmp_path / "props_anchor.pmtiles")
    convert(df, out, TilerConfig(min_zoom=10, max_zoom=10,
                                 shuffle_partitions=4,
                                 write_properties=True))
    ours = decode_tile(read_tile(out, 10, x, y))[0]
    assert len(ours["features"]) >= 0.8 * len(rows)  # drop rules thin a few
    ours_props = Counter()
    for f in ours["features"]:
        p = feature_properties(f, ours["keys"], ours["values"])
        assert set(p) == {"boundary_id", "area_in_meters", "bf_source"}
        ours_props[(p["boundary_id"], round(float(p["area_in_meters"]), 4),
                    p["bf_source"])] += 1
    # every tag tuple we wrote exists in tippecanoe's multiset
    assert not (ours_props - tipp_props), (ours_props - tipp_props)


# ---------------------------------------------------------------------------
# Line pipeline bands: road-detections (St. Lucia road LineStrings)
# ---------------------------------------------------------------------------

ROADS = "/root/reference/tests/fixtures/golden/road-detections.pmtiles"
ROADS_Z10 = [(338, 471), (338, 472)]


@pytest.fixture(scope="module")
def roads_pyramids(spark, tmp_path_factory):
    """Reconstruct the 1004 road LineStrings from the archive's two z10
    tiles (no dedup: road property keys repeat, and only <=33 features
    straddle the tile boundary — a <=3% duplication the bands absorb), run
    convert() z0-10, and return per-tile counts for both archives. This
    anchors the LINE drop rules (D4/D5 tiny-line) to real tippecanoe
    output the way the polygon test anchors D1/D3."""
    from gpq_tiles_spark.pipeline import convert

    rows = []
    i = 0
    for x, y in ROADS_Z10:
        lay = decode_tile(read_tile(ROADS, 10, x, y))[0]
        for f in lay["features"]:
            g = decode_geometry(f)
            lines = (
                [g["coordinates"]] if g["type"] == "LineString"
                else g["coordinates"]
            )
            geo = [_px_to_deg(l, 10, x, y) for l in lines if len(l) >= 2]
            if not geo:
                continue
            gg = (
                (G.LINESTRING, geo[0]) if len(geo) == 1
                else (G.MULTILINESTRING, geo)
            )
            allp = np.vstack(geo)
            rows.append(
                (i, str(i), 0, bytearray(G.to_wkb(gg)), int(gg[0]),
                 float(allp[:, 0].min()), float(allp[:, 1].min()),
                 float(allp[:, 0].max()), float(allp[:, 1].max()))
            )
            i += 1
    assert len(rows) == 1004  # deterministic reconstruction
    out = str(tmp_path_factory.mktemp("roadbands") / "ours.pmtiles")
    df = spark.createDataFrame(rows, FEATURES_SCHEMA)
    convert(df, out, TilerConfig(min_zoom=0, max_zoom=10, shuffle_partitions=8))

    def counts(path):
        r = PMTilesReader(path)
        out_c = {}
        for tid in r.tile_ids():
            z, x, y = tile_id_to_zxy(tid)
            out_c[(z, x, y)] = len(decode_tile(r.get_tile_bytes(tid))[0]["features"])
        return out_c

    return counts(out), counts(ROADS)


def test_roads_tile_set_covers_tippecanoe(roads_pyramids):
    ours, tipp = roads_pyramids
    assert set(tipp) <= set(ours), set(tipp) - set(ours)


def test_roads_per_zoom_feature_ratio_bands(roads_pyramids):
    """Observed at authoring time: z0 1.15, z2 1.15, z3-z10 0.91-1.07 —
    band [0.7, 1.25] for zooms with >=90 tippecanoe features; small-count
    zooms (z0/z1) get absolute slack (z1 observed 94 vs 49: both engines
    drop-to-density at low zoom with different line-length weighting)."""
    ours, tipp = roads_pyramids
    oz, tz = collections.Counter(), collections.Counter()
    for (z, _, _), n in ours.items():
        oz[z] += n
    for (z, _, _), n in tipp.items():
        tz[z] += n
    for z in range(0, 11):
        o, t = oz.get(z, 0), tz.get(z, 0)
        assert t > 0
        if t >= 90:
            ratio = o / t
            assert 0.7 <= ratio <= 1.25, f"z{z}: ours={o} tipp={t} ratio={ratio:.3f}"
        else:
            assert abs(o - t) <= max(50, t), f"z{z}: ours={o} tipp={t}"


def _deg_to_px(pts: np.ndarray, z: int, x: int, y: int) -> np.ndarray:
    """Forward per-tile linear quantization frame (float, no rounding) so
    source and decoded areas are measured in the same px^2 units."""
    lng0, lat0, lng1, lat1 = (
        float(v[0]) for v in T.tile_bounds(np.array([x]), np.array([y]), z)
    )
    px = (pts[:, 0] - lng0) / (lng1 - lng0) * EXTENT
    py = (1.0 - (pts[:, 1] - lat0) / (lat1 - lat0)) * EXTENT
    return np.stack([px, py], axis=1)
