"""MVT protobuf + PMTiles archive round-trip tests.

Layout expectations from /root/reference/crates/core/src/pmtiles_writer.rs
(header bytes :111-159, tile_id spec examples :167-173, directory encoding
:264-320) and mvt.rs command encoding (:24-75, :153-403).
"""

import numpy as np

from gpq_tiles_spark.kernels import geom as G
from gpq_tiles_spark.kernels import mvt as M
from gpq_tiles_spark.kernels import pmtiles as P
from gpq_tiles_spark.kernels.hashes import xxh64


def test_command_encode_decode():
    assert M.command_encode(M.CMD_MOVE_TO, 1) == 9
    assert M.command_encode(M.CMD_LINE_TO, 3) == 26
    assert M.command_encode(M.CMD_CLOSE_PATH, 1) == 15
    assert M.command_decode(9) == (1, 1)


def test_encode_point_geometry():
    g = G.from_wkt("POINT(5 5)")
    cmds, gtype = M.encode_geometry(g, 0.0, 0.0, 10.0, 10.0, 4096)
    assert gtype == M.GEOM_POINT
    # px = (2048, 2048): MoveTo(1), zz(2048), zz(2048)
    assert cmds == [9, 4096, 4096]


def test_encode_linestring_delta():
    g = G.from_wkt("LINESTRING(0 10, 10 10, 10 0)")
    cmds, gtype = M.encode_geometry(g, 0.0, 0.0, 10.0, 10.0, 4096)
    assert gtype == M.GEOM_LINESTRING
    # (0,0) -> (4096,0) -> (4096,4096) in y-flipped px
    assert cmds[0] == 9  # MoveTo 1
    decoded = M.decode_geometry_commands(cmds)
    assert decoded[0] == ("move", [(0, 0)])
    assert decoded[1] == ("line", [(4096, 0), (4096, 4096)])


def test_encode_polygon_winding_and_close():
    # CW ring in geo coords must be re-oriented to CCW (-> CW after y-flip)
    g = G.from_wkt("POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))")  # CW as written
    cmds, gtype = M.encode_geometry(g, 0.0, 0.0, 10.0, 10.0, 4096)
    assert gtype == M.GEOM_POLYGON
    decoded = M.decode_geometry_commands(cmds)
    assert decoded[0][0] == "move"
    assert decoded[-1][0] == "close"
    pts = decoded[0][1] + decoded[1][1]
    # Reference parity: orient(Direction::Default) = exterior CCW in geo
    # coords (mvt.rs:1002-1023), so the y-flipped encoded ring carries a
    # NEGATIVE standard shoelace. Both input windings produce this encoding.
    a = np.array(pts + [pts[0]], dtype=np.float64)
    signed2 = np.dot(a[:-1, 0], a[1:, 1]) - np.dot(a[1:, 0], a[:-1, 1])
    assert signed2 < 0
    # and the already-CCW input encodes identically
    g_ccw = G.from_wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
    cmds2, _ = M.encode_geometry(g_ccw, 0.0, 0.0, 10.0, 10.0, 4096)
    assert cmds2 == cmds


def test_round_half_away_matches_rust():
    x = np.array([0.5, 1.5, 2.5, -0.5, -1.5, 0.49, -0.49])
    out = M.round_half_away(x)
    np.testing.assert_array_equal(out, [1.0, 2.0, 3.0, -1.0, -2.0, 0.0, -0.0])


def test_layer_builder_tile_decode_round_trip():
    lb = M.LayerBuilder("features", 4096)
    g1 = G.from_wkt("POINT(5 5)")
    g2 = G.from_wkt("LINESTRING(0 0, 10 10)")
    lb.add_feature(1, g1, [("name", "a"), ("rank", 3)], 0.0, 0.0, 10.0, 10.0)
    lb.add_feature(2, g2, [("name", "b"), ("rank", 3)], 0.0, 0.0, 10.0, 10.0)
    tile = M.encode_tile([lb.build()])
    layers = M.decode_tile(tile)
    assert len(layers) == 1
    ly = layers[0]
    assert ly["name"] == "features" and ly["version"] == 2 and ly["extent"] == 4096
    assert ly["keys"] == ["name", "rank"]
    assert len(ly["values"]) == 3  # "a", 3, "b" — rank=3 deduped
    f1, f2 = ly["features"]
    assert f1["id"] == 1 and f1["type"] == M.GEOM_POINT
    assert f1["tags"] == [0, 0, 1, 1]
    assert f2["tags"] == [0, 2, 1, 1]


def test_directory_encode_decode_round_trip():
    entries = [
        P.DirEntry(0, 0, 100, 1),
        P.DirEntry(1, 100, 50, 1),
        P.DirEntry(2, 100, 50, 1),  # duplicate blob (same offset)
        P.DirEntry(5, 150, 75, 1),
    ]
    data = P.encode_directory(entries)
    back = P.decode_directory(data)
    assert [(e.tile_id, e.offset, e.length, e.run_length) for e in back] == [
        (e.tile_id, e.offset, e.length, e.run_length) for e in entries
    ]


def test_run_length_coalescing():
    entries = [
        P.DirEntry(10, 0, 100, 1),
        P.DirEntry(11, 0, 100, 1),
        P.DirEntry(12, 0, 100, 1),
        P.DirEntry(14, 0, 100, 1),  # gap -> new entry
    ]
    out = P.coalesce_run_lengths(entries)
    assert len(out) == 2
    assert out[0].run_length == 3 and out[0].tile_id == 10
    assert out[1].tile_id == 14


def test_header_127_bytes_round_trip():
    h = P.Header(
        root_dir_length=321,
        json_metadata_offset=448,
        json_metadata_length=99,
        tile_data_offset=547,
        tile_data_length=10000,
        addressed_tiles_count=42,
        tile_entries_count=40,
        tile_contents_count=39,
        min_zoom=2,
        max_zoom=9,
        min_lon=-122.4,
        min_lat=37.7,
        max_lon=-122.3,
        max_lat=37.9,
    )
    raw = h.to_bytes()
    assert len(raw) == P.HEADER_SIZE == 127
    assert raw[0:7] == b"PMTiles" and raw[7] == 3
    assert raw[97] == P.COMPRESSION_GZIP and raw[98] == P.COMPRESSION_GZIP
    assert raw[99] == P.TILETYPE_MVT
    b = P.Header.from_bytes(raw)
    assert b.root_dir_length == 321 and b.addressed_tiles_count == 42
    assert abs(b.min_lon - -122.4) < 1e-6 and abs(b.max_lat - 37.9) < 1e-6
    assert b.min_zoom == 2 and b.max_zoom == 9


def test_assembler_end_to_end(tmp_path):
    out = str(tmp_path / "test.pmtiles")
    asm = P.PMTilesAssembler(layer_name="features", min_zoom=0, max_zoom=2)
    lb = M.LayerBuilder("features")
    lb.add_feature(1, G.from_wkt("POINT(0 0)"), [], -180.0, -85.0, 180.0, 85.0)
    mvt1 = M.encode_tile([lb.build()])
    # tile 0 (z0) and tiles 1..4 (z1) — tiles 2,3 share identical content
    asm.add_tile(0, 0, mvt1, xxh64(mvt1), 1, (-180.0, -85.0, 180.0, 85.0))
    asm.add_tile(1, 1, mvt1, xxh64(mvt1), 1)
    asm.add_tile(2, 1, mvt1, xxh64(mvt1), 1)
    asm.add_tile(3, 1, b"different" + mvt1, xxh64(b"different" + mvt1), 1)
    hdr = asm.finalize(out)
    assert hdr.addressed_tiles_count == 4
    assert hdr.tile_contents_count == 2  # dedup: mvt1 stored once

    rd = P.PMTilesReader(out)
    assert rd.tile_ids() == [0, 1, 2, 3]
    assert rd.get_tile_bytes(0) == mvt1
    assert rd.get_tile_bytes(2) == mvt1
    assert rd.get_tile_bytes(3) == b"different" + mvt1
    assert rd.metadata["vector_layers"][0]["id"] == "features"
    assert rd.metadata["format"] == "pbf"
    layers = M.decode_tile(rd.get_tile_bytes(0))
    assert layers[0]["features"][0]["type"] == M.GEOM_POINT
