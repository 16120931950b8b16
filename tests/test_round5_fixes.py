"""Round-5 regression tests for the ADVICE r4 findings.

Covers: decode_geometry exterior-sign establishment with leading
degenerate rings, NaT/pd.NA omission in property packing, and the
deterministic (ordering-minimum) props winner for duplicated feature_ids.
"""

import numpy as np
import pandas as pd

from gpq_tiles_spark.kernels import mvt as M
from gpq_tiles_spark.pipeline import pack_prop_row


def _cmd(cid: int, count: int) -> int:
    return (cid & 0x7) | (count << 3)


def _zz(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _ring_cmds(pts, first_move_from=(0, 0)):
    """MOVE_TO first pt, LINE_TO rest, CLOSE — absolute pts to deltas."""
    out = []
    px, py = first_move_from
    x0, y0 = pts[0]
    out += [_cmd(1, 1), _zz(x0 - px), _zz(y0 - py)]
    cur = (x0, y0)
    coords = []
    for x, y in pts[1:]:
        coords += [_zz(x - cur[0]), _zz(y - cur[1])]
        cur = (x, y)
    out += [_cmd(2, len(pts) - 1)] + coords + [_cmd(7, 1)]
    return out, cur


def test_decode_geometry_leading_degenerate_ring():
    """A zero-area first ring must not make every later ring (holes
    included) start a new polygon: the exterior sign comes from the first
    ring with NONZERO area (ADVICE r4)."""
    # ring 1: degenerate (collinear); ring 2: degenerate "hole" of ring 1;
    # ring 3: real exterior; ring 4: its hole (opposite orientation)
    cmds, cur = _ring_cmds([(0, 0), (2, 0), (4, 0)])
    c2, cur = _ring_cmds([(1, 0), (2, 0), (3, 0)], cur)
    cmds += c2
    c3, cur = _ring_cmds([(10, 10), (30, 10), (30, 30), (10, 30)], cur)
    cmds += c3
    c4, cur = _ring_cmds([(15, 15), (15, 25), (25, 25), (25, 15)], cur)
    cmds += c4
    geom = M.decode_geometry({"type": M.GEOM_POLYGON, "geometry": cmds})
    assert geom["type"] == "MultiPolygon"
    polys = geom["coordinates"]
    # degenerate pair groups into one polygon; the real exterior + hole
    # group into the second — 2 polygons, the second with 2 rings
    assert len(polys) == 2
    assert len(polys[0]) == 2  # both degenerates together, not split
    assert len(polys[1]) == 2  # exterior + its hole grouped
    ext, hole = polys[1]
    a_ext = M._ring_area2_px(ext)
    a_hole = M._ring_area2_px(hole)
    assert a_ext != 0 and a_hole != 0 and (a_ext > 0) != (a_hole > 0)


def test_decode_geometry_all_degenerate_rings_single_polygon():
    cmds, cur = _ring_cmds([(0, 0), (2, 0), (4, 0)])
    c2, cur = _ring_cmds([(5, 5), (6, 5), (7, 5)], cur)
    cmds += c2
    geom = M.decode_geometry({"type": M.GEOM_POLYGON, "geometry": cmds})
    assert geom["type"] == "Polygon"  # one polygon, two degenerate rings
    assert len(geom["coordinates"]) == 2


def test_pack_prop_row_omits_nat_and_pd_na():
    kinds = {"a": "str", "b": "str", "c": "int", "d": "str"}
    row = pack_prop_row(
        {"a": pd.NaT, "b": pd.NA, "c": np.nan, "d": "ok"}, kinds)
    assert [e["key"] for e in row] == ["d"]
    # and a plain string is untouched
    assert row[0]["val"] == M.encode_value("ok")


def test_pack_prop_row_list_value_is_not_nulled():
    # pd.isna on list-likes returns an array; that must not be treated as
    # a null scalar (the value stringifies through the 'str' kind)
    kinds = {"a": "str"}
    row = pack_prop_row({"a": [1, 2]}, kinds)
    assert row and row[0]["key"] == "a"


def test_props_dedup_winner_is_partition_order_independent(spark):
    """Duplicate feature_ids must resolve to the ordering-minimum props
    value regardless of row arrival order (ADVICE r4: dropDuplicates'
    survivor was partition-order dependent)."""
    import pyspark.sql.functions as F

    rows = [
        (7, [{"key": "k", "val": bytearray(b"\x02zz")}]),
        (7, [{"key": "k", "val": bytearray(b"\x01aa")}]),
    ]
    schema = "feature_id long, props array<struct<key:string,val:binary>>"
    for perm in (rows, rows[::-1]):
        df = spark.createDataFrame(perm, schema).repartition(4)
        got = (
            df.groupBy("feature_id").agg(F.min("props").alias("props"))
            .collect()
        )
        assert len(got) == 1
        assert bytes(got[0]["props"][0]["val"]) == b"\x01aa"


def test_encode_props_tile_skips_dead_record_props():
    """A dead record (empty msg) encodes no tags, so its props must not
    enter the layer dictionary — otherwise tiles holding thinned records
    carry unreferenced key/value entries (round-5 self-review)."""
    from gpq_tiles_spark.kernels.mvt import encode_value
    from gpq_tiles_spark.pipeline import _encode_props_tile

    head, tail = b"\x0a\x01x", b"\x28\x80\x20\x78\x02"
    live_msg = b"\x12\x04\x08\x01\x18\x01"
    items = [{"key": "k", "val": encode_value("fat-value")}]
    # dead record WITH props + live record WITHOUT: dictionary stays empty
    mvt, n = _encode_props_tile(
        7, [5, 6], [b"", live_msg], [items, None], None, head, tail, None)
    assert n == 2
    assert b"fat-value" not in mvt
    # live record with the same props: value present exactly once
    mvt2, _ = _encode_props_tile(
        7, [5, 6], [b"", live_msg], [items, items], None, head, tail, None)
    assert mvt2.count(b"fat-value") == 1


def test_encode_props_column_handles_list_values(spark):
    """Array-typed property columns (unhashable in factorize) must fall
    back to per-row encoding, stringified through the 'str' kind — the
    pre-round-5 semantics (round-5 self-review)."""
    from gpq_tiles_spark.kernels.mvt import decode_value
    from gpq_tiles_spark.pipeline import encode_props_column

    df = spark.createDataFrame(
        [(1, [1, 2]), (2, [3]), (3, None)],
        "feature_id long, tags array<int>")
    rows = {r.feature_id: r.props
            for r in encode_props_column(df, ["tags"]).collect()}
    assert decode_value(bytes(rows[1][0]["val"])) == "[1 2]" or \
        "1" in decode_value(bytes(rows[1][0]["val"]))
    assert rows[3] == []  # null array -> omitted


def test_encode_props_column_preserves_negative_zero(spark):
    from gpq_tiles_spark.kernels.mvt import encode_value
    from gpq_tiles_spark.pipeline import encode_props_column

    df = spark.createDataFrame(
        [(1, 0.0), (2, -0.0), (3, -0.0), (4, 1.5)],
        "feature_id long, v double")
    rows = {r.feature_id: r.props
            for r in encode_props_column(df, ["v"]).collect()}
    assert bytes(rows[1][0]["val"]) == encode_value(0.0)
    assert bytes(rows[2][0]["val"]) == encode_value(-0.0)
    assert bytes(rows[1][0]["val"]) != bytes(rows[2][0]["val"])


def test_directory_builder_single_add_equals_chunked_adds():
    """One giant add() (build_directories) and many small add() calls
    must produce identical root/leaf bytes — and the single-add path is
    linear (one concatenation per overflow), not quadratic."""
    import io

    import numpy as np

    from gpq_tiles_spark.kernels.pmtiles import DirectoryBuilder

    n = 50_000
    tid = np.arange(0, 2 * n, 2, dtype=np.int64)  # no coalescible runs
    off = np.arange(n, dtype=np.int64) * 64
    length = np.full(n, 64, dtype=np.int64)
    run = np.ones(n, dtype=np.int64)

    outs = []
    for chunks in (1, 37):
        spill = io.BytesIO()
        b = DirectoryBuilder(n, spill=spill)
        for part in np.array_split(np.arange(n), chunks):
            b.add(tid[part], off[part], length[part], run[part])
        root, _, cnt = b.finish()
        assert cnt == n
        outs.append((root, spill.getvalue()))
    assert outs[0] == outs[1]
