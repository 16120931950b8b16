"""Vectorized MVT tile encoding for tile_id-sorted record runs.

The encode stage is the per-tile hot loop of the whole engine (one iteration
per output tile; 100Ms of tiles at production scale), so it avoids pandas
groupby, per-tile kernel calls, and per-feature WKB re-parsing:

* run boundaries found with one numpy comparison;
* tile bounds computed vectorized for ALL runs at once (per-row zoom);
* point features (the dominant class in document corpora) are decoded in
  bulk with an unaligned structured dtype over the concatenated WKB buffer,
  quantized vectorized, and assembled as protobuf bytes with precomputed
  command ints;
* non-point features fall back to the exact kernel path
  (kernels.mvt.encode_geometry), preserving bit-parity with the reference.

Output bytes are identical to LayerBuilder's (tests assert equality).
"""

from __future__ import annotations

import numpy as np

from . import geom as G
from . import mvt as M
from . import tile_math as T
from .hashes import content_hash64

_POINT_DT = np.dtype(
    {"names": ["x", "y"], "formats": ["<f8", "<f8"], "offsets": [5, 13], "itemsize": 21}
)


def _varint(v: int) -> bytes:
    out = bytearray()
    v &= 0xFFFF_FFFF_FFFF_FFFF
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


_MOVETO1 = 9  # command_encode(MOVE_TO, 1)


def _point_feature_bytes(fid: int, zzx: int, zzy: int) -> bytes:
    """Feature{id, type=POINT, geometry=[9, zzx, zzy]} message bytes.
    Field layout identical to kernels.mvt.encode_feature with empty tags."""
    geom_payload = b"\x09" + _varint(zzx) + _varint(zzy)
    return (
        b"\x08" + _varint(fid)          # field 1: id
        + b"\x18\x01"                    # field 3: type = POINT
        + b"\x22" + _varint(len(geom_payload)) + geom_payload  # field 4 packed
    )


def layer_head_tail(layer_name: str, extent: int) -> tuple[bytes, bytes]:
    head = b"\x0a" + _varint(len(layer_name)) + layer_name.encode()
    tail = b"\x28" + _varint(extent) + b"\x78\x02"  # extent(5), version(15)=2
    return head, tail


def wrap_layer(head: bytes, feature_msgs: list[bytes], tail: bytes) -> bytes:
    parts = [head]
    for fmsg in feature_msgs:
        parts.append(b"\x12" + _varint(len(fmsg)) + fmsg)
    parts.append(tail)
    layer = b"".join(parts)
    return b"\x1a" + _varint(len(layer)) + layer


def encode_partial_runs(tid: np.ndarray, z: np.ndarray, x: np.ndarray,
                        y: np.ndarray, fid: np.ndarray, wkbs: np.ndarray,
                        extent: int):
    """Phase A of the salted two-phase encode: per consecutive
    (tile_id[, salt]) run, produce the per-feature protobuf messages WITHOUT
    wrapping them in a layer. Feature messages are independent byte segments
    (the MVT cursor resets per feature), so buckets can be merged later in
    feature_id order for byte-identical output.

    Returns dict with per-run: tile_id, z, x, y, n_records, fids, msgs.
    """
    n = len(tid)
    starts = np.flatnonzero(np.concatenate(([True], tid[1:] != tid[:-1])))
    ends = np.append(starts[1:], n)
    lng0, lat0, lng1, lat1 = T.tile_bounds_mixed(x[starts], y[starts], z[starts])
    sizes = ends - starts
    gidx = np.repeat(np.arange(len(starts)), sizes)
    lens = np.fromiter((len(w) for w in wkbs), dtype=np.int64, count=n)
    is_pt, px, py = _bulk_points(wkbs, gidx, lng0, lat0, lng1, lat1, extent)
    is_r5, r5cmds = _bulk_rect5(wkbs, gidx, lens, lng0, lat0, lng1, lat1, extent)
    is_ls, ls_start, ls_npts, ls_inter = _bulk_lines(
        wkbs, gidx, lens, lng0, lat0, lng1, lat1, extent)
    zzx = ((px << 1) ^ (px >> 63)) & 0xFFFFFFFF
    zzy = ((py << 1) ^ (py >> 63)) & 0xFFFFFFFF
    fid_l = fid.tolist()
    out_fids: list[list[int]] = []
    out_msgs: list[list[bytes]] = []
    for gi in range(len(starts)):
        s, e = starts[gi], ends[gi]
        fids_g: list[int] = []
        msgs_g: list[bytes] = []
        b0, a0, b1, a1 = lng0[gi], lat0[gi], lng1[gi], lat1[gi]
        for i in range(s, e):
            if is_pt[i]:
                fmsg = _point_feature_bytes(fid_l[i], int(zzx[i]), int(zzy[i]))
            elif is_r5[i]:
                fmsg = M.encode_feature(fid_l[i], [], M.GEOM_POLYGON,
                                        r5cmds[i].tolist())
            elif is_ls[i]:
                fmsg = M.encode_feature(
                    fid_l[i], [], M.GEOM_LINESTRING,
                    _line_cmds(int(ls_start[i]), int(ls_npts[i]), ls_inter))
            else:
                g = G.from_wkb(bytes(wkbs[i]))
                cmds, gtype = M.encode_geometry(g, b0, a0, b1, a1, extent)
                if not cmds and gtype == M.GEOM_UNKNOWN:
                    continue
                fmsg = M.encode_feature(fid_l[i], [], gtype, cmds)
            fids_g.append(fid_l[i])
            msgs_g.append(fmsg)
        out_fids.append(fids_g)
        out_msgs.append(msgs_g)
    return {
        "tile_id": tid[starts],
        "z": z[starts].astype(np.int32),
        "x": x[starts],
        "y": y[starts],
        "n_records": sizes.astype(np.int64),
        "fids": out_fids,
        "msgs": out_msgs,
    }


def _bulk_points(wkbs: np.ndarray, gidx: np.ndarray, lng0, lat0, lng1, lat1,
                 extent: int):
    """Shared bulk point decode + quantization; returns (is_pt, px, py)."""
    n = len(wkbs)
    lens = np.fromiter((len(w) for w in wkbs), dtype=np.int64, count=n)
    is_pt = lens == 21
    px = np.zeros(n, dtype=np.int64)
    py = np.zeros(n, dtype=np.int64)
    if is_pt.any():
        pt_rows = np.flatnonzero(is_pt)
        buf = b"".join(wkbs[i] for i in pt_rows)
        arr = np.frombuffer(buf, dtype=_POINT_DT)
        hdr = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 21)
        ok = (hdr[:, 0] == 1) & (hdr[:, 1] == 1) & (hdr[:, 2] == 0)
        if not ok.all():
            bad = pt_rows[~ok]
            is_pt[bad] = False
            pt_rows = pt_rows[ok]
            arr = arr[ok]
        if len(pt_rows):
            g = gidx[pt_rows]
            fx = (arr["x"] - lng0[g]) / (lng1[g] - lng0[g]) * extent
            fy = (1.0 - (arr["y"] - lat0[g]) / (lat1[g] - lat0[g])) * extent
            px[pt_rows] = M.round_half_away(fx).astype(np.int64)
            py[pt_rows] = M.round_half_away(fy).astype(np.int64)
    return is_pt, px, py


_LS_HDR = b"\x01\x02\x00\x00\x00"


def _bulk_lines(wkbs: np.ndarray, gidx: np.ndarray, lens: np.ndarray,
                lng0, lat0, lng1, lat1, extent: int):
    """Bulk path for single-part LineStrings: decode all coords in one
    buffer, quantize + delta + zigzag vectorized. Returns (is_ls, per-row
    (start, npts) index arrays, interleaved zigzag array) — command
    assembly slices the shared array per row.
    Byte-identical to kernels.mvt.encode_linestring (cursor starts at 0)."""
    n = len(wkbs)
    is_ls = np.zeros(n, dtype=bool)
    cand = np.flatnonzero((lens >= 9 + 32) & ((lens - 9) % 16 == 0))
    rows = [i for i in cand if bytes(wkbs[i][:5]) == _LS_HDR]
    if not rows:
        return is_ls, None, None, None
    rows = np.array(rows, dtype=np.int64)
    is_ls[rows] = True
    npts = ((lens[rows] - 9) // 16).astype(np.int64)
    payload = b"".join(bytes(wkbs[i])[9:] for i in rows)
    coords = np.frombuffer(payload, dtype="<f8").reshape(-1, 2)
    rec = np.repeat(np.arange(len(rows)), npts)
    g = gidx[rows][rec]
    fx = (coords[:, 0] - lng0[g]) / (lng1[g] - lng0[g]) * extent
    fy = (1.0 - (coords[:, 1] - lat0[g]) / (lat1[g] - lat0[g])) * extent
    px = M.round_half_away(fx).astype(np.int64)
    py = M.round_half_away(fy).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(npts)[:-1]))
    prev_x = np.empty_like(px)
    prev_x[1:] = px[:-1]
    prev_x[starts] = 0
    prev_y = np.empty_like(py)
    prev_y[1:] = py[:-1]
    prev_y[starts] = 0
    dx = px - prev_x
    dy = py - prev_y
    zzx = ((dx << 1) ^ (dx >> 63)) & 0xFFFFFFFF
    zzy = ((dy << 1) ^ (dy >> 63)) & 0xFFFFFFFF
    inter = np.empty(2 * len(px), dtype=np.int64)
    inter[0::2] = zzx
    inter[1::2] = zzy
    row_start = np.full(n, -1, dtype=np.int64)
    row_npts = np.zeros(n, dtype=np.int64)
    row_start[rows] = starts
    row_npts[rows] = npts
    return is_ls, row_start, row_npts, inter


def _line_cmds(start: int, npts: int, inter: np.ndarray) -> list[int]:
    s2 = 2 * start
    out = [9, int(inter[s2]), int(inter[s2 + 1]),
           (2 & 0x7) | ((npts - 1) << 3)]
    out.extend(inter[s2 + 2 : s2 + 2 * npts].tolist())
    return out


# single-ring 5-point polygon (canonical interior rects + small quads):
# byte0 LE, type=3, nrings=1, npts=5, 10 doubles
_RECT5_LEN = 9 + 4 + 5 * 16
_RECT5_DT = np.dtype(
    {
        "names": [f"c{i}" for i in range(10)],
        "formats": ["<f8"] * 10,
        "offsets": [13 + 8 * i for i in range(10)],
        "itemsize": _RECT5_LEN,
    }
)


def _bulk_rect5(wkbs: np.ndarray, gidx: np.ndarray, lens: np.ndarray,
                lng0, lat0, lng1, lat1, extent: int):
    """Bulk path for 5-point single-ring polygons.

    Returns (is_r5, zz) where zz is an (n, 11) int64 array of the MVT
    command stream [MoveTo1, zx0, zy0, LineTo3, zdx1, zdy1, ..., ClosePath]
    — byte-identical to kernels.mvt.encode_polygon (incl. CCW orientation).
    """
    n = len(wkbs)
    is_r5 = lens == _RECT5_LEN
    zz = None
    if not is_r5.any():
        return is_r5, zz
    rows = np.flatnonzero(is_r5)
    buf = b"".join(wkbs[i] for i in rows)
    hdr = np.frombuffer(buf, dtype=np.uint8).reshape(-1, _RECT5_LEN)
    ok = (
        (hdr[:, 0] == 1) & (hdr[:, 1] == 3) & (hdr[:, 2] == 0)
        & (hdr[:, 5] == 1) & (hdr[:, 6] == 0)
        & (hdr[:, 9] == 5) & (hdr[:, 10] == 0)
    )
    if not ok.all():
        is_r5[rows[~ok]] = False
        rows = rows[ok]
    if not len(rows):
        return is_r5, None
    raw = np.frombuffer(buf, dtype=_RECT5_DT)
    if not ok.all():
        raw = raw[ok]
    pts = np.stack([raw[f"c{i}"] for i in range(10)], axis=1).reshape(-1, 5, 2)
    # orient to CCW (positive shoelace in geo coords), like orient_rings
    x, y = pts[:, :, 0], pts[:, :, 1]
    a2 = (x[:, :-1] * y[:, 1:] - x[:, 1:] * y[:, :-1]).sum(axis=1)
    cw = a2 < 0
    if cw.any():
        pts = np.where(cw[:, None, None], pts[:, ::-1, :], pts)
    g = gidx[rows]
    fx = (pts[:, :, 0] - lng0[g, None]) / (lng1[g, None] - lng0[g, None]) * extent
    fy = (1.0 - (pts[:, :, 1] - lat0[g, None]) / (lat1[g, None] - lat0[g, None])) * extent
    ix = M.round_half_away(fx).astype(np.int64)
    iy = M.round_half_away(fy).astype(np.int64)
    # encode_ring: MoveTo(pt0), LineTo(pts 1..3), ClosePath (skip closing dup)
    dx = np.diff(ix[:, :4], axis=1, prepend=np.zeros((len(rows), 1), dtype=np.int64))
    dy = np.diff(iy[:, :4], axis=1, prepend=np.zeros((len(rows), 1), dtype=np.int64))
    zzx = ((dx << 1) ^ (dx >> 63)) & 0xFFFFFFFF
    zzy = ((dy << 1) ^ (dy >> 63)) & 0xFFFFFFFF
    out = np.empty((n, 11), dtype=np.int64)
    sub = np.empty((len(rows), 11), dtype=np.int64)
    sub[:, 0] = 9  # MoveTo count 1
    sub[:, 1] = zzx[:, 0]
    sub[:, 2] = zzy[:, 0]
    sub[:, 3] = (2 & 0x7) | (3 << 3)  # LineTo count 3
    sub[:, 4::2][:, :3] = zzx[:, 1:4]
    sub[:, 5::2][:, :3] = zzy[:, 1:4]
    sub[:, 10] = 15  # ClosePath
    out[rows] = sub
    return is_r5, out


def encode_sorted_runs(tid: np.ndarray, z: np.ndarray, x: np.ndarray,
                       y: np.ndarray, fid: np.ndarray, wkbs: np.ndarray,
                       layer_name: str, extent: int):
    """Encode consecutive tile_id runs -> columns for the tiles DataFrame.

    Inputs are the (tile_id, feature_id)-sorted record columns of one chunk.
    Returns dict of lists/arrays: tile_id, z, x, y, n_features, mvt,
    content_hash.
    """
    n = len(tid)
    starts = np.flatnonzero(np.concatenate(([True], tid[1:] != tid[:-1])))
    ends = np.append(starts[1:], n)
    g_tid = tid[starts]
    g_z = z[starts]
    g_x = x[starts]
    g_y = y[starts]
    lng0, lat0, lng1, lat1 = T.tile_bounds_mixed(g_x, g_y, g_z)
    n_groups = len(starts)
    sizes = ends - starts
    gidx = np.repeat(np.arange(n_groups), sizes)

    # ---- bulk fast paths: points + 5-pt single-ring polygons ----
    lens = np.fromiter((len(w) for w in wkbs), dtype=np.int64, count=n)
    is_pt, px, py = _bulk_points(wkbs, gidx, lng0, lat0, lng1, lat1, extent)
    is_r5, r5cmds = _bulk_rect5(wkbs, gidx, lens, lng0, lat0, lng1, lat1, extent)
    is_ls, ls_start, ls_npts, ls_inter = _bulk_lines(
        wkbs, gidx, lens, lng0, lat0, lng1, lat1, extent)

    zzx = ((px << 1) ^ (px >> 63)) & 0xFFFFFFFF
    zzy = ((py << 1) ^ (py >> 63)) & 0xFFFFFFFF

    layer_head = b"\x0a" + _varint(len(layer_name)) + layer_name.encode()
    layer_tail = b"\x28" + _varint(extent) + b"\x78\x02"  # extent(5), version(15)=2

    out_mvt: list[bytes] = []
    out_hash: list[int] = []
    fid_l = fid.tolist()
    zzx_l = zzx.tolist()
    zzy_l = zzy.tolist()
    is_pt_l = is_pt.tolist()

    for gi in range(n_groups):
        s, e = starts[gi], ends[gi]
        parts = [layer_head]
        b0, a0, b1, a1 = lng0[gi], lat0[gi], lng1[gi], lat1[gi]
        for i in range(s, e):
            if is_pt_l[i]:
                fmsg = _point_feature_bytes(fid_l[i], zzx_l[i], zzy_l[i])
            elif is_r5[i]:
                fmsg = M.encode_feature(fid_l[i], [], M.GEOM_POLYGON,
                                        r5cmds[i].tolist())
            elif is_ls[i]:
                fmsg = M.encode_feature(
                    fid_l[i], [], M.GEOM_LINESTRING,
                    _line_cmds(int(ls_start[i]), int(ls_npts[i]), ls_inter))
            else:
                g = G.from_wkb(bytes(wkbs[i]))
                cmds, gtype = M.encode_geometry(g, b0, a0, b1, a1, extent)
                if not cmds and gtype == M.GEOM_UNKNOWN:
                    continue
                fmsg = M.encode_feature(fid_l[i], [], gtype, cmds)
            parts.append(b"\x12" + _varint(len(fmsg)) + fmsg)
        parts.append(layer_tail)
        layer = b"".join(parts)
        mvt = b"\x1a" + _varint(len(layer)) + layer
        out_mvt.append(mvt)
        out_hash.append(content_hash64(mvt) & 0x7FFF_FFFF_FFFF_FFFF)

    return {
        "tile_id": g_tid,
        "z": g_z.astype(np.int32),
        "x": g_x,
        "y": g_y,
        "n_features": sizes.astype(np.int64),
        "mvt": out_mvt,
        "content_hash": np.array(out_hash, dtype=np.int64),
    }
