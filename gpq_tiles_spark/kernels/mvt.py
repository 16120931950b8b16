"""MVT (Mapbox Vector Tile) encoding — zigzag, commands, protobuf bytes.

Mirrors /root/reference/crates/core/src/mvt.rs and its prost serialization of
crates/core/proto/vector_tile.proto (field numbers per the public MVT spec):
Tile{layers=3}; Layer{name=1, features=2, keys=3, values=4, extent=5,
version=15}; Feature{id=1, tags=2 packed, type=3, geometry=4 packed};
Value{string=1, float=2, double=3, int=4, uint=5, sint=6, bool=7}.

Coordinate quantization uses Rust f64::round (half away from zero)
(mvt.rs:134-146); command stream is delta-encoded against a per-feature
cursor starting at (0,0) that runs across all parts of a multi geometry.
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
    ring_signed_area2,
)

CMD_MOVE_TO = 1
CMD_LINE_TO = 2
CMD_CLOSE_PATH = 7

GEOM_UNKNOWN, GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 0, 1, 2, 3


def zigzag_encode(n):
    n = np.asarray(n, dtype=np.int64)
    return ((n << 1) ^ (n >> 63)).astype(np.uint64) & np.uint64(0xFFFFFFFF)


def zigzag_decode(n):
    n = np.asarray(n, dtype=np.uint64)
    return (n >> np.uint64(1)).astype(np.int64) ^ -(n & np.uint64(1)).astype(np.int64)


def command_encode(cmd: int, count: int) -> int:
    return (cmd & 0x7) | (count << 3)


def command_decode(c: int) -> tuple[int, int]:
    return c & 0x7, c >> 3


def round_half_away(x: np.ndarray) -> np.ndarray:
    """Rust f64::round: ties away from zero (numpy rounds half-to-even).

    copysign(floor(|x| + 0.5), x) — matches Rust f64::round bit-for-bit,
    in 3 array passes. It differs from the previous branchy
    where(x>=0, ...) form only in the SIGN of zero for x in (-0.5, -0.0]
    (this form returns -0.0 where the old one returned +0.0); every
    caller casts to int64 immediately, which erases the distinction."""
    x = np.asarray(x, dtype=np.float64)
    t = np.abs(x)
    t += 0.5
    np.floor(t, out=t)
    return np.copysign(t, x, out=t)


def geo_to_tile_px(coords: np.ndarray, lng_min, lat_min, lng_max, lat_max,
                   extent: int) -> np.ndarray:
    """(n,2) degrees -> (n,2) int32 tile pixels, y-flipped (mvt.rs:134-146)."""
    c = np.atleast_2d(np.asarray(coords, dtype=np.float64))
    xr = (c[:, 0] - lng_min) / (lng_max - lng_min)
    yr = (c[:, 1] - lat_min) / (lat_max - lat_min)
    x = round_half_away(xr * extent).astype(np.int64)
    y = round_half_away((1.0 - yr) * extent).astype(np.int64)
    return np.stack([x, y], axis=1)


def orient_rings(rings: list[np.ndarray]) -> list[np.ndarray]:
    """geo orient(Direction::Default): exterior CCW (positive signed area in
    geographic coords), holes CW (mvt.rs:81-115)."""
    out = []
    for i, ring in enumerate(rings):
        a2 = ring_signed_area2(ring)
        want_ccw = i == 0
        is_ccw = a2 > 0
        if a2 != 0 and is_ccw != want_ccw:
            out.append(np.asarray(ring)[::-1])
        else:
            out.append(np.asarray(ring))
    return out


class _Cursor:
    __slots__ = ("x", "y")

    def __init__(self):
        self.x = 0
        self.y = 0


def _emit_moveto_lineto(px: np.ndarray, cur: _Cursor, close: bool, out: list[int]):
    """MoveTo first point, LineTo the rest (minus closing point when close),
    optional ClosePath; delta-encodes vs cursor."""
    n = len(px)
    if close:
        n_line = n - 2  # skip first and the closing duplicate (mvt.rs:301-317)
        if n < 4:
            return
    else:
        n_line = n - 1
        if n < 2:
            return
    pts = px[: 1 + n_line]
    prev = np.empty_like(pts)
    prev[0] = (cur.x, cur.y)
    prev[1:] = pts[:-1]
    deltas = pts - prev
    zz = zigzag_encode(deltas)
    out.append(command_encode(CMD_MOVE_TO, 1))
    out.append(int(zz[0, 0]))
    out.append(int(zz[0, 1]))
    if n_line > 0:
        out.append(command_encode(CMD_LINE_TO, n_line))
        flat = zz[1:].reshape(-1)
        out.extend(int(v) for v in flat)
    cur.x = int(pts[-1, 0])
    cur.y = int(pts[-1, 1])
    if close:
        out.append(command_encode(CMD_CLOSE_PATH, 1))


def encode_geometry(g: Geom, lng_min, lat_min, lng_max, lat_max,
                    extent: int) -> tuple[list[int], int]:
    """Geometry -> (command ints, MVT geom type) (mvt.rs:153-403)."""
    t, d = g
    out: list[int] = []
    cur = _Cursor()
    if t == POINT:
        px = geo_to_tile_px(d.reshape(1, 2), lng_min, lat_min, lng_max, lat_max, extent)
        zz = zigzag_encode(px)
        return [command_encode(CMD_MOVE_TO, 1), int(zz[0, 0]), int(zz[0, 1])], GEOM_POINT
    if t == MULTIPOINT:
        pts = np.asarray(d)
        if len(pts) == 0:
            return [], GEOM_POINT
        px = geo_to_tile_px(pts, lng_min, lat_min, lng_max, lat_max, extent)
        prev = np.vstack([[[0, 0]], px[:-1]])
        zz = zigzag_encode(px - prev)
        out.append(command_encode(CMD_MOVE_TO, len(pts)))
        out.extend(int(v) for v in zz.reshape(-1))
        return out, GEOM_POINT
    if t == LINESTRING:
        if len(d) < 2:
            return [], GEOM_LINESTRING
        px = geo_to_tile_px(d, lng_min, lat_min, lng_max, lat_max, extent)
        _emit_moveto_lineto(px, cur, False, out)
        return out, GEOM_LINESTRING
    if t == MULTILINESTRING:
        for ls in d:
            if len(ls) < 2:
                continue
            px = geo_to_tile_px(ls, lng_min, lat_min, lng_max, lat_max, extent)
            _emit_moveto_lineto(px, cur, False, out)
        return out, GEOM_LINESTRING
    if t == POLYGON:
        for ring in orient_rings(d):
            if len(ring) < 4:
                continue
            px = geo_to_tile_px(ring, lng_min, lat_min, lng_max, lat_max, extent)
            _emit_moveto_lineto(px, cur, True, out)
        return out, GEOM_POLYGON
    if t == MULTIPOLYGON:
        for rings in d:
            for ring in orient_rings(rings):
                if len(ring) < 4:
                    continue
                px = geo_to_tile_px(ring, lng_min, lat_min, lng_max, lat_max, extent)
                _emit_moveto_lineto(px, cur, True, out)
        return out, GEOM_POLYGON
    return [], GEOM_UNKNOWN


# ---------------------------------------------------------------------------
# Protobuf wire format (hand-rolled; tiny and spec-fixed)
# ---------------------------------------------------------------------------

def _varint(v: int) -> bytes:
    out = bytearray()
    v &= 0xFFFF_FFFF_FFFF_FFFF
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def varint_array_u32(vals) -> bytes:
    """Vectorized varint encoding of non-negative ints < 2^35 (numpy)."""
    v = np.asarray(vals, dtype=np.uint64)
    nb = np.ones(len(v), dtype=np.int64)
    nb += (
        (v >= (1 << 7)).astype(np.int64)
        + (v >= (1 << 14)).astype(np.int64)
        + (v >= (1 << 21)).astype(np.int64)
        + (v >= (1 << 28)).astype(np.int64)
    )
    total = int(nb.sum())
    out = np.zeros(total, dtype=np.uint8)
    pos = np.concatenate(([0], np.cumsum(nb)[:-1]))
    for k in range(5):
        m = nb > k
        if not m.any():
            break
        byte = ((v[m] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[m] > k + 1).astype(np.uint8) << 7
        out[pos[m] + k] = byte | cont
    return out.tobytes()


_VARINT_CACHE: list[bytes] | None = None


def _varint_cache() -> list[bytes]:
    global _VARINT_CACHE
    if _VARINT_CACHE is None:
        _VARINT_CACHE = [_varint(i) for i in range(1 << 16)]
    return _VARINT_CACHE


def _packed_u32(field: int, vals) -> bytes:
    if len(vals) == 0:
        return b""
    cache = _varint_cache()
    body = b"".join(
        cache[v] if 0 <= v < 65536 else _varint(int(v)) for v in vals
    )
    return _len_delim(field, body)


def encode_value(v) -> bytes:
    """PropertyValue -> Tile.Value message bytes."""
    if isinstance(v, bool):
        return _tag(7, 0) + _varint(1 if v else 0)
    if isinstance(v, str):
        return _len_delim(1, v.encode("utf-8"))
    if isinstance(v, int):
        if v >= 0:
            return _tag(4, 0) + _varint(v)
        return _tag(4, 0) + _varint(v & 0xFFFF_FFFF_FFFF_FFFF)
    if isinstance(v, float):
        import struct

        return _tag(3, 1) + struct.pack("<d", v)
    raise TypeError(f"unsupported property value {type(v)}")


def encode_feature(fid: int | None, tags: list[int], geom_type: int,
                   geometry: list[int]) -> bytes:
    parts = []
    if fid is not None:
        parts.append(_tag(1, 0) + _varint(fid))
    parts.append(_packed_u32(2, tags))
    parts.append(_tag(3, 0) + _varint(geom_type))
    parts.append(_packed_u32(4, geometry))
    return b"".join(parts)


def encode_layer(name: str, feature_msgs: list[bytes], keys: list[str],
                 value_msgs: list[bytes], extent: int) -> bytes:
    """Layer message bytes, prost field order: name(1), features(2), keys(3),
    values(4), extent(5), version(15)=2."""
    parts = [_len_delim(1, name.encode("utf-8"))]
    for f in feature_msgs:
        parts.append(_len_delim(2, f))
    for k in keys:
        parts.append(_len_delim(3, k.encode("utf-8")))
    for v in value_msgs:
        parts.append(_len_delim(4, v))
    parts.append(_tag(5, 0) + _varint(extent))
    parts.append(_tag(15, 0) + _varint(2))
    return b"".join(parts)


def encode_tile(layer_msgs: list[bytes]) -> bytes:
    return b"".join(_len_delim(3, lm) for lm in layer_msgs)


class LayerBuilder:
    """Insertion-ordered key/value dictionaries (mvt.rs:453-561); value dedup
    key mirrors the reference's Debug-format string."""

    def __init__(self, name: str, extent: int = 4096):
        self.name = name
        self.extent = extent
        self.features: list[bytes] = []
        self.keys: list[str] = []
        self.key_index: dict[str, int] = {}
        self.value_msgs: list[bytes] = []
        self.value_index: dict[str, int] = {}

    def _key_idx(self, key: str) -> int:
        idx = self.key_index.get(key)
        if idx is None:
            idx = len(self.keys)
            self.keys.append(key)
            self.key_index[key] = idx
        return idx

    def _value_idx(self, value) -> int:
        vk = f"{type(value).__name__}:{value!r}"
        idx = self.value_index.get(vk)
        if idx is None:
            idx = len(self.value_msgs)
            self.value_msgs.append(encode_value(value))
            self.value_index[vk] = idx
        return idx

    def add_feature(self, fid: int | None, g: Geom, properties,
                    lng_min, lat_min, lng_max, lat_max):
        cmds, gtype = encode_geometry(g, lng_min, lat_min, lng_max, lat_max, self.extent)
        if not cmds and gtype == GEOM_UNKNOWN:
            return
        tags: list[int] = []
        for k, v in properties or []:
            tags.append(self._key_idx(k))
            tags.append(self._value_idx(v))
        self.features.append(encode_feature(fid, tags, gtype, cmds))

    def build(self) -> bytes:
        return encode_layer(self.name, self.features, self.keys, self.value_msgs, self.extent)


# ---------------------------------------------------------------------------
# Decoder (for tests / decode_tile parity)
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    res = 0
    shift = 0
    while True:
        b = buf[i]
        res |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return res, i
        shift += 7


def decode_tile(buf: bytes) -> list[dict]:
    """Decode Tile -> [{name, extent, version, keys, values, features}]."""
    layers = []
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if field == 3 and wire == 2:
            ln, i = _read_varint(buf, i)
            layers.append(_decode_layer(buf[i : i + ln]))
            i += ln
        else:
            i = _skip(buf, i, wire)
    return layers


def _skip(buf: bytes, i: int, wire: int) -> int:
    if wire == 0:
        _, i = _read_varint(buf, i)
        return i
    if wire == 1:
        return i + 8
    if wire == 2:
        ln, i = _read_varint(buf, i)
        return i + ln
    if wire == 5:
        return i + 4
    raise ValueError(f"wire {wire}")


def _decode_layer(buf: bytes) -> dict:
    out = {"name": None, "extent": 4096, "version": None, "keys": [], "values": [], "features": []}
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if field == 1:
            ln, i = _read_varint(buf, i)
            out["name"] = buf[i : i + ln].decode()
            i += ln
        elif field == 2:
            ln, i = _read_varint(buf, i)
            out["features"].append(_decode_feature(buf[i : i + ln]))
            i += ln
        elif field == 3:
            ln, i = _read_varint(buf, i)
            out["keys"].append(buf[i : i + ln].decode())
            i += ln
        elif field == 4:
            ln, i = _read_varint(buf, i)
            out["values"].append(buf[i : i + ln])
            i += ln
        elif field == 5:
            out["extent"], i = _read_varint(buf, i)
        elif field == 15:
            out["version"], i = _read_varint(buf, i)
        else:
            i = _skip(buf, i, wire)
    return out


def _decode_feature(buf: bytes) -> dict:
    out = {"id": None, "tags": [], "type": 0, "geometry": []}
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if field == 1:
            out["id"], i = _read_varint(buf, i)
        elif field == 2 and wire == 2:
            ln, i = _read_varint(buf, i)
            end = i + ln
            while i < end:
                v, i = _read_varint(buf, i)
                out["tags"].append(v)
        elif field == 3:
            out["type"], i = _read_varint(buf, i)
        elif field == 4 and wire == 2:
            ln, i = _read_varint(buf, i)
            end = i + ln
            while i < end:
                v, i = _read_varint(buf, i)
                out["geometry"].append(v)
        else:
            i = _skip(buf, i, wire)
    return out


def decode_value(buf: bytes):
    """Tile.Value message bytes -> python value.

    Inverse of encode_value, but covers the full spec surface (vector_tile.proto
    Value: string=1 float=2 double=3 int=4 uint=5 sint=6 bool=7) so foreign
    archives (tippecanoe) decode too, not just our own four encoded kinds."""
    import struct as _struct

    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:
            ln, i = _read_varint(buf, i)
            return buf[i : i + ln].decode("utf-8")
        if field == 2 and wire == 5:
            return _struct.unpack_from("<f", buf, i)[0]
        if field == 3 and wire == 1:
            return _struct.unpack_from("<d", buf, i)[0]
        if field == 4 and wire == 0:  # int64: two's-complement varint
            v, i = _read_varint(buf, i)
            return v - (1 << 64) if v >= (1 << 63) else v
        if field == 5 and wire == 0:
            v, i = _read_varint(buf, i)
            return v
        if field == 6 and wire == 0:
            v, i = _read_varint(buf, i)
            return int(zigzag_decode(np.uint64(v)))
        if field == 7 and wire == 0:
            v, i = _read_varint(buf, i)
            return bool(v)
        i = _skip(buf, i, wire)
    return None


def feature_properties(feature: dict, keys: list[str], values: list) -> dict:
    """Resolve a decoded feature's packed tag pairs against the layer's
    key/value tables. ``values`` entries may be raw Value-message bytes (as
    produced by _decode_layer) or already-decoded python values."""
    out = {}
    tags = feature["tags"]
    for j in range(0, len(tags) - 1, 2):
        v = values[tags[j + 1]]
        out[keys[tags[j]]] = decode_value(v) if isinstance(v, (bytes, bytearray)) else v
    return out


def _ring_area2_px(ring: list[tuple[int, int]]) -> float:
    """Surveyor's formula (×2) over tile-pixel coords, spec 4.3.4.4."""
    a = 0
    for k in range(len(ring) - 1):
        x0, y0 = ring[k]
        x1, y1 = ring[k + 1]
        a += x0 * y1 - x1 * y0
    return a


def decode_geometry(feature: dict) -> dict:
    """Decoded feature -> GeoJSON-style geometry in tile-local pixel coords.

    Assembles the raw command integers (decode_geometry_commands) into typed
    coordinate structure per MVT spec 4.3.4: Point/MultiPoint from MoveTo runs,
    (Multi)LineString from MoveTo+LineTo paths, (Multi)Polygon from closed
    rings grouped by surveyor's-formula sign — the first ring fixes the
    exterior sign; subsequent rings with the opposite sign are holes of the
    preceding exterior (reference decodes via geozero: golden.rs:205-240).
    Rings are returned closed (first point repeated)."""
    paths = decode_geometry_commands(feature["geometry"])
    t = feature["type"]
    if t == GEOM_POINT:
        pts = [p for op, ps in paths if op == "move" for p in ps]
        if len(pts) == 1:
            return {"type": "Point", "coordinates": pts[0]}
        return {"type": "MultiPoint", "coordinates": pts}
    if t == GEOM_LINESTRING:
        lines: list[list[tuple[int, int]]] = []
        for op, ps in paths:
            if op == "move":
                lines.append(list(ps))
            elif op == "line" and lines:
                lines[-1].extend(ps)
        if len(lines) == 1:
            return {"type": "LineString", "coordinates": lines[0]}
        return {"type": "MultiLineString", "coordinates": lines}
    if t == GEOM_POLYGON:
        rings: list[list[tuple[int, int]]] = []
        cur: list[tuple[int, int]] | None = None
        for op, ps in paths:
            if op == "move":
                cur = list(ps)
            elif op == "line" and cur is not None:
                cur.extend(ps)
            elif op == "close" and cur is not None:
                cur.append(cur[0])
                rings.append(cur)
                cur = None
        polys: list[list[list[tuple[int, int]]]] = []
        # the exterior sign comes from the FIRST ring with nonzero area:
        # leading degenerate (zero-area) rings must not leave ext_sign
        # unset, or every later ring — including true holes — would start
        # a new polygon and misreport MultiPolygon structure (ADVICE r4)
        areas = [_ring_area2_px(r) for r in rings]
        ext_sign = next((a for a in areas if a != 0), 0.0)
        for ring, a2 in zip(rings, areas):
            if not polys or (a2 != 0 and ext_sign != 0.0
                             and (a2 > 0) == (ext_sign > 0)):
                polys.append([ring])
            else:
                polys[-1].append(ring)
        if len(polys) == 1:
            return {"type": "Polygon", "coordinates": polys[0]}
        return {"type": "MultiPolygon", "coordinates": polys}
    return {"type": "Unknown", "coordinates": []}


def decode_geometry_commands(cmds: list[int]) -> list[tuple[str, list[tuple[int, int]]]]:
    """Command ints -> [(op, [(x, y) absolute pixel coords])]."""
    out = []
    i = 0
    x = y = 0
    while i < len(cmds):
        cmd, count = command_decode(cmds[i])
        i += 1
        if cmd == CMD_CLOSE_PATH:
            out.append(("close", []))
            continue
        pts = []
        for _ in range(count):
            dx = int(zigzag_decode(np.uint64(cmds[i])))
            dy = int(zigzag_decode(np.uint64(cmds[i + 1])))
            i += 2
            x += dx
            y += dy
            pts.append((x, y))
        out.append(("move" if cmd == CMD_MOVE_TO else "line", pts))
    return out
