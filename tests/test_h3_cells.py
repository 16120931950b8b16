"""T21 H3 path: gated tests that exercise the REAL h3 library when it is
installed (absent in this container — they skip cleanly here and activate
on any host with `pip install h3`), plus always-on tests for the gate
behavior and the scheme-agnostic (idx, cell) API contract."""

import numpy as np
import pytest

from gpq_tiles_spark.operators import cells as C


def test_gate_raises_without_h3():
    if C.HAS_H3:
        pytest.skip("h3 installed — gate not reachable")
    with pytest.raises(NotImplementedError, match="h3"):
        C.latlng_to_h3_cell(np.array([0.0]), np.array([0.0]), 9)
    with pytest.raises(NotImplementedError, match="h3"):
        C.h3_grid_disk(np.array([0]), 1)


def test_h3_cell_assignment_matches_lib():
    pytest.importorskip("h3")
    lng = np.array([4.9, -122.3, 151.2])
    lat = np.array([52.4, 47.6, -33.9])
    got = C.latlng_to_h3_cell(lng, lat, 9)
    to_cell, _d, to_int = C._h3_funcs()
    want = [to_int(to_cell(la, lo, 9)) for lo, la in zip(lng, lat)]
    assert got.tolist() == [np.uint64(w).astype(np.int64) for w in want]


def test_h3_grid_disk_contract():
    pytest.importorskip("h3")
    cells = C.latlng_to_h3_cell(np.array([4.9]), np.array([52.4]), 9)
    idx, disk = C.h3_grid_disk(cells, 1)
    # hex disk at k=1 holds 7 cells (1 + 3k(k+1)) away from pentagons
    assert len(disk) == 7
    assert (idx == 0).all()
    assert cells[0] in disk  # center cell included


def test_h3_column_roundtrip(spark):
    pytest.importorskip("h3")
    df = spark.createDataFrame(
        [(1, 4.9, 52.4), (2, 4.91, 52.41)], "id long, lng double, lat double"
    )
    out = C.with_h3_cell_column(df, "lng", "lat", 7).collect()
    want = C.latlng_to_h3_cell(np.array([4.9, 4.91]), np.array([52.4, 52.41]), 7)
    got = {r.id: r.cell for r in out}
    assert got[1] == want[0] and got[2] == want[1]
    # nearby points share a coarse cell — the join-key property kNN uses
    assert got[1] == got[2]


# ---------------------------------------------------------------------------
# Round 5: fake-module adapter tests — assert the v3/v4 API mapping, the
# (lat, lng) argument order, and the uint64<->int64 reinterpretation
# WITHOUT the h3 dependency. The fakes are deterministic stand-ins whose
# cell ids encode (lat, lng, res) reversibly, so a swapped argument or a
# missed str<->int conversion changes the result and fails loudly. Only
# the live-lib column test above still needs the real package.
# ---------------------------------------------------------------------------

import sys
import types


def _fake_cell_int(lat: float, lng: float, res: int) -> int:
    # asymmetric in lat/lng on purpose: argument-order bugs change the id
    return (res << 48) | (int((lat + 90.0) * 1000) << 24) \
        | int((lng + 180.0) * 1000)


def _make_fake_v4():
    m = types.ModuleType("h3")

    def latlng_to_cell(lat, lng, res):
        return format(_fake_cell_int(lat, lng, res), "x")

    def grid_disk(cell_str, k):
        base = int(cell_str, 16)
        return [format(base + d, "x") for d in range(1 + 3 * k * (k + 1))]

    m.latlng_to_cell = latlng_to_cell
    m.grid_disk = grid_disk
    m.str_to_int = lambda s: int(s, 16)
    m.int_to_str = lambda v: format(int(v), "x")
    return m


def _make_fake_v3():
    m = types.ModuleType("h3")

    def geo_to_h3(lat, lng, res):
        return format(_fake_cell_int(lat, lng, res), "x")

    def k_ring(cell_str, k):
        base = int(cell_str, 16)
        return [format(base + d, "x") for d in range(1 + 3 * k * (k + 1))]

    m.geo_to_h3 = geo_to_h3
    m.k_ring = k_ring
    m.string_to_h3 = lambda s: int(s, 16)
    m.h3_to_string = lambda v: format(int(v), "x")
    return m


@pytest.mark.parametrize("make_fake", [_make_fake_v4, _make_fake_v3],
                         ids=["v4-api", "v3-api"])
def test_h3_adapter_mapping_with_fake_lib(monkeypatch, make_fake):
    fake = make_fake()
    monkeypatch.setitem(sys.modules, "h3", fake)
    monkeypatch.setattr(C, "HAS_H3", True)
    lng = np.array([4.9, -122.3, 151.2])
    lat = np.array([52.4, 47.6, -33.9])
    got = C.latlng_to_h3_cell(lng, lat, 9)
    want = np.array([_fake_cell_int(la, lo, 9) for lo, la in zip(lng, lat)],
                    dtype=np.uint64).astype(np.int64)
    assert got.tolist() == want.tolist(), \
        "adapter must pass (lat, lng, res) in that order and intify cells"
    # disk contract: per-input idx mapping + str->int conversion of rings
    idx, disk = C.h3_grid_disk(got[:2], 2)
    per = 1 + 3 * 2 * (2 + 1)  # 19 cells per disk at k=2
    assert len(idx) == len(disk) == 2 * per
    assert idx.tolist() == [0] * per + [1] * per
    assert disk[:per].tolist() == [int(got[0]) + d for d in range(per)]
    assert disk[per:].tolist() == [int(got[1]) + d for d in range(per)]


def test_h3_adapter_int64_reinterpret_roundtrip(monkeypatch):
    """Cells with bit 63 clear reinterpret losslessly; the adapter's
    uint64 view survives values above 2^62 (real H3 ids use 63 bits)."""
    fake = _make_fake_v4()
    big = (0x08FF << 48) | 0x1234_5678  # 60-bit id, like real H3 mode bits
    fake.latlng_to_cell = lambda lat, lng, res: format(big, "x")
    monkeypatch.setitem(sys.modules, "h3", fake)
    monkeypatch.setattr(C, "HAS_H3", True)
    got = C.latlng_to_h3_cell(np.array([0.0]), np.array([0.0]), 9)
    assert np.uint64(got.astype(np.uint64)[0]) == np.uint64(big)


# ---------------------------------------------------------------------------
# Round 6: PUBLISHED golden vectors, asserted lib-free. The fake module
# resolves latlng_to_cell by EXACT dict lookup on (lat, lng, res) and
# returns the published H3 cell string, so a swapped argument order, a
# wrong resolution pass-through, or a broken hex->uint64->int64 path all
# miss the lookup or corrupt the asserted numeric id. Vector sources are
# the public H3 docs quickstart and the h3-py README examples; each id is
# additionally self-checked against the PUBLISHED index bit layout
# (bit 63 reserved=0, bits 62-59 mode=1 for cells, bits 55-52 resolution)
# so a mis-remembered vector cannot slip in silently.
# ---------------------------------------------------------------------------

# (lat, lng, res) -> published cell id string
H3_GOLDEN_CELLS = {
    # H3 docs / h3-js README canonical example
    (37.7752702151959, -122.418307270836, 9): "8928308280fffff",
    # h3-py README quickstart example
    (37.3615593, -122.0553238, 5): "85283473fffffff",
}

# h3-py docs: k_ring('8928308280fffff', 1) — the 7-cell hex disk
H3_GOLDEN_DISK_K1 = {
    "8928308280fffff",
    "8928308280bffff",
    "89283082807ffff",
    "89283082877ffff",
    "89283082803ffff",
    "89283082873ffff",
    "8928308283bffff",
}


def test_golden_vectors_satisfy_h3_bit_layout():
    """Sanity gate on the vendored vectors themselves: every id must parse
    as a valid H3 CELL index with the resolution its vector claims (the
    bit layout is normative in the public H3 spec)."""
    for (lat, lng, res), s in H3_GOLDEN_CELLS.items():
        v = int(s, 16)
        assert v >> 63 == 0, s                      # reserved high bit
        assert (v >> 59) & 0xF == 1, s              # mode 1 = cell
        assert (v >> 52) & 0xF == res, s            # resolution field
        assert -90.0 <= lat <= 90.0 and -180.0 <= lng <= 180.0
    for s in H3_GOLDEN_DISK_K1:
        v = int(s, 16)
        assert v >> 63 == 0 and (v >> 59) & 0xF == 1
        assert (v >> 52) & 0xF == 9, s              # disk is at res 9


def _make_fake_golden(api: str):
    lookup = {k: v for k, v in H3_GOLDEN_CELLS.items()}
    disk_lookup = {("8928308280fffff", 1): sorted(H3_GOLDEN_DISK_K1)}
    m = types.ModuleType("h3")

    def to_cell(lat, lng, res):
        return lookup[(lat, lng, res)]  # KeyError = argument-order bug

    def disk(cell_str, k):
        return disk_lookup[(cell_str, k)]

    if api == "v4":
        m.latlng_to_cell = to_cell
        m.grid_disk = disk
        m.str_to_int = lambda s: int(s, 16)
        m.int_to_str = lambda v: format(int(v), "x")
    else:
        m.geo_to_h3 = to_cell
        m.k_ring = disk
        m.string_to_h3 = lambda s: int(s, 16)
        m.h3_to_string = lambda v: format(int(v), "x")
    return m


@pytest.mark.parametrize("api", ["v4", "v3"])
def test_h3_adapter_against_published_vectors(monkeypatch, api):
    monkeypatch.setitem(sys.modules, "h3", _make_fake_golden(api))
    monkeypatch.setattr(C, "HAS_H3", True)
    lats = np.array([k[0] for k in H3_GOLDEN_CELLS])
    lngs = np.array([k[1] for k in H3_GOLDEN_CELLS])
    for (lat, lng, res), want_str in H3_GOLDEN_CELLS.items():
        got = C.latlng_to_h3_cell(np.array([lng]), np.array([lat]), res)
        assert got.dtype == np.int64
        assert np.uint64(got.astype(np.uint64)[0]) == np.uint64(int(want_str, 16))
    _ = (lats, lngs)
    # disk of the res-9 docs cell: exactly the published 7-cell set
    center = np.array([int("8928308280fffff", 16)], dtype=np.int64)
    idx, cells = C.h3_grid_disk(center, 1)
    assert idx.tolist() == [0] * 7
    got_set = {format(np.uint64(c).item(), "x") for c in cells}
    assert got_set == H3_GOLDEN_DISK_K1
