"""Catalyst-native spatial expressions, shared between Spark SQL and the
DuckDB oracle.

The point-mass operations of the engine (tile assignment, world coords,
bbox aggregation, in-rect joins) are pure arithmetic, so at 10^12-row scale
they should run INSIDE WholeStageCodegen — not in Python. These helpers emit
SQL expression strings whose math is verified bit-exact between Spark and
DuckDB (ln/tan/cos/radians/floor agree on all 10k sf0.01 rows; see
tests/test_entry_contract.py). The same text feeds both engines, eliminating
formula drift.

Formulas mirror the reference kernels:
* tile x/y:   /root/reference/crates/core/src/tile.rs:112-123
* world x/y:  /root/reference/crates/core/src/spatial_index.rs:251-272
  (ln(tan+sec) form)
"""

from __future__ import annotations

# Deterministic synthetic point derivation from the events table (the driver
# testdata has no geo columns; these are exact rational ops, identical in any
# IEEE-754 engine).
EVENT_LNG = "(CAST((event_id * 7919) % 360000 AS DOUBLE) / 1000.0 - 180.0)"
EVENT_LAT = "(CAST((event_id * 104729) % 170000 AS DOUBLE) / 1000.0 - 85.0)"


def tile_x_sql(lng: str, z: int) -> str:
    n = float(1 << z)
    return f"CAST(floor(({lng} + 180.0) / 360.0 * {n}) AS BIGINT)"


def tile_y_sql(lat: str, z: int) -> str:
    n = float(1 << z)
    return (
        f"CAST(floor((1.0 - ln(tan(radians({lat})) + 1.0/cos(radians({lat}))) / pi())"
        f" / 2.0 * {n}) AS BIGINT)"
    )


def world_x_sql(lng: str) -> str:
    return f"CAST(floor(({lng} + 180.0) / 360.0 * 4294967296.0) AS BIGINT)"


def world_y_sql(lat: str) -> str:
    c = f"greatest(least({lat}, 89.9), -89.9)"
    return (
        f"CAST(floor((1.0 - ln(tan(radians({c})) + 1.0/cos(radians({c}))) / pi())"
        f" / 2.0 * 4294967296.0) AS BIGINT)"
    )


def _mulwrap64_sql(a: str, c: int) -> str:
    """Wrapping 64-bit multiply of expression ``a`` (UBIGINT) by constant
    ``c``, as DuckDB SQL. DuckDB's UBIGINT ``*`` errors on overflow instead
    of wrapping, so the product is assembled in HUGEINT from the constant's
    32-bit halves (a*lo <= 2^96 and (a*hi mod 2^32)<<32 <= 2^64 both fit
    int128) and reduced mod 2^64."""
    hi, lo = c >> 32, c & 0xFFFFFFFF
    return (
        f"(CAST((CAST({a} AS HUGEINT) * {lo} + "
        f"((CAST({a} AS HUGEINT) * {hi}) % 4294967296) * 4294967296) "
        f"% 18446744073709551616 AS UBIGINT))"
    )


def fmix64_norm_sql(expr: str) -> str:
    """fmix64(expr) / 2^64 as DuckDB SQL — bit-exact vs the numpy kernel
    (kernels/hashes.py::fmix64; murmur3 finalizer, reference
    feature_drop.rs:42-115). Feeds the D1 point-thinning oracle: the keep
    decision is ``fmix64_norm < 0.4^(base_zoom - z)``, so with identical
    doubles on both sides the comparison is structural, not approximate."""
    h = f"CAST({expr} AS UBIGINT)"
    h = f"xor({h}, {h} >> 33)"
    h = _mulwrap64_sql(h, 0xFF51AFD7ED558CCD)
    h = f"xor({h}, {h} >> 33)"
    h = _mulwrap64_sql(h, 0xC4CEB9FE1A85EC53)
    h = f"xor({h}, {h} >> 33)"
    # engine normalizes by float(u64 max), which rounds to 2^64 — use the
    # same literal so the division is the same IEEE op
    return f"(CAST({h} AS DOUBLE) / 18446744073709551615.0)"


def zone_rect_sql(key: str) -> dict[str, str]:
    """Deterministic zone rectangles derived from an integer key (used to give
    the nation table a spatial footprint for PIP joins).

    Bounds sit 0.0005 deg off the events' millidegree lattice (EVENT_LNG/
    EVENT_LAT are exact multiples of 0.001), so no event can ever fall
    exactly ON a zone edge: the SQL's half-open [lng0, lng0+w) rule and the
    PIP kernel's ray-crossing edge rule then agree on every point, making
    the operator-backed Spark query and the SQL oracle structurally equal."""
    return {
        "lng0": f"(CAST(({key} * 37) % 300 AS DOUBLE) - 169.9995)",
        "lat0": f"(CAST(({key} * 23) % 130 AS DOUBLE) - 74.9995)",
        "lng_w": "24.0",
        "lat_h": "18.0",
    }


def zone_rect_values(key: int) -> tuple[float, float, float, float]:
    """The same zone rectangle as ``zone_rect_sql`` computed in Python —
    bit-identical doubles (int-exact cast, one IEEE subtraction), for
    building the polygon WKBs the PIP operator consumes."""
    lng0 = float((key * 37) % 300) - 169.9995
    lat0 = float((key * 23) % 130) - 74.9995
    return lng0, lat0, lng0 + 24.0, lat0 + 18.0
