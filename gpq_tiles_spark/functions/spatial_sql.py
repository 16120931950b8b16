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


def zone_rect_sql(key: str) -> dict[str, str]:
    """Deterministic zone rectangles derived from an integer key (used to give
    the nation table a spatial footprint for PIP joins)."""
    return {
        "lng0": f"(CAST(({key} * 37) % 300 AS DOUBLE) - 170.0)",
        "lat0": f"(CAST(({key} * 23) % 130 AS DOUBLE) - 75.0)",
        "lng_w": "24.0",
        "lat_h": "18.0",
    }
