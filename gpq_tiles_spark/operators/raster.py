"""Raster <-> vector tile rendering.

[north-star extension — cite: BASELINE.json "raster-to-vector tile
rendering"]. Two operators:

* ``rasterize_points``: per-tile point-density grid (numpy 2D histogram per
  tile group — one histogram call per tile, vectorized over its points).
* ``vectorize_density``: marching-squares-free contouring: threshold the
  grid, extract connected-cell rectangles as polygons (tile-local pixel
  space), emit as MVT-ready polygon features. This is the "raster ->
  vector" direction; the rasterize step is "vector -> raster".
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..kernels import geom as G
from ..kernels import mvt as M
from ..kernels import tile_math as T

GRID_SCHEMA = StructType(
    [
        StructField("tile_id", LongType()),
        StructField("z", IntegerType()),
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("grid", ArrayType(LongType())),  # row-major counts
        StructField("grid_size", IntegerType()),
    ]
)

VECTOR_SCHEMA = StructType(
    [
        StructField("tile_id", LongType()),
        StructField("z", IntegerType()),
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("n_polygons", IntegerType()),
        StructField("mvt", BinaryType()),
    ]
)


def rasterize_points(records: DataFrame, zoom: int, grid_size: int = 64) -> DataFrame:
    """Point records (tile_id, z, x, y, wkb) at one zoom -> per-tile density
    grids. Expects tile_id-sorted input (reuses the pipeline's range
    shuffle); consecutive-run grouping like the MVT encoder."""
    from ..kernels.hilbert import _base_id

    lo = _base_id(zoom) + 1 if zoom > 0 else 0
    hi = _base_id(zoom) + 4**zoom if zoom > 0 else 0
    pts = records.where(F.col("tile_id").between(lo, hi))
    shuffled = pts.repartitionByRange("tile_id").sortWithinPartitions("tile_id")

    def grids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hold: pd.DataFrame | None = None
        for pdf in batches:
            if hold is not None:
                pdf = pd.concat([hold, pdf], ignore_index=True)
                hold = None
            tids = pdf["tile_id"].to_numpy()
            cut = int(np.searchsorted(tids, tids[-1], side="left"))
            hold = pdf.iloc[cut:]
            body = pdf.iloc[:cut]
            if len(body):
                yield _grid_chunk(body, grid_size)
        if hold is not None and len(hold):
            yield _grid_chunk(hold, grid_size)

    return shuffled.mapInPandas(grids, schema=GRID_SCHEMA)


def _grid_chunk(pdf: pd.DataFrame, grid_size: int) -> pd.DataFrame:
    from ..kernels.hilbert import tile_id_to_zxy_vec

    tid = pdf["tile_id"].to_numpy()
    starts = np.flatnonzero(np.concatenate(([True], tid[1:] != tid[:-1])))
    ends = np.append(starts[1:], len(tid))
    g_z, g_x, g_y = tile_id_to_zxy_vec(tid[starts])
    rows = {k: [] for k in ("tile_id", "z", "x", "y", "grid", "grid_size")}
    for gi, (s, e) in enumerate(zip(starts, ends)):
        z = int(g_z[gi])
        xx = int(g_x[gi])
        yy = int(g_y[gi])
        lng0, lat0, lng1, lat1 = (
            float(v[0]) for v in T.tile_bounds(np.array([xx]), np.array([yy]), z)
        )
        px, py = [], []
        for wkb in pdf["wkb"].iloc[s:e]:
            g = G.from_wkb(bytes(wkb))
            if g[0] != G.POINT:
                continue
            px.append(g[1][0])
            py.append(g[1][1])
        gx = np.clip(((np.array(px) - lng0) / (lng1 - lng0) * grid_size), 0, grid_size - 1e-9)
        gy = np.clip(((1.0 - (np.array(py) - lat0) / (lat1 - lat0)) * grid_size), 0, grid_size - 1e-9)
        hist = np.zeros((grid_size, grid_size), dtype=np.int64)
        np.add.at(hist, (gy.astype(np.int64), gx.astype(np.int64)), 1)
        rows["tile_id"].append(int(tid[s]))
        rows["z"].append(z)
        rows["x"].append(xx)
        rows["y"].append(yy)
        rows["grid"].append(hist.reshape(-1).tolist())
        rows["grid_size"].append(grid_size)
    return pd.DataFrame(rows)


def _connected_rects(mask: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Greedy maximal-rectangle decomposition of a boolean grid (simple
    row-run merge): returns (x0, y0, x1, y1) cell rects covering the mask."""
    m = mask.copy()
    rects = []
    h, w = m.shape
    for yy in range(h):
        xx = 0
        while xx < w:
            if not m[yy, xx]:
                xx += 1
                continue
            x1 = xx
            while x1 + 1 < w and m[yy, x1 + 1]:
                x1 += 1
            y1 = yy
            while y1 + 1 < h and m[y1 + 1, xx : x1 + 1].all():
                y1 += 1
            m[yy : y1 + 1, xx : x1 + 1] = False
            rects.append((xx, yy, x1 + 1, y1 + 1))
            xx = x1 + 1
    return rects


def vectorize_density(grids: DataFrame, threshold: int = 1,
                      layer_name: str = "density", extent: int = 4096) -> DataFrame:
    """Density grids -> polygonized MVT tiles (cells >= threshold)."""

    def vectorize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("tile_id", "z", "x", "y", "n_polygons", "mvt")}
            for _, r in pdf.iterrows():
                gs = int(r["grid_size"])
                grid = np.array(r["grid"], dtype=np.int64).reshape(gs, gs)
                rects = _connected_rects(grid >= threshold)
                lng0, lat0, lng1, lat1 = (
                    float(v[0])
                    for v in T.tile_bounds(np.array([r["x"]]), np.array([r["y"]]), int(r["z"]))
                )
                lb = M.LayerBuilder(layer_name, extent)
                scale_x = (lng1 - lng0) / gs
                scale_y = (lat1 - lat0) / gs
                for i, (cx0, cy0, cx1, cy1) in enumerate(rects):
                    # cell coords (y down) -> geographic ring (y up)
                    gx0 = lng0 + cx0 * scale_x
                    gx1 = lng0 + cx1 * scale_x
                    gy1 = lat1 - cy0 * scale_y
                    gy0 = lat1 - cy1 * scale_y
                    ring = np.array(
                        [[gx0, gy0], [gx1, gy0], [gx1, gy1], [gx0, gy1], [gx0, gy0]]
                    )
                    lb.add_feature(i, (G.POLYGON, [ring]), [], lng0, lat0, lng1, lat1)
                rows["tile_id"].append(int(r["tile_id"]))
                rows["z"].append(int(r["z"]))
                rows["x"].append(int(r["x"]))
                rows["y"].append(int(r["y"]))
                rows["n_polygons"].append(len(rects))
                rows["mvt"].append(M.encode_tile([lb.build()]))
            yield pd.DataFrame(rows)

    return grids.mapInPandas(vectorize, schema=VECTOR_SCHEMA)
