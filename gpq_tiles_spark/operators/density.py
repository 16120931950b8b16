"""Density dropper (D6) as a window operator.

Reference semantics (/root/reference/crates/core/src/feature_drop.rs:439-613):
per tile, grid = extent / cell_size; feature centroid -> cell; first
max_per_cell features kept in processing order (= feature_id order in the
sorted stream), rest dropped; no-op at z >= max_zoom. The reference's
production path does NOT invoke this (SURVEY.md §2.4); it is offered as a
standalone operator, expressed as the deterministic window
row_number() over (partition by tile_id, cell order by feature_id) <= N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def density_limit(records: DataFrame, centroid_px_x: str, centroid_px_y: str,
                  extent: int = 4096, cell_size: int = 16,
                  max_per_cell: int = 1, max_zoom: int = 14) -> DataFrame:
    """records must carry tile_id, z, feature_id and centroid pixel columns.

    Keeps all rows at z >= max_zoom (feature_drop.rs:530-536)."""
    cell_x = (F.col(centroid_px_x) / cell_size).cast("long")
    cell_y = (F.col(centroid_px_y) / cell_size).cast("long")
    w = Window.partitionBy("tile_id", cell_x, cell_y).orderBy("feature_id")
    rn_col = "__density_rn"
    return (
        records.withColumn(rn_col, F.row_number().over(w))
        .where((F.col("z") >= max_zoom) | (F.col(rn_col) <= max_per_cell))
        .drop(rn_col)
    )
