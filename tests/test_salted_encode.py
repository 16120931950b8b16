"""Salted two-phase encode must be byte-identical to the single-phase path."""

import numpy as np
import pytest

from gpq_tiles_spark.config import TilerConfig
from gpq_tiles_spark.extract import extract_features
from gpq_tiles_spark.kernels import simplify as SK
from gpq_tiles_spark.pipeline import (
    detect_hot_tiles,
    encode_tiles,
    encode_tiles_salted,
    fanout_records,
)


def test_salted_matches_single_phase(spark, docs_table):
    feats = extract_features(spark.read.parquet(docs_table))
    cfg = TilerConfig(min_zoom=0, max_zoom=7, shuffle_partitions=8,
                      hot_tile_threshold=5, salt_buckets=4)  # force salting
    records = fanout_records(feats, cfg).cache()

    hot = detect_hot_tiles(feats, cfg)
    assert hot, "low threshold must flag hot tiles"

    plain = {r.tile_id: (bytes(r.mvt), r.n_features)
             for r in encode_tiles(records, cfg).collect()}
    salted = {r.tile_id: (bytes(r.mvt), r.n_features)
              for r in encode_tiles_salted(records, cfg, hot_tile_ids=hot).collect()}

    assert set(plain) == set(salted)
    diff = [t for t in plain if plain[t] != salted[t]]
    assert diff == [], f"byte mismatch for tiles {diff[:5]}"
    records.unpersist()


def test_simplify_in_tile_coords():
    import numpy as np

    from gpq_tiles_spark.kernels import geom as G

    # a wiggle smaller than 1px at this tile size disappears; larger survives
    bounds = (0.0, 0.0, 10.0, 10.0)
    px_deg = 10.0 / 4096  # one pixel in degrees
    line = np.array(
        [[1.0, 1.0], [2.0, 1.0 + 0.4 * px_deg], [3.0, 1.0],
         [4.0, 1.0 + 50 * px_deg], [5.0, 1.0]]
    )
    out = SK.simplify_in_tile_coords((G.LINESTRING, line), *bounds, 4096, 1.0)
    assert len(out[1]) == 4  # tiny wiggle gone, big one kept
    np.testing.assert_allclose(out[1][0], [1.0, 1.0], atol=1e-12)
    np.testing.assert_allclose(out[1][-1], [5.0, 1.0], atol=1e-12)
