#!/usr/bin/env python
"""Shuffle-bytes evidence for the map-side property filter (round 6).

The premerge-props layout applies the -y/-x/-X property filter once per
SOURCE FEATURE before tile replication (pipeline.py::make_fanout_encoded_props),
so excluded tag bytes never cross the shuffle multiplied by the pyramid
fan-out. This script measures that claim directly: the same corpus with a
deliberately fat excluded tag must shuffle ~the bytes of a corpus that never
had the tag, not the bytes of one carrying it.

Three runs over the 100k interleaved-docs fixture (z0-10 premerge-props):
  full    props = {blob(~180B), rank}  written unfiltered
  exclude props = {blob, rank}, exclude_properties=["blob"]
  base    props = {rank} only (the floor: blob never encoded)

Prints one JSON line with per-run total shuffle WRITE bytes (from the Spark
event log, SparkListenerTaskEnd -> Shuffle Write Metrics) and wall time.
"""

from __future__ import annotations

import json
import os
import shutil
import time


def _shuffle_write_bytes(evdir: str) -> int:
    # Spark 4 writes rolling event-log DIRECTORIES (eventlog_v2_<app>/
    # events_1_... files); walk everything textual under evdir
    total = 0
    for root, _dirs, files in os.walk(evdir):
        for fn in files:
            if fn.startswith("appstatus_"):
                continue
            path = os.path.join(root, fn)
            with open(path, encoding="utf-8") as f:
                for line in f:
                    if '"SparkListenerTaskEnd"' not in line:
                        continue
                    ev = json.loads(line)
                    m = (ev.get("Task Metrics") or {}).get(
                        "Shuffle Write Metrics") or {}
                    total += int(m.get("Shuffle Bytes Written", 0))
    return total


def _run(mode: str, docs_path: str, evroot: str) -> dict:
    evdir = os.path.join(evroot, mode)
    shutil.rmtree(evdir, ignore_errors=True)
    os.environ["SPARK_GRAFT_EVENTLOG"] = evdir

    from pyspark.sql import functions as F

    from gpq_tiles_spark.config import TilerConfig
    from gpq_tiles_spark.extract import extract_features
    from gpq_tiles_spark.pipeline import (
        encode_props_column,
        encode_tiles_premerge_props,
    )
    from gpq_tiles_spark.session import get_spark

    spark = get_spark(f"props-shuffle-{mode}", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        feats = extract_features(spark.read.parquet(docs_path))
        cols = ["rank"] if mode == "base" else ["blob", "rank"]
        feats = feats.withColumn(
            "rank", (F.col("feature_id") % 1000).cast("long"))
        if mode != "base":
            # ~180-byte tag: the fat payload whose shuffle cost the
            # map-side filter is supposed to eliminate under -X
            feats = feats.withColumn(
                "blob",
                F.concat(F.lit("payload-" * 20), F.col("feature_id").cast("string")))
        featp = encode_props_column(feats, cols)
        cfg = TilerConfig(
            min_zoom=0, max_zoom=10, write_properties=True,
            shuffle_partitions=16,
            exclude_properties=["blob"] if mode == "exclude" else None,
        )
        t0 = time.perf_counter()
        tiles = encode_tiles_premerge_props(featp, cfg)
        agg = tiles.agg(F.count("*"), F.sum("n_features"),
                        F.sum(F.length("mvt"))).collect()[0]
        dt = time.perf_counter() - t0
    finally:
        spark.stop()
        os.environ.pop("SPARK_GRAFT_EVENTLOG", None)
    return {
        "sec": round(dt, 2),
        "tiles": int(agg[0]),
        "records": int(agg[1]),
        "mvt_bytes": int(agg[2]),
        "shuffle_write_bytes": _shuffle_write_bytes(evdir),
    }


def main() -> None:
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    docs_path = bench._scaling_fixture()
    evroot = "/tmp/gpq_bench/props_shuffle_ev"
    out = {"host_start": bench._host_snapshot()}
    for mode in ("full", "exclude", "base"):
        out[mode] = _run(mode, docs_path, evroot)
    filt, base, full = (out["exclude"]["shuffle_write_bytes"],
                        out["base"]["shuffle_write_bytes"],
                        out["full"]["shuffle_write_bytes"])
    out["excluded_tag_shuffle_overhead"] = round((filt - base) / base, 4)
    out["full_vs_base_overhead"] = round((full - base) / base, 4)
    out["host_end"] = bench._host_snapshot()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
