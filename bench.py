#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship operations at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` additionally runs the tiling pipeline at two parallelism levels
(local[4] vs local[16], both below hardware saturation) on the same input,
steady-state (after a warmup pass), and reports throughput at both plus
efficiency = (thr_hi / thr_lo) / (cores_hi / cores_lo) — the sandbox
substitution for the north rule's N->4N cluster criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as E

    out: dict[str, float] = {}
    qs = E.queries()
    for name in sorted(qs):
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()
        out[name] = round(time.perf_counter() - t0, 4)
        _ = n
    return out


def run_tiling(spark, sf_dir: str, max_zoom: int = 10) -> tuple[float, int, int]:
    """Full synthetic-geometry tiling pipeline; returns (sec, tiles, records)."""
    import __spark_entry__ as E
    from gpq_tiles_spark.config import TilerConfig
    from gpq_tiles_spark.pipeline import encode_tiles, fanout_records
    from pyspark.sql import functions as F

    from pyspark import StorageLevel

    E._register(spark, sf_dir)
    feats = E._event_features(spark)
    cfg = TilerConfig(min_zoom=0, max_zoom=max_zoom)
    t0 = time.perf_counter()
    # persist: the range-partition sampling job would otherwise re-execute
    # the whole fan-out (same rationale as pipeline.convert)
    records = fanout_records(feats, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    tiles = encode_tiles(records, cfg)
    agg = tiles.agg(
        F.count("*").alias("tiles"), F.sum("n_features").alias("records")
    ).collect()[0]
    dt = time.perf_counter() - t0
    records.unpersist()
    return dt, int(agg["tiles"]), int(agg["records"])


def _fresh_spark(cores: int):
    from gpq_tiles_spark.session import get_spark

    return get_spark(f"bench-{cores}", cores=cores, shuffle_partitions=max(cores, 8))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scaling = "--scaling" in sys.argv

    spark = _fresh_spark(cpus)
    t_start = time.perf_counter()
    queries = run_queries(spark, sf_dir)
    tiling_sec, n_tiles, n_records = run_tiling(spark, sf_dir)
    queries["tiling_pyramid_z10"] = round(tiling_sec, 4)
    total = time.perf_counter() - t_start
    tiles_per_sec = n_tiles / tiling_sec if tiling_sec > 0 else 0.0

    result = {
        "metric": "bench_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": _sf_from_dir(sf_dir),
        "tiles": n_tiles,
        "tile_records": n_records,
        "tiles_per_sec": round(tiles_per_sec, 2),
    }
    spark.stop()

    if scaling:
        result["scaling"] = run_scaling()
    if "--adm4" in sys.argv:
        result["adm4_anchor"] = run_adm4_anchor(cpus)

    print(json.dumps(result))


def run_adm4_anchor(cores: int = 32) -> dict:
    """Like-for-like run against the reference's published anchor: 363,783
    small polygons in a Netherlands-sized box -> z0-14 PMTiles archive
    (context/ARCHITECTURE.md:74-80: ~3 min single-node for ADM4). Full
    convert() incl. driver-side archive assembly."""
    import numpy as np
    import pandas as pd

    from gpq_tiles_spark.config import TilerConfig
    from gpq_tiles_spark.extract import FEATURES_SCHEMA
    from gpq_tiles_spark.kernels import geom as G
    from gpq_tiles_spark.pipeline import convert_sharded

    spark = _fresh_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    n = 363_783
    base = spark.range(n).repartition(4 * cores)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(ids[0] if len(ids) else 0)
            cx = 3.3 + rng.uniform(0, 3.5, len(ids))
            cy = 50.7 + rng.uniform(0, 3.0, len(ids))
            w = rng.uniform(0.001, 0.02, len(ids))
            h = rng.uniform(0.001, 0.02, len(ids))
            out = {k: [] for k in (
                "feature_id", "doc_id", "span_offset", "wkb", "geom_type",
                "lng_min", "lat_min", "lng_max", "lat_max")}
            for i in range(len(ids)):
                x0, y0 = cx[i] - w[i], cy[i] - h[i]
                x1, y1 = cx[i] + w[i], cy[i] + h[i]
                ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
                out["feature_id"].append(int(ids[i]))
                out["doc_id"].append(str(ids[i]))
                out["span_offset"].append(0)
                out["wkb"].append(G.to_wkb((G.POLYGON, [ring])))
                out["geom_type"].append(G.POLYGON)
                out["lng_min"].append(x0)
                out["lat_min"].append(y0)
                out["lng_max"].append(x1)
                out["lat_max"].append(y1)
            yield pd.DataFrame(out)

    feats = base.mapInPandas(gen, schema=FEATURES_SCHEMA)
    cfg = TilerConfig(min_zoom=0, max_zoom=14, shuffle_partitions=4 * cores)
    t0 = time.perf_counter()
    # sharded sink: executor-parallel blob compression, byte-identical
    # archive (tests/test_pipeline_e2e.py::test_convert_sharded_byte_identical)
    stats = convert_sharded(feats, "/tmp/gpq_bench/adm4_like.pmtiles", cfg)
    dt = time.perf_counter() - t0
    spark.stop()
    return {
        "workload": "363,783 small polygons (NL-sized box) -> z0-14 pmtiles",
        "sec": round(dt, 1),
        "features_per_sec": round(363_783 / dt, 1),
        "tiles": stats["tiles"],
        "reference_anchor_sec": 180,
    }


def _scaling_fixture(n_docs: int = 100_000) -> str:
    """Deterministic interleaved-document fixture for the scaling runs
    (seed 42, cached)."""
    path = f"/tmp/gpq_bench/documents_{n_docs}.parquet"
    if not os.path.exists(path):
        os.makedirs("/tmp/gpq_bench", exist_ok=True)
        from gpq_tiles_spark.fixtures import write_fixture

        write_fixture(path, n_docs=n_docs, seed=42, rows_per_group=5000)
    return path


def run_scaling(max_zoom: int = 12) -> dict:
    """The north-rule N->4N criterion, sandbox substitution (BASELINE.md):
    the identical interleaved-document tiling job (extract -> fan-out ->
    range shuffle -> MVT encode) at local[2] vs local[8], throughput at
    both + efficiency = (thr_hi / thr_lo) / (8 / 2).

    Pairing rationale (measured, see BENCH.md): every Spark task thread is
    paired with a Python (Arrow UDF) worker, so local[K] keeps 2K processes
    busy. On this 32-core host local[2]/local[8] leave both levels well
    below saturation (4 and 16 busy processes) — the faithful proxy for
    N->4N executor counts on a real cluster where each executor owns its
    cores. local[16] (32 busy + JVM shuffle/GC threads) crosses host
    saturation and measures the box, not the engine; its number is reported
    in BENCH.md for full disclosure."""
    from pyspark.sql import functions as F

    from gpq_tiles_spark.config import TilerConfig
    from gpq_tiles_spark.extract import extract_features
    from gpq_tiles_spark.pipeline import encode_tiles, fanout_records

    docs_path = _scaling_fixture()
    eff = {}
    for cores in (2, 8):
        spark = _fresh_spark(cores)
        docs = spark.read.parquet(docs_path).repartition(8 * cores)
        cfg = TilerConfig(min_zoom=0, max_zoom=max_zoom,
                          shuffle_partitions=2 * cores)
        # warmup pass (z0-6): spawns python workers, JITs the JVM, warms the
        # page cache — at 10^12-doc scale startup amortizes to zero, so the
        # steady-state measurement is the faithful proxy for the N->4N rule
        from pyspark import StorageLevel

        wcfg = TilerConfig(min_zoom=0, max_zoom=6, shuffle_partitions=2 * cores)
        encode_tiles(fanout_records(extract_features(docs), wcfg), wcfg).agg(
            F.count("*")
        ).collect()
        t0 = time.perf_counter()
        records = fanout_records(extract_features(docs), cfg).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        tiles = encode_tiles(records, cfg)
        agg = tiles.agg(F.count("*"), F.sum("n_features")).collect()[0]
        dt = time.perf_counter() - t0
        records.unpersist()
        eff[cores] = {
            "sec": round(dt, 2),
            "tiles": int(agg[0]),
            "records": int(agg[1]),
            "tiles_per_sec": round(int(agg[0]) / dt, 2),
            "records_per_sec": round(int(agg[1]) / dt, 2),
        }
        spark.stop()
    thr_lo = eff[2]["records_per_sec"]
    thr_hi = eff[8]["records_per_sec"]
    return {
        "workload": f"interleaved-docs 100k, z0-{max_zoom} pyramid, steady-state",
        "local2": eff[2],
        "local8": eff[8],
        "efficiency": round((thr_hi / thr_lo) / (8 / 2), 4) if thr_lo else None,
        "note": "N->4N pairing below hardware saturation: each Spark task "
                "thread pairs with a Python (Arrow) worker, so local[K] "
                "keeps 2K processes busy; 2->8 keeps both levels under the "
                "32 hardware cores, matching real multi-executor clusters "
                "where each executor owns its cores. Saturated pairings "
                "disclosed in BENCH.md.",
    }


if __name__ == "__main__":
    main()
