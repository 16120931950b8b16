#!/usr/bin/env python
"""Directory-assembly scale bench (round-3 review item 6 'done' evidence).

Synthesizes N directory entries (default 10^7) as a distributed DataFrame,
runs the executor-chunked varint encode + O(chunks) driver stitch, and
reports wall time plus driver max-RSS before/after — demonstrating the
driver no longer materializes the entry list (flat RSS at 10^7 entries,
where the old collect() path held ~10^7 Row objects).

    python scripts/bench_dir_assembly.py [N] [--parity]

--parity additionally builds the same directory single-threaded via
encode_directory and asserts byte equality (use N <= 2*10^6; the scalar
path is the slow part).
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10_000_000
    parity = "--parity" in sys.argv

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from gpq_tiles_spark.pipeline import (
        DIR_CHUNK_SCHEMA, _assemble_directory_from_chunks, _make_dir_chunk_encoder)
    from gpq_tiles_spark.session import get_spark

    spark = get_spark("dir-assembly-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # synthetic entries: clustered tile ids, blocky blob reuse (runs + dups)
    ent = spark.range(n).select(
        (F.col("id") * 3 / 2).cast("long").alias("tile_id"),
        ((F.col("id") / 53).cast("long") * 417).alias("off"),
        F.lit(417).cast("long").alias("len"),
    ).repartitionByRange(256, "tile_id").sortWithinPartitions("tile_id")

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024  # MiB
    t0 = time.perf_counter()
    chunk_rows = ent.withColumn("cpid", F.spark_partition_id()).mapInPandas(
        _make_dir_chunk_encoder(), schema=DIR_CHUNK_SCHEMA).collect()
    t_chunks = time.perf_counter() - t0
    t1 = time.perf_counter()
    dir_bytes, n_coalesced = _assemble_directory_from_chunks(chunk_rows)
    t_stitch = time.perf_counter() - t1
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024

    out = {
        "entries": n,
        "coalesced_entries": n_coalesced,
        "chunks": len(chunk_rows),
        "dir_bytes": len(dir_bytes),
        "chunk_encode_sec": round(t_chunks, 2),
        "driver_stitch_sec": round(t_stitch, 3),
        "driver_rss_before_mb": rss0,
        "driver_rss_after_mb": rss1,
        "driver_rss_delta_mb": rss1 - rss0,
    }
    if parity:
        from gpq_tiles_spark.kernels.pmtiles import (
            DirEntry, coalesce_run_lengths, encode_directory)

        rows = ent.collect()
        rows.sort(key=lambda r: r.tile_id)
        want = encode_directory(coalesce_run_lengths(
            [DirEntry(r.tile_id, r.off, r.len, 1) for r in rows]))
        out["parity"] = dir_bytes == want
        assert out["parity"], "distributed directory differs from scalar"
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
