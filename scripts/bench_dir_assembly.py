#!/usr/bin/env python
"""Directory-assembly scale bench (round-3 review item 6; round-5 leaf
writer evidence).

Synthesizes N directory entries (default 10^7) as a distributed DataFrame,
runs the executor-chunked run-coalesce + streamed driver assembly
(DirectoryBuilder), and reports wall time plus driver max-RSS
before/after — the driver never materializes the entry list or the full
directory bytes: past ROOT_MAX_ENTRIES coalesced entries, compressed leaf
directories spill to a temp file as they fill and only O(#leaves) root
entries stay in memory.

    python scripts/bench_dir_assembly.py [N] [--parity]

--parity additionally builds the same directory single-threaded via
build_directories and asserts root/leaf byte equality (use N <= 2*10^6;
the scalar entry-list construction is the slow part).
"""

from __future__ import annotations

import json
import os
import resource
import sys
import tempfile
import time


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10_000_000
    parity = "--parity" in sys.argv

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from gpq_tiles_spark.pipeline import _assemble_directory_stream
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
    with tempfile.TemporaryFile() as spill:
        root_raw, n_coalesced, leaf_len = _assemble_directory_stream(ent, spill)
        t_assemble = time.perf_counter() - t0
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024

        out = {
            "entries": n,
            "coalesced_entries": n_coalesced,
            "root_bytes": len(root_raw),
            "leaf_section_bytes": leaf_len,
            "assemble_sec": round(t_assemble, 2),
            "driver_rss_before_mb": rss0,
            "driver_rss_after_mb": rss1,
            "driver_rss_delta_mb": rss1 - rss0,
        }
        if parity:
            from gpq_tiles_spark.kernels.pmtiles import (
                DirEntry, build_directories, coalesce_run_lengths)

            rows = ent.collect()
            rows.sort(key=lambda r: r.tile_id)
            want_root, want_leaf, want_n = build_directories(
                coalesce_run_lengths(
                    [DirEntry(r.tile_id, r.off, r.len, 1) for r in rows]))
            spill.seek(0)
            got_leaf = spill.read()
            out["parity"] = (
                root_raw == want_root and got_leaf == want_leaf
                and n_coalesced == want_n
            )
            assert out["parity"], "distributed directory differs from scalar"
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
