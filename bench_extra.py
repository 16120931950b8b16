#!/usr/bin/env python
"""Per-query isolation harness for optimization work (guide §1).

NOT the driver's bench — bench.py stays frozen. This file exists so a
single query can be timed repeatedly on a quiet host, with the same
methodology as bench.py (build DataFrame + .count(), after the same
warmup), plus optional plan capture.

Usage:
  python bench_extra.py [-n REPS] [--plans DIR] [query ...]
With no query names, runs all. Prints one JSON line:
  {"queries": {name: [sec, ...]}, "host_start": ..., "host_end": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = sys.argv[1:]
    reps = 3
    plans_dir = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "-n":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--plans":
            plans_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    import bench
    import __spark_entry__ as E

    host_start = bench._host_snapshot()
    spark = bench._fresh_spark(cpus)
    qs = E.queries()
    bench._warmup(spark, sf_dir)
    if not names:
        names = sorted(qs) + ["tiling_pyramid_z10"]

    out: dict[str, list[float]] = {}
    for name in names:
        samples = []
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"{name}#{rep}")
            t0 = time.perf_counter()
            if name == "tiling_pyramid_z10":
                dt, _, _ = bench.run_tiling(spark, sf_dir)
                samples.append(round(dt, 4))
                continue
            df = qs[name](spark, sf_dir)
            df.count()
            samples.append(round(time.perf_counter() - t0, 4))
            if plans_dir and rep == 0:
                os.makedirs(plans_dir, exist_ok=True)
                with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription(None)
        out[name] = samples

    print(json.dumps({
        "queries": out,
        "sf": bench._sf_from_dir(sf_dir),
        "host_start": host_start,
        "host_end": bench._host_snapshot(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
