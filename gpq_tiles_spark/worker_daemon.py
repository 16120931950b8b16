"""PySpark worker daemon that pre-imports the heavy stack before forking.

Every Python worker pays a ~0.5 s import of numpy/pandas/pyarrow (plus
this package's kernels) the first time it unpickles one of our Arrow
UDFs. With 32 cores that is ~16 CPU-seconds of import storms smeared
across the first wide stage of every operator family. The standard
pyspark daemon forks workers from a process that has imported none of
it; this drop-in daemon (``spark.python.daemon.module``) imports the
stack ONCE in the daemon process, so every forked worker inherits warm
modules through copy-on-write — guide §4.5 taken one level up: heavy
init once per EXECUTOR, not once per worker.

Imports are best-effort: a missing optional module must never take down
the daemon (that would break every Python stage), so failures fall back
to the normal lazy import inside the worker.
"""

from __future__ import annotations

import importlib

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    "pyspark.serializers",
    "pyspark.sql.pandas.serializers",
    "gpq_tiles_spark.kernels.tile_math",
    "gpq_tiles_spark.kernels.geom",
    "gpq_tiles_spark.kernels.clip",
    "gpq_tiles_spark.kernels.simplify",
    "gpq_tiles_spark.kernels.drop",
    "gpq_tiles_spark.kernels.hashes",
    "gpq_tiles_spark.kernels.hilbert",
    "gpq_tiles_spark.kernels.mvt",
    "gpq_tiles_spark.kernels.mvt_fast",
    "gpq_tiles_spark.kernels.pmtiles",
    "gpq_tiles_spark.pipeline",
    "gpq_tiles_spark.operators.cells",
):
    try:  # pragma: no cover - import side effects only
        importlib.import_module(_mod)
    except Exception:
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
