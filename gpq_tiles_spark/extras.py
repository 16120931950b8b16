"""Optional-dependency registry.

The engine gates three capabilities behind import-try (the libs are not in
the harness container): zstd / brotli tile compression
(kernels/pmtiles.py::compress, PMTiles codecs 4 and 3) and real H3 cells
(operators/cells.py). Installing the matching extra activates each with
ZERO code change — the gated branch finds the lib at import time, whether
the package is on sys.path directly or inside the spark-submit --py-files
zip (zipimport resolves the probe the same way).

    pip install 'gpq-tiles-spark[zstd]'     # codec 4
    pip install 'gpq-tiles-spark[brotli]'   # codec 3
    pip install 'gpq-tiles-spark[h3]'       # real H3 cell scheme
"""

from __future__ import annotations

import importlib

#: extra name -> pip/import module that unlocks it
EXTRAS: dict[str, str] = {
    "zstd": "zstandard",
    "brotli": "brotli",
    "h3": "h3",
}


def available() -> dict[str, bool]:
    """Which optional capabilities are active in THIS environment.

    zstd is special: the codec also activates WITHOUT any package when a
    system libzstd is loadable (kernels/zstd_ctypes.py), so it reports
    active if either backend exists."""
    out = {}
    for name, mod in EXTRAS.items():
        try:
            importlib.import_module(mod)
            out[name] = True
        except ImportError:
            out[name] = False
    if not out["zstd"]:
        from .kernels import zstd_ctypes

        out["zstd"] = zstd_ctypes.available()
    return out
