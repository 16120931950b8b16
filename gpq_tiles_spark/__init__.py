"""gpq-tiles-spark: PySpark-native spatial tiling + join engine.

A from-scratch Spark reimplementation of the capabilities of
geoparquet-io/gpq-tiles (reference at /root/reference, read-only),
expressed as DataFrame algebra + vectorized numpy/pandas kernels.
See SURVEY.md for the full structural analysis.
"""

__version__ = "0.1.0"
