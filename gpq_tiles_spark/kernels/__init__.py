"""Pure-numpy kernel library (no Spark dependency) — the bit-for-bit core."""
