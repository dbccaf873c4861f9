"""Engine-portable rounding.

``round(double, d)`` is NOT portable between engines: Spark rounds the
shortest decimal representation half-up (BigDecimal.valueOf), DuckDB rounds
the scaled binary double — so a running sum of cent values like 65764.165
rounds to .17 on Spark and .16 on DuckDB. Any query whose output is
hash-compared across engines must therefore round via the identical IEEE-754
expression on both sides:

    floor(x * 10^d + 0.5) / 10^d

Every op (multiply, add, floor, divide) is exact-deterministic IEEE double
arithmetic, so both engines produce bit-identical results — which is what
the driver's value-hash comparison needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column, d: int) -> Column:
    """Portable round-half-up of a double column to ``d`` decimals."""
    scale = float(10**d)
    return (F.floor(col * scale + F.lit(0.5)).cast("double") / scale).alias(
        f"pround_{d}"
    )


def R(expr: str, d: int) -> str:
    """SQL fragment computing exactly :func:`pround` — portable to BOTH
    DuckDB and Spark SQL. Scale literals are written in scientific
    notation (``1e2``): both dialects parse those as DOUBLE, whereas
    ``100.0`` parses as DECIMAL in Spark SQL and would drag the whole
    expression into decimal arithmetic."""
    return f"(floor(({expr}) * 1e{d} + 5e-1) / 1e{d})"
