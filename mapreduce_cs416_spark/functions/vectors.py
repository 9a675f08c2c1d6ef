"""Vector math over ``array<float>`` embedding columns.

All pure built-ins (``zip_with`` / ``aggregate``) so the math runs
JVM-side. The folds are *sequential left folds* starting at 0.0 —
this makes the float math bit-for-bit reproducible and lets the DuckDB
oracle (``list_reduce`` with a prepended 0.0) produce identical
doubles, which the driver's value-hash comparison requires.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    """Cast array<float> → array<double> (exact, element-wise)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_fold(a: str, b: str) -> Column:
    """Dot product of two array<double> columns (by name), sequential fold."""
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")


def l2_norm(a: str) -> Column:
    """L2 norm of an array<double> column (by name), sequential fold."""
    return F.sqrt(F.expr(f"aggregate(transform({a}, x -> x * x), 0D, (acc, x) -> acc + x)"))


def cosine_sim(dot: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot / (norm_a * norm_b)
