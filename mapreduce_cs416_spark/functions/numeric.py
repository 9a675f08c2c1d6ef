"""Numeric helpers shared by the query surface.

``decimal_sum`` is the engine-wide rule for aggregating doubles:
cast each (deterministic, per-row) double to DECIMAL(25,6), sum
exactly (order-independent), and cast the result back to double.
Partial aggregation / shuffle order then cannot perturb results, and
the DuckDB oracle (`CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)`)
produces the identical double — required for the driver's exact
value-hash comparison. DECIMAL(25,6) holds ±1e19 with 6 fractional
digits; Spark widens the sum to DECIMAL(35,6), ample at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def decimal_sum(expr: Column, alias: str | None = None) -> Column:
    c = F.sum(expr.cast(DEC)).cast("double")
    return c.alias(alias) if alias else c


def sql_decimal_sum(expr_sql: str) -> str:
    """The DuckDB-side twin of ``decimal_sum``."""
    return f"CAST(SUM(CAST({expr_sql} AS DECIMAL(25,6))) AS DOUBLE)"
