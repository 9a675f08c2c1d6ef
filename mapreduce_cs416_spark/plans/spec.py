"""QuerySpec — one named query of the engine's correctness surface.

Each spec pairs an idiomatic-Spark DataFrame builder with the
equivalent ANSI SQL the DuckDB oracle runs on the same parquet
tables (driver contract in ``__spark_entry__.py``). ``oracle=None``
marks ops whose semantics depend on engine hash functions /
sampling and are genuinely not SQL-portable; the driver records a
weaker rows-only check for those and pytest covers them with
property tests instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    headline: bool = False  # included in bench.py's timed set
    tags: tuple[str, ...] = field(default_factory=tuple)
