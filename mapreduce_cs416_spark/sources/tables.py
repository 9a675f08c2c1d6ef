"""Parquet table loaders for the driver testdata.

The reference's only source is a whole-text-file scan
(mr/worker.go:89-95, one file = one map split, README.md:111); our
engine generalizes to columnar parquet scans where Catalyst gives
predicate pushdown, column pruning, and partition pruning for free.
See ``text_corpus`` for the faithful whole-file analog.

At 100 TB each table would be a partitioned parquet dataset (e.g.
lineitem partitioned by ship month); ``load_table`` reads a directory
or single file transparently via ``spark.read.parquet``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# every table the driver materializes (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return utcify(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def utcify(df: DataFrame) -> DataFrame:
    """Normalize every TIMESTAMP_NTZ column to TIMESTAMP (LTZ).

    Parquet timestamps written without UTC adjustment (arrow
    ``timestamp[us]`` with no tz — how the driver testdata stores
    o_orderdate / l_shipdate / ts) load as TIMESTAMP_NTZ, a type some
    instant functions (``unix_micros``) reject. The engine's session
    timezone is pinned to UTC (session.py), so casting NTZ → LTZ
    reinterprets the naive wall clock as UTC — value-identical to the
    DuckDB oracle's naive TIMESTAMP view of the same file, and to the
    LTZ micros the pre-regeneration testdata produced."""
    ntz = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historically events.parquet stored ts as INT64 TIMESTAMP(NANOS),
    which Spark rejects by default (PARQUET_TYPE_ILLEGAL): read it as a
    long via the legacy conf and convert back to a µs timestamp with
    exact integer division (`ts div 1000` stays in long arithmetic — a
    double division would lose precision above 2^53 ns). Regenerated
    testdata stores µs without UTC adjustment instead, which loads as
    TIMESTAMP_NTZ and is normalized by ``utcify``. Both paths match
    DuckDB's µs-truncated naive TIMESTAMP view of the same file, so
    the oracle comparison is exact either way."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return utcify(df)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql entry points)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
