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
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql entry points)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
