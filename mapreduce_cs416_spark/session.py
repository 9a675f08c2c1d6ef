"""SparkSession factory.

One place to encode the engine's execution-model choices so every
entry point (tests, bench, driver contract) runs with the same plan
environment:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting)
  — subsumes the reference's fixed ``nReduce=10``
  (main/mrcoordinator.go:23) with runtime re-planning.
- ``spark.sql.shuffle.partitions`` sized to the local core count; on
  a real cluster AQE coalesces upward/downward from this hint.
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- Arrow enabled so the few Pandas-UDF paths batch-transfer.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "mapreduce_cs416_spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Return the active session, or build a local one with engine defaults."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    n = default_parallelism()
    sp = shuffle_partitions if shuffle_partitions is not None else n
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # INT64 micros, not the deprecated INT96: timestamps written by
        # this engine carry row-group min/max stats so readers can prune
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # managed tables (bucketed joins) live outside the repo tree
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        .config("spark.driver.extraJavaOptions", "-Dderby.system.home=/tmp/spark_graft_derby")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
