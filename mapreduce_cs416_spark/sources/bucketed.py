"""Bucketed tables — shuffle-free fact⋈fact joins.

Broadcast joins cover dim⋈fact; at 100 TB the lineitem⋈orders class
of join is fact⋈fact and would shuffle both sides on every run. Spark's
answer is bucketing: write both tables hash-bucketed (and sorted)
on the join key with the same bucket count, and the join planner
aligns buckets 1:1 — a sort-merge join with **no Exchange on either
side**, amortizing the shuffle into the write path once.

tests/test_bucketed.py asserts both properties: result equivalence
with the plain join, and the absence of shuffle exchanges in the
bucketed plan.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession

from .tables import load_table


def write_bucketed(
    df: DataFrame, table: str, keys: list[str], n_buckets: int = 8
) -> None:
    """Persist df as a bucketed+sorted managed table (parquet). The
    bucket count is part of the table contract — co-bucketed joins
    require equal counts on both sides."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a fresh catalog (new session) may still see the old location on
    # disk; managed-table creation refuses to reuse it
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )


def bucket_tables_for_join(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> tuple[str, str]:
    """Materialize lineitem and orders bucketed on the join key."""
    li, od = "lineitem_bkt", "orders_bkt"
    write_bucketed(load_table(spark, sf_dir, "lineitem"), li, ["l_orderkey"], n_buckets)
    write_bucketed(load_table(spark, sf_dir, "orders"), od, ["o_orderkey"], n_buckets)
    return li, od


def bucketed_revenue_join(spark: SparkSession, li_table: str, od_table: str) -> DataFrame:
    """lineitem⋈orders revenue per order priority over the bucketed
    tables — planner output must contain no shuffle before the join."""
    from pyspark.sql import functions as F

    li = spark.table(li_table).select("l_orderkey", "l_extendedprice", "l_discount")
    od = spark.table(od_table).select("o_orderkey", "o_orderpriority")
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )
