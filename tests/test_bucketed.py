"""Bucketed fact⋈fact join: equivalence with the plain join, and no
shuffle exchange on either join side (the 100 TB contract)."""

from __future__ import annotations

import pytest

from mapreduce_cs416_spark.sources import bucketed
from mapreduce_cs416_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bkt_tables(spark, sf_dir):
    return bucketed.bucket_tables_for_join(spark, sf_dir, n_buckets=4)


def _canon(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_bucketed_join_matches_plain_join(spark, sf_dir, bkt_tables):
    li_t, od_t = bkt_tables
    got = bucketed.bucketed_revenue_join(spark, li_t, od_t)
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    want = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )
    assert _canon(got) == _canon(want)


def test_bucketed_join_plan_has_no_pre_join_shuffle(spark, bkt_tables):
    li_t, od_t = bkt_tables
    # forbid a broadcast plan: the point is the co-bucketed shuffle-free
    # sort-merge path (at real scale neither fact side is broadcastable)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed.bucketed_revenue_join(spark, li_t, od_t)
        plan = df._jdf.queryExecution().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    # the join inputs (below the join node) must read bucketed files
    # directly: no "Exchange hashpartitioning" feeding the join
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning" not in join_part, join_part[:2000]
