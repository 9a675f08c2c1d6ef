"""Property tests for approximate aggregates and other claims the SQL
parity suite can't express directly (it checks the derived booleans;
these check the raw estimates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_cs416_spark.sources.tables import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rows = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        F.count_distinct("l_partkey").alias("exact"),
    ).collect()
    assert rows
    for r in rows:
        rel_err = abs(r["approx"] - r["exact"]) / r["exact"]
        assert rel_err <= 0.06, f"{r['l_returnflag']}: rel err {rel_err:.4f} > 3*rsd"


def test_percentile_bounds(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    r = li.agg(
        F.percentile("l_quantity", 0.5).alias("p50"),
        F.min("l_quantity").alias("lo"),
        F.max("l_quantity").alias("hi"),
    ).collect()[0]
    assert r["lo"] <= r["p50"] <= r["hi"]


def test_seeded_sample_reexecution_is_deterministic(spark, sf_dir):
    """Re-executing the SAME sampled plan yields the identical row set
    — the property task retries rely on. (Two separately-built
    sample() plans do NOT promise the same rows even with equal seeds:
    the seed is salted per operator instance.)"""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    sampled = li.sample(0.1, seed=42)
    a = sorted(map(tuple, sampled.collect()))
    b = sorted(map(tuple, sampled.collect()))
    assert a == b
    n, total = len(a), li.count()
    assert 0.05 * total < n < 0.15 * total, f"sample rate off: {n}/{total}"


def test_events_nanos_timestamp_roundtrip(spark, sf_dir):
    """events.parquet stores TIMESTAMP(NANOS); load_table must surface
    a µs timestamp column, never the raw long (the round-1 failure
    class)."""
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.where(F.col("ts").isNull()).count() == 0
