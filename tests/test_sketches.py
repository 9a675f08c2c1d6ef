"""Contracts of operators/sketches.py (mergeable HLL cardinality
sketches), cited from the module docstring:

- relative-error bound of the union estimate vs exact count_distinct
- rollup sanity: reach_est <= summed daily estimates (users repeat
  across days, so re-aggregated daily counts over-count)
- union losslessness: union of per-day sketches == one direct sketch
  over the same rows (identical estimate)
- the registered driver query (events_distinct_rollup) is rows-only;
  these are the properties standing in for a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_cs416_spark.operators import sketches
from mapreduce_cs416_spark.sources.tables import load_table


def test_rollup_estimate_error_bound(spark, sf_dir):
    """reach_est within 5% of exact per-type distinct users (lg_k=12
    ⇒ ~1.6% relative standard error; 5% ≈ 3σ)."""
    ev = load_table(spark, sf_dir, "events")
    est = {
        r["event_type"]: r["reach_est"]
        for r in sketches.distinct_user_rollup(ev).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert est.keys() == exact.keys() and est
    for t in exact:
        assert abs(est[t] - exact[t]) <= max(0.05 * exact[t], 1), (t, est[t], exact[t])


def test_rollup_le_summed_daily(spark, sf_dir):
    """Users repeat across days ⇒ summing daily distincts over-counts;
    the union-based reach must not exceed the daily sum (small slack
    for independent per-slice estimation error)."""
    ev = load_table(spark, sf_dir, "events")
    rows = sketches.distinct_user_rollup(ev).collect()
    assert rows
    for r in rows:
        assert r["n_days"] >= 1
        assert r["reach_est"] <= r["sum_daily_distinct"] * 1.02, r


def test_union_is_lossless(spark, sf_dir):
    """hll_union_agg over per-day sketches must estimate exactly what
    one sketch built directly over all rows estimates — the mergeable
    -summary property that makes two-level rollups correct."""
    ev = load_table(spark, sf_dir, "events")
    unioned = (
        sketches.daily_user_sketches(ev)
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"))
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(sketches.LG_K))).alias("est")
    )
    u = {r["event_type"]: r["est"] for r in unioned.collect()}
    d = {r["event_type"]: r["est"] for r in direct.collect()}
    assert u == d


def test_partial_merge_partition_independent(spark, sf_dir):
    """Sketch aggregation is a commutative monoid: estimates must not
    depend on how input rows are partitioned (map-side combine
    soundness)."""
    ev = load_table(spark, sf_dir, "events")
    a = {tuple(r) for r in sketches.distinct_user_rollup(ev).collect()}
    b = {tuple(r) for r in sketches.distinct_user_rollup(ev.repartition(13)).collect()}
    assert a == b
