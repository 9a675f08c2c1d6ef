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


# --------------------------------------------------------------- count-min


def _tokens(spark, sf_dir):
    from mapreduce_cs416_spark.functions.text import words_col

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.explode(words_col("text")).alias("token"))


def test_cms_never_underestimates(spark, sf_dir):
    """The defining CMS guarantee: counters only over-count, so
    est(token) >= true_count(token) for EVERY token."""
    toks = _tokens(spark, sf_dir)
    exact = {r["token"]: r["cnt"] for r in toks.groupBy("token").agg(F.count("*").alias("cnt")).collect()}
    est = {
        r["item"]: r["est"]
        for r in sketches.cms_estimate(sketches.cms_build(toks), toks.select("token").distinct()).collect()
    }
    assert est.keys() == exact.keys() and est
    for t, e in est.items():
        assert e >= exact[t], (t, e, exact[t])


def test_cms_error_bound(spark, sf_dir):
    """Overestimate bounded: est - true <= 2N/width holds per row with
    prob 1/2, and the min over depth=4 rows fails all four with prob
    <= 2^-4 per token — assert no token exceeds 4N/width (comfortably
    past the expected tail for a fixed fixture)."""
    toks = _tokens(spark, sf_dir)
    n_stream = toks.count()
    bound = 4 * n_stream / sketches.CMS_WIDTH
    exact = {r["token"]: r["cnt"] for r in toks.groupBy("token").agg(F.count("*").alias("cnt")).collect()}
    est = {
        r["item"]: r["est"]
        for r in sketches.cms_estimate(sketches.cms_build(toks), toks.select("token").distinct()).collect()
    }
    for t, e in est.items():
        assert e - exact[t] <= bound, (t, e, exact[t], bound)


def test_cms_shard_merge_is_lossless(spark, sf_dir):
    """Counters are plain sums: building one sketch over the stream ==
    summing the sketches of disjoint shards (the mergeability that
    lets per-day/per-source sketches roll up without rescanning)."""
    toks = _tokens(spark, sf_dir).withColumn(
        "shard", (F.crc32(F.col("token")) % 3).cast("int")
    )
    whole = sketches.cms_build(toks)
    shards = [
        sketches.cms_build(toks.where(F.col("shard") == i)) for i in range(3)
    ]
    merged = (
        shards[0].unionByName(shards[1]).unionByName(shards[2])
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    lhs = {(r["r"], r["bucket"]): r["cnt"] for r in whole.collect()}
    rhs = {(r["r"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert lhs == rhs and lhs


def test_cms_heavy_hitters_match_exact_top(spark, sf_dir):
    """On the fixture the top-5 estimated heavy hitters must be a
    subset of the exact top-15 by true count (estimates can reorder
    near-ties but cannot hallucinate a rare token into the head:
    est - true <= 4N/512 ≈ 0.8% of N, far below the head counts)."""
    toks = _tokens(spark, sf_dir)
    hh = [r["token"] for r in sketches.cms_heavy_hitters(toks, k=5).collect()]
    exact_top = [
        r["token"]
        for r in toks.groupBy("token").agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "token").limit(15).collect()
    ]
    assert len(hh) == 5
    assert set(hh) <= set(exact_top), (hh, exact_top)
