"""Mergeable cardinality sketches (Apache DataSketches HLL, built into
Spark 4 as ``hll_sketch_agg``/``hll_union_agg``).

The 100 TB use case: "distinct users per slice, and per rollup of
slices" cannot be answered at scale by ``count_distinct`` because
exact distinct state is O(cardinality) per group and cannot be merged
across a second aggregation level — re-aggregating daily exact counts
over-counts repeat users. An HLL sketch is a constant-size (≈ 2^lgK
bytes) mergeable summary: per-slice sketches roll up by lossless
union, so one shuffle produces the fine slices AND any coarser rollup
without touching the raw data again. The reference's closest analog
is the wc-style exact count (mrapps/wc.go:19-40) — it has no
approximate or mergeable story at all.

No DuckDB oracle on purpose: estimates depend on the DataSketches
hash family, which DuckDB does not implement — the registered query
is rows-only, and tests/test_sketches.py pins the real contracts
(relative-error bound vs exact, lossless union == direct sketch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^12 registers ≈ 0.8 kB per sketch, ~1.6% relative standard error —
# the datasketches default; explicit so both agg and union sides agree.
LG_K = 12


def daily_user_sketches(events: DataFrame, lg_k: int = LG_K) -> DataFrame:
    """One HLL sketch of distinct user_ids per (event_type, day).
    Single shuffle on the group key; each task emits constant-size
    partial sketches (map-side combine), so executor memory is bounded
    regardless of per-slice cardinality."""
    return (
        events.withColumn("day", F.to_date("ts"))
        .groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sketch"))
    )


def distinct_user_rollup(events: DataFrame, lg_k: int = LG_K) -> DataFrame:
    """Per-event-type distinct-user reach, computed as a union of the
    per-day sketches — the two-level rollup exact distinct cannot do.
    Returns one row per event_type with the day count, summed daily
    estimates (> reach when users repeat across days), and the
    union-estimated true reach."""
    daily = daily_user_sketches(events, lg_k)
    return (
        daily.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.sum(F.hll_sketch_estimate("sketch")).alias("sum_daily_distinct"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("reach_est"),
        )
        .orderBy("event_type")
    )
