"""Mergeable sketches: HLL cardinality (Apache DataSketches, built
into Spark 4 as ``hll_sketch_agg``/``hll_union_agg``) and a count-min
frequency sketch built from plain aggregations.

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

The HLL estimates depend on the DataSketches hash family, which DuckDB
does not implement — that registered query is rows-only, and
tests/test_sketches.py pins the real contracts (relative-error bound
vs exact, lossless union == direct sketch).

The count-min sketch below deliberately hashes with md5 (identical in
Spark and DuckDB), so unlike most sketch implementations its estimates
ARE engine-portable and the registered heavy-hitters query carries a
full value-hash DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


# ---------------------------------------------------------------------------
# Count-min frequency sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

# depth d rows × width w counters: point estimate overestimates the true
# frequency by at most 2N/w with probability ≥ 1 - 2^-d (N = stream
# length). 4×512 ⇒ ε ≈ 0.4% of N at ~16 kB of state — constant
# regardless of vocabulary size, which is the whole point.
CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_bucket(h: Column, row: Column, width: int = CMS_WIDTH) -> Column:
    """Row-``row``'s counter index from a precomputed md5 hex digest:
    hex chars [8r+1, 8r+8] as an integer, mod width. One 128-bit md5
    yields all four 32-bit row hashes — the digest is computed ONCE
    per occurrence and sliced per depth row, not rehashed per row.
    md5 is bit-identical in Spark and DuckDB, so the sketch (and every
    estimate read from it) is engine-portable — see
    ``plans/northstar.CMS_HEAVY_HITTERS_SQL`` for the oracle twin."""
    return (
        F.conv(F.substring(h, row * 8 + 1, 8), 16, 10).cast("long") % width
    ).alias("bucket")


def _hashed_rows(items: DataFrame, col: str, depth: int, width: int) -> DataFrame:
    """(item, r, bucket) for every occurrence × depth row, one md5 per
    occurrence. depth ≤ 4: a 32-hex digest only holds four 8-hex
    slices."""
    if depth > 4:
        raise ValueError(f"depth {depth} > 4 needs more than one md5 digest")
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    return items.select(F.col(col).alias("item"), F.md5(col).alias("h")).select(
        "item", rows, "h"
    ).select("item", "r", cms_bucket(F.col("h"), F.col("r"), width))


def cms_build(
    items: DataFrame,
    col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch from an item stream: (r, bucket, cnt), at most
    depth×width rows.

    One shuffle over ≤ depth·width groups with map-side combine: every
    task's partial-aggregation state is bounded by the sketch size, not
    by the number of distinct items — the memory contract that lets
    this run over a 100 TB token stream where an exact groupBy(token)
    would shuffle and hold the full vocabulary. Sketches of disjoint
    shards merge by summing counters (plain ``+`` per (r, bucket) —
    asserted lossless in tests/test_sketches.py), so per-day or
    per-source sketches roll up without rescanning."""
    return (
        _hashed_rows(items, col, depth, width)
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for every candidate item: (item, est)
    where est = min over the d rows of the hashed counter —
    ``est >= true_count`` always (counters only ever over-count).

    The sketch is at most depth×width rows → broadcast; estimating any
    candidate set is then a map-side join, never a shuffle of the
    corpus the sketch was built from."""
    probes = _hashed_rows(candidates, col, depth, width)
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    tokens: DataFrame,
    col: str = "token",
    k: int = 15,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Top-k most frequent items by count-min estimate:
    (token, est, rn), rank ties broken by token.

    vs the exact ``textstats.top_ngrams`` path: exact top-k shuffles
    and holds O(vocabulary) count state; this holds O(depth·width)
    whatever the vocabulary. The candidate set probed here is the
    distinct items (fine when the vocabulary fits a shuffle — it's the
    estimates, not the candidate walk, that the sketch makes cheap);
    at true stream scale the candidate set would instead be a sampled
    or per-partition-top-m superset, with the same probe join."""
    from ..functions.ranking import ranked_topk

    sketch = cms_build(tokens, col, depth, width)
    est = cms_estimate(sketch, tokens.select(col).distinct(), col, depth, width)
    # window-free top-k rank (functions/ranking): TakeOrderedAndProject
    # merges per-partition heaps on the driver — the candidate table is
    # never globally sorted through one task, and no WindowExec WARN
    return ranked_topk(est, [F.desc("est"), F.col("item")], k).select(
        F.col("item").alias(col), "est", "rn"
    )
