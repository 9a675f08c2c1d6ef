"""Fuzzy edit-distance join + bloom-pruned semi-join + funnel edges.

edit_distance_pairs' blocking must be LOSSLESS (same pairs as the
all-pairs plan), bloom_semi_join must be EXACT (same rows as a plain
semi-join — the bloom only prunes), and events_funnel's sequential
constraint must hold on adversarial orderings (click before any view
does not count).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_cs416_spark.operators.bloomjoin import bloom_semi_join
from mapreduce_cs416_spark.operators.dedup import edit_distance_pairs


# --------------------------------------------------------- edit distance
@pytest.fixture(scope="module")
def names_df(spark):
    # lengths straddling several len//4 buckets, duplicates included
    # (the operator must dedup to vocabulary first), plus pairs whose
    # lengths differ by exactly max_dist (bucket-boundary cases)
    vals = [
        "red widget", "red widgets", "red midget", "blue widget",
        "bolt", "bolts", "boltss", "bolttttt",
        "a", "ab", "abcd", "abcde", "abcdefg",
        "same", "same", "same",
    ]
    return spark.createDataFrame([(v,) for v in vals], "p_name string")


def _brute_pairs(vals: list[str], max_dist: int) -> set[tuple[str, str, int]]:
    import itertools

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = set()
    for a, b in itertools.combinations(sorted(set(vals)), 2):
        d = lev(a, b)
        if d <= max_dist:
            out.add((a, b, d))
    return out


@pytest.mark.parametrize("max_dist", [1, 2, 3])
def test_edit_distance_blocking_is_lossless(spark, names_df, max_dist):
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in edit_distance_pairs(names_df, "p_name", max_dist=max_dist).collect()
    }
    vals = [r["p_name"] for r in names_df.collect()]
    assert got == _brute_pairs(vals, max_dist)


def test_edit_distance_empty_when_no_close_pairs(spark):
    df = spark.createDataFrame(
        [("aaaaaaaaaa",), ("bbbbbbbbbb",), ("cccc",)], "p_name string"
    )
    assert edit_distance_pairs(df, "p_name", max_dist=2).count() == 0


# ------------------------------------------------------------ bloom join
@pytest.fixture(scope="module")
def bloom_tables(spark):
    big = spark.range(0, 5000).select((F.col("id") % 997).alias("key"), F.col("id").alias("payload"))
    small = spark.range(0, 120).select((F.col("id") * 7).alias("k"))
    return big, small


def test_bloom_semi_join_equals_plain_semi(spark, bloom_tables):
    big, small = bloom_tables
    got = bloom_semi_join(big, "key", small, "k").orderBy("payload").collect()
    want = (
        big.join(small.distinct(), big["key"] == small["k"], "left_semi")
        .orderBy("payload")
        .collect()
    )
    assert got == want
    assert len(got) > 0  # non-vacuous


def test_bloom_semi_join_empty_small_side(spark, bloom_tables):
    big, _ = bloom_tables
    empty = spark.createDataFrame([], "k long")
    assert bloom_semi_join(big, "key", empty, "k").count() == 0


def test_bloom_prefilter_prunes_most_nonmembers(spark):
    """The pruning claim itself: with disjoint key domains the bloom
    candidate set (before the exact semi-join) must be a small
    fraction of the big side — otherwise the operator is a cross
    join with extra steps. fpr at m=2^16, k=3, n=100 is < 1e-6, so
    even one surviving candidate per 10k rows would flag a hash
    wiring bug; we allow 1% slack to stay deterministic."""
    big = spark.range(0, 20000).select((F.col("id") + 1_000_000).alias("key"))
    small = spark.range(0, 100).select(F.col("id").alias("k"))
    # reproduce the operator's prefilter stage (same hash family)
    from mapreduce_cs416_spark.operators import bloomjoin as bj

    n_bits, k = 1 << 16, 3
    keys = small.select(F.col("k"))
    pos = keys.select(
        F.explode(
            F.array(*[F.pmod(F.xxhash64("k", F.lit(i)), F.lit(n_bits)) for i in range(k)])
        ).alias("pos")
    )
    words = pos.select(
        (F.col("pos") / 64).cast("int").alias("w"),
        F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
    ).groupBy("w").agg(F.bit_or("bit").alias("bits"))
    bloom = words.groupBy().agg(
        F.map_from_arrays(F.collect_list("w"), F.collect_list("bits")).alias("bloom")
    )
    probed = big.crossJoin(F.broadcast(bloom))
    cond = None
    for i in range(k):
        p = F.pmod(F.xxhash64(F.col("key"), F.lit(i)), F.lit(n_bits))
        hit = (
            F.coalesce(F.element_at(F.col("bloom"), (p / 64).cast("int")), F.lit(0).cast("long"))
            .bitwiseAND(F.expr(f"shiftleft(1L, CAST(pmod(xxhash64(key, {i}), {n_bits}) % 64 AS INT))"))
            != 0
        )
        cond = hit if cond is None else (cond & hit)
    n_candidates = probed.where(cond).count()
    assert n_candidates <= big.count() * 0.01
    # and the full operator returns exactly the true (empty) semi-join
    assert bloom_semi_join(big, "key", small, "k").count() == 0


# ---------------------------------------------------------------- funnel
def test_events_funnel_sequential_constraint(spark, tmp_path):
    """click before any view must NOT count; a click at the exact
    same timestamp as the first view MUST count (RANGE frame); a
    purchase before the qualifying click must NOT count."""
    from mapreduce_cs416_spark.plans.events import events_funnel

    rows = [
        # u1: click @1 BEFORE view @2 -> click does not qualify; stage 1
        (1, "2024-01-01 00:01:00", 101, "click", 1.0, "{}"),
        (2, "2024-01-01 00:02:00", 101, "view", 1.0, "{}"),
        # u2: view and click at the SAME ts -> click counts; purchase later; stage 3
        (3, "2024-01-01 00:01:00", 102, "view", 1.0, "{}"),
        (4, "2024-01-01 00:01:00", 102, "click", 1.0, "{}"),
        (5, "2024-01-01 00:05:00", 102, "purchase", 1.0, "{}"),
        # u3: purchase @1 before view @2 + click @3 -> purchase does not qualify; stage 2
        (6, "2024-01-01 00:01:00", 103, "purchase", 1.0, "{}"),
        (7, "2024-01-01 00:02:00", 103, "view", 1.0, "{}"),
        (8, "2024-01-01 00:03:00", 103, "click", 1.0, "{}"),
        # u4: only an error event -> stage 0
        (9, "2024-01-01 00:01:00", 104, "error", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r["user_id"]: r for r in events_funnel(spark, str(tmp_path)).collect()}
    assert out[101]["stage"] == 1 and out[101]["click_ts"] is None
    assert out[102]["stage"] == 3
    assert out[103]["stage"] == 2 and out[103]["purchase_ts"] is None
    assert out[104]["stage"] == 0
