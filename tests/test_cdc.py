"""Semantic tests for the CDC operators — hand-built changelogs with
known merge outcomes (parity proves Spark==DuckDB; these prove the
agreed answer is the MERGE answer)."""

from __future__ import annotations

from mapreduce_cs416_spark.operators import cdc


def _base(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")], "k long, v string"
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, op string, seq long")


def test_cdc_merge_upsert_delete_and_conflicts(spark):
    changes = _changes(
        spark,
        [
            (2, "b2", "U", 1),  # plain update
            (3, None, "D", 1),  # plain delete
            (9, "i9", "U", 1),  # insert (no base row)
            (4, "d2", "U", 1),  # update then delete: delete wins
            (4, None, "D", 2),
            (5, None, "D", 1),  # delete then update: update wins
            (5, "e2", "U", 2),
        ],
    )
    out = cdc.cdc_merge(_base(spark), changes, ["k"], op_col="op", seq_col="seq")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "a", 2: "b2", 5: "e2", 9: "i9"}


def test_cdc_merge_without_seq_requires_key_unique_log(spark):
    changes = _changes(spark, [(1, None, "D", 1), (9, "i9", "U", 1)]).drop("seq")
    out = cdc.cdc_merge(_base(spark), changes, ["k"], op_col="op")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {2: "b", 3: "c", 4: "d", 5: "e", 9: "i9"}


def test_latest_changes_keeps_highest_seq_payload(spark):
    changes = _changes(spark, [(1, "x", "U", 3), (1, "y", "U", 7), (2, "z", "U", 1)])
    got = {r["k"]: (r["v"], r["seq"]) for r in cdc.latest_changes(changes, ["k"], "seq").collect()}
    assert got == {1: ("y", 7), 2: ("z", 1)}


def test_scd2_history_chains_validity_intervals(spark):
    changes = spark.createDataFrame(
        [
            (1, 10, "bronze"),
            (1, 20, "silver"),
            (1, 30, "gold"),
            (2, 15, "bronze"),
        ],
        "k long, t long, tier string",
    )
    out = cdc.scd2_history(changes, ["k"], "t", order_cols=["tier"])
    rows = sorted(out.collect(), key=lambda r: (r["k"], r["version"]))
    k1 = [r for r in rows if r["k"] == 1]
    assert [r["tier"] for r in k1] == ["bronze", "silver", "gold"]
    assert [r["version"] for r in k1] == [1, 2, 3]
    # intervals chain: each valid_to is the next version's valid_from
    assert [r["valid_to"] for r in k1[:-1]] == [r["valid_from"] for r in k1[1:]]
    assert k1[-1]["valid_to"] is None and k1[-1]["is_current"]
    assert all(not r["is_current"] for r in k1[:-1])
    (k2,) = [r for r in rows if r["k"] == 2]
    assert k2["version"] == 1 and k2["is_current"]


def test_cdc_merge_composite_key(spark):
    base = spark.createDataFrame(
        [(1, "x", "a"), (1, "y", "b"), (2, "x", "c")], "k1 long, k2 string, v string"
    )
    changes = spark.createDataFrame(
        [(1, "x", "a2", "U", 1), (2, "x", None, "D", 1), (3, "z", "new", "U", 1)],
        "k1 long, k2 string, v string, op string, seq long",
    )
    out = cdc.cdc_merge(base, changes, ["k1", "k2"], op_col="op", seq_col="seq")
    got = {(r["k1"], r["k2"]): r["v"] for r in out.collect()}
    assert got == {(1, "x"): "a2", (1, "y"): "b", (3, "z"): "new"}


def test_point_in_time_join_planted(spark):
    """Interval semantics on a hand-planted history: facts at exact
    version starts, between versions, before the first version, and
    across a zero-width version (two changes at the same timestamp)."""
    changes = spark.createDataFrame(
        [
            (1, 10, 100, "bronze"),
            (1, 20, 101, "silver"),
            (1, 20, 102, "gold"),    # same-ts change: zero-width silver
            (1, 40, 103, "plat"),
            (2, 50, 200, "bronze"),
        ],
        "k long, t long, cid long, tier string",
    )
    facts = spark.createDataFrame(
        [
            (1, 5, 1000),   # before any version -> NULL, version 0
            (1, 10, 1001),  # exactly at version 1's start -> bronze
            (1, 20, 1002),  # at the double change -> gold (v3), never silver
            (1, 30, 1003),  # between versions -> gold
            (1, 40, 1004),  # at version 4's start -> plat
            (2, 99, 2000),  # other key
        ],
        "k long, t long, fid long",
    )
    out = cdc.point_in_time_join(
        facts, changes, ["k"], "t", ["tier"], order_cols=["cid"]
    )
    got = {r["fid"]: (r["state_tier"], r["state_version"], r["state_since"]) for r in out.collect()}
    assert got[1000] == (None, 0, None)
    assert got[1001] == ("bronze", 1, 10)
    assert got[1002] == ("gold", 3, 20)
    assert got[1003] == ("gold", 3, 20)
    assert got[1004] == ("plat", 4, 40)
    assert got[2000] == ("bronze", 1, 50)
    assert out.count() == facts.count()  # enrichment never duplicates facts


def test_point_in_time_join_equals_interval_join(spark):
    """The union+window recipe must equal a literal interval join
    against scd2_history's materialized validity ranges."""
    from pyspark.sql import functions as F

    changes = spark.createDataFrame(
        [(k, t, k * 1000 + t, f"s{t % 7}") for k in range(5) for t in range(0, 100, 7)],
        "k long, t long, cid long, tier string",
    )
    facts = spark.createDataFrame(
        [(k, t, k * 10000 + t) for k in range(5) for t in range(0, 110, 3)],
        "k long, t long, fid long",
    )
    got = cdc.point_in_time_join(facts, changes, ["k"], "t", ["tier"], order_cols=["cid"])
    hist = cdc.scd2_history(changes, ["k"], "t", order_cols=["cid"])
    want = (
        facts.alias("f")
        .join(
            hist.alias("h"),
            (F.col("f.k") == F.col("h.k"))
            & (F.col("h.valid_from") <= F.col("f.t"))
            & (F.col("h.valid_to").isNull() | (F.col("f.t") < F.col("h.valid_to"))),
            "left",
        )
        .select(
            "f.fid",
            F.col("h.tier").alias("state_tier"),
            F.coalesce("h.version", F.lit(0)).alias("state_version"),
        )
    )
    a = {(r["fid"], r["state_tier"], r["state_version"]) for r in got.select("fid", "state_tier", "state_version").collect()}
    b = {(r["fid"], r["state_tier"], r["state_version"]) for r in want.collect()}
    assert a == b and len(a) == facts.count()
