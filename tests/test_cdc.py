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
