"""Semantic tests for the data-quality operators — fixtures with
KNOWN violations (the registered audit's fixture is mostly clean;
these prove each counter actually counts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_cs416_spark.operators import dq


def test_expectation_counts_one_scan_many_rules(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "ok"), (2, -5.0, "ok"), (None, 3.0, "bad"), (4, None, "ok")],
        "k long, price double, status string",
    )
    out = {
        r["rule"]: r["n_violations"]
        for r in dq.expectation_counts(
            df,
            {
                "k_not_null": F.col("k").isNull(),
                "price_positive": F.col("price") <= 0,  # NULL price doesn't violate
                "status_known": ~F.col("status").isin("ok"),
            },
        ).collect()
    }
    assert out == {"k_not_null": 1, "price_positive": 1, "status_known": 1}


def test_uniqueness_and_fk_violations(spark):
    child = spark.createDataFrame(
        [(1, 100), (2, 100), (2, 200), (3, 999), (4, None)], "k long, fk long"
    )
    parent = spark.createDataFrame([(100,), (200,)], "pk long")
    uniq = dq.uniqueness_violations(child, ["k"], "k_unique").collect()[0]
    assert (uniq["rule"], uniq["n_violations"]) == ("k_unique", 1)  # k=2 twice
    fk = dq.fk_violations(child, parent, {"fk": "pk"}, "fk_ok").collect()[0]
    # 999 is an orphan; the NULL fk row is NOT a violation (SQL FK semantics)
    assert (fk["rule"], fk["n_violations"]) == ("fk_ok", 1)


def test_audit_union_and_pass_flag(spark):
    df = spark.createDataFrame([(1,), (1,)], "k long")
    out = {
        r["rule"]: (r["n_violations"], r["pass"])
        for r in dq.audit(
            dq.expectation_counts(df, {"k_not_null": F.col("k").isNull()}),
            dq.uniqueness_violations(df, ["k"], "k_unique"),
        ).collect()
    }
    assert out == {"k_not_null": (0, True), "k_unique": (1, False)}


def test_column_profile_typed_minmax(spark):
    df = spark.createDataFrame(
        [(1, "b"), (3, "a"), (None, None)], "n long, s string"
    )
    out = {r["col"]: r for r in dq.column_profile(df, ["n"], ["s"]).collect()}
    n = out["n"]
    assert (n["n_nulls"], n["n_distinct"], n["min_num"], n["max_num"]) == (1, 2, 1.0, 3.0)
    assert n["min_str"] is None and n["max_str"] is None
    s = out["s"]
    assert (s["n_nulls"], s["n_distinct"], s["min_str"], s["max_str"]) == (1, 2, "a", "b")
    assert s["min_num"] is None


def test_expectation_counts_folds_uniqueness_into_same_scan(spark):
    df = spark.createDataFrame([(1, 1), (1, 2), (2, 3)], "k long, v long")
    out = dq.expectation_counts(
        df,
        {"v_positive": F.col("v") <= 0},
        unique_rules={"k_unique": ["k"], "kv_unique": ["k", "v"]},
    )
    got = {r["rule"]: r["n_violations"] for r in out.collect()}
    assert got == {"v_positive": 0, "k_unique": 1, "kv_unique": 0}
    # the fold really is one scan: a single Aggregate pair, no union
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") <= 2  # partial+final agg over ONE relation


def test_expectation_counts_empty_input_is_zero_not_null(spark):
    """F.sum over zero rows is NULL, but an empty relation violates
    nothing — counters (and the audit pass flag) must read 0/True,
    matching the coalescing DuckDB twin and the pre-data streaming
    state."""
    df = spark.createDataFrame([], "k long, price double")
    out = dq.audit(
        dq.expectation_counts(
            df,
            {"k_not_null": F.col("k").isNull(), "price_positive": F.col("price") <= 0},
            unique_rules={"k_unique": ["k"]},
        )
    ).collect()
    assert len(out) == 3
    assert all(r["n_violations"] == 0 for r in out)
    assert all(r["pass"] for r in out)
