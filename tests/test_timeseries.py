"""Semantic tests for the time-series rollup/gap-fill plans — gaps
and multi-resolution consistency on hand-built event logs."""

from __future__ import annotations

from pyspark.sql import functions as F

ROWS = [
    # two active days with a 2-day hole between them; 'view' only on day 4
    (1, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
    (2, "2024-01-01 05:20:00", 1, "click", 2.0, "{}"),
    (3, "2024-01-04 07:30:00", 2, "click", 3.0, "{}"),
    (4, "2024-01-04 07:45:00", 2, "view", 4.0, "{}"),
]


def _write(spark, tmp_path):
    df = spark.createDataFrame(
        ROWS, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_gapfill_zero_fills_holes_and_missing_types(spark, tmp_path):
    from mapreduce_cs416_spark.plans.events import events_gapfill

    out = {(r["event_type"], str(r["day"])[:10]): r["n_events"]
           for r in events_gapfill(spark, _write(spark, tmp_path)).collect()}
    # full grid: 4 calendar days x 2 types
    assert len(out) == 8
    assert out[("click", "2024-01-01")] == 2
    assert out[("click", "2024-01-02")] == 0  # hole day
    assert out[("click", "2024-01-03")] == 0
    assert out[("click", "2024-01-04")] == 1
    assert out[("view", "2024-01-01")] == 0  # type missing that day
    assert out[("view", "2024-01-04")] == 1


def test_multires_rollup_resolutions_are_consistent(spark, tmp_path):
    from mapreduce_cs416_spark.plans.events import events_multires_rollup

    rows = events_multires_rollup(spark, _write(spark, tmp_path)).collect()
    by_res = {}
    for r in rows:
        by_res.setdefault(r["resolution"], []).append(r)
    # every resolution partitions the same event set: totals match
    assert {res: sum(r["n_events"] for r in rs) for res, rs in by_res.items()} == {
        "hour": 4, "day": 4, "week": 4
    }
    # bucket counts coarsen monotonically: 4 distinct hours, 2 days, 2 weeks
    assert len(by_res["hour"]) == 4
    assert len(by_res["day"]) == 3  # (click d1, click d4, view d4)
    # 2024-01-01 is a Monday: both active days share one ISO week,
    # so the week level collapses to one bucket per type
    assert len(by_res["week"]) == 2
    # value sums survive coarsening
    total = sum(float(r["sum_value"]) for r in by_res["day"])
    assert total == sum(float(r["sum_value"]) for r in by_res["week"]) == 10.0
