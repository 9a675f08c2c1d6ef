"""Incremental view maintenance (operators/ivm.py): the delta path
must be EXACTLY recomputation over the merged snapshot — asserted on
planted fixtures covering group-moving updates, whole-group deletion,
insert-created groups, update/delete conflicts, batch accretion, and
partitioning invariance (the DECIMAL-carried-sums claim).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_cs416_spark.operators import cdc, ivm

FACT = "k long, g string, v double"
CHANGE = "k long, g string, v double, op string, seq long"

BASE = [
    (1, "a", 10.25),
    (2, "a", 1.50),
    (3, "b", 7.00),
    (4, "b", 2.10),
    (5, "c", 99.99),  # group c will be deleted entirely
]

BATCH = [
    (2, "b", 1.50, "U", 1),   # moves row 2 from group a to group b
    (3, "b", 8.00, "U", 1),   # in-place value update
    (5, "c", None, "D", 1),   # deletes the only row of group c
    (6, "d", 4.44, "U", 1),   # insert creating a brand-new group
    (7, "a", 3.00, "U", 1),   # insert into an existing group
    (4, "b", 0.00, "U", 1),   # update...
    (4, "b", None, "D", 2),   # ...outranked by a later delete
]

GROUP, MEASURES = ["g"], {"total": "v"}


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture(scope="module")
def frames(spark):
    return (
        spark.createDataFrame(BASE, FACT),
        spark.createDataFrame(BATCH, CHANGE),
    )


def _incremental(base, changes):
    view = ivm.build_view(base, GROUP, MEASURES)
    deltas = ivm.delta_view(base, changes, ["k"], GROUP, MEASURES, seq_col="seq")
    return ivm.finalize(ivm.merge_deltas(view, deltas, GROUP), GROUP)


def _recomputed(base, changes):
    merged = cdc.cdc_merge(base, changes, ["k"], op_col="op", seq_col="seq")
    return ivm.finalize(ivm.build_view(merged, GROUP, MEASURES), GROUP)


def test_delta_equals_recompute(frames):
    base, changes = frames
    assert _rows(_incremental(base, changes)) == _rows(_recomputed(base, changes))


def test_planted_expectations(frames):
    base, changes = frames
    got = {r["g"]: (r["n_rows"], r["total"]) for r in _incremental(base, changes).collect()}
    # a: lost row 2 (moved), gained row 7            -> 10.25 + 3.00
    assert got["a"] == (2, 13.25)
    # b: row 2 moved in (1.50), row 3 updated (8.00), row 4 deleted
    assert got["b"] == (2, 9.50)
    # c: dropped out entirely; d: created by insert
    assert "c" not in got and got["d"] == (1, 4.44)


def test_batch_accretion(spark, frames):
    """Maintaining through batch 1 then batch 2 equals recomputing
    over both batches merged in sequence."""
    base, b1 = frames
    b2 = spark.createDataFrame(
        [(6, "d", None, "D", 3), (8, "d", 1.00, "U", 3), (1, "a", 10.00, "U", 3)],
        CHANGE,
    )
    snap1 = cdc.cdc_merge(base, b1, ["k"], op_col="op", seq_col="seq").localCheckpoint()
    view = ivm.build_view(base, GROUP, MEASURES)
    d1 = ivm.delta_view(base, b1, ["k"], GROUP, MEASURES, seq_col="seq")
    v1 = ivm.merge_deltas(view, d1, GROUP).localCheckpoint()
    d2 = ivm.delta_view(snap1, b2, ["k"], GROUP, MEASURES, seq_col="seq")
    v2 = ivm.finalize(ivm.merge_deltas(v1, d2, GROUP), GROUP)
    snap2 = cdc.cdc_merge(snap1, b2, ["k"], op_col="op", seq_col="seq")
    want = ivm.finalize(ivm.build_view(snap2, GROUP, MEASURES), GROUP)
    assert _rows(v2) == _rows(want)


def test_partitioning_invariance(spark, frames):
    """DECIMAL-carried sums: 1-partition and 16-partition maintenance
    produce bit-identical doubles."""
    base, changes = frames
    one = _incremental(base.coalesce(1), changes.coalesce(1))
    many = _incremental(base.repartition(16), changes.repartition(16))
    assert _rows(one) == _rows(many)


def test_empty_changelog_is_identity(spark, frames):
    base, _ = frames
    empty = spark.createDataFrame([], CHANGE)
    assert _rows(_incremental(base, empty)) == _rows(
        ivm.finalize(ivm.build_view(base, GROUP, MEASURES), GROUP)
    )
