"""Property tests for the entity-resolution linker
(operators/entity.py) on a hand-planted multi-source fixture where
ground truth, survivorship winners, and every edge case (NULL phone,
singleton, transitive-only closure, cross-entity near-miss) are
controlled — the customer-derived driver queries get recall asserted
here too, and full end-to-end hashes in test_parity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_cs416_spark.operators import entity

SCHEMA = "rid long, source string, name string, phone string, bal double, nation int, segment string"

# Three planted entities + one deliberate near-miss pair + a singleton.
ROWS = [
    # entity "ada lovelace": 3 sources; billing typo'd, support has no
    # phone but an exactly-rounded balance and same block.
    (0, "crm", "Ada Lovelace", "20-555-0100", 812.43, 1, "BUILDING"),
    (1, "billing", "ADA LOVELACE.", "20.555.0100", 812.43, 1, "BUILDING"),
    (2, "support", "ada lovelacee", None, 812.0, 1, "BUILDING"),
    # entity "grace hopper": phone match only — support's balance is
    # outside the band, so the profile rule alone would miss it.
    (10, "crm", "Grace Hopper", "20-555-0101", 101.10, 2, "MACHINERY"),
    (11, "support", "G. Hopperr", "(20) 555 0101", 999.99, 2, "MACHINERY"),
    # entity "alan turing": profile match only (no phone at all);
    # transitive chain 20-21 (sim 1.0) and 21-22 (one typo).
    (20, "crm", "Alan Turing", None, 55.55, 3, "AUTOMOBILE"),
    (21, "billing", "alan turing", None, 55.55, 3, "AUTOMOBILE"),
    (22, "support", "alan turingg", None, 56.00, 3, "AUTOMOBILE"),
    # near-miss: same block and balance band as 20 but name too far.
    (30, "crm", "Alonzo Church", None, 55.60, 3, "AUTOMOBILE"),
    # singleton with no partners anywhere.
    (40, "crm", "Unique Person", "99-999-9999", 5000.00, 4, "HOUSEHOLD"),
]


@pytest.fixture(scope="module")
def resolved(spark):
    recs = entity.normalize_records(spark.createDataFrame(ROWS, SCHEMA))
    pairs = entity.match_pairs(recs)
    res = entity.resolve(recs, pairs)
    golden = entity.golden_records(res)
    return (
        {r["rid"]: r["entity_id"] for r in res.collect()},
        {r["entity_id"]: r.asDict() for r in golden.collect()},
        {(r["rid_a"], r["rid_b"]): r.asDict() for r in pairs.collect()},
    )


def test_planted_clusters_and_precision(resolved):
    labels, _, _ = resolved
    assert labels[0] == labels[1] == labels[2] == 0
    assert labels[10] == labels[11] == 10
    assert labels[20] == labels[21] == labels[22] == 20
    # near-miss and singleton stay their own entities
    assert labels[30] == 30 and labels[40] == 40
    assert len(set(labels.values())) == 5


def test_match_rules_fire_separately(resolved):
    _, _, pairs = resolved
    # phone-only link (profile blocked by the balance band)
    assert pairs[(10, 11)]["via_phone"] and not pairs[(10, 11)]["via_profile"]
    # profile-only links (no phones at all)
    assert pairs[(20, 21)]["via_profile"] and not pairs[(20, 21)]["via_phone"]
    assert pairs[(20, 21)]["name_sim"] == 1.0
    # the typo pair clears the 0.9 threshold but not equality
    assert 0.9 <= pairs[(21, 22)]["name_sim"] < 1.0
    # near-miss pair must NOT exist
    assert (20, 30) not in pairs and (30, 20) not in pairs


def test_survivorship(resolved):
    _, golden, _ = resolved
    ada = golden[0]
    assert ada["name"] == "Ada Lovelace"  # crm outranks billing/support
    assert ada["phone"] == "205550100"
    assert ada["acctbal"] == 812.43  # crm's exact balance, not support's rounded
    assert ada["n_records"] == 3 and ada["n_sources"] == 3
    assert ada["sources"] == "billing,crm,support"
    hopper = golden[10]
    assert hopper["name"] == "Grace Hopper" and hopper["n_records"] == 2
    single = golden[40]
    assert single["n_records"] == 1 and single["name"] == "Unique Person"


def test_resolution_is_idempotent(spark, resolved):
    """Re-resolving the golden records finds nothing left to merge:
    every golden row stays a singleton entity."""
    _, golden, _ = resolved
    rows = [
        (eid, "crm", g["name"], g["phone"], g["acctbal"], g["nationkey"], g["segment"])
        for eid, g in golden.items()
    ]
    recs = entity.normalize_records(spark.createDataFrame(rows, SCHEMA))
    pairs = entity.match_pairs(recs)
    # golden names/balances of distinct entities never collide
    assert pairs.where(F.col("via_profile") | F.col("via_phone")).count() == 0
    res = entity.resolve(recs, pairs)
    assert res.select("entity_id").distinct().count() == len(golden)


def test_customer_derived_recall(spark):
    """Driver-query fixture: every planted custkey's records share one
    entity (recall 1.0 by construction — billing via phone, support
    via profile), measured on the real sf0.001 customer table."""
    from mapreduce_cs416_spark.plans.entity import _records

    recs = entity.normalize_records(_records(spark, "/root/testdata/sf0.001"))
    res = entity.resolve(recs, entity.match_pairs(recs))
    split = (
        res.withColumn("custkey", F.floor(F.col("rid") / 3))
        .groupBy("custkey")
        .agg(F.countDistinct("entity_id").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert split == 0


def _resolve_all(recs):
    return entity.resolve(recs, entity.match_pairs(recs))


def test_incremental_resolve_equals_from_scratch(spark):
    """Accreting the customer-derived feed in three waves must land on
    EXACTLY the from-scratch labels (the supernode-minimum argument in
    incremental_resolve's docstring, measured)."""
    from mapreduce_cs416_spark.plans.entity import _records

    recs = entity.normalize_records(_records(spark, "/root/testdata/sf0.001"))
    want = {(r["rid"], r["entity_id"]) for r in _resolve_all(recs).collect()}
    state = None
    for wave in range(3):
        batch = recs.where(F.floor(F.col("rid") / 3) % 3 == wave)
        if state is None:
            state = _resolve_all(batch).localCheckpoint()
        else:
            state = entity.incremental_resolve(state, batch).localCheckpoint()
    got = {(r["rid"], r["entity_id"]) for r in state.collect()}
    assert got == want


def test_incremental_bridge_merges_existing_entities(spark):
    """A late record matching TWO previously-separate entities must
    merge them (phone link to one, profile link to the other)."""
    waves = [
        [(0, "crm", "Widget Corp", "11-111-1111", 10.00, 1, "BUILDING")],
        [(10, "crm", "Widget Korp", "22-222-2222", 50.00, 1, "BUILDING")],
        [(5, "support", "Widget Korpp", "11.111.1111", 49.80, 1, "BUILDING")],
    ]
    state = None
    for rows in waves:
        batch = entity.normalize_records(spark.createDataFrame(rows, SCHEMA))
        if state is None:
            state = _resolve_all(batch).localCheckpoint()
        else:
            state = entity.incremental_resolve(state, batch).localCheckpoint()
    labels = {r["rid"]: r["entity_id"] for r in state.collect()}
    assert labels == {0: 0, 10: 0, 5: 0}
    # sanity: the two seeds alone do NOT match each other
    seeds = entity.normalize_records(
        spark.createDataFrame(waves[0] + waves[1], SCHEMA)
    )
    assert entity.match_pairs(seeds).count() == 0
    # and the result equals from-scratch over all three
    allrecs = entity.normalize_records(
        spark.createDataFrame([r for w in waves for r in w], SCHEMA)
    )
    want = {(r["rid"], r["entity_id"]) for r in _resolve_all(allrecs).collect()}
    assert {(r, e) for r, e in labels.items()} == want
