"""Entity-resolution queries over a multi-source CRM snapshot
synthesized deterministically from `customer` (SURVEY.md §2 north-star
warehouse surface; operators/entity.py holds the four-stage linker).

The slim TPC-H fixture has no second source system, so — exactly like
text_pii_redact's note column — the plan fabricates one INSIDE the
query from printf-twinned expressions both engines evaluate
identically: every customer yields a 'crm' record; every 2nd also a
'billing' record (name typo'd Customer→Custommer and upper-cased,
phone re-formatted with dots); every 3rd also a 'support' record
(name lower-cased with '#'→'-', phone missing, balance rounded to
whole currency). The linker must therefore survive case drift,
punctuation drift, a real typo, NULL fields, and numeric rounding —
while never comparing all pairs (operators/entity.py docstring).

Ground truth is known by construction (records of one custkey), which
tests/test_entity.py uses for recall assertions; the DuckDB oracle
runs the same two match rules plus the recursive-CTE min-label
closure (dedup_components pattern) and the same survivorship
aggregate, so the driver hash covers the WHOLE pipeline end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import entity
from ..sources.tables import load_table
from .spec import QuerySpec


def _records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three-source record feed (rid = 3*custkey + source slot).

    The phone digits are the custkey's OWN digit slices (2+3+3+4 of a
    zero-padded 12-digit key), so the phone is INJECTIVE in custkey
    for any key below 10^12 — a modular formula here (an earlier
    draft used k%90/k%900/7k%900/37k%9000) is periodic and silently
    hands customers k and k+period the same phone once the fixture
    outgrows the period, collapsing thousands of distinct customers
    into shared entities at sf0.1."""
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    d = (
        F.expr("c_custkey div 10000000000") % 100,
        F.expr("c_custkey div 10000000") % 1000,
        F.expr("c_custkey div 10000") % 1000,
        k % 10_000,
    )
    dash = F.format_string("%02d-%03d-%03d-%04d", *d)
    dot = F.format_string("%02d.%03d.%03d.%04d", *d)

    def rec(slot: int, source: str, name, phone, bal) -> DataFrame:
        return cust.select(
            (k * 3 + slot).alias("rid"),
            F.lit(source).alias("source"),
            name.alias("name"),
            phone.alias("phone"),
            bal.alias("bal"),
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )

    crm = rec(0, "crm", F.col("c_name"), dash, F.col("c_acctbal"))
    billing = rec(
        1,
        "billing",
        F.upper(F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Custommer"))),
        dot,
        F.col("c_acctbal"),
    ).where(k % 2 == 0)
    support = rec(
        2,
        "support",
        F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("-"))),
        F.lit(None).cast("string"),
        F.round(F.col("c_acctbal"), 0),
    ).where(k % 3 == 0)
    return crm.unionByName(billing).unionByName(support)


def entity_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 1+2 of the linker in isolation: normalized records →
    scored match pairs under the deterministic (phone) and
    probabilistic (blocked balance band + name similarity) rules.
    Candidate generation is equi-join only — phone hash join plus
    lossless floor(balance) band registration/probing — so the pair
    list is output-sized, never quadratic (operators/entity.py)."""
    return entity.match_pairs(entity.normalize_records(_records(spark, sf_dir)))


def entity_incremental_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden records via ACCRETION (operators/entity.incremental_
    resolve): the record feed arrives in two waves (even custkeys,
    then odd — so every second entity's billing/support members land
    in a later wave than their crm seed, exercising new-old linking
    and label propagation), each wave matched only against the
    standing resolved corpus, never old-against-old. The oracle is
    the FROM-SCRATCH resolution SQL, unchanged: hash equality IS the
    proof that incremental accretion lands on exactly the batch
    labels (the supernode-minimum argument, driver-verified)."""
    recs = entity.normalize_records(_records(spark, sf_dir))
    wave1 = recs.where(F.floor(F.col("rid") / 3) % 2 == 0)
    wave2 = recs.where(F.floor(F.col("rid") / 3) % 2 == 1)
    state = entity.resolve(wave1, entity.match_pairs(wave1))
    state = entity.incremental_resolve(state, wave2)
    return entity.golden_records(state)


def entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full four-stage entity-resolution pipeline: normalize →
    match (two rules, blocked candidates) → cluster transitively
    (graph.connected_components, O(log n) star rounds) → survivorship
    merge into golden records in ONE aggregate (min_by on the unique
    (source-priority, rid) key; collect_set bounded by #systems).
    Every custkey's planted records collapse to one entity: billing
    links to crm by shared phone digits, support links to crm by the
    profile rule (|round(bal)−bal| ≤ 0.5, identical normalized name,
    same nation+segment block)."""
    recs = entity.normalize_records(_records(spark, sf_dir))
    pairs = entity.match_pairs(recs)
    return entity.golden_records(entity.resolve(recs, pairs))


# ---------------------------------------------------------------- SQL

# printf twins of _records(); evaluated identically by both engines.
_RECORDS_SQL = """
recs AS (
    SELECT c_custkey * 3 AS rid, 'crm' AS source, c_name AS name,
           printf('%02d-%03d-%03d-%04d', (c_custkey // 10000000000) % 100,
                  (c_custkey // 10000000) % 1000, (c_custkey // 10000) % 1000,
                  c_custkey % 10000) AS phone,
           c_acctbal AS bal, c_nationkey AS nation, c_mktsegment AS segment
    FROM customer
    UNION ALL
    SELECT c_custkey * 3 + 1, 'billing', upper(replace(c_name, 'Customer', 'Custommer')),
           printf('%02d.%03d.%03d.%04d', (c_custkey // 10000000000) % 100,
                  (c_custkey // 10000000) % 1000, (c_custkey // 10000) % 1000,
                  c_custkey % 10000),
           c_acctbal, c_nationkey, c_mktsegment
    FROM customer WHERE c_custkey % 2 = 0
    UNION ALL
    SELECT c_custkey * 3 + 2, 'support', lower(replace(c_name, '#', '-')), NULL,
           round(c_acctbal, 0), c_nationkey, c_mktsegment
    FROM customer WHERE c_custkey % 3 = 0
),
norm AS (
    SELECT rid, source, name,
           regexp_replace(lower(name), '[^a-z0-9]', '', 'g') AS name_norm,
           regexp_replace(phone, '[^0-9]', '', 'g') AS phone_norm,
           bal, nation, segment
    FROM recs
),
r1 AS (
    SELECT a.rid AS rid_a, b.rid AS rid_b,
           1.0 - CAST(levenshtein(a.name_norm, b.name_norm) AS DOUBLE)
               / greatest(length(a.name_norm), length(b.name_norm)) AS name_sim,
           TRUE AS via_phone, FALSE AS via_profile
    FROM norm a JOIN norm b
      ON a.phone_norm = b.phone_norm AND a.rid < b.rid
    WHERE a.phone_norm IS NOT NULL AND length(a.phone_norm) > 0
),
r2 AS (
    SELECT rid_a, rid_b, name_sim, FALSE AS via_phone, TRUE AS via_profile
    FROM (
        SELECT a.rid AS rid_a, b.rid AS rid_b,
               1.0 - CAST(levenshtein(a.name_norm, b.name_norm) AS DOUBLE)
                   / greatest(length(a.name_norm), length(b.name_norm)) AS name_sim
        FROM norm a JOIN norm b
          ON a.nation = b.nation AND a.segment = b.segment
         AND a.rid < b.rid AND abs(a.bal - b.bal) <= 0.5
    )
    WHERE name_sim >= 0.9
),
pairs AS (
    SELECT rid_a, rid_b,
           bool_or(via_phone) AS via_phone, bool_or(via_profile) AS via_profile,
           round(max(name_sim), 6) AS name_sim
    FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
    GROUP BY rid_a, rid_b
)
"""

ENTITY_PAIRS_SQL = f"""
WITH {_RECORDS_SQL}
SELECT rid_a, rid_b, via_phone, via_profile, name_sim FROM pairs
"""

ENTITY_RESOLUTION_SQL = f"""
WITH RECURSIVE {_RECORDS_SQL},
sym AS (
    SELECT rid_a AS u, rid_b AS v FROM pairs
    UNION
    SELECT rid_b, rid_a FROM pairs
),
reach(id, lbl) AS (
    SELECT u, u FROM sym
    UNION
    SELECT s.u, r.lbl FROM sym s JOIN reach r ON s.v = r.id
),
lbl AS (SELECT id, min(lbl) AS entity_id FROM reach GROUP BY 1),
resolved AS (
    SELECT n.*, coalesce(l.entity_id, n.rid) AS entity_id
    FROM norm n LEFT JOIN lbl l ON n.rid = l.id
)
SELECT entity_id,
       CAST(count(*) AS INTEGER) AS n_records,
       CAST(count(DISTINCT source) AS INTEGER) AS n_sources,
       string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
       arg_min(name, (CASE source WHEN 'crm' THEN 0 WHEN 'billing' THEN 1 ELSE 2 END)
                     * 1000000000000000 + rid) AS name,
       min(phone_norm) AS phone,
       round(arg_min(bal, (CASE source WHEN 'crm' THEN 0 WHEN 'billing' THEN 1 ELSE 2 END)
                          * 1000000000000000 + rid), 2) AS acctbal,
       CAST(min(nation) AS INTEGER) AS nationkey,
       min(segment) AS segment
FROM resolved
GROUP BY entity_id
"""


QUERIES: dict[str, QuerySpec] = {
    q.name: q
    for q in [
        # r8 session-3 rotation IN (slot freed by embedding_centroid_scores,
        # whose oracle stays in extras): the full linker pipeline is
        # driver-hashed end to end.
        QuerySpec("entity_resolution", entity_resolution, ENTITY_RESOLUTION_SQL, entity_resolution.__doc__, headline=True, tags=("northstar", "entity", "dedup", "graph", "pipeline", "warehouse")),
        # r9 rotation IN (VERDICT r8 item 4): the scored Fellegi-Sunter
        # pair stage — driver-hashed alongside the end-to-end linker.
        QuerySpec("entity_match_pairs", entity_match_pairs, ENTITY_PAIRS_SQL, entity_match_pairs.__doc__, tags=("northstar", "entity", "dedup", "join", "warehouse")),
    ]
}

EXTRA_QUERIES: dict[str, QuerySpec] = {
    q.name: q
    for q in [
        # the accretion path against the from-scratch oracle: the SAME
        # SQL as entity_resolution — equality is the claim under test.
        QuerySpec("entity_incremental_resolution", entity_incremental_resolution, ENTITY_RESOLUTION_SQL, entity_incremental_resolution.__doc__, tags=("northstar", "entity", "dedup", "graph", "pipeline", "incremental", "warehouse")),
    ]
}
