"""Entity resolution (record linkage / MDM golden records).

The classic warehouse counterpart of document dedup: the same logical
entity (a customer, a supplier) arrives from several source systems
with formatting drift, typos, and partial fields, and the engine must
(1) find the matching record pairs WITHOUT an all-pairs comparison,
(2) group matches into entity clusters, and (3) merge each cluster
into one canonical "golden record" by survivorship rules. The
reference's engine has no relational layer at all (its closest shape
is the word-count groupBy, mr/coordinator.go task loop); this family
is part of the north-star warehouse surface, modeled on the
Fellegi-Sunter record-linkage decomposition (blocking → comparison →
classification → fusion) as implemented by open-source linkers such
as Splink and Zingg — but expressed as four composable DataFrame
stages so Catalyst fuses normalization into the scans and every join
is an equi-join.

Scale shape, stage by stage (the 100 TB story):

- ``normalize_records`` is a pure projection — zero shuffles, fuses
  into the source scan under whole-stage codegen.
- ``match_pairs`` never compares all pairs. Rule 1 (deterministic
  key) is a self-equi-join on the normalized phone — hash join on a
  high-cardinality key whose per-key occupancy is bounded by how many
  systems can hold one entity (a handful), so the join output is
  O(records), not O(records²). Rule 2 (probabilistic) uses LOSSLESS
  numeric banding exactly like dedup.edit_distance_pairs' length
  bands: each record registers at floor(balance) and probes the
  bucket span covering [balance − band, balance + band], so a
  qualifying partner can never be missed, and the candidate join is
  an equi-join on (blocking key, bucket). Only candidates that share
  a block pay the Levenshtein comparison. At 100 TB the blocking key
  would be richer (postcode + phonetic name, multiple redundant
  passes); the operator takes it as a parameter.
- ``resolve`` reuses graph.connected_components — the O(log n)
  large-star/small-star alternation — so transitive matches (A–B via
  phone, A–C via profile) collapse into one entity without any
  driver-side union-find. Labels are min-rid, deterministic.
- ``golden_records`` is ONE aggregate over the labeled records:
  min_by survivorship keyed on (source priority, rid) — the key is
  unique per record, so ties cannot exist and the result is
  deterministic on any partitioning; collect_set is bounded by the
  number of source systems. Map-side partial aggregation applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Survivorship: lower = more trusted. Keyed with rid so the order key
# is unique per record and min_by can never tie.
SOURCE_PRIORITY: dict[str, int] = {"crm": 0, "billing": 1, "support": 2}

# priority * _PRIORITY_STRIDE + rid must stay below 2^63; the stride
# leaves room for ~10^15 record ids — comfortably above any real
# record-id space (100 TB of 1 KB records is 10^11 rows).
_PRIORITY_STRIDE = 1_000_000_000_000_000


def normalize_records(
    df: DataFrame, name_col: str = "name", phone_col: str = "phone"
) -> DataFrame:
    """Add ``name_norm`` (lowercased, alphanumerics only) and
    ``phone_norm`` (digits only; NULL stays NULL) — pure row-local
    JVM projection, no shuffle."""
    return df.withColumn(
        "name_norm", F.regexp_replace(F.lower(F.col(name_col)), "[^a-z0-9]", "")
    ).withColumn("phone_norm", F.regexp_replace(F.col(phone_col), "[^0-9]", ""))


def _name_sim(a: Column, b: Column) -> Column:
    return F.lit(1.0) - F.levenshtein(a, b) / F.greatest(F.length(a), F.length(b))


def match_pairs(
    records: DataFrame,
    block_cols: tuple[str, ...] = ("nation", "segment"),
    bal_col: str = "bal",
    band: float = 0.5,
    name_threshold: float = 0.9,
) -> DataFrame:
    """Scored candidate pairs (rid_a < rid_b) under two match rules:

    via_phone  — normalized phones equal (deterministic key match);
    via_profile — same blocking key, |balance difference| <= band,
                  and normalized-name Levenshtein similarity >=
                  name_threshold (probabilistic match).

    Returns one row per matched pair with both rule flags and the
    name similarity. Candidate generation is equi-join only (see
    module docstring); the band registration/probe is lossless
    because floor is monotone: a partner within ``band`` of balance
    b sits in a bucket inside [floor(b-band), floor(b+band)].
    """
    base = records.select(
        "rid", "name_norm", "phone_norm", bal_col, *block_cols
    ).localCheckpoint()

    phone = base.where(F.col("phone_norm").isNotNull() & (F.length("phone_norm") > 0))
    r1 = (
        phone.alias("a")
        .join(phone.alias("b"), "phone_norm")
        .where(F.col("a.rid") < F.col("b.rid"))
        .select(
            F.col("a.rid").alias("rid_a"),
            F.col("b.rid").alias("rid_b"),
            _name_sim(F.col("a.name_norm"), F.col("b.name_norm")).alias("name_sim"),
            F.lit(True).alias("via_phone"),
            F.lit(False).alias("via_profile"),
        )
    )

    reg = base.withColumn("bucket", F.floor(F.col(bal_col)))
    probe = base.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(bal_col) - F.lit(band)),
                F.floor(F.col(bal_col) + F.lit(band)),
            )
        ),
    )
    sim = _name_sim(F.col("a.name_norm"), F.col("b.name_norm"))
    r2 = (
        reg.alias("a")
        .join(probe.alias("b"), ["bucket", *block_cols])
        .where(
            (F.col("a.rid") < F.col("b.rid"))
            & (F.abs(F.col(f"a.{bal_col}") - F.col(f"b.{bal_col}")) <= band)
        )
        # a pair can meet in more than one probed bucket
        .select(F.col("a.rid").alias("rid_a"), F.col("b.rid").alias("rid_b"),
                F.col("a.name_norm").alias("a_norm"), F.col("b.name_norm").alias("b_norm"))
        .distinct()
        .withColumn("name_sim", _name_sim(F.col("a_norm"), F.col("b_norm")))
        .where(F.col("name_sim") >= name_threshold)
        .select(
            "rid_a",
            "rid_b",
            "name_sim",
            F.lit(False).alias("via_phone"),
            F.lit(True).alias("via_profile"),
        )
    )

    return (
        r1.unionByName(r2)
        .groupBy("rid_a", "rid_b")
        .agg(
            F.max("via_phone").alias("via_phone"),
            F.max("via_profile").alias("via_profile"),
            F.round(F.max("name_sim"), 6).alias("name_sim"),
        )
    )


def resolve(records: DataFrame, pairs: DataFrame) -> DataFrame:
    """Label every record with its entity_id = the minimum rid of its
    match cluster (graph.connected_components); unmatched records are
    singleton entities (entity_id = own rid)."""
    from . import graph

    labels = graph.connected_components(pairs, src="rid_a", dst="rid_b")
    # labels is matched-record-sized (NOT broadcastable at scale); a
    # plain equi-join on rid lets AQE pick broadcast when it happens
    # to be small, shuffle-hash when it isn't.
    return (
        records.join(labels.withColumnRenamed("node", "rid"), "rid", "left")
        .withColumn("entity_id", F.coalesce(F.col("component"), F.col("rid")))
        .drop("component")
    )


def incremental_resolve(
    resolved: DataFrame,
    new_records: DataFrame,
    block_cols: tuple[str, ...] = ("nation", "segment"),
    bal_col: str = "bal",
    band: float = 0.5,
    name_threshold: float = 0.9,
) -> DataFrame:
    """Accrete a batch of new records into an already-resolved corpus
    WITHOUT re-matching old-against-old — the entity-resolution
    counterpart of dedup.incremental_ingest, and the operation a
    continuously-fed MDM service runs per arrival batch.

    ``resolved`` must keep the full per-record match keys (it is the
    ``resolve`` output, records + entity_id — NOT the golden table:
    survivorship discards the non-surviving members' phones/names, so
    matching against golden alone would miss links the batch path
    finds). Matching is restricted to pairs with a NEW side (old-old
    pairs cannot have changed — the match rules are static); each
    edge then collapses its old endpoint to that record's entity
    label, and connected components over this SUPERNODE graph
    propagates minima: a new record bridging two existing entities
    MERGES them, and because every old label is already the minimum
    rid of its sub-cluster, the merged component's minimum equals the
    from-scratch label over the full corpus. Result: incremental
    resolution is EXACTLY ``resolve(all_records, match_pairs(all))``
    — asserted by tests and by the driver oracle, which recomputes
    from scratch in SQL while Spark runs only the accretion path.

    Scale: per batch the corpus is touched by the two candidate
    equi-joins only (phone key + balance band — both output
    batch-bounded candidates under the same blocking discipline as
    match_pairs); CC runs on the batch-sized supernode edge list."""
    new = new_records.localCheckpoint()
    old = resolved.localCheckpoint()
    # the new-side restriction is a ROW-LOCAL flag carried through the
    # candidate joins (a pair qualifies iff either side is new) — not
    # a semi-join with an OR condition, which would plan as a
    # nested-loop over the candidate set
    both = (
        old.select(*new.columns)
        .withColumn("_new", F.lit(0))
        .unionByName(new.withColumn("_new", F.lit(1)))
    )

    phone = both.where(
        F.col("phone_norm").isNotNull() & (F.length("phone_norm") > 0)
    )
    r1 = (
        phone.alias("a")
        .join(phone.alias("b"), "phone_norm")
        .where(
            (F.col("a.rid") < F.col("b.rid"))
            & (F.col("a._new") + F.col("b._new") >= 1)
        )
        .select(F.col("a.rid").alias("rid_a"), F.col("b.rid").alias("rid_b"))
    )
    reg = both.withColumn("bucket", F.floor(F.col(bal_col)))
    probe = both.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(bal_col) - F.lit(band)),
                F.floor(F.col(bal_col) + F.lit(band)),
            )
        ),
    )
    r2 = (
        reg.alias("a")
        .join(probe.alias("b"), ["bucket", *block_cols])
        .where(
            (F.col("a.rid") < F.col("b.rid"))
            & (F.col("a._new") + F.col("b._new") >= 1)
            & (F.abs(F.col(f"a.{bal_col}") - F.col(f"b.{bal_col}")) <= band)
        )
        .select(F.col("a.rid").alias("rid_a"), F.col("b.rid").alias("rid_b"),
                F.col("a.name_norm").alias("a_norm"), F.col("b.name_norm").alias("b_norm"))
        .distinct()
        .where(_name_sim(F.col("a_norm"), F.col("b_norm")) >= name_threshold)
        .select("rid_a", "rid_b")
    )

    # collapse old endpoints to their entity labels (supernodes)
    lbl = old.select("rid", "entity_id")
    edges = (
        r1.unionByName(r2)
        .join(lbl.withColumnRenamed("rid", "rid_a").withColumnRenamed("entity_id", "la"), "rid_a", "left")
        .join(lbl.withColumnRenamed("rid", "rid_b").withColumnRenamed("entity_id", "lb"), "rid_b", "left")
        .select(
            F.coalesce("la", "rid_a").alias("rid_a"),
            F.coalesce("lb", "rid_b").alias("rid_b"),
        )
        .where(F.col("rid_a") != F.col("rid_b"))
    )
    from . import graph

    comp = graph.connected_components(edges, src="rid_a", dst="rid_b")
    # node space of comp = old entity labels + new rids; map both sides
    relabel = comp.withColumnRenamed("node", "_key").withColumnRenamed(
        "component", "_new_label"
    )
    old_out = (
        old.join(relabel, old["entity_id"] == relabel["_key"], "left")
        .withColumn("entity_id", F.coalesce("_new_label", "entity_id"))
        .drop("_key", "_new_label")
    )
    new_out = (
        new.join(relabel, new["rid"] == relabel["_key"], "left")
        .withColumn("entity_id", F.coalesce("_new_label", "rid"))
        .drop("_key", "_new_label")
    )
    return old_out.unionByName(new_out.select(*old_out.columns))


def _priority(source_col: Column, priority: dict[str, int]) -> Column:
    expr: Column = F.lit(max(priority.values()) + 1)
    for name, p in sorted(priority.items(), key=lambda kv: -kv[1]):
        expr = F.when(source_col == name, F.lit(p)).otherwise(expr)
    return expr


def golden_records(
    resolved: DataFrame,
    priority: dict[str, int] = SOURCE_PRIORITY,
    bal_col: str = "bal",
) -> DataFrame:
    """Survivorship: one golden record per entity in ONE aggregate.

    Field rules: name and balance come from the highest-priority
    source record (min_by on the unique (priority, rid) key — the
    most-trusted system wins, rid breaks cross-system ties
    deterministically); phone is the minimum normalized phone (all
    systems that hold one agree on the digits, min skips NULLs);
    nation is the cluster minimum. sources/n_sources summarize
    provenance (collect_set bounded by the number of systems).
    """
    ordk = _priority(F.col("source"), priority) * F.lit(_PRIORITY_STRIDE) + F.col("rid")
    return resolved.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_records"),
        F.countDistinct("source").cast("int").alias("n_sources"),
        F.array_join(F.sort_array(F.collect_set("source")), ",").alias("sources"),
        F.min_by("name", ordk).alias("name"),
        F.min("phone_norm").alias("phone"),
        F.round(F.min_by(bal_col, ordk), 2).alias("acctbal"),
        F.min("nation").cast("int").alias("nationkey"),
        F.min("segment").alias("segment"),
    )
