"""Change-data-capture operators: snapshot merge (upsert/delete) and
SCD Type-2 history building.

The reference engine's pipelines are append-only (SURVEY §2.C sinks);
a production lakehouse additionally needs the MERGE shape every CDC
feed requires — apply a changelog of upserts/deletes to a snapshot —
and the slowly-changing-dimension history that turns a change stream
into validity intervals. Both are expressed as plain DataFrame ops so
Catalyst owns the physical strategy.

Scale design (100 TB snapshot, ~GB-scale daily changelog):
- ``cdc_merge`` is ONE left-anti join plus a union: both sides
  hash-partition on the merge key, so the snapshot is read and
  shuffled exactly once; with AQE the (typically small) changelog
  side broadcast-converts and the snapshot never shuffles at all.
  Per-key conflict resolution (latest change wins) is a map-side
  combinable ``max_by`` aggregate over the changelog only — never
  over the snapshot.
- ``scd2_history`` is a per-key window (lead over the change
  sequence): state is bounded by one key's history, skew-bounded by
  the busiest key, and nothing global is materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame, key_cols: list[str], seq_col: str
) -> DataFrame:
    """Per-key conflict resolution: keep each key's change row with
    the highest ``seq_col`` (commit LSN / binlog position). One
    map-side-combinable aggregate — ``max_by`` over a struct of the
    payload — instead of a row_number window: no per-key sort, and
    partial aggregation halves the shuffle. ``seq_col`` must be
    unique per key (true of any real log position; asserted by the
    fixture tests) or the kept row is tie-ambiguous."""
    payload = [c for c in changes.columns if c not in key_cols]
    agg = changes.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload), F.col(seq_col)).alias("_p")
    )
    return agg.select(*key_cols, *[F.col(f"_p.{c}").alias(c) for c in payload])


def cdc_merge(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """MERGE a changelog into a snapshot (the Delta/Hudi/Iceberg
    upsert shape): ``changes`` rows carry the full new payload plus
    ``op_col`` (``delete_op`` = delete, anything else = upsert).
    Output = base rows whose key has no change, plus the non-delete
    change payloads. With ``seq_col``, only each key's latest change
    applies (``latest_changes``); without it the changelog must
    already be key-unique.

    The snapshot is touched by exactly one operator — a left-anti
    join on the key — so at 100 TB the base relation is scanned and
    (absent a broadcast) shuffled once; deletes fall out naturally
    (their keys suppress base rows and contribute no payload)."""
    resolved = latest_changes(changes, key_cols, seq_col) if seq_col else changes
    survivors = base.join(resolved.select(*key_cols), key_cols, "left_anti")
    upserts = resolved.filter(F.col(op_col) != delete_op).drop(op_col, *( [seq_col] if seq_col else [] ))
    return survivors.unionByName(upserts)


def point_in_time_join(
    facts: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    order_cols: list[str] | None = None,
    prefix: str = "state_",
) -> DataFrame:
    """Temporal (point-in-time) join: enrich every fact row with the
    dimension attributes that were valid AT the fact's timestamp —
    the query every SCD2 history exists to answer. ``changes`` is the
    raw change stream (one row per version, ``attr_cols`` tracked,
    ``order_cols`` breaking same-timestamp ties); a fact matches the
    key's latest change at-or-before its timestamp, exactly the
    half-open validity intervals ``scd2_history`` materializes
    (version N covers [its ts, next ts)), plus a ``{prefix}version``
    ordinal and ``{prefix}since`` timestamp. Facts before the first
    version get NULL state and version 0.

    Scale shape — the asof_join_events union+window pattern, NOT an
    interval join: both sides shuffle ONCE on the key, one per-key
    ordered window computes last-version-so-far (dimension rows sort
    before facts at equal timestamps, so a version starting exactly
    at the fact's time covers it, matching the interval semantics'
    `valid_from <= ts < valid_to`). No range-join blow-up, no per-key
    collect; state is bounded by one key's rows, skew-bounded by the
    busiest key."""
    order_cols = order_cols or []
    fact_payload = [c for c in facts.columns if c not in (*key_cols, ts_col)]
    f = facts.select(
        *key_cols,
        ts_col,
        F.lit(1).alias("_isf"),
        *[
            F.lit(None).cast(changes.schema[c].dataType).alias(f"_a_{c}")
            for c in attr_cols
        ],
        *[
            F.lit(None).cast(changes.schema[c].dataType).alias(f"_o_{c}")
            for c in order_cols
        ],
        *fact_payload,
    )
    d = changes.select(
        *key_cols,
        ts_col,
        F.lit(0).alias("_isf"),
        *[F.col(c).alias(f"_a_{c}") for c in attr_cols],
        *[F.col(c).alias(f"_o_{c}") for c in order_cols],
        *[
            F.lit(None).cast(facts.schema[c].dataType).alias(c)
            for c in fact_payload
        ],
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, "_isf", *[f"_o_{c}" for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    state = F.when(
        F.col("_isf") == 0,
        F.struct(
            F.col(ts_col).alias("since"),
            *[F.col(f"_a_{c}").alias(c) for c in attr_cols],
        ),
    )
    out = (
        f.unionByName(d)
        .withColumn("_state", F.last(state, ignorenulls=True).over(w))
        .withColumn("_version", F.sum(1 - F.col("_isf")).over(w).cast("int"))
        .where(F.col("_isf") == 1)
    )
    return out.select(
        *key_cols,
        ts_col,
        *fact_payload,
        F.col("_state.since").alias(f"{prefix}since"),
        *[F.col(f"_state.{c}").alias(f"{prefix}{c}") for c in attr_cols],
        F.col("_version").alias(f"{prefix}version"),
    )


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type-2: turn a change stream into
    validity intervals — each change row becomes a version valid from
    its own timestamp until the key's next change (NULL = current),
    plus a version ordinal. One per-key window (lead over
    ``ts_col`` + tie-breakers) — the canonical dimension-history
    build; state bounded by a single key's row count."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return changes.select(
        *changes.columns,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )
