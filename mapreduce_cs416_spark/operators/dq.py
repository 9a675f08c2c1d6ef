"""Data-quality expectation checks and column profiling — the audit
stage every production pipeline runs before publishing a table
(the dbt-test / Great-Expectations shape, and ANALYZE-style stats).

Scale design: row-level rules are ONE aggregate scan regardless of
rule count (each rule is a conditional sum folded into the same
hash-agg, unpivoted afterward with stack); uniqueness is one
count-distinct aggregate; referential integrity is one left-anti
join with the parent's (typically dimension-sized) key set broadcast.
Nothing materializes violating rows — audits return counts; a
debugging query fetches examples separately and bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEMA = "rule string, n_violations long"


def expectation_counts(
    df: DataFrame,
    rules: dict[str, Column],
    unique_rules: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Count violations of row-level expectations in ONE scan: each
    rule maps a name to its VIOLATION predicate; all rules fold into
    a single hash aggregate (conditional sums), then unpivot to
    (rule, n_violations) rows via stack. ``unique_rules`` (name →
    key columns) folds uniqueness checks (rows − distinct keys) into
    the SAME aggregate — adding any rule adds an expression, never a
    scan."""
    # coalesce: F.sum over ZERO rows is NULL, but an empty relation
    # violates nothing — batch, streaming counters, and the DuckDB
    # twin (which coalesces) must all report 0 on empty input.
    aggs = [
        F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).cast("long").alias(name)
        for name, cond in rules.items()
    ]
    for name, cols in (unique_rules or {}).items():
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
            .cast("long")
            .alias(name)
        )
    names = list(rules) + list(unique_rules or {})
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{name}', {name}" for name in names)
    return wide.selectExpr(f"stack({len(names)}, {stack}) as (rule, n_violations)")


def uniqueness_violations(df: DataFrame, cols: list[str], rule: str) -> DataFrame:
    """(rule, n_violations) for a uniqueness expectation over
    ``cols``: total rows minus distinct key count — 0 iff the key is
    unique. One aggregate; count_distinct is exact (use the HLL
    sketches in operators/sketches.py when approximate is enough)."""
    return df.agg(
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
        .cast("long")
        .alias("n_violations")
    ).select(F.lit(rule).alias("rule"), "n_violations")


def fk_violations(
    child: DataFrame, parent: DataFrame, keys: dict[str, str], rule: str
) -> DataFrame:
    """(rule, n_violations) for referential integrity: child rows
    whose key tuple has no match in ``parent`` (NULL keys don't
    violate — SQL FK semantics; add a not-null rule separately if
    NULLs are illegal). One left-anti join; the parent collapses to
    its distinct key set first, which is what makes the build side
    broadcastable at any parent width."""
    cond = None
    for ck, pk in keys.items():
        c = child[ck] == parent[pk]
        cond = c if cond is None else cond & c
    pkeys = parent.select(*{pk for pk in keys.values()}).distinct()
    nn = None
    for ck in keys:
        c = child[ck].isNotNull()
        nn = c if nn is None else nn & c
    viol = child.where(nn).join(F.broadcast(pkeys), cond, "left_anti")
    return viol.agg(F.count(F.lit(1)).cast("long").alias("n_violations")).select(
        F.lit(rule).alias("rule"), "n_violations"
    )


def audit(*parts: DataFrame) -> DataFrame:
    """Union the audit parts and attach the pass flag — the published
    artifact is one tiny (rule, n_violations, pass) table."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("pass", F.col("n_violations") == 0)


def column_profile(
    df: DataFrame, numeric_cols: list[str], string_cols: list[str]
) -> DataFrame:
    """ANALYZE-style column statistics in ONE scan: per column the
    null count, exact distinct count, and min/max (numeric columns in
    the *_num fields, string columns in *_str — a mixed-type value
    column would force lossy casts and engine-dependent float/
    timestamp formatting). All columns' stats fold into a single
    aggregate; stack unpivots to one row per column."""
    aggs: list[Column] = []
    for c in numeric_cols + string_cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).cast("long").alias(f"{c}__ndv"),
        ]
    for c in numeric_cols:
        aggs += [
            F.min(c).cast("double").alias(f"{c}__min_num"),
            F.max(c).cast("double").alias(f"{c}__max_num"),
        ]
    for c in string_cols:
        aggs += [F.min(c).alias(f"{c}__min_str"), F.max(c).alias(f"{c}__max_str")]
    wide = df.agg(*aggs)
    rows = []
    for c in numeric_cols:
        rows.append(
            f"'{c}', {c}__nulls, {c}__ndv, {c}__min_num, {c}__max_num, "
            "CAST(NULL AS STRING), CAST(NULL AS STRING)"
        )
    for c in string_cols:
        rows.append(
            f"'{c}', {c}__nulls, {c}__ndv, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), "
            f"{c}__min_str, {c}__max_str"
        )
    n = len(rows)
    return wide.selectExpr(
        f"stack({n}, {', '.join(rows)}) as "
        "(col, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
    )
