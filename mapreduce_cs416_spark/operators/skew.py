"""Skew mitigation for holistic aggregates.

The reference's reduce is holistic — it sees the full value list per
key (mr/worker.go:164-177) — and SURVEY.md §7's risk register calls
out the 100 TB hazard: `collect_list` on a hot key concentrates one
group on one task. Salting splits each group into `n_salts`
sub-groups, aggregates partials in parallel, then merges the (much
smaller) partial lists — two shuffles, both skew-free.

The merge is order-insensitive (final `array_sort`), which is exactly
the reference's own determinism trick: its crash app sorts inside the
reduce because shuffle order is unspecified (mrapps/crash.go:48-51).
The final joined-string row is still group-sized — that's the output
contract, not a plan defect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_holistic_agg(
    kv: DataFrame,
    key: str = "key",
    value: str = "value",
    n_salts: int = 16,
    sep: str = " ",
) -> DataFrame:
    """(key, agg_values): sorted, `sep`-joined values per key via
    two-level salted aggregation. Result is identical to
    groupBy(key).agg(array_join(array_sort(collect_list(value))))
    for any salt count — asserted in tests/test_skew.py.

    The salt hashes a row-unique input (monotonically_increasing_id),
    NOT the value: a hot key whose rows share one constant value —
    the classic skew case — would otherwise land every row on a
    single salt and silently defeat the mitigation (VERDICT r3
    item 5). The salt only routes rows to sub-groups; the final
    sorted merge is salt-invariant, so task-retry nondeterminism in
    the id cannot change the result."""
    salted = kv.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.col(key), F.col(value), F.monotonically_increasing_id()),
            F.lit(n_salts),
        ),
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.array_sort(F.collect_list(value)).alias("_part")
    )
    return partial.groupBy(key).agg(
        F.array_join(F.array_sort(F.flatten(F.collect_list("_part"))), sep).alias(
            "agg_values"
        )
    )
