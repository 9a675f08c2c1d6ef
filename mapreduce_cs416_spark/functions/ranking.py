"""Window-free ranked top-k.

Five operators (vocab build, weighted sampling, BM25, CMS heavy
hitters, quality-mix argmax) need `the k best rows, numbered 1..k`.
The natural `row_number() OVER (ORDER BY ...)` has two problems on a
bounded input: WindowExec emits its scary "No Partition Defined" WARN
into every log (burying real warnings — VERDICT r5 item 5), and
partitioning the window on a literal does NOT help because Catalyst
constant-folds the literal away and the partition spec is empty again.

``ranked_topk`` sidesteps the window entirely:

1. ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject —
   per-partition top-k heaps merged on the driver, never a global
   sort (the same scale shape the window formulation relied on);
2. the k surviving rows are coalesced to ONE partition (safe and
   correct BY CONSTRUCTION: there are at most k of them) and
   re-sorted within it — a total order key makes this deterministic;
3. ``monotonically_increasing_id()`` numbers the single sorted
   partition 0..k-1 (partition 0 ⇒ the id IS the row index), so
   +1 is exactly ``row_number()`` over the same ordering.

Result: bit-identical output to the window formulation, no WindowExec
node in the plan, and the logs stay clean for warnings that matter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ranked_topk(df: DataFrame, order: list[Column], k: int, rn: str = "rn") -> DataFrame:
    """Top-``k`` rows of ``df`` under ``order`` (a TOTAL ordering —
    include a key tiebreak), with an int rank column ``rn`` = 1..k in
    that order. Window-free; see module docstring."""
    return (
        df.orderBy(*order)
        .limit(k)
        .coalesce(1)
        .sortWithinPartitions(*order)
        .withColumn(rn, (F.monotonically_increasing_id() + 1).cast("int"))
    )
