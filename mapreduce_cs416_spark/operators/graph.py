"""Distributed connected components — dedup-cluster canonicalization.

Near-dup detection (dedup.py) emits PAIRS; an actual dedup pipeline
must then group transitively-connected pairs and keep one canonical
document per group ("A~B, B~C ⇒ keep one of {A,B,C}"). That grouping
is connected components over the similarity graph — an iterative
algorithm the reference cannot express at all (its dataflow is a
single map→shuffle→reduce pass, mr/coordinator.go) and SQL can only
express via recursive CTEs that don't scale out.

Implemented as alternating *large-star / small-star* rounds (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
MapReduce and Beyond", ACM SoCC 2014): each round is one
aggregate + one join over the edge list keyed by node id, so a round
costs O(|E|) shuffle with no per-node neighbor materialization
(no collect_list — a celebrity node's neighborhood never has to fit
in one task), and the number of rounds is O(log n) even on
pathological path graphs, vs O(diameter) for naive label propagation.
Lineage is truncated with ``localCheckpoint`` every round so the plan
doesn't grow with the iteration count.

The fixpoint is detected from a constant-size driver-side summary
(edge count + order-insensitive xxhash sum), never by collecting the
edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) edge list → large-star rounds: every node u connects its
    strictly-larger neighbors to m(u) = min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.select("u", F.least("mn", F.col("u")).alias("m"))
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Large-star output points big→small (u > v). Small-star rewires
    each node's small neighbors (and itself) to m(u) = min(N(u) ∪ {u})
    = min(N(u)), collapsing short chains into stars."""
    m = edges.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = edges.select("u", "v").union(m.select("u", F.col("u").alias("v")))
    return (
        nbrs.join(m, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _edge_summary(edges: DataFrame) -> tuple[int, int]:
    """Constant-size fixpoint probe: (count, commutative hash xor).
    XOR, not SUM — summing 2⁶³-range hashes overflows under ANSI
    mode, and the edge set is distinct so xor-cancellation of
    duplicate rows can't produce a false fixpoint."""
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def connected_components(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 30
) -> DataFrame:
    """(node, component) labels for every node appearing in ``pairs``;
    component = the minimum node id in the connected component.

    ``pairs`` is an undirected edge list (one row per edge, any
    orientation). Nodes not present in ``pairs`` are singletons and
    are NOT returned — callers union them back with label = self
    (see plans/northstar.dedup_components).
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev = _edge_summary(edges)
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        cur = _edge_summary(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # fixpoint edge set is a union of stars (u, m): u's label is m,
    # and each star center m labels itself.
    return edges.select(F.col("u").alias("node"), F.col("v").alias("component")).union(
        edges.select("v", "v").distinct()
    )
