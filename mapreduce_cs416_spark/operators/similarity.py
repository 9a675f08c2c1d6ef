"""Similarity search over the `embeddings` table (array<float>).

- ``brute_force_topk``: exact cosine top-k — broadcast the (small)
  query set against the corpus; the scan stays partition-parallel and
  nothing shuffles except the final per-query top-k (window over
  q_id). The folds are sequential (functions/vectors) so results are
  bit-reproducible and oracle-hashable.
- ``cosine_near_dup_pairs``: embedding-cosine near-dup — all pairs
  above a cosine threshold (doc-level dedup by embedding).
- ``lsh_ann_topk``: the scale path — random-hyperplane LSH buckets
  (deterministic planes from a seeded LCG), search only within the
  query's bucket. Recall vs brute force is asserted in tests; no SQL
  oracle (bucket assignment is plane-dependent).

At 100 TB the corpus side stays partitioned; the query side is
broadcast (top-k per query) — the classic "small probes, huge corpus"
ANN layout. An IVF variant would pre-cluster to centroids; LSH here
avoids the iterative k-means fit while exercising the same
bucket-prune plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, l2_norm


def _prepared(emb: DataFrame) -> DataFrame:
    """vec_id, v (array<double>), nrm — norm computed once."""
    return emb.select("vec_id", as_double_array("embedding").alias("v")).select(
        "vec_id", "v", l2_norm("v").alias("nrm")
    )


def brute_force_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < n_queries (excluded from
    their own result). Returns (q_id, neighbor_id, score, rn)."""
    corpus = _prepared(emb)
    queries = corpus.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    dot = F.expr("aggregate(zip_with(v, qv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("neighbor_id"), (dot / (F.col("nrm") * F.col("qnrm"))).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("q_id", "neighbor_id", F.round("cos", 6).alias("score"), "rn")
    )


def cosine_near_dup_pairs(emb: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (doc_a < doc_b, cos >= t).

    Brute-force O(n²) pair join — correct baseline; the LSH bucketing
    in ``lsh_ann_topk`` is the scale path for the same predicate.
    """
    p = _prepared(emb)
    a = p.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = p.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    pairs = (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", (dot / (F.col("na") * F.col("nb"))).alias("cos"))
    )
    return pairs.where(F.col("cos") >= threshold).select(
        "vec_a", "vec_b", F.round("cos", 6).alias("score")
    )


def _hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from a fixed LCG
    (seed 42) — reproducible across runs with no RNG dependency."""
    state = 42
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (2**64)
            row.append((state >> 11) / float(2**53) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(emb: DataFrame, n_planes: int = 8, dim: int = 64) -> DataFrame:
    """vec_id, v, nrm, bucket — sign-bit bucket over random hyperplanes."""
    p = _prepared(emb)
    planes = _hyperplanes(n_planes, dim)
    bucket = None
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        dot = F.expr(
            f"aggregate(zip_with(v, array({', '.join(repr(x) + 'D' for x in plane)}), "
            "(x, y) -> x * y), 0D, (acc, x) -> acc + x)"
        )
        bit = F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
        _ = arr
    return p.withColumn("bucket", bucket.cast("int"))


def lsh_ann_topk(emb: DataFrame, n_queries: int = 10, k: int = 5, n_planes: int = 8) -> DataFrame:
    """ANN top-k: exact search restricted to the query's LSH bucket.
    Equi-join on bucket replaces the cross join — candidate set
    shrinks ~2^n_planes-fold on uniform data."""
    dim = len(emb.select("embedding").first()[0])
    bucketed = lsh_bucket(emb, n_planes, dim)
    queries = bucketed.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        F.col("bucket").alias("qbucket"),
    )
    dot = F.expr("aggregate(zip_with(v, qv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    scored = (
        bucketed.join(F.broadcast(queries), F.col("bucket") == F.col("qbucket"))
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("neighbor_id"), (dot / (F.col("nrm") * F.col("qnrm"))).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("q_id", "neighbor_id", F.round("cos", 6).alias("score"), "rn")
    )
