"""Contracts of operators/quantize.py (int8 quantization + quantized
top-k), cited from the module docstrings:

- reconstruction bound: |x - q*scale| <= scale/2 per element
- quantized cosine tracks exact cosine within the claimed <1% error
- zero-norm vectors are excluded (no NaN score can outrank real ones)
- determinism: identical output under arbitrary repartitioning
- driver registration parity is covered by
  tests/test_parity.py::test_query_matches_oracle[similarity_quantized_topk]
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from mapreduce_cs416_spark.operators import quantize, similarity
from mapreduce_cs416_spark.sources.tables import load_table

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows], SCHEMA
    )


def test_reconstruction_error_bound(spark, sf_dir):
    """x̂ = q * scale must satisfy |x - x̂| <= scale/2 elementwise
    (the defining property of round-half-toward-+inf quantization)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bad = (
        quantize.quantize_embeddings(emb)
        .join(emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")), "vec_id")
        .select(
            F.expr(
                "exists(zip_with(v, q, (x, qi) -> abs(x - qi * scale) > scale / 2 + 1e-15), b -> b)"
            ).alias("violates")
        )
        .where("violates")
        .count()
    )
    assert bad == 0


def test_quantized_range(spark, sf_dir):
    """Every quantized component lies in [-127, 127]."""
    emb = load_table(spark, sf_dir, "embeddings")
    bad = (
        quantize.quantize_embeddings(emb)
        .where(F.expr("exists(q, x -> x < -127 OR x > 127)"))
        .count()
    )
    assert bad == 0


def test_quantized_cosine_error_vs_exact(spark, sf_dir):
    """The quantized top-k scores match the float top-k scores of the
    same (q_id, neighbor_id) pairs within 1% absolute — the module's
    compression-accuracy claim."""
    emb = load_table(spark, sf_dir, "embeddings")
    qk = quantize.quantized_topk(emb, n_queries=5, k=5).select(
        "q_id", "neighbor_id", F.col("score").alias("q_score")
    )
    exact = similarity.brute_force_topk(emb, n_queries=5, k=5).select(
        "q_id", "neighbor_id", F.col("score").alias("f_score")
    )
    joined = qk.join(exact, ["q_id", "neighbor_id"]).collect()
    assert joined, "top-k neighbor sets must overlap"
    for r in joined:
        assert abs(r["q_score"] - r["f_score"]) < 0.01, r


def test_zero_norm_vectors_excluded(spark):
    """An all-zero vector quantizes to integer norm 0 ⇒ cos would be
    0/0 = NaN, and NaN sorts above every real double under F.desc —
    so zero vectors must appear neither as queries nor neighbors
    (ADVICE r4: the scale floor bounds the scale, not the cosine)."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),  # zero query AND zero corpus vector
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    out = quantize.quantized_topk(_vecs(spark, rows), n_queries=2, k=3).collect()
    assert out, "non-zero queries must still produce neighbors"
    for r in out:
        assert r["q_id"] != 1 and r["neighbor_id"] != 1
        assert not math.isnan(r["score"])
    # vec 2 ≈ vec 0 direction: its nearest neighbor must be vec 0
    top = {r["q_id"]: r["neighbor_id"] for r in out if r["rn"] == 1}
    assert top[0] == 2


def test_determinism_under_repartition(spark, sf_dir):
    """Integer dots are exact in double regardless of fold order, so
    the result set is identical under any input partitioning."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = {tuple(r) for r in quantize.quantized_topk(emb, n_queries=5, k=5).collect()}
    b = {
        tuple(r)
        for r in quantize.quantized_topk(emb.repartition(17), n_queries=5, k=5).collect()
    }
    assert a == b


# ---------------------------------------------------------------- PQ / ADC


def test_pq_codes_are_partition_invariant(spark, sf_dir):
    from mapreduce_cs416_spark.operators.quantize import pq_encode
    from mapreduce_cs416_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb).collect()}
    b = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb.repartition(13)).collect()}
    assert a == b and a
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in a.values())


def test_pq_adc_recall_on_clustered_vectors(spark):
    """On separable clusters ADC must put mostly same-cluster vectors
    in the top-5 (the PQ approximation cannot confuse near-orthogonal
    clusters even with random codebooks)."""
    import math
    import random

    from mapreduce_cs416_spark.operators.quantize import pq_adc_topk

    rows, vid = [], 0
    rng = random.Random(42)
    for c in range(5):
        centroid = [rng.gauss(0, 1) for _ in range(64)]
        for _ in range(20):
            vec = [x + 0.15 * rng.gauss(0, 1) for x in centroid]
            n = math.sqrt(sum(x * x for x in vec))
            rows.append((vid, [float(x / n) for x in vec], c))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    labels = {r[0]: r[2] for r in rows}
    out = pq_adc_topk(emb, n_queries=10, k=5)
    hits = total = 0
    for r in out.collect():
        total += 1
        hits += labels[r["neighbor_id"]] == labels[r["q_id"]]
    assert total == 50
    assert hits / total >= 0.8, f"same-cluster fraction {hits}/{total}"


def test_dim_stats_matches_numpy_moments(spark):
    import numpy as np

    rows = [(i, [float(i), -1.0 + i, 0.5]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from mapreduce_cs416_spark.operators.quantize import dim_stats

    out = {r["dim"]: r for r in dim_stats(emb, dim=3).collect()}
    a = np.array([r[1] for r in rows])
    for d in range(3):
        col = a[:, d]
        assert out[d]["n"] == 5
        assert abs(out[d]["mean"] - col.mean()) < 1e-6
        assert abs(out[d]["variance"] - col.var()) < 1e-6  # population variance
        assert out[d]["min_val"] == round(float(col.min()), 9)
        assert out[d]["max_val"] == round(float(col.max()), 9)
    # constant dimension: exactly zero variance, no negative drift
    assert out[2]["variance"] == 0.0


def test_dim_stats_partitioning_invariant(spark):
    """Integer partials commute: 1 partition and 16 partitions must
    produce IDENTICAL rounded moments (the hash-oracle property)."""
    from mapreduce_cs416_spark.operators.quantize import dim_stats

    rows = [(i, [((i * 37) % 11) / 7.0, -((i * 13) % 5) / 3.0]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    one = sorted(map(tuple, dim_stats(emb.coalesce(1), dim=2).collect()))
    many = sorted(map(tuple, dim_stats(emb.repartition(16), dim=2).collect()))
    assert one == many


def test_standardize_zscores_and_zero_variance_passthrough(spark):
    from mapreduce_cs416_spark.operators.quantize import standardize

    rows = [(0, [1.0, 5.0]), (1, [3.0, 5.0])]  # dim1 is constant
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["z"] for r in standardize(emb, dim=2).collect()}
    # dim0: mean 2, std 1 -> z = [-1, 1]; dim1: zero variance -> centered only
    assert out[0] == [-1.0, 0.0] and out[1] == [1.0, 0.0]


def test_standardize_output_is_actually_standard(spark):
    """Applying the calibration must yield per-dim mean ~0 and
    variance ~1 on the corpus it was fit on."""
    import numpy as np

    from mapreduce_cs416_spark.operators.quantize import standardize

    rows = [(i, [((i * 37) % 11) / 7.0, -((i * 13) % 5) / 3.0, (i % 7) * 1.5]) for i in range(100)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    z = np.array([r["z"] for r in standardize(emb, dim=3).collect()])
    assert np.allclose(z.mean(axis=0), 0, atol=1e-5)
    assert np.allclose(z.var(axis=0), 1, atol=1e-4)
