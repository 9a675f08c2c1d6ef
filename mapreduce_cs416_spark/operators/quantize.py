"""Deterministic int8 embedding quantization + quantized top-k.

At 100 TB the embedding column dominates storage and shuffle width:
64 × float32 = 256 B/row vs 64 × int8 + 1 scale ≈ 72 B — a 3.5×
reduction on the wire for the similarity joins, at <1% cosine error.
This is the standard serving-side compression (scalar quantization)
for ANN indexes; IVF/LSH bucketing (operators/similarity.py) composes
with it — bucket on the full-precision plane dots, score candidates
on the quantized vectors.

Determinism contract (what makes this oracle-checkable, unlike most
quantizers): per-vector symmetric affine quantization with the
explicit rounding ``q = floor(x / scale + 0.5)`` (round-half-toward
+inf — spelled as floor so Spark and DuckDB can't disagree on
round()'s tie semantics), and integer dot products whose partial
values stay < 2^53, so every sum is exact in double regardless of
fold order. Scale cancels in cosine, so quantized cosine needs no
dequantization at all — integer dot / integer-norm product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array

# int8 symmetric range; the 1e-12 floor bounds the SCALE (so the
# division in quantize never sees 0) — it does NOT make an all-zero
# vector's cosine defined. Zero-norm vectors are filtered out of
# quantized_topk below: q = [0,...] has integer norm 0, and 0/0 = NaN
# sorts ABOVE every real double under F.desc, so one zero corpus
# vector would otherwise rank as the top-1 neighbor of every query.
QMAX = 127
SCALE_FLOOR = "1e-12D"


def quantize_embeddings(emb: DataFrame) -> DataFrame:
    """vec_id, scale (double), q (array<int> in [-127, 127]).

    Row-local (zero shuffle): scale = max|x| / 127 per vector, then
    elementwise round. Reconstruction x̂ = q * scale satisfies
    |x - x̂| ≤ scale / 2 (asserted in tests/test_quantize.py).
    """
    v = as_double_array("embedding")
    return (
        emb.select("vec_id", v.alias("v"))
        .select(
            "vec_id",
            F.greatest(
                F.expr("array_max(transform(v, x -> abs(x)))") / F.lit(QMAX).cast("double"),
                F.expr(SCALE_FLOOR),
            ).alias("scale"),
            F.col("v"),
        )
        .select(
            "vec_id",
            "scale",
            F.expr("transform(v, x -> cast(floor(x / scale + 0.5D) as int))").alias("q"),
        )
    )


def quantized_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact-over-quantized cosine top-k — the same broadcast layout
    as similarity.brute_force_topk (corpus partition-parallel, query
    side broadcast, one window for the per-query top-k), but scoring
    on int8 vectors: the integer dot (≤ 127²·dim < 2^53) divides by
    the product of integer norms, so the only floating-point ops are
    one sqrt and one division per pair."""
    quant = quantize_embeddings(emb)
    nrm = F.sqrt(
        F.expr("aggregate(q, 0L, (acc, x) -> acc + cast(x as bigint) * x)").cast("double")
    )
    corpus = quant.select("vec_id", "q", nrm.alias("nrm")).where(F.col("nrm") > 0)
    queries = corpus.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("q").alias("qq"), F.col("nrm").alias("qnrm")
    )
    dot = F.expr(
        "aggregate(zip_with(q, qq, (x, y) -> cast(x as bigint) * y), 0L, (acc, x) -> acc + x)"
    ).cast("double")
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot / (F.col("nrm") * F.col("qnrm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("q_id", "neighbor_id", F.round("cos", 6).alias("score"), "rn")
    )


# ---------------------------------------------------------------------------
# Product quantization + ADC search (Jégou, Douze, Schmid, TPAMI 2011)
# ---------------------------------------------------------------------------

PQ_SUB = 8  # subspaces
PQ_SUB_DIM = 8  # 64 / PQ_SUB
PQ_CODES = 16  # codebook entries per subspace → 8 × 4 bits = 4 B/vector


def pq_codebooks(
    n_sub: int = PQ_SUB,
    n_codes: int = PQ_CODES,
    sub_dim: int = PQ_SUB_DIM,
    seed: int = 11,
) -> list[list[list[float]]]:
    """Deterministic unit-norm codebooks, one per subspace (seeded LCG
    — cf. similarity.ivf_centroids and its rationale: fixed codebooks
    exercise the exact PQ plan shape with full reproducibility, which
    is what lets the ADC query carry a DuckDB oracle; a k-means fit
    per subspace would adapt them to data at the cost of the oracle)."""
    import math

    from .similarity import _hyperplanes

    books = []
    for s in range(n_sub):
        book = []
        for p in _hyperplanes(n_codes, sub_dim, seed + s):
            n = math.sqrt(sum(x * x for x in p))
            book.append([x / n for x in p])
        books.append(book)
    return books


def _sub_dot(start: int, code: list[float]) -> str:
    arr = ", ".join(repr(x) + "D" for x in code)
    return (
        f"aggregate(zip_with(slice(u, {start}, {len(code)}), array({arr}), "
        "(x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )


def _unit(emb: DataFrame) -> DataFrame:
    from .similarity import _prepared

    return (
        _prepared(emb)
        .where(F.col("nrm") > 0)
        .select("vec_id", F.expr("transform(v, x -> x / nrm)").alias("u"))
    )


def pq_encode(emb: DataFrame, books: list[list[list[float]]] | None = None) -> DataFrame:
    """(vec_id, codes array<int>): each unit vector's subvectors
    replaced by the argmax-dot codebook index (ties → lowest code).
    Row-local, zero shuffle; at 100 TB the stored index drops from
    256 B/vector (float32) to 8 small ints — the representation the
    ADC join scores WITHOUT ever touching the float vectors again."""
    books = books if books is not None else pq_codebooks()
    codes = []
    for s, book in enumerate(books):
        dots = F.array(*[F.expr(_sub_dot(s * len(book[0]) + 1, c)) for c in book])
        codes.append((F.array_position(dots, F.array_max(dots)) - 1).cast("int"))
    return _unit(emb).select("vec_id", F.array(*codes).alias("codes"))


def pq_adc_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the corpus is scored purely
    from its PQ codes — score(q, x) = Σ_s lut_q[s][code_s(x)], where
    each query's lookup table holds its subvector dots against every
    codebook entry. Approximates cosine (unit vectors in, so the
    reconstructed dot ≈ cos); recall vs the exact search is pinned in
    tests/test_quantize.py.

    Scale shape: the corpus side carries ONLY (vec_id, s, code) — the
    8-code index, no floats; the per-query LUT is a broadcast of
    n_queries × 8 × 16 rows; scoring is one equi-join on (s, code)
    plus a groupBy(q, doc) decimal-sum of exactly 8 rounded terms —
    addition-order-independent, hence the exact DuckDB twin
    (plans/northstar.PQ_ADC_SQL)."""
    from ..functions.numeric import decimal_sum

    books = books if books is not None else pq_codebooks()
    sub_dim = len(books[0][0])
    cells = pq_encode(emb, books).select(
        "vec_id", F.posexplode("codes").alias("s", "code")
    )
    q = _unit(emb).where(F.col("vec_id") < n_queries)
    per_s = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.array(
                    *[F.round(F.expr(_sub_dot(s * sub_dim + 1, c)), 6) for c in book]
                ).alias("ws"),
            )
            for s, book in enumerate(books)
        ]
    )
    lut = (
        q.select(F.col("vec_id").alias("q_id"), F.explode(per_s).alias("sw"))
        .select("q_id", F.col("sw.s").alias("s"), F.posexplode("sw.ws").alias("code", "w"))
    )
    scored = (
        cells.join(F.broadcast(lut), ["s", "code"])
        .where(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.round(decimal_sum(F.col("w")), 6).alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("q_id", "neighbor_id", "score", "rn")
    )


def dim_stats(emb: DataFrame, dim: int = 64, scale: int = 10_000_000) -> DataFrame:
    """Per-dimension corpus statistics — the calibration pass every
    embedding quantizer/whitener runs first (int8 ranges, PQ codebook
    seeding, mean-centering): n, mean, min, max, variance for each of
    the ``dim`` dimensions. Elements are quantized to round(x·1e7)
    longs FIRST (the centroid recipe) so the sums and sums-of-squares
    are INTEGER partial aggregates that commute exactly on any
    partitioning; floats appear only in the fixed-order finishing
    expressions, 9-dp rounded — which is what makes a distributed
    moment computation hash-oracle-able. One posexplode + one
    groupBy(dim): dim·n rows enter map-side partial aggregation, 64
    rows leave."""
    q = emb.select(F.posexplode("embedding").alias("dim", "x")).select(
        "dim", F.round(F.col("x").cast("double") * scale).cast("long").alias("q")
    )
    agg = q.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s"),
        F.sum(F.col("q") * F.col("q")).alias("ss"),
        F.min("q").alias("mn"),
        F.max("q").alias("mx"),
    )
    s_d = F.col("s").cast("double")
    mean = s_d / (F.col("n") * F.lit(float(scale)))
    var = (F.col("ss").cast("double") - s_d * s_d / F.col("n")) / (
        F.col("n") * F.lit(float(scale) * scale)
    )
    return agg.select(
        F.col("dim").cast("int").alias("dim"),
        F.col("n").cast("int").alias("n"),
        F.round(mean, 9).alias("mean"),
        F.round(F.col("mn").cast("double") / scale, 9).alias("min_val"),
        F.round(F.col("mx").cast("double") / scale, 9).alias("max_val"),
        F.round(var, 9).alias("variance"),
    )


def standardize(emb: DataFrame, stats: DataFrame | None = None, dim: int = 64) -> DataFrame:
    """Apply the ``dim_stats`` calibration to the corpus: per-element
    z = (x − mean)/std (population std; a zero-variance dimension
    passes through centered). The 64-row stats table collapses to two
    broadcast arrays (ordered by dimension) and the transform is one
    row-local zip_with chain — the corpus NEVER shuffles for the
    model, exactly the broadcast-calibration shape of a production
    whitening/int8-scaling stage. Uses the stats' ROUNDED mean and
    9-dp variance so the applied model is the same artifact the
    calibration query publishes (and the DuckDB twin recomputes),
    keeping the output hash-exact; elements round to 6 dp."""
    st = stats if stats is not None else dim_stats(emb, dim=dim)
    arrs = st.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mean"))), lambda s: s["mean"]
        ).alias("means"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "variance"))),
            lambda s: F.sqrt(s["variance"]),
        ).alias("stds"),
    )
    centered = F.zip_with(
        F.col("embedding").cast("array<double>"), F.col("means"), lambda x, m: x - m
    )
    z = F.zip_with(
        centered, F.col("stds"), lambda d, s: F.when(s == 0.0, d).otherwise(d / s)
    )
    return emb.crossJoin(F.broadcast(arrs)).select(
        "vec_id", F.transform(z, lambda x: F.round(x, 6)).alias("z")
    )


def standardize_long(emb: DataFrame, stats: DataFrame | None = None, dim: int = 64) -> DataFrame:
    """The ``standardize`` transform in long (vec_id, dim, z) shape —
    one posexplode over the z array, every output column atomic. This
    is the driver-window face: hash canonicalizers sort by column
    values, and a scalar-typed row set is sortable/hashable anywhere
    (pandas included), while the array face (kept as the pipeline
    artifact) is not. Same broadcast-calibration plan underneath; the
    explode adds no shuffle."""
    z = standardize(emb, stats=stats, dim=dim)
    return z.select("vec_id", F.posexplode("z").alias("dim", "z")).select(
        "vec_id", F.col("dim").cast("int").alias("dim"), "z"
    )
