"""Deterministic sampling / dataset splitting (north-star surface).

A training-data pipeline needs train/validation splits and downsampling
that are REPRODUCIBLE: stable across runs, engines, cluster sizes, and
input partitioning. Spark's ``df.sample()`` cannot provide that — its
RNG is seeded per partition, so the selected rows change whenever the
partition layout does. Hash-bucketing each row's key gives a split
that is a pure function of the data:

    bucket(key) = first two hex chars of md5(salt || '|' || key)

256 uniform buckets, compared lexicographically (ASCII hex order), so
"keep 10%" is ``bucket < '1a'`` (26/256 ≈ 10.16%). md5 exists in both
Spark and DuckDB with identical output, which makes every split
oracle-checkable — and changing ``salt`` derives a fresh independent
split without touching the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 256  # two hex chars
N_BUCKETS4 = 65536  # four hex chars — for rate laws where 1/256
# granularity starves extreme strata (temperature_mix)


def hash_bucket(key: Column, salt: str = "split-v1") -> Column:
    """Two-hex-char bucket ('00'..'ff') — a pure function of (salt, key)."""
    return F.substring(F.md5(F.concat_ws("|", F.lit(salt), key.cast("string"))), 1, 2)


def hash_bucket4(key: Column, salt: str = "split-v1") -> Column:
    """Four-hex-char bucket ('0000'..'ffff') — 65536 uniform buckets
    for samplers whose rate law spans more than two hex digits of
    dynamic range."""
    return F.substring(F.md5(F.concat_ws("|", F.lit(salt), key.cast("string"))), 1, 4)


def hash_bucket_sql(key_expr: str, salt: str = "split-v1") -> str:
    """The identical bucket in DuckDB SQL (for oracle twins)."""
    return f"substring(md5('{salt}' || '|' || CAST({key_expr} AS VARCHAR)), 1, 2)"


def cut_hex(cut: Column, chars: int = 2) -> Column:
    """Hex comparison threshold for an integer bucket cut in
    [0, 16^chars]: the ``chars``-hex-char zero-padded rendering, or a
    'z'-string (> every hex char) when the cut keeps everything — the
    shared tail of every bucket sampler (source_cap,
    quality_weighted_sample, temperature_mix), extracted so a bucket-
    encoding change cannot silently diverge them (code-review r6b
    finding #4)."""
    return F.when(cut >= 16**chars, F.lit("z" * chars)).otherwise(
        F.lpad(F.lower(F.hex(cut)), chars, "0")
    )


def train_val_split(
    df: DataFrame,
    key: str,
    val_buckets: int = 13,
    salt: str = "split-v1",
) -> DataFrame:
    """Tag each row 'val' (``val_buckets``/256 of rows, ≈5% at the
    default 13) or 'train'. Pure projection — no shuffle, no RNG; the
    assignment survives repartitioning, re-runs, and engine changes
    (asserted in tests/test_sampling.py)."""
    cut = format(val_buckets, "02x")
    return df.withColumn(
        "split",
        F.when(hash_bucket(F.col(key), salt) < F.lit(cut), "val").otherwise("train"),
    )


def stratified_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    buckets_by_stratum: dict[str, int],
    default_buckets: int = 0,
    salt: str = "strat-v1",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep
    ≈ buckets_by_stratum[stratum]/256 of each stratum's rows (strata
    absent from the dict keep ``default_buckets``/256, i.e. are
    dropped entirely at the 0 default).

    The rebalancing workhorse of corpus curation ("downsample the
    dominant language/source, keep the tail") — a pure filter on the
    row's own (key, stratum) values: no shuffle, no groupBy, no RNG,
    and the per-stratum rates need no global counts. The stratum →
    cut-off lookup is a literal map expression, so arbitrarily many
    strata stay a single codegen'd projection.
    """
    mapping = F.create_map(
        *[
            F.lit(x)
            for val, buckets in buckets_by_stratum.items()
            for x in (val, format(buckets, "02x"))
        ]
    )
    cut = F.coalesce(mapping[F.col(stratum)], F.lit(format(default_buckets, "02x")))
    return df.where(hash_bucket(F.col(key), salt) < cut)


def deterministic_sample(
    df: DataFrame,
    key: str,
    keep_buckets: int,
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep ≈ keep_buckets/256 of rows, deterministically by key hash.
    The downsampling analog of ``train_val_split`` — the rows kept at
    10 TB are exactly the rows kept when the same keys are re-processed
    on any other cluster."""
    cut = format(keep_buckets, "02x")
    return df.where(hash_bucket(F.col(key), salt) < F.lit(cut))


def source_cap(
    df: DataFrame,
    key: str = "doc_id",
    stratum: str = "source",
    cap: int = 50,
    headroom: int = 2,
    salt: str = "cap-v1",
) -> DataFrame:
    """Per-stratum quota capping: keep at most ``cap`` rows per
    stratum — the RefinedWeb/CCNet-style "no domain dominates the
    corpus" guard. Kept rows are the ``cap`` smallest by
    md5(salt || key) within their stratum (ties → key), so the
    selection is a pure function of the data: reproducible across
    runs, engines, and partition layouts. Returns (key, stratum, rn).

    Two-phase shape for 100 TB: a naive single window
    ``row_number() OVER (PARTITION BY stratum)`` shuffles the ENTIRE
    corpus by stratum, and a dominant stratum (half the web is a
    handful of domains) lands on one task. Instead:

    1. one tiny groupBy(stratum) count (map-side combined), broadcast;
    2. a row-local hash-bucket pre-filter keeps ≈ cap·headroom/n of
       each oversized stratum — survivors shrink from n_s to
       ~cap·headroom per stratum BEFORE any shuffle-by-stratum;
    3. the exact rank runs on survivors only, so the skewed window
       sees O(cap·headroom) rows per stratum, never n_s.

    The pre-filter cut is exact integer math (ceil via DIV), and the
    whole two-phase selection — including which rows phase 2 drops —
    is mirrored verbatim in the DuckDB oracle, so the driver check is
    hash-exact. Phase 2 can only disagree with the single-window
    semantics if fewer than ``cap`` of a stratum's rows fall under the
    cut (P < 1e-9 at headroom 2 via Chernoff for cap ≥ 50);
    tests/test_sampling.py asserts the fixture agreement with the
    one-phase form.
    """
    counts = df.groupBy(stratum).agg(F.count("*").alias("n"))
    cut = F.expr(f"CAST(({N_BUCKETS} * {cap} * {headroom} + n - 1) DIV n AS INT)")
    cuts = counts.select(stratum, F.least(cut, F.lit(N_BUCKETS)).alias("cut"))
    bucket = hash_bucket(F.col(key), salt)
    survivors = (
        df.select(key, stratum)
        .join(F.broadcast(cuts), stratum)
        .where(bucket < cut_hex(F.col("cut")))
    )
    w = Window.partitionBy(stratum).orderBy(bucket, key)
    return (
        survivors.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= cap)
        .select(key, stratum, "rn")
    )


# 16^13 = 2^52: 13 md5 hex chars parse to an integer that a double
# represents EXACTLY, so u and every downstream value are bit-equal in
# any IEEE-754 engine.
_U_DENOM = float(16**13 + 1)


def weighted_priority_sample(
    df: DataFrame,
    key: str,
    weight: str,
    k: int = 50,
    salt: str = "wsample-v1",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    reservoir"): each row draws u ~ U(0,1] from md5(salt || key) and
    gets priority u^(1/w); the k largest priorities are a weighted
    sample without replacement. Returns (key, weight, pr, rn).

    The A-ES scheme is reservoir-style ON PURPOSE: priorities are
    row-local, so the top-k is one TakeOrdered pass — no per-stratum
    counts, no second scan, no RNG state. Hash-derived u makes the
    "random" draw a pure function of (salt, key): the sample is
    reproducible across runs, engines, partitionings, and cluster
    sizes, and re-running with a new salt draws an independent sample.

    Ranking uses ln(u)/w (monotone in u^(1/w) for u in (0,1], w > 0)
    rounded to 9 dp with a key tiebreak, so cross-engine ulp noise in
    ``ln`` cannot reorder the selection — the DuckDB twin is
    hash-exact. Zero/negative weights are excluded (their priority is
    undefined; A-ES requires w > 0). u is never 0: the 13-hex-char
    integer is shifted by +1 into (0, 16^13] before normalizing.
    """
    u = (
        F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(salt), F.col(key).cast("string"))), 1, 13), 16, 10).cast("long")
        + 1
    ).cast("double") / F.lit(_U_DENOM)
    pr = F.round(F.log(u) / F.col(weight), 9)
    from ..functions.ranking import ranked_topk

    # window-free top-k rank (functions/ranking): no WindowExec WARN
    return ranked_topk(
        df.where(F.col(weight) > 0).select(key, weight, pr.alias("pr")),
        [F.desc("pr"), F.col(key)],
        k,
    )


def temperature_mix(
    df: DataFrame,
    key: str = "doc_id",
    stratum: str = "lang",
    alpha: float = 0.5,
    salt: str = "temp-v1",
) -> DataFrame:
    """Temperature-based mixture downsampling (the UniMax/multilingual
    data-mixing recipe): keep each stratum at a rate proportional to
    n_s^(α−1), so the kept counts follow n_s^α — α = 1 reproduces the
    natural distribution, α = 0 equalizes strata, α between flattens
    the head without starving the tail. The smallest stratum keeps
    everything (rate (n_min/n_s)^(1−α) = 1 there); larger strata are
    hash-bucket downsampled toward it. Returns kept (key, stratum,
    cut) rows.

    Portability: the rate needs a real pow(), whose last-ulp behavior
    is not identical across libm implementations — the same situation
    as ln() in ``weighted_priority_sample``, handled the same way:
    round the rate to 9 dp BEFORE the floor to a bucket cut, so an
    ulp of pow noise cannot move the cut except on exact .5e-9
    boundaries (measure-zero for real corpora). Everything after the
    cut is the exact md5-bucket filter. Two-phase shape at scale: one
    tiny groupBy(stratum), a one-row min broadcast, then a pure
    row-local filter — the corpus never shuffles (cf. ``source_cap``).

    Bucket granularity (code-review r6b finding #1): this sampler uses
    the 4-hex-char / 65536-bucket space, NOT the 256-bucket space of
    the fixed-rate samplers — a dominant stratum's keep-rate can span
    many orders of magnitude, and a 1/256 floor would round any rate
    below 0.4% to ZERO, silently deleting the head stratum instead of
    flattening it (at α=0.5 that bites from ~65536× skew; real crawls
    reach it). With 65536 buckets the realized rate is within 1/65536
    of the n^(α−1) law, and starvation needs 16^4^(1/(1−α)) ≈ 4·10⁹×
    skew at α=0.5.
    """
    counts = df.groupBy(stratum).agg(F.count("*").alias("n"))
    n_min = counts.agg(F.min("n").alias("n_min"))
    rate = F.round(
        F.pow(F.col("n_min") / F.col("n"), F.lit(1.0 - alpha)), 9
    )
    cuts = (
        counts.crossJoin(F.broadcast(n_min))
        .select(
            stratum,
            F.least(
                F.lit(N_BUCKETS4), F.floor(N_BUCKETS4 * rate).cast("int")
            ).alias("cut"),
        )
    )
    return (
        df.select(key, stratum)
        .join(F.broadcast(cuts), stratum)
        .where(hash_bucket4(F.col(key), salt) < cut_hex(F.col("cut"), chars=4))
        .select(key, stratum, "cut")
    )


def quality_weighted_sample(
    docs: DataFrame,
    quality: DataFrame,
    key: str = "doc_id",
    stratum: str = "source",
    base_buckets: int = N_BUCKETS,
    salt: str = "mix-v1",
) -> DataFrame:
    """Data-derived source mixing: keep each stratum at a rate
    proportional to its mean quality (the best stratum keeps
    ``base_buckets``/256, a stratum at half its mean quality keeps
    half that). Returns the kept (key, stratum, cut) rows.

    ``quality`` is (key, quality double) — e.g.
    textstats.quality_score output. Everything after quantization is
    EXACT integer arithmetic, so the data-dependent rates are
    bit-reproducible across engines and partitionings:

    - per-stratum quality sums use round(q·10⁶) longs (commutative);
    - the best stratum is argmax on the fixed-point mean
      (s·10¹² DIV n in DECIMAL — exact), never a float division;
    - each cut-off is floor(base·S_s·n_max / (n_s·S_max)) in integer
      DIV (documented 64-bit headroom: |S|≤10⁶·rows, so products stay
      under 2⁶³ up to ~10⁸ rows per stratum; past that, promote to
      DECIMAL(38,0) in both engines).

    Two-phase shape at scale: one groupBy(stratum) over quantized
    longs (map-side partials), the tiny per-stratum table broadcast
    back, then the pure hash_bucket filter — the corpus itself never
    shuffles.
    """
    j = docs.select(key, stratum).join(
        quality.select(key, F.round(F.col("quality") * 1_000_000).cast("long").alias("q6")),
        key,
    )
    stats = j.groupBy(stratum).agg(F.sum("q6").alias("s"), F.count("*").alias("n"))
    # argmax by exact integer math, never a float division: rank on
    # the mean scaled to a fixed point, s·10¹² DIV n — exact DECIMAL
    # arithmetic that preserves the ordering of any two means that
    # differ by ≥10⁻¹² (6-dp quality means can't sit closer unless
    # equal, and exact ties fall to the stratum-name tiebreak, which
    # both engines apply identically).
    stats = stats.withColumn(
        "mean12",
        F.expr("CAST((CAST(s AS DECIMAL(38,0)) * 1000000000000) DIV n AS DECIMAL(38,0))"),
    )
    # argmax = orderBy + limit(1): TakeOrdered, no window, no WARN
    best = stats.orderBy(F.desc("mean12"), stratum).limit(1).select(
        F.col("s").alias("s_max"), F.col("n").alias("n_max")
    )
    cuts = stats.crossJoin(F.broadcast(best)).select(
        stratum,
        F.expr(f"CAST(({base_buckets} * s * n_max) DIV (n * s_max) AS INT)").alias("cut"),
    )

    return (
        docs.select(key, stratum)
        .join(F.broadcast(cuts), stratum)
        .where(hash_bucket(F.col(key), salt) < cut_hex(F.col("cut")))
        .select(key, stratum, "cut")
    )
