"""Deterministic splitting: the whole point is that the selection is a
pure function of (salt, key) — invariant to partitioning and re-runs,
which Spark's partition-seeded sample() cannot offer."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_cs416_spark.operators import sampling


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_split_is_partition_invariant(spark):
    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    base = sampling.train_val_split(docs, key="doc_id")
    val_1 = _ids(base.where(F.col("split") == "val"))
    for n_parts in (1, 7, 64):
        again = sampling.train_val_split(docs.repartition(n_parts), key="doc_id")
        assert _ids(again.where(F.col("split") == "val")) == val_1
    assert val_1, "val split must be non-empty at n=2000"


def test_split_fraction_close_to_nominal(spark):
    docs = spark.range(0, 20000).select(F.col("id").alias("doc_id"))
    out = sampling.train_val_split(docs, key="doc_id", val_buckets=13)
    frac = out.where(F.col("split") == "val").count() / 20000
    # nominal 13/256 ≈ 5.08%; md5 uniformity keeps n=20000 well inside ±2pp
    assert 0.03 < frac < 0.07, frac


def test_different_salts_give_independent_samples(spark):
    docs = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
    a = set(_ids(sampling.deterministic_sample(docs, "doc_id", 26, salt="a")))
    b = set(_ids(sampling.deterministic_sample(docs, "doc_id", 26, salt="b")))
    assert a != b
    # overlap ≈ |a|·26/256 for independent hashes; just assert it is
    # far from identical and far from disjoint
    assert 0 < len(a & b) < min(len(a), len(b))


def test_sample_is_subset_and_deterministic(spark):
    docs = spark.range(0, 3000).select(F.col("id").alias("doc_id"))
    s1 = _ids(sampling.deterministic_sample(docs, "doc_id", 26))
    s2 = _ids(sampling.deterministic_sample(docs.repartition(11), "doc_id", 26))
    assert s1 == s2
    assert 0 < len(s1) < 3000


def test_stratified_sample_respects_per_stratum_rates(spark):
    docs = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "big").otherwise("small").alias("grp"),
    )
    out = sampling.stratified_sample(
        docs, key="doc_id", stratum="grp", buckets_by_stratum={"big": 26, "small": 128}
    )
    kept = out.groupBy("grp").count().collect()
    frac = {r["grp"]: r["count"] / 10000 for r in kept}
    assert 0.07 < frac["big"] < 0.13, frac
    assert 0.45 < frac["small"] < 0.55, frac


def test_stratified_sample_unlisted_stratum_dropped_and_deterministic(spark):
    docs = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "keep").otherwise("other").alias("grp"),
    )
    out1 = sampling.stratified_sample(docs, key="doc_id", stratum="grp", buckets_by_stratum={"keep": 128})
    assert out1.where(F.col("grp") == "other").count() == 0
    out2 = sampling.stratified_sample(
        docs.repartition(17), key="doc_id", stratum="grp", buckets_by_stratum={"keep": 128}
    )
    assert _ids(out1) == _ids(out2)


def test_quality_weighted_sample_scales_rates_with_mean_quality(spark):
    # source "good" has mean quality exactly 2x source "poor" → poor's
    # cut must be floor(256 * (s_poor/n) / (s_good/n)) = 128
    n = 4000
    docs = spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "good").otherwise("poor").alias("source"),
    )
    quality = spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 0.8).otherwise(0.4).alias("quality"),
    )
    out = sampling.quality_weighted_sample(docs, quality)
    cuts = {r["source"]: r["cut"] for r in out.select("source", "cut").distinct().collect()}
    assert cuts == {"good": 256, "poor": 128}
    kept = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert kept["good"] == n // 2  # cut 256 keeps everything
    assert 0.4 < kept["poor"] / (n // 2) < 0.6  # ≈128/256
    # deterministic under repartitioning (exact integer rates + md5 buckets)
    again = sampling.quality_weighted_sample(docs.repartition(9), quality.repartition(4))
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


# --------------------------------------------------------------- source_cap


def test_source_cap_agrees_with_single_window(spark):
    """The two-phase plan (broadcast cuts -> hash pre-filter -> rank on
    survivors) must select exactly the rows the naive one-phase
    row_number() OVER (PARTITION BY stratum ORDER BY md5, key) would —
    the pre-filter only sheds rows that cannot be in the top-cap."""
    from pyspark.sql import Window

    docs = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("source"),
    )
    two_phase = {
        (r["doc_id"], r["rn"])
        for r in sampling.source_cap(docs, cap=25).collect()
    }
    bucket = sampling.hash_bucket(F.col("doc_id"), "cap-v1")
    w = Window.partitionBy("source").orderBy(bucket, "doc_id")
    one_phase = {
        (r["doc_id"], r["rn"])
        for r in docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 25)
        .collect()
    }
    assert two_phase == one_phase and len(two_phase) == 7 * 25


def test_source_cap_respects_cap_and_small_strata(spark):
    """Strata at/below the cap are kept whole (cut saturates at 256 ->
    'zz' keeps every bucket); oversized strata return exactly cap."""
    docs = spark.range(0, 460).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 400, "big").otherwise("small").alias("source"),
    )
    out = sampling.source_cap(docs, cap=100)
    sizes = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"big": 100, "small": 60}


def test_source_cap_is_partition_invariant(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("source"),
    )
    base = sorted((r["doc_id"], r["rn"]) for r in sampling.source_cap(docs, cap=40).collect())
    for n_parts in (1, 13, 64):
        again = sorted(
            (r["doc_id"], r["rn"])
            for r in sampling.source_cap(docs.repartition(n_parts), cap=40).collect()
        )
        assert again == base


# ------------------------------------------------- weighted priority sample


def test_weighted_sample_partition_invariant(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 100 + 1).alias("wt")
    )
    base = [
        (r["doc_id"], r["rn"])
        for r in sampling.weighted_priority_sample(docs, "doc_id", "wt", k=60).collect()
    ]
    again = [
        (r["doc_id"], r["rn"])
        for r in sampling.weighted_priority_sample(
            docs.repartition(19), "doc_id", "wt", k=60
        ).collect()
    ]
    assert base == again and len(base) == 60


def test_weighted_sample_biases_toward_heavy_rows(spark):
    """A-ES inclusion probability rises with weight: rows weighted
    1000x more than the rest must dominate a small sample (each heavy
    row's priority ln(u)/w sits ~1000x closer to 0)."""
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 20, 10_000).otherwise(10).alias("wt"),
    )
    got = {
        r["doc_id"]
        for r in sampling.weighted_priority_sample(docs, "doc_id", "wt", k=20).collect()
    }
    heavy = got & set(range(20))
    assert len(heavy) >= 15, f"only {len(heavy)} of 20 heavy rows selected"


def test_weighted_sample_excludes_nonpositive_weights(spark):
    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 0).otherwise(5).alias("wt"),
    )
    got = {
        r["doc_id"]
        for r in sampling.weighted_priority_sample(docs, "doc_id", "wt", k=100).collect()
    }
    assert got == {i for i in range(100) if i % 2 == 1}


def test_weighted_sample_salt_draws_independent_sample(spark):
    docs = spark.range(0, 5000).select(F.col("id").alias("doc_id"), F.lit(1).alias("wt"))
    a = {
        r["doc_id"]
        for r in sampling.weighted_priority_sample(docs, "doc_id", "wt", k=100, salt="s1").collect()
    }
    b = {
        r["doc_id"]
        for r in sampling.weighted_priority_sample(docs, "doc_id", "wt", k=100, salt="s2").collect()
    }
    assert a != b and 0 < len(a & b) < 100


def test_temperature_mix_flattens_the_head(spark, sf_dir):
    """alpha=0.5 must downsample the dominant stratum toward the
    smallest (kept ~ n^alpha): the smallest stratum keeps everything
    (cut 256), the largest keeps a strictly smaller fraction, and the
    selection is a pure function of doc_id (partition-invariant)."""
    from mapreduce_cs416_spark.operators.sampling import temperature_mix
    from mapreduce_cs416_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_by = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    out = temperature_mix(docs, stratum="lang", alpha=0.5).collect()
    kept = {}
    cuts = {}
    for r in out:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
        cuts[r["lang"]] = r["cut"]
    smallest = min(n_by, key=n_by.get)
    largest = max(n_by, key=n_by.get)
    assert cuts[smallest] == 65536 and kept[smallest] == n_by[smallest]
    assert cuts[largest] < 65536 and kept[largest] < n_by[largest]
    # partition invariance
    again = temperature_mix(docs.repartition(13), stratum="lang", alpha=0.5).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in out)


def test_temperature_mix_survives_extreme_skew(spark):
    """code-review r6b finding #1: a 256-bucket space would floor a
    dominant stratum's keep-rate to zero once skew exceeds ~65536x
    (alpha=0.5) and DELETE the head instead of flattening it. With the
    65536-bucket space a synthetic 10^6x-skew stratum must keep a
    nonzero slice close to the n^alpha law."""
    import pyspark.sql.functions as F

    from mapreduce_cs416_spark.operators.sampling import temperature_mix

    big = spark.range(0, 1_000_000).select(F.col("id").alias("doc_id"), F.lit("head").alias("lang"))
    tiny = spark.range(1_000_000, 1_000_001).select(
        F.col("id").alias("doc_id"), F.lit("tail").alias("lang")
    )
    out = temperature_mix(big.unionByName(tiny), stratum="lang", alpha=0.5)
    kept = {r["lang"]: r["cnt"] for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    # law: head keeps ~ n*(n_min/n)^0.5 = sqrt(n*n_min) = 1000 docs
    assert kept.get("tail", 0) == 1
    assert 500 <= kept.get("head", 0) <= 2000, kept
