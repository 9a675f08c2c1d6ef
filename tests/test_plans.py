"""Plan-quality guards: the physical-plan properties that make these
queries scale (pushdown, pruning, broadcasts, no cartesians, partial
aggregation) asserted against .explain output so a regression that
keeps results correct but wrecks the plan still fails CI."""

from __future__ import annotations

import re

import pytest

from mapreduce_cs416_spark.plans.registry import EXTRA_QUERIES, QUERIES

ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}


def _plan(spark, sf_dir, name: str) -> str:
    df = ALL_QUERIES[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _nodes(plan: str, op: str) -> int:
    """Count physical operators by their numbered headers — formatted
    explain mentions every node twice (tree + detail section)."""
    return len(re.findall(rf"\(\d+\) {op}\b", plan))


def test_q1_scan_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    read_schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    # 7 columns, not the full 11-column lineitem schema
    assert len(read_schema.split(",")) == 7, read_schema
    # partial + final hash aggregation around a single exchange
    assert _nodes(plan, "HashAggregate") == 2
    assert _nodes(plan, "Exchange") == 1


def test_q3_broadcasts_both_dimensions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_shipping_priority")
    assert _nodes(plan, "BroadcastHashJoin") == 2
    assert "TakeOrderedAndProject" in plan  # top-k without a global sort
    assert "CartesianProduct" not in plan


def test_wordcount_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "wordcount")
    assert _nodes(plan, "Exchange") == 1
    assert _nodes(plan, "HashAggregate") == 2  # map-side partial + final


def test_dedup_ngram_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_ngram_jaccard")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_near_dup_lsh_is_not_all_pairs(spark, sf_dir):
    """The LSH scale path must generate candidates through an
    equi-join on (table, bucket), never a cartesian over the corpus.
    (The driver-oracled `similarity_cosine_near_dup` is deliberately
    the brute-force exact baseline — see plans/northstar.py — so the
    no-all-pairs guard applies to its LSH twin.)"""
    plan = _plan(spark, sf_dir, "similarity_cosine_near_dup_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_similarity_topk_broadcasts_queries(spark, sf_dir):
    """Brute-force top-k: the corpus side must never shuffle — the
    only join is against the broadcast query set."""
    plan = _plan(spark, sf_dir, "similarity_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the only exchange is the final per-query top-k window
    assert _nodes(plan, "Exchange") == 1


def test_events_session_partial_agg_before_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_session")
    assert "MergingSessions" in plan
    # partial aggregation runs before the exchange
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_global_sort_uses_range_partitioning(spark, sf_dir):
    """A full orderBy must plan a distributed range-partitioned sort
    (sample → range exchange → per-partition sort), never a
    single-partition collapse."""
    df = QUERIES["wordcount"].fn(spark, sf_dir).orderBy("word")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "rangepartitioning" in plan.lower()
    assert "SinglePartition" not in plan


@pytest.mark.parametrize(
    "name", ["q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier", "asof_join_events"]
)
def test_no_python_in_relational_hot_path(spark, sf_dir, name):
    """The relational surface must stay JVM-side: no Python eval nodes
    (Batch/ArrowEvalPython, FlatMapGroupsInPandas...) in these plans."""
    plan = _plan(spark, sf_dir, name)
    assert "Python" not in plan, name


def test_text_doc_profile_single_scan_no_shuffle(spark, sf_dir):
    """The consolidated text profile must be one projection-only pass:
    a single corpus scan, no joins, no exchanges (the naive form — 4
    scans + 3 doc_id joins — is exactly what it replaced)."""
    plan = _plan(spark, sf_dir, "text_doc_profile")
    assert _nodes(plan, "Scan parquet") == 1
    assert _nodes(plan, "Exchange") == 0
    assert "Join" not in plan


def test_multimodal_doc_profile_one_python_stage_no_join(spark, sf_dir):
    """The consolidated multimodal profile: one scan, ONE mapInPandas
    stage (features + resize fused into the same Arrow batch), no
    joins, no exchanges."""
    plan = _plan(spark, sf_dir, "multimodal_doc_profile")
    assert _nodes(plan, "Scan parquet") == 1
    assert _nodes(plan, "MapInPandas") == 1
    assert _nodes(plan, "Exchange") == 0
    assert "Join" not in plan


def test_scalar_part_kernels_single_scan(spark, sf_dir):
    """The consolidated part kernel is one wide projection over one
    scan — not a self-join of the granular kernels."""
    plan = _plan(spark, sf_dir, "scalar_part_kernels")
    assert _nodes(plan, "Scan parquet") == 1
    assert _nodes(plan, "Exchange") == 0


def test_repetition_stats_zero_shuffle(spark, sf_dir):
    """The row-local top-word/top-bigram formulation must stay a pure
    projection — no Exchange, no aggregate, no join."""
    plan = _plan(spark, sf_dir, "text_repetition_stats")
    assert _nodes(plan, "Exchange") == 0
    assert _nodes(plan, "HashAggregate") == 0
    assert "Join" not in plan


def test_stratified_sample_pure_filter(spark, sf_dir):
    """Per-stratum sampling is a filter on the row's own values: no
    shuffle, no aggregation, no global counts."""
    plan = _plan(spark, sf_dir, "corpus_stratified_sample")
    assert _nodes(plan, "Exchange") == 0
    assert _nodes(plan, "HashAggregate") == 0
    assert "Join" not in plan


def test_decontaminate_broadcasts_benchmark_set(spark, sf_dir):
    """The benchmark shingle set joins the corpus as a broadcast — the
    corpus side must never shuffle into a sort-merge join."""
    plan = _plan(spark, sf_dir, "text_decontaminate")
    assert _nodes(plan, "BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_centroid_no_cartesian_partial_agg(spark, sf_dir):
    """The (lang, dim) integer sums must partial-aggregate map-side
    (2 HashAggregates around the exchange) and the centroid table must
    come back as a broadcast, never a shuffle of the corpus."""
    plan = _plan(spark, sf_dir, "embedding_centroid_scores")
    assert "CartesianProduct" not in plan
    assert _nodes(plan, "BroadcastHashJoin") >= 1
    assert _nodes(plan, "HashAggregate") >= 2


def test_dedup_components_star_rounds_have_partial_agg(spark):
    """One large-star round = symmetric edges → min-neighbor agg →
    join; the agg must be partial+final and the join must not
    degenerate to a cartesian."""
    from mapreduce_cs416_spark.operators.graph import _large_star

    spark_df = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    plan = _large_star(spark_df)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    assert _nodes(plan, "HashAggregate") >= 2


def test_pack_sequences_no_single_partition_window(spark, sf_dir):
    """The global running offset must come from the distributed
    prefix sum — never an Exchange SinglePartition feeding a global
    window (the one-task-for-100TB anti-pattern)."""
    plan = _plan(spark, sf_dir, "corpus_pack_sequences")
    assert "Exchange SinglePartition" not in plan
    assert _nodes(plan, "Window") >= 1  # the per-partition parallel window


def test_chunk_documents_zero_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "corpus_chunk_documents")
    assert _nodes(plan, "Exchange") == 0
    assert "Join" not in plan


def test_aqe_skew_join_splits_hot_partition(spark):
    """The 100 TB hazard class previously covered only by prose
    (VERDICT r5 item 8): a shuffle join with one hot key must not
    funnel that key through a single task. With AQE's skew-join
    handling (on in session.py) Spark detects the oversized shuffle
    partition at runtime and splits it across multiple tasks --
    asserted here on the executed adaptive plan of a deliberately
    skewed join, with the detection thresholds lowered to fixture
    scale. operators/skew.salted_holistic_agg covers the same hazard
    for holistic aggregates (tests/test_skew.py)."""
    keys = [
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.coalescePartitions.enabled",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    import pyspark.sql.functions as F

    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        # force a shuffle (sort-merge) join: broadcast would bypass the
        # shuffle whose skew we are testing
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        # left: 95% of rows share key 0 (payload makes bytes dominate);
        # right: uniform small dimension side
        left = spark.range(0, 40_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id") % 97).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id")).alias("payload"),
        )
        right = spark.range(0, 97).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        # a partial-only aggregate downstream: it imposes no
        # distribution requirement on the join output, so
        # OptimizeSkewedJoin is free to split the hot partition (a
        # groupBy on the join key would pin the join's partitioning
        # and legitimately suppress the split)
        # max(length(payload)) keeps the wide payload column alive
        # through the shuffle (count alone would let column pruning
        # shrink the hot partition below the detection threshold)
        joined = left.join(right, "k").agg(
            F.count("*").alias("n"), F.max(F.length("payload")).alias("mx")
        )
        [row] = joined.collect()
        assert row["n"] == 40_000  # correctness unaffected by the split

        # the executed (adaptive, final) plan must mark the SMJ skew=true
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_phrase_search_adjacency_is_equi_join(spark, sf_dir):
    """Phrase adjacency must be (doc_id, pos) equi-joins over filtered
    postings — never a cartesian/theta join over the token stream."""
    plan = _plan(spark, sf_dir, "text_phrase_search")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_ingest_no_corpus_self_join(spark, sf_dir):
    """The ingest gate joins the (small) new shard against the corpus
    postings — no cartesian, and the corpus scan must keep parquet
    pushdown."""
    plan = _plan(spark, sf_dir, "dedup_incremental_ingest")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "PushedFilters" in plan


def test_transition_matrix_window_is_partitioned(spark, sf_dir):
    """The lead() window must run partitioned by user — a global
    (single-partition) window over the event stream is the 100 TB
    anti-pattern this family exists to avoid."""
    plan = _plan(spark, sf_dir, "events_transition_matrix")
    assert _nodes(plan, "Window") >= 1
    assert "Exchange SinglePartition" not in plan


def test_anomaly_zscore_survives_zero_variance(spark):
    """A type seen on a single day (or with constant daily counts) has
    exactly zero variance; the z-score must be NULL and the flag false
    — not an ANSI DIVIDE_BY_ZERO crash, and not a NaN that compares
    >= 2.0 as anomalous (code-review r6 finding #1)."""
    import pyspark.sql.functions as F

    rows = [
        # 'launch': one single day -> d=1, var=0
        ("launch", "2026-01-01 10:00:00", 5.0),
        ("launch", "2026-01-01 11:00:00", 5.0),
        # 'steady': constant daily counts across 3 days -> var=0
        *[("steady", f"2026-01-0{d} 10:00:00", 1.0) for d in (1, 2, 3)],
        # 'spiky': genuinely varying counts
        ("spiky", "2026-01-01 10:00:00", 1.0),
        ("spiky", "2026-01-02 10:00:00", 1.0),
        ("spiky", "2026-01-02 11:00:00", 1.0),
        ("spiky", "2026-01-02 12:00:00", 1.0),
    ]
    events = spark.createDataFrame(
        [(t, ts, i, v) for i, (t, ts, v) in enumerate(rows)],
        "event_type string, ts_s string, event_id long, value double",
    ).select("event_type", F.col("ts_s").cast("timestamp").alias("ts"), "event_id", "value")

    # drive the registered function body through a monkeypatched loader
    import mapreduce_cs416_spark.plans.events as em

    orig = em._ev
    try:
        em._ev = lambda _spark, _sf: events
        out = em.events_anomaly_zscore(spark, "unused").collect()
    finally:
        em._ev = orig
    by = {}
    for r in out:
        by.setdefault(r["event_type"], []).append(r)
    assert all(r["z"] is None and r["is_anomaly"] is False for r in by["launch"])
    assert all(r["z"] is None and r["is_anomaly"] is False for r in by["steady"])
    assert any(r["z"] is not None for r in by["spiky"])


def test_checkpoint_hidden_segments_keep_plan_quality(spark, sf_dir):
    """The eager localCheckpoints in the shingle/phrase operators hide
    their upstream segment (scan -> explode -> filter/hash) from the
    registered queries' .explain — so audit that segment directly in
    its unmaterialized form (code-review r6b finding #3): the corpus
    scan must keep column pruning, and the phrase pipeline up to the
    rank must stay cartesian-free with its term filter applied before
    the joins."""
    from mapreduce_cs416_spark.operators.dedup import shingle_postings
    from mapreduce_cs416_spark.operators.textstats import phrase_search
    from mapreduce_cs416_spark.sources.tables import load_table

    def fmt(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )

    docs = load_table(spark, sf_dir, "documents")
    post_plan = fmt(shingle_postings(docs, 3, materialize=False))
    read_schema = re.search(r"ReadSchema: struct<([^>]*)>", post_plan).group(1)
    # only doc_id + text leave the scan, not the full documents schema
    assert sorted(c.split(":")[0] for c in read_schema.split(",")) == ["doc_id", "text"]
    # narrow pipeline: the only allowed exchange is _spread's
    # round-robin repartition of a small single-row-group corpus —
    # never a hash shuffle (no agg/join in this segment)
    assert "Exchange hashpartitioning" not in post_plan
    assert "Exchange rangepartitioning" not in post_plan

    full = fmt(phrase_search(docs, ["table", "hash"], materialize=False))
    assert "CartesianProduct" not in full
    assert "BroadcastNestedLoopJoin" not in full
    # the phrase-term filter sits below the adjacency joins
    assert re.search(r"tok#\d+ IN \(hash,table\)|tok#\d+ IN \(table,hash\)", full), full[:1200]


def test_single_partition_classifier_scalar_vs_bulk(spark):
    """The PLANS.md SinglePartition column is driven by the executed
    plan's shuffleRecordsWritten metric: a one-row global aggregate
    classifies scalar-ok, a repartition(1) of real data classifies as
    the BULK flag with the measured row count."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from plan_report import _single_partition_rows, classify_single_partition

    from pyspark.sql import functions as F

    scalar = spark.range(0, 50_000).agg(F.sum("id").alias("s"))
    scalar.collect()
    rows = _single_partition_rows(scalar)
    assert rows is not None and rows and max(rows) <= 32  # one partial row per task
    label = classify_single_partition("", rows)
    assert label and "scalar-ok" in label

    bulk = spark.range(0, 50_000).repartition(1).withColumn("v", F.col("id") * 2)
    bulk.collect()
    rows = _single_partition_rows(bulk)
    assert rows is not None and max(rows) == 50_000
    label = classify_single_partition("", rows)
    assert label == "SinglePartition BULK (50000 rows)"

    none_df = spark.range(0, 100).withColumn("v", F.col("id") + 1)
    none_df.collect()
    assert classify_single_partition("no such node", _single_partition_rows(none_df)) is None


def test_driver_window_schemas_are_atomic(spark, sf_dir):
    """Registry screen (VERDICT r8 item 1): the round driver's
    canonicalizer sorts the pandas result by every column and hashes
    it — array/map/struct columns throw `unhashable type` there
    (embedding_standardize was r8's only red row for exactly this).
    Every driver-window query must therefore emit only atomic-typed
    columns; array-shaped faces belong in EXTRA_QUERIES, whose parity
    harness tuples rows and handles nesting."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad: dict[str, list[str]] = {}
    for name, spec in QUERIES.items():
        df = spec.fn(spark, sf_dir)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, (
        "driver-window rows must be scalar-typed for the driver's "
        f"pandas canonicalizer; move array faces to EXTRA_QUERIES: {bad}"
    )
