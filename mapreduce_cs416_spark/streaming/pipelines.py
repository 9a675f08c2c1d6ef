"""Structured Streaming twins of plans/events.py (SURVEY.md §2.C
"event-time windows"; the reference itself is strictly batch — its
hard map→reduce barrier, mr/coordinator.go:78-87 — so this family is
the engine's incremental-execution extension).

Design rules:

- The *same* window()/session_window() expressions as the batch
  queries, so a pipeline validated in batch runs incrementally
  unchanged (that equivalence is asserted by tests/test_streaming.py
  via the availableNow trigger — process-everything-then-stop).
- Watermarks bound state: a 1-hour watermark means late events beyond
  1 hour are dropped and window state older than the watermark is
  evicted — the property that makes these queries runnable forever at
  100 TB/day, unlike an unbounded groupBy.
- File source here (the driver's parquet fixtures); swapping in a
  Kafka source is a one-line change at ``stream_events`` since
  everything downstream is declarative.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import decimal_sum
from ..sources.tables import load_table, utcify


def _stream_dir(src: str, copies: int = 1) -> str:
    """The file source monitors a *directory*; the driver fixtures are
    single files, so expose one through a symlink dir (production
    streams point at a directory or Kafka and skip this). With
    ``copies`` > 1 the same file is linked under several names, so a
    reader capped at one file per trigger replays the fixture as that
    many identical micro-batches — the input shape that makes
    cross-batch state (dedup, running counts) observable in tests."""
    if not os.path.isfile(src):
        return src
    d = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream",
        hashlib.md5(f"{src}|{copies}".encode()).hexdigest()[:12],
    )
    os.makedirs(d, exist_ok=True)
    for i in range(copies):
        prefix = f"copy{i}_" if copies > 1 else ""
        link = os.path.join(d, prefix + os.path.basename(src))
        if not os.path.exists(link):
            os.symlink(src, link)
    return d


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an unbounded stream (file source, one parquet file =
    one micro-batch input; schema from the batch reader so the
    nanos-timestamp normalization matches load_table exactly)."""
    batch = load_table(spark, sf_dir, "events")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = _stream_dir(f"{sf_dir}/events.parquet")
    # file sources need an explicit schema: use the raw (pre-conversion)
    # one, where ts arrives as long nanos, and normalize it exactly like
    # sources/tables._load_events does for batch
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = spark.readStream.schema(raw_schema).parquet(src)
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return utcify(raw).select(*batch.columns)


def stream_events_replayed(spark: SparkSession, sf_dir: str, copies: int = 2) -> DataFrame:
    """events replayed ``copies`` times as SEPARATE micro-batches
    (maxFilesPerTrigger=1, honored by the availableNow trigger): every
    event_id arrives again in a later batch, so stateful operators
    must actually carry state across batches to be correct —
    streaming_dedup must drop the replays, running_counts_stateful
    must accumulate them. tests/test_streaming.py drives both."""
    batch = load_table(spark, sf_dir, "events")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = f"{sf_dir}/events.parquet"
    raw_schema = spark.read.parquet(src).schema
    raw = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_stream_dir(src, copies=copies))
    )
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return utcify(raw).select(*batch.columns)


def streaming_tumbling(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Incremental twin of plans/events.events_tumbling: tumbling
    1-hour windows per event type. Watermark evicts closed windows'
    state; output schema matches the batch query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), decimal_sum(F.col("value"), "sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def streaming_sliding(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Incremental twin of events_sliding (1 h window, 30 min slide)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), decimal_sum(F.col("value"), "sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def streaming_session(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Incremental twin of events_session: per-user session windows
    with an inactivity gap. Session state merges adjacent windows as
    events arrive and is evicted once the watermark passes a session's
    close — the streaming-native form of the batch gaps-and-islands
    rewrite."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), decimal_sum(F.col("value"), "sum_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events", "sum_value")
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id: dropDuplicates keeps a state
    store of seen keys; the watermark bounds it to one hour of ids
    (late duplicates beyond that are out of contract). This is the
    streaming face of operators/dedup.exact_dedup_stats."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def running_counts_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-event-type counts and value sums carried in explicit GroupState
    across micro-batches (the arbitrary-state API the built-in
    aggregations sit on; the hook for operators Spark lacks).
    Arrow-batched: each group's rows arrive as pandas frames.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("s", DoubleType())]
    )

    def update(key, pdf_iter, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        import pandas as pd

        yield pd.DataFrame({"event_type": [key[0]], "n_events": [n], "sum_value": [s]})

    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def streaming_funnel_stateful(events: DataFrame) -> DataFrame:
    """Per-user funnel state machine (view → click → purchase) via
    applyInPandasWithState — the streaming face of
    plans/events.events_funnel. GroupState per user carries the three
    earliest qualifying timestamps as int64 micros; each micro-batch
    is processed in event-time order and every transition is a
    min-update, so the operator is IDEMPOTENT under replayed input
    (at-least-once sources) — tests/test_streaming.py replays the
    full fixture twice and asserts the updates converge to the batch
    result.

    Contract: batch==stream equivalence holds when batches arrive in
    event-time order (a replay of already-seen events is fine). An
    out-of-order VIEW earlier than everything seen could retroactively
    qualify an already-discarded click; supporting that would require
    buffering all events per user (what the batch query effectively
    does) instead of three scalars per user — the classic
    streaming-funnel state/ordering trade-off, here resolved for
    bounded state."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("view_ts", TimestampType()),
            StructField("click_ts", TimestampType()),
            StructField("purchase_ts", TimestampType()),
            StructField("stage", IntegerType()),
        ]
    )
    state_schema = StructType(
        [StructField("v", LongType()), StructField("c", LongType()), StructField("p", LongType())]
    )

    def update(key, pdf_iter, state: GroupState):
        v, c, p = state.get if state.exists else (None, None, None)
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values("ts", kind="mergesort")
        for ts, et in zip(rows["ts"], rows["event_type"]):
            us = int(pd.Timestamp(ts).value // 1000)
            if et == "view":
                v = us if v is None else min(v, us)
            elif et == "click" and v is not None and us >= v:
                c = us if c is None else min(c, us)
            elif et == "purchase" and c is not None and us >= c:
                p = us if p is None else min(p, us)
        state.update((v, c, p))
        to_ts = lambda us: pd.Timestamp(us * 1000) if us is not None else pd.NaT  # noqa: E731
        stage = (v is not None) + (c is not None) + (p is not None)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "view_ts": [to_ts(v)],
                "click_ts": [to_ts(c)],
                "purchase_ts": [to_ts(p)],
                "stage": [stage],
            }
        )

    return (
        events.select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def streaming_attribution_join(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stream-stream INNER JOIN with an event-time range condition —
    the attribution shape: each purchase joined to the same user's
    clicks from the preceding hour. Both sides carry watermarks and
    the join predicate bounds event-time distance, which is what lets
    Spark evict buffered rows once the watermark passes click_ts +
    1 h — bounded state forever, the stream-stream analog of the
    batch range_band_join. Works identically over the batch events
    table (no watermark needed there); tests/test_streaming.py
    asserts that equivalence via availableNow + append mode."""
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + interval 1 hour"
        ),
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
    )


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents as an unbounded stream (file source) — the ingestion
    face of the corpus: in production this is the directory new crawl
    shards land in."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return spark.readStream.schema(schema).parquet(
        _stream_dir(f"{sf_dir}/documents.parquet")
    )


def streaming_corpus_ingest(docs: DataFrame, min_quality: float = 0.46) -> DataFrame:
    """Incremental corpus ingestion: the single-pass quality profile
    (textstats.doc_profile — projection-only, so it is legal in append
    mode with zero state), the deterministic train/val tag, and the
    quality floor, applied to documents AS THEY ARRIVE. The exact same
    function body runs on the batch table — tests/test_streaming.py
    asserts stream == batch row-for-row via availableNow. This is the
    streaming face of plans/northstar.corpus_clean_pipeline's profile
    stage (the near-dup removal stage stays batch: pair joins over the
    full corpus are a compaction job, not a per-record stream op)."""
    from ..operators import sampling, textstats

    prof = textstats.doc_profile(docs)
    tagged = sampling.train_val_split(prof, key="doc_id")
    return tagged.where(F.col("quality") >= min_quality).select(
        "doc_id", "pred_lang", "quality", "n_tokens", "split"
    )


def stream_documents_replayed(spark: SparkSession, sf_dir: str, copies: int = 2) -> DataFrame:
    """documents replayed as ``copies`` identical single-file
    micro-batches (cf. stream_events_replayed) — makes cross-batch
    aggregation state observable: a correct streaming sketch must
    ACCUMULATE across batches (counters double under a doubled input),
    unlike dedup state which must absorb replays."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_stream_dir(f"{sf_dir}/documents.parquet", copies=copies))
    )


def streaming_cms_sketch(docs: DataFrame) -> DataFrame:
    """Incremental count-min sketch maintenance: each arriving
    document's tokens update the (r, bucket) counter table — a plain
    streaming aggregation (complete mode) whose state is the sketch
    itself, ≤ depth×width rows FOREVER regardless of stream length or
    vocabulary growth. That bounded-state property is exactly why a
    sketch (and not an exact groupBy(token), whose state is the
    unbounded vocabulary) is the right frequency monitor on an
    infinite ingest stream; any moment's sketch answers heavy-hitter /
    point-frequency queries via ``sketches.cms_estimate`` without
    rescanning history. The IDENTICAL function body runs on the batch
    table — tests/test_streaming.py asserts stream == batch counter
    for counter via availableNow."""
    from ..functions.text import words_col
    from ..operators import sketches

    toks = docs.select(F.explode(words_col("text")).alias("token"))
    return sketches.cms_build(toks)


def streaming_source_token_counts(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """Incremental per-(source, token) counters against a FIXED
    broadcast vocabulary — the stateful half of the distribution-drift
    monitor (textstats.source_unigram_kl). The vocabulary is a batch
    snapshot artifact (vocab.build_vocab), exactly how a production
    drift monitor works: the reference distribution is pinned at
    release time, the stream updates counts as crawl shards arrive.
    State is ≤ |sources|·V rows FOREVER (the broadcast vocab join
    prunes the unbounded token tail BEFORE the stateful aggregation —
    same bounded-state argument as streaming_cms_sketch); any moment's
    counter table feeds textstats.source_kl_from_counts for the
    current KL scores without rescanning history. The identical
    function body runs on the batch table; tests/test_streaming.py
    asserts stream == batch counters AND end-to-end score equality
    with the one-shot batch query via availableNow."""
    from ..functions.text import words_col

    voc = vocab.select("tok")
    if docs.isStreaming:
        # snapshot the vocabulary plan: it is semantically a pinned
        # artifact, and Spark's unsupported-operations checker rejects
        # batch-only expressions (the window-free rank's
        # monotonically_increasing_id, functions/ranking) anywhere
        # inside a streaming plan — even on the static join side
        voc = voc.localCheckpoint()
    toks = docs.select("source", F.explode(words_col("text")).alias("tok"))
    return (
        toks.join(F.broadcast(voc), "tok")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cst"))
    )


def streaming_fingerprint_dedup(docs: DataFrame) -> DataFrame:
    """Streaming media dedup: each arriving document is fingerprinted
    through the REAL decode path (multimodal.audio_fingerprint — the
    Arrow-batched mapInPandas runs unchanged inside a streaming plan)
    and each distinct 64-bit signature keeps ONE canonical winner,
    min(doc_id) — deterministic on stream and batch alike, unlike
    dropDuplicates' first-arrival winner. This is the streaming face
    of the banded fingerprint family: exact-signature admission at
    ingest; the Hamming-neighbourhood pass stays batch (pair joins
    over the corpus are a compaction job, cf. streaming_corpus_ingest).

    State is one row per DISTINCT signature FOREVER — the dedup-key
    table itself, the same bounded-by-content argument as
    streaming_cms_sketch; replays are absorbed by construction
    (min over re-delivered shards is unchanged —
    tests/test_streaming.py replays every shard twice). A production
    ingest with event-time blobs would bound it further with
    dropDuplicatesWithinWatermark."""
    from ..operators import multimodal

    fp = multimodal.audio_fingerprint(docs)
    return fp.groupBy("b0", "b1", "b2", "b3").agg(
        F.min("doc_id").alias("canonical_doc")
    )


def streaming_daily_type_counts(events: DataFrame) -> DataFrame:
    """Incremental (event_type, day) counters — the stateful half of
    the volume-anomaly monitor (plans/events.events_anomaly_zscore,
    finished by plans/events.anomaly_from_counts on any snapshot).
    State is |types|·|days| rows — days accrue slowly, and a
    production monitor bounds them with a watermark-expired window or
    a periodic compaction of closed days into the batch store. The
    identical function body runs on the batch table;
    tests/test_streaming.py asserts stream == batch counters AND
    end-to-end z-score equality with the one-shot batch query."""
    return events.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )


def streaming_ingest_gate(
    docs: DataFrame,
    index_path: str,
    k: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
):
    """The incremental-ingest admission service as a streaming loop:
    each arriving micro-batch (= one crawl shard) is gated against the
    MATERIALIZED corpus index (dedup.incremental_ingest_indexed — the
    corpus raw text is never rescanned), its per-document decisions
    are persisted to ``{index_path}/decisions`` tagged with the batch
    id, and the admitted ('novel') documents are accreted into the
    index (dedup.append_ingest_index) — so the NEXT shard is gated
    against the grown corpus. This is the foreachBatch face of the
    batch loop proven by tests/test_dedup.py's accretion test;
    tests/test_streaming.py asserts the streamed decisions equal a
    hand-run batch loop over the same shard sequence.

    Semantics: a shard is gated AS A UNIT against the prior corpus —
    documents within one shard are not compared to each other (run
    a batch self-dedup per shard first if that matters), exactly the
    contract of the batch faces. Exactly-once caveat: foreachBatch is
    at-least-once across failures, and the decisions write and the
    index append are two separate parquet commits — a production
    deployment puts both tables in a transactional format (Delta/
    Iceberg) or keys the decision table by (batch_id, doc_id) and
    dedups on read. The admission logic itself is replay-safe: a
    replayed shard's documents re-gate as 'exact' against their own
    earlier index entries and the 'novel'-only policy appends nothing
    the second time.

    Returns the started StreamingQuery (availableNow trigger — drains
    what's there, then stops; a production service uses a continuous
    trigger unchanged).
    """
    from ..operators import dedup

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.graph import _unpersist_checkpoint

        tx = dedup._is_tx_index(index_path)
        # the batch feeds the gate AND the admitted-docs filter; the
        # decisions feed the sink AND the admission filter —
        # checkpoint both so (a) nothing recomputes per reference and
        # (b) in the legacy layout the decision plan's index scan is
        # fully executed BEFORE append_ingest_index adds new files to
        # the same directories (the tx layout is hazard-free there:
        # its scans read manifest-pinned immutable directories). Both
        # checkpoints are freed before the batch returns: a
        # continuous-trigger service would otherwise accumulate one
        # shard's pinned blocks per micro-batch forever.
        b = batch_df.select("doc_id", "text").localCheckpoint()
        # batch_id is stamped AFTER the checkpoint: a lit(batch_id)
        # inside the gate plan is folded into the generated code, so
        # every micro-batch used to compile a fresh codegen class for
        # the whole decision tree — measured as the dominant share of
        # the per-batch latency (VERDICT r8 item 8); with the plan
        # batch-invariant, batches 2..N reuse batch 1's classes.
        gated = dedup.incremental_ingest_indexed(
            b, index_path, k, threshold, max_df
        ).localCheckpoint()
        decisions = gated.withColumn("batch_id", F.lit(batch_id))
        try:
            admitted_ids = decisions.where(F.col("status") == "novel").select("doc_id")
            admitted = b.join(F.broadcast(admitted_ids), "doc_id")
            if tx:
                # transactional store (VERDICT r10 item 6): decisions +
                # both index tables land in ONE tagged-union write and
                # ONE put-if-absent commit — no torn-index crash
                # window, one action instead of three appends
                from ..operators.dedup import shingle_postings
                from ..sources import manifest as mf

                mf.append_aux_logs(
                    b.sparkSession,
                    index_path,
                    {
                        "decisions": decisions,
                        "digests": dedup._index_digests(admitted),
                        "postings": shingle_postings(
                            admitted, k, doc_col="cid", n_col="c_n_sh",
                            materialize=False,
                        ),
                    },
                )
            else:
                decisions.coalesce(1).write.mode("append").parquet(
                    f"{index_path}/decisions"
                )
                dedup.append_ingest_index(admitted, index_path, k)
        finally:
            _unpersist_checkpoint(gated)
            _unpersist_checkpoint(b)

    return (
        docs.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", f"{index_path}/_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def streaming_expectation_counts(df: DataFrame, rules: dict) -> DataFrame:
    """Continuous data-quality monitoring — the streaming face of
    operators/dq.expectation_counts: the same conditional-sum
    violation counters maintained incrementally over the stream
    (complete mode). State is ONE row of counters regardless of
    volume — the audit that runs forever on the ingest feed instead
    of once before publish. Emits the wide counter row (a streaming
    aggregate can't feed the stack() generator); readers unpivot on
    the sink side, and tests/test_streaming.py asserts the drained
    counters equal the batch audit's."""
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in rules.items()
    ]
    return df.groupBy().agg(*aggs)


def streaming_cdc_merge(
    changes: DataFrame,
    snapshot_path: str,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
):
    """Maintain a materialized snapshot from a CDC changelog stream —
    the foreachBatch face of operators/cdc.cdc_merge (real CDC feeds
    ARE streams: binlog/WAL tailers delivering ordered micro-batches).
    Each micro-batch merges into the parquet snapshot under
    ``snapshot_path`` (which must be seeded before the stream starts)
    and replaces it; the merged result is eagerly materialized
    (localCheckpoint) BEFORE the overwrite so no task is still reading
    the old files while they are deleted, and the pinned blocks are
    freed per batch (a continuous service never accumulates them).

    Replay safety: the merge itself is idempotent — upserts are keyed
    and deletes are by key, so a replayed micro-batch re-applies to a
    snapshot that already reflects it and changes nothing. 100 TB
    honesty note: rewriting the full snapshot per batch is correct but
    O(snapshot) per micro-batch; a production deployment bounds the
    rewrite with partition-scoped dynamic overwrite (only partitions
    containing changed keys) or a transactional table format's native
    MERGE — the cdc_merge operator is unchanged in either.

    Returns the started StreamingQuery (availableNow trigger, same
    drain-then-stop contract as streaming_ingest_gate).
    """
    from ..operators import cdc
    from ..operators.graph import _unpersist_checkpoint

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        session = batch_df.sparkSession
        current = session.read.parquet(snapshot_path)
        merged = cdc.cdc_merge(
            current, batch_df, key_cols, op_col=op_col, seq_col=seq_col
        ).localCheckpoint()
        try:
            merged.write.mode("overwrite").parquet(snapshot_path)
        finally:
            _unpersist_checkpoint(merged)

    return (
        changes.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", f"{snapshot_path}_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def streaming_cdc_merge_manifest(
    changes: DataFrame,
    table_path: str,
    op_col: str = "op",
    seq_col: str = "seq",
):
    """streaming_cdc_merge on the versioned-manifest table format
    (sources/manifest.py) — the answer to that pipeline's own 100 TB
    honesty note: each micro-batch rewrites ONLY the key-partitions
    its changelog touches and commits one atomic manifest rename,
    instead of overwriting the whole parquet snapshot. The table must
    be seeded with ``manifest.create_table`` before the stream starts
    (that call fixes key columns and the partition expression).

    Per-batch work: one distinct-partitions collect (bounded by the
    partition count), one cdc_merge whose base side is only the
    touched partitions, one partitioned write of those partitions.
    Untouched partitions are never read or written (pinned by
    tests/test_manifest.py). Replay safety: a replayed batch
    re-merges onto an already-merged image — keyed upserts and keyed
    deletes are idempotent — producing an identical new version; and
    because the commit is a single rename AFTER the data lands, a
    crash mid-batch leaves the previous version fully readable (this
    also closes streaming_view_maintenance's documented
    crash-between-two-overwrites window for the snapshot leg)."""
    from ..sources import manifest as mf

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        mf.merge_into(
            batch_df.sparkSession, table_path, batch_df, op_col=op_col, seq_col=seq_col
        )

    return (
        changes.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", f"{table_path}_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def streaming_view_maintenance(
    changes: DataFrame,
    snapshot_path: str,
    view_path: str,
    key_cols: list[str],
    group_cols: list[str],
    measures: dict[str, str],
    op_col: str = "op",
    seq_col: str = "seq",
):
    """Continuous incremental view maintenance — the streaming face of
    operators/ivm.py: each CDC micro-batch produces a delta aggregate
    against the PRE-batch snapshot, absorbs it into the materialized
    view under ``view_path``, and then advances the snapshot under
    ``snapshot_path`` (both parquet, both seeded before the stream
    starts: snapshot = the facts, view = ivm.build_view of them).
    Per batch the facts are touched by ONE old-image key join; the
    view rewrite is view-sized, never fact-sized.

    Replay contract: because the snapshot advances IN the same batch,
    re-delivering a fully applied batch yields a ZERO delta (old
    image = new value for upserts, deleted keys are already gone), so
    replays are absorbed without a batch-id ledger. The unprotected
    window is a crash BETWEEN the two overwrites — a replay then
    double-applies the delta; production would stage both under one
    directory swap (sources/io.compact_table's recipe) or a
    transactional table format. Same O(snapshot)-rewrite honesty note
    as streaming_cdc_merge; partition-scoped overwrite bounds it.
    """
    from ..operators import cdc, ivm
    from ..operators.graph import _unpersist_checkpoint

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        session = batch_df.sparkSession
        snap = session.read.parquet(snapshot_path)
        view = session.read.parquet(view_path)
        delta = ivm.delta_view(
            snap, batch_df, key_cols, group_cols, measures,
            op_col=op_col, seq_col=seq_col,
        )
        new_view = ivm.merge_deltas(view, delta, group_cols).localCheckpoint()
        new_snap = cdc.cdc_merge(
            snap, batch_df, key_cols, op_col=op_col, seq_col=seq_col
        ).localCheckpoint()
        try:
            new_view.write.mode("overwrite").parquet(view_path)
            new_snap.write.mode("overwrite").parquet(snapshot_path)
        finally:
            _unpersist_checkpoint(new_view)
            _unpersist_checkpoint(new_snap)

    return (
        changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", f"{view_path}_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def streaming_view_maintenance_manifest(
    changes: DataFrame,
    table_path: str,
    key_cols: list[str],
    group_cols: list[str],
    measures: dict[str, str],
    op_col: str = "op",
    seq_col: str = "seq",
):
    """streaming_view_maintenance on the versioned-manifest table —
    closing that pipeline's documented crash-between-two-overwrites
    window: per micro-batch the IVM delta is computed against the
    COMMITTED snapshot and view, and then the touched-partition
    snapshot merge AND the new view land under ONE manifest rename
    (``manifest.merge_into(..., aux={"view": ...})``). A crash
    anywhere before the rename leaves both tables at the previous
    version, so the replayed batch applies exactly once — no zero-
    delta convention needed, though the delta rule still provides it.
    The table must be seeded with ``manifest.create_table(...,
    aux={"view": ivm.build_view(...)})`` before the stream starts."""
    from ..operators import ivm
    from ..sources import manifest as mf

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        session = batch_df.sparkSession
        snap = mf.read_table(session, table_path)
        view = mf.read_aux(session, table_path, "view")
        delta = ivm.delta_view(
            snap, batch_df, key_cols, group_cols, measures,
            op_col=op_col, seq_col=seq_col,
        )
        new_view = ivm.merge_deltas(view, delta, group_cols)
        mf.merge_into(
            session, table_path, batch_df,
            op_col=op_col, seq_col=seq_col, aux={"view": new_view},
        )

    return (
        changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", f"{table_path}_view_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def streaming_view_maintenance_group(
    changes: DataFrame,
    group_root: str,
    key_cols: list[str],
    group_cols: list[str],
    measures: dict[str, str],
    op_col: str = "op",
    seq_col: str = "seq",
    txn_app: str | None = None,
):
    """streaming_view_maintenance on a TABLE GROUP (VERDICT r12
    item 7 — sources/table_group.py): facts and view are two
    first-class named manifest tables under ONE commit log, so per
    micro-batch the facts merge (touched buckets only) and the view
    replacement land in ONE put-if-absent group commit. A crash
    anywhere before it leaves BOTH tables at the previous version
    together, and the replayed batch applies exactly once — the same
    guarantee the aux-payload variant
    (streaming_view_maintenance_manifest) provides, but the view is
    now a real table: independently readable at any group version,
    key-pruned, and mutually consistent with its facts version by
    construction. Seed with ``table_group.create_group(spark, root,
    {"facts": ..., "view": ...})`` before starting."""
    from ..operators import ivm
    from ..sources import table_group as tg

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        session = batch_df.sparkSession

        # a THUNK, not a materialized image (ADVICE r13): each commit
        # attempt derives the view from the group snapshot it lands on
        # top of, so a conflict retry recomputes against the racer's
        # facts instead of republishing a stale pre-race view
        def _fresh_view(s, root, version):
            snap = tg.read_group_table(s, root, "facts", version=version)
            view = tg.read_group_table(s, root, "view", version=version)
            delta = ivm.delta_view(
                snap, batch_df, key_cols, group_cols, measures,
                op_col=op_col, seq_col=seq_col,
            )
            return ivm.merge_deltas(view, delta, group_cols)

        # txn cursor (r14, opt-in via txn_app): a re-delivered batch
        # (crash after the group commit, before the checkpoint ack) is
        # absorbed by the group log's stream_cursors. The DEFAULT stays
        # cursor-free because this pipeline's merge+replace shape is
        # keyed-idempotent (replays produce zero deltas) and a
        # cursor-free group supports deliberate fresh-checkpoint
        # reprocessing; pass txn_app when the changelog is NOT
        # idempotent (e.g. seq-less appends) — then a fresh checkpoint
        # on the same group requires a new txn_app, the sink's rule.
        tg.group_transact(
            session, group_root,
            merges={"facts": batch_df}, replaces={"view": _fresh_view},
            op_col=op_col, seq_col=seq_col,
            txn=(txn_app, batch_id) if txn_app is not None else None,
        )

    return (
        changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", f"{group_root}_group_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def streaming_view_maintenance_cdf(
    changes: DataFrame,
    source_path: str,
    view_path: str,
    key_cols: list[str],
    group_cols: list[str],
    measures: dict[str, str],
    op_col: str = "op",
    seq_col: str = "seq",
):
    """streaming_view_maintenance fed from the source table's OWN
    change data feed (VERDICT r10 item 2 — Delta's readChangeFeed
    streaming shape): the upstream writer merges each micro-batch into
    the SOURCE manifest table, and the downstream consumer then
    advances on the table's own change feed (``read_changed_sides``,
    the primitive under ``read_changes``) via a PERSISTED version cursor — it
    never sees the raw changelog, so any number of independent
    consumers can tail the same table without coordinating with its
    writers.

    The consumer (operators/ivm.cdf_view_step) commits view + cursor
    under one put-if-absent publish: exactly-once without a batch-id
    ledger, re-delivered triggers absorbed at cursor == latest with
    zero delta and zero data I/O, crash anywhere leaves both at the
    previous state. Per-trigger I/O is changed-bucket-bounded on the
    read side and delta-bucket-bounded on the view side. Seed with
    ``manifest.create_table`` (source) + ``ivm.seed_cdf_view``
    before starting; source vacuum must retain the cursor version."""
    from ..operators import ivm
    from ..sources import manifest as mf

    def _tick(batch_df: DataFrame, batch_id: int) -> None:
        session = batch_df.sparkSession
        mf.merge_into(session, source_path, batch_df, op_col=op_col, seq_col=seq_col)
        ivm.cdf_view_step(
            session, source_path, view_path, key_cols, group_cols, measures
        )

    return (
        changes.writeStream.foreachBatch(_tick)
        .option("checkpointLocation", f"{view_path}_cdf_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def stream_embeddings_replayed(spark: SparkSession, sf_dir: str, copies: int = 2) -> DataFrame:
    """embeddings replayed as ``copies`` identical single-file
    micro-batches (cf. stream_documents_replayed) — the arrival shape
    for the LSH admission gate's replay-absorption check."""
    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_stream_dir(f"{sf_dir}/embeddings.parquet", copies=copies))
    )


def streaming_lsh_near_dup_gate(
    emb_stream: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Streaming embedding admission through the banded-LSH candidate
    engine: each arriving vector is sign-bit bucketed under the SAME
    deterministic literal hyperplanes as the batch sweep (pure
    codegen — the signature pass runs unchanged inside a streaming
    plan), candidates come from a stream-static equi-join on
    (table, bucket) against the ONCE-bucketed static corpus (never
    all-pairs, never a stream-stream join), every candidate is
    verified with the exact cosine, and ONE streaming aggregation
    folds the per-table probes to a row per arriving vector:
    (vec_id, near_dup) — near_dup = 1 iff some OTHER corpus vector
    clears the threshold. The max() fold makes replays absorb by
    construction (a re-delivered shard re-emits identical hits);
    state is one row per DISTINCT arriving vec_id, the admission
    ledger itself. The Hamming/S-curve recall semantics are exactly
    the batch operator's (similarity.cosine_near_dup_lsh) — the
    IDENTICAL function body runs on the batch table, and
    tests/test_streaming.py asserts stream == batch under doubled
    shard delivery. Corpus accretion (admitting novel vectors into
    the bucketed index) follows streaming_ingest_gate's foreachBatch
    shape and stays that service's job.

    Static-side cost (VERDICT r9 item 5 — the lsh_gate p50 drift):
    a stream-static join re-plans AND re-scans its static side every
    micro-batch, so the corpus's 32-hyperplane signature pass (the
    most expensive expression in the plan) was re-running over the
    whole corpus per batch. The keyed corpus is therefore snapshotted
    ONCE with localCheckpoint before the stream starts — per-batch
    work is then the arriving shard's signatures + the bucket join +
    the verify cosines, and the corpus pass is paid once per service
    start, not once per batch (measured at sf0.1, clean machine: p50
    3037ms → 1399ms, steady-state batches ~1.4s; the residual
    per-batch cost is the stateful fold + complete-mode sink rewrite,
    not the static side — an explicit broadcast of the snapshotted
    corpus measured no better. Same static-frame snapshot pattern as
    streaming_source_token_counts)."""
    from ..operators import similarity

    def keyed(df: DataFrame, prefix: str) -> DataFrame:
        p = similarity._prepared(df).where(F.col("nrm") > 0)
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    similarity._bucket_expr(
                        similarity._hyperplanes(n_planes, dim, seed=42 + t)
                    ).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
        return p.select(
            F.col("vec_id").alias(f"{prefix}_id"),
            F.col("v").alias(f"{prefix}_v"),
            F.col("nrm").alias(f"{prefix}_nrm"),
            F.explode(tables).alias("tb"),
        ).select(
            f"{prefix}_id",
            f"{prefix}_v",
            f"{prefix}_nrm",
            F.col("tb.tbl").alias("tbl"),
            F.col("tb.bucket").alias("bucket"),
        )

    s = keyed(emb_stream, "new")
    c = keyed(corpus, "corpus").localCheckpoint()
    dot = F.expr(
        "aggregate(zip_with(new_v, corpus_v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )
    hit = F.when(
        F.col("corpus_id").isNotNull()
        & (F.col("corpus_id") != F.col("new_id"))
        & ((dot / (F.col("new_nrm") * F.col("corpus_nrm"))) >= threshold),
        1,
    ).otherwise(0)
    return (
        s.join(c, ["tbl", "bucket"], "left_outer")
        .select(F.col("new_id").alias("vec_id"), hit.alias("h"))
        .groupBy("vec_id")
        .agg(F.max("h").cast("int").alias("near_dup"))
    )


def run_available_now(stream: DataFrame, name: str, output_mode: str = "complete"):
    """Drain the stream's current input in one run (availableNow) into
    an in-memory table `name`; returns after the query stops. The unit
    of testability: batch/stream equivalence checks read the table."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
