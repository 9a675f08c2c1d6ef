"""Concurrent-writer contention on ONE manifest table (VERDICT r12
item 5): the put-if-absent commit protocol is correctness-tested for
two racers elsewhere (tests/test_manifest.py); this drives SUSTAINED
contention — N native sinks + a periodic compactor + a vacuum +
concurrent readers hammering one table — and proves:

1. **No lost updates**: every batch every sink committed is present
   exactly once at the end (row multiset == seed + all batches).
2. **No torn reads**: readers looping through the storm always see a
   complete, consistent snapshot (every referenced file readable,
   row count == a value some committed version actually had).
3. **Liveness under contention**: every commit eventually lands
   within the sink's jittered-backoff retry budget; the observed
   CommitConflict retry distribution is recorded (the measured
   evidence STREAMBENCH's notes cite).

The writer threads drive the REAL sink faces (ManifestStreamWriter
.write/.commit in-process — the same calls the streaming engine
makes), not synthetic _commit calls. r14 adds MERGE writers to the
storm: each updates its own seed-key slice through ``merge_into``
while sinks append and the compactor folds — losing merges resolve
through the r14 conflict path (rebase when bucket-disjoint, full
re-run otherwise; with every writer spraying all buckets the storm
mostly drives the re-run, and test_merge_rebase.py race-injects the
rebase fast path deterministically) and must converge loss-free.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from mapreduce_cs416_spark.sources import manifest as mf
from mapreduce_cs416_spark.sources.manifest_sink import ManifestStreamWriter

N_SINKS = 4
N_MERGERS = 2
N_MERGE_BATCHES = 3
N_BATCHES = 6
ROWS_PER_BATCH = 200
SEED_ROWS = 400


@pytest.fixture(scope="module")
def storm(spark, tmp_path_factory):
    """Run the contention storm once; every assertion below reads its
    outcome. Deterministic inputs (seeded key ranges); thread
    interleaving varies run-to-run, which is the point."""
    root = str(tmp_path_factory.mktemp("contention") / "tbl")
    seed = spark.range(0, SEED_ROWS).select(
        F.col("id").alias("k"), F.lit(-1).alias("v")
    )
    mf.create_table(seed, root, ["k"], n_buckets=8)
    schema = mf._schema_of(mf.read_manifest(root))

    conflicts: dict[str, int] = {}
    conflicts_lock = threading.Lock()
    real_commit = mf._commit

    def counting_commit(path, manifest):
        try:
            return real_commit(path, manifest)
        except mf.CommitConflict:
            name = threading.current_thread().name
            with conflicts_lock:
                conflicts[name] = conflicts.get(name, 0) + 1
            raise

    errors: list = []
    read_counts: list[int] = []
    start = threading.Barrier(
        N_SINKS + N_MERGERS + 2
    )  # sinks + mergers + compactor + reader

    publish_ms: list[float] = []
    publish_lock = threading.Lock()

    def sink_worker(sink_no: int) -> None:
        import time

        import pyarrow as pa

        try:
            w = ManifestStreamWriter(
                {"path": root, "sinkId": f"s{sink_no}"}, schema
            )
            start.wait()
            for b in range(N_BATCHES):
                lo = 10_000 + sink_no * 100_000 + b * ROWS_PER_BATCH
                t = pa.table(
                    {
                        "k": list(range(lo, lo + ROWS_PER_BATCH)),
                        "v": [sink_no] * ROWS_PER_BATCH,
                    }
                )
                msg = w.write(iter(t.to_batches()))
                t0 = time.perf_counter()
                w.commit([msg], batchId=b)
                with publish_lock:
                    publish_ms.append((time.perf_counter() - t0) * 1000)
        except Exception as exc:  # noqa: BLE001 - surfaced below
            errors.append(("sink", sink_no, exc))

    def merge_worker(m: int) -> None:
        """r14: a CDC merge writer racing the sinks/compactor — updates
        ITS OWN 40-key seed slice per batch (disjoint keys from the
        other merger and from sink-appended keys). With every writer
        spraying all 8 buckets, losing merges here mostly take the
        full re-run path (the disjoint-bucket rebase fast path is
        race-injection-pinned in test_merge_rebase.py); this proves
        merge writers converge loss-free under sustained mixed
        contention either way."""
        try:
            start.wait()
            for b in range(N_MERGE_BATCHES):
                lo = m * 40
                ch = spark.createDataFrame(
                    [(k, 50_000 + m * 1000 + b, "U", b) for k in range(lo, lo + 40)],
                    "k long, v long, op string, seq int",
                )
                mf.merge_into(spark, root, ch, conflict_retries=12)
        except Exception as exc:  # noqa: BLE001
            errors.append(("merger", m, exc))

    def compactor() -> None:
        try:
            start.wait()
            for _ in range(3):
                mf.compact(spark, root, conflict_retries=12)
                # sane age gate: a zero gate would reap a racing
                # sink's staged-but-uncommitted directory (the
                # documented reason the gate exists)
                mf.vacuum(root, keep_versions=3, orphan_min_age_s=3600)
        except Exception as exc:  # noqa: BLE001
            errors.append(("compactor", None, exc))

    def reader() -> None:
        try:
            start.wait()
            for _ in range(10):
                read_counts.append(mf.read_table(spark, root).count())
        except Exception as exc:  # noqa: BLE001
            errors.append(("reader", None, exc))

    mf._commit = counting_commit
    try:
        threads = [
            threading.Thread(
                target=sink_worker, args=(i,), name=f"sink-{i}"
            )
            for i in range(N_SINKS)
        ]
        threads += [
            threading.Thread(
                target=merge_worker, args=(m,), name=f"merger-{m}"
            )
            for m in range(N_MERGERS)
        ]
        threads.append(threading.Thread(target=compactor, name="compactor"))
        threads.append(threading.Thread(target=reader, name="reader"))
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not any(t.is_alive() for t in threads), "storm deadlocked"
    finally:
        mf._commit = real_commit
    return {
        "root": root,
        "errors": errors,
        "conflicts": conflicts,
        "read_counts": read_counts,
        "publish_ms": publish_ms,
    }


def test_no_writer_or_reader_errors(storm):
    assert storm["errors"] == []


def test_no_lost_updates(spark, storm):
    """Every committed batch's rows are present exactly once, and
    every merge writer's FINAL batch won its keys (seq-ordered merges
    through rebases and re-runs alike)."""
    rows = mf.read_table(spark, storm["root"]).collect()
    got = sorted((r["k"], r["v"]) for r in rows)
    want = sorted(
        # keys 0..79 were updated by the merge writers; their final
        # image is the last merge batch's value for each slice
        [
            (k, 50_000 + (k // 40) * 1000 + N_MERGE_BATCHES - 1)
            for k in range(N_MERGERS * 40)
        ]
        + [(k, -1) for k in range(N_MERGERS * 40, SEED_ROWS)]
        + [
            (10_000 + s * 100_000 + b * ROWS_PER_BATCH + i, s)
            for s in range(N_SINKS)
            for b in range(N_BATCHES)
            for i in range(ROWS_PER_BATCH)
        ]
    )
    assert got == want


def test_every_sink_cursor_at_final_batch(storm):
    cursors = mf.read_manifest(storm["root"])["stream_cursors"]
    assert cursors == {f"s{i}": N_BATCHES - 1 for i in range(N_SINKS)}


def test_reads_never_tore(storm):
    """Each concurrent read returned a count that is
    seed + (multiple of ROWS_PER_BATCH) — i.e. some committed
    version's exact row count, never a partial batch."""
    assert storm["read_counts"], "reader never ran"
    for c in storm["read_counts"]:
        assert c >= SEED_ROWS
        assert (c - SEED_ROWS) % ROWS_PER_BATCH == 0, c


def test_conflicts_observed_and_absorbed(storm):
    """The storm must actually have contended (otherwise this file
    proves nothing) and every conflict was absorbed by a retry —
    print the distribution for STREAMBENCH's notes."""
    total = sum(storm["conflicts"].values())
    assert total > 0, "no commit ever conflicted — raise the pressure"
    lat = sorted(storm["publish_ms"])
    p50 = lat[len(lat) // 2]
    p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))]
    print(f"\ncontention: {total} CommitConflicts across "
          f"{N_SINKS * N_BATCHES + N_MERGERS * N_MERGE_BATCHES + 3} "
          f"commits -> {storm['conflicts']}; "
          f"publish latency p50 {p50:.0f} ms, p99 {p99:.0f} ms, "
          f"max {lat[-1]:.0f} ms over {len(lat)} publishes")
