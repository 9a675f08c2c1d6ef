"""Scheduling-probe analogs of the reference's jobcount / mtiming /
rtiming apps (mrapps/jobcount.go:22-46, mtiming.go:19-91,
rtiming.go:62-84; asserted by main/test-mr.sh:147-223).

The reference probes its own coordinator: each map runs exactly once
in the final accounting, and maps/reduces genuinely run in parallel.
Here the Spark runtime owns scheduling, so the probes assert the same
contracts through accumulators and wall-clock overlap on local[N].
"""

from __future__ import annotations

import time

N_PARTS = 8
SLEEP = 0.6


def test_jobcount_each_partition_processed_once(spark):
    """jobcount analog: on a success path, every map partition is
    executed exactly once — no double-counting under Spark's task
    accounting."""
    acc = spark.sparkContext.accumulator(0)

    def probe(it):
        acc.add(1)
        yield sum(1 for _ in it)

    counts = spark.sparkContext.parallelize(range(1000), N_PARTS).mapPartitions(probe).collect()
    assert sum(counts) == 1000
    assert acc.value == N_PARTS


def test_mtiming_maps_run_in_parallel(spark):
    """mtiming analog: N_PARTS sleeping map tasks must complete in far
    less than serial time on local[N >= N_PARTS]."""

    def slow_map(it):
        time.sleep(SLEEP)
        yield sum(it)

    t0 = time.time()
    out = spark.sparkContext.parallelize(range(N_PARTS * 10), N_PARTS).mapPartitions(slow_map).collect()
    elapsed = time.time() - t0
    assert len(out) == N_PARTS
    assert elapsed < N_PARTS * SLEEP * 0.6, f"maps look serial: {elapsed:.1f}s"


def test_rtiming_reduces_run_in_parallel(spark):
    """rtiming analog: the post-shuffle (reduce) side must also run
    its partitions concurrently."""
    pairs = spark.sparkContext.parallelize(
        [(i % N_PARTS, i) for i in range(N_PARTS * 10)], N_PARTS
    )

    def slow_reduce(it):
        time.sleep(SLEEP)
        yield sum(1 for _ in it)

    t0 = time.time()
    out = pairs.groupByKey(numPartitions=N_PARTS).mapPartitions(slow_reduce).collect()
    elapsed = time.time() - t0
    assert len(out) == N_PARTS
    assert elapsed < N_PARTS * SLEEP * 0.6, f"reduces look serial: {elapsed:.1f}s"


def test_determinism_under_reexecution(spark, sf_dir):
    """The reference's crash test asserts output is identical whether
    or not workers died mid-job (golden-diff vs nocrash). Spark's
    analog contract: re-running the same lineage yields the identical
    result set."""
    from mapreduce_cs416_spark.plans.registry import QUERIES

    fn = QUERIES["wordcount"].fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b
