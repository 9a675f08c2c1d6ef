"""Task-retry fault tolerance — the Spark analog of the reference's
crash test (mrapps/crash.go + main/test-mr.sh crash section: kill
workers mid-job, assert the output still equals the nocrash golden).

Spark's lineage re-execution owns the recovery; the contract to
assert is that a job whose tasks fail on their first attempt still
produces exactly the clean run's result. Needs `local[N,maxFailures]`
(the shared test session runs maxFailures=1, where any failure kills
the job), so this runs in a subprocess with its own session.
"""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8,3]")  # up to 3 attempts per task
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .appName("crash-test")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

def flaky(it):
    from pyspark import TaskContext
    if TaskContext.get().attemptNumber() == 0:
        raise RuntimeError("injected crash (first attempt)")
    yield from it

# map-side crash: every task dies once, retries must re-run the full
# partition exactly once more (no dupes, no loss)
data = sc.parallelize(range(1000), 8)
crashed = sorted(data.mapPartitions(flaky).collect())
assert crashed == list(range(1000)), "map-retry lost or duplicated rows"

# reduce-side crash after a shuffle: the reduce partition re-fetches
# shuffle output and re-reduces; grouped counts must match the clean run
pairs = data.map(lambda i: (i % 50, 1))
clean = sorted(pairs.reduceByKey(lambda a, b: a + b).collect())
crashed2 = sorted(
    pairs.reduceByKey(lambda a, b: a + b)
    .mapPartitions(flaky)
    .collect()
)
assert crashed2 == clean, "reduce-retry diverged from clean run"

print("FAULT_TOLERANCE_OK")
spark.stop()
"""


def test_task_retry_reproduces_clean_output():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True, timeout=300
    )
    assert "FAULT_TOLERANCE_OK" in out.stdout, out.stderr[-3000:]


CC_SCRIPT = r"""
import os, sys
sys.path.insert(0, os.getcwd())
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8,3]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .appName("cc-crash-test")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

def flaky(it):
    from pyspark import TaskContext
    if TaskContext.get().attemptNumber() == 0:
        raise RuntimeError("injected crash (first attempt)")
    yield from it

# a 60-node path whose edge SOURCE crashes every task's first attempt:
# the iterative star rounds (joins + localCheckpoint + fixpoint probes)
# must still converge to the exact clean labeling
from mapreduce_cs416_spark.operators import graph

edges = spark.createDataFrame(
    sc.parallelize([(i, i + 1) for i in range(60)], 8).mapPartitions(flaky),
    "doc_a long, doc_b long",
)
labels = {r["node"]: r["component"] for r in graph.connected_components(edges).collect()}
assert labels == {i: 0 for i in range(61)}, labels
print("CC_FAULT_TOLERANCE_OK")
spark.stop()
"""


def test_connected_components_survives_task_retries():
    """Iterative operators must be as retry-safe as single-pass ones:
    the reference's crash contract (same output as nocrash) applied to
    the round-4 graph operator."""
    out = subprocess.run(
        [sys.executable, "-c", CC_SCRIPT], capture_output=True, text=True, timeout=300
    )
    assert "CC_FAULT_TOLERANCE_OK" in out.stdout, out.stderr[-3000:]
