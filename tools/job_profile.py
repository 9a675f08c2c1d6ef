"""Per-query job breakdown: run a query through the noop sink and list
every Spark job it spawned (duration, task count, description) plus the
inter-job gaps (driver-side planning / py4j time).

Usage: python tools/job_profile.py [sf_dir] <query> [query ...]

Reads the AppStatusStore, so numbers are ground truth from the same
listener the UI uses. One warmup (file_count) absorbs JVM startup.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_cs416_spark.plans.registry import ALL_QUERIES
from mapreduce_cs416_spark.session import get_spark


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _isolate(spark) -> None:
    spark.catalog.clearCache()
    jvm_sc = spark.sparkContext._jsc.sc()
    for rdd_id in list(spark.sparkContext._jsc.getPersistentRDDs().keySet()):
        try:
            jvm_sc.unpersistRDD(rdd_id, True)
        except Exception:
            pass
    spark.sparkContext._jvm.System.gc()


def _jobs(spark):
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = spark.sparkContext._jvm.java.util.ArrayList()
    it = store.jobsList(empty).iterator()
    out = []
    while it.hasNext():
        j = it.next()
        sub = j.submissionTime()
        comp = j.completionTime()
        sub_ms = sub.get().getTime() if sub.isDefined() else None
        comp_ms = comp.get().getTime() if comp.isDefined() else None
        out.append(
            {
                "id": j.jobId(),
                "sub": sub_ms,
                "comp": comp_ms,
                "tasks": j.numTasks(),
                "stages": j.stageIds().size(),
                "desc": (j.description().get() if j.description().isDefined() else j.name())[:90],
            }
        )
    out.sort(key=lambda d: d["id"])
    return out


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    names = []
    for a in args:
        if os.path.isdir(a):
            sf_dir = a
        else:
            names.append(a)
    spark = get_spark("job_profile")
    _materialize(ALL_QUERIES["file_count"].fn(spark, sf_dir))
    for name in names:
        _isolate(spark)
        before_ids = {j["id"] for j in _jobs(spark)}
        t0 = time.time()
        _materialize(ALL_QUERIES[name].fn(spark, sf_dir))
        wall = time.time() - t0
        jobs = [j for j in _jobs(spark) if j["id"] not in before_ids]
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        prev_end = None
        t_base = jobs[0]["sub"] if jobs else 0
        job_sum = 0.0
        gap_sum = 0.0
        for j in jobs:
            dur = (j["comp"] - j["sub"]) / 1000.0 if j["comp"] else float("nan")
            gap = (j["sub"] - prev_end) / 1000.0 if prev_end is not None else 0.0
            job_sum += dur
            gap_sum += max(gap, 0.0)
            print(
                f"  job {j['id']:4d} @{(j['sub'] - t_base) / 1000.0:7.3f}s"
                f" dur {dur:6.3f}s gap {gap:6.3f}s"
                f" tasks {j['tasks']:4d} stages {j['stages']}  {j['desc']}"
            )
            prev_end = max(prev_end or 0, j["comp"] or 0)
        print(f"  --- job time {job_sum:.3f}s, inter-job gaps {gap_sum:.3f}s, wall {wall:.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
