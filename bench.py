"""Benchmark entry point (driver contract).

Times the headline query set at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints exactly
ONE JSON line to stdout:

    {"metric": "headline_total", "value": <sum sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": <sec>, ...}, "sf": 0.1}

Each query is fully materialized through the no-op sink (every row is
produced and serialized by the executors; nothing short-circuits the
plan the way count() can) after one tiny warmup to absorb JVM +
codegen startup. All human-readable chatter goes to stderr.

Usage: python bench.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_cs416_spark.plans.registry import QUERIES, headline_queries
from mapreduce_cs416_spark.session import get_spark


def _materialize(df) -> None:
    """Force full evaluation of every output row on the executors."""
    df.write.format("noop").mode("overwrite").save()


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return 0.0


def main() -> int:
    args = sys.argv[1:]
    sf_dir = next(
        (a for a in args if os.path.isdir(a)),
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    names = [a for a in args if not os.path.isdir(a)] or sorted(headline_queries())
    spark = get_spark("bench")

    # warmup: absorb session/codegen startup so query timings are real
    t0 = time.time()
    _materialize(QUERIES["file_count"].fn(spark, sf_dir))
    print(f"warmup {time.time() - t0:.2f}s  sf_dir={sf_dir}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        _materialize(QUERIES[name].fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
        print(f"  {name:32s} {timings[name]:8.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": _sf_of(sf_dir),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
