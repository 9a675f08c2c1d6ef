"""Benchmark entry point (driver contract).

Times the headline query set at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints exactly
ONE JSON line to stdout:

    {"metric": "headline_total", "value": <sum sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": <sec>, ...}, "sf": 0.1}

Each query is fully materialized through the no-op sink (every row is
produced and serialized by the executors; nothing short-circuits the
plan the way count() can) after one tiny warmup to absorb JVM +
codegen startup. Per query the reported number is the MEDIAN of
N_RUNS=3 in-process runs, so round-over-round deltas reflect plan
changes rather than JIT/page-cache noise (VERDICT r3: a 2x "speedup"
appeared between identical binaries); "spread" records max-min per
query. All human-readable chatter goes to stderr.

Usage: python bench.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_cs416_spark.plans.registry import ALL_QUERIES, headline_queries
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


N_RUNS = 3


def main() -> int:
    args = sys.argv[1:]
    # Argv contract: an arg is either an existing sf directory or a
    # registered query name — anything else (a mistyped path, an
    # unknown query) must fail loudly, not surface as a KeyError.
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    for a in args:
        if os.path.isdir(a):
            sf_dir = a
        elif a in ALL_QUERIES:
            names.append(a)
        else:
            looks_like_path = os.sep in a or a.startswith("sf")
            kind = "sf_dir does not exist" if looks_like_path else "unknown query"
            print(
                f"bench.py: {kind}: {a!r}\n"
                f"  registered queries: {', '.join(sorted(ALL_QUERIES))}",
                file=sys.stderr,
            )
            return 2
    names = names or sorted(headline_queries())
    if not os.path.isdir(sf_dir):
        print(f"bench.py: sf_dir does not exist: {sf_dir!r}", file=sys.stderr)
        return 2
    spark = get_spark("bench")

    # warmup: absorb session/codegen startup so query timings are real
    t0 = time.time()
    _materialize(ALL_QUERIES["file_count"].fn(spark, sf_dir))
    print(f"warmup {time.time() - t0:.2f}s  sf_dir={sf_dir}", file=sys.stderr)

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in names:
        runs: list[float] = []
        for _ in range(N_RUNS):
            t0 = time.time()
            _materialize(ALL_QUERIES[name].fn(spark, sf_dir))
            runs.append(time.time() - t0)
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)
        spreads[name] = round(runs[-1] - runs[0], 3)
        print(
            f"  {name:32s} median {timings[name]:8.3f}s  spread {spreads[name]:.3f}s",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "spread": spreads,
                "n_runs": N_RUNS,
                "sf": _sf_of(sf_dir),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
