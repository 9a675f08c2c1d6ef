"""Run every registered query against its DuckDB oracle and report.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_cs416_spark.plans.registry import EXTRA_QUERIES, QUERIES
from mapreduce_cs416_spark.session import get_spark
from mapreduce_cs416_spark.testing import compare_query

# default run = the driver's QUERIES window; EXTRA_QUERIES (granular
# twins, pytest-verified) are addressable by name or via "--extra"
ALL = {**QUERIES, **EXTRA_QUERIES}


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = [a for a in args if not os.path.isdir(a) and a != "--extra"]
    if "--extra" in args:
        names += list(EXTRA_QUERIES)
    names = names or list(QUERIES)
    unknown = [n for n in names if n not in ALL]
    if unknown:
        print(f"unknown queries: {', '.join(unknown)}\nknown: {', '.join(sorted(ALL))}")
        return 2
    spark = get_spark("parity-check")
    failures = []
    for name in names:
        spec = ALL[name]
        t0 = time.time()
        if spec.oracle is None:
            try:
                n = spec.fn(spark, sf_dir).count()
                print(f"  {name:32s} ROWS-ONLY ({n} rows, {time.time()-t0:.1f}s)")
            except Exception as e:  # noqa: BLE001
                failures.append(name)
                print(f"✗ {name:32s} ERROR: {e}")
            continue
        try:
            ok, msg = compare_query(spark, spec.fn, spec.oracle, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"ERROR: {e}"
        mark = "✓" if ok else "✗"
        if not ok:
            failures.append(name)
        print(f"{mark} {name:32s} {msg[:2000]} ({time.time()-t0:.1f}s)")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if failures:
        print("failed:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
