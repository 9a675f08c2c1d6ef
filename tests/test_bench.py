"""bench.py argv contract: mistyped sf dirs and unknown query names
must fail loudly (exit 2 + message) before any Spark work starts —
a bad arg used to surface as an opaque KeyError (VERDICT r3 item 6)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, BENCH, *args], capture_output=True, text=True, timeout=120
    )


def test_unknown_query_name_errors_clearly():
    r = _run("no_such_query")
    assert r.returncode == 2
    assert "unknown query" in r.stderr
    assert "no_such_query" in r.stderr
    assert r.stdout == ""  # the one-JSON-line contract: no output on error


def test_mistyped_sf_dir_errors_clearly():
    r = _run("/root/testdata/sf9.9")
    assert r.returncode == 2
    assert "does not exist" in r.stderr


def test_sf_prefixed_typo_reported_as_dir_not_query():
    r = _run("sf0.42")
    assert r.returncode == 2
    assert "sf_dir does not exist" in r.stderr


def test_bench_json_reports_floor():
    """VERDICT r8 item 2: the bench must print the measured trivial-
    query floor beside the totals so environment drift (r7→r8's
    uniform 1.5× shift) is separable from plan regressions."""
    import json

    r = _run("/root/testdata/sf0.001", "file_count")
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["floor"] > 0
    assert out["queries_minus_floor"].keys() == out["queries"].keys()
    assert out["value_minus_floor"] <= out["value"]
    assert all(v >= 0 for v in out["queries_minus_floor"].values())
