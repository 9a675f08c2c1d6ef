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


def test_bench_json_reports_floor_and_lean_tail(tmp_path):
    """VERDICT r8 item 2 + r9 item 6: the bench must print the
    measured trivial-query floor beside the totals (environment drift
    separable from plan regressions), and stdout's one line must be
    LEAN and MINIFIED so the driver's ~2000-char stdout tail captures
    the complete per-query dict (r8/r9 artifacts each lost the first
    half of it); the full dict — spread, per-query minus-floor — goes
    to BENCH.json instead."""
    import json

    bench_json = tmp_path / "BENCH.json"
    env = {**os.environ, "SPARK_GRAFT_BENCH_JSON": str(bench_json)}
    r = subprocess.run(
        [sys.executable, BENCH, "/root/testdata/sf0.001", "file_count"],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    assert len(lines) == 1  # the one-JSON-line contract
    out = json.loads(lines[0])
    assert out["floor"] > 0
    assert out["value_minus_floor"] <= out["value"]
    assert "file_count" in out["queries"]
    # minified (no spaces after separators) and lean: the big
    # derivable dicts live in BENCH.json, not stdout
    assert ": " not in lines[0] and ", " not in lines[0]
    assert "spread" not in out and "queries_minus_floor" not in out
    full = json.loads(bench_json.read_text())
    assert full["queries"] == out["queries"]
    assert full["queries_minus_floor"].keys() == full["queries"].keys()
    assert full["spread"].keys() == full["queries"].keys()
    assert all(v >= 0 for v in full["queries_minus_floor"].values())
