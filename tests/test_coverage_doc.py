"""COVERAGE.md freshness guard (VERDICT r4 item 5: a generated doc
that drifts from the registry is worse than none)."""

from __future__ import annotations

import os

from tools.coverage_report import render

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_md_matches_regeneration():
    """The committed COVERAGE.md must be byte-identical to what
    tools/coverage_report.py generates from the live registry —
    regenerate it when adding/moving queries."""
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        committed = f.read()
    assert committed == render(), (
        "COVERAGE.md is stale — run: python tools/coverage_report.py"
    )
