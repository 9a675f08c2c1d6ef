"""Shared fixtures: one local SparkSession for the whole test run.

Tests default to the smallest scale factor (sf0.001) — they assert
correctness; bench.py asserts speed at sf0.1.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# keep the test session lean: fewer local threads / shuffle partitions
# than the bench defaults (the queries here run over ~100-row inputs)
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from mapreduce_cs416_spark.session import get_spark

    s = get_spark("pytest")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
