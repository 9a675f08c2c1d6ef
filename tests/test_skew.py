"""Salted holistic aggregation: identical output to the direct
collect_list plan on skewed data, for any salt count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_cs416_spark.operators.skew import salted_holistic_agg


@pytest.fixture(scope="module")
def skewed_kv(spark):
    # one hot key holding 90% of rows, plus a long tail
    rows = [("hot", f"v{i:04d}") for i in range(900)]
    rows += [(f"k{i % 10}", f"w{i:04d}") for i in range(100)]
    return spark.createDataFrame(rows, "key string, value string")


def _direct(kv):
    return kv.groupBy("key").agg(
        F.array_join(F.array_sort(F.collect_list("value")), " ").alias("agg_values")
    )


@pytest.mark.parametrize("n_salts", [1, 4, 64])
def test_salted_equals_direct(skewed_kv, n_salts):
    got = {r["key"]: r["agg_values"] for r in salted_holistic_agg(skewed_kv, n_salts=n_salts).collect()}
    want = {r["key"]: r["agg_values"] for r in _direct(skewed_kv).collect()}
    assert got == want


def test_salted_handles_duplicate_values(spark):
    kv = spark.createDataFrame(
        [("k", "a"), ("k", "a"), ("k", "b")], "key string, value string"
    )
    out = salted_holistic_agg(kv, n_salts=8).collect()
    assert out[0]["agg_values"] == "a a b"
