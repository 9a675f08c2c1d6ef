"""The MapReduce compat surface: arbitrary user map/reduce callables,
output formatting, and the text sink (reference A2/A7/A8/A15,
mr/worker.go:95-181)."""

from __future__ import annotations

import os

from mapreduce_cs416_spark.operators.mapreduce import (
    mr_output_lines,
    run_mapreduce,
    write_mr_output,
)


def _records(spark):
    return spark.createDataFrame(
        [("f1", "a b a"), ("f2", "b c")], "filename string, contents string"
    )


def test_run_mapreduce_holistic_reduce(spark):
    """reduce must see the full value list per key (not a pairwise
    fold) — the reference's holistic contract (mr/worker.go:164-177)."""

    def mapf(filename, contents):
        return [(w, filename) for w in contents.split()]

    def reducef(key, values):
        # order-insensitive holistic function over the whole group
        return ",".join(sorted(set(values)))

    out = {r["key"]: r["value"] for r in run_mapreduce(_records(spark), mapf, reducef).collect()}
    assert out == {"a": "f1", "b": "f1,f2", "c": "f2"}


def test_mr_output_lines_format(spark):
    df = spark.createDataFrame([("x", 3)], "key string, value int")
    assert mr_output_lines(df).collect()[0]["line"] == "x 3"


def test_write_mr_output_text_sink(spark, tmp_path):
    """A8: n text partitions, '%v %v' lines, atomic commit."""

    def mapf(filename, contents):
        return [(w, "1") for w in contents.split()]

    def reducef(key, values):
        return str(len(values))

    out = run_mapreduce(_records(spark), mapf, reducef)
    path = str(tmp_path / "mr-out")
    write_mr_output(out, path, n_partitions=3)
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    # like the reference's mr-out-X files: at most n_partitions text
    # parts (empty partitions write no file), compared as a sorted union
    assert 1 <= len(parts) <= 3
    lines = sorted(
        line
        for f in parts
        for line in open(os.path.join(path, f)).read().splitlines()
    )
    assert lines == ["a 2", "b 2", "c 1"]
