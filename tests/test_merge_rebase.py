"""Optimistic-concurrency merge REBASE (r14): a losing merge whose
winner touched DISJOINT buckets folds its already-staged bucket images
onto the fresh manifest and republishes — no data re-read, no
re-write, staged rel reused. Any genuine overlap (same bucket, a DV on
our bucket, layout/schema change, staged aux) degrades to the full
re-run, never a wrong answer.

Race injection uses the monkeypatched-_commit pattern the group and
checkpoint suites established.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mapreduce_cs416_spark.sources import manifest as mf


def _mk(spark, root: str, n: int = 64, n_buckets: int = 8) -> dict:
    df = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    return mf.create_table(df, root, ["k"], n_buckets=n_buckets)


def _ch(spark, rows):
    return spark.createDataFrame(rows, "k long, v long, op string, seq int")


def _bucket_of(root: str, k: int) -> int:
    man = mf.read_manifest(root)
    expr = man["partition_expr"]
    import duckdb  # noqa: F401 — only to fail fast if unavailable

    # replay via the compiled layout (the sink's own machinery)
    from mapreduce_cs416_spark.sources.layout_replay import compile_layout
    import pyarrow as pa

    return int(compile_layout(man).bucket_ids(pa.table({"k": [k]}))[0])


def _disjoint_keys(root: str):
    """Two keys guaranteed to land in different buckets."""
    b0 = _bucket_of(root, 0)
    for k in range(1, 64):
        if _bucket_of(root, k) != b0:
            return 0, k
    raise AssertionError("no disjoint pair found")


class TestDisjointRebase:
    def test_disjoint_race_rebases_without_rerunning_the_merge(
        self, spark, tmp_path, monkeypatch
    ):
        root = str(tmp_path / "tbl")
        _mk(spark, root)
        ka, kb = _disjoint_keys(root)
        real_commit = mf._commit
        real_stage = mf._merge_stage
        stages = {"n": 0}

        def counting_stage(*a, **kw):
            stages["n"] += 1
            return real_stage(*a, **kw)

        state = {"raced": False}

        def racing(path, manifest):
            if not state["raced"] and manifest.get("op") == "merge":
                state["raced"] = True
                # the racer merges a DISJOINT bucket and wins the version
                mf.merge_into(spark, root, _ch(spark, [(kb, 7777, "U", 1)]))
            return real_commit(path, manifest)

        monkeypatch.setattr(mf, "_merge_stage", counting_stage)
        monkeypatch.setattr(mf, "_commit", racing)
        out = mf.merge_into(spark, root, _ch(spark, [(ka, 9999, "U", 1)]))
        monkeypatch.setattr(mf, "_commit", real_commit)
        assert state["raced"]
        # rebased, not re-run: ONE stage for our merge + one for the
        # racer's — a full retry would have staged a third time
        assert stages["n"] == 2
        assert out["op"] == "merge" and out["version"] == 3
        # both writers' rows landed exactly once
        got = {
            r["k"]: r["v"] for r in mf.read_table(spark, root).collect()
        }
        assert got[ka] == 9999 and got[kb] == 7777
        assert len(got) == 64
        # the rebased manifest folds exactly (delta-encoding replay)
        assert mf.read_manifest(root, 3) == out
        # and the staged rel was REUSED — it is referenced by v3
        live = {r for rels in out["buckets"].values() for r in rels}
        on_disk = set(os.listdir(os.path.join(root, "data")))
        assert {r.split("/", 1)[1] for r in live} <= on_disk

    def test_overlapping_race_reruns_the_merge(
        self, spark, tmp_path, monkeypatch
    ):
        root = str(tmp_path / "tbl")
        _mk(spark, root)
        ka, _ = _disjoint_keys(root)
        real_commit = mf._commit
        real_stage = mf._merge_stage
        stages = {"n": 0}

        def counting_stage(*a, **kw):
            stages["n"] += 1
            return real_stage(*a, **kw)

        state = {"raced": False}

        def racing(path, manifest):
            if not state["raced"] and manifest.get("op") == "merge":
                state["raced"] = True
                # the racer updates the SAME key — same bucket
                mf.merge_into(spark, root, _ch(spark, [(ka, 1111, "U", 5)]))
            return real_commit(path, manifest)

        monkeypatch.setattr(mf, "_merge_stage", counting_stage)
        monkeypatch.setattr(mf, "_commit", racing)
        mf.merge_into(spark, root, _ch(spark, [(ka, 2222, "U", 9)]))
        monkeypatch.setattr(mf, "_commit", real_commit)
        assert state["raced"]
        # full re-run: our stage ran twice (pre-race + retry) + racer's
        assert stages["n"] == 3
        got = {r["k"]: r["v"] for r in mf.read_table(spark, root).collect()}
        # the retry merged on top of the racer's commit — last writer's
        # image wins (seq 9 applied after the committed seq-5 state)
        assert got[ka] == 2222

    def test_dv_on_our_bucket_forces_rerun_no_resurrection(
        self, spark, tmp_path, monkeypatch
    ):
        root = str(tmp_path / "tbl")
        _mk(spark, root)
        ka, kb = _disjoint_keys(root)
        # make the racer DV-delete a DIFFERENT key in OUR bucket:
        # find one sharing ka's bucket
        same = next(
            k for k in range(1, 64)
            if k != ka and _bucket_of(root, k) == _bucket_of(root, ka)
        )
        real_commit = mf._commit
        state = {"raced": False}

        def racing(path, manifest):
            if not state["raced"] and manifest.get("op") == "merge":
                state["raced"] = True
                mf.delete_from(spark, root, f"k = {same}", mode="dv")
            return real_commit(path, manifest)

        monkeypatch.setattr(mf, "_commit", racing)
        mf.merge_into(spark, root, _ch(spark, [(ka, 3333, "U", 1)]))
        monkeypatch.setattr(mf, "_commit", real_commit)
        assert state["raced"]
        got = {r["k"]: r["v"] for r in mf.read_table(spark, root).collect()}
        # the deleted row must NOT resurrect through the merge rebase
        assert same not in got
        assert got[ka] == 3333

    def test_layout_change_forces_rerun(self, spark, tmp_path, monkeypatch):
        root = str(tmp_path / "tbl")
        _mk(spark, root)
        real_commit = mf._commit
        state = {"raced": False}

        def racing(path, manifest):
            if not state["raced"] and manifest.get("op") == "merge":
                state["raced"] = True
                mf.repartition_table(spark, root, n_buckets=2)
            return real_commit(path, manifest)

        monkeypatch.setattr(mf, "_commit", racing)
        out = mf.merge_into(spark, root, _ch(spark, [(3, 4444, "U", 1)]))
        monkeypatch.setattr(mf, "_commit", real_commit)
        assert state["raced"]
        # the retry re-bucketed under the NEW expression
        assert len(out["buckets"]) <= 2
        got = {r["k"]: r["v"] for r in mf.read_table(spark, root).collect()}
        assert got[3] == 4444 and len(got) == 64
