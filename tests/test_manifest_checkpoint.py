"""Manifest metadata checkpointing (VERDICT r11 item 1).

The native sink commits ONE version per micro-batch, so a day of 1 s
triggers is ~86k manifests: per-commit metadata must be O(change) and
latest-version resolution must be O(1), or every streaming table hits
the metadata wall first. Pinned here:

1. commits between checkpoints are DELTAS carrying only the touched
   buckets/stats/cursor entries; every ``_CHECKPOINT_EVERY``-th commit
   is a self-contained snapshot (Delta's checkpoint-interval shape);
2. the fold is EXACT: ``read_manifest`` reproduces the writer's full
   manifest byte-for-byte after every kind of op;
3. reads never list ``_manifests`` (a ``_latest`` pointer + forward
   probe resolves the version in O(1) file ops) and open a BOUNDED
   number of metadata files regardless of commit count — a
   1000-commit table reads like a 10-commit one;
4. ``vacuum`` materializes the oldest kept version before dropping
   its fold base, so retained time travel survives log truncation.
"""

from __future__ import annotations

import builtins
import json
import os

import pytest
from pyspark.sql import functions as F

from mapreduce_cs416_spark.sources import manifest as mf


def _raw(path: str, version: int) -> dict:
    with open(os.path.join(path, "_manifests", f"v{version}.json")) as fh:
        return json.load(fh)


def _mk_table(spark, root: str, n: int = 64, n_buckets: int = 8) -> dict:
    df = spark.range(0, n).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    return mf.create_table(df, root, ["k"], n_buckets=n_buckets)


def _merge_one(spark, root: str, k: int, v: int) -> dict:
    ch = spark.createDataFrame([(k, v, "U", 1)], "k long, v long, op string, seq int")
    return mf.merge_into(spark, root, ch)


class TestDeltaEncoding:
    def test_commits_between_checkpoints_are_bounded_deltas(self, spark, tmp_path):
        root = str(tmp_path / "tbl")
        _mk_table(spark, root)
        man = mf.read_manifest(root)
        n_total = len(man["buckets"])
        assert _raw(root, 1).get("kind") != "delta"  # v1 self-contained
        _merge_one(spark, root, 3, 999)  # touches exactly one bucket
        raw = _raw(root, 2)
        assert raw["kind"] == "delta"
        assert len(raw["d"]["buckets"]["set"]) == 1  # O(change), not O(table)
        assert len(raw["d"]["buckets"]["set"]) < n_total

    def test_every_kth_commit_is_self_contained(self, spark, tmp_path):
        root = str(tmp_path / "tbl")
        _mk_table(spark, root, n=32, n_buckets=4)
        for i in range(mf._CHECKPOINT_EVERY + 2):
            _merge_one(spark, root, i % 32, 1000 + i)
        kinds = [
            _raw(root, v).get("kind") for v in range(1, mf._CHECKPOINT_EVERY + 3)
        ]
        # v1 full, then deltas until the checkpoint commit, then deltas
        assert kinds[0] is None
        assert kinds[1:mf._CHECKPOINT_EVERY] == ["delta"] * (mf._CHECKPOINT_EVERY - 1)
        assert kinds[mf._CHECKPOINT_EVERY] is None  # the checkpoint
        assert kinds[mf._CHECKPOINT_EVERY + 1] == "delta"

    def test_fold_reproduces_writer_manifest_exactly(self, spark, tmp_path):
        # the strongest equivalence claim: after EVERY kind of op the
        # folded read equals the full dict the writer built in memory
        root = str(tmp_path / "tbl")
        returned = [_mk_table(spark, root, n=48, n_buckets=4)]
        returned.append(_merge_one(spark, root, 7, 1))
        app = spark.createDataFrame([(100, 5)], "k long, v long")
        returned.append(mf.append_into(spark, root, app))
        returned.append(mf.delete_from(spark, root, "k = 3", mode="dv"))
        returned.append(mf.delete_from(spark, root, "k = 5"))
        returned.append(mf.compact(spark, root))
        returned.append(mf.repartition_table(spark, root, n_buckets=2))
        for man in returned:
            assert mf.read_manifest(root, man["version"]) == man

    def test_group_commit_deltas_are_per_bucket_not_per_member(
        self, spark, tmp_path
    ):
        """r14 (VERDICT r13 item 4): the recursive differ makes a
        table-GROUP commit persist O(changed buckets), not O(member
        manifest) — a one-bucket merge into a 32-bucket member writes
        ONE bucket entry under d.tables.<member>.d.buckets, and the
        fold reproduces the writer's dict exactly across a long chain."""
        from mapreduce_cs416_spark.sources import table_group as tg

        root = str(tmp_path / "grp")
        facts = spark.range(0, 256).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        tg.create_group(
            spark, root,
            {
                "facts": {"df": facts, "key_cols": ["k"], "n_buckets": 32},
                "side": {"df": facts.limit(4), "key_cols": ["k"],
                         "n_buckets": 2},
            },
        )
        returned = []
        for i in range(2, 8):  # v2..v7, all deltas (checkpoint at 10)
            ch = spark.createDataFrame(
                [(i, 1000 + i, "U", 1)], "k long, v long, op string, seq int"
            )
            returned.append(
                tg.group_transact(spark, root, merges={"facts": ch})
            )
        n_buckets_total = len(mf.read_manifest(root)["tables"]["facts"]["buckets"])
        assert n_buckets_total > 8
        for v in range(2, 8):
            raw = _raw(root, v)
            assert raw["kind"] == "delta"
            member = raw["d"]["tables"]["d"]["facts"]
            # the untouched member never appears in the delta at all
            assert "side" not in raw["d"]["tables"].get("d", {})
            assert "side" not in raw["d"]["tables"].get("set", {})
            # O(changed buckets): exactly the one bucket the merge touched
            touched = member["d"]["buckets"].get("set", {})
            assert len(touched) == 1
            assert len(json.dumps(raw)) < len(json.dumps(mf.read_manifest(root, v))) / 4
        # fold-exactness across the whole chain: replaying the log
        # reproduces every writer-returned dict byte-for-byte
        for man in returned:
            assert mf.read_manifest(root, man["version"]) == man

    def test_read_table_unchanged_across_delta_chain(self, spark, tmp_path):
        root = str(tmp_path / "tbl")
        _mk_table(spark, root, n=40, n_buckets=4)
        for i in range(12):  # crosses a checkpoint boundary
            _merge_one(spark, root, i, 5000 + i)
        got = {(r["k"], r["v"]) for r in mf.read_table(spark, root).collect()}
        exp = {(k, 5000 + k) for k in range(12)} | {
            (k, 2 * k) for k in range(12, 40)
        }
        assert got == exp
        # time travel into the middle of the chain folds correctly too
        assert mf.read_table(spark, root, version=5).count() == 40


class TestBoundedMetadataIO:
    def test_read_never_lists_the_manifest_dir(self, spark, tmp_path, monkeypatch):
        root = str(tmp_path / "tbl")
        _mk_table(spark, root)
        _merge_one(spark, root, 1, 1)
        mdir = os.path.realpath(os.path.join(root, "_manifests"))
        calls = []
        real = os.listdir

        def spy(p="."):
            if os.path.realpath(str(p)) == mdir:
                calls.append(p)
            return real(p)

        monkeypatch.setattr(os, "listdir", spy)
        mf.read_manifest(root)
        mf.resolve_read_dirs(spark, root, "k = 1")
        assert calls == []  # O(1) pointer + probes, never a listing

    def test_thousand_commit_table_reads_like_a_ten_commit_one(
        self, spark, tmp_path, monkeypatch
    ):
        # metadata-only commits simulate a long-running native sink
        # (one version per micro-batch); the read must open a BOUNDED
        # number of manifest files — pointer + probes + delta chain —
        # independent of total commit count
        root = str(tmp_path / "tbl")
        _mk_table(spark, root, n=16, n_buckets=4)
        man = mf.read_manifest(root)
        for i in range(2, 1001):
            man = {**man, "version": i, "op": "stream_append",
                   "stream_cursors": {"s": i}}
            mf._commit(root, man)
            man = mf.read_manifest(root)  # what a sink's next batch reads
        assert mf.current_version(root) == 1000

        opens = []
        real_open = builtins.open

        def spy(file, *a, **kw):
            f = str(file)
            if "_manifests" in f:
                opens.append(f)
            return real_open(file, *a, **kw)

        monkeypatch.setattr(builtins, "open", spy)
        got = mf.read_manifest(root)
        assert got["version"] == 1000 and got["stream_cursors"] == {"s": 1000}
        # 1 pointer read + <= _CHECKPOINT_EVERY chain files
        assert len(opens) <= 1 + mf._CHECKPOINT_EVERY

    def test_stale_or_missing_pointer_degrades_gracefully(self, spark, tmp_path):
        root = str(tmp_path / "tbl")
        _mk_table(spark, root)
        _merge_one(spark, root, 1, 1)
        _merge_one(spark, root, 2, 2)
        ptr = os.path.join(root, "_manifests", mf._LATEST_PTR)
        # stale pointer: forward probe finds the real latest
        with open(ptr, "w") as fh:
            fh.write("1")
        assert mf.current_version(root) == 3
        # missing pointer: one-time listing fallback
        os.remove(ptr)
        assert mf.current_version(root) == 3
        # corrupt pointer: fallback too
        with open(ptr, "w") as fh:
            fh.write("garbage")
        assert mf.current_version(root) == 3


class TestVacuumInterplay:
    def test_vacuum_materializes_oldest_kept_delta(self, spark, tmp_path):
        root = str(tmp_path / "tbl")
        _mk_table(spark, root, n=32, n_buckets=4)
        for i in range(6):
            _merge_one(spark, root, i, 100 + i)  # v2..v7, all deltas
        assert _raw(root, 5)["kind"] == "delta"
        mf.vacuum(root, keep_versions=3, orphan_min_age_s=0.0)
        # v1..v4 manifests gone; v5 (oldest kept) materialized full
        assert not os.path.exists(os.path.join(root, "_manifests", "v4.json"))
        assert _raw(root, 5).get("kind") != "delta"
        # all retained versions still fold/read
        for v in (5, 6, 7):
            assert mf.read_table(spark, root, version=v).count() == 32
        with pytest.raises(FileNotFoundError):
            mf.read_manifest(root, 2)
        # the pointer survived vacuum and the next commit still works
        assert mf.current_version(root) == 7
        _merge_one(spark, root, 0, 1)
        assert mf.current_version(root) == 8

    def test_reader_racing_vacuum_retries_onto_materialized_snapshot(
        self, spark, tmp_path, monkeypatch
    ):
        """ADVICE r12 (low): a reader that opened a KEPT version as a
        delta just before vacuum's os.replace can walk below the new
        horizon (its base was just deleted). read_manifest must retry
        the chain walk once from a fresh open — which then sees the
        materialized full snapshot — instead of failing a read of a
        version that is still retained."""
        import io

        root = str(tmp_path / "tbl")
        _mk_table(spark, root, n=32, n_buckets=4)
        for i in range(6):
            _merge_one(spark, root, i, 100 + i)  # v2..v7, all deltas
        pre_vacuum_v5 = json.dumps(_raw(root, 5))  # delta encoding
        assert json.loads(pre_vacuum_v5)["kind"] == "delta"
        expected = mf.read_manifest(root, 5)
        mf.vacuum(root, keep_versions=3, orphan_min_age_s=0.0)
        # simulate the race: the reader's FIRST open of v5.json yields
        # the pre-vacuum delta (as if opened just before os.replace),
        # while its base v4.json is already gone; the retry's fresh
        # open reads the real, now-materialized snapshot
        v5_path = os.path.realpath(os.path.join(root, "_manifests", "v5.json"))
        state = {"stale_served": False}
        real_open = builtins.open

        def racy_open(file, *a, **kw):
            if (
                not state["stale_served"]
                and os.path.realpath(str(file)) == v5_path
            ):
                state["stale_served"] = True
                return io.StringIO(pre_vacuum_v5)
            return real_open(file, *a, **kw)

        monkeypatch.setattr(builtins, "open", racy_open)
        got = mf.read_manifest(root, 5)
        assert state["stale_served"]  # the race actually happened
        # materialization resets the chain-length counter; everything
        # that determines visible data must be identical
        drop = {"chain"}
        assert {k: v for k, v in got.items() if k not in drop} == {
            k: v for k, v in expected.items() if k not in drop
        }
