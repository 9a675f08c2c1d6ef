"""Cross-table atomic commits (sources/table_group.py — VERDICT r12
item 7): N named manifest tables under ONE commit log, so a group
commit is one put-if-absent file link and every member's new state
becomes visible together.

Claims pinned:

1. create/read round-trip, member pruning through the standard brain.
2. group_transact (merge + replace) lands atomically; time travel
   reads a mutually consistent member PAIR at every version.
3. CRASH INJECTION: a crash anywhere before the one commit leaves
   BOTH members at the previous version together, and the replayed
   transaction applies exactly once.
4. Commit races retry the whole transaction without data loss.
5. vacuum reclaims superseded member directories and crash orphans
   (age-gated) across all member data roots.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mapreduce_cs416_spark.operators import ivm
from mapreduce_cs416_spark.sources import manifest as mf
from mapreduce_cs416_spark.sources import table_group as tg

GROUP_COLS = ["g"]
MEASURES = {"total": "v"}


def _facts(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 2.0), (3, "b", 7.0), (4, "c", 5.0)],
        "k long, g string, v double",
    )


def _mk_group(spark, root: str) -> dict:
    facts = _facts(spark)
    return tg.create_group(
        spark,
        root,
        {
            "facts": {"df": facts, "key_cols": ["k"], "n_buckets": 4},
            "view": {
                "df": ivm.build_view(facts, GROUP_COLS, MEASURES),
                "key_cols": GROUP_COLS,
                "n_buckets": 2,
            },
        },
    )


def _snap(spark, root: str, version=None):
    facts = sorted(
        map(tuple, tg.read_group_table(spark, root, "facts", version).collect())
    )
    view = {
        r["g"]: (r["n_rows"], r["total"])
        for r in ivm.finalize(
            tg.read_group_table(spark, root, "view", version), GROUP_COLS
        ).collect()
    }
    return facts, view


def _transact_batch(spark, root: str, rows) -> dict:
    """One IVM step: merge the changelog into facts and replace the
    view — the replace is a THUNK (ADVICE r13) recomputed per commit
    attempt against the fresh group snapshot, landed in ONE commit."""
    changes = spark.createDataFrame(
        rows, "k long, g string, v double, op string, seq long"
    )

    def _fresh_view(s, r, version):
        snap = tg.read_group_table(s, r, "facts", version=version)
        view = tg.read_group_table(s, r, "view", version=version)
        delta = ivm.delta_view(snap, changes, ["k"], GROUP_COLS, MEASURES)
        return ivm.merge_deltas(view, delta, GROUP_COLS)

    return tg.group_transact(
        spark, root, merges={"facts": changes}, replaces={"view": _fresh_view}
    )


BATCH1 = [(2, "b", 2.0, "U", 1), (4, "c", None, "D", 1), (6, "d", 4.0, "U", 1)]
AFTER1_FACTS = [(1, "a", 10.0), (2, "b", 2.0), (3, "b", 7.0), (6, "d", 4.0)]
AFTER1_VIEW = {"a": (1, 10.0), "b": (2, 9.0), "d": (1, 4.0)}


class TestGroupBasics:
    def test_create_and_read_round_trip(self, spark, tmp_path):
        root = str(tmp_path / "grp")
        _mk_group(spark, root)
        facts, view = _snap(spark, root)
        assert facts == sorted(map(tuple, _facts(spark).collect()))
        assert view == {"a": (2, 12.0), "b": (1, 7.0), "c": (1, 5.0)}

    def test_member_point_read_prunes_to_one_bucket(self, spark, tmp_path):
        root = str(tmp_path / "grp")
        _mk_group(spark, root)
        got = tg.read_group_table(spark, root, "facts", predicate="k = 3")
        assert [tuple(r) for r in got.collect()] == [(3, "b", 7.0)]

    def test_unknown_member_fails_loudly(self, spark, tmp_path):
        root = str(tmp_path / "grp")
        _mk_group(spark, root)
        with pytest.raises(KeyError, match="facts"):
            tg.read_group_table(spark, root, "nope")

    def test_transact_and_time_travel_pairs(self, spark, tmp_path):
        root = str(tmp_path / "grp")
        _mk_group(spark, root)
        man = _transact_batch(spark, root, BATCH1)
        assert man["version"] == 2 and man["op"] == "group_transact"
        assert _snap(spark, root) == (AFTER1_FACTS, AFTER1_VIEW)
        # version 1 still reads the ORIGINAL pair — consistent together
        facts1, view1 = _snap(spark, root, version=1)
        assert facts1 == sorted(map(tuple, _facts(spark).collect()))
        assert view1 == {"a": (2, 12.0), "b": (1, 7.0), "c": (1, 5.0)}

    def test_view_always_recomputable_from_its_facts_version(self, spark, tmp_path):
        root = str(tmp_path / "grp")
        _mk_group(spark, root)
        _transact_batch(spark, root, BATCH1)
        _transact_batch(spark, root, [(1, "a", 11.0, "U", 2)])
        for v in (1, 2, 3):
            facts = tg.read_group_table(spark, root, "facts", version=v)
            view = tg.read_group_table(spark, root, "view", version=v)
            want = {
                r["g"]: (r["n_rows"], r["total"])
                for r in ivm.finalize(
                    ivm.build_view(facts, GROUP_COLS, MEASURES), GROUP_COLS
                ).collect()
            }
            got = {
                r["g"]: (r["n_rows"], r["total"])
                for r in ivm.finalize(view, GROUP_COLS).collect()
            }
            assert got == want, f"version {v} pair inconsistent"


class TestNativeFaces:
    def test_format_manifest_member_option(self, spark, tmp_path):
        # r13: spark.read.format('manifest').option('member', name)
        # reads one member of a group — equal to read_group_table,
        # schema pinned at the group version, pruning intact
        from mapreduce_cs416_spark.sources.manifest_source import (
            register_manifest_source, scan,
        )

        root = str(tmp_path / "grp")
        _mk_group(spark, root)
        _transact_batch(spark, root, BATCH1)
        register_manifest_source(spark)
        got = scan(spark, root, member="facts")
        assert sorted(map(tuple, got.collect())) == AFTER1_FACTS
        # time travel through the native face reads the v1 member
        v1 = scan(spark, root, member="facts", version=1)
        assert sorted(map(tuple, v1.collect())) == sorted(
            map(tuple, _facts(spark).collect())
        )
        # point read prunes + projects
        one = scan(spark, root, member="facts", predicate="k = 3",
                   columns=["g"])
        assert [r["g"] for r in one.collect()] == ["b"]
        with pytest.raises(Exception, match="member"):
            scan(spark, root, member="nope").collect()

    def test_member_option_refused_by_sink(self, spark, tmp_path):
        from mapreduce_cs416_spark.sources.manifest_source import (
            ManifestDataSource,
        )

        root = str(tmp_path / "grp")
        _mk_group(spark, root)
        ds = ManifestDataSource({"path": root, "member": "facts"})
        with pytest.raises(ValueError, match="group_transact"):
            ds.streamWriter(None, False)

    def test_read_group_changes(self, spark, tmp_path):
        # the member CDF: facts changes between group versions replay
        # the batch exactly; cdc_merge round-trips snapshot@1 -> @2
        from mapreduce_cs416_spark.operators import cdc

        root = str(tmp_path / "grp")
        _mk_group(spark, root)
        _transact_batch(spark, root, BATCH1)
        feed = tg.read_group_changes(spark, root, "facts", 1, 2)
        rows = {(r["k"], r["g"], r["v"], r["op"]) for r in feed.collect()}
        assert rows == {
            (2, "b", 2.0, "U"), (6, "d", 4.0, "U"), (4, None, None, "D"),
        } or rows == {
            (2, "b", 2.0, "U"), (6, "d", 4.0, "U"), (4, "c", 5.0, "D"),
        }
        snap1 = tg.read_group_table(spark, root, "facts", version=1)
        rebuilt = cdc.cdc_merge(snap1, feed, ["k"], op_col="op", seq_col=None)
        assert sorted(map(tuple, rebuilt.collect())) == AFTER1_FACTS
        # the view member's feed exists over the same window too
        vfeed = tg.read_group_changes(spark, root, "view", 1, 2)
        assert vfeed.count() > 0


class TestCrashAtomicity:
    def test_crash_before_commit_reverts_both_then_replay_applies_once(
        self, spark, tmp_path, monkeypatch
    ):
        """The headline claim: ALL staging is done (both members' data
        written) and the process dies before the one group commit —
        neither member moves; the replayed transaction lands exactly
        once."""
        root = str(tmp_path / "grp")
        _mk_group(spark, root)
        before = _snap(spark, root)

        real_commit = mf._commit

        def dying_commit(path, manifest):
            raise RuntimeError("injected crash before group publish")

        monkeypatch.setattr(mf, "_commit", dying_commit)
        with pytest.raises(RuntimeError, match="injected crash"):
            _transact_batch(spark, root, BATCH1)
        monkeypatch.setattr(mf, "_commit", real_commit)

        # both members revert TOGETHER — the old pair is intact
        assert mf.current_version(root) == 1
        assert _snap(spark, root) == before
        # replay applies exactly once
        _transact_batch(spark, root, BATCH1)
        assert _snap(spark, root) == (AFTER1_FACTS, AFTER1_VIEW)
        assert mf.current_version(root) == 2

    def test_commit_race_retries_whole_transaction(
        self, spark, tmp_path, monkeypatch
    ):
        """A racing IVM maintainer steals the version mid-transaction:
        group_transact must retry from the fresh manifest and apply on
        top of the racer's commit — no lost updates on either side, AND
        (ADVICE r13) the retried view REPLACE must be recomputed from
        the racer's snapshot, not republished stale: view == recompute
        from the final facts."""
        root = str(tmp_path / "grp")
        _mk_group(spark, root)
        real_commit = mf._commit
        state = {"raced": False}

        def racing(path, manifest):
            if not state["raced"] and manifest.get("op") == "group_transact":
                state["raced"] = True
                # the racer is itself a proper maintainer: merges facts
                # AND replaces the view in its own atomic commit
                _transact_batch(spark, root, [(9, "z", 1.0, "U", 1)])
            return real_commit(path, manifest)

        monkeypatch.setattr(mf, "_commit", racing)
        _transact_batch(spark, root, BATCH1)
        monkeypatch.setattr(mf, "_commit", real_commit)
        assert state["raced"]
        facts, view = _snap(spark, root)
        assert facts == sorted(AFTER1_FACTS + [(9, "z", 1.0)])
        # the invariant the thunk protects: the published view equals a
        # recomputation over the final facts (includes the racer's 'z')
        want = {
            r["g"]: (r["n_rows"], r["total"])
            for r in ivm.finalize(
                ivm.build_view(
                    tg.read_group_table(spark, root, "facts"),
                    GROUP_COLS, MEASURES,
                ),
                GROUP_COLS,
            ).collect()
        }
        assert view == want

    def test_conflict_with_plain_dataframe_replace_raises(
        self, spark, tmp_path, monkeypatch
    ):
        """A plain-DataFrame replace is a lazy plan pinned to the
        pre-conflict snapshot — on CommitConflict group_transact must
        REFUSE to retry it (silent retry would publish a stale view
        next to freshly-merged facts)."""
        root = str(tmp_path / "grp")
        _mk_group(spark, root)
        real_commit = mf._commit
        state = {"raced": False}

        def racing(path, manifest):
            if not state["raced"] and manifest.get("op") == "group_transact":
                state["raced"] = True
                _transact_batch(spark, root, [(9, "z", 1.0, "U", 1)])
            return real_commit(path, manifest)

        changes = spark.createDataFrame(
            BATCH1, "k long, g string, v double, op string, seq long"
        )
        snap = tg.read_group_table(spark, root, "facts")
        view = tg.read_group_table(spark, root, "view")
        stale_view = ivm.merge_deltas(
            view, ivm.delta_view(snap, changes, ["k"], GROUP_COLS, MEASURES),
            GROUP_COLS,
        )
        monkeypatch.setattr(mf, "_commit", racing)
        with pytest.raises(mf.CommitConflict, match="stale"):
            tg.group_transact(
                spark, root,
                merges={"facts": changes}, replaces={"view": stale_view},
            )
        monkeypatch.setattr(mf, "_commit", real_commit)
        # nothing half-landed: the group is exactly at the racer's commit
        facts, view_now = _snap(spark, root)
        assert (9, "z", 1.0) in facts and (2, "a", 2.0) in facts

    def test_vacuum_reclaims_superseded_and_orphaned_member_dirs(
        self, spark, tmp_path, monkeypatch
    ):
        root = str(tmp_path / "grp")
        _mk_group(spark, root)
        _transact_batch(spark, root, BATCH1)
        # leave a crash orphan under a member
        real_commit = mf._commit
        monkeypatch.setattr(
            mf, "_commit",
            lambda *a: (_ for _ in ()).throw(RuntimeError("crash")),
        )
        with pytest.raises(RuntimeError):
            _transact_batch(spark, root, [(7, "e", 1.0, "U", 3)])
        monkeypatch.setattr(mf, "_commit", real_commit)
        before = _snap(spark, root)
        removed = mf.vacuum(root, keep_versions=1, orphan_min_age_s=0.0)
        assert removed > 0  # superseded v1 dirs + the crash orphans
        assert _snap(spark, root) == before
        # every member data dir that remains is referenced by the one
        # kept manifest
        g = mf.read_manifest(root)
        live = set()
        for name, e in g["tables"].items():
            for rels in e["buckets"].values():
                live |= {os.path.join(root, name, r) for r in rels}
        on_disk = set()
        for name in g["tables"]:
            droot = os.path.join(root, name, "data")
            on_disk |= {os.path.join(root, name, "data", d)
                        for d in os.listdir(droot)}
        assert on_disk == live


class TestTxnCursorAndEvolution:
    def test_txn_replay_absorbed_without_version_burn(
        self, spark, tmp_path
    ):
        """r14: txn=(app_id, version) is the group analog of the native
        sink's batch cursor — a re-delivered transaction is absorbed
        without publishing a version OR invoking replace thunks, and a
        version below the cursor fails loudly (fresh/rolled-back
        checkpoint, never normal replay)."""
        root = str(tmp_path / "grp")
        _mk_group(spark, root)
        changes = spark.createDataFrame(
            BATCH1, "k long, g string, v double, op string, seq long"
        )
        calls = {"n": 0}

        def _fresh(s, r, version):
            calls["n"] += 1
            snap = tg.read_group_table(s, r, "facts", version=version)
            view = tg.read_group_table(s, r, "view", version=version)
            delta = ivm.delta_view(snap, changes, ["k"], GROUP_COLS, MEASURES)
            return ivm.merge_deltas(view, delta, GROUP_COLS)

        man = tg.group_transact(
            spark, root, merges={"facts": changes},
            replaces={"view": _fresh}, txn=("maint", 0),
        )
        assert man["version"] == 2
        assert man["stream_cursors"] == {"maint": 0}
        assert calls["n"] == 1
        # replay of the SAME transaction: absorbed — no new version,
        # thunk never invoked, state unchanged
        replay = tg.group_transact(
            spark, root, merges={"facts": changes},
            replaces={"view": _fresh}, txn=("maint", 0),
        )
        assert replay["version"] == 2 and calls["n"] == 1
        assert _snap(spark, root) == (AFTER1_FACTS, AFTER1_VIEW)
        # the next transaction advances the cursor
        ch2 = spark.createDataFrame(
            [(7, "e", 1.0, "U", 2)], "k long, g string, v double, op string, seq long"
        )
        man3 = tg.group_transact(
            spark, root, merges={"facts": ch2}, txn=("maint", 1)
        )
        assert man3["stream_cursors"] == {"maint": 1}
        # a txn BELOW the cursor is a checkpoint mismatch — loud
        with pytest.raises(RuntimeError, match="cursor"):
            tg.group_transact(
                spark, root, merges={"facts": ch2}, txn=("maint", 0)
            )
        # an unrelated app_id keeps its own cursor
        man4 = tg.group_transact(
            spark, root, merges={"facts": spark.createDataFrame(
                [(8, "f", 2.0, "U", 1)],
                "k long, g string, v double, op string, seq long",
            )}, txn=("other", 5),
        )
        assert man4["stream_cursors"] == {"maint": 1, "other": 5}

    def test_member_schema_evolution_through_group_merge(self, spark, tmp_path):
        """A member merge carrying a NEW column evolves that member's
        schema (manifest._merge_stage semantics) while siblings keep
        theirs; old rows read typed nulls for the added column and the
        pair stays mutually consistent at every version."""
        root = str(tmp_path / "grp")
        _mk_group(spark, root)
        ev = spark.createDataFrame(
            [(1, "a", 10.0, "x", "U", 1), (6, "d", 4.0, "y", "U", 1)],
            "k long, g string, v double, note string, op string, seq long",
        )
        tg.group_transact(spark, root, merges={"facts": ev})
        facts = tg.read_group_table(spark, root, "facts")
        assert facts.columns == ["k", "g", "v", "note"]
        got = {(r["k"], r["note"]) for r in facts.collect()}
        assert got == {(1, "x"), (6, "y"), (2, None), (3, None), (4, None)}
        # the sibling member's schema is untouched
        view = tg.read_group_table(spark, root, "view")
        assert "note" not in view.columns
        # time travel reads the pre-evolution member shape
        v1 = tg.read_group_table(spark, root, "facts", version=1)
        assert v1.columns == ["k", "g", "v"]
        # and the member CDF crosses the evolution boundary in the
        # EVOLVED shape (the standalone source's contract)
        feed = tg.read_group_changes(spark, root, "facts", 1, 2)
        assert "note" in feed.columns and feed.count() > 0


class TestGroupRebase:
    def test_disjoint_member_race_rebases_without_restaging(
        self, spark, tmp_path, monkeypatch
    ):
        """r14: a merges-only group transaction whose winner touched
        DISJOINT members folds its staged member entries onto the
        fresh group manifest — one stage pass, both writers' changes
        land, every version pair consistent."""
        root = str(tmp_path / "grp")
        # two independent fact members + the view (untouched here)
        facts = _facts(spark)
        tg.create_group(
            spark, root,
            {
                "facts": {"df": facts, "key_cols": ["k"], "n_buckets": 4},
                "other": {"df": facts, "key_cols": ["k"], "n_buckets": 2},
            },
        )
        real_commit = mf._commit
        real_stage = mf._merge_stage
        stages = {"n": 0}

        def counting_stage(*a, **kw):
            stages["n"] += 1
            return real_stage(*a, **kw)

        state = {"raced": False}

        def racing(path, manifest):
            if not state["raced"] and manifest.get("op") == "group_transact":
                state["raced"] = True
                racer = spark.createDataFrame(
                    [(9, "z", 1.0, "U", 1)],
                    "k long, g string, v double, op string, seq long",
                )
                tg.group_transact(spark, root, merges={"other": racer})
            return real_commit(path, manifest)

        ours = spark.createDataFrame(
            [(1, "a", 55.0, "U", 1)],
            "k long, g string, v double, op string, seq long",
        )
        monkeypatch.setattr(mf, "_merge_stage", counting_stage)
        monkeypatch.setattr(mf, "_commit", racing)
        out = tg.group_transact(spark, root, merges={"facts": ours})
        monkeypatch.setattr(mf, "_commit", real_commit)
        assert state["raced"]
        # rebased: one stage for ours + one for the racer's — a full
        # retry would have staged a third time
        assert stages["n"] == 2
        assert out["version"] == 3
        got_f = {(r["k"], r["v"]) for r in tg.read_group_table(spark, root, "facts").collect()}
        got_o = {(r["k"], r["v"]) for r in tg.read_group_table(spark, root, "other").collect()}
        assert (1, 55.0) in got_f and (9, 1.0) in got_o
        # fold-exactness of the rebased commit
        assert mf.read_manifest(root, 3) == out

    def test_same_member_race_retries_whole_transaction(
        self, spark, tmp_path, monkeypatch
    ):
        root = str(tmp_path / "grp")
        _mk_group(spark, root)
        real_commit = mf._commit
        real_stage = mf._merge_stage
        stages = {"n": 0}

        def counting_stage(*a, **kw):
            stages["n"] += 1
            return real_stage(*a, **kw)

        state = {"raced": False}

        def racing(path, manifest):
            if not state["raced"] and manifest.get("op") == "group_transact":
                state["raced"] = True
                racer = spark.createDataFrame(
                    [(9, "z", 1.0, "U", 1)],
                    "k long, g string, v double, op string, seq long",
                )
                tg.group_transact(spark, root, merges={"facts": racer})
            return real_commit(path, manifest)

        ours = spark.createDataFrame(
            [(1, "a", 55.0, "U", 9)],
            "k long, g string, v double, op string, seq long",
        )
        monkeypatch.setattr(mf, "_merge_stage", counting_stage)
        monkeypatch.setattr(mf, "_commit", racing)
        tg.group_transact(spark, root, merges={"facts": ours})
        monkeypatch.setattr(mf, "_commit", real_commit)
        assert state["raced"]
        # same member: full re-run (ours staged twice + racer's once)
        assert stages["n"] == 3
        got = {(r["k"], r["v"]) for r in tg.read_group_table(spark, root, "facts").collect()}
        assert (1, 55.0) in got and (9, 1.0) in got
