"""Versioned-manifest table format (sources/manifest.py): commit
atomicity, merge correctness vs the batch cdc_merge oracle, the
bounded-write guarantee (untouched partitions are never rewritten —
the property the whole layer exists for), replay idempotence, time
travel, and vacuum. Streaming face: the foreachBatch pipeline matches
a batch replay and keeps per-batch writes partition-bounded."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mapreduce_cs416_spark.operators import cdc
from mapreduce_cs416_spark.sources import manifest as mf


def _orders(spark, sf_dir):
    from mapreduce_cs416_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )


def _changelog(orders, lo: int, hi: int):
    """Key-LOCAL changelog: updates + deletes confined to the key
    range [lo, hi) plus a few inserts just above it — the arrival
    shape (recent keys churn) that makes partition-bounded merges
    worth having."""
    upd = (
        orders.where((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi))
        .withColumn(
            "op",
            F.when(F.col("o_orderkey") % 7 == 0, F.lit("D")).otherwise(F.lit("U")),
        )
        .withColumn("seq", F.col("o_orderkey") * 10)
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 1.1, 2))
    )
    ins = (
        orders.orderBy("o_orderkey").limit(3)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.col("o_orderkey"))
    )
    return upd.unionByName(ins)


RANGE_EXPR = "floor(o_orderkey / 256)"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def seeded(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_tbl")
    orders = _orders(spark, sf_dir)
    man = mf.create_table(orders, path, ["o_orderkey"], partition_expr=RANGE_EXPR)
    return path, orders, man


def test_create_read_round_trip(spark, seeded):
    path, orders, man = seeded
    assert man["version"] == 1
    got = mf.read_table(spark, path)
    assert got.columns == orders.columns
    assert _sorted_rows(got) == _sorted_rows(orders)


def test_merge_matches_batch_cdc_merge_oracle(spark, seeded):
    path, orders, _ = seeded
    batch = _changelog(orders, 0, 512)
    expected = cdc.cdc_merge(orders, batch, ["o_orderkey"], op_col="op", seq_col="seq")
    man = mf.merge_into(spark, path, batch)
    assert man["version"] == 2
    assert _sorted_rows(mf.read_table(spark, path)) == _sorted_rows(expected)


def test_untouched_partitions_are_never_rewritten(spark, seeded):
    """THE bounded-write pin: after a key-local merge, every
    untouched partition's manifest entry still points at the v1
    directory, and those files on disk are bit-identical (same paths,
    sizes, mtimes) — the merge never read or wrote them."""
    path, orders, man1 = seeded
    before = {b: list(rels) for b, rels in man1["buckets"].items()}

    def _files(bucket: str, rels: list[str]):
        out = {}
        for rel in rels:
            d = os.path.join(path, rel, f"_bucket={bucket}")
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    fp = os.path.join(d, f)
                    out[fp] = (os.path.getsize(fp), os.path.getmtime(fp))
        return out

    snap_before = {b: _files(b, rels) for b, rels in before.items()}

    batch = _changelog(orders, 0, 512)
    touched = {
        str(r[0])
        for r in batch.selectExpr(f"cast(({RANGE_EXPR}) as long)").distinct().collect()
    }
    man2 = mf.merge_into(spark, path, batch)

    untouched = set(before) - touched
    assert untouched, "fixture must leave some partitions untouched"
    rewritten = {b for b in man2["buckets"] if man2["buckets"][b] != before.get(b)}
    # 1) write volume is bounded by the touched set
    assert rewritten <= touched
    # 2) untouched entries still reference v1 and the files are intact
    for b in untouched:
        assert man2["buckets"][b] == before[b]
        assert _files(b, before[b]) == snap_before[b]


def test_replay_is_idempotent(spark, seeded):
    path, orders, _ = seeded
    batch = _changelog(orders, 0, 512)
    mf.merge_into(spark, path, batch)
    once = _sorted_rows(mf.read_table(spark, path))
    man = mf.merge_into(spark, path, batch)  # the replayed micro-batch
    assert man["version"] == 3
    assert _sorted_rows(mf.read_table(spark, path)) == once


def test_time_travel_and_vacuum(spark, seeded):
    path, orders, _ = seeded
    v1 = _sorted_rows(mf.read_table(spark, path, version=1))
    mf.merge_into(spark, path, _changelog(orders, 0, 512))
    # old version stays readable until vacuum (commits never mutate)
    assert _sorted_rows(mf.read_table(spark, path, version=1)) == v1
    latest = _sorted_rows(mf.read_table(spark, path))
    removed = mf.vacuum(path)
    assert removed > 0
    assert _sorted_rows(mf.read_table(spark, path)) == latest
    with pytest.raises(FileNotFoundError):
        mf.read_manifest(path, version=1)


def test_delete_only_batch_can_empty_a_partition(spark, seeded):
    path, orders, man1 = seeded
    # wipe the whole first partition
    kill = (
        orders.where(F.expr(RANGE_EXPR) == 0)
        .withColumn("op", F.lit("D"))
        .withColumn("seq", F.lit(1).cast("long"))
    )
    assert kill.count() > 0
    man2 = mf.merge_into(spark, path, kill)
    assert "0" not in man2["buckets"]
    got = mf.read_table(spark, path)
    assert got.where(F.expr(RANGE_EXPR) == 0).count() == 0


def test_streaming_manifest_merge_matches_batch_and_bounds_writes(
    spark, sf_dir, tmp_path
):
    """Stream==batch for the manifest-backed CDC service, plus the
    bounded-write property across micro-batches: each batch's new
    version directory contains only that batch's touched partitions."""
    from mapreduce_cs416_spark.streaming import pipelines as sp

    orders = _orders(spark, sf_dir)
    path = str(tmp_path / "tbl")
    mf.create_table(orders, path, ["o_orderkey"], partition_expr=RANGE_EXPR)

    batches = [_changelog(orders, i * 256, (i + 1) * 256) for i in range(3)]
    change_dir = str(tmp_path / "changes")
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("overwrite").parquet(f"{change_dir}/bat={i}")
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in batches[0].schema.fields
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{change_dir}/bat=*")
    )
    q = sp.streaming_cdc_merge_manifest(stream, path)
    q.awaitTermination()

    expected = orders
    for b in batches:
        expected = cdc.cdc_merge(expected, b, ["o_orderkey"], op_col="op", seq_col="seq")
    assert _sorted_rows(mf.read_table(spark, path)) == _sorted_rows(expected)

    # bounded writes: no version directory holds more partitions than
    # the widest batch touched (each batch spans ≤ 2 key-partitions
    # plus the shared insert partition)
    max_touched = max(
        b.selectExpr(f"cast(({RANGE_EXPR}) as long)").distinct().count()
        for b in batches
    )
    data_root = os.path.join(path, "data")
    for vdir in os.listdir(data_root):
        if vdir == "v1":
            continue
        parts = [d for d in os.listdir(os.path.join(data_root, vdir)) if d.startswith("_bucket=")]
        assert 0 < len(parts) <= max_touched


def test_append_into_never_touches_existing_files_and_compact_folds(
    spark, seeded
):
    """The append/compact pair: appends add one directory per touched
    bucket per batch without reading or rewriting ANY existing file;
    compact folds multi-directory buckets back to one under a single
    new version with content identical — and, unlike
    io.compact_table's directory swap, the previous version stays
    readable throughout (no unavailability window)."""
    path, orders, man1 = seeded

    # new unique keys that land in EXISTING partitions (1500..1599 →
    # the tail buckets) so appends visibly accumulate directories
    extra1 = (
        orders.orderBy("o_orderkey").limit(50)
        .withColumn("o_orderkey", F.col("o_orderkey") + 1500)
    )
    extra2 = (
        orders.orderBy("o_orderkey").limit(50)
        .withColumn("o_orderkey", F.col("o_orderkey") + 1550)
    )
    man2 = mf.append_into(spark, path, extra1)
    man3 = mf.append_into(spark, path, extra2)
    assert man3["version"] == 3
    # appended buckets accumulated directories; none lost the original
    grew = [b for b, rels in man3["buckets"].items() if len(rels) > 1]
    assert grew, man3["buckets"]
    for b, rels in man1["buckets"].items():
        assert man3["buckets"][b][0] == rels[0]

    expected = _sorted_rows(
        mf.read_table(spark, path, version=1).unionByName(extra1).unionByName(extra2)
    )
    assert _sorted_rows(mf.read_table(spark, path)) == expected

    man4 = mf.compact(spark, path)
    assert man4["version"] == 4
    assert all(len(rels) == 1 for rels in man4["buckets"].values())
    assert _sorted_rows(mf.read_table(spark, path)) == expected
    # the pre-compact version is still readable (no swap window)
    assert _sorted_rows(mf.read_table(spark, path, version=3)) == expected
    # compact with nothing fragmented is a no-op commit-wise
    assert mf.compact(spark, path)["version"] == 4


def test_merge_consolidates_appended_bucket(spark, seeded):
    """A merge over a bucket fragmented by appends reads ALL its
    directories (missing one would resurrect deleted rows or lose
    appends) and leaves the bucket single-directory again."""
    path, orders, _ = seeded
    extra = orders.withColumn("o_orderkey", F.col("o_orderkey") + 128).limit(20)
    mf.append_into(spark, path, extra)
    batch = _changelog(orders, 0, 512)
    expected = cdc.cdc_merge(
        mf.read_table(spark, path), batch, ["o_orderkey"], op_col="op", seq_col="seq"
    )
    man = mf.merge_into(spark, path, batch)
    assert _sorted_rows(mf.read_table(spark, path)) == _sorted_rows(expected)
    touched = {
        str(r[0])
        for r in batch.selectExpr(f"cast(({RANGE_EXPR}) as long)").distinct().collect()
    }
    for b in touched & man["buckets"].keys():
        assert len(man["buckets"][b]) == 1


def test_view_commits_atomically_with_snapshot_and_crash_is_invisible(
    spark, seeded, monkeypatch
):
    """The aux-table commit (VERDICT r8 item 5's residual): snapshot
    merge and materialized view publish under ONE manifest rename. A
    crash after ALL data is written but before the rename leaves both
    reads at the previous version; the replayed batch then applies
    exactly once."""
    from mapreduce_cs416_spark.operators import ivm

    path, orders, _ = seeded
    group, measures = ["o_custkey"], {"revenue": "o_totalprice"}
    # seed the view atomically with v2 (aux on a no-change merge)
    view0 = ivm.build_view(orders, group, measures)
    mf.merge_into(
        spark, path, orders.limit(0).withColumn("op", F.lit("U")).withColumn("seq", F.lit(1)),
        aux={"view": view0},
    )
    assert "view" in mf.read_manifest(path)["aux"]

    batch = _changelog(orders, 0, 512)
    snap = mf.read_table(spark, path)
    delta = ivm.delta_view(snap, batch, ["o_orderkey"], group, measures, op_col="op", seq_col="seq")
    new_view = ivm.merge_deltas(mf.read_aux(spark, path, "view"), delta, group)

    before_snap = _sorted_rows(mf.read_table(spark, path))
    before_view = _sorted_rows(mf.read_aux(spark, path, "view"))
    v_before = mf.read_manifest(path)["version"]

    # crash injection: everything lands on disk, the rename never does
    def boom(p, m):
        raise RuntimeError("crash before commit")

    monkeypatch.setattr(mf, "_commit", boom)
    with pytest.raises(RuntimeError):
        mf.merge_into(spark, path, batch, aux={"view": new_view})
    monkeypatch.undo()

    # both tables still read the OLD version — the torn state is invisible
    assert mf.read_manifest(path)["version"] == v_before
    assert _sorted_rows(mf.read_table(spark, path)) == before_snap
    assert _sorted_rows(mf.read_aux(spark, path, "view")) == before_view

    # the replay applies exactly once and view == recompute-from-snapshot
    mf.merge_into(spark, path, batch, aux={"view": new_view})
    merged = mf.read_table(spark, path)
    got_view = _sorted_rows(mf.read_aux(spark, path, "view"))
    want_view = _sorted_rows(ivm.build_view(merged, group, measures))
    assert got_view == want_view


def test_streaming_view_maintenance_manifest_matches_recompute(
    spark, sf_dir, tmp_path
):
    from mapreduce_cs416_spark.operators import ivm
    from mapreduce_cs416_spark.streaming import pipelines as sp

    orders = _orders(spark, sf_dir)
    group, measures = ["o_custkey"], {"revenue": "o_totalprice"}
    path = str(tmp_path / "tbl")
    mf.create_table(
        orders, path, ["o_orderkey"], partition_expr=RANGE_EXPR,
        aux={"view": ivm.build_view(orders, group, measures)},
    )

    batches = [_changelog(orders, i * 256, (i + 1) * 256) for i in range(2)]
    change_dir = str(tmp_path / "changes")
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("overwrite").parquet(f"{change_dir}/bat={i}")
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in batches[0].schema.fields
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{change_dir}/bat=*")
    )
    q = sp.streaming_view_maintenance_manifest(
        stream, path, ["o_orderkey"], group, measures
    )
    q.awaitTermination()

    merged = mf.read_table(spark, path)
    got = _sorted_rows(mf.read_aux(spark, path, "view"))
    want = _sorted_rows(ivm.build_view(merged, group, measures))
    assert got == want
    # and the snapshot equals the batch cdc loop
    expected = orders
    for b in batches:
        expected = cdc.cdc_merge(expected, b, ["o_orderkey"], op_col="op", seq_col="seq")
    assert _sorted_rows(merged) == _sorted_rows(expected)
