"""Source/sink round-trips: every supported format preserves the data
(with the documented type caveats of text formats)."""

from __future__ import annotations

import pytest

from mapreduce_cs416_spark.sources.io import FORMATS, read_table, write_table
from mapreduce_cs416_spark.sources.tables import load_table


def _canon(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip_preserves_rows(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "supplier")
    path = str(tmp_path / f"supplier_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert _canon(back) == _canon(src)


def test_text_roundtrip_single_column(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    src = load_table(spark, sf_dir, "region").select(
        F.concat_ws("|", "r_regionkey", "r_name").alias("value")
    )
    path = str(tmp_path / "region_text")
    write_table(src, path, "text")
    back = read_table(spark, path, "text")
    assert _canon(back) == _canon(src)


@pytest.mark.parametrize("codec", ["zstd", "gzip", "none"])
def test_parquet_compression_codecs(spark, sf_dir, tmp_path, codec):
    import os

    src = load_table(spark, sf_dir, "supplier")
    path = str(tmp_path / f"supplier_{codec}")
    write_table(src, path, "parquet", compression=codec)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    if codec != "none":
        ext = {"gzip": "gz"}.get(codec, codec)
        assert any(ext in f for f in files), files  # codec extension in filename
    back = read_table(spark, path, "parquet")
    assert back.count() == src.count()


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    """Hive-layout writes + a filter on the partition column must show
    partition pruning in the plan (directories skipped before IO)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_type")
    write_table(ev, path, "parquet", partition_by=["event_type"])
    df = spark.read.parquet(path).where(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]
    assert df.count() == ev.where(F.col("event_type") == "click").count()


def test_unknown_format_rejected(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    with pytest.raises(ValueError, match="unknown format"):
        write_table(src, str(tmp_path / "x"), "avro")
    with pytest.raises(ValueError, match="unknown format"):
        read_table(spark, str(tmp_path / "x"), "orc2")


def test_compact_table_shrinks_fragments_and_preserves_data(spark, tmp_path):
    import glob
    import os

    from pyspark.sql import functions as F

    from mapreduce_cs416_spark.sources.io import compact_table

    path = str(tmp_path / "fragmented")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 64
    total = sum(os.path.getsize(f) for f in glob.glob(f"{path}/*.parquet"))
    # target sized so the data fits in exactly 2 files
    n = compact_table(spark, path, target_bytes=(total // 2) + 1, cluster_by=["id"])
    assert n == 2
    assert len(glob.glob(f"{path}/*.parquet")) == 2
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(10_000))
    # no staging/backup residue
    assert not glob.glob(f"{path}__*")


def test_compact_table_refuses_empty_dir(spark, tmp_path):
    import pytest as _pytest

    from mapreduce_cs416_spark.sources.io import compact_table

    empty = tmp_path / "empty"
    empty.mkdir()
    with _pytest.raises(ValueError):
        compact_table(spark, str(empty))


def test_compact_table_recovers_from_crashed_swap(spark, tmp_path):
    """A crash between the two swap renames leaves the table only at
    __precompact; the next compaction must restore it first, and stale
    staging dirs must be cleaned rather than trip the rewrite."""
    import glob
    import os
    import shutil

    from mapreduce_cs416_spark.sources.io import compact_table

    path = str(tmp_path / "t")
    spark.range(0, 1000).repartition(8).write.parquet(path)
    # simulate the crash window: table renamed away, staging half-done
    os.rename(path, f"{path}__precompact")
    os.makedirs(f"{path}__compacting")
    with open(f"{path}__compacting/part-garbage.parquet", "w") as f:
        f.write("torn")
    n = compact_table(spark, path, target_bytes=1 << 30)
    assert n == 1
    assert spark.read.parquet(path).count() == 1000
    assert not glob.glob(f"{path}__*")
    # stale dirs beside a LIVE table are discarded too
    shutil.copytree(path, f"{path}__precompact")
    compact_table(spark, path, target_bytes=1 << 30)
    assert spark.read.parquet(path).count() == 1000
    assert not glob.glob(f"{path}__*")
