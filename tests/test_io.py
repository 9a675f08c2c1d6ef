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
