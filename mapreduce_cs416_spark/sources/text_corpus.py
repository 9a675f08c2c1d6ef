"""Whole-file text corpus sources — the reference's scan model.

The reference reads one entire input file into memory per map split
and hands ``(filename, contents)`` to the user map function
(mr/worker.go:89-95; split rule README.md:111). Spark's exact analog
is ``sc.wholeTextFiles``; the testdata analog is the ``documents``
table where one row = one file (doc_id = filename, text = contents)
— see FIXTURES.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table


def whole_text_files(spark: SparkSession, path_glob: str, min_partitions: int | None = None) -> DataFrame:
    """Scan files as (filename, contents) rows, one row per file.

    Mirrors mapf's input contract (mr/worker.go:95). For 100 TB of
    small files this is the wrong scan (driver-side listing, no column
    pruning); prefer parquet `documents`. Provided for parity with the
    reference's pg-*.txt ingestion.
    """
    rdd = spark.sparkContext.wholeTextFiles(path_glob, minPartitions=min_partitions)
    return rdd.toDF(["filename", "contents"])


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `documents` table viewed through the reference's corpus lens:
    (filename, contents) where filename := cast(doc_id as string)."""
    return load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("filename"),
        F.col("text").alias("contents"),
    )
