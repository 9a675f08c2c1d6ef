"""Source surfaces: whole-file scans (the reference's A1 input model),
the documents-as-corpus lens, temp-view registration, and the
load_table contract."""

from __future__ import annotations

import pytest

from mapreduce_cs416_spark.sources.tables import TABLES, load_table, register_views
from mapreduce_cs416_spark.sources.text_corpus import documents_as_corpus, whole_text_files


def test_whole_text_files_one_row_per_file(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"pg-{i}.txt").write_text(f"file {i} contents\nline two\n")
    df = whole_text_files(spark, str(tmp_path / "pg-*.txt"))
    rows = {r["filename"].rsplit("/", 1)[-1]: r["contents"] for r in df.collect()}
    assert set(rows) == {"pg-0.txt", "pg-1.txt", "pg-2.txt"}
    assert rows["pg-1.txt"] == "file 1 contents\nline two\n"


def test_documents_as_corpus_shape(spark, sf_dir):
    df = documents_as_corpus(spark, sf_dir)
    assert df.columns == ["filename", "contents"]
    assert dict(df.dtypes) == {"filename": "string", "contents": "string"}
    assert df.count() == load_table(spark, sf_dir, "documents").count()


def test_register_views_sql_access(spark, sf_dir):
    register_views(spark, sf_dir)
    for name in TABLES:
        assert spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0]["n"] > 0


def test_load_table_rejects_unknown(spark, sf_dir):
    with pytest.raises(KeyError, match="unknown table"):
        load_table(spark, sf_dir, "not_a_table")
