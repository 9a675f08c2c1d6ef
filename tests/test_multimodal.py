"""Multimodal plumbing: binary columns, Arrow-batched mapInPandas
feature extraction (real), decode stub (declared)."""

from __future__ import annotations

import pytest

from mapreduce_cs416_spark.operators import multimodal


def _docs(spark):
    return spark.createDataFrame(
        [(0, "hello world"), (1, "abcdefgh" * 4), (2, "x")], "doc_id long, text string"
    )


def test_blob_metadata_types(spark):
    out = multimodal.blob_metadata(_docs(spark))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["n_bytes"] == len("hello world")
    assert rows[0]["media_type"] == "image/png"
    assert len(rows[0]["sha256_hex"]) == 64
    assert rows[0]["magic_hex"] == "hell".encode().hex()


def test_extract_feature_arrays_matches_reference_decode(spark):
    out = {r["doc_id"]: r for r in multimodal.extract_feature_arrays(_docs(spark)).collect()}
    for doc_id, text in [(0, "hello world"), (1, "abcdefgh" * 4), (2, "x")]:
        expected = multimodal._fake_decode(text.encode())
        assert out[doc_id]["n_bytes"] == len(text.encode())
        assert out[doc_id]["features"] == pytest.approx(expected)
        assert len(out[doc_id]["features"]) == multimodal.FEATURE_DIM


def test_decode_image_is_declared_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")
