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


def test_sample_frames_fanout_and_edges(spark):
    docs = spark.createDataFrame(
        [(0, "abcdefgh" * 8), (1, "xy"), (2, "")], "doc_id long, text string"
    )
    rows = multimodal.sample_frames(docs, n_frames=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 64-byte doc: 4 frames at offsets 0/16/32/48
    assert [r["frame_off"] for r in sorted(by_doc[0], key=lambda r: r["frame_idx"])] == [0, 16, 32, 48]
    assert by_doc[0][0]["frame_hex"] == ("abcdefgh" * 2).encode().hex()
    # 2-byte doc: step=1 → frames at offsets 0 and 1 only
    assert sorted(r["frame_off"] for r in by_doc[1]) == [0, 1]
    # empty doc: no frames at all
    assert 2 not in by_doc


def test_decode_image_is_declared_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")
