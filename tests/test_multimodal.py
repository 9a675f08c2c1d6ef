"""Multimodal plumbing: binary columns, Arrow-batched mapInPandas
feature extraction (real), and the pure-Python BMP/PPM decoders."""

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


def test_decode_image_compressed_formats_still_raise():
    """PNG/JPEG need codec libraries the container doesn't ship — the
    parser must refuse them loudly, not misparse."""
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)


def test_decode_image_bmp_roundtrip_with_row_padding():
    """Odd width (5 px → 15 data bytes, stride 16) exercises the
    4-byte row-pad stripping; bottom-up storage exercises the row
    reversal."""
    w, h = 5, 3
    data = bytes(range(w * h * 3))  # RGB-ish payload, 45 bytes
    bmp = multimodal.make_bmp(data, width=w)
    # make_bmp pads 45 data bytes to 3 rows of stride 16
    assert len(bmp) == 54 + 16 * h
    img = multimodal.decode_image(bmp)
    assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
    # decoded pixels are top-down with the stride-pad byte of each
    # stored row stripped (make_bmp lays the payload contiguously, so
    # bytes 15 and 31 land in pad slots and drop out; the short last
    # row is zero-filled)
    rows = [data[r * 16 : r * 16 + 15].ljust(15, b"\x00") for r in range(h)]
    assert img["pixels"] == b"".join(reversed(rows))


def test_decode_image_bmp_top_down_negative_height():
    """A top-down BMP (negative height) must NOT be row-reversed."""
    w, h = 4, 2  # stride 12, no pad
    data = bytes(range(w * h * 3))
    bmp = bytearray(multimodal.make_bmp(data, width=w))
    bmp[22:26] = (-h).to_bytes(4, "little", signed=True)
    img = multimodal.decode_image(bytes(bmp))
    assert img["height"] == h
    assert img["pixels"] == data  # stored order IS image order here


def test_decode_image_ppm_with_comment():
    px = bytes(range(2 * 2 * 3))
    ppm = b"P6\n# a comment line\n2 2\n255\n" + px
    img = multimodal.decode_image(ppm)
    assert (img["width"], img["height"]) == (2, 2)
    assert img["pixels"] == px


def test_decode_image_truncated_bmp_raises():
    data = bytes(48)
    bmp = multimodal.make_bmp(data)
    with pytest.raises(ValueError):
        multimodal.decode_image(bmp[:-1])


def test_decode_image_stats_matches_hand_computation(spark):
    out = {
        r["doc_id"]: r for r in multimodal.decode_image_stats(_docs(spark)).collect()
    }
    raw = "hello world".encode()
    padded = raw.ljust(48, b"\x00")
    assert out[0]["width"] == 16 and out[0]["height"] == 1
    assert out[0]["mean_b"] == round(sum(padded[0::3]) / 16, 6)
    assert out[0]["row0_hex"] == padded.hex()


def test_make_ppm_roundtrip(spark):
    """make_ppm -> decode_image round-trip: top-down RGB, no stride
    padding, zero-fill to the triplet grid."""
    data = bytes(range(100))
    img = multimodal.decode_image(multimodal.make_ppm(data, width=16))
    assert (img["width"], img["height"]) == (16, 3)  # ceil(100/48)=3 rows
    assert img["pixels"] == data.ljust(16 * 3 * 3, b"\x00")
