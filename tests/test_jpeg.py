"""Contracts of the baseline JPEG codec (operators/jpeg.py): exact
constant-block roundtrip through real entropy coding, IDCT parity
with an independent reference, restart-marker resync, 4:2:0 color,
and honest non-baseline rejection."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_cs416_spark.operators import jpeg as J
from mapreduce_cs416_spark.operators.jpeg import decode_jpeg, make_jpeg


def _expected_gray(payload: bytes) -> bytes:
    rows = -(-max(len(payload), 1) // J.JPEG_BLOCKS_WIDE)
    return payload.ljust(rows * J.JPEG_BLOCKS_WIDE, b"\x00")


def _check_exact(payload: bytes) -> None:
    img = decode_jpeg(make_jpeg(payload))
    data = _expected_gray(payload)
    rows = len(data) // J.JPEG_BLOCKS_WIDE
    assert img["width"] == 8 * J.JPEG_BLOCKS_WIDE
    assert img["height"] == 8 * rows
    assert img["channels"] == 1
    for r in range(rows):
        for c in range(J.JPEG_BLOCKS_WIDE):
            v = data[r * J.JPEG_BLOCKS_WIDE + c]
            for dy, dx in ((0, 0), (3, 5), (7, 7)):
                assert img["pixels"][(r * 8 + dy) * img["width"] + c * 8 + dx] == v


def test_roundtrip_exact_on_edge_payloads():
    for payload in (b"", b"\x00", b"\xff" * 9, bytes(range(256)), b"hello jpeg"):
        _check_exact(payload)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_roundtrip_exact_fuzz(payload):
    """decode(make_jpeg(p)) reproduces p byte-for-byte for ANY payload:
    constant blocks are DC-only and the fixture quant table makes the
    DC path lossless, while the file still passes through genuine
    Huffman coding (including byte stuffing on 0xFF-heavy payloads)
    and the decoder runs its full general path."""
    _check_exact(payload)


def test_restart_markers_resync_and_reset_prediction():
    payload = bytes(range(200, 240))
    img = decode_jpeg(make_jpeg(payload, restart_interval=3))
    data = _expected_gray(payload)
    for i, v in enumerate(data):
        r, c = divmod(i, J.JPEG_BLOCKS_WIDE)
        assert img["pixels"][(r * 8) * img["width"] + c * 8] == v


def test_byte_stuffing_exercised():
    """Some payload produces a 0xFF byte in the entropy stream; the
    writer must stuff FF00 and the reader must unstuff it, with the
    roundtrip still exact."""
    import random

    rng = random.Random(7)
    for _ in range(200):
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 40)))
        f = make_jpeg(payload)
        scan = f[f.index(b"\xff\xda") + 14 : -2]
        if b"\xff\x00" in scan:
            _check_exact(payload)
            return
    raise AssertionError("no payload produced a stuffed byte in 200 tries")


def _write_block(w, dc_codes, ac_codes, diff):
    cat, bits = J._dc_bits(diff)
    c, ln = dc_codes[cat]
    w.write(c, ln)
    if cat:
        w.write(bits, cat)
    c, ln = ac_codes[0x00]
    w.write(c, ln)


def _std_tables():
    return (
        J._canonical_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS),
        J._canonical_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS),
    )


def test_ac_coefficients_match_independent_idct():
    """A hand-built one-block scan with nontrivial AC coefficients
    (runs, a quantization table with distinct steps, a coefficient at
    zig-zag position 63) decodes to the same pixels as an independent
    matrix IDCT of the dequantized coefficients."""
    import numpy as np

    qtab = list(range(2, 66))
    coefs_zz = {0: 7, 1: -3, 5: 2, 20: -1, 63: 1}
    dc_codes, ac_codes = _std_tables()
    w = J._BitWriter()
    cat, bits = J._dc_bits(coefs_zz[0])
    c, ln = dc_codes[cat]
    w.write(c, ln)
    w.write(bits, cat)
    k = 1
    for i, v in sorted((i, v) for i, v in coefs_zz.items() if i > 0):
        run = i - k
        while run >= 16:
            c, ln = ac_codes[0xF0]
            w.write(c, ln)
            run -= 16
        cat, bits = J._dc_bits(v)
        c, ln = ac_codes[(run << 4) | cat]
        w.write(c, ln)
        w.write(bits, cat)
        k = i + 1
    if k <= 63:
        c, ln = ac_codes[0x00]
        w.write(c, ln)
    f = (
        b"\xff\xd8"
        + J._seg(0xDB, bytes([0x00]) + bytes(qtab[:64]))
        + J._seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
        + J._seg(0xC4, bytes([0x00]) + bytes(J.DC_LUMA_BITS) + bytes(J.DC_LUMA_VALS))
        + J._seg(0xC4, bytes([0x10]) + bytes(J.AC_LUMA_BITS) + bytes(J.AC_LUMA_VALS))
        + J._seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + w.flush()
        + b"\xff\xd9"
    )
    img = decode_jpeg(f)
    ref_coef = np.zeros((8, 8))
    for zz, v in coefs_zz.items():
        r, c = J.ZIGZAG[zz]
        ref_coef[r, c] = v * qtab[zz]
    M = np.array(
        [[J._CU[u] * math.cos((2 * x + 1) * u * math.pi / 16) / 2 for x in range(8)] for u in range(8)]
    )
    ref = np.clip(np.floor(M.T @ ref_coef @ M + 128.5), 0, 255).astype(int)
    assert (np.array(img["pixels"]).reshape(8, 8) == ref).all()


def test_420_color_mcu_decodes_to_rgb():
    """A hand-built 16×16 4:2:0 YCbCr MCU (4 luma + 1 Cb + 1 Cr
    blocks, per-component DC prediction) converts to the expected
    constant RGB."""
    dc_codes, ac_codes = _std_tables()
    w = J._BitWriter()
    _write_block(w, dc_codes, ac_codes, 72)  # Y (200)
    for _ in range(3):
        _write_block(w, dc_codes, ac_codes, 0)
    _write_block(w, dc_codes, ac_codes, -28)  # Cb (100)
    _write_block(w, dc_codes, ac_codes, 22)  # Cr (150)
    f = (
        b"\xff\xd8"
        + J._seg(0xDB, bytes([0x00]) + bytes(J.FIXTURE_QUANT))
        + J._seg(
            0xC0,
            bytes([8]) + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
            + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        + J._seg(0xC4, bytes([0x00]) + bytes(J.DC_LUMA_BITS) + bytes(J.DC_LUMA_VALS))
        + J._seg(0xC4, bytes([0x10]) + bytes(J.AC_LUMA_BITS) + bytes(J.AC_LUMA_VALS))
        + J._seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        + w.flush()
        + b"\xff\xd9"
    )
    img = decode_jpeg(f)
    assert (img["width"], img["height"], img["channels"]) == (16, 16, 3)
    yy, cb, cr = 200, 100 - 128, 150 - 128
    exp = (
        J._clamp8(yy + 1.402 * cr),
        J._clamp8(yy - 0.344136 * cb - 0.714136 * cr),
        J._clamp8(yy + 1.772 * cb),
    )
    px = img["pixels"]
    assert all(tuple(px[3 * i : 3 * i + 3]) == exp for i in range(256))


def test_non_baseline_raises_honestly():
    f = bytearray(make_jpeg(b"x"))
    i = f.index(b"\xff\xc0")
    f[i + 1] = 0xC2  # progressive SOF
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(f))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x00")


def test_decode_jpeg_stats_query_shape(spark):
    from mapreduce_cs416_spark.operators.multimodal import decode_jpeg_stats

    docs = spark.createDataFrame(
        [(0, "ab"), (1, "a longer document body here")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in decode_jpeg_stats(docs).collect()}
    assert out[0]["width"] == 32 and out[0]["height"] == 8
    assert out[0]["row0_hex"] == "61" * 8 + "62" * 8 + "00" * 16
    # mean over padded blocks: (97+98)/4 blocks-row = 48.75
    assert out[0]["mean_gray"] == round((97 + 98) / 4.0, 6)
    assert out[1]["n_data_bytes"] == 27 and out[1]["height"] == 8 * 7


def test_422_color_mcu_decodes_to_rgb():
    """4:2:2 (2x1 luma sampling): 2 Y + 1 Cb + 1 Cr blocks per 16×8
    MCU — the third chroma layout the general decoder supports."""
    dc_codes, ac_codes = _std_tables()
    w = J._BitWriter()
    _write_block(w, dc_codes, ac_codes, 50)  # Y = 178
    _write_block(w, dc_codes, ac_codes, 0)
    _write_block(w, dc_codes, ac_codes, 10)  # Cb = 138
    _write_block(w, dc_codes, ac_codes, -40)  # Cr = 88
    f = (
        b"\xff\xd8"
        + J._seg(0xDB, bytes([0x00]) + bytes(J.FIXTURE_QUANT))
        + J._seg(
            0xC0,
            bytes([8]) + (8).to_bytes(2, "big") + (16).to_bytes(2, "big")
            + bytes([3, 1, 0x21, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        + J._seg(0xC4, bytes([0x00]) + bytes(J.DC_LUMA_BITS) + bytes(J.DC_LUMA_VALS))
        + J._seg(0xC4, bytes([0x10]) + bytes(J.AC_LUMA_BITS) + bytes(J.AC_LUMA_VALS))
        + J._seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        + w.flush()
        + b"\xff\xd9"
    )
    img = decode_jpeg(f)
    assert (img["width"], img["height"], img["channels"]) == (16, 8, 3)
    yy, cb, cr = 178, 138 - 128, 88 - 128
    exp = (
        J._clamp8(yy + 1.402 * cr),
        J._clamp8(yy - 0.344136 * cb - 0.714136 * cr),
        J._clamp8(yy + 1.772 * cb),
    )
    px = img["pixels"]
    assert all(tuple(px[3 * i : 3 * i + 3]) == exp for i in range(16 * 8))
