"""GIF codec (operators/gif.py): hand-computed LZW bit streams lock
the variable-width packing and the encoder/decoder width-bump
off-by-one; crafted streams exercise the KwKwK case; a hand-built
GIF file (assembled byte-by-byte, independent of make_gif) validates
the container parser; round-trips cross width bumps and dictionary
resets.
"""

from __future__ import annotations

import random

import pytest

from mapreduce_cs416_spark.operators.gif import (
    decode_gif,
    lzw_decode,
    lzw_encode,
    make_gif,
)


def test_hand_computed_bitstream():
    """mcs=2, data [1,1]: codes CLEAR(4),1,1,EOI(5) at width 3,
    LSB-first → bits 001 100 100 101 → bytes 0x4C 0x0A."""
    assert lzw_encode(bytes([1, 1]), 2) == bytes([0x4C, 0x0A])
    assert lzw_decode(bytes([0x4C, 0x0A]), 2) == bytes([1, 1])


def test_kwkwk_self_reference_stream():
    """Codes CLEAR,1,6,EOI at mcs=2: code 6 == next_code refers to the
    slot being defined (the KwKwK case) → output [1,1,1]."""
    assert lzw_decode(bytes([0x8C, 0x0B]), 2) == bytes([1, 1, 1])


def test_kwkwk_arises_from_real_encoding():
    """'abababab...' makes the encoder emit a code immediately after
    assigning it, so decoding proves the lagging-table special case
    on encoder-produced streams too."""
    data = b"ab" * 50
    assert lzw_decode(lzw_encode(data)) == data


def test_roundtrip_crosses_width_bumps_and_reset():
    """256 roots fill width 9 after 256 adds; 20 copies of the byte
    alphabet push through widths 9→12 and past the 4096-entry reset."""
    data = bytes(range(256)) * 20
    enc = lzw_encode(data)
    assert lzw_decode(enc) == data
    repetitive = b"abcabcabd" * 7000  # compresses hard, also resets
    enc2 = lzw_encode(repetitive)
    assert len(enc2) < len(repetitive) // 10  # LZW genuinely compresses
    assert lzw_decode(enc2) == repetitive


def test_roundtrip_random_payloads():
    rnd = random.Random(416)
    for n in (0, 1, 2, 255, 256, 1000, 4000):
        data = bytes(rnd.randrange(256) for _ in range(n))
        assert lzw_decode(lzw_encode(data)) == data
        g = decode_gif(make_gif(data))
        w, h = g["width"], g["height"]
        want = data.ljust(w * h, b"\x00")
        assert bytes(g["pixels"][3 * i] for i in range(w * h)) == want


def test_hand_built_gif_decodes():
    """A 2×1 4-color GIF assembled byte-by-byte (independent of
    make_gif): indices [1,1] via the hand-computed mcs=2 stream."""
    gif = (
        b"GIF89a"
        + bytes([2, 0, 1, 0])  # 2×1
        + bytes([0x81, 0x00, 0x00])  # GCT, 4 entries
        + bytes(v for i in range(4) for v in (i, i, i))
        + b"\x2c" + bytes(4) + bytes([2, 0, 1, 0]) + b"\x00"
        + bytes([2])  # LZW min code size
        + bytes([2, 0x4C, 0x0A, 0x00])  # one sub-block + terminator
        + b"\x3b"
    )
    g = decode_gif(gif)
    assert (g["width"], g["height"]) == (2, 1)
    assert g["pixels"] == [1, 1, 1, 1, 1, 1]


# header(6) + LSD(7) + 256-entry GCT(768) + GCE(8) = image descriptor
_IDESC = 6 + 7 + 768 + 8


def test_extension_blocks_are_walked():
    """make_gif plants a graphics-control extension between the color
    table and the image; a parser that does not walk 0x21 sub-block
    chains cannot reach the image."""
    raw = make_gif(b"hello gif")
    assert raw[6 + 7 + 768] == 0x21 and raw[_IDESC] == 0x2C
    assert bytes(decode_gif(raw)["pixels"][3 * i] for i in range(9)) == b"hello gif"


def test_unsupported_paths_raise():
    base = make_gif(b"x" * 32)
    with pytest.raises(NotImplementedError):
        decode_gif(b"NOTGIF" + base[6:])
    # flip the image-descriptor interlace / local-table flags
    flags_at = _IDESC + 9
    for bad in (0x40, 0x80):
        mutated = base[:flags_at] + bytes([base[flags_at] | bad]) + base[flags_at + 1 :]
        with pytest.raises(NotImplementedError):
            decode_gif(mutated)


def test_corrupt_lzw_raises():
    with pytest.raises(ValueError):
        # code 7 with next_code 6 and no prev: unassigned slot
        lzw_decode(bytes([0b111_100 | 0b10000000, 0b0]), 2)


def test_stats_face_matches_sequential_reference(spark):
    from mapreduce_cs416_spark.operators.multimodal import decode_gif_stats

    rows = [(i, f"gif stand-in {i} body " * (i % 4 + 1)) for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in decode_gif_stats(docs).collect()}
    for doc_id, text in rows:
        raw = text.encode()
        g = decode_gif(make_gif(raw))
        w, h = g["width"], g["height"]
        assert got[doc_id]["width"] == w and got[doc_id]["height"] == h
        assert got[doc_id]["n_data_bytes"] == len(raw)
        assert got[doc_id]["row0_hex"] == bytes(g["pixels"][3 * i] for i in range(w)).hex()
        assert got[doc_id]["mean_gray"] == pytest.approx(sum(g["pixels"]) / len(g["pixels"]), abs=1e-6)
