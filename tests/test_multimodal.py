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


def test_decode_image_unsupported_formats_still_raise():
    """JPEG needs libjpeg (absent from the container) — the parser
    must refuse it loudly, not misparse; malformed PNG bytes are a
    ValueError, not a silent misparse."""
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)
    with pytest.raises(ValueError):  # PNG signature but no IHDR
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


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


# ------------------------------------------------------------- PNG
def _png_rgb(raw: bytes, width: int, height: int, filters: list[int]) -> bytes:
    """Hand-build an 8-bit RGB PNG with an EXPLICIT filter type per
    row (forward-filtering the raw pixels), independent of make_png —
    so the decoder is pinned against fixtures it didn't encode."""
    import zlib

    bpp, row_len = 3, width * 3
    prior = bytes(row_len)
    out = bytearray()
    for r, ftype in zip(range(height), filters):
        raw_row = raw[r * row_len : (r + 1) * row_len]
        out.append(ftype)
        for x in range(row_len):
            left = raw_row[x - bpp] if x >= bpp else 0
            up = prior[x]
            ul = prior[x - bpp] if x >= bpp else 0
            pred = [0, left, up, (left + up) >> 1, multimodal._paeth(left, up, ul)][ftype]
            out.append((raw_row[x] - pred) & 0xFF)
        prior = raw_row
    ihdr = width.to_bytes(4, "big") + height.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    return (
        multimodal.PNG_SIG
        + multimodal._png_chunk(b"IHDR", ihdr)
        + multimodal._png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + multimodal._png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_png_each_filter_type(ftype):
    """Every scanline filter individually: a 4×3 RGB image whose rows
    all carry the same filter byte must reconstruct byte-exactly."""
    raw = bytes((i * 71 + 13) % 256 for i in range(4 * 3 * 3))
    img = multimodal.decode_image(_png_rgb(raw, 4, 3, [ftype] * 3))
    assert (img["width"], img["height"], img["channels"]) == (4, 3, 3)
    assert img["pixels"] == raw


def test_decode_png_mixed_filters_and_ancillary_chunks():
    """Mixed filters across rows + an ancillary chunk (tEXt) between
    IHDR and IDAT, and IDAT split across two chunks — all must be
    handled (skip ancillary, concatenate IDAT)."""
    import zlib

    raw = bytes((i * 29 + 7) % 256 for i in range(5 * 3 * 5))
    png = _png_rgb(raw, 5, 5, [0, 1, 2, 3, 4])
    # splice a tEXt chunk after IHDR and split IDAT in two
    sig_ihdr_len = 8 + 12 + 13
    head, rest = png[:sig_ihdr_len], png[sig_ihdr_len:]
    idat_len = int.from_bytes(rest[:4], "big")
    idat_data = rest[8 : 8 + idat_len]
    iend = rest[12 + idat_len :]
    mid = idat_len // 2
    spliced = (
        head
        + multimodal._png_chunk(b"tEXt", b"comment\x00hi")
        + multimodal._png_chunk(b"IDAT", idat_data[:mid])
        + multimodal._png_chunk(b"IDAT", idat_data[mid:])
        + iend
    )
    img = multimodal.decode_image(spliced)
    assert img["pixels"] == raw


def test_decode_png_rgba():
    """Color type 6 (RGBA): 4 channels, filters use bpp=4."""
    import zlib

    w, h, bpp = 4, 2, 4
    raw = bytes((i * 53 + 3) % 256 for i in range(w * h * bpp))
    scan = b"".join(b"\x00" + raw[r * w * bpp : (r + 1) * w * bpp] for r in range(h))
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 6, 0, 0, 0])
    png = (
        multimodal.PNG_SIG
        + multimodal._png_chunk(b"IHDR", ihdr)
        + multimodal._png_chunk(b"IDAT", zlib.compress(scan))
        + multimodal._png_chunk(b"IEND", b"")
    )
    img = multimodal.decode_image(png)
    assert (img["width"], img["height"], img["channels"]) == (w, h, 4)
    assert img["pixels"] == raw


def test_decode_png_unsupported_variants_raise():
    """Grayscale-alpha, 16-bit, and interlaced PNGs are honest gaps
    (palette gained real support in r8): refuse, never misparse."""
    import zlib

    raw = bytes(4 * 3 * 3)
    scan = b"".join(b"\x00" + raw[r * 12 : (r + 1) * 12] for r in range(3))
    for depth_color_interlace in ([8, 4, 0, 0, 0], [16, 2, 0, 0, 0], [8, 2, 0, 0, 1]):
        ihdr = (4).to_bytes(4, "big") + (3).to_bytes(4, "big") + bytes(depth_color_interlace)
        png = (
            multimodal.PNG_SIG
            + multimodal._png_chunk(b"IHDR", ihdr)
            + multimodal._png_chunk(b"IDAT", zlib.compress(scan))
            + multimodal._png_chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(png)


def test_make_png_roundtrip_covers_all_filters():
    """make_png cycles filter row%5; a ≥5-row payload therefore
    exercises every reconstruction path, and the decode must equal
    the zero-padded payload (the invariant the DuckDB oracle uses)."""
    payload = bytes((i * 37 + 11) % 256 for i in range(300))  # 7 rows at width 16
    img = multimodal.decode_image(multimodal.make_png(payload, width=16))
    assert img["height"] == 7 and img["width"] == 16
    assert img["pixels"] == payload.ljust(16 * 3 * 7, b"\x00")
    # the container is genuinely filtered: at least one non-zero filter byte
    import zlib

    png = multimodal.make_png(payload, width=16)
    pos, idat = 8, b""
    while pos + 8 <= len(png):
        clen = int.from_bytes(png[pos : pos + 4], "big")
        if png[pos + 4 : pos + 8] == b"IDAT":
            idat += png[pos + 8 : pos + 8 + clen]
        pos += 12 + clen
    scan = zlib.decompress(idat)
    filters = [scan[r * 49] for r in range(7)]
    assert filters == [0, 1, 2, 3, 4, 0, 1]


def test_decode_png_stats_matches_hand_computation(spark):
    out = {r["doc_id"]: r for r in multimodal.decode_png_stats(_docs(spark)).collect()}
    data = "hello world".encode().ljust(48, b"\x00")
    assert out[0]["height"] == 1 and out[0]["n_data_bytes"] == 11
    assert out[0]["mean_r"] == round(sum(data[0::3]) / 16, 6)
    assert out[0]["row0_hex"] == data.hex()


def test_decode_png_grayscale():
    """Color type 0 (grayscale): 1 channel, filters use bpp=1 —
    exercised here with Sub and Paeth rows."""
    import zlib

    w, h = 6, 4
    raw = bytes((i * 97 + 5) % 256 for i in range(w * h))
    # forward-filter: row 0 None, row 1 Sub, row 2 Up, row 3 Paeth
    prior = bytes(w)
    scan = bytearray()
    for r, ftype in enumerate([0, 1, 2, 4]):
        row = raw[r * w : (r + 1) * w]
        scan.append(ftype)
        for x in range(w):
            left = row[x - 1] if x >= 1 else 0
            ul = prior[x - 1] if x >= 1 else 0
            pred = [0, left, prior[x], (left + prior[x]) >> 1, multimodal._paeth(left, prior[x], ul)][ftype]
            scan.append((row[x] - pred) & 0xFF)
        prior = row
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
    png = (
        multimodal.PNG_SIG
        + multimodal._png_chunk(b"IHDR", ihdr)
        + multimodal._png_chunk(b"IDAT", zlib.compress(bytes(scan)))
        + multimodal._png_chunk(b"IEND", b"")
    )
    img = multimodal.decode_image(png)
    assert (img["width"], img["height"], img["channels"]) == (w, h, 1)
    assert img["pixels"] == raw


# --- property tests: codec round-trips on random payloads -------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _payload = st.binary(max_size=600)
    _width = st.integers(min_value=1, max_value=21)

    @given(payload=_payload, width=_width)
    @settings(max_examples=120, deadline=None)
    def test_png_roundtrip_property(payload, width):
        """make_png → decode_image is byte-exact for ANY payload and
        width: inflate + all five filter reconstructions (make_png
        cycles row % 5) must invert the encoder everywhere, including
        widths whose rows don't divide the payload."""
        img = multimodal.decode_image(multimodal.make_png(payload, width))
        row = width * 3
        h = max(-(-len(payload) // row), 1)
        assert (img["width"], img["height"], img["channels"]) == (width, h, 3)
        assert img["pixels"] == payload.ljust(row * h, b"\x00")

    @given(payload=_payload, width=_width)
    @settings(max_examples=60, deadline=None)
    def test_bmp_ppm_roundtrip_property(payload, width):
        """make_bmp / make_ppm → decode_image invariants: PPM pixels
        equal the padded payload; BMP pixels are the row-reversed,
        stride-stripped payload (pad bytes drop when stride > 3·width)."""
        row = width * 3
        h = max(-(-len(payload) // row), 1)
        ppm = multimodal.decode_image(multimodal.make_ppm(payload, width))
        assert ppm["pixels"] == payload.ljust(row * h, b"\x00")
        stride = (row + 3) & ~3
        hb = max(-(-len(payload) // stride), 1)
        data = payload.ljust(stride * hb, b"\x00")
        bmp = multimodal.decode_image(multimodal.make_bmp(payload, width))
        assert (bmp["width"], bmp["height"]) == (width, hb)
        rows = [data[r * stride : r * stride + row] for r in range(hb)]
        assert bmp["pixels"] == b"".join(reversed(rows))

except ImportError:  # pragma: no cover — hypothesis is baked in, but gate anyway
    pass


# ------------------------------------------------------------- WAV
def _wav(samples: list[int], sample_rate: int = 8000, n_channels: int = 1,
         extra_pre: bytes = b"", extra_post: bytes = b"") -> bytes:
    """Hand-build a RIFF/WAVE file independent of make_wav — with
    optional ancillary chunks before fmt and between fmt and data —
    so the chunk walker is pinned against containers it didn't
    encode."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate,
                      sample_rate * 2 * n_channels, 2 * n_channels, 16)
    body = (
        b"WAVE" + extra_pre
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + extra_post
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_decode_audio_hand_built():
    samples = [0, 1000, -1000, 32767, -32768, 1]
    au = multimodal.decode_audio(_wav(samples, sample_rate=44100, n_channels=2))
    assert au["sample_rate"] == 44100
    assert au["n_channels"] == 2
    assert au["n_samples"] == 6
    assert au["samples"] == samples


def test_decode_audio_walks_ancillary_chunks_with_word_alignment():
    """Odd-sized ancillary chunks before fmt AND before data: RIFF
    pads each to a word boundary, and the pad byte is NOT counted in
    the chunk size — a walker that forgets the pad misreads the next
    chunk id."""
    odd = b"JUNK" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    au = multimodal.decode_audio(_wav([7, -7], extra_pre=odd, extra_post=odd))
    assert au["samples"] == [7, -7]


def test_decode_audio_unsupported_and_truncated():
    with pytest.raises(NotImplementedError):  # not RIFF/WAVE at all
        multimodal.decode_audio(b"OggS" + bytes(40))
    with pytest.raises(NotImplementedError):  # ADPCM format tag needs a codec
        bad = bytearray(_wav([1, 2]))
        bad[20:22] = (2).to_bytes(2, "little")
        multimodal.decode_audio(bytes(bad))
    with pytest.raises(ValueError):  # truncated data chunk
        multimodal.decode_audio(_wav([1, 2, 3, 4])[:-3])
    with pytest.raises(ValueError):  # fmt but no data chunk
        full = _wav([1])
        multimodal.decode_audio(full[: full.index(b"data")])


def test_decode_audio_stats_matches_hand_computation(spark):
    import struct

    out = {r["doc_id"]: r for r in multimodal.decode_audio_stats(_docs(spark)).collect()}
    raw = b"hello world".ljust(12, b"\x00")
    sm = struct.unpack("<6h", raw)
    assert out[0]["n_samples"] == 6 and out[0]["n_data_bytes"] == 11
    assert out[0]["duration_ms"] == round(6 * 1000.0 / 8000, 6)
    assert out[0]["mean_abs"] == round(sum(abs(x) for x in sm) / 6, 6)
    assert out[0]["peak_abs"] == max(abs(x) for x in sm)
    assert out[0]["n_zero_cross"] == sum(
        (sm[i - 1] < 0) != (sm[i] < 0) for i in range(1, 6)
    )
    assert out[0]["head_hex"] == raw.hex()
    # 1-byte doc: zero-padded to one whole sample
    assert out[2]["n_samples"] == 1 and out[2]["peak_abs"] == ord("x")


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(payload=st.binary(max_size=600))
    @settings(max_examples=120, deadline=None)
    def test_wav_roundtrip_property(payload):
        """make_wav → decode_audio is sample-exact for ANY payload:
        the decoded int16 stream equals the zero-padded payload
        reinterpreted little-endian, min one sample."""
        import struct

        au = multimodal.decode_audio(multimodal.make_wav(payload))
        ns = max(-(-len(payload) // 2), 1)
        padded = payload.ljust(2 * ns, b"\x00")
        assert au["n_samples"] == ns
        assert au["samples"] == list(struct.unpack(f"<{ns}h", padded))

except ImportError:  # pragma: no cover
    pass


# ------------------------------------------------------------- AVI
def _avi(frames: list[bytes], width: int, height: int,
         declared: int | None = None, compression: int = 0, bpp: int = 24) -> bytes:
    """Hand-build a RIFF/AVI independent of make_avi so the parser is
    pinned against containers it didn't encode."""
    def chunk(tag, body):
        return tag + len(body).to_bytes(4, "little") + body + (b"\x00" if len(body) & 1 else b"")

    def lst(tag, body):
        return chunk(b"LIST", tag + body)

    nf = len(frames) if declared is None else declared
    avih = bytes(16) + nf.to_bytes(4, "little") + bytes(12) \
        + width.to_bytes(4, "little") + height.to_bytes(4, "little") + bytes(16)
    strf = (40).to_bytes(4, "little") + width.to_bytes(4, "little", signed=True) \
        + height.to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little") \
        + bpp.to_bytes(2, "little") + compression.to_bytes(4, "little") + bytes(20)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", bytes(56)) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", f) for f in frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def test_decode_video_hand_built_reverses_dib_rows():
    # 2x2 frame, stride 8 (2 px * 3 B = 6, padded to 8)
    row_bot, row_top = b"\x01\x02\x03\x04\x05\x06", b"\x11\x12\x13\x14\x15\x16"
    frame = row_bot + b"\x00\x00" + row_top + b"\x00\x00"  # stored bottom-up
    vid = multimodal.decode_video(_avi([frame, frame], 2, 2))
    assert (vid["width"], vid["height"], vid["n_frames"]) == (2, 2, 2)
    # decoded frames are top-down with stride padding stripped
    assert vid["frames"][0] == row_top + row_bot


def test_decode_video_validations():
    frame = bytes(8)
    with pytest.raises(NotImplementedError):  # not an AVI
        multimodal.decode_video(b"RIFF" + (4).to_bytes(4, "little") + b"WAVE")
    with pytest.raises(NotImplementedError):  # compressed fourcc needs a codec
        multimodal.decode_video(_avi([frame], 2, 1, compression=0x47504A4D))
    with pytest.raises(ValueError):  # header/frame count mismatch
        multimodal.decode_video(_avi([frame, frame], 2, 1, declared=3))
    with pytest.raises(ValueError):  # frame shorter than one DIB
        multimodal.decode_video(_avi([b"\x00"], 2, 1))


def test_decode_video_stats_matches_hand_computation(spark):
    out = {r["doc_id"]: r for r in multimodal.decode_video_stats(_docs(spark)).collect()}
    raw = ("abcdefgh" * 4).encode()  # 32 bytes -> 1 frame of 192
    padded = raw.ljust(192, b"\x00")
    r = out[1]
    assert (r["width"], r["height"], r["n_frames"], r["n_data_bytes"]) == (16, 4, 1, 32)
    assert r["mean_b"] == round(sum(padded[0::3]) / 64, 6)
    # top row of frame 0 = LAST stored row = bytes 144..192 (all padding here)
    assert r["frame0_row0_hex"] == padded[144:192].hex()


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(payload=st.binary(max_size=600))
    @settings(max_examples=60, deadline=None)
    def test_avi_roundtrip_property(payload):
        """make_avi → decode_video is byte-exact for ANY payload: the
        concatenated top-down frames equal the zero-padded payload
        with each frame's rows reversed."""
        vid = multimodal.decode_video(multimodal.make_avi(payload))
        nf = max(-(-len(payload) // 192), 1)
        data = payload.ljust(192 * nf, b"\x00")
        assert vid["n_frames"] == nf
        for i, f in enumerate(vid["frames"]):
            frame = data[i * 192 : (i + 1) * 192]
            rows = [frame[r * 48 : (r + 1) * 48] for r in range(4)]
            assert f == b"".join(reversed(rows))

except ImportError:  # pragma: no cover
    pass


def test_sample_video_frames_strided_real_frames(spark):
    out = multimodal.sample_video_frames(_docs(spark)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 32 bytes -> 1 frame -> only sample 0
    (f0,) = by_doc[1]
    assert (f0["sample_idx"], f0["frame_idx"]) == (0, 0)
    raw = ("abcdefgh" * 4).encode().ljust(192, b"\x00")
    assert f0["top_row_hex"] == raw[144:192].hex()  # top = LAST stored row
    # every doc's sampled frame indices are strictly increasing multiples of its stride
    for rows in by_doc.values():
        idxs = [r["frame_idx"] for r in sorted(rows, key=lambda r: r["sample_idx"])]
        assert idxs == sorted(set(idxs))


def test_phash_recall_on_perturbed_images(spark):
    """dHash near-dup: an exact copy is Hamming 0, a lightly perturbed
    image (a few byte edits in a 3 KB payload) stays within the
    threshold, and a structurally different image does not pair."""
    from mapreduce_cs416_spark.operators.multimodal import phash_near_dups

    base = ("the quick brown fox jumps over the lazy dog " * 70)[:3000]
    perturbed = base[:500] + "XYZ" + base[503:]  # same length, 3 bytes changed
    different = "".join(chr(ord("a") + (i * 7) % 26) * 1 for i in range(3000))
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, perturbed), (3, different)],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in phash_near_dups(docs, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0  # exact copy
    assert (0, 2) in pairs and pairs[(0, 2)] <= 3  # perturbed copy found
    assert all(3 not in p for p in pairs)  # different image never pairs


def test_phash_bucket_cap_drops_degenerate_keys(spark):
    """Sub-48-byte docs share all-zero upper chunks; with max_bucket
    below the group size those buckets are dropped and contribute no
    candidate pairs (the max_df discipline), while exact dups in a
    small bucket still pair."""
    from mapreduce_cs416_spark.operators.multimodal import phash_near_dups

    rows = [(i, f"tiny doc {i:04d}") for i in range(20)]
    rows += [(100, "a genuinely longer document body " * 30)] * 1  # singleton
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # tiny docs: 20 docs share the zero chunks -> bucket df 20 > cap 10
    out = phash_near_dups(docs, max_hamming=3, max_bucket=10).collect()
    tiny_pairs = [r for r in out if r["doc_a"] < 100 and r["doc_b"] < 100]
    # pairs may still form via the non-degenerate low chunk; assert the
    # degenerate all-zero buckets alone didn't explode into all-pairs
    assert len(tiny_pairs) < 20 * 19 / 2


def test_image_phash_partition_invariant(spark):
    from mapreduce_cs416_spark.operators.multimodal import image_phash

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some repeated body " * (i % 5 + 1)) for i in range(30)],
        "doc_id long, text string",
    )
    one = {tuple(r) for r in image_phash(docs.coalesce(1)).collect()}
    many = {tuple(r) for r in image_phash(docs.repartition(16)).collect()}
    assert one == many and len(one) == 30


def _ref_audio_chunks(payload: bytes) -> tuple[int, ...]:
    """Independent sequential fingerprint: int16 LE stream straight
    from the payload (zero-padded to whole samples, min 1) — never
    touches make_wav/decode_audio, so a container or parser bug on
    the Spark path shows up as a mismatch here."""
    import struct

    ns = max(-(-len(payload) // 2), 1)
    sm = struct.unpack(f"<{ns}h", payload.ljust(2 * ns, b"\x00"))
    sums = [0] * 64
    for i, x in enumerate(sm):
        sums[(64 * i) // ns] += abs(x)
    bits = [1 if sums[b] > sums[(b + 1) % 64] else 0 for b in range(64)]
    return tuple(
        sum(bits[16 * c + k] << (15 - k) for k in range(16)) for c in range(4)
    )


def test_audio_fingerprint_matches_sequential_reference(spark):
    from mapreduce_cs416_spark.operators.multimodal import audio_fingerprint

    texts = [
        "a",  # 1 byte -> 1 sample, 63 empty bands
        "the quick brown fox jumps over the lazy dog " * 40,
        "".join(chr(33 + (i * 13) % 90) for i in range(777)),  # odd length
        "\x7f\x80 high-bit bytes \xff" * 25,
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in audio_fingerprint(docs).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _ref_audio_chunks(t.encode("utf-8")), f"doc {i}"


def test_audio_near_dup_recall_on_perturbed_audio(spark):
    """Band-gradient fingerprint: an exact copy is Hamming 0, a
    2-byte (single-sample) edit moves one band sum and so flips at
    most the two bits comparing that band to its neighbours, and a
    structurally different signal does not pair."""
    from mapreduce_cs416_spark.operators.multimodal import audio_near_dups

    base = ("the quick brown fox jumps over the lazy dog " * 70)[:3000]
    perturbed = base[:500] + "XY" + base[502:]  # one int16 sample changed
    # quadratic-stride amplitudes: Hamming 24 from base (a short-period
    # repeat would give a near-alternating gradient like base's own)
    different = "".join(chr(33 + (i * i) % 90) for i in range(3000))
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, perturbed), (3, different)],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in audio_near_dups(docs, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0  # exact copy
    assert (0, 2) in pairs and pairs[(0, 2)] <= 2  # perturbed copy found
    assert all(3 not in p for p in pairs)  # different signal never pairs


def test_audio_fingerprint_partition_invariant(spark):
    from mapreduce_cs416_spark.operators.multimodal import audio_fingerprint

    docs = spark.createDataFrame(
        [(i, f"audio stand-in number {i} with body " * (i % 5 + 1)) for i in range(30)],
        "doc_id long, text string",
    )
    one = {tuple(r) for r in audio_fingerprint(docs.coalesce(1)).collect()}
    many = {tuple(r) for r in audio_fingerprint(docs.repartition(16)).collect()}
    assert one == many and len(one) == 30


def test_video_fingerprint_matches_sequential_reference(spark):
    from mapreduce_cs416_spark.operators.multimodal import (
        _audio_fp_chunks,
        decode_video,
        make_avi,
        video_fingerprint,
    )

    rows = [(i, f"video stand-in number {i} with body " * (i % 5 + 1)) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in video_fingerprint(docs).collect()
    }
    for doc_id, text in rows:
        vid = decode_video(make_avi(text.encode(), 1, 1))
        want = tuple(_audio_fp_chunks([sum(f) for f in vid["frames"]], vid["n_frames"]))
        assert got[doc_id] == want


def test_video_near_dup_recall_on_perturbed_video(spark):
    """Temporal band-gradient fingerprint: an exact copy is Hamming 0,
    an edit confined to one frame (3 pixel bytes of a 1×1 fixture
    frame) moves one band sum and so flips at most the two bits
    comparing that band to its neighbours, and a structurally
    different frame sequence does not pair."""
    from mapreduce_cs416_spark.operators.multimodal import video_near_dups

    base = ("the quick brown fox jumps over the lazy dog " * 70)[:3000]
    perturbed = base[:500] + "XYZ" + base[503:]  # one whole 1×1 frame changed
    different = "".join(chr(33 + (i * i) % 90) for i in range(3000))
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, perturbed), (3, different)],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in video_near_dups(docs, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0  # exact copy
    assert (0, 2) in pairs and pairs[(0, 2)] <= 2  # perturbed copy found
    assert all(3 not in p for p in pairs)  # different sequence never pairs


def test_video_fingerprint_partition_invariant(spark):
    from mapreduce_cs416_spark.operators.multimodal import video_fingerprint

    docs = spark.createDataFrame(
        [(i, f"video stand-in number {i} with body " * (i % 5 + 1)) for i in range(30)],
        "doc_id long, text string",
    )
    one = {tuple(r) for r in video_fingerprint(docs.coalesce(1)).collect()}
    many = {tuple(r) for r in video_fingerprint(docs.repartition(16)).collect()}
    assert one == many and len(one) == 30


def test_palette_png_decodes_through_plte():
    """Color-type-3 PNG: indices unfilter at 1 byte/px (Sub/Up
    distances operate on the stored width), then expand through PLTE
    to RGB; out-of-range indices and tRNS raise."""
    import zlib

    import pytest as _pytest

    from mapreduce_cs416_spark.operators.multimodal import PNG_SIG, _decode_png, _png_chunk

    W, H = 4, 3
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = [[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 3, 0]]
    lines = [bytes(r) for r in idx]
    raw = bytearray(b"\x00" + lines[0])
    sub = bytearray(lines[1])
    for x in range(W - 1, 0, -1):
        sub[x] = (sub[x] - sub[x - 1]) & 0xFF
    raw += b"\x01" + bytes(sub)
    raw += b"\x02" + bytes((lines[2][x] - lines[1][x]) & 0xFF for x in range(W))
    ihdr = W.to_bytes(4, "big") + H.to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])

    def png(plte, extra=b""):
        return (
            PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"PLTE", plte) + extra
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw))) + _png_chunk(b"IEND", b"")
        )

    img = _decode_png(png(pal))
    assert (img["width"], img["height"], img["channels"]) == (4, 3, 3)
    assert img["pixels"] == b"".join(pal[3 * i : 3 * i + 3] for row in idx for i in row)
    with _pytest.raises(ValueError, match="palette index"):
        _decode_png(png(pal[:9]))
    with _pytest.raises(NotImplementedError, match="tRNS"):
        _decode_png(png(pal, extra=_png_chunk(b"tRNS", b"\x00")))


def test_decode_stage_gets_real_splits_on_multi_file_store(spark, sf_dir, tmp_path):
    """Pins the at-scale half of the r14 single-task-decode analysis
    (VERDICT r14 item 5): at sf0.1 the one-row-group documents file
    puts the whole mapInPandas decode on ONE task (the _spread
    row-group split-count lie), and the _spread fix measured worse at
    that volume — the argument for leaving it was "at 100 TB the scan
    has real splits by construction". This asserts that mechanism
    instead of assuming it: over a multi-file blob store, with
    ``spark.sql.files.maxPartitionBytes`` sized below the store (as
    any production config sizes it far below the input), the decode
    stage plans MORE THAN ONE input split — i.e. the blob scan honors
    maxPartitionBytes and the single-task shape is a small-fixture
    artifact, not an operator property."""
    from mapreduce_cs416_spark.operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    store = str(tmp_path / "docs_multi")
    docs.repartition(4).write.parquet(store)
    conf = spark.conf
    prev_mpb = conf.get("spark.sql.files.maxPartitionBytes")
    prev_open = conf.get("spark.sql.files.openCostInBytes")
    try:
        # size the split knobs below the store (default 128m/4m would
        # pack the whole small fixture into one split by design)
        conf.set("spark.sql.files.maxPartitionBytes", "16k")
        conf.set("spark.sql.files.openCostInBytes", "0")
        multi = spark.read.parquet(store)
        assert len(multi.inputFiles()) >= 4
        feats = multimodal.extract_feature_arrays(multi)
        # mapInPandas is narrow: its partition count IS the scan's
        # split count — the decode work distributes
        n_parts = feats.rdd.getNumPartitions()
        assert n_parts > 1, f"decode stage planned {n_parts} split(s)"
    finally:
        conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
        conf.set("spark.sql.files.openCostInBytes", prev_open)
