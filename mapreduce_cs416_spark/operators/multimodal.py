"""Multimodal column plumbing (north-star surface).

Images/audio/video are opaque ``binary`` columns with typed metadata.
Everything Spark-side — schema, batching, partitioning, UDF
signatures — is real and tested:

- ``with_blob``      : attach a binary payload + media-type metadata
                       (here derived from text; in production the blob
                       column arrives from parquet/Lance directly).
- ``blob_metadata``  : metadata extraction as pure built-ins (byte
                       length, sha-256, magic-bytes sniff) — no UDF.
- ``extract_features``: mapInPandas feature extractor — Arrow-batched,
                       one pandas frame per partition chunk; the
                       "decode" inside is a deterministic fake
                       (byte-chunk means), the batch shape is real.
- ``decode_image``   : the genuine decode entry point — WORKING
                       pure-Python parsers for uncompressed 24-bit
                       BMP, binary PPM (P6), and 8-bit truecolor PNG
                       (zlib-inflated IDAT + all five scanline
                       filters — the stdlib ships the codec). JPEG
                       still raises: its DCT entropy coding genuinely
                       needs libjpeg, absent from this container.
- ``decode_image_stats``: the oracled end-to-end decode query
                       (make_bmp → decode_image → channel means),
                       with PPM and PNG faces over the same shared
                       ``_decode_stats`` mapInPandas body.
- ``decode_audio``   : the audio counterpart — a genuine RIFF chunk
                       walker for 16-bit PCM WAVE; compressed codecs
                       (MP3/AAC/ADPCM) honestly raise. The oracled
                       ``decode_audio_stats`` query emits per-doc
                       signal stats (duration, mean/peak amplitude,
                       zero crossings).
- ``decode_video``   : the video counterpart — a recursive RIFF/AVI
                       tree parser (hdrl/avih/strl validation, movi
                       frame chunks, bottom-up DIB row reversal);
                       codec fourccs (MJPG/H.264) honestly raise.
                       ``decode_video_stats`` is its oracled per-doc
                       frame/channel-stats query.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def with_blob(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + media metadata. The payload is
    the utf-8 text bytes (deterministic stand-in for real media)."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("blob"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
    )


def blob_metadata(docs: DataFrame) -> DataFrame:
    """Typed metadata over the binary column — pure built-ins:
    byte length, sha-256 digest, first-4-bytes 'magic' hex."""
    blobs = with_blob(docs)
    return blobs.select(
        "doc_id",
        "media_type",
        F.length("blob").alias("n_bytes"),
        F.sha2("blob", 256).alias("sha256_hex"),
        F.lower(F.hex(F.expr("substring(blob, 1, 4)"))).alias("magic_hex"),
    )


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake decode: mean byte value of `dim` equal chunks.

    Stands in for image/audio decoding (libraries not present in this
    container); replace with a real decoder via ``decode_image``.
    """
    n = len(payload)
    if n == 0:
        return [0.0] * dim
    step = max(n // dim, 1)
    feats = []
    for i in range(dim):
        chunk = payload[i * step : (i + 1) * step] or payload[-step:]
        feats.append(sum(chunk) / len(chunk))
    return feats


def extract_features(docs: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Arrow-batched feature extraction over the blob column.

    mapInPandas: pandas batches in, pandas batches out — the real
    plumbing for a decode/embed stage at scale (each partition's
    batches stream through the Python worker; no collect, no
    per-row pickling).

    The feature vector is serialized to a CSV string (6-dp DECIMAL
    rendering, same recipe as array_funcs) so the driver's pandas
    canonicalization can sort/hash the rows; the raw array variant is
    ``extract_feature_arrays`` (used by tests).
    """
    feats = extract_feature_arrays(docs, dim)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.concat_ws(
            ",",
            F.expr("transform(features, x -> cast(cast(round(x, 6) as decimal(16,6)) as string))"),
        ).alias("features_csv"),
    )


def extract_feature_arrays(docs: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """The raw mapInPandas stage: (doc_id, n_bytes, features array<double>)."""
    blobs = with_blob(docs).select("doc_id", "blob")

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["blob"].map(len).astype("int32"),
                    "features": pdf["blob"].map(lambda b: _fake_decode(bytes(b), dim)),
                }
            )

    return blobs.mapInPandas(_extract, FEATURE_SCHEMA)


N_FRAMES = 4
FRAME_LEN = 16

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_off", T.IntegerType()),
        T.StructField("frame_hex", T.StringType()),
    ]
)


def sample_frames(docs: DataFrame, n_frames: int = N_FRAMES) -> DataFrame:
    """Frame sampling over the binary column — the video-shaped
    multimodal op: one input blob fans out to ``n_frames`` rows at
    evenly spaced offsets (a real decoder would seek keyframes; the
    deterministic stand-in slices ``FRAME_LEN`` bytes per offset).

    Plumbing-wise this is the *expanding* mapInPandas shape (1 → n
    rows per input, batch sizes change across the boundary) that a
    frame-extract / chunking stage needs at scale; blobs never leave
    the executor, output rows carry offsets + digests only.
    """
    blobs = with_blob(docs).select("doc_id", "blob")

    def _frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_off": [], "frame_hex": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                n = len(b)
                if n == 0:
                    continue
                step = max(n // n_frames, 1)
                for i in range(n_frames):
                    off = i * step
                    if off >= n:
                        break
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_off"].append(off)
                    out["frame_hex"].append(b[off : off + FRAME_LEN].hex())
            yield pd.DataFrame(out)

    return blobs.mapInPandas(_frames, FRAME_SCHEMA)


RESIZE_FACTOR = 4

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_bytes", T.IntegerType()),
        T.StructField("resized_bytes", T.IntegerType()),
        T.StructField("resized_hex16", T.StringType()),
    ]
)


def resize_blobs(docs: DataFrame, factor: int = RESIZE_FACTOR) -> DataFrame:
    """Resize/downsample plumbing over the binary column: keep every
    ``factor``-th byte (the nearest-neighbor analog of an image
    downscale; a real codec plugs in at ``decode_image``). 1→1 row
    mapInPandas with a size-reducing payload — the shape of a
    thumbnail/transcode stage; only lengths + a digest prefix leave
    the executor."""
    blobs = with_blob(docs).select("doc_id", "blob")

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            resized = pdf["blob"].map(lambda b: bytes(b)[::factor])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": pdf["blob"].map(len).astype("int32"),
                    "resized_bytes": resized.map(len).astype("int32"),
                    "resized_hex16": resized.map(lambda b: b[:16].hex()),
                }
            )

    return blobs.mapInPandas(_resize, RESIZE_SCHEMA)


PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha256_hex", T.StringType()),
        T.StructField("magic_hex", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
        T.StructField("orig_bytes", T.IntegerType()),
        T.StructField("resized_bytes", T.IntegerType()),
        T.StructField("resized_hex16", T.StringType()),
    ]
)


def blob_profile(
    docs: DataFrame, dim: int = FEATURE_DIM, factor: int = RESIZE_FACTOR
) -> DataFrame:
    """blob_metadata + extract_features + resize_blobs in ONE pass:
    metadata stays pure JVM built-ins computed before the Python
    boundary, then a single mapInPandas computes features AND the
    resize in the same Arrow batch (one Python worker round-trip
    instead of two, and no doc_id joins afterwards — at 100 TB the
    joined variant would re-scan and shuffle the corpus twice). The
    tiny metadata columns ride through the batch as passthrough;
    blobs still never leave the executor. Values/types are identical
    to joining the three granular operators on doc_id, which is what
    the DuckDB oracle does."""
    meta = with_blob(docs).select(
        "doc_id",
        "media_type",
        F.length("blob").alias("n_bytes"),
        F.sha2("blob", 256).alias("sha256_hex"),
        F.lower(F.hex(F.expr("substring(blob, 1, 4)"))).alias("magic_hex"),
        "blob",
    )

    def _profile(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            resized = pdf["blob"].map(lambda b: bytes(b)[::factor])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "sha256_hex": pdf["sha256_hex"],
                    "magic_hex": pdf["magic_hex"],
                    "features": pdf["blob"].map(lambda b: _fake_decode(bytes(b), dim)),
                    "orig_bytes": pdf["blob"].map(len).astype("int32"),
                    "resized_bytes": resized.map(len).astype("int32"),
                    "resized_hex16": resized.map(lambda b: b[:16].hex()),
                }
            )

    out = meta.mapInPandas(_profile, PROFILE_SCHEMA)
    # same 6-dp DECIMAL CSV rendering as extract_features
    return out.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "sha256_hex",
        "magic_hex",
        F.concat_ws(
            ",",
            F.expr("transform(features, x -> cast(cast(round(x, 6) as decimal(16,6)) as string))"),
        ).alias("features_csv"),
        "orig_bytes",
        "resized_bytes",
        "resized_hex16",
    )


BMP_WIDTH = 16  # 16 px × 3 B = 48 B rows — already 4-aligned, no pad


def make_bmp(payload: bytes, width: int = BMP_WIDTH) -> bytes:
    """Wrap raw bytes into a valid uncompressed 24-bit BMP (BI_RGB,
    BITMAPINFOHEADER, bottom-up rows, 4-byte row stride). The
    deterministic blob synthesizer for the decode path: pixel data =
    ``payload`` zero-padded to stride·height, so every byte of the
    input is addressable as a pixel channel."""
    stride = (width * 3 + 3) & ~3
    height = max(-(-len(payload) // stride), 1)
    data = payload.ljust(stride * height, b"\x00")
    info = (
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)  # positive: bottom-up
        + (1).to_bytes(2, "little")  # planes
        + (24).to_bytes(2, "little")  # bpp
        + (0).to_bytes(4, "little")  # BI_RGB (uncompressed)
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 dpi
        + (0).to_bytes(4, "little") * 2  # palette
    )
    header = b"BM" + (14 + 40 + len(data)).to_bytes(4, "little") + b"\x00" * 4 + (54).to_bytes(4, "little")
    return header + info + data


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): pick whichever of
    left/up/up-left is closest to a + b − c, ties toward left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + ctype
        + data
        + zlib.crc32(ctype + data).to_bytes(4, "big")
    )


def make_png(payload: bytes, width: int = BMP_WIDTH) -> bytes:
    """Wrap raw bytes into a REAL 8-bit truecolor PNG: payload
    zero-padded to width·height RGB triplets, scanlines filtered with
    filter type ``row % 5`` (cycling None/Sub/Up/Average/Paeth so
    every oracled decode exercises all five reconstruction paths),
    zlib-compressed into one IDAT. Unlike ``make_bmp``/``make_ppm``
    this is a genuinely compressed container — the decoder must
    inflate and de-filter to get the bytes back, and the filters are
    lossless, so the round trip is still byte-exact against the
    padded payload (what the DuckDB oracle recomputes from)."""
    import zlib

    bpp = 3
    row_len = width * bpp
    height = max(-(-len(payload) // row_len), 1)
    data = payload.ljust(row_len * height, b"\x00")
    prior = bytes(row_len)
    filtered = bytearray()
    for r in range(height):
        raw = data[r * row_len : (r + 1) * row_len]
        ftype = r % 5
        filtered.append(ftype)
        if ftype == 0:  # None
            filtered += raw
        elif ftype == 1:  # Sub
            filtered += bytes(
                (raw[x] - (raw[x - bpp] if x >= bpp else 0)) & 0xFF for x in range(row_len)
            )
        elif ftype == 2:  # Up
            filtered += bytes((raw[x] - prior[x]) & 0xFF for x in range(row_len))
        elif ftype == 3:  # Average
            filtered += bytes(
                (raw[x] - (((raw[x - bpp] if x >= bpp else 0) + prior[x]) >> 1)) & 0xFF
                for x in range(row_len)
            )
        else:  # Paeth
            filtered += bytes(
                (
                    raw[x]
                    - _paeth(
                        raw[x - bpp] if x >= bpp else 0,
                        prior[x],
                        prior[x - bpp] if x >= bpp else 0,
                    )
                )
                & 0xFF
                for x in range(row_len)
            )
        prior = raw
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # bit depth 8, truecolor RGB, deflate, adaptive, no interlace
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(filtered), 6))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> dict:
    """Critical-chunk PNG parser: 8-bit grayscale (color type 0),
    truecolor RGB (2), palette-indexed (3, expanded through PLTE to
    RGB), and RGBA (6); deflate IDAT (stdlib zlib), all five scanline
    filters, non-interlaced. Ancillary chunks are skipped;
    grayscale-alpha/16-bit/Adam7/tRNS-transparency raise
    NotImplementedError (honest gaps — adding them is more parsing,
    not a codec dependency)."""
    import zlib

    if len(payload) < len(PNG_SIG) + 25:
        raise ValueError("truncated PNG")
    pos = len(PNG_SIG)
    width = height = channels = None
    indexed = False
    palette = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        if len(data) < clen:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            width = int.from_bytes(data[0:4], "big")
            height = int.from_bytes(data[4:8], "big")
            bit_depth, color_type, comp, filt, interlace = data[8:13]
            if bit_depth != 8 or color_type not in (0, 2, 3, 6):
                raise NotImplementedError(
                    "only 8-bit grayscale/truecolor RGB/palette/RGBA PNG is supported"
                )
            if comp != 0 or filt != 0:
                raise ValueError("invalid PNG compression/filter method")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlaced PNG is not supported")
            indexed = color_type == 3
            # filtering operates on the STORED pixel width: 1 byte per
            # pixel for indexed images; palette expansion happens after
            channels = {0: 1, 2: 3, 3: 1, 6: 4}[color_type]
        elif ctype == b"PLTE":
            if clen % 3:
                raise ValueError("PLTE length not a multiple of 3")
            palette = bytes(data)
        elif ctype == b"tRNS":
            raise NotImplementedError("tRNS transparency is not supported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + data + crc
    if width is None or channels is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    raw = zlib.decompress(bytes(idat))
    bpp = channels
    row_len = width * bpp
    if len(raw) != (row_len + 1) * height:
        raise ValueError(
            f"PNG scanline data: got {len(raw)} bytes, want {(row_len + 1) * height}"
        )
    prior = bytearray(row_len)
    out = bytearray()
    for r in range(height):
        off = r * (row_len + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + row_len])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, row_len):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(row_len):
                line[x] = (line[x] + prior[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(row_len):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(row_len):
                left = line[x - bpp] if x >= bpp else 0
                ul = prior[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(left, prior[x], ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out += line
        prior = line
    if indexed:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        n = len(palette) // 3
        if any(i >= n for i in out):
            raise ValueError("palette index out of range")
        rgb = bytearray()
        for i in out:
            rgb += palette[3 * i : 3 * i + 3]
        return {"width": width, "height": height, "channels": 3, "pixels": bytes(rgb)}
    return {"width": width, "height": height, "channels": channels, "pixels": bytes(out)}


def decode_image(payload: bytes) -> dict:
    """Real media decode — pure-Python parsers for every format the
    stdlib can carry without a codec library (the container ships no
    PIL/cv2): 24-bit BI_RGB **BMP** (handles bottom-up AND top-down
    rows, 4-byte row padding, arbitrary pixel-array offset), binary
    **PPM** (P6, maxval ≤ 255), and 8-bit **PNG** (grayscale, RGB and
    RGBA, zlib-inflated IDAT, all five scanline filters — see
    ``_decode_png``). JPEG still raises: DCT entropy decoding
    genuinely needs libjpeg; ``extract_features`` picks any richer
    decoder up unchanged.

    Returns {"width", "height", "channels", "pixels": bytes} with
    pixels row-major TOP-DOWN in the format's channel order (BGR for
    BMP, RGB(A) for PPM/PNG), row padding stripped.
    tests/test_multimodal.py pins all three parsers against
    hand-built fixtures (incl. an odd-width BMP whose rows genuinely
    carry pad bytes, and per-filter PNG fixtures).
    """
    if payload[:8] == PNG_SIG:
        return _decode_png(payload)
    if payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        off = int.from_bytes(payload[10:14], "little")
        width = int.from_bytes(payload[18:22], "little", signed=True)
        height = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or compression != 0:
            raise NotImplementedError("only uncompressed 24-bit BMP is supported")
        top_down = height < 0
        height = abs(height)
        stride = (width * 3 + 3) & ~3
        need = off + stride * height
        if len(payload) < need:
            raise ValueError(f"truncated BMP pixel array: {len(payload)} < {need}")
        rows = [
            payload[off + r * stride : off + r * stride + width * 3]
            for r in range(height)
        ]
        if not top_down:
            rows.reverse()
        return {"width": width, "height": height, "channels": 3, "pixels": b"".join(rows)}
    if payload[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws>
        fields: list[int] = []
        i = 2
        while len(fields) < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if i < len(payload) and payload[i : i + 1] == b"#":  # comment line
                while i < len(payload) and payload[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
        i += 1  # the single whitespace after maxval
        width, height, maxval = fields
        if maxval > 255:
            raise NotImplementedError("16-bit PPM is not supported")
        need = width * height * 3
        if len(payload) < i + need:
            raise ValueError("truncated PPM pixel data")
        return {
            "width": width,
            "height": height,
            "channels": 3,
            "pixels": payload[i : i + need],
        }
    raise NotImplementedError(
        "unsupported format (BMP/PPM/PNG decode without codec libraries; JPEG needs libjpeg)"
    )


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_data_bytes", T.IntegerType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("row0_hex", T.StringType()),
    ]
)


def make_ppm(payload: bytes, width: int = BMP_WIDTH) -> bytes:
    """Wrap raw bytes into a binary PPM (P6): zero-padded to
    width·height RGB triplets — the padding-free, top-down counterpart
    of ``make_bmp`` (PPM has no row stride and no row reversal)."""
    height = max(-(-len(payload) // (width * 3)), 1)
    data = payload.ljust(width * height * 3, b"\x00")
    return f"P6\n{width} {height}\n255\n".encode() + data


PPM_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_data_bytes", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("row0_hex", T.StringType()),
    ]
)

# PNG stores RGB top-down like PPM — same stats schema.
PNG_DECODE_SCHEMA = PPM_DECODE_SCHEMA


def _decode_stats(docs: DataFrame, make_fn, schema: T.StructType, width: int) -> DataFrame:
    """The ONE mapInPandas decode-stats body shared by the BMP, PPM
    and PNG faces (they differ only in the container wrapper and the
    channel order, which is read off the schema's ``mean_*`` field
    names — BGR for BMP, RGB for PPM/PNG). Wrap each blob's bytes
    with ``make_fn``, run the genuine ``decode_image`` parser, and
    emit per-channel pixel means + the TOP image row's hex. One
    mapInPandas pass, blobs never leave the executor; the output is
    reduced stats only (the 100 TB decode-stage shape).

    Raw IEEE means leave the Python worker; 6-dp rounding happens
    JVM-side — Python's round() is banker's (half-even) while Spark
    and DuckDB both round HALF_UP, and sums divided by the
    power-of-two pixel count hit exact .5 cases constantly."""
    blobs = with_blob(docs).select("doc_id", "blob")
    chans = [f.name.removeprefix("mean_") for f in schema.fields if f.name.startswith("mean_")]
    bpp = len(chans)  # pixel stride = channel count, read off the schema

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in schema.fields}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                raw = bytes(blob)
                img = decode_image(make_fn(raw, width))
                if img["channels"] != bpp:
                    raise ValueError(
                        f"decoded {img['channels']} channels but the stats "
                        f"schema declares {bpp} mean_* fields"
                    )
                px = img["pixels"]
                n_px = img["width"] * img["height"]
                out["doc_id"].append(doc_id)
                out["width"].append(img["width"])
                out["height"].append(img["height"])
                out["n_data_bytes"].append(len(raw))
                for i, c in enumerate(chans):
                    out[f"mean_{c}"].append(sum(px[i::bpp]) / n_px)
                out["row0_hex"].append(px[: img["width"] * bpp].hex())
            yield pd.DataFrame(out)

    out = blobs.mapInPandas(_decode, schema)
    return out.select(
        "doc_id",
        "width",
        "height",
        "n_data_bytes",
        *[F.round(f"mean_{c}", 6).alias(f"mean_{c}") for c in chans],
        "row0_hex",
    )


def decode_image_stats(docs: DataFrame, width: int = BMP_WIDTH) -> DataFrame:
    """END-TO-END real decode path: wrap each blob's bytes into a
    24-bit BMP (``make_bmp``), run the genuine parser
    (``decode_image``), and emit per-channel pixel means plus the TOP
    image row's hex — which is the LAST stored row of a bottom-up
    BMP, so a decoder that ignored row order would fail the oracle.
    Everything is deterministic integer byte math + one IEEE division
    per mean, so the query is hash-exact against a DuckDB twin that
    recomputes the same means straight from the payload byte
    positions (plans/northstar.MULTIMODAL_DECODE_SQL).
    """
    return _decode_stats(docs, make_bmp, DECODE_SCHEMA, width)


def decode_ppm_stats(docs: DataFrame, width: int = BMP_WIDTH) -> DataFrame:
    """The PPM face of the decode path: wrap each blob's bytes into a
    P6 image (``make_ppm``), run the same ``decode_image`` parser, and
    emit per-channel means + the first image row's hex. PPM stores
    R,G,B top-down with no stride padding, so where the BMP query's
    row0 is the LAST stored row, here it is simply the first 3·width
    payload bytes — together the two queries pin both channel orders
    and both row layouts of the decoder against hash-exact oracles
    (plans/northstar.MULTIMODAL_DECODE_PPM_SQL)."""
    return _decode_stats(docs, make_ppm, PPM_DECODE_SCHEMA, width)


WAV_SAMPLE_RATE = 8000  # Hz; 1000/8000 = 0.125 ms/sample, exact in binary


def make_wav(payload: bytes, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Wrap raw bytes into a valid RIFF/WAVE file: 16-bit little-endian
    PCM, mono, ``payload`` zero-padded to whole samples (min 1). An
    odd-sized 'JUNK' chunk sits between 'fmt ' and 'data' on purpose —
    a decoder that assumes data immediately follows fmt, or that skips
    chunks without RIFF word alignment, breaks on every blob this
    emits."""
    n_samples = max(-(-len(payload) // 2), 1)
    data = payload.ljust(2 * n_samples, b"\x00")
    fmt = (
        (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")  # bits/sample
    )
    junk = b"JUNK" + (3).to_bytes(4, "little") + b"mrc" + b"\x00"  # odd size -> pad byte
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + junk
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_audio(payload: bytes) -> dict:
    """Real audio decode: a genuine RIFF chunk walker (word-aligned
    chunk sizes, ancillary chunks skipped) for 16-bit little-endian
    PCM WAVE, mono or multi-channel. Compressed codecs (MP3/AAC/ADPCM
    format tags) genuinely need codec libraries and raise — same
    honesty contract as ``decode_image``'s JPEG guard.

    Returns {"sample_rate", "n_channels", "n_samples", "samples":
    list[int]} with samples interleaved in file order (n_samples
    counts per-channel frames x channels = total int16 values).
    tests/test_multimodal.py pins the parser against hand-built
    fixtures (chunk skipping, odd-size padding, truncation) and a
    hypothesis round-trip over make_wav."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("unsupported audio container (16-bit PCM WAVE only)")
    if len(payload) < 12:
        raise ValueError("truncated WAV header")
    pos = 12
    sample_rate = n_channels = bits = fmt_tag = None
    data = None
    while pos + 8 <= len(payload):
        ctype = payload[pos : pos + 4]
        clen = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        chunk = payload[pos + 8 : pos + 8 + clen]
        if len(chunk) < clen:
            raise ValueError("truncated WAV chunk")
        if ctype == b"fmt ":
            if clen < 16:
                raise ValueError("truncated fmt chunk")
            fmt_tag = int.from_bytes(chunk[0:2], "little")
            n_channels = int.from_bytes(chunk[2:4], "little")
            sample_rate = int.from_bytes(chunk[4:8], "little")
            bits = int.from_bytes(chunk[14:16], "little")
        elif ctype == b"data":
            data = chunk
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    if fmt_tag is None:
        raise ValueError("WAV missing fmt chunk")
    if fmt_tag != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV is supported (format tag {fmt_tag}, {bits}-bit needs a codec)"
        )
    if data is None:
        raise ValueError("WAV missing data chunk")
    n = len(data) // 2  # trailing odd byte (malformed writer) ignored
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_samples": n,
        "samples": list(struct.unpack(f"<{n}h", data[: 2 * n])),
    }


WAV_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("n_data_bytes", T.IntegerType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("mean_abs", T.DoubleType()),
        T.StructField("peak_abs", T.IntegerType()),
        T.StructField("n_zero_cross", T.IntegerType()),
        T.StructField("head_hex", T.StringType()),
    ]
)


def decode_audio_stats(docs: DataFrame, sample_rate: int = WAV_SAMPLE_RATE) -> DataFrame:
    """The AUDIO face of the real-decode path: wrap each blob's bytes
    into a 16-bit PCM WAV (``make_wav`` — whose odd-sized JUNK chunk
    forces the parser to genuinely walk RIFF chunks with word
    alignment), decode with ``decode_audio``, and emit per-doc signal
    stats: sample count, duration, mean |amplitude|, peak |amplitude|,
    zero-crossing count (sign changes between consecutive samples),
    plus the first 16 PCM bytes' hex to pin int16 little-endian byte
    order. The stats face is MONO-only (zero crossings and sample
    order are per-channel concepts; interleaved multi-channel streams
    would count sign flips across channel boundaries) — multi-channel
    input raises rather than silently mis-measuring; duration divides
    frame count (samples/channel), not interleaved sample count. All integer math
    plus one IEEE division per mean — hash-exact against a DuckDB twin
    that reassembles the same int16 stream from payload hex pairs
    (plans/northstar.MULTIMODAL_DECODE_WAV_SQL). Same 100 TB shape as
    the image faces: one Arrow-batched mapInPandas, blobs never leave
    the executor, only reduced stats come back. Raw IEEE values leave
    Python; 6-dp rounding happens JVM-side (HALF_UP discipline)."""
    blobs = with_blob(docs).select("doc_id", "blob")

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in WAV_DECODE_SCHEMA.fields}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                raw = bytes(blob)
                au = decode_audio(make_wav(raw, sample_rate))
                if au["n_channels"] != 1:
                    raise ValueError(
                        "decode_audio_stats is mono-only: zero-cross/mean stats "
                        f"are per-channel, got {au['n_channels']} channels"
                    )
                sm = au["samples"]
                ns = au["n_samples"]
                n_frames = ns // au["n_channels"]
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(au["sample_rate"])
                out["n_samples"].append(ns)
                out["n_data_bytes"].append(len(raw))
                out["duration_ms"].append(n_frames * 1000.0 / au["sample_rate"])
                out["mean_abs"].append(sum(abs(x) for x in sm) / ns)
                out["peak_abs"].append(max(abs(x) for x in sm))
                out["n_zero_cross"].append(
                    sum((sm[i - 1] < 0) != (sm[i] < 0) for i in range(1, ns))
                )
                out["head_hex"].append(
                    b"".join(x.to_bytes(2, "little", signed=True) for x in sm[:8]).hex()
                )
            yield pd.DataFrame(out)

    out = blobs.mapInPandas(_decode, WAV_DECODE_SCHEMA)
    return out.select(
        "doc_id",
        "sample_rate",
        "n_samples",
        "n_data_bytes",
        F.round("duration_ms", 6).alias("duration_ms"),
        F.round("mean_abs", 6).alias("mean_abs"),
        "peak_abs",
        "n_zero_cross",
        "head_hex",
    )


AVI_FRAME_H = 4  # rows per frame; 16 px × 3 B = 48 B rows → 192 B frames


def make_avi(payload: bytes, width: int = BMP_WIDTH, height: int = AVI_FRAME_H) -> bytes:
    """Wrap raw bytes into a valid uncompressed RGB24 AVI: payload
    zero-padded to whole frames (min 1) of bottom-up BGR DIB bitmaps
    (stride 4-aligned, like BMP pixel arrays), stored as '00db' chunks
    inside the movi LIST, behind a real hdrl (avih + strl/strh/strf)
    header tree. The video counterpart of make_bmp/make_wav — every
    payload byte is addressable as a pixel channel of some frame."""
    stride = (width * 3 + 3) & ~3
    frame_len = stride * height
    n_frames = max(-(-len(payload) // frame_len), 1)
    data = payload.ljust(frame_len * n_frames, b"\x00")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + len(body).to_bytes(4, "little") + body + (b"\x00" if len(body) & 1 else b"")

    def lst(tag: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", tag + body)

    avih = (
        (40_000).to_bytes(4, "little")  # µs/frame (25 fps)
        + (0).to_bytes(4, "little") * 3  # max bytes/s, padding, flags
        + n_frames.to_bytes(4, "little")
        + (0).to_bytes(4, "little")  # initial frames
        + (1).to_bytes(4, "little")  # streams
        + frame_len.to_bytes(4, "little")  # suggested buffer
        + width.to_bytes(4, "little")
        + height.to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 4  # reserved
    )
    strh = (
        b"vids" + b"DIB "  # fccType / fccHandler
        + (0).to_bytes(4, "little") * 3  # flags, prio+lang, initial
        + (1).to_bytes(4, "little")  # scale
        + (25).to_bytes(4, "little")  # rate
        + (0).to_bytes(4, "little")  # start
        + n_frames.to_bytes(4, "little")
        + frame_len.to_bytes(4, "little")
        + (0xFFFFFFFF).to_bytes(4, "little")  # quality
        + (0).to_bytes(4, "little")  # sample size
        + (0).to_bytes(8, "little")  # rcFrame
    )
    strf = (  # BITMAPINFOHEADER, same layout decode_image parses
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)  # positive: bottom-up
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + frame_len.to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 4
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(
        b"movi",
        b"".join(chunk(b"00db", data[i * frame_len : (i + 1) * frame_len]) for i in range(n_frames)),
    )
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_video(payload: bytes) -> dict:
    """Real video decode: a genuine RIFF/AVI parser — walks the
    word-aligned chunk tree, reads dimensions from avih, validates
    the stream format is uncompressed 24-bit BI_RGB (any real codec
    fourcc honestly raises — MJPG/H.264 need codec libraries), and
    extracts every '00db'/'00dc' movi chunk as one frame, row-reversed
    from the DIB's bottom-up storage to top-down BGR with stride
    padding stripped — frame pixels follow exactly the decode_image
    BMP contract.

    Returns {"width", "height", "n_frames", "frames": list[bytes]}.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise NotImplementedError("unsupported video container (uncompressed AVI only)")
    width = height = None
    declared_frames = None
    compression = None
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal width, height, declared_frames, compression
        pos = 0
        while pos + 8 <= len(buf):
            tag = buf[pos : pos + 4]
            clen = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            body = buf[pos + 8 : pos + 8 + clen]
            if len(body) < clen:
                raise ValueError("truncated AVI chunk")
            if tag == b"LIST":
                walk(body[4:])  # skip the list-type fourcc, recurse
            elif tag == b"avih":
                declared_frames = int.from_bytes(body[16:20], "little")
                width = int.from_bytes(body[32:36], "little")
                height = int.from_bytes(body[36:40], "little")
            elif tag == b"strf" and len(body) >= 34:
                compression = int.from_bytes(body[16:20], "little")
                bpp = int.from_bytes(body[14:16], "little")
                if compression != 0 or bpp != 24:
                    raise NotImplementedError(
                        "only uncompressed 24-bit AVI is supported (codec frames need a codec library)"
                    )
            elif tag[2:4] in (b"db", b"dc"):
                frames.append(body)
            pos += 8 + clen + (clen & 1)  # RIFF word alignment

    walk(payload[12:])
    if width is None or compression is None:
        raise ValueError("AVI missing avih/strf headers")
    if declared_frames != len(frames):
        raise ValueError(f"AVI declares {declared_frames} frames but carries {len(frames)}")
    stride = (width * 3 + 3) & ~3
    out = []
    for f in frames:
        if len(f) < stride * height:
            raise ValueError("truncated AVI frame")
        rows = [f[r * stride : r * stride + width * 3] for r in range(height)]
        out.append(b"".join(reversed(rows)))  # bottom-up DIB → top-down
    return {"width": width, "height": height, "n_frames": len(out), "frames": out}


VIDEO_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_data_bytes", T.IntegerType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("frame0_row0_hex", T.StringType()),
    ]
)


def decode_video_stats(
    docs: DataFrame, width: int = BMP_WIDTH, height: int = AVI_FRAME_H
) -> DataFrame:
    """The VIDEO face of the real-decode path: wrap each blob's bytes
    into an uncompressed AVI (``make_avi``), run the genuine RIFF
    tree parser (``decode_video``), and emit per-doc stats — frame
    count, per-channel means over ALL frames' pixels, and the TOP row
    of frame 0 (the LAST stored row of its bottom-up DIB, so ignoring
    row order fails the oracle). Same engine-parity discipline as the
    image/audio faces: integer byte math, one IEEE division per mean,
    6-dp rounding JVM-side, hash-exact against
    plans/northstar.MULTIMODAL_DECODE_AVI_SQL which recomputes
    everything from payload hex pairs."""
    blobs = with_blob(docs).select("doc_id", "blob")
    n_px_per_frame = width * height

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in VIDEO_DECODE_SCHEMA.fields}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                raw = bytes(blob)
                vid = decode_video(make_avi(raw, width, height))
                px = b"".join(vid["frames"])
                n_px = n_px_per_frame * vid["n_frames"]
                out["doc_id"].append(doc_id)
                out["width"].append(vid["width"])
                out["height"].append(vid["height"])
                out["n_frames"].append(vid["n_frames"])
                out["n_data_bytes"].append(len(raw))
                for i, c in enumerate("bgr"):
                    out[f"mean_{c}"].append(sum(px[i::3]) / n_px)
                out["frame0_row0_hex"].append(vid["frames"][0][: width * 3].hex())
            yield pd.DataFrame(out)

    out = blobs.mapInPandas(_decode, VIDEO_DECODE_SCHEMA)
    return out.select(
        "doc_id",
        "width",
        "height",
        "n_frames",
        "n_data_bytes",
        *[F.round(f"mean_{c}", 6).alias(f"mean_{c}") for c in "bgr"],
        "frame0_row0_hex",
    )


N_VIDEO_SAMPLES = 4

VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_idx", T.IntegerType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("top_row_hex", T.StringType()),
    ]
)


def sample_video_frames(
    docs: DataFrame,
    n_samples: int = N_VIDEO_SAMPLES,
    width: int = BMP_WIDTH,
    height: int = AVI_FRAME_H,
) -> DataFrame:
    """REAL video frame sampling — the decoded-frames counterpart of
    the byte-offset ``sample_frames``: wrap each blob into an AVI
    (``make_avi``), genuinely parse it (``decode_video``), and emit
    up to ``n_samples`` evenly strided frames as (sample_idx,
    frame_idx, top-row hex) rows — a 1→k fan-out mapInPandas, the
    keyframe-thumbnail stage of a video ingest pipeline (a codec
    decoder slots into decode_video unchanged). Emitting the TOP row
    of each sampled frame pins per-frame row reversal at every
    sampled position, not just frame 0. Hash-exact against
    plans/northstar.MULTIMODAL_FRAME_SAMPLE_SQL."""
    blobs = with_blob(docs).select("doc_id", "blob")
    row_len = width * 3

    def _sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in VIDEO_FRAME_SCHEMA.fields}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                vid = decode_video(make_avi(bytes(blob), width, height))
                nf = vid["n_frames"]
                step = max(nf // n_samples, 1)
                for i in range(n_samples):
                    idx = i * step
                    if idx >= nf:
                        break
                    out["doc_id"].append(doc_id)
                    out["sample_idx"].append(i)
                    out["frame_idx"].append(idx)
                    out["top_row_hex"].append(vid["frames"][idx][:row_len].hex())
            yield pd.DataFrame(out)

    return blobs.mapInPandas(_sample, VIDEO_FRAME_SCHEMA)


def decode_png_stats(docs: DataFrame, width: int = BMP_WIDTH) -> DataFrame:
    """The PNG face of the decode path — the only COMPRESSED
    container in the family: ``make_png`` deflate-compresses the
    payload behind cycling scanline filters (row % 5 covers
    None/Sub/Up/Average/Paeth), so every run of this query exercises
    the inflate + all five filter-reconstruction paths of
    ``_decode_png``, not just the header parsing. Because the filters
    are lossless the decoded pixels equal the zero-padded payload,
    and the DuckDB twin recomputes the channel means straight from
    payload byte positions exactly as for PPM
    (plans/northstar.MULTIMODAL_DECODE_PNG_SQL) — a filter or
    inflate bug anywhere would hash-mismatch."""
    return _decode_stats(docs, make_png, PNG_DECODE_SCHEMA, width)


# --------------------------------------------------- perceptual hash
# Pixel-space near-duplicate detection — the image leg of the dedup
# story (text shingles and embedding LSH live in operators/dedup and
# operators/similarity; this covers the modality where neither
# applies). dHash variant: the decoded image is reduced to an 8x8
# grid of grayscale block sums and each bit records the horizontal
# gradient between neighbouring blocks (cyclic within a grid row),
# giving a 64-bit signature that is invariant to brightness scaling
# and robust to small pixel edits. Entirely integer math over the
# REAL decoder's pixel output, so the signature is engine-exact and
# the registered query carries a DuckDB oracle
# (plans/northstar.MULTIMODAL_NEAR_DUP_PHASH_SQL).

PHASH_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType())]
    + [T.StructField(f"b{c}", T.IntegerType()) for c in range(4)]
)


def _dhash_chunks(px: list[int], width: int, height: int, channels: int) -> list[int]:
    """Four 16-bit chunks of the 64-bit gradient hash. Grid cell
    (i, j) collects rows r with (8r)//height == i and cols c with
    (8c)//width == j (empty bands when height < 8 contribute zero
    sums, hence zero bits — mirrored exactly by the SQL twin)."""
    sums = [[0] * 8 for _ in range(8)]
    for r in range(height):
        i = (8 * r) // height
        base = r * width * channels
        for c in range(width):
            j = (8 * c) // width
            o = base + c * channels
            sums[i][j] += px[o] + px[o + 1] + px[o + 2]
    chunks = []
    for b in range(4):
        v = 0
        for i in (2 * b, 2 * b + 1):
            for j in range(8):
                v = (v << 1) | (1 if sums[i][j] > sums[i][(j + 1) % 8] else 0)
        chunks.append(v)
    return chunks


def image_phash(docs: DataFrame, width: int = BMP_WIDTH) -> DataFrame:
    """(doc_id, b0..b3): the 64-bit dHash of each document's image as
    four 16-bit chunk values, computed from the REAL decode path
    (make_bmp → decode_image). One Arrow-batched mapInPandas; pixels
    never leave the executor, only the 4-int signature comes back —
    the 100 TB shape for a fleet-wide image fingerprint pass. Channel
    order is irrelevant (a gray block sums all three channels), so
    BGR/RGB sources hash identically."""
    blobs = with_blob(docs).select("doc_id", "blob")

    def _hash(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in PHASH_SCHEMA.fields}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                img = decode_image(make_bmp(bytes(blob), width))
                chunks = _dhash_chunks(
                    img["pixels"], img["width"], img["height"], img["channels"]
                )
                out["doc_id"].append(doc_id)
                for c in range(4):
                    out[f"b{c}"].append(chunks[c])
            yield pd.DataFrame(out)

    return blobs.mapInPandas(_hash, PHASH_SCHEMA)


def banded_hamming_pairs(
    sig: DataFrame,
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs within Hamming <= max_hamming of
    a 64-bit signature held as four 16-bit chunks (doc_id, b0..b3) —
    the shared candidate engine behind the image (``phash_near_dups``)
    and audio (``audio_near_dups``) fingerprint dedups. Pigeonhole
    banding: any pair within Hamming 3 must agree on at least one of
    the four chunks, so candidates come from four equi-joins on
    16-bit keys, NEVER an all-pairs comparison, then the exact
    bit_count(xor) filter verifies.

    ``max_bucket`` drops degenerate chunk buckets (e.g. the all-zero
    chunks every tiny blob shares) before the self-join — the max_df
    discipline of ngram_jaccard_pairs: a bucket with B docs would
    emit O(B²) candidates at scale. The oracles apply the identical
    cap; its recall cost (a pair agreeing ONLY on a capped chunk is
    missed) and the bounded-work guarantee are pinned by
    tests/test_skew.py on a pathological thousands-of-identical-
    chunks fixture. The signature frame is localCheckpoint-ed because
    it fans into three branches (keyed twice + the hot-bucket scan)
    and the mapInPandas decode behind it must run exactly once."""
    cand = _chunk_candidates(sig, max_bucket)
    hamming = F.expr(" + ".join(f"bit_count(ab{c} ^ bb{c})" for c in range(4)))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _chunk_candidates(sig: DataFrame, max_bucket: int) -> DataFrame:
    """The pigeonhole candidate stage of ``banded_hamming_pairs``,
    exposed so the skew test can count the pairs the equi-joins
    actually emit (Catalyst fuses the hamming filter into the join,
    so the fused plan's numOutputRows cannot observe the candidate
    volume the cap exists to bound)."""
    ph = sig.localCheckpoint()
    chunk_arr = F.array(
        *[
            F.struct(F.lit(c).alias("chunk"), F.col(f"b{c}").alias("key"))
            for c in range(4)
        ]
    )
    keyed = ph.select("doc_id", "b0", "b1", "b2", "b3", F.explode(chunk_arr).alias("ck")).select(
        "doc_id", "b0", "b1", "b2", "b3", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key")
    )
    hot = (
        keyed.groupBy("chunk", "key")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > max_bucket)
        .select("chunk", "key")
    )
    keyed = keyed.join(F.broadcast(hot), ["chunk", "key"], "left_anti")
    a = keyed.alias("a")
    b = keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *[F.col(f"a.b{c}").alias(f"ab{c}") for c in range(4)],
            *[F.col(f"b.b{c}").alias(f"bb{c}") for c in range(4)],
        )
        .distinct()
    )
    return cand


def phash_near_dups(
    docs: DataFrame,
    max_hamming: int = 3,
    width: int = BMP_WIDTH,
    max_bucket: int = 1000,
) -> DataFrame:
    """(doc_a, doc_b, hamming): image near-duplicate pairs by dHash
    Hamming distance <= max_hamming — the pixel-space twin of
    dedup.simhash_near_dups. Candidates come from
    ``banded_hamming_pairs``'s four 16-bit pigeonhole equi-joins,
    never an all-pairs comparison; the exact bit_count(xor) filter
    verifies, and the DuckDB oracle applies the identical bucket cap
    (plans/northstar.MULTIMODAL_NEAR_DUP_PHASH_SQL)."""
    return banded_hamming_pairs(image_phash(docs, width), max_hamming, max_bucket)


# ------------------------------------------------- audio fingerprint
# The AUDIO leg of the near-duplicate story, completing the modality
# triad (text shingles in operators/dedup, embeddings in
# operators/similarity, pixels in phash_near_dups above). The
# signature is a 64-band energy-gradient fingerprint in the spirit of
# Haitsma & Kalker, "A Highly Robust Audio Fingerprinting System"
# (ISMIR 2002): the decoded PCM stream is reduced to 64 contiguous
# time-band |amplitude| sums and each bit records the gradient
# between cyclically neighbouring bands — invariant to uniform volume
# scaling and local edits touch at most two bits per altered band.
# Entirely integer math over the REAL RIFF/WAV decoder's output, so
# the signature is engine-exact and the registered query carries a
# DuckDB oracle (plans/northstar.MULTIMODAL_NEAR_DUP_AUDIO_SQL).

AUDIO_FP_BANDS = 64


def _audio_fp_chunks(samples: list[int], ns: int) -> list[int]:
    """Four 16-bit chunks of the 64-bit band-gradient fingerprint.
    Band b collects samples i with (64*i)//ns == b (empty bands when
    ns < 64 contribute zero sums, hence zero bits — mirrored exactly
    by the SQL twin); bit b is the cyclic gradient sums[b] >
    sums[(b+1)%64], packed MSB-first 16 bits per chunk exactly like
    ``_dhash_chunks``."""
    sums = [0] * AUDIO_FP_BANDS
    for i, x in enumerate(samples):
        sums[(AUDIO_FP_BANDS * i) // ns] += abs(x)
    bits = [
        1 if sums[b] > sums[(b + 1) % AUDIO_FP_BANDS] else 0
        for b in range(AUDIO_FP_BANDS)
    ]
    chunks = []
    for c in range(4):
        v = 0
        for k in range(16):
            v = (v << 1) | bits[16 * c + k]
        chunks.append(v)
    return chunks


def audio_fingerprint(docs: DataFrame, sample_rate: int = WAV_SAMPLE_RATE) -> DataFrame:
    """(doc_id, b0..b3): the 64-bit band-energy-gradient fingerprint
    of each document's audio as four 16-bit chunk values, computed
    from the REAL decode path (make_wav → decode_audio, so the RIFF
    chunk walker runs on every blob). One Arrow-batched mapInPandas;
    PCM samples never leave the executor, only the 4-int signature
    comes back — the 100 TB shape for a fleet-wide audio fingerprint
    pass, identical to ``image_phash``'s."""
    blobs = with_blob(docs).select("doc_id", "blob")

    def _fp(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in PHASH_SCHEMA.fields}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                au = decode_audio(make_wav(bytes(blob), sample_rate))
                if au["n_channels"] != 1:
                    raise ValueError(
                        "audio_fingerprint is mono-only: time bands are "
                        f"per-channel concepts, got {au['n_channels']} channels"
                    )
                chunks = _audio_fp_chunks(au["samples"], au["n_samples"])
                out["doc_id"].append(doc_id)
                for c in range(4):
                    out[f"b{c}"].append(chunks[c])
            yield pd.DataFrame(out)

    return blobs.mapInPandas(_fp, PHASH_SCHEMA)


def audio_near_dups(
    docs: DataFrame,
    max_hamming: int = 3,
    sample_rate: int = WAV_SAMPLE_RATE,
    max_bucket: int = 1000,
) -> DataFrame:
    """(doc_a, doc_b, hamming): audio near-duplicate pairs by
    band-energy fingerprint Hamming distance <= max_hamming — the
    audio twin of ``phash_near_dups``, sharing its
    ``banded_hamming_pairs`` pigeonhole candidate engine (four 16-bit
    equi-joins + hot-bucket cap, never all-pairs). A single perturbed
    sample moves at most one band sum, flipping at most the two bits
    that compare that band to its neighbours, so genuinely similar
    recordings land within the Hamming budget (recall pinned by
    tests/test_multimodal.py on planted perturbations)."""
    return banded_hamming_pairs(
        audio_fingerprint(docs, sample_rate), max_hamming, max_bucket
    )


# ------------------------------------------------- video fingerprint
# The VIDEO leg of the fingerprint dedup family — with text shingles,
# embeddings, pixels (phash_near_dups) and PCM (audio_near_dups) this
# makes every stored modality near-dup-detectable. The signature is
# the TEMPORAL twin of the audio fingerprint: the decoded frame
# sequence is reduced to one luminance-proxy integer per frame (the
# frame's pixel-byte sum — order-invariant, so the SQL twin needs no
# row-reversal bookkeeping), frames collapse into 64 contiguous
# time bands, and each bit records the cyclic gradient between
# neighbouring band sums — _audio_fp_chunks verbatim, fed frame sums
# instead of |samples|. Re-encodes, uniform brightness scaling, and
# container-level differences leave the gradient signature intact;
# an edit localized to one band flips at most its two boundary bits.
# Spatial (within-frame) near-dup remains image_phash over
# sample_video_frames; this face captures the temporal structure.


def video_fingerprint(docs: DataFrame, width: int = 1, height: int = 1) -> DataFrame:
    """(doc_id, b0..b3): the 64-bit temporal band-gradient fingerprint
    of each document's video as four 16-bit chunks, computed from the
    REAL decode path (make_avi → decode_video, so the RIFF tree
    walker and bottom-up DIB reversal run on every blob). One
    Arrow-batched mapInPandas; frames never leave the executor, only
    the 4-int signature comes back — identical 100 TB shape to
    ``image_phash`` / ``audio_fingerprint``.

    A temporal signature needs MORE FRAMES than bands to be
    informative (the audio twin gets ns = n/2 samples for free); the
    fixture therefore wraps the few-hundred-byte test payloads as
    1×1-pixel videos — 4-byte stride-padded frames, so ~300 bytes
    give ~75 frames across the 64 bands. Real videos have thousands
    of frames and use the natural dimensions; the decoder path is
    identical either way. The stride pad byte each 1×1 frame carries
    is stripped by decode_video's row extraction — the SQL twin
    skips the same byte positions (p % 4 = 3)."""
    blobs = with_blob(docs).select("doc_id", "blob")

    def _fp(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in PHASH_SCHEMA.fields}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                vid = decode_video(make_avi(bytes(blob), width, height))
                frame_sums = [sum(f) for f in vid["frames"]]
                chunks = _audio_fp_chunks(frame_sums, vid["n_frames"])
                out["doc_id"].append(doc_id)
                for c in range(4):
                    out[f"b{c}"].append(chunks[c])
            yield pd.DataFrame(out)

    return blobs.mapInPandas(_fp, PHASH_SCHEMA)


def video_near_dups(
    docs: DataFrame,
    max_hamming: int = 3,
    width: int = 1,
    max_bucket: int = 1000,
) -> DataFrame:
    """(doc_a, doc_b, hamming): video near-duplicate pairs by temporal
    band-gradient fingerprint Hamming distance <= max_hamming —
    sharing ``banded_hamming_pairs``'s pigeonhole candidate engine
    (four 16-bit equi-joins + hot-bucket cap, never all-pairs). A
    perturbation confined to one frame moves exactly one band sum,
    flipping at most the two bits comparing that band to its
    neighbours (recall pinned by tests/test_multimodal.py)."""
    return banded_hamming_pairs(
        video_fingerprint(docs, width), max_hamming, max_bucket
    )


# --------------------------------------------------------- JPEG face
JPEG_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_data_bytes", T.IntegerType()),
        T.StructField("mean_gray", T.DoubleType()),
        T.StructField("row0_hex", T.StringType()),
    ]
)


def decode_jpeg_stats(docs: DataFrame) -> DataFrame:
    """The JPEG face of the real-decode path: wrap each blob's bytes
    into a REAL baseline JPEG (operators/jpeg.make_jpeg — one constant
    8×8 block per byte, genuine Annex-K Huffman entropy coding), run
    the GENERAL baseline decoder (markers, canonical Huffman, dequant,
    full IDCT — it does not know the blocks are constant), and emit
    per-doc stats: dims, gray mean, and the top pixel row's hex. The
    DC-exact fixture quantization makes the lossy-in-general pipeline
    byte-exact here, so the query carries the same byte-position
    DuckDB oracle shape as the BMP/PNG faces
    (plans/northstar.MULTIMODAL_DECODE_JPEG_SQL). Same 100 TB shape:
    one Arrow-batched mapInPandas, blobs never leave executors, means
    rounded JVM-side (HALF_UP discipline)."""
    from .jpeg import decode_jpeg, make_jpeg

    blobs = with_blob(docs).select("doc_id", "blob")

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in JPEG_DECODE_SCHEMA.fields}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                raw = bytes(blob)
                img = decode_jpeg(make_jpeg(raw))
                px = img["pixels"]
                out["doc_id"].append(doc_id)
                out["width"].append(img["width"])
                out["height"].append(img["height"])
                out["n_data_bytes"].append(len(raw))
                out["mean_gray"].append(sum(px) / len(px))
                out["row0_hex"].append(bytes(px[: img["width"]]).hex())
            yield pd.DataFrame(out)

    out = blobs.mapInPandas(_decode, JPEG_DECODE_SCHEMA)
    return out.select(
        "doc_id",
        "width",
        "height",
        "n_data_bytes",
        F.round("mean_gray", 6).alias("mean_gray"),
        "row0_hex",
    )


# ---------------------------------------------------------- GIF face
def decode_gif_stats(docs: DataFrame, width: int = BMP_WIDTH) -> DataFrame:
    """The GIF face of the real-decode path: wrap each blob's bytes
    into a REAL GIF89a (operators/gif.make_gif — 8-bit indices into a
    grayscale global color table behind genuine variable-width LZW
    with clear codes and width bumps), run the GENERAL decoder
    (header/LSD, color table, extension walking, sub-block
    reassembly, full LZW with the KwKwK case, palette expansion), and
    emit per-doc stats: dims, gray mean, and the top row's red
    channel hex. LZW is lossless, so the query carries the same
    byte-position DuckDB oracle shape as the BMP/PNG/JPEG faces
    (plans/northstar.MULTIMODAL_DECODE_GIF_SQL). Same 100 TB shape:
    one Arrow-batched mapInPandas, blobs never leave executors, means
    rounded JVM-side (HALF_UP discipline)."""
    from .gif import decode_gif, make_gif

    blobs = with_blob(docs).select("doc_id", "blob")

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in JPEG_DECODE_SCHEMA.fields}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                raw = bytes(blob)
                img = decode_gif(make_gif(raw, width))
                px = img["pixels"]
                out["doc_id"].append(doc_id)
                out["width"].append(img["width"])
                out["height"].append(img["height"])
                out["n_data_bytes"].append(len(raw))
                out["mean_gray"].append(sum(px) / len(px))
                out["row0_hex"].append(
                    bytes(px[3 * i] for i in range(img["width"])).hex()
                )
            yield pd.DataFrame(out)

    out = blobs.mapInPandas(_decode, JPEG_DECODE_SCHEMA)
    return out.select(
        "doc_id",
        "width",
        "height",
        "n_data_bytes",
        F.round("mean_gray", 6).alias("mean_gray"),
        "row0_hex",
    )
