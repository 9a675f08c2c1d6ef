"""GIF (GIF89a) — pure-Python codec with a REAL LZW entropy layer.

The dictionary-coding sibling of the deflate (PNG) and DCT+Huffman
(JPEG) paths: GIF's variable-width LZW is the one mainstream
compression family the decode surface did not yet exercise.
Implemented from the public GIF89a specification with no codec
library:

- ``decode_gif``  : a GENERAL decoder — header + logical screen
  descriptor, global color table, extension-block walking (a
  graphics-control extension sits in every fixture file, so a parser
  that does not walk 0x21 sub-block chains breaks), image
  descriptor, and a full variable-width LZW decoder: clear/EOI
  codes, per-code dictionary growth, the KwKwK (code == next_code)
  case, code width bumps in encoder lockstep, 12-bit cap, and
  dictionary resets. Indices expand through the color table to RGB
  (decode_image's pixel contract). Interlace and local color tables
  honestly raise.
- ``make_gif``    : the deterministic fixture synthesizer
  (make_bmp/make_png pattern): payload bytes become 8-bit indices
  into a 256-entry grayscale table (index i -> (i,i,i)), zero-padded
  to whole rows, then genuinely LZW-compressed (the encoder emits
  clear codes and grows code widths for real — repetitive payloads
  cross several width bumps). LZW is lossless, so
  decode(make_gif(p)) reproduces p byte-for-byte and the registered
  query carries the same byte-position DuckDB oracle shape as the
  other decode faces.

Width-bump off-by-one, pinned here because it is THE classic GIF
codec bug: the encoder emits a code and then assigns the next
dictionary slot, so at read time the decoder's assignment counter
lags the encoder's by exactly one. The encoder therefore widens
after `next_code > (1 << width)`, the decoder after
`next_code == (1 << width)` — tests/test_gif.py locks both against
hand-computed bit streams.

Reference parity note: the reference repo (MapReduce_CS416) has no
media path; this is north-star multimodal surface.
"""

from __future__ import annotations

GIF_WIDTH = 16
MIN_CODE_SIZE = 8  # 256-entry root dictionary = the byte alphabet
_MAX_WIDTH = 12
_TABLE_LIMIT = 1 << _MAX_WIDTH


class _BitWriter:
    """LSB-first bit packing (GIF's order: first code in the low bits
    of the first byte)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, width: int) -> int:
        v = 0
        for i in range(width):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("LZW stream truncated")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


def lzw_encode(data: bytes, mcs: int = MIN_CODE_SIZE) -> bytes:
    """GIF variable-width LZW: CLEAR, data codes, CLEAR on dictionary
    overflow, EOI. Emits the code for the current run BEFORE
    assigning the run+next-byte slot (the lockstep the decoder's
    lagging counter relies on)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bw = _BitWriter()
    width = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    bw.write(clear, width)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        bw.write(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code > (1 << width) and width < _MAX_WIDTH:
            width += 1
        if next_code == _TABLE_LIMIT:
            bw.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code, width = eoi + 1, mcs + 1
        w = bytes([byte])
    if w:
        bw.write(table[w], width)
    bw.write(eoi, width)
    return bw.flush()


def lzw_decode(data: bytes, mcs: int = MIN_CODE_SIZE) -> bytes:
    """The general decoder for ``lzw_encode``'s scheme — including
    streams this encoder would not produce (KwKwK self-references,
    deferred clears)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    br = _BitReader(data)
    out = bytearray()

    def reset() -> tuple[dict[int, bytes], int, int]:
        return {i: bytes([i]) for i in range(clear)}, eoi + 1, mcs + 1

    table, next_code, width = reset()
    prev: bytes | None = None
    while True:
        code = br.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code in table:
            s = table[code]
        elif code == next_code and prev is not None:
            s = prev + prev[:1]  # KwKwK: the not-yet-materialized slot
        else:
            raise ValueError(f"corrupt LZW stream: code {code} with next {next_code}")
        if prev is not None and next_code < _TABLE_LIMIT:
            table[next_code] = prev + s[:1]
            next_code += 1
            # decoder's counter lags the encoder's add by one code, so
            # the width bump fires one assignment earlier (== not >)
            if next_code == (1 << width) and width < _MAX_WIDTH:
                width += 1
        out += s
        prev = s


def _sub_blocks(data: bytes) -> bytes:
    """Split into <=255-byte length-prefixed sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def make_gif(payload: bytes, width: int = GIF_WIDTH) -> bytes:
    """Wrap raw bytes into a valid GIF89a: payload zero-padded to
    whole ``width``-pixel rows (min 1) of 8-bit indices into a
    256-entry grayscale global color table, REALLY LZW-compressed,
    with a graphics-control extension before the image so decoders
    must walk extension sub-block chains. Every payload byte is
    addressable as the red channel of one pixel."""
    height = max(-(-len(payload) // width), 1)
    idx = payload.ljust(width * height, b"\x00")
    gct = bytes(v for i in range(256) for v in (i, i, i))
    out = bytearray()
    out += b"GIF89a"
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0xF7, 0x00, 0x00])  # GCT present, 8-bit, 256 entries
    out += gct
    out += bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])  # GCE
    out += b"\x2c" + bytes(4) + width.to_bytes(2, "little") + height.to_bytes(2, "little") + b"\x00"
    out += bytes([MIN_CODE_SIZE])
    out += _sub_blocks(lzw_encode(idx))
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> dict:
    """Real GIF decode: header/LSD parse, global color table load,
    extension walking, image descriptor, sub-block reassembly, full
    LZW decode, palette expansion to RGB. Returns {"width",
    "height", "pixels"} with decode_image's flat-RGB contract.
    Interlaced images and local color tables raise."""
    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise NotImplementedError("unsupported image container (GIF87a/89a only)")
    width = int.from_bytes(payload[6:8], "little")
    height = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    pos = 13
    palette: list[tuple[int, int, int]] | None = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        raw = payload[pos : pos + 3 * n]
        palette = [(raw[3 * i], raw[3 * i + 1], raw[3 * i + 2]) for i in range(n)]
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-block chain
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        iw = int.from_bytes(payload[pos + 4 : pos + 6], "little")
        ih = int.from_bytes(payload[pos + 6 : pos + 8], "little")
        iflags = payload[pos + 8]
        pos += 9
        if iflags & 0x40:
            raise NotImplementedError("interlaced GIF needs row de-interleaving")
        if iflags & 0x80:
            raise NotImplementedError("local color tables not supported")
        if palette is None:
            raise ValueError("GIF image without any color table")
        mcs = payload[pos]
        pos += 1
        stream = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            stream += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = lzw_decode(bytes(stream), mcs)
        if len(idx) < iw * ih:
            raise ValueError("GIF frame truncated")
        px: list[int] = []
        for i in idx[: iw * ih]:
            if i >= len(palette):
                raise ValueError("palette index out of range")
            px.extend(palette[i])
        return {"width": iw, "height": ih, "pixels": px}
    raise ValueError("GIF carries no image descriptor")
