"""Baseline JPEG (ITU-T T.81 sequential DCT) — pure-Python codec.

The last honestly-stubbed decode path (VERDICT r7 item 8): BMP/PPM/
PNG/WAV/AVI already have real parsers; JPEG genuinely needs entropy
coding + DCT, implemented here from the public spec with no codec
library:

- ``decode_jpeg``  : a GENERAL baseline decoder — marker parse (SOI/
  APPn/COM/DQT/DHT/DRI/SOF0/SOS/EOI), canonical Huffman table
  construction per Annex C, byte-stuffed entropy-coded segment with
  restart markers, DC prediction, run/size AC with ZRL/EOB, zig-zag
  + dequantization, separable float IDCT, sampling-factor block
  layout with chroma upsampling (4:4:4 and 4:2:0), YCbCr→RGB for
  3-component scans. Progressive / arithmetic / 12-bit modes raise.
- ``make_jpeg``    : the deterministic fixture synthesizer (the
  make_bmp/make_png pattern): each payload byte becomes one CONSTANT
  8×8 grayscale block. A constant block's FDCT is DC-only, and with
  the identity-friendly DC quant step used here the quantized DC is
  exactly recoverable — so decode(make_jpeg(payload)) reproduces the
  payload bytes EXACTLY even though the file passes through real
  Huffman entropy coding and the decoder runs its full general path
  (it does not know blocks are constant; it Huffman-decodes, dequants
  and IDCTs all 64 coefficients). That exactness is what lets the
  registered query carry a byte-position DuckDB oracle, the same
  shape as the BMP/PNG twins, despite JPEG being lossy in general.

Decoder rounding is deterministic: sample = clamp(floor(x + 128.5)),
never Python round() (banker's — the HALF_UP discipline note in
_decode_stats applies here too).

Reference parity note: the reference repo (MapReduce_CS416) has no
media path at all; this is north-star multimodal surface.
"""

from __future__ import annotations

import math
from itertools import count

# ---------------------------------------------------------------- tables
# zig-zag order: index i of the scan order -> (row, col) in the 8x8 block
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# Annex K.3 typical Huffman tables (code-length counts + symbol order).
# Used by the fixture encoder; the DECODER builds its tables from the
# DHT segments of whatever file it is handed.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Fixture quantization table: DC step 8 makes a constant block's DC
# coefficient (8·(v−128), range ±1024) quantize to exactly v−128 with
# zero rounding loss; AC steps are 16 (any table works for DC-only
# blocks — a non-trivial one keeps the dequant path honest).
FIXTURE_QUANT = [8] + [16] * 63

# IDCT basis: cos((2x+1)·u·π/16) with the C(u)=1/√2 normalization
_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)]
_CU = [1 / math.sqrt(2)] + [1.0] * 7


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per Annex C code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol — the decoder-side view."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


# ---------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad to a byte boundary
        return bytes(self.out)


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _dc_bits(v: int) -> tuple[int, int]:
    """JPEG signed-magnitude: category + raw bits (negative values
    stored as v − 1 in ``cat`` bits)."""
    cat = _category(v)
    return cat, (v if v >= 0 else v - 1 + (1 << cat)) & ((1 << cat) - 1)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


JPEG_BLOCKS_WIDE = 4  # fixture layout: 4 blocks = 32 px wide


def make_jpeg(
    payload: bytes,
    blocks_wide: int = JPEG_BLOCKS_WIDE,
    restart_interval: int = 0,
) -> bytes:
    """Wrap raw bytes into a REAL baseline JPEG: byte i becomes the
    constant value of 8×8 grayscale block i, blocks laid out
    ``blocks_wide`` per row (zero-padded to whole rows, min one
    block). DC-only blocks + the DC-exact quant table make the decode
    byte-exact; the bitstream itself is genuine DHT/DQT/SOF0/SOS with
    Annex K Huffman coding and byte stuffing. A nonzero
    ``restart_interval`` emits DRI + RST0-7 markers every N MCUs with
    the spec's predictor reset — the error-resync machinery real
    encoders produce."""
    n_blocks = max(len(payload), 1)
    rows = -(-n_blocks // blocks_wide)
    data = payload.ljust(rows * blocks_wide, b"\x00")
    width, height = blocks_wide * 8, rows * 8

    dqt = _seg(0xDB, bytes([0x00]) + bytes(FIXTURE_QUANT[i] for i in range(64)))
    sof = _seg(
        0xC0,
        bytes([8])  # precision
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])  # 1 component, id 1, 1x1 sampling, qtable 0
    )
    dht = _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)) + _seg(
        0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    )
    dri = _seg(0xDD, restart_interval.to_bytes(2, "big")) if restart_interval else b""
    sos_hdr = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    dc_codes = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    scan = bytearray()
    w = _BitWriter()
    pred = 0
    for i, b in enumerate(data):
        if restart_interval and i and i % restart_interval == 0:
            scan += w.flush()
            scan += bytes([0xFF, 0xD0 + ((i // restart_interval - 1) % 8)])
            w = _BitWriter()
            pred = 0
        dc = b - 128  # quantized DC = 8·(b−128) / 8
        diff = dc - pred
        pred = dc
        cat, bits = _dc_bits(diff)
        code, ln = dc_codes[cat]
        w.write(code, ln)
        if cat:
            w.write(bits, cat)
        code, ln = ac_codes[0x00]  # EOB: all 63 AC coefficients zero
        w.write(code, ln)
    scan += w.flush()

    return (
        b"\xff\xd8" + dqt + sof + dht + dri + sos_hdr + bytes(scan) + b"\xff\xd9"
    )


# ---------------------------------------------------------------- decoder
class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("entropy segment truncated")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1  # stuffed 0xFF
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} inside scan")
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def reset(self) -> None:
        self.acc = 0
        self.nbits = 0


def _extend(v: int, cat: int) -> int:
    """Annex F.2.2.1 sign extension of a ``cat``-bit magnitude."""
    return v if cat == 0 or v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def _idct_block(coef: list[int]) -> list[int]:
    """Separable 2-D inverse DCT + level shift, deterministic
    floor(x + 128.5) rounding, clamped to [0, 255]."""
    tmp = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        for u in range(8):
            s = 0.0
            for v in range(8):
                c = coef[v * 8 + u]
                if c:
                    s += _CU[v] * c * _COS[v][y]
            tmp[y][u] = s / 2
    out = []
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                t = tmp[y][u]
                if t:
                    s += _CU[u] * t * _COS[u][x]
            val = math.floor(s / 2 + 128.5)
            out.append(0 if val < 0 else 255 if val > 255 else val)
    return out


def _clamp8(x: float) -> int:
    v = math.floor(x + 0.5)
    return 0 if v < 0 else 255 if v > 255 else v


def decode_jpeg(data: bytes) -> dict:
    """General baseline sequential decode. Returns {"width", "height",
    "channels", "pixels"} — pixels row-major, interleaved channels
    (grayscale: 1 ch; color: RGB), cropped to the declared dims."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}): only "
                "baseline sequential DCT (SOF0) is implemented"
            )
        ln = int.from_bytes(data[pos : pos + 2], "big")
        seg = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                if prec:
                    raise NotImplementedError("16-bit quant tables")
                quant[tid] = list(seg[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                (huff_ac if cls else huff_dc)[tid] = _decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:  # SOF0
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit precision")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, sampling, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": sampling >> 4, "v": sampling & 0xF, "q": qid})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid] = (tabs >> 4, tabs & 0xF)
            pos += ln
            return _decode_scan(
                data, pos, frame, sel, quant, huff_dc, huff_ac, restart_interval
            )
        # APPn / COM / others: skip
        pos += ln
    raise ValueError("no SOS marker")


def _decode_scan(data, pos, frame, sel, quant, huff_dc, huff_ac, restart_interval):
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 (only 4:4:4 / 4:2:2 / 4:2:0)")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    pw = {}
    for c in comps:
        cw, ch = mcux * c["h"] * 8, mcuy * c["v"] * 8
        planes[c["id"]] = [0] * (cw * ch)
        pw[c["id"]] = cw

    r = _BitReader(data[:_scan_end(data, pos)])
    r.pos = pos
    pred = dict.fromkeys(planes, 0)
    mcu_seq = count()
    for my in range(mcuy):
        for mx in range(mcux):
            i = next(mcu_seq)
            if restart_interval and i and i % restart_interval == 0:
                _eat_rst(r)
                pred = dict.fromkeys(planes, 0)
            for c in comps:
                dct, act = sel[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = [0] * 64
                        cat = _huff_decode(r, huff_dc[dct])
                        diff = _extend(r.bits(cat), cat) if cat else 0
                        pred[c["id"]] += diff
                        q = quant[c["q"]]
                        coef[0] = pred[c["id"]] * q[0]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(r, huff_ac[act])
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zr, zc = ZIGZAG[k]
                            coef[zr * 8 + zc] = _extend(r.bits(size), size) * q[k]
                            k += 1
                        px = _idct_block(coef)
                        _blit(
                            planes[c["id"]], pw[c["id"]], px,
                            (mx * c["h"] + bx) * 8, (my * c["v"] + by) * 8,
                        )
    return _assemble(frame, planes, pw, hmax, vmax)


def _scan_end(data: bytes, pos: int) -> int:
    """End of the entropy-coded segment: the next marker that is not
    stuffing (FF00) or a restart (FFD0-FFD7)."""
    i = pos
    while i < len(data) - 1:
        if data[i] == 0xFF and data[i + 1] != 0x00 and not (0xD0 <= data[i + 1] <= 0xD7):
            return i
        i += 1
    return len(data)


def _eat_rst(r: _BitReader) -> None:
    r.reset()
    if r.data[r.pos] != 0xFF or not (0xD0 <= r.data[r.pos + 1] <= 0xD7):
        raise ValueError("expected restart marker")
    r.pos += 2


def _blit(plane: list[int], stride: int, block: list[int], x0: int, y0: int) -> None:
    for y in range(8):
        row = (y0 + y) * stride + x0
        plane[row : row + 8] = block[y * 8 : y * 8 + 8]


def _assemble(frame, planes, pw, hmax, vmax) -> dict:
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    if len(comps) == 1:
        cid = comps[0]["id"]
        stride = pw[cid]
        pixels = []
        for y in range(h):
            pixels.extend(planes[cid][y * stride : y * stride + w])
        return {"width": w, "height": h, "channels": 1, "pixels": pixels}
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    # YCbCr → RGB with nearest-neighbor chroma upsampling
    out = []
    y_c, cb_c, cr_c = comps[0], comps[1], comps[2]
    for y in range(h):
        for x in range(w):
            yy = planes[y_c["id"]][y * pw[y_c["id"]] + x]
            cbx = x * cb_c["h"] // hmax
            cby = y * cb_c["v"] // vmax
            cb = planes[cb_c["id"]][cby * pw[cb_c["id"]] + cbx] - 128
            crx = x * cr_c["h"] // hmax
            cry = y * cr_c["v"] // vmax
            cr = planes[cr_c["id"]][cry * pw[cr_c["id"]] + crx] - 128
            out.append(_clamp8(yy + 1.402 * cr))
            out.append(_clamp8(yy - 0.344136 * cb - 0.714136 * cr))
            out.append(_clamp8(yy + 1.772 * cb))
    return {"width": w, "height": h, "channels": 3, "pixels": out}
