"""Pure numpy/stdlib baseline JPEG codec (ITU-T T.81 sequential DCT).

Makes the most common web-image format REALLY decodable in this
container (no PIL/libjpeg): a full baseline decoder — marker parse,
DQT/DHT/SOF0/SOS/DRI, Huffman entropy decode with byte-unstuffing and
restart markers, dequantize, float IDCT, chroma upsample, YCbCr→RGB —
plus a matching encoder (4:4:4 or 4:2:0, standard Annex-K tables,
optional restart intervals) used by the round-trip tests and fixture
generation.

Scope: BASELINE sequential (SOF0), 8-bit, 1 or 3 components — the
format of the overwhelming majority of JFIF web images. Progressive (SOF2), arithmetic coding
and 12-bit are out of scope and raise ``ValueError``.

Everything here derives from the public T.81 spec (zigzag order,
Annex K quantization + Huffman tables, EXTEND/RECEIVE procedures) and
the JFIF YCbCr matrix. The IDCT is the exact orthonormal float
transform, not a fast integer approximation, so decode output is
deterministic across platforms.

Reference parity note: the reference crawler ships page images to PIL
(newspaperlite/images.py) — this module is the env-blocked stand-in
that keeps the multimodal decode stage REAL for jpeg payloads.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecguard import MAX_DECODE_PIXELS, typed_decode

# -- shared constants (ITU-T T.81 / JFIF, public) ---------------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1 / K.2 quantization tables (quality-50 base), natural order
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8-point DCT matrix: T[u, x] = c(u)/2 * cos((2x+1)uπ/16)
_T = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _T[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)
del _u, _x, _c


def _fdct(block: np.ndarray) -> np.ndarray:
    return _T @ block @ _T.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _T.T @ coef @ _T


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# -- Huffman ----------------------------------------------------------------

def _build_codes(bits, huffval):
    """Canonical (T.81 Annex C) code assignment: {symbol: (code, len)}."""
    codes, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_map(bits, huffval):
    """{(length, code): symbol} for the incremental decoder."""
    return {(ln, code): sym
            for sym, (code, ln) in _build_codes(bits, huffval).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)   # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self):
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # 1-fill

    def raw_marker(self, byte2: int):
        self.out += bytes([0xFF, byte2])


class _BitReader:
    """MSB-first scan-data reader: unstuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated scan data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2          # stuffed FF
            else:
                raise ValueError(f"marker 0xFF{nxt:02X} inside scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, dmap) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = dmap.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def restart(self, expect: int):
        """Byte-align and consume the RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if d[self.pos] != 0xFF or d[self.pos + 1] != 0xD0 + expect:
            raise ValueError(
                f"expected RST{expect} at offset {self.pos}, got "
                f"{d[self.pos:self.pos + 2]!r}")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _bitlen(v: int) -> int:
    return int(v).bit_length()


# -- encoder ----------------------------------------------------------------

def _encode_block(w: _BitWriter, coef: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    """Huffman-encode one quantized 8×8 block (natural order in);
    returns the new DC predictor."""
    zz = coef.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    t = _bitlen(abs(diff))
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, ln = ac_codes[0x00]      # EOB
                w.write(code, ln)
                break
            run += 1
            if run == 16:
                code, ln = ac_codes[0xF0]      # ZRL
                w.write(code, ln)
                run = 0
            continue
        s = _bitlen(abs(v))
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return dc


def _quantize_planes(px: np.ndarray, subsample: bool):
    """Forward path shared by encode_jpeg: returns per-component
    (quantized-coefficient arrays, padded plane dims)."""
    h, w, _ = px.shape
    ycc = _rgb_to_ycbcr(px)
    if subsample:
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    else:
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = []
    for ci in range(3):
        p = np.empty((ph, pw))
        p[:h, :w] = ycc[..., ci]
        p[h:, :w] = p[h - 1: h, :w]        # edge-replicate padding
        p[:, w:] = p[:, w - 1: w]
        if subsample and ci > 0:
            p = (p[0::2, 0::2] + p[0::2, 1::2]
                 + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
        planes.append(p)
    quants = []
    for ci, p in enumerate(planes):
        qt = QT_LUMA if ci == 0 else QT_CHROMA
        qt8 = qt.reshape(8, 8).astype(np.float64)
        bh, bw = p.shape[0] // 8, p.shape[1] // 8
        blocks = (p - 128.0).reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        coefs = np.einsum("ux,ijxy,vy->ijuv", _T, blocks, _T)
        quants.append(np.round(coefs / qt8).astype(np.int64))
    return quants


def encode_jpeg(px: np.ndarray, *, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) RGB uint8 → baseline JFIF bytes. ``subsample=True``
    emits 4:2:0 (exercises the decoder's upsample path), else 4:4:4.
    ``restart_interval`` emits DRI + RSTn markers every N MCUs."""
    px = np.asarray(px, dtype=np.uint8)
    h, w, _ = px.shape
    quants = _quantize_planes(px, subsample)

    out = bytearray(b"\xff\xd8")                       # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    for tid, qt in ((0, QT_LUMA), (1, QT_CHROMA)):     # DQT (zigzag order)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(qt[z]) for z in ZIGZAG)
    sampling = (0x22, 0x11, 0x11) if subsample else (0x11, 0x11, 0x11)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)   # SOF0
    for cid in range(3):
        out += bytes([cid + 1, sampling[cid], 0 if cid == 0 else 1])
    for tc_th, (bits, vals) in ((0x00, DC_LUMA), (0x01, DC_CHROMA),
                                (0x10, AC_LUMA), (0x11, AC_CHROMA)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)     # SOS
    for cid in range(3):
        out += bytes([cid + 1, 0x00 if cid == 0 else 0x11])
    out += bytes([0, 63, 0])

    dc_l = _build_codes(*DC_LUMA)
    dc_c = _build_codes(*DC_CHROMA)
    ac_l = _build_codes(*AC_LUMA)
    ac_c = _build_codes(*AC_CHROMA)
    wtr = _BitWriter()
    preds = [0, 0, 0]
    hs = [s >> 4 for s in sampling]
    vs = [s & 15 for s in sampling]
    mcus_x = quants[0].shape[1] // hs[0]
    mcus_y = quants[0].shape[0] // vs[0]
    rst, since = 0, 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since == restart_interval:
                wtr.pad_to_byte()
                wtr.raw_marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
                since = 0
            for ci in range(3):
                dc = dc_l if ci == 0 else dc_c
                ac = ac_l if ci == 0 else ac_c
                for by in range(vs[ci]):
                    for bx in range(hs[ci]):
                        blk = quants[ci][my * vs[ci] + by,
                                         mx * hs[ci] + bx]
                        preds[ci] = _encode_block(
                            wtr, blk, preds[ci], dc, ac)
            since += 1
    wtr.pad_to_byte()
    out += wtr.out
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)


def expected_decode(px: np.ndarray, *, subsample: bool = False) -> np.ndarray:
    """The mathematically expected decoder output for
    ``encode_jpeg(px, subsample=...)``: dequantize + IDCT + upsample +
    color-convert the encoder's own quantized coefficients. The entropy
    layer (Huffman/zigzag/stuffing/restarts) is LOSSLESS, so a correct
    decoder must reproduce this array bit-for-bit — used by the
    round-trip tests (the transform constants are shared; the decoder's
    bitstream path is fully independent)."""
    px = np.asarray(px, dtype=np.uint8)
    h, w, _ = px.shape
    quants = _quantize_planes(px, subsample)
    planes = []
    for ci, q in enumerate(quants):
        qt8 = (QT_LUMA if ci == 0 else QT_CHROMA).reshape(8, 8)
        spatial = np.einsum("xu,ijuv,vy->ijxy", _T.T, q * qt8, _T)
        bh, bw = q.shape[0], q.shape[1]
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128.0
        if subsample and ci > 0:
            plane = plane.repeat(2, axis=0).repeat(2, axis=1)
        planes.append(plane[:h, :w])
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])


# -- decoder ----------------------------------------------------------------

@typed_decode("jpeg")
def decode_jpeg(payload: bytes) -> dict:
    """Baseline JFIF bytes → {width, height, pixels: uint8 (h, w, 3) RGB
    (grayscale replicated to 3 channels)}. Raises ValueError on
    progressive/arithmetic/12-bit streams and on truncated/corrupt
    input."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error) as ex:
        raise ValueError(f"truncated or corrupt JPEG stream: {ex}") from ex


def _ac_first(rdr: _BitReader, dmap, blk, k: int, se: int, al: int,
              eobrun: int) -> int:
    """Initial AC scan for one block's band [k..se] (T.81 G.1.2.3; with
    al=0 and se=63 this IS the baseline AC decoder). Returns the
    end-of-band run remaining for subsequent blocks."""
    if eobrun > 0:
        return eobrun - 1
    while k <= se:
        rs = rdr.decode(dmap)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16                       # ZRL
                continue
            eobrun = (1 << r) - 1             # EOBn
            if r:
                eobrun += rdr.receive(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC index overrun")
        blk[k] = _extend(rdr.receive(s), s) << al
        k += 1
    return 0


def _ac_refine(rdr: _BitReader, dmap, blk, k: int, se: int, al: int,
               eobrun: int) -> int:
    """Successive-approximation AC refinement (T.81 G.1.2.3): new
    coefficients arrive as ±1<<al; already-nonzero coefficients receive
    one correction bit whenever the scan passes over them."""
    p1, m1 = 1 << al, -1 << al

    def correct(v: int) -> int:
        # append the correction bit if this history coefficient hasn't
        # been refined at this bit position yet
        if rdr.read_bit() and (v & p1) == 0:
            return v + (p1 if v >= 0 else m1)
        return v

    if eobrun == 0:
        while k <= se:
            rs = rdr.decode(dmap)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r           # EOBn (this block included)
                    if r:
                        eobrun += rdr.receive(r)
                    break
                # r == 15: a run of 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("bad AC-refine symbol")
                val = p1 if rdr.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    blk[k] = correct(int(blk[k]))
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:                        # trailing correction bits
            if blk[k] != 0:
                blk[k] = correct(int(blk[k]))
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(d: bytes, pos: int, comps, scomps, ss: int, se: int,
                 ah: int, al: int, dmaps, restart_interval: int,
                 coefs, dims) -> int:
    """Decode one entropy-coded scan into the zigzag-order coefficient
    arrays. Handles interleaved (multi-component MCU order) and
    non-interleaved (single-component block raster) scans, restart
    markers, DC first/refine and AC first/refine — the superset that
    covers baseline (single scan, ss=0 se=63 ah=al=0) and progressive.
    Returns the byte offset of the next marker."""
    rdr = _BitReader(d, pos)
    idx = {c[0]: i for i, c in enumerate(comps)}
    preds = {idx[cid]: 0 for cid, _, _ in scomps}
    eobrun = 0
    rst, since = 0, 0

    def unit_iter():
        if len(scomps) > 1:                   # interleaved: MCU order
            for my in range(dims["mcus_y"]):
                for mx in range(dims["mcus_x"]):
                    unit = []
                    for cid, td, ta in scomps:
                        ci = idx[cid]
                        _, ch, cv, _ = comps[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                unit.append((ci, td, ta,
                                             my * cv + by, mx * ch + bx))
                    yield unit
        else:                                 # single comp: block raster
            cid, td, ta = scomps[0]
            ci = idx[cid]
            nbr, nbc = dims["nblocks"][ci]
            for r in range(nbr):
                for c in range(nbc):
                    yield [(ci, td, ta, r, c)]

    for unit in unit_iter():
        if restart_interval and since == restart_interval:
            rdr.restart(rst)
            rst = (rst + 1) % 8
            preds = {k: 0 for k in preds}
            eobrun = 0
            since = 0
        for ci, td, ta, br, bc in unit:
            blk = coefs[ci][br, bc]
            k = ss
            if ss == 0:                       # DC band
                if ah == 0:
                    t = rdr.decode(dmaps[td])
                    preds[ci] += _extend(rdr.receive(t), t)
                    blk[0] = preds[ci] << al
                elif rdr.read_bit():          # DC refinement: one bit
                    blk[0] |= 1 << al
                if se == 0:                   # progressive DC-only scan
                    continue
                k = 1
            ac_map = dmaps[0x10 | ta]
            if ah == 0:
                eobrun = _ac_first(rdr, ac_map, blk, k, se, al, eobrun)
            else:
                eobrun = _ac_refine(rdr, ac_map, blk, k, se, al, eobrun)
        since += 1

    p = rdr.pos                               # resync to the next marker
    while p + 1 < len(d) and not (d[p] == 0xFF and d[p + 1] != 0x00):
        p += 1
    return p


def _decode_jpeg(payload: bytes) -> dict:
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dmaps: dict[int, dict] = {}
    comps = None                     # list of (cid, h, v, tq)
    height = width = 0
    restart_interval = 0
    coefs = None                     # per-comp (brows, bcols, 64) zigzag
    dims: dict = {}
    while pos < len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        m = d[pos + 1]
        pos += 2
        if m == 0xD9:                                   # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:           # TEM/RSTn: no body
            continue
        seg_len = struct.unpack_from(">H", d, pos)[0]
        body = d[pos + 2: pos + seg_len]
        pos += seg_len
        if m == 0xDB:                                   # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                o += 1
                if pq == 0:
                    vals = np.frombuffer(body, np.uint8, 64, o
                                         ).astype(np.int64)
                    o += 64
                else:
                    vals = np.frombuffer(body, ">u2", 64, o
                                         ).astype(np.int64)
                    o += 128
                nat = np.empty(64, np.int64)
                nat[ZIGZAG] = vals                      # de-zigzag
                qts[tq] = nat.reshape(8, 8)
        elif m == 0xC4:                                 # DHT
            o = 0
            while o < len(body):
                tc_th = body[o]
                bits = list(body[o + 1: o + 17])
                n = sum(bits)
                vals = list(body[o + 17: o + 17 + n])
                dmaps[tc_th] = _build_decode_map(bits, vals)
                o += 17 + n
        elif m in (0xC0, 0xC1, 0xC2):      # SOF0/1 baseline, SOF2 progressive
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            height, width = struct.unpack_from(">HH", body, 1)
            if height * width > MAX_DECODE_PIXELS:
                # the coefficient arrays AND the per-MCU decode loop
                # scale with the claimed dims, not the payload size
                raise ValueError(
                    f"JPEG {width}x{height} exceeds decode cap "
                    f"({MAX_DECODE_PIXELS} pixels)")
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i: 9 + 3 * i]
                ch, cv = hv >> 4, hv & 15
                # T.81 B.2.2: Hi/Vi in 1..4 — 0 would divide-by-zero
                # in the sampling-grid math on corrupted streams
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError(
                        f"invalid sampling factors {ch}x{cv} "
                        f"for component {cid}")
                comps.append((cid, ch, cv, tq))
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF marker 0xFF{m:02X}); "
                "baseline sequential and progressive DCT are implemented")
        elif m == 0xDD:                                 # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif m == 0xDA:                                 # SOS
            if comps is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scomps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scomps.append((cs, tt >> 4, tt & 15))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 15
            if coefs is None:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                dims = {
                    "mcus_x": -(-width // (8 * hmax)),
                    "mcus_y": -(-height // (8 * vmax)),
                    # non-interleaved block grid per comp (T.81 A.1.1:
                    # ceil of the sampling-scaled size, NOT the padded
                    # MCU grid)
                    "nblocks": [
                        (-(-(-(-height * cv // vmax)) // 8),
                         -(-(-(-width * ch // hmax)) // 8))
                        for _, ch, cv, _ in comps],
                }
                coefs = [np.zeros((dims["mcus_y"] * cv,
                                   dims["mcus_x"] * ch, 64), np.int64)
                         for _, ch, cv, _ in comps]
            pos = _decode_scan(d, pos, comps, scomps, ss, se, ah, al,
                               dmaps, restart_interval, coefs, dims)
        # APPn / COM / DNL / others: skipped
    if comps is None or coefs is None:
        raise ValueError("missing SOF/SOS segment")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        arr = coefs[ci]
        brows, bcols = arr.shape[0], arr.shape[1]
        nat = np.empty_like(arr)
        nat[..., ZIGZAG] = arr                          # de-zigzag
        blocks = nat.reshape(brows, bcols, 8, 8) * qts[tq]
        spatial = np.einsum("xu,rcuv,vy->rcxy", _T.T, blocks, _T) + 128.0
        p = spatial.transpose(0, 2, 1, 3).reshape(brows * 8, bcols * 8)
        if ch != hmax or cv != vmax:
            p = p.repeat(vmax // cv, axis=0).repeat(hmax // ch, axis=1)
        full.append(p[:height, :width])
    if len(comps) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        px = np.stack([g, g, g], axis=-1)
    else:
        px = _ycbcr_to_rgb(full[0], full[1], full[2])
    return {"width": width, "height": height, "pixels": px}
