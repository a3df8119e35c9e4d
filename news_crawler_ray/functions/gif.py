"""Pure stdlib+numpy GIF decoder (GIF87a/89a).

GIF's only compression is LZW with variable code width, implementable
in a page of Python — so animated-web-image decode is REAL here too:
header + logical screen descriptor, global/local color tables,
graphic-control extensions (transparency), interlaced index layout,
and per-frame LZW index streams. ``decode_gif`` returns the FIRST
frame composited to RGB (transparent pixels over white, matching the
other decoders' alpha policy) plus the real frame count; ``frames``
yields every frame's raw palette-index array, which is what
``multimodal.FrameSampleStage`` hashes for its real path.

Full animation compositing (disposal methods, partial-frame deltas
onto a canvas) is out of scope — frame extraction is per-frame
independent, which is exactly the sampling stage's contract.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecguard import MAX_DECODE_PIXELS as _MAX_FRAME_PIXELS
from .codecguard import typed_decode


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> list[int]:
    """GIF LZW: LSB-first bitstream, growing code width, 12-bit cap."""
    # Spec range is 2..8 (palette bits); ≤11 keeps the max code width
    # at the 12-bit cap. Anything larger is corruption — and would
    # allocate a 2^mcs-entry table below (mcs=60 ⇒ exabytes) before
    # any stream byte is even read.
    if not 1 <= min_code_size <= 11:
        raise ValueError(
            f"GIF LZW min code size out of range: {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    width = min_code_size + 1
    acc = nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [[i] for i in range(clear)] + [[], []]
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + [entry[0]])
            else:                       # the KwKwK case
                entry = prev + [prev[0]]
                table.append(entry)
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return out
    return out


# interlaced GIF row order: 4 passes
_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _PASSES:
        for y in range(start, h, step):
            out[y] = idx[src]
            src += 1
    return out


@typed_decode("gif")
def frames(payload: bytes):
    """Yield per-frame dicts: {x, y, w, h, indices: uint8 (h, w),
    palette: (n,3) uint8, transparent: int|None, interlaced: bool}."""
    d = payload
    if d[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", d, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(d, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    transparent = None
    while pos < len(d):
        b = d[pos]
        pos += 1
        if b == 0x3B:                             # trailer
            return
        if b == 0x21:                             # extension
            label = d[pos]
            pos += 1
            if label == 0xF9:                     # graphic control
                size = d[pos]
                gflags = d[pos + 1]
                tidx = d[pos + 4]
                transparent = tidx if gflags & 1 else None
                pos += 1 + size
            while d[pos] != 0:                    # skip sub-blocks
                pos += 1 + d[pos]
            pos += 1
        elif b == 0x2C:                           # image descriptor
            x, y, w, h, iflags = struct.unpack_from("<HHHHB", d, pos)
            pos += 9
            pal = gct
            if iflags & 0x80:                     # local color table
                n = 2 << (iflags & 7)
                pal = np.frombuffer(d, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF frame without any color table")
            if w * h > _MAX_FRAME_PIXELS:
                raise ValueError(
                    f"GIF frame {w}x{h} exceeds decode cap "
                    f"({_MAX_FRAME_PIXELS} pixels)")
            mcs = d[pos]
            pos += 1
            chunks = bytearray()
            while d[pos] != 0:
                ln = d[pos]
                chunks += d[pos + 1: pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(mcs, bytes(chunks), w * h)
            if len(idx) < w * h:
                raise ValueError("truncated GIF LZW stream")
            arr = np.array(idx[: w * h], np.uint16).reshape(h, w)
            if arr.max() >= len(pal):
                raise ValueError("GIF index out of palette range")
            arr = arr.astype(np.uint8)
            interlaced = bool(iflags & 0x40)
            if interlaced:
                arr = _deinterlace(arr)
            yield {"x": x, "y": y, "w": w, "h": h, "indices": arr,
                   "palette": pal, "transparent": transparent,
                   "interlaced": interlaced,
                   "screen": (sw, sh)}
            transparent = None
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X}")


@typed_decode("gif")
def decode_gif(payload: bytes) -> dict:
    """GIF bytes → {width, height, pixels: uint8 (h, w, 3) RGB of the
    FIRST frame (transparency over white), n_frames: real frame count}."""
    try:
        first = None
        n = 0
        for fr in frames(payload):
            if first is None:
                first = fr
            n += 1
        if first is None:
            raise ValueError("GIF with no image frames")
    except (IndexError, struct.error) as ex:
        raise ValueError(f"truncated or corrupt GIF stream: {ex}") from ex
    pal = first["palette"].astype(np.float64)
    rgb = pal[first["indices"]]
    if first["transparent"] is not None:
        mask = first["indices"] == first["transparent"]
        rgb[mask] = 255.0
    return {"width": first["w"], "height": first["h"],
            "pixels": rgb.astype(np.uint8), "n_frames": n}


def encode_gif(frames_px: list, palette: np.ndarray) -> bytes:
    """Minimal GIF89a encoder for round-trip fixtures: each element of
    ``frames_px`` is an (h, w) uint8 palette-index array; one global
    color table. LZW layer uses the classic fixed-width trick (a CLEAR
    code before the table could outgrow the initial width), which every
    conformant decoder accepts."""
    pal = np.asarray(palette, np.uint8)
    n = len(pal)
    bits = max(2, int(n - 1).bit_length())
    size = 1 << bits
    h0, w0 = frames_px[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w0, h0, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes() + b"\x00" * ((size - n) * 3)

    clear, end = size, size + 1
    width = bits + 1
    # emit a CLEAR every `room` codes so the decoder's table never
    # forces a width increase
    room = (1 << width) - clear - 2
    for fr in frames_px:
        fh, fw = fr.shape
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, fw, fh, 0)
        out += bytes([bits])
        acc = nbits = 0
        body = bytearray()

        def emit(code):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                body.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        emit(clear)
        for i, v in enumerate(fr.reshape(-1).tolist()):
            if i and i % room == 0:
                emit(clear)
            emit(v)
        emit(end)
        if nbits:
            body.append(acc & 0xFF)
        for off in range(0, len(body), 255):
            chunk = body[off: off + 255]
            out += bytes([len(chunk)]) + bytes(chunk)
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
