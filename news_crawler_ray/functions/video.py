"""Pure-stdlib/numpy video codecs: AVI (RIFF container, MJPEG or
uncompressed-DIB video streams) and YUV4MPEG2 (Y4M, raw planar YUV).

Closes the last env-blocked media gap (BASELINE.md round-4: "only
video decode remains faked"): the container layer is fully parsed —
headers, stream format, frame walk, idx1 — and per-frame pixel decode
is REAL. MJPEG frames decode through the repo's own T.81 JPEG decoder
(functions/jpeg.py); DIB frames are raw bottom-up BGR (the BMP pixel
layout); Y4M frames are raw planar YUV converted to RGB with
limited-range BT.601 math. Matching encoders exist for round-trip
goldens: DIB-AVI and Y4M are raw containers, so
``frames(encode(frames))`` is bit-exact; MJPEG round-trips bit-exactly
against :func:`jpeg.expected_decode` (the entropy layer is lossless).

The reference treats video as opaque payloads handed to a browser
(reference crawling_tools/crawler.py — it never decodes video); this
module serves the training-data suite's multimodal plumbing
(SURVEY.md §2.11): FrameSampleStage real frame extraction and
MediaDecodeStage real metadata for ``media_type="video"`` rows.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecguard import typed_decode

__all__ = [
    "encode_y4m", "decode_y4m", "y4m_frames",
    "encode_avi", "decode_avi", "avi_frames",
    "rgb_to_yuv420", "yuv_to_rgb",
]


# ---------------------------------------------------------------------------
# BT.601 limited-range color math (the Y4M convention)
# ---------------------------------------------------------------------------

def rgb_to_yuv420(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h, w, 3) RGB uint8 → (Y, U, V) uint8 planes, 4:2:0 chroma
    (box-filtered 2x2), limited-range BT.601. h and w must be even."""
    px = np.asarray(px, dtype=np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 16.0 + (65.738 * r + 129.057 * g + 25.064 * b) / 256.0
    u = 128.0 + (-37.945 * r - 74.494 * g + 112.439 * b) / 256.0
    v = 128.0 + (112.439 * r - 94.154 * g - 18.285 * b) / 256.0
    # 2x2 box filter for 4:2:0 chroma siting
    u = (u[0::2, 0::2] + u[0::2, 1::2] + u[1::2, 0::2] + u[1::2, 1::2]) / 4.0
    v = (v[0::2, 0::2] + v[0::2, 1::2] + v[1::2, 0::2] + v[1::2, 1::2]) / 4.0
    to8 = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)  # noqa: E731
    return to8(y), to8(u), to8(v)


def yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """(Y, U, V) uint8 planes (chroma at any 2^k subsample of luma,
    nearest-neighbor upsampled) → (h, w, 3) RGB uint8, limited-range
    BT.601 inverse."""
    y = np.asarray(y, dtype=np.float64)
    h, w = y.shape
    planes = []
    for c in (u, v):
        c = np.asarray(c, dtype=np.float64)
        if c.shape != (h, w):
            c = c.repeat(h // c.shape[0], axis=0).repeat(
                w // c.shape[1], axis=1)[:h, :w]
        planes.append(c)
    u, v = planes
    yy = (y - 16.0) * (255.0 / 219.0)
    cb, cr = u - 128.0, v - 128.0
    r = yy + 1.596027 * cr
    g = yy - 0.391762 * cb - 0.812968 * cr
    b = yy + 2.017232 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                   255).astype(np.uint8)


# ---------------------------------------------------------------------------
# YUV4MPEG2
# ---------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"

# colorspace tag → (chroma_x_shift, chroma_y_shift); C420's jpeg/paldv/
# mpeg2 siting variants share the plane LAYOUT (siting only matters to
# a resampling filter, which nearest-neighbor upsample ignores)
_Y4M_CS = {"C420": (1, 1), "C420jpeg": (1, 1), "C420paldv": (1, 1),
           "C420mpeg2": (1, 1), "C422": (1, 0), "C444": (0, 0),
           "Cmono": None}


def encode_y4m(frames_yuv: list, width: int, height: int, *,
               fps: tuple[int, int] = (25, 1),
               colorspace: str = "C420") -> bytes:
    """List of (Y, U, V) uint8 plane tuples (U=V=None for Cmono) →
    Y4M bytes. Raw container: decode(encode(x)) is bit-exact."""
    if colorspace not in _Y4M_CS:
        raise ValueError(f"unsupported colorspace {colorspace}")
    out = bytearray(b"%s W%d H%d F%d:%d Ip A1:1 %s\n"
                    % (_Y4M_MAGIC, width, height, fps[0], fps[1],
                       colorspace.encode()))
    for planes in frames_yuv:
        out += b"FRAME\n"
        y, u, v = (planes if isinstance(planes, tuple)
                   else (planes, None, None))
        out += np.ascontiguousarray(y, dtype=np.uint8).tobytes()
        if _Y4M_CS[colorspace] is not None:
            out += np.ascontiguousarray(u, dtype=np.uint8).tobytes()
            out += np.ascontiguousarray(v, dtype=np.uint8).tobytes()
    return bytes(out)


def _y4m_header(payload: bytes) -> dict:
    nl = payload.index(b"\n")
    toks = payload[:nl].split(b" ")
    if toks[0] != _Y4M_MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    meta = {"fps_num": 25, "fps_den": 1, "colorspace": "C420",
            "_data_off": nl + 1}
    for tok in toks[1:]:
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:].decode()
        if tag == "W":
            meta["width"] = int(val)
        elif tag == "H":
            meta["height"] = int(val)
        elif tag == "F":
            num, den = val.split(":")
            meta["fps_num"], meta["fps_den"] = int(num), int(den)
        elif tag == "C":
            meta["colorspace"] = tok.decode()
    if "width" not in meta or "height" not in meta:
        raise ValueError("Y4M header missing W/H")
    if meta["colorspace"] not in _Y4M_CS:
        raise ValueError(f"unsupported colorspace {meta['colorspace']}")
    w, h, cs = meta["width"], meta["height"], meta["colorspace"]
    shifts = _Y4M_CS[cs]
    meta["_frame_bytes"] = w * h + (
        0 if shifts is None
        else 2 * ((w >> shifts[0]) * (h >> shifts[1])))
    return meta


@typed_decode("y4m")
def decode_y4m(payload: bytes) -> dict:
    """Y4M bytes → {width, height, fps_num, fps_den, colorspace,
    n_frames} (container walk; per-frame pixels via
    :func:`y4m_frames`)."""
    meta = _y4m_header(payload)
    pos, n = meta.pop("_data_off"), 0
    fb = meta.pop("_frame_bytes")
    while pos < len(payload):
        nl = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        pos = nl + 1 + fb
        if pos > len(payload):
            raise ValueError("truncated Y4M frame")
        n += 1
    meta["n_frames"] = n
    return meta


@typed_decode("y4m")
def y4m_frames(payload: bytes):
    """Yield per-frame dicts {frame_idx, y, u, v, rgb} — raw planes
    plus the BT.601 RGB conversion (u/v None and rgb grayscale-
    replicated for Cmono)."""
    meta = _y4m_header(payload)
    w, h = meta["width"], meta["height"]
    shifts = _Y4M_CS[meta["colorspace"]]
    pos, idx = meta["_data_off"], 0
    while pos < len(payload):
        nl = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        pos = nl + 1
        y = np.frombuffer(payload, np.uint8, w * h, pos).reshape(h, w)
        pos += w * h
        if shifts is None:
            u = v = None
            rgb = np.repeat(y[..., None], 3, axis=-1)
        else:
            cw, ch = w >> shifts[0], h >> shifts[1]
            u = np.frombuffer(payload, np.uint8, cw * ch,
                              pos).reshape(ch, cw)
            pos += cw * ch
            v = np.frombuffer(payload, np.uint8, cw * ch,
                              pos).reshape(ch, cw)
            pos += cw * ch
            rgb = yuv_to_rgb(y, u, v)
        yield {"frame_idx": idx, "y": y, "u": u, "v": v, "rgb": rgb}
        idx += 1


# ---------------------------------------------------------------------------
# AVI (RIFF)
# ---------------------------------------------------------------------------

def _chunk(fourcc: bytes, body: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) & 1 else b"")


def _list(fourcc: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + body)


def _dib_frame(px: np.ndarray) -> bytes:
    """(h, w, 3) RGB → bottom-up BGR rows padded to 4 bytes (the BMP
    pixel layout AVI 'DIB ' streams carry)."""
    h, w, _ = px.shape
    row = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, row), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    return rows.tobytes()


def encode_avi(frames_rgb: list, *, fps: tuple[int, int] = (25, 1),
               codec: str = "MJPG", subsample: bool = False) -> bytes:
    """List of (h, w, 3) RGB uint8 frames → AVI bytes with one video
    stream. ``codec="DIB "`` stores raw bottom-up BGR (lossless
    round-trip); ``codec="MJPG"`` JPEG-encodes each frame with the
    repo's own baseline encoder (each '00dc' chunk is a standalone
    JFIF stream, tables included)."""
    if codec not in ("MJPG", "DIB "):
        raise ValueError(f"unsupported codec {codec!r}")
    h, w, _ = frames_rgb[0].shape
    if codec == "MJPG":
        from .jpeg import encode_jpeg
        bodies = [encode_jpeg(np.asarray(f, np.uint8), subsample=subsample)
                  for f in frames_rgb]
        ckid, compression = b"00dc", struct.unpack("<I", b"MJPG")[0]
    else:
        bodies = [_dib_frame(np.asarray(f, np.uint8)) for f in frames_rgb]
        ckid, compression = b"00db", 0
    max_body = max(len(b) for b in bodies)

    usec = (1_000_000 * fps[1]) // fps[0]
    avih = struct.pack("<14I", usec, max_body * fps[0] // max(fps[1], 1),
                       0, 0x10,            # dwFlags: AVIF_HASINDEX
                       len(bodies), 0, 1, max_body, w, h, 0, 0, 0, 0)
    strh = (b"vids" + codec.encode("ascii")
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, fps[1], fps[0], 0,
                          len(bodies), max_body, 0xFFFFFFFF, 0)
            + struct.pack("<4h", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, compression,
                       len(bodies[0]), 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_body, idx, off = bytearray(), bytearray(), 4
    for body in bodies:
        ck = _chunk(ckid, body)
        # idx1 offset convention: from the 'movi' fourcc (so the first
        # chunk's ckid sits at offset 4)
        idx += ckid + struct.pack("<III", 0x10, off, len(body))
        movi_body += ck
        off += len(ck)
    movi = _list(b"movi", bytes(movi_body))
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_riff(payload: bytes, pos: int, end: int):
    """Yield (fourcc, list_type|None, body_start, body_size) for each
    chunk in [pos, end)."""
    while pos + 8 <= end:
        fourcc = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if fourcc == b"LIST":
            yield fourcc, payload[pos + 8:pos + 12], pos + 12, size - 4
        else:
            yield fourcc, None, pos + 8, size
        pos += 8 + size + (size & 1)


def _avi_headers(payload: bytes) -> dict:
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    meta: dict = {"has_index": False, "_movi": None}
    for fourcc, ltype, body, size in _walk_riff(payload, 12, end):
        if fourcc == b"LIST" and ltype == b"hdrl":
            for f2, l2, b2, s2 in _walk_riff(payload, body, body + size):
                if f2 == b"avih":
                    a = struct.unpack_from("<14I", payload, b2)
                    meta.update(n_frames=a[4], width=a[8], height=a[9])
                elif f2 == b"LIST" and l2 == b"strl":
                    for f3, _, b3, s3 in _walk_riff(payload, b2, b2 + s2):
                        if f3 == b"strh" and payload[b3:b3 + 4] == b"vids":
                            meta["codec"] = payload[b3 + 4:b3 + 8] \
                                .decode("ascii").strip() or "DIB"
                            scale, rate = struct.unpack_from(
                                "<II", payload, b3 + 20)
                            meta["fps_num"], meta["fps_den"] = \
                                rate, max(scale, 1)
        elif fourcc == b"LIST" and ltype == b"movi":
            meta["_movi"] = (body, body + size)
        elif fourcc == b"idx1":
            meta["has_index"] = True
    if "width" not in meta or meta["_movi"] is None:
        raise ValueError("missing hdrl/movi list")
    return meta


@typed_decode("avi")
def decode_avi(payload: bytes) -> dict:
    """AVI bytes → {width, height, n_frames, fps_num, fps_den, codec,
    has_index} (header + movi walk; per-frame pixels via
    :func:`avi_frames`)."""
    meta = _avi_headers(payload)
    lo, hi = meta.pop("_movi")
    n = sum(1 for f, _, _, _ in _walk_riff(payload, lo, hi)
            if f[2:4] in (b"dc", b"db"))
    meta["n_frames_movi"] = n    # actual chunk count (avih may lie)
    return meta


@typed_decode("avi")
def avi_frames(payload: bytes):
    """Yield per-frame dicts {frame_idx, rgb} with REAL decoded pixels:
    MJPG chunks through functions/jpeg.py, DIB chunks as bottom-up BGR."""
    meta = _avi_headers(payload)
    lo, hi = meta["_movi"]
    w, h = meta["width"], meta["height"]
    mjpg = meta.get("codec", "").upper().startswith("MJPG")
    if mjpg:
        from .jpeg import decode_jpeg
    row = ((w * 3 + 3) // 4) * 4
    idx = 0
    for fourcc, _, body, size in _walk_riff(payload, lo, hi):
        if fourcc[2:4] not in (b"dc", b"db"):
            continue
        if mjpg:
            rgb = decode_jpeg(payload[body:body + size])["pixels"]
        else:
            rows = np.frombuffer(payload, np.uint8, row * h,
                                 body).reshape(h, row)
            rgb = rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]
        yield {"frame_idx": idx, "rgb": np.ascontiguousarray(rgb)}
        idx += 1
