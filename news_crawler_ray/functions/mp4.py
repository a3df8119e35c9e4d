"""Pure-stdlib/numpy MP4 (ISO/IEC 14496-12 ISO Base Media File Format)
container codec with REAL frame decode for Motion-JPEG tracks.

The container layer is fully parsed — box walk (32/64-bit sizes),
``mvhd``/``tkhd``/``mdhd`` timing, ``hdlr`` track typing, and the
complete ``stbl`` sample-table machinery (``stsd`` codec entry,
``stts`` timing, ``stsc`` chunk runs, ``stsz``/``stz2`` sizes,
``stco``/``co64`` chunk offsets) with the standard stsc→stco sample
offset expansion. Tracks whose sample entry is ``jpeg`` (MJPEG-in-MP4:
each sample is a standalone JFIF stream, the QuickTime/ISO photo-JPEG
layout) decode to REAL pixels through the repo's own T.81 decoder
(functions/jpeg.py); H.264/HEVC bitstreams raise ``NotImplementedError``
(no ffmpeg in the container) while the container metadata stays real.

A matching minimal encoder (``ftyp``+``mdat``+``moov``, one video
track, one chunk per sample) exists for round-trip goldens: the
entropy layer of the repo's baseline JPEG encoder is lossless, so
``mp4_frames(encode_mp4(frames))`` is bit-exact against
``jpeg.expected_decode``.

The reference treats video as opaque payloads handed to a browser
(reference crawling_tools/crawler.py — it never decodes video); this
module serves the training-data suite's multimodal plumbing
(SURVEY.md §2.11) the same way functions/video.py does for AVI/Y4M.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecguard import typed_decode

__all__ = ["encode_mp4", "decode_mp4", "mp4_frames"]


# ---------------------------------------------------------------------------
# Box building (encoder)
# ---------------------------------------------------------------------------

def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version,
                                    flags.to_bytes(3, "big")) + body)


_UNITY_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                            0x40000000)


def _visual_sample_entry(codec: bytes, width: int, height: int) -> bytes:
    """VisualSampleEntry (14496-12 §12.1.3): 'jpeg' needs no extension
    boxes — each sample is a self-describing JFIF stream."""
    body = (b"\x00" * 6 + struct.pack(">H", 1)        # data_ref_index
            + b"\x00" * 16                            # pre_defined/reserved
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + b"\x00" * 4
            + struct.pack(">H", 1)                    # frame_count
            + b"\x00" * 32                            # compressorname
            + struct.pack(">Hh", 24, -1))             # depth, pre_defined
    return _box(codec, body)


def encode_mp4(frames_rgb: list, *, fps: tuple[int, int] = (25, 1),
               subsample: bool = False) -> bytes:
    """List of (h, w, 3) RGB uint8 frames → MP4 bytes with one video
    track whose samples are standalone JFIF streams (sample entry
    ``jpeg``), one chunk per sample. Layout ftyp+mdat+moov so chunk
    offsets are independent of the moov size."""
    from .jpeg import encode_jpeg
    if not frames_rgb:
        raise ValueError("need at least one frame")
    h, w, _ = frames_rgb[0].shape
    samples = [encode_jpeg(np.asarray(f, np.uint8), subsample=subsample)
               for f in frames_rgb]
    n = len(samples)
    timescale = fps[0] * 1000
    delta = fps[1] * 1000
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                + b"isom" + b"mp41")
    offsets, off = [], len(ftyp) + 8
    for s in samples:
        offsets.append(off)
        off += len(s)
    mdat = _box(b"mdat", b"".join(samples))

    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1)
                 + _visual_sample_entry(b"jpeg", w, h))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + struct.pack(f">{n}I", *(len(s) for s in samples)))
    stco = _full(b"stco", 0, 0, struct.pack(">I", n)
                 + struct.pack(f">{n}I", *offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1)
                               + _full(b"url ", 0, 1, b"")))
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">4H", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                 + b"VideoHandler\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale,
                                            duration, 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIII", 0, 0, 1, 0)
                 + struct.pack(">I", duration) + b"\x00" * 8
                 + struct.pack(">4H", 0, 0, 0, 0) + _UNITY_MATRIX
                 + struct.pack(">II", w << 16, h << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, timescale,
                                            duration)
                 + struct.pack(">iH", 0x10000, 0x0100) + b"\x00" * 10
                 + _UNITY_MATRIX + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ---------------------------------------------------------------------------
# Box walking (decoder)
# ---------------------------------------------------------------------------

def _walk(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in
    [pos, end); handles 64-bit largesize and size==0 (to end)."""
    while pos + 8 <= end:
        size = struct.unpack_from(">I", payload, pos)[0]
        fourcc = payload[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            size = struct.unpack_from(">Q", payload, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos:
            raise ValueError(f"bad box size at {pos}")
        yield fourcc, body, pos + size
        pos += size


def _find(payload: bytes, pos: int, end: int, fourcc: bytes):
    for fc, b, e in _walk(payload, pos, end):
        if fc == fourcc:
            return b, e
    return None


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf"}


def _full_body(payload: bytes, body: int) -> tuple[int, int]:
    """FullBox header → (version, first byte after version+flags)."""
    return payload[body], body + 4


def _parse_stbl(payload: bytes, pos: int, end: int) -> dict:
    out: dict = {}
    for fc, b, e in _walk(payload, pos, end):
        if fc == b"stsd":
            _, p = _full_body(payload, b)
            (n_entries,) = struct.unpack_from(">I", payload, p)
            if n_entries >= 1:
                out["codec"] = payload[p + 8:p + 12].decode(
                    "ascii", "replace").strip()
                # VisualSampleEntry dims at +24 from entry body start
                out["sample_width"], out["sample_height"] = \
                    struct.unpack_from(">HH", payload, p + 12 + 24)
        elif fc == b"stts":
            _, p = _full_body(payload, b)
            (n_ent,) = struct.unpack_from(">I", payload, p)
            runs = struct.unpack_from(f">{2 * n_ent}I", payload, p + 4)
            out["stts"] = list(zip(runs[0::2], runs[1::2]))
        elif fc == b"stsc":
            _, p = _full_body(payload, b)
            (n_ent,) = struct.unpack_from(">I", payload, p)
            vals = struct.unpack_from(f">{3 * n_ent}I", payload, p + 4)
            out["stsc"] = [(vals[i], vals[i + 1])
                           for i in range(0, 3 * n_ent, 3)]
        elif fc == b"stsz":
            _, p = _full_body(payload, b)
            fixed, count = struct.unpack_from(">II", payload, p)
            if fixed and count > len(payload):
                # fixed-size form stores NO per-entry bytes, so a raw
                # uint32 count would materialize a [fixed]*count list
                # (2^31 entries = 16 GB) unrelated to the payload; a
                # real file needs ≥fixed≥1 mdat bytes per sample
                raise ValueError(
                    f"stsz sample count {count} exceeds payload size")
            out["sizes"] = ([fixed] * count if fixed
                            else list(struct.unpack_from(
                                f">{count}I", payload, p + 8)))
        elif fc == b"stz2":
            # compact sizes: 24-bit reserved, 8-bit field_size (4/8/16),
            # then sample_count packed entries (14496-12 §8.7.3.3)
            _, p = _full_body(payload, b)
            field_size = payload[p + 3]
            (count,) = struct.unpack_from(">I", payload, p + 4)
            raw = payload[p + 8:]
            if field_size == 4:
                nibbles = np.frombuffer(
                    raw[: (count + 1) // 2], np.uint8)
                sizes = np.empty(2 * len(nibbles), np.int64)
                sizes[0::2], sizes[1::2] = nibbles >> 4, nibbles & 0x0F
                out["sizes"] = sizes[:count].tolist()
            elif field_size in (8, 16):
                dt = np.uint8 if field_size == 8 else ">u2"
                out["sizes"] = np.frombuffer(
                    raw[: count * field_size // 8], dt) \
                    .astype(np.int64).tolist()
            else:
                raise ValueError(f"bad stz2 field size {field_size}")
        elif fc in (b"stco", b"co64"):
            _, p = _full_body(payload, b)
            (n_ent,) = struct.unpack_from(">I", payload, p)
            fmt = ">%d%s" % (n_ent, "I" if fc == b"stco" else "Q")
            out["chunk_offsets"] = list(struct.unpack_from(
                fmt, payload, p + 4))
    return out


def _sample_offsets(stbl: dict) -> list[tuple[int, int]]:
    """stsc/stco/stsz → [(file_offset, size)] per sample — the
    standard chunk-run expansion (14496-12 §8.7.4): each stsc entry
    (first_chunk, samples_per_chunk) applies until the next entry's
    first_chunk."""
    sizes = stbl.get("sizes", [])
    chunks = stbl.get("chunk_offsets", [])
    runs = stbl.get("stsc", [])
    if not sizes or not chunks or not runs:
        return []
    out, si = [], 0
    for ri, (first, per) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(chunks)
        for ci in range(first - 1, last):
            off = chunks[ci]
            for _ in range(per):
                if si >= len(sizes):
                    return out
                out.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    return out


def _video_trak(payload: bytes) -> dict:
    """Parse the first video track's tkhd dims, mdhd timescale, and
    sample table out of moov."""
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    meta: dict = {}
    mvhd = _find(payload, *moov, b"mvhd")
    if mvhd is not None:
        ver, p = _full_body(payload, mvhd[0])
        if ver == 1:
            ts, dur = struct.unpack_from(">IQ", payload, p + 16)
        else:
            ts, dur = struct.unpack_from(">II", payload, p + 8)
        meta["movie_timescale"], meta["movie_duration"] = ts, dur
    for fc, b, e in _walk(payload, *moov):
        if fc != b"trak":
            continue
        mdia = _find(payload, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, *mdia, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        tkhd = _find(payload, b, e, b"tkhd")
        if tkhd is not None:
            ver, p = _full_body(payload, tkhd[0])
            p += 32 if ver == 1 else 20      # skip times/ids/duration
            p += 8 + 8 + 36                  # reserved, l/a/v/r, matrix
            wfx, hfx = struct.unpack_from(">II", payload, p)
            meta["width"], meta["height"] = wfx >> 16, hfx >> 16
        mdhd = _find(payload, *mdia, b"mdhd")
        if mdhd is not None:
            ver, p = _full_body(payload, mdhd[0])
            if ver == 1:
                ts = struct.unpack_from(">I", payload, p + 16)[0]
            else:
                ts = struct.unpack_from(">I", payload, p + 8)[0]
            meta["timescale"] = ts
        minf = _find(payload, *mdia, b"minf")
        if minf is not None:
            stbl = _find(payload, *minf, b"stbl")
            if stbl is not None:
                meta.update(_parse_stbl(payload, *stbl))
        return meta
    raise ValueError("no video track")


def is_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


@typed_decode("mp4")
def decode_mp4(payload: bytes) -> dict:
    """MP4 bytes → {width, height, n_frames, fps_num, fps_den, codec,
    brand} (full container walk; per-frame pixels via
    :func:`mp4_frames`)."""
    if not is_mp4(payload):
        raise ValueError("not an ISO-BMFF payload")
    brand = payload[8:12].decode("ascii", "replace")
    meta = _video_trak(payload)
    stts = meta.get("stts", [])
    n_frames = sum(c for c, _ in stts)
    ts = meta.get("timescale", 0)
    delta = stts[0][1] if stts else 0
    return {"brand": brand,
            "width": meta.get("width", 0),
            "height": meta.get("height", 0),
            "codec": meta.get("codec", ""),
            "n_frames": n_frames,
            "fps_num": ts, "fps_den": max(delta, 1),
            "n_samples_sized": len(meta.get("sizes", []))}


@typed_decode("mp4")
def mp4_frames(payload: bytes):
    """Yield per-frame dicts {frame_idx, rgb} with REAL decoded pixels
    for ``jpeg``-sample-entry tracks (each sample a standalone JFIF
    stream → functions/jpeg.py). Compressed bitstream codecs (avc1,
    hev1, vp09, ...) raise ``NotImplementedError`` — no ffmpeg in the
    container; the container metadata above stays real regardless."""
    meta = _video_trak(payload)
    codec = meta.get("codec", "")
    if codec.lower() not in ("jpeg", "mjpg", "mjpa"):
        raise NotImplementedError(
            f"MP4 frame decode supports Motion-JPEG sample entries "
            f"(got {codec!r}; bitstream codecs need ffmpeg)")
    from .jpeg import decode_jpeg
    for idx, (off, size) in enumerate(_sample_offsets(meta)):
        sample = payload[off:off + size]
        if codec.lower() == "mjpa" and sample[:4] != b"\xff\xd8\xff\xe0":
            # QuickTime field-JPEG: 40-byte field header before SOI
            soi = sample.find(b"\xff\xd8\xff")
            if soi < 0:
                raise ValueError(f"no JPEG SOI in mjpa sample {idx}")
            sample = sample[soi:]
        yield {"frame_idx": idx,
               "rgb": decode_jpeg(sample)["pixels"]}
