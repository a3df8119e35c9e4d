"""Pure-stdlib/numpy audio codecs beyond PCM WAV (multimodal.py):
Sun/NeXT AU (.au/.snd — linear PCM plus G.711 µ-law / A-law
companding) and AIFF (IFF container, big-endian PCM, 80-bit extended
sample rate).

All decoders return the same dict shape as ``multimodal.decode_wav``
({sample_rate, n_channels, bits_per_sample, n_samples, samples:
int16 (n_samples, n_channels)}) so AudioStatsStage works over any of
them unchanged. The G.711 expansion follows the ITU-T tables at
16-bit scale (µ-law ±32124, A-law ±32256 — the same convention as
POSIX audioop's *2lin with width=2) and is vectorized as a 256-entry
lookup. PCM AU/AIFF round-trip bit-exactly; the companded paths are
verified by the code-domain identity ``compress(expand(code)) ==
code`` for every byte, which pins both directions of the table.

The reference never decodes audio (payloads are opaque to its
browser-driven fetcher); this module serves the training-data suite's
multimodal plumbing (SURVEY.md §2.11) like functions/video.py does
for containers.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecguard import typed_decode

__all__ = ["decode_au", "encode_au", "decode_aiff", "encode_aiff",
           "ulaw_expand_table", "alaw_expand_table",
           "linear_to_ulaw", "linear_to_alaw"]

_AU_MAGIC = b".snd"
_BIAS = 0x84          # G.711 µ-law bias


# ---------------------------------------------------------------------------
# G.711 companding (ITU-T G.711 tables, 16-bit linear scale)
# ---------------------------------------------------------------------------

def ulaw_expand_table() -> np.ndarray:
    """256-entry µ-law byte → int16 linear (±32124)."""
    codes = np.arange(256, dtype=np.int32)
    u = ~codes & 0xFF
    t = (((u & 0x0F) << 3) + _BIAS) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, _BIAS - t, t - _BIAS).astype(np.int16)


def alaw_expand_table() -> np.ndarray:
    """256-entry A-law byte → int16 linear (±32256)."""
    codes = np.arange(256, dtype=np.int32)
    a = codes ^ 0x55
    quant, seg = (a & 0x0F) << 4, (a >> 4) & 0x07
    t = np.where(seg == 0, quant + 8,
                 np.where(seg == 1, quant + 0x108,
                          (quant + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t).astype(np.int16)


def _segment(value: np.ndarray, boundaries: tuple) -> np.ndarray:
    """G.711 chord search: count of boundaries the value exceeds
    (vectorized equivalent of the canonical table walk)."""
    seg = np.zeros_like(value)
    for bound in boundaries:
        seg += (value > bound).astype(value.dtype)
    return seg


def linear_to_ulaw(samples: np.ndarray) -> np.ndarray:
    """int16 linear → µ-law bytes — the canonical G.711 compressor
    (14-bit pre-shift, +33 bias, chord search); matches stdlib
    audioop.lin2ulaw on the full int16 domain."""
    s = np.asarray(samples, dtype=np.int32) >> 2        # 16 → 14 bit
    mask = np.where(s < 0, 0x7F, 0xFF)
    mag = np.minimum(np.abs(s), 8159) + (_BIAS >> 2)
    # post-bias 8160..8192 falls past the last chord (seg 8 in the
    # canonical table walk) and saturates to code 0x7F
    mag = np.minimum(mag, 0x1FFF)
    seg = _segment(mag, (0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF))
    code = (seg << 4) | ((mag >> (seg + 1)) & 0x0F)
    return ((code ^ mask) & 0xFF).astype(np.uint8)


def linear_to_alaw(samples: np.ndarray) -> np.ndarray:
    """int16 linear → A-law bytes — the canonical G.711 compressor
    (13-bit pre-shift, negatives as ``-s - 1``); matches stdlib
    audioop.lin2alaw on the full int16 domain."""
    s = np.asarray(samples, dtype=np.int32) >> 3        # 16 → 13 bit
    mask = np.where(s >= 0, 0xD5, 0x55)
    mag = np.where(s >= 0, s, -s - 1)
    seg = _segment(mag, (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF))
    mantissa = np.where(seg < 2, mag >> 1, mag >> seg) & 0x0F
    code = (seg << 4) | mantissa
    return ((code ^ mask) & 0xFF).astype(np.uint8)


# ---------------------------------------------------------------------------
# Sun/NeXT AU
# ---------------------------------------------------------------------------

# AU header encoding field → (bits, decoder kind)
_AU_ENCODINGS = {1: (8, "ulaw"), 2: (8, "pcm8"), 3: (16, "pcm16"),
                 27: (8, "alaw")}
_AU_CODES = {"ulaw": 1, "pcm8": 2, "pcm16": 3, "alaw": 27}


@typed_decode("au")
def decode_au(payload: bytes) -> dict:
    """AU bytes → real samples (same shape as decode_wav). Supports
    8-bit µ-law / A-law (G.711-expanded to int16), 8-bit signed PCM
    (widened) and 16-bit big-endian PCM."""
    if payload[:4] != _AU_MAGIC or len(payload) < 24:
        raise ValueError("not an AU payload")
    off, size, enc, rate, ch = struct.unpack_from(">5I", payload, 4)
    if enc not in _AU_ENCODINGS:
        raise ValueError(f"unsupported AU encoding {enc}")
    if ch < 1 or off < 24:
        raise ValueError("bad AU header")
    bits, kind = _AU_ENCODINGS[enc]
    end = len(payload) if size == 0xFFFFFFFF else min(
        len(payload), off + size)
    data = payload[off:end]
    if kind == "pcm16":
        samples = np.frombuffer(data[: len(data) // 2 * 2],
                                dtype=">i2").astype(np.int16)
    elif kind == "pcm8":
        samples = np.frombuffer(data, np.int8).astype(np.int16) * 256
    else:
        table = (ulaw_expand_table() if kind == "ulaw"
                 else alaw_expand_table())
        samples = table[np.frombuffer(data, np.uint8)]
    n_samples = len(samples) // ch
    return {"sample_rate": rate, "n_channels": ch,
            "bits_per_sample": bits, "n_samples": n_samples,
            "encoding": kind,
            "samples": samples[: n_samples * ch].reshape(n_samples, ch)}


def encode_au(samples: np.ndarray, sample_rate: int = 8000, *,
              encoding: str = "pcm16") -> bytes:
    """(n_samples, n_channels) int16 → AU bytes. ``pcm16`` round-trips
    bit-exactly; ``ulaw``/``alaw`` compand through G.711."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    if encoding == "pcm16":
        data = samples.astype(">i2").tobytes()
    elif encoding == "ulaw":
        data = linear_to_ulaw(samples).tobytes()
    elif encoding == "alaw":
        data = linear_to_alaw(samples).tobytes()
    else:
        raise ValueError(f"unsupported encoding {encoding}")
    header = _AU_MAGIC + struct.pack(
        ">5I", 24, len(data), _AU_CODES[encoding], sample_rate,
        samples.shape[1])
    return header + data


# ---------------------------------------------------------------------------
# AIFF
# ---------------------------------------------------------------------------

def _f80_pack(value: float) -> bytes:
    """float → 80-bit IEEE 754 extended (the AIFF sampleRate field)."""
    if value == 0:
        return b"\x00" * 10
    sign = 0x8000 if value < 0 else 0
    value = abs(value)
    exp = 0
    while value >= 2.0:
        value /= 2.0
        exp += 1
    while value < 1.0:
        value *= 2.0
        exp -= 1
    mant = int(value * (1 << 63))
    return struct.pack(">HQ", sign | (exp + 16383), mant)


def _f80_unpack(raw: bytes) -> float:
    se, mant = struct.unpack(">HQ", raw[:10])
    if se & 0x7FFF == 0 and mant == 0:
        return 0.0
    sign = -1.0 if se & 0x8000 else 1.0
    return sign * mant * 2.0 ** ((se & 0x7FFF) - 16383 - 63)


@typed_decode("aiff")
def decode_aiff(payload: bytes) -> dict:
    """AIFF bytes → real samples (same shape as decode_wav): IFF chunk
    walk, COMM (channels / frames / bits / 80-bit-extended rate), SSND
    big-endian PCM (8-bit widened, 16-bit native)."""
    if payload[:4] != b"FORM" or payload[8:12] != b"AIFF" \
            or len(payload) < 12:
        raise ValueError("not an AIFF payload")
    end = min(len(payload), 8 + struct.unpack_from(">I", payload, 4)[0])
    pos, comm, ssnd = 12, None, None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        size = struct.unpack_from(">I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"COMM":
            ch, n_frames, bits = struct.unpack_from(">hIh", body, 0)
            comm = (ch, n_frames, bits, _f80_unpack(body[8:18]))
        elif cid == b"SSND":
            data_off = struct.unpack_from(">I", body, 0)[0]
            ssnd = body[8 + data_off:]
        pos += 8 + size + (size & 1)   # chunks are word-aligned
    if comm is None or ssnd is None:
        raise ValueError("missing COMM/SSND chunk")
    ch, n_frames, bits, rate = comm
    if ch < 1 or bits not in (8, 16):
        raise ValueError(f"only 8/16-bit AIFF PCM supported ({bits})")
    if bits == 16:
        samples = np.frombuffer(ssnd[: len(ssnd) // 2 * 2],
                                dtype=">i2").astype(np.int16)
    else:
        samples = np.frombuffer(ssnd, np.int8).astype(np.int16) * 256
    n_samples = min(len(samples) // ch, n_frames)
    return {"sample_rate": int(round(rate)), "n_channels": ch,
            "bits_per_sample": bits, "n_samples": n_samples,
            "samples": samples[: n_samples * ch].reshape(n_samples, ch)}


def encode_aiff(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """(n_samples, n_channels) int16 → 16-bit AIFF bytes
    (round-trips bit-exactly)."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, ch = samples.shape
    comm = struct.pack(">hIh", ch, n_frames, 16) + _f80_pack(
        float(sample_rate))
    data = samples.astype(">i2").tobytes()
    ssnd = struct.pack(">II", 0, 0) + data
    body = b"AIFF"
    for cid, chunk in ((b"COMM", comm), (b"SSND", ssnd)):
        body += cid + struct.pack(">I", len(chunk)) + chunk
        if len(chunk) & 1:
            body += b"\x00"
    return b"FORM" + struct.pack(">I", len(body)) + body
