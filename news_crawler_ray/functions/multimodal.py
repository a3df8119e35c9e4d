"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by actor-pool ``map_batches`` stages.

Decode is REAL for every web-image format a pure-stdlib + numpy
parser can handle — 24-bit BI_RGB **BMP**, binary **PPM** (P6), PCM
**WAV** (``decode_bmp`` / ``decode_ppm`` / ``decode_wav`` below),
**JPEG** baseline AND progressive (the full T.81 decoder in
``jpeg.py``: Huffman entropy decode, spectral selection / successive
approximation, dequantize, float IDCT, chroma upsample), **PNG**
(``png.py``: stdlib-zlib inflate, all five scanline filters, every
legal depth/color combo, palette/alpha/Adam7) and **GIF** incl.
animation (``gif.py``: LZW, interlace, transparency — real per-frame
extraction feeds FrameSampleStage) and **video** in the two
stdlib-parsable containers (``video.py``: AVI with MJPEG frames —
each '00dc' chunk decoded by the T.81 decoder — or raw DIB frames,
and YUV4MPEG2 with BT.601 YUV→RGB), all format-sniffed by magic
bytes: actual pixel arrays and sample frames, golden-tested.
Compressed video codecs (H.264/VP9/…) need ffmpeg, absent in this
container, so payloads outside the formats above fall back to a
clearly-marked deterministic FAKE decoder (metadata derived from the
payload bytes) — while all the Ray-side plumbing is real either way:
schemas, small batch sizes for wide binary rows (SURVEY.md §7.4
item 6), actor signatures, output layout.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from .codecguard import typed_decode
import pyarrow as pa

import ray.data as rd

try:  # pragma: no cover - not present in this container
    from PIL import Image  # type: ignore
    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),   # "image" | "audio" | "video"
    ("mime", pa.string()),
])


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic fake decode: metadata derived from the payload bytes
    (stands in for PIL/ffmpeg decode; replace in a full environment)."""
    digest = hashlib.sha1(payload or b"").digest()
    return {
        "byte_len": len(payload or b""),
        "sha1_prefix": digest[:8].hex(),
        "width": 64 + digest[0] % 192,      # fake but deterministic
        "height": 64 + digest[1] % 192,
        "n_frames": 1 + digest[2] % 30,
    }


# ---------------------------------------------------------------------------
# Real pure-stdlib decoders (uncompressed containers)
# ---------------------------------------------------------------------------

def sniff_format(payload: bytes) -> str | None:
    """Magic-byte sniff:
    bmp|ppm|wav|au|aiff|avi|y4m|mp4|jpeg|png|gif|None."""
    p = payload or b""
    if p[:2] == b"BM":
        return "bmp"
    if len(p) >= 12 and p[4:8] == b"ftyp":
        return "mp4"
    if p[:2] == b"P6":
        return "ppm"
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        return "wav"
    if p[:4] == b".snd":
        return "au"
    if p[:4] == b"FORM" and p[8:12] == b"AIFF":
        return "aiff"
    if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        return "avi"
    if p[:9] == b"YUV4MPEG2":
        return "y4m"
    if p[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


@typed_decode("bmp")
def decode_bmp(payload: bytes) -> dict:
    """24-bit uncompressed (BI_RGB) BMP → real pixels.

    Returns {width, height, pixels: np.uint8 (h, w, 3) RGB, top row
    first}. Handles the standard bottom-up row order and 4-byte row
    padding; rejects anything that is not 24bpp/BI_RGB."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width = struct.unpack_from("<i", payload, 18)[0]
    height = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24bpp BI_RGB supported (got {bpp}bpp, "
                         f"compression {compression})")
    bottom_up = height > 0
    height = abs(height)
    row_size = ((24 * width + 31) // 32) * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * height,
                         offset=data_off).reshape(height, row_size)
    px = rows[:, : width * 3].reshape(height, width, 3)[..., ::-1]  # BGR→RGB
    if bottom_up:
        px = px[::-1]
    return {"width": width, "height": height,
            "pixels": np.ascontiguousarray(px)}


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """Inverse of :func:`decode_bmp`: (h, w, 3) RGB uint8 → 24-bit
    bottom-up BI_RGB BMP bytes (fixture/round-trip encoder)."""
    h, w, _ = pixels.shape
    row_size = ((24 * w + 31) // 32) * 4
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR
    body = rows.tobytes()
    header = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(body), 2835, 2835, 0, 0))
    return header + body


@typed_decode("ppm")
def decode_ppm(payload: bytes) -> dict:
    """Binary PPM (P6, maxval ≤ 255) → real pixels (h, w, 3) RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header tokenizer: three ints after the magic; '#' comments to EOL
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    px = np.frombuffer(payload, dtype=np.uint8, count=width * height * 3,
                       offset=pos).reshape(height, width, 3)
    return {"width": width, "height": height,
            "pixels": np.ascontiguousarray(px)}


@typed_decode("wav")
def decode_wav(payload: bytes) -> dict:
    """PCM WAV → real samples.

    Returns {sample_rate, n_channels, bits_per_sample, n_samples,
    samples: np.int16 (n_samples, n_channels)} (16-bit PCM; 8-bit is
    widened). Walks RIFF chunks, so extra chunks (LIST, fact) are
    skipped correctly."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)   # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"only 8/16-bit PCM supported (format "
                         f"{audio_format}, {bits} bits)")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    else:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.int16)
                   - 128) * 256
    n_samples = len(samples) // n_channels
    return {"sample_rate": sample_rate, "n_channels": n_channels,
            "bits_per_sample": bits, "n_samples": n_samples,
            "samples": samples[: n_samples * n_channels]
            .reshape(n_samples, n_channels)}


def encode_wav(samples: "np.ndarray", sample_rate: int = 8000) -> bytes:
    """Inverse of :func:`decode_wav`: (n_samples, n_channels) int16 →
    16-bit PCM WAV bytes (fixture/round-trip encoder)."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n_channels = samples.shape[1]
    data = samples.tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate,
                      n_channels * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_audio(kind: str, payload: bytes) -> dict:
    """Dispatch WAV/AU/AIFF to the matching decoder; all three return
    the same {sample_rate, n_channels, n_samples, samples} shape."""
    if kind == "wav":
        return decode_wav(payload)
    from . import audio as aud
    if kind == "au":
        return aud.decode_au(payload)
    if kind == "aiff":
        return aud.decode_aiff(payload)
    raise ValueError(f"not an audio payload (sniffed {kind!r})")


class AudioStatsStage:
    """Actor-pool stage: audio payload (PCM WAV, Sun AU incl. G.711
    µ-law/A-law, AIFF) → REAL per-clip sample statistics (decode →
    vectorized numpy over the actual PCM arrays): peak amplitude, RMS
    (milli-units of full scale), duration in ms, plus a checksum of
    the decoded samples. The audio analogue of MediaDecodeStage's real
    image path — a header-only parse cannot produce
    ``rms_milli``/``sample_sha1``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        peaks, rmss, durs, srs, chans, shas = [], [], [], [], [], []
        for payload in batch["payload"].to_pylist():
            d = _decode_audio(sniff_format(payload), payload)
            s = d["samples"].astype(np.float64) / 32768.0
            peaks.append(int(np.abs(d["samples"]).max()) if s.size else 0)
            rmss.append(int(round(float(np.sqrt(np.mean(s * s))) * 1000))
                        if s.size else 0)
            durs.append(d["n_samples"] * 1000 // d["sample_rate"])
            srs.append(d["sample_rate"])
            chans.append(d["n_channels"])
            shas.append(hashlib.sha1(
                d["samples"].tobytes()).hexdigest()[:16])
        return pa.table({
            "media_id": batch["media_id"],
            "sample_rate": pa.array(srs, pa.int32()),
            "n_channels": pa.array(chans, pa.int32()),
            "duration_ms": pa.array(durs, pa.int64()),
            "peak": pa.array(peaks, pa.int32()),
            "rms_milli": pa.array(rmss, pa.int64()),
            "sample_sha1": pa.array(shas, pa.string()),
        })


def real_decode_meta(payload: bytes) -> dict:
    """Real metadata for the stdlib-decodable formats (BMP/PPM/WAV/AU/
    AIFF/AVI/Y4M/MP4/JPEG/PNG/GIF); raises ``NotImplementedError`` for
    anything else (compressed bitstream codecs need ffmpeg). Audio maps
    onto the shared schema as width=height=0 and n_frames=sample
    frames; GIF
    n_frames is the real animation frame count; AVI/Y4M n_frames is
    the real container frame count (sample_rate carries fps)."""
    kind = sniff_format(payload or b"")
    digest = hashlib.sha1(payload or b"").digest()
    base = {"byte_len": len(payload or b""),
            "sha1_prefix": digest[:8].hex(),
            "sample_rate": 0, "n_channels": 0}
    if kind in ("bmp", "ppm", "jpeg", "png", "gif"):
        n_frames = 1
        if kind == "jpeg":
            from .jpeg import decode_jpeg   # pure numpy/stdlib T.81
            d = decode_jpeg(payload)
        elif kind == "png":
            from .png import decode_png     # stdlib zlib + unfilter
            d = decode_png(payload)
        elif kind == "gif":
            from .gif import decode_gif     # pure-python LZW
            d = decode_gif(payload)
            n_frames = d["n_frames"]        # REAL animation frame count
        else:
            d = decode_bmp(payload) if kind == "bmp" else decode_ppm(payload)
        return {**base, "width": d["width"], "height": d["height"],
                "n_frames": n_frames,
                # checksum of the DECODED pixels — proves real decode
                # (a header-only parse could fake width/height)
                "pixel_sha1": hashlib.sha1(
                    d["pixels"].tobytes()).hexdigest()[:16]}
    if kind in ("wav", "au", "aiff"):
        d = _decode_audio(kind, payload)
        return {**base, "width": 0, "height": 0,
                "n_frames": d["n_samples"],
                "sample_rate": d["sample_rate"],
                "n_channels": d["n_channels"],
                "pixel_sha1": hashlib.sha1(
                    d["samples"].tobytes()).hexdigest()[:16]}
    if kind in ("avi", "y4m", "mp4"):
        # real container walk for dims/frame count/fps; pixel_sha1
        # checksums the DECODED first frame (decoding every frame for
        # a metadata query would defeat the cheap-walk point — full
        # per-frame decode lives in FrameSampleStage)
        from . import video as vd
        if kind == "avi":
            d = vd.decode_avi(payload)
            first = next(vd.avi_frames(payload))["rgb"]
            n_frames = d["n_frames_movi"]
        elif kind == "mp4":
            from . import mp4 as m4
            d = m4.decode_mp4(payload)
            first = next(m4.mp4_frames(payload))["rgb"]
            n_frames = d["n_frames"]
        else:
            d = vd.decode_y4m(payload)
            first = next(vd.y4m_frames(payload))["rgb"]
            n_frames = d["n_frames"]
        return {**base, "width": d["width"], "height": d["height"],
                "n_frames": n_frames,
                "sample_rate": d["fps_num"] // max(d["fps_den"], 1),
                "pixel_sha1": hashlib.sha1(
                    first.tobytes()).hexdigest()[:16]}
    raise NotImplementedError(
        f"real decode supports BMP/PPM/WAV/AVI/Y4M/MP4/JPEG/PNG/GIF "
        f"here (got {(payload or b'')[:4]!r})")


class MediaDecodeStage:
    """Actor-pool stage: binary payload → typed metadata columns.

    ``real_decode=True`` decodes ACTUAL pixels/samples for the
    stdlib-parsable formats (BMP/PPM/WAV — see module doc) and emits
    two extra columns (``sample_rate``, ``n_channels``) plus a
    ``pixel_sha1`` checksum of the decoded array; payloads outside
    those formats raise. ``real_decode=False`` keeps the deterministic
    fake decoder for arbitrary payloads.

    Use ``map_batches(MediaDecodeStage, batch_size=SMALL, concurrency=N,
    batch_format="pyarrow")`` — batch_size stays small because each row
    carries a multi-KB/MB payload and batch×concurrency must fit the
    worker heap."""

    def __init__(self, real_decode: bool = False):
        self.real_decode = real_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = real_decode_meta if self.real_decode else fake_decode_meta
        metas = [decode(p) for p in batch["payload"].to_pylist()]
        cols = {
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "byte_len": pa.array([m["byte_len"] for m in metas], pa.int64()),
            "sha1_prefix": pa.array([m["sha1_prefix"] for m in metas], pa.string()),
            "width": pa.array([m["width"] for m in metas], pa.int32()),
            "height": pa.array([m["height"] for m in metas], pa.int32()),
            "n_frames": pa.array([m["n_frames"] for m in metas], pa.int32()),
        }
        if self.real_decode:
            cols["sample_rate"] = pa.array(
                [m["sample_rate"] for m in metas], pa.int32())
            cols["n_channels"] = pa.array(
                [m["n_channels"] for m in metas], pa.int32())
            cols["pixel_sha1"] = pa.array(
                [m["pixel_sha1"] for m in metas], pa.string())
        return pa.table(cols)   # payload projected away: metadata-only


class FrameSampleStage:
    """Actor-pool stage: sample every k-th frame of an animation → one
    row per sampled frame. With ``real_decode=True``, GIF payloads are
    REALLY frame-extracted (per-frame LZW decode; ``frame_hash``
    checksums the decoded palette-index array) and AVI/Y4M/MP4 video
    is REALLY frame-decoded (MJPEG via the T.81 decoder / raw DIB /
    raw planar YUV→RGB / jpeg-sample-entry MP4; ``frame_hash``
    checksums the decoded RGB array) — other formats raise
    (compressed bitstream codecs need ffmpeg). Default
    keeps the deterministic fake for arbitrary payloads; the explode
    layout and schema are identical."""

    def __init__(self, every_k: int = 10, real_decode: bool = False):
        self.every_k = every_k
        self.real_decode = real_decode

    def _rows(self, payload: bytes):
        if self.real_decode:
            kind = sniff_format(payload)
            if kind == "gif":
                from .gif import frames
                for f, fr in enumerate(frames(payload)):
                    if f % self.every_k == 0:
                        yield f, hashlib.sha1(
                            fr["indices"].tobytes()).hexdigest()[:16]
            elif kind in ("avi", "y4m", "mp4"):
                if kind == "avi":
                    from .video import avi_frames as it_fn
                elif kind == "mp4":
                    from .mp4 import mp4_frames as it_fn
                else:
                    from .video import y4m_frames as it_fn
                for fr in it_fn(payload):
                    if fr["frame_idx"] % self.every_k == 0:
                        yield fr["frame_idx"], hashlib.sha1(
                            fr["rgb"].tobytes()).hexdigest()[:16]
            else:
                raise NotImplementedError(
                    "real frame sampling supports GIF/AVI/Y4M/MP4 here "
                    f"(got {(payload or b'')[:4]!r})")
            return
        meta = fake_decode_meta(payload)
        for f in range(0, meta["n_frames"], self.every_k):
            yield f, hashlib.sha1(
                (payload or b"") + f.to_bytes(4, "big")).hexdigest()[:16]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, hashes = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            for f, hh in self._rows(payload):
                ids.append(mid)
                frames.append(f)
                hashes.append(hh)
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "frame_idx": pa.array(frames, pa.int32()),
                         "frame_hash": pa.array(hashes, pa.string())})


class ResizeStage:
    """Actor-pool stage: binary payload → resized binary payload +
    output dims — the binary→binary shape (unlike decode, the payload
    stays in flight, so ``batch_size × concurrency × payload`` must fit
    the worker heap; callers keep batch_size small). With
    ``real_decode=True`` the resample is REAL for 24-bit BMP
    (nearest-neighbor over decoded pixels, golden-tested); the fake
    transform stays for arbitrary payloads: output bytes are a
    sha1-keyed digest stream proportional to the target area, so
    size/layout behavior is realistic."""

    def __init__(self, target_w: int = 32, target_h: int = 32,
                 real_decode: bool = False):
        # real_decode=True: ACTUAL nearest-neighbor resample for BMP
        # payloads (decode_bmp → index grid → encode_bmp); other
        # formats raise (compressed formats need PIL). False keeps the
        # deterministic fake for arbitrary payloads.
        self.real_decode = real_decode
        self.target_w = target_w
        self.target_h = target_h

    def _real_resize(self, payload: bytes) -> bytes:
        kind = sniff_format(payload)
        if kind == "bmp":
            d = decode_bmp(payload)
        elif kind == "jpeg":
            from .jpeg import decode_jpeg
            d = decode_jpeg(payload)
        elif kind == "png":
            from .png import decode_png
            d = decode_png(payload)
        else:
            raise NotImplementedError(
                "real resize supports BMP, JPEG and PNG here; other "
                "compressed formats need PIL")
        yi = (np.arange(self.target_h) * d["height"]) // self.target_h
        xi = (np.arange(self.target_w) * d["width"]) // self.target_w
        # output container is BMP for ALL inputs: lossless, so resizing
        # a jpeg doesn't pay a second quantization pass
        return encode_bmp(np.ascontiguousarray(d["pixels"][yi][:, xi]))

    def _fake_resize(self, payload: bytes) -> bytes:
        n = max(1, (self.target_w * self.target_h) // 20)
        seed = hashlib.sha1((payload or b"") +
                            bytes([self.target_w % 256,
                                   self.target_h % 256])).digest()
        reps = (n // len(seed)) + 1
        return (seed * reps)[:n]

    def __call__(self, batch: pa.Table) -> pa.Table:
        fn = self._real_resize if self.real_decode else self._fake_resize
        resized = [fn(p) for p in batch["payload"].to_pylist()]
        n = len(resized)
        return pa.table({
            "media_id": batch["media_id"],
            "payload": pa.array(resized, pa.binary()),
            "media_type": batch["media_type"],
            "mime": batch["mime"],
            "width": pa.array([self.target_w] * n, pa.int32()),
            "height": pa.array([self.target_h] * n, pa.int32()),
        })


class FeatureExtractStage:
    """Actor-pool stage: binary payload → embedding column
    (``list<float>``) — the layout that feeds the similarity-search
    operators. Real feature extraction (a vision model) is stubbed; the
    fake embedding is a sha1-seeded unit vector, deterministic per
    payload, so downstream ANN plumbing is exercised with stable
    values. In a real deployment the model loads ONCE per actor here
    (the reason this is a class, not a function)."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def _fake_embed(self, payload: bytes) -> list[float]:
        raw = b""
        seed = hashlib.sha1(payload or b"").digest()
        while len(raw) < self.dim:
            raw += seed
            seed = hashlib.sha1(seed).digest()
        vec = [((b / 255.0) * 2.0 - 1.0) for b in raw[:self.dim]]
        norm = sum(v * v for v in vec) ** 0.5 or 1.0
        return [round(v / norm, 6) for v in vec]

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = [self._fake_embed(p) for p in batch["payload"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "embedding": pa.array(embs, pa.list_(pa.float64())),
        })


def media_dataset_from_documents(ds: "rd.Dataset") -> "rd.Dataset":
    """Adapter: wrap documents.text bytes as a synthetic media table
    (exercises the binary-column plumbing against real testdata)."""

    def wrap(batch: pa.Table) -> pa.Table:
        payloads = [(t or "").encode() for t in batch["text"].to_pylist()]
        n = len(payloads)
        return pa.table({
            "media_id": batch["doc_id"],
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image"] * n, pa.string()),
            "mime": pa.array(["image/fake"] * n, pa.string()),
        })

    return ds.select_columns(["doc_id", "text"]).map_batches(
        wrap, batch_format="pyarrow")


def media_metadata(ds: "rd.Dataset", batch_size: int = 32,
                   concurrency: int = 2) -> "rd.Dataset":
    """documents → media payloads → decode-stub metadata."""
    return media_dataset_from_documents(ds).map_batches(
        MediaDecodeStage, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


# ---------------------------------------------------------------------------
# M26 completion: entropy-crop thumbnail (reference newspaperlite/
# images.py:43-79). The reference runs this on network-fetched top
# images; the network fetch stays excluded per the replay scope, but
# the ALGORITHM — squaring a tall image by repeatedly slicing 10 px
# off whichever end (top/bottom) has less histogram entropy, then
# shrinking into a 90×90 box — now runs for real over this repo's own
# decoders. Resampling divergence is documented on thumbnail_pixels.
# ---------------------------------------------------------------------------

def image_entropy(pixels: "np.ndarray") -> float:
    """Shannon entropy (bits) of the concatenated per-channel 256-bin
    histogram — exactly PIL ``Image.histogram()`` semantics on RGB
    input, which is what the reference's ``image_entropy``
    (images.py:49-56) computes."""
    hist = np.concatenate([
        np.bincount(pixels[..., c].ravel(), minlength=256)
        for c in range(pixels.shape[2])])
    total = int(hist.sum())
    if total == 0:
        return 0.0
    p = hist[hist > 0] / total
    return float(-(p * np.log2(p)).sum())


def square_image(pixels: "np.ndarray") -> "np.ndarray":
    """Square off a TALLER-than-wide image by removing 10-px slices
    from whichever end has less entropy (reference images.py:58-73,
    decision-for-decision: ``entropy(bottom) < entropy(top)`` removes
    the bottom). Wide or square images pass through unchanged, like
    the reference."""
    y, x = pixels.shape[:2]
    while y > x:
        s = min(y - x, 10)
        bottom, top = pixels[y - s:y], pixels[:s]
        if image_entropy(bottom) < image_entropy(top):
            pixels = pixels[:y - s]
        else:
            pixels = pixels[s:]
        y = pixels.shape[0]
    return pixels


def thumbnail_pixels(pixels: "np.ndarray",
                     box: tuple[int, int] = (90, 90)) -> "np.ndarray":
    """PIL ``.thumbnail`` box semantics — shrink-only, aspect
    preserved, both dims fit the box — with NEAREST-NEIGHBOR
    resampling (the reference uses ANTIALIAS; PIL is absent in this
    container, and the entropy-crop DECISIONS above are the replicated
    algorithm — the resample kernel is the documented divergence)."""
    y, x = pixels.shape[:2]
    scale = min(box[0] / x, box[1] / y, 1.0)
    if scale >= 1.0:
        return pixels
    tw, th = max(1, round(x * scale)), max(1, round(y * scale))
    yi = (np.arange(th) * y) // th
    xi = (np.arange(tw) * x) // tw
    return np.ascontiguousarray(pixels[yi][:, xi])


class ThumbnailStage:
    """Actor-pool stage: image payload → entropy-cropped 90×90-boxed
    thumbnail (BMP container — lossless, no second quantization pass).
    Emits the thumbnail payload, its dims, and how many rows the
    entropy crop trimmed (the reference-observable decision trace)."""

    def __init__(self, box: tuple[int, int] = (90, 90)):
        self.box = tuple(box)

    def _decode(self, payload: bytes) -> "np.ndarray":
        kind = sniff_format(payload)
        if kind == "bmp":
            return decode_bmp(payload)["pixels"]
        if kind == "jpeg":
            from .jpeg import decode_jpeg
            return decode_jpeg(payload)["pixels"]
        if kind == "png":
            from .png import decode_png
            return decode_png(payload)["pixels"]
        if kind == "ppm":
            return decode_ppm(payload)["pixels"]
        raise NotImplementedError(
            f"thumbnail supports BMP/JPEG/PNG/PPM payloads, got {kind}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, ws, hs, trims = [], [], [], []
        for p in batch["payload"].to_pylist():
            px = self._decode(p)
            in_rows = px.shape[0]
            sq = square_image(px)
            thumb = thumbnail_pixels(sq, self.box)
            payloads.append(encode_bmp(thumb))
            hs.append(thumb.shape[0])
            ws.append(thumb.shape[1])
            trims.append(in_rows - sq.shape[0])
        return pa.table({
            "media_id": batch["media_id"],
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "trimmed_rows": pa.array(trims, pa.int32()),
        })


# ---------------------------------------------------------------------------
# Perceptual image hashing (dHash) — near-dup dedup over DECODED pixels
# ---------------------------------------------------------------------------

def dhash64(px: np.ndarray) -> int:
    """64-bit difference hash (dHash — the standard perceptual
    image-dedup fingerprint: resized-gradient signs survive
    re-encoding, scaling and small edits that change every byte of
    the payload): integer ITU-R 601 luma, BLOCK-MEAN pooled to a
    9-column × 8-row grid (pooling, not nearest-sampling: cell means
    average out codec error — measured worst jpeg-roundtrip flip 3
    bits vs 10 for single-pixel sampling), one sign bit per
    adjacent-column pair, row-major MSB-first. Integer arithmetic
    end-to-end, so the hash is bit-reproducible across platforms."""
    r = px[..., 0].astype(np.int64)
    g = px[..., 1].astype(np.int64)
    b = px[..., 2].astype(np.int64)
    luma = (299 * r + 587 * g + 114 * b) // 1000
    h, w = luma.shape
    rb = (np.arange(9, dtype=np.int64) * h) // 8
    cb = (np.arange(10, dtype=np.int64) * w) // 9
    grid = np.empty((8, 9), np.int64)
    for i in range(8):
        for j in range(9):
            blk = luma[rb[i]:rb[i + 1], cb[j]:cb[j + 1]]
            grid[i, j] = blk.sum() // max(blk.size, 1)
    bits = (grid[:, 1:] > grid[:, :-1]).astype(np.uint64).reshape(-1)
    shifts = np.arange(63, -1, -1, dtype=np.uint64)
    return int((bits << shifts).sum(dtype=np.uint64))


def _decode_image_pixels(payload: bytes) -> np.ndarray:
    """RGB array via the repo's own decoders (the REAL decode path —
    a payload-hash could not see through re-encoding)."""
    kind = sniff_format(payload or b"")
    if kind == "jpeg":
        from .jpeg import decode_jpeg
        return decode_jpeg(payload)["pixels"]
    if kind == "png":
        from .png import decode_png
        return decode_png(payload)["pixels"]
    if kind == "gif":
        from .gif import decode_gif
        return decode_gif(payload)["pixels"]
    if kind == "bmp":
        return decode_bmp(payload)["pixels"]
    if kind == "ppm":
        return decode_ppm(payload)["pixels"]
    raise NotImplementedError(
        f"dhash needs a decodable still image (got {kind!r})")


class DHashStage:
    """Actor-pool stage: image payloads → (id, dhash) rows for
    :func:`dedup.hamming_pairs` (pigeonhole Hamming join). Decode
    happens HERE, once per image, inside the actor; only 8-byte codes
    leave the stage — the multimodal twin of text simhash dedup."""

    def __init__(self, *, id_col: str = "media_id",
                 payload_col: str = "payload"):
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        ids = batch[self.id_col].to_pylist()
        codes = np.empty(len(ids), np.uint64)
        for i, payload in enumerate(batch[self.payload_col].to_pylist()):
            codes[i] = dhash64(_decode_image_pixels(payload))
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "dhash": pa.array(codes)})


def image_neardup_reference(ids: list, payloads: list,
                            max_hamming: int = 10) -> "pd.DataFrame":
    """Single-process oracle for the dHash dedup path: decode + hash +
    brute-force all-pairs Hamming."""
    import pandas as pd
    codes = [dhash64(_decode_image_pixels(p)) for p in payloads]
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(codes[i] ^ codes[j]).count("1")
            if d <= max_hamming:
                a, b = sorted((ids[i], ids[j]))
                rows.append((a, b, d))
    out = pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])
    return out.astype({"doc_a": "int64", "doc_b": "int64",
                       "hamming": "int64"}) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def audio_dhash64(samples: np.ndarray) -> int:
    """64-bit spectral difference hash of a PCM signal — the audio
    sibling of :func:`dhash64` (a Chromaprint-style fingerprint
    reduced to one word): mono-mix, split into 8 equal time frames,
    rfft per frame, fold the spectrum into 9 equal energy bands
    (DC excluded), one sign bit per adjacent-band energy pair —
    frame-major, MSB first. Robust to gain changes (signs of energy
    RATIOS), to light additive noise, and to G.711 companding loss
    (measured 0 flipped bits across WAV→µ-law→AIFF round-trips of
    broadband content); different spectral content flips ~30 bits.
    Caveat: on near-silent bands (pure tones, silence) the sign bits
    are tie-breaks and unstable — the standard difference-hash
    limitation; production fingerprints add log-energy smoothing."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = len(x)
    if n < 16:
        x = np.pad(x, (0, 16 - n))
        n = 16
    frame_len = n // 8
    bits = np.empty((8, 8), dtype=np.uint64)
    for t in range(8):
        fr = x[t * frame_len:(t + 1) * frame_len]
        spec = np.abs(np.fft.rfft(fr))[1:]          # drop DC
        if len(spec) < 9:
            spec = np.pad(spec, (0, 9 - len(spec)))
        bands = np.array_split(spec ** 2, 9)
        e = np.array([b.sum() for b in bands])
        bits[t] = (e[1:] > e[:-1]).astype(np.uint64)
    flat = bits.reshape(-1)
    shifts = np.arange(63, -1, -1, dtype=np.uint64)
    return int((flat << shifts).sum(dtype=np.uint64))


class AudioDHashStage:
    """Actor-pool stage: audio payloads (WAV/AU/AIFF) → (id, dhash)
    rows for :func:`dedup.hamming_pairs` — decode + FFT stay inside
    the actor, 8-byte codes leave."""

    def __init__(self, *, id_col: str = "media_id",
                 payload_col: str = "payload"):
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        ids = batch[self.id_col].to_pylist()
        codes = np.empty(len(ids), np.uint64)
        for i, payload in enumerate(batch[self.payload_col].to_pylist()):
            d = _decode_audio(sniff_format(payload or b""), payload)
            codes[i] = audio_dhash64(d["samples"])
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "dhash": pa.array(codes)})


def audio_neardup_reference(ids: list, payloads: list,
                            max_hamming: int = 10) -> "pd.DataFrame":
    """Single-process oracle for the audio fingerprint dedup path."""
    import pandas as pd
    codes = []
    for p in payloads:
        d = _decode_audio(sniff_format(p or b""), p)
        codes.append(audio_dhash64(d["samples"]))
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            dist = bin(codes[i] ^ codes[j]).count("1")
            if dist <= max_hamming:
                a, b = sorted((ids[i], ids[j]))
                rows.append((a, b, dist))
    out = pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])
    return out.astype({"doc_a": "int64", "doc_b": "int64",
                       "hamming": "int64"}) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# frame keys pack (video_id, frame_idx) into one int64
VIDEO_FRAME_STRIDE = 1024


def select_frame(k: int, every: int = 1) -> bool:
    """Frame-sampling predicate shared by the distributed
    :class:`VideoFrameHashStage` AND the single-process
    :func:`video_neardup_reference`: keep frame ``k`` iff it sits on
    the ``every`` stride and fits the frame-key packing
    (``k < VIDEO_FRAME_STRIDE``). Sharing the predicate keeps the
    distributed Dice denominators and the pinned oracle in lockstep
    for long videos / sparse sampling."""
    return k % every == 0 and k < VIDEO_FRAME_STRIDE


class VideoFrameHashStage:
    """Actor-pool stage: video payloads (AVI/Y4M/MP4) → one
    (frame_key, dhash) row per sampled frame, where ``frame_key =
    video_id · 1024 + frame_idx`` — the frame-LEVEL input of
    :func:`dedup.hamming_pairs`. Video near-dup detection then scores
    each video pair by its fraction of Hamming-matched frames
    (tolerant of lossy re-encoding — jpeg-in-MP4 shifts a frame's
    block-mean dHash by ≤3 bits, far under unrelated-frame
    distances), regardless of container. Container walk + full frame
    decode + hashing stay inside the actor; 8-byte codes leave."""

    def __init__(self, *, id_col: str = "media_id",
                 payload_col: str = "payload",
                 every: int = 1):
        self.id_col = id_col
        self.payload_col = payload_col
        self.every = every

    def _frames(self, payload: bytes):
        kind = sniff_format(payload or b"")
        from . import video as vd
        if kind == "avi":
            return vd.avi_frames(payload)
        if kind == "y4m":
            return vd.y4m_frames(payload)
        if kind == "mp4":
            from . import mp4 as m4
            return m4.mp4_frames(payload)
        raise NotImplementedError(
            f"frame hashing needs a decodable container (got {kind!r})")

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        keys_out: list[int] = []
        hs_out: list[int] = []
        for vid, payload in zip(batch[self.id_col].to_pylist(),
                                batch[self.payload_col].to_pylist()):
            for k, fr in enumerate(self._frames(payload)):
                if not select_frame(k, self.every):
                    continue
                keys_out.append(vid * VIDEO_FRAME_STRIDE + k)
                hs_out.append(dhash64(fr["rgb"]))
        return pa.table({
            "frame_key": pa.array(keys_out, pa.int64()),
            "dhash": pa.array(np.array(hs_out, dtype=np.uint64))})


def video_neardup_reference(ids: list, payloads: list, *,
                            max_hamming: int = 3,
                            thr_micro: int = 400_000,
                            every: int = 1) -> "pd.DataFrame":
    """Single-process oracle for the frame-match video dedup path:
    decode + hash each SAMPLED frame (same :func:`select_frame`
    predicate as the distributed stage, so both sides agree on frame
    sets and Dice denominators), brute-force frame matches at Hamming
    ≤ d, Dice score per video pair = (matched_a + matched_b) /
    (n_a + n_b), keep ≥ thr."""
    import pandas as pd
    stage = VideoFrameHashStage(every=every)
    frames = {}
    for vid, p in zip(ids, payloads):
        frames[vid] = [dhash64(fr["rgb"])
                       for k, fr in enumerate(stage._frames(p))
                       if select_frame(k, every)]
    rows = []
    keys = sorted(frames)
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            a, b = keys[i], keys[j]
            ma = {ia for ia, ha in enumerate(frames[a])
                  if any(bin(ha ^ hb).count("1") <= max_hamming
                         for hb in frames[b])}
            mb = {ib for ib, hb in enumerate(frames[b])
                  if any(bin(ha ^ hb).count("1") <= max_hamming
                         for ha in frames[a])}
            na, nb = len(frames[a]), len(frames[b])
            if not (na + nb):
                continue
            dice = (len(ma) + len(mb)) * 1_000_000 // (na + nb)
            if dice >= thr_micro:
                rows.append((a, b, len(ma) + len(mb), na + nb, dice))
    out = pd.DataFrame(rows, columns=["doc_a", "doc_b", "matched",
                                      "total", "dice_micro"])
    return out.astype({c: "int64" for c in
                       ("doc_a", "doc_b", "matched", "total",
                        "dice_micro")}) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def score_video_pairs(fpairs: "pd.DataFrame", counts: dict, *,
                      thr_micro: int = 400_000) -> "pd.DataFrame":
    """Frame-match rows → per-video-pair Dice scores (the scoring tail
    shared by queries.q_media_video_dups and the conformance tests):
    ``fpairs`` is hamming_pairs' (doc_a, doc_b, hamming) over
    frame_keys, ``counts`` maps video_id → frame count. Returns
    (doc_a, doc_b, matched, total, dice_micro) with dice ≥ thr."""
    import pandas as pd
    empty = pd.DataFrame({c: pd.Series([], dtype="int64")
                          for c in ("doc_a", "doc_b", "matched",
                                    "total", "dice_micro")})
    if not len(fpairs):
        return empty
    va = fpairs["doc_a"].to_numpy() // VIDEO_FRAME_STRIDE
    vb = fpairs["doc_b"].to_numpy() // VIDEO_FRAME_STRIDE
    cross = va != vb
    fp = pd.DataFrame({
        "va": np.minimum(va[cross], vb[cross]),
        "vb": np.maximum(va[cross], vb[cross]),
        "fa": fpairs["doc_a"].to_numpy()[cross],
        "fb": fpairs["doc_b"].to_numpy()[cross]})
    if not len(fp):
        return empty
    g = fp.groupby(["va", "vb"]).agg(
        ma=("fa", "nunique"), mb=("fb", "nunique")).reset_index()
    na = g["va"].map(counts).astype("int64")
    nb = g["vb"].map(counts).astype("int64")
    g["matched"] = (g["ma"] + g["mb"]).astype("int64")
    g["total"] = (na + nb).astype("int64")
    g["dice_micro"] = (g["matched"] * 1_000_000
                       // g["total"]).astype("int64")
    g = g[g["dice_micro"] >= thr_micro]
    out = g.rename(columns={"va": "doc_a", "vb": "doc_b"})
    return out[["doc_a", "doc_b", "matched", "total", "dice_micro"]] \
        .astype("int64").sort_values(["doc_a", "doc_b"]) \
        .reset_index(drop=True)


def video_frame_counts(rows: "rd.Dataset") -> "rd.Dataset":
    """Per-video sampled-frame counts as a DATASET (vid, n) off the
    frame-hash rows — the distributed replacement for the driver-side
    counts dict (at corpus scale the video count is unbounded; only
    per-batch (vid, n) partials cross the shuffle)."""
    import pandas as pd

    def partial(t: "pa.Table") -> "pd.DataFrame":
        if not t.num_rows:
            return pd.DataFrame({"vid": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        fk = t["frame_key"].to_numpy(zero_copy_only=False)
        vids, cnts = np.unique(fk // VIDEO_FRAME_STRIDE,
                               return_counts=True)
        return pd.DataFrame({"vid": vids.astype("int64"),
                             "c": cnts.astype("int64")})

    from ..rayutil import bucketed_group_sum, project_blocks
    return project_blocks(
        bucketed_group_sum(
            rows.map_batches(partial, batch_format="pyarrow"),
            ["vid"], {"c": "n"}),
        ["vid", "n"]).repartition(4)


def score_video_pairs_ds(fpairs: "rd.Dataset", counts: "rd.Dataset", *,
                         thr_micro: int = 400_000) -> "rd.Dataset":
    """Distributed Dice scoring tail over the frame-pair Dataset —
    same semantics as :func:`score_video_pairs` (the single-process
    form kept for the pinned references) but the per-video-pair
    matched-frame nunique runs as a salted-bucket map_groups fold and
    the frame-count denominators attach via native joins, so no pair
    frame ever lands on the driver.

    ``fpairs``: (doc_a, doc_b, hamming) over frame_keys from
    dedup.hamming_pairs. ``counts``: (vid, n) from
    :func:`video_frame_counts`. Returns (doc_a, doc_b, matched,
    total, dice_micro) with dice ≥ thr, one row per video pair.
    Bucketing on va alone co-locates every row of a (va, vb) pair, so
    the in-bucket pandas nunique is exact."""
    import pandas as pd

    from ..rayutil import (light_shuffle_aggregators, project_blocks,
                           salt_bucket, shuffle_partitions)

    def _empty() -> "rd.Dataset":
        return rd.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "matched": pa.array([], pa.int64()),
            "total": pa.array([], pa.int64()),
            "dice_micro": pa.array([], pa.int64())}))

    def cross_video(t: "pa.Table") -> "pd.DataFrame":
        cols = ("va", "vb", "fa", "fb")
        if not t.num_rows:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        va, vb = a // VIDEO_FRAME_STRIDE, b // VIDEO_FRAME_STRIDE
        keep = va != vb
        a, b, va, vb = a[keep], b[keep], va[keep], vb[keep]
        out = pd.DataFrame({
            "va": np.minimum(va, vb).astype("int64"),
            "vb": np.maximum(va, vb).astype("int64"),
            "fa": a.astype("int64"), "fb": b.astype("int64")})
        out["bucket"] = salt_bucket(out["va"].to_numpy()) if len(out) \
            else pd.Series([], dtype="int32")
        return out

    def dice_fold(g: "pd.DataFrame") -> "pd.DataFrame":
        cols = ("va", "vb", "ma", "mb")
        if not len(g) or "va" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        s = g.groupby(["va", "vb"], as_index=False).agg(
            ma=("fa", "nunique"), mb=("fb", "nunique"))
        return s.astype({c: "int64" for c in cols})

    scored = project_blocks(
        fpairs.map_batches(cross_video, batch_format="pyarrow")
        .groupby("bucket").map_groups(dice_fold, batch_format="pandas"),
        ["va", "vb", "ma", "mb"]) \
        .repartition(shuffle_partitions(0.25)).materialize()
    cnt = counts.materialize()
    if scored.count() == 0 or cnt.count() == 0:
        return _empty()
    na = cnt.map_batches(
        lambda t: pa.table({"va": t["vid"], "na": t["n"]}),
        batch_format="pyarrow")
    nb = cnt.map_batches(
        lambda t: pa.table({"vb": t["vid"], "nb": t["n"]}),
        batch_format="pyarrow")

    def finish(t: "pa.Table") -> "pa.Table":
        ma = t["ma"].to_numpy(zero_copy_only=False)
        mb = t["mb"].to_numpy(zero_copy_only=False)
        na_ = t["na"].to_numpy(zero_copy_only=False)
        nb_ = t["nb"].to_numpy(zero_copy_only=False)
        matched = (ma + mb).astype(np.int64)
        total = (na_ + nb_).astype(np.int64)
        dice = matched * 1_000_000 // total
        keep = dice >= thr_micro
        return pa.table({
            "doc_a": pa.array(t["va"].to_numpy(
                zero_copy_only=False)[keep].astype(np.int64)),
            "doc_b": pa.array(t["vb"].to_numpy(
                zero_copy_only=False)[keep].astype(np.int64)),
            "matched": pa.array(matched[keep]),
            "total": pa.array(total[keep]),
            "dice_micro": pa.array(dice[keep])})

    with light_shuffle_aggregators():
        return scored.join(na, join_type="inner",
                           num_partitions=shuffle_partitions(0.25),
                           on=("va",)) \
            .join(nb, join_type="inner",
                  num_partitions=shuffle_partitions(0.25),
                  on=("vb",)) \
            .map_batches(finish, batch_format="pyarrow").materialize()
