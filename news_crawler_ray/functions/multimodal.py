"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by actor-pool ``map_batches`` stages.

The image/audio decode libraries are not available in this container, so
the decode kernels are STUBS behind an import-try (real decode raises
``NotImplementedError`` with instructions; the deterministic fake decoder
derives metadata from the payload bytes) — while all the Ray-side
plumbing is real and tested: schemas, small batch sizes for wide binary
rows (SURVEY.md §7.4 item 6), actor signatures, output layout.
"""

from __future__ import annotations

import hashlib

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


class MediaDecodeStage:
    """Actor-pool stage: binary payload → typed metadata columns.

    Use ``map_batches(MediaDecodeStage, batch_size=SMALL, concurrency=N,
    batch_format="pyarrow")`` — batch_size stays small because each row
    carries a multi-KB/MB payload and batch×concurrency must fit the
    worker heap."""

    def __init__(self, real_decode: bool = False):
        if real_decode and not _HAS_PIL:
            raise NotImplementedError(
                "real image decode needs PIL/ffmpeg, absent here; use "
                "real_decode=False for the deterministic fake decoder")
        self.real_decode = real_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [fake_decode_meta(p) for p in batch["payload"].to_pylist()]
        out = pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "byte_len": pa.array([m["byte_len"] for m in metas], pa.int64()),
            "sha1_prefix": pa.array([m["sha1_prefix"] for m in metas], pa.string()),
            "width": pa.array([m["width"] for m in metas], pa.int32()),
            "height": pa.array([m["height"] for m in metas], pa.int32()),
            "n_frames": pa.array([m["n_frames"] for m in metas], pa.int32()),
        })
        return out   # payload projected away: downstream is metadata-only


class FrameSampleStage:
    """Actor-pool stage: sample every k-th frame of a (fake-decoded)
    video payload → one row per sampled frame. Real frame extraction is
    stubbed (no ffmpeg); the explode layout and schema are real."""

    def __init__(self, every_k: int = 10):
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, hashes = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            meta = fake_decode_meta(payload)
            for f in range(0, meta["n_frames"], self.every_k):
                ids.append(mid)
                frames.append(f)
                hashes.append(hashlib.sha1(
                    (payload or b"") + f.to_bytes(4, "big")).hexdigest()[:16])
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "frame_idx": pa.array(frames, pa.int32()),
                         "frame_hash": pa.array(hashes, pa.string())})


class ResizeStage:
    """Actor-pool stage: binary payload → resized binary payload +
    output dims — the binary→binary shape (unlike decode, the payload
    stays in flight, so ``batch_size × concurrency × payload`` must fit
    the worker heap; callers keep batch_size small). Real resampling is
    stubbed (no PIL); the fake transform is deterministic: output bytes
    are a sha1-keyed digest stream proportional to the target area, so
    size/layout behavior is realistic."""

    def __init__(self, target_w: int = 32, target_h: int = 32,
                 real_decode: bool = False):
        if real_decode:
            # no real resampling implementation exists yet (and PIL is
            # absent in this container anyway) — refuse loudly rather
            # than silently emitting fake payloads the caller believes
            # are real resized images
            raise NotImplementedError(
                "real image resize is not implemented (needs PIL); use "
                "real_decode=False for the deterministic fake")
        self.target_w = target_w
        self.target_h = target_h

    def _fake_resize(self, payload: bytes) -> bytes:
        n = max(1, (self.target_w * self.target_h) // 20)
        seed = hashlib.sha1((payload or b"") +
                            bytes([self.target_w % 256,
                                   self.target_h % 256])).digest()
        reps = (n // len(seed)) + 1
        return (seed * reps)[:n]

    def __call__(self, batch: pa.Table) -> pa.Table:
        resized = [self._fake_resize(p)
                   for p in batch["payload"].to_pylist()]
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
