"""Mergeable sketches for approximate aggregates at scale.

HyperLogLog (Flajolet et al. 2007): one dense sketch per batch inside
``map_batches`` (the cheap, shuffle-free part), merged in a tiny second
stage — the canonical sketch pattern for 100 TB aggregation (one
register array per batch moves, not one row per value).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


class HyperLogLog:
    """Dense HLL with 2^p registers (p=12 → ~1.6% relative error)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if p == 4:
            self.alpha = 0.673
        elif p == 5:
            self.alpha = 0.697
        elif p == 6:
            self.alpha = 0.709
        else:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)

    def add_hashed(self, hashes: np.ndarray) -> None:
        """hashes: uint64 array."""
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (hashes << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining 64-p bits + 1
        lz = np.zeros(len(rest), dtype=np.uint8)
        work = rest.copy()
        mask_hi = np.uint64(1) << np.uint64(63)
        remaining = np.ones(len(rest), dtype=bool)
        for i in range(64 - self.p + 1):
            top_clear = (work & mask_hi) == 0
            inc = remaining & top_clear
            lz[inc] += 1
            remaining &= top_clear
            work = work << np.uint64(1)
            if not remaining.any():
                break
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def add(self, values) -> None:
        hashes = np.fromiter(
            (int.from_bytes(hashlib.sha1(str(v).encode()).digest()[:8], "big")
             for v in values), dtype=np.uint64)
        if len(hashes):
            self.add_hashed(hashes)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        est = self.alpha * self.m * self.m / np.sum(
            np.power(2.0, -self.registers.astype(np.float64)))
        if est <= 2.5 * self.m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                est = self.m * np.log(self.m / zeros)
        return float(est)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "HyperLogLog":
        h = cls(blob[0])
        h.registers = np.frombuffer(blob[1:], dtype=np.uint8).copy()
        return h


def approx_distinct_tokens(ds: "rd.Dataset", text_col: str = "text",
                           p: int = 12) -> float:
    """Approximate count of distinct whitespace tokens across the corpus:
    per-batch HLL partial sketches → driver merge (mergeable-sketch
    aggregation; the shuffle carries 4 KB per batch)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = HyperLogLog(p)
        toks = set()
        for t in batch[text_col].fillna(""):
            toks.update(t.split())
        h.add(toks)
        return pd.DataFrame({"sketch": [h.serialize()]})

    parts = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    merged = HyperLogLog(p)
    for blob in parts["sketch"]:
        merged.merge(HyperLogLog.deserialize(blob))
    return merged.estimate()


def _mg_trim(counts: dict, k: int) -> dict:
    """Misra-Gries reduction to ≤ k counters: subtract the (k+1)-th
    largest count from every counter and drop non-positives. Each trim
    lowers every surviving count by at most the subtracted threshold,
    and the sum of all thresholds applied anywhere is ≤ N/(k+1) — the
    classic frequent-items guarantee."""
    if len(counts) <= k:
        return dict(counts)
    vals = np.sort(np.fromiter(counts.values(), dtype=np.int64))
    thr = int(vals[len(vals) - k - 1])
    return {t: c - thr for t, c in counts.items() if c > thr}


def heavy_hitters(ds: "rd.Dataset", *, k: int = 256,
                  text_col: str = "text") -> pd.DataFrame:
    """Approximate frequent tokens via mergeable Misra-Gries summaries
    (Misra & Gries 1982; mergeability per Agarwal et al. 2012):
    per-batch exact counts trimmed to ≤ k counters inside
    ``map_batches`` → native ``groupby(item).sum`` over ≤ k rows per
    batch (the shuffle carries k rows per batch, never one per token)
    → one final driver trim of the ≤ k·n_batches merged counters.

    Returns (item, n_min): LOWER-BOUND counts; any token whose true
    frequency exceeds N/(k+1) is guaranteed present. The exact twin is
    ``q_top_tokens`` (full groupby), which pins this sketch's accuracy
    in tests."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def summarize(batch: pd.DataFrame) -> pd.DataFrame:
        counts: Counter = Counter()
        for t in batch[text_col].fillna(""):
            counts.update(t.split())
        trimmed = _mg_trim(counts, k)
        return pd.DataFrame({
            "item": list(trimmed),
            "n": pd.Series(list(trimmed.values()), dtype="int64")})

    merged = ds.select_columns([text_col]) \
        .map_batches(summarize, batch_format="pandas") \
        .groupby("item").aggregate(Sum("n", alias_name="n")).to_pandas()
    final = _mg_trim(dict(zip(merged["item"], merged["n"])), k)
    out = pd.DataFrame({
        "item": list(final),
        "n_min": pd.Series(list(final.values()), dtype="int64")})
    return out.sort_values(["n_min", "item"],
                           ascending=[False, True]).reset_index(drop=True)
