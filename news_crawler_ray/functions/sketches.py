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
    # an EMPTY corpus yields a zero-block dataset (no 'sketch' column)
    for blob in (parts["sketch"] if "sketch" in parts.columns else ()):
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
    if "item" not in merged.columns:   # empty corpus → zero-block output
        merged = pd.DataFrame({"item": pd.Series([], dtype="object"),
                               "n": pd.Series([], dtype="int64")})
    final = _mg_trim(dict(zip(merged["item"], merged["n"])), k)
    out = pd.DataFrame({
        "item": list(final),
        "n_min": pd.Series(list(final.values()), dtype="int64")})
    return out.sort_values(["n_min", "item"],
                           ascending=[False, True]).reset_index(drop=True)


class BloomFilter:
    """Plain Bloom filter over uint64 key hashes: numpy bit array,
    ``k`` probes derived from one md5-based 128-bit hash (double
    hashing h1 + i·h2, Kirsch & Mitzenmacher 2006). Mergeable by OR —
    per-batch partial filters union on the driver, so building is one
    map pass and the broadcast is ``m/8`` bytes (10 bits/key ≈ 1%
    false positives): at 10^9 keys that is ~1.2 GB where a Python set
    would be tens of GB — the difference between a broadcastable and
    an unbroadcastable join prefilter."""

    def __init__(self, m_bits: int, k: int = 7):
        self.m = int(m_bits)
        self.k = k
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    @staticmethod
    def _hash2(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Two independent vectorized 64-bit mixes (splitmix64
        finalizer, Steele et al. 2014) — the probe side runs per batch
        in the hot path, so hashing must stay numpy-vectorized (uint64
        arithmetic wraps, which is exactly what the mix wants)."""
        x = keys.astype(np.uint64)
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h1 = z ^ (z >> np.uint64(31))
        z2 = (x ^ np.uint64(0xD6E8FEB86659FD93)) \
            * np.uint64(0xC2B2AE3D27D4EB4F)
        z2 = (z2 ^ (z2 >> np.uint64(29))) * np.uint64(0x165667B19E3779F9)
        h2 = (z2 ^ (z2 >> np.uint64(32))) | np.uint64(1)
        return h1, h2

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1, h2 = self._hash2(keys)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m))

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(np.asarray(keys)).ravel()
        np.bitwise_or.at(self.bits, (pos // 64).astype(np.int64),
                         np.uint64(1) << (pos % 64))

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership: False ⇒ definitely absent (safe to
        prune); True ⇒ present or false positive (verify exactly)."""
        pos = self._positions(np.asarray(keys))
        word = self.bits[(pos // 64).astype(np.int64)]
        hit = (word >> (pos % 64)) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self.bits |= other.bits
        return self

    def serialize(self) -> bytes:
        return (self.m.to_bytes(8, "big") + bytes([self.k])
                + self.bits.tobytes())

    @classmethod
    def deserialize(cls, blob: bytes) -> "BloomFilter":
        b = cls(int.from_bytes(blob[:8], "big"), blob[8])
        b.bits = np.frombuffer(blob[9:], dtype=np.uint64).copy()
        return b


def build_bloom(ds: "rd.Dataset", *, key_col: str, m_bits: int,
                k: int = 7) -> BloomFilter:
    """Distributed Bloom build: per-batch partial filters OR-merged on
    the driver (each partial is m/8 bytes, same pattern as the HLL
    merge). The result is broadcast (`ray.put`) and probed per batch to
    prune a big join side before the shuffle — false positives only
    reduce pruning, never correctness, so the downstream exact join
    keeps the result oracle-exact."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = BloomFilter(m_bits, k)
        b.add(batch[key_col].to_numpy())
        return pd.DataFrame({"sketch": [b.serialize()]})

    parts = ds.select_columns([key_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    merged = BloomFilter(m_bits, k)
    # an EMPTY key table yields a zero-block dataset (no 'sketch' column)
    for blob in (parts["sketch"] if "sketch" in parts.columns else ()):
        merged.merge(BloomFilter.deserialize(blob))
    return merged


class TDigest:
    """Compact mergeable quantile sketch (Dunning & Ertl 2019 t-digest,
    k1 scale function): centroids (mean, weight) kept small near the
    tails and coarse in the middle, so tail quantiles stay accurate at
    a fixed memory budget. This is the documented scale path of
    ``windows.exact_quantiles`` for HIGH-cardinality/continuous columns,
    where the exact value-count histogram stops being small."""

    def __init__(self, delta: int = 100):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.int64)

    def add_values(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]   # NULLs arrive as NaN; one would poison
        self._absorb(v, np.ones(len(v), dtype=np.int64))   # every mean

    def merge(self, other: "TDigest") -> "TDigest":
        self._absorb(other.means, other.weights)
        return self

    def _absorb(self, means: np.ndarray, weights: np.ndarray) -> None:
        m = np.concatenate([self.means, means])
        w = np.concatenate([self.weights, weights])
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        n = int(w.sum())
        if n == 0:
            return
        # Recompress by binning sorted points into unit cells of the k1
        # scale function k(q) = (δ/2π)·asin(2q−1): cells are narrow at
        # the tails, wide mid-range, and k's total range is δ/2, so the
        # centroid count is bounded by ~δ/2+1 regardless of n. Fully
        # vectorized (argsort + bincount), no per-point Python loop.
        q_left = (np.cumsum(w) - w) / n
        k = (self.delta / (2.0 * np.pi)) \
            * np.arcsin(np.clip(2.0 * q_left - 1.0, -1.0, 1.0))
        cell = np.floor(k).astype(np.int64)
        _, inv = np.unique(cell, return_inverse=True)
        wf = w.astype(np.float64)
        wsum = np.bincount(inv, weights=wf)
        msum = np.bincount(inv, weights=m * wf)
        self.means = msum / wsum
        self.weights = np.round(wsum).astype(np.int64)

    def quantile(self, q: float) -> float:
        if not len(self.means):
            return float("nan")
        n = int(self.weights.sum())
        target = q * (n - 1)
        # centroid midpoint ranks, linear interpolation between them
        cum = np.cumsum(self.weights) - self.weights / 2.0
        return float(np.interp(target, cum, self.means))

    def serialize(self) -> bytes:
        return (self.delta.to_bytes(4, "big")
                + len(self.means).to_bytes(4, "big")
                + self.means.tobytes() + self.weights.tobytes())

    @classmethod
    def deserialize(cls, blob: bytes) -> "TDigest":
        d = cls(int.from_bytes(blob[:4], "big"))
        k = int.from_bytes(blob[4:8], "big")
        d.means = np.frombuffer(blob[8:8 + 8 * k],
                                dtype=np.float64).copy()
        d.weights = np.frombuffer(blob[8 + 8 * k:8 + 16 * k],
                                  dtype=np.int64).copy()
        return d


def approx_quantiles(ds: "rd.Dataset", *, value_col: str,
                     qs: list[float], delta: int = 200) -> pd.DataFrame:
    """Approximate quantiles of a (possibly continuous) column:
    per-batch t-digests → driver merge — the same mergeable-sketch
    shape as the HLL/Bloom builds (one ~3 KB digest per batch crosses
    the wire). Exact twin: ``windows.exact_quantiles`` pins the rank
    error in tests."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = TDigest(delta)
        d.add_values(batch[value_col].to_numpy(dtype=np.float64))
        return pd.DataFrame({"sketch": [d.serialize()]})

    parts = ds.select_columns([value_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    merged = TDigest(delta)
    # an EMPTY value table yields a zero-block dataset (no 'sketch')
    for blob in (parts["sketch"] if "sketch" in parts.columns else ()):
        merged.merge(TDigest.deserialize(blob))
    return pd.DataFrame({
        "q": pd.Series(qs, dtype="float64"),
        "val": pd.Series([merged.quantile(q) for q in qs],
                         dtype="float64")})


def grouped_approx_quantiles(ds: "rd.Dataset", *, key_col: str,
                             value_col: str, qs: list[float],
                             delta: int = 200) -> pd.DataFrame:
    """Approximate per-key quantiles — the sketch twin of
    ``windows.grouped_quantiles`` for HIGH-cardinality or continuous
    values, where the exact (key, value) histogram is no longer small.
    Same mergeable shape as :func:`grouped_hll_distinct`: one ~3 KB
    serialized t-digest row per (key, batch) crosses the wire
    (value-cardinality independent), one ``groupby(key)`` merges
    digests per key in map_groups, and the driver sees only
    keys × qs result rows. Rank error is pinned against the exact
    twin in tests."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out_k, out_s = [], []
        for key, g in batch.groupby(key_col, sort=False):
            d = TDigest(delta)
            d.add_values(g[value_col].to_numpy(dtype=np.float64))
            out_k.append(key)
            out_s.append(d.serialize())
        return pd.DataFrame({key_col: pd.Series(out_k, dtype="object"),
                             "sketch": pd.Series(out_s, dtype="object")})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = TDigest(delta)
        for blob in g["sketch"]:
            m.merge(TDigest.deserialize(blob))
        return pd.DataFrame({
            key_col: pd.Series([g[key_col].iloc[0]] * len(qs),
                               dtype="object"),
            "q": pd.Series(qs, dtype="float64"),
            "val": pd.Series([m.quantile(q) for q in qs],
                             dtype="float64")})

    out = ds.select_columns([key_col, value_col]) \
        .map_batches(partial, batch_format="pandas") \
        .groupby(key_col).map_groups(merge, batch_format="pandas") \
        .to_pandas()
    if key_col not in out.columns or not len(out):
        return pd.DataFrame({key_col: pd.Series([], dtype="object"),
                             "q": pd.Series([], dtype="float64"),
                             "val": pd.Series([], dtype="float64")})
    return out.sort_values([key_col, "q"]).reset_index(drop=True)


def grouped_hll_distinct(ds: "rd.Dataset", *, key_col: str,
                         value_col: str, p: int = 12) -> pd.DataFrame:
    """Approximate ``count(DISTINCT value) GROUP BY key`` — the sketch
    twin of ``windows.grouped_distinct_count`` (pinned against it in
    tests): per batch, one serialized HLL row PER KEY (vectorized
    md5-hash of the batch's values, bucketed by key), then a single
    ``groupby(key)`` whose groups carry ~4 KB sketches instead of value
    sets — the shuffle volume is O(keys × batches), independent of the
    value cardinality that breaks exact grouped distinct on hot keys.
    Driver folds nothing: merge happens in map_groups; the returned
    frame is one row per key."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out_k, out_s = [], []
        for key, g in batch.groupby(key_col, sort=False):
            h = HyperLogLog(p)
            h.add(g[value_col].astype(str).to_numpy())
            out_k.append(key)
            out_s.append(h.serialize())
        return pd.DataFrame({key_col: pd.Series(out_k, dtype="object"),
                             "sketch": pd.Series(out_s, dtype="object")})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = HyperLogLog(p)
        for blob in g["sketch"]:
            m.merge(HyperLogLog.deserialize(blob))
        return pd.DataFrame({key_col: [g[key_col].iloc[0]],
                             "n_distinct_approx": [m.estimate()]})

    out = ds.select_columns([key_col, value_col]) \
        .map_batches(partial, batch_format="pandas") \
        .groupby(key_col).map_groups(merge, batch_format="pandas") \
        .to_pandas()
    if key_col not in out.columns:   # empty input → typed empty frame
        return pd.DataFrame({key_col: pd.Series([], dtype="object"),
                             "n_distinct_approx": pd.Series(
                                 [], dtype="float64")})
    return out.sort_values(key_col).reset_index(drop=True)


class CountMinSketch:
    """Count-min sketch (Cormode'05): mergeable frequency estimator —
    ``estimate(x) ≥ true(x)`` always (one-sided error), over-count
    bounded by ε·N with probability 1-δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.
    The companion of Misra-Gries in the sketch suite: MG answers "which
    items are heavy", CMS answers "how often is THIS item" without
    storing the item set. Row hashing is the Bloom double-hash trick
    (two sha1-derived 64-bit lanes, row i uses h1 + i·h2)."""

    def __init__(self, width: int = 2048, depth: int = 4):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)

    @staticmethod
    def _hash2(keys) -> tuple[np.ndarray, np.ndarray]:
        h1 = np.empty(len(keys), dtype=np.uint64)
        h2 = np.empty(len(keys), dtype=np.uint64)
        for i, k in enumerate(keys):
            d = hashlib.sha1(str(k).encode()).digest()
            h1[i] = int.from_bytes(d[:8], "big")
            h2[i] = int.from_bytes(d[8:16], "big") | 1
        return h1, h2

    def _positions(self, keys) -> np.ndarray:
        h1, h2 = self._hash2(keys)
        rows = np.arange(self.depth, dtype=np.uint64)[:, None]
        return ((h1[None, :] + rows * h2[None, :])
                % np.uint64(self.width)).astype(np.int64)

    def add(self, keys, counts=None) -> None:
        if not len(keys):
            return
        pos = self._positions(keys)
        c = (np.ones(len(keys), dtype=np.int64) if counts is None
             else np.asarray(counts, dtype=np.int64))
        for i in range(self.depth):
            np.add.at(self.table[i], pos[i], c)

    def estimate(self, keys) -> np.ndarray:
        if not len(keys):
            return np.zeros(0, dtype=np.int64)
        pos = self._positions(keys)
        return np.min(self.table[np.arange(self.depth)[:, None], pos],
                      axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.width, self.depth) == (other.width, other.depth)
        self.table += other.table
        return self

    def serialize(self) -> bytes:
        import struct
        return struct.pack("<ii", self.width, self.depth) \
            + self.table.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "CountMinSketch":
        import struct
        w, d = struct.unpack("<ii", blob[:8])
        s = cls(width=w, depth=d)
        s.table = np.frombuffer(blob[8:], dtype=np.int64) \
            .reshape(d, w).copy()
        return s


def approx_token_freq(ds: "rd.Dataset", queries: list[str], *,
                      text_col: str = "text", width: int = 2048,
                      depth: int = 4) -> pd.DataFrame:
    """Approximate per-token frequencies for a fixed query list via a
    distributed count-min sketch: each batch folds its token counts into
    ONE serialized sketch row (width·depth int64s, constant per batch,
    vocabulary-independent — the point vs shipping per-token partials),
    the driver merges ~num_batches sketches and answers the queries.
    One-sided error: estimates never undercount; overcount ≤ εN is
    pinned against exact counts in tests."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cms = CountMinSketch(width=width, depth=depth)
        counts: dict[str, int] = {}
        for t in batch[text_col].fillna(""):
            for tok in t.split():
                counts[tok] = counts.get(tok, 0) + 1
        if counts:
            cms.add(list(counts), np.fromiter(counts.values(),
                                              dtype=np.int64,
                                              count=len(counts)))
        return pd.DataFrame({"sketch": [cms.serialize()]})

    parts = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    merged = CountMinSketch(width=width, depth=depth)
    for blob in (parts["sketch"] if "sketch" in parts.columns else ()):
        merged.merge(CountMinSketch.deserialize(blob))
    return pd.DataFrame({
        "token": pd.Series(queries, dtype="object"),
        "freq_est": pd.Series(merged.estimate(queries), dtype="int64")})


def grouped_heavy_hitters(ds: "rd.Dataset", *, key_col: str,
                          text_col: str = "text", k: int = 256,
                          top_n: int | None = None,
                          num_buckets: int = 64) -> "rd.Dataset":
    """Per-KEY frequent tokens via mergeable Misra-Gries summaries —
    the grouped companion of :func:`heavy_hitters` (per-language /
    per-domain vocabulary profiles). Per batch, each key's token counts
    are trimmed to ≤ k counters, so the shuffle carries ≤ k rows per
    (key, batch); summaries are KEY-bucketed (every row of a key lands
    in one bucket) and merged with one vectorized pandas groupby + one
    final per-key trim — no two-key native groupby (the pair-hash
    lesson: Ray's multi-key sort aggregate is the slow path), no per-key
    map_groups.

    Counts are MG lower bounds; any token with true in-key frequency
    > N_key/(k+1) is guaranteed present, and counts are exact whenever
    a key's distinct-token count is ≤ k (no trim ever fires — the
    property the DuckDB twin relies on at fixture vocabulary).
    ``top_n`` keeps each key's n leaders (n_min desc, item asc) after
    the merge. Returns (key_col, item, n_min)."""
    from collections import Counter

    from ..rayutil import salt_bucket

    def summarize(batch: pd.DataFrame) -> pd.DataFrame:
        keys_out: list = []
        items: list[str] = []
        ns: list[int] = []
        for key, g in batch.groupby(key_col):
            counts: Counter = Counter()
            for t in g[text_col].fillna(""):
                counts.update(t.split())
            for item, c in _mg_trim(counts, k).items():
                keys_out.append(key)
                items.append(item)
                ns.append(c)
        out = pd.DataFrame({
            key_col: pd.Series(keys_out, dtype="object"),
            "item": pd.Series(items, dtype="object"),
            "n": pd.Series(ns, dtype="int64")})
        out["bucket"] = salt_bucket(out[key_col].to_numpy(),
                                    num_buckets) if len(out) \
            else pd.Series([], dtype="int32")
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        merged = g.groupby([key_col, "item"], as_index=False)["n"].sum()
        for key, kg in merged.groupby(key_col):
            final = _mg_trim(dict(zip(kg["item"], kg["n"])), k)
            fin = pd.DataFrame({
                key_col: key, "item": list(final),
                "n_min": pd.Series(list(final.values()), dtype="int64")})
            fin = fin.sort_values(["n_min", "item"],
                                  ascending=[False, True])
            rows.append(fin.head(top_n) if top_n else fin)
        if not rows:
            return pd.DataFrame({
                key_col: pd.Series([], dtype="object"),
                "item": pd.Series([], dtype="object"),
                "n_min": pd.Series([], dtype="int64")})
        return pd.concat(rows, ignore_index=True)

    return ds.select_columns([key_col, text_col]) \
        .map_batches(summarize, batch_format="pandas") \
        .groupby("bucket").map_groups(merge, batch_format="pandas")
