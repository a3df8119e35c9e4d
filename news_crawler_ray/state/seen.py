"""Sharded URL-seen set: approximate filter + exact sidecar, as Ray actors.

Replaces the reference's ``url TEXT UNIQUE`` + ``INSERT OR IGNORE``
seen-set (abstract_datacollector.py:126-138, _datacollector_statements.py:13)
with the north_rule design: keys are ``sha1(canonical_url)``
(urlnorm.url_key), hash-partitioned across shards
(``url_shard``), each shard a named actor holding

- a Bloom filter (numpy bit array, double hashing off the sha1 key) — the
  O(1) scale path; "definitely absent" admits without touching the exact
  structure;
- an exact key set — guarantees the reference's exact-membership
  semantics (no false positives, SURVEY.md §2.5 note). At 10^10 URLs /
  256 shards ≈ 40M 20-byte keys per shard the exact set is ~a few GB and
  spills to its Parquet snapshot; the Bloom filter absorbs the lookup
  traffic.

Shards snapshot to Parquet (one file per shard per checkpoint) and
restore for resume (north_rule resumability).

Scale notes: one RPC per (caller batch × shard) — callers group keys by
shard before calling (pipelines/crawl.py), so traffic is O(batches),
not O(urls).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray


class BloomFilter:
    """Bloom filter over 20-byte sha1 keys; k hash functions derived from
    the key bytes themselves (no re-hashing — the key IS a hash)."""

    def __init__(self, capacity: int, error_rate: float = 0.001):
        n_bits = max(64, int(-capacity * np.log(error_rate) / (np.log(2) ** 2)))
        self.n_bits = 1 << int(np.ceil(np.log2(n_bits)))  # power of two
        self.k = max(1, int(round(self.n_bits / capacity * np.log(2)))) if capacity else 4
        self.k = min(self.k, 8)
        self.bits = np.zeros(self.n_bits // 8, dtype=np.uint8)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """keys: (n, 20) uint8 → (n, k) bit positions via double hashing
        h1 + i*h2 with h1/h2 from sha1 bytes."""
        h1 = keys[:, :8].copy().view(np.uint64).reshape(-1)
        h2 = keys[:, 8:16].copy().view(np.uint64).reshape(-1) | np.uint64(1)
        idx = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + idx[None, :] * h2[:, None]) % np.uint64(self.n_bits)

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).reshape(-1)
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         (1 << (pos & np.uint64(7))).astype(np.uint8))

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=1).astype(bool)


class SeenSet:
    """Single-shard seen-set core (plain object — the actor wraps it, and
    tests / the single-process oracle use it directly).

    Approximate layer: cuckoo filter (north_star structure; deletions
    supported) by default, Bloom as an alternative — either way "filter
    says absent" admits without touching the exact set, and the exact
    set guarantees reference-equal membership (no false positives,
    SURVEY.md §2.5). A saturated cuckoo filter degrades gracefully to
    exact-only lookups."""

    def __init__(self, shard_id: int = 0, capacity: int = 1 << 20,
                 filter_kind: str = "cuckoo"):
        from .cuckoo import CuckooFilter
        self.shard_id = shard_id
        self.filter_kind = filter_kind
        if filter_kind == "cuckoo":
            self.cuckoo: CuckooFilter | None = CuckooFilter(capacity)
            self.bloom = None
        else:
            self.cuckoo = None
            self.bloom = BloomFilter(capacity)
        self.exact: set[bytes] = set()

    @staticmethod
    def _as_matrix(keys: list[bytes]) -> np.ndarray:
        return np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(-1, 20)

    def add_if_absent(self, keys: list[bytes]) -> list[bool]:
        """For each key return True if it was new (admitted), handling
        intra-batch duplicates (first occurrence wins) — the INSERT OR
        IGNORE semantics of the reference."""
        if not keys:
            return []
        if self.cuckoo is not None:
            maybe = self.cuckoo.might_contain_many(keys)
        else:
            maybe = self.bloom.might_contain(self._as_matrix(keys))
        out = []
        new_idx = []
        for i, key in enumerate(keys):
            if maybe[i] and key in self.exact:
                out.append(False)
            elif key in self.exact:  # filter false negative impossible; safety
                out.append(False)
            else:
                self.exact.add(key)
                new_idx.append(i)
                out.append(True)
        if new_idx:
            if self.cuckoo is not None:
                for i in new_idx:
                    if not self.cuckoo.add(keys[i]):
                        break   # saturated: exact set remains authoritative
            else:
                self.bloom.add(self._as_matrix(keys)[new_idx])
        return out

    def contains(self, keys: list[bytes]) -> list[bool]:
        return [k in self.exact for k in keys]

    def count(self) -> int:
        return len(self.exact)

    def snapshot(self, path: str) -> int:
        tmp = path + ".tmp"
        pq.write_table(pa.table({"key": pa.array(sorted(self.exact), pa.binary(20))}), tmp)
        os.replace(tmp, path)
        return len(self.exact)

    def restore(self, path: str) -> int:
        keys = pq.read_table(path)["key"].to_pylist()
        self.exact = set(keys)
        if keys:
            if self.cuckoo is not None:
                for k in keys:
                    if not self.cuckoo.add(k):
                        break
            else:
                self.bloom.add(self._as_matrix(keys))
        return len(keys)


@ray.remote(num_cpus=0.25)
class SeenShard(SeenSet):
    """Named long-lived actor (SURVEY.md §7.2): one per url-hash shard."""
    pass
