"""Cuckoo filter (Fan et al., CoNEXT 2014): approximate membership with
deletion support — the north_star's seen-set filter structure.

Numpy table of (num_buckets × bucket_size) uint16 fingerprints; two
candidate buckets per key (partial-key cuckoo hashing:
``i2 = i1 XOR hash(fp)``); bounded eviction with a DETERMINISTIC kick
sequence (no RNG — resume/replay must be reproducible, FIXTURES.md §6).

Fingerprints are derived from the sha1 url key (urlnorm.url_key), so no
re-hashing happens at filter level. A zero fingerprint marks an empty
slot; real fingerprints are mapped to 1..65535.
"""

from __future__ import annotations

import numpy as np


class CuckooFilter:
    def __init__(self, capacity: int, bucket_size: int = 4,
                 max_kicks: int = 500):
        n_buckets = 1
        while n_buckets * bucket_size < capacity * 1.05:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.max_kicks = max_kicks
        self.table = np.zeros((n_buckets, bucket_size), dtype=np.uint16)
        self.count = 0
        self.saturated = False   # an insert failed; callers must rely on
        #                          the exact sidecar for new keys

    # -- key mapping ----------------------------------------------------
    def _fp(self, key: bytes) -> int:
        fp = int.from_bytes(key[8:10], "big")
        return fp or 1

    def _i1(self, key: bytes) -> int:
        return int.from_bytes(key[:8], "big") & (self.n_buckets - 1)

    def _alt(self, i: int, fp: int) -> int:
        # partial-key cuckoo: XOR with a spread of the fingerprint
        return (i ^ (fp * 0x5bd1e995)) & (self.n_buckets - 1)

    # -- operations -----------------------------------------------------
    def contains(self, key: bytes) -> bool:
        fp = self._fp(key)
        i1 = self._i1(key)
        if (self.table[i1] == fp).any():
            return True
        return bool((self.table[self._alt(i1, fp)] == fp).any())

    def add(self, key: bytes) -> bool:
        """Insert; returns False (and sets ``saturated``) when the
        eviction chain exceeds max_kicks."""
        fp = self._fp(key)
        i1 = self._i1(key)
        for i in (i1, self._alt(i1, fp)):
            empty = np.flatnonzero(self.table[i] == 0)
            if len(empty):
                self.table[i, empty[0]] = fp
                self.count += 1
                return True
        # deterministic eviction walk
        i = self._alt(i1, fp) if (fp & 1) else i1
        cur = fp
        for kick in range(self.max_kicks):
            slot = kick % self.bucket_size
            cur, self.table[i, slot] = int(self.table[i, slot]), cur
            i = self._alt(i, cur)
            empty = np.flatnonzero(self.table[i] == 0)
            if len(empty):
                self.table[i, empty[0]] = cur
                self.count += 1
                return True
        self.saturated = True
        return False

    def delete(self, key: bytes) -> bool:
        fp = self._fp(key)
        i1 = self._i1(key)
        for i in (i1, self._alt(i1, fp)):
            hit = np.flatnonzero(self.table[i] == fp)
            if len(hit):
                self.table[i, hit[0]] = 0
                self.count -= 1
                return True
        return False

    # -- bulk (vectorized membership for batch fast-path) ---------------
    def might_contain_many(self, keys: list[bytes]) -> np.ndarray:
        if not keys:
            return np.zeros(0, dtype=bool)
        mat = np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(-1, 20)
        fps = ((mat[:, 8].astype(np.uint32) << 8) | mat[:, 9]).astype(np.uint16)
        fps[fps == 0] = 1
        i1 = (np.ascontiguousarray(mat[:, :8]).view(">u8").reshape(-1)
              .astype(np.uint64) & np.uint64(self.n_buckets - 1)) \
            .astype(np.int64)
        i2 = (i1 ^ (fps.astype(np.int64) * 0x5bd1e995)) & (self.n_buckets - 1)
        hit1 = (self.table[i1] == fps[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fps[:, None]).any(axis=1)
        return hit1 | hit2
