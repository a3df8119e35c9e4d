"""Deterministic train/val/test splits for training-data pipelines.

Hash-based assignment (md5 of the id + salt) — stable under
repartitioning, resumable, and reproducible across engines (the split
of a row never depends on which batch or node saw it). SQL-expressible,
so the driver oracle can verify it exactly.
"""

from __future__ import annotations

import hashlib

import pandas as pd

import ray.data as rd


def assign_split(ds: "rd.Dataset", id_col: str = "doc_id",
                 salt: str = "split-v1", train: int = 8,
                 val: int = 1) -> "rd.Dataset":
    """Adds a ``split`` column: md5(salt ‖ id) mod 10 → first ``train``
    buckets are train, next ``val`` are val, rest test."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        buckets = [
            int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:8], 16) % 10
            for i in batch[id_col]]
        batch = batch.copy()
        batch["split"] = ["train" if b < train else
                          "val" if b < train + val else "test"
                          for b in buckets]
        return batch

    return ds.map_batches(f, batch_format="pandas")
