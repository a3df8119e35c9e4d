"""Deterministic train/val/test splits for training-data pipelines.

Hash-based assignment (md5 of the id + salt) — stable under
repartitioning, resumable, and reproducible across engines (the split
of a row never depends on which batch or node saw it). SQL-expressible,
so the driver oracle can verify it exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data as rd


def md5_bucket(key: str, mod: int) -> int:
    """THE engine bucket predicate — first 4 md5 bytes as a big-endian
    int, mod ``mod``. Single source of truth for every hash-bucket
    decision (splits, sampling); SQL-reproducible as
    ``('0x'||substr(md5(key),1,8))::UBIGINT % mod``."""
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:4],
                          "big") % mod


def split_label(i, *, salt: str = "split-v1", train: int = 8,
                val: int = 1) -> str:
    """Split of one id under the standard md5 bucket rule — shared by
    ``assign_split`` and any stage that recomputes a row's split from
    its id (the label can never diverge from the assignment)."""
    b = md5_bucket(f"{salt}{i}", 10)
    return ("train" if b < train else
            "val" if b < train + val else "test")


def assign_split(ds: "rd.Dataset", id_col: str = "doc_id",
                 salt: str = "split-v1", train: int = 8,
                 val: int = 1) -> "rd.Dataset":
    """Adds a ``split`` column: md5(salt ‖ id) mod 10 → first ``train``
    buckets are train, next ``val`` are val, rest test."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["split"] = [split_label(i, salt=salt, train=train, val=val)
                          for i in batch[id_col]]
        return batch

    return ds.map_batches(f, batch_format="pandas")


def stratified_sample(ds: "rd.Dataset", *, id_col: str = "doc_id",
                      strata_col: str = "lang",
                      rates: dict[str, int] | None = None,
                      default_pct: int = 10,
                      mod: int = 100) -> "rd.Dataset":
    """Deterministic per-stratum sampling: keep a row iff
    ``md5(str(id))[:4] % mod < rates[stratum]`` — the language-rebalance
    step of a training-data pipeline (e.g. downsample English, keep all
    low-resource languages) without RNG state or a shuffle.

    Like ``windows.hash_sample`` the predicate is pure per-row, so the
    operator is a single embarrassingly-parallel map at 100 TB and
    reproducible in SQL (``('0x'||substr(md5(id::VARCHAR),1,8))::UBIGINT
    % mod < CASE stratum ...``).
    """
    rates = dict(rates or {})

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        pct = batch[strata_col].map(
            lambda s: rates.get(s, default_pct)).to_numpy()
        buckets = np.array([md5_bucket(str(i), mod)
                            for i in batch[id_col]])
        return batch[buckets < pct]

    return ds.map_batches(f, batch_format="pandas")
