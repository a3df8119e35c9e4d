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


def seeded_shuffle_positions(ds: "rd.Dataset", *, seed: str = "shuf-v1",
                             id_col: str = "doc_id",
                             num_parts: int = 256) -> "rd.Dataset":
    """Deterministic seeded global shuffle order — the per-epoch data
    reordering every training loader needs, made engine-stable: returns
    (id, pos) where ``pos`` is the rank of the 60-bit md5 prefix of
    ``seed ‖ id`` (ties, ~2⁻⁶⁰ events, broken by id). Change the seed,
    get an independent permutation; rerun anywhere, get the same one.

    NOT ``ds.random_shuffle()``: that is nondeterministic across runs
    AND an all-to-all of the full payload. Here the payload never
    moves — only (id, h) rows shuffle. Rank assembly is the two-pass
    scan from ``windows.prefix_sum``, with hash-RANGE partitions
    instead of dense-key ranges: h is uniform by construction, so
    ``h // (2⁶⁰/num_parts)`` is a balanced partitioner with zero
    sampling. Pass 1 moves one int per (partition, batch) and the
    driver cumsums ``num_parts`` ints; pass 2 co-locates each range
    (the one real shuffle, id-level rows), sorts locally and emits
    offset + local rank. Size ``num_parts`` so a range fits a worker
    (10^10 rows → ≥ 2^14 parts); the broadcast stays 16 B/part.

    A consumer joins pos back to the payload table or writes it
    partitioned by ``pos // block_size`` for sequential epoch reads.
    """
    import ray

    from ..rayutil import cached_object

    span = (1 << 60) // num_parts + 1

    def hashed(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        h = np.fromiter(
            (int.from_bytes(
                hashlib.md5(f"{seed}{i}".encode()).digest()[:8],
                "big") >> 4 for i in ids),
            dtype=np.int64, count=len(ids))
        return pd.DataFrame({
            id_col: ids.astype(np.int64),
            "h": h,
            "part": (h // span).astype(np.int64)})

    # feeds pass 1 AND pass 2 — unpinned, the corpus would hash twice
    hashed_ds = ds.select_columns([id_col]).map_batches(
        hashed, batch_format="pandas").materialize()

    def pcounts(batch: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(batch["part"].to_numpy(), return_counts=True)
        return pd.DataFrame({"part": u.astype(np.int64),
                             "c": c.astype(np.int64)})

    totals = hashed_ds.map_batches(pcounts, batch_format="pandas") \
        .groupby("part").sum("c").to_pandas()
    if "part" not in totals.columns:   # empty input → typed empty ranks
        import pyarrow as pa
        import ray.data as rd
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64())}))
    totals = totals.sort_values("part").reset_index(drop=True)
    csum = totals["sum(c)"].cumsum().shift(1, fill_value=0)
    offsets_ref = ray.put((totals["part"].to_numpy(dtype=np.int64),
                           csum.to_numpy(dtype=np.int64)))

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        parts_arr, offs_arr = cached_object(offsets_ref)
        g = g.sort_values(["h", id_col]).reset_index(drop=True)
        i = int(np.searchsorted(parts_arr, int(g["part"].iloc[0])))
        base = int(offs_arr[i])
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(dtype=np.int64),
            "pos": base + np.arange(len(g), dtype=np.int64)})

    return hashed_ds.groupby("part").map_groups(
        rank, batch_format="pandas")


def grouped_hash_sample_k(ds: "rd.Dataset", *, key_col: str,
                          id_col: str = "doc_id", k: int = 10,
                          salt: str = "gsk-v1",
                          num_buckets: int = 64) -> "rd.Dataset":
    """Exactly-k-per-group deterministic sample: each group's k rows
    with the smallest md5(salt ‖ id) rank — the eval-set carving move
    (k held-out docs per language/source) with reservoir-sampling
    guarantees but no RNG state: rerun anywhere, same sample; change
    the salt, fresh sample.

    Combiner shape (same as ``windows.latest_per_key``): every batch
    keeps at most k rows per key locally, so the shuffle moves
    ≤ k·batches rows per key regardless of group size, and the final
    salted-bucket pass is one vectorized pandas head(k) per bucket.
    SQL twin: ``QUALIFY row_number() OVER (PARTITION BY key ORDER BY
    md5_rank, id) <= k``."""
    from ..rayutil import salt_bucket

    def add_rank(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            # keep the added columns on empty frames too, or the empty
            # block's schema diverges from its non-empty siblings
            batch = batch.copy()
            batch["_rank"] = pd.Series([], dtype="int64")
            batch["bucket"] = pd.Series([], dtype="int32")
            return batch
        batch = batch.copy()
        batch["_rank"] = np.fromiter(
            (int.from_bytes(
                hashlib.md5(f"{salt}{i}".encode()).digest()[:8],
                "big") >> 4 for i in batch[id_col]),
            dtype=np.int64, count=len(batch))
        best = batch.sort_values(["_rank", id_col], kind="mergesort") \
            .groupby(key_col, as_index=False, sort=False).head(k).copy()
        best["bucket"] = salt_bucket(best[key_col], num_buckets)
        return best

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["_rank", id_col], kind="mergesort") \
            .groupby(key_col, as_index=False, sort=False).head(k) \
            .drop(columns=["bucket", "_rank"])

    return ds.map_batches(add_rank, batch_format="pandas") \
        .groupby("bucket").map_groups(final, batch_format="pandas")


def weighted_sample_k(ds: "rd.Dataset", *, id_col: str = "doc_id",
                      weight_col: str, k: int,
                      salt: str = "wsample-v1") -> pd.DataFrame:
    """Deterministic weighted sample WITHOUT replacement (Efraimidis &
    Spirakis'06 A-ES): each row gets priority ``u^(1/w)`` with ``u`` a
    hash-derived uniform in (0,1], and the k highest priorities win —
    inclusion probability proportional to weight, no RNG state, no
    reservoir to synchronize. The hash replaces the RNG: identical
    selections on any engine, any partitioning, any run.

    Scale shape: per-batch priority + local top-k (the cosine_topk
    merge pattern — the driver sees k·n_batches candidate rows, never
    the corpus). ``u`` is built from the first 52 bits of
    ``md5(salt‖id)`` so the int→double conversion is EXACT (inside the
    mantissa); the SQL twin computes the identical expression and libm
    ``pow`` agrees bit-for-bit on identical doubles. Zero/negative
    weights are excluded (matching the twin's WHERE w > 0)."""
    two52 = float(1 << 52)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        w = batch[weight_col].to_numpy(dtype=np.float64)
        keep = w > 0
        ids, w = ids[keep], w[keep]
        h = np.fromiter(
            (int(hashlib.md5((salt + str(i)).encode())
                 .hexdigest()[:13], 16) for i in ids),
            dtype=np.float64, count=len(ids))
        pri = np.power((h + 1.0) / two52, 1.0 / w)
        order = np.lexsort((ids, -pri))[:k]
        return pd.DataFrame({
            id_col: pd.Series(ids[order], dtype="int64"),
            weight_col: pd.Series(w[order].astype(np.int64),
                                  dtype="int64"),
            "pri": pd.Series(pri[order], dtype="float64")})

    parts = ds.select_columns([id_col, weight_col]) \
        .map_batches(partial, batch_format="pandas").to_pandas()
    if id_col not in parts.columns or not len(parts):
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             weight_col: pd.Series([], dtype="int64")})
    top = parts.sort_values(["pri", id_col],
                            ascending=[False, True]).head(k)
    return top[[id_col, weight_col]].sort_values(id_col) \
        .reset_index(drop=True)
