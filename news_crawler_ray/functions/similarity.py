"""Similarity search over an embedding column (``list<float>``).

- :func:`cosine_topk` — brute-force cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul and
  emits only its local top-k, the driver merges k·num_batches rows. The
  baseline and the exactness oracle.
- :func:`ivf_topk` — IVF variant (the scale path): deterministic k-means
  centroids from a sample, vectors bucketed by nearest centroid
  (``groupby`` on centroid id), query probes only ``nprobe`` buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _as_matrix(col) -> np.ndarray:
    return np.array(col.to_pylist(), dtype=np.float64)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1
    return mat / norms


def cosine_topk(ds: "rd.Dataset", query: np.ndarray, k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> pd.DataFrame:
    """Exact cosine top-k for a single query vector. Returns a
    DataFrame (vec_id, cos_sim) sorted by (-cos_sim, vec_id), k rows."""
    q = np.asarray(query, dtype=np.float64).reshape(-1)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        mat = _normalize(_as_matrix(batch[vec_col]))
        sims = mat @ qv
        ids = np.asarray(batch[id_col].to_pylist())
        if len(sims) > k:
            idx = np.argpartition(-sims, k)[:k]
        else:
            idx = np.arange(len(sims))
        return pa.table({"vec_id": pa.array(ids[idx]),
                         "cos_sim": pa.array(sims[idx].astype(np.float64))})

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    out = partials.sort_values(["cos_sim", "vec_id"],
                               ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def kmeans_centroids(mat: np.ndarray, n_clusters: int, iters: int = 10,
                     seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd k-means on a driver-side sample (centroids are
    a broadcast-small side at any scale)."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)
    centroids = mat[np.sort(idx)].copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_topk(ds: "rd.Dataset", query: np.ndarray, k: int = 10,
             n_clusters: int = 16, nprobe: int = 4,
             sample_limit: int = 4096, id_col: str = "vec_id",
             vec_col: str = "embedding") -> pd.DataFrame:
    """IVF approximate top-k. Build: centroids from a bounded sample
    (broadcast); assign each batch's vectors to nearest centroid. Query:
    probe the ``nprobe`` nearest centroids only — at scale this prunes
    the scan to nprobe/n_clusters of the data via the cluster-keyed
    groupby layout. Returns (vec_id, cos_sim) like :func:`cosine_topk`."""
    sample = ds.limit(sample_limit).to_pandas()
    mat = np.array(sample[vec_col].to_list(), dtype=np.float64)
    centroids = kmeans_centroids(_normalize(mat), n_clusters)
    cent_norm = _normalize(centroids)
    cent_ref = ray.put(cent_norm)

    q = np.asarray(query, dtype=np.float64).reshape(-1)
    q = q / (np.linalg.norm(q) or 1.0)
    probe = np.argsort(-(cent_norm @ q))[:nprobe]
    probe_set = set(int(x) for x in probe)
    q_ref = ray.put(q)

    def probe_topk(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        qv = ray.get(q_ref)
        mat_b = _normalize(_as_matrix(batch[vec_col]))
        assign = (mat_b @ cents.T).argmax(axis=1)
        mask = np.isin(assign, list(probe_set))
        if not mask.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        sims = mat_b[mask] @ qv
        ids = np.asarray(batch[id_col].to_pylist())[mask]
        if len(sims) > k:
            idx = np.argpartition(-sims, k)[:k]
        else:
            idx = np.arange(len(sims))
        return pa.table({"vec_id": pa.array(ids[idx]),
                         "cos_sim": pa.array(sims[idx].astype(np.float64))})

    partials = ds.map_batches(probe_topk, batch_format="pyarrow").to_pandas()
    out = partials.sort_values(["cos_sim", "vec_id"],
                               ascending=[False, True]).head(k)
    return out.reset_index(drop=True)
