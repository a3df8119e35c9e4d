"""Deduplication operators over ray.data Datasets.

All shapes follow the scale pattern: vectorized per-batch signature
computation (``map_batches``, numpy) → explode to (bucket, doc) rows →
``groupby(bucket)`` (the one shuffle, keyed by a short hash) → in-group
pairing → exact verification. Pair outputs are canonical
(``doc_a < doc_b``), deterministic (fixed hash seeds), and sorted by the
caller if needed.

Reference parity: the only dedup in the reference are exact URL dedup
(``url UNIQUE``, A5 — rebuilt as the seen-set in state/seen.py) and the
near-dup text filter ``GROUP BY text_art HAVING count < 4`` over long
texts (script2.py:8-21, A4 — :func:`near_dup_text_groups`). MinHash /
SimHash / embedding near-dup extend the engine for training-data
pipelines (task brief).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_MERSENNE = (1 << 61) - 1


def _text_md5(batch: pa.Table, col: str) -> pa.Table:
    h = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
         for t in batch[col].to_pylist()]
    return batch.append_column("text_hash", pa.array(h, pa.string()))


def exact_dedup(ds: "rd.Dataset", text_col: str = "text",
                id_col: str = "doc_id") -> "rd.Dataset":
    """Exact dedup by content hash: one surviving row per distinct text —
    the minimum id (deterministic winner) — plus the duplicate count.

    Hash-partitioned groupby on the md5 (A5 pattern at content level);
    the md5 is computed vectorized per batch so the shuffle moves only
    (hash, id) pairs after a select."""
    hashed = (ds.select_columns([id_col, text_col])
                .map_batches(_text_md5, fn_kwargs={"col": text_col},
                             batch_format="pyarrow")
                .select_columns([id_col, "text_hash"]))

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "text_hash": [g["text_hash"].iloc[0]],
            "doc_id": [int(g[id_col].min())],
            "n_dups": [len(g)],
        })

    return hashed.groupby("text_hash").map_groups(keep_min,
                                                  batch_format="pandas")


def near_dup_text_groups(ds: "rd.Dataset", text_col: str = "text",
                         min_len: int = 500, max_count: int = 4) -> "rd.Dataset":
    """The reference's boilerplate filter (script2.py:8-21, A4): among
    texts longer than ``min_len``, keep hash groups repeated fewer than
    ``max_count`` times. Returns (text_hash, n) per surviving group."""
    filtered = ds.map_batches(
        lambda t: t.filter(pc.greater(pc.utf8_length(
            pc.coalesce(t[text_col], pa.scalar(""))), min_len)),
        batch_format="pyarrow")
    hashed = filtered.map_batches(_text_md5, fn_kwargs={"col": text_col},
                                  batch_format="pyarrow") \
        .select_columns(["text_hash"])

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n >= max_count:
            return pd.DataFrame({"text_hash": [], "n": []})
        return pd.DataFrame({"text_hash": [g["text_hash"].iloc[0]], "n": [n]})

    return hashed.groupby("text_hash").map_groups(agg, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_TOKEN_HASH_MEMO: dict[str, int] = {}


def _token_hash(tok: str) -> int:
    """Deterministic 64-bit token hash, memoized (vocabulary repeats
    heavily across documents — Zipf — so the sha1 cost amortizes)."""
    h = _TOKEN_HASH_MEMO.get(tok)
    if h is None:
        if len(_TOKEN_HASH_MEMO) > 1_000_000:
            _TOKEN_HASH_MEMO.clear()
        h = _TOKEN_HASH_MEMO[tok] = int.from_bytes(
            hashlib.sha1(tok.encode()).digest()[:8], "big")
    return h


def _shingles(text: str, k: int = 3) -> set[int]:
    """Word k-gram shingles hashed to 61-bit ints: per-token hashes
    (memoized) combined positionally with odd multipliers — vectorized
    over the token array, deterministic."""
    toks = (text or "").lower().split()
    n = len(toks)
    if n < k:
        return set()
    th = np.fromiter((_token_hash(t) for t in toks), dtype=np.uint64,
                     count=n)
    acc = th[: n - k + 1] * np.uint64(0x9E3779B97F4A7C15)
    for j in range(1, k):
        acc = acc ^ (th[j: n - k + 1 + j] * np.uint64(0xC2B2AE3D27D4EB4F + 2 * j))
    return set((acc & np.uint64(_MERSENNE)).tolist())


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


class MinHasher:
    """Actor-pool stage: text → minhash signature (uint64 list)."""

    def __init__(self, num_perm: int = 128, shingle_k: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.a, self.b = _perm_params(num_perm)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        x = np.fromiter(sh, dtype=np.uint64, count=len(sh))
        # (a*x + b) mod p, vectorized over (perm, shingle)
        vals = (self.a[:, None] * x[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch[self.text_col].to_pylist()]
        return pa.table({
            "doc_id": batch[self.id_col],
            "signature": pa.array([s.tolist() for s in sigs],
                                  pa.list_(pa.uint64())),
        })


def minhash_lsh_pairs(ds: "rd.Dataset", *, num_perm: int = 128,
                      bands: int = 32, shingle_k: int = 3,
                      threshold: float = 0.5, text_col: str = "text",
                      id_col: str = "doc_id",
                      concurrency: int = 4) -> "rd.Dataset":
    """Near-duplicate pairs via MinHash + banded LSH + exact-estimate
    verification.

    shingle→minhash per batch (actor pool) → explode to (band_id,
    band_hash, doc_id) → ``groupby`` band buckets (the shuffle; band_hash
    is 16 hex chars, so only small rows move) → candidate pairs in-bucket
    → verify with full-signature agreement ≥ threshold → global pair
    dedup. Returns (doc_a, doc_b, similarity)."""
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(MinHasher,
                          fn_constructor_kwargs={"num_perm": num_perm,
                                                 "shingle_k": shingle_k,
                                                 "text_col": text_col,
                                                 "id_col": id_col},
                          batch_format="pyarrow", concurrency=concurrency)
    sigs_mat = sigs.materialize()  # small: (id, 128 u64) per doc

    def to_bands(batch: pa.Table) -> pa.Table:
        ids, bnd, bh = [], [], []
        for did, sig in zip(batch["doc_id"].to_pylist(),
                            batch["signature"].to_pylist()):
            arr = np.asarray(sig, dtype=np.uint64)
            for b in range(bands):
                seg = arr[b * rows_per_band:(b + 1) * rows_per_band]
                h = hashlib.sha1(seg.tobytes() + bytes([b])).hexdigest()[:16]
                ids.append(did)
                bnd.append(b)
                bh.append(h)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "band": pa.array(bnd, pa.int32()),
                         "band_hash": pa.array(bh, pa.string())})

    bands_ds = sigs_mat.map_batches(to_bands, batch_format="pyarrow")

    # Collision detection: per-batch partial counts merged on the driver
    # (pre-aggregation before the wide step — a full groupby shuffle over
    # the band rows costs more than the tiny combined count table). Only
    # buckets with ≥2 docs survive; LSH buckets are overwhelmingly
    # singletons, so the collision set is small by construction.
    def partial_counts(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"band": b["band"].to_pylist(),
                           "band_hash": b["band_hash"].to_pylist()})
        g = df.groupby(["band", "band_hash"], as_index=False).size()
        return pa.table({"band": pa.array(g["band"], pa.int32()),
                         "band_hash": pa.array(g["band_hash"], pa.string()),
                         "n": pa.array(g["size"], pa.int64())})

    counts = bands_ds.map_batches(partial_counts,
                                  batch_format="pyarrow").to_pandas()
    counts = counts.groupby(["band", "band_hash"], as_index=False)["n"].sum()
    hot = counts[counts["n"] >= 2]
    hot_keys = set(zip(hot["band"], hot["band_hash"]))
    import ray as _ray
    hot_ref = _ray.put(hot_keys)

    def only_hot(batch: pa.Table) -> pa.Table:
        keys = _ray.get(hot_ref)
        mask = [(b, h) in keys for b, h in
                zip(batch["band"].to_pylist(), batch["band_hash"].to_pylist())]
        return batch.filter(pa.array(mask, pa.bool_()))

    colliding = bands_ds.map_batches(only_hot, batch_format="pyarrow") \
        .to_pandas()

    sig_lookup = {r["doc_id"]: np.asarray(r["signature"], dtype=np.uint64)
                  for r in sigs_mat.take_all()}
    seen_pairs: set[tuple] = set()
    a_out, b_out, sim_out = [], [], []
    for _, bucket in colliding.groupby(["band", "band_hash"]):
        docs = sorted(set(bucket["doc_id"]))
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                pair = (docs[i], docs[j])
                if pair in seen_pairs:
                    continue
                seen_pairs.add(pair)
                sa, sb = sig_lookup[pair[0]], sig_lookup[pair[1]]
                s = float((sa == sb).mean())
                if s >= threshold:
                    a_out.append(pair[0])
                    b_out.append(pair[1])
                    sim_out.append(s)
    return rd.from_pandas(pd.DataFrame({
        "doc_a": pd.Series(a_out, dtype="int64"),
        "doc_b": pd.Series(b_out, dtype="int64"),
        "similarity": pd.Series(sim_out, dtype="float64")}))


def dedup_groups(pairs_df: pd.DataFrame, all_ids=None) -> pd.DataFrame:
    """Near-dup pair list → connected components → one surviving
    representative (min id) per cluster. Union-find on the pair set —
    valid because LSH candidate pairs are a small fraction of the corpus
    (the guide's documented condition); at cluster scale the same result
    comes from a few rounds of min-label propagation via groupby.

    Returns (doc_id, cluster_rep, keep)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    ids = (sorted(set(map(int, all_ids)))
           if all_ids is not None else
           sorted({find(int(x)) for x in
                   pd.concat([pairs_df["doc_a"], pairs_df["doc_b"]])}
                  | set(map(int, pairs_df["doc_a"]))
                  | set(map(int, pairs_df["doc_b"]))))
    reps = [find(i) for i in ids]
    return pd.DataFrame({"doc_id": ids, "cluster_rep": reps,
                         "keep": [i == r for i, r in zip(ids, reps)]})


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard (verification kernel for LSH pairs)."""
    sa, sb = _shingles(text_a, k), _shingles(text_b, k)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """Actor-pool stage: text → 64-bit simhash fingerprint."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def fingerprint(text: str) -> int:
        toks = (text or "").lower().split()
        if not toks:
            return 0
        hashes = np.fromiter((_token_hash(t) for t in toks),
                             dtype=np.uint64, count=len(toks))
        shifts = np.arange(64, dtype=np.uint64)
        bits = (hashes[:, None] >> shifts[None, :]) & np.uint64(1)
        acc = np.where(bits == 1, 1, -1).sum(axis=0)
        fp = np.uint64(0)
        for i in range(64):
            if acc[i] > 0:
                fp |= np.uint64(1) << np.uint64(i)
        return int(fp)

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [self.fingerprint(t) for t in batch[self.text_col].to_pylist()]
        return pa.table({"doc_id": batch[self.id_col],
                         "simhash": pa.array(np.array(fps, dtype=np.uint64))})


def simhash_pairs(ds: "rd.Dataset", *, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  concurrency: int = 4) -> "rd.Dataset":
    """Near-dup pairs with Hamming distance ≤ k on 64-bit simhash, using
    the 4-segment pigeonhole: pairs within distance 3 share at least one
    exact 16-bit segment → ``groupby(segment, value)`` buckets, verify
    Hamming in-bucket. Returns (doc_a, doc_b, hamming)."""
    fps = ds.map_batches(SimHasher,
                         fn_constructor_kwargs={"text_col": text_col,
                                                "id_col": id_col},
                         batch_format="pyarrow", concurrency=concurrency)
    fps_df = fps.to_pandas()
    fp_lookup = dict(zip(fps_df["doc_id"].astype(int),
                         fps_df["simhash"].astype(np.uint64).map(int)))

    # pigeonhole segments + collision-count filter (same shape as the
    # MinHash path: groupby count finds the few non-singleton buckets)
    seg_rows = {"doc_id": [], "segment": [], "value": []}
    for did, fp in fp_lookup.items():
        for s in range(4):
            seg_rows["doc_id"].append(did)
            seg_rows["segment"].append(s)
            seg_rows["value"].append((fp >> (16 * s)) & 0xFFFF)
    seg_df = pd.DataFrame(seg_rows)
    sizes = seg_df.groupby(["segment", "value"])["doc_id"].transform("size")
    colliding = seg_df[sizes >= 2]

    seen_pairs: set[tuple] = set()
    a_out, b_out, hd_out = [], [], []
    for _, bucket in colliding.groupby(["segment", "value"]):
        docs = sorted(set(bucket["doc_id"]))
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                pair = (docs[i], docs[j])
                if pair in seen_pairs:
                    continue
                seen_pairs.add(pair)
                d = bin(fp_lookup[pair[0]] ^ fp_lookup[pair[1]]).count("1")
                if d <= max_hamming:
                    a_out.append(pair[0])
                    b_out.append(pair[1])
                    hd_out.append(d)
    return rd.from_pandas(pd.DataFrame({
        "doc_a": pd.Series(a_out, dtype="int64"),
        "doc_b": pd.Series(b_out, dtype="int64"),
        "hamming": pd.Series(hd_out, dtype="int64")}))


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(ds: "rd.Dataset", *, threshold: float = 0.95,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            n_planes: int = 12,
                            seed: int = 42) -> "rd.Dataset":
    """Cosine-similarity near-dup pairs via random-hyperplane LSH
    buckets: sign-pattern of ``n_planes`` projections → ``groupby`` →
    exact cosine verification in-bucket (numpy matmul). At 0.95+ cosine
    two vectors almost surely share the full sign pattern, so recall is
    high while buckets stay small. Returns (id_a, id_b, cos_sim)."""
    import ray as _ray

    # sample one batch to get dimensionality, then fixed planes
    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first[vec_col][0].as_py())
    planes = np.random.RandomState(seed).normal(size=(dim, n_planes))
    planes_ref = _ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = _ray.get(planes_ref)
        mat = np.array(batch[vec_col].to_pylist(), dtype=np.float32)
        signs = (mat @ pl) > 0
        codes = (signs * (1 << np.arange(n_planes))).sum(axis=1)
        return pa.table({
            "vec_id": batch[id_col],
            "bucket": pa.array(codes.astype(np.int64)),
            "vec": batch[vec_col],
        })

    buckets = ds.map_batches(bucketize, batch_format="pyarrow")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        ids = g["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.array([np.asarray(v, dtype=np.float32)
                        for v in g["vec"].to_numpy()[order]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1
        sims = (mat / norms) @ (mat / norms).T
        ia, ib = np.triu_indices(len(ids), k=1)
        mask = sims[ia, ib] >= threshold
        return pd.DataFrame({"id_a": ids[ia[mask]], "id_b": ids[ib[mask]],
                             "cos_sim": sims[ia, ib][mask].astype(float)})

    return buckets.groupby("bucket").map_groups(verify, batch_format="pandas")
