"""Inverted text index: build a token-bucket-partitioned parquet
layout once, answer conjunctive (AND-of-postings) queries by reading
ONLY the buckets the query terms hash into — the text-side sibling of
similarity.IvfIndex's cluster-partitioned layout, and the indexed
counterpart of queries.q_docs_all_terms' scan predicate.

Scale shape: the build is one pass over the corpus (per-doc DISTINCT
tokens → (bucket, token, doc_id) rows) into a hash-partitioned
``write_parquet(partition_cols=["bucket"])`` sink — resumable,
per-bucket files, no giant single file. A query touches ≤ |terms|
bucket directories regardless of corpus size (pruning is proven in
tests by DELETING every other bucket and getting the same answer);
postings carry the token STRING so hash collisions cannot create
false matches. The AND fold is a per-term-distinct count:
doc qualifies iff it holds all |terms| distinct terms."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _tok_bucket(token: str, num_buckets: int) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) \
        % num_buckets


def build_inverted_index(ds: "rd.Dataset", out_dir: str, *,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         num_buckets: int = 64) -> str:
    """One streaming pass: per-doc distinct whitespace tokens →
    (bucket, token, doc_id) rows, partitioned parquet by bucket."""

    def postings(b: pd.DataFrame) -> pd.DataFrame:
        toks, ids = [], []
        for did, text in zip(b[id_col], b[text_col].fillna("")):
            seen = set(text.split())
            toks.extend(seen)
            ids.extend([did] * len(seen))
        bks = np.fromiter((_tok_bucket(t, num_buckets) for t in toks),
                          dtype=np.int64, count=len(toks))
        return pd.DataFrame({
            "bucket": pd.Series(bks, dtype="int64"),
            "token": pd.Series(toks, dtype="object"),
            id_col: pd.Series(ids, dtype="int64")})

    ds.select_columns([id_col, text_col]) \
        .map_batches(postings, batch_format="pandas") \
        .write_parquet(out_dir, partition_cols=["bucket"])
    return out_dir


def query_all_terms(index_dir: str, terms: list[str], *,
                    id_col: str = "doc_id",
                    num_buckets: int = 64) -> "rd.Dataset":
    """Doc ids containing ALL ``terms``: read only the terms' bucket
    partitions, keep exact-token posting rows, count distinct terms
    per doc, keep count == |terms|."""
    import glob

    from ..rayutil import project_blocks, read_parquet
    terms = sorted(set(terms))
    want = sorted({_tok_bucket(t, num_buckets) for t in terms})
    # expand bucket dirs to their files: pyarrow's dataset factory
    # rejects a LIST containing multiple directories (single dir or
    # all-files only)
    files = []
    for b in want:
        files.extend(sorted(glob.glob(
            os.path.join(index_dir, f"bucket={b}", "*.parquet"))))
    if not files:
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64())}))
    ds = read_parquet(files, columns=["token", id_col])
    tset = frozenset(terms)
    n_terms = len(terms)

    def hits(b: pd.DataFrame) -> pd.DataFrame:
        # exact token equality (hash only routed the read); postings
        # are distinct per (token, doc) by build construction, so a
        # per-doc row count below IS a distinct-term count
        m = b["token"].isin(tset)
        g = b.loc[m].groupby(id_col, as_index=False).size()
        return pd.DataFrame({
            id_col: g[id_col].astype("int64"),
            "n": g["size"].astype("int64")})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g.columns):
            return g
        s = g.groupby(id_col, as_index=False)["n"].sum()
        s = s[s["n"] == n_terms]
        return pd.DataFrame({id_col: s[id_col].astype("int64")})

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["pb"] = (b[id_col] % 16).astype("int64") if len(b) \
            else pd.Series([], dtype="int64")
        return b

    return project_blocks(
        ds.map_batches(hits, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("pb").map_groups(fold, batch_format="pandas"),
        [id_col])
