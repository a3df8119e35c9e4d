"""End-to-end training-corpus preparation: the flagship composition of
the corpus-quality suite into one streaming pipeline —

    quality gate → exact dedup → split → decontaminate → chunk

Every stage is deterministic and exact, so the WHOLE pipeline is
verifiable against a single DuckDB oracle (queries.Q_CORPUS_PREP_SQL) —
the composite inherits the per-operator correctness gates instead of
trusting them.

Scale shape (100 TB):
- quality gate: pure per-batch map, embarrassingly parallel.
- exact dedup: vectorized md5 → native groupby(text_hash) moves only
  (hash, id) pairs; survivors rejoin their text via a native
  distributed semi join on doc_id.
- split: pure function of doc_id (md5), recomputable anywhere — no
  join needed to carry it.
- decontamination: eval-split 4-grams are MBs vs the corpus's TBs, so
  they broadcast (`ray.put` once per node, deserialized once per
  worker); the scrub is a per-batch filter, zero shuffle.
- chunking: per-batch flat_map fan-out, streams with backpressure.

Exchange budget: exactly ONE full-width exchange ships document text —
the survivor semi join hash-partitions the gated corpus's (doc_id,
text) rows once. Everything else that shuffles (the dedup groupby) is
id-level. To remove even that single text exchange, hash-partition the
corpus by content hash at ingest and dedup each partition in place —
at the cost of pinning the pipeline to that layout.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions import dedup as dd
from ..functions import textops as to
from ..functions.splits import assign_split, split_label
from ..rayutil import light_shuffle_aggregators


def _quality_gate(batch: pd.DataFrame, *, min_tokens: int,
                  max_top_frac_num: int,
                  max_top_frac_den: int) -> pd.DataFrame:
    """Keep docs with ≥ min_tokens tokens whose most frequent token is
    at most num/den of the doc (Gopher-style repetition cut). The
    threshold is a rational compared in integer arithmetic so the SQL
    oracle decides identically at the boundary."""
    keep = []
    for text in batch["text"].fillna(""):
        words = text.split()
        n = len(words)
        if n < min_tokens:
            keep.append(False)
            continue
        top = max(Counter(words).values())
        keep.append(top * max_top_frac_den <= n * max_top_frac_num)
    return batch[np.array(keep, dtype=bool)]


def corpus_prep(docs: "rd.Dataset", *, min_tokens: int = 30,
                max_top_frac: tuple[int, int] = (3, 10),
                decontam_n: int = 4, chunk_size: int = 64,
                stride: int = 48) -> "rd.Dataset":
    """(doc_id, split, chunk_idx, n_tokens, chunk_text): the prepared
    corpus. ``docs`` needs (doc_id, text).

    The ``materialize()`` calls are deliberate: Ray Data has no
    common-subexpression elimination, so a Dataset consumed by two
    downstream plans re-executes its whole lineage per consumer. The
    gated corpus feeds both the dedup subtree and the join's probe
    side; the test split feeds both the eval-ngram collection and the
    final union — each is pinned once instead of recomputed."""
    num, den = max_top_frac
    q = docs.map_batches(
        _quality_gate, batch_format="pandas",
        fn_kwargs={"min_tokens": min_tokens, "max_top_frac_num": num,
                   "max_top_frac_den": den}).materialize()

    # exact dedup: survivors = min doc_id per distinct text. The kept-id
    # table is (hash, id)-sized; the semi join re-attaches the
    # survivors' text in the pipeline's single full-width text exchange.
    kept = dd.exact_dedup(q).select_columns(["doc_id"]).repartition(8)
    with light_shuffle_aggregators():
        q = q.join(kept, join_type="left_semi", num_partitions=8,
                   on=("doc_id",)).materialize()
    q = q.repartition(32)

    split = assign_split(q)

    # Arrow-side filters: typed empty blocks (a pandas empty block with
    # object columns trips Ray's size estimator into log noise)
    def is_test(t: "pa.Table") -> "pa.Table":
        return t.filter(pc.equal(t["split"], "test"))

    def not_test(t: "pa.Table") -> "pa.Table":
        return t.filter(pc.not_equal(t["split"], "test"))

    test_docs = split.map_batches(is_test,
                                  batch_format="pyarrow").materialize()
    eval_grams = to.eval_ngram_set(test_docs, n=decontam_n)
    clean = to.decontaminate(
        split.map_batches(not_test, batch_format="pyarrow"),
        eval_grams, n=decontam_n, keep_clean=True)
    # normalize the decontaminated branch to ARROW blocks before the
    # union: its pandas-format maps emit pandas blocks while test_docs
    # is arrow-materialized — same columns, different block type, and
    # the executor warns on every mixed RefBundle
    from ..rayutil import project_blocks
    final_docs = project_blocks(clean, ["doc_id", "text", "split"]) \
        .union(test_docs)

    chunks = to.chunk_documents(final_docs, chunk_size=chunk_size,
                                stride=stride)

    def add_split(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["split"] = [split_label(i) for i in b["doc_id"]]
        return b[["doc_id", "split", "chunk_idx", "n_tokens",
                  "chunk_text"]]

    return chunks.map_batches(add_split, batch_format="pandas")


def prep_funnel(docs: "rd.Dataset", *, decontam_n: int = 4,
                num_buckets: int = 64) -> "pd.DataFrame":
    """Per-source filter FUNNEL over the published-rule suite — the
    admission report a production corpus-prep run dashboards: how many
    of each source's train-split documents survive each successive
    gate

        n_in → Gopher structural rules (Rae'21 §A1.1, the 6
        language-NEUTRAL flags — the 8-stopword probe is
        English-only and a multilingual corpus swaps it per
        language; q_gopher_quality keeps the full set) →
        decontamination (no eval 4-gram hit, Brown'20 §C) → exact
        dedup (min-doc_id survivor per distinct text) → C4 page
        gate (Raffel'20 §2.2) — ordered harshest-last so every
        stage's count is informative on non-prose corpora too

    Every stage reuses the per-text kernel of its individually
    oracle-checked operator (textops._gopher_doc_flags,
    textops._c4_doc_stats, the decontaminate gram probe, the dedup
    cascade's 52-bit md5 text key), and the composite has ONE DuckDB
    twin assembled verbatim from those operators' twins
    (queries.Q_PREP_FUNNEL_SQL) — the composition is verified, not
    trusted.

    Scale shape: one text pass computes all four verdicts per batch
    (eval grams ray.put once); everything after is id-level —
    (source, 4 counters) combiner rows per batch for the funnel
    counts, (text_hash, doc_id) min-fold + an id-level join for the
    dedup survivors. The output is one row per SOURCE."""
    import hashlib

    import ray as _ray

    from ..functions.splits import split_label
    from ..functions.textops import (_c4_doc_stats, _gopher_doc_flags,
                                     eval_ngram_set)
    from ..rayutil import (bucketed_group_sum, cached_object,
                           project_blocks, salt_bucket)

    def add_split(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["split"] = [split_label(i) for i in b["doc_id"]]
        return b

    split = docs.select_columns(["doc_id", "source", "text"]) \
        .map_batches(add_split, batch_format="pandas").materialize()

    def is_test(t: "pa.Table") -> "pa.Table":
        return t.filter(pc.equal(t["split"], "test"))

    eval_grams = eval_ngram_set(
        split.map_batches(is_test, batch_format="pyarrow"),
        n=decontam_n)
    ref = _ray.put(frozenset(eval_grams))

    def flags(batch: pd.DataFrame) -> pd.DataFrame:
        eg = cached_object(ref)
        b = batch[batch["split"] != "test"]
        ids, srcs, gs, c4s, cls, ths = [], [], [], [], [], []
        for did, src, text in zip(b["doc_id"], b["source"],
                                  b["text"].fillna("")):
            _, gf = _gopher_doc_flags(text)
            st = _c4_doc_stats(text)
            words = text.split()
            grams = {" ".join(words[i:i + decontam_n])
                     for i in range(len(words) - decontam_n + 1)}
            ids.append(did)
            srcs.append(src)
            gs.append(int(all(gf[:6])))   # structural flags only
            c4s.append(int(st[3] >= 3 and st[4] and st[5]))
            cls.append(int(not (grams & eg)))
            ths.append(int(hashlib.md5(text.encode())
                           .hexdigest()[:13], 16))
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "source": pd.Series(srcs, dtype="object"),
            "g": pd.Series(gs, dtype="int64"),
            "c4": pd.Series(c4s, dtype="int64"),
            "clean": pd.Series(cls, dtype="int64"),
            "th": pd.Series(ths, dtype="int64")})

    fl = split.map_batches(flags, batch_format="pandas").materialize()

    empty = pd.DataFrame({
        "source": pd.Series([], dtype="object"),
        **{c: pd.Series([], dtype="int64")
           for c in ("n_in", "n_gopher", "n_clean", "n_unique",
                     "n_c4")}})
    if fl.count() == 0:
        return empty

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(one=np.int64(1), gcl=b["g"] * b["clean"])
        g = b.groupby("source", as_index=False)[
            ["one", "g", "gcl"]].sum()
        return pd.DataFrame({
            "source": pd.Series(g["source"].to_numpy(), dtype="object"),
            **{c: pd.Series(g[c].to_numpy(), dtype="int64")
               for c in ("one", "g", "gcl")}})

    counts = bucketed_group_sum(
        fl.map_batches(count_partial, batch_format="pandas"),
        ["source"], {"one": "n_in", "g": "n_gopher",
                     "gcl": "n_clean"}).to_pandas()

    # dedup survivors among g∧clean: min doc_id per 52-bit text key
    def cand(t: "pa.Table") -> "pa.Table":
        m = pc.and_(pc.equal(t["g"], 1), pc.equal(t["clean"], 1))
        f = t.filter(m)
        return pa.table({"th": f["th"], "doc_id": f["doc_id"]})

    def min_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({
                "bucket": pd.Series([], dtype="int64"),
                "th": pd.Series([], dtype="int64"),
                "doc_id": pd.Series([], dtype="int64")})
        g = b.groupby("th", as_index=False)["doc_id"].min()
        return pd.DataFrame({
            "bucket": pd.Series(g["th"].to_numpy() % num_buckets,
                                dtype="int64"),
            "th": g["th"].astype("int64"),
            "doc_id": g["doc_id"].astype("int64")})

    def min_fold(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g.columns):
            return g
        s = g.groupby("th", as_index=False)["doc_id"].min()
        return pd.DataFrame({"doc_id": s["doc_id"].astype("int64")})

    surv = project_blocks(
        fl.map_batches(cand, batch_format="pyarrow")
        .map_batches(min_partial, batch_format="pandas")
        .groupby("bucket").map_groups(min_fold, batch_format="pandas"),
        ["doc_id"]).materialize()

    if surv.count() == 0:
        uniq = pd.DataFrame({"source": pd.Series([], dtype="object"),
                             "n_unique": pd.Series([], dtype="int64"),
                             "n_c4": pd.Series([], dtype="int64")})
    else:
        from ..rayutil import light_shuffle_aggregators as _lsa
        with _lsa():
            joined = project_blocks(fl, ["doc_id", "source", "c4"]).join(
                surv.repartition(8), join_type="inner",
                num_partitions=8, on=("doc_id",))
        joined = project_blocks(joined, ["source", "c4"])

        def uniq_partial(b: pd.DataFrame) -> pd.DataFrame:
            b = b.assign(u=np.int64(1))
            g = b.groupby("source", as_index=False)[["u", "c4"]].sum()
            return pd.DataFrame({
                "source": pd.Series(g["source"].to_numpy(),
                                    dtype="object"),
                "u": pd.Series(g["u"].to_numpy(), dtype="int64"),
                "c4": pd.Series(g["c4"].to_numpy(), dtype="int64")})

        uniq = bucketed_group_sum(
            joined.map_batches(uniq_partial, batch_format="pandas"),
            ["source"], {"u": "n_unique", "c4": "n_c4"}).to_pandas()

    out = counts.merge(uniq, on="source", how="left")
    for c in ("n_unique", "n_c4"):
        out[c] = out[c].fillna(0).astype("int64")
    return out[["source", "n_in", "n_gopher", "n_clean", "n_unique",
                "n_c4"]].sort_values("source").reset_index(drop=True)
