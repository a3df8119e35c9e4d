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
