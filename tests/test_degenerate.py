"""Degenerate-input sweep across the §2.11 training-data operator suite
(VERDICT r2 item 9): every operator must handle an EMPTY table, a 1-ROW
table and an ALL-DUPLICATE table without crashing and WITHOUT schema
drift.

Schema contract being enforced: populated variants must agree exactly
on output columns, and an empty-input output must either carry those
same columns or be a ZERO-BLOCK dataset (0 columns). The zero-block
case is a Ray Data fact, not operator sloppiness: a pipeline ending in
a hash aggregate produces no blocks at all for zero input rows and
``Dataset.schema()`` is None — preserving the schema would need an
eager emptiness pre-pass per call, the wrong trade at 100 TB. What IS
an operator bug (and what this sweep caught in round 3): crashing on
the empty table (KeyError into a zero-block to_pandas; Acero FieldRef
errors from zero-column pass-through blocks reaching a join), or an
empty output whose columns exist but DIFFER from the populated ones
(the f61a2e2 empty-partial drift)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from news_crawler_ray.functions import dedup as dd
from news_crawler_ray.functions import sketches as sk
from news_crawler_ray.functions import splits as sp
from news_crawler_ray.functions import textops as to
from news_crawler_ray.functions import windows as wn

VARIANTS = ("empty", "one", "dups")

_TEXT = ("the quick brown fox jumps over the lazy dog and runs far away "
         "into the deep green forest tonight mail me at a.b@example.com")


def _docs(variant: str):
    import ray.data as rd
    if variant == "empty":
        df = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                           "text": pd.Series([], dtype="object"),
                           "lang": pd.Series([], dtype="object")})
    elif variant == "one":
        df = pd.DataFrame({"doc_id": [0], "text": [_TEXT], "lang": ["en"]})
    else:  # all-duplicate
        df = pd.DataFrame({"doc_id": range(6), "text": [_TEXT] * 6,
                           "lang": ["en"] * 6})
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _events(variant: str):
    import ray.data as rd
    if variant == "empty":
        df = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                           "event_id": pd.Series([], dtype="int64"),
                           "ts": pd.Series([], dtype="int64"),
                           "value": pd.Series([], dtype="float64")})
    elif variant == "one":
        df = pd.DataFrame({"user_id": [1], "event_id": [10], "ts": [100],
                           "value": [2.5]})
    else:  # all-duplicate rows except the unique event id tie-break
        df = pd.DataFrame({"user_id": [1] * 6,
                           "event_id": list(range(6)),
                           "ts": [100] * 6, "value": [2.5] * 6})
    # integer twin of value (prefix_sum contract: integral sums only)
    df["ivalue"] = (df["value"] * 10).astype("int64") if len(df) \
        else pd.Series([], dtype="int64")
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _as_frame(out):
    if hasattr(out, "to_pandas"):
        return out.to_pandas()
    return out


# (name, builder, fn) — fn returns Dataset | DataFrame | scalar
DOC_OPS = [
    ("exact_dedup", lambda ds: dd.exact_dedup(ds)),
    ("near_dup_text_groups",
     lambda ds: dd.near_dup_text_groups(ds, min_len=10, max_count=4)),
    ("minhash_lsh_pairs",
     lambda ds: dd.minhash_lsh_pairs(ds, num_perm=16, bands=4,
                                     threshold=0.4, concurrency=2)),
    ("simhash_pairs",
     lambda ds: dd.simhash_pairs(ds, max_hamming=3, concurrency=2)),
    ("ngram_jaccard_pairs", lambda ds: dd.ngram_jaccard_pairs(ds)),
    ("token_counts", lambda ds: to.token_counts(ds)),
    ("quality_scores", lambda ds: to.quality_scores(ds)),
    ("langid", lambda ds: to.langid(ds)),
    ("repetition_stats", lambda ds: to.repetition_stats(ds)),
    ("fingerprints", lambda ds: to.fingerprints(ds)),
    ("mask_pii", lambda ds: to.mask_pii(ds)),
    ("chunk_documents",
     lambda ds: to.chunk_documents(ds, chunk_size=8, stride=6)),
    ("tfidf_top_terms", lambda ds: to.tfidf_top_terms(ds, k=3)),
    ("common_ngrams", lambda ds: to.common_ngrams(ds, n=3, min_docs=2)),
    ("duplicated_substrings",
     lambda ds: to.duplicated_substrings(ds, window=10, min_docs=2)),
    ("decontaminate",
     lambda ds: to.decontaminate(ds, {"quick brown fox jumps"}, n=4)),
    ("assign_split", lambda ds: sp.assign_split(ds)),
    ("stratified_sample",
     lambda ds: sp.stratified_sample(ds, default_pct=50)),
    ("seeded_shuffle_positions",
     lambda ds: sp.seeded_shuffle_positions(ds, num_parts=4)),
    ("grouped_hash_sample_k",
     lambda ds: sp.grouped_hash_sample_k(ds, key_col="lang", k=2,
                                         num_buckets=8)),
    ("heavy_hitters", lambda ds: sk.heavy_hitters(ds, k=16)),
    ("segment_dedup", lambda ds: dd.segment_dedup(ds, tokens_per_seg=5)),
    ("source_quality_gate",
     lambda ds: to.source_quality_gate(ds, group_col="lang")),
    ("bigram_logprob_scores", lambda ds: to.bigram_logprob_scores(ds)),
]

EVENT_OPS = [
    ("rolling_window_sum",
     lambda ds: wn.rolling_window_sum(ds, key_col="user_id",
                                      order_cols=["ts", "event_id"],
                                      value_col="value", window=3,
                                      num_buckets=8)),
    ("latest_per_key",
     lambda ds: wn.latest_per_key(ds, key_col="user_id",
                                  order_cols=["ts", "event_id"],
                                  num_buckets=8)),
    ("grouped_running_sum",
     lambda ds: wn.grouped_running_sum(ds, key_col="user_id",
                                       order_cols=["ts", "event_id"],
                                       value_col="value", num_buckets=8)),
    ("prefix_sum",
     lambda ds: wn.prefix_sum(ds, key_col="event_id", value_col="ivalue")),
    ("grouped_pearson",
     lambda ds: wn.grouped_pearson(ds, key_col="user_id", x_col="ts",
                                   y_col="value", num_buckets=8)),
    ("exact_quantiles",
     lambda ds: wn.exact_quantiles(ds, value_col="value",
                                   qs=[0.25, 0.5, 0.75])),
    ("grouped_quantiles",
     lambda ds: wn.grouped_quantiles(ds, key_col="user_id",
                                     value_col="value", qs=[0.5])),
    ("hash_sample", lambda ds: wn.hash_sample(ds, id_col="event_id",
                                              pct=50)),
    ("approx_quantiles",
     lambda ds: sk.approx_quantiles(ds, value_col="value", qs=[0.5])),
    ("hopping_window_agg",
     lambda ds: wn.hopping_window_agg(ds, ts_col="ts", value_col="value",
                                      width_s=900, hop_s=300)),
    ("grouped_distinct_count",
     lambda ds: wn.grouped_distinct_count(ds, key_col="user_id",
                                          value_col="event_id")),
    ("grouped_hll_distinct",
     lambda ds: sk.grouped_hll_distinct(ds, key_col="user_id",
                                        value_col="event_id")),
    ("grouped_mode",
     lambda ds: wn.grouped_mode(ds, key_col="user_id",
                                value_col="event_id")),
    ("grouped_lag",
     lambda ds: wn.grouped_lag(ds, key_col="user_id",
                               order_cols=["ts", "event_id"],
                               value_col="value", num_buckets=8)),
    ("grouped_mad",
     lambda ds: wn.grouped_mad(ds, key_col="user_id",
                               value_col="ivalue")),
    ("grouped_approx_quantiles",
     lambda ds: sk.grouped_approx_quantiles(ds, key_col="user_id",
                                            value_col="value",
                                            qs=[0.5])),
]


@pytest.mark.parametrize("name,fn", [(n, f) for n, f in DOC_OPS],
                         ids=[n for n, _ in DOC_OPS])
def test_doc_ops_degenerate(ray_session, name, fn):
    frames = {}
    for variant in VARIANTS:
        out = _as_frame(fn(_docs(variant)))
        assert isinstance(out, pd.DataFrame), (name, variant)
        frames[variant] = out
    assert len(frames["empty"]) == 0, name
    _assert_schema_contract(name, frames)


def _assert_schema_contract(name: str, frames: dict):
    cols = {v: tuple(sorted(f.columns)) for v, f in frames.items()}
    populated = {c for v, c in cols.items() if len(frames[v].columns)}
    # populated variants must agree exactly
    assert len(populated) <= 1, (name, cols)
    for v, c in cols.items():
        # zero-block empties (0 cols) are the documented Ray fact;
        # an output that HAS columns must match the populated schema
        if len(c) and populated and c not in populated:
            pytest.fail(f"{name}: {v} schema drift: {cols}")


@pytest.mark.parametrize("name,fn", [(n, f) for n, f in EVENT_OPS],
                         ids=[n for n, _ in EVENT_OPS])
def test_event_ops_degenerate(ray_session, name, fn):
    frames = {}
    for variant in VARIANTS:
        out = _as_frame(fn(_events(variant)))
        assert isinstance(out, pd.DataFrame), (name, variant)
        frames[variant] = out
    _assert_schema_contract(name, frames)


def test_scalar_ops_degenerate(ray_session):
    for variant in VARIANTS:
        docs = _docs(variant)
        n = wn.distinct_count(docs, col="text")
        assert n == {"empty": 0, "one": 1, "dups": 1}[variant]
        est = sk.approx_distinct_tokens(docs)
        assert est >= 0.0
        bloom = sk.build_bloom(_events(variant), key_col="event_id",
                               m_bits=1 << 10)
        if variant != "empty":
            assert bloom.might_contain(
                np.array([0 if variant == "dups" else 10],
                         dtype=np.int64))[0]


def test_incremental_dedup_degenerate(ray_session):
    one = _docs("one")
    for variant in VARIANTS:
        out = dd.incremental_dedup(one, _docs(variant),
                                   num_shards=2).to_pandas()
        # every variant's text equals the base text → nothing survives;
        # columns are either the typed set or the zero-block empty
        assert len(out) == 0, variant
        assert set(out.columns) in ({"text_hash", "doc_id", "n_new"},
                                    set()), variant
