"""Degenerate-input sweep for the round-4 registry queries (the
sf_dir-level analogue of tests/test_degenerate.py): each query must
survive an EMPTY table, a 1-ROW table and an ALL-DUPLICATE table
without crashing, return an empty frame for empty input, and keep one
output schema across populated variants."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from news_crawler_ray.queries import QUERIES

_TEXT = ("the quick brown fox jumps over the lazy dog and runs far "
         "away into the deep green forest tonight join hash scan")

VARIANTS = ("empty", "one", "dups")


def _write_sf_dir(root: str, variant: str) -> str:
    d = os.path.join(root, variant)
    os.makedirs(d, exist_ok=True)
    if variant == "empty":
        docs = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "text": pd.Series([], dtype="object"),
                             "lang": pd.Series([], dtype="object"),
                             "source": pd.Series([], dtype="object"),
                             "n_chars": pd.Series([], dtype="int64")})
        emb = pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                            "embedding": pd.Series([], dtype="object"),
                            "label": pd.Series([], dtype="int32")})
        emb_t = pa.table({
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
            "label": pa.array([], pa.int32())})
    elif variant == "one":
        docs = pd.DataFrame({"doc_id": [0], "text": [_TEXT],
                             "lang": ["en"], "source": ["s0"],
                             "n_chars": [len(_TEXT)]})
        emb_t = pa.table({
            "vec_id": pa.array([0], pa.int64()),
            "embedding": pa.array([[0.1] * 8], pa.list_(pa.float32())),
            "label": pa.array([0], pa.int32())})
    else:
        docs = pd.DataFrame({"doc_id": range(6), "text": [_TEXT] * 6,
                             "lang": ["en", "de"] * 3,
                             "source": ["s0"] * 6,
                             "n_chars": [len(_TEXT)] * 6})
        emb_t = pa.table({
            "vec_id": pa.array(list(range(6)), pa.int64()),
            "embedding": pa.array([[0.1] * 8] * 6, pa.list_(pa.float32())),
            "label": pa.array([0] * 6, pa.int32())})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    pq.write_table(emb_t, os.path.join(d, "embeddings.parquet"))
    return d


QUERY_NAMES = ["q_bm25_topk", "q_embedding_components", "q_lm_quality",
               "q_dsir_weights", "q_ngram_novelty", "q_embed_quant_stats",
               "q_hard_negatives", "q_source_temperature_mix",
               "q_dedup_cascade", "q_embedding_norm_outliers",
               "q_quality_curriculum"]


@pytest.fixture(scope="module")
def sf_dirs(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("degen_sf"))
    return {v: _write_sf_dir(root, v) for v in VARIANTS}


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_degenerate(sf_dirs, name):
    fn = QUERIES[name]
    frames = {}
    for variant in VARIANTS:
        out = fn(sf_dirs[variant])
        assert isinstance(out, pd.DataFrame), (name, variant)
        frames[variant] = out
    assert len(frames["empty"]) == 0, name
    # populated variants must agree on schema; empties may be typed
    # empty frames with the same columns
    cols = {v: tuple(f.columns) for v, f in frames.items()}
    populated = {c for v, c in cols.items() if len(frames[v])}
    assert len(populated) <= 1, (name, cols)
    for v, c in cols.items():
        if populated and c not in populated:
            pytest.fail(f"{name}: {v} schema drift: {cols}")


def test_hard_negatives_semantics(ray_session, tmp_path):
    """Two labels, orthogonal-ish vectors: each anchor's negatives are
    exactly the other label's vectors, ranked by cosine; same-label
    vectors never appear. Single-label corpora (the dups variant)
    yield zero rows by construction — this pins the populated path."""
    d = str(tmp_path)
    vecs = [[1.0, 0.0, 0.0, 0.0], [0.9, 0.1, 0.0, 0.0],   # label 0
            [0.0, 1.0, 0.0, 0.0], [0.1, 0.9, 0.0, 0.0],   # label 1
            [0.5, 0.5, 0.0, 0.0]]                          # label 1
    t = pa.table({"vec_id": pa.array(list(range(5)), pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32())),
                  "label": pa.array([0, 0, 1, 1, 1], pa.int32())})
    pq.write_table(t, os.path.join(d, "embeddings.parquet"))
    out = QUERIES["q_hard_negatives"](d)
    by_label = {q: g for q, g in out.groupby("qlabel")}
    # anchor 0 (label 0): negatives drawn only from label-1 vectors
    assert set(by_label[0]["vec_id"]) == {2, 3, 4}
    assert set(by_label[1]["vec_id"]) == {0, 1}
    # hardest negative for the label-0 anchor [1,0,0,0] is vec 4
    assert by_label[0].iloc[0]["vec_id"] == 4
    # ranks are 1..n and similarity is non-increasing within a label
    for g in by_label.values():
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (np.diff(g["cos_sim"].to_numpy()) <= 0).all()


def test_source_temperature_mix_semantics(ray_session, tmp_path):
    """alpha=0.7 flattens the distribution: the small source's sampling
    weight exceeds its raw share, the big one's shrinks, and p sums
    to ~1e6 micro."""
    d = str(tmp_path)
    docs = pd.DataFrame({"doc_id": range(10),
                         "text": [_TEXT] * 10,
                         "lang": ["en"] * 10,
                         "source": ["big"] * 9 + ["small"],
                         "n_chars": [len(_TEXT)] * 10})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    out = QUERIES["q_source_temperature_mix"](d).set_index("source")
    assert out.loc["small", "p_micro"] > out.loc["small", "share_micro"]
    assert out.loc["big", "p_micro"] < out.loc["big", "share_micro"]
    assert abs(int(out["p_micro"].sum()) - 1_000_000) <= 2


def test_all_duplicate_semantics(sf_dirs):
    """Spot semantic checks on the all-duplicate variant: every doc's
    trigrams appear in all 6 docs (novelty 0); identical embeddings
    form ONE component rooted at the min vec_id."""
    nov = QUERIES["q_ngram_novelty"](sf_dirs["dups"])
    assert (nov["n_novel"] == 0).all()
    comp = QUERIES["q_embedding_components"](sf_dirs["dups"])
    assert set(comp["component_id"]) == {0}
