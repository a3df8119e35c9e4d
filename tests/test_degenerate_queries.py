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
               "q_quality_curriculum", "q_gopher_quality",
               "q_codepoint_entropy", "q_zipf_slope",
               "q_line_dup_stats", "q_c4_line_filter", "q_semdedup",
               "q_ngram_repetition", "q_tokenizer_fertility",
               "q_contamination_rate", "q_ccnet_buckets",
               "q_dup_span_coverage", "q_prep_funnel",
               "q_snapshot_diff", "q_normalize_text",
               "q_change_rate", "q_winsorized_stats",
               "q_tfidf_cosine_pairs"]


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


def test_gopher_quality_semantics(ray_session, tmp_path):
    """Pin each Gopher rule against a doc crafted to fail exactly it:
    a 60-word clean doc passes all 7; a short doc fails r_wordcount;
    a bullet-flood fails r_bullet; a hash-flood fails r_symbol; a
    stopword-free doc fails r_stop."""
    d = str(tmp_path)
    clean = ("the quick brown fox jumps over that lazy dog and have "
             "far away with deep green forest " * 4).strip()
    assert len(clean.split()) >= 50
    bullets = "\n".join("• item %d be of the and that have with x" % i
                        for i in range(10)) + "\n" + clean
    hashes = clean + " " + "#" * 40
    nostop = " ".join("%05d" % i for i in range(60))   # digits only
    docs = pd.DataFrame({
        "doc_id": range(4),
        "text": [clean, bullets, hashes, nostop],
        "lang": ["en"] * 4, "source": ["s0"] * 4,
        "n_chars": [len(clean), len(bullets), len(hashes), len(nostop)]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    out = QUERIES["q_gopher_quality"](d).set_index("doc_id")
    assert out.loc[0, "pass_all"] == 1
    assert (out.loc[0, ["r_wordcount", "r_meanlen", "r_symbol",
                        "r_bullet", "r_ellipsis", "r_alpha",
                        "r_stop"]] == 1).all()
    assert out.loc[1, "r_bullet"] == 0 and out.loc[1, "pass_all"] == 0
    assert out.loc[2, "r_symbol"] == 0
    assert out.loc[3, "r_stop"] == 0 and out.loc[3, "r_alpha"] == 0


def test_codepoint_entropy_semantics(ray_session, tmp_path):
    """'aaaa' has entropy exactly 0; a 2-symbol uniform string lands at
    floor(ln(2)·1000) = 693; n_chars counts CODEPOINTS (astral chars
    count once)."""
    d = str(tmp_path)
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["aaaa", "abababab", "𝕏y", ""],
        "lang": ["en"] * 4, "source": ["s0"] * 4,
        "n_chars": [4, 8, 2, 0]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    out = QUERIES["q_codepoint_entropy"](d).set_index("doc_id")
    assert list(out.index) == [0, 1, 2]      # empty text absent
    assert out.loc[0, "entropy_milli"] == 0
    assert out.loc[1, "entropy_milli"] == 693
    assert out.loc[2, "n_chars"] == 2        # astral = one codepoint


def test_zipf_slope_semantics(ray_session, tmp_path):
    """Counts 4:2 over ranks 1:2 give slope exactly −1 (slope_milli
    −1000); a single-distinct-token source is absent (undefined)."""
    d = str(tmp_path)
    docs = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["x x x x y y", "solo solo solo"],
        "lang": ["en"] * 2, "source": ["s0", "s1"],
        "n_chars": [11, 14]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    out = QUERIES["q_zipf_slope"](d).set_index("source")
    assert list(out.index) == ["s0"]
    assert out.loc["s0", "n_top"] == 2
    assert out.loc["s0", "slope_milli"] == -1000


def test_line_dup_stats_semantics(ray_session, tmp_path):
    """'dup line' three times over five lines: dup_lines = 2 (extra
    occurrences), dup_line_chars = 16; paragraphs (split on blank
    line) have no duplicates; the 30%-line flag fails (2/5 > 0.3)
    while both paragraph flags pass."""
    d = str(tmp_path)
    messy = "dup line\ndup line\nunique one\n\ndup line"
    clean = "x\ny\nz"
    docs = pd.DataFrame({
        "doc_id": [0, 1], "text": [messy, clean],
        "lang": ["en"] * 2, "source": ["s0"] * 2,
        "n_chars": [len(messy), len(clean)]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    out = QUERIES["q_line_dup_stats"](d).set_index("doc_id")
    assert out.loc[0, "n_lines"] == 5
    assert out.loc[0, "dup_lines"] == 2
    assert out.loc[0, "dup_line_chars"] == 16
    assert out.loc[0, "n_paras"] == 2 and out.loc[0, "dup_paras"] == 0
    assert out.loc[0, "f_dup_line"] == 0
    assert out.loc[0, "f_dup_para"] == 1
    assert (out.loc[1, ["dup_lines", "dup_paras"]] == 0).all()
    assert (out.loc[1, ["f_dup_line", "f_dup_para",
                        "f_dup_line_chars",
                        "f_dup_para_chars"]] == 1).all()


def test_c4_line_filter_semantics(ray_session, tmp_path):
    """Pin each C4 rule: a no-terminal-punct line, a <5-word line and
    a javascript line are all dropped; three kept sentences pass the
    page gate; 'lorem ipsum' and '{' each fail it."""
    d = str(tmp_path)
    keep = "This sentence has more than five words."
    doc0 = "\n".join([keep, "no punctuation here at all today",
                      "Too short.",
                      "Please enable JavaScript to view this page."])
    doc1 = "\n".join(["One two three four five six."] * 3)
    doc2 = doc1 + "\nLorem Ipsum dolor sit amet friend."
    doc3 = doc1 + "\nconfig = { a: 1 }"
    docs = pd.DataFrame({
        "doc_id": range(4), "text": [doc0, doc1, doc2, doc3],
        "lang": ["en"] * 4, "source": ["s0"] * 4,
        "n_chars": [len(doc0), len(doc1), len(doc2), len(doc3)]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    out = QUERIES["q_c4_line_filter"](d).set_index("doc_id")
    assert out.loc[0, "n_lines"] == 4
    assert out.loc[0, "n_kept_lines"] == 1
    assert out.loc[0, "kept_chars"] == len(keep)
    assert out.loc[0, "n_sentences"] == 1
    assert out.loc[0, "pass_all"] == 0          # < 3 sentences
    assert out.loc[1, "n_sentences"] == 3
    assert out.loc[1, "pass_all"] == 1
    assert out.loc[2, "f_lorem"] == 0 and out.loc[2, "pass_all"] == 0
    assert out.loc[3, "f_brace"] == 0 and out.loc[3, "pass_all"] == 0


def test_semdedup_semantics(ray_session, tmp_path):
    """Eight axis-aligned seeds own themselves (all kept); two extra
    vectors near seed 0 land in cluster 0 and are pruned by the
    keep-first rule (cos to v0 = 0.99995 and 0.83205, both ≥ 0.45)."""
    d = str(tmp_path)
    vecs = []
    for i in range(4):
        v = [0.0] * 4
        v[i] = 1.0
        vecs.append(v)
    for i in range(4):
        v = [0.0] * 4
        v[i] = -1.0
        vecs.append(v)
    vecs.append([0.99, 0.01, 0.0, 0.0])
    vecs.append([0.6, 0.4, 0.0, 0.0])
    t = pa.table({"vec_id": pa.array(list(range(10)), pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32())),
                  "label": pa.array([0] * 10, pa.int32())})
    pq.write_table(t, os.path.join(d, "embeddings.parquet"))
    out = QUERIES["q_semdedup"](d).set_index("vec_id")
    assert (out.loc[0:7, "kept"] == 1).all()
    assert (out.loc[0:7, "cluster"].to_numpy()
            == np.arange(8)).all()
    assert out.loc[8, "cluster"] == 0 and out.loc[8, "kept"] == 0
    assert out.loc[9, "cluster"] == 0 and out.loc[9, "kept"] == 0


def test_all_duplicate_semantics(sf_dirs):
    """Spot semantic checks on the all-duplicate variant: every doc's
    trigrams appear in all 6 docs (novelty 0); identical embeddings
    form ONE component rooted at the min vec_id."""
    nov = QUERIES["q_ngram_novelty"](sf_dirs["dups"])
    assert (nov["n_novel"] == 0).all()
    comp = QUERIES["q_embedding_components"](sf_dirs["dups"])
    assert set(comp["component_id"]) == {0}


def test_snapshot_diff_one_side_empty(ray_session, tmp_path):
    """doc_ids that are multiples of 7 are excluded from the OLD
    snapshot; a corpus of only such ids exercises the
    empty-old-side short-circuit (everything 'added', no join)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_crawler_ray.queries import QUERIES
    d = str(tmp_path)
    docs = pd.DataFrame({
        "doc_id": pd.Series([7, 49], dtype="int64"),
        "text": ["alpha body", "beta body"],
        "lang": ["en", "en"], "source": ["s0", "s1"],
        "n_chars": pd.Series([10, 9], dtype="int64")})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    out = QUERIES["q_snapshot_diff"](d)
    assert out["status"].tolist() == ["added", "added"]
    assert out["source"].tolist() == ["s0", "s1"]
    assert out["n"].tolist() == [1, 1]
