"""Text-analysis operators: token stats, quality scoring, language id,
document fingerprinting. All deterministic, all vectorizable per batch;
SQL-expressible ones get DuckDB oracles in __ray_entry__.
"""

from __future__ import annotations

import hashlib
import re
import string
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count

from ..extract.textstats import STOPWORDS, detect_language
from ..rayutil import light_shuffle_aggregators

_PUNCT = set(string.punctuation)
_PUNCT_CLASS = re.compile(r"[.,;:!?]")


def token_counts(ds: "rd.Dataset", text_col: str = "text",
                 id_col: str = "doc_id") -> "rd.Dataset":
    """(doc_id, n_tokens, n_chars): whitespace tokens + char length.
    SQL equivalent: length-filtered string_split_regex."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("")
        return pd.DataFrame({
            "doc_id": batch[id_col],
            "n_tokens": texts.str.split().str.len().astype("int64"),
            "n_chars": texts.str.len().astype("int64"),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pandas")


def quality_scores(ds: "rd.Dataset", text_col: str = "text",
                   id_col: str = "doc_id") -> "rd.Dataset":
    """(doc_id, n_chars, n_words, avg_word_len, punct_ratio,
    stopword_ratio) — length/punctuation/stopword quality signals for
    corpus filtering (en stopword list; ratio over whitespace tokens)."""
    en = STOPWORDS["en"]

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        out = {k: [] for k in ("doc_id", "n_chars", "n_words",
                               "avg_word_len", "punct_ratio",
                               "stopword_ratio")}
        for did, text in zip(batch[id_col], batch[text_col].fillna("")):
            words = text.split()
            n_chars = len(text)
            n_words = len(words)
            total_wlen = sum(len(w) for w in words)
            n_punct = len(_PUNCT_CLASS.findall(text))
            n_stop = sum(1 for w in words if w.lower() in en)
            out["doc_id"].append(did)
            out["n_chars"].append(n_chars)
            out["n_words"].append(n_words)
            out["avg_word_len"].append(total_wlen / n_words if n_words else 0.0)
            out["punct_ratio"].append(n_punct / n_chars if n_chars else 0.0)
            out["stopword_ratio"].append(n_stop / n_words if n_words else 0.0)
        return pd.DataFrame(out)

    return ds.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pandas")


def langid(ds: "rd.Dataset", text_col: str = "text",
           id_col: str = "doc_id") -> "rd.Dataset":
    """(doc_id, lang_pred): deterministic stopword-vote language id (the
    engine's replacement for unseeded langdetect — SURVEY.md §2.2 M9)."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch[id_col],
            "lang_pred": [detect_language(t or "")
                          for t in batch[text_col]],
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pandas")


def repetition_stats(ds: "rd.Dataset", text_col: str = "text",
                     id_col: str = "doc_id") -> "rd.Dataset":
    """(doc_id, n_tokens, n_types, top_token_n, top_bigram_n) —
    Gopher-style repetition signals (Rae et al. 2021 §A1.1: fraction of
    tokens in the most common n-gram) for corpus quality filtering.

    All outputs are int64 counts, never ratios: integer results are
    bit-identical across engines, so the DuckDB oracle comparison is
    exact (ratios are one vectorized division away for the caller).
    Pure per-batch map — no shuffle, embarrassingly parallel at 100 TB.
    """

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        out: dict[str, list] = {k: [] for k in (
            "doc_id", "n_tokens", "n_types", "top_token_n",
            "top_bigram_n")}
        for did, text in zip(batch[id_col], batch[text_col].fillna("")):
            words = text.split()
            uni = Counter(words)
            bi = Counter(zip(words, words[1:]))
            out["doc_id"].append(did)
            out["n_tokens"].append(len(words))
            out["n_types"].append(len(uni))
            out["top_token_n"].append(max(uni.values()) if uni else 0)
            out["top_bigram_n"].append(max(bi.values()) if bi else 0)
        return pd.DataFrame({
            "doc_id": out["doc_id"],
            "n_tokens": pd.Series(out["n_tokens"], dtype="int64"),
            "n_types": pd.Series(out["n_types"], dtype="int64"),
            "top_token_n": pd.Series(out["top_token_n"], dtype="int64"),
            "top_bigram_n": pd.Series(out["top_bigram_n"], dtype="int64"),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pandas")


def term_frequencies(ds: "rd.Dataset", text_col: str = "text",
                     id_col: str = "doc_id") -> "rd.Dataset":
    """(doc_id, token, tf): per-document term counts. Each input row is
    one document, so a document's counts are complete within the batch
    that holds it — no cross-batch combine needed."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ids, toks, tfs = [], [], []
        for did, text in zip(batch[id_col], batch[text_col].fillna("")):
            for tok, c in Counter(text.split()).items():
                ids.append(did)
                toks.append(tok)
                tfs.append(c)
        return pd.DataFrame({"doc_id": ids, "token": toks,
                             "tf": pd.Series(tfs, dtype="int64")})

    return ds.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pandas")


def tfidf_top_terms(ds: "rd.Dataset", *, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 3,
                    num_buckets: int = 64) -> "rd.Dataset":
    """Top-``k`` terms per document by tf-idf (doc_id, token,
    tfidf_micro), tie-broken by token.

    Shape — TWO bucket shuffles, no join: per-doc term counts (map) →
    ``groupby(token-bucket)``, where each bucket group holds complete
    token populations (a token lives in exactly one bucket), so df is
    one vectorized transform INSIDE the group and scoring happens right
    there → per-bucket partial top-k per doc → ``groupby(doc-bucket)``
    final top-k. This replaces the earlier df-groupby + tf⋈df hash
    join: the join's aggregator actors and the separate df shuffle were
    pure overhead when df can be computed where the tf rows already
    land (1.8× faster at sf0.1, byte-identical output).

    Scale sizing: one token-bucket is processed by ONE task and holds
    ~total_tf_rows / num_buckets rows — pick ``num_buckets ≈
    corpus_tf_rows·row_width / 512 MB`` at real scale (the
    rolling_window_sum rule); 64 fits fixture scale. Hot tokens ("the",
    df ≈ n_docs) spread across buckets only as far as their bucket
    allows — a single token's rows always co-locate, which df needs.

    Scores are integerized (floor(tf·ln(N/df)·1e6 + 0.5)) so ranking and
    the oracle comparison are exact across engines — float64 libm ln
    differs well below 1e-6 absolute at these magnitudes.
    """
    from ..rayutil import salt_bucket

    n_docs = float(ds.count())
    if n_docs == 0:
        # zero-cost early exit (the count above is already paid);
        # returns the typed empty the callers expect
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "tfidf_micro": pa.array([], pa.int64())}))
    tf = term_frequencies(ds, text_col=text_col, id_col=id_col)

    def add_token_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket"] = salt_bucket(b["token"].to_numpy(), num_buckets) \
            if len(b) else pd.Series([], dtype="int32")
        return b

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # (doc, token) is unique in tf rows → per-token group size IS df
        df = g.groupby("token")["doc_id"].transform("size")
        idf = np.log(n_docs / df.to_numpy(dtype=np.float64))
        micro = np.floor(g["tf"].to_numpy(dtype=np.float64) * idf
                         * 1_000_000 + 0.5).astype(np.int64)
        out = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                            "token": g["token"].to_numpy(),
                            "tfidf_micro": micro})
        # partial top-k per doc WITHIN the bucket bounds the final
        # shuffle to ≤ k rows per (doc, bucket)
        out = out.sort_values(["doc_id", "tfidf_micro", "token"],
                              ascending=[True, False, True])
        return out.groupby("doc_id", as_index=False).head(k)

    def add_doc_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        # salt docs for the final stage: grouping by doc_id directly
        # would make one map_groups group PER DOC (~1 ms of Python each)
        b["bucket2"] = salt_bucket(b["doc_id"].to_numpy(), num_buckets) \
            if len(b) else pd.Series([], dtype="int32")
        return b

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "tfidf_micro", "token"],
                          ascending=[True, False, True])
        return g.groupby("doc_id", as_index=False).head(k) \
            .drop(columns=["bucket2"])

    return tf.map_batches(add_token_bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(score_bucket,
                                      batch_format="pandas") \
        .map_batches(add_doc_bucket, batch_format="pandas") \
        .groupby("bucket2").map_groups(final_topk, batch_format="pandas")


def common_ngrams(ds: "rd.Dataset", *, n: int = 3, min_docs: int = 2,
                  num_buckets: int = 64, text_col: str = "text",
                  id_col: str = "doc_id") -> "rd.Dataset":
    """(ngram, n_docs): token n-grams occurring in ≥ ``min_docs``
    distinct documents — C4-style corpus-boilerplate detection (Raffel
    et al. 2020 §2.2 dedupe repeated three-sentence spans; here token
    n-grams).

    Scale shape: each batch emits one row per (ngram, batch) with the
    count of distinct docs in that batch (per-doc dedup is local because
    a doc is one input row), so the shuffle moves pre-aggregated rows.
    The final sum groups by a crc32 BUCKET of the ngram (64 groups, one
    vectorized pandas sum each), not by the ngram itself: Ray's
    aggregate costs ~ms per group, so grouping a vocabulary-sized key
    directly is 10-40× slower (measured 37 s vs <2 s on 27 k ngrams).
    At larger corpora raise ``num_buckets`` so a bucket's distinct
    ngrams fit a worker's heap; bucket counts are exact regardless."""
    import zlib

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts: Counter = Counter()
        for text in batch[text_col].fillna(""):
            words = text.split()
            grams = {" ".join(words[i:i + n])
                     for i in range(len(words) - n + 1)}
            counts.update(grams)
        grams_l = list(counts)
        return pd.DataFrame({
            "bucket": pd.Series(
                [zlib.crc32(g.encode()) % num_buckets for g in grams_l],
                dtype="int64"),
            "ngram": grams_l,
            "n_docs": pd.Series(list(counts.values()), dtype="int64")})

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("ngram", as_index=False)["n_docs"].sum()
        s = s[s["n_docs"] >= min_docs]
        return pd.DataFrame({"ngram": s["ngram"].to_numpy(),
                             "n_docs": s["n_docs"].astype("int64").to_numpy()})

    return ds.select_columns([id_col, text_col]) \
        .map_batches(partial, batch_format="pandas") \
        .groupby("bucket").map_groups(reduce_bucket, batch_format="pandas")


def eval_ngram_set(eval_ds: "rd.Dataset", *, n: int = 4,
                   text_col: str = "text") -> set[str]:
    """Distinct token n-grams of a (small) eval/benchmark dataset,
    collected to the driver. Benchmark suites are MBs while the train
    corpus is TBs, so driver-collecting THIS side is the broadcast-small
    pattern, not a scale bug — the per-batch distinct pass bounds what
    crosses the wire to unique n-grams per batch."""

    def grams(batch: pd.DataFrame) -> pd.DataFrame:
        out: set[str] = set()
        for text in batch[text_col].fillna(""):
            words = text.split()
            out.update(" ".join(words[i:i + n])
                       for i in range(len(words) - n + 1))
        return pd.DataFrame({"ngram": sorted(out)})

    rows = eval_ds.select_columns([text_col]).map_batches(
        grams, batch_format="pandas").to_pandas()
    # an EMPTY eval dataset never runs the UDF → zero-column frame
    return set(rows["ngram"]) if "ngram" in rows.columns else set()


def decontaminate(ds: "rd.Dataset", eval_ngrams: set[str], *, n: int = 4,
                  text_col: str = "text", id_col: str = "doc_id",
                  keep_clean: bool = False) -> "rd.Dataset":
    """Benchmark decontamination (the train/test-overlap scrub every LLM
    data pipeline runs; cf. Brown et al. 2020 §C). Default emits
    (doc_id, n_hits) for train documents sharing ≥1 distinct token
    n-gram with the eval set; ``keep_clean=True`` instead passes the
    UNcontaminated rows through with all their columns (the filter form
    used mid-pipeline). The eval n-gram set is ``ray.put`` once and
    probed per batch: zero shuffle, one object-store copy per node,
    embarrassingly parallel over the 100-TB side."""
    import ray as _ray

    from ..rayutil import cached_object
    ref = _ray.put(frozenset(eval_ngrams))

    def hit_counts(batch: pd.DataFrame) -> np.ndarray:
        eg = cached_object(ref)
        out = []
        for text in batch[text_col].fillna(""):
            words = text.split()
            grams = {" ".join(words[i:i + n])
                     for i in range(len(words) - n + 1)}
            out.append(len(grams & eg))
        return np.array(out, dtype=np.int64)

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        hits = hit_counts(batch)
        m = hits > 0
        return pd.DataFrame({
            "doc_id": batch[id_col].to_numpy()[m],
            "n_hits": pd.Series(hits[m], dtype="int64")})

    def clean(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[hit_counts(batch) == 0]

    if keep_clean:
        return ds.map_batches(clean, batch_format="pandas")
    return ds.select_columns([id_col, text_col]).map_batches(
        flag, batch_format="pandas")


def contamination_stats(ds: "rd.Dataset", eval_ngrams: set[str], *,
                        n: int = 4, text_col: str = "text",
                        id_col: str = "doc_id",
                        dirty_denom: int = 20) -> "rd.Dataset":
    """Per-document contamination RATE vs an eval n-gram set — the
    graded form of ``decontaminate`` (Brown et al. 2020 §C judge a doc
    "dirty" by its overlap fraction, not a binary hit): for every doc
    with ≥1 distinct token n-gram, emit (doc_id, n_grams, n_hits,
    is_dirty) where is_dirty is the pure-integer cross-multiplication
    ``n_hits · dirty_denom ≥ n_grams`` (default: ≥5 % of the doc's
    distinct n-grams appear in the eval set). Same scale shape as
    decontaminate: eval set ``ray.put`` once, probed per batch — zero
    shuffle, embarrassingly parallel over the 100-TB side."""
    import ray as _ray

    from ..rayutil import cached_object
    ref = _ray.put(frozenset(eval_ngrams))

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        eg = cached_object(ref)
        ids, totals, hits = [], [], []
        for did, text in zip(batch[id_col], batch[text_col].fillna("")):
            words = text.split()
            grams = {" ".join(words[i:i + n])
                     for i in range(len(words) - n + 1)}
            if not grams:
                continue       # <n words: no gram rows in the SQL twin
            ids.append(did)
            totals.append(len(grams))
            hits.append(len(grams & eg))
        tot = np.asarray(totals, dtype=np.int64)
        ht = np.asarray(hits, dtype=np.int64)
        return pd.DataFrame({
            id_col: pd.Series(ids, dtype="int64"),
            "n_grams": pd.Series(tot, dtype="int64"),
            "n_hits": pd.Series(ht, dtype="int64"),
            "is_dirty": pd.Series(
                (ht * dirty_denom >= tot).astype(np.int64),
                dtype="int64")})

    return ds.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pandas")


def chunk_documents(ds: "rd.Dataset", *, chunk_size: int = 64,
                    stride: int = 48, text_col: str = "text",
                    id_col: str = "doc_id") -> "rd.Dataset":
    """(doc_id, chunk_idx, n_tokens, chunk_text): fixed-stride token
    windows with ``chunk_size - stride`` tokens of overlap — the
    context-window chunking step of LLM training-data prep.

    flat_map shape: each input row fans out to ceil(n/stride) rows
    inside the batch UDF, so the expansion streams block-by-block with
    backpressure — the fan-out never accumulates on the driver, and at
    100 TB the output is just a wider stream into the next stage.
    Empty documents emit no chunks. Deterministic and exactly
    SQL-reproducible (DuckDB ``range(0, len(words), stride)`` + list
    slicing mirrors Python's ``range``/slice semantics).
    """

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, ns, texts = [], [], [], []
        for did, text in zip(batch[id_col], batch[text_col].fillna("")):
            words = text.split()
            for start in range(0, len(words), stride):
                chunk = words[start:start + chunk_size]
                ids.append(did)
                idxs.append(start // stride)
                ns.append(len(chunk))
                texts.append(" ".join(chunk))
        return pd.DataFrame({
            "doc_id": ids,
            "chunk_idx": pd.Series(idxs, dtype="int64"),
            "n_tokens": pd.Series(ns, dtype="int64"),
            "chunk_text": texts})

    return ds.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pandas")


def _winnow_fingerprints(text: str, k: int = 5, window: int = 4) -> list[int]:
    """Winnowing (Schleimer et al. 2003): rolling k-gram hashes, per
    window keep the rightmost minimum.

    k-gram hash is md5 (first 8 bytes, big-endian, masked to 61 bits) so
    the whole operator is reproducible in DuckDB —
    ``('0x'||substr(md5(g),1,16))::UBIGINT & ((1::UBIGINT<<61)-1)`` —
    giving doc_fingerprints an exact SQL oracle."""
    s = (text or "").lower()
    if len(s) < k:
        return []
    hashes = [int.from_bytes(
        hashlib.md5(s[i:i + k].encode()).digest()[:8], "big") & ((1 << 61) - 1)
        for i in range(len(s) - k + 1)]
    fps = []
    last = None
    for w in range(max(1, len(hashes) - window + 1)):
        win = hashes[w:w + window]
        m = min(win)
        pos = w + max(i for i, h in enumerate(win) if h == m)
        if pos != last:
            fps.append(hashes[pos - w + w])
            last = pos
    return fps


def fingerprints(ds: "rd.Dataset", text_col: str = "text",
                 id_col: str = "doc_id", k: int = 5,
                 window: int = 4) -> "rd.Dataset":
    """(doc_id, n_fingerprints, min_fp): winnowing document fingerprints
    (rolling-hash k-grams, window minima) for overlap detection."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        n_fp, min_fp = [], []
        for t in batch[text_col].fillna(""):
            fps = _winnow_fingerprints(t, k, window)
            n_fp.append(len(fps))
            min_fp.append(int(min(fps)) if fps else 0)
        return pd.DataFrame({"doc_id": batch[id_col],
                             "n_fingerprints": pd.Series(n_fp, dtype="int64"),
                             "min_fp": pd.Series(min_fp, dtype="uint64")})

    return ds.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pandas")


# PII patterns restricted to the RE2 ∩ Python-`re` common subset (no
# backreferences, no lookaround, only greedy quantifiers whose
# leftmost-match semantics agree between the engines) so the DuckDB
# regexp_replace oracle is exact; parity is property-tested over
# arbitrary text in tests/test_sql_parity.py.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}"
# \b is the ASCII word boundary in both Python re and RE2 (the corpus
# alphabet keeps it ASCII-only in practice); SSN runs AFTER phone so a
# masked phone's digits can never be re-claimed as an SSN
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"


def _anchor_windows(text: str, window: int, anchor_mod: int) -> set[str]:
    """Distinct content-defined windows of ``text``: a position p is an
    anchor iff the degree-3 polynomial hash of the 4 codepoints at p
    (base 257) is ≡ 0 mod ``anchor_mod``; the window is the ``window``
    chars starting at p. Anchoring on CONTENT (not on doc-relative
    stride offsets) makes sampling alignment-invariant: a span shared
    by two documents at different offsets selects the same anchor
    positions inside the span in both, so its windows collide. Fixed
    -stride sampling would only match by offset coincidence — this is
    the content-defined-chunking trick from dedup storage systems
    applied to corpus text. Hash is numpy-vectorized over all
    positions; the codepoint path goes through utf-32 so Python and
    DuckDB ``unicode(substr(...))`` see identical values."""
    return {text[p:p + window]
            for p in _anchor_positions(text, window, anchor_mod)}


def _anchor_positions(text: str, window: int,
                      anchor_mod: int) -> np.ndarray:
    """0-based anchor positions of ``text`` (the position set behind
    :func:`_anchor_windows`, exposed for span-coverage accounting)."""
    n = len(text)
    if n < window:
        return np.empty(0, dtype=np.int64)
    codes = np.frombuffer(
        text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    m = n - window + 1
    h = (codes[0:m] * 16974593 + codes[1:m + 1] * 66049
         + codes[2:m + 2] * 257 + codes[3:m + 3]) % anchor_mod
    return np.nonzero(h == 0)[0].astype(np.int64)


def duplicated_substrings(ds: "rd.Dataset", *, window: int = 30,
                          anchor_mod: int = 4, min_docs: int = 2,
                          num_buckets: int = 64,
                          num_join_partitions: int = 8,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> "rd.Dataset":
    """Per-document duplicated-substring exposure — the substring-level
    dedup signal of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better", ExactSubstr): a document's windows that
    occur verbatim in ≥ ``min_docs`` distinct documents. Returns
    (doc_id, n_windows, dup_windows) for documents with ≥1 duplicated
    window; dup_windows/n_windows is the fraction of the doc covered by
    cross-document copies.

    Lee et al. build a corpus-wide suffix array; at 100 TB that is an
    external-memory sort of every suffix. This operator gets the same
    duplicated-span signal from content-defined anchor sampling (see
    :func:`_anchor_windows`): shared spans of length ≳ window +
    anchor_mod·4 produce identical windows in every copy regardless of
    offset, EXACTLY — no hash-table probabilism, and the whole pipeline
    is three shuffle-light stages:

    1. map: per doc, distinct anchored windows → (doc_id, h) rows with
       h = 60-bit md5 prefix (the only full-text pass; rows are
       id-level from here on).
    2. window frequency: per-batch partial counts, crc-bucketed sum
       (one vectorized pandas pass per bucket, not one group per
       window hash — same rationale as :func:`common_ngrams`).
    3. distributed hash join rows⋈counts on h (both sides are
       vocabulary-scale; neither broadcasts at corpus size), then a
       salted per-doc count-sum.
    """
    if window < 4:
        raise ValueError("window must be ≥ 4 (anchor hash spans 4 chars)")

    def emit(batch: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        hashes: list[int] = []
        for doc_id, text in zip(batch[id_col], batch[text_col].fillna("")):
            for win in _anchor_windows(text, window, anchor_mod):
                ids.append(doc_id)
                hashes.append(int(
                    hashlib.md5(win.encode()).hexdigest()[:15], 16))
        return pd.DataFrame({
            id_col: pd.Series(ids, dtype="int64"),
            "h": pd.Series(hashes, dtype="int64")})

    # feeds BOTH the frequency subtree and the join's probe side; an
    # unpinned plan would re-anchor the whole corpus twice
    perdoc = ds.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pandas").materialize()
    if perdoc.count() == 0:
        # free on materialized data: a zero-window corpus would feed
        # zero-block inputs into the join (Acero FieldRef error)
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_windows": pa.array([], pa.int64()),
            "dup_windows": pa.array([], pa.int64())}))

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        # rows are distinct per (doc, h) by construction, so a row
        # count per h IS a doc count within this batch
        s = batch.groupby("h").size()
        h = s.index.to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "bucket": pd.Series(h % num_buckets, dtype="int64"),
            "h": h, "c": s.to_numpy(dtype=np.int64)})

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("h", as_index=False)["c"].sum()
        return pd.DataFrame({
            "h": s["h"].to_numpy(dtype=np.int64),
            "n_docs": s["c"].to_numpy(dtype=np.int64)})

    # repartition: aggregate partitions with no groups emit schema-less
    # empty blocks that break the join's FieldRef resolution
    hcnt = perdoc.map_batches(partial_counts, batch_format="pandas") \
        .groupby("bucket").map_groups(sum_bucket, batch_format="pandas") \
        .repartition(num_join_partitions)
    with light_shuffle_aggregators():
        joined = perdoc.join(hcnt, join_type="inner",
                             num_partitions=num_join_partitions,
                             on=("h",)).materialize()
    joined = joined.repartition(32)

    def _empty_partial() -> pd.DataFrame:
        # explicit dtypes: schema-less empty pandas blocks trigger the
        # executor's PandasBlockSchema-mismatch warning downstream
        return pd.DataFrame({
            id_col: pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "dup": pd.Series([], dtype="int64"),
            "bucket": pd.Series([], dtype="int32")})

    def partial_doc(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return _empty_partial()
        dup = (batch["n_docs"].to_numpy(dtype=np.int64)
               >= min_docs).astype(np.int64)
        g = pd.DataFrame({id_col: batch[id_col].to_numpy(dtype=np.int64),
                          "n": 1, "dup": dup}) \
            .groupby(id_col, as_index=False).sum()
        from ..rayutil import salt_bucket
        g["bucket"] = salt_bucket(g[id_col])
        return g

    def final_doc(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "n_windows": pd.Series([], dtype="int64"),
                "dup_windows": pd.Series([], dtype="int64")})
        s = g.groupby(id_col, as_index=False)[["n", "dup"]].sum()
        s = s[s["dup"] >= 1]
        return pd.DataFrame({
            id_col: s[id_col].to_numpy(dtype=np.int64),
            "n_windows": s["n"].to_numpy(dtype=np.int64),
            "dup_windows": s["dup"].to_numpy(dtype=np.int64)})

    return joined.map_batches(partial_doc, batch_format="pandas") \
        .groupby("bucket").map_groups(final_doc, batch_format="pandas")


def dup_span_coverage(ds: "rd.Dataset", *, window: int = 30,
                      anchor_mod: int = 4, min_docs: int = 2,
                      num_buckets: int = 64,
                      num_join_partitions: int = 8,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> "rd.Dataset":
    """Per-document CHARACTER coverage of cross-document duplicated
    spans — the span-removal budget of Lee et al. 2022 (ExactSubstr
    CUTS duplicated spans; this measures exactly how many characters
    that cut would remove per doc): interval-UNION length of all
    duplicated anchor windows, not a window count (overlapping windows
    must not double-count). Returns (doc_id, n_chars, covered_chars,
    covered_milli) for docs with ≥1 duplicated window.

    Same three-stage shape as :func:`duplicated_substrings`, plus the
    union fold: (doc_id, position, window_hash) rows → distinct-doc
    frequency per hash (crc-bucketed fold, duplicated hashes FILTERED
    before the join so only the duplicated vocabulary crosses it) →
    positions⋈dup-hashes join → per-doc salted-bucket interval union
    (vectorized running-max, one groupby.cummax per bucket — no
    per-interval Python loop)."""
    if window < 4:
        raise ValueError("window must be ≥ 4 (anchor hash spans 4 chars)")

    def emit(batch: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        ps: list[int] = []
        hashes: list[int] = []
        ncs: list[int] = []
        for doc_id, text in zip(batch[id_col], batch[text_col].fillna("")):
            pos = _anchor_positions(text, window, anchor_mod)
            n = len(text)
            for p in pos:
                ids.append(doc_id)
                ps.append(int(p))
                hashes.append(int(hashlib.md5(
                    text[p:p + window].encode()).hexdigest()[:15], 16))
                ncs.append(n)
        return pd.DataFrame({
            id_col: pd.Series(ids, dtype="int64"),
            "p": pd.Series(ps, dtype="int64"),
            "h": pd.Series(hashes, dtype="int64"),
            "n_chars": pd.Series(ncs, dtype="int64")})

    def _typed_empty() -> "rd.Dataset":
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_chars": pa.array([], pa.int64()),
            "covered_chars": pa.array([], pa.int64()),
            "covered_milli": pa.array([], pa.int64())}))

    # feeds BOTH the frequency subtree and the join's probe side
    pos_ds = ds.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pandas").materialize()
    if pos_ds.count() == 0:
        return _typed_empty()

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        # a doc's rows never split across batches (one row in → rows
        # out in the same batch), so per-batch (doc, h) dedup gives
        # exact distinct-doc counts after the bucket fold
        d = batch[[id_col, "h"]].drop_duplicates()
        s = d.groupby("h").size()
        h = s.index.to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "bucket": pd.Series(h % num_buckets, dtype="int64"),
            "h": h, "c": s.to_numpy(dtype=np.int64)})

    def dup_only(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g.columns):
            return g        # empty sort partition: zero-column frame
        s = g.groupby("h", as_index=False)["c"].sum()
        s = s[s["c"] >= min_docs]
        return pd.DataFrame({"h": s["h"].to_numpy(dtype=np.int64)})

    from ..rayutil import project_blocks
    dup_h = project_blocks(
        pos_ds.map_batches(partial_counts, batch_format="pandas")
        .groupby("bucket").map_groups(dup_only, batch_format="pandas"),
        ["h"]).materialize()
    if dup_h.count() == 0:
        return _typed_empty()

    with light_shuffle_aggregators():
        joined = pos_ds.join(
            dup_h.repartition(num_join_partitions), join_type="inner",
            num_partitions=num_join_partitions, on=("h",))
    joined = project_blocks(joined, [id_col, "p", "n_chars"])

    from ..rayutil import salt_bucket

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["bucket"] = (salt_bucket(batch[id_col].to_numpy(),
                                       num_buckets) if len(batch)
                           else pd.Series([], dtype="int32"))
        return batch

    def union_fold(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g.columns) or not len(g):
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "n_chars": pd.Series([], dtype="int64"),
                "covered_chars": pd.Series([], dtype="int64"),
                "covered_milli": pd.Series([], dtype="int64")})
        g = g.sort_values([id_col, "p"])
        end = g["p"].to_numpy(dtype=np.int64) + window
        # running max of interval ends WITHIN each doc, shifted one row:
        # contribution = max(0, end - max(p, prev_max)) — the classic
        # gaps-and-islands union, fully vectorized
        cm = pd.Series(end, index=g.index).groupby(g[id_col]).cummax()
        pm = cm.groupby(g[id_col].to_numpy()).shift(1).fillna(0.0) \
            .to_numpy(dtype=np.int64)
        p = g["p"].to_numpy(dtype=np.int64)
        contrib = np.maximum(0, end - np.maximum(p, pm))
        out = pd.DataFrame({id_col: g[id_col].to_numpy(),
                            "n_chars": g["n_chars"].to_numpy(),
                            "cov": contrib}) \
            .groupby(id_col, as_index=False) \
            .agg(n_chars=("n_chars", "first"), covered=("cov", "sum"))
        return pd.DataFrame({
            id_col: out[id_col].to_numpy(dtype=np.int64),
            "n_chars": out["n_chars"].to_numpy(dtype=np.int64),
            "covered_chars": out["covered"].to_numpy(dtype=np.int64),
            "covered_milli": (out["covered"].to_numpy(dtype=np.int64)
                              * 1000
                              // out["n_chars"].to_numpy(dtype=np.int64))})

    return joined.map_batches(add_bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(union_fold, batch_format="pandas")


def mask_pii(ds: "rd.Dataset", *, text_col: str = "text",
             id_col: str = "doc_id") -> "rd.Dataset":
    """PII redaction — the standard pre-training scrub pass: replace
    email addresses then phone numbers with typed placeholders and count
    the replacements. Pure per-batch map (vectorized pandas str kernels,
    compiled-regex reuse inside pandas), no shuffle — streams at
    read speed at any corpus size. Email pass runs FIRST so digits
    inside addresses are never half-claimed by the phone pattern; the
    oracle nests its regexp_replace calls in the same order."""

    def mask(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("")
        n_email = s.str.count(PII_EMAIL_RE)
        s = s.str.replace(PII_EMAIL_RE, "<EMAIL>", regex=True)
        n_phone = s.str.count(PII_PHONE_RE)
        s = s.str.replace(PII_PHONE_RE, "<PHONE>", regex=True)
        return pd.DataFrame({
            id_col: batch[id_col], "masked": s,
            "n_email": n_email.astype("int64"),
            "n_phone": n_phone.astype("int64")})

    return ds.select_columns([id_col, text_col]).map_batches(
        mask, batch_format="pandas")


# fixed (pattern, placeholder) cascade: order is semantic — email first
# (digits inside addresses must never be half-claimed downstream), then
# phone (leading '+', disjoint from SSN), then IPv4 (dots), then SSN.
# The oracle nests its regexp_replace calls in the identical order.
PII_EXTENDED_PASSES = (
    (PII_EMAIL_RE, "<EMAIL>", "n_email"),
    (PII_PHONE_RE, "<PHONE>", "n_phone"),
    (PII_IPV4_RE, "<IP>", "n_ip"),
    (PII_SSN_RE, "<SSN>", "n_ssn"),
)


def mask_pii_extended(ds: "rd.Dataset", *, text_col: str = "text",
                      id_col: str = "doc_id") -> "rd.Dataset":
    """Four-pass PII redaction (email → phone → IPv4 → SSN) with
    per-category replacement counts — the wider scrub a pre-training
    pipeline actually ships (mask_pii's email/phone pair plus network
    and government identifiers). Same scale shape as mask_pii: pure
    per-batch map over vectorized pandas str kernels, zero shuffle,
    RE2∩re-safe patterns shared verbatim with the DuckDB twin."""

    def mask(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("")
        out = {id_col: batch[id_col]}
        for pat, token, cnt_col in PII_EXTENDED_PASSES:
            out[cnt_col] = s.str.count(pat).astype("int64")
            s = s.str.replace(pat, token, regex=True)
        out["masked"] = s
        return pd.DataFrame(out)

    return ds.select_columns([id_col, text_col]).map_batches(
        mask, batch_format="pandas")


def source_quality_gate(ds: "rd.Dataset", *, id_col: str = "doc_id",
                        text_col: str = "text",
                        group_col: str = "source") -> "rd.Dataset":
    """Per-source (per-domain) ADAPTIVE quality gate — the
    RefinedWeb-style two-pass filter: score every document (µ-integerized
    stopword ratio), compute each source's mean score, and keep the
    documents at or above their OWN source's mean. A fixed global
    threshold over-prunes clean domains and under-prunes spam domains;
    the per-domain mean self-calibrates.

    Scale shape: pass 1 is a pure per-batch map (score) + a per-batch
    (source, n, Σscore) combiner into a tiny ``groupby(source)`` —
    the shuffle moves one row per (source, batch). Pass 2 is a native
    hash join of the doc-level scores against the per-source means
    (sources number in the millions at web scale — a join, never a
    driver-side dict broadcast), then a vectorized filter on the pure
    INTEGER cross-multiplication ``score_mu · n_src ≥ Σscore_mu``
    (exactly the SQL twin's predicate — no float mean, so no rounding
    seam between the engines)."""
    from ray.data.aggregate import Sum

    from ..rayutil import project_blocks

    en = STOPWORDS["en"]

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        mus = []
        for text in batch[text_col].fillna(""):
            words = text.split()
            n_stop = sum(1 for w in words if w.lower() in en)
            ratio = n_stop / len(words) if words else 0.0
            mus.append(int(np.floor(ratio * 1e6 + 0.5)))
        # typed on EMPTY batches too (the f61a2e2 pattern): an untyped
        # empty block diverges from the non-empty schema at the shuffle
        return pd.DataFrame({
            id_col: pd.Series(batch[id_col].to_numpy(), dtype="int64"),
            group_col: pd.Series(batch[group_col].to_numpy(),
                                 dtype="object"),
            "score_mu": pd.Series(mus, dtype="int64")})

    scored = ds.select_columns([id_col, group_col, text_col]) \
        .map_batches(score, batch_format="pandas")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(group_col, as_index=False) \
            .agg(n=("score_mu", "size"), s=("score_mu", "sum"))
        return pd.DataFrame({
            group_col: pd.Series(g[group_col].to_numpy(), dtype="object"),
            "n": pd.Series(g["n"].to_numpy(), dtype="int64"),
            "s": pd.Series(g["s"].to_numpy(), dtype="int64")})

    means = scored.map_batches(partial, batch_format="pandas") \
        .groupby(group_col).aggregate(Sum("n", alias_name="n_src"),
                                      Sum("s", alias_name="sum_mu"))
    # project_blocks BOTH join inputs: native aggregates emit
    # zero-column blocks for empty partitions, and one reaching a join
    # side is an Acero "No match for FieldRef" error (the 808e568 class)
    means = project_blocks(means, [group_col, "n_src", "sum_mu"]) \
        .materialize()   # one row per SOURCE — tiny, and needed twice
    if means.count() == 0:
        # empty corpus: a zero-block dataset has no schema for the join
        # to bind FieldRefs against — early-exit with the typed empty
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            group_col: pa.array([], pa.string()),
            "score_mu": pa.array([], pa.int64())}))

    joined = project_blocks(scored, [id_col, group_col, "score_mu"]) \
        .join(means, join_type="inner", num_partitions=8,
              on=(group_col,))

    def gate(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            pc.multiply_checked(t["score_mu"].cast(pa.int64()),
                                t["n_src"].cast(pa.int64())),
            t["sum_mu"].cast(pa.int64()))
        t = t.filter(keep)
        return pa.table({id_col: t[id_col], group_col: t[group_col],
                         "score_mu": t["score_mu"]})

    return joined.map_batches(gate, batch_format="pyarrow")


def bigram_logprob_scores(ds: "rd.Dataset", *, id_col: str = "doc_id",
                          text_col: str = "text",
                          num_join_partitions: int = 8) -> "rd.Dataset":
    """Corpus-LM quality scoring (the CCNet/C4 move: score each doc by
    a language model trained on the corpus itself — here an add-one
    Laplace bigram model, the in-repo stand-in for KenLM): per doc, the
    sum of ln P(w2|w1) over its bigrams, P = (c(w1w2)+1)/(c(w1)+V).
    Low scores flag gibberish/boilerplate; per-token normalization is
    ``logprob_micro / n_bigrams`` downstream.

    Distributed shape (the tf-idf pattern at bigram granularity):
    per-batch partial counts → native unigram/bigram count groupbys
    (one row per distinct gram per batch crosses the wire) → the doc's
    bigram rows hash-join the two count tables (both vocabulary-sized —
    joins, never broadcasts) → per-batch per-doc partial sums → tiny
    final ``groupby(doc_id)``. Every ln term is floored to int64 MICRO
    units BEFORE summing, so the aggregate is an order-independent
    integer sum and the DuckDB oracle decides identically (same double
    division, same libm ln, same floor).

    Returns (doc_id, n_bigrams, logprob_micro); docs with < 2 tokens
    are absent (no bigrams — same as the SQL twin)."""
    from ray.data.aggregate import Sum

    from ..rayutil import project_blocks

    def doc_bigrams(batch: pd.DataFrame) -> pd.DataFrame:
        ids_out: list = []
        w1s: list[str] = []
        w2s: list[str] = []
        for did, text in zip(batch[id_col], batch[text_col].fillna("")):
            ws = text.split()
            for a, b in zip(ws, ws[1:]):
                ids_out.append(did)
                w1s.append(a)
                w2s.append(b)
        return pd.DataFrame({
            id_col: pd.Series(ids_out, dtype="int64"),
            "w1": pd.Series(w1s, dtype="object"),
            "w2": pd.Series(w2s, dtype="object")})

    big = ds.select_columns([id_col, text_col]) \
        .map_batches(doc_bigrams, batch_format="pandas").materialize()

    # unigram counts come from the TEXT, not from the bigram rows —
    # recounting w1/w2 occurrences there would double-count interior
    # tokens (each appears as some bigram's w1 AND another's w2)
    def text_unigrams(batch: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for text in batch[text_col].fillna(""):
            c.update(text.split())
        return pd.DataFrame({"w1": pd.Series(list(c), dtype="object"),
                             "n": pd.Series(list(c.values()),
                                            dtype="int64")})

    ucnt = ds.select_columns([text_col]) \
        .map_batches(text_unigrams, batch_format="pandas") \
        .groupby("w1").aggregate(Sum("n", alias_name="cu")).materialize()
    vocab = ucnt.count()
    if vocab == 0:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "logprob_micro": pa.array([], pa.int64())}))

    def big_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["w1", "w2"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    bcnt = big.map_batches(big_partial, batch_format="pandas") \
        .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="cb"))
    bcnt = project_blocks(bcnt, ["w1", "w2", "cb"])
    ucnt_j = project_blocks(ucnt, ["w1", "cu"])

    with light_shuffle_aggregators():
        joined = project_blocks(big, [id_col, "w1", "w2"]) \
            .join(bcnt, join_type="inner",
                  num_partitions=num_join_partitions, on=("w1", "w2"))
        joined = project_blocks(joined, [id_col, "w1", "cb"])
        joined = joined.join(ucnt_j, join_type="inner",
                             num_partitions=num_join_partitions,
                             on=("w1",)).materialize()

    v = float(vocab)

    def terms(batch: pd.DataFrame) -> pd.DataFrame:
        p = (batch["cb"].to_numpy(dtype=np.float64) + 1.0) \
            / (batch["cu"].to_numpy(dtype=np.float64) + v)
        micro = np.floor(np.log(p) * 1e6).astype(np.int64)
        g = pd.DataFrame({id_col: batch[id_col].to_numpy(),
                          "n": 1, "t": micro}) \
            .groupby(id_col, as_index=False).sum()
        return pd.DataFrame({
            id_col: pd.Series(g[id_col].to_numpy(), dtype="int64"),
            "n": pd.Series(g["n"].to_numpy(), dtype="int64"),
            "t": pd.Series(g["t"].to_numpy(), dtype="int64")})

    out = joined.map_batches(terms, batch_format="pandas") \
        .groupby(id_col).aggregate(Sum("n", alias_name="n_bigrams"),
                                   Sum("t", alias_name="logprob_micro"))

    def typed(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col].cast(pa.int64()),
            "n_bigrams": t["n_bigrams"].cast(pa.int64()),
            "logprob_micro": t["logprob_micro"].cast(pa.int64())})

    return out.map_batches(typed, batch_format="pyarrow")


def source_kl_divergence(ds: "rd.Dataset", *, group_col: str = "source",
                         text_col: str = "text",
                         num_buckets: int = 64) -> pd.DataFrame:
    """KL(source ‖ corpus) over token distributions (nats, floored to
    milli-units) — the distribution-shift probe behind source
    reweighting: a source whose token mix matches the corpus scores
    ~0, a template-y or off-domain source scores high.

    KL = (Σ_t c·ln c − Σ_t c·ln C_t)/1e6/n + ln N − ln n with both
    Σ terms as order-independent integer aggregates (per-term
    floor(·1e6), the :func:`source_token_entropy` convention — one
    deterministic double expression shared with the DuckDB twin).

    Distributed shape: per-batch (group, token) count partials
    bucketed by a hash of the TOKEN (not the pair): every source's
    count for a token lands in the same bucket, so the bucket holds
    BOTH each final per-(group, token) count and the token's corpus
    total C_t — no second vocab-wide exchange for the cross-term. One
    row per distinct (group, token) per batch crosses the wire; the
    groupby(group) fold is over per-bucket partials."""
    from ray.data.aggregate import Sum

    from ..rayutil import salt_bucket

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        groups: list = []
        toks: list[str] = []
        for g, text in zip(batch[group_col], batch[text_col].fillna("")):
            for w in text.split():
                groups.append(g)
                toks.append(w)
        b = pd.DataFrame({group_col: pd.Series(groups, dtype="object"),
                          "tok": pd.Series(toks, dtype="object")})
        b = b.groupby([group_col, "tok"], as_index=False).size() \
            .rename(columns={"size": "c"})
        b["c"] = b["c"].astype("int64")
        b["bucket"] = salt_bucket(b["tok"].to_numpy(), num_buckets) \
            if len(b) else pd.Series([], dtype="int32")
        return b

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby([group_col, "tok"], as_index=False)["c"].sum()
        ct = cnt.groupby("tok")["c"].transform("sum") \
            .to_numpy(dtype=np.float64)
        c = cnt["c"].to_numpy(dtype=np.float64)
        cnt["t1"] = np.floor(np.log(c) * c * 1e6).astype(np.int64)
        cnt["t2"] = np.floor(np.log(ct) * c * 1e6).astype(np.int64)
        out = cnt.groupby(group_col, as_index=False).agg(
            n_part=("c", "sum"), s1_part=("t1", "sum"),
            s2_part=("t2", "sum"))
        return out.astype({"n_part": "int64", "s1_part": "int64",
                           "s2_part": "int64"})

    folded = ds.select_columns([group_col, text_col]) \
        .map_batches(local, batch_format="pandas") \
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas") \
        .groupby(group_col).aggregate(
            Sum("n_part", alias_name="n_tokens"),
            Sum("s1_part", alias_name="s1"),
            Sum("s2_part", alias_name="s2")).to_pandas()
    if group_col not in folded.columns or not len(folded):
        return pd.DataFrame({group_col: pd.Series([], dtype="object"),
                             "n_tokens": pd.Series([], dtype="int64"),
                             "kl_milli": pd.Series([], dtype="int64")})
    n = folded["n_tokens"].to_numpy(dtype=np.float64)
    s1 = folded["s1"].to_numpy(dtype=np.float64)
    s2 = folded["s2"].to_numpy(dtype=np.float64)
    big_n = float(folded["n_tokens"].sum())
    kl = np.floor(((s1 - s2) / 1e6 / n + np.log(big_n) - np.log(n))
                  * 1000).astype(np.int64)
    out = pd.DataFrame({group_col: folded[group_col],
                        "n_tokens": folded["n_tokens"].astype("int64"),
                        "kl_milli": kl})
    return out.sort_values(group_col).reset_index(drop=True)


def source_token_entropy(ds: "rd.Dataset", *, group_col: str = "source",
                         text_col: str = "text",
                         num_buckets: int = 64) -> "rd.Dataset":
    """Shannon entropy of each group's token distribution (nats,
    floored to milli-units) — the corpus-diversity / mode-collapse
    probe: a source whose pages repeat one boilerplate template scores
    near 0, a diverse source near ln(vocab).

    H = ln(N) − Σ_t c_t·ln(c_t) / N, computed from two
    order-independent integer aggregates per group: N (token count)
    and Σ floor(ln(c)·c·1e6) over final per-(group, token) counts.
    Distributed shape (the grouped_distinct_count pair-bucket move,
    with counts instead of dedup): per-batch partial (group, token)
    counts → pairs bucketed by a hash of the WHOLE pair (every
    occurrence of a pair lands in one bucket, so in-bucket sums are
    final counts — no second vocab-wide shuffle) → per-bucket ln/floor
    terms fold to one row per (bucket, group) → a tiny
    ``groupby(group).sum``. The wire carries one row per distinct pair
    per batch, never raw tokens.

    Returns (group_col, n_tokens, sum_clnc_micro, entropy_milli); the
    final scalar uses one deterministic double expression shared with
    the DuckDB twin (same libm ln, same division order, same floor)."""
    from ray.data.aggregate import Sum

    from ..rayutil import salt_bucket

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        groups: list = []
        toks: list[str] = []
        for g, text in zip(batch[group_col], batch[text_col].fillna("")):
            for w in text.split():
                groups.append(g)
                toks.append(w)
        b = pd.DataFrame({group_col: pd.Series(groups, dtype="object"),
                          "tok": pd.Series(toks, dtype="object")})
        b = b.groupby([group_col, "tok"], as_index=False).size() \
            .rename(columns={"size": "c"})
        pair = b[group_col].astype(str) + "\x1f" + b["tok"]
        b["c"] = b["c"].astype("int64")
        b["bucket"] = salt_bucket(pair.to_numpy(), num_buckets) \
            if len(b) else pd.Series([], dtype="int32")
        return b

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby([group_col, "tok"], as_index=False)["c"].sum()
        c = cnt["c"].to_numpy(dtype=np.float64)
        cnt["term"] = np.floor(np.log(c) * c * 1e6).astype(np.int64)
        out = cnt.groupby(group_col, as_index=False).agg(
            n_part=("c", "sum"), s_part=("term", "sum"))
        return out.astype({"n_part": "int64", "s_part": "int64"})

    folded = ds.select_columns([group_col, text_col]) \
        .map_batches(local, batch_format="pandas") \
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas") \
        .groupby(group_col).aggregate(
            Sum("n_part", alias_name="n_tokens"),
            Sum("s_part", alias_name="sum_clnc_micro"))

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({
                group_col: pd.Series([], dtype="object"),
                "n_tokens": pd.Series([], dtype="int64"),
                "sum_clnc_micro": pd.Series([], dtype="int64"),
                "entropy_milli": pd.Series([], dtype="int64")})
        n = batch["n_tokens"].to_numpy(dtype=np.float64)
        s = batch["sum_clnc_micro"].to_numpy(dtype=np.float64)
        ent = np.floor((np.log(n) - (s / 1e6) / n) * 1000)
        out = batch[[group_col, "n_tokens", "sum_clnc_micro"]].copy()
        out["entropy_milli"] = ent.astype(np.int64)
        return out.astype({"n_tokens": "int64",
                           "sum_clnc_micro": "int64"})

    return folded.map_batches(finish, batch_format="pandas")


_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_BULLETS = ("•", "-", "*")


def _gopher_doc_flags(text: str) -> tuple[int, tuple[int, ...]]:
    """Per-document kernel behind :func:`gopher_quality` (pure — no
    Ray), returning (n_words, the 7 rule flags in column order). Shared
    with the prep-funnel composite so both decide identically."""
    words = text.split()
    n_words = len(words)
    total_chars = sum(len(w) for w in words)
    n_alpha = sum(1 for w in words
                  if any(c.isascii() and c.isalpha() for c in w))
    lowers = {w.lower() for w in words}
    n_stop = sum(1 for s in _GOPHER_STOPS if s in lowers)
    n_sym = text.count("#") + text.count("...") + text.count("…")
    lines = text.split("\n")
    n_lines = len(lines)
    n_bullet = sum(1 for ln in lines if ln.startswith(_GOPHER_BULLETS))
    n_ell = sum(1 for ln in lines if ln.endswith(("...", "…")))
    return n_words, (
        int(50 <= n_words <= 100000),
        int(3 * n_words <= total_chars <= 10 * n_words and n_words > 0),
        int(10 * n_sym <= n_words),
        int(10 * n_bullet <= 9 * n_lines),
        int(10 * n_ell <= 3 * n_lines),
        int(5 * n_alpha >= 4 * n_words),
        int(n_stop >= 2))


def gopher_quality(ds: "rd.Dataset", *, id_col: str = "doc_id",
                   text_col: str = "text") -> "rd.Dataset":
    """Gopher-rules composite quality filter (Rae et al. 2021 §A1.1 —
    the published heuristic set, applied verbatim): word count in
    [50, 100000], mean word length in [3, 10], symbol-to-word ratio
    (``#`` + ``...``/``…`` occurrences) ≤ 0.1, ≤ 90% of lines starting
    with a bullet, ≤ 30% of lines ending in an ellipsis, ≥ 80% of words
    containing an alphabetic character, and ≥ 2 DISTINCT members of the
    8-stopword probe list present.

    Pure per-batch map — no shuffle, no state; embarrassingly parallel
    at any corpus size. Every ratio rule is an INTEGER
    cross-multiplication (``10·symbols ≤ words``), never a float
    division, so the DuckDB twin decides each flag identically with no
    rounding seam. Lines split on chr(10) only (not splitlines(), whose
    \\r/\\x85 extras the SQL twin can't see)."""
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ids, nw, flags = [], [], [[] for _ in range(7)]
        for did, text in zip(batch[id_col], batch[text_col].fillna("")):
            n_words, fl = _gopher_doc_flags(text)
            ids.append(did)
            nw.append(n_words)
            for j in range(7):
                flags[j].append(fl[j])
        cols = ["r_wordcount", "r_meanlen", "r_symbol", "r_bullet",
                "r_ellipsis", "r_alpha", "r_stop"]
        out = pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                            "n_words": pd.Series(nw, dtype="int64")})
        all_pass = np.ones(len(ids), dtype=np.int64)
        for name, vals in zip(cols, flags):
            v = np.asarray(vals, dtype=np.int64)
            out[name] = v
            all_pass &= v
        out["pass_all"] = all_pass
        return out

    return ds.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pandas")


def codepoint_entropy(ds: "rd.Dataset", *, id_col: str = "doc_id",
                      text_col: str = "text") -> "rd.Dataset":
    """Per-document Shannon entropy over Unicode CODEPOINTS (nats,
    floored to milli-units) — the cheap gibberish/binary-paste probe
    that needs no tokenizer: natural prose sits ~2.9–3.3 nats, base64
    blobs and key-mash spam ≥ 4, single-char floods near 0.

    Pure per-batch map; the per-doc histogram is vectorized as
    ``np.unique`` over the UTF-32 view of the string (one C pass per
    document, no Python char loop). Same two-integer-aggregate
    H = ln(N) − Σ c·ln(c)/N contract as source_token_entropy, so the
    DuckDB twin (RE2 ``(?s).`` per-codepoint unnest) lands on the
    identical integers. Empty-text docs are absent (no distribution),
    matching the twin's ``length(text) > 0`` guard."""
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ids, ns, sums = [], [], []
        for did, text in zip(batch[id_col], batch[text_col].fillna("")):
            if not text:
                continue
            cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
            _, counts = np.unique(cp, return_counts=True)
            c = counts.astype(np.float64)
            ids.append(did)
            ns.append(len(cp))
            sums.append(int(np.floor(np.log(c) * c * 1e6)
                            .astype(np.int64).sum()))
        n = np.asarray(ns, dtype=np.float64)
        s = np.asarray(sums, dtype=np.float64)
        ent = (np.floor((np.log(n) - (s / 1e6) / n) * 1000)
               .astype(np.int64) if len(ids) else
               np.array([], dtype=np.int64))
        return pd.DataFrame({
            id_col: pd.Series(ids, dtype="int64"),
            "n_chars": pd.Series(ns, dtype="int64"),
            "sum_clnc_micro": pd.Series(sums, dtype="int64"),
            "entropy_milli": pd.Series(ent, dtype="int64")})

    return ds.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pandas")


def source_zipf_slope(ds: "rd.Dataset", *, group_col: str = "source",
                      text_col: str = "text", top_k: int = 100,
                      num_buckets: int = 64) -> "rd.Dataset":
    """Least-squares slope of ln(count) vs ln(rank) over each source's
    top-K tokens — the Zipf-law template-collapse probe: organic text
    slopes near −1; a boilerplate mill whose pages repeat one template
    goes much steeper (head tokens absorb everything), and keyword-spam
    flattens toward 0.

    Distributed shape: the source_token_entropy pair-bucket move for
    final (source, token) counts (one row per distinct pair per batch
    on the wire, in-bucket sums final — no vocab-wide second shuffle),
    then per-bucket top-K per source (a global top-K member beats all
    but < K pairs, so it is in its own bucket's top-K — the union of
    per-bucket top-Ks is a superset), then one tiny
    ``groupby(source).map_groups`` over ≤ K·buckets rows per source.

    Parity contract: rank = row_number ordered by (count DESC, token
    ASC); x = floor(ln(rank)·1e6), y = floor(ln(count)·1e6) as int64;
    Σx, Σy, Σxy, Σxx are exact integer sums; the final
    slope_milli = floor(1000·(nΣxy − ΣxΣy)/(nΣxx − ΣxΣx)) is one
    shared double division, so DuckDB decides identically. Sources
    with < 2 distinct tokens are absent (slope undefined)."""
    from ..rayutil import salt_bucket

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        groups: list = []
        toks: list[str] = []
        for g, text in zip(batch[group_col], batch[text_col].fillna("")):
            for w in text.split():
                groups.append(g)
                toks.append(w)
        b = pd.DataFrame({group_col: pd.Series(groups, dtype="object"),
                          "tok": pd.Series(toks, dtype="object")})
        b = b.groupby([group_col, "tok"], as_index=False).size() \
            .rename(columns={"size": "c"})
        pair = b[group_col].astype(str) + "\x1f" + b["tok"]
        b["c"] = b["c"].astype("int64")
        b["bucket"] = salt_bucket(pair.to_numpy(), num_buckets) \
            if len(b) else pd.Series([], dtype="int32")
        return b

    def per_bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "c" not in g.columns:
            # empty partitions reach map_groups as ZERO-COLUMN frames
            return pd.DataFrame({
                group_col: pd.Series([], dtype="object"),
                "tok": pd.Series([], dtype="object"),
                "c": pd.Series([], dtype="int64")})
        cnt = g.groupby([group_col, "tok"], as_index=False)["c"].sum()
        cnt = cnt.sort_values(["c", "tok"],
                              ascending=[False, True], kind="mergesort")
        out = cnt.groupby(group_col, as_index=False).head(top_k)
        return pd.DataFrame({
            group_col: pd.Series(out[group_col].to_numpy(),
                                 dtype="object"),
            "tok": pd.Series(out["tok"].to_numpy(), dtype="object"),
            "c": pd.Series(out["c"].to_numpy(), dtype="int64")})

    def fit(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) and "c" in g.columns:
            g = g.sort_values(["c", "tok"], ascending=[False, True],
                              kind="mergesort").head(top_k)
        n = len(g)
        if n < 2 or "c" not in g.columns:
            return pd.DataFrame({
                group_col: pd.Series([], dtype="object"),
                "n_top": pd.Series([], dtype="int64"),
                "slope_milli": pd.Series([], dtype="int64")})
        rank = np.arange(1, n + 1, dtype=np.float64)
        x = np.floor(np.log(rank) * 1e6).astype(np.int64)
        y = np.floor(np.log(g["c"].to_numpy(dtype=np.float64))
                     * 1e6).astype(np.int64)
        # exact integer sums (python ints — no int64 overflow anxiety),
        # one double division shared with the SQL twin
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x * y).sum())
        sxx = int((x * x).sum())
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope_milli = int(np.floor(float(num) / float(den) * 1000))
        return pd.DataFrame({
            group_col: pd.Series([g[group_col].iloc[0]], dtype="object"),
            "n_top": pd.Series([n], dtype="int64"),
            "slope_milli": pd.Series([slope_milli], dtype="int64")})

    return ds.select_columns([group_col, text_col]) \
        .map_batches(local, batch_format="pandas") \
        .groupby("bucket").map_groups(per_bucket_topk,
                                      batch_format="pandas") \
        .groupby(group_col).map_groups(fit, batch_format="pandas")


def line_dup_stats(ds: "rd.Dataset", *, id_col: str = "doc_id",
                   text_col: str = "text") -> "rd.Dataset":
    """Gopher repetition rules, line/paragraph half (Rae et al. 2021
    §A1.2 — the complement of ``repetition_stats``'s token/bigram
    half): per document, the duplicate-LINE fraction, duplicate-line
    CHARACTER fraction, and both again at PARAGRAPH granularity, plus
    the four published threshold flags (dup-line ≤ 30%, dup-para ≤
    30%, dup-line-chars ≤ 20%, dup-para-chars ≤ 20%).

    Counting contract (shared verbatim with the SQL twin): lines split
    on chr(10), paragraphs on chr(10)||chr(10) (consecutive-delimiter
    empties INCLUDED, exactly Python ``str.split`` on a literal
    separator); a value occurring c > 1 times contributes c−1
    duplicate units and (c−1)·len(value) duplicate characters; the
    denominator is the sum of unit lengths (newlines excluded). Every
    flag is an integer cross-multiplication (``10·dup ≤ 3·total``) —
    no float division anywhere, so DuckDB decides identically.

    Pure per-batch map — shuffle-free, embarrassingly parallel at any
    corpus size."""
    def one(units: list[str]) -> tuple[int, int, int, int]:
        n = len(units)
        chars = sum(len(u) for u in units)
        dup = dup_chars = 0
        for v, c in Counter(units).items():
            if c > 1:
                dup += c - 1
                dup_chars += (c - 1) * len(v)
        return n, chars, dup, dup_chars

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {k: [] for k in (
            id_col, "n_lines", "line_chars", "dup_lines",
            "dup_line_chars", "n_paras", "para_chars", "dup_paras",
            "dup_para_chars")}
        for did, text in zip(batch[id_col], batch[text_col].fillna("")):
            nl, cl, dl, dcl = one(text.split("\n"))
            np_, cp_, dp, dcp = one(text.split("\n\n"))
            for k, v in zip(rows, (did, nl, cl, dl, dcl,
                                   np_, cp_, dp, dcp)):
                rows[k].append(v)
        out = pd.DataFrame({k: pd.Series(v, dtype="int64")
                            for k, v in rows.items()})
        out["f_dup_line"] = (10 * out["dup_lines"]
                             <= 3 * out["n_lines"]).astype("int64")
        out["f_dup_para"] = (10 * out["dup_paras"]
                             <= 3 * out["n_paras"]).astype("int64")
        out["f_dup_line_chars"] = (5 * out["dup_line_chars"]
                                   <= out["line_chars"]).astype("int64")
        out["f_dup_para_chars"] = (5 * out["dup_para_chars"]
                                   <= out["para_chars"]).astype("int64")
        return out

    return ds.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pandas")


_C4_TERMINALS = (".", "!", "?", '"')


def _c4_doc_stats(text: str) -> tuple[int, int, int, int, int, int]:
    """Per-document kernel behind :func:`c4_line_filter` (pure — no
    Ray): (n_lines, n_kept_lines, kept_chars, n_sentences, f_lorem,
    f_brace). The page verdict is ``n_sentences ≥ 3 ∧ f_lorem ∧
    f_brace``. Shared with the prep-funnel composite."""
    lines = text.split("\n")
    kept = chars = sents = 0
    for ln in lines:
        if (ln.endswith(_C4_TERMINALS)
                and len(ln.split()) >= 5
                and "javascript" not in ln.lower()):
            kept += 1
            chars += len(ln)
            sents += ln.count(".") + ln.count("!") + ln.count("?")
    return (len(lines), kept, chars, sents,
            int("lorem ipsum" not in text.lower()),
            int("{" not in text))


def c4_line_filter(ds: "rd.Dataset", *, id_col: str = "doc_id",
                   text_col: str = "text") -> "rd.Dataset":
    """C4 cleaning rules (Raffel et al. 2020 §2.2, the published
    heuristics): keep only lines that end in a terminal punctuation
    mark (``. ! ? "``), contain ≥ 5 whitespace words, and do not
    mention ``javascript`` (case-insensitive); then gate the PAGE on
    ≥ 3 sentences surviving (sentence = terminal-punct occurrence in
    kept lines), no ``lorem ipsum``, and no ``{``.

    Output per document: total/kept line counts, kept characters,
    sentence count, the three page flags, and ``pass_all`` — the
    stats-plus-verdict form so a curriculum stage can weight by
    survival rate instead of hard-dropping. Sentence counting is the
    per-line count of ``. ! ?`` occurrences (DuckDB twin: three
    length-difference probes), not a segmenter — both engines land on
    the same integers by construction.

    Pure per-batch map — shuffle-free; the hot loop is one pass over
    each document's lines."""
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {k: [] for k in (
            id_col, "n_lines", "n_kept_lines", "kept_chars",
            "n_sentences", "f_lorem", "f_brace")}
        for did, text in zip(batch[id_col], batch[text_col].fillna("")):
            st = _c4_doc_stats(text)
            rows[id_col].append(did)
            for k, v in zip(("n_lines", "n_kept_lines", "kept_chars",
                             "n_sentences", "f_lorem", "f_brace"), st):
                rows[k].append(v)
        out = pd.DataFrame({k: pd.Series(v, dtype="int64")
                            for k, v in rows.items()})
        out["pass_all"] = ((out["n_sentences"] >= 3)
                           & (out["f_lorem"] == 1)
                           & (out["f_brace"] == 1)).astype("int64")
        return out

    return ds.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pandas")


NGRAM_TOP_PCT = {2: 20, 3: 18, 4: 16}
NGRAM_DUP_PCT = {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}


def _ngram_repetition_doc(text: str) -> dict[str, int]:
    """Per-document kernel behind ngram_repetition_stats (pure, no Ray
    — SQL-parity-tested directly in tests/test_sql_parity.py)."""
    words = text.split()
    idmap: dict[str, int] = {}
    ids = [idmap.setdefault(w, len(idmap)) for w in words]
    vocab = list(idmap)                 # word id -> word
    idlen = [len(w) for w in vocab]     # word id -> char length
    out: dict[str, int] = {
        "norm_chars": sum(idlen[i] for i in ids) + max(0, len(words) - 1)}
    for n in NGRAM_TOP_PCT:
        cnt = Counter(zip(*(ids[i:] for i in range(n))))
        if not cnt:
            out[f"top{n}_c"] = 0
            out[f"top{n}_chars"] = 0
            continue
        c_top = max(cnt.values())
        gram = min(" ".join(vocab[i] for i in g)
                   for g, c in cnt.items() if c == c_top)
        out[f"top{n}_c"] = c_top
        out[f"top{n}_chars"] = c_top * len(gram)
    for n in NGRAM_DUP_PCT:
        cnt = Counter(zip(*(ids[i:] for i in range(n))))
        out[f"dup{n}_chars"] = sum(
            c * (sum(idlen[i] for i in g) + n - 1)
            for g, c in cnt.items() if c > 1)
    return out


def ngram_repetition_stats(ds: "rd.Dataset", *, id_col: str = "doc_id",
                           text_col: str = "text") -> "rd.Dataset":
    """Gopher repetition rules, n-gram character-fraction half (Rae et
    al. 2021 §A1.2, completing ``repetition_stats``'s top-token/bigram
    counts and ``line_dup_stats``'s line/paragraph half): per document,
    the characters covered by the MOST FREQUENT word n-gram for
    n = 2..4 and by ALL duplicated word n-grams for n = 5..10, plus the
    published threshold flags (top-2/3/4 ≤ 20/18/16 %, dup-5..10 ≤
    15/14/13/12/11/10 %).

    Counting contract (shared verbatim with the SQL twin): words are
    whitespace tokens; an n-gram's character length is
    ``len(' '.join(words))`` = Σ word lens + (n−1); the denominator
    ``norm_chars`` is the whole document re-joined with single spaces;
    the top gram ties break to the lexicographically smallest JOINED
    STRING (not word-tuple order — they differ when a word contains a
    codepoint below the space); dup chars are overlap-naive
    (Σ c·len(gram) over grams with c > 1). Every flag is the integer
    cross-multiplication ``100·chars ≤ pct·norm_chars``.

    Pure per-batch map — shuffle-free; counts are over word-id tuples
    (one Counter pass per n), gram strings materialize only for the
    rare top-count tie."""
    count_cols = (["norm_chars"]
                  + [f"top{n}_c" for n in NGRAM_TOP_PCT]
                  + [f"top{n}_chars" for n in NGRAM_TOP_PCT]
                  + [f"dup{n}_chars" for n in NGRAM_DUP_PCT])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, list] = {k: [] for k in [id_col] + count_cols}
        for did, text in zip(batch[id_col], batch[text_col].fillna("")):
            rows[id_col].append(did)
            for k, v in _ngram_repetition_doc(text).items():
                rows[k].append(v)
        out = pd.DataFrame(
            {k: pd.Series(v, dtype="int64") for k, v in rows.items()})
        nc = out["norm_chars"].to_numpy()
        for n, pct in NGRAM_TOP_PCT.items():
            out[f"f_top{n}"] = (100 * out[f"top{n}_chars"].to_numpy()
                                <= pct * nc).astype("int64")
        for n, pct in NGRAM_DUP_PCT.items():
            out[f"f_dup{n}"] = (100 * out[f"dup{n}_chars"].to_numpy()
                                <= pct * nc).astype("int64")
        return out

    return ds.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pandas")
