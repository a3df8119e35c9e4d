"""Text-analysis operators: token stats, quality scoring, language id,
document fingerprinting. All deterministic, all vectorizable per batch;
SQL-expressible ones get DuckDB oracles in __ray_entry__.
"""

from __future__ import annotations

import hashlib
import re
import string

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..extract.textstats import STOPWORDS, detect_language

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
