"""Reporting + maintenance over crawl output (reference script1/script2).

- :func:`corpus_stats` — script2.py:8-49: scraped / news / near-dup-
  filtered news counts, computed as filtered counts + the A4 grouped
  aggregate over the unified pages Dataset (one wide aggregation).
- :func:`per_host_stats` — the per-domain breakdown the reference gets
  implicitly from one SQLite DB per domain (A1/A2).
- :func:`compact` — script1.py VACUUM equivalent: immutable Parquet needs
  only a repartition-on-write compaction (S9).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum


def corpus_stats(pages_ds: "rd.Dataset", min_news_len: int = 500,
                 max_dup_count: int = 4) -> pd.DataFrame:
    """One-row summary (script2.py semantics): total pages, scraped,
    news (non-empty article text), and news surviving the near-dup
    boilerplate filter (GROUP BY text HAVING count < 4 over texts longer
    than 500 chars — script2.py:8-21)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text_art"].fillna("")
        return pd.DataFrame({
            "n_pages": [len(batch)],
            "n_scraped": [int(batch["scraped"].sum())],
            "n_news": [int((text != "").sum())],
        })

    totals = pages_ds.map_batches(partial, batch_format="pandas") \
        .sum(["n_pages", "n_scraped", "n_news"])

    def hash_long(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text_art"].fillna("")
        keep = text.str.len() > min_news_len
        return pd.DataFrame({"text_hash": [
            hashlib.md5(t.encode()).hexdigest() for t in text[keep]]})

    groups = pages_ds.map_batches(hash_long, batch_format="pandas") \
        .groupby("text_hash").aggregate(Count(alias_name="n"))

    def surviving(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch["n"] < max_dup_count
        return pd.DataFrame({"n_filtered": [int(batch.loc[keep, "n"].sum())]})

    filt = groups.map_batches(surviving, batch_format="pandas") \
        .sum("n_filtered")

    return pd.DataFrame({
        "n_pages": [int(totals["sum(n_pages)"])],
        "n_scraped": [int(totals["sum(n_scraped)"])],
        "n_news": [int(totals["sum(n_news)"])],
        "n_news_filtered": [int(filt) if filt is not None else 0],
    })


def per_host_stats(pages_ds: "rd.Dataset") -> pd.DataFrame:
    """Per-host counts (the reference's per-domain DB totals, A1/A2)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text_art"].fillna("")
        b = batch.assign(is_news=(text != "").astype("int64"),
                         scraped_i=batch["scraped"].astype("int64"))
        return b.groupby("host", as_index=False).agg(
            n_pages=("host", "size"), n_scraped=("scraped_i", "sum"),
            n_news=("is_news", "sum"))

    out = pages_ds.map_batches(partial, batch_format="pandas") \
        .groupby("host").aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Sum("n_scraped", alias_name="n_scraped"),
            Sum("n_news", alias_name="n_news")).to_pandas()
    for c in ("n_pages", "n_scraped", "n_news"):
        out[c] = out[c].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


def host_metadata(pages_ds: "rd.Dataset", whois_path: str) -> pd.DataFrame:
    """S7: per-host crawl stats joined with whois registration metadata
    (reference whoisinfo.py:39-104 feeds datacollector.py:47-75). The
    whois table is per-HOST — broadcast-small at any corpus size — so
    the join is a driver-side merge onto the aggregated stats (the
    aggregate is the wide step; whois never shuffles)."""
    import pyarrow.parquet as pq

    stats = per_host_stats(pages_ds)
    whois = pq.read_table(whois_path).to_pandas()
    out = stats.merge(whois, on="host", how="left")
    return out.sort_values("host").reset_index(drop=True)


def compact(pages_dir: str, out_dir: str, num_files: int = 8) -> int:
    """script1 VACUUM analogue: rewrite the pages output as ``num_files``
    right-sized Parquet files (repartition, no shuffle of rows needed)."""
    from ..rayutil import read_parquet
    ds = read_parquet(pages_dir)
    n = ds.count()
    ds.repartition(num_files).write_parquet(out_dir)
    return n
