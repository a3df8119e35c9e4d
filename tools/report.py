"""Crawl-run monitoring report — the batch analogue of the reference's
curses dashboard (crawler_manager.py:87-122: per-crawler scraped /
redirection / failure / queue metrics every 10 s).

Usage: python tools/report.py /path/to/crawl_out_dir
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow.dataset as pads


def main(out_dir: str) -> int:
    metrics_path = os.path.join(out_dir, "metrics.jsonl")
    if os.path.exists(metrics_path):
        rows = [json.loads(line) for line in open(metrics_path)]
        print(f"rounds: {len(rows)}")
        header = ["round", "dequeued", "pending", "enqueued_total",
                  "robots_rejected", "seen_total"]
        print(" | ".join(f"{h:>15}" for h in header))
        shown = rows if len(rows) <= 12 else rows[:6] + rows[-6:]
        for m in shown:
            print(" | ".join(f"{m.get(h, ''):>15}" for h in header))

    pages_dir = os.path.join(out_dir, "pages")
    if os.path.isdir(pages_dir):
        t = pads.dataset(pages_dir).to_table(
            columns=["host", "scraped", "http_response_code", "text_art"])
        import pandas as pd
        df = t.to_pandas()
        print(f"\npages: {len(df)}  scraped: {int(df.scraped.sum())}  "
              f"news: {int((df.text_art.fillna('') != '').sum())}")
        print("status codes:", df.http_response_code.value_counts().to_dict())
        per_host = df.groupby("host").size().sort_values(ascending=False)
        print("top hosts:", per_host.head(8).to_dict())

    ck = os.path.join(out_dir, "checkpoint", "manifest.json")
    if os.path.exists(ck):
        with open(ck) as f:
            print("\ncheckpoint:", json.load(f))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "."))
