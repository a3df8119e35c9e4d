"""Generate the stored golden conformance artifacts (FIXTURES.md §4)
from the single-process oracle over the pytest corpus, written to
tests/golden/. Commit the outputs; tests/test_golden.py compares the
oracle AND the engine against them, catching silent co-drift of shared
code paths.

Regenerate (and review the diff!) only when semantics intentionally
change:  python tools/make_golden.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from news_crawler_ray.corpus import default_corpus  # noqa: E402
from news_crawler_ray.oracle import crawl_oracle  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")

# Must match tests/test_golden.py
CORPUS_SPEC = dict(num_hosts=2, pages_per_host=18)
CORPUS_TAG = "golden"


def main():
    corpus = default_corpus(CORPUS_TAG, **CORPUS_SPEC)
    result = crawl_oracle(corpus.root)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    pages = result["pages"].sort_by("url")
    pq.write_table(pages, os.path.join(GOLDEN_DIR, "golden_pages.parquet"))
    pq.write_table(result["order"],
                   os.path.join(GOLDEN_DIR, "golden_crawl_order.parquet"))
    seen = pa.table({"url": pages["url"]})
    pq.write_table(seen, os.path.join(GOLDEN_DIR, "golden_seen.parquet"))
    print(f"wrote {pages.num_rows} pages, "
          f"{result['order'].num_rows} order rows to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
