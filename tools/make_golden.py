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

    # golden_links (FIXTURES.md §4.4): discovered same-domain links per
    # 200-page, order-preserving, straight from the kernel
    import pyarrow.dataset as pads

    from news_crawler_ray.extract import ExtractKernel
    t = pads.dataset(corpus.pages_dir, partitioning="hive").to_table()
    meta = pq.read_table(corpus.fetchmeta).to_pydict()
    status = dict(zip(meta["url"], meta["status"]))
    kernel = ExtractKernel()
    page_urls, link_urls, link_seqs = [], [], []
    for url, html, lang in sorted(zip(t["url"].to_pylist(),
                                      t["html"].to_pylist(),
                                      t["lang"].to_pylist())):
        if status[url] != 200 or not html:
            continue
        r = kernel.extract(url, html.decode(), lang_hint=lang)
        for i, link in enumerate(r.links):
            page_urls.append(url)
            link_urls.append(link)
            link_seqs.append(i)
    pq.write_table(pa.table({
        "page_url": pa.array(page_urls, pa.string()),
        "link_url": pa.array(link_urls, pa.string()),
        "link_seq": pa.array(link_seqs, pa.int32()),
    }), os.path.join(GOLDEN_DIR, "golden_links.parquet"))

    # golden_fingerprints: single-process winnowing over the sf0.001
    # documents table — pins the distributed doc_fingerprints query
    # (deterministic pure function, not SQL-expressible; VERDICT r1 #9)
    import pandas as pd

    from news_crawler_ray.functions.textops import _winnow_fingerprints
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).sort_values("doc_id")
    fps = [_winnow_fingerprints(t or "") for t in docs["text"]]
    pq.write_table(pa.table({
        "doc_id": pa.array(docs["doc_id"], pa.int64()),
        "n_fingerprints": pa.array([len(f) for f in fps], pa.int64()),
        "min_fp": pa.array([min(f) if f else 0 for f in fps], pa.uint64()),
    }), os.path.join(GOLDEN_DIR, "golden_fingerprints.parquet"))

    # golden_media: deterministic fake-decode outputs over sf0.001 —
    # pins the multimodal plumbing queries (no SQL oracle possible)
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    from news_crawler_ray.queries import (q_frame_sample, q_media_features,
                                          q_media_metadata, q_media_resize)
    meta_df = q_media_metadata("/root/testdata/sf0.001")
    frames_df = q_frame_sample("/root/testdata/sf0.001")
    resize_df = q_media_resize("/root/testdata/sf0.001")
    feats_df = q_media_features("/root/testdata/sf0.001")
    pq.write_table(pa.Table.from_pandas(resize_df, preserve_index=False),
                   os.path.join(GOLDEN_DIR, "golden_media_resize.parquet"))
    pq.write_table(pa.Table.from_pandas(feats_df, preserve_index=False),
                   os.path.join(GOLDEN_DIR, "golden_media_features.parquet"))
    pq.write_table(pa.Table.from_pandas(meta_df, preserve_index=False),
                   os.path.join(GOLDEN_DIR, "golden_media_metadata.parquet"))
    pq.write_table(pa.Table.from_pandas(frames_df, preserve_index=False),
                   os.path.join(GOLDEN_DIR, "golden_media_frames.parquet"))
    ray.shutdown()

    print(f"wrote {pages.num_rows} pages, "
          f"{result['order'].num_rows} order rows, "
          f"{len(link_urls)} links, {len(fps)} fingerprint rows, "
          f"{len(meta_df)} media rows, {len(frames_df)} frame rows "
          f"to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
