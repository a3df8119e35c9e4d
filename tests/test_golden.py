"""Stored-golden conformance (FIXTURES.md §4): both the oracle and the
distributed engine must reproduce the committed golden artifacts —
catches silent co-drift of code shared between them. Regenerate
deliberately with tools/make_golden.py when semantics change."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from news_crawler_ray.corpus import default_corpus
from news_crawler_ray.oracle import crawl_oracle
from news_crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CORPUS_SPEC = dict(num_hosts=2, pages_per_host=18)   # tools/make_golden.py
CORPUS_TAG = "golden"

PAGE_COLS = ["url", "protocol", "scraped", "attempts_count", "mime_type",
             "http_response_code", "language", "url_to_refer", "is_webnews",
             "title_art", "text_art", "publish_date", "error_text"]


@pytest.fixture(scope="module")
def golden():
    return {
        "pages": pq.read_table(
            os.path.join(GOLDEN_DIR, "golden_pages.parquet")).to_pandas(),
        "order": pq.read_table(
            os.path.join(GOLDEN_DIR, "golden_crawl_order.parquet")).to_pandas(),
        "seen": set(pq.read_table(
            os.path.join(GOLDEN_DIR, "golden_seen.parquet"))["url"].to_pylist()),
    }


def _norm_pages(df: pd.DataFrame) -> pd.DataFrame:
    return df[PAGE_COLS].sort_values("url").reset_index(drop=True)


class TestGolden:
    def test_oracle_matches_golden(self, golden):
        corpus = default_corpus(CORPUS_TAG, **CORPUS_SPEC)
        result = crawl_oracle(corpus.root)
        pd.testing.assert_frame_equal(
            _norm_pages(result["pages"].to_pandas()),
            _norm_pages(golden["pages"]))
        pd.testing.assert_frame_equal(
            result["order"].to_pandas().reset_index(drop=True),
            golden["order"].reset_index(drop=True))

    def test_engine_matches_golden(self, ray_session, golden):
        corpus = default_corpus(CORPUS_TAG, **CORPUS_SPEC)
        eng = CrawlEngine(CrawlConfig(corpus_root=corpus.root,
                                      out_dir="/tmp/ncr_test_golden"))
        eng.run()
        pages = eng.pages_dataset().to_pandas()
        order = eng.crawl_order_table().to_pandas()
        eng.shutdown()
        pd.testing.assert_frame_equal(_norm_pages(pages),
                                      _norm_pages(golden["pages"]))
        a = order.sort_values(["host", "host_seq"]).reset_index(drop=True)
        b = golden["order"].sort_values(["host", "host_seq"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        assert set(pages["url"]) == golden["seen"]

    def test_kernel_links_match_golden(self):
        # FIXTURES.md §4.4: per-page discovered links, order-preserving
        from news_crawler_ray.extract import ExtractKernel
        import pyarrow.dataset as pads
        golden_links = pq.read_table(
            os.path.join(GOLDEN_DIR, "golden_links.parquet")).to_pandas()
        corpus = default_corpus(CORPUS_TAG, **CORPUS_SPEC)
        t = pads.dataset(corpus.pages_dir, partitioning="hive").to_table()
        pages = {u: (h, lg) for u, h, lg in zip(t["url"].to_pylist(),
                                                t["html"].to_pylist(),
                                                t["lang"].to_pylist())}
        kernel = ExtractKernel()
        checked = 0
        for page_url, g in golden_links.groupby("page_url"):
            html, lang = pages[page_url]
            r = kernel.extract(page_url, html.decode(), lang_hint=lang)
            want = list(g.sort_values("link_seq")["link_url"])
            assert r.links == want, page_url
            checked += 1
        assert checked > 20


class TestMediaGolden:
    def test_media_metadata_matches_golden(self, ray_session):
        from news_crawler_ray.queries import q_media_metadata
        golden_m = pq.read_table(
            os.path.join(GOLDEN_DIR, "golden_media_metadata.parquet")
        ).to_pandas()
        got = q_media_metadata("/root/testdata/sf0.001")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), golden_m.reset_index(drop=True))

    def test_frame_sample_matches_golden(self, ray_session):
        from news_crawler_ray.queries import q_frame_sample
        golden_f = pq.read_table(
            os.path.join(GOLDEN_DIR, "golden_media_frames.parquet")
        ).to_pandas()
        got = q_frame_sample("/root/testdata/sf0.001")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), golden_f.reset_index(drop=True))

    def test_media_resize_matches_golden(self, ray_session):
        from news_crawler_ray.queries import q_media_resize
        golden_r = pq.read_table(
            os.path.join(GOLDEN_DIR, "golden_media_resize.parquet")
        ).to_pandas()
        got = q_media_resize("/root/testdata/sf0.001")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), golden_r.reset_index(drop=True))

    def test_media_features_matches_golden(self, ray_session):
        from news_crawler_ray.queries import q_media_features
        golden_e = pq.read_table(
            os.path.join(GOLDEN_DIR, "golden_media_features.parquet")
        ).to_pandas()
        got = q_media_features("/root/testdata/sf0.001")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), golden_e.reset_index(drop=True))


class TestFingerprintGolden:
    def test_distributed_fingerprints_match_golden(self, ray_session):
        """doc_fingerprints (winnowing) vs the committed single-process
        golden over sf0.001 — the driver-surface check for a pure
        function with no SQL oracle (VERDICT r1 #9)."""
        from news_crawler_ray.queries import q_fingerprints
        golden_fp = pq.read_table(
            os.path.join(GOLDEN_DIR, "golden_fingerprints.parquet")
        ).to_pandas()
        got = q_fingerprints("/root/testdata/sf0.001")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), golden_fp.reset_index(drop=True))
