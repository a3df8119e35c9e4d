"""Sitemap discovery (sources/sitemap.py + CrawlEngine._enqueue_sitemaps):
protocol parsing, index expansion, and the end-to-end contract — a page
advertised ONLY by a robots-referenced sitemap is crawled, with page
rows / seen membership / per-host order matching the single-process
oracle run with the same sidecars."""

import gzip
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from news_crawler_ray.functions.robots import sitemap_urls
from news_crawler_ray.sources import sitemap as sm

URLSET = (b'<?xml version="1.0"?>'
          b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
          b'<url><loc>http://h.example/a</loc>'
          b'<lastmod>2024-01-01</lastmod></url>'
          b'<url><loc> http://h.example/b </loc></url>'
          b'<url><priority>0.5</priority></url>'
          b'</urlset>')

INDEX = (b'<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
         b'sitemap/0.9">'
         b'<sitemap><loc>http://h.example/s1.xml</loc></sitemap>'
         b'<sitemap><loc>http://h.example/s2.xml</loc></sitemap>'
         b'</sitemapindex>')


class TestParse:
    def test_urlset(self):
        out = sm.parse_sitemap_xml(URLSET)
        assert out["kind"] == "urlset"
        assert out["locs"] == ["http://h.example/a", "http://h.example/b"]

    def test_index(self):
        out = sm.parse_sitemap_xml(INDEX)
        assert out["kind"] == "sitemapindex"
        assert out["locs"] == ["http://h.example/s1.xml",
                               "http://h.example/s2.xml"]

    def test_gzip_payload(self):
        out = sm.parse_sitemap_xml(gzip.compress(URLSET))
        assert out["kind"] == "urlset" and len(out["locs"]) == 2

    def test_malformed_and_foreign(self):
        assert sm.parse_sitemap_xml(b"<not xml") == {
            "kind": None, "locs": []}
        assert sm.parse_sitemap_xml(b"<rss><channel/></rss>") == {
            "kind": None, "locs": []}
        assert sm.parse_sitemap_xml(b"") == {"kind": None, "locs": []}
        assert sm.parse_sitemap_xml(b"\x1f\x8b junk") == {
            "kind": None, "locs": []}

    def test_gzip_bomb_inflation_is_bounded(self, monkeypatch):
        """The inflate cap must bound the INFLATED size, not the
        compressed input: ~64 KB of compressed zeros claims ~6 MB
        inflated, which must be truncated AT the decompressor (never
        materialized whole) and then fail XML parse gracefully."""
        monkeypatch.setattr(sm, "MAX_INFLATED", 1 * 1024 * 1024)
        bomb = gzip.compress(b"\x00" * (6 * 1024 * 1024))
        assert len(bomb) < sm.MAX_INFLATED  # compressed side is small
        assert sm.parse_sitemap_xml(bomb) == {"kind": None, "locs": []}
        # a legitimate gzipped sitemap under the cap still parses
        out = sm.parse_sitemap_xml(gzip.compress(URLSET))
        assert out["kind"] == "urlset" and len(out["locs"]) == 2

    def test_entry_cap(self, monkeypatch):
        monkeypatch.setattr(sm, "MAX_ENTRIES", 3)
        body = (b"<urlset>" + b"".join(
            b"<url><loc>http://h.example/p%d</loc></url>" % i
            for i in range(10)) + b"</urlset>")
        assert len(sm.parse_sitemap_xml(body)["locs"]) == 3


class TestExpand:
    def canon(self, u):
        from news_crawler_ray import urlnorm
        return urlnorm.canonical_url(u)

    def test_index_expansion_order_and_lineage(self):
        s1 = b"<urlset><url><loc>http://h.example/x</loc></url></urlset>"
        s2 = b"<urlset><url><loc>http://h.example/y</loc></url></urlset>"
        bodies = {self.canon("http://h.example/root.xml"): INDEX,
                  self.canon("http://h.example/s1.xml"): s1,
                  self.canon("http://h.example/s2.xml"): s2}
        out = sm.expand_sitemaps(["http://h.example/root.xml"], bodies,
                                 canon=self.canon)
        assert out == [
            ("http://h.example/x", "http://h.example/s1.xml"),
            ("http://h.example/y", "http://h.example/s2.xml")]

    def test_cycle_and_missing_terminate(self):
        loop = (b"<sitemapindex><sitemap>"
                b"<loc>http://h.example/root.xml</loc></sitemap>"
                b"<sitemap><loc>http://h.example/gone.xml</loc>"
                b"</sitemap></sitemapindex>")
        bodies = {self.canon("http://h.example/root.xml"): loop}
        assert sm.expand_sitemaps(["http://h.example/root.xml"], bodies,
                                  canon=self.canon) == []


class TestRobotsSitemapLines:
    def test_global_and_case_insensitive(self):
        body = ("User-agent: *\nDisallow: /x\n"
                "Sitemap: http://h.example/a.xml\n\n"
                "User-agent: bot\nsitemap: http://h.example/b.xml # c\n"
                "Sitemap: http://h.example/a.xml\n")
        assert sitemap_urls(body) == ["http://h.example/a.xml",
                                      "http://h.example/b.xml"]


class TestEngineSitemaps:
    def test_sitemap_only_page_crawled_and_matches_oracle(
            self, ray_session, tmp_path):
        """The feed-only corpus article (reachable by NO link) with RSS
        OFF is reachable only through the sitemap chain robots.txt →
        sitemapindex → urlset; the crawl must fetch it and stay
        conformant with the oracle run on the same sidecars."""
        from news_crawler_ray.corpus import default_corpus
        from news_crawler_ray.oracle import crawl_oracle
        from news_crawler_ray.pipelines.crawl import (CrawlConfig,
                                                      CrawlEngine)

        corpus = default_corpus("sitemapdisc", num_hosts=2,
                                pages_per_host=18,
                                feed_only_article=True)
        root = str(tmp_path / "sitemap_corpus")
        shutil.copytree(corpus.root, root)

        import pyarrow.dataset as pads
        urls = pads.dataset(os.path.join(root, "pages")) \
            .to_table(columns=["url"]).to_pandas()["url"]
        orphan = sorted(u for u in urls if "feed-only-story" in u)
        assert orphan, "corpus must contain the feed-only article"
        host = orphan[0].split("/")[0]

        urlset = ("<urlset>" + "".join(
            f"<url><loc>http://{u}</loc></url>" for u in orphan)
            + "</urlset>").encode()
        index = (f"<sitemapindex><sitemap>"
                 f"<loc>http://{host}/smap/pages.xml</loc></sitemap>"
                 f"</sitemapindex>").encode()
        pq.write_table(pa.table({
            "url": pa.array([f"http://{host}/sitemap.xml",
                             f"http://{host}/smap/pages.xml"]),
            "xml": pa.array([index, urlset], pa.binary())}),
            os.path.join(root, "sitemaps.parquet"))
        pq.write_table(pa.table({
            "host": pa.array([host]),
            "robots_txt": pa.array(
                [f"User-agent: *\nDisallow:\n"
                 f"Sitemap: http://{host}/sitemap.xml\n"])}),
            os.path.join(root, "robots.parquet"))

        ora = crawl_oracle(root, sitemaps=True)
        eng = CrawlEngine(CrawlConfig(
            corpus_root=root, out_dir="/tmp/ncr_test_sitemap"))
        summary = eng.run()
        pages = eng.pages_dataset().to_pandas()
        order = eng.crawl_order_table().to_pandas()
        eng.shutdown()

        assert pages["url"].str.contains("feed-only-story").any()
        assert summary["seen_total"] == ora["seen_count"]
        opages = ora["pages"].to_pandas()
        assert set(pages["url"]) == set(opages["url"])
        # per-host crawl order parity (the conformance invariant)
        oorder = ora["order"].to_pandas()
        for h in sorted(set(order["host"])):
            got = list(order[order["host"] == h]["url"])
            want = list(oorder[oorder["host"] == h]["url"])
            assert got == want, h

    def test_no_sidecars_no_behavior_change(self, ray_session):
        """scrape_sitemaps defaults ON but is a strict no-op without
        both sidecars: same pages as a plain crawl."""
        from news_crawler_ray.corpus import default_corpus
        from news_crawler_ray.pipelines.crawl import (CrawlConfig,
                                                      CrawlEngine)
        corpus = default_corpus("crawltest", num_hosts=2,
                                pages_per_host=18)
        eng = CrawlEngine(CrawlConfig(
            corpus_root=corpus.root, out_dir="/tmp/ncr_test_sm_off"))
        eng.run()
        n_pages = len(eng.pages_dataset().to_pandas())
        eng.shutdown()
        eng2 = CrawlEngine(CrawlConfig(
            corpus_root=corpus.root, out_dir="/tmp/ncr_test_sm_off2",
            scrape_sitemaps=False))
        eng2.run()
        n_pages2 = len(eng2.pages_dataset().to_pandas())
        eng2.shutdown()
        assert n_pages == n_pages2
