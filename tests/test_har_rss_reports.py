"""Tests for HAR capture + ad classification (S4/ST2), RSS source (S8)
and reporting pipelines (S10/A4)."""

import pandas as pd
import pytest

from news_crawler_ray.corpus import default_corpus
from news_crawler_ray.extract import ExtractKernel
from news_crawler_ray.functions.adrules import (AdRuleSet, har_tables,
                                                _rule_to_regex)
from news_crawler_ray.sources.rss import parse_feed_xml, rss_entries


ARTICLE_URL = "http://news-0.example/politica/2021/05/12/una-storia-lunga-con-dettagli-vari.html"


def article_html(extra_head="", extra_body=""):
    p = ("Il governo ha approvato oggi la riforma che era stata discussa "
         "per mesi nelle aule del parlamento con un voto di fiducia.")
    return (f'<html lang="it"><head><title>t</title>'
            f'<meta property="og:type" content="article"/>{extra_head}</head>'
            f'<body><div itemprop="articleBody"><p>{p}</p></div>'
            f"{extra_body}</body></html>")


class TestHarCapture:
    def test_third_party_resources_collected(self):
        k = ExtractKernel()
        html = article_html(
            extra_head='<script src="http://ads.tracker.example/ads/x.js"></script>'
                       '<link rel="stylesheet" href="http://cdn.other.example/a.css"/>')
        r = k.extract(ARTICLE_URL, html)
        assert "http://ads.tracker.example/ads/x.js" in r.har
        assert "http://cdn.other.example/a.css" in r.har

    def test_same_domain_and_filetype_and_social_filtered(self):
        k = ExtractKernel()
        html = article_html(
            extra_head='<script src="http://news-0.example/own.js"></script>'
                       '<script src="http://cdn.x.example/pic.jpg"></script>'
                       '<script src="http://facebook.com/sdk.js"></script>')
        r = k.extract(ARTICLE_URL, html)
        assert r.har == []

    def test_har_does_not_change_text(self):
        k = ExtractKernel()
        plain = k.extract(ARTICLE_URL, article_html())
        with_res = k.extract(ARTICLE_URL, article_html(
            extra_head='<script src="http://ads.tracker.example/ads/x.js"></script>'))
        assert plain.text == with_res.text


class TestAdRules:
    def test_domain_anchor(self):
        rs = AdRuleSet(["||doubleclick.net^"])
        assert rs.should_block("http://ad.doubleclick.net/pixel")
        assert rs.should_block("https://doubleclick.net/x")
        assert not rs.should_block("http://notdoubleclick.net.example/x")

    def test_substring_and_wildcard(self):
        rs = AdRuleSet(["/ads/*"])
        assert rs.should_block("http://x.example/ads/banner.js")
        assert not rs.should_block("http://x.example/loads/banner.js")

    def test_separator_caret(self):
        rs = AdRuleSet(["||tracker.example^"])
        assert rs.should_block("http://tracker.example/x")
        assert rs.should_block("http://tracker.example")

    def test_exception_rule(self):
        rs = AdRuleSet(["/ads/", "@@||good.example/ads/*"])
        assert rs.should_block("http://bad.example/ads/x")
        assert not rs.should_block("http://good.example/ads/x")

    def test_domain_option(self):
        from news_crawler_ray.functions.adrules import AdRuleSet
        rs = AdRuleSet(["/promo/*$domain=news.example|~safe.news.example"])
        url = "http://cdn.example/promo/banner.js"
        # no options passed → option rules never fire (exactly what the
        # reference's call site does — ads_extractor.py:16-19)
        assert not rs.should_block(url)
        assert rs.should_block(url, {"domain": "news.example"})
        assert rs.should_block(url, {"domain": "sub.news.example"})
        assert not rs.should_block(url, {"domain": "safe.news.example"})
        assert not rs.should_block(url, {"domain": "other.example"})

    def test_third_party_option(self):
        from news_crawler_ray.functions.adrules import AdRuleSet
        rs = AdRuleSet(["||tracker.example^$third-party"])
        url = "http://tracker.example/pixel.gif"
        assert not rs.should_block(url)
        assert rs.should_block(url, {"third-party": True})
        assert not rs.should_block(url, {"third-party": False})

    def test_option_exception_rule(self):
        from news_crawler_ray.functions.adrules import AdRuleSet
        rs = AdRuleSet(["/ads/*",
                        "@@/ads/acceptable/*$domain=nice.example"])
        url = "http://x.example/ads/acceptable/a.js"
        assert rs.should_block(url)   # exception needs its option
        assert not rs.should_block(url, {"domain": "nice.example"})

    def test_unsupported_option_skips_rule(self):
        from news_crawler_ray.functions.adrules import AdRuleSet
        rs = AdRuleSet(["/everything/*$websocket"])
        assert not rs.should_block("http://x.example/everything/y",
                                   {"domain": "x.example"})

    def test_comments_and_elemhide_ignored(self):
        rs = AdRuleSet(["!comment", "example.com##.ad-banner"])
        assert not rs.should_block("http://example.com/anything")

    def test_default_rules(self):
        rs = AdRuleSet()
        assert rs.should_block("http://ads.tracker.example/ads/serve.js?slot=3")
        assert not rs.should_block("http://cdn.static.example/css/main.css")


class TestHarPipeline:
    def test_har_tables_from_crawl(self, ray_session):
        import ray.data as rd
        from news_crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine
        corpus = default_corpus("hartest", num_hosts=2, pages_per_host=18)
        eng = CrawlEngine(CrawlConfig(corpus_root=corpus.root,
                                      out_dir="/tmp/ncr_test_har"))
        eng.run()
        eng.shutdown()   # release actor CPUs before running the pipelines
        pages = rd.read_parquet("/tmp/ncr_test_har/pages")
        har_urls, assoc = har_tables(pages)
        hdf = har_urls.to_pandas()
        adf = assoc.to_pandas()
        assert (hdf["is_advertising"] & hdf["har_url"].str.contains("ads.tracker")).any()
        assert not hdf.loc[hdf["har_url"].str.contains("cdn.static"),
                           "is_advertising"].any()
        # M:N association references crawled pages
        assert len(adf) > len(hdf)
        assert hdf["har_url"].is_unique


class TestRss:
    def test_parse_feed(self):
        corpus = default_corpus("rsstest", num_hosts=2, pages_per_host=18)
        import pyarrow.parquet as pq
        feeds = pq.read_table(corpus.feeds).to_pydict()
        feed = parse_feed_xml(feeds["xml"][0])
        assert feed["title"].endswith("feed")
        assert feed["language"] in ("it", "en", "es", "de", "fr")
        assert len(feed["entries"]) >= 5
        e = feed["entries"][0]
        assert e["link"].startswith("http://")
        assert e["published"] is not None

    def test_rss_entries_dataset(self, ray_session):
        import ray.data as rd
        corpus = default_corpus("rsstest", num_hosts=2, pages_per_host=18)
        ds = rd.read_parquet(corpus.feeds)
        out = rss_entries(ds).to_pandas()
        assert len(out) >= 10
        # channel title becomes the category (crawler.py:447)
        assert out["category"].map(lambda c: len(c) == 1 and
                                   c[0].endswith("feed")).all()
        assert out["is_webnews"].all()   # dated article slugs
        assert out["publish_date"].notna().all()

    def test_engine_scrape_rss_seeds_articles_early(self, ray_session):
        from news_crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine
        corpus = default_corpus("rsstest", num_hosts=2, pages_per_host=18)
        eng = CrawlEngine(CrawlConfig(corpus_root=corpus.root,
                                      out_dir="/tmp/ncr_test_rss_crawl",
                                      scrape_rss=True))
        eng.run()
        order = eng.crawl_order_table().to_pandas()
        pages = eng.pages_dataset().to_pandas()
        eng.shutdown()
        # with RSS seeding, round 0 already dequeues article urls (not
        # just the seed hubs): first host_seq positions include tier-0
        first = order[order.host_seq <= 6]
        assert (first.priority_tier == 0).any()
        # membership identical to a non-RSS crawl (feeds list reachable
        # articles)
        eng2 = CrawlEngine(CrawlConfig(corpus_root=corpus.root,
                                       out_dir="/tmp/ncr_test_rss_crawl2"))
        eng2.run()
        base = set(eng2.pages_dataset().to_pandas()["url"])
        eng2.shutdown()
        assert set(pages["url"]) == base

    def test_rss_refresh_freshness_gate(self, ray_session, tmp_path):
        # mid-crawl refresh (crawler.py:434-445): an unchanged feed
        # (lastBuildDate not newer) is skipped whole; a bumped feed with
        # a new entry admits exactly the unseen entry
        import os
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq
        from news_crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine
        corpus = default_corpus("rsstest", num_hosts=2, pages_per_host=18)
        root = str(tmp_path / "rssrefresh")
        shutil.copytree(corpus.root, root)
        eng = CrawlEngine(CrawlConfig(corpus_root=root,
                                      out_dir="/tmp/ncr_test_rss_refresh",
                                      scrape_rss=True))
        try:
            # unchanged feeds: the gate skips them entirely
            assert eng._enqueue_rss() == 0
            # bump one feed: newer lastBuildDate + one brand-new entry
            feeds = pq.read_table(os.path.join(root, "feeds.parquet")) \
                .to_pydict()
            xml = feeds["xml"][0].decode()
            xml = xml.replace("Tue, 01 Jun 2021 09:00:00 GMT",
                              "Wed, 01 Sep 2021 09:00:00 GMT")
            xml = xml.replace("</channel>",
                              "<item><title>Fresh</title>"
                              "<link>http://news-0.example/politica/2021/"
                              "09/01/breaking-fresh-item-999.html</link>"
                              "</item></channel>")
            feeds["xml"][0] = xml.encode()
            pq.write_table(pa.table({
                "host": pa.array(feeds["host"], pa.string()),
                "url": pa.array(feeds["url"], pa.string()),
                "xml": pa.array(feeds["xml"], pa.binary()),
            }), os.path.join(root, "feeds.parquet"))
            # only the ONE new entry is admitted (old entries seen-dedup)
            assert eng._enqueue_rss() == 1
            # a further refresh with no new bump admits nothing
            assert eng._enqueue_rss() == 0
        finally:
            eng.shutdown()

    def test_malformed_xml(self):
        assert parse_feed_xml(b"<not xml") == {
            "title": None, "language": None, "updated": None, "entries": []}


class TestRssDiscovery:
    """S8 feed AUTO-DISCOVERY (reference RssFinder rss_finder.py:12-39 +
    extract_feed_rss cascade extractor.py:136-158): a corpus page
    advertises its feed; the feed is then parsed and its entries
    enqueued, matching the single-process oracle (VERDICT r2 item 4)."""

    def test_kernel_cascade_tiers(self):
        from news_crawler_ray.extract import ExtractKernel
        k = ExtractKernel()
        # tier 1: <link rel=alternate>, relative href absolutized
        r = k.extract("http://ex.example/home", (
            '<html><head><link rel="alternate" '
            'type="application/rss+xml" href="/f.rss"/>'
            '<link rel="alternate" type="application/atom+xml" '
            'href="http://ex.example/atom.xml"/>'
            '<link rel="stylesheet" href="/css/x.css"/></head>'
            '<body><a href="http://ex.example/sitemap.xml">x</a>'
            '</body></html>'))
        assert r.feed_urls == ["http://ex.example/f.rss",
                               "http://ex.example/atom.xml"]
        # tier 2 (no alternate links): .xml anchors with xml filetype
        r = k.extract("http://ex.example/home", (
            '<html><head></head><body>'
            '<a href="http://ex.example/sitemap.xml">x</a>'
            '<a href="http://ex.example/not-xml.html">y</a>'
            '</body></html>'))
        assert r.feed_urls == ["http://ex.example/sitemap.xml"]
        # tier 3: rss/feed anchors — invalid href retried as
        # {page_url}/{href}; self-equal urls excluded
        r = k.extract("http://ex.example/feeds", (
            '<html><body><a href="rss">feeds</a>'
            '<a href="http://ex.example/feed/archive">old</a>'
            '<a href="http://ex.example/feeds">self</a>'
            '</body></html>'))
        assert r.feed_urls == ["http://ex.example/feeds/rss",
                               "http://ex.example/feed/archive"]
        # nothing advertised → empty
        r = k.extract("http://ex.example/home",
                      '<html><body><a href="/a.html">a</a></body></html>')
        assert r.feed_urls == []

    def test_engine_matches_oracle_and_reaches_feed_only_page(
            self, ray_session):
        import pandas as pd
        from news_crawler_ray.oracle import crawl_oracle
        from news_crawler_ray.pipelines.crawl import (CrawlConfig,
                                                      CrawlEngine)
        corpus = default_corpus("rssdisc", num_hosts=2, pages_per_host=18,
                                feed_only_article=True)
        ora = crawl_oracle(corpus.root, rss_discovery=True)
        eng = CrawlEngine(CrawlConfig(corpus_root=corpus.root,
                                      out_dir="/tmp/ncr_test_rssdisc",
                                      rss_discovery=True))
        summary = eng.run()
        pages = eng.pages_dataset().to_pandas()
        order = eng.crawl_order_table().to_pandas()
        eng.shutdown()
        # the feed-only page is reachable ONLY via the discovered feed
        assert pages["url"].str.contains("feed-only-story").sum() == 2
        # conformance vs the oracle: seen membership, page rows, order
        assert summary["seen_total"] == ora["seen_count"]
        opages = ora["pages"].to_pandas()
        assert set(pages["url"]) == set(opages["url"])
        cols = ["url", "scraped", "http_response_code", "title_art",
                "text_art", "url_to_refer"]
        pd.testing.assert_frame_equal(
            pages[cols].sort_values("url").reset_index(drop=True),
            opages[cols].sort_values("url").reset_index(drop=True))
        oorder = ora["order"].to_pandas()
        for host in sorted(oorder["host"].unique()):
            e = order[order.host == host].sort_values("host_seq")
            o = oorder[oorder.host == host].sort_values("host_seq")
            assert list(e["url"]) == list(o["url"]), host

    def test_without_discovery_feed_only_page_unreached(self, ray_session):
        from news_crawler_ray.pipelines.crawl import (CrawlConfig,
                                                      CrawlEngine)
        corpus = default_corpus("rssdisc", num_hosts=2, pages_per_host=18,
                                feed_only_article=True)
        eng = CrawlEngine(CrawlConfig(corpus_root=corpus.root,
                                      out_dir="/tmp/ncr_test_rssdisc_off"))
        eng.run()
        pages = eng.pages_dataset().to_pandas()
        eng.shutdown()
        assert not pages["url"].str.contains("feed-only-story").any()


class TestSeedList:
    def test_read_seed_list(self, tmp_path):
        from news_crawler_ray.sources.seeds import read_seed_list
        p = tmp_path / "seeds.txt"
        p.write_text("http://a.example/x\n\nhttp://b.example/y\n"
                     "http://a.example/x\n")
        t = read_seed_list(str(p))
        assert t["url"].to_pylist() == ["http://a.example/x",
                                        "http://b.example/y"]
        assert t["seq"].to_pylist() == [0, 1]


class TestOutboundLinks:
    def test_outbound_computed_not_persisted(self):
        k = ExtractKernel()
        html = article_html(
            extra_body='<a href="http://other.example/some/page.html">out</a>'
                       '<a href="http://news-0.example/own/page.html">in</a>')
        r = k.extract(ARTICLE_URL, html)
        assert "http://other.example/some/page.html" in r.outbound_links
        assert all("news-0.example" not in u for u in r.outbound_links)
        # in_links and outbound are disjoint concerns (extractor.py:264-295)
        assert "http://news-0.example/own/page.html" in r.links


class TestReports:
    def test_corpus_and_host_stats(self, ray_session):
        from news_crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine
        from news_crawler_ray.pipelines.reports import (corpus_stats,
                                                        per_host_stats)
        corpus = default_corpus("hartest", num_hosts=2, pages_per_host=18)
        eng = CrawlEngine(CrawlConfig(corpus_root=corpus.root,
                                      out_dir="/tmp/ncr_test_reports"))
        eng.run()
        pages = eng.pages_dataset()
        stats = corpus_stats(pages, min_news_len=100)
        hosts = per_host_stats(pages)
        eng.shutdown()
        assert stats.iloc[0]["n_pages"] > 30
        assert 0 < stats.iloc[0]["n_news"] <= stats.iloc[0]["n_scraped"]
        assert stats.iloc[0]["n_news_filtered"] <= stats.iloc[0]["n_news"]
        assert len(hosts) == 2
        assert (hosts["n_pages"] > 0).all()

    def test_host_metadata_whois_join(self, ray_session):
        # S7: per-host stats + whois sidecar; fields match the
        # deterministic whois synthesis exactly
        from news_crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine
        from news_crawler_ray.pipelines.reports import (host_metadata,
                                                        per_host_stats)
        from news_crawler_ray.sources.whois import whois_record
        corpus = default_corpus("hartest", num_hosts=2, pages_per_host=18)
        eng = CrawlEngine(CrawlConfig(corpus_root=corpus.root,
                                      out_dir="/tmp/ncr_test_whoismeta"))
        eng.run()
        pages = eng.pages_dataset()
        out = host_metadata(pages, corpus.whois)
        stats = per_host_stats(pages)
        eng.shutdown()
        assert list(out["host"]) == list(stats["host"])
        assert (out["n_pages"].to_numpy() == stats["n_pages"].to_numpy()).all()
        for _, row in out.iterrows():
            w = whois_record(row["host"])
            assert row["registrar"] == w["registrar"]
            assert row["created_year"] == w["created_year"]
            assert row["expires_year"] == w["expires_year"]
            assert row["country"] == w["country"]

    def test_compact(self, ray_session, tmp_path):
        from news_crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine
        from news_crawler_ray.pipelines.reports import compact
        corpus = default_corpus("hartest", num_hosts=2, pages_per_host=18)
        eng = CrawlEngine(CrawlConfig(corpus_root=corpus.root,
                                      out_dir="/tmp/ncr_test_compact"))
        eng.run()
        eng.shutdown()
        import os
        n = compact("/tmp/ncr_test_compact/pages", str(tmp_path / "compact"), 2)
        assert n > 30
        files = os.listdir(tmp_path / "compact")
        assert 1 <= len(files) <= 4
