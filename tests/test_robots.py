"""robots.txt parser tests: unit cases for the RFC-9309 subset,
hypothesis parity against CPython's urllib.robotparser over
Disallow-only files (the subset the frontier's prefix semantics
represent exactly), merge semantics into the politeness table, and a
frontier-level integration check that enqueue rejections match stdlib
``can_fetch`` decisions. Pure-Python — no Ray needed."""

from __future__ import annotations

import os
import urllib.robotparser

import pytest
from hypothesis import given, settings, strategies as st

from news_crawler_ray.functions.robots import (RobotsRules,
                                               merge_robots_rows,
                                               parse_robots)
from news_crawler_ray.state.frontier import Frontier


def _stdlib(text: str) -> urllib.robotparser.RobotFileParser:
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(text.splitlines())
    return rp


class TestParseRobots:
    def test_empty_and_missing(self):
        assert parse_robots("") == RobotsRules()
        assert parse_robots("# only a comment\n\n") == RobotsRules()
        assert parse_robots("").allows("/anything")

    def test_basic_group(self):
        r = parse_robots("User-agent: *\nDisallow: /private/\n"
                         "Disallow: /tmp\n")
        assert r.disallow == ("/private/", "/tmp")
        assert not r.allows("/private/x")
        assert not r.allows("/tmpfile")       # prefix, not segment, match
        assert r.allows("/public")

    def test_field_case_and_comments(self):
        r = parse_robots("USER-AGENT: *   # who\n"
                         "DisAllow: /a  # trailing comment\n")
        assert r.disallow == ("/a",)

    def test_empty_disallow_allows_all(self):
        r = parse_robots("User-agent: *\nDisallow:\n")
        assert r.disallow == () and r.allows("/anything")

    def test_exact_agent_beats_star(self):
        text = ("User-agent: *\nDisallow: /all/\n\n"
                "User-agent: newsbot\nDisallow: /newsbot-only/\n")
        star = parse_robots(text, "*")
        bot = parse_robots(text, "NewsBot")       # case-insensitive
        other = parse_robots(text, "otherbot")    # falls back to *
        assert star.disallow == ("/all/",)
        assert bot.disallow == ("/newsbot-only/",)
        assert other.disallow == ("/all/",)

    def test_shared_agent_lines_one_group(self):
        text = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
        assert parse_robots(text, "a").disallow == ("/x",)
        assert parse_robots(text, "b").disallow == ("/x",)

    def test_crawl_delay(self):
        r = parse_robots("User-agent: *\nCrawl-delay: 2.5\nDisallow: /a\n")
        assert r.crawl_delay_ms == 2500
        assert parse_robots("User-agent: *\nCrawl-delay: bogus\n"
                            "Disallow: /a\n").crawl_delay_ms is None

    def test_allow_flagged_not_represented(self):
        r = parse_robots("User-agent: *\nDisallow: /a/\nAllow: /a/ok\n")
        assert r.has_allow and r.disallow == ("/a/",)
        assert not r.allows("/a/ok")   # over-blocks: the safe direction

    def test_rule_before_agent_dropped(self):
        assert parse_robots("Disallow: /orphan\nUser-agent: *\n"
                            "Disallow: /real\n").disallow == ("/real",)

    def test_first_matching_group_wins(self):
        text = ("User-agent: *\nDisallow: /first/\n\n"
                "User-agent: *\nDisallow: /second/\n")
        assert parse_robots(text).disallow == ("/first/",)


_PATH_CHARS = "abcdefghij0123456789/_-."


class TestStdlibParity:
    """Disallow-only robots files: our prefix semantics must agree
    with urllib.robotparser's can_fetch for the * agent, rule for
    rule. (Allow lines and wildcards are outside the represented
    subset and excluded by construction.)"""

    @settings(max_examples=80, deadline=None)
    @given(
        rules=st.lists(
            st.text(alphabet=_PATH_CHARS, min_size=1, max_size=12)
            .map(lambda s: "/" + s.lstrip("/")),
            max_size=5),
        paths=st.lists(
            st.text(alphabet=_PATH_CHARS, max_size=14)
            .map(lambda s: "/" + s.lstrip("/")),
            min_size=1, max_size=6))
    def test_decisions_match(self, rules, paths):
        text = "User-agent: *\n" + "".join(
            f"Disallow: {r}\n" for r in rules)
        ours = parse_robots(text)
        rp = _stdlib(text)
        for p in paths:
            assert ours.allows(p) == rp.can_fetch(
                "anybot", "http://h.example" + p), (rules, p)

    def test_pinned_examples(self):
        text = "User-agent: *\nDisallow: /a\nDisallow: /b/c/\n"
        ours, rp = parse_robots(text), _stdlib(text)
        for p in ["/a", "/ab", "/b/c/", "/b/c", "/b/cd", "/", "/b"]:
            assert ours.allows(p) == rp.can_fetch(
                "x", "http://h.example" + p), p


class TestMergeRobotsRows:
    _BODY = "User-agent: *\nCrawl-delay: 1\nDisallow: /priv/\n"

    def test_new_host_gets_defaults(self):
        out = merge_robots_rows(None, ["h.example"], [self._BODY])
        assert out["host"] == ["h.example"]
        assert out["robots_disallow"] == [["/priv/"]]
        assert out["min_interval_ms"] == [1000]
        assert out["max_in_flight"] == [6] and out["max_attempts"] == [2]

    def test_union_and_interval_floor(self):
        pol = {"host": ["h.example"], "max_in_flight": [3],
               "min_interval_ms": [5000], "max_attempts": [4],
               "robots_disallow": [["/fixture/"]]}
        out = merge_robots_rows(pol, ["h.example"], [self._BODY])
        assert out["robots_disallow"] == [["/fixture/", "/priv/"]]
        assert out["min_interval_ms"] == [5000]   # robots never lowers
        assert out["max_in_flight"] == [3]        # fixture budget kept

    def test_extra_columns_stay_aligned(self):
        pol = {"host": ["a.example"], "max_in_flight": [3],
               "min_interval_ms": [0], "max_attempts": [2],
               "robots_disallow": [[]], "note": ["keep"]}
        out = merge_robots_rows(pol, ["b.example"], [self._BODY])
        assert len(out["note"]) == len(out["host"]) == 2
        assert out["note"] == ["keep", None]


class TestEngineRobotsSidecar:
    def test_robots_parquet_blocks_prefix(self, ray_session, tmp_path):
        """End-to-end: a robots.parquet sidecar with raw robots.txt
        bodies must keep every matching URL out of the crawl — parsed
        once at engine startup, enforced inside the frontier shards."""
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq

        from news_crawler_ray.corpus import default_corpus
        from news_crawler_ray.pipelines.crawl import (CrawlConfig,
                                                      CrawlEngine)
        corpus = default_corpus("crawltest", num_hosts=2,
                                pages_per_host=18)
        root = str(tmp_path / "robots_corpus")
        shutil.copytree(corpus.root, root)
        body = "User-agent: *\nDisallow: /economia/\n"
        pq.write_table(
            pa.table({"host": pa.array(["news-0.example"], pa.string()),
                      "robots_txt": pa.array([body], pa.string())}),
            os.path.join(root, "robots.parquet"))

        eng = CrawlEngine(CrawlConfig(
            corpus_root=root, out_dir="/tmp/ncr_test_robots_sidecar"))
        eng.run()
        order = eng.crawl_order_table().to_pandas()
        eng.shutdown()

        assert len(order) > 0
        paths = order[order["host"] == "news-0.example"]["url"] \
            .str.replace("news-0.example", "", regex=False)
        assert not paths.str.startswith("/economia/").any()
        # the OTHER host's economia pages are unaffected
        other = order[order["host"] == "news-1.example"]["url"] \
            .str.replace("news-1.example", "", regex=False)
        assert other.str.startswith("/economia/").any()


class TestEngineRobotsCrawlDelay:
    def test_crawl_delay_paces_dequeues(self, ray_session, tmp_path):
        """A robots.txt Crawl-delay must pace the frontier exactly like
        a fixture min_interval_ms: with delay == round length, at most
        ONE fetch per host per round (mirrors
        test_min_interval_paces_dequeues, but the interval arrives via
        the parsed sidecar instead of the politeness table)."""
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq

        from news_crawler_ray.corpus import default_corpus
        from news_crawler_ray.pipelines.crawl import (CrawlConfig,
                                                      CrawlEngine)
        corpus = default_corpus("crawltest", num_hosts=2,
                                pages_per_host=18)
        root = str(tmp_path / "delay_corpus")
        shutil.copytree(corpus.root, root)
        body = "User-agent: *\nCrawl-delay: 1\nDisallow:\n"
        pq.write_table(
            pa.table({"host": pa.array(["news-0.example",
                                        "news-1.example"], pa.string()),
                      "robots_txt": pa.array([body, body], pa.string())}),
            os.path.join(root, "robots.parquet"))

        eng = CrawlEngine(CrawlConfig(
            corpus_root=root, out_dir="/tmp/ncr_test_robots_delay",
            max_rounds=10, round_ms=1000))
        eng.run()
        order = eng.crawl_order_table().to_pandas()
        eng.shutdown()
        per_host = order.groupby("host").size()
        assert (per_host <= 10).all()
        assert len(order) > 0


class TestFrontierIntegration:
    def test_enqueue_rejections_match_stdlib(self):
        text = ("User-agent: *\nDisallow: /private/\nDisallow: /tmp\n")
        rules = parse_robots(text)
        rp = _stdlib(text)
        f = Frontier()
        f.configure_hosts(merge_robots_rows(None, ["h.example"], [text]))
        paths = ["/private/a", "/public/a", "/tmp", "/tmpx", "/t", "/"]
        urls = ["h.example" + p for p in paths]
        f.enqueue({"url": urls, "host": ["h.example"] * len(urls),
                   "is_webnews": [False] * len(urls),
                   "round_added": [0] * len(urls),
                   "seq64": list(range(len(urls))),
                   "url_to_refer": [""] * len(urls)})
        admitted = set(f.dequeue(0, max_items=100)["url"])
        for p, u in zip(paths, urls):
            expect = rp.can_fetch("x", "http://h.example" + p)
            assert rules.allows(p) == expect, p
            assert (u in admitted) == expect, p
