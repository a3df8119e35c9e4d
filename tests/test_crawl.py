"""Distributed crawl engine vs single-process oracle conformance
(SURVEY.md §5 items 1, 3, 4): per-host crawl order, URL-seen membership,
byte-identical text, retry/redirect status columns, resume-equivalence."""

import os

import pandas as pd
import pyarrow.dataset as pads
import pytest

import ray

from news_crawler_ray.corpus import default_corpus
from news_crawler_ray.oracle import crawl_oracle
from news_crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine


@pytest.fixture(scope="module")
def corpus():
    return default_corpus("crawltest", num_hosts=2, pages_per_host=18)


@pytest.fixture(scope="module")
def oracle_result(corpus):
    return crawl_oracle(corpus.root)


@pytest.fixture(scope="module")
def engine_result(ray_session, corpus):
    cfg = CrawlConfig(corpus_root=corpus.root,
                      out_dir="/tmp/ncr_test_crawl_engine")
    eng = CrawlEngine(cfg)
    summary = eng.run()
    pages = eng.pages_dataset().to_pandas()
    order = eng.crawl_order_table().to_pandas()
    eng.shutdown()
    return {"summary": summary, "pages": pages, "order": order}


@pytest.fixture(scope="module")
def engine_result_overlap(ray_session, corpus):
    """Bench-style config: checkpointing effectively off, so run()
    pre-submits round N+1's dequeue while round N's tail (finalize +
    parquet sink + order-log write) runs — the overlap path."""
    cfg = CrawlConfig(corpus_root=corpus.root,
                      out_dir="/tmp/ncr_test_crawl_overlap",
                      checkpoint_every=10**9)
    eng = CrawlEngine(cfg)
    summary = eng.run()
    pages = eng.pages_dataset().to_pandas()
    order = eng.crawl_order_table().to_pandas()
    eng.shutdown()
    return {"summary": summary, "pages": pages, "order": order}


class TestOverlapConformance:
    """The dequeue-overlap fast path must reproduce the serial goldens:
    same page-url set, same per-host crawl order, same seen count."""

    def test_same_pages(self, engine_result_overlap, oracle_result):
        r = engine_result_overlap
        assert r["summary"]["seen_total"] == oracle_result["seen_count"]
        assert set(r["pages"]["url"]) == \
            set(oracle_result["pages"]["url"].to_pylist())

    def test_same_per_host_order(self, engine_result_overlap,
                                 oracle_result):
        eng = engine_result_overlap["order"]
        ora = oracle_result["order"].to_pandas()
        for host in sorted(ora["host"].unique()):
            e = eng[eng.host == host].sort_values("host_seq")
            o = ora[ora.host == host].sort_values("host_seq")
            assert list(e["url"]) == list(o["url"]), host
            assert list(e["priority_tier"]) == \
                list(o["priority_tier"]), host


class TestConformance:
    def test_seen_membership(self, engine_result, oracle_result):
        assert engine_result["summary"]["seen_total"] == \
            oracle_result["seen_count"]
        eng_urls = set(engine_result["pages"]["url"])
        ora_urls = set(oracle_result["pages"]["url"].to_pylist())
        assert eng_urls == ora_urls

    def test_per_host_crawl_order(self, engine_result, oracle_result):
        eng = engine_result["order"]
        ora = oracle_result["order"].to_pandas()
        for host in sorted(ora["host"].unique()):
            e = eng[eng.host == host].sort_values("host_seq")
            o = ora[ora.host == host].sort_values("host_seq")
            assert list(e["url"]) == list(o["url"]), host
            assert list(e["priority_tier"]) == list(o["priority_tier"]), host

    def test_page_rows_match_oracle(self, engine_result, oracle_result):
        cols = ["url", "scraped", "attempts_count", "http_response_code",
                "language", "url_to_refer", "is_webnews", "title_art",
                "text_art", "publish_date", "error_text"]
        e = engine_result["pages"][cols].sort_values("url").reset_index(drop=True)
        o = oracle_result["pages"].to_pandas()[cols].sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(e, o)

    def test_text_byte_identical_vs_corpus(self, engine_result, corpus):
        t = pads.dataset(corpus.pages_dir, partitioning="hive").to_table()
        golden = {u.split("://", 1)[1].rstrip("/"): txt
                  for u, txt in zip(t["url"].to_pylist(), t["text"].to_pylist())}
        pages = engine_result["pages"]
        checked = 0
        for _, row in pages.iterrows():
            if row["http_response_code"] == 200 and row["text_art"]:
                assert golden.get(row["url"]) == row["text_art"], row["url"]
                checked += 1
        assert checked > 10

    def test_full_corpus_coverage(self, engine_result, corpus):
        # every corpus page is reachable from the seeds by construction —
        # the crawl must visit all of them (catches silent fetch misses)
        t = pads.dataset(corpus.pages_dir, partitioning="hive").to_table()
        corpus_urls = {u.split("://", 1)[1].rstrip("/")
                       for u in t["url"].to_pylist()}
        crawled = set(engine_result["pages"]["url"])
        missing = corpus_urls - crawled
        assert not missing, sorted(missing)[:5]

    def test_status_mix(self, engine_result):
        codes = set(engine_result["pages"]["http_response_code"])
        assert 200 in codes
        assert 301 in codes     # redirects recorded as alias rows
        assert -1 in codes      # exhausted retries (crawler.py:405-417)
        assert codes & {404, 500}

    def test_redirect_alias_rows(self, engine_result):
        p = engine_result["pages"]
        aliases = p[p.http_response_code == 301]
        assert (aliases["url_to_refer"].notna()).all()
        # each redirect target was itself crawled
        urls = set(p["url"])
        assert set(aliases["url_to_refer"]) <= urls

    def test_webnews_tier_priority(self, engine_result):
        # within each host, the first dequeues after the seed hub are
        # tier-0 articles (webnews first — datacollector.py:171-177)
        order = engine_result["order"]
        for host, g in order.groupby("host"):
            g = g.sort_values("host_seq")
            tiers = list(g["priority_tier"])
            # seed hub is tier 1; afterwards all tier-0 items of a round
            # precede tier-1 items of the same round — spot-check that the
            # overall sequence isn't sorted the wrong way
            assert tiers[0] == 1
            assert 0 in tiers


class TestOnlyWebnews:
    def test_only_news_urls_crawled(self, ray_session, corpus):
        # reference CrawlerManager(only_webnews=...) knob: non-news
        # discoveries are not enqueued
        cfg = CrawlConfig(corpus_root=corpus.root,
                          out_dir="/tmp/ncr_test_crawl_newsonly",
                          only_webnews=True)
        eng = CrawlEngine(cfg)
        eng.run()
        pages = eng.pages_dataset().to_pandas()
        eng.shutdown()
        # seeds bypass the only_webnews filter: the hub-0 seeds plus the
        # redirect-resolved seed (hub-1 on host 1, corpus.py S2 fixture)
        non_seed = pages[~pages["url"].str.contains("hub-")]
        assert len(non_seed) > 0
        assert non_seed["is_webnews"].all()


class TestDeterminism:
    def test_rerun_identical(self, ray_session, corpus, engine_result):
        cfg = CrawlConfig(corpus_root=corpus.root,
                          out_dir="/tmp/ncr_test_crawl_engine2")
        eng = CrawlEngine(cfg)
        eng.run()
        order2 = eng.crawl_order_table().to_pandas()
        eng.shutdown()
        pd.testing.assert_frame_equal(
            engine_result["order"].sort_values(["host", "host_seq"]).reset_index(drop=True),
            order2.sort_values(["host", "host_seq"]).reset_index(drop=True))


class TestPolitenessInterval:
    def test_min_interval_paces_dequeues(self, ray_session, corpus, tmp_path):
        # copy corpus, set min_interval_ms = round_ms → at most ONE fetch
        # per host per round
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq
        root = str(tmp_path / "paced")
        shutil.copytree(corpus.root, root)
        pol = pq.read_table(os.path.join(root, "politeness.parquet")).to_pydict()
        pol["min_interval_ms"] = [1000] * len(pol["host"])
        pq.write_table(pa.table(pol), os.path.join(root, "politeness.parquet"))

        cfg = CrawlConfig(corpus_root=root, out_dir="/tmp/ncr_test_paced",
                          max_rounds=12, round_ms=1000)
        eng = CrawlEngine(cfg)
        eng.run()
        order = eng.crawl_order_table().to_pandas()
        eng.shutdown()
        # ≤ 1 dequeue per host per round ⇒ after 12 rounds each host has
        # at most 12 dequeues
        per_host = order.groupby("host").size()
        assert (per_host <= 12).all()
        assert len(order) > 0


class TestEmptySeeds:
    def test_no_seeds_terminates(self, ray_session, corpus, tmp_path):
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq
        root = str(tmp_path / "noseeds")
        shutil.copytree(corpus.root, root)
        pq.write_table(pa.table({"url": pa.array([], pa.string()),
                                 "seq": pa.array([], pa.int64())}),
                       os.path.join(root, "seeds.parquet"))
        eng = CrawlEngine(CrawlConfig(corpus_root=root,
                                      out_dir="/tmp/ncr_test_noseeds"))
        summary = eng.run()
        eng.shutdown()
        assert summary["pages_written"] == 0 and summary["rounds"] == 0


class TestResume:
    def test_resume_equivalent_to_uninterrupted(self, ray_session, corpus,
                                                engine_result):
        out = "/tmp/ncr_test_crawl_resume"
        cfg = CrawlConfig(corpus_root=corpus.root, out_dir=out, max_rounds=3)
        eng = CrawlEngine(cfg)
        eng.run()   # stops after 3 rounds (checkpointed every round)
        eng.shutdown()
        assert os.path.exists(os.path.join(out, "checkpoint", "manifest.json"))

        cfg2 = CrawlConfig(corpus_root=corpus.root, out_dir=out)
        eng2 = CrawlEngine(cfg2, resume=True)
        eng2.run()
        pages = eng2.pages_dataset().to_pandas()
        order = eng2.crawl_order_table().to_pandas()
        eng2.shutdown()

        base_pages = engine_result["pages"]
        assert set(pages["url"]) == set(base_pages["url"])
        pd.testing.assert_frame_equal(
            engine_result["order"].sort_values(["host", "host_seq"]).reset_index(drop=True),
            order.sort_values(["host", "host_seq"]).reset_index(drop=True))

    def test_resume_replays_uncheckpointed_round(self, ray_session, corpus,
                                                 engine_result):
        # checkpoint every 2 rounds, stop after 5: round 4 ran but was
        # not checkpointed → resume must drop and replay it exactly
        out = "/tmp/ncr_test_crawl_resume2"
        cfg = CrawlConfig(corpus_root=corpus.root, out_dir=out,
                          max_rounds=5, checkpoint_every=2)
        eng = CrawlEngine(cfg)
        eng.run()
        eng.shutdown()
        import json
        with open(os.path.join(out, "checkpoint", "manifest.json")) as f:
            done_round = json.load(f)["round"]
        assert done_round == 3   # checkpoints fire after rounds 1 and 3
        assert os.path.isdir(os.path.join(out, "pages", "round=4"))

        eng2 = CrawlEngine(CrawlConfig(corpus_root=corpus.root, out_dir=out,
                                       checkpoint_every=2), resume=True)
        eng2.run()
        pages = eng2.pages_dataset().to_pandas()
        order = eng2.crawl_order_table().to_pandas()
        eng2.shutdown()
        assert set(pages["url"]) == set(engine_result["pages"]["url"])
        pd.testing.assert_frame_equal(
            engine_result["order"].sort_values(["host", "host_seq"]).reset_index(drop=True),
            order.sort_values(["host", "host_seq"]).reset_index(drop=True))


class TestAdviceR1Fixes:
    """Regression tests for the three ADVICE r1 crawl findings."""

    def test_max_attempts_3_engine_equals_oracle(self, ray_session, corpus,
                                                 tmp_path):
        # ADVICE item 1: cfg.max_attempts != 2 used to desynchronize the
        # frontier requeue gate (hardcoded 2) from the finalize gate.
        # The politeness table's per-host max_attempts (2) outranks the
        # config default, so drop that column to exercise the default.
        import shutil

        import pyarrow.parquet as pq
        root = str(tmp_path / "att3")
        shutil.copytree(corpus.root, root)
        pol = pq.read_table(os.path.join(root, "politeness.parquet"))
        pq.write_table(pol.drop_columns(["max_attempts"]),
                       os.path.join(root, "politeness.parquet"))
        cfg = CrawlConfig(corpus_root=root,
                          out_dir="/tmp/ncr_test_crawl_att3",
                          max_attempts=3)
        eng = CrawlEngine(cfg)
        eng.run()
        pages = eng.pages_dataset().to_pandas()
        order = eng.crawl_order_table().to_pandas()
        eng.shutdown()
        ora = crawl_oracle(root, max_attempts=3)
        cols = ["url", "scraped", "attempts_count", "http_response_code",
                "error_text"]
        pd.testing.assert_frame_equal(
            pages[cols].sort_values("url").reset_index(drop=True),
            ora["pages"].to_pandas()[cols].sort_values("url")
            .reset_index(drop=True))
        # terminal fetch failures carry attempts_count == 3 now
        failed = pages[pages.http_response_code == -1]
        assert len(failed) > 0 and (failed["attempts_count"] == 3).all()
        # every url appears at most max_attempts times in the dequeue log
        assert order.groupby("url").size().max() <= 3
        # order parity too
        o = ora["order"].to_pandas()
        pd.testing.assert_frame_equal(
            order.sort_values(["host", "host_seq"]).reset_index(drop=True),
            o.sort_values(["host", "host_seq"]).reset_index(drop=True))

    def test_cross_host_seed_redirect_resolved(self, engine_result, corpus):
        # ADVICE item 2: the corpus seeds an alias on news-0.example that
        # 301s to news-1.example's hub-1; resolution must route the
        # RESOLVED url to the resolved host, making hub-1 the second
        # dequeue on news-1.example (seeded, not a late discovery)
        order = engine_result["order"]
        h1 = order[order.host == "news-1.example"].sort_values("host_seq")
        urls = list(h1["url"])
        assert urls[0].endswith("hub-0.html")
        assert urls[1].endswith("hub-1.html"), urls[:3]
        # the alias itself is never fetched (it has no page row)
        assert not engine_result["pages"]["url"].str.contains(
            "seed/landing").any()

    def test_charset_mime_not_extracted(self, engine_result):
        # ADVICE item 4: exact mime equality (crawler.py:133) — the
        # charset-suffixed article is scraped but NOT article-extracted
        p = engine_result["pages"]
        row = p[p["url"].str.contains("misc/charset-note")]
        assert len(row) == 1
        row = row.iloc[0]
        assert row["scraped"] and row["http_response_code"] == 200
        assert row["mime_type"] == "text/html; charset=utf-8"
        assert row["text_art"] is None or row["text_art"] == ""

    def test_resolve_chain_cross_host(self, corpus):
        from news_crawler_ray.stages.fetch import _CorpusStore
        from news_crawler_ray import urlnorm
        store = _CorpusStore(corpus.pages_dir, corpus.fetchmeta)
        got = store.resolve_chain(
            urlnorm.canonical_url("http://news-0.example/seed/landing.html"))
        assert got == "news-1.example/economia/hub-1.html"


class TestDatasetModeResume:
    def test_resume_dataset_mode_equivalent(self, ray_session, corpus,
                                            engine_result):
        # dataset-mode rounds write multi-part round dirs via the
        # streaming sink; the checkpoint/resume contract must hold
        # exactly as in tasks mode
        out = "/tmp/ncr_test_crawl_resume_ds"
        cfg = CrawlConfig(corpus_root=corpus.root, out_dir=out,
                          max_rounds=3, round_engine="dataset")
        eng = CrawlEngine(cfg)
        eng.run()
        eng.shutdown()

        eng2 = CrawlEngine(CrawlConfig(corpus_root=corpus.root, out_dir=out,
                                       round_engine="dataset"), resume=True)
        eng2.run()
        pages = eng2.pages_dataset().to_pandas()
        order = eng2.crawl_order_table().to_pandas()
        eng2.shutdown()
        assert set(pages["url"]) == set(engine_result["pages"]["url"])
        pd.testing.assert_frame_equal(
            engine_result["order"].sort_values(["host", "host_seq"])
            .reset_index(drop=True),
            order.sort_values(["host", "host_seq"]).reset_index(drop=True))


class TestUserExtensionHooks:
    """SURVEY §2.10 parity: end_function (crawler.py:22) and the
    Article.additional_data analog (article.py:113)."""

    @pytest.mark.parametrize("mode", ["tasks", "dataset"])
    def test_hooks_in_both_engines(self, ray_session, corpus, mode):
        import json
        calls = []
        # lambda: cloudpickle serializes it by VALUE — a module-level
        # function in a test file pickles by reference and the workers
        # cannot import the test module
        cfg = CrawlConfig(corpus_root=corpus.root,
                          out_dir=f"/tmp/ncr_test_hooks_{mode}",
                          round_engine=mode,
                          end_function=calls.append,
                          additional_data_fn=lambda r: {
                              "text_len": len(r.get("text_art") or "")})
        eng = CrawlEngine(cfg)
        summary = eng.run()
        pages = eng.pages_dataset().to_pandas()
        eng.shutdown()
        # end_function: called exactly once, with the run summary
        assert calls == [summary]
        # additional_data: persisted JSON column, correct per row
        assert "additional_data" in pages.columns
        for _, r in pages.sample(n=min(20, len(pages)),
                                 random_state=7).iterrows():
            assert json.loads(r["additional_data"]) == \
                {"text_len": len(r["text_art"] or "")}

    def test_hooks_off_leave_schema_unchanged(self, engine_result):
        assert "additional_data" not in engine_result["pages"].columns


class TestPageSinkBackend:
    """Swappable storage backend (AbstractDataCollector analog,
    abstract_datacollector.py:5-53): a custom sink receives every
    round's finalized page table; nothing is written to the default
    parquet layout."""

    @pytest.mark.parametrize("mode", ["tasks", "dataset"])
    def test_custom_sink_receives_all_pages(self, ray_session, corpus,
                                            mode, oracle_result):
        got = []
        cfg = CrawlConfig(corpus_root=corpus.root,
                          out_dir=f"/tmp/ncr_test_sink_{mode}",
                          round_engine=mode,
                          page_sink_fn=lambda t, d: got.append(t))
        eng = CrawlEngine(cfg)
        eng.run()
        eng.shutdown()
        import pyarrow as pa
        all_pages = pa.concat_tables(got)
        assert set(all_pages["url"].to_pylist()) == \
            set(oracle_result["pages"]["url"].to_pylist())
        # default parquet layout untouched
        pages_dir = f"/tmp/ncr_test_sink_{mode}/pages"
        assert not any(f.endswith(".parquet")
                       for root, _, files in os.walk(pages_dir)
                       for f in files)
