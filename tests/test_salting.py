"""Skewed-host salting (north_rule): a hot host's frontier queue is
split across salted sub-shards; membership is unchanged, the aggregate
politeness budget is respected."""

import pandas as pd

from news_crawler_ray.corpus import default_corpus, host_name
from news_crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine


def run(corpus, out_dir, **kw):
    eng = CrawlEngine(CrawlConfig(corpus_root=corpus.root, out_dir=out_dir,
                                  num_frontier_shards=4, **kw))
    eng.run()
    pages = eng.pages_dataset().to_pandas()
    order = eng.crawl_order_table().to_pandas()
    eng.shutdown()
    return pages, order


class TestSalting:
    def test_salted_membership_equals_unsalted(self, ray_session):
        corpus = default_corpus("salttest", num_hosts=3, pages_per_host=18)
        hot = host_name(0)
        base_pages, _ = run(corpus, "/tmp/ncr_test_salt_base")
        salt_pages, salt_order = run(corpus, "/tmp/ncr_test_salt_salted",
                                     salt_hosts={hot: 2})
        assert set(base_pages["url"]) == set(salt_pages["url"])
        # hot-host budget share: with max_in_flight 6 split over 2 salts,
        # no round dequeues more than 6 hot-host items (sub-budgets sum
        # to at most the base budget)
        hot_rows = salt_order[salt_order.host == hot]
        assert len(hot_rows) >= 18

    def test_salted_page_rows_match(self, ray_session):
        corpus = default_corpus("salttest", num_hosts=3, pages_per_host=18)
        hot = host_name(0)
        base_pages, _ = run(corpus, "/tmp/ncr_test_salt_base2")
        salt_pages, _ = run(corpus, "/tmp/ncr_test_salt_salted2",
                            salt_hosts={hot: 3})
        cols = ["url", "scraped", "http_response_code", "text_art",
                "title_art", "is_webnews"]
        a = base_pages[cols].sort_values("url").reset_index(drop=True)
        b = salt_pages[cols].sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestSaltingDatasetMode:
    def test_salted_dataset_mode_membership(self, ray_session):
        # the task-side dataset commit routes enqueue/complete through
        # _route_shard_for with salt_hosts — membership and page rows
        # must match the unsalted tasks-mode crawl
        corpus = default_corpus("salttest", num_hosts=3, pages_per_host=18)
        hot = host_name(0)
        base_pages, _ = run(corpus, "/tmp/ncr_test_salt_ds_base")
        ds_pages, _ = run(corpus, "/tmp/ncr_test_salt_ds",
                          salt_hosts={hot: 2}, round_engine="dataset")
        cols = ["url", "scraped", "http_response_code", "text_art",
                "is_webnews"]
        a = base_pages[cols].sort_values("url").reset_index(drop=True)
        b = ds_pages[cols].sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestShufflePartitions:
    """Cluster-derived shuffle widths: the 32-CPU measured ratios must
    reproduce exactly, scale linearly with cluster CPUs, and clamp on
    both ends (tiny test sessions / aggregator-overhead ceiling)."""

    def _with_cpus(self, monkeypatch, n):
        import ray
        monkeypatch.setattr(ray, "cluster_resources",
                            lambda: {"CPU": float(n)})

    def test_measured_32cpu_ratios(self, monkeypatch):
        from news_crawler_ray.rayutil import shuffle_partitions
        self._with_cpus(monkeypatch, 32)
        assert shuffle_partitions(0.25) == 8    # join width
        assert shuffle_partitions(1.0) == 32    # verify/map width

    def test_scales_and_clamps(self, monkeypatch):
        from news_crawler_ray.rayutil import shuffle_partitions
        self._with_cpus(monkeypatch, 1024)
        assert shuffle_partitions(0.25) == 256
        assert shuffle_partitions(1.0) == 512   # hi clamp
        self._with_cpus(monkeypatch, 4)
        assert shuffle_partitions(0.25) == 4    # lo clamp
        assert shuffle_partitions(1.0) == 4

    def test_no_cluster_falls_back(self, monkeypatch):
        import ray
        from news_crawler_ray.rayutil import shuffle_partitions

        def boom():
            raise RuntimeError("no session")
        monkeypatch.setattr(ray, "cluster_resources", boom)
        assert shuffle_partitions(1.0) == 8     # 8-CPU fallback
