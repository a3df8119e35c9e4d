"""Unit + property tests for the seen-set and frontier cores (plain
objects; the Ray actor wrappers add nothing but placement)."""

import os

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from news_crawler_ray.state.frontier import Frontier
from news_crawler_ray.state.seen import BloomFilter, SeenSet
from news_crawler_ray.urlnorm import url_key


def keys_of(*urls):
    return [url_key(u) for u in urls]


class TestBloom:
    def test_no_false_negatives(self):
        bf = BloomFilter(capacity=10_000)
        keys = np.frombuffer(
            b"".join(url_key(f"http://h.example/p/{i}") for i in range(5000)),
            dtype=np.uint8).reshape(-1, 20)
        bf.add(keys)
        assert bf.might_contain(keys).all()

    def test_mostly_true_negatives(self):
        bf = BloomFilter(capacity=10_000)
        ins = np.frombuffer(b"".join(url_key(f"http://h.example/in/{i}")
                                     for i in range(5000)), np.uint8).reshape(-1, 20)
        out = np.frombuffer(b"".join(url_key(f"http://h.example/out/{i}")
                                     for i in range(5000)), np.uint8).reshape(-1, 20)
        bf.add(ins)
        fp = bf.might_contain(out).mean()
        assert fp < 0.05


class TestSeenSet:
    def test_insert_or_ignore(self):
        s = SeenSet()
        ks = keys_of("http://a.example/x", "http://a.example/y",
                     "http://a.example/x")
        assert s.add_if_absent(ks) == [True, True, False]
        assert s.add_if_absent(ks[:1]) == [False]
        assert s.count() == 2

    def test_scheme_insensitive_via_key(self):
        s = SeenSet()
        assert s.add_if_absent(keys_of("http://a.example/x")) == [True]
        assert s.add_if_absent(keys_of("https://a.example/x")) == [False]

    def test_snapshot_restore(self, tmp_path):
        s = SeenSet()
        s.add_if_absent(keys_of(*[f"http://a.example/{i}" for i in range(100)]))
        p = str(tmp_path / "seen.parquet")
        assert s.snapshot(p) == 100
        s2 = SeenSet()
        assert s2.restore(p) == 100
        assert s2.add_if_absent(keys_of("http://a.example/5")) == [False]
        assert s2.add_if_absent(keys_of("http://a.example/new/x")) == [True]

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.integers(0, 50), min_size=1, max_size=60))
    def test_membership_matches_python_set(self, ids):
        s = SeenSet()
        ref: set[int] = set()
        for i in ids:
            k = url_key(f"http://h.example/p/{i}")
            expected_new = i not in ref
            assert s.add_if_absent([k]) == [expected_new]
            ref.add(i)


def enq(frontier, urls, *, host="h.example", webnews=False, rnd=0, ref=""):
    n = len(urls)
    return frontier.enqueue({
        "url": urls, "host": [host] * n, "is_webnews": [webnews] * n,
        "round_added": [rnd] * n, "seq64": list(range(n)),
        "url_to_refer": [ref] * n,
    })


class TestFrontier:
    def test_webnews_tier_first(self):
        f = Frontier()
        enq(f, ["h.example/other1", "h.example/other2"])
        enq(f, ["h.example/news1"], webnews=True)
        out = f.dequeue(now_ms=0, max_items=10)
        assert out["url"] == ["h.example/news1", "h.example/other1",
                              "h.example/other2"]
        assert out["tier"] == [0, 1, 1]
        assert out["host_seq"] == [0, 1, 2]

    def test_politeness_budget(self):
        f = Frontier()
        f.configure_hosts({"host": ["h.example"], "max_in_flight": [2],
                           "min_interval_ms": [0], "max_attempts": [2]})
        enq(f, [f"h.example/{i}" for i in range(5)])
        out = f.dequeue(0)
        assert len(out["url"]) == 2  # budget caps in-flight
        f.complete({"url": out["url"], "host": out["host"],
                    "ok": [True, True], "attempts": out["attempts"],
                    "is_webnews": out["is_webnews"],
                    "round_added": [0, 0], "seq64": [0, 0],
                    "url_to_refer": ["", ""]})
        out2 = f.dequeue(0)
        assert len(out2["url"]) == 2

    def test_min_interval(self):
        f = Frontier()
        f.configure_hosts({"host": ["h.example"], "max_in_flight": [5],
                           "min_interval_ms": [1000], "max_attempts": [2]})
        enq(f, [f"h.example/{i}" for i in range(3)])
        assert len(f.dequeue(now_ms=0)["url"]) == 1
        assert len(f.dequeue(now_ms=500)["url"]) == 0
        assert len(f.dequeue(now_ms=1000)["url"]) == 1

    def test_lineage_order_not_arrival_order(self):
        f = Frontier()
        # arrival order B then A, but A has the smaller lineage key
        f.enqueue({"url": ["h.example/b"], "host": ["h.example"],
                   "is_webnews": [False], "round_added": [0], "seq64": [9],
                   "url_to_refer": [""]})
        f.enqueue({"url": ["h.example/a"], "host": ["h.example"],
                   "is_webnews": [False], "round_added": [0], "seq64": [1],
                   "url_to_refer": [""]})
        out = f.dequeue(0)
        assert out["url"] == ["h.example/a", "h.example/b"]

    def test_retry_budget(self):
        f = Frontier()
        enq(f, ["h.example/x"])
        out = f.dequeue(0)
        res = f.complete({"url": out["url"], "host": out["host"],
                          "ok": [False], "attempts": out["attempts"],
                          "is_webnews": out["is_webnews"],
                          "round_added": [0], "seq64": [0],
                          "url_to_refer": [""]})
        assert res["requeued"] == 1
        out2 = f.dequeue(0)
        assert out2["url"] == ["h.example/x"] and out2["attempts"] == [1]
        res2 = f.complete({"url": out2["url"], "host": out2["host"],
                           "ok": [False], "attempts": out2["attempts"],
                           "is_webnews": out2["is_webnews"],
                           "round_added": [0], "seq64": [0],
                           "url_to_refer": [""]})
        assert res2["requeued"] == 0 and res2["exhausted"] == ["h.example/x"]

    def test_robots_disallow(self):
        f = Frontier()
        f.configure_hosts({"host": ["h.example"], "max_in_flight": [6],
                           "min_interval_ms": [0], "max_attempts": [2],
                           "robots_disallow": [["/private/"]]})
        n = enq(f, ["h.example/private/x", "h.example/public/y"])
        assert n == 1 and f.robots_rejected == 1
        assert f.dequeue(0)["url"] == ["h.example/public/y"]

    def test_multi_host_sweep_deterministic(self):
        f = Frontier()
        enq(f, ["b.example/1"], host="b.example")
        enq(f, ["a.example/1"], host="a.example")
        out = f.dequeue(0)
        assert out["host"] == ["a.example", "b.example"]  # sorted sweep

    def test_snapshot_restore_roundtrip(self, tmp_path):
        f = Frontier()
        enq(f, [f"h.example/{i}" for i in range(10)])
        out = f.dequeue(0, max_items=3)
        f.complete({"url": out["url"], "host": out["host"],
                    "ok": [True] * 3, "attempts": out["attempts"],
                    "is_webnews": out["is_webnews"],
                    "round_added": [0] * 3, "seq64": [0] * 3,
                    "url_to_refer": [""] * 3})
        p = str(tmp_path / "f.parquet")
        assert f.snapshot(p) == 7
        f2 = Frontier()
        assert f2.restore(p) == 7
        # order + host_seq continue identically
        a, b = f.dequeue(0, max_items=4), f2.dequeue(0, max_items=4)
        assert a["url"] == b["url"] and a["host_seq"] == b["host_seq"]

    def test_snapshot_mid_round_asserts(self):
        f = Frontier()
        enq(f, ["h.example/x"])
        f.dequeue(0)
        with pytest.raises(AssertionError):
            f.snapshot("/tmp/should_not_exist.parquet")

    def test_order_log(self):
        f = Frontier()
        enq(f, ["h.example/n1"], webnews=True)
        enq(f, ["h.example/o1"])
        f.dequeue(0)
        log = f.drain_order_log()
        assert log["url"] == ["h.example/n1", "h.example/o1"]
        assert log["priority_tier"] == [0, 1]
        assert f.drain_order_log()["url"] == []
