"""Cuckoo filter tests (north_star seen-set structure)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from news_crawler_ray.state.cuckoo import CuckooFilter
from news_crawler_ray.state.seen import SeenSet
from news_crawler_ray.urlnorm import url_key


def keys(n, tag="k"):
    return [url_key(f"http://h.example/{tag}/{i}") for i in range(n)]


class TestCuckooFilter:
    def test_no_false_negatives(self):
        cf = CuckooFilter(capacity=10_000)
        ks = keys(8000)
        for k in ks:
            assert cf.add(k)
        assert all(cf.contains(k) for k in ks)
        assert cf.might_contain_many(ks).all()

    def test_low_false_positive_rate(self):
        cf = CuckooFilter(capacity=10_000)
        for k in keys(8000):
            cf.add(k)
        other = keys(8000, "other")
        fp = cf.might_contain_many(other).mean()
        assert fp < 0.02   # 16-bit fingerprints

    def test_delete(self):
        cf = CuckooFilter(capacity=1024)
        ks = keys(100)
        for k in ks:
            cf.add(k)
        assert cf.delete(ks[0])
        assert not cf.delete(url_key("http://h.example/never/added"))
        assert cf.count == 99

    def test_saturation_flag(self):
        cf = CuckooFilter(capacity=64, max_kicks=16)
        ok = True
        for k in keys(5000):
            ok = cf.add(k)
            if not ok:
                break
        assert not ok and cf.saturated

    def test_deterministic(self):
        a, b = CuckooFilter(1024), CuckooFilter(1024)
        for k in keys(900):
            a.add(k)
            b.add(k)
        assert (a.table == b.table).all()

    @settings(max_examples=20, deadline=None)
    @given(st.lists(st.integers(0, 200), min_size=1, max_size=100))
    def test_vectorized_matches_scalar(self, ids):
        cf = CuckooFilter(2048)
        ks = [url_key(f"http://h.example/p/{i}") for i in set(ids)]
        for k in ks:
            cf.add(k)
        probe = [url_key(f"http://h.example/p/{i}") for i in range(250)]
        vec = cf.might_contain_many(probe)
        assert [cf.contains(k) for k in probe] == list(vec)


class TestSeenSetCuckoo:
    def test_cuckoo_backend_membership(self):
        s = SeenSet(filter_kind="cuckoo")
        ks = keys(1000)
        assert s.add_if_absent(ks) == [True] * 1000
        assert s.add_if_absent(ks) == [False] * 1000

    def test_saturated_filter_still_exact(self):
        s = SeenSet(capacity=64, filter_kind="cuckoo")
        s.cuckoo.max_kicks = 8
        ks = keys(3000)
        s.add_if_absent(ks)
        # even saturated, membership stays exact via the sidecar
        assert s.add_if_absent(ks[:50]) == [False] * 50
        assert s.count() == 3000
