"""Adversarial-input robustness: the kernel and frontier must never
crash on hostile pages, and politeness is an invariant under arbitrary
op sequences (SURVEY.md §5 item 4)."""

import pytest
from hypothesis import given, settings, strategies as st

from news_crawler_ray.extract import ExtractKernel
from news_crawler_ray.state.frontier import Frontier

URL = "http://news-0.example/politica/2021/05/12/una-storia-con-molti-dettagli-del-giorno.html"


class TestKernelRobustness:
    def test_deep_nesting(self):
        html = "<div>" * 5000 + "text" + "</div>" * 5000
        r = ExtractKernel().extract(URL, html)
        assert r is not None

    def test_huge_flat(self):
        html = "<html><body>" + "<p>word</p>" * 5000 + "</body></html>"
        ExtractKernel().extract(URL, html)

    def test_unclosed_and_mismatched(self):
        ExtractKernel().extract(URL, "<div><p>a<span>b</div></p>c</span>")

    def test_empty_and_garbage(self):
        k = ExtractKernel()
        for html in ("", "<", ">", "<<<>>>", "&&&;;;", "<!DOCTYPE html>",
                     "plain text only", "<html></html>",
                     "\x00\x01binary\xff", "<a href=>x</a>"):
            k.extract(URL, html)

    @settings(max_examples=60, deadline=None)
    @given(st.text(max_size=400))
    def test_fuzz_never_raises(self, html):
        ExtractKernel().extract(URL, html)

    @settings(max_examples=40, deadline=None)
    @given(st.text(alphabet="<>/ab ='\"&#;", max_size=300))
    def test_fuzz_markup_soup(self, html):
        ExtractKernel().extract(URL, html)


@st.composite
def frontier_ops(draw):
    n = draw(st.integers(1, 40))
    ops = []
    for i in range(n):
        kind = draw(st.sampled_from(["enq", "deq", "complete_all"]))
        ops.append((kind, draw(st.integers(0, 2))))
    return ops


class TestPolitenessInvariant:
    @settings(max_examples=40, deadline=None)
    @given(frontier_ops(), st.integers(1, 4))
    def test_in_flight_never_exceeds_budget(self, ops, budget):
        f = Frontier()
        hosts = [f"h{k}.example" for k in range(3)]
        f.configure_hosts({"host": hosts, "max_in_flight": [budget] * 3,
                           "min_interval_ms": [0] * 3, "max_attempts": [2] * 3})
        outstanding: list[dict] = []
        seq = 0
        for kind, hk in ops:
            host = hosts[hk]
            if kind == "enq":
                f.enqueue({"url": [f"{host}/p/{seq}"], "host": [host],
                           "is_webnews": [seq % 2 == 0], "round_added": [0],
                           "seq64": [seq], "url_to_refer": [""]})
                seq += 1
            elif kind == "deq":
                out = f.dequeue(0, max_items=50)
                for i in range(len(out["url"])):
                    outstanding.append({k: out[k][i] for k in out})
                per_host: dict[str, int] = {}
                for w in outstanding:
                    per_host[w["host"]] = per_host.get(w["host"], 0) + 1
                for h, cnt in per_host.items():
                    assert cnt <= budget, (h, cnt, budget)
            else:
                if outstanding:
                    f.complete({
                        "url": [w["url"] for w in outstanding],
                        "host": [w["host"] for w in outstanding],
                        "ok": [True] * len(outstanding),
                        "attempts": [w["attempts"] for w in outstanding],
                        "is_webnews": [w["is_webnews"] for w in outstanding],
                        "round_added": [w["round_added"] for w in outstanding],
                        "seq64": [w["seq64"] for w in outstanding],
                        "url_to_refer": [w["url_to_refer"] for w in outstanding],
                    })
                    outstanding = []
        assert f.in_flight_count() == len(outstanding)


class TestRayInternalsPatchGuard:
    """The PandasBlockAccessor.to_arrow re-wrap (rayutil.py) is coupled
    to Ray internals; it must APPLY on the vetted Ray and FAIL LOUDLY
    (not silently mispatch) on any other version."""

    def test_patch_applied_on_vetted_ray(self):
        import ray
        from ray.data._internal.pandas_block import PandasBlockAccessor

        from news_crawler_ray.rayutil import _VETTED_RAY
        assert any(ray.__version__.startswith(v) for v in _VETTED_RAY)
        # package import installed it (idempotently re-installable)
        assert getattr(PandasBlockAccessor.to_arrow, "_ncr_nometa", False)
        from news_crawler_ray.rayutil import \
            install_pandas_block_metadata_strip
        install_pandas_block_metadata_strip()   # second call: no-op
        assert getattr(PandasBlockAccessor.to_arrow, "_ncr_nometa", False)

    def test_patch_refuses_unvetted_ray(self, monkeypatch):
        import ray

        from news_crawler_ray.rayutil import \
            install_pandas_block_metadata_strip

        monkeypatch.setattr(ray, "__version__", "99.0.0")
        with pytest.raises(RuntimeError, match="not a vetted version"):
            install_pandas_block_metadata_strip()
