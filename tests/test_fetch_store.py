"""Shared-object-store fetch path: the directory-precomputed ``canon``
index column (stages/fetch.py `_with_canon_column`) must yield lookups
identical to the per-worker `_CorpusStore` dict path — same found set,
same payloads, same fetchmeta resolution — since the crawl round loop
uses the shared path and the seed resolver uses the store path against
the SAME corpus."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from news_crawler_ray.corpus import default_corpus, host_bucket
from news_crawler_ray.stages.fetch import (_CorpusStore, _SharedIndex,
                                           fetch_replay_shared,
                                           put_corpus_refs)


@pytest.fixture(scope="module")
def corpus():
    return default_corpus("fetchstore", num_hosts=2, pages_per_host=12)


@pytest.fixture(scope="module")
def refs(ray_session, corpus):
    return put_corpus_refs(os.path.join(corpus.root, "pages"),
                           os.path.join(corpus.root, "fetchmeta"))


def _store(corpus):
    return _CorpusStore(os.path.join(corpus.root, "pages"),
                        os.path.join(corpus.root, "fetchmeta"))


class TestSharedIndexParity:
    def test_bucket_tables_carry_canon(self, refs):
        import ray
        idx = _SharedIndex(refs)
        nb = refs["num_buckets"]
        seen_any = False
        for b in range(nb):
            t, _ = idx.bucket(b)
            if t is None:
                continue
            seen_any = True
            assert "canon" in t.column_names
            # every canon key resolves back to its own row
            for canon, i in list(idx.bucket(b)[1].items())[:5]:
                assert t["canon"][i].as_py() == canon
        assert seen_any

    def test_lookup_parity_with_corpus_store(self, refs, corpus):
        import pyarrow.parquet as pq
        store = _store(corpus)
        idx = _SharedIndex(refs)
        # walk every corpus page through both paths
        pages_dir = os.path.join(corpus.root, "pages")
        for part in sorted(os.listdir(pages_dir)):
            pdir = os.path.join(pages_dir, part)
            for f in sorted(os.listdir(pdir)):
                t = pq.read_table(os.path.join(pdir, f),
                                  columns=["url"])
                for u in t["url"].to_pylist():
                    from news_crawler_ray.urlnorm import (canonical_url,
                                                          host_of)
                    canon = canonical_url(u)
                    host = host_of(canon)
                    a = store.lookup(canon, host)
                    b = idx.lookup(canon, host)
                    assert a[0] and b[0], u          # both found
                    assert a[1] == b[1]              # full url
                    # store returns (url, html, lang); shared returns
                    # html at [2] — compare payload + status fields
                    assert a[2] == b[2]
                    assert a[3:] == b[3:]

    def test_miss_is_symmetric(self, refs, corpus):
        store = _store(corpus)
        idx = _SharedIndex(refs)
        miss = "http://nosuch.example.com/nope"
        a = store.lookup(miss, "nosuch.example.com")
        b = idx.lookup(miss, "nosuch.example.com")
        assert a[0] is False and b[0] is False

    def test_fetch_replay_shared_batch(self, refs, corpus):
        import pyarrow.parquet as pq
        pages_dir = os.path.join(corpus.root, "pages")
        part = sorted(os.listdir(pages_dir))[0]
        f = sorted(os.listdir(os.path.join(pages_dir, part)))[0]
        t = pq.read_table(os.path.join(pages_dir, part, f),
                          columns=["url"])
        from news_crawler_ray.urlnorm import canonical_url, host_of
        canons = [canonical_url(u) for u in t["url"].to_pylist()]
        hosts = [host_of(c) for c in canons]
        batch = pa.table({"url": pa.array(canons, pa.string()),
                          "host": pa.array(hosts, pa.string())})
        out = fetch_replay_shared(batch, corpus_refs=refs)
        assert out.num_rows == batch.num_rows
        assert all(out["found"].to_pylist())
        # found rows always carry a (possibly empty — error fixtures)
        # html payload, never a null
        assert all(h is not None for h in out["html"].to_pylist())
        assert any(len(h) > 0 for h in out["html"].to_pylist())
