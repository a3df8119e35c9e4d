"""Fetch/replay stage: frontier work items ⋈ Parquet page corpus.

Replaces the reference's live Selenium fetch (custom_webbrowser.py:78-133)
with a partition-pruned point-lookup join against the Common-Crawl-style
corpus (SURVEY.md §2.4 J4): the corpus is laid out as
``pages/host_bucket=NN/*.parquet`` (hash of host), a work batch only opens
the buckets its hosts live in, and each opened bucket is cached as a
``canonical_url → row`` dict for the lifetime of the worker.

Two equivalent forms are provided:

- :class:`FetchReplay` — callable class for ``map_batches(FetchReplay,
  concurrency=N)`` actor pools (state in ``__init__``): the bulk/streaming
  path.
- :func:`fetch_replay_batch` — plain function backed by a worker-global
  store cache, for the round loop's short-lived per-round datasets (state
  amortizes across rounds without re-creating an actor pool per round).

Scale note: at 100 TB the per-bucket dict becomes a per-bucket sorted
Parquet + row-group index; the lookup pattern (prune to bucket, then key
lookup) is unchanged. Fetch emulation metadata (HTTP status, redirects,
mime) comes from the ``fetchmeta`` sidecar (FIXTURES.md §1).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..corpus import host_bucket
from ..urlnorm import canonical_url


_META_ALL = -1   # cache key for legacy single-file fetchmeta


def _fetchmeta_bucket_files(fetchmeta_path: str, b: int) -> list[str]:
    """Parquet files of one fetchmeta host-bucket partition (or all files
    when ``fetchmeta_path`` is the legacy single file)."""
    if os.path.isdir(fetchmeta_path):
        part = os.path.join(fetchmeta_path, f"host_bucket={b}")
        if not os.path.isdir(part):
            return []
        return [os.path.join(part, f) for f in sorted(os.listdir(part))
                if f.endswith(".parquet")]
    return [fetchmeta_path]


def _load_meta_dict(files: list[str]) -> dict:
    out: dict[str, tuple] = {}
    for f in files:
        t = pq.read_table(f, columns=["url", "status", "redirect_to",
                                      "mime_type"]).to_pydict()
        for u, s, r, m in zip(t["url"], t["status"], t["redirect_to"],
                              t["mime_type"]):
            out[canonical_url(u)] = (s, r, m)
    return out


class _CorpusStore:
    """Per-worker corpus index. Pages AND fetchmeta are loaded lazily by
    host bucket (VERDICT r1 item 7: fetchmeta is corpus-sized at 10^10
    URLs, so it is partitioned ``fetchmeta/host_bucket=NN/`` exactly like
    the pages and never loaded whole; the legacy single-file layout still
    works for old fixtures)."""

    def __init__(self, pages_dir: str, fetchmeta_path: str):
        self.pages_dir = pages_dir
        self.fetchmeta_path = fetchmeta_path
        meta_path = os.path.join(os.path.dirname(pages_dir), "corpus_meta.json")
        if os.path.exists(meta_path):
            import json
            with open(meta_path) as f:
                self.num_buckets = json.load(f)["num_buckets"]
        else:
            # fallback: infer from the highest present partition id
            self.num_buckets = 1 + max(
                (int(d.split("=")[1]) for d in os.listdir(pages_dir)
                 if d.startswith("host_bucket=")), default=0)
        self._meta: dict[int, dict] = {}
        self._buckets: dict[int, dict] = {}

    def meta_for_host(self, host: str) -> dict:
        key = (host_bucket(host, self.num_buckets)
               if os.path.isdir(self.fetchmeta_path) else _META_ALL)
        m = self._meta.get(key)
        if m is None:
            m = self._meta[key] = _load_meta_dict(
                _fetchmeta_bucket_files(self.fetchmeta_path, key))
        return m

    def bucket_for_host(self, host: str) -> dict:
        b = host_bucket(host, self.num_buckets)
        store = self._buckets.get(b)
        if store is None:
            part = os.path.join(self.pages_dir, f"host_bucket={b}")
            store = {}
            if os.path.isdir(part):
                for f in sorted(os.listdir(part)):
                    if f.endswith(".parquet"):
                        t = pq.read_table(os.path.join(part, f)).to_pydict()
                        for u, h, txt, lg in zip(t["url"], t["html"],
                                                 t["text"], t["lang"]):
                            store[canonical_url(u)] = (u, h, lg)
            self._buckets[b] = store
        return store

    def lookup(self, canon: str, host: str):
        """→ (found, full_url, html, lang, status, redirect_to, mime)."""
        row = self.bucket_for_host(host).get(canon)
        if row is None:
            return False, None, b"", None, 0, None, None
        status, redirect_to, mime = self.meta_for_host(host).get(
            canon, (200, None, "text/html"))
        return True, row[0], row[1], row[2], status, \
            (canonical_url(redirect_to) if redirect_to else None), mime

    def resolve_chain(self, canon: str, max_hops: int = 5) -> str:
        """S2 seed redirect resolution (utils.py:254-261, main.py:10-13):
        follow the fetchmeta redirect chain ≤ ``max_hops``, loading only
        the buckets the chain's hosts live in. Hops may cross hosts."""
        from ..urlnorm import host_of
        for _ in range(max_hops):
            rec = self.meta_for_host(host_of(canon)).get(canon)
            if rec is None or not (300 <= rec[0] < 400) or not rec[1]:
                return canon
            canon = canonical_url(rec[1])
        return canon


_WORKER_STORES: dict[tuple, _CorpusStore] = {}


def _get_store(pages_dir: str, fetchmeta_path: str) -> _CorpusStore:
    key = (pages_dir, fetchmeta_path)
    store = _WORKER_STORES.get(key)
    if store is None:
        store = _WORKER_STORES[key] = _CorpusStore(pages_dir, fetchmeta_path)
    return store


def _replay(store: _CorpusStore, batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    hosts = batch["host"].to_pylist()
    found, full, html, lang = [], [], [], []
    status, redirect, mime = [], [], []
    for u, h in zip(urls, hosts):
        f, fu, ht, lg, st, rd, mm = store.lookup(u, h)
        found.append(f)
        full.append(fu)
        html.append(ht)
        lang.append(lg)
        status.append(st)
        redirect.append(rd)
        mime.append(mm)
    return (batch
            .append_column("found", pa.array(found, pa.bool_()))
            .append_column("full_url", pa.array(full, pa.string()))
            .append_column("html", pa.array(html, pa.binary()))
            .append_column("lang", pa.array(lang, pa.string()))
            .append_column("status", pa.array(status, pa.int32()))
            .append_column("redirect_to", pa.array(redirect, pa.string()))
            .append_column("mime_type", pa.array(mime, pa.string())))


# ---------------------------------------------------------------------------
# Shared-object-store replay path (used by the crawl round loop)
#
# The dict-per-worker store above costs every worker a full parse+build of
# every bucket it touches. For the round loop, the driver instead
# ``ray.put``s each bucket's Arrow table ONCE (zero-copy reads from the
# object store for every worker on the node); workers build only a small
# canon→row-index dict per bucket, lazily. On a multi-node cluster the
# equivalent is locality-aware bucket ownership (one fetch actor per
# bucket group); the lookup pattern is identical.
# ---------------------------------------------------------------------------

def _corpus_num_buckets(pages_dir: str) -> int:
    meta_path = os.path.join(os.path.dirname(pages_dir), "corpus_meta.json")
    if os.path.exists(meta_path):
        import json
        with open(meta_path) as f:
            return json.load(f)["num_buckets"]
    return 1 + max((int(d.split("=")[1]) for d in os.listdir(pages_dir)
                    if d.startswith("host_bucket=")), default=0)


def _load_bucket_table(pages_dir: str, b: int) -> pa.Table | None:
    part = os.path.join(pages_dir, f"host_bucket={b}")
    if not os.path.isdir(part):
        return None
    tables = [pq.read_table(os.path.join(part, f))
              for f in sorted(os.listdir(part)) if f.endswith(".parquet")]
    return pa.concat_tables(tables) if tables else None


def _load_bucket_with_canon(pages_dir: str, b: int) -> pa.Table | None:
    """Task body: load one pages bucket partition and precompute canon.
    Runs as a plain Ray task so cold-start bucket loads parallelize
    across the cluster instead of serializing through the directory
    actor (measured: serial loads stalled the first wave ~5-10 s)."""
    t = _load_bucket_table(pages_dir, b)
    return _with_canon_column(t) if t is not None else None


def _load_meta_with_canon(fetchmeta_path: str, b: int) -> pa.Table | None:
    files = _fetchmeta_bucket_files(fetchmeta_path, b)
    if not files:
        return None
    t = pa.concat_tables([pq.read_table(f) for f in files])
    return _with_canon_column(t)


def _with_canon_column(t: pa.Table) -> pa.Table:
    """Append a precomputed ``canon`` (canonical_url of ``url``) column.

    Canonicalization is the expensive part of a worker-side key-index
    build (measured ~20 µs/url → 170-600 ms per bucket); computing it
    ONCE here, before the table enters the object store, turns every
    per-(worker, bucket) index build into a plain dict(zip(...)) over
    shared Arrow columns (~2 ms). Without this, a 64-task wave re-paid
    ~35 cold index builds per round — 99% of measured fetch-stage time.
    At 100 TB scale the same column is materialized at corpus-ingest
    time instead (one pass, amortized over every crawl)."""
    return t.append_column(
        "canon", pa.array([canonical_url(u)
                           for u in t["url"].to_pylist()], pa.string()))


class _CorpusDirectory:
    """Named actor: loads bucket partitions into the object store ON
    DEMAND and hands out the refs. The working set is the buckets the
    crawl actually touches, not the whole corpus — the behavior a 100 TB
    corpus requires (multi-node: one directory per node / bucket group
    with locality-aware placement)."""

    def __init__(self, pages_dir: str, fetchmeta_path: str):
        import uuid
        self.pages_dir = pages_dir
        self.fetchmeta_path = fetchmeta_path
        self._refs: dict[int, object] = {}
        self._meta_refs: dict[int, object] = {}
        self.num_buckets = _corpus_num_buckets(pages_dir)
        self.token = uuid.uuid4().hex   # worker-side cache key

    def describe(self):
        return {"num_buckets": self.num_buckets, "token": self.token}

    def get_bucket(self, b: int):
        """→ ObjectRef resolving to the bucket's Arrow table (with the
        precomputed ``canon`` column) or to None for an absent partition.
        The load runs as a detached Ray task: concurrent cold requests
        for different buckets parallelize, and this actor stays a pure
        metadata server (never holds page payloads)."""
        import ray
        if b not in self._refs:
            self._refs[b] = ray.remote(_load_bucket_with_canon) \
                .remote(self.pages_dir, b)
        return self._refs[b]

    def get_meta(self, b: int):
        """Fetchmeta partition for bucket ``b``, shared via the object
        store like the pages buckets (legacy single-file fetchmeta loads
        once under one key)."""
        import ray
        if not os.path.isdir(self.fetchmeta_path):
            b = _META_ALL
        if b not in self._meta_refs:
            self._meta_refs[b] = ray.remote(_load_meta_with_canon) \
                .remote(self.fetchmeta_path, b)
        return self._meta_refs[b]


def put_corpus_refs(pages_dir: str, fetchmeta_path: str) -> dict:
    """Driver-side: start the corpus directory actor; buckets load
    lazily on first touch (bounded working set at any corpus size)."""
    import ray
    directory = ray.remote(num_cpus=0.1)(_CorpusDirectory).remote(
        pages_dir, fetchmeta_path)
    desc = ray.get(directory.describe.remote())
    return {"directory": directory, "token": desc["token"],
            "num_buckets": desc["num_buckets"]}


class _SharedIndex:
    """Per-worker lazy index over the shared corpus tables. Pages AND
    fetchmeta partitions load per host bucket on first touch — the
    working set is the buckets this worker's batches actually hit."""

    def __init__(self, refs: dict):
        self.refs = refs
        self._bucket_idx: dict[int, tuple] = {}
        self._meta_idx: dict[int, dict] = {}

    def meta(self, b: int) -> dict:
        m = self._meta_idx.get(b)
        if m is None:
            import ray
            ref = ray.get(self.refs["directory"].get_meta.remote(b))
            t = ray.get(ref) if ref is not None else None
            if t is None:
                m = {}
            else:
                # key on the directory-precomputed canon column (see
                # _with_canon_column) — the zip/dict build is the only
                # per-worker cost left
                m = dict(zip(t["canon"].to_pylist(),
                             zip(t["status"].to_pylist(),
                                 t["redirect_to"].to_pylist(),
                                 t["mime_type"].to_pylist())))
            self._meta_idx[b] = m
        return m

    def bucket(self, b: int):
        entry = self._bucket_idx.get(b)
        if entry is None:
            import ray
            ref = ray.get(self.refs["directory"].get_bucket.remote(b))
            t = ray.get(ref) if ref is not None else None
            if t is None:
                entry = (None, {})
            else:
                idx = dict(zip(t["canon"].to_pylist(), range(t.num_rows)))
                entry = (t, idx)
            self._bucket_idx[b] = entry
        return entry

    def lookup(self, canon: str, host: str):
        b = host_bucket(host, self.refs["num_buckets"])
        t, idx = self.bucket(b)
        i = idx.get(canon)
        if i is None:
            return False, None, b"", None, 0, None, None
        status, redirect_to, mime = self.meta(b).get(
            canon, (200, None, "text/html"))
        return (True, t["url"][i].as_py(), t["html"][i].as_py(),
                t["lang"][i].as_py(), status,
                canonical_url(redirect_to) if redirect_to else None, mime)


_WORKER_SHARED: dict[str, _SharedIndex] = {}


def fetch_replay_shared(batch: pa.Table, *, corpus_refs: dict) -> pa.Table:
    """Round-loop replay against the shared-object-store corpus."""
    key = corpus_refs["token"]   # stable across task deserializations
    shared = _WORKER_SHARED.get(key)
    if shared is None:
        shared = _WORKER_SHARED[key] = _SharedIndex(corpus_refs)
    urls = batch["url"].to_pylist()
    hosts = batch["host"].to_pylist()
    found, full, html, lang = [], [], [], []
    status, redirect, mime = [], [], []
    for u, h in zip(urls, hosts):
        f, fu, ht, lg, st, rd_, mm = shared.lookup(u, h)
        found.append(f)
        full.append(fu)
        html.append(ht)
        lang.append(lg)
        status.append(st)
        redirect.append(rd_)
        mime.append(mm)
    return (batch
            .append_column("found", pa.array(found, pa.bool_()))
            .append_column("full_url", pa.array(full, pa.string()))
            .append_column("html", pa.array(html, pa.binary()))
            .append_column("lang", pa.array(lang, pa.string()))
            .append_column("status", pa.array(status, pa.int32()))
            .append_column("redirect_to", pa.array(redirect, pa.string()))
            .append_column("mime_type", pa.array(mime, pa.string())))


class FetchReplay:
    """Actor-pool stage: ``map_batches(FetchReplay, fn_constructor_args=
    (pages_dir, fetchmeta), batch_format="pyarrow", concurrency=N)``."""

    def __init__(self, pages_dir: str, fetchmeta_path: str):
        self.store = _CorpusStore(pages_dir, fetchmeta_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _replay(self.store, batch)


def fetch_replay_batch(batch: pa.Table, *, pages_dir: str,
                       fetchmeta_path: str) -> pa.Table:
    """Stateless-task form with worker-global store cache."""
    return _replay(_get_store(pages_dir, fetchmeta_path), batch)
