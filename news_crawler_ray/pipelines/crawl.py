"""The crawl round loop: dequeue → fetch/replay → extract → discover →
enqueue, with Parquet checkpoints and per-round lineage/metrics.

Topology (SURVEY.md §7.1 step 7, north_rule):

  driver round loop
    ├─ frontier shards (named actors)  — politeness dequeue / enqueue
    ├─ seen shards (named actors)      — sha1-key membership
    └─ per round: ray.data.from_arrow(work batch)
         .map_batches(fetch_replay_batch)   # corpus join, bucket-pruned
         .map_batches(extract_batch)        # article kernel
         .map_batches(_route_and_commit)    # links → seen → frontier,
                                            # complete(), page rows out
         .write_parquet(out/pages/round=N)  # resumable partitioned sink

The mutable frontier/seen state lives in long-lived actors — the one
place the Dataset operator model doesn't fit (SURVEY.md §7.2); everything
that touches page payloads is a ``map_batches`` stage over Arrow batches.
Stage functions are plain tasks backed by worker-global caches so the
per-round datasets reuse warm state without re-creating actor pools
every round.

Round barrier contract (stronger than the reference's lossy SQLite
restart, SURVEY.md §2.9): a round is either fully committed (pages +
crawl_order written, state snapshots + manifest advanced) or replayed on
resume; page/crawl_order directories newer than the manifest are dropped
at resume.

Determinism: frontier ordering keys are lineage-derived (see
state/frontier.py), so per-host crawl order is independent of task
interleaving — the golden_crawl_order conformance artifact
(FIXTURES.md §4.2).

Retry semantics parity: fetch misses retry once (max 2 attempts,
crawler.py:342); the exhausted attempt writes a terminal row with
``http_response_code = -1`` (crawler.py:405-417).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from contextlib import contextmanager
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from .. import urlnorm
from ..corpus import host_bucket
from ..stages.extract_stage import PAGE_OUTPUT_COLUMNS, extract_batch
from ..stages.fetch import (fetch_replay_batch, fetch_replay_shared,
                            put_corpus_refs)
from ..state.frontier import FrontierShard
from ..state.seen import SeenShard

LINK_SEQ_STRIDE = 100_000  # seq64 = referrer host_seq * stride + link index


@dataclass
class CrawlConfig:
    corpus_root: str
    out_dir: str
    num_seen_shards: int = 2
    num_frontier_shards: int = 2
    dequeue_per_shard: int = 200        # reference refill batch (crawler.py:387)
    batch_size: int = 64
    round_ms: int = 1000                # virtual clock step per round
    checkpoint_every: int = 1
    max_rounds: int = 10_000
    max_attempts: int = 2               # crawler.py:342
    max_in_flight_override: int | None = None  # raise politeness for bench
    only_webnews: bool = False          # reference CrawlerManager knob
    round_engine: str = "auto"          # "dataset" | "tasks" | "auto"
    # Skew escape hatch (north_rule; SURVEY.md §7.4 item 4): hosts listed
    # here have their frontier queue split across ``k`` salted sub-shards
    # (routing salt = sha1(url) % k), each enforcing max_in_flight/k.
    # Spreads a hot host's queue storage and enqueue/dequeue RPC load
    # across shards; the aggregate politeness budget is approximately
    # preserved (salt→shard collisions undershoot it, never exceed), and
    # strict per-host FIFO order is relaxed to per-sub-shard order
    # (documented trade — the budget, not ordering, is the semantic
    # limit).
    salt_hosts: dict = field(default_factory=dict)   # host -> k
    # S8: parse corpus feeds at start and enqueue their entries as
    # pre-known work (crawler.py:61-62, 427-470). Entries join the
    # frontier after the seeds (seq64 offset) and are crawled like any
    # discovery; the reference pre-fills page metadata that extraction
    # overwrites on crawl — net rows identical for fetchable entries.
    scrape_rss: bool = False
    # Mid-crawl feed refresh (crawler.py:434-445 _update_rss): every N
    # rounds re-parse the known feeds; a feed is skipped when its
    # lastBuildDate is not newer than the stored per-feed timestamp (the
    # reference's freshness gate), and already-seen entry urls dedup via
    # the seen set. 0 = refresh at start only.
    rss_refresh_every: int = 0
    # S8 feed AUTO-DISCOVERY (reference RssFinder, rss_finder.py:12-39):
    # when True, feeds are NOT pre-read from the sidecar — a feed enters
    # the S8 parse path only after a crawled page advertises it (the
    # kernel's extract_feed_rss cascade, extractor.py:136-158: <link
    # rel=alternate type=rss/atom>, .xml anchors, rss/feed anchor
    # heuristics). Discovered urls are matched against the corpus feeds
    # table — the replay stand-in for fetching the feed url — and their
    # entries enqueue exactly like scrape_rss (seen-dedup idempotent).
    # Composes with rss_refresh_every (refresh re-parses only the feeds
    # discovered so far). Overrides scrape_rss's enqueue-at-start.
    rss_discovery: bool = False
    # Sitemap discovery (sitemaps.org protocol; the third standard
    # discovery channel next to seeds and RSS — the reference has
    # none): robots.txt ``Sitemap:`` lines advertise sitemap urls,
    # bodies replay from a ``sitemaps.parquet`` sidecar (url, xml),
    # sitemapindex documents expand against the sidecar, entries
    # enqueue at startup exactly like RSS entries (seen-dedup
    # idempotent, seq64 block after the RSS block so per-host order
    # stays a pure function of lineage). No-op when either sidecar is
    # absent, so existing corpora and goldens are untouched.
    scrape_sitemaps: bool = True
    # Below this many work items a round runs as plain Ray tasks over the
    # same batch functions — a per-round Dataset costs ~1-2 s of planning,
    # which dominates politeness-bounded rounds (measured: tasks mode wins
    # through at least ~12k-item rounds). The streaming Dataset path is
    # for rounds too large to barrier through the driver.
    dataset_round_threshold: int = 50_000
    # User-extension surface (SURVEY §2.10): ``end_function`` mirrors the
    # reference's completion callback (crawler.py:22) — called once with
    # the final summary dict when run() completes; ``additional_data_fn``
    # mirrors ``Article.additional_data`` (article.py:113) — a picklable
    # per-page hook whose dict result is persisted as a JSON string
    # column ``additional_data`` on the pages table. Both default off so
    # the conformance schema is unchanged.
    end_function: object = None         # Callable[[dict], None] | None
    additional_data_fn: object = None   # Callable[[dict], dict] | None
    # Swappable storage backend (reference AbstractDataCollector,
    # abstract_datacollector.py:5-53): when set, every round's finalized
    # page table goes through ``page_sink_fn(table, round_dir)`` instead
    # of the parquet sink. In dataset mode this materializes the round's
    # pages (bounded: one round's worth) where the default streams via
    # write_parquet — the documented trade for an arbitrary backend.
    page_sink_fn: object = None         # Callable[[pa.Table, str], None]

    @property
    def pages_dir(self):
        return os.path.join(self.corpus_root, "pages")

    @property
    def fetchmeta(self):
        """Bucket-partitioned ``fetchmeta/`` directory (current corpus
        layout), falling back to the legacy single-file sidecar."""
        d = os.path.join(self.corpus_root, "fetchmeta")
        if os.path.isdir(d):
            return d
        return os.path.join(self.corpus_root, "fetchmeta.parquet")


def _merge_batches(dicts: list[dict]) -> dict:
    out: dict[str, list] = {}
    for d in dicts:
        for k, v in d.items():
            out.setdefault(k, []).extend(v)
    return out


def discover_cols(batch: pa.Table, *, only_webnews: bool) -> pa.Table:
    """Per-batch link discovery: canonicalize, classify and key each
    discovered link INSIDE the task (the per-link string/hash work is the
    expensive part of routing — it must not run on the driver). Appends
    per-row candidate list columns; the driver commit only dedups and
    fans out RPCs."""
    cols = batch.to_pydict()
    c_url, c_host, c_news, c_seq, c_key = [], [], [], [], []
    for i in range(batch.num_rows):
        links = cols["links"][i] or []
        base_seq = cols["host_seq"][i] * LINK_SEQ_STRIDE
        u, h, nw, sq, ky = [], [], [], [], []
        for j, link in enumerate(links):
            canon = urlnorm.split_url_and_scheme(link)[1]
            host = urlnorm.host_of(link)
            if not host:
                continue
            is_news = urlnorm.is_news_url(link)
            if only_webnews and not is_news:
                continue
            u.append(canon)
            h.append(host)
            nw.append(is_news)
            sq.append(base_seq + j)
            ky.append(urlnorm.url_key(canon))
        c_url.append(u)
        c_host.append(h)
        c_news.append(nw)
        c_seq.append(sq)
        c_key.append(ky)
    return (batch
            .append_column("cand_url", pa.array(c_url, pa.list_(pa.string())))
            .append_column("cand_host", pa.array(c_host, pa.list_(pa.string())))
            .append_column("cand_news", pa.array(c_news, pa.list_(pa.bool_())))
            .append_column("cand_seq64", pa.array(c_seq, pa.list_(pa.int64())))
            .append_column("cand_key", pa.array(c_key, pa.list_(pa.binary()))))


def finalize_page_rows(out: pa.Table, exhausted: set) -> pa.Table:
    """Keep successes + exhausted failures (terminal -1 rows,
    crawler.py:405-417); drop rows that will be retried. ``exhausted`` is
    the frontier's own verdict (returned by ``Frontier.complete``) so the
    requeue gate and this page-row gate can never desynchronize, even
    when the politeness table overrides max_attempts per host (ADVICE r1
    item 1). Vectorized."""
    import pyarrow.compute as pc

    ok = out["ok"]
    if exhausted:
        keep = pc.or_(ok, pc.is_in(out["url"], value_set=pa.array(
            sorted(exhausted), pa.string())))
    else:
        keep = ok
    page = out.filter(keep)
    ok_f = page["ok"]
    codes = pc.if_else(ok_f, page["http_response_code"],
                       pa.scalar(-1, pa.int32())).cast(pa.int32())
    attempts = pc.if_else(ok_f, page["attempts_count"],
                          pc.add(page["attempts_count"], 1)).cast(pa.int32())
    cols = list(PAGE_OUTPUT_COLUMNS)
    if "additional_data" in page.column_names:   # user hook column
        cols.append("additional_data")
    page = page.select(cols)
    page = page.set_column(page.column_names.index("http_response_code"),
                           "http_response_code", codes)
    page = page.set_column(page.column_names.index("attempts_count"),
                           "attempts_count", attempts)
    return page


def _route_shard_for(host: str, url: str, salt_hosts: dict,
                     num_shards: int) -> int:
    """Frontier shard for (host, url): plain host hash, or salted by the
    url for hosts in ``salt_hosts`` (shared by driver and task commit)."""
    k = salt_hosts.get(host, 1) if salt_hosts else 1
    if k <= 1:
        return urlnorm.host_shard(host, num_shards)
    return urlnorm.host_shard(host, num_shards,
                              salt=urlnorm.url_shard(url, k))


# ---------------------------------------------------------------------------
# Dataset-mode distributed round commit (VERDICT r1 item 6): the same
# commit spec as CrawlEngine._commit_discoveries, but the reduce runs as
# Dataset operators and the seen/frontier RPCs fan out FROM TASKS — the
# driver never sees a candidate row. Round flow:
#
#   out = fetch → extract → discover          (materialized: one round's
#                                              blocks, the round working set)
#   pass 1: flatten candidates → groupby(url) min-lineage winner →
#           seen add_if_absent + frontier enqueue per batch (task-side)
#   pass 2: frontier complete per batch (task-side, idempotent via the
#           shard's per-round guard) → finalize page rows → write_parquet
#
# Fault model: the round barrier still holds (both passes are fully
# consumed before the next dequeue); task retries are tolerated by the
# frontier's completion guard and by seen-idempotent enqueue. A task that
# dies between add_if_absent and enqueue loses those urls for the run —
# the checkpoint/resume contract (round replays from the last snapshot)
# covers driver/actor failure, which is the crash mode that matters.
# ---------------------------------------------------------------------------

def _flatten_cands(batch: pa.Table) -> pa.Table:
    """Explode the per-row candidate list columns into one row per
    discovered link (columnar ops only — the per-link string/hash work
    already happened inside discover_cols)."""
    import pyarrow.compute as pc
    col = batch["cand_url"].combine_chunks()
    parent = pc.list_parent_indices(col)
    return pa.table({
        "url": pc.list_flatten(col),
        "host": pc.list_flatten(batch["cand_host"].combine_chunks()),
        "is_webnews": pc.list_flatten(batch["cand_news"].combine_chunks()),
        "seq64": pc.list_flatten(batch["cand_seq64"].combine_chunks()),
        "key": pc.list_flatten(batch["cand_key"].combine_chunks()),
        "url_to_refer": pc.take(batch["url"].combine_chunks(), parent),
    })


def _bucket_cands(t: pa.Table) -> pa.Table:
    """Salt candidates by the first byte of the url key (the key IS a
    url hash, so same url → same bucket). Grouping the dedup shuffle by
    the raw url would make one map_groups group per DISTINCT CANDIDATE
    URL — ~1 ms of Python each, the dominant cost at millions of
    discovered links per round; 64 buckets amortize it."""
    b = np.fromiter((k[0] & 63 for k in t["key"].to_pylist()),
                    dtype=np.int32, count=len(t))
    return t.append_column("bucket", pa.array(b))


def _min_lineage_winner(g: pd.DataFrame) -> pd.DataFrame:
    """Per-url dedup winners within one bucket: MIN (seq64,
    url_to_refer) per url — identical tie-break to the driver commit
    and the oracle, computed as one vectorized sort +
    drop_duplicates pass."""
    g = g.sort_values(["seq64", "url_to_refer"], kind="stable")
    return g.drop_duplicates("url", keep="first") \
        .drop(columns=["bucket"])


def _commit_candidates_batch(batch: pa.Table, *, seen, frontier,
                             salt_hosts, round_added: int) -> pa.Table:
    """Task-side seen-check + frontier enqueue for one batch of deduped
    candidates; one RPC per shard per batch. Emits a count row."""
    keys = batch["key"].to_pylist()
    if not keys:
        return pa.table({"admitted": pa.array([0], pa.int64())})
    shards = [int.from_bytes(k[:8], "big") % len(seen) for k in keys]
    refs, idxs = {}, {}
    for s in set(shards):
        ii = [i for i, x in enumerate(shards) if x == s]
        idxs[s] = ii
        refs[s] = seen[s].add_if_absent.remote([keys[i] for i in ii])
    fresh = [False] * len(keys)
    for s, ii in idxs.items():
        for i, is_new in zip(ii, ray.get(refs[s])):
            fresh[i] = is_new
    cols = batch.to_pydict()
    by_frontier: dict[int, list[int]] = {}
    for i, f in enumerate(fresh):
        if f:
            s = _route_shard_for(cols["host"][i], cols["url"][i],
                                 salt_hosts, len(frontier))
            by_frontier.setdefault(s, []).append(i)
    enq_refs = [frontier[s].enqueue.remote({
        "url": [cols["url"][i] for i in ii],
        "host": [cols["host"][i] for i in ii],
        "is_webnews": [cols["is_webnews"][i] for i in ii],
        "round_added": [round_added] * len(ii),
        "seq64": [cols["seq64"][i] for i in ii],
        "url_to_refer": [cols["url_to_refer"][i] for i in ii],
    }) for s, ii in by_frontier.items()]
    if enq_refs:
        ray.get(enq_refs)
    return pa.table({"admitted": pa.array([sum(fresh)], pa.int64())})


def _complete_only_batch(batch: pa.Table, *, frontier,
                         salt_hosts) -> pa.Table:
    """Task-side work completion for one batch of extracted rows:
    complete() RPC per shard (idempotent under retry). Emits ONLY this
    batch's exhausted urls — tiny rows, so the pass that must barrier
    before the next round's dequeue moves no page payloads."""
    cols = batch.select(["url", "host", "ok", "attempts_count",
                         "is_webnews", "work_round", "work_seq64",
                         "work_ref"]).to_pydict()
    by_shard: dict[int, list[int]] = {}
    for i in range(batch.num_rows):
        s = _route_shard_for(cols["host"][i], cols["url"][i],
                             salt_hosts, len(frontier))
        by_shard.setdefault(s, []).append(i)
    refs = [frontier[s].complete.remote({
        "url": [cols["url"][i] for i in ii],
        "host": [cols["host"][i] for i in ii],
        "ok": [cols["ok"][i] for i in ii],
        "attempts": [cols["attempts_count"][i] for i in ii],
        "is_webnews": [cols["is_webnews"][i] for i in ii],
        "round_added": [cols["work_round"][i] for i in ii],
        "seq64": [cols["work_seq64"][i] for i in ii],
        "url_to_refer": [cols["work_ref"][i] for i in ii],
    }) for s, ii in by_shard.items()]
    exhausted: list = []
    for r in ray.get(refs):
        exhausted.extend(r["exhausted"])
    return pa.table({"url": pa.array(sorted(set(exhausted)), pa.string())})


def _finalize_only_batch(batch: pa.Table, *, exhausted: set) -> pa.Table:
    """Task-side page-row finalize (no actor RPCs): keep successes +
    exhausted failures, with the round's exhausted-url set broadcast
    into the task."""
    batch = batch.drop_columns(["cand_url", "cand_host", "cand_news",
                                "cand_seq64", "cand_key"])
    return finalize_page_rows(batch, exhausted)


def _distinct_feed_urls(batch: pa.Table) -> pa.Table:
    """Per-batch distinct CANONICAL feed urls from the extract stage's
    ``feed_urls`` column (S8 auto-discovery). Tiny output — bounded by
    the number of distinct advertised feeds, not by pages."""
    import pyarrow.compute as pc
    flat = pc.list_flatten(batch["feed_urls"].combine_chunks())
    uniq = pc.unique(flat).to_pylist()
    return pa.table({"feed_url": pa.array(
        sorted({urlnorm.canonical_url(u) for u in uniq if u}),
        pa.string())})


@ray.remote
def _round_batch_task(table: pa.Table, corpus_refs: dict,
                      only_webnews: bool,
                      additional_data_fn=None) -> pa.Table:
    """Tasks-mode round processing: fetch + extract + link discovery
    composed in one task. The corpus is shared through the object store
    (zero-copy bucket tables, per-worker lazy key index); the extract
    kernel is cached per worker."""
    out = extract_batch(fetch_replay_shared(table, corpus_refs=corpus_refs),
                        additional_data_fn=additional_data_fn)
    return discover_cols(out, only_webnews=only_webnews)


class CrawlEngine:
    """Driver for the crawl topology. Owns the shard actors; does NOT own
    the Ray session (callers init Ray)."""

    def __init__(self, cfg: CrawlConfig, resume: bool = False):
        self.cfg = cfg
        self.round = 0
        self.metrics: list[dict] = []
        # cumulative driver-side wall time per round-loop phase; the
        # round barrier makes these additive, so summary()["phase_secs"]
        # is a faithful Amdahl breakdown of crawl wall time
        self.phase_secs: dict[str, float] = {}
        self._seed_store = None
        self._host_shard_memo: dict[str, int] = {}
        self._rss_last_update: dict[str, str] = {}   # feed_url → iso ts
        self._rss_seq = 1_000_000                    # after the seeds
        self._sitemap_seq = 2_000_000                # after the RSS block
        self._rss_discovered: set[str] = set()       # canonical feed urls
        self._pending_feed_urls: set[str] = set()    # found this round
        self.seen = [SeenShard.remote(i) for i in range(cfg.num_seen_shards)]
        # cfg.max_attempts reaches every frontier shard at construction so
        # the requeue gate and the page-row finalize gate share one
        # authority (ADVICE r1 item 1); the politeness table may still
        # override it per host.
        self.frontier = [FrontierShard.remote(i, cfg.max_attempts)
                         for i in range(cfg.num_frontier_shards)]
        # corpus shared once through the object store (see stages/fetch.py)
        self.corpus_refs = put_corpus_refs(cfg.pages_dir, cfg.fetchmeta)
        self._configure_politeness()
        if resume:
            self._resume()
        else:
            if os.path.isdir(cfg.out_dir):
                shutil.rmtree(cfg.out_dir)
            os.makedirs(cfg.out_dir, exist_ok=True)
            self._enqueue_seeds()
            if cfg.scrape_rss and not cfg.rss_discovery:
                self._enqueue_rss()
            if cfg.scrape_sitemaps:
                self._enqueue_sitemaps()

    # -- setup ---------------------------------------------------------
    def _configure_politeness(self):
        path = os.path.join(self.cfg.corpus_root, "politeness.parquet")
        t = pq.read_table(path).to_pydict() if os.path.exists(path) else None
        # robots.txt sidecar (host, robots_txt): raw bodies parsed into
        # the same disallow-prefix / min-interval knobs and merged with
        # the fixture rows (functions/robots.py — north-star's
        # "robots.txt rules cached per actor": parsed ONCE here, cached
        # in each frontier shard by configure_hosts)
        rpath = os.path.join(self.cfg.corpus_root, "robots.parquet")
        if os.path.exists(rpath):
            from ..functions.robots import merge_robots_rows
            rt = pq.read_table(rpath).to_pydict()
            t = merge_robots_rows(t, rt["host"], rt["robots_txt"])
        if t is None:
            return
        if self.cfg.max_in_flight_override:
            t["max_in_flight"] = [self.cfg.max_in_flight_override] * len(t["host"])
        by_shard: dict[int, dict] = {}

        def add_row(s: int, i: int, budget: int | None = None):
            d = by_shard.setdefault(s, {k: [] for k in t})
            for k in t:
                if k == "max_in_flight" and budget is not None:
                    d[k].append(budget)
                else:
                    d[k].append(t[k][i])

        for i, host in enumerate(t["host"]):
            k_salt = self.cfg.salt_hosts.get(host, 1)
            if k_salt <= 1:
                add_row(urlnorm.host_shard(host, len(self.frontier)), i)
            else:
                # each salted sub-shard gets an equal budget share so the
                # aggregate politeness budget is preserved
                budget = max(1, (t["max_in_flight"][i] or 6) // k_salt)
                for salt in range(k_salt):
                    add_row(urlnorm.host_shard(host, len(self.frontier),
                                               salt=salt), i, budget)
        ray.get([self.frontier[s].configure_hosts.remote(rows)
                 for s, rows in by_shard.items()])

    def _resolve_seed(self, canon: str) -> str:
        """S2 seed redirect resolution (utils.py:254-261, main.py:10-13):
        follow the fetchmeta redirect chain before seeding, ≤ 5 hops.
        Bucket-pruned: only the fetchmeta partitions of the chain's hosts
        are read (never the whole fetchmeta)."""
        if self._seed_store is None:
            from ..stages.fetch import _CorpusStore
            self._seed_store = _CorpusStore(self.cfg.pages_dir,
                                            self.cfg.fetchmeta)
        return self._seed_store.resolve_chain(canon)

    def _enqueue_seeds(self):
        t = pq.read_table(os.path.join(self.cfg.corpus_root, "seeds.parquet")).to_pydict()
        recs = {k: [] for k in ("url", "host", "is_webnews", "round_added",
                                "seq64", "url_to_refer")}
        keys, shards = [], []
        for url, seq in sorted(zip(t["url"], t["seq"]), key=lambda x: x[1]):
            canon = self._resolve_seed(urlnorm.canonical_url(url))
            # host/news-class of the RESOLVED url: a cross-host seed
            # redirect must route to the resolved host's frontier shard
            # and corpus bucket (ADVICE r1 item 2)
            recs["url"].append(canon)
            recs["host"].append(urlnorm.host_of(canon))
            recs["is_webnews"].append(urlnorm.is_news_url(canon))
            recs["round_added"].append(0)
            recs["seq64"].append(seq)
            recs["url_to_refer"].append(None)
            key = urlnorm.url_key(canon)
            keys.append(key)
            shards.append(int.from_bytes(key[:8], "big") % len(self.seen))
        masks = {}
        for s in set(shards):
            idxs = [i for i, x in enumerate(shards) if x == s]
            masks.update(dict(zip(idxs, ray.get(
                self.seen[s].add_if_absent.remote([keys[i] for i in idxs])))))
        keep = [i for i in range(len(keys)) if masks[i]]
        by_frontier: dict[int, list[int]] = {}
        for i in keep:
            by_frontier.setdefault(
                self._route_shard(recs["host"][i], recs["url"][i]), []).append(i)
        ray.get([self.frontier[s].enqueue.remote(
            {k: [v[i] for i in idxs] for k, v in recs.items()})
            for s, idxs in by_frontier.items()])

    def _enqueue_rss(self, only_urls: set[str] | None = None) -> int:
        """S8: feed entries → seen-checked frontier records
        (crawler.py:427-470; entries carry is_webnews from the url).
        Re-callable mid-crawl (crawler.py:434-445 ``_update_rss``): a
        feed whose lastBuildDate is not newer than its stored per-feed
        timestamp is skipped whole; entry urls dedup via the seen set.
        ``only_urls`` restricts the pass to those CANONICAL feed urls
        (the rss_discovery path: discovered feeds only — a feed url that
        no page advertised is never parsed). Returns the number of
        admitted entries."""
        feeds_path = os.path.join(self.cfg.corpus_root, "feeds.parquet")
        if not os.path.exists(feeds_path):
            return 0
        from ..sources.rss import parse_feed_xml
        feeds = pq.read_table(feeds_path).to_pydict()
        recs = {k: [] for k in ("url", "host", "is_webnews", "round_added",
                                "seq64", "url_to_refer")}
        keys = []
        for host, feed_url, xml in zip(feeds["host"], feeds["url"],
                                       feeds["xml"]):
            if (only_urls is not None
                    and urlnorm.canonical_url(feed_url) not in only_urls):
                continue
            feed = parse_feed_xml(xml)
            updated = feed["updated"]
            last = self._rss_last_update.get(feed_url)
            # reference gate (crawler.py:442): parse entries only when
            # either timestamp is unknown or the feed is strictly newer
            if (last is not None and updated is not None
                    and not updated.isoformat() > last):
                continue
            if updated is not None:
                self._rss_last_update[feed_url] = updated.isoformat()
            for e in feed["entries"]:
                if not e["link"]:
                    continue
                link = urlnorm.clean_url(e["link"], remove_arguments=False)
                canon = urlnorm.canonical_url(link)
                recs["url"].append(canon)
                recs["host"].append(urlnorm.host_of(link))
                recs["is_webnews"].append(urlnorm.is_news_url(link))
                recs["round_added"].append(self.round)
                recs["seq64"].append(self._rss_seq)
                recs["url_to_refer"].append(feed_url)
                keys.append(urlnorm.url_key(canon))
                self._rss_seq += 1
        return self._admit_records(recs, keys)

    def _admit_records(self, recs: dict, keys: list) -> int:
        """Seen-check + frontier enqueue for pre-known records (the
        shared tail of RSS and sitemap admission): shard-batched
        ``add_if_absent``, then route the new urls to their frontier
        shards. Returns admitted count."""
        if not keys:
            return 0
        by_seen: dict[int, list[int]] = {}
        for i, key in enumerate(keys):
            by_seen.setdefault(
                int.from_bytes(key[:8], "big") % len(self.seen), []).append(i)
        new_mask = [False] * len(keys)
        for s, idxs in by_seen.items():
            for i, is_new in zip(idxs, ray.get(
                    self.seen[s].add_if_absent.remote([keys[i] for i in idxs]))):
                new_mask[i] = is_new
        by_frontier: dict[int, list[int]] = {}
        for i, keep in enumerate(new_mask):
            if keep:
                by_frontier.setdefault(
                    self._route_shard(recs["host"][i], recs["url"][i]),
                    []).append(i)
        return sum(ray.get([self.frontier[s].enqueue.remote(
            {k: [v[i] for i in idxs] for k, v in recs.items()})
            for s, idxs in by_frontier.items()]))

    def _enqueue_sitemaps(self) -> int:
        """Sitemap discovery (sources/sitemap.py): robots.txt
        ``Sitemap:`` lines → sidecar bodies → (page, sitemap) pairs →
        seen-checked frontier records. Only sitemaps ADVERTISED by a
        robots body are parsed (a sidecar row nothing advertises is
        never read — the `_enqueue_rss` discovery rule); entries carry
        the direct parent sitemap as ``url_to_refer`` and a seq64
        block after RSS so per-host order stays lineage-pure."""
        spath = os.path.join(self.cfg.corpus_root, "sitemaps.parquet")
        rpath = os.path.join(self.cfg.corpus_root, "robots.parquet")
        if not (os.path.exists(spath) and os.path.exists(rpath)):
            return 0
        from ..functions.robots import sitemap_urls
        from ..sources.sitemap import expand_sitemaps
        rt = pq.read_table(rpath).to_pydict()
        st = pq.read_table(spath).to_pydict()
        bodies = {urlnorm.canonical_url(u): x
                  for u, x in zip(st["url"], st["xml"])}
        advertised: list[str] = []
        for body in rt["robots_txt"]:
            advertised.extend(sitemap_urls(body or ""))
        recs = {k: [] for k in ("url", "host", "is_webnews",
                                "round_added", "seq64", "url_to_refer")}
        keys = []
        for loc, sm_url in expand_sitemaps(
                advertised, bodies, canon=urlnorm.canonical_url):
            link = urlnorm.clean_url(loc, remove_arguments=False)
            canon = urlnorm.canonical_url(link)
            recs["url"].append(canon)
            recs["host"].append(urlnorm.host_of(link))
            recs["is_webnews"].append(urlnorm.is_news_url(link))
            recs["round_added"].append(self.round)
            recs["seq64"].append(self._sitemap_seq)
            recs["url_to_refer"].append(sm_url)
            keys.append(urlnorm.url_key(canon))
            self._sitemap_seq += 1
        return self._admit_records(recs, keys)

    @contextmanager
    def _phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phase_secs[name] = (self.phase_secs.get(name, 0.0)
                                     + time.perf_counter() - t0)

    # -- round loop ----------------------------------------------------
    def run(self) -> dict:
        cfg = self.cfg
        pre_deq = None   # next round's dequeue refs, submitted early
        while self.round < cfg.max_rounds:
            now_ms = self.round * cfg.round_ms
            with self._phase("dequeue"):
                work = _merge_batches(ray.get(
                    pre_deq if pre_deq is not None else
                    [f.dequeue.remote(now_ms, cfg.dequeue_per_shard)
                     for f in self.frontier]))
            pre_deq = None
            n_work = len(work["url"])
            if n_work == 0:
                pending = sum(ray.get([f.pending_count.remote()
                                       for f in self.frontier]))
                if pending == 0:
                    break
                self.round += 1   # politeness interval blocking: advance clock
                continue
            tail, overlap_ok = self._process_round(work)
            # Round-N/round-N+1 overlap: every frontier-shard RPC of this
            # round is submitted from THIS caller, and Ray executes actor
            # tasks per caller in submission order — so per shard the
            # program order enqueue → complete → drain_order_log → stats
            # → dequeue(N+1) holds without a barrier. Submitting the
            # order-log/stats reads and the NEXT dequeue now lets the
            # shards compute them while the driver runs the round's tail
            # (page finalize + parquet sink + metrics files). Dataset-
            # mode rounds qualify too: their enqueue/complete RPCs come
            # from tasks (other callers, no submission-order guarantee),
            # but _process_round_dataset BARRIERS both passes before
            # returning, which is the stronger property. Gated off when
            # driver-side state must land first: a due checkpoint (the
            # snapshot must not capture a post-dequeue frontier) or an
            # RSS enqueue.
            log_refs = [f.drain_order_log.remote() for f in self.frontier]
            stat_refs = [f.stats.remote() for f in self.frontier]
            seen_refs = [s.count.remote() for s in self.seen]
            checkpoint_due = (self.round + 1) % cfg.checkpoint_every == 0
            rss_pending = cfg.rss_discovery and bool(self._pending_feed_urls)
            refresh_due = ((cfg.scrape_rss or cfg.rss_discovery)
                           and cfg.rss_refresh_every
                           and (self.round + 1) % cfg.rss_refresh_every == 0)
            if (overlap_ok and not checkpoint_due and not rss_pending
                    and not refresh_due and self.round + 1 < cfg.max_rounds):
                pre_deq = [f.dequeue.remote((self.round + 1) * cfg.round_ms,
                                            cfg.dequeue_per_shard)
                           for f in self.frontier]
            tail()
            with self._phase("round_log"):
                self._commit_round(n_work, log_refs, stat_refs, seen_refs)
            self.round += 1
            if cfg.rss_discovery and self._pending_feed_urls:
                # feeds advertised by pages of the just-committed round:
                # parse each NEWLY discovered feed once (rss_finder.py
                # browses-once semantics; refresh below re-parses)
                new = sorted(self._pending_feed_urls
                             - self._rss_discovered)
                self._pending_feed_urls.clear()
                if new:
                    self._rss_discovered.update(new)
                    self._enqueue_rss(only_urls=set(new))
            if ((cfg.scrape_rss or cfg.rss_discovery)
                    and cfg.rss_refresh_every
                    and self.round % cfg.rss_refresh_every == 0):
                # mid-crawl feed refresh (S8); under discovery only the
                # feeds some page actually advertised are re-parsed
                self._enqueue_rss(only_urls=self._rss_discovered
                                  if cfg.rss_discovery else None)
        s = self.summary()
        if cfg.end_function is not None:   # reference crawler.py:22
            cfg.end_function(s)
        return s

    def _process_round(self, work: dict):
        """Run one round's fetch/extract/commit. Returns ``(tail,
        overlap_ok)``: ``tail`` is a deferred driver-side closure (page
        finalize + sink) that gates nothing in the next round and runs
        after run() pre-submits the next dequeue; ``overlap_ok`` says
        the dequeue overlap is safe — every frontier RPC of this round
        was either submitted from the driver (tasks mode: submission
        order sequences it before the pre-submitted dequeue) or already
        barriered (dataset mode)."""
        cfg = self.cfg
        # bucket-pure batches: sort work by the corpus host-bucket so each
        # task touches exactly one bucket partition (partition-pruned
        # lookup; a mixed batch would fault in every bucket per worker)
        nb = self.corpus_refs["num_buckets"]
        order = sorted(range(len(work["url"])),
                       key=lambda i: (host_bucket(work["host"][i], nb), i))
        work = {k: [v[i] for i in order] for k, v in work.items()}
        table = pa.table({
            "url": pa.array(work["url"], pa.string()),
            "host": pa.array(work["host"], pa.string()),
            "attempts": pa.array(work["attempts"], pa.int32()),
            "is_webnews": pa.array(work["is_webnews"], pa.bool_()),
            "url_to_refer": pa.array(work["url_to_refer"], pa.string()),
            "host_seq": pa.array(work["host_seq"], pa.int64()),
            "tier": pa.array(work["tier"], pa.int8()),
            "round_added": pa.array(work["round_added"], pa.int64()),
            "seq64": pa.array(work["seq64"], pa.int64()),
        })
        round_dir = os.path.join(cfg.out_dir, "pages", f"round={self.round}")
        mode = cfg.round_engine
        if mode == "auto":
            mode = "tasks" if table.num_rows < cfg.dataset_round_threshold \
                else "dataset"
        if mode == "dataset":
            # returns the deferred finalize+sink tail; all frontier RPCs
            # (pass-1 enqueues, pass-2a completes) are barriered inside,
            # so the dequeue overlap is safe in dataset mode too
            return self._process_round_dataset(table, round_dir), True
        # adaptive batch size: target ≥2 task waves per CPU so the
        # round barrier's last wave doesn't idle most of the pool
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        bs = max(32, min(cfg.batch_size,
                         -(-table.num_rows // (2 * ncpu))))
        with self._phase("wave"):
            refs = []
            for off in range(0, table.num_rows, bs):
                refs.append(_round_batch_task.remote(
                    table.slice(off, bs), self.corpus_refs,
                    cfg.only_webnews, cfg.additional_data_fn))
            parts = ray.get(refs)
        if cfg.rss_discovery:
            with self._phase("rss_discover"):
                for p in parts:
                    if p.num_rows:
                        self._pending_feed_urls.update(
                            _distinct_feed_urls(p)["feed_url"].to_pylist())
        out, exhausted = self._commit_discoveries(parts)

        def tail():
            if out is None:
                return
            with self._phase("finalize"):
                page = finalize_page_rows(out, exhausted)
            if page.num_rows:
                with self._phase("page_write"):
                    if cfg.page_sink_fn is not None:
                        cfg.page_sink_fn(page, round_dir)
                    else:
                        os.makedirs(round_dir, exist_ok=True)
                        pq.write_table(page,
                                       os.path.join(round_dir,
                                                    "part-0.parquet"))
        return tail, True

    def _process_round_dataset(self, table: pa.Table, round_dir: str):
        """Streaming round for large work sets: the whole round — fetch,
        extract, discovery, candidate dedup, seen/frontier commit,
        page-row finalize and the parquet sink — runs as Dataset
        operators; the driver only orchestrates (VERDICT r1 item 6). The
        one shuffle is the ``groupby(url)`` candidate dedup, moving
        (url, host, seq64, 20B key, referrer) rows."""
        cfg = self.cfg
        out = (rd.from_arrow(table)
               .map_batches(fetch_replay_shared,
                            fn_kwargs={"corpus_refs": self.corpus_refs},
                            batch_format="pyarrow",
                            batch_size=cfg.batch_size)
               .map_batches(extract_batch,
                            fn_kwargs={"additional_data_fn":
                                       cfg.additional_data_fn},
                            batch_format="pyarrow",
                            batch_size=cfg.batch_size)
               .map_batches(discover_cols,
                            fn_kwargs={"only_webnews": cfg.only_webnews},
                            batch_format="pyarrow",
                            batch_size=cfg.batch_size)
               )
        with self._phase("wave"):
            out = out.materialize()   # round working set, reused by both passes

        # S8 auto-discovery: distinct advertised feed urls (task-side
        # dedup; the driver sees only feed urls, never page rows)
        if cfg.rss_discovery:
            found = out.map_batches(_distinct_feed_urls,
                                    batch_format="pyarrow").to_pandas()
            self._pending_feed_urls.update(found["feed_url"])

        # pass 1: discoveries — min-lineage winner per url, then
        # task-side seen-check + enqueue
        commit_t0 = time.perf_counter()
        (out.map_batches(_flatten_cands, batch_format="pyarrow")
            .map_batches(_bucket_cands, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_min_lineage_winner, batch_format="pandas")
            .map_batches(_commit_candidates_batch,
                         fn_kwargs={"seen": self.seen,
                                    "frontier": self.frontier,
                                    "salt_hosts": cfg.salt_hosts,
                                    "round_added": self.round + 1},
                         batch_format="pyarrow")
            .count())   # consume (tiny count rows) → commit barrier
        self.phase_secs["commit"] = (self.phase_secs.get("commit", 0.0)
                                     + time.perf_counter() - commit_t0)

        # pass 2a: work completion ONLY (frontier.complete per shard per
        # batch; idempotent under task retry). Output is this round's
        # exhausted urls — bounded by twice-failed fetches, so the
        # driver-side set is tiny. Barriered here so that when this
        # method returns, EVERY frontier RPC of the round has executed —
        # which is what lets run() pre-submit the next dequeue
        # (overlap_ok) in dataset mode too.
        ex_tbl = out.map_batches(_complete_only_batch,
                                 fn_kwargs={"frontier": self.frontier,
                                            "salt_hosts": cfg.salt_hosts},
                                 batch_format="pyarrow",
                                 batch_size=cfg.batch_size).to_pandas()
        exhausted = set() if ex_tbl.empty else set(ex_tbl["url"])
        self.phase_secs["commit"] = (self.phase_secs.get("commit", 0.0)
                                     + time.perf_counter() - commit_t0)

        # pass 2b (deferred tail): page finalize + streaming parquet
        # sink; no actor RPCs — the exhausted set is broadcast into the
        # finalize tasks, so this overlaps with round N+1's dequeue
        def tail():
            with self._phase("finalize"):
                pages = out.map_batches(
                    _finalize_only_batch,
                    fn_kwargs={"exhausted": exhausted},
                    batch_format="pyarrow", batch_size=cfg.batch_size)
                if cfg.page_sink_fn is not None:
                    tbl = pa.concat_tables(
                        [ray.get(r) for r in pages.to_arrow_refs()])
                    if tbl.num_rows:
                        cfg.page_sink_fn(tbl, round_dir)
                    return
                pages.write_parquet(round_dir)
            # drop the directory again if the round produced no page
            # rows (parity with tasks mode and the resume contract;
            # footer-only metadata reads, no data IO)
            if os.path.isdir(round_dir):
                rows = sum(
                    pq.read_metadata(os.path.join(round_dir, f)).num_rows
                    for f in os.listdir(round_dir)
                    if f.endswith(".parquet"))
                if rows == 0:
                    shutil.rmtree(round_dir)
        return tail

    def _commit_discoveries(self, parts: list[pa.Table]) -> tuple:
        """Deterministic round commit: candidate dedup by MIN lineage key
        (order-independent — same-round duplicate discoveries resolve to
        the earliest referrer regardless of batch interleaving), then
        seen-membership, frontier enqueue and work completion, one RPC
        per shard (SURVEY.md §7.4 item 3).

        Scale path note: this driver-side reduce is bounded by one
        round's discoveries; at cluster scale the same min-key dedup is a
        ``groupby(url).min(seq64)`` over the candidate dataset followed by
        identical per-shard RPC fan-out from tasks.
        """
        import pyarrow.compute as pc

        cfg = self.cfg
        out = pa.concat_tables([p for p in parts if p.num_rows]) \
            if any(p.num_rows for p in parts) else None
        if out is None:
            return None, set()

        commit_t0 = time.perf_counter()
        # vectorized candidate flatten (the string/hash work per link was
        # already done inside the tasks; here only columnar ops run)
        cand_url_col = out["cand_url"].combine_chunks()
        parent = pc.list_parent_indices(cand_url_col)
        cand = pd.DataFrame({
            "url": pc.list_flatten(cand_url_col).to_pandas(),
            "host": pc.list_flatten(out["cand_host"].combine_chunks()).to_pandas(),
            "is_webnews": pc.list_flatten(out["cand_news"].combine_chunks()).to_pandas(),
            "seq64": pc.list_flatten(out["cand_seq64"].combine_chunks()).to_pandas(),
            "key": pc.list_flatten(out["cand_key"].combine_chunks()).to_pandas(),
            "url_to_refer": pc.take(out["url"].combine_chunks(), parent).to_pandas(),
        })
        out = out.drop_columns(["cand_url", "cand_host", "cand_news",
                                "cand_seq64", "cand_key"])

        # min-lineage-key winner per canonical url, ordered by lineage
        enq_refs: list = []
        if len(cand):
            cand = cand.sort_values(["seq64", "url_to_refer"], kind="stable") \
                .drop_duplicates("url", keep="first") \
                .sort_values(["seq64", "url"], kind="stable") \
                .reset_index(drop=True)
            cand["round_added"] = self.round + 1

            keys = cand["key"].to_list()
            keymat = np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(-1, 20)
            seen_shard = (np.ascontiguousarray(keymat[:, :8]).view(">u8")
                          .reshape(-1) % np.uint64(len(self.seen))).astype(int)
            refs, idxs_by_shard = {}, {}
            for s in np.unique(seen_shard):
                idxs = np.flatnonzero(seen_shard == s)
                idxs_by_shard[s] = idxs
                refs[s] = self.seen[s].add_if_absent.remote(
                    [keys[i] for i in idxs])
            new_mask = np.zeros(len(keys), dtype=bool)
            for s, idxs in idxs_by_shard.items():
                new_mask[idxs] = ray.get(refs[s])

            fresh = cand.loc[new_mask]
            if len(fresh):
                if self.cfg.salt_hosts:
                    host_shards = np.fromiter(
                        (self._route_shard(h, u)
                         for h, u in zip(fresh["host"], fresh["url"])),
                        dtype=int, count=len(fresh))
                else:
                    host_shards = fresh["host"].map(self._host_shard_cached).to_numpy()
                for s in np.unique(host_shards):
                    g = fresh.loc[host_shards == s]
                    enq_refs.append(self.frontier[s].enqueue.remote({
                        "url": g["url"].to_list(),
                        "host": g["host"].to_list(),
                        "is_webnews": g["is_webnews"].to_list(),
                        "round_added": g["round_added"].to_list(),
                        "seq64": g["seq64"].to_list(),
                        "url_to_refer": g["url_to_refer"].to_list(),
                    }))
                # NO ray.get here: the complete RPCs below are submitted
                # from the same caller, and Ray executes actor tasks per
                # caller in SUBMISSION order, so each frontier shard
                # still sees enqueue-before-complete (the order that
                # fixes retry FIFO positions); one barrier at the end
                # covers both (saves an RPC round-trip per round)

        # work completion (releases politeness budget; retries requeue)
        comp = out.select(["url", "host", "ok", "attempts_count",
                           "is_webnews", "work_round", "work_seq64",
                           "work_ref"]).to_pandas()
        if self.cfg.salt_hosts:
            comp_shards = np.fromiter(
                (self._route_shard(h, u)
                 for h, u in zip(comp["host"], comp["url"])),
                dtype=int, count=len(comp))
        else:
            comp_shards = comp["host"].map(self._host_shard_cached).to_numpy()
        comp_refs = []
        for s in np.unique(comp_shards):
            g = comp.loc[comp_shards == s]
            comp_refs.append(self.frontier[s].complete.remote({
                "url": g["url"].to_list(),
                "host": g["host"].to_list(),
                "ok": g["ok"].to_list(),
                "attempts": g["attempts_count"].to_list(),
                "is_webnews": g["is_webnews"].to_list(),
                "round_added": g["work_round"].to_list(),
                "seq64": g["work_seq64"].to_list(),
                "url_to_refer": g["work_ref"].to_list(),
            }))
        exhausted: set = set()
        if enq_refs:
            ray.get(enq_refs)   # joint barrier with completions below
        for r in ray.get(comp_refs):
            exhausted.update(r["exhausted"])
        self.phase_secs["commit"] = (self.phase_secs.get("commit", 0.0)
                                     + time.perf_counter() - commit_t0)
        return out, exhausted

    def _host_shard_cached(self, host: str) -> int:
        s = self._host_shard_memo.get(host)
        if s is None:
            s = self._host_shard_memo[host] = urlnorm.host_shard(
                host, len(self.frontier))
        return s

    def _route_shard(self, host: str, url: str) -> int:
        """Frontier shard for (host, url): plain host hash, or salted by
        the url for hosts in cfg.salt_hosts."""
        k = self.cfg.salt_hosts.get(host, 1)
        if k <= 1:
            return self._host_shard_cached(host)
        salt = urlnorm.url_shard(url, k)
        return urlnorm.host_shard(host, len(self.frontier), salt=salt)

    def _commit_round(self, n_work: int, log_refs=None, stat_refs=None,
                      seen_refs=None):
        """Round bookkeeping. ``log_refs``/``stat_refs``/``seen_refs``
        are the pre-submitted shard RPCs from run() (submitted before the
        next round's dequeue so each shard reads its round-N state);
        submitted here when absent (checkpoint/resume callers)."""
        cfg = self.cfg
        logs = _merge_batches(ray.get(
            log_refs if log_refs is not None else
            [f.drain_order_log.remote() for f in self.frontier]))
        order_dir = os.path.join(cfg.out_dir, "crawl_order")
        os.makedirs(order_dir, exist_ok=True)
        pq.write_table(pa.table({
            "host": pa.array(logs["host"], pa.string()),
            "host_seq": pa.array(logs["host_seq"], pa.int64()),
            "url": pa.array(logs["url"], pa.string()),
            "priority_tier": pa.array(logs["priority_tier"], pa.int32()),
        }), os.path.join(order_dir, f"round-{self.round}.parquet"))

        stats = ray.get(stat_refs if stat_refs is not None else
                        [f.stats.remote() for f in self.frontier])
        seen_total = sum(ray.get(seen_refs if seen_refs is not None else
                                 [s.count.remote() for s in self.seen]))
        in_flight = sum(s["in_flight"] for s in stats)
        assert in_flight == 0, f"in-flight leak at round barrier: {in_flight}"
        m = {
            "round": self.round,
            "dequeued": n_work,
            "pending": sum(s["pending"] for s in stats),
            "enqueued_total": sum(s["enqueued_total"] for s in stats),
            "robots_rejected": sum(s["robots_rejected"] for s in stats),
            "seen_total": seen_total,
        }
        self.metrics.append(m)
        with open(os.path.join(cfg.out_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(m) + "\n")
        if (self.round + 1) % cfg.checkpoint_every == 0:
            self._checkpoint()

    # -- checkpoint / resume (north_rule) ------------------------------
    def _checkpoint(self):
        ck = os.path.join(self.cfg.out_dir, "checkpoint")
        os.makedirs(ck, exist_ok=True)
        refs = []
        for i, s in enumerate(self.seen):
            refs.append(s.snapshot.remote(os.path.join(ck, f"seen-{i}.parquet")))
        for i, f in enumerate(self.frontier):
            refs.append(f.snapshot.remote(os.path.join(ck, f"frontier-{i}.parquet")))
        ray.get(refs)
        manifest = {"round": self.round,
                    "num_seen_shards": len(self.seen),
                    "num_frontier_shards": len(self.frontier),
                    "rss_last_update": self._rss_last_update,
                    "rss_seq": self._rss_seq,
                    "rss_discovered": sorted(self._rss_discovered),
                    "metrics": self.metrics[-1] if self.metrics else {}}
        tmp = os.path.join(ck, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(ck, "manifest.json"))

    def _resume(self):
        ck = os.path.join(self.cfg.out_dir, "checkpoint")
        with open(os.path.join(ck, "manifest.json")) as f:
            manifest = json.load(f)
        done_round = manifest["round"]
        self._rss_last_update = manifest.get("rss_last_update", {})
        self._rss_seq = manifest.get("rss_seq", 1_000_000)
        self._rss_discovered = set(manifest.get("rss_discovered", []))
        refs = []
        for i, s in enumerate(self.seen):
            refs.append(s.restore.remote(os.path.join(ck, f"seen-{i}.parquet")))
        for i, fr in enumerate(self.frontier):
            refs.append(fr.restore.remote(os.path.join(ck, f"frontier-{i}.parquet")))
        ray.get(refs)
        # drop partially-committed rounds (round either commits or replays)
        pages = os.path.join(self.cfg.out_dir, "pages")
        if os.path.isdir(pages):
            for d in os.listdir(pages):
                if d.startswith("round=") and int(d.split("=")[1]) > done_round:
                    shutil.rmtree(os.path.join(pages, d))
        order = os.path.join(self.cfg.out_dir, "crawl_order")
        if os.path.isdir(order):
            for fl in os.listdir(order):
                if int(fl.split("-")[1].split(".")[0]) > done_round:
                    os.remove(os.path.join(order, fl))
        self.round = done_round + 1

    # -- results -------------------------------------------------------
    def summary(self) -> dict:
        stats = ray.get([f.stats.remote() for f in self.frontier])
        return {
            "rounds": self.round,
            "pages_written": sum(m["dequeued"] for m in self.metrics),
            "seen_total": sum(ray.get([s.count.remote() for s in self.seen])),
            "enqueued_total": sum(s["enqueued_total"] for s in stats),
            "pending": sum(s["pending"] for s in stats),
            "phase_secs": {k: round(v, 3)
                           for k, v in sorted(self.phase_secs.items())},
        }

    def pages_dataset(self) -> "rd.Dataset":
        from ..rayutil import read_parquet
        return read_parquet(os.path.join(self.cfg.out_dir, "pages"))

    def crawl_order_table(self) -> pa.Table:
        order_dir = os.path.join(self.cfg.out_dir, "crawl_order")
        files = sorted(os.listdir(order_dir),
                       key=lambda f: int(f.split("-")[1].split(".")[0]))
        return pa.concat_tables([pq.read_table(os.path.join(order_dir, f))
                                 for f in files])

    def shutdown(self):
        for a in self.seen + self.frontier:
            ray.kill(a)
        directory = self.corpus_refs.get("directory")
        if directory is not None:
            ray.kill(directory)
