"""Single-process crawl oracle for conformance testing.

A sequential reimplementation of the crawl semantics (SURVEY.md §5 item 1):
same urlnorm canonicalization, same frontier/seen cores (plain objects, no
Ray), same fetch-replay and extract batch kernels — but one thread, one
shard, explicit loop. The distributed engine (pipelines/crawl.py) must
reproduce the oracle's per-host dequeue order, URL-seen membership and
page rows exactly; the discovery-routing logic here is written
independently of ``_route_and_commit`` so the comparison exercises it.
"""

from __future__ import annotations

import pyarrow as pa

from . import urlnorm
from .stages.extract_stage import PAGE_OUTPUT_COLUMNS, _extract
from .stages.fetch import _CorpusStore, _replay
from .state.frontier import Frontier
from .state.seen import SeenSet
from .extract import ExtractKernel
from .pipelines.crawl import LINK_SEQ_STRIDE


def crawl_oracle(corpus_root: str, *, only_webnews: bool = False,
                 max_attempts: int = 2, dequeue_cap: int = 200,
                 max_in_flight_override: int | None = None,
                 round_ms: int = 1000, max_rounds: int = 10_000,
                 rss_discovery: bool = False,
                 sitemaps: bool = True) -> dict:
    """Run the crawl sequentially; returns
    ``{"pages": pa.Table, "order": pa.Table, "seen": set[str]}``.

    ``rss_discovery`` mirrors the engine's S8 auto-discovery contract
    (reference RssFinder, rss_finder.py:12-39), written independently of
    the engine's ``_enqueue_rss``: after each round, the distinct
    canonical feed urls advertised by that round's pages (the kernel's
    extract_feed_rss cascade) are matched against the corpus feeds
    sidecar; each NEWLY discovered feed's entries are seen-checked and
    enqueued for the next round in sidecar row order."""
    import os
    import pyarrow.parquet as pq

    fetchmeta = os.path.join(corpus_root, "fetchmeta")
    if not os.path.isdir(fetchmeta):
        fetchmeta = os.path.join(corpus_root, "fetchmeta.parquet")
    store = _CorpusStore(os.path.join(corpus_root, "pages"), fetchmeta)
    kernel = ExtractKernel()
    frontier = Frontier(default_max_attempts=max_attempts)
    seen = SeenSet()

    pol_path = os.path.join(corpus_root, "politeness.parquet")
    if os.path.exists(pol_path):
        rows = pq.read_table(pol_path).to_pydict()
        if max_in_flight_override:
            rows["max_in_flight"] = [max_in_flight_override] * len(rows["host"])
        frontier.configure_hosts(rows)

    seeds = pq.read_table(os.path.join(corpus_root, "seeds.parquet")).to_pydict()
    recs = {k: [] for k in ("url", "host", "is_webnews", "round_added",
                            "seq64", "url_to_refer")}
    for url, seq in sorted(zip(seeds["url"], seeds["seq"]), key=lambda x: x[1]):
        # S2: resolve the seed's redirect chain, then route by the
        # RESOLVED host (parity with CrawlEngine._enqueue_seeds)
        canon = store.resolve_chain(urlnorm.canonical_url(url))
        if seen.add_if_absent([urlnorm.url_key(canon)])[0]:
            recs["url"].append(canon)
            recs["host"].append(urlnorm.host_of(canon))
            recs["is_webnews"].append(urlnorm.is_news_url(canon))
            recs["round_added"].append(0)
            recs["seq64"].append(seq)
            recs["url_to_refer"].append(None)
    frontier.enqueue(recs)

    # Sitemap discovery (engine `_enqueue_sitemaps` contract, written
    # independently): robots ``Sitemap:`` lines → sidecar bodies →
    # page entries seen-checked and enqueued at round 0 in
    # advertisement order, seq64 block at 2,000,000 (after RSS).
    # Default ON to mirror CrawlConfig.scrape_sitemaps: both sides
    # then gate purely on sidecar presence, staying in lockstep by
    # construction for any corpus that gains the sidecars.
    if sitemaps:
        rpath = os.path.join(corpus_root, "robots.parquet")
        spath = os.path.join(corpus_root, "sitemaps.parquet")
        if os.path.exists(rpath) and os.path.exists(spath):
            from .functions.robots import sitemap_urls
            from .sources.sitemap import expand_sitemaps
            rt = pq.read_table(rpath).to_pydict()
            st = pq.read_table(spath).to_pydict()
            bodies = {urlnorm.canonical_url(u): x
                      for u, x in zip(st["url"], st["xml"])}
            advertised: list[str] = []
            for body in rt["robots_txt"]:
                advertised.extend(sitemap_urls(body or ""))
            sm_seq = 2_000_000
            enq = {k: [] for k in ("url", "host", "is_webnews",
                                   "round_added", "seq64",
                                   "url_to_refer")}
            for loc, sm_url in expand_sitemaps(
                    advertised, bodies, canon=urlnorm.canonical_url):
                link = urlnorm.clean_url(loc, remove_arguments=False)
                canon = urlnorm.canonical_url(link)
                if not seen.add_if_absent([urlnorm.url_key(canon)])[0]:
                    sm_seq += 1
                    continue
                enq["url"].append(canon)
                enq["host"].append(urlnorm.host_of(link))
                enq["is_webnews"].append(urlnorm.is_news_url(link))
                enq["round_added"].append(0)
                enq["seq64"].append(sm_seq)
                enq["url_to_refer"].append(sm_url)
                sm_seq += 1
            frontier.enqueue(enq)

    # S8 auto-discovery state (sidecar rows in file order + the
    # browsed-once set + freshness timestamps + entry seq counter)
    feeds_rows: list[tuple] = []
    if rss_discovery:
        feeds_path = os.path.join(corpus_root, "feeds.parquet")
        if os.path.exists(feeds_path):
            fd = pq.read_table(feeds_path).to_pydict()
            feeds_rows = list(zip(fd["host"], fd["url"], fd["xml"]))
    rss_discovered: set[str] = set()
    rss_last_update: dict[str, str] = {}
    rss_seq = 1_000_000

    def enqueue_feed_entries(new_canon: set[str], round_added: int):
        nonlocal rss_seq
        from .sources.rss import parse_feed_xml
        for host, feed_url, xml in feeds_rows:
            if urlnorm.canonical_url(feed_url) not in new_canon:
                continue
            feed = parse_feed_xml(xml)
            updated = feed["updated"]
            last = rss_last_update.get(feed_url)
            if (last is not None and updated is not None
                    and not updated.isoformat() > last):
                continue
            if updated is not None:
                rss_last_update[feed_url] = updated.isoformat()
            enq = {k: [] for k in ("url", "host", "is_webnews",
                                   "round_added", "seq64", "url_to_refer")}
            for e in feed["entries"]:
                if not e["link"]:
                    continue
                link = urlnorm.clean_url(e["link"], remove_arguments=False)
                canon = urlnorm.canonical_url(link)
                if not seen.add_if_absent([urlnorm.url_key(canon)])[0]:
                    rss_seq += 1
                    continue
                enq["url"].append(canon)
                enq["host"].append(urlnorm.host_of(link))
                enq["is_webnews"].append(urlnorm.is_news_url(link))
                enq["round_added"].append(round_added)
                enq["seq64"].append(rss_seq)
                enq["url_to_refer"].append(feed_url)
                rss_seq += 1
            frontier.enqueue(enq)

    pages: list[pa.Table] = []
    rnd = 0
    while rnd < max_rounds:
        work = frontier.dequeue(rnd * round_ms, dequeue_cap)
        if not work["url"]:
            if frontier.pending_count() == 0:
                break
            rnd += 1
            continue
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
        out = _extract(kernel, _replay(store, table))
        cols = out.to_pydict()
        n = out.num_rows

        # discovery routing — independent sequential implementation of the
        # round-commit spec: per-round dedup by MIN (seq64, referrer)
        comp = {k: [] for k in ("url", "host", "ok", "attempts",
                                "is_webnews", "round_added", "seq64",
                                "url_to_refer")}
        raw: list[tuple] = []  # (canon, host, is_news, seq64, referrer)
        for i in range(n):
            for j, link in enumerate(cols["links"][i] or []):
                canon = urlnorm.split_url_and_scheme(link)[1]
                host = urlnorm.host_of(link)
                if not host:
                    continue
                is_news = urlnorm.is_news_url(link)
                if only_webnews and not is_news:
                    continue
                raw.append((canon, host, is_news,
                            cols["host_seq"][i] * LINK_SEQ_STRIDE + j,
                            cols["url"][i]))
            comp["url"].append(cols["url"][i])
            comp["host"].append(cols["host"][i])
            comp["ok"].append(cols["ok"][i])
            comp["attempts"].append(cols["attempts_count"][i])
            comp["is_webnews"].append(cols["is_webnews"][i])
            comp["round_added"].append(cols["work_round"][i])
            comp["seq64"].append(cols["work_seq64"][i])
            comp["url_to_refer"].append(cols["work_ref"][i])
        best: dict[str, tuple] = {}
        for canon, host, is_news, seq64, ref in raw:
            cur = best.get(canon)
            if cur is None or (seq64, ref) < (cur[3], cur[4]):
                best[canon] = (canon, host, is_news, seq64, ref)
        enq = {k: [] for k in ("url", "host", "is_webnews", "round_added",
                               "seq64", "url_to_refer")}
        for canon, host, is_news, seq64, ref in sorted(
                best.values(), key=lambda x: (x[3], x[0])):
            if seen.add_if_absent([urlnorm.url_key(canon)])[0]:
                enq["url"].append(canon)
                enq["host"].append(host)
                enq["is_webnews"].append(is_news)
                enq["round_added"].append(rnd + 1)
                enq["seq64"].append(seq64)
                enq["url_to_refer"].append(ref)
        frontier.enqueue(enq)
        # the frontier's own exhausted verdict gates terminal rows —
        # same single authority as the engine (ADVICE r1 item 1)
        exhausted = set(frontier.complete(comp)["exhausted"])

        # S8 auto-discovery: newly advertised feeds → entries enqueue
        # for the next round (browsed-once; sidecar row order)
        if rss_discovery and feeds_rows:
            found = {urlnorm.canonical_url(u)
                     for lst in cols["feed_urls"] for u in (lst or []) if u}
            new = found - rss_discovered
            if new:
                rss_discovered.update(new)
                enqueue_feed_entries(new, rnd + 1)

        keep, codes, att = [], [], []
        for i in range(n):
            if cols["ok"][i]:
                keep.append(i)
                codes.append(cols["http_response_code"][i])
                att.append(cols["attempts_count"][i])
            elif cols["url"][i] in exhausted:
                keep.append(i)
                codes.append(-1)
                att.append(cols["attempts_count"][i] + 1)
        page = out.take(keep).select(PAGE_OUTPUT_COLUMNS)
        page = page.set_column(page.column_names.index("http_response_code"),
                               "http_response_code", pa.array(codes, pa.int32()))
        page = page.set_column(page.column_names.index("attempts_count"),
                               "attempts_count", pa.array(att, pa.int32()))
        pages.append(page)
        rnd += 1

    log = frontier.drain_order_log()
    order = pa.table({
        "host": pa.array(log["host"], pa.string()),
        "host_seq": pa.array(log["host_seq"], pa.int64()),
        "url": pa.array(log["url"], pa.string()),
        "priority_tier": pa.array(log["priority_tier"], pa.int32()),
    })
    return {
        "pages": pa.concat_tables(pages) if pages else None,
        "order": order,
        "seen_count": seen.count(),
    }
