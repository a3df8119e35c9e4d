"""Deterministic synthetic Common-Crawl-style page corpus.

Generates the Parquet ``pages`` table per BASELINE.json ``input_hint``
(``url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string``) plus the generator sidecars defined in FIXTURES.md:
``fetchmeta`` (status / redirect_to / mime_type — synthesizes the network
behaviors of crawler.py:90-127), ``seeds`` and ``politeness``.

Everything is a pure function of (seed, host index, page index) — no
wall-clock, no RNG state leakage — so any slice of the corpus can be
regenerated independently, which is also how generation parallelizes
(one task per host shard writing its own partition directory; the same
layout a 100 TB corpus would use: ``pages/host_bucket=NN/part.parquet``,
partition-pruned by the fetch/replay stage).

The embedded link graph exercises every reference URL operator: relative
(``/p``, ``//host/p``) hrefs, percent-encoding, query strings, BAD_TOKENS
paths, off-host links, redirects and error pages (FIXTURES.md §1). The
``text`` column is the analytically-known article body — the golden value
the extract kernel must reproduce byte-identically (tested in
tests/test_extract.py, not derived by running the kernel).
"""

from __future__ import annotations

import hashlib
import os
import random
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from .extract.textstats import STOPWORDS

EPOCH_BASE_US = 1_600_000_000_000_000  # 2020-09-13, deterministic warc_ts base

SECTIONS = ["politica", "economia", "cronaca", "esteri", "cultura"]

# deterministic content-word pools per language: pseudo-words (no
# HTML-escapable characters) plus a non-ASCII slice per language so
# body text exercises 2-byte (Latin accents), 3-byte (CJK) and 4-byte
# (astral) codepoints end-to-end through the fetch/extract/Ray-block
# path (VERDICT r3 item 2: an ASCII-only fixture hid an overflow for
# two rounds). URL slugs stay ASCII — _slug filters the pool — so IRI
# handling stays out of scope, matching the reference's ASCII urls.
_UNICODE_WORDS = {
    "it": ["perché", "città", "caffè"],
    "en": ["naïve", "café", "résumé"],
    "es": ["niño", "mañana", "corazón"],
    "de": ["über", "größe", "straße"],
    "fr": ["déjà", "être", "français"],
}
_CONTENT_WORDS = {
    lang: [f"{lang}word{i}" for i in range(40)]
    + _UNICODE_WORDS[lang] + ["新闻报道", "経済ニュース", "📰🗞️"]
    for lang in ("it", "en", "es", "de", "fr")
}


@dataclass
class CorpusSpec:
    num_hosts: int = 3
    pages_per_host: int = 60
    hot_host_factor: int = 4     # host 0 gets factor× pages (skew fixture)
    seed: int = 42
    num_buckets: int = 8         # host-hash partition dirs for pages/
    langs: tuple = ("it", "en", "es", "de", "fr")
    redirect_every: int = 11     # every Nth article gets a redirect alias
    error_every: int = 13        # every Nth page slot is a 404/500
    # S8 auto-discovery fixture: each host gets one article that NO hub
    # links to — it is reachable ONLY through the host's RSS feed, so a
    # crawl visits it iff the advertised feed was discovered and parsed
    feed_only_article: bool = False


CORPUS_VERSION = 7   # bump when generated content changes (cache key)


@dataclass
class CorpusPaths:
    root: str
    pages_dir: str
    fetchmeta: str     # bucket-partitioned directory (fetchmeta/host_bucket=NN/)
    seeds: str
    politeness: str
    feeds: str = ""
    whois: str = ""    # S7 per-host registration metadata sidecar
    host_pages: dict = field(default_factory=dict)  # host -> page count


def _rng(spec_seed: int, *parts) -> random.Random:
    h = hashlib.sha1(("\x00".join(map(str, (spec_seed,) + parts))).encode())
    return random.Random(int.from_bytes(h.digest()[:8], "big"))


def host_name(i: int) -> str:
    return f"news-{i}.example"


def _feed_only_url(host: str) -> str:
    """The feed-only article url (see CorpusSpec.feed_only_article)."""
    return f"http://{host}/{SECTIONS[1]}/2021/05/05/feed-only-story-0.html"


def host_bucket(host: str, num_buckets: int) -> int:
    h = hashlib.sha1(host.encode()).digest()
    return int.from_bytes(h[:4], "big") % num_buckets


def _paragraphs(rng: random.Random, lang: str) -> list[str]:
    """2-5 paragraphs of stopword-rich sentences; single-spaced, no
    HTML-escapable characters, so the kernel's whitespace-collapse +
    unescape round-trips byte-identically."""
    stops = sorted(STOPWORDS[lang])
    words = _CONTENT_WORDS[lang]
    paras = []
    for _ in range(rng.randint(2, 5)):
        sentences = []
        for _ in range(rng.randint(2, 4)):
            toks = []
            for w in range(rng.randint(8, 14)):
                pool = stops if w % 2 == 0 else words
                toks.append(rng.choice(pool))
            sent = " ".join(toks)
            sentences.append(sent[0].upper() + sent[1:] + ".")
        paras.append(" ".join(sentences))
    return paras


def _slug(rng: random.Random, lang: str) -> str:
    # ASCII-only pool: urls stay plain ASCII (see _CONTENT_WORDS note)
    words = [w for w in _CONTENT_WORDS[lang] if w.isascii()]
    return "-".join(rng.choice(words) for _ in range(6))


_FIRST = ["Mario", "Anna", "Luca", "Sofia", "Paolo", "Elena", "Marco", "Giulia"]
_LAST = ["Rossi", "Bianchi", "Ferrari", "Russo", "Romano", "Gallo", "Conti"]


def _article_html(host: str, url_path: str, title: str, author: str,
                  date_iso: str, section: str, lang: str,
                  paragraphs: list[str], links: list[str],
                  video: str | None) -> str:
    nav = (f'<nav id="topnav"><ul>'
           f'<li><a href="/">Home</a></li>'
           f'<li><a href="/{section}/hub-0.html">{section}</a></li>'
           f'<li><a href="/about/team.html">About</a></li>'
           f'<li><a href="/privacy.html">Privacy</a></li>'
           f'</ul></nav>')
    body_ps = "\n".join(f"<p>{p}</p>" for p in paragraphs)
    related = " ".join(f'<a href="{u}">rel link {i}</a>'
                       for i, u in enumerate(links))
    vid = f'<iframe src="{video}"></iframe>' if video else ""
    return f"""<!DOCTYPE html>
<html lang="{lang}">
<head>
<title>{title} | {host} Daily</title>
<script src="http://ads.tracker.example/ads/serve.js?slot={len(paragraphs)}"></script>
<link rel="stylesheet" href="http://cdn.static.example/css/main.css"/>
<script src="http://facebook.com/sdk.js"></script>
<script src="http://cdn.static.example/photo.jpg"></script>
<meta property="og:type" content="article"/>
<meta property="og:title" content="{title}"/>
<meta property="article:published_time" content="{date_iso}"/>
<meta name="author" content="{author}"/>
<meta itemprop="articleSection" content="{section}"/>
<meta property="og:image" content="http://{host}/img{url_path}.jpg"/>
</head>
<body>
<header id="hdr">{nav}</header>
<div id="main-content">
<h1>{title}</h1>
<div class="article-body" itemprop="articleBody">
{body_ps}
</div>
{vid}
<div class="related">{related}</div>
</div>
<footer id="ftr" itemtype="http://schema.org/WPFooter"><img src="http://cdn.static.example/logo.gif"/><a href="/about/chi-siamo.html">Chi siamo</a> <a href="/contact/form.html">Contatti</a></footer>
</body></html>"""


def _hub_html(host: str, section: str, lang: str, links: list[str],
              advertise_feed: bool = False) -> str:
    items = "\n".join(f'<li><a href="{u}">item {i}</a></li>'
                      for i, u in enumerate(links))
    junk = ('<a href="mailto:x@y.example">mail</a> '
            f'<a href="http://{host}/img/banner.jpg">banner</a> '
            f'<a href="http://{host}/p/q?share=twitter">share</a> '
            '<a href="http://shop.other.example/cart">buy</a>')
    # S8 auto-discovery fixture: the root hub advertises the host feed
    # with a RELATIVE href (exercises the kernel's head-link
    # absolutization; extractor.py:137-140 tier of the cascade)
    feed_link = ('<link rel="alternate" type="application/rss+xml" '
                 f'title="{host} feed" href="/rss/feed.xml"/>'
                 if advertise_feed else "")
    return f"""<!DOCTYPE html>
<html lang="{lang}">
<head><title>{section} hub | {host} Daily</title>{feed_link}</head>
<body>
<nav id="hubnav"><ul>
{items}
</ul></nav>
<div id="promo">{junk}</div>
</body></html>"""


def generate_corpus(out_dir: str, spec: CorpusSpec | None = None,
                    hosts: range | None = None) -> CorpusPaths:
    """Write the corpus under ``out_dir``. Idempotent for a given spec
    (existing complete output is reused — the resumability contract a
    100 TB generation run needs)."""
    spec = spec or CorpusSpec()
    paths = CorpusPaths(
        root=out_dir,
        pages_dir=os.path.join(out_dir, "pages"),
        fetchmeta=os.path.join(out_dir, "fetchmeta"),
        seeds=os.path.join(out_dir, "seeds.parquet"),
        politeness=os.path.join(out_dir, "politeness.parquet"),
        feeds=os.path.join(out_dir, "feeds.parquet"),
        whois=os.path.join(out_dir, "whois.parquet"),
    )
    done_marker = os.path.join(out_dir, "_DONE")
    meta_path = os.path.join(out_dir, "corpus_meta.json")
    for h in range(spec.num_hosts):
        n = spec.pages_per_host * (spec.hot_host_factor if h == 0 else 1)
        paths.host_pages[host_name(h)] = n
    if os.path.exists(done_marker):
        return paths
    os.makedirs(paths.pages_dir, exist_ok=True)

    buckets: dict[int, dict[str, list]] = {}

    def emit(bucket: int, url, ts, html, text, lang, status, redirect_to, mime):
        cols = buckets.setdefault(bucket, {
            "url": [], "warc_ts": [], "html": [], "text": [], "lang": [],
            "status": [], "redirect_to": [], "mime_type": []})
        cols["url"].append(url)
        cols["warc_ts"].append(ts)
        cols["html"].append(html.encode("utf-8") if html else b"")
        cols["text"].append(text)
        cols["lang"].append(lang)
        cols["status"].append(status)
        cols["redirect_to"].append(redirect_to)
        cols["mime_type"].append(mime)

    row_index = 0
    for h in range(spec.num_hosts):
        host = host_name(h)
        bucket = host_bucket(host, spec.num_buckets)
        lang = spec.langs[h % len(spec.langs)]
        n_pages = paths.host_pages[host]
        n_hubs = max(2, n_pages // 12)
        n_articles = n_pages - n_hubs

        art_urls, art_is_error, art_redirects = [], [], {}
        for a in range(n_articles):
            rng = _rng(spec.seed, host, "art", a)
            section = SECTIONS[a % len(SECTIONS)]
            y, m, d = 2020 + a % 3, 1 + a % 12, 1 + a % 28
            slug = _slug(rng, lang)
            url = f"http://{host}/{section}/{y}/{m:02d}/{d:02d}/{slug}-{a}.html"
            art_urls.append(url)
            art_is_error.append(spec.error_every and a % spec.error_every == spec.error_every - 1)
            if spec.redirect_every and a % spec.redirect_every == spec.redirect_every - 1:
                art_redirects[a] = f"http://{host}/{section}/r/{a}-old.html"

        hub_urls = [f"http://{host}/{SECTIONS[i % len(SECTIONS)]}/hub-{i}.html"
                    for i in range(n_hubs)]
        window = (n_articles + n_hubs - 1) // n_hubs

        # M28 fixture (host 0 only): a real article served with a
        # charset-suffixed mime — the reference's EXACT mime comparison
        # (crawler.py:133) must record it scraped-without-article while
        # the kernel itself still extracts its text (golden text kept)
        charset_url = (f"http://{host}/misc/charset-note.html"
                       if h == 0 else None)

        # hubs: heap-tree fanout (diameter O(log n_hubs) so crawl depth
        # doesn't grow linearly with host size) + article windows
        # (+ redirect aliases discovered here)
        for i, url in enumerate(hub_urls):
            rng = _rng(spec.seed, host, "hub", i)
            links = [hub_urls[c] for c in (2 * i + 1, 2 * i + 2)
                     if c < n_hubs]
            lo = i * window
            for a in range(lo, min(lo + window, n_articles)):
                links.append(art_redirects.get(a, art_urls[a]))
            if h + 1 < spec.num_hosts:  # off-host link (must be filtered)
                links.append(f"http://{host_name(h + 1)}/{SECTIONS[0]}/hub-0.html")
            if charset_url and i == 0:
                links.append(charset_url)
            html = _hub_html(host, SECTIONS[i % len(SECTIONS)], lang, links,
                             advertise_feed=(i == 0))
            emit(bucket, url, EPOCH_BASE_US + row_index * 1_000_000, html,
                 "", lang, 200, None, "text/html")
            row_index += 1

        if spec.feed_only_article:
            rng = _rng(spec.seed, host, "feedonly", 0)
            paragraphs = _paragraphs(rng, lang)
            fo_url = _feed_only_url(host)
            html = _article_html(host, "/feedonly", "Feed Only Story",
                                 f"{rng.choice(_FIRST)} {rng.choice(_LAST)}",
                                 "2021-05-05T08:00:00", SECTIONS[1], lang,
                                 paragraphs, [], None)
            emit(bucket, fo_url, EPOCH_BASE_US + row_index * 1_000_000,
                 html, " ".join(paragraphs), lang, 200, None, "text/html")
            row_index += 1

        if charset_url:
            rng = _rng(spec.seed, host, "charset", 0)
            paragraphs = _paragraphs(rng, lang)
            html = _article_html(host, "/charset", "Charset Note",
                                 f"{rng.choice(_FIRST)} {rng.choice(_LAST)}",
                                 "2021-06-01T09:30:00", SECTIONS[0], lang,
                                 paragraphs, [], None)
            emit(bucket, charset_url, EPOCH_BASE_US + row_index * 1_000_000,
                 html, " ".join(paragraphs), lang, 200, None,
                 "text/html; charset=utf-8")
            row_index += 1

        # articles (+ error pages + redirect alias rows)
        for a, url in enumerate(art_urls):
            rng = _rng(spec.seed, host, "art", a)
            ts = EPOCH_BASE_US + row_index * 1_000_000
            if art_is_error[a]:
                emit(bucket, url, ts, "", "", lang,
                     404 if a % 2 else 500, None, "text/html")
                row_index += 1
                continue
            section = url.split("/")[3]
            paragraphs = _paragraphs(rng, lang)
            title = " ".join(w.capitalize() for w in
                             url.rsplit("/", 1)[-1][:-5].split("-")[:4])
            author = f"{rng.choice(_FIRST)} {rng.choice(_LAST)}"
            y, m, d = url.split("/")[4:7]
            date_iso = f"{y}-{m}-{d}T09:30:00"
            peers = [art_urls[(a * 7 + k + 1) % n_articles] for k in range(3)]
            video = (f"http://youtube.example/embed/v{a}" if a % 9 == 0 else None)
            html = _article_html(host, f"/{a}", title, author, date_iso,
                                 section, lang, paragraphs, peers, video)
            golden_text = " ".join(paragraphs)
            emit(bucket, url, ts, html, golden_text, lang, 200, None, "text/html")
            row_index += 1
        for a, alias in sorted(art_redirects.items()):
            emit(bucket, alias, EPOCH_BASE_US + row_index * 1_000_000, "",
                 "", lang, 301, art_urls[a], "text/html")
            row_index += 1

    # S2 fixture: a redirecting seed whose chain lands CROSS-HOST (the
    # alias lives only in fetchmeta — it has no page row, exactly like a
    # URL whose fetch always 301s; the engine/oracle must route the
    # resolved url to the resolved HOST's frontier shard and bucket,
    # ADVICE r1 item 2)
    seed_urls = [f"http://{host_name(h)}/{SECTIONS[0]}/hub-0.html"
                 for h in range(spec.num_hosts)]
    extra_meta: list[tuple] = []   # (host, url, status, redirect_to, mime)
    if spec.num_hosts >= 2:
        alias = f"http://{host_name(0)}/seed/landing.html"
        target = (f"http://{host_name(1)}/"
                  f"{SECTIONS[1 % len(SECTIONS)]}/hub-1.html")
        extra_meta.append((host_name(0), alias, 301, target, "text/html"))
        seed_urls.append(alias)

    # write partitioned pages + bucket-partitioned fetchmeta sidecar
    # (fetchmeta is corpus-sized at scale → partitioned and lazily
    # loaded per bucket exactly like the pages, VERDICT r1 item 7)
    meta_by_bucket: dict[int, dict] = {
        b: {"url": list(cols["url"]), "status": list(cols["status"]),
            "redirect_to": list(cols["redirect_to"]),
            "mime_type": list(cols["mime_type"])}
        for b, cols in buckets.items()}
    for mhost, murl, mstatus, mredir, mmime in extra_meta:
        b = host_bucket(mhost, spec.num_buckets)
        cols = meta_by_bucket.setdefault(b, {
            "url": [], "status": [], "redirect_to": [], "mime_type": []})
        cols["url"].append(murl)
        cols["status"].append(mstatus)
        cols["redirect_to"].append(mredir)
        cols["mime_type"].append(mmime)

    for bucket, cols in sorted(buckets.items()):
        part_dir = os.path.join(paths.pages_dir, f"host_bucket={bucket}")
        os.makedirs(part_dir, exist_ok=True)
        table = pa.table({
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
            "html": pa.array(cols["html"], pa.binary()),
            "text": pa.array(cols["text"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
        })
        # chunked files + small row groups so readers can parallelize
        # (one giant file = one read task = a serial scan)
        chunk = 4096
        for fi, off in enumerate(range(0, table.num_rows, chunk)):
            pq.write_table(table.slice(off, chunk),
                           os.path.join(part_dir, f"part-{fi:04d}.parquet"),
                           row_group_size=1024)
    for bucket, cols in sorted(meta_by_bucket.items()):
        meta_dir = os.path.join(paths.fetchmeta, f"host_bucket={bucket}")
        os.makedirs(meta_dir, exist_ok=True)
        pq.write_table(pa.table({
            "url": pa.array(cols["url"], pa.string()),
            "status": pa.array(cols["status"], pa.int32()),
            "redirect_to": pa.array(cols["redirect_to"], pa.string()),
            "mime_type": pa.array(cols["mime_type"], pa.string()),
        }), os.path.join(meta_dir, "part-0000.parquet"))

    pq.write_table(pa.table({
        "url": pa.array(seed_urls, pa.string()),
        "seq": pa.array(list(range(len(seed_urls))), pa.int64()),
    }), paths.seeds)

    # S7 whois sidecar: deterministic per-host registration metadata
    # (reference whoisinfo.py:39-104; synthesis in sources/whois.py)
    from .sources.whois import whois_frame
    pq.write_table(pa.Table.from_pandas(
        whois_frame(list(paths.host_pages.keys())), preserve_index=False),
        paths.whois)

    # RSS feeds: one per host, first articles as items (S8 fixture)
    feed_hosts, feed_urls, feed_xml = [], [], []
    for h in range(spec.num_hosts):
        host = host_name(h)
        lang = spec.langs[h % len(spec.langs)]
        items = []
        for a in range(min(10, paths.host_pages[host])):
            rng = _rng(spec.seed, host, "art", a)
            section = SECTIONS[a % len(SECTIONS)]
            y, m, d = 2020 + a % 3, 1 + a % 12, 1 + a % 28
            slug = _slug(rng, lang)
            url = f"http://{host}/{section}/{y}/{m:02d}/{d:02d}/{slug}-{a}.html"
            title = " ".join(w.capitalize() for w in slug.split("-")[:4])
            items.append(
                f"<item><title>{title}</title><link>{url}</link>"
                f"<category>{section}</category>"
                f"<pubDate>Mon, 0{1 + a % 9} Jun 2021 10:00:00 GMT</pubDate></item>")
        if spec.feed_only_article:
            items.append(
                f"<item><title>Feed Only Story</title>"
                f"<link>{_feed_only_url(host)}</link>"
                f"<category>{SECTIONS[1]}</category>"
                f"<pubDate>Wed, 05 May 2021 08:00:00 GMT</pubDate></item>")
        xml = (f'<?xml version="1.0"?><rss version="2.0"><channel>'
               f"<title>{host} feed</title><language>{lang}</language>"
               f"<lastBuildDate>Tue, 01 Jun 2021 09:00:00 GMT</lastBuildDate>"
               f"{''.join(items)}</channel></rss>")
        feed_hosts.append(host)
        feed_urls.append(f"http://{host}/rss/feed.xml")
        feed_xml.append(xml.encode())
    pq.write_table(pa.table({
        "host": pa.array(feed_hosts, pa.string()),
        "url": pa.array(feed_urls, pa.string()),
        "xml": pa.array(feed_xml, pa.binary()),
    }), paths.feeds)

    pq.write_table(pa.table({
        "host": pa.array([host_name(h) for h in range(spec.num_hosts)], pa.string()),
        "max_in_flight": pa.array([6] * spec.num_hosts, pa.int32()),   # main.py:19
        "min_interval_ms": pa.array([0] * spec.num_hosts, pa.int64()),
        "max_attempts": pa.array([2] * spec.num_hosts, pa.int32()),    # crawler.py:342
    }), paths.politeness)

    import json
    with open(meta_path, "w") as f:
        json.dump({"num_buckets": spec.num_buckets,
                   "num_hosts": spec.num_hosts,
                   "seed": spec.seed}, f)
    with open(done_marker, "w") as f:
        f.write("ok")
    return paths


def default_corpus(tag: str, **spec_kwargs) -> CorpusPaths:
    """Cached corpus under /tmp keyed by tag+spec; regenerated only when
    absent."""
    spec = CorpusSpec(**spec_kwargs)
    key = (f"{tag}_h{spec.num_hosts}_p{spec.pages_per_host}"
           f"_f{spec.hot_host_factor}_s{spec.seed}_v{CORPUS_VERSION}"
           + ("_fo" if spec.feed_only_article else ""))
    out = os.path.join("/tmp", f"ncr_corpus_{key}")
    return generate_corpus(out, spec)
