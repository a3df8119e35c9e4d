"""Sitemap source: sitemaps.org protocol XML → frontier seed urls.

The reference crawler has no sitemap handling (its discovery surface
is seeds + RSS, crawler.py:427-470); sitemaps are the third standard
discovery channel of a production crawler and the natural companion of
the robots.txt sidecar — robots.txt advertises sitemap locations via
``Sitemap:`` lines (functions/robots.py `sitemap_urls`), and this
module parses the advertised documents. Like every other fetch in this
engine, sitemap BODIES come from a corpus sidecar
(``sitemaps.parquet``: ``url, xml``) — replay scope, no network.

Protocol subset (sitemaps.org/protocol.html):
- ``<urlset><url><loc>…</loc></url>…`` — page entries (the protocol
  caps a file at 50,000 entries / 50 MB; the cap is enforced so a
  corrupt or adversarial document cannot flood the frontier).
- ``<sitemapindex><sitemap><loc>…`` — nested sitemap references,
  resolved by the caller against the sidecar (the protocol allows one
  index level; callers guard with a visited-set anyway).
- gzip payloads (``.xml.gz``) sniffed by magic and inflated with a
  size cap (the same decompression-bomb rule as functions/png.py).
- namespaces ignored by matching local names, like sources/rss.py.

Malformed XML yields an empty result rather than an exception —
feedparser-style tolerance, matching ``parse_feed_xml``.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
import zlib

# protocol limit: 50,000 entries per sitemap file
MAX_ENTRIES = 50_000
# protocol limit: 50 MB uncompressed
MAX_INFLATED = 50 * 1024 * 1024


def _local(tag: str) -> str:
    """Strip the xmlns braces: '{ns}loc' → 'loc'."""
    return tag.rsplit("}", 1)[-1]


def parse_sitemap_xml(payload: bytes | str) -> dict:
    """Sitemap bytes → ``{"kind": "urlset" | "sitemapindex" | None,
    "locs": [str]}``. ``kind`` None means unparseable/foreign XML
    (tolerated, empty locs). Entry cap and gzip inflation cap per the
    protocol limits above."""
    if isinstance(payload, str):
        data = payload.encode("utf-8", "replace")
    else:
        data = payload or b""
    if data[:2] == b"\x1f\x8b":
        # Bound the INFLATED size, not the compressed input: 50 MB of
        # compressed data can inflate ~1000:1, so the cap must be
        # enforced by the decompressor itself (png.py's bounded-inflate
        # rule). wbits=31 selects the gzip wrapper.
        try:
            data = zlib.decompressobj(wbits=31).decompress(
                data, MAX_INFLATED)
        except zlib.error:
            return {"kind": None, "locs": []}
    try:
        root = ET.fromstring(data.decode("utf-8", "replace"))
    except ET.ParseError:
        return {"kind": None, "locs": []}
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        return {"kind": None, "locs": []}
    child = "url" if kind == "urlset" else "sitemap"
    locs: list[str] = []
    for node in root:
        if _local(node.tag) != child:
            continue
        for sub in node:
            if _local(sub.tag) == "loc" and sub.text and sub.text.strip():
                locs.append(sub.text.strip())
                break
        if len(locs) >= MAX_ENTRIES:
            break
    return {"kind": kind, "locs": locs}


def expand_sitemaps(start_urls: list[str], bodies: dict[str, bytes],
                    *, canon) -> list[tuple[str, str]]:
    """Walk sitemap references breadth-first: ``start_urls`` (from
    robots ``Sitemap:`` lines) are looked up in ``bodies`` (canonical
    url → xml bytes, the sidecar); index documents expand in place.
    Returns ``(page_url, sitemap_url)`` pairs in advertisement order —
    the sitemap_url is the DIRECT parent (lineage for url_to_refer).
    ``canon`` is the url canonicalizer (urlnorm.canonical_url; injected
    so this module stays import-light). A visited set makes reference
    cycles terminate; sitemaps not present in the sidecar are skipped
    exactly like a feed url no page advertised (pipelines/crawl.py
    `_enqueue_rss` rule)."""
    out: list[tuple[str, str]] = []
    queue = list(start_urls)
    visited: set[str] = set()
    while queue:
        sm_url = queue.pop(0)
        key = canon(sm_url)
        if key in visited:
            continue
        visited.add(key)
        body = bodies.get(key)
        if body is None:
            continue
        parsed = parse_sitemap_xml(body)
        if parsed["kind"] == "sitemapindex":
            queue.extend(parsed["locs"])
        elif parsed["kind"] == "urlset":
            out.extend((loc, sm_url) for loc in parsed["locs"])
    return out
