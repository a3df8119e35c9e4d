"""RSS feed source (S8): feed XML → pre-populated frontier/page records.

Rebuilds crawler.py:427-470 (`feedparser.parse` over per-domain feeds →
entries become pre-known pages rows) without feedparser (unavailable):
a stdlib ``xml.etree`` parser for the RSS 2.0 subset the reference
consumes (channel title/language/lastBuildDate, item title/link/pubDate).

Reference parity notes:
- entry links are cleaned with ``clean_url(link, remove_arguments=False)``
  (crawler.py:452)
- ``category`` on the pre-populated row is the CHANNEL title, not the
  item category (crawler.py:447: ``sections=[feed_sections]`` where
  feed_sections = parsed_feed.feed.title — crawler.py:439)
- channel language truncated to 2 lowercase chars (crawler.py:441-443)
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from email.utils import parsedate_to_datetime

import pandas as pd
import pyarrow as pa

import ray.data as rd

from .. import urlnorm


def _parse_date(s: str | None):
    if not s:
        return None
    try:
        return parsedate_to_datetime(s).replace(tzinfo=None)
    except (TypeError, ValueError):
        return None


def parse_feed_xml(xml_bytes: bytes) -> dict:
    """→ {title, language, updated, entries: [{title, link, category,
    published}]} — tolerant of missing fields like feedparser."""
    out = {"title": None, "language": None, "updated": None, "entries": []}
    try:
        root = ET.fromstring(xml_bytes.decode("utf-8", "replace"))
    except ET.ParseError:
        return out
    channel = root.find("channel")
    if channel is None:
        return out
    out["title"] = channel.findtext("title")
    lang = channel.findtext("language")
    if lang and len(lang) >= 2:
        lang = lang[:2].lower()
    out["language"] = lang
    out["updated"] = _parse_date(channel.findtext("lastBuildDate"))
    # feed entry cap (reference caps feeds at 50 entries — SURVEY.md §2.6 O4)
    for item in channel.findall("item")[:50]:
        out["entries"].append({
            "title": item.findtext("title"),
            "link": item.findtext("link"),
            "category": item.findtext("category"),
            "published": _parse_date(item.findtext("pubDate")),
        })
    return out


def rss_entries(feeds_ds: "rd.Dataset") -> "rd.Dataset":
    """Feeds table (host, url, xml) → one row per entry with the
    reference's pre-populated page metadata (crawler.py:444-455):
    (feed_url, host, url, is_webnews, title_art, publish_date, category,
    language)."""

    def parse_batch(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {k: [] for k in ("feed_url", "host", "url", "is_webnews",
                                "title_art", "publish_date", "category",
                                "language")}
        for host, feed_url, xml in zip(batch["host"], batch["url"],
                                       batch["xml"]):
            feed = parse_feed_xml(xml)
            for e in feed["entries"]:
                if not e["link"]:
                    continue
                link = urlnorm.clean_url(e["link"], remove_arguments=False)
                rows["feed_url"].append(feed_url)
                rows["host"].append(host)
                rows["url"].append(urlnorm.canonical_url(link))
                rows["is_webnews"].append(urlnorm.is_news_url(link))
                rows["title_art"].append(e["title"])
                rows["publish_date"].append(
                    e["published"].strftime("%Y-%m-%d %H:%M:%S")
                    if e["published"] else None)
                # channel title, not item category (crawler.py:447)
                rows["category"].append([feed["title"]] if feed["title"] else [])
                rows["language"].append(feed["language"])
        return pd.DataFrame(rows)

    return feeds_ds.map_batches(parse_batch, batch_format="pandas")
