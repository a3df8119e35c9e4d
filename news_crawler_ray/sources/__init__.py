from .rss import parse_feed_xml, rss_entries  # noqa: F401
