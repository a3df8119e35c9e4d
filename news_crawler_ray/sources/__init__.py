from .rss import parse_feed_xml, rss_entries  # noqa: F401
from .seeds import read_seed_list  # noqa: F401
