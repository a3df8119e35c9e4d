from .crawl import CrawlConfig, CrawlEngine  # noqa: F401
from .bulk import extract_pipeline  # noqa: F401
