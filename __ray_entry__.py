"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in news_crawler_ray) calls ``ray.init``/``ray.shutdown``.

- ``entry()`` — flagship crawl pipeline over the deterministic synthetic
  Common-Crawl-style corpus at sf0.001 scale (BASELINE.json input_hint);
  returns the final pages table.
- ``queries()`` — one callable per implemented operator/pipeline from
  SURVEY.md §2 plus the training-data operator suite (dedup, similarity
  search, text analysis, multimodal plumbing).
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
  query (same column names; floats rounded on both sides).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from news_crawler_ray.queries import ORACLES, QUERIES  # noqa: E402


def entry() -> Any:
    """Flagship crawl on sf0.001-scale synthetic corpus (Ray already
    initialised by the driver)."""
    return QUERIES["crawl_flagship"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
