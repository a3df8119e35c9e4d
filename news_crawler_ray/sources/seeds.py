"""Seed-list source (S1/S2): newline-delimited URL file → seeds table.

Rebuilds utils.read_text_file_as_array (utils.py:199-202) + the seed
prep in main.py:5-13. One deliberate deviation, per FIXTURES.md §2: the
reference dedups seeds with ``list(set(tmp))`` (main.py:13), which
destroys order nondeterministically; here dedup is order-preserving
first-occurrence and each seed gets a deterministic ``seq``.
"""

from __future__ import annotations

import pyarrow as pa


def read_seed_list(path: str) -> pa.Table:
    """Newline-delimited seed file → (url, seq) table; blank lines
    skipped, first-occurrence dedup."""
    with open(path, "r", encoding="utf-8") as f:
        raw = [s.strip() for s in f.read().split("\n") if s.strip()]
    seen: dict[str, None] = {}
    for u in raw:
        seen.setdefault(u)
    urls = list(seen)
    return pa.table({"url": pa.array(urls, pa.string()),
                     "seq": pa.array(range(len(urls)), pa.int64())})
