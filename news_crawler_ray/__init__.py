"""news_crawler_ray — a Ray-Data-native web-crawl data-processing engine.

A from-scratch rebuild of the query/data-processing capabilities of
girulea/News-Crawler (reference at /root/reference, cited per-module as
file:line) on top of ``ray.data.Dataset``:

- ``urlnorm``      — URL canonicalization + predicates (reference utils.py,
                     newspaperlite/newsurl.py semantics).
- ``htmldom``      — minimal pure-Python DOM (stdlib html.parser) standing in
                     for lxml, which is unavailable in this environment.
- ``extract``      — the boilerplate-strip + article-extraction kernel
                     (reference extraction_tools/extractor.py +
                     newspaperlite chain), run as an actor-pool
                     ``map_batches`` stage.
- ``corpus``       — deterministic synthetic Common-Crawl-style page corpus
                     (url, warc_ts, html, text, lang) per FIXTURES.md.
- ``state``        — sharded URL-seen set (exact + bloom) and per-host
                     politeness frontier, as named Ray actors with Parquet
                     snapshot/restore.
- ``stages``       — fetch/replay, extract, link-discovery map_batches stages.
- ``pipelines``    — the crawl round loop (dequeue → fetch → extract →
                     discover → enqueue) with checkpoint/resume, and
                     reporting aggregates.
- ``functions``    — dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
                     embedding), similarity search, text analysis,
                     multimodal stubs.

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by bench.py, CLI entry points and the pytest fixture.
"""

__version__ = "0.1.0"

# Known-cosmetic Ray Data warnings (unhashable parquet-metadata schemas;
# untyped empty map_groups partitions) are filtered at import — see
# rayutil._KnownCosmeticFilter for why each is provably benign — and the
# pandas→arrow block conversion is made metadata-free so hash-shuffle
# aggregators keep their fast schema-dedup path (see
# rayutil.install_pandas_block_metadata_strip). No session side effects.
from .rayutil import (install_cosmetic_log_filters as _f1,
                      install_pandas_block_metadata_strip as _f2)

_f1()
_f2()
del _f1, _f2
