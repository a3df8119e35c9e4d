"""Extract stage: fetched pages → page records (+ discovered links).

Maps the reference's status dispatch + extraction (crawler.py:90-143) over
Arrow batches. One output row per input row, shaped like the SQLite
``pages`` row (_datacollector_statements.py:10-30 / FIXTURES.md §4.1) with
multi-valued fields as ``list<string>`` columns (SURVEY.md §1.4) plus the
``links`` column that feeds link-discovery → frontier-enqueue.

Dispatch parity:
- fetch miss (not in corpus)      → hard failure, retry path
  (crawler.py:90-101: ok=False, attempts+1 up to 2)
- 200, html ≥ 200 chars, text/html → extract article + links
  (M28 gate, crawler.py:132-134)
- 200 otherwise                    → scraped, no article
- 301/30x                          → alias row: url_to_refer = target,
  target enqueued as discovery (crawler.py:113-118, 145-149)
- other status                     → terminal row with code
  (crawler.py:119-124)

Forms: :class:`ExtractStage` for actor pools (kernel built once per
actor — ST3 stopword state), :func:`extract_batch` for the round loop
(worker-global kernel cache).
"""

from __future__ import annotations

import pyarrow as pa

from ..extract import ExtractKernel


_PAGE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("protocol", pa.string()),
    ("host", pa.string()),
    ("host_seq", pa.int64()),
    ("scraped", pa.bool_()),
    ("attempts_count", pa.int32()),
    ("mime_type", pa.string()),
    ("http_response_code", pa.int32()),
    ("language", pa.string()),
    ("url_to_refer", pa.string()),
    ("is_webnews", pa.bool_()),
    ("title_art", pa.string()),
    ("text_art", pa.string()),
    ("publish_date", pa.string()),
    ("img_art", pa.string()),
    ("videos_art", pa.list_(pa.string())),
    ("authors", pa.list_(pa.string())),
    ("category", pa.list_(pa.string())),
    ("har", pa.list_(pa.string())),   # third-party request urls (S4)
    ("error_text", pa.string()),
    ("ok", pa.bool_()),          # False → retry path (engine-internal)
    ("links", pa.list_(pa.string())),  # full discovered link URLs
    ("feed_urls", pa.list_(pa.string())),  # S8 discovered feed urls
    ("work_round", pa.int64()),   # lineage key (engine-internal, requeue)
    ("work_seq64", pa.int64()),
    ("work_ref", pa.string()),
])

_INTERNAL = ("ok", "links", "feed_urls", "work_round", "work_seq64",
             "work_ref")
PAGE_OUTPUT_COLUMNS = [f.name for f in _PAGE_SCHEMA if f.name not in _INTERNAL]


def _extract(kernel: ExtractKernel, batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    cols = {name: [] for name in _PAGE_SCHEMA.names}
    urls = batch["url"].to_pylist()
    hosts = batch["host"].to_pylist()
    host_seqs = batch["host_seq"].to_pylist()
    attempts = batch["attempts"].to_pylist()
    webnews = batch["is_webnews"].to_pylist()
    found = batch["found"].to_pylist()
    fulls = batch["full_url"].to_pylist()
    htmls = batch["html"].to_pylist()
    langs = batch["lang"].to_pylist()
    statuses = batch["status"].to_pylist()
    redirects = batch["redirect_to"].to_pylist()
    mimes = batch["mime_type"].to_pylist()
    w_round = batch["round_added"].to_pylist()
    w_seq = batch["seq64"].to_pylist()
    w_ref = batch["url_to_refer"].to_pylist()

    for i in range(n):
        full = fulls[i] or ("http://" + urls[i])
        protocol = full.split("//", 1)[0] + "//" if "//" in full else "http://"
        row = dict.fromkeys(_PAGE_SCHEMA.names)
        row.update(url=urls[i], protocol=protocol, host=hosts[i],
                   host_seq=host_seqs[i], attempts_count=attempts[i],
                   is_webnews=bool(webnews[i]), scraped=False, ok=True,
                   mime_type=mimes[i], http_response_code=statuses[i],
                   language=langs[i], videos_art=[], authors=[],
                   category=[], har=[], links=[], feed_urls=[],
                   work_round=w_round[i], work_seq64=w_seq[i],
                   work_ref=w_ref[i])
        if not found[i]:
            # hard fetch failure → retry (crawler.py:90-101)
            row.update(ok=False, http_response_code=0,
                       error_text="fetch failed", mime_type=None,
                       language=None)
        elif statuses[i] == 200:
            html = htmls[i] or b""
            # M28 gate: EXACT mime equality like the reference
            # (crawler.py:133 compares mime_type == 'text/html'), so a
            # 'text/html; charset=utf-8' page is scraped-without-article
            # (charset fixture page in corpus.py pins this)
            if len(html) >= 200 and mimes[i] == "text/html":
                r = kernel.extract(full, html.decode("utf-8", "replace"),
                                   lang_hint=langs[i],
                                   is_webnews=bool(webnews[i]))
                row.update(scraped=True, language=r.language, har=r.har,
                           title_art=r.title, text_art=r.text,
                           publish_date=(r.publish_date.strftime("%Y-%m-%d %H:%M:%S")
                                         if r.publish_date else None),
                           img_art=r.top_image, videos_art=r.videos,
                           authors=r.authors, category=r.sections,
                           links=r.links, feed_urls=r.feed_urls)
            else:
                row.update(scraped=True)  # M28 gate: no extraction
        elif 300 <= statuses[i] < 400 and redirects[i]:
            # alias row; target enqueued via links (crawler.py:113-118)
            row.update(scraped=True, url_to_refer=redirects[i],
                       links=["http://" + redirects[i]])
        else:
            row.update(scraped=True,
                       error_text=f"http error {statuses[i]}")
        for k, v in row.items():
            cols[k].append(v)
    return pa.table({name: pa.array(cols[name], _PAGE_SCHEMA.field(name).type)
                     for name in _PAGE_SCHEMA.names})


class ExtractStage:
    """Actor-pool stage (``map_batches(ExtractStage, concurrency=N)``)."""

    def __init__(self, apply_nav_pruning: bool = False):
        self.kernel = ExtractKernel(apply_nav_pruning=apply_nav_pruning)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _extract(self.kernel, batch)


_WORKER_KERNEL: list[ExtractKernel | None] = [None]


def extract_batch(batch: pa.Table, additional_data_fn=None) -> pa.Table:
    """Stateless-task form; kernel cached per worker process.

    ``additional_data_fn`` is the user-extension hook mirroring the
    reference's ``Article.additional_data`` dict (article.py:113): a
    picklable ``row_dict -> dict`` called per extracted page, its result
    persisted as a JSON string column ``additional_data``. Runs inside
    the distributed extract stage (per-row by contract — it is a user
    escape hatch, not an engine kernel)."""
    if _WORKER_KERNEL[0] is None:
        _WORKER_KERNEL[0] = ExtractKernel()
    out = _extract(_WORKER_KERNEL[0], batch)
    if additional_data_fn is not None:
        import json
        rows = out.to_pylist()
        extra = [json.dumps(additional_data_fn(r), sort_keys=True)
                 for r in rows]
        out = out.append_column("additional_data",
                                pa.array(extra, pa.string()))
    return out
