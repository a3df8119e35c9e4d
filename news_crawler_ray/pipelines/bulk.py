"""Bulk replay-extract pipeline — the streaming throughput path.

``read_parquet(pages) → map_batches(ExtractStage actor pool, zero-copy
Arrow) → articles`` over the whole corpus, no frontier: this is the
pages/sec headline of BASELINE.md and the shape a 100 TB backfill run
takes (the crawl loop in crawl.py adds frontier ordering/politeness
semantics on top; a full-corpus extraction doesn't need them).

Scale properties: column pruning at the read (html/url/lang only), the
extract pool sized by ``concurrency``, small ``batch_size`` because rows
carry multi-KB html payloads (SURVEY.md §7.4 item 6), html projected away
in the stage output.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..extract import ExtractKernel


class _BulkExtract:
    """Actor-pool stage: html → article record (html column dropped)."""

    def __init__(self, apply_nav_pruning: bool = False):
        self.kernel = ExtractKernel(apply_nav_pruning=apply_nav_pruning)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        langs = batch["lang"].to_pylist() if "lang" in batch.column_names \
            else [None] * len(urls)
        out = {k: [] for k in ("url", "language", "title", "text",
                               "publish_date", "top_image", "n_links",
                               "n_authors", "is_news")}
        for u, h, lg in zip(urls, htmls, langs):
            r = self.kernel.extract(u, (h or b"").decode("utf-8", "replace"),
                                    lang_hint=lg)
            out["url"].append(u)
            out["language"].append(r.language)
            out["title"].append(r.title)
            out["text"].append(r.text)
            out["publish_date"].append(
                r.publish_date.strftime("%Y-%m-%d %H:%M:%S")
                if r.publish_date else None)
            out["top_image"].append(r.top_image)
            out["n_links"].append(len(r.links))
            out["n_authors"].append(len(r.authors))
            out["is_news"].append(r.text is not None)
        return pa.table({
            "url": pa.array(out["url"], pa.string()),
            "language": pa.array(out["language"], pa.string()),
            "title": pa.array(out["title"], pa.string()),
            "text": pa.array(out["text"], pa.string()),
            "publish_date": pa.array(out["publish_date"], pa.string()),
            "top_image": pa.array(out["top_image"], pa.string()),
            "n_links": pa.array(out["n_links"], pa.int32()),
            "n_authors": pa.array(out["n_authors"], pa.int32()),
            "is_news": pa.array(out["is_news"], pa.bool_()),
        })


_BULK_KERNEL: dict[bool, _BulkExtract] = {}


def _bulk_extract_batch(batch: pa.Table, *, apply_nav_pruning: bool = False) -> pa.Table:
    stage = _BULK_KERNEL.get(apply_nav_pruning)
    if stage is None:
        stage = _BULK_KERNEL[apply_nav_pruning] = _BulkExtract(apply_nav_pruning)
    return stage(batch)


def extract_pipeline(pages_dir: str, concurrency: int | None = None,
                     batch_size: int = 64,
                     apply_nav_pruning: bool = False,
                     use_actors: bool = False) -> "rd.Dataset":
    """Lazy Dataset of article records for the whole corpus. Consume with
    ``write_parquet`` / ``count`` — do not materialize mid-pipeline.

    Default is stateless tasks with a worker-global kernel cache: the
    kernel's state (stopword tables + compiled regexes) is cheap enough
    that an actor pool only adds startup latency. ``use_actors=True``
    switches to the explicit actor-pool form — the right shape when the
    per-actor state is heavy (models, big rulesets)."""
    from ..rayutil import read_parquet
    ds = read_parquet(pages_dir, columns=["url", "html", "text", "lang"])
    ds = ds.drop_columns(["text"])  # golden column is not an input
    if use_actors:
        return ds.map_batches(
            _BulkExtract,
            fn_constructor_kwargs={"apply_nav_pruning": apply_nav_pruning},
            batch_format="pyarrow",
            batch_size=batch_size,
            # fixed pool: no shuffle/join downstream, so the small-
            # cluster aggregator deadlock (see dedup.py) cannot occur,
            # and an autoscaling pool's ramp-from-1 costs ~20-30% of a
            # short run's throughput
            concurrency=concurrency or 8,
            num_cpus=1,
        )
    return ds.map_batches(
        _bulk_extract_batch,
        fn_kwargs={"apply_nav_pruning": apply_nav_pruning},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
