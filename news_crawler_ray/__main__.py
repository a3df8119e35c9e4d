"""CLI entry points (this module owns the Ray session).

  python -m news_crawler_ray gen    --out DIR [--hosts N] [--pages N]
  python -m news_crawler_ray crawl  --corpus DIR --out DIR [--resume]
                                    [--rss] [--only-webnews]
                                    [--num-cpus N] [--budget N]
  python -m news_crawler_ray extract --corpus DIR --out DIR
  python -m news_crawler_ray stats  --pages DIR
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="news_crawler_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate a synthetic corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--hosts", type=int, default=4)
    g.add_argument("--pages", type=int, default=100)
    g.add_argument("--hot-factor", type=int, default=2)
    g.add_argument("--seed", type=int, default=42)

    c = sub.add_parser("crawl", help="run the crawl pipeline")
    c.add_argument("--corpus", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--rss", action="store_true")
    c.add_argument("--only-webnews", action="store_true")
    c.add_argument("--num-cpus", type=int, default=8)
    c.add_argument("--budget", type=int, default=None,
                   help="override per-host max_in_flight")
    c.add_argument("--frontier-shards", type=int, default=2)
    c.add_argument("--seen-shards", type=int, default=2)

    e = sub.add_parser("extract", help="bulk streaming extraction")
    e.add_argument("--corpus", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--num-cpus", type=int, default=8)

    s = sub.add_parser("stats", help="crawl output statistics")
    s.add_argument("--pages", required=True)
    s.add_argument("--num-cpus", type=int, default=4)

    args = p.parse_args(argv)

    if args.cmd == "gen":
        from .corpus import CorpusSpec, generate_corpus
        paths = generate_corpus(args.out, CorpusSpec(
            num_hosts=args.hosts, pages_per_host=args.pages,
            hot_host_factor=args.hot_factor, seed=args.seed))
        print(json.dumps({"root": paths.root,
                          "host_pages": paths.host_pages}))
        return 0

    import ray
    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    try:
        if args.cmd == "crawl":
            from .pipelines.crawl import CrawlConfig, CrawlEngine
            cfg = CrawlConfig(
                corpus_root=args.corpus, out_dir=args.out,
                num_frontier_shards=args.frontier_shards,
                num_seen_shards=args.seen_shards,
                max_in_flight_override=args.budget,
                scrape_rss=args.rss, only_webnews=args.only_webnews)
            eng = CrawlEngine(cfg, resume=args.resume)
            print(json.dumps(eng.run()))
            eng.shutdown()
        elif args.cmd == "extract":
            import os

            from .pipelines.bulk import extract_pipeline
            ds = extract_pipeline(os.path.join(args.corpus, "pages"))
            ds.write_parquet(args.out)
            print(json.dumps({"out": args.out}))
        elif args.cmd == "stats":
            import ray.data as rd

            from .pipelines.reports import corpus_stats, per_host_stats
            from news_crawler_ray.rayutil import read_parquet
            ds = read_parquet(args.pages)
            print(corpus_stats(ds).to_json(orient="records"))
            print(per_host_stats(ds).to_json(orient="records"))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
