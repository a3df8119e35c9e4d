"""Per-stage Ray Data execution-stats report for the headline
pipelines — the `ds.stats()` evidence that wall-time is spent in
useful compute, not conversion or scheduling.

    python tools/stats_report.py [sf_dir] [out_path]

Runs the bulk extraction pipeline over the bench corpus and two
representative query shapes over the sf tables, then writes each
dataset's `.stats()` (per-operator wall time, blocks, rows, memory)
plus a one-line summary to artifacts/stats_report.txt. Owns its Ray
session (tool entry point, like bench.py)."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "artifacts", "stats_report.txt")

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from news_crawler_ray.corpus import default_corpus
    from news_crawler_ray.functions import textops as to
    from news_crawler_ray.pipelines.bulk import extract_pipeline
    from news_crawler_ray.rayutil import read_parquet

    sections: list[tuple[str, float, str]] = []

    # 1. bulk streaming extraction (the headline compute stage)
    paths = default_corpus("bench", num_hosts=12, pages_per_host=8000,
                           hot_host_factor=2)
    t0 = time.perf_counter()
    ds = extract_pipeline(paths.pages_dir, batch_size=64).materialize()
    sections.append(("bulk_extract (actor-pool kernel over pages)",
                     time.perf_counter() - t0, ds.stats()))

    # 2. a shuffle-light aggregate query shape (combiner → groupby)
    docs = read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    t0 = time.perf_counter()
    q = to.quality_scores(docs).materialize()
    sections.append(("quality_scores (per-batch map, zero shuffle)",
                     time.perf_counter() - t0, q.stats()))

    # 3. a join-heavy shape (dup-substring positions ⋈ counts)
    t0 = time.perf_counter()
    dsub = to.duplicated_substrings(docs).materialize()
    sections.append(("duplicated_substrings (bucketed fold + hash join)",
                     time.perf_counter() - t0, dsub.stats()))

    with open(out_path, "w") as f:
        f.write("Ray Data per-stage execution stats "
                f"(sf={sf_dir}, cpus={ray.cluster_resources().get('CPU')})\n")
        for name, secs, stats in sections:
            f.write(f"\n{'=' * 72}\n{name}  —  {secs:.2f} s wall\n"
                    f"{'=' * 72}\n{stats}\n")
    print(f"wrote {out_path}")
    for name, secs, _ in sections:
        print(f"  {secs:8.2f} s  {name}")
    ray.shutdown()


if __name__ == "__main__":
    main()
