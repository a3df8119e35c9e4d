"""Benchmark harness — prints ONE JSON line with headline + per-query
seconds.

  python bench.py              # sf dir from $GRAFT_SF_DIR (default sf0.1),
                               # CPUs from $RAY_GRAFT_CPUS (default 32)
  python bench.py --scaling    # same job at 8 vs 32 CPUs in fresh
                               # processes → throughputs + efficiency

Headline = crawl of the deterministic synthetic corpus (frontier
throughput) + bulk streaming extraction over the same corpus (pages/sec),
per BASELINE.json's metric. Secondary: the oracle-checked query suite
over $GRAFT_SF_DIR tables.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# ~104k pages: large enough that worker ramp-up and per-round RPC
# overheads amortize at 32 CPUs (at 10k pages the 32-CPU run was slower
# than the 8-CPU run — startup dominated)
BENCH_CORPUS = dict(num_hosts=12, pages_per_host=8000, hot_host_factor=2)


def _clock_probe(budget_s: float = 0.2) -> int:
    """Single-process md5 ops/s — a host CLOCK probe. Load average
    cannot distinguish "busy with this bench" from "hypervisor is
    shaping the clock" (both read ~10); this pins the hour's
    single-core speed so a 2x-slow run is self-documenting. Quiet-box
    band on this host: ~560-620k ops/s; shaped windows read ~45-60%
    of that."""
    import hashlib
    buf = b"x" * 600
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < budget_s:
        for _ in range(2000):
            buf = hashlib.md5(buf).digest() * 38
        n += 2000
    return round(n / (time.perf_counter() - t0))


def _clock_probe_mp(nproc: int) -> int:
    """All-core md5 ops/s via the same kernel as tools/scaling_control
    (spawn pool, one warm + one timed wave) — pins the clock the
    bench's parallel stages actually saw."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__))))
    from tools.scaling_control import run as _ctl_run
    _ctl_run(nproc, iters=2_000, waves=1)      # warm the pool path
    return round(_ctl_run(nproc, iters=20_000, waves=2))


# Quiet-band floor for the 32-proc clock probe (quiet hours on this
# host read 11-13M ops; shaped hours 4-7M, a ~2-3x wall-clock
# deficit on every parallel stage). VERDICT r4 item 5: the bench
# self-gates on the probe the way scaling attempts do, so a
# driver-visible run lands in the quiet band when one arrives within
# the wait budget — and self-documents the clock either way.
QUIET_32P_OPS = 10_000_000


def _await_quiet_window() -> dict:
    """Bounded wait for an unshaped clock: probe the all-core md5
    band; while below QUIET_32P_OPS, sleep and re-probe until
    GRAFT_QUIET_WAIT_S (default 900 s; 0 disables) elapses. Returns
    the gate telemetry that is embedded in the bench JSON."""
    budget = float(os.environ.get("GRAFT_QUIET_WAIT_S", "900"))
    probes = [_clock_probe_mp(32)]
    t0 = time.perf_counter()
    while probes[-1] < QUIET_32P_OPS and \
            time.perf_counter() - t0 < budget:
        time.sleep(45)
        probes.append(_clock_probe_mp(32))
    return {"quiet_gate_ops": probes[-1],
            "quiet_gate_waited_s": round(time.perf_counter() - t0, 1),
            "quiet_gate_passed": probes[-1] >= QUIET_32P_OPS,
            "quiet_gate_probes": probes}


def run_bench() -> dict:
    import ray

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    # gate full bench runs on the clock band (scaling legs gate
    # themselves; tests/CI set GRAFT_QUIET_WAIT_S=0 to skip)
    gate = {}
    if not os.environ.get("GRAFT_HEADLINE_ONLY"):
        gate = _await_quiet_window()

    # NOTE: no worker_process_setup_hook — a non-default runtime_env
    # makes the raylet re-resolve the env on every worker launch (~1 s
    # churn each, measured). The schema-metadata problem is fixed at the
    # sources instead: stripped schema= override in rayutil.read_parquet
    # and metadata-free block conversion installed by package import in
    # every process that runs our UDFs. Ray's INTERNAL shuffle
    # aggregator actors run no user code, so their single cosmetic
    # fallback notice is leveled out via the logging-config env var
    # (tools/ray_data_logging.yaml — workers inherit it at spawn).
    os.environ.setdefault(
        "RAY_DATA_LOGGING_CONFIG",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "tools", "ray_data_logging.yaml"))
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from news_crawler_ray.corpus import default_corpus
    from news_crawler_ray.pipelines.bulk import extract_pipeline
    from news_crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine
    from news_crawler_ray.queries import QUERIES

    # corpus generation is cached and excluded from timings
    paths = default_corpus("bench", **BENCH_CORPUS)
    total_pages = sum(paths.host_pages.values())

    queries: dict[str, float] = {}

    # 1. headline: crawl (frontier + fetch + extract + discovery)
    t0 = time.perf_counter()
    eng = CrawlEngine(CrawlConfig(
        corpus_root=paths.root, out_dir="/tmp/ncr_bench_crawl",
        num_seen_shards=4, num_frontier_shards=4,
        max_in_flight_override=512, dequeue_per_shard=100_000,
        batch_size=256, round_engine="tasks",
        checkpoint_every=10**9))
    summary = eng.run()
    crawl_sec = time.perf_counter() - t0
    eng.shutdown()
    queries["crawl"] = round(crawl_sec, 3)

    # 2. headline: bulk streaming extraction (pages/sec; workers are warm
    #    from the crawl phase, so this measures compute + streaming)
    t0 = time.perf_counter()
    n_extracted = extract_pipeline(paths.pages_dir, batch_size=64).count()
    bulk_sec = time.perf_counter() - t0
    queries["bulk_extract"] = round(bulk_sec, 3)

    # 3. query suite over the sf tables. Scaling legs skip it: the
    #    efficiency metric reads ONLY the headline bulk throughput, and
    #    a shorter leg both finishes faster and sits inside one host
    #    clock regime (the drift hazard BASELINE.md documents)
    suite = () if os.environ.get("GRAFT_HEADLINE_ONLY") else (
        "q1_pricing_summary", "q3_top_orders", "q_events_hourly",
                 "q_events_sessions", "q_dedup_exact", "q_token_stats",
                 "q_quality", "q_ann_topk", "minhash_lsh_pairs",
                 "simhash_pairs", "embedding_neardup", "q_ngram_jaccard",
                 "q_rolling_events", "q_quantity_quantiles",
                 "q_tfidf_top_terms", "q_doc_chunks", "q_corpus_prep",
                 "q_mask_pii", "q_seq_packing", "q_dup_substrings",
                 "q_seeded_shuffle", "q_incremental_dedup",
                 "q_latest_events", "q_eval_carve",
                 "q_token_budget_mix", "q_segment_dedup",
                 "q_source_quality_gate", "q_hopping_window",
                 "q_distinct_users_by_type", "q_cheapest_supplier",
                 "q_interp_quantiles", "pq_ann_topk",
                 "q_event_gaps", "q_extreme_events", "q_user_zscore",
                 "q_source_entropy", "q_lang_heavy_hitters",
                 "q_cross_source_dups", "q_table_checksum",
                 "q_event_transitions", "q_event_funnel",
                 "q_gap_fill_hours", "q_rrf_orders",
                 "q_label_centroids", "q_token_pmi_pairs",
                 "q_quantity_mad", "q_props_field_stats",
                 "q_user_dropoffs", "q_active_users_7d",
                 "q_source_kl", "q_retention_cohorts",
                 "q_paragraph_dedup", "media_video_frames",
                 "q_bm25_topk", "q_lm_quality", "q_dsir_weights",
                 "q_embedding_components", "q_ngram_novelty",
                 "q_hard_negatives", "q_source_temperature_mix",
                 "q_dedup_cascade", "q_embedding_norm_outliers",
                 "q_quality_curriculum", "q_gopher_quality",
                 "q_line_dup_stats", "q_c4_line_filter",
                 "q_semdedup", "q_ngram_repetition",
                 "q_tokenizer_fertility", "q_mask_pii_extended",
                 "q_contamination_rate", "q_ccnet_buckets",
                 "q_dup_span_coverage", "q_prep_funnel",
                 "q_edit_distance_pairs", "q_snapshot_diff",
                 "q_rolling_median", "q_normalize_text",
                 "q_docs_all_terms_indexed", "q_repeat_buyers",
                 "q_interval_overlap", "q_change_rate",
                 "q_decayed_freshness", "q_winsorized_stats",
                 "q_tfidf_cosine_pairs", "q_degree_powerlaw",
                 "q_watermark_lateness", "q_user_percent_rank",
                 "ivfpq_ann_topk", "media_phash_dups",
                 "media_audio_dups", "media_video_dups")
    # (q_leakage_free_split is correctness-swept but not bench-timed:
    # like minhash_dedup_keep it re-runs the already-timed LSH pair
    # generation plus the CC — timing it double-counts those kernels)
    for name in suite:
        t0 = time.perf_counter()
        QUERIES[name](SF_DIR)
        queries[name] = round(time.perf_counter() - t0, 3)

    # 4. PageRank at bench scale (VERDICT r2 item 7): kernel-extracted
    #    cross-host edges, then the join form (no node-sized driver
    #    state) TIMED and pinned to the broadcast host form. Skipped
    #    on headline-only scaling legs (same rationale as the suite).
    pagerank_diff = None
    if not os.environ.get("GRAFT_HEADLINE_ONLY"):
        from news_crawler_ray.functions.linkgraph import (host_pagerank,
                                                          host_edges,
                                                          link_products,
                                                          pagerank_join_form)
        # one shared kernel pass feeds edges AND anchors (r4 item 6);
        # timed on its own so the per-product entries show their real
        # (post-pass) cost
        t0 = time.perf_counter()
        link_products(paths.pages_dir)
        queries["link_kernel_pass"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        edges = host_edges(paths.pages_dir).materialize()
        queries["pagerank_edges"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        jf = pagerank_join_form(edges, iters=10)
        queries["pagerank_join_form"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        hp = host_pagerank(edges, iters=10) \
            .sort_values("host").reset_index(drop=True)
        queries["pagerank_host_form"] = round(time.perf_counter() - t0, 3)

        # 4b. anchor-text corpus product (same kernel-bound page walk
        #     regime as pagerank_edges; counts fold + per-host top-3)
        from news_crawler_ray.functions.linkgraph import anchor_texts
        t0 = time.perf_counter()
        n_anchor_rows = anchor_texts(paths.pages_dir).count()
        queries["anchor_texts"] = round(time.perf_counter() - t0, 3)

        # 4c. mirror-host detection (url-only scan + set-similarity
        #     self-join; id-level after the path explosion)
        from news_crawler_ray.functions.linkgraph import mirror_hosts
        t0 = time.perf_counter()
        mirror_hosts(paths.pages_dir)
        queries["mirror_hosts"] = round(time.perf_counter() - t0, 3)
        assert list(jf["host"]) == list(hp["host"])
        pagerank_diff = float((jf["rank"] - hp["rank"]).abs().max())
        assert pagerank_diff < 1e-9, pagerank_diff

    value = round(crawl_sec + bulk_sec, 3)
    result = {
        "metric": "headline crawl + bulk-extract wall time (synthetic "
                  f"corpus, {total_pages} pages) plus query suite",
        "value": value,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        # the sandbox VM's visible core count varies run-to-run (host
        # CPU shaping, see BASELINE.md) — record it so a shaped run is
        # self-documenting instead of reading as a regression
        "host_visible_cpus": os.cpu_count(),
        "host_load_1m": round(os.getloadavg()[0], 2),
        # clock probes (see _clock_probe): the 1-proc probe pins the
        # few-cores-busy clock (quiet/boosted band ~560-620k ops/s);
        # the 32-proc probe pins the ALL-core clock the bench actually
        # ran at (quiet band ~11-13M total). The pair separates
        # "boosted-but-all-core-shaped" (1p high / 32p low — the run
        # was slow through no fault of the code) from a genuine
        # regression (both in-band, run slow anyway).
        "host_md5_ops_1p": _clock_probe(),
        "host_md5_ops_32p": _clock_probe_mp(32),
        "crawl_pages": summary["pages_written"],
        "crawl_pages_per_sec": round(summary["pages_written"] / crawl_sec, 1),
        # driver-observed Amdahl breakdown of the crawl round loop
        # (dequeue / wave / commit / finalize / page_write / round_log)
        "crawl_phase_secs": summary.get("phase_secs", {}),
        "crawl_frontier_ops_per_sec": round(
            (summary["enqueued_total"] + summary["pages_written"]) / crawl_sec, 1),
        "bulk_pages": n_extracted,
        "bulk_pages_per_sec": round(n_extracted / bulk_sec, 1),
        "pagerank_hosts": len(hp) if pagerank_diff is not None else None,
        "anchor_rows": (n_anchor_rows
                        if pagerank_diff is not None else None),
        # join form pinned to the broadcast host form at bench scale
        "pagerank_parity_max_abs_diff": pagerank_diff,
        **gate,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job at two parallelism levels in fresh processes (the
    sandbox stand-in for N vs 4N nodes). Pair configurable via
    GRAFT_SCALE_LO / GRAFT_SCALE_HI (default 8 / 32). Note: on this
    single box, all-core per-core throughput decays ~28% from 4 to 32
    busy cores (measured with a no-Ray multiprocessing baseline), which
    bounds any framework's measurable 8→32 efficiency — see
    BASELINE.md."""
    lo_n = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi_n = int(os.environ.get("GRAFT_SCALE_HI", "32"))

    def run(ncpu: int) -> dict:
        # headline-only legs: the efficiency metric reads only the
        # bulk throughput; skipping the 70-query suite keeps each leg
        # short enough to sit inside one host clock regime
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_HEADLINE_ONLY="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    run(lo_n)       # warm page cache + corpus (untimed discard)
    lo, hi = run(lo_n), run(hi_n)
    thr_lo = lo["bulk_pages_per_sec"]
    thr_hi = hi["bulk_pages_per_sec"]
    eff = (thr_hi / thr_lo) / (hi_n / lo_n)
    return {
        "metric": f"bulk-extract throughput scaling {lo_n} -> {hi_n} CPUs",
        f"sec_{lo_n}": lo["value"], f"sec_{hi_n}": hi["value"],
        f"pages_per_sec_{lo_n}": thr_lo, f"pages_per_sec_{hi_n}": thr_hi,
        f"crawl_pages_per_sec_{lo_n}": lo["crawl_pages_per_sec"],
        f"crawl_pages_per_sec_{hi_n}": hi["crawl_pages_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "host_visible_cpus": os.cpu_count(),
        "host_load_1m": round(os.getloadavg()[0], 2),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
