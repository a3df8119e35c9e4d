"""Clock-controlled scaling measurement: 1x32-CPU job vs 4x8-CPU
CONCURRENT jobs over the same input (the bench bulk-extract pipeline).

Why this exists (BASELINE.md round-4): the classic 8-vs-32 sequential
pair is clock-confounded on this host — with only 8 of 32 cores busy
the hypervisor boosts the per-core clock ~1.55x, so even a
perfectly-scaling engine cannot show a raw 8->32 ratio above ~0.65.
Running FOUR 8-CPU jobs at once keeps the box exactly as busy as the
one 32-CPU job, so both legs see the SAME sustained clock and the
ratio isolates engine scaling:

    saturated_efficiency =
        pages/sec (one 32-CPU job)
        ---------------------------------------------
        aggregate pages/sec (four concurrent 8-CPU jobs)

A perfectly-scaling engine scores 1.0: four quarter-cluster jobs and
one full-cluster job chew the same total compute. Whatever the wide
job loses to shuffle/coordination overhead shows up as < 1.0. This is
the fair single-box stand-in for "the same work on N vs 4N nodes":
the 4x8 leg is the N-node fleet (four independent quarter-clusters),
the 32 leg is the 4N-node cluster, and the hardware state is held
constant. The no-Ray md5 control below runs under the IDENTICAL
design (one 32-proc pool vs four concurrent 8-proc pools) and pins
the hardware ceiling for the same minutes.

Each leg's children synchronize on a ready/go file barrier so the
four 8-CPU jobs overlap their timed windows; child-side timestamps
use time.time() (cross-process comparable) and the aggregate divides
total pages by (last end - first start).

  python tools/scaling_saturated.py            # full measurement
  (child modes are internal: --child / --ctl-child)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GiB = 1024 ** 3


# ----------------------------------------------------------------- child
def _run_child(ncpu: int, ready: str, go: str, out: str) -> None:
    sys.path.insert(0, REPO)
    os.environ.setdefault(
        "RAY_DATA_LOGGING_CONFIG",
        os.path.join(REPO, "tools", "ray_data_logging.yaml"))
    import ray
    from bench import BENCH_CORPUS

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR",
             object_store_memory=(ncpu // 8) * 4 * GiB)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from news_crawler_ray.corpus import default_corpus
    from news_crawler_ray.pipelines.bulk import extract_pipeline

    paths = default_corpus("bench", **BENCH_CORPUS)
    open(ready, "w").close()
    deadline = time.time() + 600
    while not os.path.exists(go):
        if time.time() > deadline:
            raise RuntimeError("go barrier never opened")
        time.sleep(0.05)

    t0 = time.time()
    pages = extract_pipeline(paths.pages_dir, batch_size=64).count()
    t1 = time.time()
    with open(out, "w") as f:
        json.dump({"ncpu": ncpu, "pages": pages, "t0": t0, "t1": t1,
                   "sec": round(t1 - t0, 3)}, f)
    ray.shutdown()


def _run_ctl_child(nproc: int, ready: str, go: str, out: str) -> None:
    sys.path.insert(0, REPO)
    from tools.scaling_control import run

    run(nproc, iters=2_000, waves=1)          # warm the pool path
    open(ready, "w").close()
    deadline = time.time() + 300
    while not os.path.exists(go):
        if time.time() > deadline:
            raise RuntimeError("go barrier never opened")
        time.sleep(0.05)
    iters, waves = 20_000, 4
    t0 = time.time()
    ops = run(nproc, iters=iters, waves=waves)
    t1 = time.time()
    with open(out, "w") as f:
        json.dump({"nproc": nproc, "ops": iters * nproc * waves,
                   "t0": t0, "t1": t1,
                   "ops_per_sec": round(ops)}, f)


# ---------------------------------------------------------------- parent
def _leg(tag: str, ncpus: list[int], mode: str, scratch: str) -> dict:
    """Launch one child per entry of ``ncpus``, barrier-align their
    timed windows, return per-child records + aggregate throughput."""
    procs, outs, readys, errfiles = [], [], [], []
    go = os.path.join(scratch, f"{tag}.go")
    flag = "--child" if mode == "engine" else "--ctl-child"
    for i, n in enumerate(ncpus):
        ready = os.path.join(scratch, f"{tag}.{i}.ready")
        out = os.path.join(scratch, f"{tag}.{i}.json")
        errf = os.path.join(scratch, f"{tag}.{i}.err")
        readys.append(ready)
        outs.append(out)
        errfiles.append(errf)
        # stderr to a FILE, not a pipe — a full 64 KiB pipe would block
        # a chatty Ray child mid-leg and skew the overlap
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), flag, str(n),
             ready, go, out],
            stdout=subprocess.DEVNULL, stderr=open(errf, "w")))
        time.sleep(2.0 if mode == "engine" else 0.2)   # port-race gap
    deadline = time.time() + 900
    while not all(os.path.exists(r) for r in readys):
        if time.time() > deadline:
            for p in procs:
                p.kill()
            raise RuntimeError(f"{tag}: children never became ready: "
                               + "; ".join(open(e).read()[-300:]
                                           for e in errfiles))
        time.sleep(0.2)
    open(go, "w").close()
    errs = []
    for p, e in zip(procs, errfiles):
        p.wait(timeout=1200)
        if p.returncode:
            errs.append(open(e).read()[-500:])
    if errs:
        raise RuntimeError(f"{tag}: child failed: {errs}")
    recs = [json.load(open(o)) for o in outs]
    total = sum(r.get("pages", r.get("ops", 0)) for r in recs)
    wall = max(r["t1"] for r in recs) - min(r["t0"] for r in recs)
    return {"children": recs, "total": total,
            "wall_sec": round(wall, 3),
            "agg_per_sec": round(total / wall, 1),
            "overlap_skew_sec": round(
                max(r["t0"] for r in recs) - min(r["t0"] for r in recs)
                + max(r["t1"] for r in recs)
                - min(r["t1"] for r in recs), 3)}


def main() -> None:
    scratch = f"/tmp/scaling_sat_{os.getpid()}"
    os.makedirs(scratch, exist_ok=True)
    sentinel = "/tmp/scaling_running"
    open(sentinel, "w").close()
    try:
        t_start = time.time()
        # hardware control under the SAME design, before the engine legs
        ctl32 = _leg("ctl32a", [32], "ctl", scratch)
        ctl8x4 = _leg("ctl8x4a", [8, 8, 8, 8], "ctl", scratch)
        ctl_eff = round(ctl32["agg_per_sec"] / ctl8x4["agg_per_sec"], 3)

        _leg("warm", [32], "engine", scratch)          # cache warm, untimed
        wide_a = _leg("wide_a", [32], "engine", scratch)
        narrow = _leg("narrow8x4", [8, 8, 8, 8], "engine", scratch)
        wide_b = _leg("wide_b", [32], "engine", scratch)

        pps_wide = (wide_a["agg_per_sec"] + wide_b["agg_per_sec"]) / 2
        eff = round(pps_wide / narrow["agg_per_sec"], 3)
        rec = {
            "ts": round(t_start, 1),
            "metric": "saturated-clock scaling: one 32-CPU job vs four "
                      "concurrent 8-CPU jobs, same input, box equally "
                      "busy in both legs",
            "pages_per_sec_32_a": wide_a["agg_per_sec"],
            "pages_per_sec_32_b": wide_b["agg_per_sec"],
            "pages_per_sec_8x4_aggregate": narrow["agg_per_sec"],
            "pages_per_sec_8x4_children": [
                round(c["pages"] / c["sec"], 1)
                for c in narrow["children"]],
            "narrow_overlap_skew_sec": narrow["overlap_skew_sec"],
            "saturated_efficiency": eff,
            "hw_control_32": ctl32["agg_per_sec"],
            "hw_control_8x4": ctl8x4["agg_per_sec"],
            "hw_control_saturated_efficiency": ctl_eff,
            "host_visible_cpus": os.cpu_count(),
            "host_load_1m": round(os.getloadavg()[0], 2),
        }
        print(json.dumps(rec))
        with open(os.path.join(REPO, "artifacts",
                               "scaling_saturated_r05.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
    finally:
        try:
            os.unlink(sentinel)
        except OSError:
            pass


if __name__ == "__main__":
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        _run_child(int(sys.argv[i + 1]), sys.argv[i + 2],
                   sys.argv[i + 3], sys.argv[i + 4])
    elif "--ctl-child" in sys.argv:
        i = sys.argv.index("--ctl-child")
        _run_ctl_child(int(sys.argv[i + 1]), sys.argv[i + 2],
                       sys.argv[i + 3], sys.argv[i + 4])
    else:
        main()
