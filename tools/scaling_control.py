"""No-Ray hardware control for the scaling criterion (BASELINE.md
methodology): run the same pure-CPU kernel in LO vs HI OS processes via
multiprocessing and report the throughput ratio. If the box itself
cannot scale a process count 4x at some efficiency, no framework
measured on it can either — read `bench.py --scaling` numbers against
this SAME-HOUR ceiling. The sandbox host shapes CPU dynamically
(visible nproc has been observed flipping 1<->32 within minutes), so a
control run from a different hour is meaningless.

  python tools/scaling_control.py          # 8 vs 32, one JSON line
  GRAFT_SCALE_LO/HI override the pair.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import time


def _worker(n_iters: int) -> int:
    # md5 over a ~600B buffer: the same hash-heavy profile as the
    # engine's extraction/dedup kernels, no shared state, no IO
    buf = b"x" * 600
    for _ in range(n_iters):
        buf = hashlib.md5(buf).digest() * 38   # 16B*38 = 608B
    return 1


def run(nproc: int, iters: int = 20_000, waves: int = 4) -> float:
    tasks = [iters] * (nproc * waves)
    t0 = time.perf_counter()
    with mp.get_context("spawn").Pool(nproc) as pool:
        pool.map(_worker, tasks, chunksize=1)
    dt = time.perf_counter() - t0
    return iters * len(tasks) / dt


def main() -> None:
    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    run(lo, iters=2_000)        # warm the pool path (discarded)
    r_lo, r_hi = run(lo), run(hi)
    eff = (r_hi / r_lo) / (hi / lo)
    print(json.dumps({
        "metric": f"no-Ray multiprocessing control {lo} -> {hi} procs",
        f"ops_per_sec_{lo}": round(r_lo),
        f"ops_per_sec_{hi}": round(r_hi),
        "control_efficiency": round(eff, 3),
        "host_visible_cpus": os.cpu_count(),
        "host_load_1m": round(os.getloadavg()[0], 2)}))


if __name__ == "__main__":
    main()
