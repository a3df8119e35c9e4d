"""Long-running scaling-window watcher (BASELINE.md methodology).

The sandbox host is burst-shaped: the no-Ray control's 8->32
efficiency swings 0.48-0.85 within minutes (see
artifacts/scaling_attempts_r04b.jsonl).  Manually-timed attempts keep
losing the window — the hour flips between the gate probe and the
~13-minute engine pair.  This watcher closes the human latency: it
probes the cheap hardware control every ``--interval`` seconds and,
the moment two CONSECUTIVE probes clear the gate (one probe alone has
flipped mid-run twice this round), fires ``bench.py --scaling``
immediately, brackets it with a closing control, and appends the full
record to the evidence log.  It exits once a raw efficiency >=
``--target`` is on the log, or keeps watching until killed.

While an engine pair is in flight the sentinel ``/tmp/scaling_running``
exists — other sessions should not launch CPU-heavy work then, both to
keep the measurement honest and to avoid queueing.

  python tools/scaling_watch.py [--gate 0.8] [--target 0.8]
      [--interval 240] [--log artifacts/scaling_attempts_r04b.jsonl]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SENTINEL = "/tmp/scaling_running"


def _control() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_control.py")],
        capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def _append(log_path: str, rec: dict) -> None:
    with open(log_path, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    gate = 0.8
    target = 0.8
    interval = 240.0
    log_path = os.path.join(REPO, "artifacts", "scaling_attempts_r04b.jsonl")
    args = sys.argv[1:]
    if "--gate" in args:
        gate = float(args[args.index("--gate") + 1])
    if "--target" in args:
        target = float(args[args.index("--target") + 1])
    if "--interval" in args:
        interval = float(args[args.index("--interval") + 1])
    if "--log" in args:
        log_path = args[args.index("--log") + 1]

    streak = 0
    while True:
        ctl = _control()
        print(f"[watch] control={ctl['control_efficiency']} "
              f"load={ctl['host_load_1m']} streak={streak}", flush=True)
        if ctl["control_efficiency"] < gate:
            streak = 0
            _append(log_path, {"ts": round(time.time(), 1),
                               "control": ctl, "gated_out": True,
                               "watcher": True})
            time.sleep(interval)
            continue
        streak += 1
        if streak < 2:
            # confirm the window holds across one short gap before
            # committing ~13 minutes to it
            _append(log_path, {"ts": round(time.time(), 1),
                               "control": ctl, "watcher": True,
                               "streak_probe": True})
            time.sleep(45)
            continue

        streak = 0
        open(SENTINEL, "w").close()
        try:
            t0 = time.time()
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--scaling"],
                capture_output=True, text=True)
            scaling = (json.loads(out.stdout.strip().splitlines()[-1])
                       if out.returncode == 0 and out.stdout.strip()
                       else {"rc": out.returncode,
                             "err": out.stderr[-500:]})
            closing = _control()
            rec = {"ts": round(t0, 1), "control": ctl,
                   "scaling": scaling, "closing_control": closing,
                   "watcher": True}
            _append(log_path, rec)
            print(json.dumps(rec), flush=True)
            eff = scaling.get("scaling_efficiency", 0.0) or 0.0
            if eff >= target:
                print(f"[watch] raw {eff} >= {target}: done", flush=True)
                return
        finally:
            try:
                os.unlink(SENTINEL)
            except OSError:
                pass
        time.sleep(interval)


if __name__ == "__main__":
    main()
