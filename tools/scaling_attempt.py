"""Control-gated scaling attempt (BASELINE.md methodology): run the
no-Ray hardware control first; only if the box itself can scale 8→32
at ≥ the gate efficiency this hour is a full ``bench.py --scaling``
run worth the ~10 minutes. Every attempt (gated-out or run) appends
one JSON line to the log so the evidence trail shows the host's
behavior across the session, not just the best cherry-picked run.

  python tools/scaling_attempt.py [--gate 0.8] [--log /tmp/scaling_attempts.jsonl]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    gate = 0.8
    log_path = "/tmp/scaling_attempts.jsonl"
    args = sys.argv[1:]
    if "--gate" in args:
        gate = float(args[args.index("--gate") + 1])
    if "--log" in args:
        log_path = args[args.index("--log") + 1]

    control = json.loads(subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_control.py")],
        capture_output=True, text=True, check=True)
        .stdout.strip().splitlines()[-1])
    rec = {"ts": round(time.time(), 1), "control": control}
    if control["control_efficiency"] < gate:
        rec["gated_out"] = True
    else:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
            capture_output=True, text=True)
        rec["scaling"] = (json.loads(out.stdout.strip().splitlines()[-1])
                          if out.returncode == 0 and out.stdout.strip()
                          else {"rc": out.returncode,
                                "err": out.stderr[-500:]})
    with open(log_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
