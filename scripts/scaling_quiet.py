"""Quiet-window-gated scaling passes: probe the window with the fixed
control query first and only spend a full `scaling_pass` when the
control sits inside the quiet band (the sandbox VM's noisy-neighbor
throttle makes un-gated passes mostly measure the neighbors). Appends
to the same tally file as scripts/scaling_pass.py.

Usage: python scripts/scaling_quiet.py [max_passes] [max_minutes] [tally]
"""

import json
import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import scaling_pass  # noqa: E402
from scaling_pass import control_wall, main as run_pass  # noqa: E402

QUIET_SEC = 0.7  # r4/r5 quiet band: 0.26-0.55s; throttled: 1.0-3.9s
PROBE_GAP = 120  # seconds between probes while the window is loud


def run(max_passes: int, max_minutes: float, tally: str) -> None:
    scaling_pass.TALLY = tally  # module binds TALLY at import time
    deadline = time.time() + max_minutes * 60
    done = 0
    while done < max_passes and time.time() < deadline:
        try:
            probe = control_wall()
        except Exception as exc:  # control crashed: log, retry later
            print(f"probe failed: {exc}", flush=True)
            time.sleep(PROBE_GAP)
            continue
        if probe > QUIET_SEC:
            print(f"window loud (control {probe}s) — waiting", flush=True)
            time.sleep(PROBE_GAP)
            continue
        print(f"window quiet (control {probe}s) — running pass", flush=True)
        rec = run_pass()
        done += 1
        print(json.dumps(rec), flush=True)
        time.sleep(60)
    print(f"done: {done} passes", flush=True)


if __name__ == "__main__":
    mp = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    mm = float(sys.argv[2]) if len(sys.argv) > 2 else 120
    tly = sys.argv[3] if len(sys.argv) > 3 else "measurements/scaling_r5.jsonl"
    run(mp, mm, tly)
