"""One round-5 scaling pass with a window-quality control (r4 verdict
#2): run the fixed control query (quality_score at sf0.1, 8 CPUs, fresh
process) BEFORE and AFTER `bench.py --scaling`, and append one JSON line
{control_before_sec, scaling:{...}, control_after_sec, ts} to the
tally file. A throttled window is then self-evident in the record:
the r4 noise band measured the control at 0.70s quiet vs 3.93s
throttled, so passes whose controls sit multiple-x above the quiet
band explain their own sub-0.8 efficiency.

Usage: python scripts/scaling_pass.py [tally_path]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TALLY = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_r5.jsonl"

CONTROL_SNIPPET = r"""
import time, os, sys
os.environ.setdefault("RAY_DATA_LOGGING_CONFIG",
    os.path.join(%(repo)r, "gocrd_ray", "data_logging.yaml"))
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, %(repo)r)
import __ray_entry__ as e
q = e.queries()["quality_score"]
q("/root/testdata/sf0.1").count()  # warm workers/executor
t0 = time.perf_counter(); q("/root/testdata/sf0.1").count()
print("CONTROL_SEC", round(time.perf_counter() - t0, 3))
ray.shutdown()
"""


def control_wall() -> float:
    proc = subprocess.run(
        [sys.executable, "-c", CONTROL_SNIPPET % {"repo": REPO}],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("CONTROL_SEC"):
            return float(line.split()[1])
    raise RuntimeError(f"control failed: {proc.stderr[-500:]}")


def main() -> dict:
    before = control_wall()
    time.sleep(3)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    scaling = json.loads(proc.stdout.strip().splitlines()[-1])
    time.sleep(3)
    after = control_wall()
    rec = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "control_before_sec": before,
        "control_after_sec": after,
        "scaling": scaling,
    }
    with open(TALLY, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


if __name__ == "__main__":
    print(json.dumps(main()))
