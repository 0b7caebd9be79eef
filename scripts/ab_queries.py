"""Interleaved A/B of the round-5 touched queries vs round-4 code.

Runs the same query set in FRESH Ray processes, alternating
HEAD / r4-checkout back-to-back so window drift cancels (the protocol
the r3/r4 rounds validated against this VM's 2.5x noise band). Each
leg times each query once (warm executor via a small prime query).

Usage: python scripts/ab_queries.py <r4_checkout_dir> [n_passes]
Appends JSON lines to /tmp/ab_r5.jsonl.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = [
    "quality_score",  # untouched control, first
    "dedup_verified",
    "dedup_fuzzy_corpus",
    "dedup_incremental_fuzzy",
    "bloom_blocklist",
    "neardup_cosine",
]

SNIPPET = r"""
import time, os, sys, json
repo = %(repo)r
os.environ.setdefault("RAY_DATA_LOGGING_CONFIG",
    os.path.join(repo, "gocrd_ray", "data_logging.yaml"))
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, repo)
import __ray_entry__ as e
qs = e.queries()
qs["token_stats"](%(sf)r).count()  # warm workers/executor
walls = {}
for name in %(queries)r:
    t0 = time.perf_counter()
    res = qs[name](%(sf)r)
    if isinstance(res, ray.data.Dataset):
        res.count()
    else:
        len(res)  # already-materialized Table/DataFrame
    walls[name] = round(time.perf_counter() - t0, 3)
print("WALLS_JSON " + json.dumps(walls))
ray.shutdown()
"""


def run_leg(repo_dir: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", SNIPPET % {
            "repo": repo_dir, "sf": SF, "queries": QUERIES}],
        capture_output=True, text=True, timeout=1800, cwd=repo_dir,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("WALLS_JSON "):
            return json.loads(line[len("WALLS_JSON "):])
    raise RuntimeError(f"leg failed: {proc.stderr[-800:]}")


def main() -> None:
    r4_dir = sys.argv[1]
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out = "/tmp/ab_r5.jsonl"
    for p in range(n_passes):
        for tag, d in (("r5", REPO), ("r4", r4_dir)):
            time.sleep(4)
            walls = run_leg(d)
            rec = {"ts": time.strftime("%H:%M:%S"), "pass": p,
                   "code": tag, "walls": walls}
            with open(out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
