"""Window-aware scaling-run collector.

The VM's host-noise windows drift on a ~hour scale (BASELINE.md §3/§9):
quotable scaling samples require a stationary window, and finding one by
hand wastes attention. This tool encodes the discipline:

  loop (up to --max-minutes):
    probe twice (no-Ray control at 8 and 32 procs, 12M URLs each)
    if both probes scale ≥ 2.8×/4 AND their absolute ctl32 agree within
    15%  →  the window is stationary: run `bench.py --scaling`, append
    the JSON to --log, count one success
    else sleep --sleep-s and re-probe
  stop after --runs successes.

Results land one-JSON-per-line in --log (default
/tmp/scaling_watch.jsonl); transfer quotable runs to BASELINE.md by hand
(probes + protocol runs should not share a window with any other load —
keep the box otherwise idle while this runs).

Usage: python tools/scaling_watch.py [--runs 2] [--max-minutes 120]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("POLARS_MAX_THREADS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_URLS = 12_000_000


def probe() -> tuple[float, float, float]:
    from spider_ray.pipelines.frontier_bench import run_control_bench

    r8 = run_control_bench(PROBE_URLS, 8)["urls_per_s"]
    r32 = run_control_bench(PROBE_URLS, 32)["urls_per_s"]
    return r8, r32, r32 / r8


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--max-minutes", type=float, default=120)
    ap.add_argument("--sleep-s", type=float, default=300)
    ap.add_argument("--log", default="/tmp/scaling_watch.jsonl")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    deadline = time.time() + args.max_minutes * 60
    successes = 0
    while successes < args.runs and time.time() < deadline:
        a8, a32, aspd = probe()
        b8, b32, bspd = probe()
        agree = abs(a32 - b32) / max(a32, b32) <= 0.15
        stationary = aspd >= 2.8 and bspd >= 2.8 and agree
        print(
            f"probe: ctl32 {a32/1e6:.1f}/{b32/1e6:.1f} M/s "
            f"speedup {aspd:.2f}/{bspd:.2f} -> "
            + ("STATIONARY, running protocol" if stationary else "degraded, waiting"),
            flush=True,
        )
        if not stationary:
            time.sleep(args.sleep_s)
            continue
        p = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py"), "--scaling"],
            capture_output=True,
            text=True,
            cwd=repo,
        )
        line = ""
        for ln in p.stdout.splitlines():
            if ln.startswith("{"):
                line = ln
        if not line:
            print("protocol run produced no JSON; stderr tail:", p.stderr[-500:], flush=True)
            time.sleep(args.sleep_s)
            continue
        rec = json.loads(line)
        rec["probe"] = {"ctl32_before": a32, "speedups": [aspd, bspd]}
        rec["ts"] = time.time()
        with open(args.log, "a") as f:
            f.write(json.dumps(rec) + "\n")
        successes += 1
        print(
            f"RUN {successes}: raw {rec['frontier_scaling_efficiency']} "
            f"ctl {rec['hardware_control_speedup']} "
            f"vs-ceiling {rec['efficiency_vs_hardware_ceiling']}",
            flush=True,
        )
    return 0 if successes else 1


if __name__ == "__main__":
    raise SystemExit(main())
