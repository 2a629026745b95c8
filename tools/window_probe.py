"""Host-noise window probe — the standing instrument behind BASELINE.md §3.

Runs the no-Ray multiprocessing control (the identical frontier UDF,
``spider_ray.pipelines.frontier_bench.run_control_bench``) at 8 and 32
workers and prints absolute throughputs plus the speedup. Interpretation
(BASELINE.md §3/§7):

* speedup ≥ ~2.8×/4 and stable across two probes → stationary window;
  scaling-protocol runs (``bench.py --scaling``) taken here are quotable.
* speedup < 2.8, or two probes that disagree on ABSOLUTE throughput →
  degraded / non-stationary window; record runs as such, never tune
  against them.

Usage: python tools/window_probe.py  (takes ~40 s; no Ray session)
"""

import os

os.environ.setdefault("POLARS_MAX_THREADS", "1")
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    from spider_ray.pipelines.frontier_bench import run_control_bench

    r8 = run_control_bench(12_000_000, 8)
    r32 = run_control_bench(12_000_000, 32)
    print(
        "ctl8 %.0f urls/s  ctl32 %.0f urls/s  speedup %.2f/4"
        % (
            r8["urls_per_s"],
            r32["urls_per_s"],
            r32["urls_per_s"] / r8["urls_per_s"],
        )
    )
