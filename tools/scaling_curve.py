"""4-point paired scaling curve: the frontier pipeline vs the no-Ray
hardware control at 4/8/16/32 cpus, back-to-back in one window.

Supplementary evidence beside ``bench.py --scaling``'s 2-point protocol
(BASELINE.md §3): a monotone paired curve separates the engine's scaling
shape from the box's memory-bandwidth knee — if Ray/control stays ~1.0 at
every width while both bend at the same point, the bend is hardware.

Run as a FILE, never piped to stdin: the control uses spawn
multiprocessing, and a stdin ``__main__`` cannot be re-imported by spawn
workers (they crash in a respawn loop and the pool hangs forever).

Usage:  python tools/scaling_curve.py [n_urls]
Each Ray leg runs in a fresh subprocess (own ray session, identical
64-block job, best-of-2); control legs run in-process (spawn pools).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WIDTHS = (4, 8, 16, 32)

_CHILD = """
import os, sys
os.environ.setdefault("POLARS_MAX_THREADS", "1")
sys.path.insert(0, {repo!r})
if __name__ == "__main__":
    import ray
    ray.init(address="local", num_cpus={cpus}, include_dashboard=False)
    from spider_ray.pipelines.frontier_bench import run_frontier_bench
    run_frontier_bench(300_000, parallelism=64)  # warm-up, untimed
    r = max((run_frontier_bench({n_urls}, parallelism=64) for _ in range(2)),
            key=lambda x: x["urls_per_s"])
    print("RAY_LEG " + str(r["urls_per_s"]))
    ray.shutdown()
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000

    ray_legs: dict[int, float] = {}
    for c in WIDTHS:
        # a real file per leg (spawn-safety is about THIS driver; the Ray
        # child only forks Ray workers, but keep the pattern uniform)
        path = f"/tmp/scaling_curve_leg_{c}.py"
        with open(path, "w") as f:
            f.write(_CHILD.format(repo=repo, cpus=c, n_urls=n_urls))
        out = subprocess.run(
            [sys.executable, path], capture_output=True, text=True, timeout=600
        )
        for line in out.stdout.splitlines():
            if line.startswith("RAY_LEG "):
                ray_legs[c] = float(line.split()[1])
    sys.path.insert(0, repo)
    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    from spider_ray.pipelines.frontier_bench import run_control_bench

    ctl_legs = {c: run_control_bench(n_urls, c)["urls_per_s"] for c in WIDTHS}

    print(json.dumps({
        "metric": "paired scaling curve (frontier vs no-Ray control)",
        "n_urls": n_urls,
        "ray_urls_per_s": {str(c): round(v) for c, v in ray_legs.items()},
        "control_urls_per_s": {str(c): round(v) for c, v in ctl_legs.items()},
        "ray_over_control": {
            str(c): round(ray_legs[c] / ctl_legs[c], 3)
            for c in WIDTHS if c in ray_legs
        },
    }))


if __name__ == "__main__":
    main()
