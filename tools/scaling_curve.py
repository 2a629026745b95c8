"""4-point paired scaling curve: the frontier pipeline vs the no-Ray
hardware control at 4/8/16/32 cpus, interleaved per width in one window.

Supplementary evidence beside ``bench.py --scaling``'s 2-point protocol
(BASELINE.md §3): a monotone paired curve separates the engine's scaling
shape from the box's memory-bandwidth knee — if Ray/control stays ~1.0 at
every width while both bend at the same point, the bend is hardware.

Both sides use the same sampling discipline: the Ray leg is
``run_scaling_leg`` (warm-up + best-of-2 of the fixed ``SCALING_CHUNK``
job — the identical recipe ``bench.py --scaling`` runs, now best-of-3),
and the control leg is best-of-2. Legs are interleaved Ray-then-control
per width so each ratio is measured back-to-back, not curve-after-curve,
with a 75 s settle between widths (same thermal-phase hygiene as
``bench.py --scaling``).

Run as a FILE, never piped to stdin: the control uses spawn
multiprocessing, and a stdin ``__main__`` cannot be re-imported by spawn
workers (they crash in a respawn loop and the pool hangs forever).

Usage:  python tools/scaling_curve.py [n_urls]
Each Ray leg runs in a fresh subprocess (own ray session). Prints one
JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

WIDTHS = (4, 8, 16, 32)

_CHILD = """
import os, sys
os.environ.setdefault("POLARS_MAX_THREADS", "1")
sys.path.insert(0, {repo!r})
if __name__ == "__main__":
    import ray
    ray.init(address="local", num_cpus={cpus}, include_dashboard=False)
    from spider_ray.pipelines.frontier_bench import run_scaling_leg
    r = run_scaling_leg({n_urls})
    print("RAY_LEG " + str(r["urls_per_s"]))
    ray.shutdown()
"""


def _ray_leg(repo: str, cpus: int, n_urls: int) -> float:
    # a real file per leg: spawn-safety is about THIS driver; the Ray child
    # only forks Ray workers, but keep the pattern uniform
    path = f"/tmp/scaling_curve_leg_{cpus}.py"
    with open(path, "w") as f:
        f.write(_CHILD.format(repo=repo, cpus=cpus, n_urls=n_urls))
    out = subprocess.run(
        [sys.executable, path], capture_output=True, text=True, timeout=600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RAY_LEG "):
            return float(line.split()[1])
    raise RuntimeError(
        f"ray leg at {cpus} cpus produced no RAY_LEG line "
        f"(rc={out.returncode})\nstdout tail: {out.stdout[-2000:]}\n"
        f"stderr tail: {out.stderr[-2000:]}"
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000

    sys.path.insert(0, repo)
    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    from spider_ray.pipelines.frontier_bench import run_control_bench

    ray_legs: dict[int, float] = {}
    ctl_legs: dict[int, float] = {}
    for i, c in enumerate(WIDTHS):
        if i:
            # settle between widths: each width ends with two control
            # burns, so without a pause every Ray leg after the first
            # starts on a hot (membw/frequency-throttled) box — the same
            # systematic bias bench.py::scaling fixed (BASELINE.md,
            # 2026-08-18); equalize the thermal phase, measure the same job
            time.sleep(75)
        ray_legs[c] = _ray_leg(repo, c, n_urls)
        ctl_legs[c] = max(
            run_control_bench(n_urls, c)["urls_per_s"] for _ in range(2)
        )

    print(json.dumps({
        "metric": "paired scaling curve (frontier vs no-Ray control)",
        "n_urls": n_urls,
        "ray_runs_per_leg": 3,
        "control_runs_per_leg": 2,
        "ray_urls_per_s": {str(c): round(v) for c, v in ray_legs.items()},
        "control_urls_per_s": {str(c): round(v) for c, v in ctl_legs.items()},
        "ray_over_control": {
            str(c): round(ray_legs[c] / ctl_legs[c], 3) for c in WIDTHS
        },
    }))


if __name__ == "__main__":
    main()
