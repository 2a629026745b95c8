"""N-node vs 4N-node scaling on fake multi-node clusters — the closest
sandbox analog of the north rule's two-cluster-size criterion: the SAME
frontier job on a 2-node (2×4 cpus) and an 8-node (8×4 cpus) fake
cluster (`ray.cluster_utils.Cluster`), each node its own raylet + object
store, so the 4N leg pays real multi-raylet dispatch and cross-node
object transfer — unlike the single-raylet 8-vs-32-cpu proxy.

Each leg runs in its own subprocess (fresh Ray). Prints one JSON line
with both throughputs and efficiency = (thr_4N / thr_N) / 4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_URLS = 24_000_000

_LEG = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import os
os.environ.setdefault("POLARS_MAX_THREADS", "1")
from ray.cluster_utils import Cluster
import ray
nodes, cpus_per = {nodes}, {cpus_per}
cluster = Cluster(initialize_head=True, head_node_args={{"num_cpus": cpus_per}})
for _ in range(nodes - 1):
    cluster.add_node(num_cpus=cpus_per)
ray.init(address=cluster.address, include_dashboard=False)
alive = len([n for n in ray.nodes() if n["Alive"]])
from spider_ray.pipelines.frontier_bench import run_frontier_bench, scaling_parallelism
# identical job at both widths: fixed protocol granularity
run_frontier_bench({n_urls} // 4, parallelism=scaling_parallelism({n_urls} // 4))  # warm-up
best = max(
    (run_frontier_bench({n_urls}, parallelism=scaling_parallelism({n_urls}))
     for _ in range(3)),
    key=lambda r: r["urls_per_s"],
)
print(json.dumps({{"nodes": alive, "cpus": nodes * cpus_per,
                   "urls_per_s": best["urls_per_s"],
                   "shards_seen": best["shards_seen"]}}))
ray.shutdown(); cluster.shutdown()
"""


def run_leg(nodes: int, cpus_per: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _LEG.format(
        repo=repo, nodes=nodes, cpus_per=cpus_per, n_urls=N_URLS
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=540,
    )
    lines = [
        ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
    ]
    if proc.returncode != 0 or not lines:
        raise RuntimeError(proc.stderr[-2000:])
    return json.loads(lines[-1])


def main() -> int:
    small = run_leg(nodes=2, cpus_per=4)
    big = run_leg(nodes=8, cpus_per=4)
    eff = (big["urls_per_s"] / small["urls_per_s"]) / (
        big["cpus"] / small["cpus"]
    )
    print(
        json.dumps(
            {
                "metric": "fake-cluster node scaling (2 nodes -> 8 nodes, "
                          "4 cpus/node, separate raylets/object stores)",
                "n_small": small,
                "n_big": big,
                "node_scaling_efficiency": round(eff, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
