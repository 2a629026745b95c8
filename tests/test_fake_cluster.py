"""Multi-node evidence (VERDICT r3 task #1): the crawl loop, a wide
shuffle query, and the frontier bench run on a fake 3-node Ray cluster
(`ray.cluster_utils.Cluster` — separate raylets/object stores per node)
with full parity. Runs in a SUBPROCESS so it owns its Ray instance and
cannot collide with the session-scoped local fixture."""

import json
import os
import subprocess
import sys


def test_fake_cluster_crawl_and_shuffle_parity():
    script = os.path.join(
        os.path.dirname(__file__), "..", "tools", "fake_cluster_run.py"
    )
    proc = subprocess.run(
        [sys.executable, script],
        capture_output=True,
        text=True,
        timeout=540,
    )
    # the summary is the last stdout line (Ray logs go to stderr)
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no summary line; stderr tail: {proc.stderr[-2000:]}"
    out = json.loads(lines[-1])
    assert proc.returncode == 0, f"harness failed: {out} {proc.stderr[-2000:]}"
    assert out["nodes"] == 3
    # 10 one-cpu probe actors cannot fit on fewer than 3 of the 4-cpu
    # nodes — spread is structural, and asserted observed
    assert out["probe_actor_nodes"] == 3
    assert out["crawl_order_parity"] and out["seen_set_parity"]
    assert out["shuffle_query_parity"]
    assert out["warc_ingest_parity"]
    assert out["crawl_pages"] > 0
    assert out["frontier_shards_seen"] == 64
