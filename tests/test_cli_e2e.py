"""CLI end-to-end (the `ray job submit` surface): gen-corpus → crawl
(table AND parse-html modes) → resume through the real argv entry point,
in subprocesses that own their Ray session."""

import glob
import json
import os
import shutil
import subprocess
import sys

CORPUS = "/tmp/spider_ray_cli_corpus"
OUT = "/tmp/spider_ray_cli_out"
OUT_P = "/tmp/spider_ray_cli_out_parse"


def _cli(*args: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-m", "spider_ray.cli", *args],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
    return json.loads(lines[-1]) if lines else {}


def test_cli_crawl_both_modes_and_resume():
    if not os.path.exists(os.path.join(CORPUS, "html_pages.parquet")):
        shutil.rmtree(CORPUS, ignore_errors=True)
        _cli(
            "gen-corpus", "--out", CORPUS, "--pages", "150", "--hosts",
            "6", "--seed", "3", "--html-bodies",
        )
    for d in (OUT, OUT_P):
        shutil.rmtree(d, ignore_errors=True)
    rt = _cli(
        "crawl", "--corpus", CORPUS, "--out", OUT, "--shards", "2",
        "--fetch-concurrency", "2", "--num-cpus", "4",
    )
    assert rt["total_fetched"] > 0
    rp = _cli(
        "crawl", "--corpus", CORPUS, "--out", OUT_P, "--shards", "2",
        "--fetch-concurrency", "2", "--num-cpus", "4", "--parse-html",
    )
    assert rp["total_fetched"] == rt["total_fetched"]
    # data sinks byte-equal between modes through the CLI too
    for f in sorted(glob.glob(os.path.join(OUT, "gen=*", "status.parquet"))):
        twin = os.path.join(OUT_P, os.path.relpath(f, OUT))
        assert open(f, "rb").read() == open(twin, "rb").read()
    # resume through the CLI is a no-op on a finished run (no re-fetch)
    rr = _cli(
        "crawl", "--corpus", CORPUS, "--out", OUT, "--shards", "2",
        "--fetch-concurrency", "2", "--num-cpus", "4", "--resume",
    )
    assert rr["total_fetched"] == 0
