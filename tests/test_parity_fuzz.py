"""Parity fuzz: the engine must reproduce the oracle's exact crawl order and
URL-seen set for EVERY corpus, not just the seed-42 fixture — a sweep over
generator seeds (different web shapes: host mixes, redirect/failure draws,
outlink graphs) and a non-default topology (more shards + wider fetch pool).
This is the north rule's core claim exercised as a family of instances."""

import shutil

import pytest

from spider_ray.pipelines.oracle import run_oracle
from spider_ray.sources.webgen import generate

BASE = "/tmp/spider_ray_fuzz"


def _parity_case(tag, gen_kwargs, num_shards, fetch_concurrency):
    from spider_ray.pipelines.crawl import run_crawl
    from tests.test_crawl_parity import _engine_rows

    corpus = f"{BASE}_corpus_{tag}"
    out = f"{BASE}_out_{tag}"
    shutil.rmtree(corpus, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    generate(corpus, **gen_kwargs)
    gold = run_oracle(corpus, num_shards=num_shards)
    run_crawl(
        corpus, out, num_shards=num_shards,
        fetch_concurrency=fetch_concurrency,
    )
    eng = _engine_rows(out, "status.parquet")
    assert len(eng) == len(gold["crawl_order"]), tag
    for e, g in zip(eng, gold["crawl_order"]):
        assert (e["url"], e["fetch_ts"], e["status"], e["gen"]) == (
            g["url"], g["fetch_ts"], g["status"], g["gen"]
        ), tag
    import os

    import pyarrow.parquet as pq

    seen = pq.read_table(os.path.join(out, "seen.parquet")).to_pylist()
    assert seen == gold["seen"], tag
    shutil.rmtree(corpus, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)


@pytest.mark.parametrize(
    "seed,n_pages,n_hosts",
    [(7, 150, 6), (101, 180, 11), (9001, 120, 3)],
)
def test_crawl_parity_across_seeds(ray_session, seed, n_pages, n_hosts):
    _parity_case(
        f"s{seed}",
        dict(n_pages=n_pages, n_hosts=n_hosts, seed=seed),
        num_shards=2,
        fetch_concurrency=2,
    )


def test_crawl_parity_wide_topology(ray_session):
    # more shards than hosts-per-shard would suggest, wider fetch pool —
    # the permit sort + block-size-invariant admit seams must still yield
    # the oracle's exact sequence
    _parity_case(
        "wide",
        dict(n_pages=200, n_hosts=8, seed=42),
        num_shards=5,
        fetch_concurrency=6,
    )
