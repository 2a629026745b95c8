"""Frontier-processing throughput pipeline (BASELINE.md §3; SURVEY M7).

Simulates the shuffle side of a 10^10-URL frontier at benchable scale: a
generator-backed datasource (``ray.data.range`` → URLs derived on the fly
from the row index — 10^10 URL strings are never materialized) pushed
through the real frontier stages: canonicalize (M1) + filter rules (M3) +
hash + host extraction + per-block dedup + ``groupby(shard)`` count — the
same shape as one schedule wave's pre-actor work.

Metric: frontier URLs processed / second. This path is CPU-bound and scales
with cores (the reference's insight in SURVEY §6: fetch is politeness-bound,
frontier processing is what scales).
"""

from __future__ import annotations

import time

import numpy as np
import polars as pl
import pyarrow as pa
import ray

from spider_ray.kernels.hashing import hash64
from spider_ray.kernels.urlnorm import canonicalize, filter_rules, hosts_of

_HOST_POOL = 1000
_DIRTY = ("", "#frag", "?b=2&a=1", ":80/", "%20x")


def _derive_urls(batch: dict) -> pa.Table:
    """int row ids → raw (dirty) URLs; pure function of the id."""
    ids = batch["id"]
    host_ids = ids % _HOST_POOL
    # ~25% of rows go to one hot host (skew)
    hot = (ids % 4) == 0
    host_ids = np.where(hot, 0, host_ids)
    urls = [
        f"HTTP://host{h}.example.com/p/{i}{_DIRTY[i % len(_DIRTY)]}"
        for h, i in zip(host_ids.tolist(), ids.tolist())
    ]
    return pa.table({"url": pa.array(urls, pa.string())})


def _frontier_stage(batch: pa.Table, num_shards: int) -> pa.Table:
    canon = canonicalize(batch["url"])
    keep, _ = filter_rules(canon)
    urls = [u for u, k in zip(canon, keep) if u is not None and k]
    hosts = hosts_of(urls)
    uh = hash64(urls)
    hh = hash64(hosts)
    # per-block partial dedup (map-side combine)
    df = pl.DataFrame(
        {
            "url_hash": uh,
            "shard": (hh % np.uint64(num_shards)).astype(np.int64),
        }
    ).unique(subset=["url_hash"])
    return df.group_by("shard").agg(pl.len().alias("n")).to_arrow()


def run_frontier_bench(
    n_urls: int = 2_000_000, num_shards: int = 64, parallelism: int | None = None
) -> dict:
    t0 = time.time()
    ds = ray.data.range(n_urls, override_num_blocks=parallelism)
    ds = ds.map_batches(_derive_urls, batch_format="numpy", batch_size=32_768)
    ds = ds.map_batches(
        _frontier_stage,
        batch_format="pyarrow",
        batch_size=32_768,
        fn_kwargs={"num_shards": num_shards},
    )
    # final tiny combine: per-shard totals
    parts = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    totals = (
        pl.from_arrow(parts).group_by("shard").agg(pl.col("n").sum()).sort("shard")
    )
    wall = time.time() - t0
    return {
        "n_urls": n_urls,
        "wall_s": wall,
        "urls_per_s": n_urls / wall,
        "shards_seen": totals.height,
    }


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()
