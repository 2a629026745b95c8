"""Linkbase batch ⋈ delta merge (J6 — ``offline_analyze/
mr_combine_batch_delta_{mapper,reducer}.cc``, ``link_merge/
mr_link_merge_reducer.cc:24-107``).

Semantics: union (old linkbase, new crawl records, update commands), group
by url key, keep the max-timestamp record, then apply commands:

* ``D`` delete — drop the record;
* ``R`` retry-fail — increment ``update_fail_cnt``; the record dies when it
  reaches ``MAX_UPDATE_FAILED`` = 3 (``FLAGS_max_update_failed_num``,
  ``mr_link_merge_reducer.cc:14-15``).

Ray shape: per-source tag column + ``union`` → per-block partial keep-latest
(the mapper's 5000-record dedup buffer, ``mr_combine_batch_delta_mapper.cc:
14,96-117``, comes free as the map-side combine) → ``groupby(url_hash).
map_groups(merge)``.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray

from spider_ray.kernels.hashing import hash64

MAX_UPDATE_FAILED = 3

SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("timestamp", pa.int64()),
        ("score", pa.float64()),
        ("cmd", pa.string()),  # "" record, "D" delete, "R" retry-fail
        ("update_fail_cnt", pa.int32()),
    ]
)


def _merge_group(df: pl.DataFrame) -> pl.DataFrame:
    recs = df.filter(pl.col("cmd") == "").sort(
        ["timestamp", "score"], descending=[True, True]
    )
    if recs.height == 0:
        return recs.head(0)
    latest = recs.head(1)
    cmds = df.filter(pl.col("cmd") != "")
    if (cmds["cmd"] == "D").any():
        return recs.head(0)
    n_retry = int((cmds["cmd"] == "R").sum())
    fail = int(latest["update_fail_cnt"][0]) + n_retry
    if fail >= MAX_UPDATE_FAILED:
        return recs.head(0)
    return latest.with_columns(update_fail_cnt=pl.lit(fail, dtype=pl.Int32))


def linkbase_merge(
    old: ray.data.Dataset, delta: ray.data.Dataset
) -> ray.data.Dataset:
    """old ∪ delta → per-url keep-latest-apply-cmds. Both datasets must have
    SCHEMA columns."""
    u = old.union(delta)

    def add_key(batch: pa.Table) -> pa.Table:
        h = hash64(batch["url"]).view(np.int64)
        return batch.append_column("url_hash", pa.array(h, pa.int64()))

    def partial(batch: pa.Table) -> pa.Table:
        # map-side partial: keep latest record per key within the block,
        # but pass ALL commands through (they must reach the reducer)
        df = pl.from_arrow(batch)
        recs = (
            df.filter(pl.col("cmd") == "")
            .sort(["timestamp", "score"], descending=[True, True])
            .group_by("url_hash", maintain_order=True)
            .first()
        )
        cmds = df.filter(pl.col("cmd") != "").select(recs.columns)
        return pl.concat([recs, cmds]).to_arrow()

    def merge(group: pa.Table) -> pa.Table:
        out = _merge_group(pl.from_arrow(group))
        return out.to_arrow()

    return (
        u.map_batches(add_key, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby("url_hash")
        .map_groups(merge, batch_format="pyarrow")
    )


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()
