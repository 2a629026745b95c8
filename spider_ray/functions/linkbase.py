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


# Keep-latest total order: (timestamp desc, score desc) is the reference
# semantics; the (update_fail_cnt asc, url asc) tail breaks exact ties
# DETERMINISTICALLY (lowest fail count wins, then lexical url). Without it
# a stable sort resolves ties by arrival order — i.e. by Ray's
# nondeterministic union/shuffle block order — and the survivor's
# update_fail_cnt (hence whether +R commands kill it) differs run to run.
# The same order is used by the map-side partial and the reducer so the
# winner is also independent of block splits.
_KEEP_LATEST_KEYS = ["timestamp", "score", "update_fail_cnt", "url"]
_KEEP_LATEST_DESC = [True, True, False, False]


def _merge_hash_group(df: pl.DataFrame) -> pl.DataFrame:
    """Reducer body for one url_hash group: sub-group by the url itself —
    a url_hash group can hold >1 url on a 64-bit hash collision (expected
    at billions of urls), and D/R commands must never cross-apply between
    colliding urls nor drop the other url's record."""
    return df.group_by("url", maintain_order=True).map_groups(_merge_group)


def _merge_group(df: pl.DataFrame) -> pl.DataFrame:
    recs = df.filter(pl.col("cmd") == "").sort(
        _KEEP_LATEST_KEYS, descending=_KEEP_LATEST_DESC
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
        # but pass ALL commands through (they must reach the reducer).
        # Grouped by url, NOT url_hash: two urls colliding on the 64-bit
        # hash (expected at billions of urls) must both survive the combine
        df = pl.from_arrow(batch)
        recs = (
            df.filter(pl.col("cmd") == "")
            .sort(_KEEP_LATEST_KEYS, descending=_KEEP_LATEST_DESC)
            .group_by("url", maintain_order=True)
            .first()
        )
        cmds = df.filter(pl.col("cmd") != "").select(recs.columns)
        return pl.concat([recs, cmds]).to_arrow()

    def merge(group: pa.Table) -> pa.Table:
        return _merge_hash_group(pl.from_arrow(group)).to_arrow()

    return (
        u.map_batches(add_key, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby("url_hash")
        .map_groups(merge, batch_format="pyarrow")
    )


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()


def q_linkbase_merge(sf_dir: str) -> pa.Table:
    """J6 batch⋈delta merge, driver-oracle-checked: deterministic linkbase
    rows synthesized from events (event_id%3==0 → old-batch records,
    ==1 → delta records, ==2 → commands: D for user_id%7==0 else R),
    merged by the real pipeline — keep the (timestamp, score)-max record
    per url, drop on any D, die at update_fail_cnt ≥ 3. event_id doubles
    as the timestamp so the keep-latest winner is globally unambiguous;
    the DuckDB oracle reproduces the whole merge with window + group
    aggregation."""
    from spider_ray.pipelines.relational import _concat, _sorted
    from spider_ray.sources.tables import read_table

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def synth(which: str):
        def f(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch).with_columns(
                url=pl.format("u{}", pl.col("user_id")),
                mod=pl.col("event_id") % 3,
            )
            if which == "old":
                part = df.filter(pl.col("mod") == 0).with_columns(
                    cmd=pl.lit(""),
                )
            else:
                recs = df.filter(pl.col("mod") == 1).with_columns(
                    cmd=pl.lit("")
                )
                # sparse commands (~1% of events): a command per event
                # would bury every url under R retries and kill the whole
                # linkbase — the merge needs survivors to be non-trivial
                cmds = df.filter(
                    (pl.col("mod") == 2) & (pl.col("event_id") % 97 == 0)
                ).with_columns(
                    cmd=pl.when(pl.col("user_id") % 7 == 0)
                    .then(pl.lit("D"))
                    .otherwise(pl.lit("R"))
                )
                part = pl.concat([recs, cmds])
            out = part.select(
                pl.col("url"),
                pl.col("event_id").alias("timestamp"),
                pl.col("value").alias("score"),
                pl.col("cmd"),
                (pl.col("event_id") % 2).cast(pl.Int32).alias(
                    "update_fail_cnt"
                ),
            )
            return out.to_arrow().cast(SCHEMA)

        return f

    old = ds.map_batches(synth("old"), batch_format="pyarrow")
    delta = ds.map_batches(synth("delta"), batch_format="pyarrow")
    merged = linkbase_merge(old, delta)

    out_schema = pa.schema(
        [
            ("url", pa.string()),
            ("timestamp", pa.int64()),
            ("score", pa.float64()),
            ("update_fail_cnt", pa.int32()),
        ]
    )

    def project(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:  # empty map_groups blocks pass through
            return out_schema.empty_table()
        return batch.select(out_schema.names)

    t = _concat(merged.map_batches(project, batch_format="pyarrow"))
    if t.num_columns == 0:  # fully-empty merge result
        t = out_schema.empty_table()
    return _sorted(t, "url")
