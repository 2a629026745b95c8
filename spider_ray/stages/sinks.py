"""Output sinks.

S2 — TimeSplitSaver analog (``crawl/time_split_saver.h:16-57``): rolling
output split by timespan with ``.done`` markers → here: partitioned parquet,
one directory per time bucket, with a ``_DONE`` marker per partition so a
failed run can skip finished partitions (resumable-output requirement).

The write itself streams: ``map_batches`` tags each row with its partition,
then ``write_parquet(partition_cols=...)`` lets Ray write per-partition
files; markers are committed after the write completes.
"""

from __future__ import annotations

import os

import polars as pl
import pyarrow as pa
import ray


def write_time_partitioned(
    ds: ray.data.Dataset,
    ts_col: str,
    out_dir: str,
    freq: str = "1h",
) -> list[str]:
    """Write ``ds`` partitioned by truncated timestamp; returns the list of
    partition keys written (each has a ``_DONE`` marker). Partitions that
    already carry a marker are skipped (donelist semantics,
    ``fetcher_worker_main.cc:140-144``)."""

    def tag(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(
            _part=pl.col(ts_col)
            .dt.truncate(freq)
            .dt.strftime("%Y%m%dT%H%M%S")
        )
        return df.to_arrow()

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    existing = set()
    for d in os.listdir(out_dir) if os.path.isdir(out_dir) else []:
        if not d.startswith("_part="):
            continue
        if os.path.exists(os.path.join(out_dir, d, "_DONE")):
            existing.add(d.split("=", 1)[1])
        else:
            # markerless partition = a crashed attempt's partial files; the
            # retry owns the whole partition (same contract as crawl.py's
            # partial-gen wipe) — re-writing WITHOUT the wipe would append
            # new uniquely-named files next to the stale ones and then
            # stamp the duplicated partition _DONE
            import shutil

            shutil.rmtree(os.path.join(out_dir, d))
    # prune already-done partitions at the stream (resume path) —
    # vectorized batch filter, not a per-row Python predicate
    if existing:
        keep = pl.Series("_done", sorted(existing))

        def drop_done(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch)
            return df.filter(~pl.col("_part").is_in(keep)).to_arrow()

        tagged = tagged.map_batches(drop_done, batch_format="pyarrow")
    os.makedirs(out_dir, exist_ok=True)
    tagged.write_parquet(out_dir, partition_cols=["_part"])
    written = []
    for d in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, d)
        if os.path.isdir(full) and d.startswith("_part="):
            key = d.split("=", 1)[1]
            marker = os.path.join(full, "_DONE")
            if not os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write("ok")
            written.append(key)
    return written


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()
