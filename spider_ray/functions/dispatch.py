"""Dispatcher compress control — per-host PV-quota crawl throttling.

Reference semantics (``crawler/dispatcher/mapper_compress_control.cc`` +
``reducer_compress_control.cc``): candidate URLs hash-partition by host to
the reducers; per host, the reducer computes a crawl quota from the
PV-log stats (``will_crawle = daily_pv / max_currency_access_thread *
lamla``, floored to at least 1), lets sub-resource rows (type != html)
pass through unthrottled, keeps only the top-quota HTML candidates by
score for hosts that appear in the PV log, and keeps ALL candidates of
hosts the log has never seen (the "backup" queue — first-sighting hosts
cannot be judged by PV).

Deterministic restatement over the synthetic corpus (frozen rules, all
SQL-replayable):

* ``seq``  = trailing digits of the url;
* ``score`` = ``mix64_int(seq, DISPATCH_SEED) % 1_000_000`` (the
  selector-score stand-in — mix64 replays in DuckDB as HUGEINT
  arithmetic);
* sub-resource rows: ``seq % 8 == 0`` → reason ``passthrough``;
* ``daily_pv(host)`` = number of the host's pages with even seq (the
  PV-log aggregate stand-in); hosts with fewer than ``MIN_PV`` sightings
  count as "never seen" (a PV log only records hosts above the noise
  floor — and it makes the Zipf tail exercise the backup path);
* quota = ``max(1, pv // MAX_ACCESS_THREADS)`` (lamla = 1);
* HTML rows: top-quota by (score DESC, url ASC) → ``quota``; all rows of
  never-seen hosts → ``backup``.

Ray shape = the dispatcher's own: ONE hash-by-host shuffle
(``groupby(host).map_groups``) and the whole per-host decision —
pv aggregate, quota, sort, head — runs vectorized inside the group;
nothing host-level ever lands on the driver.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray

from spider_ray.kernels.hashing import mix64_int
from spider_ray.pipelines.relational import _concat, _sorted

DISPATCH_SEED = 20260822  # frozen; shared with the SQL oracle
MAX_ACCESS_THREADS = 3  # FLAGS_max_currency_access_thread
SUB_MOD = 8  # seq % 8 == 0 → sub-resource (pass-through)
SCORE_MOD = 1_000_000
MIN_PV = 15  # below this the host is "not in the PV log" → backup path

OUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("score", pa.int64()),
        ("reason", pa.string()),
    ]
)


def q_compress_control(corpus: str) -> pa.Table:
    """Kept candidate set after per-host PV-quota throttling, with the
    keep reason (passthrough / quota / backup) per row."""
    import os

    ds = ray.data.read_parquet(
        os.path.join(corpus, "web_graph.parquet"), columns=["url", "host"]
    )

    def prep(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        seq = (
            df["url"].str.extract(r"(\d+)$", 1).cast(pl.UInt64).to_numpy()
        )
        score = (
            mix64_int(seq, DISPATCH_SEED) % np.uint64(SCORE_MOD)
        ).astype(np.int64)
        return pa.table(
            {
                "url": t["url"],
                "host": t["host"],
                "seq": pa.array(seq.astype(np.int64), pa.int64()),
                "score": pa.array(score, pa.int64()),
            }
        )

    def per_host(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).with_columns(
            is_sub=(pl.col("seq") % SUB_MOD) == 0
        )
        pv = int(df.filter(pl.col("seq") % 2 == 0).height)
        subs = df.filter(pl.col("is_sub")).with_columns(
            reason=pl.lit("passthrough")
        )
        html = df.filter(~pl.col("is_sub")).sort(
            ["score", "url"], descending=[True, False]
        )
        if pv >= MIN_PV:
            quota = max(1, pv // MAX_ACCESS_THREADS)
            kept_html = html.head(quota).with_columns(
                reason=pl.lit("quota")
            )
        else:
            kept_html = html.with_columns(reason=pl.lit("backup"))
        return (
            pl.concat([subs, kept_html])
            .select("url", "host", "score", "reason")
            .to_arrow()
            .cast(OUT_SCHEMA)
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("host")
        .map_groups(per_host, batch_format="pyarrow")
    )
    return _sorted(_concat(out, schema=OUT_SCHEMA), "url")


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()
