"""Partial→final aggregation and broadcast-join stages.

The reference does map-side combining before every wide reduce
(``control/schedule/ip_stat.cc:37-54`` per-mapper std::map partials;
``statistic/mr_stat_site_pv_mapper.cc:17,29-50`` combiner capped at 100k
groups). The Ray-native restatement: a ``map_batches`` stage computes one
partial-aggregate row per (block, group) — so the shuffle moves partials,
not rows — and a tiny final combine merges them. For low-cardinality keys
the combined partials are a few hundred rows, so the final combine happens
driver-side on a materialized small table (allowed: small results only).

Broadcast join: the reference ships dict sides to ALL reducers with a sort
tag (``control/schedule/url_to_ip.cc:25-91``); here the small side is
``ray.put`` once and joined per-batch with Arrow's hash join — no shuffle of
the big side at all.
"""

from __future__ import annotations

from typing import Callable

import polars as pl
import pyarrow as pa
import ray
import ray.data


def partial_final_agg(
    ds: ray.data.Dataset,
    partial_exprs: Callable[[pl.LazyFrame], pl.LazyFrame],
    final_exprs: Callable[[pl.LazyFrame], pl.LazyFrame],
) -> pa.Table:
    """Run ``partial_exprs`` per Arrow block (vectorized, polars), collect the
    small partial tables, and combine with ``final_exprs`` driver-side.

    Returns a pyarrow.Table (small result)."""

    def _partial(batch: pa.Table) -> pa.Table:
        out = partial_exprs(pl.from_arrow(batch).lazy()).collect()
        return out.to_arrow()

    mat = ds.map_batches(_partial, batch_format="pyarrow").materialize()
    tables = ray.get(mat.to_arrow_refs())
    chunks = [pl.from_arrow(t) for t in tables if t.num_rows > 0]
    if chunks:
        merged = pl.concat(chunks)
    else:
        # empty input: a zero-block materialization (tables == []) or
        # schemaless empty blocks would crash final_exprs' group_by — build
        # an empty frame with the PARTIAL output schema instead so the
        # result is an empty table with the aggregate columns
        base = next((t for t in tables if t.num_columns), None)
        if base is None:
            sch = mat.schema()
            if sch is not None:
                base = pa.table(
                    {n: pa.array([], type=t)
                     for n, t in zip(sch.names, sch.types)}
                )
            else:
                # zero blocks, no output schema either — derive it by
                # running the partial on an empty INPUT-schema table
                in_sch = ds.schema()
                if in_sch is None:
                    raise ValueError(
                        "partial_final_agg over an empty dataset with no "
                        "recoverable schema"
                    )
                base = _partial(pa.table(
                    {n: pa.array([], type=t)
                     for n, t in zip(in_sch.names, in_sch.types)}
                ))
        merged = pl.from_arrow(base)
    out = final_exprs(merged.lazy()).collect().to_arrow()
    return unsigned_to_int64(out)


def unsigned_to_int64(t: pa.Table) -> pa.Table:
    """Cast unsigned-int result columns to int64 so engine output dtypes
    match the DuckDB oracle's BIGINT exactly (polars ``len()``/bool-sum
    yield UInt32, which the driver's value hash treats as a different
    column).  uint64 is left alone — hash columns use the full range."""
    for i, f in enumerate(t.schema):
        if pa.types.is_unsigned_integer(f.type) and f.type.bit_width < 64:
            t = t.set_column(i, f.name, t[i].cast(pa.int64()))
    return t


def broadcast_join(
    ds: ray.data.Dataset,
    small: pa.Table,
    keys: str | list[str],
    right_keys: str | list[str] | None = None,
    join_type: str = "inner",
) -> ray.data.Dataset:
    """Map-side join of a big Dataset against a small broadcast table."""
    small_ref = ray.put(small)

    def _join(batch: pa.Table) -> pa.Table:
        s = ray.get(small_ref)
        return batch.join(
            s, keys=keys, right_keys=right_keys, join_type=join_type
        )

    return ds.map_batches(_join, batch_format="pyarrow")
