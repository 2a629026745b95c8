"""Every ``queries()`` output must survive the DRIVER's comparator.

Round-4 lesson: the correctness driver canonicalizes both sides of a
query/oracle pair with a pandas multi-key sort before hashing. That sort
factorizes object columns — an unhashable cell (``bytearray``, the shape
DuckDB BLOBs take in ``.df()``; lists; dicts) raises ``TypeError`` and
turns an otherwise bit-exact query RED (r04's ``css_enrich``). The repo's
own comparators carry a bytearray fix; the driver's does not, so the only
robust contract is: **no query hands raw binary (or any unhashable cell)
to the driver** — digests (length + frozen 63-bit polyhash) instead.

This suite replays the driver's canonicalization — deliberately WITHOUT
the bytearray→bytes patch — over the full registry:

* every ``queries()`` entry at sf0.001 (Ray side), and
* every ``oracle_sql()`` entry on the same tables (DuckDB side, where
  BLOB→bytearray originates),

asserting sort + hash both succeed and that no Arrow output schema
carries a ``binary``/``large_binary`` (or nested binary) column.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _driver_canon(df: pd.DataFrame) -> None:
    """The driver's canonical sort + value hash, bytearray patch ABSENT
    on purpose: anything that only passes WITH the patch would be red in
    CORRECTNESS_r{N}.json."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    out = df.sort_values(by=list(df.columns), ignore_index=True)
    pd.util.hash_pandas_object(out, index=False)


def _has_binary(t: pa.DataType) -> bool:
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) or (
        hasattr(pa.types, "is_fixed_size_binary")
        and pa.types.is_fixed_size_binary(t)
    ):
        return True
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _has_binary(t.value_type)
    if pa.types.is_struct(t):
        return any(_has_binary(f.type) for f in t)
    return False


def _to_pandas(result) -> tuple[pd.DataFrame, pa.Schema | None]:
    if isinstance(result, pd.DataFrame):
        return result, None
    if isinstance(result, pa.Table):
        return result.to_pandas(), result.schema
    # ray.data.Dataset
    tbl = pa.concat_tables(
        [pa.Table.from_batches([b]) for b in result.iter_batches(
            batch_format="pyarrow")]
        or [pa.table({})]
    )
    return tbl.to_pandas(), tbl.schema


def _entry_module():
    import importlib
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return importlib.import_module("__ray_entry__")


def _registry_names():
    return sorted(_entry_module().queries().keys())


@pytest.mark.parametrize("name", _registry_names())
def test_query_output_is_driver_safe(ray_session, name):
    E = _entry_module()
    df, schema = _to_pandas(E.queries()[name](SF))
    if schema is not None:
        bad = [f.name for f in schema if _has_binary(f.type)]
        assert not bad, f"{name}: binary column(s) {bad} reach the driver"
    _driver_canon(df)


def test_every_oracle_output_is_driver_safe(ray_session):
    """DuckDB side of every pair — the place BLOB→bytearray actually
    happens — must survive the patch-free canon too."""
    E = _entry_module()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    failures = []
    for name, sql in sorted(E.oracle_sql().items()):
        try:
            _driver_canon(con.sql(sql).df())
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "\n".join(failures)
