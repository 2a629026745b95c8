"""Dtype-strict oracle comparison — stricter than tests/test_relational.py.

The driver's CORRECTNESS hash is dtype-sensitive (round-1 lesson: UInt32 vs
BIGINT hashed differently even with identical values).  This tool runs every
``queries()`` entry that has an ``oracle_sql()`` twin and compares values AND
pandas dtypes, flagging any query the driver would hash-mismatch.

Usage:  python tools/oracle_strict.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyarrow as pa
import ray

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object and len(df):
            # duckdb .df() yields BLOB as bytearray — unhashable, so the
            # multi-key lexsort's factorize step throws; bytes compares
            # and hashes identically. Check EVERY row, not just the
            # first: a NULL-leading BLOB column would otherwise skip
            # conversion and still crash the sort.
            df[c] = df[c].map(
                lambda v: bytes(v) if isinstance(v, bytearray) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        os.environ.setdefault("POLARS_MAX_THREADS", "1")  # 1 thread/worker
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    names = sys.argv[2:] or [n for n in E.queries() if n in E.oracle_sql()]
    bad = []
    for name in names:
        try:
            ours = norm(to_pandas(E.queries()[name](sf)))
            theirs = norm(con.sql(E.oracle_sql()[name]).df())
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            print(f"ERR   {name}: {exc}")
            continue
        issues = []
        if list(ours.columns) != list(theirs.columns):
            issues.append(f"cols {list(ours.columns)} != {list(theirs.columns)}")
        else:
            for c in ours.columns:
                a, b = str(ours[c].dtype), str(theirs[c].dtype)
                if a != b:
                    issues.append(f"dtype[{c}] {a} != {b}")
            if len(ours) != len(theirs):
                issues.append(f"rows {len(ours)} != {len(theirs)}")
            else:
                try:
                    pd.testing.assert_frame_equal(
                        ours, theirs, check_dtype=False,
                        check_exact=False, rtol=1e-9, atol=1e-9,
                    )
                except AssertionError as exc:
                    issues.append(f"values: {str(exc).splitlines()[-1]}")
        if issues:
            bad.append(name)
            print(f"FAIL  {name}: {'; '.join(issues)}")
        else:
            print(f"ok    {name} ({len(ours)} rows)")
    print(f"\n{len(names) - len(bad)}/{len(names)} strict-green")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
