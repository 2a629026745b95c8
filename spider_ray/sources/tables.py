"""Table readers — thin wrappers over ``ray.data.read_parquet`` that always
prune columns at the read (SURVEY §2.1 S1; the reference reads positional TSV
fields it needs — we read only the Parquet columns a pipeline uses, so at
100 TB only the referenced columns leave storage)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import ray.data


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """Columnar-pruned parquet read of one named table."""
    return ray.data.read_parquet(table_path(sf_dir, name), columns=columns, **kwargs)


def read_small(sf_dir: str, name: str, columns: list[str] | None = None):
    """Driver-side read of a SMALL dimension table as a pyarrow.Table —
    used for the broadcast side of map-side joins (SURVEY §2.4 J1: the
    reference broadcasts dict sides to every reducer; we ``ray.put`` the
    table once and read it zero-copy in every map task)."""
    return pq.read_table(table_path(sf_dir, name), columns=columns)
