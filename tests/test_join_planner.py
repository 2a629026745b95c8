"""Skew-aware join planning: distributed heavy-key detection and the
auto-salted join route (dedup.detect_hot_keys / auto_salted_join)."""

import numpy as np
import polars as pl
import pyarrow as pa
import pytest
import ray

from spider_ray.functions.dedup import (
    HOT_KEY_FACTOR,
    JOIN_PARTITIONS,
    _concat,
    _hash_join,
    auto_salted_join,
    detect_hot_keys,
)


def _skewed(n=20_000, hot_frac=0.3, seed=3):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 100, n).astype(np.int64)
    hot = rng.random(n) < hot_frac
    keys[hot] = 0  # one planted hot key carrying ~30% of rows
    return pa.table(
        {"k": pa.array(keys), "v": pa.array(np.arange(n, dtype=np.int64))}
    )


def test_detect_hot_keys_finds_planted_key(ray_session):
    t = _skewed()
    ds = ray.data.from_arrow(t).repartition(8)
    hot, salt = detect_hot_keys(ds, "k")
    assert "0" in hot
    assert len(hot) <= JOIN_PARTITIONS // HOT_KEY_FACTOR + 1
    assert 2 <= salt <= JOIN_PARTITIONS
    # even distribution → no hot keys, plain plan
    ev = pa.table(
        {"k": pa.array(np.arange(16_000, dtype=np.int64) % 1000),
         "v": pa.array(np.arange(16_000, dtype=np.int64))}
    )
    hot2, salt2 = detect_hot_keys(ray.data.from_arrow(ev).repartition(8), "k")
    assert hot2 == frozenset() and salt2 == 1


def test_auto_salted_join_matches_plain(ray_session):
    t = _skewed(n=12_000)
    dim = pa.table(
        {"k": pa.array(list(range(100)), pa.int64()),
         "grp": pa.array([f"g{i}" for i in range(100)], pa.string())}
    )
    l_schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])
    r_schema = pa.schema([("k", pa.int64()), ("grp", pa.string())])

    def run(j):
        return (
            pl.from_arrow(_concat(j))
            .sort(["k", "v"])
            .select(["k", "v", "grp"])
        )

    auto = run(
        auto_salted_join(
            ray.data.from_arrow(t).repartition(8),
            ray.data.from_arrow(dim),
            on="k", right_on="k",
            left_schema=l_schema, right_schema=r_schema,
        )
    )
    plain = run(
        _hash_join(
            ray.data.from_arrow(t).repartition(8),
            ray.data.from_arrow(dim),
            on="k", right_on="k",
            left_schema=l_schema, right_schema=r_schema,
        )
    )
    assert auto.equals(plain)
    assert auto.height == t.num_rows  # every left row matched
