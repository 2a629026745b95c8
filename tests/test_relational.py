"""Every queries() entry vs its oracle_sql() via DuckDB at sf0.001 — the
same comparison the driver runs at sf0.01 (row count, schema names,
order-insensitive values)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()  # ray Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object and len(df):
            # duckdb BLOB → bytearray is unhashable and breaks the
            # multi-key lexsort (same fix as tools/oracle_strict.norm);
            # per-row check so a NULL-leading column still converts
            df[c] = df[c].map(
                lambda v: bytes(v) if isinstance(v, bytearray) else v
            )
    # round BEFORE sorting so float noise below the tolerance can't reorder
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_query_matches_oracle(name, sf_dir):
    import __ray_entry__ as E

    raw_ours = _to_pandas(E.queries()[name](sf_dir))
    con = _duck(sf_dir)
    raw_theirs = con.sql(E.oracle_sql()[name]).df()
    # dtype-STRICT: the driver's value hash distinguishes uint32 from
    # BIGINT and int from HUGEINT-as-float (round-1 lesson) — engine and
    # oracle must agree on raw pandas dtypes, not just values
    ours_dtypes = {c: str(raw_ours[c].dtype) for c in raw_ours.columns}
    theirs_dtypes = {c: str(raw_theirs[c].dtype) for c in raw_theirs.columns}
    assert ours_dtypes == theirs_dtypes, (
        f"{name}: dtype mismatch {ours_dtypes} != {theirs_dtypes}"
    )
    ours = _normalize(raw_ours)
    theirs = _normalize(raw_theirs)
    assert list(ours.columns) == list(theirs.columns), (
        f"{name}: columns {list(ours.columns)} != {list(theirs.columns)}"
    )
    assert len(ours) == len(theirs), f"{name}: rows {len(ours)} != {len(theirs)}"
    pd.testing.assert_frame_equal(
        ours, theirs, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6
    )


def all_query_names():
    import __ray_entry__ as E

    return [n for n in E.queries() if n in E.oracle_sql()]


@pytest.mark.parametrize("name", all_query_names())
def test_query_vs_oracle(name, ray_session, sf_small):
    assert_query_matches_oracle(name, sf_small)


def test_anti_join_scale_path(ray_session, sf_small, monkeypatch):
    """Force the seen side over the broadcast threshold: the bloom-prefilter
    + distributed anti-cogroup path must produce the exact same rows as the
    broadcast pc.is_in path, with the driver never collecting the distinct
    seen set (only Bloom bit arrays and the final result cross the driver
    boundary on this path)."""
    from spider_ray.pipelines import relational as R

    broadcast = R.q_anti_join(sf_small)
    monkeypatch.setattr(R, "ANTI_JOIN_BROADCAST_MAX", 0)
    scale = R.q_anti_join(sf_small)
    assert broadcast.equals(scale)


def test_entry_smoke(ray_session):
    import __ray_entry__ as E

    t = E.entry()
    df = _to_pandas(t)
    assert len(df) >= 1
    # flagship = crawl order log with a stable schema
    for col in ("url", "host", "fetch_ts", "gen", "status"):
        assert col in df.columns


def test_intersect_keys_matches_set_algebra(ray_session, sf_small):
    """Engine INTERSECT equals driver-side set algebra over the raw
    table, and no key outside either half appears."""
    import pyarrow.parquet as pq

    from spider_ray.pipelines.relational import q_intersect_keys

    out = q_intersect_keys(sf_small)["custkey"].to_pylist()
    t = pq.read_table(
        sf_small + "/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    import datetime

    cut = datetime.datetime(1998, 1, 1)
    early, late = set(), set()
    for k, d in zip(t["o_custkey"].to_pylist(), t["o_orderdate"].to_pylist()):
        (early if d < cut else late).add(k)
    assert out == sorted(early & late)
    assert len(out) > 0


def test_salted_join_salt_invariant_and_spreads(ray_session, sf_small, monkeypatch):
    """The salted join's output equals the unsalted join (bucket
    invariance), and the salt math actually spreads a hot key over
    SALT_FACTOR distinct partitions."""
    import numpy as np
    import polars as pl

    import spider_ray.pipelines.relational as R
    from spider_ray.functions.dedup import JOIN_PARTITIONS
    from spider_ray.kernels.hashing import SEED

    salted = R.q_salted_join(sf_small)
    monkeypatch.setattr(R, "SALT_FACTOR", 1)
    plain = R.q_salted_join(sf_small)
    assert salted.equals(plain)
    # the hot key really is hot (its group dominates)
    g0 = salted.to_pylist()
    hot = next(r for r in g0 if r["grp"] == "g0")
    assert hot["n_orders"] > 3 * max(
        r["n_orders"] for r in g0 if r["grp"] != "g0"
    )
    # spreading math: (hash + i) % P hits SALT_FACTOR distinct partitions
    u = int(
        pl.DataFrame({"k": [0]})
        .select(pl.col("k").cast(pl.Int64).hash(seed=SEED))
        .item()
    )
    parts = {(u + i) % JOIN_PARTITIONS for i in range(8)}
    assert len(parts) == 8


def test_left_join_nulls_accounting(ray_session, sf_small):
    """Matched + unmatched order counts must cover the whole fact table,
    and unmatched must be exactly the orders of non-%3 customers."""
    import pyarrow.parquet as pq

    from spider_ray.pipelines.relational import q_left_join_nulls

    out = q_left_join_nulls(sf_small).to_pylist()
    t = pq.read_table(sf_small + "/orders.parquet", columns=["o_custkey"])
    keys = t["o_custkey"].to_pylist()
    import pyarrow.parquet as _pq

    cust = set(
        k for k in _pq.read_table(
            sf_small + "/customer.parquet", columns=["c_custkey"]
        )["c_custkey"].to_pylist()
        if k % 3 == 0
    )
    expect_unmatched = sum(1 for k in keys if k not in cust)
    total = sum(r["n_orders"] for r in out)
    got_unmatched = next(
        (r["n_orders"] for r in out if r["segment"] == "unmatched"), 0
    )
    assert total == len(keys)
    assert got_unmatched == expect_unmatched


def test_cube_levels_consistent(ray_session, sf_small):
    """Every CUBE level must re-sum to the grand total."""
    import polars as pl

    from spider_ray.pipelines.relational import q_cube

    out = pl.from_arrow(q_cube(sf_small))
    tot = out.filter(
        pl.col("l_returnflag").is_null() & pl.col("l_linestatus").is_null()
    )
    assert tot.height == 1
    detail = out.filter(
        pl.col("l_returnflag").is_not_null()
        & pl.col("l_linestatus").is_not_null()
    )
    for lvl in (
        out.filter(pl.col("l_returnflag").is_not_null()
                   & pl.col("l_linestatus").is_null()),
        out.filter(pl.col("l_returnflag").is_null()
                   & pl.col("l_linestatus").is_not_null()),
        detail,
    ):
        assert lvl["n_items"].sum() == tot["n_items"][0]
        assert abs(lvl["revenue"].sum() - tot["revenue"][0]) < 1e-6


def test_funnel_monotone_and_flat_recompute(ray_session, sf_small):
    """Funnel stages are monotone non-increasing and equal a flat
    single-process chained-min recompute."""
    import pyarrow.parquet as pq

    from spider_ray.pipelines.relational import q_funnel

    out = q_funnel(sf_small).to_pylist()[0]
    assert out["n_view"] >= out["n_click"] >= out["n_purchase"] > 0
    t = pq.read_table(
        sf_small + "/events.parquet",
        columns=["user_id", "ts", "event_type"],
    )
    t1, t2, t3 = {}, {}, {}
    rows = sorted(
        zip(t["user_id"].to_pylist(), t["ts"].to_pylist(),
            t["event_type"].to_pylist()),
        key=lambda r: r[1],
    )
    for u, ts, et in rows:
        if et == "view":
            t1.setdefault(u, ts)
    for u, ts, et in rows:
        if et == "click" and u in t1 and ts >= t1[u]:
            t2.setdefault(u, ts)
    for u, ts, et in rows:
        if et == "purchase" and u in t2 and ts >= t2[u]:
            t3.setdefault(u, ts)
    assert (out["n_view"], out["n_click"], out["n_purchase"]) == (
        len(t1), len(t2), len(t3)
    )


def test_retention_matrix_invariants(ray_session, sf_small):
    """Offset-0 of each cohort counts the whole cohort; every retention
    count ≤ its cohort size; total distinct (user, week) pairs covered."""
    import polars as pl
    import pyarrow.parquet as pq

    from spider_ray.pipelines.relational import q_retention

    out = pl.from_arrow(q_retention(sf_small))
    assert out.height > 1
    assert (out["week_offset"] >= 0).all()
    sizes = dict(
        out.filter(pl.col("week_offset") == 0)
        .select("cohort_week", "n_users")
        .iter_rows()
    )
    for c, _o, n in out.iter_rows():
        assert n <= sizes[c]
    # coverage: sum of all cells == distinct (user, week) pairs
    t = pq.read_table(
        sf_small + "/events.parquet", columns=["user_id", "ts"]
    )
    import datetime

    pairs = {
        (u, int(ts.timestamp()) // 604800)
        for u, ts in zip(t["user_id"].to_pylist(), t["ts"].to_pylist())
    }
    assert out["n_users"].sum() == len(pairs)


def test_scd2_interval_invariants(ray_session, sf_small):
    """Per key: exactly one current version; intervals chain exactly
    (valid_to == next valid_from); every order appears once."""
    import polars as pl
    import pyarrow.parquet as pq

    from spider_ray.pipelines.relational import q_scd2

    out = pl.from_arrow(q_scd2(sf_small))
    n_orders = pq.read_metadata(sf_small + "/orders.parquet").num_rows
    assert out.height == n_orders
    assert out["o_orderkey"].n_unique() == n_orders
    per = out.group_by("custkey").agg(
        n_current=pl.col("is_current").sum(),
        starts=pl.col("valid_from")
        .sort_by(["valid_from", "o_orderkey"])
        .alias("starts"),
        ends=pl.col("valid_to")
        .sort_by(["valid_from", "o_orderkey"])
        .alias("ends"),
    )
    assert (per["n_current"] == 1).all()
    for starts, ends in zip(per["starts"].to_list(), per["ends"].to_list()):
        assert ends[-1] is None
        assert ends[:-1] == starts[1:]


def test_interevent_gaps_matches_bruteforce(ray_session):
    """Distributed per-user LAG gaps equal a single-process polars window
    reference (count/min/max/sum of µs gaps; single-event users have no
    row)."""
    import polars as pl
    import pyarrow.parquet as pq

    from spider_ray.pipelines.relational import q_interevent_gaps

    sf = "/root/testdata/sf0.001"
    out = pl.from_arrow(q_interevent_gaps(sf))
    ev = pl.from_arrow(
        pq.read_table(
            f"{sf}/events.parquet", columns=["user_id", "event_id", "ts"]
        )
    )
    ref = (
        ev.sort(["ts", "event_id"])
        .with_columns(
            gap=pl.col("ts").diff().over("user_id").dt.total_microseconds()
        )
        .drop_nulls("gap")
        .group_by("user_id")
        .agg(
            n_gaps=pl.len().cast(pl.Int64),
            min_gap_us=pl.col("gap").min().cast(pl.Int64),
            max_gap_us=pl.col("gap").max().cast(pl.Int64),
            sum_gap_us=pl.col("gap").sum().cast(pl.Int64),
        )
        .sort("user_id")
    )
    assert out.sort("user_id").equals(ref)
    assert (out["min_gap_us"] <= out["max_gap_us"]).all()
