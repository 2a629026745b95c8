"""Relational pipelines over the sf parquet tables.

Each function takes ``sf_dir`` and returns a small pyarrow.Table (or a lazy
Dataset for big outputs). Every function mirrors one operator class from the
reference crawler (SURVEY.md §2 item cited per function) re-expressed
Ray-Data-first. Column names are frozen to match ``oracle_sql`` in
``__ray_entry__.py`` exactly.
"""

from __future__ import annotations

import datetime as _dt

import polars as pl
import pyarrow as pa
import pyarrow.dataset as _pads
import pyarrow.compute as pc
import ray

from spider_ray.kernels.hashing import mix64_int
from spider_ray.sources.tables import read_small, read_table
from spider_ray.stages.agg import (
    broadcast_join,
    partial_final_agg,
    unsigned_to_int64,
)



def _cents(col: str):
    """Exact integer cents of a 2-dp monetary double column — integer sums
    are order-independent, so engine and DuckDB oracle agree bit-for-bit
    (floating sums over 10^5+ rows cannot)."""
    return (pl.col(col) * 100).round(0).cast(pl.Int64)


def _disc_units(col: str = "l_discount"):
    """(1 - discount) in integer hundredths."""
    return 100 - (pl.col(col) * 100).round(0).cast(pl.Int64)


def _scale_cols(t: pa.Table, scales: dict[str, int]) -> pa.Table:
    """Divide integer-unit columns into dollar doubles with pyarrow's exact
    IEEE division (polars' lazy plan rewrites literal division into
    multiply-by-reciprocal, which differs in the last ulp from the DuckDB
    oracle's true division)."""
    for col, denom in scales.items():
        idx = t.schema.get_field_index(col)
        v = pc.divide(pc.cast(t[col], pa.float64()), pa.scalar(float(denom)))
        t = t.set_column(idx, col, v)
    return t

def _sorted(t: pa.Table, keys, descending=False) -> pa.Table:
    if isinstance(keys, str):
        keys = [keys]
    order = "descending" if descending else "ascending"
    return unsigned_to_int64(t.sort_by([(k, order) for k in keys]))


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.5)


def q_pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H-Q1-shaped per-flag aggregate: map-side partial combine then tiny
    final merge (reference pattern: per-IP stat combiner, ip_stat.cc:37-79)."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    cutoff = pl.datetime(1998, 9, 2)

    def partial(lf: pl.LazyFrame) -> pl.LazyFrame:
        # exact integer units: quantities are integral, prices 2-dp cents,
        # disc-price in price_cents x disc_units (1e-4 dollars)
        return (
            lf.filter(pl.col("l_shipdate") <= cutoff)
            .group_by("l_returnflag", "l_linestatus")
            .agg(
                qty=pl.col("l_quantity").cast(pl.Int64).sum(),
                base_cents=_cents("l_extendedprice").sum(),
                disc_e4=(_cents("l_extendedprice") * _disc_units()).sum(),
                disc_cents=(pl.col("l_discount") * 100).round(0).cast(pl.Int64).sum(),
                count_order=pl.len(),
            )
        )

    def final(lf: pl.LazyFrame) -> pl.LazyFrame:
        return (
            lf.group_by("l_returnflag", "l_linestatus")
            .agg(
                sum_qty=pl.col("qty").sum(),
                sum_base_price=pl.col("base_cents").sum(),
                sum_disc_price=pl.col("disc_e4").sum(),
                avg_qty=pl.col("qty").sum(),
                avg_price=pl.col("base_cents").sum(),
                avg_disc=pl.col("disc_cents").sum(),
                count_order=pl.col("count_order").sum(),
            )
            .sort("l_returnflag", "l_linestatus")
        )

    t = partial_final_agg(ds, partial, final)
    n = pc.cast(t["count_order"], pa.float64())
    t = _scale_cols(t, {"sum_qty": 1, "sum_base_price": 100,
                        "sum_disc_price": 10000})
    for col, denom in (("avg_qty", 1.0), ("avg_price", 100.0),
                       ("avg_disc", 100.0)):
        idx = t.schema.get_field_index(col)
        v = pc.divide(
            pc.divide(pc.cast(t[col], pa.float64()), pa.scalar(denom)), n
        )
        t = t.set_column(idx, col, v)
    return t


def q_per_key_count(sf_dir: str) -> pa.Table:
    """Per-customer order count+sum — per-host URL stats analog
    (host_stat.cc). Native Ray groupby (hash shuffle w/ partial agg)."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def add_cents(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(cents=_cents("o_totalprice"))
        return df.select("o_custkey", "cents").to_arrow()

    agg = (
        ds.map_batches(add_cents, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Count(), Sum("cents"))
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [
                {"count()": "order_count", "sum(cents)": "total_price"}.get(
                    n, n
                )
                for n in t.column_names
            ]
        ).select(["o_custkey", "order_count", "total_price"])

    t = _concat(agg.map_batches(rename, batch_format="pyarrow"))
    return _sorted(_scale_cols(t, {"total_price": 100}), "o_custkey")


def q_topk_spenders(sf_dir: str) -> pa.Table:
    """Top-10 customers by spend — drain-time sort + topk analog
    (run_schedule.sh:242-248 global sort; evaluation top-N)."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(lf):
        return lf.group_by("o_custkey").agg(cents=_cents("o_totalprice").sum())

    def final(lf):
        return (
            lf.group_by("o_custkey")
            .agg(total_spent=pl.col("cents").sum())
            .sort(["total_spent", "o_custkey"], descending=[True, False])
            .head(10)
        )

    return _scale_cols(partial_final_agg(ds, partial, final),
                       {"total_spent": 100})


def q_minmax_stats(sf_dir: str) -> pa.Table:
    """Per-event-type min/max/mean/count — crawl metrics counters analog
    (crawler.cc:26-34 atomic counters exported periodically)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(lf):
        return lf.group_by("event_type").agg(
            vmin=pl.col("value").min(),
            vmax=pl.col("value").max(),
            vcents=_cents("value").sum(),
            n=pl.len(),
        )

    def final(lf):
        return (
            lf.group_by("event_type")
            .agg(
                min_value=pl.col("vmin").min(),
                max_value=pl.col("vmax").max(),
                avg_value=pl.col("vcents").sum(),
                event_count=pl.col("n").sum(),
            )
            .sort("event_type")
        )

    t = partial_final_agg(ds, partial, final)
    idx = t.schema.get_field_index("avg_value")
    v = pc.divide(
        pc.divide(pc.cast(t["avg_value"], pa.float64()), pa.scalar(100.0)),
        pc.cast(t["event_count"], pa.float64()),
    )
    return t.set_column(idx, "avg_value", v)


def q_conditional_agg(sf_dir: str) -> pa.Table:
    """Per-user pivot counts of event types — per-source tagged counting
    (statistic/mr_stat_site_pv_mapper.cc combiner pattern). Output is keyed
    by user_id — O(users), unbounded at corpus scale — so the final merge is
    DISTRIBUTED: per-block partial pivots carry a hash-partition key and each
    partition reduces in a ``groupby(part).map_groups`` worker (the
    q_latest_record shape); the driver never merges O(users) partials."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(batch)
            .group_by("user_id")
            .agg(
                n_click=(pl.col("event_type") == "click").sum(),
                n_view=(pl.col("event_type") == "view").sum(),
                n_purchase=(pl.col("event_type") == "purchase").sum(),
                purchase_cents=pl.when(pl.col("event_type") == "purchase")
                .then(_cents("value"))
                .otherwise(0)
                .sum(),
            )
            .with_columns(part=(pl.col("user_id") % 32).cast(pl.Int32))
        )
        return out.to_arrow()

    def final_group(group: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(group)
            .group_by("user_id")
            .agg(
                n_click=pl.col("n_click").sum(),
                n_view=pl.col("n_view").sum(),
                n_purchase=pl.col("n_purchase").sum(),
                purchase_value=pl.col("purchase_cents").sum(),
            )
            .to_arrow()
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final_group, batch_format="pyarrow")
    )
    return _scale_cols(_sorted(_concat(out), "user_id"), {"purchase_value": 100})


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.4)


def q_broadcast_join(sf_dir: str) -> pa.Table:
    """Revenue per part brand: big lineitem ⋈ small part via broadcast
    (J1 url→ip dict broadcast, url_to_ip.cc:25-91)."""
    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"]
    )
    part = read_small(sf_dir, "part", columns=["p_partkey", "p_brand"])
    joined = broadcast_join(li, part, keys="l_partkey", right_keys="p_partkey")

    def partial(lf):
        return lf.group_by("p_brand").agg(
            rev_e4=(_cents("l_extendedprice") * _disc_units()).sum()
        )

    def final(lf):
        return (
            lf.group_by("p_brand")
            .agg(revenue=pl.col("rev_e4").sum())
            .sort("p_brand")
        )

    return _scale_cols(partial_final_agg(joined, partial, final),
                       {"revenue": 10000})


def q_cogroup_join(sf_dir: str) -> pa.Table:
    """Orders per nation: orders ⋈ customer (broadcast) ⋈ nation (broadcast)
    — J2 robots-by-host tagged join re-expressed."""
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    j = broadcast_join(orders, cust, keys="o_custkey", right_keys="c_custkey")
    j = broadcast_join(j, nation, keys="c_nationkey", right_keys="n_nationkey")

    def partial(lf):
        return lf.group_by("n_name").agg(
            order_count=pl.len(), cents=_cents("o_totalprice").sum()
        )

    def final(lf):
        return (
            lf.group_by("n_name")
            .agg(
                order_count=pl.col("order_count").sum(),
                total_price=pl.col("cents").sum(),
            )
            .sort("n_name")
        )

    return _scale_cols(partial_final_agg(j, partial, final),
                       {"total_price": 100})


# Above this many distinct seen keys the broadcast pc.is_in side would be a
# driver materialization — switch to the bloom-prefiltered distributed path.
ANTI_JOIN_BROADCAST_MAX = 1_000_000


def q_anti_join(sf_dir: str) -> pa.Table:
    """Customers with no order before 1996-01-01 — the linkbase anti-join /
    URL-seen suppression (J3, mr_selector_r1_reducer.cc:54-156). The date
    gate keeps the result non-trivial at every sf (every customer has SOME
    order in the sf tables, so the unfiltered variant is vacuously empty).

    Adaptive seen side: distinct keys ≤ ``ANTI_JOIN_BROADCAST_MAX`` →
    collect + ``ray.put`` broadcast ``pc.is_in`` (one pass, no shuffle);
    above it → mergeable per-block Bloom prefilter (bloom-NEGATIVE rows are
    definitely unseen and pass with no shuffle at all) and a distributed
    partition-cogroup anti-join over only the bloom-POSITIVE remainder —
    the driver never holds the distinct set (q_bloom_anti_join's machinery,
    generalized)."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def early(batch: pa.Table) -> pa.Table:
        cut = pa.scalar("1996-01-01").cast(
            batch.schema.field("o_orderdate").type
        )
        return batch.filter(
            pc.less(batch["o_orderdate"], cut)
        ).select(["o_custkey"])

    def block_distinct(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": pc.unique(batch["o_custkey"]).cast(pa.int64())}
        )

    # per-block partial dedup (combiner); global distinct only happens
    # driver-side on the broadcast path, where it is small by the gate
    seen = (
        read_table(
            sf_dir, "orders", columns=["o_custkey", "o_orderdate"],
            # predicate pushed to the read: row groups past the cutoff
            # never leave storage (the in-batch filter stays for
            # bit-identical block semantics)
            filter=_pads.field("o_orderdate")
            < pa.scalar(_dt.datetime(1996, 1, 1), pa.timestamp("us")),
        )
        .map_batches(early, batch_format="pyarrow")
        .map_batches(block_distinct, batch_format="pyarrow")
        .materialize()
    )
    # block-deduped row count is a cheap upper bound on the distinct count
    if seen.count() <= ANTI_JOIN_BROADCAST_MAX:
        seen_ref = ray.put(pa.array(sorted(seen.unique("o_custkey")),
                                    pa.int64()))

        def _anti(batch: pa.Table) -> pa.Table:
            seen_keys = ray.get(seen_ref)
            mask = pc.invert(pc.is_in(batch["c_custkey"], value_set=seen_keys))
            return batch.filter(mask)

        t = _concat(cust.map_batches(_anti, batch_format="pyarrow"))
        return _sorted(t, "c_custkey")

    # scale path: bloom prefilter + distributed anti-cogroup on positives
    from spider_ray.functions.dedup import _anti_join
    from spider_ray.functions.sketch import _HLL_SEED, BloomFilter
    from spider_ray.kernels.hashing import mix64_int

    N_BITS, K = 1 << 22, 4

    def block_bloom(batch: pa.Table) -> pa.Table:
        f = BloomFilter(N_BITS, k=K)
        f.add(mix64_int(
            batch["o_custkey"].to_numpy(zero_copy_only=False), seed=_HLL_SEED
        ))
        return pa.table({"bits": pa.array([f.to_bytes()], pa.binary())})

    merged = BloomFilter(N_BITS, k=K)
    for t in ray.get(
        seen.map_batches(block_bloom, batch_format="pyarrow")
        .materialize().to_arrow_refs()
    ):
        for b in t["bits"]:
            merged.merge(BloomFilter.from_bytes(b.as_py(), k=K))
    bloom_ref = ray.put(merged.to_bytes())

    def split(batch: pa.Table) -> pa.Table:
        f = BloomFilter.from_bytes(ray.get(bloom_ref), k=K)
        keys = batch["c_custkey"].to_numpy(zero_copy_only=False)
        maybe = f.contains(mix64_int(keys, seed=_HLL_SEED))
        return batch.append_column("__maybe", pa.array(maybe))

    tagged = cust.map_batches(split, batch_format="pyarrow").materialize()
    cand_schema = pa.schema(
        [pa.field("c_custkey", pa.int64()), pa.field("c_name", pa.string())]
    )

    def take(flag: bool):
        def f(b: pa.Table) -> pa.Table:
            mask = pc.equal(b["__maybe"], pa.scalar(flag))
            return b.filter(mask).drop_columns(["__maybe"]).cast(cand_schema)

        return f

    negatives = tagged.map_batches(take(False), batch_format="pyarrow")
    positives = tagged.map_batches(take(True), batch_format="pyarrow")
    survivors = _anti_join(positives, seen, "c_custkey", "o_custkey",
                           cand_schema)
    t = _concat(negatives.union(survivors))
    return _sorted(t, "c_custkey")


def q_region_revenue(sf_dir: str) -> pa.Table:
    """Multi-hop dimension join: orders→customer→nation→region revenue
    (schedule pipeline's chained small joins, run_schedule.sh steps 2-4)."""
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = read_small(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    region = read_small(sf_dir, "region", columns=["r_regionkey", "r_name"])
    dim = cust.join(nation, keys="c_nationkey", right_keys="n_nationkey").join(
        region, keys="n_regionkey", right_keys="r_regionkey"
    )
    j = broadcast_join(
        orders,
        dim.select(["c_custkey", "r_name"]),
        keys="o_custkey",
        right_keys="c_custkey",
    )

    def partial(lf):
        return lf.group_by("r_name").agg(cents=_cents("o_totalprice").sum())

    def final(lf):
        return (
            lf.group_by("r_name")
            .agg(revenue=pl.col("cents").sum())
            .sort("r_name")
        )

    return _scale_cols(partial_final_agg(j, partial, final),
                       {"revenue": 100})


def q_latest_record(sf_dir: str) -> pa.Table:
    """Per-user latest event — the batch⋈delta linkbase merge keep-max-
    timestamp rule (J6, mr_combine_batch_delta_reducer.cc:33-95). Two-stage:
    per-block partial latest, then a DISTRIBUTED final: partials are
    hash-partitioned by user and each partition reduces vectorized in a
    ``groupby(part).map_groups`` worker (output is O(users) — never a
    driver-side merge)."""
    ds = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"]
    )

    def latest(df: pl.DataFrame) -> pl.DataFrame:
        return (
            df.sort(["ts", "event_id"], descending=[True, True])
            .group_by("user_id", maintain_order=True)
            .first()
        )

    def partial(batch: pa.Table) -> pa.Table:
        # per-block combine plus the partition key for the distributed
        # final (output is O(users) — never driver-merged)
        out = latest(pl.from_arrow(batch)).with_columns(
            part=(pl.col("user_id") % 32).cast(pl.Int32)
        )
        return out.to_arrow()

    def final_group(group: pa.Table) -> pa.Table:
        return (
            latest(pl.from_arrow(group))
            .select("user_id", "event_id", "ts", "event_type", "value")
            .to_arrow()
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final_group, batch_format="pyarrow")
    )
    return _sorted(_concat(out), "user_id")


def q_asof_join(sf_dir: str) -> pa.Table:
    """As-of join — for every click, the most recent purchase by the same
    user at or before the click time. Ray Data has no native as-of join;
    composition per the brief: co-partition both sides with ONE
    ``groupby(user_id)`` shuffle (the reference's tagged A/B co-group join,
    control/robots/data_prepare.cc:71-150), then a vectorized per-group
    ``join_asof`` (sort-merge within the partition). Ties on the right side
    are pre-collapsed to max(value) per (user, ts) so the match is uniquely
    defined on both engine and oracle."""
    ds = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"]
    ).filter(expr="event_type == 'click' or event_type == 'purchase'")

    def asof(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        left = (
            df.filter(pl.col("event_type") == "click")
            .select("event_id", "user_id", "ts")
            .sort("ts", "event_id")
        )
        right = (
            df.filter(pl.col("event_type") == "purchase")
            .group_by("user_id", "ts")
            .agg(purchase_value=pl.col("value").max())
            .rename({"ts": "purchase_ts"})
            .sort("purchase_ts")
        )
        if left.height == 0:
            return left.with_columns(
                purchase_ts=pl.lit(None, dtype=df.schema["ts"]),
                purchase_value=pl.lit(None, dtype=pl.Float64),
            ).to_arrow()
        import warnings

        with warnings.catch_warnings():
            # polars warns it cannot pre-check sortedness under `by` groups;
            # each map_groups table is a single user and both sides are
            # explicitly sorted above.
            warnings.simplefilter("ignore")
            out = left.join_asof(
                right, left_on="ts", right_on="purchase_ts", by="user_id",
                strategy="backward",
            )
        return out.select(
            "event_id", "user_id", "ts", "purchase_ts", "purchase_value"
        ).to_arrow()

    out = ds.groupby("user_id").map_groups(asof, batch_format="pyarrow")
    return _sorted(_concat(out), "event_id")


def q_range_join(sf_dir: str) -> pa.Table:
    """Non-equi range join — lineitem quantity binned into (lo, hi] bands
    derived from the nation table. Scale path for a range join with a small
    interval side: broadcast the sorted band table once (``ray.put``) and
    binary-search each batch's keys into it (np.searchsorted) — no shuffle
    of the big side — then partial/final aggregate per band. Mirrors the
    priority-band assignment O6 (scheduler.cc:192-205) generalized to
    arbitrary intervals."""
    import numpy as np

    nation = read_small(sf_dir, "nation", columns=["n_nationkey"])
    band_id = pc.cast(nation["n_nationkey"], pa.int64()).to_numpy(
        zero_copy_only=False
    )
    order = np.argsort(band_id, kind="stable")
    los = band_id[order] * 2.0
    his = los + 2.0
    bands_ref = ray.put((band_id[order], los, his))

    ds = read_table(
        sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"]
    )

    def assign(batch: pa.Table) -> pa.Table:
        bid, lo, hi = ray.get(bands_ref)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        # band i matches when lo[i] < q <= hi[i]; los sorted ascending
        idx = np.searchsorted(lo, q, side="left") - 1
        ok = (idx >= 0) & (q <= hi[np.clip(idx, 0, len(hi) - 1)])
        idx = idx[ok]
        cents = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[ok] * 100
        ).astype(np.int64)
        return pa.table(
            {"band_id": pa.array(bid[idx], pa.int64()),
             "cents": pa.array(cents, pa.int64())}
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def partial(lf):
        return lf.group_by("band_id").agg(
            n_items=pl.len(), cents=pl.col("cents").sum()
        )

    def final(lf):
        return (
            lf.group_by("band_id")
            .agg(n_items=pl.col("n_items").sum(), revenue=pl.col("cents").sum())
            .sort("band_id")
        )

    return _scale_cols(partial_final_agg(assigned, partial, final),
                       {"revenue": 100})


# ---------------------------------------------------------------------------
# Filters / banding / union-dedup / sampling / windows (SURVEY §2.2, §2.6, §2.7)


def q_filter_revenue(sf_dir: str) -> pa.Table:
    """Predicate filter + global agg (TPC-H-Q6 shape) — the URL filter-rules
    gate M3 (crawler_selector_util.cc:413-520) as a relational filter. The
    ship-date predicate is PUSHED TO THE READ (parquet row-group pruning:
    rows outside the year never leave storage); the remaining in-batch
    filter keeps bit-identical semantics."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(
            (_pads.field("l_shipdate")
             >= pa.scalar(_dt.datetime(1997, 1, 1), pa.timestamp("us")))
            & (_pads.field("l_shipdate")
               < pa.scalar(_dt.datetime(1998, 1, 1), pa.timestamp("us")))
        ),
    )

    def partial(lf):
        return (
            lf.filter(
                (pl.col("l_shipdate") >= pl.datetime(1997, 1, 1))
                & (pl.col("l_shipdate") < pl.datetime(1998, 1, 1))
                & (pl.col("l_discount") >= 0.02)
                & (pl.col("l_discount") <= 0.06)
                & (pl.col("l_quantity") < 24)
            )
            .select(
                rev_e4=(
                    _cents("l_extendedprice")
                    * (pl.col("l_discount") * 100).round(0).cast(pl.Int64)
                ).sum(),
                n_rows=pl.len(),
            )
        )

    def final(lf):
        return lf.select(
            revenue=pl.col("rev_e4").sum(),
            n_rows=pl.col("n_rows").sum(),
        )

    return _scale_cols(partial_final_agg(ds, partial, final),
                       {"revenue": 10000})


def q_priority_bands(sf_dir: str) -> pa.Table:
    """Score→priority banding (O6, scheduler.cc:192-205: ≥500→[0,9],
    ≥100→[10,29], ≥10→[30,49], else [50,99]) applied to order totals
    (scaled ×1000), counting orders per band."""
    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def partial(lf):
        lf = lf.with_columns(
            band=pl.when(pl.col("o_totalprice") >= 500_000)
            .then(0)
            .when(pl.col("o_totalprice") >= 100_000)
            .then(10)
            .when(pl.col("o_totalprice") >= 10_000)
            .then(30)
            .otherwise(50)
        )
        return lf.group_by("band").agg(n_orders=pl.len())

    def final(lf):
        return lf.group_by("band").agg(n_orders=pl.col("n_orders").sum()).sort("band")

    return partial_final_agg(ds, partial, final)


def q_union_dedup(sf_dir: str) -> pa.Table:
    """Multi-source union + exact dedup (D1/D2: 7-source frontier union then
    gb(url) first-wins). ids from two sources → distinct sorted."""
    a = read_table(sf_dir, "events", columns=["user_id"]).map_batches(
        lambda b: b.rename_columns(["id"]), batch_format="pyarrow"
    )
    b = read_table(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        lambda t: t.rename_columns(["id"]), batch_format="pyarrow"
    )
    u = a.union(b)

    # block-level partial dedup, then a NATIVE distributed groupby for the
    # global distinct — output cardinality is unbounded, so the final
    # combine must be a shuffle, not a driver-side merge
    def partial(batch: pa.Table) -> pa.Table:
        return pl.from_arrow(batch).unique(subset=["id"]).to_arrow()

    from ray.data.aggregate import Count

    distinct = (
        u.map_batches(partial, batch_format="pyarrow")
        .groupby("id")
        .aggregate(Count())
    )
    t = _concat(distinct).select(["id"])
    return _sorted(t, "id")


def q_sample_mod(sf_dir: str) -> pa.Table:
    """Deterministic 1/97 sample (O5 image-corpus sampling made seedless-
    deterministic per FIXTURES §9): event_id % 97 == 0 → count + sum."""
    ds = read_table(sf_dir, "events", columns=["event_id", "value"])

    def partial(lf):
        return lf.filter(pl.col("event_id") % 97 == 0).select(
            n_sampled=pl.len(), cents=_cents("value").sum()
        )

    def final(lf):
        return lf.select(
            n_sampled=pl.col("n_sampled").sum(),
            value_sum=pl.col("cents").sum(),
        )

    return _scale_cols(partial_final_agg(ds, partial, final),
                       {"value_sum": 100})


def q_window_hourly(sf_dir: str) -> pa.Table:
    """Tumbling 1-hour window per event type (streaming semantics §2.9 —
    time-split saver rolls output by timespan, time_split_saver.h:16-57)."""
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(lf):
        return (
            lf.with_columns(window_start=pl.col("ts").dt.truncate("1h"))
            .group_by("window_start", "event_type")
            .agg(n_events=pl.len(), cents=_cents("value").sum())
        )

    def final(lf):
        return (
            lf.group_by("window_start", "event_type")
            .agg(
                n_events=pl.col("n_events").sum(),
                value_sum=pl.col("cents").sum(),
            )
            .sort("window_start", "event_type")
        )

    return _scale_cols(partial_final_agg(ds, partial, final),
                       {"value_sum": 100})


def q_sessionize(sf_dir: str) -> pa.Table:
    """Gap-based sessionization (30-min inactivity splits a session) — the
    streaming-window op (§2.9): distributed ``groupby(user).map_groups``
    with a vectorized per-group window computation."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def sessions(group: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(group)
            .sort(["ts", "event_id"])
            .with_columns(
                new_session=(
                    pl.col("ts")
                    .diff()
                    .dt.total_microseconds()
                    .fill_null(10**12)
                    > 30 * 60 * 1_000_000
                ).cast(pl.Int64)
            )
        )
        return (
            df.group_by("user_id")
            .agg(
                n_events=pl.len().cast(pl.Int64),
                n_sessions=pl.col("new_session").sum().cast(pl.Int64),
            )
            .to_arrow()
        )

    out = ds.groupby("user_id").map_groups(sessions, batch_format="pyarrow")
    return _sorted(_concat(out), "user_id")


def q_interevent_gaps(sf_dir: str) -> pa.Table:
    """Per-user inter-event-time statistics — the LAG/LEAD window class
    (time-between-actions is the standard engagement statistic next to
    sessionization, and the reference's per-host fetch scheduler reasons
    about inter-request gaps the same way). Distributed
    ``groupby(user).map_groups``: sort within the user by (ts, event_id),
    vectorized diff, then exact int64 aggregates (count/min/max/sum of
    the gap in µs — sum+count instead of a float mean keeps the row
    hash exact). Users with fewer than two events have no gap and no
    row. Per-key windows never cross partitions, so no global sort."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def gaps(group: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(group)
            .sort(["ts", "event_id"])
            .with_columns(
                gap=pl.col("ts")
                .diff()
                .over("user_id")
                .dt.total_microseconds()
            )
            .drop_nulls("gap")
        )
        return (
            df.group_by("user_id")
            .agg(
                n_gaps=pl.len().cast(pl.Int64),
                min_gap_us=pl.col("gap").min().cast(pl.Int64),
                max_gap_us=pl.col("gap").max().cast(pl.Int64),
                sum_gap_us=pl.col("gap").sum().cast(pl.Int64),
            )
            .to_arrow()
        )

    out = ds.groupby("user_id").map_groups(gaps, batch_format="pyarrow")
    return _sorted(_concat(out), "user_id")


def q_running_total(sf_dir: str) -> pa.Table:
    """Cumulative revenue per customer in order-date order — the running
    window aggregate, as a distributed ``groupby(key).map_groups`` with a
    vectorized in-group cumsum (per-key windows never cross partition
    boundaries, so no global sort is needed)."""
    ds = read_table(
        sf_dir, "orders",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def running(group: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(group)
            .sort(["o_orderdate", "o_orderkey"])
            .with_columns(cents=_cents("o_totalprice"))
            .with_columns(running_total=pl.col("cents").cum_sum())
            .select("o_custkey", "o_orderkey", "o_orderdate", "running_total")
        )
        return df.to_arrow()

    out = ds.groupby("o_custkey").map_groups(running, batch_format="pyarrow")
    return _scale_cols(
        _sorted(_concat(out), ["o_custkey", "o_orderdate", "o_orderkey"]),
        {"running_total": 100},
    )


def q_topn_per_group(sf_dir: str) -> pa.Table:
    """Top-3 orders per customer — per-key window rank via distributed
    ``groupby(key).map_groups`` (A5 top-N evaluation shape)."""
    ds = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )

    def top3(group: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(group)
            .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
            .head(3)
        )
        return df.with_columns(
            rn=pl.int_range(1, df.height + 1, dtype=pl.Int64)
        ).to_arrow()

    out = ds.groupby("o_custkey").map_groups(top3, batch_format="pyarrow")
    return _sorted(_concat(out), ["o_custkey", "rn"])


def q_rollup(sf_dir: str) -> pa.Table:
    """ROLLUP aggregate — revenue per (nation, supplier) with nation
    subtotals and a grand total. The detail level is a partial/final
    aggregate over one broadcast-joined pass; the higher rollup levels are
    derived from the detail PARTIALS (re-aggregation of a tiny table), so
    the raw data is scanned exactly once no matter how many levels roll up
    (the reference's host_stat / ip_host_url_stat report family,
    control/schedule/host_stat.cc)."""
    li = read_table(sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice"])
    supp = read_small(
        sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"]
    )
    nation = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    j = broadcast_join(li, supp, keys="l_suppkey", right_keys="s_suppkey")
    j = broadcast_join(j, nation, keys="s_nationkey", right_keys="n_nationkey")

    def partial(lf):
        return lf.group_by("n_name", "s_name").agg(
            n_items=pl.len(), cents=_cents("l_extendedprice").sum()
        )

    cols = ["n_name", "s_name", "n_items", "revenue"]

    def final(lf):
        detail = lf.group_by("n_name", "s_name").agg(
            n_items=pl.col("n_items").sum(), revenue=pl.col("cents").sum()
        )
        nat = detail.group_by("n_name").agg(
            n_items=pl.col("n_items").sum(), revenue=pl.col("revenue").sum()
        ).with_columns(s_name=pl.lit(None, dtype=pl.Utf8))
        tot = detail.select(
            n_items=pl.col("n_items").sum(), revenue=pl.col("revenue").sum()
        ).with_columns(
            n_name=pl.lit(None, dtype=pl.Utf8),
            s_name=pl.lit(None, dtype=pl.Utf8),
        )
        return pl.concat(
            [detail.select(cols), nat.select(cols), tot.select(cols)]
        ).sort(["n_name", "s_name"], nulls_last=True)

    return _scale_cols(partial_final_agg(j, partial, final), {"revenue": 100})


def q_distinct_per_key(sf_dir: str) -> pa.Table:
    """Exact distinct count per group with per-block pre-dedup — the shuffle
    moves only unique (type, user) pairs, not raw rows (the reference's
    map-side combine discipline, mr_stat_site_pv_mapper.cc:17,29-50, applied
    to a COUNT DISTINCT)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(lf):
        return lf.unique(["event_type", "user_id"])

    def final(lf):
        return (
            lf.group_by("event_type")
            .agg(n_users=pl.col("user_id").n_unique())
            .sort("event_type")
        )

    return partial_final_agg(ds, partial, final)


def q_stratified_sample(sf_dir: str) -> pa.Table:
    """Deterministic stratified sample: per event_type, the 10 rows with the
    smallest frozen ``mix64_int(event_id, seed=777)`` key (O5 image-corpus
    sampling, mapper_extract_image_body.cc:62-70, made seed-deterministic
    per FIXTURES §9). Distributed top-k per stratum: each block keeps its
    local 10, the final merge re-ranks — no global sort. The SQL oracle
    reproduces the exact sample, not just its size."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type"])

    def keyed(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["event_id"], pa.int64())
        u = mix64_int(ids.to_numpy(zero_copy_only=False), seed=777)
        return pa.table(
            {
                "event_id": ids,
                "event_type": batch["event_type"],
                "u": pa.array(u, pa.uint64()),
            }
        )

    def partial(lf):
        return (
            lf.sort(["u", "event_id"])
            .group_by("event_type", maintain_order=True)
            .head(10)
        )

    def final(lf):
        return (
            partial(lf)
            .with_columns(
                smp_rank=pl.col("u")
                .rank(method="ordinal")
                .over("event_type")
                .cast(pl.Int64)
            )
            .select("event_type", "event_id", "smp_rank")
            .sort(["event_type", "smp_rank"])
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    return partial_final_agg(keyed_ds, partial, final)


def q_sliding_window(sf_dir: str) -> pa.Table:
    """Sliding windowed aggregate (1 h windows every 15 min): each event is
    expanded into the 4 windows that cover it (vectorized cross-join +
    truncate inside the block), then partial/final counted — the overlap
    fan-out happens before the shuffle so the shuffle moves partial rows
    only (§2.9 rolling-window semantics, time_split_saver.h:16-57)."""
    ds = read_table(sf_dir, "events", columns=["ts", "value"])
    offsets = pl.DataFrame(
        {"k": pl.Series([0, 1, 2, 3], dtype=pl.Int64)}
    )

    def partial(lf):
        return (
            lf.with_columns(bucket=pl.col("ts").dt.truncate("15m"))
            .join(offsets.lazy(), how="cross")
            .with_columns(
                window_start=pl.col("bucket")
                - pl.duration(minutes=15 * pl.col("k"))
            )
            .group_by("window_start")
            .agg(n_events=pl.len(), cents=_cents("value").sum())
        )

    def final(lf):
        return (
            lf.group_by("window_start")
            .agg(
                n_events=pl.col("n_events").sum(),
                value_sum=pl.col("cents").sum(),
            )
            .sort("window_start")
        )

    return _scale_cols(partial_final_agg(ds, partial, final),
                       {"value_sum": 100})


def q_quantiles(sf_dir: str) -> pa.Table:
    """Exact discrete quantiles (median / p95) per group — distributed
    ``groupby(key).map_groups`` with in-group element selection at index
    ``ceil(q*n)-1`` (DuckDB quantile_disc semantics, verified empirically),
    so engine and oracle agree bit-for-bit (A5 offline-eval shape)."""
    import math

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def quant(group: pa.Table) -> pa.Table:
        v = pc.cast(group["value"], pa.float64()).to_numpy(
            zero_copy_only=False
        ).copy()
        v.sort()
        n = len(v)

        def disc(q: float) -> float:
            return float(v[max(0, math.ceil(q * n) - 1)])

        return pa.table(
            {
                "event_type": [group["event_type"][0].as_py()],
                "n_rows": pa.array([n], pa.int64()),
                "median_value": pa.array([disc(0.5)], pa.float64()),
                "p95_value": pa.array([disc(0.95)], pa.float64()),
            }
        )

    out = ds.groupby("event_type").map_groups(quant, batch_format="pyarrow")
    return _sorted(_concat(out), "event_type")


# ---------------------------------------------------------------------------
# helpers


def _concat(ds: ray.data.Dataset, schema: pa.Schema | None = None) -> pa.Table:
    # materialize first: to_arrow_refs() on a LAZY dataset runs the plan a
    # second time (a limit-1 schema probe) — on join-bearing plans that
    # doubles the wall time; on a MaterializedDataset the refs are free
    tables = ray.get(ds.materialize().to_arrow_refs())
    t = pa.concat_tables(tables, promote_options="default")
    if t.num_columns == 0 and schema is not None:
        # an all-empty pipeline (e.g. a near-dup query with zero surviving
        # pairs) yields only zero-field blocks; restore the contract schema
        # so downstream sorts/column access don't crash
        return schema.empty_table()
    return t


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()


def q_intersect_keys(sf_dir: str) -> pa.Table:
    """Distinct-set INTERSECT: customers active in BOTH halves of the
    order history (before/after 1998-01-01) — the set-operation class
    next to D1's union-dedup. One pass: each block emits its DISTINCT
    (custkey, side) pairs (per-block combiner, so at most 2·|distinct|
    rows per block reach the shuffle), then a native groupby(custkey)
    keeps keys whose side-span covers both halves (min=0 AND max=1) —
    no join, no driver-side set. Output (custkey) sorted."""
    import numpy as np

    ds = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate"]
    )

    def tag_distinct(batch: pa.Table) -> pa.Table:
        cut = pa.scalar("1998-01-01").cast(
            batch.schema.field("o_orderdate").type
        )
        side = pc.cast(
            pc.greater_equal(batch["o_orderdate"], cut), pa.int64()
        )
        df = pl.from_arrow(
            pa.table(
                {
                    "custkey": pc.cast(batch["o_custkey"], pa.int64()),
                    "side": side,
                }
            )
        ).unique()
        return df.to_arrow().cast(
            pa.schema([("custkey", pa.int64()), ("side", pa.int64())])
        )

    agg = (
        ds.map_batches(tag_distinct, batch_format="pyarrow")
        .groupby("custkey")
        .aggregate(
            ray.data.aggregate.Min("side", alias_name="lo"),
            ray.data.aggregate.Max("side", alias_name="hi"),
        )
    )

    def keep_both(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(t["lo"], pa.scalar(0, pa.int64())),
            pc.equal(t["hi"], pa.scalar(1, pa.int64())),
        )
        return t.filter(mask).select(["custkey"])

    return _sorted(
        _concat(agg.map_batches(keep_both, batch_format="pyarrow")),
        "custkey",
    )


SALT_HOT_KEYS = frozenset({0})
SALT_FACTOR = 8


def q_salted_join(sf_dir: str) -> pa.Table:
    """Skew-salted dimension join — the brief's "salt hot keys" as a
    first-class relational primitive. The workload plants a hot key:
    skew_key = 0 for every 10th customer's orders (~10% of the fact
    table on ONE key), else o_custkey % 100. The dimension side (100
    rows, grp = 'g<key>') joins through ``dedup._hash_join(hot_keys=
    {0}, salt=8)``: left hot rows spread over 8 salt buckets, the right
    hot row replicated once per bucket — the hot partition's fact
    volume drops 8× for 7 extra dimension rows of shuffle. Join output
    aggregates per grp (bounded: 100 keys) — n_orders + exact-cents
    sum. Result is salt-invariant (pinned in tests against salt=1) and
    SQL-oracled bit-exact."""
    import numpy as np

    from spider_ray.functions.dedup import _hash_join

    ds = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"]
    )

    def keyed(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).select(
            skew_key=pl.when(pl.col("o_custkey") % 10 == 0)
            .then(0)
            .otherwise(pl.col("o_custkey") % 100)
            .cast(pl.Int64),
            cents=_cents("o_totalprice"),
        )
        return df.to_arrow()

    left = ds.map_batches(keyed, batch_format="pyarrow")
    dim = pa.table(
        {
            "skew_key": pa.array(list(range(100)), pa.int64()),
            "grp": pa.array([f"g{k}" for k in range(100)], pa.string()),
        }
    )
    right = ray.data.from_arrow(dim)
    l_schema = pa.schema([("skew_key", pa.int64()), ("cents", pa.int64())])
    r_schema = pa.schema([("skew_key", pa.int64()), ("grp", pa.string())])
    j = _hash_join(
        left, right, on="skew_key", right_on="skew_key",
        left_schema=l_schema, right_schema=r_schema,
        hot_keys=SALT_HOT_KEYS, salt=SALT_FACTOR,
    )
    return _salted_join_finish(j)


def _salted_join_finish(j) -> pa.Table:
    agg = j.groupby("grp").aggregate(
        ray.data.aggregate.Count(alias_name="n_orders"),
        ray.data.aggregate.Sum("cents", alias_name="sum_cents"),
    )

    def conform(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "grp": t["grp"],
                "n_orders": pc.cast(t["n_orders"], pa.int64()),
                "sum_cents": pc.cast(t["sum_cents"], pa.int64()),
            }
        )

    return _sorted(
        _concat(agg.map_batches(conform, batch_format="pyarrow")), "grp"
    )


def q_salted_join_auto(sf_dir: str) -> pa.Table:
    """q_salted_join with the PLANNER choosing the salt: no hand-fed
    hot-key set — ``dedup.detect_hot_keys`` finds the planted key from
    one distributed count-combine pass over the fact side and
    ``auto_salted_join`` routes the same partition-cogroup join with the
    suggested salt. Same output (and the same SQL oracle) as the
    hand-salted query — the planner's whole claim is that detection
    changes the plan, never the answer."""
    from spider_ray.functions.dedup import auto_salted_join

    import numpy as np

    ds = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"]
    )

    def keyed(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).select(
            skew_key=pl.when(pl.col("o_custkey") % 10 == 0)
            .then(0)
            .otherwise(pl.col("o_custkey") % 100)
            .cast(pl.Int64),
            cents=_cents("o_totalprice"),
        )
        return df.to_arrow()

    left = ds.map_batches(keyed, batch_format="pyarrow")
    dim = pa.table(
        {
            "skew_key": pa.array(list(range(100)), pa.int64()),
            "grp": pa.array([f"g{k}" for k in range(100)], pa.string()),
        }
    )
    right = ray.data.from_arrow(dim)
    l_schema = pa.schema([("skew_key", pa.int64()), ("cents", pa.int64())])
    r_schema = pa.schema([("skew_key", pa.int64()), ("grp", pa.string())])
    j = auto_salted_join(
        left, right, on="skew_key", right_on="skew_key",
        left_schema=l_schema, right_schema=r_schema,
    )
    return _salted_join_finish(j)


def q_left_join_nulls(sf_dir: str) -> pa.Table:
    """LEFT OUTER join at scale (completes the join family next to
    inner/anti/asof/range/broadcast): orders LEFT JOIN a sparse
    dimension (only every 3rd customer carries a segment row), then a
    bounded aggregate over the match status — per segment (NULL →
    'unmatched'), order count + exact-cents sum. Unmatched left rows
    survive with null payload through the partition-cogroup
    (``dedup._hash_join(how="left")``); nothing is driver-side."""
    from spider_ray.functions.dedup import _hash_join

    ds = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"]
    )

    def keyed(batch: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(batch)
            .select(
                custkey=pl.col("o_custkey").cast(pl.Int64),
                cents=_cents("o_totalprice"),
            )
            .to_arrow()
        )

    left = ds.map_batches(keyed, batch_format="pyarrow")
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])

    def dim(batch: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(batch)
            .filter(pl.col("c_custkey") % 3 == 0)
            .select(
                custkey=pl.col("c_custkey").cast(pl.Int64),
                segment=pl.lit("s")
                + (pl.col("c_custkey") % 5).cast(pl.String),
            )
        )
        return df.to_arrow()

    right = cust.map_batches(dim, batch_format="pyarrow")
    j = _hash_join(
        left, right, on="custkey", right_on="custkey",
        left_schema=pa.schema(
            [("custkey", pa.int64()), ("cents", pa.int64())]
        ),
        right_schema=pa.schema(
            [("custkey", pa.int64()), ("segment", pa.string())]
        ),
        how="left",
    )

    def bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).with_columns(
            segment=pl.col("segment").fill_null("unmatched")
        )
        return (
            df.group_by("segment")
            .agg(
                n_orders=pl.len().cast(pl.Int64),
                sum_cents=pl.col("cents").sum(),
            )
            .to_arrow()
        )

    agg = (
        j.map_batches(bucket, batch_format="pyarrow")
        .groupby("segment")
        .aggregate(
            ray.data.aggregate.Sum("n_orders", alias_name="n_orders"),
            ray.data.aggregate.Sum("sum_cents", alias_name="sum_cents"),
        )
    )

    def conform(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "segment": t["segment"],
                "n_orders": pc.cast(t["n_orders"], pa.int64()),
                "sum_cents": pc.cast(t["sum_cents"], pa.int64()),
            }
        )

    return _sorted(
        _concat(agg.map_batches(conform, batch_format="pyarrow")),
        "segment",
    )


def q_cube(sf_dir: str) -> pa.Table:
    """CUBE aggregate — revenue over ALL 4 grouping sets of
    (returnflag, linestatus) from ONE scan: the detail level is a
    partial/final aggregate (bounded: ≤ flags × statuses keys); the
    (flag), (status) and () levels re-aggregate the tiny detail
    partials, never the raw data (the q_rollup discipline extended to
    the full lattice)."""
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    )

    def partial(lf):
        return lf.group_by("l_returnflag", "l_linestatus").agg(
            n_items=pl.len(), cents=_cents("l_extendedprice").sum()
        )

    cols = ["l_returnflag", "l_linestatus", "n_items", "revenue"]

    def final(lf):
        detail = lf.group_by("l_returnflag", "l_linestatus").agg(
            n_items=pl.col("n_items").sum(), revenue=pl.col("cents").sum()
        )
        by_flag = detail.group_by("l_returnflag").agg(
            n_items=pl.col("n_items").sum(),
            revenue=pl.col("revenue").sum(),
        ).with_columns(l_linestatus=pl.lit(None, dtype=pl.Utf8))
        by_status = detail.group_by("l_linestatus").agg(
            n_items=pl.col("n_items").sum(),
            revenue=pl.col("revenue").sum(),
        ).with_columns(l_returnflag=pl.lit(None, dtype=pl.Utf8))
        tot = detail.select(
            n_items=pl.col("n_items").sum(),
            revenue=pl.col("revenue").sum(),
        ).with_columns(
            l_returnflag=pl.lit(None, dtype=pl.Utf8),
            l_linestatus=pl.lit(None, dtype=pl.Utf8),
        )
        return pl.concat(
            [s.select(cols) for s in (detail, by_flag, by_status, tot)]
        ).sort(cols[:2], nulls_last=True)

    return _scale_cols(partial_final_agg(li, partial, final), {"revenue": 100})


def q_funnel(sf_dir: str) -> pa.Table:
    """Ordered-funnel analysis — how many users completed
    view → click → purchase IN ORDER (each later stage's first
    qualifying event must not precede the previous stage's): the
    log-analysis-family representative (the reference's descoped
    log_analysis library computes exactly this family of per-user
    sequential reports). Chained-min semantics: t1 = min ts(view),
    t2 = min ts(click ≥ t1), t3 = min ts(purchase ≥ t2).

    Shape: events hash-partitioned by user (one shuffle); each
    partition computes its users' t1/t2/t3 VECTORIZED (three polars
    filter+group_by passes, no per-user Python) and emits a 1-row
    partial count; the final is an O(partitions) sum. Output one row
    (n_view, n_click, n_purchase) — monotone non-increasing."""
    ds = read_table(
        sf_dir, "events", columns=["user_id", "ts", "event_type"]
    )

    def pad(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).filter(
            pl.col("event_type").is_in(["view", "click", "purchase"])
        )
        return df.with_columns(
            part=(pl.col("user_id") % 32).cast(pl.Int32)
        ).to_arrow()

    def funnel_group(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        v = (
            df.filter(pl.col("event_type") == "view")
            .group_by("user_id")
            .agg(t1=pl.col("ts").min())
        )
        c = (
            df.filter(pl.col("event_type") == "click")
            .join(v, on="user_id")
            .filter(pl.col("ts") >= pl.col("t1"))
            .group_by("user_id")
            .agg(t2=pl.col("ts").min())
        )
        p = (
            df.filter(pl.col("event_type") == "purchase")
            .join(c, on="user_id")
            .filter(pl.col("ts") >= pl.col("t2"))
            .group_by("user_id")
            .agg(t3=pl.col("ts").min())
        )
        return pa.table(
            {
                "n_view": pa.array([v.height], pa.int64()),
                "n_click": pa.array([c.height], pa.int64()),
                "n_purchase": pa.array([p.height], pa.int64()),
            }
        )

    parts = (
        ds.map_batches(pad, batch_format="pyarrow")
        .groupby("part")
        .map_groups(funnel_group, batch_format="pyarrow")
    )
    t = _concat(parts)
    return pa.table(
        {
            "n_view": pa.array([int(pc.sum(t["n_view"]).as_py() or 0)], pa.int64()),
            "n_click": pa.array([int(pc.sum(t["n_click"]).as_py() or 0)], pa.int64()),
            "n_purchase": pa.array(
                [int(pc.sum(t["n_purchase"]).as_py() or 0)], pa.int64()
            ),
        }
    )


def q_retention(sf_dir: str) -> pa.Table:
    """Cohort retention matrix — the second classic log-analysis report
    next to :func:`q_funnel`: users bucketed by their FIRST active week
    (cohort), counted per (cohort, week-offset) of later activity.
    Weeks are integer epoch-seconds // 604800 (identical arithmetic in
    both engines). Three bounded shuffles: distinct (user, week) pairs
    (native groupby over per-block uniques), per-user cohort = min week
    (native groupby), a hash-join of pairs onto cohorts, and the final
    (cohort, offset) count — all O(users·weeks) at most, nothing
    driver-side."""
    from spider_ray.functions.dedup import _hash_join

    def weeks(batch: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(batch)
            .select(
                user_id=pl.col("user_id").cast(pl.Int64),
                week=(pl.col("ts").dt.epoch(time_unit="s") // 604800)
                .cast(pl.Int64),
            )
            .unique()
        )
        return df.to_arrow()

    pairs = (
        read_table(sf_dir, "events", columns=["user_id", "ts"])
        .map_batches(weeks, batch_format="pyarrow")
        .groupby(["user_id", "week"])
        .aggregate(ray.data.aggregate.Count(alias_name="_n"))
        .map_batches(
            lambda t: t.select(["user_id", "week"]),
            batch_format="pyarrow",
        )
    )
    cohorts = (
        pairs.groupby("user_id")
        .aggregate(ray.data.aggregate.Min("week", alias_name="cohort"))
        .map_batches(
            lambda t: pa.table(
                {
                    "user_id": pc.cast(t["user_id"], pa.int64()),
                    "cohort": pc.cast(t["cohort"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    j = _hash_join(
        pairs, cohorts, on="user_id", right_on="user_id",
        left_schema=pa.schema(
            [("user_id", pa.int64()), ("week", pa.int64())]
        ),
        right_schema=pa.schema(
            [("user_id", pa.int64()), ("cohort", pa.int64())]
        ),
    )

    def offset(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": t["cohort"],
                "week_offset": pc.subtract(t["week"], t["cohort"]),
            }
        )

    agg = (
        j.map_batches(offset, batch_format="pyarrow")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(ray.data.aggregate.Count(alias_name="n_users"))
    )

    def conform(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": pc.cast(t["cohort_week"], pa.int64()),
                "week_offset": pc.cast(t["week_offset"], pa.int64()),
                "n_users": pc.cast(t["n_users"], pa.int64()),
            }
        )

    return _sorted(
        _concat(agg.map_batches(conform, batch_format="pyarrow")),
        ["cohort_week", "week_offset"],
    )


def q_scd2(sf_dir: str) -> pa.Table:
    """Slowly-changing-dimension type-2 versioning — the warehouse twin
    of J6's keep-latest linkbase merge: every order opens a new VERSION
    of its customer's state, valid from its own date until the next
    version's date (NULL for the current one). Deterministic total
    order per key: (o_orderdate, o_orderkey).

    Shape: per-block rows carry a hash-partition key; the interval
    construction (sort + shift(-1)) runs vectorized per partition in a
    ``groupby(part).map_groups`` worker — the q_latest_record
    distributed-final pattern, output O(orders), nothing driver-side.
    Output (custkey, o_orderkey, valid_from, valid_to, is_current)."""
    ds = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"]
    )

    def pad(batch: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(batch)
            .with_columns(part=(pl.col("o_custkey") % 32).cast(pl.Int32))
            .to_arrow()
        )

    def versions(group: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(group)
            .sort(["o_custkey", "o_orderdate", "o_orderkey"])
            .with_columns(
                valid_to=pl.col("o_orderdate")
                .shift(-1)
                .over("o_custkey", order_by=["o_orderdate", "o_orderkey"]),
            )
            .select(
                custkey=pl.col("o_custkey").cast(pl.Int64),
                o_orderkey=pl.col("o_orderkey").cast(pl.Int64),
                valid_from=pl.col("o_orderdate"),
                valid_to=pl.col("valid_to"),
                is_current=pl.col("valid_to")
                .is_null()
                .cast(pl.Int32),
            )
        )
        return df.to_arrow()

    out = (
        ds.map_batches(pad, batch_format="pyarrow")
        .groupby("part")
        .map_groups(versions, batch_format="pyarrow")
    )
    return _sorted(_concat(out), ["custkey", "valid_from", "o_orderkey"])
