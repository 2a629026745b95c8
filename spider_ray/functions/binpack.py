"""Drain-time-aware bin-packing (O1+O2 — the reference's schedule step:
global sort of IPs by estimated drain time then greedy prefix-sum assignment
onto fetchers, ``control/schedule/run_schedule.sh:242-259`` +
``ip_to_fetcher_id.py``).

The aggregate (per-key weight) is distributed; the sort+pack runs on the
tiny aggregated result — exactly like the reference, where ip_stat is an MR
job but ``sort -g | ip_to_fetcher_id.py`` is a driver-side script.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa

from spider_ray.sources.tables import read_table
from spider_ray.stages.agg import partial_final_agg


def greedy_binpack(weights: list[tuple[str, float | int]], n_bins: int) -> list[int]:
    """Reference algorithm: walk the desc-sorted list keeping a cumulative
    sum; assign to bin ``b`` while ``cum ≤ avg * (b+1)`` (ip_to_fetcher_id.py
    whole file). Returns bin id per input (same order as input). Integer
    weights keep every partial sum exact (callers wanting an SQL-replayable
    assignment pass cents, not float currency)."""
    total = sum(w for _, w in weights)
    avg = total / n_bins if n_bins else 0.0
    out = []
    # int seed: integer weights keep cum exact past 2^53 (float cum would
    # round where the SQL oracle's BIGINT cum does not); float weights
    # still promote naturally on the first +=
    cum = 0
    b = 0
    for _, w in weights:
        cum += w
        # compare through float64 DELIBERATELY: the SQL oracle coerces its
        # BIGINT cum to DOUBLE for this comparison, so past 2^53 cents an
        # exact int-vs-float Python compare would diverge from SQL by one
        # ulp at the threshold; float(cum) applies the identical rounding
        if float(cum) > avg * (b + 1) and b < n_bins - 1:
            b += 1
        out.append(b)
    return out


def q_binpack_customers(sf_dir: str, n_bins: int = 8) -> pa.Table:
    """Assign customers to n_bins workers balanced by total spend:
    distributed per-key aggregate → driver-side sort desc + greedy pack
    (the pack input is O(distinct keys), tiny — same split as the
    reference's MR ip_stat + driver-script pack).

    Weights aggregate in exact integer cents (the pricing_summary
    pattern): every partial sum is order-independent, so the greedy
    walk's cumulative thresholds — and therefore the whole assignment —
    replay bit-exactly in the recursive-CTE SQL oracle
    (``oracle_sql()['binpack_customers']``). Balance property also
    asserted in tests."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(lf):
        return lf.group_by("o_custkey").agg(
            cents=(pl.col("o_totalprice") * 100)
            .round(0)
            .cast(pl.Int64)
            .sum()
        )

    def final(lf):
        return (
            lf.group_by("o_custkey")
            .agg(cents=pl.col("cents").sum())
            .sort(["cents", "o_custkey"], descending=[True, False])
        )

    agg = partial_final_agg(ds, partial, final)
    keys = agg["o_custkey"].to_pylist()
    cents = agg["cents"].to_pylist()
    bins = greedy_binpack(list(zip(map(str, keys), cents)), n_bins)
    return pa.table(
        {
            "o_custkey": pa.array(keys, pa.int64()),
            "weight": pa.array([c / 100.0 for c in cents], pa.float64()),
            "bin": pa.array(bins, pa.int32()),
        }
    )


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()
