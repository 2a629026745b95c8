"""IP-level hot diversion valve (J4 / ``control/schedule/ip_url_split.cc``).

Reference semantics (``ip_url_split.cc:21,85-97``): URLs are counted per
resolved IP; IPs whose URL count exceeds a threshold get diverted to a
dedicated PROXY partition so one mega-IP can't starve the direct-fetch
fleet. Ray-native restatement:

1. ``attach_ip`` (J1 broadcast lookup — never a shuffle join);
2. per-IP URL counts via a distributed ``groupby(ip)`` — IP cardinality is
   bounded by host count, so the count table is a legitimate small side;
3. the hot-IP set broadcasts back into one tagging ``map_batches`` pass.

The threshold here is RELATIVE (count > factor × mean) so the valve stays
non-trivial at every test scale; the reference's absolute 100k-URL cutoff
is the same rule with a fixed constant.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from spider_ray.stages.dns import attach_ip

HOT_IP_FACTOR = 1.5


def hot_ips_of(counts: pa.Table, factor: float = HOT_IP_FACTOR) -> set[str]:
    """IPs whose URL count exceeds ``factor ×`` the mean count.

    Rows with a null ip (unresolved hosts) are EXCLUDED before the mean and
    the hot set: null is not an IP — the diverted unit is a shared server —
    and a large unresolved population would otherwise (a) skew the cutoff
    and (b) divert every unrelated DNS-miss host to the proxy partition as
    one pseudo-group (it also made ``sorted({None, '1.1.1.1'})`` raise)."""
    counts = counts.filter(pc.is_valid(counts["ip"]))
    if counts.num_rows == 0:
        return set()
    cnt = counts["n"].to_numpy(zero_copy_only=False)
    cutoff = factor * (cnt.sum() / len(cnt))
    return {
        ip
        for ip, n in zip(counts["ip"].to_pylist(), cnt)
        if n > cutoff
    }


def ip_url_split(
    ds: ray.data.Dataset,
    host_ips: dict[str, list[str]],
    factor: float = HOT_IP_FACTOR,
    url_col: str = "url",
) -> ray.data.Dataset:
    """Tag every row ``route='proxy'`` (hot IP) or ``'direct'``. Returns the
    input columns + ``ip`` + ``route``."""
    from ray.data.aggregate import Count

    with_ip = attach_ip(ds, host_ips, url_col=url_col).materialize()
    counts = (
        with_ip.groupby("ip")
        .aggregate(Count())
        .rename_columns({"count()": "n"})
        .materialize()
        .to_arrow_refs()
    )
    counts_t = pa.concat_tables(ray.get(counts), promote_options="default")
    hot = hot_ips_of(counts_t, factor)
    hot_ref = ray.put(pa.array(sorted(hot), pa.string()))

    def tag(batch: pa.Table) -> pa.Table:
        hot_arr = ray.get(hot_ref)
        # fill_null: an unresolved (null-ip) row routes 'direct', never a
        # null route — nulls are excluded from the hot set by contract
        is_hot = pc.fill_null(
            pc.is_in(batch["ip"], value_set=hot_arr), False
        )
        route = pc.if_else(is_hot, "proxy", "direct")
        return batch.append_column("route", route.cast(pa.string()))

    return with_ip.map_batches(tag, batch_format="pyarrow")


# Imported lazily (inside query functions), AFTER the pipeline modules'
# registration pass ran — so this module must register itself for
# pickle-by-value or its functions ship by reference to workers that may
# not have the repo on sys.path.
from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()
