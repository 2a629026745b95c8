"""DNS attach stage (J1 — ``control/schedule/url_to_ip.cc:25-91``).

The reference broadcasts the host→IP dict to every reducer and picks a
RANDOM IP from the host's list per URL (``:82-83``); per FIXTURES §9 the
randomness is frozen to a pure function of the url hash, so the oracle and
engine agree. The table is a broadcast side (``ray.put`` once), never a
shuffle join. T5's resolver cache lives per actor in a real deployment; the
synthetic table makes the stage a pure lookup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from spider_ray.kernels.hashing import derive, hash64
from spider_ray.kernels.urlnorm import hosts_of


def attach_ip(
    ds: ray.data.Dataset, host_ips: dict[str, list[str]], url_col: str = "url"
) -> ray.data.Dataset:
    """Add ``ip`` column: deterministic pick from the host's IP list
    (seeded by url_hash — J1's random pick made reproducible)."""
    ref = ray.put(host_ips)

    def _attach(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)
        urls = batch[url_col].to_pylist()
        hosts = hosts_of(urls)
        uh = hash64(urls)
        picks = derive(uh, 11)
        ips = []
        for h, p in zip(hosts, picks):
            lst = table.get(h)
            ips.append(lst[int(p) % len(lst)] if lst else None)
        return batch.append_column("ip", pa.array(ips, pa.string()))

    return ds.map_batches(_attach, batch_format="pyarrow")


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()
