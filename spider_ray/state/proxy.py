"""ProxyManager (T3) — faithful restatement of
``crawler/crawl/proxy_manager.cc`` (76 LoC):

* ``select_best(ts)`` — least-outstanding-tasks proxy wins (first index on
  ties, same as the C++ linear scan); a proxy whose successive failures
  reached ``max_successive_failures`` is skipped until
  ``holdon_duration_after_failures`` has passed since its last failure, at
  which point its successive count decays by 2 and its last-failure stamp
  resets to now (:24-56);
* ``report_status(proxy, success, ts)`` — success zeroes the successive
  count; failure bumps both counters and stamps the time; either way the
  outstanding-task count drops (:59-75).

The crawl pipeline itself uses :func:`pick_proxy_pure` instead — a pure
function of ``(url_hash, tried)`` — because per-fetch proxy choice must be
invariant to fetch-pool size to keep engine/oracle parity (the same
discipline as the T4 scorer and the J1 DNS pick); the stateful manager is
the deployment-grade component for a real fetcher, exercised by the ported
reference test scenario in ``tests/test_state.py``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from spider_ray.kernels.hashing import derive

DEFAULT_PROXIES = (
    "proxy-0.example.com:3128",
    "proxy-1.example.com:3128",
    "proxy-2.example.com:3128",
    "proxy-3.example.com:3128",
)


@dataclass
class _ProxyData:
    proxy: str
    failed_times: int = 0
    success_times: int = 0
    successive_failed_times: int = 0
    last_failed_timestamp: int = -1
    tasks: int = 0


@dataclass
class ProxyManager:
    proxies: tuple[str, ...] = DEFAULT_PROXIES
    max_successive_failures: int = 20
    holdon_duration_after_failures: int = 30 * 1000 * 1000  # us, ref default
    _data: list[_ProxyData] = field(default_factory=list)
    _index: dict[str, int] = field(default_factory=dict)

    def __post_init__(self) -> None:
        for i, p in enumerate(self.proxies):
            self._data.append(_ProxyData(p))
            self._index[p] = i

    def select_best(self, timestamp: int) -> str:
        best, min_tasks = -1, None
        for i, d in enumerate(self._data):
            if d.successive_failed_times >= self.max_successive_failures:
                if (
                    timestamp - d.last_failed_timestamp
                    < self.holdon_duration_after_failures
                ):
                    continue
                d.successive_failed_times = max(
                    0, d.successive_failed_times - 2
                )
                d.last_failed_timestamp = timestamp
            if min_tasks is None or d.tasks < min_tasks:
                best, min_tasks = i, d.tasks
        if best < 0:
            return ""
        self._data[best].tasks += 1
        return self._data[best].proxy

    def report_status(self, proxy: str, success: bool, timestamp: int) -> None:
        d = self._data[self._index[proxy]]
        if success:
            d.success_times += 1
            d.successive_failed_times = 0
        else:
            d.successive_failed_times += 1
            d.failed_times += 1
            d.last_failed_timestamp = timestamp
        d.tasks -= 1


def pick_proxy_pure(
    url_hash: int, tried: int, proxies: tuple[str, ...] = DEFAULT_PROXIES
) -> str:
    """Deterministic proxy choice for a RETRIED fetch: pure function of
    (url_hash, tried) so the assignment is identical no matter how the
    fetch pool is sized or how blocks are split — the parity-safe stand-in
    the crawl loop uses (first attempts go direct, retries flip through
    the proxy list, fetch_result_handler.cc:67-88 retry-with-proxy rule)."""
    if tried <= 0 or not proxies:
        return ""
    r = derive(np.uint64(url_hash), 13 + tried)
    return proxies[int(r % np.uint64(len(proxies)))]
