"""Politeness budget — per-key (host or ip) connection/QPS control.

Reimplements the semantics of the reference's LoadController
(``crawler/crawl/load_controller.{h,cc}``, 425 LoC) against a caller-supplied
clock (microseconds), exactly as its unit test does ("timestamps can be set
as the test requires", ``load_controller.h:99-101``,
``crawl/tests/load_controller_test.cc:11-56``):

* ``check_fetch(key, now_us)`` →
  ``0``  go (and the caller must ``register_fetch``);
  ``>0`` earliest-allowed timestamp (QPS gate: after every
  ``check_frequency`` fetches on a key, the next fetch must wait until
  ``first_fetch_time + check_frequency / max_qps`` seconds
  (``load_controller.cc:166-181``), or failure-holdon gate (``:183-190``));
  ``-1`` connection limit full (per-key or global, ``:192-198``);
  ``-2`` key is dead — drop all URLs (``failed_times ≥ max_failed_times``,
  ``:161-164``).
* ``register_fetch`` resets the QPS window every ``check_frequency`` fetches
  (``:204-224``); ``unregister_fetch(success)`` decrements connections and on
  failure increments ``failed_times`` and sets a holdon drawn
  deterministically from ``[min,max]_holdon_after_failed`` (``:226-242``;
  randomness replaced by a pure function of the key hash per FIXTURES §9).
* per-key config rows ``(key, max_connections, max_qps, HH:MM-HH:MM)`` with
  time-of-day matching and a ``*`` default (``FindIpLoadRecord``,
  ``load_controller.cc:113-141``); global cap ``max_connections_in_all``
  (``:143-147``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from spider_ray.kernels.hashing import derive, hash64_one

US = 1_000_000


@dataclass
class LoadOptions:
    # library defaults: load_controller.h:40-51
    default_max_connections: int = 5
    default_max_qps: float = 3.0
    max_connections_in_all: int = 1000
    check_frequency: int = 15
    max_failed_times: int = 20
    min_holdon_after_failed_us: int = 5 * US
    max_holdon_after_failed_us: int = 10 * US


@dataclass
class LoadRecord:
    max_connections: int
    max_qps: float
    window: tuple[int, int] | None = None  # (start_min, end_min) of day


def parse_window(s: str) -> tuple[int, int] | None:
    """'HH:MM-HH:MM' → minute-of-day pair; '' / '*' → always."""
    s = (s or "").strip()
    if not s or s == "*":
        return None
    a, _, b = s.partition("-")
    h1, m1 = a.split(":")
    h2, m2 = b.split(":")
    return (int(h1) * 60 + int(m1), int(h2) * 60 + int(m2))


def _window_matches(window: tuple[int, int] | None, now_us: int) -> bool:
    if window is None:
        return True
    minute = (now_us // US // 60) % (24 * 60)
    lo, hi = window
    if lo <= hi:
        return lo <= minute <= hi
    return minute >= lo or minute <= hi


@dataclass
class _KeyState:
    connections: int = 0
    fetch_count: int = 0  # fetches since window reset
    first_fetch_us: int = 0  # window start
    failed_times: int = 0
    holdon_until_us: int = 0


class LoadController:
    """Deterministic, virtual-clock politeness controller."""

    def __init__(
        self,
        options: LoadOptions | None = None,
        records: dict[str, list[LoadRecord]] | None = None,
    ):
        self.opt = options or LoadOptions()
        self.records = records or {}
        self.total_connections = 0
        self._state: dict[str, _KeyState] = {}

    @classmethod
    def from_table(cls, rows, options: LoadOptions | None = None):
        """rows: iterable of (key, max_connections, max_qps, window_str) —
        the host_load table format (host_load_control_tab.txt)."""
        recs: dict[str, list[LoadRecord]] = {}
        for key, mc, qps, win in rows:
            recs.setdefault(key, []).append(
                LoadRecord(int(mc), float(qps), parse_window(win))
            )
        return cls(options, recs)

    def _find_record(self, key: str, now_us: int) -> LoadRecord:
        for rec in self.records.get(key, ()):
            if _window_matches(rec.window, now_us):
                return rec
        for rec in self.records.get("*", ()):
            if _window_matches(rec.window, now_us):
                return rec
        return LoadRecord(
            self.opt.default_max_connections, self.opt.default_max_qps, None
        )

    def _st(self, key: str) -> _KeyState:
        st = self._state.get(key)
        if st is None:
            st = self._state[key] = _KeyState()
        return st

    def check_fetch(self, key: str, now_us: int) -> int:
        st = self._st(key)
        if st.failed_times >= self.opt.max_failed_times:
            return -2
        rec = self._find_record(key, now_us)
        if st.holdon_until_us > now_us:
            return st.holdon_until_us
        if (
            st.connections >= rec.max_connections
            or self.total_connections >= self.opt.max_connections_in_all
        ):
            return -1
        # QPS gate: a window of check_frequency fetches must span at least
        # check_frequency / max_qps seconds
        if st.fetch_count >= self.opt.check_frequency:
            min_duration_us = int(self.opt.check_frequency / rec.max_qps * US)
            earliest = st.first_fetch_us + min_duration_us
            if now_us < earliest:
                return earliest
        return 0

    def register_fetch(self, key: str, now_us: int) -> None:
        st = self._st(key)
        st.connections += 1
        self.total_connections += 1
        if st.fetch_count >= self.opt.check_frequency:
            st.fetch_count = 0
        if st.fetch_count == 0:
            st.first_fetch_us = now_us
        st.fetch_count += 1

    def unregister_fetch(self, key: str, success: bool, now_us: int) -> None:
        st = self._st(key)
        st.connections = max(0, st.connections - 1)
        self.total_connections = max(0, self.total_connections - 1)
        if success:
            st.failed_times = 0
            st.holdon_until_us = 0
        else:
            st.failed_times += 1
            span = (
                self.opt.max_holdon_after_failed_us
                - self.opt.min_holdon_after_failed_us
            )
            # deterministic "random" holdon: pure function of key + failure #
            r = derive(hash64_one(key), st.failed_times) % (span + 1)
            st.holdon_until_us = now_us + self.opt.min_holdon_after_failed_us + r

    # --- checkpoint support ---------------------------------------------------

    def state_dict(self) -> dict:
        return {
            "total": self.total_connections,
            "keys": {
                k: (s.connections, s.fetch_count, s.first_fetch_us,
                    s.failed_times, s.holdon_until_us)
                for k, s in self._state.items()
            },
        }

    def load_state_dict(self, d: dict) -> None:
        self.total_connections = d["total"]
        self._state = {
            k: _KeyState(*v) for k, v in d["keys"].items()
        }


def apply_crawl_delays(load_rows, robots, options: "LoadOptions | None" = None):
    """Fold robots ``Crawl-delay`` declarations into the host_load
    politeness rows — the GYM2008 category-4 directive the reference's
    robots parser collects (robotexclusionrulesparser.py:120,584)
    becomes a per-host QPS cap of ``1 / delay``, never RAISING an
    operator-configured budget (min of the two). Hosts with a delay but
    no explicit row get a new windowless row at the default connection
    budget. Pure function of (rows, parsed robots) — the engine and the
    oracle both route their load rows through it, so politeness parity
    is by construction.

    ``load_rows``: iterable of (key, max_connections, max_qps, window);
    ``robots``: {host: parse_robots(body)} as both crawl paths build it.
    """
    from spider_ray.kernels.robots import crawl_delay_for

    rows = [tuple(r) for r in load_rows]
    delays = {}
    for host in robots:
        d = crawl_delay_for(robots[host])
        if d and d > 0:
            delays[host] = 1.0 / d
    if not delays:
        return rows
    opt = options or LoadOptions()
    default_mc = opt.default_max_connections
    default_qps = opt.default_max_qps
    for key, mc, qps, win in rows:
        if key == "*" and not win:
            default_mc, default_qps = int(mc), float(qps)
            break
    out = []
    seen = set()
    for key, mc, qps, win in rows:
        if key in delays:
            seen.add(key)
            out.append((key, mc, min(float(qps), delays[key]), win))
        else:
            out.append((key, mc, qps, win))
    for host in sorted(delays):
        if host not in seen:
            out.append(
                (host, default_mc, min(default_qps, delays[host]), "")
            )
    return out
