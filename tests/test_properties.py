"""Property-based tests (hypothesis) for the frozen kernels — the
invariants the rest of the engine leans on, probed over generated inputs
rather than fixed fixtures (complements the tabular tests per SURVEY §5)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spider_ray.functions.binpack import greedy_binpack
from spider_ray.functions.sketch import (
    hll_estimate,
    hll_from_column,
    hll_merge,
    hll_registers,
)
from spider_ray.kernels.hashing import hash64, mix64_int
from spider_ray.kernels.urlnorm import canonicalize, canonicalize_one
from spider_ray.state.bloom import BloomFilter
from spider_ray.state.cuckoo import CuckooFilter

# --- URL canonicalization --------------------------------------------------

_host = st.from_regex(r"[A-Za-z][A-Za-z0-9\-]{0,10}(\.[A-Za-z]{2,5}){1,2}",
                      fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,8}){0,4}/?", fullmatch=True)
_query = st.from_regex(r"(\?[a-z]{1,3}=[A-Za-z0-9]{0,5}(&[a-z]{1,3}=[A-Za-z0-9]{0,5}){0,3})?",
                       fullmatch=True)
_frag = st.from_regex(r"(#[A-Za-z0-9]{0,6})?", fullmatch=True)
_scheme = st.sampled_from(["http://", "HTTP://", "https://", "", "HtTp://"])
_port = st.sampled_from(["", ":80", ":443", ":8080"])


@st.composite
def urls(draw):
    return (draw(_scheme) + draw(_host) + draw(_port) + draw(_path)
            + draw(_query) + draw(_frag))


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(url):
    c = canonicalize_one(url)
    if c is not None:
        assert canonicalize_one(c) == c


@given(st.lists(urls(), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_canonicalize_vector_matches_scalar(batch):
    assert canonicalize(batch) == [canonicalize_one(u) for u in batch]


@given(st.lists(urls(), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_polars_fast_path_matches_scalar(batch):
    # canonicalize() above is the scalar list wrapper; THIS drives the
    # polars fused-extract fast path (canonicalize_parts) over the same
    # structured strategy
    from spider_ray.kernels.urlnorm import canonicalize_vector

    assert canonicalize_vector(batch) == [canonicalize_one(u) for u in batch]


@given(st.lists(st.text(max_size=60), min_size=1, max_size=20))
@settings(max_examples=150, deadline=None)
def test_canonicalize_vector_survives_arbitrary_text(batch):
    # wild-unicode fuzz: whatever the bytes, the vector path must neither
    # raise nor diverge from the scalar kernel
    from spider_ray.kernels.urlnorm import canonicalize_vector

    assert canonicalize_vector(batch) == [canonicalize_one(u) for u in batch]


# --- hashing ---------------------------------------------------------------


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62),
                min_size=1, max_size=500, unique=True))
@settings(max_examples=100, deadline=None)
def test_mix64_injective(keys):
    """mix64_int is a bijection on uint64 (every step invertible), so
    distinct inputs can NEVER collide — not just 'rarely'."""
    out = mix64_int(np.array(keys, dtype=np.int64), seed=4242)
    assert len(np.unique(out)) == len(keys)


@given(st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=100))
@settings(max_examples=100, deadline=None)
def test_hash64_deterministic(strings):
    a, b = hash64(strings), hash64(strings)
    assert np.array_equal(a, b)


# --- membership structures -------------------------------------------------


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=2000, unique=True))
@settings(max_examples=50, deadline=None)
def test_bloom_no_false_negatives(keys):
    h = mix64_int(np.array(keys, dtype=np.int64), seed=5)
    f = BloomFilter.for_capacity(max(len(keys), 64), fp_rate=0.02)
    f.add(h)
    assert f.contains(h).all()


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=1500, unique=True))
@settings(max_examples=50, deadline=None)
def test_cuckoo_no_false_negatives_under_load(keys):
    """Within its sized capacity (inserts may still fail under adversarial
    kicking — those keys are excluded), every successfully-added key must be
    found: the URL-seen contract the crawl loop depends on."""
    f = CuckooFilter(capacity=4 * len(keys))
    h = mix64_int(np.array(keys, dtype=np.int64), seed=6)
    added = [int(x) for x in h if f.add(int(x))]
    assert len(added) == len(h)  # at 25% load, no insert may fail
    for x in added:
        assert f.contains(x)
    assert f.contains_many(np.array(added, dtype=np.uint64)).all()


# --- sketches --------------------------------------------------------------


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=2,
                max_size=3000, unique=True),
       st.integers(min_value=1, max_value=10))
@settings(max_examples=50, deadline=None)
def test_hll_merge_equals_union(keys, cut_frac):
    arr = np.array(keys, dtype=np.int64)
    cut = max(1, len(arr) * cut_frac // 11)
    a = hll_from_column(arr[:cut], True)
    b = hll_from_column(arr[cut:], True)
    assert np.array_equal(hll_merge(a, b), hll_from_column(arr, True))


@given(st.integers(min_value=500, max_value=20000))
@settings(max_examples=20, deadline=None)
def test_hll_estimate_within_bound(n):
    reg = hll_registers(mix64_int(np.arange(n, dtype=np.int64), seed=9))
    est = hll_estimate(reg)
    assert abs(est - n) / n < 0.10


# --- bin-packing -----------------------------------------------------------


@given(st.lists(st.floats(min_value=0.0, max_value=1e6, allow_nan=False),
                min_size=1, max_size=200),
       st.integers(min_value=1, max_value=16))
@settings(max_examples=100, deadline=None)
def test_binpack_total_assignment(ws, n_bins):
    weights = [(f"k{i}", w) for i, w in enumerate(ws)]
    bins = greedy_binpack(weights, n_bins)
    assert len(bins) == len(weights)
    assert all(0 <= b < n_bins for b in bins)


_ROBOTS_LINES = st.lists(
    st.one_of(
        st.sampled_from(
            [
                "User-agent: *",
                "User-agent: spiderbot",
                "User-agent: Baiduspider",
                "Disallow: /private/",
                "Disallow:",
                "Allow: /p/**",
                "Allow:",
                "Crawl-delay: 2",
                "Crawl-delay: 0.5",
                "Crawl-delay: -3",
                "Crawl-delay: nope",
                "Sitemap: http://h.example.com/sitemap.xml",
                "# comment",
                "",
                "garbage line without colon",
                "Unknown: directive",
            ]
        ),
        st.text(max_size=30),
    ),
    max_size=25,
)


@given(_ROBOTS_LINES)
@settings(max_examples=200, deadline=None)
def test_parse_robots_total_and_delay_sane(lines):
    """parse_robots is TOTAL over arbitrary junk (never raises), and any
    crawl delay it reports is a positive finite float that appears as a
    Crawl-delay directive value in the body."""
    from spider_ray.kernels.robots import crawl_delay_for, parse_robots

    body = "\n".join(lines)
    groups = parse_robots(body)
    for agent in ("spiderbot", "baiduspider", "nobody"):
        d = crawl_delay_for(groups, agent)
        assert d is None or (d > 0 and d == d)
        if d is not None:
            assert "crawl-delay" in body.lower()


@given(
    st.dictionaries(
        st.sampled_from([f"h{i}.example.com" for i in range(6)]),
        st.one_of(st.none(), st.floats(0.1, 100)),
        max_size=6,
    ),
    st.lists(
        st.tuples(
            st.sampled_from(
                ["*"] + [f"h{i}.example.com" for i in range(6)]
            ),
            st.integers(1, 20),
            st.floats(0.01, 50),
        ),
        max_size=6,
    ),
)
@settings(max_examples=150, deadline=None)
def test_apply_crawl_delays_properties(delays, rows):
    """apply_crawl_delays is total and only ever LOWERS effective QPS:
    every host with a declared delay ends at min(budget, 1/delay);
    hosts without a delay keep their rows byte-identical; row count
    grows only by delay-hosts that had no row."""
    from spider_ray.kernels.robots import parse_robots
    from spider_ray.state.load_controller import (
        LoadController,
        LoadOptions,
        apply_crawl_delays,
    )

    robots = {
        h: parse_robots(
            "User-agent: *\nAllow: /\n"
            + (f"Crawl-delay: {d}\n" if d is not None else "")
        )
        for h, d in delays.items()
    }
    load_rows = [(k, mc, q, "") for k, mc, q in rows]
    out = apply_crawl_delays(load_rows, robots)
    lc = LoadController.from_table(out)
    lc0 = LoadController.from_table(load_rows)
    opt = LoadOptions()
    for h, d in delays.items():
        before = lc0._find_record(h, 0).max_qps
        after = lc._find_record(h, 0).max_qps
        if d is None:
            assert after == before
        else:
            assert after == pytest.approx(min(before, 1.0 / d))
            assert after <= before + 1e-12
    # non-delay rows unchanged and in order
    kept = [r for r in out[: len(load_rows)]]
    for orig, now in zip(load_rows, kept):
        if orig[0] not in {h for h, d in delays.items() if d}:
            assert orig == now
