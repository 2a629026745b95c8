"""URL canonicalization equivalence classes — fixture table modeled on the
reference's crawler/api/base_test.cc:6-120 cases (case folding, default port,
fragment strip, %7E≡~, leading %20 runs, schemeless, >4096B, IDN)."""

import numpy as np
import pytest

from spider_ray.kernels.urlnorm import (
    MAX_URL_LEN,
    canonicalize,
    canonicalize_one,
    filter_rules,
    host_of,
)

CASES = [
    # (raw, expected canonical or None)
    ("http://www.Example.COM/", "http://www.example.com/"),
    ("HTtP://www.example.com/", "http://www.example.com/"),
    ("http://www.example.com:80/", "http://www.example.com/"),
    ("https://www.example.com:443/a", "https://www.example.com/a"),
    ("http://www.example.com:8080/a", "http://www.example.com:8080/a"),
    ("http://www.example.com/a#frag", "http://www.example.com/a"),
    ("http://www.example.com/%7Euser/", "http://www.example.com/~user/"),
    ("http://www.example.com/a/./b/../c", "http://www.example.com/a/c"),
    ("www.example.com/x", "http://www.example.com/x"),
    ("  http://www.example.com/  ", "http://www.example.com/"),
    ("%20%20http://e.com/", "http://e.com/"),
    ("http://www.example.com", "http://www.example.com/"),
    ("http://e.com/p?b=2&a=1", "http://e.com/p?a=1&b=2"),
    ("http://e.com/p?b=2&a=1#f", "http://e.com/p?a=1&b=2"),
    ("ftp://e.com/x", None),
    ("javascript:void(0)", None),
    ("http://.bad.com/", None),
    ("http://%61.com/", None),
    ("http://+x.com/", None),
    ("mailto:a@b.c", None),
    ("http://user@e.com/", None),
    ("http://e.com" + "/a" * 2100, None),  # > 4096 bytes
    ("http://münchen.de/straße", "http://xn--mnchen-3ya.de/stra%C3%9Fe"),
    ("", None),
    ("http://e.com/a%2Fb", "http://e.com/a/b"),  # decoded reserved: collapses
    ("http://e.com/A%3f", "http://e.com/A%3F"),  # uppercase escapes
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_canonicalize_cases(raw, expected):
    assert canonicalize_one(raw) == expected


def test_idempotent():
    for raw, expected in CASES:
        if expected is not None:
            assert canonicalize_one(expected) == expected


def test_vector_matches_scalar():
    raws = [c[0] for c in CASES]
    assert canonicalize(raws) == [canonicalize_one(r) for r in raws]


def test_host_of():
    assert host_of("http://a.b.com:81/x") == "a.b.com"
    assert host_of("https://a.b.com/x?q=1") == "a.b.com"


def test_filter_rules():
    urls = [
        "http://ok.com/a/b",
        None,
        "http://deep.com/" + "/".join("x" * 1 for _ in range(12)),
        "http://q.com/p?" + "a" * 1200,
        "http://black.com/x",
    ]
    keep, reasons = filter_rules(urls, blacklist_hosts=frozenset({"black.com"}))
    assert list(keep) == [True, False, False, False, False]
    assert reasons[1] == "canonicalize_reject"
    assert reasons[2] == "path_too_deep"
    assert reasons[3] == "query_too_long"
    assert reasons[4] == "host_blacklist"


def test_vectorized_equals_scalar():
    """Property test: the polars fast-path canonicalizer must agree with the
    scalar kernel on a structured-random corpus covering both paths."""
    import random

    from spider_ray.kernels.urlnorm import canonicalize_vector

    schemes = ["http://", "HTTP://", "https://", "", "ftp://", "javascript:"]
    hosts = ["Example.COM", "a.b.c.org", "münchen.de", ".bad.com", "h-x.io",
             "x..y.com", "host9.example.com"]
    ports = ["", ":80", ":443", ":8080", ":99999", ":80x", ":0x50", ":"]
    paths = ["", "/", "/p/1", "/a/./b", "/a/../b", "/%7Euser", "/a b",
             "/deep/" + "x/" * 12, "/p%2Fq", "/UPPER"]
    queries = ["", "?b=2&a=1", "?a=1", "?x=%20", "?" + "q" * 1100, "?a&&b"]
    frags = ["", "#f", "#a/b"]
    rng = random.Random(1)
    cases = [
        rng.choice(schemes) + rng.choice(hosts) + rng.choice(ports)
        + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        for _ in range(3000)
    ]
    cases += ["  http://E.com/x  ", "%20http://a.com/", "http://user@e.com/x"]
    assert canonicalize_vector(cases) == [canonicalize_one(c) for c in cases]


def test_max_url_len_boundary():
    base = "http://e.com/"
    pad = MAX_URL_LEN - len(base)
    assert canonicalize_one(base + "a" * pad) is not None
    assert canonicalize_one(base + "a" * (pad + 1)) is None


def test_nondigit_port_rejected_in_vector_path():
    """Regression: the pre-2026-08-18 multi-extract fast path used an
    UNANCHORED port regex, so 'http://hh:80x/' parsed as port 80 and was
    accepted where the scalar kernel rejects it. The fused anchored regex
    must route these to the slow path (→ None)."""
    from spider_ray.kernels.urlnorm import canonicalize_vector

    cases = ["http://hh:80x/", "https://hh:443abc/p", "http://hh:080/",
             "http://hh:80/p", "https://hh:443/p", "http://hh:65536/"]
    assert canonicalize_vector(cases) == [canonicalize_one(c) for c in cases]
    assert canonicalize_vector(["http://hh:80x/"]) == [None]


def test_canonicalize_parts_columns_consistent_with_canon():
    """canonicalize_parts' host/path/query columns must be exactly what
    re-parsing its own canon column yields — downstream stages (frontier
    filter, host sharding) rely on the parts instead of re-extracting."""
    import re

    from spider_ray.kernels.urlnorm import canonicalize_parts

    corpus = [
        "HTTP://Host5.example.com/p/5:80/x", "http://hh:80x/",
        "http://h.io/p?b=2&a=1#f", "http://h.io#frag?x", "ftp://x.com/",
        "http://h.io/%7Euser?x=%7e", "e.com/q?z=1&y=2", None,
        "http://h.io:8080/P/%7Ex?b=2&a=1#f", "http://h.io/p?a&&b",
        "  http://E.com/x  ", "http://user@e.com/x", "http://h..y.com/",
        "http://münchen.de/straße", "http://h.io/a/./b/../c?q=%20",
    ]
    parts = canonicalize_parts(corpus)
    pat = re.compile(
        r"^([a-z]+)://([^/?#:@]+)(?::(\d+))?(/[^?#]*)(?:\?(.*))?$"
    )
    for canon, host, path, query in parts.rows():
        if canon is None:
            assert host is None and path is None and query is None
            continue
        m = pat.match(canon)
        assert m is not None, canon
        assert host == m.group(2)
        assert path == m.group(4)
        assert query == m.group(5)


def test_trap_hosts_rules(ray_session, sf_small):
    """Trap flag must equal the integer rules applied to the aggregated
    stats, the workload must be non-degenerate (both flag values
    present at sf0.01-like host counts is data-dependent; here assert
    rule consistency + determinism + host coverage)."""
    import polars as pl

    from spider_ray.functions import urls as U

    out = pl.from_arrow(U.q_trap_hosts(sf_small))
    assert out.height > 0
    expect = (
        (U.TRAP_Q_NUM * out["n_query"] >= U.TRAP_Q_DEN * out["n_urls"])
        | (out["max_depth"] >= U.TRAP_MAX_DEPTH)
    ).cast(pl.Int32)
    assert (out["trap"] == expect).all()
    assert (out["n_query"] <= out["n_urls"]).all()
    assert (out["max_depth"] >= 0).all()
    assert out["host"].str.starts_with("h").all()
    assert U.q_trap_hosts(sf_small).equals(U.q_trap_hosts(sf_small))
