"""URL canonicalization + filter rules.

Reimplements (from scratch, per the documented semantics — not the code) the
reference's ``NormalizeUrl`` (``crawler/api/base.cc:19-62``) with the
equivalence classes its test pins down (``crawler/api/base_test.cc:6-120``):

* trim surrounding whitespace; strip leading runs of percent-encoded
  whitespace (``%20``/``%09``/...);
* reject URLs longer than ``MAX_URL_LEN`` = 4096 bytes
  (``proto2/resource.proto:8-11`` ``kMaxLinkSize``);
* schemeless input gets ``http://``;
* lowercase scheme and host; IDN hosts → punycode; strip default ports
  (``:80`` http, ``:443`` https);
* resolve ``.``/``..`` path segments; empty path → ``/``;
* percent-decoding of unreserved characters (``%7E`` ≡ ``~``), uppercase
  remaining escapes;
* sort query parameters byte-wise (north_star spec: "lowercase host, sorted
  query, fragment strip");
* strip ``#fragment`` unconditionally — the reference keeps fragments for
  ``www.google.com*`` (``base.cc`` google exception); we deliberately follow
  the north-star rule instead and document the deviation here.

Filter rules reimplement ``WillFilterAccordingRules``
(``selector/crawler_selector_util.cc:413-520``): scheme must be http(s),
reject hosts starting ``.``/``%``/``+``, path depth ≤ 10, query ≤ 1000 chars,
host blacklist hook.
"""

from __future__ import annotations

import re
from urllib.parse import quote, unquote_to_bytes

import numpy as np
import pyarrow as pa

MAX_URL_LEN = 4096  # kMaxLinkSize, proto2/resource.proto:8
MAX_PATH_DEPTH = 10  # crawler_selector_util.h:6
MAX_QUERY_LEN = 1000  # crawler_selector_util.h:7

_LEADING_PCT_WS = re.compile(r"^(?:%(?:20|09|0[aAdD]|0D%0A))+")
_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*):")
# characters safe to leave unescaped in path; everything else re-quoted
_PATH_SAFE = "/:@!$&'()*+,;=~._-"
_QUERY_SAFE = ":@!$&'()*+,;=~._-/?"


def _idna(host: str) -> str | None:
    host = host.strip().rstrip(".").lower()
    if not host:
        return None
    if any(ord(c) > 127 for c in host):
        try:
            host = host.encode("idna").decode("ascii")
        except Exception:
            return None
    return host


def _resolve_dots(path: str) -> str:
    # RFC 3986 §5.2.4 remove_dot_segments
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    if path.endswith(("/.", "/..")):
        out.append("")
    res = "/".join(out)
    if not res.startswith("/"):
        res = "/" + res
    return res


def _requote(component: str, safe: str) -> str:
    """Percent-decode then re-encode with a canonical escape set: unreserved
    chars come out bare (%7E → ~), everything else uppercase-escaped."""
    try:
        raw = unquote_to_bytes(component)
    except Exception:
        raw = component.encode("utf-8", "replace")
    return quote(raw, safe=safe)


def canonicalize_one(url: str | None) -> str | None:
    """Canonicalize a single URL; None = rejected."""
    if url is None:
        return None
    u = url.strip()
    u = _LEADING_PCT_WS.sub("", u)
    if not u or len(u) > MAX_URL_LEN:
        return None
    m = _SCHEME_RE.match(u)
    if m:
        scheme = m.group(1).lower()
        rest = u[m.end():]
        if scheme not in ("http", "https"):
            return None
        rest = rest.lstrip("/")
    else:
        scheme = "http"
        rest = u.lstrip("/")
    # split authority / path?query#fragment
    frag_at = rest.find("#")
    if frag_at >= 0:
        rest = rest[:frag_at]  # fragment strip (north-star rule; see module doc)
    authority, sep, tail = rest.partition("/")
    tail = sep + tail
    q_at_auth = authority.find("?")
    if q_at_auth >= 0:
        # query directly after host: http://h?q
        tail = authority[q_at_auth:] + tail
        authority = authority[:q_at_auth]
    if "@" in authority:  # userinfo not supported by the crawler; reject
        return None
    hostport = authority
    host, _, port = hostport.partition(":")
    if port:
        if not port.isdigit():
            return None
        p = int(port)
        if (scheme == "http" and p == 80) or (scheme == "https" and p == 443):
            port = ""
        elif p > 65535:
            return None
    host = _idna(host)
    if host is None or host.startswith((".", "%", "+", "-")):
        return None
    if " " in host or "/" in host:
        return None
    path, _, query = tail.partition("?")
    path = _requote(_resolve_dots(path or "/"), _PATH_SAFE)
    if query:
        parts = query.split("&")
        parts = [_requote(p, _QUERY_SAFE) for p in parts if p != ""]
        parts.sort()  # byte-wise sorted query (north-star spec)
        query = "&".join(parts)
    out = scheme + "://" + host
    if port:
        out += ":" + port
    out += path
    if query:
        out += "?" + query
    if len(out) > MAX_URL_LEN:
        return None
    return out


def canonicalize(urls) -> list[str | None]:
    """Vectorized-interface canonicalizer over a string column.

    The per-URL work is branchy string parsing — a C-level loop via list
    comprehension over Arrow→py strings. At ~1-2 µs/URL this stage is never
    the bottleneck next to the shuffle; kept as the one non-vectorized kernel
    by design (same choice the reference makes: NormalizeUrl is per-record).
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    if isinstance(urls, pa.Array):
        urls = urls.to_pylist()
    return [canonicalize_one(u) for u in urls]


try:
    import polars as _pl

    _HAVE_POLARS = True
except Exception:  # pragma: no cover
    _HAVE_POLARS = False


# ONE anchored regex pass extracts every component (scheme/host/port/path/
# query) and simultaneously validates the parse: a URL that cannot be split
# cleanly into these groups (userinfo "@", non-digit port, embedded
# whitespace, non-http scheme, schemeless...) matches nothing → all-null
# groups → per-row slow path. Anchoring (`$` + optional fragment group) is
# load-bearing: the previous multi-extract version's unanchored port regex
# accepted "http://hh:80x/" as port 80 where the scalar kernel rejects it.
_FUSED_RE = (
    r"(?i)^(?P<scheme>https?)://(?P<host>[^/?#:@]+)(?::(?P<port>\d+))?"
    r"(?P<path>/[^?#]*)?(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)
# fast-path eligibility charsets: the plain safe characters plus %7E/%7e —
# the one percent-escape whose canonical form is vectorizable (unreserved
# '~' comes out bare under _requote, nothing else changes)
_FAST_PATH_CHARS = r"^(?:[A-Za-z0-9/._~!$&'()*+,;=:@-]|%7[Ee])*$"
_FAST_QUERY_CHARS = r"^(?:[A-Za-z0-9._~!$'()*+,;=:@/?&-]|%7[Ee])*$"

_PARTS_SCHEMA = {"canon": None, "host": None, "path": None, "query": None}


def canonicalize_parts(urls):
    """Canonicalize a string column and return a polars DataFrame with the
    canonical URL *and its components* in one pass:

    ``canon``  canonical URL (null = rejected), ``host`` lowercased host,
    ``path``   canonical path (always starts ``/`` when canon non-null),
    ``query``  canonical (sorted, empty-param-stripped) query or null.

    This is the hot-path form: downstream stages (frontier filter, host
    sharding) need host/path/query anyway, and re-extracting them from the
    canonical string costs three more full-column regex passes. Guaranteed
    equal to the scalar kernel — property-tested in
    tests/test_kernels_url.py::test_vectorized_equals_scalar and pinned
    independently by tests/test_frontier_bench.py. Requires polars."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    if not isinstance(urls, pa.Array):
        urls = pa.array(list(urls), pa.string())
    if len(urls) == 0:
        return _pl.DataFrame(schema={k: _pl.Utf8 for k in _PARTS_SCHEMA})
    out = (
        _pl.DataFrame({"raw": _pl.from_arrow(urls)})
        .with_columns(trimmed=_pl.col("raw").fill_null("").str.strip_chars())
        .with_columns(g=_pl.col("trimmed").str.extract_groups(_FUSED_RE))
        .unnest("g")
        .with_columns(
            scheme=_pl.col("scheme").str.to_lowercase(),
            host=_pl.col("host").str.to_lowercase(),
            path0=_pl.col("path").fill_null("/"),
        )
    )
    out = out.with_columns(
        fast=(
            _pl.col("scheme").is_not_null()
            & _pl.col("host").str.contains(r"^[a-z0-9][a-z0-9.-]*[a-z0-9]$")
            & ~_pl.col("host").str.contains(r"\.\.", literal=True)
            & _pl.col("path0").str.contains(_FAST_PATH_CHARS)
            & ~_pl.col("path0").str.contains(r"/\.{1,2}(/|$)")
            & (
                _pl.col("port").is_null()
                | ((_pl.col("scheme") == "http") & (_pl.col("port") == "80"))
                | ((_pl.col("scheme") == "https") & (_pl.col("port") == "443"))
            )
            & (
                _pl.col("query").is_null()
                | _pl.col("query").str.contains(_FAST_QUERY_CHARS)
            )
            & (_pl.col("trimmed").str.len_bytes() <= MAX_URL_LEN)
        )
    )
    # sorted query: native list.sort puts the empty parts ("a&&b") first,
    # the strip_chars_start drops them after the join — equivalent to
    # filter(!= "") + sort but all-native kernels, and computed ONCE into a
    # column (the when/then form evaluated the list pipeline twice)
    sorted_q = (
        _pl.col("query")
        .str.replace_all(r"%7[Ee]", "~")
        .str.split("&")
        .list.sort()
        .list.join("&")
        .str.strip_chars_start("&")
    )
    out = out.with_columns(sq=sorted_q).with_columns(
        cpath=_pl.when(_pl.col("fast"))
        .then(_pl.col("path0").str.replace_all(r"%7[Ee]", "~"))
        .otherwise(None),
        cquery=_pl.when(_pl.col("fast") & (_pl.col("sq") != ""))
        .then(_pl.col("sq"))
        .otherwise(None),
    ).with_columns(
        canon=_pl.when(_pl.col("fast")).then(
            _pl.col("scheme")
            + _pl.lit("://")
            + _pl.col("host")
            + _pl.col("cpath")
            + _pl.when(_pl.col("cquery").is_not_null())
            .then(_pl.lit("?") + _pl.col("cquery"))
            .otherwise(_pl.lit(""))
        ).otherwise(None)
    )
    ok = (
        out.select(
            ok=_pl.col("fast")
            & _pl.col("canon").is_not_null()
            & (_pl.col("canon").str.len_bytes() <= MAX_URL_LEN)
        )["ok"]
        .fill_null(False)
        .to_numpy()
    )
    canon_s = out["canon"]
    host_s = out["host"]
    path_s = out["cpath"]
    query_s = out["cquery"]
    if not ok.all():
        bad = np.nonzero(~ok)[0]
        fixed = [canonicalize_one(u) for u in out["raw"].gather(bad).to_list()]
        # a canonical URL always re-parses under the fused regex (scalar
        # output is scheme://host[:port]path[?query] with '#'/'?' escaped
        # inside components), so the patched rows' parts come from the same
        # single extract pass over the small fixed set
        sub = (
            _pl.DataFrame({"canon": fixed}, schema={"canon": _pl.Utf8})
            .with_columns(g=_pl.col("canon").str.extract_groups(_FUSED_RE))
            .unnest("g")
        )
        idx = _pl.Series(bad)
        canon_s = canon_s.scatter(idx, sub["canon"])
        host_s = host_s.scatter(idx, sub["host"])
        path_s = path_s.scatter(idx, sub["path"])
        query_s = query_s.scatter(idx, sub["query"])
    return _pl.DataFrame(
        {
            "canon": canon_s,
            "host": host_s,
            "path": path_s,
            "query": query_s,
        }
    )


def canonicalize_vector(urls) -> list[str | None]:
    """Vectorized canonicalizer (list interface over
    :func:`canonicalize_parts`): a polars fast path for the common shapes
    (case folding, default-port elision, fragment strip, query sort, bare
    %7E escapes) with a per-row fallback to :func:`canonicalize_one` for
    anything hairy (other percent-escapes, dot segments, IDN, userinfo, odd
    ports). Guaranteed equal to the scalar kernel — property-tested in
    tests/test_kernels_url.py::test_vectorized_equals_scalar."""
    if not _HAVE_POLARS:
        return canonicalize(urls)
    return canonicalize_parts(urls)["canon"].to_list()


_HOST_RE = re.compile(r"^[a-z]+://([^/?#:]+)")


def host_of(canonical_url: str) -> str:
    m = _HOST_RE.match(canonical_url)
    return m.group(1) if m else ""


def hosts_of(urls) -> list[str]:
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    if isinstance(urls, pa.Array):
        urls = urls.to_pylist()
    return [host_of(u) if u else "" for u in urls]


def filter_rules(canonical_urls, blacklist_hosts: frozenset[str] = frozenset()):
    """Vector of (keep: bool, reason: str) per WillFilterAccordingRules
    semantics (crawler_selector_util.cc:413-520). Input must already be
    canonicalized (None = failed canonicalization)."""
    keep = np.ones(len(canonical_urls), dtype=bool)
    reasons = [""] * len(canonical_urls)
    for i, u in enumerate(canonical_urls):
        if u is None:
            keep[i] = False
            reasons[i] = "canonicalize_reject"
            continue
        host = host_of(u)
        if host in blacklist_hosts:
            keep[i] = False
            reasons[i] = "host_blacklist"
            continue
        rest = u.split("://", 1)[1]
        path_q = rest[len(host):]
        path, _, query = path_q.partition("?")
        if path.count("/") > MAX_PATH_DEPTH:
            keep[i] = False
            reasons[i] = "path_too_deep"
            continue
        if len(query) > MAX_QUERY_LEN:
            keep[i] = False
            reasons[i] = "query_too_long"
            continue
    return keep, reasons
