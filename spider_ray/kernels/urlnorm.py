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


def canonicalize_vector(urls) -> list[str | None]:
    """Vectorized canonicalizer: a polars fast path for the common shapes
    (case folding, default-port elision, fragment strip, query sort) with a
    per-row fallback to :func:`canonicalize_one` for anything hairy
    (percent-escapes, dot segments, IDN, userinfo, odd ports). Guaranteed
    equal to the scalar kernel — property-tested in
    tests/test_kernels_url.py::test_vectorized_equals_scalar."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    if isinstance(urls, pa.Array):
        n = len(urls)
    else:
        urls = pa.array(list(urls), pa.string())
        n = len(urls)
    if not _HAVE_POLARS or n == 0:
        return canonicalize(urls)
    s = _pl.from_arrow(urls).alias("raw")
    df = _pl.DataFrame({"raw": s})
    parts = df.select(
        trimmed=_pl.col("raw").fill_null("").str.strip_chars()
    ).with_columns(
        nofrag=_pl.col("trimmed").str.replace(r"#.*$", "", literal=False)
    ).with_columns(
        scheme=_pl.col("nofrag")
        .str.extract(r"(?i)^(https?)://", 1)
        .str.to_lowercase(),
        has_scheme=_pl.col("nofrag").str.contains(r"(?i)^[a-z][a-z0-9+.-]*:"),
        rest=_pl.col("nofrag").str.replace(r"(?i)^(https?)://", "", literal=False),
    ).with_columns(
        host=_pl.col("rest").str.extract(r"^([^/?#:]+)", 1).str.to_lowercase(),
        port=_pl.col("rest").str.extract(r"^[^/?#:]+:(\d+)", 1),
        path=_pl.col("rest").str.extract(r"^[^/?#]*(/[^?#]*)", 1).fill_null("/"),
        query=_pl.col("rest").str.extract(r"^[^?#]*\?([^#]*)", 1),
    )
    # fast-path eligibility: scheme http(s) (or schemeless handled by slow
    # path), clean ascii host, no escapes/dot-segments in path, default or
    # no port, simple query characters
    FAST_PATH_CHARS = r"^[A-Za-z0-9/._~!$&'()*+,;=:@-]*$"
    FAST_QUERY_CHARS = r"^[A-Za-z0-9._~!$'()*+,;=:@/?&-]*$"
    parts = parts.with_columns(
        fast=(
            _pl.col("has_scheme")
            & _pl.col("scheme").is_not_null()
            & _pl.col("host").str.contains(r"^[a-z0-9][a-z0-9.-]*[a-z0-9]$")
            & ~_pl.col("host").str.contains(r"\.\.", literal=True)
            & ~_pl.col("rest").str.contains("@", literal=True)
            & _pl.col("path").str.contains(FAST_PATH_CHARS)
            & ~_pl.col("path").str.contains(r"/\.{1,2}(/|$)")
            & (
                _pl.col("port").is_null()
                | ((_pl.col("scheme") == "http") & (_pl.col("port") == "80"))
                | ((_pl.col("scheme") == "https") & (_pl.col("port") == "443"))
            )
            & (
                _pl.col("query").is_null()
                | _pl.col("query").str.contains(FAST_QUERY_CHARS)
            )
            & (_pl.col("trimmed").str.len_bytes() <= MAX_URL_LEN)
        )
    )
    sorted_q = (
        _pl.col("query")
        .str.split("&")
        .list.eval(_pl.element().filter(_pl.element() != "").sort())
        .list.join("&")
    )
    out = parts.with_columns(
        canon=_pl.when(_pl.col("fast"))
        .then(
            _pl.col("scheme")
            + _pl.lit("://")
            + _pl.col("host")
            + _pl.col("path")
            + _pl.when(_pl.col("query").is_not_null() & (sorted_q != ""))
            .then(_pl.lit("?") + sorted_q)
            .otherwise(_pl.lit(""))
        )
        .otherwise(None)
    )
    import numpy as _np

    ok = (
        out.select(
            ok=_pl.col("fast")
            & _pl.col("canon").is_not_null()
            & (_pl.col("canon").str.len_bytes() <= MAX_URL_LEN)
        )["ok"]
        .fill_null(False)
        .to_numpy()
    )
    result: list[str | None] = out["canon"].to_list()
    if not ok.all():
        raws = df["raw"].to_list()
        for i in _np.nonzero(~ok)[0]:
            result[i] = canonicalize_one(raws[i])
    return result


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
