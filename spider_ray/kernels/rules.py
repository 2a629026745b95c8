"""Specialty URL rules: AJAX rewrite (M11), host-alias TidyURL (M13),
search-result first-N-page gate (O7).

* M11 — ``IsAjaxUrl``/``TransformAjaxUrl`` (``crawl/page_crawler_misc.cc:
  94-118``): Google's deprecated AJAX-crawling scheme — ``#!state`` becomes
  ``?_escaped_fragment_=state`` so the crawler fetches a static variant;
  client-redirect map: fetch B but report A (``:289-301``).
* M13 — ``TidyURL`` host-alias rewriting (``url_rule/url_rule.h:7-43``):
  alias host → canonical host before identity operations.
* O7 — search-result page gate (``selector/mr_selector_r1_mapper.cc:421-429``,
  ``crawler_selector_util.h:37-63``): only the first N result pages of known
  search engines are crawlable.
"""

from __future__ import annotations

import re
from urllib.parse import quote

AJAX_MARK = "#!"


def is_ajax_url(url: str) -> bool:
    return AJAX_MARK in (url or "")


def transform_ajax_url(url: str) -> str:
    """``http://h/p#!key=v`` → ``http://h/p?_escaped_fragment_=key=v``."""
    if not is_ajax_url(url):
        return url
    base, _, frag = url.partition(AJAX_MARK)
    sep = "&" if "?" in base else "?"
    return f"{base}{sep}_escaped_fragment_={quote(frag, safe='=&')}"


def tidy_url(url: str, host_aliases: dict[str, str]) -> str:
    """Rewrite the host through the alias map (M13)."""
    m = re.match(r"^([a-z]+://)([^/?#]+)(.*)$", url or "")
    if not m:
        return url
    scheme, host, rest = m.groups()
    return scheme + host_aliases.get(host, host) + rest


# --- M12: PV/search-log seed-URL cleanup -------------------------------------
# (selector/mr_selector_r1_mapper.cc:226-268,313-362,369-387): log-derived
# seed URLs carry tracking suffixes and junk the crawler must strip/reject.

_NEED_LOGIN_HOSTS = frozenset(
    {"qzone.qq.com", "weixin.qq.com", "weibo.com", "login.example.com"}
)
_TEL_QQ_SUFFIX = re.compile(r"\s*(TEL|QQ)[:：][\d\- ]+$", re.IGNORECASE)
_GOOGLE_REDIR = re.compile(
    r"^[a-z]+://www\.google\.com/url\?", re.IGNORECASE
)  # seeds arrive pre-canonicalization: scheme/host case is still raw
_IP_HOST = re.compile(r"^\d{1,3}(\.\d{1,3}){3}$")


def clean_seed_url(raw: str) -> str | None:
    """Seed-ingest cleanup (M12): strip trailing TEL:/QQ: contact suffixes,
    resolve google redirect targets (&url= / ?q= param), reject %-prefixed
    hosts, need-login hosts, bare-IP hosts and '??' URLs. Returns the
    cleaned raw URL (still to be canonicalized) or None = rejected."""
    if raw is None:
        return None
    u = _TEL_QQ_SUFFIX.sub("", raw.strip())
    if "??" in u:
        return None
    if _GOOGLE_REDIR.match(u):
        from urllib.parse import parse_qs, urlsplit

        q = parse_qs(urlsplit(u).query)
        target = (q.get("url") or q.get("q") or [None])[0]
        if not target:
            return None
        u = target
    m = re.match(r"^(?:[a-z]+://)?([^/?#]+)", u, re.IGNORECASE)
    if m:
        host = m.group(1).lower()
        if host.startswith("%") or host in _NEED_LOGIN_HOSTS or _IP_HOST.match(host):
            return None
    return u or None


_SEARCH_PAGE_PARAMS = {
    # host-suffix → (param, results-per-page)
    "www.google.com": ("start", 10),
    "www.baidu.com": ("pn", 10),
    "www.bing.com": ("first", 10),
}
MAX_SEARCH_PAGES = 3  # first 1-3 result pages crawlable


def search_result_gate(url: str) -> bool:
    """True = crawlable. Non-search URLs always pass; search-result URLs
    pass only for the first MAX_SEARCH_PAGES pages."""
    m = re.match(r"^[a-z]+://([^/?#]+)", url or "")
    if not m:
        return True
    host = m.group(1)
    for h, (param, per_page) in _SEARCH_PAGE_PARAMS.items():
        if host == h:
            pm = re.search(rf"[?&]{param}=(\d+)", url)
            if pm is None:
                return True  # first page
            offset = int(pm.group(1))
            return offset < per_page * MAX_SEARCH_PAGES
    return True
