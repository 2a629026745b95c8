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
