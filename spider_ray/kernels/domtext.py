"""DOM main-content extraction — M17 (the reference's text-quality lever).

Reference semantics (``dedup/dom_extractor/content_collector.cc``, 840 LoC):
parse the page into a DOM, drop non-text nodes top-down (script / style /
nav / footer / header / iframe / form controls / comments / anchors /
invisible nodes — ``DroppableNode``, :804-838), prune empty text bottom-up,
compute per-node character statistics, then walk from ``<body>`` following
the DOMINANT child — the child whose share of non-link characters among its
siblings exceeds ``body_ratio_thresh`` (0.5, :23,503-515) — and emit that
cluster's text as the main content; the title comes from ``<head><title>``.

Re-expressed in pure Python on the stdlib ``html.parser`` (no html5lib in
this container): a ~150-line faithful restatement of the ratio walk, used
per-row inside an actor-pool ``map_batches`` stage. Site-specific special
cases (baike/gome class rules, :783-799) are deliberately not ported.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

BODY_RATIO_THRESH = 0.5  # FLAGS_body_ratio_thresh (content_collector.cc:23)

# DroppableNode tag set (content_collector.cc:804-838); html.parser already
# strips comments and doctype for us
DROP_TAGS = frozenset(
    {
        "hr", "br", "input", "select", "textarea", "menu", "applet",
        "button", "object", "nav", "footer", "header", "iframe", "audio",
        "link", "img", "style", "script", "noscript", "marquee", "a",
        "form", "video", "source",
    }
)
_VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "link", "meta", "source", "area", "base",
     "col", "embed", "track", "wbr"}
)
_INVISIBLE_RE = re.compile(
    r"display\s*:\s*none|visibility\s*:\s*hidden", re.I
)
_WS_RE = re.compile(r"\S")


class _Node:
    __slots__ = ("tag", "attrs", "children", "text", "nonlink_chars")

    def __init__(self, tag: str, attrs=()):
        self.tag = tag
        self.attrs = dict(attrs)
        self.children: list = []  # _Node or str (text)
        self.text = ""
        self.nonlink_chars = 0


class _TreeBuilder(HTMLParser):
    """Minimal DOM: tolerant of unclosed tags (pops to the matching open
    tag if one exists, ignores stray closes)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, attrs)
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def _find(node: _Node, tag: str):
    for ch in node.children:
        if isinstance(ch, _Node):
            if ch.tag == tag:
                return ch
            hit = _find(ch, tag)
            if hit is not None:
                return hit
    return None


def _invisible(node: _Node) -> bool:
    return bool(_INVISIBLE_RE.search(node.attrs.get("style") or ""))


def _prune(node: _Node) -> int:
    """RemoveNontext top-down + leaf statistics in one pass: drop the
    droppable subtrees, count each surviving node's non-whitespace chars
    (anchors were dropped, so this IS the nonlink count)."""
    kept = []
    total = 0
    for ch in node.children:
        if isinstance(ch, str):
            n = len(_WS_RE.findall(ch))
            kept.append(ch)
            total += n
            continue
        if ch.tag in DROP_TAGS or _invisible(ch):
            continue
        n = _prune(ch)
        if n > 0:  # RemoveNontextBottomUp: empty text subtrees vanish
            kept.append(ch)
            total += n
    node.children = kept
    node.nonlink_chars = total
    return total


def _collect_text(node: _Node, out: list) -> None:
    for ch in node.children:
        if isinstance(ch, str):
            out.append(ch)
        else:
            _collect_text(ch, out)


def _node_text(node: _Node) -> str:
    parts: list = []
    _collect_text(node, parts)
    return "".join(parts).strip()


def extract_main_content(page_utf8: str, url: str = "") -> tuple[str, str]:
    """(title, main content) of an HTML page — ExtractMainContent
    (content_collector.cc:96-160). Empty strings when the page has no
    usable body text."""
    builder = _TreeBuilder()
    builder.feed(page_utf8 or "")
    root = builder.root

    title_node = _find(root, "title")
    title = _node_text(title_node) if title_node is not None else ""

    body = _find(root, "body") or root
    if _prune(body) == 0:
        return title, ""

    # dominant-cluster descent (FindDominantNodeCluster,
    # content_collector.cc:503-535): while ONE child holds more than
    # body_ratio_thresh of its siblings' non-link characters, descend;
    # the node where no child dominates is the main-content cluster.
    node = body
    while True:
        element_children = [
            ch for ch in node.children if isinstance(ch, _Node)
        ]
        if not element_children:
            break
        # direct text of the node joins the denominator: stdlib html.parser
        # keeps text siblings inside the same node (it doesn't imply </p>),
        # and descending away from dominant direct text would drop it
        direct = sum(
            len(_WS_RE.findall(ch))
            for ch in node.children
            if isinstance(ch, str)
        )
        total = sum(ch.nonlink_chars for ch in element_children) + direct
        best = max(element_children, key=lambda ch: ch.nonlink_chars)
        if total <= 0 or best.nonlink_chars / total <= BODY_RATIO_THRESH:
            break
        node = best
    return title, _node_text(node)


# ---------------------------------------------------------------------------
# Real-HTML link extraction — M8 over raw bytes (the "what a user pointing
# this at WARC data hits first" kernel). Reference semantics, reimplemented
# (crawler2/general_crawler/css_fetcher_main.cc:140-264):
#   * parse at most 1 MB of the utf-8 page ("如果 utf8 网页大于 1MB, 则截断
#     后再处理", :188-190) — truncation BEFORE parse;
#   * per-page first-wins dedup of css / image / anchor URL sets
#     (:199-224 three std::set guards);
#   * nofollow anchors are NOT filtered (the reference's nofollow branch
#     is commented out, :227-250 "XXX(pengdan)"; we match the live code);
#   * title ≤ 1024 bytes, line-escaped (:252-262 GetTitle + LineEscape);
#   * URL length cap kMaxLinkSize = 4096 bytes (proto2/resource.proto:8).
# Resolution is RFC-3986 urljoin against the page's effective URL;
# fragment-only / mailto: / javascript: / data: hrefs are dropped (they
# are not fetchable resources).

MAX_PARSE_BYTES = 1 << 20  # 1 MB utf-8 parse truncation
MAX_TITLE_BYTES = 1024
MAX_LINK_BYTES = 4096  # kMaxLinkSize

_SKIP_SCHEMES = ("mailto:", "javascript:", "data:", "tel:")


class _LinkExtractor(HTMLParser):
    """One streaming pass: anchors (+text), img src/alt, stylesheet
    links, first <title>. No tree build — O(page) with zero recursion."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.anchors: list[tuple[str, str]] = []  # (href, text)
        self.images: list[tuple[str, str]] = []  # (src, alt)
        self.css: list[str] = []
        self.title = ""
        self._a_href: str | None = None
        self._a_text: list[str] = []
        self._in_title = False
        self._title_parts: list[str] = []
        self._title_done = False

    def handle_starttag(self, tag, attrs):
        d = dict(attrs)
        if tag == "a":
            if self._a_href is not None:
                # implicit close of an unclosed <a> (reference parser
                # behavior: anchors never nest)
                self.anchors.append(
                    (self._a_href, "".join(self._a_text).strip())
                )
            self._a_href = d.get("href") or None
            self._a_text = []
        elif tag == "img":
            src = d.get("src")
            if src:
                self.images.append((src, d.get("alt") or ""))
        elif tag == "link":
            rel = (d.get("rel") or "").lower()
            href = d.get("href")
            if href and "stylesheet" in rel.split():
                self.css.append(href)
        elif tag == "title" and not self._title_done:
            self._in_title = True

    def handle_endtag(self, tag):
        if tag == "a" and self._a_href is not None:
            self.anchors.append(
                (self._a_href, "".join(self._a_text).strip())
            )
            self._a_href = None
            self._a_text = []
        elif tag == "title" and self._in_title:
            self.title = "".join(self._title_parts).strip()
            self._in_title = False
            self._title_done = True

    def handle_data(self, data):
        if self._a_href is not None:
            self._a_text.append(data)
        if self._in_title:
            self._title_parts.append(data)


def _resolve(base: str, href: str) -> str | None:
    """urljoin + the reference's drop rules: non-fetchable schemes,
    fragment-only, over-long URLs → None."""
    from urllib.parse import urljoin

    h = href.strip()
    if not h or h.startswith("#"):
        return None
    low = h.lower()
    if any(low.startswith(s) for s in _SKIP_SCHEMES):
        return None
    try:
        absu = urljoin(base, h)
    except ValueError:
        return None
    absu = absu.split("#", 1)[0]
    if not absu.startswith(("http://", "https://")):
        return None
    if len(absu.encode("utf-8", "ignore")) > MAX_LINK_BYTES:
        return None
    return absu


def _line_escape(s: str) -> str:
    """base::LineEscape — newline family to visible escapes so the title
    always fits one record line."""
    return (
        s.replace("\\", "\\\\")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def extract_links(page: bytes | str, base_url: str) -> dict:
    """Outlink/anchor/image/css/title extraction from a raw HTML page —
    the parse half of M8 the crawl loop's opt-in ``parse_html`` mode and
    ``q_html_outlinks`` run. Returns ``{"anchors": [(url, text)...],
    "images": [(url, alt)...], "css": [url...], "title": str}`` with
    per-page first-wins dedup by URL within each list."""
    if isinstance(page, bytes):
        page = page[:MAX_PARSE_BYTES].decode("utf-8", "ignore")
    else:
        page = page.encode("utf-8")[:MAX_PARSE_BYTES].decode(
            "utf-8", "ignore"
        )
    p = _LinkExtractor()
    p.feed(page)
    p.close()
    if p._a_href is not None:  # unclosed trailing anchor
        p.anchors.append((p._a_href, "".join(p._a_text).strip()))

    anchors, seen_a = [], set()
    for href, text in p.anchors:
        u = _resolve(base_url, href)
        if u is not None and u not in seen_a:
            seen_a.add(u)
            anchors.append((u, text))
    images, seen_i = [], set()
    for src, alt in p.images:
        u = _resolve(base_url, src)
        if u is not None and u not in seen_i:
            seen_i.add(u)
            images.append((u, alt))
    css, seen_c = [], set()
    for href in p.css:
        u = _resolve(base_url, href)
        if u is not None and u not in seen_c:
            seen_c.add(u)
            css.append(u)

    # byte cap with multibyte-safe truncation: one encode + one slice
    # (a per-character re-encode loop is O(n²) on a title near the 1 MB
    # parse cap); errors="ignore" drops the trailing partial codepoint
    title_b = p.title.encode("utf-8")
    title = (
        title_b[:MAX_TITLE_BYTES].decode("utf-8", "ignore")
        if len(title_b) > MAX_TITLE_BYTES
        else p.title
    )
    return {
        "anchors": anchors,
        "images": images,
        "css": css,
        "title": _line_escape(title),
    }


# Imported lazily (inside query functions), AFTER the pipeline modules'
# registration pass ran — so this module must register itself for
# pickle-by-value or its functions ship by reference to workers that may
# not have the repo on sys.path.
from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()
