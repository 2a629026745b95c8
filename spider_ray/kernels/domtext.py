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


# Imported lazily (inside query functions), AFTER the pipeline modules'
# registration pass ran — so this module must register itself for
# pickle-by-value or its functions ship by reference to workers that may
# not have the repo on sys.path.
from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()
