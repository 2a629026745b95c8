"""Golden tests for M17 DOM main-content extraction
(dedup/dom_extractor/content_collector.cc semantics: droppable-node
stripping, dominant-cluster ratio walk, title from <head>)."""

from spider_ray.kernels.domtext import extract_main_content

ARTICLE = (
    "The streaming executor schedules blocks with backpressure so that a "
    "wide shuffle cannot stall the politeness-bound fetch stage of the "
    "crawl loop while frontier expansion keeps the actors busy."
)


def _page(body: str, title: str = "T") -> str:
    return f"<html><head><title>{title}</title></head><body>{body}</body></html>"


def test_strips_nav_header_footer_script_style():
    page = _page(
        "<header>site chrome</header>"
        "<nav><a href='/'>home</a><a href='/x'>other</a></nav>"
        "<script>var x = 'lots of js junk here';</script>"
        "<style>.c{color:red}</style>"
        f"<div id='m'><p>{ARTICLE}</p></div>"
        "<footer>copyright footer</footer>"
    )
    title, content = extract_main_content(page)
    assert title == "T"
    assert content == ARTICLE


def test_anchor_text_never_counts_or_appears():
    # a link-farm sibling with MORE raw chars than the article must lose:
    # anchors are droppable, so their text contributes zero to the ratio
    links = "".join(f"<a href='/{i}'>link text number {i}</a>" for i in range(40))
    page = _page(f"<div>{links}</div><div><p>{ARTICLE}</p></div>")
    _, content = extract_main_content(page)
    assert content == ARTICLE


def test_invisible_nodes_dropped():
    page = _page(
        f"<div style='display:none'>{'hidden junk ' * 50}</div>"
        f"<div><p>{ARTICLE}</p></div>"
    )
    _, content = extract_main_content(page)
    assert content == ARTICLE


def test_dominant_descent_picks_big_paragraph():
    page = _page(
        f"<div><p>{ARTICLE}</p><p>(c) tiny fineprint</p></div>"
    )
    _, content = extract_main_content(page)
    assert content == ARTICLE  # 0.5 ratio walk descends past the fineprint


def test_no_dominant_keeps_whole_cluster():
    # three balanced paragraphs: each holds ~1/3 < the 0.5 threshold, so
    # the walk stops at their parent and keeps all of them
    a = "first balanced paragraph with roughly equal size here"
    b = "second balanced paragraph with roughly equal length too"
    c = "third balanced paragraph with comparable char count also"
    page = _page(f"<div><p>{a}</p><p>{b}</p><p>{c}</p></div>")
    _, content = extract_main_content(page)
    assert a in content and b in content and c in content


def test_empty_and_chrome_only_pages():
    assert extract_main_content("") == ("", "")
    t, c = extract_main_content(
        _page("<nav><a href='/'>only links</a></nav>", title="X")
    )
    assert t == "X" and c == ""


def test_unclosed_tags_tolerated():
    page = "<html><body><div><p>" + ARTICLE + "<p>(c) x</div></body>"
    _, content = extract_main_content(page)
    assert ARTICLE in content


def test_entities_roundtrip():
    raw = "a < b && c > d é"
    import html

    page = _page(f"<div><p>{html.escape(raw)} {ARTICLE}</p></div>")
    _, content = extract_main_content(page)
    assert content.startswith("a < b && c > d")
