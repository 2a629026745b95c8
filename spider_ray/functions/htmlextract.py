"""Real-HTML link/asset extraction queries — M8 over raw page bytes.

The crawl loop's default "parse" is the SURVEY-sanctioned table lookup;
this module runs the actual byte-level parse
(``kernels/domtext.extract_links`` — reference semantics from
``crawler2/general_crawler/css_fetcher_main.cc:140-264``: 1 MB utf-8
parse truncation, per-page first-wins URL dedup per kind, ≤1024-byte
line-escaped title, kMaxLinkSize=4096 URL cap, live-code nofollow
behavior i.e. none) over deterministic HTML renderings of the corpus
(``sources/webgen.render_html``), so the DuckDB oracle can recompute the
expected output from the web_graph table alone: the queries verify the
round-trip ``extract_links(render_html(row)) == row`` page by page —
exactly the invariant the crawl loop's opt-in ``parse_html`` mode rests
on.

Scale shape: one embarrassingly-parallel ``map_batches`` pass over the
pruned web_graph columns; the per-row HTML parse is the work item (a real
WARC pipeline would read the bytes column instead of rendering — same
stage shape, same kernel).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from spider_ray.kernels.domtext import extract_links
from spider_ray.pipelines.relational import _concat, _sorted
from spider_ray.sources.webgen import render_html


def _read_graph(corpus: str) -> ray.data.Dataset:
    import os

    return ray.data.read_parquet(
        os.path.join(corpus, "web_graph.parquet"),
        columns=["url", "host", "outlinks", "image_refs"],
    )


_OUTLINK_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("anchor_url", pa.string()),
        ("anchor_text", pa.string()),
    ]
)


def q_html_outlinks(corpus: str) -> pa.Table:
    """(page, outlink, anchor text) from a full byte-level HTML parse of
    every page: render each web_graph row to HTML, extract anchors with
    :func:`extract_links` (relative hrefs resolved, boilerplate /
    oversized / non-fetchable links dropped, first-wins dedup), one row
    per surviving anchor. The oracle unnests the table's outlinks —
    equality IS the render→parse round-trip."""
    ds = _read_graph(corpus)

    def parse(batch: pa.Table) -> pa.Table:
        urls, a_urls, a_texts = [], [], []
        for r in batch.to_pylist():
            html = render_html(
                r["url"], r["host"], r["outlinks"], r["image_refs"]
            )
            for u, t in extract_links(html.encode("utf-8"), r["url"])[
                "anchors"
            ]:
                urls.append(r["url"])
                a_urls.append(u)
                a_texts.append(t)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "anchor_url": pa.array(a_urls, pa.string()),
                "anchor_text": pa.array(a_texts, pa.string()),
            }
        )

    return _sorted(
        _concat(
            ds.map_batches(parse, batch_format="pyarrow"),
            schema=_OUTLINK_SCHEMA,
        ),
        ["url", "anchor_url"],
    )


_STATS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("title", pa.string()),
        ("n_anchors", pa.int64()),
        ("n_images", pa.int64()),
        ("n_css", pa.int64()),
    ]
)


def q_html_page_stats(corpus: str) -> pa.Table:
    """Per-page parse summary from the byte-level extraction: extracted
    title plus anchor / image / css counts after the kernel's dedup and
    drop rules. SQL-oracled from the web_graph columns (title is a pure
    string function of host + trailing page seq; counts are list lengths
    after distinct)."""
    ds = _read_graph(corpus)

    def parse(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in _STATS_SCHEMA.names}
        for r in batch.to_pylist():
            html = render_html(
                r["url"], r["host"], r["outlinks"], r["image_refs"]
            )
            p = extract_links(html.encode("utf-8"), r["url"])
            out["url"].append(r["url"])
            out["title"].append(p["title"])
            out["n_anchors"].append(len(p["anchors"]))
            out["n_images"].append(len(p["images"]))
            out["n_css"].append(len(p["css"]))
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "title": pa.array(out["title"], pa.string()),
                "n_anchors": pa.array(out["n_anchors"], pa.int64()),
                "n_images": pa.array(out["n_images"], pa.int64()),
                "n_css": pa.array(out["n_css"], pa.int64()),
            }
        )

    return _sorted(
        _concat(
            ds.map_batches(parse, batch_format="pyarrow"),
            schema=_STATS_SCHEMA,
        ),
        "url",
    )


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()


def q_warc_outlinks(warc_dir: str) -> pa.Table:
    """WARC-archive ingestion → byte-level link extraction: read a
    directory of ``.warc.gz`` archives distributed (one parse task per
    archive — `sources/warc.py`), keep 200-status HTML responses, and
    extract anchors from the RAW BODIES with the same kernel as the
    parse-mode crawl. Output identical to :func:`q_html_outlinks`
    restricted to fetchable pages — which is exactly what the SQL oracle
    recomputes from the source corpus's web_graph, so the green row
    proves the whole chain: corpus → WARC bytes on disk → distributed
    archive parse → HTML parse → outlinks."""
    import glob as _glob
    import os

    from spider_ray.sources.warc import read_warc

    paths = sorted(_glob.glob(os.path.join(warc_dir, "*.warc*")))
    ds = read_warc(paths)

    def parse(batch: pa.Table) -> pa.Table:
        urls, a_urls, a_texts = [], [], []
        for r in batch.to_pylist():
            if r["status"] != 200 or "text/html" not in r["content_type"]:
                continue
            for u, t in extract_links(r["body"], r["url"])["anchors"]:
                urls.append(r["url"])
                a_urls.append(u)
                a_texts.append(t)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "anchor_url": pa.array(a_urls, pa.string()),
                "anchor_text": pa.array(a_texts, pa.string()),
            }
        )

    return _sorted(
        _concat(
            ds.map_batches(parse, batch_format="pyarrow"),
            schema=_OUTLINK_SCHEMA,
        ),
        ["url", "anchor_url"],
    )


def build_warc_store(corpus: str, out_dir: str, n_files: int = 8) -> str:
    """Materialize an html-bodied corpus as ``n_files`` gzip WARC
    archives (url-hash sliced so files are balanced) — the fixture the
    WARC-ingestion query and tests read."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from spider_ray.kernels.hashing import hash64
    from spider_ray.sources.warc import write_warc

    os.makedirs(out_dir, exist_ok=True)
    wg = pq.read_table(
        os.path.join(corpus, "web_graph.parquet"),
        columns=["url", "status_code"],
    )
    bodies = {
        r["url"]: r["body"]
        for r in pq.read_table(
            os.path.join(corpus, "html_pages.parquet")
        ).to_pylist()
    }
    urls = wg["url"].to_pylist()
    statuses = wg["status_code"].to_pylist()
    part = (hash64(urls) % np.uint64(n_files)).astype(np.int64)
    for f in range(n_files):
        recs = [
            {
                "url": u,
                "status": int(s),
                "content_type": "text/html; charset=utf-8",
                "body": bodies[u],
            }
            for u, s, p in zip(urls, statuses, part)
            if p == f
        ]
        write_warc(
            os.path.join(out_dir, f"part-{f:05d}.warc.gz"), recs
        )
    return out_dir
