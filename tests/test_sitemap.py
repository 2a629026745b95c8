"""Sitemap-driven seed discovery: distributed chain vs a single-process
reference, plus discovery-value invariants (fresh URLs, index expansion)."""

import os
import re

import polars as pl
import pyarrow.parquet as pq
import pytest

from spider_ray.functions.sitemap import q_sitemap_seeds


@pytest.fixture(scope="module")
def sm_corpus(ray_session, tmp_path_factory):
    from spider_ray.sources.webgen import generate

    d = str(tmp_path_factory.mktemp("sitemap_corpus"))
    generate(d, n_pages=700, n_hosts=12, seed=19)
    return d


def _reference(corpus):
    robots = pq.read_table(os.path.join(corpus, "robots.parquet")).to_pylist()
    store = {
        r["url"]: r["body"]
        for r in pq.read_table(
            os.path.join(corpus, "sitemaps.parquet")
        ).to_pylist()
    }
    known = set(
        pq.read_table(
            os.path.join(corpus, "web_graph.parquet"), columns=["url"]
        )["url"].to_pylist()
    )
    decl = re.compile(r"(?i)sitemap:[ \t]*(\S+)")
    loc = re.compile(r"<loc>([^<]+)</loc>")
    rows = set()
    for r in robots:
        for sm_url in decl.findall(r["body"]):
            body = store.get(sm_url)
            if body is None:
                continue
            leaves = (
                [store[c] for c in loc.findall(body) if c in store
                 and "<sitemapindex" not in store[c]]
                if "<sitemapindex" in body
                else [body]
            )
            for leaf in leaves:
                for u in loc.findall(leaf):
                    rows.add((r["host"], u, int(u in known)))
    return sorted(rows)


def test_sitemap_seeds_matches_reference(sm_corpus):
    out = pl.from_arrow(q_sitemap_seeds(sm_corpus))
    got = sorted(
        zip(out["host"].to_list(), out["url"].to_list(),
            out["known"].to_list())
    )
    assert got == _reference(sm_corpus)


def test_sitemap_seeds_discovery_value(sm_corpus):
    """The chain must actually discover: fresh (/fresh/) URLs come back
    known=0, listed real pages known=1, and the host-0 sitemapindex
    expands (its pages only reachable through child sitemaps)."""
    out = pl.from_arrow(q_sitemap_seeds(sm_corpus))
    fresh = out.filter(pl.col("url").str.contains("/fresh/"))
    assert fresh.height > 0
    assert (fresh["known"] == 0).all()
    real = out.filter(~pl.col("url").str.contains("/fresh/"))
    assert real.height > 0
    assert (real["known"] == 1).all()
    # index host: its sitemap.xml is an index, yet its pages are seeded
    robots = pq.read_table(
        os.path.join(sm_corpus, "robots.parquet")
    ).to_pylist()
    store = {
        r["url"]: r["body"]
        for r in pq.read_table(
            os.path.join(sm_corpus, "sitemaps.parquet")
        ).to_pylist()
    }
    idx_hosts = [
        h for h in robots
        if "<sitemapindex" in store.get(
            f"http://{h['host']}/sitemap.xml", "")
    ]
    assert idx_hosts, "no sitemapindex host generated"
    h0 = idx_hosts[0]["host"]
    assert out.filter(pl.col("host") == h0).height > 1
