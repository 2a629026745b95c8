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


SM_CRAWL_CORPUS = "/tmp/spider_ray_sm_crawl_corpus"
SM_CRAWL_OUT = "/tmp/spider_ray_sm_crawl_out"


def test_sitemap_seeded_crawl_parity_and_coverage(ray_session):
    """run_crawl(sitemap_seeds=True) must (a) reproduce the oracle's
    crawl order + seen set exactly when the oracle uses ITS independent
    single-process discovery (the whole distributed chain is on the
    parity path), and (b) strictly extend coverage vs the un-seeded
    crawl (sitemaps list pages links alone don't reach)."""
    import glob
    import shutil

    import pyarrow.parquet as pq

    from spider_ray.pipelines.crawl import read_sink, run_crawl
    from spider_ray.pipelines.oracle import run_oracle
    from spider_ray.sources.webgen import generate

    # big enough that the depth-capped link BFS (M9: outlinks only emit
    # below depth 2) leaves sitemap-listed pages unreached by links
    shutil.rmtree(SM_CRAWL_CORPUS, ignore_errors=True)
    generate(SM_CRAWL_CORPUS, n_pages=1400, n_hosts=12, seed=31)

    def engine_rows(out_dir):
        rows = []
        for d in sorted(
            glob.glob(os.path.join(out_dir, "gen=*")),
            key=lambda p: int(p.split("=")[1]),
        ):
            rows.extend(read_sink(d, "status.parquet").to_pylist())
        return rows

    # seeded engine vs seeded oracle — full order/seen parity
    out_sm = os.path.join(SM_CRAWL_OUT, "seeded")
    shutil.rmtree(out_sm, ignore_errors=True)
    run_crawl(
        SM_CRAWL_CORPUS, out_sm, num_shards=2, fetch_concurrency=2,
        sitemap_seeds=True,
    )
    gold = run_oracle(SM_CRAWL_CORPUS, num_shards=2, sitemap_seeds=True)
    eng = engine_rows(out_sm)
    assert len(eng) == len(gold["crawl_order"])
    for e, g in zip(eng, gold["crawl_order"]):
        assert (e["url"], e["fetch_ts"], e["status"], e["gen"]) == (
            g["url"], g["fetch_ts"], g["status"], g["gen"]
        )
    seen_eng = pq.read_table(
        os.path.join(out_sm, "seen.parquet")
    ).to_pylist()
    assert seen_eng == gold["seen"]

    # coverage: seeded crawl reaches a strict superset of 200-fetched
    # URLs vs the plain crawl on the same corpus
    out_plain = os.path.join(SM_CRAWL_OUT, "plain")
    shutil.rmtree(out_plain, ignore_errors=True)
    run_crawl(
        SM_CRAWL_CORPUS, out_plain, num_shards=2, fetch_concurrency=2
    )
    ok_sm = {r["url"] for r in eng if r["status"] == 200}
    ok_plain = {
        r["url"] for r in engine_rows(out_plain) if r["status"] == 200
    }
    assert ok_plain <= ok_sm
    assert len(ok_sm) > len(ok_plain), (
        "sitemap seeding discovered nothing new — workload lost its "
        "orphan pages"
    )
    # fresh (sitemap-only) URLs were attempted and 404-terminated
    tried = {r["url"] for r in eng}
    assert any("/fresh/" in u for u in tried)


def test_sitemap_seeded_stop_resume_byte_equal(ray_session):
    """A sitemap-seeded run stopped at a generation boundary and resumed
    (same sitemap_seeds topology) produces the identical crawl order as
    the uninterrupted seeded run — discovery composes with the
    checkpoint/resume contract."""
    import json
    import shutil

    import pyarrow.parquet as pq

    from spider_ray.pipelines.crawl import read_sink, run_crawl
    from spider_ray.sources.webgen import generate

    corpus = "/tmp/spider_ray_sm_resume_corpus"
    if not os.path.exists(os.path.join(corpus, "frontier_seed.parquet")):
        generate(corpus, n_pages=300, n_hosts=8, seed=47)

    def engine_rows(out_dir):
        import glob

        rows = []
        for d in sorted(
            glob.glob(os.path.join(out_dir, "gen=*")),
            key=lambda p: int(p.split("=")[1]),
        ):
            rows.extend(read_sink(d, "status.parquet").to_pylist())
        return rows

    base = "/tmp/spider_ray_sm_resume_out"
    shutil.rmtree(base, ignore_errors=True)
    full_out = os.path.join(base, "full")
    run_crawl(corpus, full_out, num_shards=2, fetch_concurrency=2,
              sitemap_seeds=True)
    part_out = os.path.join(base, "part")
    os.makedirs(part_out)
    with open(os.path.join(part_out, "control.json"), "w") as f:
        json.dump({"stop_after_gen": 1}, f)
    part = run_crawl(corpus, part_out, num_shards=2,
                     fetch_concurrency=2, sitemap_seeds=True)
    assert part["stopped_by_control"]
    run_crawl(corpus, part_out, num_shards=2, fetch_concurrency=2,
              resume=True, sitemap_seeds=True)
    a, b = engine_rows(full_out), engine_rows(part_out)
    assert a == b
    sa = pq.read_table(os.path.join(full_out, "seen.parquet")).to_pylist()
    sb = pq.read_table(os.path.join(part_out, "seen.parquet")).to_pylist()
    assert sa == sb
