"""Dispatcher compress-control semantics (round 4): per-host PV quota,
sub-resource passthrough, backup queue for never-seen hosts."""

import polars as pl
import pyarrow.parquet as pq

from spider_ray.functions.dispatch import (
    MAX_ACCESS_THREADS,
    MIN_PV,
    SUB_MOD,
    q_compress_control,
)


def test_compress_control_rules(ray_session):
    import os

    from spider_ray.sources.webgen import generate

    corpus = "/tmp/spider_ray_phash_corpus"
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        generate(corpus, n_pages=2000, n_hosts=24, seed=42)
    out = pl.from_arrow(q_compress_control(corpus))
    wg = pl.from_arrow(
        pq.read_table(
            os.path.join(corpus, "web_graph.parquet"),
            columns=["url", "host"],
        )
    ).with_columns(seq=pl.col("url").str.extract(r"(\d+)$").cast(pl.Int64))

    # all three keep paths fire on this corpus
    reasons = set(out["reason"].unique())
    assert reasons == {"passthrough", "quota", "backup"}

    # every sub-resource row passes through, none throttled
    subs = wg.filter(pl.col("seq") % SUB_MOD == 0)
    got_subs = out.filter(pl.col("reason") == "passthrough")
    assert sorted(got_subs["url"]) == sorted(subs["url"])

    pv = (
        wg.filter(pl.col("seq") % 2 == 0)
        .group_by("host")
        .len()
        .rename({"len": "pv"})
    )
    joined = wg.join(pv, on="host", how="left").with_columns(
        pl.col("pv").fill_null(0)
    )
    for host, hpv in pv.rows():
        kept = out.filter(
            (pl.col("host") == host) & (pl.col("reason") == "quota")
        )
        html_n = joined.filter(
            (pl.col("host") == host) & (pl.col("seq") % SUB_MOD != 0)
        ).height
        if hpv >= MIN_PV:
            assert kept.height == min(
                max(1, hpv // MAX_ACCESS_THREADS), html_n
            )
        else:
            backup = out.filter(
                (pl.col("host") == host) & (pl.col("reason") == "backup")
            )
            assert kept.height == 0 and backup.height == html_n
    # throttling is real: fewer kept html rows than candidates overall
    n_html = wg.filter(pl.col("seq") % SUB_MOD != 0).height
    assert out.filter(pl.col("reason") == "quota").height < n_html


def test_site_uv_share_semantics(ray_session):
    """UV shares sum to ≤1000 milli (floor division), content ratio is
    the host's 200-status fraction, output sorted by UV rank."""
    import os

    import polars as pl
    import pyarrow.parquet as pq

    from spider_ray.functions.webgraph import q_site_uv_share

    corpus = "/tmp/spider_ray_phash_corpus"
    out = pl.from_arrow(q_site_uv_share(corpus))
    wg = pl.from_arrow(
        pq.read_table(
            os.path.join(corpus, "web_graph.parquet"),
            columns=["url", "host", "status_code"],
        )
    ).with_columns(seq=pl.col("url").str.extract(r"(\d+)$").cast(pl.Int64))
    total_uv = wg.filter(pl.col("seq") % 2 == 0).height
    assert out["uv"].sum() == total_uv
    assert out["uv_share_milli"].sum() <= 1000
    assert (out["uv"].to_list()) == sorted(out["uv"].to_list(), reverse=True)
    ref = (
        wg.group_by("host")
        .agg(
            pages=pl.len().cast(pl.Int64),
            content=(pl.col("status_code") == 200).sum().cast(pl.Int64),
        )
    )
    j = out.join(ref, on="host")
    assert (j["pages"] == j["pages_right"]).all() if "pages_right" in j.columns else (j["pages"] == ref.join(out, on="host")["pages"]).all()
    assert (
        j["content_share_milli"] == j["content"] * 1000 // j["pages"]
    ).all()


def test_crawl_eval_dataset_and_table_paths_agree(ray_session):
    """The Dataset (distributed semi-join) and Table (vectorized) status
    paths of q_crawl_eval are pinned equal."""
    import importlib.util
    import os

    import polars as pl
    import ray as _ray

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py",
        )
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from spider_ray.functions.webgraph import q_crawl_eval

    status = m._crawl_demo()["order"]
    corpus = m._demo_corpus()
    a = pl.from_arrow(q_crawl_eval(corpus, status))
    b = pl.from_arrow(q_crawl_eval(corpus, _ray.data.from_arrow(status)))
    assert a.equals(b)
    assert (a["crawled_ok"] <= a["topn_urls"]).all()
    # the demo corpus has fewer than 200 distinct link targets, so the
    # top-N list is capped by the in-degree table's size
    assert 0 < a["topn_urls"].sum() <= 200
