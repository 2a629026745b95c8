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
