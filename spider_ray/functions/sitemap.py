"""Sitemap-driven seed discovery — the crawl-frontier input the
reference's robots machinery exposes but its batch jobs never mined:
``Sitemap:`` directives are first-class robots.txt syntax in the
reference's parser (control/robots/robotexclusionrulesparser.py:120
``_directive_regex`` includes ``sitemap``; :584 category 5 collects the
URLs), and the sitemaps protocol (sitemaps.org, GYM2008) defines the
two document shapes handled here: ``<urlset>`` leaves and 2-level
``<sitemapindex>`` indirection.

:func:`q_sitemap_seeds` runs the full discovery chain, distributed:

1. robots scan — regex-extract every ``Sitemap:`` URL per host (one
   streamed ``map_batches`` over the robots table; compiled regex,
   vectorized via polars ``str.extract_all``);
2. fetch join — hash-join the declared URLs against the sitemaps store
   (the partition-cogroup ``dedup._hash_join``; in production this is
   the fetch pool, batch-side it is the already-crawled sitemap store);
3. index expansion — bodies containing ``<sitemapindex`` explode into
   child sitemap URLs and take a second hash-join round (bounded depth
   2, per the protocol's "no nested index" rule);
4. loc extraction — ``<loc>`` entries from every leaf urlset →
   distinct (host, url) candidates;
5. novelty flag — LEFT hash-join against web_graph's URL column (one
   row per known page): ``known=1`` candidates are recrawl hints,
   ``known=0`` rows are NEW frontier seeds the crawler has never seen —
   the discovery payoff.

Every step is a streamed pass or a partition-cogroup shuffle; the
driver never holds the candidate set. XML handling is anchored-regex
extraction, the standard treatment for machine-generated sitemap files
(full XML parsing buys nothing on ``<loc>`` extraction and costs a
per-row parser instantiation).
"""

from __future__ import annotations

import os

import polars as pl
import pyarrow as pa
import ray

from spider_ray.functions.dedup import _hash_join
from spider_ray.pipelines.relational import _concat, _sorted

_SM_DECL = r"(?i)sitemap:[ \t]*(\S+)"
_LOC = r"<loc>([^<]+)</loc>"


def _extract_list(ds: ray.data.Dataset, src: str, pat: str, key: str,
                  out: str, schema: pa.Schema) -> ray.data.Dataset:
    """One streamed pass: per row of ``ds``, regex-extract ALL matches of
    ``pat`` from column ``src`` and explode to (key, out) rows."""

    def f(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .select(
                pl.col(key),
                pl.col(src).str.extract_all(pat).alias(out),
            )
            .explode(out)
            .drop_nulls(out)
            .with_columns(pl.col(out).str.extract(pat, 1))
            .to_arrow()
            .cast(schema)
        )

    return ds.map_batches(f, batch_format="pyarrow")


def sitemap_candidates(corpus: str) -> pa.Table:
    """Stages 1-4 of the discovery chain: distinct (host, url) seed
    candidates from robots-declared sitemaps, sorted by (host, url) —
    the deterministic order the crawl engine appends them to the seed
    frontier (``run_crawl(sitemap_seeds=True)``)."""
    robots = ray.data.read_parquet(
        os.path.join(corpus, "robots.parquet"), columns=["host", "body"]
    )
    sitemaps = ray.data.read_parquet(
        os.path.join(corpus, "sitemaps.parquet"), columns=["url", "body"]
    )
    hs = pa.schema([("host", pa.string()), ("sm_url", pa.string())])

    # 1. robots scan → declared (host, sm_url)
    decls = _extract_list(robots, "body", _SM_DECL, "host", "sm_url", hs)

    sm_schema = pa.schema([("url", pa.string()), ("body", pa.string())])

    # 2. fetch join → (host, sm_url, body)
    fetched = _hash_join(
        decls, sitemaps, on="sm_url", right_on="url",
        left_schema=hs, right_schema=sm_schema,
    )

    leaf_schema = pa.schema([("host", pa.string()), ("body", pa.string())])

    def leaves_only(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .filter(~pl.col("body").str.contains("<sitemapindex"))
            .select(["host", "body"])
            .to_arrow()
            .cast(leaf_schema)
        )

    def index_only(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .filter(pl.col("body").str.contains("<sitemapindex"))
            .select(["host", "body"])
            .to_arrow()
            .cast(leaf_schema)
        )

    direct = fetched.map_batches(leaves_only, batch_format="pyarrow")

    # 3. index expansion: children of <sitemapindex> bodies → 2nd join
    children = _extract_list(
        fetched.map_batches(index_only, batch_format="pyarrow"),
        "body", _LOC, "host", "sm_url", hs,
    )
    child_fetched = _hash_join(
        children, sitemaps, on="sm_url", right_on="url",
        left_schema=hs, right_schema=sm_schema,
    ).map_batches(leaves_only, batch_format="pyarrow")

    all_leaves = direct.union(child_fetched)

    # 4. <loc> extraction → distinct (host, url)
    cand_schema = pa.schema([("host", pa.string()), ("url", pa.string())])
    cands = (
        _extract_list(all_leaves, "body", _LOC, "host", "url", cand_schema)
        .groupby(["host", "url"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )
    return _sorted(_concat(cands, schema=cand_schema), ["host", "url"])


def q_sitemap_seeds(corpus: str) -> pa.Table:
    """Discover frontier seed candidates from robots-declared sitemaps
    (see module docstring for the 5-stage distributed chain). Output one
    row per distinct (host, url) candidate with ``known`` = 1 iff the
    URL already exists in web_graph — ``known=0`` rows are the new
    seeds."""
    cand_schema = pa.schema([("host", pa.string()), ("url", pa.string())])
    cands = ray.data.from_arrow(sitemap_candidates(corpus))

    # 5. novelty flag: LEFT join against web_graph's (unique) URL column
    wg = ray.data.read_parquet(
        os.path.join(corpus, "web_graph.parquet"), columns=["url"]
    )

    def tag(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "url": t["url"].cast(pa.string()),
                "known": pa.array([1] * n, pa.int32()),
            }
        )

    flagged = _hash_join(
        cands, wg.map_batches(tag, batch_format="pyarrow"),
        on="url", right_on="url",
        left_schema=cand_schema,
        right_schema=pa.schema([("url", pa.string()), ("known", pa.int32())]),
        how="left",
    )

    def fill(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .with_columns(known=pl.col("known").fill_null(0).cast(pl.Int32))
            .to_arrow()
            .cast(
                pa.schema(
                    [
                        ("host", pa.string()),
                        ("url", pa.string()),
                        ("known", pa.int32()),
                    ]
                )
            )
        )

    return _sorted(
        _concat(flagged.map_batches(fill, batch_format="pyarrow")),
        ["host", "url"],
    )


def augment_seeds(seeds: pa.Table, cand_urls: list[str]) -> pa.Table:
    """Append sitemap-discovered URLs to a frontier_seed table (engine
    and oracle share this mechanical step; each side supplies its OWN
    independently-discovered ``cand_urls``, already in deterministic
    (host, url) order). URLs textually present in the seed list are
    skipped; appended rows carry the standard seed metadata (depth 0,
    priority 5, empty referer) and the downstream canonicalize+seen
    pass dedups any remaining aliases exactly like organic seeds."""
    existing = set(seeds["url"].to_pylist())
    add = [u for u in cand_urls if u not in existing]
    if not add:
        return seeds
    n = len(add)
    extra = pa.table(
        {
            "url": pa.array(add, pa.string()),
            "resource_type": pa.array([1] * n),
            "importance": pa.array([0.5] * n, pa.float64()),
            "priority": pa.array([5] * n),
            "depth": pa.array([0] * n),
            "referer": pa.array([""] * n, pa.string()),
        }
    ).select(seeds.column_names)
    return pa.concat_tables([seeds, extra.cast(seeds.schema)])
