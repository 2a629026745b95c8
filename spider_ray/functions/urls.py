"""URL-operator queries runnable over the sf tables: canonicalization with a
SQL-checkable construction, host splitting, seeded deterministic shuffle.
"""

from __future__ import annotations

import pyarrow as pa

from spider_ray.kernels.hashing import derive, hash64, mix64_int
from spider_ray.kernels.hosts import split_host
from spider_ray.kernels.urlnorm import canonicalize_parts, canonicalize_vector
from spider_ray.pipelines.relational import _concat, _sorted
from spider_ray.sources.tables import read_table


def q_url_canonicalize(sf_dir: str) -> pa.Table:
    """M1 over constructed dirty URLs: for each document build
    ``HTTP://<SOURCE upper>.EXAMPLE.COM:80/Docs/../docs/<id>?b=2&a=1#frag``
    and canonicalize. The expected canonical form is constructible in SQL,
    so this is an oracle-checked canonicalization test at driver level."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        raw = [
            f"HTTP://{s.upper()}.EXAMPLE.COM:80/Docs/../docs/{i}?b=2&a=1#frag"
            for i, s in zip(ids, batch["source"].to_pylist())
        ]
        canon = canonicalize_vector(raw)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "url": pa.array(canon, pa.string()),
            }
        )

    return _sorted(_concat(ds.map_batches(build, batch_format="pyarrow")), "doc_id")


def q_url_parts(sf_dir: str) -> pa.Table:
    """M1/M6 component extraction over a 6-class dirty-URL family (one
    class per ``doc_id % 6``): canonicalize_parts returns canon + host +
    path + query in one fused pass, and every class has a closed-form
    expected value the DuckDB oracle reconstructs — including class 2
    (non-digit port), the parity-bug regression class the 2026-08-18
    anchored-regex rewrite fixed: canon/host/path/query all NULL."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        srcs = batch["source"].to_pylist()
        raw = []
        for i, s in zip(ids, srcs):
            k = i % 6
            if k == 0:
                raw.append(f"HTTP://{s.upper()}.EXAMPLE.COM:80/docs/{i}?b=2&a=1#f")
            elif k == 1:
                raw.append(f"https://{s}.example.com:443/%7Euser/{i}")
            elif k == 2:
                raw.append(f"http://{s}.example.com:80x/{i}")  # reject: bad port
            elif k == 3:
                raw.append(f"{s}.example.com/p/{i}")  # schemeless
            elif k == 4:
                raw.append(f"http://{s}.example.com/a/./b/../{i}?one=1")
            else:
                raw.append(f"  http://{s}.example.com/{i}#frag ")
        parts = canonicalize_parts(raw)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "url": pa.array(parts["canon"].to_list(), pa.string()),
                "host": pa.array(parts["host"].to_list(), pa.string()),
                "path": pa.array(parts["path"].to_list(), pa.string()),
                "query": pa.array(parts["query"].to_list(), pa.string()),
            }
        )

    return _sorted(_concat(ds.map_batches(build, batch_format="pyarrow")), "doc_id")


def q_host_split(sf_dir: str) -> pa.Table:
    """M6 host→(suffix, registered domain, subdomain) over constructed
    hosts; SQL-expressible because the construction fixes the shape."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "lang"])

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        hosts = [
            f"{l}.{s}.example.org"
            for s, l in zip(batch["source"].to_pylist(), batch["lang"].to_pylist())
        ]
        sp = [split_host(h) for h in hosts]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "host": pa.array(hosts, pa.string()),
                "suffix": pa.array([s[0] for s in sp], pa.string()),
                "domain": pa.array([s[1] for s in sp], pa.string()),
                "subdomain": pa.array([s[2] for s in sp], pa.string()),
            }
        )

    return _sorted(_concat(ds.map_batches(build, batch_format="pyarrow")), "doc_id")


def q_seeded_shuffle(sf_dir: str) -> pa.Table:
    """O4 deterministic shuffle: order rows by a frozen seeded interleave
    key (the reference shuffles per-thread URL lists with rand(),
    fetcher_thread.cc:574-577; we freeze the seam per FIXTURES §9 — sort by
    a hash-derived key). Uses :func:`mix64_int` so the DuckDB oracle can
    reproduce the exact permutation with HUGEINT modular arithmetic —
    the shuffle itself is independently verifiable, not just row-stable."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def keyed(batch: pa.Table) -> pa.Table:
        ids = pa.compute.cast(batch["doc_id"], pa.int64())
        k = mix64_int(ids.to_numpy(zero_copy_only=False), seed=4242)
        return pa.table(
            {"doc_id": ids, "shuffle_key": pa.array(k, pa.uint64())}
        )

    t = _concat(ds.map_batches(keyed, batch_format="pyarrow"))
    t = t.sort_by(
        [("shuffle_key", "ascending"), ("doc_id", "ascending")]
    )
    return t.append_column(
        "position", pa.array(range(t.num_rows), pa.int64())
    )


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()


def q_ip_url_split(sf_dir: str) -> pa.Table:
    """IP-level hot diversion valve (J4, ip_url_split.cc:21,85-97): per-IP
    URL counts → IPs above the relative threshold divert to the PROXY
    partition. The synthetic host→IP map is deliberately skewed (ip index =
    floor(sqrt(host rank)), so one IP serves 7 hosts) to force a non-trivial
    split at every scale; the DuckDB oracle reproduces map, counts,
    threshold and routing exactly."""
    import math

    from spider_ray.stages.iproute import ip_url_split

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    hosts = sorted(
        {f"{s.lower()}.example.com" for s in docs.unique("source")}
    )  # rank over sorted hosts — the oracle ranks identically
    host_ips = {
        h: [f"10.0.0.{int(math.isqrt(r))}"] for r, h in enumerate(hosts)
    }

    def mk_urls(batch: pa.Table) -> pa.Table:
        urls = [
            f"http://{s.lower()}.example.com/docs/{d}?a=1&b=2"
            for d, s in zip(
                batch["doc_id"].to_pylist(), batch["source"].to_pylist()
            )
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "url": pa.array(urls, pa.string()),
            }
        )

    tagged = ip_url_split(
        docs.map_batches(mk_urls, batch_format="pyarrow"), host_ips
    )

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "ip", "route"])

    return _sorted(
        _concat(tagged.map_batches(project, batch_format="pyarrow")),
        "doc_id",
    )


# --------------------------------------------------------------------------
# crawler-trap detection
# --------------------------------------------------------------------------

TRAP_HOST_MOD = 50  # synthetic workload: 50 hosts
TRAP_MAX_DEPTH = 8  # a host whose deepest URL reaches this is a trap
# query-ratio rule: 4 * n_query >= 3 * n_urls (75%+ parameterized URLs)
TRAP_Q_NUM, TRAP_Q_DEN = 4, 3


def q_trap_hosts(sf_dir: str) -> pa.Table:
    """Crawler-trap detection: per-host URL-shape statistics that flag
    hosts whose URL space is exploding — the signal a frontier scheduler
    uses to throttle calendar/session-id/infinite-path traps before they
    eat the crawl budget (the batch analog of the reference's per-host
    load/depth guards: M3 depth caps + M9's depth≤2 emission policy).

    Deterministic URL workload synthesized per event row (construction
    replicated verbatim in the SQL oracle, the q_url_canonicalize
    pattern), then ANALYZED as strings with the real kernels: host via
    regex, path depth via '/'-counting, parameterization via '?'
    detection. Per-host aggregate: n_urls / n_query / max_depth, trap =
    75%+ parameterized OR max_depth ≥ TRAP_MAX_DEPTH — all integer
    arithmetic. Per-block polars partials (bounded by hosts-per-block)
    → native distributed groupby merge; output O(hosts), sorted."""
    import polars as pl
    import ray

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id"])
    seg = {i: "s/" * i for i in range(11)}
    # host-correlated workload (otherwise every host's max depth
    # saturates and the flag is degenerate): hosts ≡0 (mod 7) grow deep
    # calendar-style paths; hosts ≡1 (mod 5) parameterize ~3/4 of their
    # URLs (session-id trap); everything else stays shallow

    def build_and_parse(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(
            hid=pl.col("user_id") % TRAP_HOST_MOD,
        ).with_columns(
            url=(
                pl.lit("http://h")
                + pl.col("hid").cast(pl.String)
                + pl.lit(".example/")
                + pl.when(pl.col("hid") % 7 == 0)
                .then(pl.col("event_id") % 11)
                .otherwise(pl.col("event_id") % 4)
                .replace_strict(seg, return_dtype=pl.String)
                + pl.lit("p")
                + pl.when(
                    (pl.col("event_id") % 3 == 0)
                    | (
                        (pl.col("hid") % 5 == 1)
                        & (pl.col("event_id") % 4 != 3)
                    )
                )
                .then(
                    pl.lit("?sid=")
                    + (pl.col("event_id") % 7).cast(pl.String)
                )
                .otherwise(pl.lit(""))
            )
        )
        # analysis uses only the STRING — the workload columns never
        # leak into the statistics
        parsed = df.select(
            host=pl.col("url").str.extract(r"^https?://([^/?]+)", 1),
            depth=pl.col("url")
            .str.count_matches("/", literal=True)
            .cast(pl.Int64)
            - 2,
            has_q=pl.col("url")
            .str.contains("?", literal=True)
            .cast(pl.Int64),
        )
        part = parsed.group_by("host").agg(
            n_urls=pl.len().cast(pl.Int64),
            n_query=pl.col("has_q").sum(),
            max_depth=pl.col("depth").max(),
        )
        return part.to_arrow()

    parts = ds.map_batches(build_and_parse, batch_format="pyarrow")
    merged = parts.groupby("host").aggregate(
        ray.data.aggregate.Sum("n_urls", alias_name="n_urls"),
        ray.data.aggregate.Sum("n_query", alias_name="n_query"),
        ray.data.aggregate.Max("max_depth", alias_name="max_depth"),
    )

    def flag(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).with_columns(
            trap=(
                (
                    TRAP_Q_NUM * pl.col("n_query")
                    >= TRAP_Q_DEN * pl.col("n_urls")
                )
                | (pl.col("max_depth") >= TRAP_MAX_DEPTH)
            ).cast(pl.Int32)
        )
        return df.to_arrow().cast(
            pa.schema(
                [
                    ("host", pa.string()),
                    ("n_urls", pa.int64()),
                    ("n_query", pa.int64()),
                    ("max_depth", pa.int64()),
                    ("trap", pa.int32()),
                ]
            )
        )

    return _sorted(
        _concat(merged.map_batches(flag, batch_format="pyarrow")), "host"
    )
