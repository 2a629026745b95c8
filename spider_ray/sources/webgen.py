"""Deterministic synthetic web corpus generator (FIXTURES.md §2-§6).

Generates, under a target directory, the parquet tables the crawl engine and
its oracle consume:

* ``web_graph``  — one row per page URL: host, status_code, redirect_to,
  outlinks (list<struct<url,anchor>>), image_refs (list<struct<image_id,alt>>),
  latency_us;
* ``images``     — the image store: (image_id, bytes, w, h, fmt, caption,
  phash) per BASELINE.json input_hint; bytes are real PNG / qimg encodings;
* ``robots``     — (host, body) with all four robots_level classes, each
  robots-bearing host declaring ``Sitemap:`` (GYM2008 directive);
* ``sitemaps``   — (url, body): per-host urlset XML (every 3rd page +
  fresh URLs absent from web_graph); host 0 gets a 2-level sitemapindex;
* ``host_ip``    — (host, ips list, ≥2 for some hosts);
* ``host_load``  — (key, max_connections, max_qps, window) politeness budget;
* ``frontier_seed`` — TaskItem-analog seed list.

Host population is Zipf-ish with one "big-family" hot host holding ~30% of
pages (skew valve analog: ``ip_url_split.cc:21``, ``data_prepare.cc:86-96``).
All choices are pure functions of ``(seed, index)`` via the frozen hash
kernel, so the corpus is identical across runs and scales smoothly.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from spider_ray.kernels.hashing import derive, hash64_one
from spider_ray.kernels.imaging import decode_image, encode_image, phash64

WORDS = (
    "ocean copper lantern meadow quartz ribbon saffron timber velvet walnut "
    "amber basil cedar dahlia ember fennel ginger hazel iris juniper"
).split()


def _words(h: int, n: int, salt: int) -> str:
    return " ".join(
        WORDS[derive(h, salt * 1000 + i) % len(WORDS)] for i in range(n)
    )


def _make_image(h: int) -> tuple[bytes, int, int, str, int]:
    """Deterministic small image: smooth gradient + seeded texture."""
    w = 16 + derive(h, 1) % 33  # 16..48
    ht = 16 + derive(h, 2) % 33
    rng = np.random.RandomState(derive(h, 3) % (2**31))
    yy, xx = np.mgrid[0:ht, 0:w]
    base = (
        (xx * (derive(h, 4) % 7 + 1) + yy * (derive(h, 5) % 5 + 1)) % 256
    ).astype(np.float64)
    img = np.stack(
        [
            (base + rng.randint(0, 40, (ht, w))) % 256,
            (base * 0.7 + rng.randint(0, 40, (ht, w))) % 256,
            (base * 0.4 + rng.randint(0, 40, (ht, w))) % 256,
        ],
        axis=2,
    ).astype(np.uint8)
    fmt = "png" if derive(h, 6) % 2 == 0 else "jpeg"  # jpeg = qimg codec
    data = encode_image(img, fmt)
    # phash of the *decoded* stored bytes (what a verifier reproduces)
    ph = phash64(decode_image(data, fmt))
    return data, w, ht, fmt, ph


def render_html(
    url: str, host: str, outlinks: list[dict], image_refs: list[dict]
) -> str:
    """Deterministic HTML rendering of one web_graph row — the "real
    bytes" the parse-mode crawl and ``q_html_outlinks`` consume. Pure
    function of the row, so ``extract_links(render_html(row)) == row`` is
    the round-trip invariant the SQL oracles check. Deliberate parse
    hazards baked in: same-host links rendered RELATIVE (urljoin must
    reconstruct), the first outlink rendered twice (first-wins dedup),
    fragment-only / mailto: / javascript: boilerplate anchors, and one
    oversized (>kMaxLinkSize) URL — all of which the extractor must drop
    to reproduce the table."""
    seq = url.rsplit("/", 1)[1]
    title = f"{host} - page {seq}"
    prefix = f"http://{host}"
    lines = [
        "<!doctype html>",
        "<html><head>",
        '<meta charset="utf-8">',
        f"<title>{title}</title>",
        '<link rel="stylesheet" href="/static/site.css">',
        # page-family stylesheet: many pages share one of 4 variants, so
        # the css-enrichment join has real dedup-fetch structure (each
        # css fetched once, merged back into every referencing page)
        f'<link rel="stylesheet" href="/static/v{int(seq) % 4}.css">',
        "</head><body>",
        f"<h1>{title}</h1>",
        '<a href="#top">back to top</a>',
        f'<a href="mailto:admin@{host}">contact</a>',
        '<a href="javascript:void(0)">menu</a>',
        f'<a href="{prefix}/x/{"q" * 4200}">oversized</a>',
    ]
    for k, ol in enumerate(outlinks):
        tu = ol["url"]
        href = tu[len(prefix):] if tu.startswith(prefix + "/") else tu
        lines.append(f'<p><a href="{href}">{ol["anchor"]}</a></p>')
        if k == 0:
            lines.append(f'<a href="{href}">duplicate of first</a>')
    for ref in image_refs:
        lines.append(f'<img src="{ref["image_id"]}" alt="{ref["alt"]}">')
    lines.append("</body></html>")
    return "\n".join(lines)


def generate(
    out_dir: str,
    n_pages: int = 800,
    n_hosts: int = 12,
    seed: int = 42,
    images_per_page: int = 2,
    outlinks_per_page: int = 8,
    html_bodies: bool = False,
) -> dict[str, str]:
    """Write all tables; returns {table: path}. Deterministic in all args.
    ``html_bodies=True`` additionally writes ``html_pages.parquet``
    (url, body:binary) — :func:`render_html` over every page — for the
    crawl loop's opt-in ``parse_html`` mode."""
    os.makedirs(out_dir, exist_ok=True)
    base = hash64_one(f"webgen-{seed}")

    hosts = [f"site{i}.example.com" for i in range(n_hosts)]
    hot = "bigfamily.example.com"
    hosts[0] = hot

    # page → host: ~30% to the hot host, rest Zipf-ish over the others
    page_host = []
    for p in range(n_pages):
        r = derive(base, 10 + p) % 100
        if r < 30:
            page_host.append(hot)
        else:
            # harmonic-ish decay over remaining hosts
            z = derive(base, 20 + p) % 1000
            idx = 1 + int((z / 1000.0) ** 2 * (n_hosts - 1))
            page_host.append(hosts[min(idx, n_hosts - 1)])

    urls = [f"http://{page_host[p]}/p/{p}" for p in range(n_pages)]
    host_pages: dict[str, list[int]] = {}
    for p, hname in enumerate(page_host):
        host_pages.setdefault(hname, []).append(p)

    # images: one pool, referenced (and sometimes shared) by pages
    n_images = max(n_pages // 2, 8)
    image_ids = [
        f"http://img{derive(base, 30 + i) % n_hosts}.example.com/i/{i}"
        for i in range(n_images)
    ]
    img_rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": [],
                "caption": [], "phash": []}
    for i, iid in enumerate(image_ids):
        h = hash64_one(iid)
        data, w, ht, fmt, ph = _make_image(h)
        img_rows["image_id"].append(iid)
        img_rows["bytes"].append(data)
        img_rows["w"].append(w)
        img_rows["h"].append(ht)
        img_rows["fmt"].append(fmt)
        img_rows["caption"].append(_words(h, 4 + derive(h, 7) % 5, 1))
        img_rows["phash"].append(np.int64(np.uint64(ph).astype(np.int64)))

    # web graph rows
    wg = {
        "url": [], "host": [], "status_code": [], "redirect_to": [],
        "outlinks": [], "image_refs": [], "latency_us": [],
    }
    for p, url in enumerate(urls):
        h = hash64_one(url)
        r = derive(h, 40) % 100
        if r < 88:
            status = 200
        elif r < 92:
            status = 404
        elif r < 95:
            status = 500
        elif r < 98:
            status = 301
        else:
            status = -1  # timeout / network error
        redirect_to = None
        if status == 301:
            redirect_to = urls[derive(h, 41) % n_pages]
        n_out = max(2, outlinks_per_page + int(derive(h, 42) % 5) - 2)
        outlinks = []
        seen_out = set()
        for k in range(n_out):
            # 70% same-host, 30% cross-host targets
            if derive(h, 50 + k) % 10 < 7:
                cands = host_pages[page_host[p]]
                tgt = cands[derive(h, 60 + k) % len(cands)]
            else:
                tgt = derive(h, 60 + k) % n_pages
            tu = urls[tgt]
            if tu in seen_out:
                continue
            seen_out.add(tu)
            outlinks.append(
                {"url": tu, "anchor": _words(derive(h, 70 + k), 3, 2)}
            )
        n_img = 1 + derive(h, 80) % images_per_page
        image_refs = []
        for k in range(n_img):
            idx = derive(h, 90 + k) % n_images
            image_refs.append(
                {"image_id": image_ids[idx], "alt": img_rows["caption"][idx]}
            )
        wg["url"].append(url)
        wg["host"].append(page_host[p])
        wg["status_code"].append(status)
        wg["redirect_to"].append(redirect_to)
        wg["outlinks"].append(outlinks)
        wg["image_refs"].append(image_refs)
        wg["latency_us"].append(10_000 + derive(h, 99) % 190_000)  # 10-200 ms

    # robots: host 1 = disallow /p/ for us only (level 2 via majors),
    # host 2 = disallow all (level 0), host 3 = no robots (level 1), others allow
    robots_rows = {"host": [], "body": []}
    for i, host in enumerate(hosts):
        if i == 3:
            continue  # no robots.txt
        if i == 1:
            body = (
                "User-agent: spiderbot\nDisallow: /p/\n"
                "User-agent: Baiduspider\nAllow:\n"
            )
        elif i == 2:
            body = "User-agent: *\nDisallow: /\n"
        else:
            body = "User-agent: *\nDisallow: /private/\nAllow: /p/**\n"
        if i == 4:
            # one host throttles via robots Crawl-delay (category-4
            # directive): politeness honors min(budget, 1/delay) qps
            body += "Crawl-delay: 2\n"
        # every robots-bearing host declares its sitemap (GYM2008
        # "Sitemap:" directive — the reference's robots parser accepts
        # it, robotexclusionrulesparser.py:120,584; ours ignores it for
        # rule purposes, so crawl semantics are unchanged)
        body += f"Sitemap: http://{host}/sitemap.xml\n"
        robots_rows["host"].append(host)
        robots_rows["body"].append(body)

    # sitemaps: one urlset per robots-bearing host listing every 3rd of
    # its pages PLUS 1-3 deterministic "fresh" URLs the web_graph does
    # not contain (the discovery value of sitemaps: pages the crawler
    # has not seen). Host 0 publishes a 2-level sitemap INDEX instead
    # (sitemapindex → two child urlsets) to exercise the nested fetch.
    host_pages: dict[str, list[str]] = {}
    for p, u in enumerate(urls):
        host_pages.setdefault(page_host[p], []).append(u)

    def _urlset(entries):
        return (
            '<?xml version="1.0" encoding="UTF-8"?>\n<urlset>'
            + "".join(f"<url><loc>{u}</loc></url>" for u in entries)
            + "</urlset>"
        )

    sm = {"url": [], "body": []}
    for i, host in enumerate(hosts):
        if i == 3:
            continue  # no robots → no declared sitemap
        pages = host_pages.get(host, [])
        listed = [u for k, u in enumerate(pages) if k % 3 == 0]
        hh = hash64_one(host)
        fresh = [
            f"http://{host}/fresh/{derive(hh, 300 + k) % 10_000}"
            for k in range(1 + derive(hh, 299) % 3)
        ]
        entries = listed + fresh
        top = f"http://{host}/sitemap.xml"
        if i == 0 and len(entries) > 1:
            mid = (len(entries) + 1) // 2
            kids = [f"http://{host}/sitemap-{j}.xml" for j in range(2)]
            sm["url"].append(top)
            sm["body"].append(
                '<?xml version="1.0" encoding="UTF-8"?>\n<sitemapindex>'
                + "".join(
                    f"<sitemap><loc>{k}</loc></sitemap>" for k in kids
                )
                + "</sitemapindex>"
            )
            for j, chunk in enumerate((entries[:mid], entries[mid:])):
                sm["url"].append(kids[j])
                sm["body"].append(_urlset(chunk))
        else:
            sm["url"].append(top)
            sm["body"].append(_urlset(entries))

    # DNS: 1-3 deterministic IPs per host
    hi = {"host": [], "ips": []}
    for host in hosts + [f"img{i}.example.com" for i in range(n_hosts)]:
        hh = hash64_one(host)
        n_ip = 1 + derive(hh, 1) % 3
        hi["host"].append(host)
        hi["ips"].append(
            [f"10.{derive(hh, 2+k) % 256}.{derive(hh, 5+k) % 256}.{1+k}"
             for k in range(n_ip)]
        )

    # politeness budgets: default 5 conn / 3 qps; hot host raised; one throttled
    hl = {
        "key": ["*", hot, hosts[-1]],
        "max_connections": [5, 10, 1],
        "max_qps": [3.0, 40.0, 1.0],
        "window": ["", "", ""],
    }

    # seeds: roots of every host (first page per host) + a few deep pages,
    # raw (non-canonical) forms to exercise M1
    seed_urls, seen_hosts = [], set()
    for p, url in enumerate(urls):
        if page_host[p] not in seen_hosts:
            seen_hosts.add(page_host[p])
            seed_urls.append(f"HTTP://{page_host[p].upper()}/p/{p}#frag")
    for k in range(5):
        seed_urls.append(urls[derive(base, 200 + k) % n_pages])
    fs = {
        "url": seed_urls,
        "resource_type": [1] * len(seed_urls),
        "importance": [0.5] * len(seed_urls),
        "priority": [5] * len(seed_urls),
        "depth": [0] * len(seed_urls),
        "referer": [""] * len(seed_urls),
    }

    paths = {}
    tables = {
        "web_graph": pa.table(
            {
                "url": pa.array(wg["url"], pa.string()),
                "host": pa.array(wg["host"], pa.string()),
                "status_code": pa.array(wg["status_code"], pa.int16()),
                "redirect_to": pa.array(wg["redirect_to"], pa.string()),
                "outlinks": pa.array(
                    wg["outlinks"],
                    pa.list_(pa.struct([("url", pa.string()), ("anchor", pa.string())])),
                ),
                "image_refs": pa.array(
                    wg["image_refs"],
                    pa.list_(pa.struct([("image_id", pa.string()), ("alt", pa.string())])),
                ),
                "latency_us": pa.array(wg["latency_us"], pa.int32()),
            }
        ),
        "images": pa.table(
            {
                "image_id": pa.array(img_rows["image_id"], pa.string()),
                "bytes": pa.array(img_rows["bytes"], pa.binary()),
                "w": pa.array(img_rows["w"], pa.int32()),
                "h": pa.array(img_rows["h"], pa.int32()),
                "fmt": pa.array(img_rows["fmt"], pa.string()),
                "caption": pa.array(img_rows["caption"], pa.string()),
                "phash": pa.array(img_rows["phash"], pa.int64()),
            }
        ),
        "robots": pa.table(robots_rows),
        "sitemaps": pa.table(
            {
                "url": pa.array(sm["url"], pa.string()),
                "body": pa.array(sm["body"], pa.string()),
            }
        ),
        "host_ip": pa.table(
            {"host": pa.array(hi["host"]), "ips": pa.array(hi["ips"], pa.list_(pa.string()))}
        ),
        "host_load": pa.table(hl),
        "frontier_seed": pa.table(fs),
    }
    # css store: one site-wide + four page-family stylesheets per host —
    # the sub-resource table the J5 css-enrichment join fetches from;
    # bodies are pure functions of the css url
    css_urls = [
        f"http://{h}/static/{name}.css"
        for h in hosts
        for name in ("site", "v0", "v1", "v2", "v3")
    ]
    tables_css = {
        "css_url": css_urls,
        "body": [
            f"/* {u} */ body {{ margin: {hash64_one(u) % 32}px; }} "
            f".c{hash64_one(u) % 97} {{ color: #{hash64_one(u) % 0xFFFFFF:06x}; }}"
            for u in css_urls
        ],
    }
    tables["css_files"] = pa.table(
        {
            "css_url": pa.array(tables_css["css_url"], pa.string()),
            "body": pa.array(
                [b.encode("utf-8") for b in tables_css["body"]], pa.binary()
            ),
        }
    )
    if html_bodies:
        tables["html_pages"] = pa.table(
            {
                "url": pa.array(wg["url"], pa.string()),
                "body": pa.array(
                    [
                        render_html(u, h, o, ir).encode("utf-8")
                        for u, h, o, ir in zip(
                            wg["url"], wg["host"], wg["outlinks"],
                            wg["image_refs"],
                        )
                    ],
                    pa.binary(),
                ),
            }
        )
    for name, t in tables.items():
        if name == "images":
            # the input_hint image store goes through the Lance seam
            # (lance when the wheel is present, parquet fallback); the
            # parquet twin is ALWAYS written because the DuckDB oracles
            # read the store directly and DuckDB has no lance reader
            from spider_ray.sources import lance_io

            p = lance_io.write_images(t, os.path.join(out_dir, "images"))
            if lance_io.HAVE_LANCE:  # pragma: no cover - wheel not here
                # twin must carry the SAME conformed schema as the lance
                # store, or wheel and fallback machines would disagree
                pq.write_table(
                    lance_io.conform_images(t),
                    os.path.join(out_dir, "images.parquet"),
                )
            paths[name] = p
            continue
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(t, p)
        paths[name] = p
    return paths
