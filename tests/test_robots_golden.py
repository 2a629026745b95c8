"""Golden robots-level cases ported from the reference's operator-level
diff test (control/robots/robots_parser_mapper_test.sh:14-120 over
test/samples.test): four robots bodies × thirteen URLs × three spider
policies, with the exact expected levels and fetchability the reference
asserts."""

from spider_ray.kernels.robots import is_fetchable, parse_robots, robots_level

ZHIDAO = (
    "User-agent: Baiduspider/gc\nDisallow: /w?\nAllow: /\n\n"
    "User-agent: Googlebot\nAllow: /\n\n"
    "User-agent: MSNBot\nAllow: /\n\n"
    "User-agent: *\nDisallow: /\n"
)

BAIDU = (
    "User-agent: Baiduspider/gc\r\nDisallow: /baidu\r\nDisallow: /s?\r\n\r\n"
    "User-agent: Googlebot\r\nDisallow: /baidu\r\nDisallow: /s?\r\n"
    "Disallow: /shifen/\r\nDisallow: /homepage/\r\nDisallow: /cpro\r\n\r\n"
    "User-agent: *\r\nDisallow: /\r\n"
)

XX_EMPTY = ""  # robots fetched but empty → allow everything

YY_DENY_ALL = "User-agent: *\r\nDisallow: /\r\n"

# (groups, path, expected level); levels: 0 disallow / 1 no-robots /
# 2 others-allowed-not-us / 3 allow — the samples.test expectations
CASES = [
    (parse_robots(ZHIDAO), "/", 2),                      # a, b
    (parse_robots(ZHIDAO), "/question/473777148.html", 2),  # c
    (parse_robots(BAIDU), "/", 2),                       # d, e
    (parse_robots(BAIDU), "/baidu?wd=q", 0),             # f
    (parse_robots(XX_EMPTY), "/", 3),                    # g
    (parse_robots(XX_EMPTY), "/file/", 3),               # h
    (parse_robots(YY_DENY_ALL), "/", 0),                 # i, j
    (parse_robots(YY_DENY_ALL), "/file/", 0),            # k
    (None, "/", 1),                                      # l (no robots row)
    (None, "/file", 1),                                  # m
]


def test_golden_levels():
    for groups, path, expected in CASES:
        assert robots_level(groups, path) == expected, (path, expected)


def test_spider_policies_match_reference():
    """can-fetch sets per spider type, as the reference test asserts:
    own-UA-only ('360Spider') fetches levels {1,3}; general passes
    {1,2,3}; rush ignores robots entirely."""
    levels = [robots_level(g, p) for g, p, _ in CASES]
    own = [is_fetchable(l, "own") for l in levels]
    gen = [is_fetchable(l, "general") for l in levels]
    rush = [is_fetchable(l, "rush") for l in levels]
    assert own == [l in (1, 3) for l in levels]
    assert gen == [l in (1, 2, 3) for l in levels]
    assert all(rush)
    # spot-check the reference's explicit outputs:
    # 360Spider can fetch xx (allow) and zz (no robots), not zhidao (2)
    assert is_fetchable(3, "own") and is_fetchable(1, "own")
    assert not is_fetchable(2, "own") and not is_fetchable(0, "own")
    # GeneralSpider additionally fetches level-2 hosts
    assert is_fetchable(2, "general") and not is_fetchable(0, "general")
    # RushSpider fetches even disallowed URLs
    assert is_fetchable(0, "rush")


def test_crawl_delay_parsing_and_precedence():
    """Crawl-delay attaches to its UA group; the best-matching group's
    delay wins with no fallback once a specific group matches; invalid
    values are ignored."""
    from spider_ray.kernels.robots import crawl_delay_for, parse_robots

    g = parse_robots(
        "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"
        "User-agent: spiderbot\nAllow: /\nCrawl-delay: 7\n"
    )
    assert crawl_delay_for(g, "spiderbot") == 7.0
    assert crawl_delay_for(g, "otherbot") == 2.0
    # specific group without a delay shadows the * group's delay
    g2 = parse_robots(
        "User-agent: *\nCrawl-delay: 2\n"
        "User-agent: spiderbot\nAllow: /\n"
    )
    assert crawl_delay_for(g2, "spiderbot") is None
    # invalid / non-positive values ignored; no group → no delay
    g3 = parse_robots("User-agent: *\nCrawl-delay: nope\n")
    assert crawl_delay_for(g3, "spiderbot") is None
    g4 = parse_robots("Crawl-delay: 4\n")
    assert crawl_delay_for(g4, "spiderbot") is None


def test_apply_crawl_delays_caps_budgets():
    """1/delay caps an existing row's qps, never raises one, and adds a
    default-budget row for hosts with no explicit budget."""
    from spider_ray.kernels.robots import parse_robots
    from spider_ray.state.load_controller import (
        LoadController,
        apply_crawl_delays,
    )

    robots = {
        "slow.example.com": parse_robots(
            "User-agent: *\nAllow: /\nCrawl-delay: 2\n"
        ),
        "capped.example.com": parse_robots(
            "User-agent: *\nAllow: /\nCrawl-delay: 10\n"
        ),
        "already-slower.example.com": parse_robots(
            "User-agent: *\nAllow: /\nCrawl-delay: 100\n"
        ),
        "plain.example.com": parse_robots("User-agent: *\nAllow: /\n"),
    }
    rows = [
        ("*", 5, 3.0, ""),
        ("capped.example.com", 10, 40.0, ""),
        ("already-slower.example.com", 1, 0.001, ""),
    ]
    out = apply_crawl_delays(rows, robots)
    lc = LoadController.from_table(out)
    assert lc._find_record("slow.example.com", 0).max_qps == 0.5
    assert lc._find_record("capped.example.com", 0).max_qps == 0.1
    # an operator budget ALREADY below 1/delay is untouched
    assert lc._find_record("already-slower.example.com", 0).max_qps == 0.001
    assert lc._find_record("plain.example.com", 0).max_qps == 3.0
    # default row preserved
    assert lc._find_record("unknown.example.com", 0).max_qps == 3.0


def test_crawl_delay_spacing_end_to_end(ray_session, tmp_path):
    """On a corpus whose host 4 declares Crawl-delay: 2, the oracle's
    successive completed fetches on that host are spaced ≥ the capped
    interval, and the engine reproduces the oracle order exactly (the
    shared-derivation parity)."""
    from spider_ray.pipelines.oracle import run_oracle
    from spider_ray.sources.webgen import generate

    corpus = str(tmp_path / "cd_corpus")
    generate(corpus, n_pages=300, n_hosts=8, seed=5)
    import pyarrow.parquet as pq

    robots = {
        r["host"]: r["body"]
        for r in pq.read_table(corpus + "/robots.parquet").to_pylist()
    }
    slow = [h for h, b in robots.items() if "Crawl-delay" in b]
    assert len(slow) == 1
    gold = run_oracle(corpus, num_shards=2)
    ts = sorted(
        r["fetch_ts"] for r in gold["crawl_order"] if r["host"] == slow[0]
    )
    from spider_ray.state.load_controller import LoadOptions

    opt = LoadOptions()
    cf = opt.check_frequency
    assert len(ts) >= cf + 1, "throttled host too small to hit the QPS gate"
    # the politeness guarantee is WINDOWED: each check_frequency-sized
    # window of fetch starts spans ≥ cf / qps s (qps capped to 1/2 by
    # the Crawl-delay); completions trail starts by ≤ 200 ms latency
    min_window_us = int(cf / 0.5 * 1_000_000) - 250_000
    for i in range(0, len(ts) - cf, cf):
        assert ts[i + cf] - ts[i] >= min_window_us
