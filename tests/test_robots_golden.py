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
