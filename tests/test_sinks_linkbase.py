"""S2 time-split sink, J6 linkbase merge, M11/M13/O7 rule kernels, J1 DNS."""

import os
import shutil

import pyarrow as pa
import pytest

from spider_ray.kernels.rules import (
    is_ajax_url,
    search_result_gate,
    tidy_url,
    transform_ajax_url,
)


def test_ajax_rewrite():
    assert not is_ajax_url("http://e.com/p")
    u = "http://e.com/p#!k=v"
    assert is_ajax_url(u)
    assert transform_ajax_url(u) == "http://e.com/p?_escaped_fragment_=k=v"
    u2 = "http://e.com/p?x=1#!s"
    assert transform_ajax_url(u2) == "http://e.com/p?x=1&_escaped_fragment_=s"
    assert transform_ajax_url("http://e.com/p") == "http://e.com/p"


def test_tidy_url():
    aliases = {"m.example.com": "www.example.com"}
    assert tidy_url("http://m.example.com/x?a=1", aliases) == (
        "http://www.example.com/x?a=1"
    )
    assert tidy_url("http://other.com/x", aliases) == "http://other.com/x"


def test_clean_seed_url():
    from spider_ray.kernels.rules import clean_seed_url

    assert clean_seed_url("http://a.com/x TEL:123-456") == "http://a.com/x"
    assert clean_seed_url("http://a.com/x QQ:88888") == "http://a.com/x"
    assert clean_seed_url("http://a.com/p??b") is None
    assert clean_seed_url("http://weibo.com/u/1") is None
    assert clean_seed_url("http://10.0.0.1/x") is None
    assert clean_seed_url("http://%61.com/") is None
    assert (
        clean_seed_url("http://www.google.com/url?url=http://t.com/p&sa=x")
        == "http://t.com/p"
    )
    assert clean_seed_url("http://www.google.com/url?sa=x") is None
    # seeds are raw (pre-canonicalization): redirect match is case-blind
    assert (
        clean_seed_url("HTTP://WWW.Google.COM/url?url=http://t.com/p")
        == "http://t.com/p"
    )
    assert clean_seed_url("http://normal.com/ok") == "http://normal.com/ok"


def test_search_result_gate():
    assert search_result_gate("http://normal.com/p?start=500")
    assert search_result_gate("http://www.google.com/search?q=x")
    assert search_result_gate("http://www.google.com/search?q=x&start=20")
    assert not search_result_gate("http://www.google.com/search?q=x&start=30")
    assert not search_result_gate("http://www.baidu.com/s?wd=x&pn=40")


def test_time_split_sink(ray_session, sf_small, tmp_path):
    import ray

    from spider_ray.stages.sinks import write_time_partitioned

    out = str(tmp_path / "events_sink")
    ds = ray.data.read_parquet(f"{sf_small}/events.parquet")
    parts = write_time_partitioned(ds, "ts", out, freq="1d")
    assert len(parts) >= 1
    for d in os.listdir(out):
        if d.startswith("_part="):
            assert os.path.exists(os.path.join(out, d, "_DONE"))
    # resume: second call skips everything (no new rows written)
    import glob

    files_before = sorted(glob.glob(os.path.join(out, "**", "*.parquet"),
                                    recursive=True))
    write_time_partitioned(ds, "ts", out, freq="1d")
    files_after = sorted(glob.glob(os.path.join(out, "**", "*.parquet"),
                                   recursive=True))
    assert files_before == files_after


def test_time_split_sink_crashed_partition_rewrite(ray_session, sf_small,
                                                   tmp_path):
    """A markerless (crashed mid-write) partition is wiped and re-written on
    resume — NOT appended to — so the resumed output has no duplicate rows."""
    import glob

    import duckdb
    import ray

    from spider_ray.stages.sinks import write_time_partitioned

    out = str(tmp_path / "events_sink")
    ds = ray.data.read_parquet(f"{sf_small}/events.parquet")
    n_rows = ds.count()
    write_time_partitioned(ds, "ts", out, freq="1d")
    part_dirs = sorted(
        d for d in os.listdir(out) if d.startswith("_part=")
    )
    assert len(part_dirs) >= 2
    # simulate a crash: one partition lost its marker after a partial write
    victim = os.path.join(out, part_dirs[0])
    os.remove(os.path.join(victim, "_DONE"))
    stale = sorted(glob.glob(os.path.join(victim, "*.parquet")))
    assert stale  # the partial files a crashed attempt left behind
    # resume
    write_time_partitioned(ds, "ts", out, freq="1d")
    assert os.path.exists(os.path.join(victim, "_DONE"))
    total = duckdb.sql(
        f"select count(*) from read_parquet('{out}/*/*.parquet')"
    ).fetchone()[0]
    assert total == n_rows  # no duplicated partition rows
    # the stale partial files are gone (victim dir was wiped, not appended)
    assert not set(stale) & set(
        glob.glob(os.path.join(victim, "*.parquet"))
    )


def test_linkbase_merge(ray_session):
    import ray

    from spider_ray.functions.linkbase import SCHEMA, linkbase_merge

    old = pa.Table.from_pylist(
        [
            {"url": "http://a.com/1", "timestamp": 100, "score": 1.0,
             "cmd": "", "update_fail_cnt": 0},
            {"url": "http://a.com/2", "timestamp": 100, "score": 1.0,
             "cmd": "", "update_fail_cnt": 2},
            {"url": "http://a.com/3", "timestamp": 100, "score": 1.0,
             "cmd": "", "update_fail_cnt": 0},
            {"url": "http://a.com/4", "timestamp": 100, "score": 1.0,
             "cmd": "", "update_fail_cnt": 0},
        ],
        schema=SCHEMA,
    )
    delta = pa.Table.from_pylist(
        [
            # newer record for /1 wins
            {"url": "http://a.com/1", "timestamp": 200, "score": 2.0,
             "cmd": "", "update_fail_cnt": 0},
            # /2 at fail_cnt 2 gets an R → dies at 3
            {"url": "http://a.com/2", "timestamp": 0, "score": 0.0,
             "cmd": "R", "update_fail_cnt": 0},
            # /3 deleted
            {"url": "http://a.com/3", "timestamp": 0, "score": 0.0,
             "cmd": "D", "update_fail_cnt": 0},
            # /4 gets one R → survives with fail_cnt 1
            {"url": "http://a.com/4", "timestamp": 0, "score": 0.0,
             "cmd": "R", "update_fail_cnt": 0},
            # brand-new /5
            {"url": "http://a.com/5", "timestamp": 300, "score": 3.0,
             "cmd": "", "update_fail_cnt": 0},
        ],
        schema=SCHEMA,
    )
    out = linkbase_merge(ray.data.from_arrow(old), ray.data.from_arrow(delta))
    rows = {r["url"]: r for r in out.take_all()}
    assert set(rows) == {"http://a.com/1", "http://a.com/4", "http://a.com/5"}
    assert rows["http://a.com/1"]["timestamp"] == 200
    assert rows["http://a.com/4"]["update_fail_cnt"] == 1


def test_linkbase_merge_tie_deterministic(ray_session):
    """Records tying on (timestamp, score) resolve by the frozen
    (update_fail_cnt asc, url asc) tail — NOT by arrival/block order — so
    the survivor (and whether pending R commands kill it) is identical
    whichever side of the union the tied record arrives on."""
    import ray

    from spider_ray.functions.linkbase import SCHEMA, linkbase_merge

    a = {"url": "http://t.com/x", "timestamp": 100, "score": 1.0,
         "cmd": "", "update_fail_cnt": 0}
    b = {"url": "http://t.com/x", "timestamp": 100, "score": 1.0,
         "cmd": "", "update_fail_cnt": 2}
    r = {"url": "http://t.com/x", "timestamp": 0, "score": 0.0,
         "cmd": "R", "update_fail_cnt": 0}

    def run(old_rows, delta_rows):
        out = linkbase_merge(
            ray.data.from_arrow(pa.Table.from_pylist(old_rows, schema=SCHEMA)),
            ray.data.from_arrow(pa.Table.from_pylist(delta_rows, schema=SCHEMA)),
        )
        return sorted(out.take_all(), key=lambda x: x["url"])

    # both arrival orders pick the update_fail_cnt=0 twin → +1 R = 1 < 3,
    # record survives in BOTH runs with identical fields
    r1 = run([a], [b, r])
    r2 = run([b], [a, r])
    assert r1 == r2
    assert len(r1) == 1 and r1[0]["update_fail_cnt"] == 1


def test_dns_attach_deterministic(ray_session):
    import ray

    from spider_ray.stages.dns import attach_ip

    urls = [f"http://multi.com/p/{i}" for i in range(50)] + ["http://x.com/y"]
    t = pa.table({"url": pa.array(urls)})
    table = {"multi.com": ["10.0.0.1", "10.0.0.2", "10.0.0.3"],
             "x.com": ["10.9.9.9"]}
    out1 = pa.concat_tables(
        ray.get(attach_ip(ray.data.from_arrow(t), table).to_arrow_refs())
    ).sort_by("url")
    out2 = pa.concat_tables(
        ray.get(attach_ip(ray.data.from_arrow(t), table).to_arrow_refs())
    ).sort_by("url")
    assert out1.equals(out2)
    ips = set(out1["ip"].to_pylist())
    assert "10.9.9.9" in ips
    assert len(ips & {"10.0.0.1", "10.0.0.2", "10.0.0.3"}) >= 2  # spread
