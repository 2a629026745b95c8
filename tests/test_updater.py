"""Updater header extraction + shard-ranged selection
(``crawler/updater/updater_util.cc`` / ``updater_util_test.cc:8-44`` /
``mr_updater_mapper.cc:38-76`` + ``mr_updater_reducer.cc:23-53``)."""

import polars as pl
import pytest

from spider_ray.functions.updater import (
    END_SHARD,
    SHARD_NUM,
    START_SHARD,
    _SHARD_SEED,
    _synth_header,
    extract_header_param,
    q_updater_select,
)

# the reference gtest's own headers (updater_util_test.cc:9-31), raw \r\n
HEAD1 = (
    "HTTP/1.1 200 OK\r\nDate: Wed, 14 Mar 2012 10:55:46 GMT\r\nServer: "
    "Apache/2\r\nX-Powered-By: PHP/5.2.17\r\nSet-Cookie: PHPSESSID=513d6"
    "45d0acaaeb750023d4b2f4cb0e8; path=/; domain=.livedildoaction.com\r\n"
    "Expires: Thu, 19 Nov 1981 08:52:00 GMT\r\nCache-Control: no-store, "
    "no-cache, must-revalidate, post-checkr\n\r\n"
)
HEAD2 = (
    "HTTP/1.1 200 OK\r\nContent-Length: 3006\r\nContent-Type: text/html"
    "\r\nContent-Encoding: gzip\r\nLast-Modified: Thu, 22 Dec 2011 04:45:"
    '20 GMT\r\nAccept-Ranges: bytes\r\nETag: "0b02a8264c0cc1:1ae6"\r\nVary'
    ": Accept-Encoding\r\nServer: Microsoft-IIS/6.0\r\nX-Powered-By: ASP."
    "NET\r\nDate: Thu, 16 Feb 2012 17:10:55"
)
# the gtest's file-based case is a line-ESCAPED header (literal
# backslash sequences); reconstruct its shape
HEAD3 = (
    "HTTP/1.1 200 OK\\r\\nLast-Modified: Thu, 22 Dec 2011 04:45:20 GMT"
    '\\r\\nETag: "0b02a8264c0cc1:1ae6"\\r\\nServer: IIS\\r\\n'
)


def test_reference_gtest_cases():
    assert (
        extract_header_param(HEAD1, "Date")
        == "Wed, 14 Mar 2012 10:55:46 GMT"
    )
    # case sensitive
    assert extract_header_param(HEAD1, "date") is None
    assert (
        extract_header_param(HEAD2, "Last-Modified")
        == "Thu, 22 Dec 2011 04:45:20 GMT"
    )
    # HEAD2's Date value runs to end-of-string: no \r/backslash
    # terminator → extraction FAILS (updater_util.cc:45-48)
    assert extract_header_param(HEAD2, "Date") is None
    assert (
        extract_header_param(HEAD3, "Last-Modified")
        == "Thu, 22 Dec 2011 04:45:20 GMT"
    )
    assert (
        extract_header_param(HEAD3, "ETag") == '"0b02a8264c0cc1:1ae6"'
    )


def test_rfind_last_occurrence_and_false_hit():
    # redirect-stacked: LAST occurrence wins
    h = "Last-Modified: AAA\\r\\nLast-Modified: BBB\\r\\n"
    assert extract_header_param(h, "Last-Modified") == "BBB"
    # the quirk: if the LAST occurrence is malformed, extraction fails
    # outright — no retry at the earlier valid occurrence
    h2 = "Last-Modified: AAA\\r\\nzzLast-Modifiedzz\\r\\n"
    assert extract_header_param(h2, "Last-Modified") is None
    assert extract_header_param("", "Date") is None
    assert extract_header_param("x", "") is None


def test_synth_header_modes_cover_every_branch():
    # mode → (expected param source) for eid with that residue
    def sel(eid):
        h = _synth_header(eid)
        v = extract_header_param(h, "Last-Modified")
        return v if v is not None else extract_header_param(h, "Date")

    assert sel(7).startswith("LM-")  # mode 0
    assert sel(8).startswith("DT-")  # mode 1
    assert sel(9) is None  # mode 2: neither
    assert sel(3).startswith("XLM-")  # mode 3: stacked, last wins
    assert sel(4).startswith("DT-")  # mode 4: false hit → Date
    assert sel(12).startswith("DT-")  # mode 5: unterminated LM → Date
    assert sel(6) is None  # mode 6: unterminated Date → drop


def test_updater_select_against_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    ours = pl.from_arrow(q_updater_select(sf)).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    theirs = con.sql(E.oracle_sql()["updater_select"]).df()
    assert list(ours.columns) == list(theirs.columns)
    # the SHARED dtype-strict canon (bytearray + datetime fixes)
    from tests.test_relational import _normalize

    a, b = _normalize(ours), _normalize(theirs)
    assert a.shape == b.shape
    assert (a.values == b.values).all()
    # semantics spot-checks: one row per url, all tagged M, shard gate
    # really prunes (some users fall outside [START, END))
    assert ours["url"].is_unique
    assert (ours["src"] == "M").all()
    import numpy as np

    from spider_ray.kernels.hashing import mix64_int

    uids = ours["url"].str.slice(1).astype(np.int64).to_numpy()
    shards = mix64_int(uids, seed=_SHARD_SEED) % SHARD_NUM
    assert ((shards >= START_SHARD) & (shards < END_SHARD)).all()
