"""Updater: shard-ranged staleness re-crawl selection over the linkbase
(G1's last MR pair — ``crawler/updater/mr_updater_mapper.cc:38-76`` +
``mr_updater_reducer.cc:23-53`` + ``updater_util.cc:17-52``).

Reference semantics, stage by stage:

* **mapper** — for every linkbase record: keep pages only
  (``resource_type == 1``, mapper:48-49), compute
  ``shard_id = hash(url) % shard_num`` and keep only records whose shard
  falls in the configured ``[start_shard_id, end_shard_id)`` interval
  (mapper:52-60 — THE idiom this module ports: the updater walks the
  linkbase one shard range per run so a re-crawl wave touches a bounded
  slice of the keyspace); extract ``Last-Modified`` (fallback ``Date``)
  from the stored line-escaped HTTP header (mapper:63-70), dropping the
  record if neither parses.
* **reducer** — per url keep the max-``timestamp`` record's (score,
  last-modified) and emit a re-crawl command row tagged ``'M'``
  ("from the update module", reducer:49-51).

Header extraction (``updater_util.cc:17-52``) is deliberately quirky and
ported FAITHFULLY: case-sensitive ``rfind`` of the parameter name (the
LAST occurrence wins — redirect-stacked headers append), the occurrence
must be immediately followed by ``": "`` (if the *last* occurrence is a
false hit inside another token, extraction fails outright — no retry at
earlier occurrences), and the value must terminate in ``'\r'`` or a
literal backslash (line-escaped form) strictly before end-of-string.
``tests/test_updater.py`` pins the reference's own gtest cases
(``updater_util_test.cc:8-44``).

Ray shape: one streamed ``map_batches`` pass does synth + page filter +
shard-interval gate + header parse (vectorized where columnar, the
per-row header scan inside the batch loop — a per-record string parse,
same class as the HTML extractors); the reduce is the standard two-stage
keep-latest (block partial → hash-partitioned ``groupby.map_groups``
final), O(urls-in-range) output, no driver merge. The shard hash is the
repo's frozen SQL-expressible :func:`kernels.hashing.mix64_int` over the
url's integer key (stand-in for the reference's CityHash64 — same
substitution every other frozen hash in this repo makes).
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import ray

from spider_ray.kernels.hashing import mix64_int

SHARD_NUM = 128
START_SHARD = 32
END_SHARD = 96
_SHARD_SEED = 909

OUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("ts", pa.int64()),
        ("score", pa.float64()),
        ("last_modified", pa.string()),
        ("src", pa.string()),  # 'M' — record came from the update module
    ]
)


def extract_header_param(header: str, parameter: str) -> str | None:
    """``crawler::ExtractParameterValueFromHeader`` (updater_util.cc:17-52),
    ported exactly: rfind the LAST occurrence of ``parameter`` (case
    sensitive), require ``": "`` immediately after it, take the value up
    to the first ``'\\r'`` or literal backslash found at or beyond the
    second value character; fail (None) if the parameter is absent, the
    last occurrence is malformed, or no terminator exists before
    end-of-string (the reference's head2 ``Date`` case)."""
    if not header or not parameter:
        return None
    pos = header.rfind(parameter)
    if pos == -1:
        return None
    pos2 = pos + len(parameter)
    if header[pos2 : pos2 + 2] != ": ":
        return None
    pos2 += 2
    pos = pos2 + 1
    n = len(header)
    while pos < n:
        if header[pos] == "\r" or header[pos] == "\\":
            break
        pos += 1
    if pos == n:
        return None
    return header[pos2:pos]


_E = "\\r\\n"  # line-escaped CRLF (literal backslash sequences)
_BASE = f"HTTP/1.1 200 OK{_E}Server: ray{_E}"


def _synth_header(eid: int) -> str:
    """Deterministic linkbase header for event ``eid`` — seven shapes
    covering every branch of the extractor (both params / Date only /
    neither / redirect-stacked double Last-Modified / a FALSE last
    occurrence that kills Last-Modified outright / unterminated
    Last-Modified value / unterminated Date). The SQL oracle rebuilds
    the same strings by concatenation."""
    lm, dt = f"LM-{eid % 97}", f"DT-{eid % 89}"
    mode = eid % 7
    if mode == 0:
        return f"{_BASE}Last-Modified: {lm}{_E}Date: {dt}{_E}"
    if mode == 1:
        return f"{_BASE}Date: {dt}{_E}"
    if mode == 2:
        return f"{_BASE}Content-Type: text/html{_E}"
    if mode == 3:
        # redirect-stacked: TWO Last-Modified headers, rfind takes #2
        return (
            f"{_BASE}Last-Modified: {lm}{_E}HTTP/1.1 301 Moved{_E}"
            f"Last-Modified: X{lm}{_E}"
        )
    if mode == 4:
        # the quirk: the LAST 'Last-Modified' occurrence is a false hit
        # inside another token → extraction fails even though a valid
        # one precedes it → falls back to Date
        return (
            f"{_BASE}Last-Modified: {lm}{_E}X-Trap: zzLast-Modifiedzz{_E}"
            f"Date: {dt}{_E}"
        )
    if mode == 5:
        # Last-Modified value runs to end-of-string (no terminator) →
        # fails → Date fallback
        return f"{_BASE}Date: {dt}{_E}Last-Modified: {lm}"
    # mode 6: Date unterminated, no Last-Modified → record dropped
    return f"{_BASE}Date: {dt}"


def q_updater_select(sf_dir: str) -> pa.Table:
    """Shard-ranged staleness selection over a deterministic synthetic
    linkbase derived from ``events`` (url ``u{user_id}``, timestamp
    ``event_id``, score ``value``, resource_type page unless
    ``event_id % 5 == 0``, header per :func:`_synth_header`): mapper
    filter + header parse + per-url keep-max-timestamp, emitting the
    reference's ``'M'``-tagged re-crawl rows. SQL-oracled bit-exact —
    the oracle rebuilds the headers and replays the rfind extraction
    with reverse/strpos arithmetic."""
    from spider_ray.pipelines.relational import _concat, _sorted
    from spider_ray.sources.tables import read_table

    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "value"]
    )

    def mapper(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        # page filter + shard-interval gate, vectorized
        shard = (
            mix64_int(df["user_id"].to_numpy(), seed=_SHARD_SEED)
            % SHARD_NUM
        )
        df = (
            df.with_columns(shard=pl.Series(shard.astype("int64")))
            .filter(
                (pl.col("event_id") % 5 != 0)
                & (pl.col("shard") >= START_SHARD)
                & (pl.col("shard") < END_SHARD)
            )
        )
        urls, tss, scores, lms = [], [], [], []
        for eid, uid, val in zip(
            df["event_id"], df["user_id"], df["value"]
        ):
            header = _synth_header(eid)
            t = extract_header_param(header, "Last-Modified")
            if t is None:
                t = extract_header_param(header, "Date")
                if t is None:
                    continue
            urls.append(f"u{uid}")
            tss.append(eid)
            scores.append(val)
            lms.append(t)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "ts": pa.array(tss, pa.int64()),
                "score": pa.array(scores, pa.float64()),
                "last_modified": pa.array(lms, pa.string()),
            }
        )

    def keep_latest(df: pl.DataFrame) -> pl.DataFrame:
        return (
            df.sort(["ts"], descending=True)
            .group_by("url", maintain_order=True)
            .first()
        )

    def partial(batch: pa.Table) -> pa.Table:
        out = keep_latest(pl.from_arrow(batch)).with_columns(
            part=(pl.col("url").hash(seed=7) % 32).cast(pl.Int32)
        )
        return out.to_arrow()

    def final_group(group: pa.Table) -> pa.Table:
        return (
            keep_latest(pl.from_arrow(group))
            .select("url", "ts", "score", "last_modified")
            .with_columns(src=pl.lit("M"))
            .to_arrow()
            .cast(OUT_SCHEMA)
        )

    out = (
        ds.map_batches(mapper, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final_group, batch_format="pyarrow")
    )
    return _sorted(_concat(out, schema=OUT_SCHEMA), "url")


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()
