"""Minimal WARC/1.0 reader + writer — the archive interchange format a
real crawl corpus arrives in (ISO 28500; the reference's G1 crawler moves
fetched pages as HDFS record files with the same logical content:
url + fetch status + headers + raw body — `selector/mr_selector_r1_*`).

This module gives the engine a byte-faithful ingestion path for that
shape: one WARC FILE is the unit of parallelism (the standard ~1 GB
`.warc.gz` convention), read distributed via
``ray.data.read_binary_files`` + a per-file record parser, so a
directory of archives streams through the same `map_batches` pipelines
as every other source. Supports plain ``.warc`` and gzip members
(``.warc.gz``, whole-file or the usual record-level concatenated
members — ``gzip`` handles both).

Only the two record types a crawl pipeline consumes are modeled:
``warcinfo`` (skipped) and ``response`` (HTTP status line + headers +
body). The writer exists for tests/demos and emits spec-shaped records;
it is NOT a general-purpose archiver.
"""

from __future__ import annotations

import gzip
import io

import pyarrow as pa
import ray

RESPONSE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("status", pa.int32()),
        ("content_type", pa.string()),
        ("body", pa.binary()),
    ]
)

_CRLF = b"\r\n"


def write_warc(
    path: str, records: list[dict], *, compress: bool | None = None
) -> str:
    """Write ``records`` (dicts with url, status, content_type, body) as
    one WARC file with a leading warcinfo record. ``compress`` defaults
    to the path suffix (.gz)."""
    if compress is None:
        compress = path.endswith(".gz")
    out = io.BytesIO()

    def record(headers: list[tuple[str, str]], payload: bytes) -> None:
        out.write(b"WARC/1.0" + _CRLF)
        for k, v in headers:
            out.write(f"{k}: {v}".encode() + _CRLF)
        out.write(f"Content-Length: {len(payload)}".encode() + _CRLF)
        out.write(_CRLF)
        out.write(payload)
        out.write(_CRLF + _CRLF)

    info = b"software: spider_ray-warc-writer\r\n"
    record(
        [("WARC-Type", "warcinfo"),
         ("Content-Type", "application/warc-fields")],
        info,
    )
    reasons = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
               500: "Internal Server Error"}
    for r in records:
        status = int(r["status"])
        http = (
            f"HTTP/1.1 {status} {reasons.get(status, 'Unknown')}".encode()
            + _CRLF
            + f"Content-Type: {r['content_type']}".encode()
            + _CRLF
            + f"Content-Length: {len(r['body'])}".encode()
            + _CRLF
            + _CRLF
            + bytes(r["body"])
        )
        record(
            [
                ("WARC-Type", "response"),
                ("WARC-Target-URI", r["url"]),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            http,
        )
    data = out.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
    return path


def parse_warc_bytes(data: bytes) -> pa.Table:
    """Parse one WARC file's bytes into the RESPONSE_SCHEMA table —
    sequential within the file (records are length-delimited, not
    splittable), parallel across files."""
    if data[:2] == b"\x1f\x8b":  # gzip magic; multi-member safe
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    urls, statuses, ctypes, bodies = [], [], [], []
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(
                f"not a WARC record at offset {pos}: {lines[0][:40]!r}"
            )
        hdrs = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        try:
            clen = int(hdrs.get("content-length", "0"))
        except ValueError as e:
            raise ValueError(
                f"bad WARC Content-Length at offset {pos}: "
                f"{hdrs.get('content-length')!r}"
            ) from e
        payload = data[head_end + 4:head_end + 4 + clen]
        pos = head_end + 4 + clen
        if hdrs.get("warc-type") != "response":
            continue
        url = hdrs.get("warc-target-uri", "")
        # HTTP envelope: status line + headers + body
        he = payload.find(_CRLF + _CRLF)
        http_head = payload[:he].decode("utf-8", "replace") if he >= 0 else ""
        body = payload[he + 4:] if he >= 0 else b""
        status = 0
        ctype = ""
        hl = http_head.split("\r\n")
        if hl and hl[0].startswith("HTTP/"):
            parts = hl[0].split()
            # isdecimal, not isdigit: isdigit() accepts Unicode digits
            # (superscripts etc.) that int() rejects — a malformed status
            # line must degrade to status=0, never kill the archive task
            if len(parts) >= 2 and parts[1].isdecimal():
                status = int(parts[1])
        for ln in hl[1:]:
            k, _, v = ln.partition(":")
            if k.strip().lower() == "content-type":
                ctype = v.strip()
        urls.append(url)
        statuses.append(status)
        ctypes.append(ctype)
        bodies.append(body)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "status": pa.array(statuses, pa.int32()),
            "content_type": pa.array(ctypes, pa.string()),
            "body": pa.array(bodies, pa.binary()),
        }
    )


def read_warc(paths: str | list[str]) -> ray.data.Dataset:
    """Distributed WARC read: one parse task per archive file, records
    out as Arrow rows (RESPONSE_SCHEMA)."""
    ds = ray.data.read_binary_files(paths, file_extensions=None)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            parse_warc_bytes(b.as_py())
            for b in batch["bytes"]
        ]
        if not tables:
            return pa.Table.from_pylist([], schema=RESPONSE_SCHEMA)
        return pa.concat_tables(tables, promote_options="default")

    return ds.map_batches(parse, batch_format="pyarrow")


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()
