"""HTML→UTF-8 best-effort charset conversion — the M7 TEXT path.

Reference semantics (``crawler/fetch_result_handler.cc:182-224``):
``ConvertHTMLToUTF8WithBestEffort(effective_url, header, raw)`` sniffs the
charset from the Content-Type header, falls back to the in-document
``<meta>`` declaration, converts with best effort, FAILS the page when the
skipped (undecodable) bytes exceed 10% of the content, and on success drops
the raw bytes and keeps only the UTF-8 text.

Ray-native restatement: a stateless ``map_batches`` stage over
(doc_id, body:binary, content_type:string) batches. Decoding is a per-row
codec kernel (inherently per-document work, same as the reference's iconv
loop); everything around it — charset sniff regexes, the skip-ratio gate —
is compiled once at module import.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

MAX_SKIP_RATIO = 0.10  # reference: fail at >10% skipped bytes
_SNIFF_BYTES = 1024

# charset in a Content-Type header value: text/html; charset=gb2312
_HDR_RE = re.compile(r"charset\s*=\s*[\"']?([\w.:-]+)", re.I)
# HTML5 <meta charset="..."> and HTML4 http-equiv form, byte patterns so we
# can sniff before any decode
_META_RE = re.compile(rb"<meta[^>]+charset\s*=\s*[\"']?([\w.:-]+)", re.I)

# charset label → python codec (the aliases the reference's iconv path sees
# most; unknown labels fall through to the detection chain)
_CODECS = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "gb2312": "gb18030", "gbk": "gb18030", "gb18030": "gb18030",
    "big5": "big5",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis", "sjis": "shift_jis",
    "euc-jp": "euc_jp", "euc-kr": "euc_kr",
    "iso-8859-1": "latin-1", "latin-1": "latin-1", "latin1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "us-ascii": "ascii", "ascii": "ascii",
}
# detection fallback chain when no (usable) declaration exists
_FALLBACKS = ("utf-8", "gb18030", "big5", "shift_jis", "latin-1")


def sniff_charset(content_type: str | None, body: bytes) -> str | None:
    """Header declaration wins; else the first <meta charset> in the first
    1024 bytes (the reference sniffs header→meta in that order)."""
    if content_type:
        m = _HDR_RE.search(content_type)
        if m:
            return m.group(1).lower()
    m = _META_RE.search(body[:_SNIFF_BYTES])
    if m:
        return m.group(1).decode("ascii", "replace").lower()
    return None


def decode_html(body: bytes, content_type: str | None = None):
    """Best-effort decode → (text | None, charset, skip_ratio, ok).

    The declared charset is tried first; undeclared/unknown labels walk the
    fallback chain and the first candidate within the skip gate wins.
    ``ok`` is False when every candidate exceeds MAX_SKIP_RATIO — the
    reference drops such pages (text is None, raw would be kept upstream).
    """
    declared = sniff_charset(content_type, body or b"")
    if not body:
        return "", _CODECS.get(declared or "", "utf-8"), 0.0, True
    if declared and declared in _CODECS:
        # the reference converts with the DETECTED charset and gates on the
        # skip ratio — it does not fall back to other codecs, so a declared
        # charset over corrupt bytes is a real failure
        candidates = [_CODECS[declared]]
    else:
        candidates = list(_FALLBACKS)

    best = None  # (skip_ratio, codec, text)
    for codec in candidates:
        text = body.decode(codec, errors="replace")
        # count skipped BYTES, not U+FFFD occurrences: the reference gate
        # is byte-denominated (skipped bytes > 10% of content fails the
        # page), and one multi-byte undecodable sequence yields a single
        # replacement char — counting chars over a byte denominator
        # undercounts corruption and passes pages the reference drops.
        # Successfully-decoded chars re-encode to exactly the bytes they
        # came from in these codecs, so good-byte count = len(re-encoded
        # ignore-decode); legitimate U+FFFD in the source still never
        # counts against the gate.
        good = body.decode(codec, errors="ignore")
        skipped = len(body) - len(good.encode(codec, errors="ignore"))
        ratio = skipped / len(body)
        if ratio <= MAX_SKIP_RATIO:
            return text, codec, ratio, True
        if best is None or ratio < best[0]:
            best = (ratio, codec, text)
    # every candidate failed the gate: report the least-bad, text dropped
    return None, best[1], best[0], False


def decode_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, body, content_type) → (doc_id, text, charset, skip_pct,
    decode_ok, n_chars). On success the raw bytes are dropped (only the
    UTF-8 text survives, reference rule); failed rows keep text=None."""
    bodies = batch["body"].to_pylist()
    ctypes = (
        batch["content_type"].to_pylist()
        if "content_type" in batch.column_names
        else [None] * len(bodies)
    )
    texts, charsets, ratios, oks = [], [], [], []
    for body, ct in zip(bodies, ctypes):
        text, charset, ratio, ok = decode_html(body or b"", ct)
        texts.append(text)
        charsets.append(charset)
        ratios.append(ratio)
        oks.append(ok)
    n_chars = [len(t) if t is not None else 0 for t in texts]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text": pa.array(texts, pa.string()),
            "charset": pa.array(charsets, pa.string()),
            "skip_pct": pa.array(
                np.round(np.array(ratios) * 100.0, 6), pa.float64()
            ),
            "decode_ok": pa.array(oks, pa.bool_()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


def decode_pages(ds, **map_kwargs):
    """The Ray stage: ``decode_pages(ds)`` over any Dataset with
    (doc_id, body, content_type) columns."""
    return ds.map_batches(decode_batch, batch_format="pyarrow", **map_kwargs)


# Imported lazily (inside query functions), AFTER the pipeline modules'
# registration pass ran — so this module must register itself for
# pickle-by-value or its functions ship by reference to workers that may
# not have the repo on sys.path.
from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()
