"""Golden tests for the M7 text path — HTML→UTF-8 best-effort conversion
(fetch_result_handler.cc:182-224 semantics: header→meta charset sniff,
>10%-skipped-bytes failure gate, raw dropped on success)."""

import pyarrow as pa
import pytest

from spider_ray.stages.textdecode import (
    MAX_SKIP_RATIO,
    decode_batch,
    decode_html,
    sniff_charset,
)

CJK = "你好，世界。中文编码测试：汉字内容与标点符号。"
DE = "Grüße aus München — äöüß"


def test_sniff_header_wins_over_meta():
    body = b'<meta charset="big5"><html>x</html>'
    assert sniff_charset("text/html; charset=gb2312", body) == "gb2312"
    assert sniff_charset("text/html", body) == "big5"
    assert sniff_charset(None, body) == "big5"
    assert sniff_charset(None, b"<html>plain</html>") is None


@pytest.mark.parametrize(
    "codec,label,sample",
    [
        ("gb18030", "gb2312", CJK),
        ("big5", "big5", "繁體中文測試：漢字內容"),  # big5 = traditional only
        ("utf-8", "utf-8", CJK),
        ("shift_jis", "shift_jis", "日本語テスト"),
    ],
)
def test_declared_charset_roundtrip(codec, label, sample):
    raw = sample.encode(codec)
    text, cs, ratio, ok = decode_html(raw, f"text/html; charset={label}")
    assert ok and ratio == 0.0
    assert text == sample


def test_meta_declaration_used_when_no_header():
    body = ('<meta http-equiv="Content-Type" '
            'content="text/html; charset=gb2312">' + CJK).encode("gb18030")
    text, cs, ratio, ok = decode_html(body, None)
    assert ok and cs == "gb18030"
    assert CJK in text


def test_latin1_bytes_with_declared_utf8_fail_gate():
    # latin-1 umlaut bytes are invalid utf-8: declared charset is honored
    # (no silent fallback), so a mostly-broken page FAILS the 10% gate
    raw = ("ü" * 100).encode("latin-1")
    text, cs, ratio, ok = decode_html(raw, "text/html; charset=utf-8")
    assert not ok
    assert text is None
    assert ratio > MAX_SKIP_RATIO


def test_small_corruption_passes_gate():
    raw = DE.encode("utf-8") * 20 + b"\xff\xfe"  # 2 bad bytes in ~600
    text, cs, ratio, ok = decode_html(raw, "text/html; charset=utf-8")
    assert ok and 0 < ratio <= MAX_SKIP_RATIO
    assert DE in text


def test_undeclared_falls_back_through_chain():
    raw = CJK.encode("gb18030")  # no declaration anywhere
    text, cs, ratio, ok = decode_html(raw, None)
    assert ok
    assert text == CJK and cs == "gb18030"


def test_empty_body_ok():
    text, cs, ratio, ok = decode_html(b"", "text/html; charset=gb2312")
    assert ok and text == "" and cs == "gb18030"


def test_decode_batch_schema_and_raw_dropped():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "body": pa.array(
                [CJK.encode("gb18030"), ("ü" * 50).encode("latin-1")],
                pa.binary(),
            ),
            "content_type": pa.array(
                ["text/html; charset=gb2312", "text/html; charset=utf-8"],
                pa.string(),
            ),
        }
    )
    out = decode_batch(batch)
    assert "body" not in out.column_names  # raw dropped on output
    assert out["text"][0].as_py() == CJK
    assert out["decode_ok"].to_pylist() == [True, False]
    assert out["text"][1].as_py() is None


def test_skip_gate_counts_bytes_not_chars():
    """Regression: the gate is byte-denominated (reference: skipped bytes
    > 10% of content fails the page). A 2-byte undecodable sequence must
    count 2 skipped bytes, not 1 replacement char — char-counting passed
    pages with 15% corrupt bytes."""
    from spider_ray.stages.textdecode import decode_html

    body = b"a" * 850 + b"\xe0\xa0" * 75  # 150/1000 bytes undecodable
    text, _cs, ratio, ok = decode_html(body, "text/html; charset=utf-8")
    assert not ok and text is None
    assert abs(ratio - 0.15) < 1e-9
    # just-under-the-gate page still passes, ratio exact in bytes
    body2 = b"a" * 950 + b"\xe0\xa0" * 25  # 50/1000 bytes
    text2, _cs2, ratio2, ok2 = decode_html(body2, "text/html; charset=utf-8")
    assert ok2 and abs(ratio2 - 0.05) < 1e-9 and text2.count("�") == 25
