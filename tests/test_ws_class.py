"""The frozen whitespace class (tokens.WS_CLASS): one tokenization
semantics across the three regex engines the repo spans (Python re,
polars/Rust regex, DuckDB RE2). Python's ``\\s`` includes 0x1C-0x1F, Rust's
is White_Space only, RE2's is ASCII-only — the explicit class removes the
divergence; these tests pin it."""

import re

import duckdb
import polars as pl

from spider_ray.kernels import tokens as tk

# documents containing exactly the whitespace the engines disagree about
TRICKY = [
    "plain ascii words only",
    "nbsp separated words here",
    "line sep and para",
    "file\x1cgroup\x1drecord\x1eunit\x1fseps",
    "ideographic　space　text",
    "thin spaces every where",
    "",
]


def test_ws_class_equals_python_backslash_s_everywhere():
    cls = re.compile(f"[{tk.WS_CLASS}]")
    for cp in range(0x110000):
        c = chr(cp)
        assert bool(cls.match(c)) == bool(re.match(r"\s", c)) == c.isspace()


def test_tokenization_parity_python_polars_duckdb():
    py = [len(tk.WS_RE.findall(t)) for t in TRICKY]
    plc = pl.Series(TRICKY).str.count_matches(tk.NONWS_PAT).to_list()
    con = duckdb.connect()
    dk = [
        con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [t, tk.NONWS_PAT]
        ).fetchone()[0]
        for t in TRICKY
    ]
    assert py == plc == dk
    # the raw-escape patterns DO diverge on this input — the class is
    # load-bearing, not cosmetic
    ascii_dk = [
        con.execute(
            r"SELECT len(regexp_extract_all(?, '\S+'))", [t]
        ).fetchone()[0]
        for t in TRICKY
    ]
    assert ascii_dk != py


def test_bpe_tokenization_parity():
    pat = tk.TOKEN_RE.pattern
    py = [len(tk.TOKEN_RE.findall(t)) for t in TRICKY]
    plc = pl.Series(TRICKY).str.count_matches(pat).to_list()
    con = duckdb.connect()
    dk = [
        con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [t, pat]
        ).fetchone()[0]
        for t in TRICKY
    ]
    assert py == plc == dk


def test_langid_and_simhash_batch_scalar_parity_on_tricky_ws():
    preds = tk.detect_lang_batch(TRICKY).to_pylist()
    assert preds == [tk.detect_lang(t) for t in TRICKY]
    assert tk.simhash_batch(TRICKY).tolist() == [
        tk.simhash(t) for t in TRICKY
    ]


def test_queries_match_oracles_on_unicode_corpus(ray_session, tmp_path):
    """End-to-end seam check: tokenizing queries and their DuckDB oracles
    must agree on a corpus full of non-ASCII whitespace — the exact input
    the raw-escape regexes silently diverged on."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as E

    texts = [(t + " the of and to in la de le") * 3 for t in TRICKY if t]
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            "source": pa.array(["web"] * n, pa.string()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(tbl, f"{sf}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    for name in ("langid", "token_stats", "sequence_pack", "simhash_pairs"):
        ours = E.queries()[name](sf)
        ours = ours.to_pandas() if not isinstance(ours, pd.DataFrame) else ours
        theirs = con.execute(E.oracle_sql()[name]).df()
        a = ours[sorted(ours.columns)].sort_values(
            by=sorted(ours.columns), ignore_index=True
        )
        b = theirs[sorted(theirs.columns)].sort_values(
            by=sorted(theirs.columns), ignore_index=True
        )
        assert a.equals(b), f"{name} diverged on unicode whitespace"
