"""Unit tests for the vocab-build + OOV-rate op (q_vocab_oov) on a crafted
corpus exercising the tie-break at the vocab boundary and zero-token docs —
SQL-oracle equivalence at both test SFs is swept by tools/oracle_strict.py."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import spider_ray.functions.text as text_mod
from spider_ray.functions.text import q_vocab_oov

DIR = "/tmp/spider_ray_test_vocab_oov"


@pytest.fixture(scope="module")
def corpus_dir():
    shutil.rmtree(DIR, ignore_errors=True)
    os.makedirs(DIR)
    # vocab boundary tie: with VOCAB_SIZE patched to 3, words b/c tie at
    # count 2 — (count DESC, word ASC) must pick b, drop c
    rows = {
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "a a a b c",
            "a b c d",
            "",  # zero tokens: must still emit (0, 0)
            "  \t \n ",  # whitespace only: also zero tokens
            "e f g a",
        ],
    }
    pq.write_table(
        pa.table(rows), os.path.join(DIR, "documents.parquet"), row_group_size=2
    )
    yield DIR
    shutil.rmtree(DIR, ignore_errors=True)


def test_vocab_oov_tiebreak_and_empty_docs(corpus_dir, ray_session, monkeypatch):
    monkeypatch.setattr(text_mod, "VOCAB_SIZE", 3)
    t = q_vocab_oov(corpus_dir)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"]) for r in t.to_pylist()
    }
    # counts: a=5, b=2, c=2, d=1, e=1, f=1, g=1 → vocab {a, b, c}? No:
    # top-3 by (count DESC, word ASC) = a(5), b(2), c(2) — b before c by
    # word ASC but BOTH fit in 3 slots. OOV = everything not in {a, b, c}.
    assert got == {
        1: (5, 0),  # a a a b c — all in vocab
        2: (4, 1),  # a b c d — d is OOV
        3: (0, 0),
        4: (0, 0),
        5: (4, 3),  # e f g a — e, f, g OOV
    }


def test_vocab_oov_boundary_tie_is_deterministic(ray_session, monkeypatch):
    # VOCAB_SIZE=2: slots for a + ONE of the count-2 tie {b, c} → word ASC
    # keeps b, drops c. The oracle applies the same ORDER BY n DESC, word.
    shutil.rmtree(DIR + "_tie", ignore_errors=True)
    os.makedirs(DIR + "_tie")
    pq.write_table(
        pa.table({"doc_id": [1, 2], "text": ["a a b c", "a b c"]}),
        os.path.join(DIR + "_tie", "documents.parquet"),
    )
    monkeypatch.setattr(text_mod, "VOCAB_SIZE", 2)
    try:
        t = q_vocab_oov(DIR + "_tie")
        got = {r["doc_id"]: (r["n_tokens"], r["n_oov"]) for r in t.to_pylist()}
        assert got == {1: (4, 1), 2: (3, 1)}  # c is OOV in both docs
    finally:
        shutil.rmtree(DIR + "_tie", ignore_errors=True)


def test_vocab_oov_testdata_vs_duckdb(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.001"
    out = q_vocab_oov(sf)
    orc = duckdb.sql(
        rf"""
        WITH w AS (SELECT doc_id,
                          unnest(regexp_extract_all(text, '\S+')) AS word
                   FROM read_parquet('{sf}/documents.parquet')),
        cnt AS (SELECT word, count(*) n FROM w GROUP BY word),
        vocab AS (SELECT word FROM cnt
                  ORDER BY n DESC, word LIMIT {text_mod.VOCAB_SIZE}),
        per AS (SELECT w.doc_id, count(*)::BIGINT AS n_tokens,
                       sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0
                           END)::BIGINT AS n_oov
                FROM w LEFT JOIN vocab v USING (word) GROUP BY w.doc_id)
        SELECT d.doc_id, coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
               coalesce(p.n_oov, 0)::BIGINT AS n_oov
        FROM read_parquet('{sf}/documents.parquet') d
        LEFT JOIN per p USING (doc_id) ORDER BY d.doc_id
        """
    ).arrow()
    for c in ("doc_id", "n_tokens", "n_oov"):
        np.testing.assert_array_equal(
            out[c].to_numpy(), orc[c].to_numpy(), err_msg=c
        )


def test_bm25_scores_flat_recompute(ray_session, sf_small):
    """Distributed two-pass BM25 equals a single-process recompute with
    the same frozen expressions (pins the pass-1 partial combine and the
    pass-2 scoring independently of the DuckDB oracle)."""
    import numpy as np
    import pyarrow.parquet as pq

    from spider_ray.functions import text as T

    out = T.q_bm25_scores(sf_small)
    t = pq.read_table(
        sf_small + "/documents.parquet", columns=["doc_id", "text"]
    )
    docs = sorted(
        zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    )
    toks = [d[1].split(" ") for d in docs]
    dls = np.array([len(x) for x in toks], np.int64)
    n, avgdl = len(docs), float(int(dls.sum())) / float(len(docs))
    score = np.zeros(n, np.float64)
    norm = T.BM25_K1 * (
        1.0 - T.BM25_B + T.BM25_B * (dls.astype(np.float64) / avgdl)
    )
    for term in T.BM25_TERMS:
        tf = np.array([tk.count(term) for tk in toks], np.float64)
        df = int((tf > 0).sum())
        idf = float(np.log((n - df + 0.5) / (df + 0.5) + 1.0))
        score = score + idf * (tf * (T.BM25_K1 + 1.0)) / (tf + norm)
    assert out["doc_id"].to_pylist() == [d[0] for d in docs]
    assert out["dl"].to_pylist() == dls.tolist()
    assert out["bm25"].to_pylist() == np.round(score, 6).tolist()
    # every term actually occurs in the corpus (the query is non-trivial)
    assert all(
        any(term in tk for tk in toks) for term in T.BM25_TERMS
    )


def test_quality_logit_sign_equals_float_model(ray_session, sf_small):
    """The integer-scaled score's SIGN must equal the float model's
    decision (the scaling argument: multiply by 256*n_chars > 0), and
    the gate must be non-degenerate on this corpus."""
    import numpy as np
    import polars as pl
    import pyarrow.parquet as pq

    from spider_ray.functions import text as T
    from spider_ray.kernels import tokens as tk

    out = pl.from_arrow(T.q_quality_logit(sf_small))
    docs = pl.from_arrow(
        pq.read_table(sf_small + "/documents.parquet",
                      columns=["doc_id", "text"])
    ).sort("doc_id")
    feats = docs.with_columns(
        nc=pl.col("text").str.len_chars().cast(pl.Int64),
        nt=pl.col("text").str.count_matches(tk.NONWS_PAT).cast(pl.Int64),
        np_=pl.col("text").str.count_matches(r"[!-/:-@\[-`{-~]").cast(pl.Int64),
        nd=pl.col("text").str.count_matches(r"[0-9]").cast(pl.Int64),
    )
    logit = (
        -0.5
        + (2.0 / 256.0) * feats["nt"].to_numpy()
        - 2.0 * (feats["np_"].to_numpy() / feats["nc"].to_numpy())
        - 1.5 * (feats["nd"].to_numpy() / feats["nc"].to_numpy())
    )
    assert (out["keep"].to_numpy() == (logit >= 0)).all()
    kept = int(out["keep"].sum())
    assert 0 < kept < out.height
