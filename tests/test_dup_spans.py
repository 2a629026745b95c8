"""Unit tests for span-level exact-substring dup marking (q_dup_spans) —
SQL-oracle equivalence at both test SFs is swept by tools/oracle_strict.py."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spider_ray.functions.dedup import SPAN_W, q_dup_spans

DIR = "/tmp/spider_ray_test_dup_spans"


@pytest.fixture(scope="module")
def corpus_dir():
    shutil.rmtree(DIR, ignore_errors=True)
    os.makedirs(DIR)
    span = " ".join(f"w{i}" for i in range(SPAN_W))  # one exact 8-word span
    rows = {
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            f"intro {span} outro",  # shares `span` with doc 2
            f"{span} tail a b c",
            "totally unique words here never repeated anywhere else one",
            f"xx {span} yy {span}",  # the span twice WITHIN one doc
            "short doc",  # fewer than SPAN_W words: zero spans
        ],
    }
    pq.write_table(
        pa.table(rows), os.path.join(DIR, "documents.parquet"), row_group_size=2
    )
    yield DIR
    shutil.rmtree(DIR, ignore_errors=True)


def test_dup_spans_crafted(corpus_dir, ray_session):
    t = q_dup_spans(corpus_dir)
    got = {r["doc_id"]: r["n_dup"] for r in t.to_pylist()}
    # `span` occurs 4 times corpus-wide (docs 1, 2, 4x2) → every occurrence
    # position counts; doc 1 also has no other duplicated span. Doc 4's two
    # interior spans "yy w0..." etc. are unique. Docs 3 and 5 emit nothing.
    assert got[1] == 1
    assert got[2] == 1
    assert got[4] == 2
    assert 3 not in got and 5 not in got


def test_dup_spans_within_doc_duplicate_counts(ray_session):
    # a span repeated ONLY within a single doc still counts (n > 1 overall)
    d = DIR + "_solo"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    span = " ".join(f"s{i}" for i in range(SPAN_W))
    pq.write_table(
        pa.table({"doc_id": [9], "text": [f"{span} mid {span}"]}),
        os.path.join(d, "documents.parquet"),
    )
    try:
        t = q_dup_spans(d)
        got = {r["doc_id"]: r["n_dup"] for r in t.to_pylist()}
        assert got == {9: 2}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dup_spans_testdata_vs_duckdb(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.001"
    out = q_dup_spans(sf)
    orc = duckdb.sql(
        rf"""
        WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') ws
                   FROM read_parquet('{sf}/documents.parquet')),
        sh AS (SELECT doc_id,
                      unnest([array_to_string(
                          list_slice(ws, i, i + {SPAN_W - 1}), ' ')
                              for i in range(1, len(ws) - {SPAN_W - 2})])
                          AS sh
               FROM w),
        cnt AS (SELECT sh, count(*) n FROM sh GROUP BY sh)
        SELECT s.doc_id, count(*)::BIGINT AS n_dup
        FROM sh s JOIN cnt USING (sh) WHERE n > 1
        GROUP BY s.doc_id ORDER BY s.doc_id
        """
    ).arrow()
    assert out.num_rows == orc.num_rows
    np.testing.assert_array_equal(
        out["doc_id"].to_numpy(), orc["doc_id"].to_numpy()
    )
    np.testing.assert_array_equal(
        out["n_dup"].to_numpy(), orc["n_dup"].to_numpy()
    )
