"""Unit tests for the CLIP-score alignment gate (q_clip_align) on a crafted
embeddings table with known pair geometry — the SQL-oracle equivalence at
both test SFs is additionally swept by tools/oracle_strict.py."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spider_ray.functions.multimodal import ALIGN_TAU, q_clip_align

DIR = "/tmp/spider_ray_test_clip_align"


@pytest.fixture(scope="module")
def emb_dir():
    shutil.rmtree(DIR, ignore_errors=True)
    os.makedirs(DIR)
    rng = np.random.default_rng(7)
    dim = 8
    n_pairs = 300
    vecs = []
    ids = []
    for p in range(n_pairs):
        a = rng.normal(size=dim)
        if p % 3 == 0:
            # aligned pair: caption = image + small noise → cosine near 1
            b = a + rng.normal(scale=0.05, size=dim)
        else:
            # misaligned: independent vector → cosine near 0
            b = rng.normal(size=dim)
        ids += [2 * p, 2 * p + 1]
        vecs += [a, b]
    # one unpartnered trailing image row: must drop (inner-join semantics)
    ids.append(2 * n_pairs)
    vecs.append(rng.normal(size=dim))
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([i % 5 for i in ids], pa.int32()),
        }
    )
    # many small row groups → many Ray blocks → the co-partition shuffle
    # actually has to move both sides of a pair together
    pq.write_table(t, os.path.join(DIR, "embeddings.parquet"), row_group_size=40)
    yield DIR
    shutil.rmtree(DIR, ignore_errors=True)


def test_clip_align_matches_bruteforce(emb_dir, ray_session):
    out = q_clip_align(emb_dir)
    t = pq.read_table(os.path.join(emb_dir, "embeddings.parquet"))
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    M = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    by_id = {int(v): M[i] for i, v in enumerate(ids)}
    exp = {}
    for v in ids:
        v = int(v)
        if v % 2 == 0 and v + 1 in by_id:
            a, b = by_id[v], by_id[v + 1]
            exp[v >> 1] = float(
                a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
            )
    assert out.num_rows == len(exp)  # unpartnered trailing row dropped
    got_pairs = out["pair_id"].to_pylist()
    assert got_pairs == sorted(exp)
    got_cos = out["cosine"].to_numpy()
    ref_cos = np.array([exp[p] for p in got_pairs])
    np.testing.assert_allclose(got_cos, ref_cos, rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(
        out["aligned"].to_numpy(), (ref_cos >= ALIGN_TAU).astype(np.int32)
    )
    # geometry sanity: every p%3==0 pair aligned, the rest overwhelmingly not
    aligned = set(
        p for p, f in zip(got_pairs, out["aligned"].to_pylist()) if f
    )
    assert all(p in aligned for p in range(0, 300, 3) if p % 3 == 0)


def test_clip_align_testdata_vs_duckdb(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.001"
    out = q_clip_align(sf)
    orc = duckdb.sql(
        f"""
        SELECT pair_id, cosine,
               CAST(cosine >= {ALIGN_TAU} AS INTEGER) AS aligned FROM (
            SELECT a.vec_id // 2 AS pair_id,
                   list_cosine_similarity(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]) AS cosine
            FROM read_parquet('{sf}/embeddings.parquet') a
            JOIN read_parquet('{sf}/embeddings.parquet') b
              ON b.vec_id = a.vec_id + 1
            WHERE a.vec_id % 2 = 0)
        ORDER BY pair_id
        """
    ).arrow()
    assert out.num_rows == orc.num_rows
    np.testing.assert_array_equal(
        out["pair_id"].to_numpy(), orc["pair_id"].to_numpy()
    )
    np.testing.assert_allclose(
        out["cosine"].to_numpy(), orc["cosine"].to_numpy(), atol=1e-12
    )
    np.testing.assert_array_equal(
        out["aligned"].to_numpy(),
        orc["aligned"].to_numpy().astype(np.int32),
    )
