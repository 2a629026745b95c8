"""Rows-only / property tests for the non-SQL-expressible ops (simhash,
langid, fingerprints, IVF recall) plus kernel unit tests."""

import numpy as np
import pytest

from spider_ray.kernels import tokens as tk


def test_minhash_similarity_estimate():
    a = tk.shingle_hashes("the quick brown fox jumps over the lazy dog " * 5)
    b = tk.shingle_hashes("the quick brown fox jumps over the lazy cat " * 5)
    sa, sb = tk.minhash_signature(a), tk.minhash_signature(b)
    est = (sa == sb).mean()
    true_j = tk.jaccard(a, b)
    assert abs(est - true_j) < 0.2


def test_lsh_identical_docs_share_all_bands():
    a = tk.shingle_hashes("alpha beta gamma delta epsilon zeta")
    ka = tk.lsh_band_keys(tk.minhash_signature(a))
    kb = tk.lsh_band_keys(tk.minhash_signature(a.copy()))
    assert (ka == kb).all()


def test_minhash_batch_matches_scalar():
    """Batched minhash + band keys must be bit-identical to the per-doc
    scalar kernels, including empty docs interleaved and slab boundaries
    (SLAB_TOKENS forced tiny via a long doc list)."""
    rng = np.random.RandomState(7)
    docs = []
    for i in range(50):
        if i % 7 == 3:
            docs.append(np.array([], dtype=np.uint64))
        else:
            docs.append(
                rng.randint(1, 2**62, size=rng.randint(1, 400)).astype(np.uint64)
            )
    flat = np.concatenate(docs)
    off = np.cumsum([0] + [d.size for d in docs])
    sigs = tk.minhash_signature_batch(flat, off)
    keys = tk.lsh_band_keys_batch(sigs)
    for i, d in enumerate(docs):
        np.testing.assert_array_equal(sigs[i], tk.minhash_signature(d))
        np.testing.assert_array_equal(keys[i], tk.lsh_band_keys(sigs[i]))


def test_simhash_bands_batch_matches_scalar():
    rng = np.random.RandomState(11)
    sigs = rng.randint(0, 2**63, size=200).astype(np.uint64)
    sigs[0] = 0
    sigs[1] = np.uint64(2**64 - 1)
    for bands in (4, 8):
        got = tk.simhash_bands_batch(sigs, bands=bands)
        for i, s in enumerate(sigs):
            assert got[i].tolist() == tk.simhash_bands(int(s), bands=bands)


def test_simhash_stability_and_locality():
    t1 = "spark group query row data slow small filter customer line" * 3
    t2 = t1 + " extra"
    s1, s2 = tk.simhash(t1), tk.simhash(t2)
    assert s1 == tk.simhash(t1)
    assert tk.hamming64(s1, s2) < 16
    far = tk.simhash("completely different words entirely unrelated content")
    assert tk.hamming64(s1, far) > tk.hamming64(s1, s2)


def test_detect_lang_deterministic():
    assert tk.detect_lang("the cat sat on the mat with the hat") == "en"
    assert tk.detect_lang("der hund und die katze ist von mit") == "de"
    assert tk.detect_lang("这是一个中文句子测试") == "zh"
    assert tk.detect_lang("") == "und"


def test_detect_lang_batch_matches_scalar():
    import random

    cases = [
        "", " ", None, "x", "1 2 3",
        "the cat sat on the mat with the hat",
        "der hund und die katze ist von mit",
        "这是一个中文句子测试",
        "abc 这是 mixed 中文 text the of and",
        "el la de que y en los", "le la de et les des en un",
        "THE OF AND TO IN", "für für für",
        "the, of. and",  # punctuation glued to tokens: NOT stopword hits
        "de de",  # exact tie de/es/fr -> first-wins must pick 'de'
        "la la",  # tie es/fr on 'la' -> 'es' (dict order)
    ]
    rng = random.Random(7)
    vocab = ["the", "of", "und", "der", "la", "de", "le", "que", "y",
             "xyzzy", "foo", "这", "是", "hello", "für", "THE", "Le"]
    for _ in range(300):
        cases.append(
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40)))
        )
    batch = tk.detect_lang_batch(cases).to_pylist()
    assert batch == [tk.detect_lang(t) for t in cases]
    # arrow input path too
    import pyarrow as pa

    arr = pa.chunked_array([cases[:10], cases[10:]], type=pa.string())
    assert tk.detect_lang_batch(arr).to_pylist() == batch


def test_fingerprint_stable_and_edit_sensitive():
    t = "some document body " * 20
    assert tk.doc_fingerprint(t) == tk.doc_fingerprint(t)
    assert tk.doc_fingerprint(t) != tk.doc_fingerprint(t + "x" * 50)


def test_simhash_pairs_pipeline(ray_session, sf_small):
    from spider_ray.functions.dedup import q_simhash_pairs

    t = q_simhash_pairs(sf_small)
    assert t.column_names == ["a_id", "b_id", "hamming"]
    if t.num_rows:
        assert max(t["hamming"].to_pylist()) <= 6


def test_langid_and_fingerprints_run(ray_session, sf_small):
    from spider_ray.functions.text import q_fingerprints, q_langid

    lt = q_langid(sf_small)
    ft = q_fingerprints(sf_small)
    assert lt.num_rows == ft.num_rows == 500
    # deterministic across runs
    assert lt.equals(q_langid(sf_small))
    assert ft.equals(q_fingerprints(sf_small))


def test_semi_filter_path_equals_full_join(ray_session, sf_small):
    """The three verify regimes — broadcast attach (default at this scale),
    semi-filtered distributed joins (value blobs over
    BROADCAST_VERIFY_MAX_BYTES), and the unfiltered full-join fallback
    (pairs over SEMI_FILTER_MAX_IDS) — must produce bit-identical pairs."""
    from spider_ray.functions import dedup as D

    fast = D.q_minhash_lsh_pairs(sf_small)
    old_ids = D.SEMI_FILTER_MAX_IDS
    old_bytes = D.BROADCAST_VERIFY_MAX_BYTES
    try:
        D.BROADCAST_VERIFY_MAX_BYTES = -1  # semi-filter + distributed joins
        mid = D.q_minhash_lsh_pairs(sf_small)
        D.SEMI_FILTER_MAX_IDS = 0  # unfiltered full-join fallback
        slow = D.q_minhash_lsh_pairs(sf_small)
    finally:
        D.SEMI_FILTER_MAX_IDS = old_ids
        D.BROADCAST_VERIFY_MAX_BYTES = old_bytes
    assert fast.equals(mid)
    assert fast.equals(slow)
    assert fast.num_rows > 0  # corpus has planted near-dups


def test_lsh_recall_vs_bruteforce(ray_session, sf_small):
    """Random-hyperplane LSH probes ~half the buckets on this corpus's
    near-isotropic vectors — recall bound reflects that; on clusterable
    embeddings the same machinery gives high recall with far fewer probes."""
    import polars as pl

    from spider_ray.functions.similarity import q_knn_bruteforce, q_knn_lsh

    bf = pl.from_arrow(q_knn_bruteforce(sf_small)).group_by("query_id").agg(
        pl.col("vec_id")
    )
    ls = pl.from_arrow(q_knn_lsh(sf_small)).group_by("query_id").agg(
        pl.col("vec_id")
    )
    j = bf.join(ls, on="query_id", suffix="_l")
    recalls = [
        len(set(a) & set(b)) / len(a)
        for a, b in zip(j["vec_id"].to_list(), j["vec_id_l"].to_list())
    ]
    assert np.mean(recalls) >= 0.4, recalls
    # determinism
    assert q_knn_lsh(sf_small).equals(q_knn_lsh(sf_small))


def test_ivf_recall_vs_bruteforce(ray_session, sf_small):
    from spider_ray.functions.similarity import q_knn_bruteforce, q_knn_ivf

    bf = q_knn_bruteforce(sf_small)
    ivf = q_knn_ivf(sf_small)
    import polars as pl

    bfd = pl.from_arrow(bf).group_by("query_id").agg(pl.col("vec_id"))
    ivd = pl.from_arrow(ivf).group_by("query_id").agg(pl.col("vec_id"))
    j = bfd.join(ivd, on="query_id", suffix="_ivf")
    recalls = [
        len(set(a) & set(b)) / len(a)
        for a, b in zip(j["vec_id"].to_list(), j["vec_id_ivf"].to_list())
    ]
    assert np.mean(recalls) >= 0.75, recalls


def test_ann_recall_holds_at_sf001(ray_session, sf_mid):
    """Recall must hold at the driver's correctness scale too (it was 0.65
    LSH / 0.80 IVF before multi-probe tuning): both variants >= 0.9."""
    import polars as pl

    from spider_ray.functions.similarity import (
        q_knn_bruteforce,
        q_knn_ivf,
        q_knn_lsh,
    )

    bf = pl.from_arrow(q_knn_bruteforce(sf_mid)).group_by("query_id").agg(
        pl.col("vec_id")
    )
    for fn in (q_knn_ivf, q_knn_lsh):
        ap = pl.from_arrow(fn(sf_mid)).group_by("query_id").agg(
            pl.col("vec_id")
        )
        j = bf.join(ap, on="query_id", suffix="_a")
        recalls = [
            len(set(a) & set(b)) / len(a)
            for a, b in zip(j["vec_id"].to_list(), j["vec_id_a"].to_list())
        ]
        assert np.mean(recalls) >= 0.9, (fn.__name__, recalls)


def test_bucket_cogroup_pairs_matches_bruteforce(ray_session):
    """The distributed pair reduce must produce exactly the pairs (and
    co-occurrence counts) of a brute-force bucket scan — and do so without
    any driver-side bucket merge (it returns a lazy Dataset)."""
    import itertools
    from collections import Counter

    import pyarrow as pa
    import ray.data

    from spider_ray.functions.dedup import _bucket_cogroup_pairs

    rng = np.random.RandomState(7)
    buckets = rng.randint(0, 40, size=500).astype(np.uint64)
    docs = rng.randint(0, 60, size=500).astype(np.int64)
    # distinct (bucket, doc) rows — the contract of the exploded tables
    rows = sorted({(int(b), int(d)) for b, d in zip(buckets, docs)})
    t = pa.table(
        {
            "bucket": pa.array([r[0] for r in rows], pa.uint64()),
            "doc_id": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    expected: Counter = Counter()
    by_bucket: dict = {}
    for b, d in rows:
        by_bucket.setdefault(b, []).append(d)
    for ids in by_bucket.values():
        for a, b in itertools.combinations(sorted(set(ids)), 2):
            expected[(a, b)] += 1

    ds = ray.data.from_arrow(t).repartition(8)
    out = _bucket_cogroup_pairs(ds)
    assert isinstance(out, ray.data.Dataset)  # lazy — no driver reduce
    got = Counter()
    for r in out.to_pandas().itertuples():
        got[(r.a_id, r.b_id)] = r.n_shared
    assert got == expected


def test_bucket_cogroup_pairs_degenerate_hot_bucket(ray_session):
    """Skew stress: one degenerate bucket holding 300 docs (the O(n²)
    worst case the band-width knob bounds) plus normal buckets must still
    produce the exact brute-force pair set — the hot bucket lands in ONE
    partition worker and expands there without driver involvement."""
    import itertools
    from collections import Counter

    import pyarrow as pa
    import ray.data

    from spider_ray.functions.dedup import _bucket_cogroup_pairs

    rng = np.random.RandomState(3)
    hot = [(7, int(d)) for d in range(300)]  # one bucket, 300 docs
    cold = sorted(
        {
            (int(b), int(d))
            for b, d in zip(
                rng.randint(100, 140, size=200), rng.randint(0, 500, size=200)
            )
        }
    )
    rows = hot + cold
    t = pa.table(
        {
            "bucket": pa.array([r[0] for r in rows], pa.uint64()),
            "doc_id": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    expected: Counter = Counter()
    by_bucket: dict = {}
    for b, d in rows:
        by_bucket.setdefault(b, []).append(d)
    for ids in by_bucket.values():
        for a, b in itertools.combinations(sorted(set(ids)), 2):
            expected[(a, b)] += 1
    assert len(expected) > 44_000  # the hot bucket alone yields C(300,2)

    out = _bucket_cogroup_pairs(ray.data.from_arrow(t).repartition(8))
    got = Counter()
    for r in out.to_pandas().itertuples():
        got[(r.a_id, r.b_id)] = r.n_shared
    assert got == expected


def test_map_batches_transient_failure_retries(ray_session):
    """Fault-tolerance contract the crawl/dedup pipelines rely on: a task
    that dies once (worker crash) is retried by Ray and the pipeline
    completes with the exact same result — no rows lost or duplicated."""
    import os

    import pyarrow as pa
    import ray.data

    marker = "/tmp/spider_ray_transient_fail_marker"
    if os.path.exists(marker):
        os.unlink(marker)

    def flaky(batch: pa.Table) -> pa.Table:
        if not os.path.exists(marker):
            open(marker, "w").close()
            os.kill(os.getpid(), 9)  # simulate a worker crash, once
        return batch

    ds = ray.data.range(10_000, override_num_blocks=4).map_batches(
        flaky, batch_format="pyarrow", batch_size=None
    )
    total = ds.sum("id")
    assert total == 10_000 * 9_999 // 2
    os.unlink(marker)


def test_embedding_neardup_lsh_recall(ray_session, sf_small):
    """The LSH-bucketed scale path must recover ≥0.9 of the exact O(N²)
    variant's pairs with perfect precision (the verify is exact cosine)."""
    from spider_ray.functions.dedup import q_embedding_neardup
    from spider_ray.functions.similarity import q_embedding_neardup_lsh

    exact = q_embedding_neardup(sf_small)
    lsh = q_embedding_neardup_lsh(sf_small)
    ep = set(zip(exact["a_id"].to_pylist(), exact["b_id"].to_pylist()))
    lp = set(zip(lsh["a_id"].to_pylist(), lsh["b_id"].to_pylist()))
    assert lp <= ep  # exact verify ⇒ no false positives
    assert len(lp & ep) / max(len(ep), 1) >= 0.9


def test_embedding_neardup_exact_guarded(ray_session, sf_small, monkeypatch):
    """The exact O(N²) variant must refuse corpus-scale inputs (it is the
    oracle twin of the LSH path, not a scale path) — and the override flag
    must still work."""
    import pytest

    from spider_ray.functions import dedup

    monkeypatch.setattr(dedup, "EXACT_NEARDUP_MAX_ROWS", 1)
    with pytest.raises(ValueError, match="q_embedding_neardup_lsh"):
        dedup.q_embedding_neardup(sf_small)
    out = dedup.q_embedding_neardup(sf_small, allow_full_matrix=True)
    assert out.num_rows >= 0  # override runs to completion


def test_vec_matrix_empty_block_keeps_dim():
    """An empty Arrow block must flow through the ANN/near-dup batch fns as
    an empty (0, dim) matrix — a (0, 0) return crashes every downstream
    matmul against a (dim, k) operand (empty row group / over-split read)."""
    import pyarrow as pa

    from spider_ray.functions.similarity import _vec_matrix

    empty = pa.chunked_array([], type=pa.list_(pa.float32()))
    M = _vec_matrix(empty, dim=64)
    assert M.shape == (0, 64)
    # downstream shapes survive: matmul, normalize, nonzero
    Q = np.ones((5, 64))
    C = Q @ M.T
    assert C.shape == (5, 0) and np.nonzero(C >= 0.5)[0].size == 0
    # non-empty path ignores dim
    col = pa.array([[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float32()))
    assert _vec_matrix(col, dim=64).shape == (2, 2)


def test_simhash_batch_matches_scalar():
    """simhash_batch must be bit-identical to per-doc simhash, including
    empty docs interleaved between non-empty ones."""
    texts = [
        "spark group query row data slow" * 3,
        "",
        "completely different words entirely unrelated content",
        "",
        "",
        "the quick brown fox jumps over the lazy dog",
    ]
    batch = tk.simhash_batch(texts)
    scalar = [tk.simhash(t) for t in texts]
    assert batch.tolist() == scalar


def test_semantic_dedup_matches_flat_recompute(ray_session, sf_small):
    """The distributed SemDeDup pass (broadcast-state assignment +
    groupby(cluster).map_groups prune) must equal a single-process flat
    recompute over the full matrix with the same frozen kernels — this
    pins the DISTRIBUTED plumbing (partitioning, group routing, sort)
    independently of the DuckDB oracle."""
    import pyarrow.parquet as pq

    from spider_ray.functions import similarity as S

    out = S.q_semantic_dedup(sf_small)
    # flat recompute
    t = pq.read_table(
        sf_small + "/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = S._ids64(t["vec_id"])
    order = np.argsort(ids)
    ids = ids[order]
    M = S._vec_matrix(t["embedding"])[order]
    n = len(ids)
    stride = (n + S.IVF_TRAIN_MAX - 1) // S.IVF_TRAIN_MAX
    from spider_ray.kernels.hashing import mix64_int

    gate = (mix64_int(ids) % np.uint64(stride)) == 0 if stride > 1 else (
        np.ones(n, bool)
    )
    Sv, Nv = S._kmeans_int(S._quantize_ivf(M[gate]), S.IVF_CENTROIDS)
    assign = S._ivf_dist(S._quantize_ivf(M), Sv, Nv).argmin(1)
    Mn = S._normalize(M)
    exp_cluster, exp_dup, exp_is = [], [], []
    for i in range(n):
        mates = np.flatnonzero(
            (assign == assign[i]) & (ids < ids[i])
        )
        cos = Mn[mates] @ Mn[i]
        hit = mates[cos >= S.SEM_TAU]
        exp_cluster.append(int(assign[i]))
        exp_dup.append(int(ids[hit].min()) if len(hit) else None)
        exp_is.append(1 if len(hit) else 0)
    assert out["vec_id"].to_pylist() == ids.tolist()
    assert out["cluster"].to_pylist() == exp_cluster
    assert out["dup_of"].to_pylist() == exp_dup
    assert out["is_dup"].to_pylist() == exp_is
    # the threshold yields a real prune on this corpus
    assert 0 < sum(exp_is) < n
    # determinism
    assert S.q_semantic_dedup(sf_small).equals(out)


def test_hard_negatives_invariants(ray_session, sf_small):
    """Partner exclusion, rank contiguity, frozen-order consistency with
    crossmodal_recall's gallery, and determinism."""
    import polars as pl

    from spider_ray.functions import similarity as S

    out = pl.from_arrow(S.q_hard_negatives(sf_small))
    assert out.height > 0
    # never the true partner; negatives are gallery members (even, gated)
    assert (out["neg_vec_id"] != out["pair_id"] * 2).all()
    assert (out["neg_vec_id"] % 2 == 0).all()
    assert ((out["neg_vec_id"] // 2) % S.EVAL_MOD == 0).all()
    # per-pair ranks are exactly 1..K and cosine is non-increasing in rank
    per = out.group_by("pair_id").agg(
        pl.col("rank").sort().alias("ranks"),
        pl.col("cosine").sort_by("rank").alias("cs"),
    )
    for ranks, cs in zip(per["ranks"].to_list(), per["cs"].to_list()):
        assert ranks == list(range(1, S.HARD_NEG_K + 1))
        assert all(a >= b for a, b in zip(cs, cs[1:]))
    # every benchmark caption is mined
    n_pairs = out["pair_id"].n_unique()
    import pyarrow.parquet as pq

    ids = S._ids64(
        pq.read_table(sf_small + "/embeddings.parquet", columns=["vec_id"])[
            "vec_id"
        ]
    )
    expected = int((((ids % 2 == 1) & ((ids >> 1) % S.EVAL_MOD == 0)).sum()))
    assert n_pairs == expected
    assert S.q_hard_negatives(sf_small).equals(S.q_hard_negatives(sf_small))
