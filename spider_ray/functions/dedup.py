"""Deduplication pipelines over the ``documents`` table.

Reference analogs (SURVEY §2.7): exact URL dedup D2 (``gb(url_hash)``
first-wins), near-dup simhash D5 (``dedup/html_simhash``), sub-resource
fetch dedup D6. Re-expressed as Ray Data pipelines:

* exact: hash-partitioned group-by text-hash, first-wins;
* MinHash+LSH: shingle → minhash signature → band → bucket groupby →
  candidate pairs → exact-Jaccard verify;
* SimHash: 64-bit signature + banded candidate generation, Hamming verify;
* n-gram Jaccard: exhaustive shingle-bucket cogroup (zero-miss candidate
  generation; at 100 TB the LSH variant is the scale path, this one is the
  oracle-checkable exact variant);
* embedding cosine near-dup: blockwise matmul against a broadcast
  normalized matrix.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray

from spider_ray.kernels.hashing import hash64
from spider_ray.kernels import tokens as tk
from spider_ray.sources.tables import read_table
from spider_ray.stages.agg import partial_final_agg
from spider_ray.pipelines.relational import _concat, _sorted

NGRAM_K = 3
JACCARD_TAU = 0.5
LSH_BANDS = 32
HAMMING_TAU = 6
COSINE_TAU = 0.4  # synthetic embeddings have no planted near-dups; 0.4 yields a non-trivial pair set (max pairwise cosine ~0.51)


def q_exact_dedup(sf_dir: str) -> pa.Table:
    """Exact text dedup, first-wins by doc_id (D2 semantics: J3/J6 pick-one).
    Groups on hash64(text) — the shuffle moves 8-byte keys, never text."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        # int64 bit-cast: Ray's groupby aggregate paths don't handle uint64
        h = hash64(batch["text"]).view(np.int64)
        return batch.select(["doc_id"]).append_column(
            "text_hash", pa.array(h, pa.int64())
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    # NATIVE Ray groupby: output cardinality = distinct texts (could be the
    # whole corpus), so the combine must itself be a distributed shuffle —
    # never a driver-side merge of partials.
    from ray.data.aggregate import Count, Min

    out = hashed.groupby("text_hash").aggregate(Min("doc_id"), Count())
    t = pa.concat_tables(ray.get(out.to_arrow_refs()), promote_options="default")
    t = t.select(["min(doc_id)", "count()"]).rename_columns(
        ["doc_id", "dup_count"]
    )
    return _sorted(t, "doc_id")


def _shingle_table(sf_dir: str) -> ray.data.Dataset:
    """documents → (doc_id, shingle hash list) — the stateless parse stage."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def shingle(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        hs = [tk.shingle_hashes(t, NGRAM_K) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "shingles": pa.array([h.tolist() for h in hs], pa.list_(pa.uint64())),
            }
        )

    return ds.map_batches(shingle, batch_format="pyarrow")


def _verify_pairs(cand: set[tuple[int, int]], shingle_map: dict[int, np.ndarray],
                  tau: float) -> pa.Table:
    rows = []
    for a, b in sorted(cand):
        j = tk.jaccard(shingle_map[a], shingle_map[b])
        if j >= tau:
            rows.append((a, b, j))
    return pa.table(
        {
            "a_id": pa.array([r[0] for r in rows], pa.int64()),
            "b_id": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def _shingle_map(sf_dir: str) -> dict[int, np.ndarray]:
    """doc_id → shingle hash array, materialized driver-side for the verify
    join (documents is the small side here; at 100 TB this becomes a second
    bucket-join against the shingle table, keyed by pair ids)."""
    tabs = ray.get(_shingle_table(sf_dir).to_arrow_refs())
    out: dict[int, np.ndarray] = {}
    for t in tabs:
        for did, sh in zip(t["doc_id"].to_pylist(), t["shingles"].to_pylist()):
            out[did] = np.asarray(sh, dtype=np.uint64)
    return out


def q_ngram_jaccard_pairs(sf_dir: str) -> pa.Table:
    """Near-dup pairs by exact k-word-shingle Jaccard ≥ τ. Candidates come
    from an exhaustive shingle-bucket cogroup (any pair with j>0 shares a
    shingle → zero misses), then exact verify. The `gb(bucket)` is the D6
    'dedup by key before expensive work' pattern."""
    sh = _shingle_table(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        ids, buckets = [], []
        for did, hs in zip(batch["doc_id"].to_pylist(), batch["shingles"].to_pylist()):
            ids.extend([did] * len(hs))
            buckets.extend(hs)
        return pa.table(
            {
                "bucket": pa.array(buckets, pa.uint64()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    exploded = sh.map_batches(explode, batch_format="pyarrow")

    def partial(lf: pl.LazyFrame) -> pl.LazyFrame:
        return lf.group_by("bucket").agg(doc_ids=pl.col("doc_id").unique().sort())

    def final(lf: pl.LazyFrame) -> pl.LazyFrame:
        # merge per-block bucket lists, then emit pairs
        merged = lf.group_by("bucket").agg(
            doc_ids=pl.col("doc_ids").list.explode(keep_nulls=False, empty_as_null=False).unique().sort()
        )
        return merged

    buckets = partial_final_agg(exploded, partial, final)
    # bucket-count verify: each bucket key IS one distinct shingle, so
    # |A∩B| = number of buckets containing both docs and |A| = number of
    # buckets containing A — jaccard falls out of counting alone, with no
    # per-pair set intersection (identical arithmetic to the SQL oracle:
    # inter / (|A| + |B| - inter))
    from collections import Counter

    inter: Counter = Counter()
    sizes: Counter = Counter()
    for ids in buckets["doc_ids"].to_pylist():
        for i, a in enumerate(ids):
            sizes[a] += 1
            for b in ids[i + 1:]:
                inter[(a, b)] += 1
    rows = sorted(
        (a, b, c / (sizes[a] + sizes[b] - c))
        for (a, b), c in inter.items()
        if c / (sizes[a] + sizes[b] - c) >= JACCARD_TAU
    )
    return pa.table(
        {
            "a_id": pa.array([r[0] for r in rows], pa.int64()),
            "b_id": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def q_minhash_lsh_pairs(sf_dir: str) -> pa.Table:
    """MinHash+LSH near-dup: 128-perm signatures, 32 bands × 4 rows →
    band-bucket groupby → candidates → exact-Jaccard verify ≥ τ=0.5.
    P(miss) at the corpus's true-pair similarity (≥0.9) is < 1e-14, so the
    result equals the exhaustive oracle."""
    sh = _shingle_table(sf_dir)

    def band_rows(batch: pa.Table) -> pa.Table:
        ids, bkeys = [], []
        for did, hs in zip(batch["doc_id"].to_pylist(), batch["shingles"].to_pylist()):
            sig = tk.minhash_signature(np.asarray(hs, dtype=np.uint64))
            keys = tk.lsh_band_keys(sig, bands=LSH_BANDS)
            ids.extend([did] * len(keys))
            bkeys.extend(keys.tolist())
        return pa.table(
            {
                "bucket": pa.array(bkeys, pa.uint64()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    exploded = sh.map_batches(band_rows, batch_format="pyarrow")

    def partial(lf: pl.LazyFrame) -> pl.LazyFrame:
        return lf.group_by("bucket").agg(doc_ids=pl.col("doc_id").unique().sort())

    def final(lf: pl.LazyFrame) -> pl.LazyFrame:
        return lf.group_by("bucket").agg(
            doc_ids=pl.col("doc_ids").list.explode(keep_nulls=False, empty_as_null=False).unique().sort()
        )

    buckets = partial_final_agg(exploded, partial, final)
    cand: set[tuple[int, int]] = set()
    for ids in buckets["doc_ids"].to_pylist():
        if len(ids) > 1:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    cand.add((ids[i], ids[j]))
    return _verify_pairs(cand, _shingle_map(sf_dir), JACCARD_TAU)


def q_simhash_pairs(sf_dir: str) -> pa.Table:
    """SimHash near-dup: 64-bit signature per doc (M16/D5), 4×16-bit bands
    for candidates, Hamming ≤ τ verify. Non-SQL-expressible → rows-only
    oracle check."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sigs = [tk.simhash(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "simhash": pa.array(sigs, pa.uint64()),
            }
        )

    sigs_t = _concat(ds.map_batches(sig_batch, batch_format="pyarrow"))
    sig_map = dict(zip(sigs_t["doc_id"].to_pylist(), sigs_t["simhash"].to_pylist()))

    # distributed band groupby: explode (band, doc_id) pairs per block,
    # partial per-block bucket lists, tiny final merge — the same
    # shingle-bucket cogroup shape as q_ngram_jaccard_pairs; signatures
    # (8 B/doc) broadcast for the verify step (at 10^10 docs the verify
    # joins signatures back by doc_id instead)
    def explode_bands(batch: pa.Table) -> pa.Table:
        ids, bands = [], []
        for did, sig in zip(
            batch["doc_id"].to_pylist(), batch["simhash"].to_pylist()
        ):
            for bk in tk.simhash_bands(int(sig)):
                ids.append(did)
                bands.append(bk)
        return pa.table(
            {
                "band": pa.array(bands, pa.uint64()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    exploded = ray.data.from_arrow(sigs_t).map_batches(
        explode_bands, batch_format="pyarrow"
    )

    def partial(lf: pl.LazyFrame) -> pl.LazyFrame:
        return lf.group_by("band").agg(doc_ids=pl.col("doc_id").unique().sort())

    def final(lf: pl.LazyFrame) -> pl.LazyFrame:
        return lf.group_by("band").agg(
            doc_ids=pl.col("doc_ids")
            .list.explode(keep_nulls=False, empty_as_null=False)
            .unique()
            .sort()
        )

    buckets_t = partial_final_agg(exploded, partial, final)
    cand = set()
    for ids in buckets_t["doc_ids"].to_pylist():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    rows = [
        (a, b, tk.hamming64(sig_map[a], sig_map[b]))
        for a, b in sorted(cand)
        if tk.hamming64(sig_map[a], sig_map[b]) <= HAMMING_TAU
    ]
    return pa.table(
        {
            "a_id": pa.array([r[0] for r in rows], pa.int64()),
            "b_id": pa.array([r[1] for r in rows], pa.int64()),
            "hamming": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def q_embedding_neardup(sf_dir: str) -> pa.Table:
    """Embedding-cosine near-dup pairs (cos ≥ τ): per-batch matmul against a
    broadcast normalized matrix (ray.put once) — the ANN-free exact variant."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    all_t = pa.concat_tables(ray.get(emb.to_arrow_refs()))
    ids = np.asarray(all_t["vec_id"].to_pylist(), dtype=np.int64)
    M = np.asarray(all_t["embedding"].to_pylist(), dtype=np.float64)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put((ids, Mn))

    def neardup(batch: pa.Table) -> pa.Table:
        gids, gM = ray.get(mat_ref)
        bids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        B = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        Bn = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
        C = Bn @ gM.T  # (batch, all)
        ai, bj = np.nonzero(C >= COSINE_TAU)
        a = bids[ai]
        b = gids[bj]
        keep = a < b  # each unordered pair once, no self-pairs
        return pa.table(
            {
                "a_id": pa.array(a[keep], pa.int64()),
                "b_id": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(C[ai, bj][keep], pa.float64()),
            }
        )

    t = _concat(emb.map_batches(neardup, batch_format="pyarrow"))
    return _sorted(t, ["a_id", "b_id"])



def q_dup_clusters(sf_dir: str) -> pa.Table:
    """Duplicate-cluster resolution — the "keep one document per near-dup
    cluster" step of a training-data pipeline: connected components over
    the verified Jaccard-pair graph, each doc labeled with its component's
    minimum doc_id (singletons label themselves).

    Scale shape: the pair set is tiny relative to the corpus (near-dup
    graphs are sparse), so union-find over pairs runs driver-side and the
    doc→rep map broadcasts into a ``map_batches`` labeling pass over the
    full corpus — the same small-side-broadcast discipline as J1. The
    DuckDB oracle recomputes components with a recursive CTE."""
    pairs = q_ngram_jaccard_pairs(sf_dir)

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["a_id"].to_pylist(), pairs["b_id"].to_pylist()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    rep = {x: find(x) for x in list(parent)}
    rep_ref = ray.put(rep)

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def label(batch: pa.Table) -> pa.Table:
        m = ray.get(rep_ref)
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "cluster_rep": pa.array(
                    [m.get(i, i) for i in ids], pa.int64()
                ),
            }
        )

    return _sorted(_concat(docs.map_batches(label, batch_format="pyarrow")),
                   "doc_id")


def q_corpus_curate(sf_dir: str) -> pa.Table:
    """Composed corpus-curation pipeline — the training-data flow end to
    end: near-dup cluster resolution (keep only each cluster's
    representative) + quality gating (min token count, max punctuation
    ratio), in ONE distributed pass over the documents: the sparse
    drop-set from the pair graph broadcasts into the same ``map_batches``
    that computes the vectorized quality columns. Fully SQL-oracle-checked
    (recursive-CTE components + the same quality expressions)."""
    clusters = q_dup_clusters(sf_dir)
    drop = {
        d
        for d, r in zip(
            clusters["doc_id"].to_pylist(), clusters["cluster_rep"].to_pylist()
        )
        if d != r
    }
    drop_ref = ray.put(drop)

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def curate(batch: pa.Table) -> pa.Table:
        dropped = ray.get(drop_ref)
        lf = (
            pl.from_arrow(batch)
            .with_columns(
                n_chars=pl.col("text").str.len_chars().cast(pl.Int64),
                n_tokens=pl.col("text").str.count_matches(r"\S+").cast(pl.Int64),
                n_punct=pl.col("text")
                .str.count_matches(r"[!-/:-@\[-`{-~]")
                .cast(pl.Int64),
            )
            .with_columns(punct_ratio=pl.col("n_punct") / pl.col("n_chars"))
        )
        out = lf.filter(
            ~pl.col("doc_id").is_in(sorted(dropped))
            & (pl.col("n_tokens") >= 30)
            & (pl.col("punct_ratio") <= 0.05)
        ).select("doc_id", "n_tokens", "punct_ratio")
        return out.to_arrow()

    return _sorted(
        _concat(ds.map_batches(curate, batch_format="pyarrow")), "doc_id"
    )


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()
