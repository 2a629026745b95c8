"""Similarity search over the ``embeddings`` table (``list<float>`` column).

Brute-force cosine top-k: numpy matmul per batch against a broadcast query
matrix (``ray.put`` once, zero-copy read per task) with per-batch top-k and a
small driver-side merge — the pattern scales to any dataset size because only
``k × n_queries`` candidate rows leave each batch.

IVF variant: deterministic seeded k-means centroids (built once, broadcast);
each batch assigns its vectors to centroids, queries probe the ``nprobe``
nearest centroid buckets — the 100 TB scale path where the matmul is
restricted to probed partitions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from spider_ray.kernels.hashing import mix64_int
from spider_ray.pipelines.relational import _concat, _sorted
from spider_ray.sources.tables import read_table

# output contract of the embedding-LSH cosine verify — shared by the
# non-empty path and the empty-result conform
COSINE_PAIR_SCHEMA = pa.schema(
    [("a_id", pa.int64()), ("b_id", pa.int64()), ("cosine", pa.float64())]
)

TOP_K = 10
N_QUERIES = 8
IVF_CENTROIDS = 16
# k-means trains on a hash-gated sample of at most this many rows — the
# driver never pulls the full embedding matrix (at 100 TB the corpus can't
# land on one node; a 100k sample trains centroids just as well).
IVF_TRAIN_MAX = 100_000
# The synthetic embeddings are near-isotropic (no cluster structure), so a
# high nprobe is needed for recall; on clusterable real data nprobe/centroids
# would be tuned down. Measured recall@10: nprobe=4 → 0.63, nprobe=8 →
# 0.85 (sf0.001) / 0.80 (sf0.01), nprobe=12 → 0.95+ at both scales while
# still skipping a quarter of the corpus.
IVF_NPROBE = 12


def _collect_vectors(sf_dir: str, stride: int = 1, max_id: int | None = None):
    """Distributed filter → driver collect of a BOUNDED vector subset:
    rows pass the deterministic hash gate ``mix64(vec_id) % stride == 0``
    (and optionally ``vec_id < max_id``). Only the selected rows ever leave
    the workers; the driver never holds the full matrix."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def pick(batch: pa.Table) -> pa.Table:
        ids = _ids64(batch["vec_id"])
        keep = np.ones(len(ids), dtype=bool)
        if max_id is not None:
            keep &= ids < max_id
        if stride > 1:
            keep &= (mix64_int(ids) % np.uint64(stride)) == 0
        return batch.filter(pa.array(keep))

    t = _concat(ds.map_batches(pick, batch_format="pyarrow"))
    ids = _ids64(t["vec_id"])
    M = _vec_matrix(t["embedding"])
    order = np.argsort(ids)
    return ids[order], M[order]


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def _vec_matrix(col, dim: int = 0) -> np.ndarray:
    """``list<float>`` column → (n, dim) float64 matrix without the
    Python-object round-trip ``to_pylist`` pays (millions of boxed floats
    per batch): one flatten of the child values + reshape. Embeddings are
    fixed-dim; a ragged or null row would break the reshape — asserted.

    ``dim`` is only used for the empty-column case: an empty Arrow block
    (empty row group, over-split dataset) carries no width, and a (0, 0)
    return crashes every downstream ``@`` against a (dim, k) operand —
    batch functions pass the dim they know from their broadcast state so
    empty blocks flow through as empty results instead."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, dim), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False
    )
    assert flat.size % n == 0, "ragged or null embedding column"
    return flat.reshape(n, flat.size // n)


def _ids64(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _blob_matrix(col, dtype=np.float64) -> np.ndarray:
    """Fixed-width binary-blob column → (n, dim) matrix, decoded straight
    from the Arrow values buffer — no per-row ``bytes`` boxing
    (``to_pylist`` on millions of pair rows was the embedding verify's
    hot spot). Assumes no nulls (pair-attach output never has them)."""
    itemsize = np.dtype(dtype).itemsize
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    parts = []
    for c in chunks:
        n = len(c)
        if n == 0:
            continue
        offs = np.frombuffer(c.buffers()[1], dtype=np.int32)[
            c.offset : c.offset + n + 1
        ]
        widths = np.diff(offs)
        w = int(widths[0]) if n else 0
        assert (widths == w).all() and w % itemsize == 0, (
            "ragged blob column"
        )
        vals = np.frombuffer(c.buffers()[2], dtype=np.uint8)
        parts.append(
            vals[offs[0] : offs[-1]].view(dtype).reshape(n, w // itemsize)
        )
    if not parts:
        return np.empty((0, 0), dtype=dtype)
    return parts[0] if len(parts) == 1 else np.vstack(parts)


def _query_matrix(sf_dir: str):
    """The first N_QUERIES vec_ids serve as the query set (deterministic) —
    collected via a distributed filtered read, not a full-matrix pull."""
    ids, M = _collect_vectors(sf_dir, max_id=N_QUERIES)
    return ids, _normalize(M)


def _local_topk(bq_ids, bQ, V, vids, mask_fn) -> pa.Table:
    """Per-batch candidate emission under the GLOBAL (rounded-cosine desc,
    vec_id asc) total order — the ONE definition shared by the IVF and LSH
    probe stages, so a tie-break change can never apply to one and not the
    other (batch-boundary ties would then diverge from the SQL oracles).
    ``mask_fn(qi)`` returns the candidate-row mask for query ``qi``."""
    rows_q, rows_v, rows_c = [], [], []
    for qi in range(bQ.shape[0]):
        mask = mask_fn(qi)
        if not mask.any():
            continue
        full = mask.all()  # skip the fancy-index copy for all-true masks
        c6 = np.round(bQ[qi] @ (V if full else V[mask]).T, 6)
        k = min(TOP_K, c6.size)
        mvids = vids if full else vids[mask]
        # lexsort's LAST key is primary: c6 desc, then vec_id asc
        idx = np.lexsort((mvids, -c6))[:k]
        rows_q.extend([bq_ids[qi]] * k)
        rows_v.extend(mvids[idx].tolist())
        rows_c.extend(c6[idx].tolist())
    return pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            "vec_id": pa.array(rows_v, pa.int64()),
            "cosine": pa.array(rows_c, pa.float64()),
        }
    )


def _topk_merge(cands: pa.Table) -> pa.Table:
    """Final global top-k under the frozen (query_id asc, cosine desc,
    vec_id asc) total order. Cosines must already be rounded to 6 dp so
    the ranking is bit-identical to the DuckDB oracles."""
    import polars as pl

    out = (
        pl.from_arrow(cands)
        .sort(["query_id", "cosine", "vec_id"], descending=[False, True, False])
        .group_by("query_id", maintain_order=True)
        .head(TOP_K)
        .sort(["query_id", "cosine", "vec_id"], descending=[False, True, False])
    )
    return out.to_arrow()


def q_knn_bruteforce(sf_dir: str) -> pa.Table:
    """Exact top-k cosine neighbors of the query set. Per-batch matmul →
    per-batch top-k → driver-side merge of ≤ k·batches candidates."""
    qids, Q = _query_matrix(sf_dir)
    q_ref = ray.put((qids, Q))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def batch_topk(batch: pa.Table) -> pa.Table:
        bq_ids, bQ = ray.get(q_ref)
        if batch.num_rows == 0:  # empty block: (0,0) matrix would crash matmul
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        ids = _ids64(batch["vec_id"])
        M = _normalize(_vec_matrix(batch["embedding"]))
        # delegate to _local_topk — the ONE frozen (rounded-cosine desc,
        # vec_id asc) per-batch cut shared with the IVF/LSH probes, so a
        # tie-break or rounding change can never diverge the brute-force
        # ground truth from the probe paths
        full = np.ones(len(ids), dtype=bool)
        return _local_topk(bq_ids, bQ, M, ids, lambda qi: full)

    cands = _concat(ds.map_batches(batch_topk, batch_format="pyarrow"))
    return _topk_merge(cands)


# Coarser fixed-point scale for the IVF path than the LSH banding's 2^20:
# the k-means state must stay EXACT int64 at the 100k-training-sample
# design bound. With qmax = max|quantized component| (the shipped corpora
# measure qmax ≈ 592 at scale 2^10), dim d and n ≤ IVF_TRAIN_MAX, the
# distance numerator is bounded by |A| ≤ 3·d·n²·qmax² — at d=64, n=1e5
# that requires qmax < 2191 (current margin ≈ 13×). _ivf_dist ASSERTS the
# bound instead of trusting this comment (numpy int64 wraps silently).
IVF_SCALE = 1 << 10
IVF_ITERS = 8


def _quantize_ivf(X: np.ndarray) -> np.ndarray:
    """IVF twin of :func:`_quantize` at the coarser frozen scale."""
    return np.floor(X * float(IVF_SCALE) + 0.5).astype(np.int64)


def _ivf_dist(Xq: np.ndarray, S: np.ndarray, N: np.ndarray) -> np.ndarray:
    """Replayable-double squared-Euclid ranks to integer-state centroids.

    Centroid j is the exact rational s_j/n_j (int64 sum vector + count);
    dropping the per-row constant ‖x‖², argmin over j of
    ‖x − s_j/n_j‖² equals argmin over ``f_j = (‖s_j‖² − 2·n_j·(x·s_j))
    / n_j²``. Numerator and denominator are EXACT int64; each is converted
    to float64 once and divided once — two single IEEE roundings that
    DuckDB reproduces bit-for-bit, with no float summation anywhere. Empty
    centroids rank +inf."""
    # overflow guard: the whole exactness argument is "everything fits
    # int64" — check it with Python ints (numpy would wrap silently).
    # |x·s| ≤ d·qmax·smax, so |A| ≤ d·smax² + 2·Nmax·d·qmax·smax.
    if len(Xq) and len(S):
        d = Xq.shape[1]
        qmax = int(np.abs(Xq).max())
        smax = int(np.abs(S).max())
        nmax = int(N.max())
        bound = d * smax * smax + 2 * nmax * d * qmax * smax
        assert bound < 2**63, (
            f"IVF int64 bound violated (|A| may reach {bound:.3e}); "
            "lower IVF_SCALE or IVF_TRAIN_MAX"
        )
    XS = Xq @ S.T  # (n, k) int64 — exact
    s2 = (S * S).sum(axis=1)  # (k,) int64 — exact
    A = s2[None, :] - 2 * (XS * N[None, :])
    den = (N * N).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        f = A.astype(np.float64) / den[None, :]
    f[:, N == 0] = np.inf
    return f


def _kmeans_int(Q: np.ndarray, k: int, iters: int = IVF_ITERS):
    """Deterministic seeded k-means over QUANTIZED vectors with INTEGER
    state: centroids live as (sum-vector, count) pairs so every iteration —
    seeding (evenly spaced rows of the id-sorted matrix, n=1), assignment
    (:func:`_ivf_dist`, first-min tie-break = ORDER BY f, j), update (exact
    int64 sums; empty clusters carry the previous state forward) — replays
    exactly in the DuckDB oracle. O(n·k) memory via the matmul identity."""
    n = Q.shape[0]
    seed_idx = (np.arange(k) * max(n // k, 1)) % n
    S = Q[seed_idx].copy()
    N = np.ones(k, dtype=np.int64)
    for _ in range(iters):
        assign = _ivf_dist(Q, S, N).argmin(1)
        sums = np.zeros((k, Q.shape[1]), dtype=np.int64)
        np.add.at(sums, assign, Q)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        nz = counts > 0
        S[nz] = sums[nz]
        N[nz] = counts[nz]
    return S, N


def q_knn_ivf(sf_dir: str) -> pa.Table:
    """IVF approximate top-k: assign vectors to 16 integer-state k-means
    centroid buckets; probe the nprobe closest buckets per query. Centroids
    train on a hash-gated sample of ≤ IVF_TRAIN_MAX rows (assignment +
    probing stay fully distributed). Every stage — sample gate, quantized
    integer k-means (:func:`_kmeans_int`), replayable-double distance ranks
    (:func:`_ivf_dist`), probe ordering, rounded-cosine top-k under the
    (cosine desc, vec_id asc) total order — replays exactly in the DuckDB
    oracle; recall ≥ 0.9 vs q_knn_bruteforce is ALSO pytest-asserted."""
    n_total = read_table(sf_dir, "embeddings", columns=["vec_id"]).count()
    stride = (n_total + IVF_TRAIN_MAX - 1) // IVF_TRAIN_MAX  # int ceil
    ids, M = _collect_vectors(sf_dir, stride=stride)
    S, N = _kmeans_int(_quantize_ivf(M), IVF_CENTROIDS)
    qids, Qraw = _collect_vectors(sf_dir, max_id=N_QUERIES)
    Q = _normalize(Qraw)
    # probe order: replayable-double distance, ties by centroid index
    # (stable argsort == ORDER BY f, j)
    probe = np.argsort(
        _ivf_dist(_quantize_ivf(Qraw), S, N), axis=1, kind="stable"
    )[:, :IVF_NPROBE]
    state_ref = ray.put((qids, Q, S, N, probe))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def batch_probe(batch: pa.Table) -> pa.Table:
        bq_ids, bQ, bS, bN, bprobe = ray.get(state_ref)
        vids = _ids64(batch["vec_id"])
        Vraw = _vec_matrix(batch["embedding"], dim=bQ.shape[1])
        V = _normalize(Vraw)
        assign = _ivf_dist(_quantize_ivf(Vraw), bS, bN).argmin(1)
        return _local_topk(
            bq_ids, bQ, V, vids, lambda qi: np.isin(assign, bprobe[qi])
        )

    cands = _concat(ds.map_batches(batch_probe, batch_format="pyarrow"))
    return _topk_merge(cands)


def _lsh_bits(n: int) -> int:
    """Adaptive signature width: target ~64 vectors per bucket (on this
    corpus's near-isotropic embeddings small buckets destroy recall).
    Capped at 16 — the DuckDB oracle's sign table is provisioned for 16
    planes (``range(16)`` — its table functions only take constants), and
    65,536 buckets is already past the useful width for one table."""
    return min(16, max(3, int(np.log2(max(n / 64, 2)))))


def q_knn_lsh(sf_dir: str) -> pa.Table:
    """LSH-bucketed approximate top-k (the other scale path next to IVF):
    INTEGER-EXACT Rademacher signatures (see ``_rademacher_signs``; table
    index 0) put vectors into 2^bits buckets; each query multi-probes its
    own bucket plus all single-bit flips plus two-bit flips over the 4
    lowest-|margin| hyperplanes. Margins are exact int64 sums of quantized
    components, so the probe sets — and therefore the candidate set —
    replay exactly in the DuckDB oracle; per-batch local top-k uses the
    same (rounded-cosine desc, vec_id asc) total order as the global
    merge, so batch-boundary ties cannot diverge. Recall vs brute force is
    ALSO pytest-asserted."""
    n_total = read_table(sf_dir, "embeddings", columns=["vec_id"]).count()
    bits = _lsh_bits(n_total)
    qids, Qraw = _collect_vectors(sf_dir, max_id=N_QUERIES)
    Q = _normalize(Qraw)
    S = _rademacher_signs(Qraw.shape[1], 1, bits)[0]  # (dim, bits)
    Qq = _quantize(Qraw)
    margins = Qq @ S  # (nq, bits) int64 — exact
    base = ((margins > 0) @ (1 << np.arange(bits))).astype(np.int64)
    probe_sets = []
    for qi in range(Q.shape[0]):
        # multi-probe: own bucket + ALL single-bit flips, plus two-bit
        # flips over the 4 lowest-margin hyperplanes (the bits most likely
        # to be on the wrong side for a true neighbor). STABLE argsort over
        # integer |margins| with index tie-break = the SQL oracle's
        # ORDER BY abs(m), b
        codes = {int(base[qi])}
        order = np.argsort(np.abs(margins[qi]), kind="stable")
        for f in order:
            codes.add(int(base[qi]) ^ (1 << int(f)))
        low = [int(f) for f in order[: min(4, len(order))]]
        for i in range(len(low)):
            for j in range(i + 1, len(low)):
                codes.add(int(base[qi]) ^ (1 << low[i]) ^ (1 << low[j]))
        probe_sets.append(np.array(sorted(codes), dtype=np.int64))
    state_ref = ray.put((qids, Q, S, probe_sets))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def batch_probe(batch: pa.Table) -> pa.Table:
        bq_ids, bQ, bS, bprobes = ray.get(state_ref)
        vids = _ids64(batch["vec_id"])
        Vraw = _vec_matrix(batch["embedding"], dim=bQ.shape[1])
        V = _normalize(Vraw)
        Vq = _quantize(Vraw)
        codes = ((Vq @ bS) > 0) @ (1 << np.arange(bS.shape[1]))
        codes = codes.astype(np.int64)
        return _local_topk(
            bq_ids, bQ, V, vids, lambda qi: np.isin(codes, bprobes[qi])
        )

    cands = _concat(ds.map_batches(batch_probe, batch_format="pyarrow"))
    return _topk_merge(cands)


# --- cross-modal retrieval evaluation --------------------------------------

# Every EVAL_MODth pair (pair_id % EVAL_MOD == 0) is the held-out retrieval
# benchmark — same deterministic-subset convention as the text/image
# decontaminate ops (seq % 17). Gallery = the eval pairs' image vectors;
# queries = the same pairs' caption vectors, so recall@k is well-defined
# (the true partner is always present).
EVAL_MOD = 17
RECALL_KS = (1, 5, 10)


def q_crossmodal_recall(sf_dir: str) -> pa.Table:
    """Caption→image retrieval evaluation over the paired embedding table
    (even vec_id = image side, odd = its caption; pair_id = vec_id >> 1 —
    the q_clip_align convention): for every benchmark caption, the rank of
    its true image among the benchmark gallery under (rounded-cosine desc,
    vec_id asc) — the frozen _local_topk total order — plus recall@k hit
    flags. The metric a CLIP-filtered corpus is validated with.

    Scale shape: the gallery is the EVAL subset (bounded by design — a
    retrieval benchmark, not the corpus): distributed filtered read →
    one ``ray.put`` broadcast. The query side streams; each batch does one
    (B × N) matmul and two vectorized comparisons — rank is computed by
    COUNTING strictly-better gallery entries, never by sorting the row.
    SQL-oracled bit-exact (cosines rounded to 6 dp on both engines, the
    knn_bruteforce convention)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def pick_gallery(batch: pa.Table) -> pa.Table:
        ids = _ids64(batch["vec_id"])
        keep = (ids % 2 == 0) & ((ids >> 1) % EVAL_MOD == 0)
        return batch.filter(pa.array(keep))

    gal = _concat(ds.map_batches(pick_gallery, batch_format="pyarrow"))
    order = np.argsort(_ids64(gal["vec_id"]), kind="stable")
    gal_ids = _ids64(gal["vec_id"])[order]
    G = _normalize(_vec_matrix(gal["embedding"]))[order]
    dim = G.shape[1]
    g_ref = ray.put((gal_ids, G))

    def rank_batch(batch: pa.Table) -> pa.Table:
        bg_ids, bG = ray.get(g_ref)
        ids = _ids64(batch["vec_id"])
        keep = (ids % 2 == 1) & ((ids >> 1) % EVAL_MOD == 0)
        if not keep.any():
            return pa.table(
                {
                    "pair_id": pa.array([], pa.int64()),
                    "true_rank": pa.array([], pa.int64()),
                    **{
                        f"hit{k}": pa.array([], pa.int32())
                        for k in RECALL_KS
                    },
                }
            )
        Q = _normalize(_vec_matrix(batch["embedding"], dim)[keep])
        pid = ids[keep] >> 1
        true_img = pid * 2
        pos = np.searchsorted(bg_ids, true_img)
        assert (bg_ids[pos] == true_img).all(), "true partner not in gallery"
        C6 = np.round(Q @ bG.T, 6)
        t6 = C6[np.arange(len(pid)), pos]
        better = (C6 > t6[:, None]).sum(axis=1)
        tied_lower = (
            (C6 == t6[:, None]) & (bg_ids[None, :] < true_img[:, None])
        ).sum(axis=1)
        rank = 1 + better + tied_lower
        cols = {
            "pair_id": pa.array(pid, pa.int64()),
            "true_rank": pa.array(rank.astype(np.int64), pa.int64()),
        }
        for k in RECALL_KS:
            cols[f"hit{k}"] = pa.array(
                (rank <= k).astype(np.int32), pa.int32()
            )
        return pa.table(cols)

    out = _concat(ds.map_batches(rank_batch, batch_format="pyarrow"))
    return _sorted(out, "pair_id")


# top non-partner gallery entries mined per benchmark caption
HARD_NEG_K = 8


def q_hard_negatives(sf_dir: str) -> pa.Table:
    """Hard-negative mining for contrastive training (the CLIP-style
    batch-construction op): for every benchmark caption, the HARD_NEG_K
    most-similar gallery IMAGES that are NOT its true partner — the
    negatives a contrastive epoch should oversample. Same eval subset,
    broadcast-gallery shape, and frozen (rounded-cosine desc, vec_id asc)
    total order as :func:`q_crossmodal_recall`; ranking is one stable
    argsort of the (B × N) rounded-cosine block per batch — ties resolve
    to ascending gal id because the gallery columns are id-sorted.

    Output (pair_id, neg_vec_id, cosine, rank 1..K) sorted by
    (pair_id, rank); SQL-oracled bit-exact."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def pick_gallery(batch: pa.Table) -> pa.Table:
        ids = _ids64(batch["vec_id"])
        keep = (ids % 2 == 0) & ((ids >> 1) % EVAL_MOD == 0)
        return batch.filter(pa.array(keep))

    gal = _concat(ds.map_batches(pick_gallery, batch_format="pyarrow"))
    order = np.argsort(_ids64(gal["vec_id"]), kind="stable")
    gal_ids = _ids64(gal["vec_id"])[order]
    G = _normalize(_vec_matrix(gal["embedding"]))[order]
    dim = G.shape[1]
    g_ref = ray.put((gal_ids, G))
    empty = pa.table(
        {
            "pair_id": pa.array([], pa.int64()),
            "neg_vec_id": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
            "rank": pa.array([], pa.int64()),
        }
    )

    def mine_batch(batch: pa.Table) -> pa.Table:
        bg_ids, bG = ray.get(g_ref)
        ids = _ids64(batch["vec_id"])
        keep = (ids % 2 == 1) & ((ids >> 1) % EVAL_MOD == 0)
        if not keep.any():
            return empty
        Q = _normalize(_vec_matrix(batch["embedding"], dim)[keep])
        pid = ids[keep] >> 1
        C6 = np.round(Q @ bG.T, 6)
        # gallery columns are id-ascending, so a STABLE argsort of -C6
        # along the row is exactly (cosine desc, vec_id asc)
        idx = np.argsort(-C6, axis=1, kind="stable")[:, : HARD_NEG_K + 1]
        cand_ids = bg_ids[idx]  # (B, K+1)
        not_partner = cand_ids != (pid * 2)[:, None]
        # keep the first K non-partner columns per row
        col_rank = np.cumsum(not_partner, axis=1)
        take = not_partner & (col_rank <= HARD_NEG_K)
        ri, ci = np.nonzero(take)
        return pa.table(
            {
                "pair_id": pa.array(pid[ri], pa.int64()),
                "neg_vec_id": pa.array(cand_ids[ri, ci], pa.int64()),
                "cosine": pa.array(
                    C6[ri, idx[ri, ci]], pa.float64()
                ),
                "rank": pa.array(col_rank[ri, ci], pa.int64()),
            }
        )

    out = _concat(
        ds.map_batches(mine_batch, batch_format="pyarrow"), schema=empty.schema
    )
    return _sorted(out, ["pair_id", "rank"])


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()


# --- embedding near-dup, LSH-bucketed scale path ----------------------------

# Few bits + many tables because the synthetic corpus's pair threshold
# (cos ≥ 0.4 ⇒ collision prob ≈ 0.63/bit) is low; a real near-dup corpus
# (cos ≥ 0.9 ⇒ ≈ 0.86/bit) would use more bits and fewer tables.
EMB_LSH_TABLES = 12
EMB_LSH_BITS = 3
# fixed-point quantization scale + sign-derivation seed for the
# INTEGER-EXACT banding scheme (see _rademacher_signs): frozen — the
# DuckDB oracle replays both
EMB_LSH_SCALE = 1 << 20
EMB_LSH_SEED = 20260817


def _rademacher_signs(dim: int, tables: int, bits: int) -> np.ndarray:
    """±1 hyperplane signs derived from the frozen SQL-expressible
    ``mix64_int`` kernel — shape (tables, dim, bits), int64.

    Replaces Gaussian RNG hyperplanes for the near-dup banding path so the
    WHOLE pipeline replays exactly in DuckDB: signs come from the parity of
    ``mix64_int(t·1_000_003 + b·10_007 + i, seed=EMB_LSH_SEED)`` (i is
    1-based to match SQL list indexing), components are quantized to
    integers (``floor(x·2^20 + 0.5)``), and the per-bit dot product is an
    exact int64 sum — no float associativity anywhere in bucket
    assignment. Rademacher (±1) projections preserve the random-hyperplane
    locality property (sign-agreement probability still monotone in
    cosine; Achlioptas-style sparse projections)."""
    t_idx, i_idx, b_idx = np.meshgrid(
        np.arange(tables, dtype=np.int64),
        np.arange(dim, dtype=np.int64),
        np.arange(bits, dtype=np.int64),
        indexing="ij",
    )
    keys = t_idx * 1_000_003 + b_idx * 10_007 + (i_idx + 1)
    par = (mix64_int(keys.ravel(), seed=EMB_LSH_SEED) % np.uint64(2)).astype(
        np.int64
    )
    return (2 * par - 1).reshape(tables, dim, bits)


def _quantize(X: np.ndarray) -> np.ndarray:
    """The FROZEN fixed-point quantization the DuckDB oracles replay
    character-for-character (``floor(x·2^20 + 0.5)`` over the float64 view
    of the stored float32) — one definition shared by every Rademacher-LSH
    path so the engine cannot desynchronize from itself or the SQL."""
    return np.floor(X * float(EMB_LSH_SCALE) + 0.5).astype(np.int64)


def q_embedding_neardup_lsh(sf_dir: str) -> pa.Table:
    """Embedding-cosine near-dup pairs via random-hyperplane LSH banding —
    the 100 TB scale path next to the exact O(N²) oracle variant
    (``q_embedding_neardup``): vectors land in EMB_LSH_TABLES independent
    hash tables (EMB_LSH_BITS Rademacher-sign bits each — integer-exact,
    see ``_rademacher_signs``); candidate pairs come from the fully
    distributed bucket cogroup; the cosine verify joins the normalized
    vectors back by id (packed float64 blobs). The whole pipeline —
    quantization, signs, banding, pair generation, cosine verify — replays
    exactly in the DuckDB oracle; recall vs the exact variant is ALSO
    pytest-asserted.
    """
    from spider_ray.functions.dedup import (
        COSINE_TAU,
        _attach_pair_values,
        _bucket_cogroup_pairs,
    )

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    probe = ds.take(1)
    dim = len(probe[0]["embedding"])
    S = _rademacher_signs(dim, EMB_LSH_TABLES, EMB_LSH_BITS)
    s_ref = ray.put(S)
    powers = 1 << np.arange(EMB_LSH_BITS)

    def code_rows(batch: pa.Table) -> pa.Table:
        bS = ray.get(s_ref)
        ids = _ids64(batch["vec_id"])
        # raw values: sign(Σ s·x) is normalization-invariant, and
        # quantizing the RAW float32 values is what the SQL oracle replays
        V = _vec_matrix(batch["embedding"], dim=bS.shape[1])
        Q = _quantize(V)
        out_ids, out_buckets = [], []
        for t in range(bS.shape[0]):
            codes = ((Q @ bS[t]) > 0) @ powers  # int64 dot — exact
            out_ids.append(ids)
            out_buckets.append(
                codes.astype(np.uint64) | (np.uint64(t) << np.uint64(32))
            )
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(out_buckets), pa.uint64()),
                "doc_id": pa.array(np.concatenate(out_ids), pa.int64()),
            }
        )

    def pack(batch: pa.Table) -> pa.Table:
        V = _normalize(
            _vec_matrix(batch["embedding"])
        )
        return pa.table(
            {
                "doc_id": batch["vec_id"].cast(pa.int64()),
                "vb": pa.array([v.tobytes() for v in V], pa.binary()),
            }
        )

    exploded = ds.map_batches(code_rows, batch_format="pyarrow")
    cand = _bucket_cogroup_pairs(exploded).select_columns(["a_id", "b_id"])
    # broadcast attach when the pair list is output-small, distributed
    # re-join (semi-filtered) otherwise; normalized vectors travel as
    # packed float64 blobs either way
    ids_schema = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64())])
    j = _attach_pair_values(
        cand, ds, "vec_id", "vb", pa.binary(), ids_schema, prep=pack
    )

    def verify(batch: pa.Table) -> pa.Table:
        A = _blob_matrix(batch["vb_a"])
        B = _blob_matrix(batch["vb_b"])
        if len(A):
            cos = np.einsum("ij,ij->i", A, B)
        else:
            cos = np.empty(0, dtype=np.float64)
        keep = cos >= COSINE_TAU
        kept = batch.filter(pa.array(keep)).select(["a_id", "b_id"])
        return kept.append_column(
            "cosine", pa.array(cos[keep], pa.float64())
        )

    t = _concat(
        j.map_batches(verify, batch_format="pyarrow"),
        schema=COSINE_PAIR_SCHEMA,
    )
    return _sorted(t, ["a_id", "b_id"])


# --------------------------------------------------------------------------
# semantic dedup (SemDeDup shape)
# --------------------------------------------------------------------------

# Same non-trivial threshold as dedup.COSINE_TAU: the synthetic embeddings
# carry no planted near-dups (max pairwise cosine ~0.51), so 0.4 yields a
# real duplicate set to exercise the prune.
SEM_TAU = 0.4


def q_semantic_dedup(sf_dir: str) -> pa.Table:
    """SemDeDup-style semantic dedup (the Abbas et al. 2023 shape —
    public method): cluster the embedding space with the SAME
    integer-state k-means as :func:`q_knn_ivf` (trained on the hash-gated
    ≤ IVF_TRAIN_MAX sample), then prune WITHIN each cluster — a row is a
    duplicate if some lower-id cluster-mate sits at cosine ≥ SEM_TAU;
    ``dup_of`` is the smallest such mate, NULL for keepers.

    Scale shape: clustering bounds the pairwise work to O(Σ cᵢ²) instead
    of O(N²) — the cluster count is the knob that keeps each cluster's
    in-group cosine block worker-sized (production SemDeDup uses k ≈ 10⁴
    on LAION-scale corpora; here k = IVF_CENTROIDS so the DuckDB oracle
    reuses the knn_ivf k-means replay verbatim). Assignment is a
    broadcast-state map_batches; the per-cluster prune is ONE
    groupby(cluster).map_groups shuffle. Nothing driver-side but the
    (sum, count) centroid state.

    Output (vec_id, cluster, dup_of, is_dup) sorted by vec_id — bit-exact
    vs the SQL oracle: integer k-means assignment (first-argmin == ORDER
    BY f, j), raw-double cosine compare (the q_embedding_neardup
    convention, driver-green)."""
    n_total = read_table(sf_dir, "embeddings", columns=["vec_id"]).count()
    stride = (n_total + IVF_TRAIN_MAX - 1) // IVF_TRAIN_MAX
    _, M = _collect_vectors(sf_dir, stride=stride)
    S, N = _kmeans_int(_quantize_ivf(M), IVF_CENTROIDS)
    state_ref = ray.put((S, N))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def assign(batch: pa.Table) -> pa.Table:
        bS, bN = ray.get(state_ref)
        vids = _ids64(batch["vec_id"])
        Vraw = _vec_matrix(batch["embedding"])
        j = _ivf_dist(_quantize_ivf(Vraw), bS, bN).argmin(1)
        return pa.table(
            {
                "vec_id": pa.array(vids, pa.int64()),
                "cluster": pa.array(j.astype(np.int64), pa.int64()),
                "embedding": batch["embedding"],
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def prune(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = group.take(pc.sort_indices(group["vec_id"]))
        vids = _ids64(g["vec_id"])
        Vn = _normalize(_vec_matrix(g["embedding"]))
        # rows sorted by vec_id: a strict lower triangle restricts each
        # row's mates to strictly smaller vec_ids, and argmax over the
        # boolean row returns the FIRST hit == the smallest mate id
        hit = np.tril(Vn @ Vn.T >= SEM_TAU, k=-1)
        any_dup = hit.any(axis=1)
        dup_of = np.where(any_dup, vids[hit.argmax(axis=1)], 0)
        return pa.table(
            {
                "vec_id": pa.array(vids, pa.int64()),
                "cluster": g["cluster"],
                "dup_of": pa.array(dup_of, pa.int64(), mask=~any_dup),
                "is_dup": pa.array(any_dup.astype(np.int32), pa.int32()),
            }
        )

    out = assigned.groupby("cluster").map_groups(
        prune, batch_format="pyarrow"
    )
    return _sorted(_concat(out), "vec_id")
