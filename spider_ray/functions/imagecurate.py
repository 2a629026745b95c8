"""Image-corpus curation over the input_hint image+caption table — the
LAION-style gates a web-crawled image/caption dataset passes before
training (Schuhmann et al. 2021, arXiv:2111.02114 §2.2: resolution /
aspect-ratio / caption-length filters, then perceptual-hash dedup):

* :func:`q_image_filter` — vectorized metadata + caption gates with an
  auditable per-reason reject bitmask (one streamed ``map_batches`` pass,
  no shuffle; the only column that moves is what the gate reads).
* :func:`q_phash_clusters` — connected components over the verified
  phash-Hamming pair graph (``multimodal.phash_neardup``), each image
  labeled with its cluster's BEST-RESOLUTION representative (max ``w*h``,
  ties → lexicographically-smallest ``image_id``) — the "which copy do we
  keep" rule an image pipeline actually uses, vs. the min-id rule of the
  text-side ``dedup.q_dup_clusters``.
* :func:`q_image_curate` — the composed pipeline: keep exactly the images
  that pass every gate AND are their cluster's best representative among
  gate-passing members.

All three are SQL-oracled bit-exact (integer-only gate arithmetic — the
aspect bound is a cross-multiply, never a float ratio; components replay
as a recursive CTE; rep selection as a window ``row_number``).

Scale shape, threshold-gated on the verified pair count
(``dedup.CC_DRIVER_PAIR_LIMIT``): a sparse pair graph resolves with
driver-side union-find and the comp/rep maps broadcast via ``ray.put``
into streamed labeling passes (the J1/`dup_clusters` small-side
discipline); above the gate — boilerplate-heavy web data where the pair
list is NOT reliably small — components come from the distributed
hash-min fixpoint (``webgraph.cc_fixpoint``), representatives from a
native groupby, and corpus labeling is distributed left joins, so the
driver never holds the pair list. Both routes are identical by
construction and pinned by a forced-low-threshold test. Everything
touching the corpus is a ``map_batches`` stream; the bytes column is
read only by the byte-length gate and never shuffled.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from spider_ray.kernels.tokens import popcount_u64
from spider_ray.pipelines.relational import _concat, _sorted
from spider_ray.sources.lance_io import read_images

# Gate constants — shared verbatim by the engine and the SQL oracle
# (see __ray_entry__.oracle_sql). Chosen for real selectivity on the
# deterministic demo corpus (each gate both passes and rejects images).
MIN_DIM = 24  # min width AND height, px
ASPECT_MAX = 2  # max(w/h, h/w) <= 2, enforced as w<=2h AND h<=2w
MIN_CAPTION_WORDS = 5  # single-space-token count
MIN_BYTES = 1200  # encoded payload floor (thumbnails/truncations)
PHASH_TAU = 6  # Hamming radius for the near-dup pair graph

# reject_mask bits (0 == kept)
R_DIM = 1  # too small
R_ASPECT = 2  # too elongated
R_CAPTION = 4  # caption too short
R_BYTES = 8  # payload too small

# RE2-compatible on both engines; captions are single-space joined by
# construction so non-space runs == words
_WORD_PAT = "[^ ]+"


def _gate_columns(batch: pa.Table) -> tuple[np.ndarray, ...]:
    """Vectorized gate inputs for one Arrow batch: (w, h, n_caption_words,
    byte_len, reject_mask), all int64 numpy arrays."""
    w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    ncap = (
        pc.count_substring_regex(batch["caption"], _WORD_PAT)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    blen = (
        pc.binary_length(batch["bytes"])
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    mask = np.zeros(len(w), dtype=np.int64)
    mask |= np.where((w < MIN_DIM) | (h < MIN_DIM), R_DIM, 0)
    mask |= np.where((w > ASPECT_MAX * h) | (h > ASPECT_MAX * w), R_ASPECT, 0)
    mask |= np.where(ncap < MIN_CAPTION_WORDS, R_CAPTION, 0)
    mask |= np.where(blen < MIN_BYTES, R_BYTES, 0)
    return w, h, ncap, blen, mask


_GATE_COLS = ["image_id", "bytes", "w", "h", "fmt", "caption"]


def q_image_filter(images_path: str) -> pa.Table:
    """LAION-style image+caption quality gate: per-image metadata /
    caption / payload checks with an auditable reject bitmask. One
    embarrassingly-parallel streamed pass; downstream stages consume
    ``kept`` (or an individual reason bit) without re-deriving anything."""
    ds = read_images(images_path, columns=_GATE_COLS)

    def gates(batch: pa.Table) -> pa.Table:
        w, h, ncap, blen, mask = _gate_columns(batch)
        return pa.table(
            {
                "image_id": batch["image_id"].cast(pa.string()),
                "w": pa.array(w, pa.int64()),
                "h": pa.array(h, pa.int64()),
                "fmt": batch["fmt"].cast(pa.string()),
                "n_caption_words": pa.array(ncap, pa.int64()),
                "byte_len": pa.array(blen, pa.int64()),
                "reject_mask": pa.array(mask, pa.int64()),
                "kept": pa.array((mask == 0).astype(np.int32), pa.int32()),
            }
        )

    return _sorted(
        _concat(ds.map_batches(gates, batch_format="pyarrow")), "image_id"
    )


def _components(pairs: pa.Table) -> dict[str, str]:
    """Union-find over the (sparse) verified pair graph → node → component
    id, where the component id is its lexicographically-smallest member
    (matches the oracle's ``least(u, min(v))``). Every pair-graph node
    appears in the map; corpus singletons (no pair) are implicitly their
    own component."""
    parent: dict[str, str] = {}
    nodes: set[str] = set()

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["a_id"].to_pylist(), pairs["b_id"].to_pylist()):
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # every pair-graph node — including each component's root (the min-id
    # member, which never receives a parent entry) — must appear in the
    # map, or roots would be skipped by the member-stats pass and wrongly
    # labeled/rep-eligible downstream
    return {x: find(x) for x in nodes}


def _member_stats(
    images_path: str, comp_ref: "ray.ObjectRef", with_gates: bool
) -> pa.Table:
    """Sparse per-member stats for component nodes only: (image_id, comp,
    px[, passed]). Streams the corpus once; output is bounded by the pair
    graph's node count, never the corpus."""
    cols = _GATE_COLS if with_gates else ["image_id", "w", "h"]
    ds = read_images(images_path, columns=cols)

    def stats(batch: pa.Table) -> pa.Table:
        m = ray.get(comp_ref)
        ids = batch["image_id"].to_pylist()
        sel = np.fromiter((i in m for i in ids), dtype=bool, count=len(ids))
        sub = batch.filter(pa.array(sel))
        sub_ids = sub["image_id"].to_pylist()
        w = sub["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = sub["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {
            "image_id": pa.array(sub_ids, pa.string()),
            "comp": pa.array([m[i] for i in sub_ids], pa.string()),
            "px": pa.array(w * h, pa.int64()),
        }
        if with_gates:
            mask = _gate_columns(sub)[4]
            out["passed"] = pa.array((mask == 0).astype(np.int32), pa.int32())
        return pa.table(out)

    schema = pa.schema(
        [("image_id", pa.string()), ("comp", pa.string()), ("px", pa.int64())]
        + ([("passed", pa.int32())] if with_gates else [])
    )
    return _concat(ds.map_batches(stats, batch_format="pyarrow"), schema=schema)


def _pick_reps(stats: pa.Table, require_passed: bool) -> dict[str, str]:
    """comp → representative: max px, ties to smallest image_id (the SQL
    window ``ORDER BY px DESC, image_id``). Optionally only gate-passing
    members are eligible (components with none get no rep)."""
    best: dict[str, tuple[int, str]] = {}
    passed = (
        stats["passed"].to_pylist() if require_passed else [1] * stats.num_rows
    )
    for iid, comp, px, ok in zip(
        stats["image_id"].to_pylist(),
        stats["comp"].to_pylist(),
        stats["px"].to_pylist(),
        passed,
    ):
        if not ok:
            continue
        key = (-int(px), iid)
        if comp not in best or key < best[comp]:
            best[comp] = key
    return {comp: key[1] for comp, key in best.items()}


def _pair_graph(images_path: str, tau: int):
    """Materialized Hamming-verified pair Dataset + its row count — the
    gate input shared by the cluster-labeling family."""
    from spider_ray.functions.multimodal import phash_neardup_ds

    pairs_ds = phash_neardup_ds(images_path, tau=tau).materialize()
    return pairs_ds, pairs_ds.count()


def _pairs_table(pairs_ds: "ray.data.Dataset") -> pa.Table:
    from spider_ray.functions.dedup import hamming_pair_schema

    return _concat(pairs_ds, schema=hamming_pair_schema(pa.string()))


_LBL_SCHEMA = pa.schema([("node", pa.string()), ("label", pa.string())])


def _labels_ds(pairs_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distributed component labels (image_id → comp = min member id) via
    the hash-min fixpoint — the scale route of :func:`_components`."""
    from spider_ray.functions.webgraph import cc_fixpoint

    edges = pairs_ds.map_batches(
        lambda t: pa.table({"a": t["a_id"], "b": t["b_id"]}),
        batch_format="pyarrow",
    )
    return cc_fixpoint(edges, node_type=pa.string())


def _member_stats_ds(
    images_path: str, labels: "ray.data.Dataset", with_gates: bool
) -> "ray.data.Dataset":
    """Distributed form of :func:`_member_stats`: inner-join the pruned
    corpus columns against the component-label Dataset — output rows are
    bounded by the pair graph's node count, and the corpus streams once
    through the join shuffle instead of probing a broadcast dict."""
    from spider_ray.functions.dedup import _hash_join

    cols = _GATE_COLS if with_gates else ["image_id", "w", "h"]
    ds = read_images(images_path, columns=cols)

    def prep(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {
            "image_id": batch["image_id"].cast(pa.string()),
            "px": pa.array(w * h, pa.int64()),
        }
        if with_gates:
            mask = _gate_columns(batch)[4]
            out["passed"] = pa.array((mask == 0).astype(np.int32), pa.int32())
        return pa.table(out)

    left_schema = pa.schema(
        [("image_id", pa.string()), ("px", pa.int64())]
        + ([("passed", pa.int32())] if with_gates else [])
    )
    return _hash_join(
        ds.map_batches(prep, batch_format="pyarrow"),
        labels,
        on="image_id",
        right_on="node",
        left_schema=left_schema,
        right_schema=_LBL_SCHEMA,
        rename={"label": "comp"},
    )


def _reps_ds(
    stats: "ray.data.Dataset", require_passed: bool
) -> "ray.data.Dataset":
    """Distributed form of :func:`_pick_reps`: per-component best member
    (max px, ties → smallest image_id) via a native groupby —
    components are disjoint so the reduce is one row out per group."""
    if require_passed:
        stats = stats.map_batches(
            lambda t: t.filter(pc.equal(t["passed"], 1)),
            batch_format="pyarrow",
        )

    rep_schema = pa.schema([("comp", pa.string()), ("rep", pa.string())])

    def pick(group: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(group)
            .sort(["comp", "px", "image_id"], descending=[False, True, False])
            .group_by("comp", maintain_order=True)
            .agg(rep=pl.col("image_id").first())
            .to_arrow()
            .cast(rep_schema)
        )

    return stats.groupby("comp").map_groups(pick, batch_format="pyarrow")


def _label_corpus_distributed(
    ids: "ray.data.Dataset",
    id_schema: pa.Schema,
    labels: "ray.data.Dataset",
    reps: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """LEFT-join component + representative onto a corpus-id Dataset:
    output columns = id_schema's + (comp, rep), null for singletons."""
    from spider_ray.functions.dedup import _hash_join

    with_comp = _hash_join(
        ids,
        labels,
        on="image_id",
        right_on="node",
        left_schema=id_schema,
        right_schema=_LBL_SCHEMA,
        rename={"label": "comp"},
        how="left",
    )
    return _hash_join(
        with_comp,
        reps,
        on="comp",
        right_on="comp",
        left_schema=pa.schema(list(id_schema) + [("comp", pa.string())]),
        right_schema=pa.schema([("comp", pa.string()), ("rep", pa.string())]),
        how="left",
    )


def q_phash_clusters(
    images_path: str,
    tau: int = PHASH_TAU,
    *,
    driver_pair_limit: int | None = None,
) -> pa.Table:
    """Perceptual-hash duplicate-cluster resolution for images: connected
    components over the Hamming-verified pair graph, every image labeled
    with its cluster's best-resolution representative (singletons label
    themselves). Distributed candidate/verify via ``phash_neardup_ds``.

    Threshold-gated like ``dedup.q_dup_clusters``: a sparse pair graph
    (≤ ``dedup.CC_DRIVER_PAIR_LIMIT``) resolves driver-side and
    broadcasts the comp/rep maps; above the gate, components come from
    the distributed hash-min fixpoint, representatives from a native
    groupby, and the corpus labeling is two distributed left joins — the
    driver never holds the pair list. Both routes are identical by
    construction (fixpoint ≡ min-id union-find), pinned by test."""
    from spider_ray.functions.dedup import CC_DRIVER_PAIR_LIMIT

    limit = (
        CC_DRIVER_PAIR_LIMIT if driver_pair_limit is None else driver_pair_limit
    )
    pairs_ds, n_pairs = _pair_graph(images_path, tau)
    if n_pairs > limit:
        labels = _labels_ds(pairs_ds)
        reps = _reps_ds(
            _member_stats_ds(images_path, labels, with_gates=False),
            require_passed=False,
        )
        ids = read_images(images_path, columns=["image_id"]).map_batches(
            lambda t: pa.table({"image_id": t["image_id"].cast(pa.string())}),
            batch_format="pyarrow",
        )
        joined = _label_corpus_distributed(
            ids, pa.schema([("image_id", pa.string())]), labels, reps
        )

        def finish(t: pa.Table) -> pa.Table:
            rep = pc.coalesce(t["rep"], t["image_id"])
            return pa.table(
                {
                    "image_id": t["image_id"],
                    "cluster_rep": rep,
                    "is_rep": pc.cast(
                        pc.equal(rep, t["image_id"]), pa.int32()
                    ),
                }
            )

        return _sorted(
            _concat(joined.map_batches(finish, batch_format="pyarrow")),
            "image_id",
        )

    comp = _components(_pairs_table(pairs_ds))
    comp_ref = ray.put(comp)
    reps = _pick_reps(
        _member_stats(images_path, comp_ref, with_gates=False),
        require_passed=False,
    )
    rep_ref = ray.put(reps)

    ds = read_images(images_path, columns=["image_id"])

    def label(batch: pa.Table) -> pa.Table:
        m = ray.get(comp_ref)
        r = ray.get(rep_ref)
        ids = batch["image_id"].to_pylist()
        rep = [r[m[i]] if i in m else i for i in ids]
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "cluster_rep": pa.array(rep, pa.string()),
                "is_rep": pa.array(
                    np.fromiter(
                        (a == b for a, b in zip(ids, rep)),
                        dtype=np.int32,
                        count=len(ids),
                    ),
                    pa.int32(),
                ),
            }
        )

    return _sorted(
        _concat(ds.map_batches(label, batch_format="pyarrow")), "image_id"
    )


def _curate_refs_from_pairs(images_path: str, pairs: pa.Table):
    comp_ref = ray.put(_components(pairs))
    reps = _pick_reps(
        _member_stats(images_path, comp_ref, with_gates=True),
        require_passed=True,
    )
    return comp_ref, ray.put(reps)


def curate_refs(images_path: str, tau: int = PHASH_TAU):
    """Build the two broadcast maps the composed curation filter needs —
    (cluster membership, cluster representative), both O(near-dup
    clusters), as ``ray.put`` refs. Shared by :func:`q_image_curate`'s
    sparse route and the curate→shard pipeline
    (`pipelines/imagecorpus.py`)."""
    from spider_ray.functions.multimodal import phash_neardup

    return _curate_refs_from_pairs(
        images_path, phash_neardup(images_path, tau=tau)
    )


def curate_keep_mask(batch: pa.Table, comp: dict, reps: dict) -> np.ndarray:
    """Vectorized survive-mask for one batch: every gate passes AND the
    image is its cluster's chosen representative (non-clustered images
    stand alone). The per-row dict probes are O(1) lookups into the two
    broadcast maps."""
    ids = batch["image_id"].to_pylist()
    _w, _h, _ncap, _blen, mask = _gate_columns(batch)
    return np.fromiter(
        (
            mask[i] == 0
            and (ids[i] not in comp or reps.get(comp[ids[i]]) == ids[i])
            for i in range(len(ids))
        ),
        dtype=bool,
        count=len(ids),
    )


def q_image_curate(
    images_path: str,
    tau: int = PHASH_TAU,
    *,
    driver_pair_limit: int | None = None,
) -> pa.Table:
    """Composed image-corpus curation (the LAION flow end to end): an
    image survives iff it passes every :func:`q_image_filter` gate AND is
    its phash-cluster's best-resolution representative among gate-passing
    members (clusters whose members all fail contribute nothing;
    gate-passing singletons survive). Returns the curated
    (image_id, w, h, fmt, caption) table.

    Same ``dedup.CC_DRIVER_PAIR_LIMIT`` gate as :func:`q_phash_clusters`:
    sparse pair graphs broadcast comp/rep maps; large ones label via the
    distributed hash-min fixpoint and two left joins."""
    from spider_ray.functions.dedup import CC_DRIVER_PAIR_LIMIT

    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("w", pa.int64()),
            ("h", pa.int64()),
            ("fmt", pa.string()),
            ("caption", pa.string()),
        ]
    )
    limit = (
        CC_DRIVER_PAIR_LIMIT if driver_pair_limit is None else driver_pair_limit
    )
    pairs_ds, n_pairs = _pair_graph(images_path, tau)

    if n_pairs > limit:
        labels = _labels_ds(pairs_ds)
        reps = _reps_ds(
            _member_stats_ds(images_path, labels, with_gates=True),
            require_passed=True,
        )
        gate_schema = pa.schema(
            list(schema) + [("passed", pa.int32())]
        )

        def gates(batch: pa.Table) -> pa.Table:
            mask = _gate_columns(batch)[4]
            return pa.table(
                {
                    "image_id": batch["image_id"].cast(pa.string()),
                    "w": batch["w"].cast(pa.int64()),
                    "h": batch["h"].cast(pa.int64()),
                    "fmt": batch["fmt"].cast(pa.string()),
                    "caption": batch["caption"].cast(pa.string()),
                    "passed": pa.array(
                        (mask == 0).astype(np.int32), pa.int32()
                    ),
                }
            )

        gated = read_images(images_path, columns=_GATE_COLS).map_batches(
            gates, batch_format="pyarrow"
        )
        joined = _label_corpus_distributed(gated, gate_schema, labels, reps)

        def finish(t: pa.Table) -> pa.Table:
            # keep: gates pass AND (singleton OR this image is the
            # cluster's passed-member representative) — reps were picked
            # among passed members only, so a passed member of an
            # all-failing cluster cannot exist
            keep = pc.and_(
                pc.equal(t["passed"], 1),
                pc.or_kleene(
                    pc.is_null(t["comp"]), pc.equal(t["rep"], t["image_id"])
                ),
            )
            kept = t.filter(pc.fill_null(keep, False))
            return kept.select(
                ["image_id", "w", "h", "fmt", "caption"]
            ).cast(schema)

        return _sorted(
            _concat(
                joined.map_batches(finish, batch_format="pyarrow"),
                schema=schema,
            ),
            "image_id",
        )

    comp_ref, rep_ref = _curate_refs_from_pairs(
        images_path, _pairs_table(pairs_ds)
    )

    ds = read_images(images_path, columns=_GATE_COLS)

    def curate(batch: pa.Table) -> pa.Table:
        keep = curate_keep_mask(batch, ray.get(comp_ref), ray.get(rep_ref))
        kept = batch.filter(pa.array(keep))
        return pa.table(
            {
                "image_id": kept["image_id"].cast(pa.string()),
                "w": kept["w"].cast(pa.int64()),
                "h": kept["h"].cast(pa.int64()),
                "fmt": kept["fmt"].cast(pa.string()),
                "caption": kept["caption"].cast(pa.string()),
            }
        )

    return _sorted(
        _concat(ds.map_batches(curate, batch_format="pyarrow"), schema=schema),
        "image_id",
    )


IMG_DECON_MOD = 17  # seq % 17 == 0 -> the held-out "benchmark" images
IMG_DECON_TAU = 6  # same Hamming radius as the phash near-dup path


def q_image_decontaminate(
    images_path: str, tau: int = IMG_DECON_TAU
) -> pa.Table:
    """Benchmark decontamination for the IMAGE corpus — the phash twin of
    ``curation.q_decontaminate``: flag every training image whose
    perceptual hash sits within Hamming ``tau`` of any held-out benchmark
    image (eval-set leakage through re-crops/re-encodes that exact dedup
    misses). The benchmark side is SMALL BY CONSTRUCTION → its phash
    vector broadcasts once via ``ray.put`` and each streamed train batch
    XOR+popcounts against it (a (batch x bench) vectorized matrix) — no
    shuffle, no driver pass over the corpus. At a benchmark too large to
    broadcast, swap in the banded candidate path (`multimodal.
    phash_neardup`'s machinery). Returns contaminated
    (image_id, n_matches, min_dist) sorted by image_id."""
    import polars as pl

    ds = read_images(images_path, columns=["image_id", "phash"])

    def with_seq(batch: pa.Table) -> pa.Table:
        # schema allows null phash (same guard as multimodal.phash_neardup:
        # a null hash can't be compared; the SQL oracle's xor(...) IS NULL
        # drops those rows on both sides of the join too)
        batch = batch.filter(pc.is_valid(batch["phash"]))
        return (
            pl.from_arrow(
                pa.table(
                    {
                        "image_id": batch["image_id"].cast(pa.string()),
                        "phash": batch["phash"].cast(pa.int64()),
                    }
                )
            )
            .with_columns(
                seq=pl.col("image_id").str.extract(r"(\d+)$", 1).cast(
                    pl.Int64
                )
            )
            .to_arrow()
        )

    tagged = ds.map_batches(with_seq, batch_format="pyarrow").materialize()

    def bench_only(batch: pa.Table) -> pa.Table:
        seq = batch["seq"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(seq % IMG_DECON_MOD == 0))

    bench_hashes: list[int] = []
    for t in ray.get(
        tagged.map_batches(bench_only, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    ):
        if t.num_rows:
            bench_hashes.extend(t["phash"].to_pylist())
    bench = np.array(bench_hashes, dtype=np.int64).view(np.uint64)
    bench_ref = ray.put(bench)

    def contaminated(batch: pa.Table) -> pa.Table:
        b = ray.get(bench_ref)
        seq = batch["seq"].to_numpy(zero_copy_only=False)
        train = seq % IMG_DECON_MOD != 0
        ph = (
            batch["phash"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)[train]
        )
        ids = batch["image_id"].to_numpy(zero_copy_only=False)[train]
        if not len(ph) or not len(b):
            return pa.table(
                {
                    "image_id": pa.array([], pa.string()),
                    "n_matches": pa.array([], pa.int64()),
                    "min_dist": pa.array([], pa.int64()),
                }
            )
        # SWAR popcount on the (batch x bench) XOR matrix: 8 bytes per
        # pair throughout, no 64x unpackbits expansion
        ham = popcount_u64(ph[:, None] ^ b[None, :])
        hits = ham <= tau
        n = hits.sum(axis=1)
        flagged = n > 0
        dmin = np.where(hits, ham, 65).min(axis=1)
        return pa.table(
            {
                "image_id": pa.array(ids[flagged], pa.string()),
                "n_matches": pa.array(
                    n[flagged].astype(np.int64), pa.int64()
                ),
                "min_dist": pa.array(
                    dmin[flagged].astype(np.int64), pa.int64()
                ),
            }
        )

    return _sorted(
        _concat(tagged.map_batches(contaminated, batch_format="pyarrow")),
        "image_id",
    )


# --------------------------------------------------------------------------
# recrawl delta report
# --------------------------------------------------------------------------

# frozen perturbation deriving "snapshot B" from the store (shared
# verbatim with the SQL oracle): every 7th image disappears (removed),
# every 13th is re-hosted under a new id (old id removed + new id
# added), every 5th changes pixels (phash flips bit 0)
DELTA_DROP_MOD = 7
DELTA_MOVE_MOD = 13
DELTA_EDIT_MOD = 5


def _delta_tagged(images_path: str, P: int = 32):
    """Side-tagged, hash-partitioned union of snapshot A (the store as
    read) and snapshot B (the frozen perturbation above) — the shared
    front half of the recrawl delta/schedule queries. Each block carries
    ``__part`` (hash(image_id) % P) and ``__side`` (0=A, 1=B) so a
    ``groupby(__part).map_groups`` downstream sees both sides of every
    key in one group (FULL OUTER partition-cogroup); neither snapshot is
    ever collected."""
    import polars as pl

    from spider_ray.kernels.hashing import SEED
    from spider_ray.sources.lance_io import read_images

    ds_a = read_images(images_path, columns=["image_id", "phash"])
    ds_b = read_images(images_path, columns=["image_id", "phash"])

    def derive_b(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).with_columns(
            seq=pl.col("image_id").str.extract(r"/i/(\d+)$", 1).cast(
                pl.Int64
            )
        )
        df = df.filter(pl.col("seq") % DELTA_DROP_MOD != 0).with_columns(
            image_id=pl.when(pl.col("seq") % DELTA_MOVE_MOD == 0)
            .then(pl.col("image_id") + pl.lit("?v=2"))
            .otherwise(pl.col("image_id")),
            phash=pl.when(pl.col("seq") % DELTA_EDIT_MOD == 0)
            .then(pl.col("phash").cast(pl.Int64) ^ 1)
            .otherwise(pl.col("phash").cast(pl.Int64)),
        )
        return df.select(["image_id", "phash"]).to_arrow().cast(
            pa.schema([("image_id", pa.string()), ("phash", pa.int64())])
        )

    def pad(side: int):
        def f(t: pa.Table) -> pa.Table:
            part = (
                pl.from_arrow(t.select(["image_id"]))
                .select(
                    (pl.col("image_id").hash(seed=SEED) % P).cast(
                        pl.Int32
                    )
                )
                .to_series()
                .to_numpy()
            )
            return pa.table(
                {
                    "__part": pa.array(part, pa.int32()),
                    "__side": pa.array(
                        np.full(t.num_rows, side, np.int8)
                    ),
                    "image_id": t["image_id"],
                    "phash": t["phash"].cast(pa.int64()),
                }
            )

        return f

    return (
        ds_a.map_batches(pad(0), batch_format="pyarrow")
        .union(
            ds_b.map_batches(derive_b, batch_format="pyarrow").map_batches(
                pad(1), batch_format="pyarrow"
            )
        )
    )


def _delta_status(group: pa.Table):
    """Per-partition FULL OUTER join of the two tagged sides with the
    per-key delta ``status`` (added/removed/changed/same) and ``host``
    computed — returns a polars frame, shared by the delta queries."""
    import polars as pl

    df = pl.from_arrow(group)
    a = df.filter(pl.col("__side") == 0).select(
        "image_id", pa_=pl.col("phash")
    )
    b = df.filter(pl.col("__side") == 1).select(
        "image_id", pb=pl.col("phash")
    )
    j = a.join(b, on="image_id", how="full", coalesce=True)
    return j.with_columns(
        status=pl.when(pl.col("pa_").is_null())
        .then(pl.lit("added"))
        .when(pl.col("pb").is_null())
        .then(pl.lit("removed"))
        .when(pl.col("pa_") != pl.col("pb"))
        .then(pl.lit("changed"))
        .otherwise(pl.lit("same")),
        host=pl.col("image_id").str.extract(r"^https?://([^/]+)", 1),
    )


def q_crawl_delta(images_path: str) -> pa.Table:
    """Recrawl delta report — what changed between two crawl snapshots
    of the image store: per-host counts of added / removed / changed /
    same images. The comparison is a FULL OUTER cogroup by image_id
    (tagged union → hash partition → per-partition polars full join
    with key coalesce — the partition-cogroup shape extended to full
    outer; neither snapshot is ever collected), then a bounded
    per-(host, status) aggregate. Snapshot B is derived from the store
    by the frozen perturbation above so the oracle replays it exactly;
    in production both sides are real generation outputs."""
    import polars as pl

    tagged = _delta_tagged(images_path)

    def diff(group: pa.Table) -> pa.Table:
        j = _delta_status(group)
        return (
            j.group_by("host", "status")
            .agg(n=pl.len().cast(pl.Int64))
            .to_arrow()
            .cast(
                pa.schema(
                    [
                        ("host", pa.string()),
                        ("status", pa.string()),
                        ("n", pa.int64()),
                    ]
                )
            )
        )

    agg = (
        tagged.groupby("__part")
        .map_groups(diff, batch_format="pyarrow")
        .groupby(["host", "status"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
    )

    def conform(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": t["host"],
                "status": t["status"],
                "n": pc.cast(t["n"], pa.int64()),
            }
        )

    return _sorted(
        _concat(agg.map_batches(conform, batch_format="pyarrow")),
        ["host", "status"],
    )


# adaptive revisit constants (frozen, shared verbatim with the SQL
# oracle). The reference revisits every page on a fixed max_duration =
# 86,400 s clock (crawler2/general_crawler/scheduler.cc:22-24); the
# adaptive form below is the standard change-rate refinement (Cho &
# Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers"):
# halve the interval when the page changed, double it when it did not,
# clamp to [REVISIT_MIN, REVISIT_MAX]. The PREVIOUS interval is a
# planted deterministic workload (REVISIT_MIN << (seq % 8)) so both
# clamps get exercised and the SQL oracle replays it bit-exact; in
# production it comes from the scheduler's per-URL state table.
REVISIT_BASE = 86_400
REVISIT_MIN = 3_600
REVISIT_MAX = 604_800
REVISIT_PREV_MOD = 8


def q_recrawl_schedule(images_path: str) -> pa.Table:
    """Adaptive recrawl schedule — the per-URL revisit plan a frontier
    scheduler emits after comparing two crawl snapshots: new URLs enter
    at the base (daily) interval, changed URLs halve their previous
    interval, unchanged URLs double it, both clamped, and every row gets
    an integer priority band (0 = hot, soonest revisit) that the permit
    scheduler consumes directly. Removed URLs leave the schedule.

    Same FULL OUTER partition-cogroup front half as
    :func:`q_crawl_delta` (one hash shuffle, no driver materialization);
    the per-row interval/priority math is vectorized integer arithmetic
    inside the same ``map_groups`` pass. Output: one row per live URL,
    sorted by image_id."""
    import polars as pl

    tagged = _delta_tagged(images_path)

    out_schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("host", pa.string()),
            ("status", pa.string()),
            ("interval_s", pa.int64()),
            ("priority", pa.int32()),
        ]
    )

    def schedule(group: pa.Table) -> pa.Table:
        j = _delta_status(group).filter(pl.col("status") != "removed")
        j = j.with_columns(
            seq=pl.col("image_id")
            .str.extract(r"/i/(\d+)", 1)
            .cast(pl.Int64)
        ).with_columns(
            # 2^(seq % 8) ≤ 128 — float pow is exact there; cast back
            prev=(
                pl.lit(REVISIT_MIN, dtype=pl.Int64)
                * (2 ** (pl.col("seq") % REVISIT_PREV_MOD)).cast(pl.Int64)
            )
        )
        j = j.with_columns(
            interval_s=pl.when(pl.col("status") == "added")
            .then(pl.lit(REVISIT_BASE, dtype=pl.Int64))
            .when(pl.col("status") == "changed")
            .then(
                pl.max_horizontal(
                    pl.lit(REVISIT_MIN, dtype=pl.Int64),
                    pl.col("prev") // 2,
                )
            )
            .otherwise(
                pl.min_horizontal(
                    pl.lit(REVISIT_MAX, dtype=pl.Int64),
                    pl.col("prev") * 2,
                )
            )
        ).with_columns(
            priority=pl.when(pl.col("interval_s") <= 4 * REVISIT_MIN)
            .then(pl.lit(0, dtype=pl.Int32))
            .when(pl.col("interval_s") <= REVISIT_BASE)
            .then(pl.lit(1, dtype=pl.Int32))
            .otherwise(pl.lit(2, dtype=pl.Int32))
        )
        return (
            j.select(
                ["image_id", "host", "status", "interval_s", "priority"]
            )
            .to_arrow()
            .cast(out_schema)
        )

    out = tagged.groupby("__part").map_groups(
        schedule, batch_format="pyarrow"
    )
    return _sorted(_concat(out), "image_id")


# --------------------------------------------------------------------------
# format sniff (payload integrity gate)
# --------------------------------------------------------------------------

# frozen transfer-corruption workload (shared verbatim with the SQL
# oracle): every 17th image arrives with its first byte flipped — the
# truncation/bit-rot case a fetch pipeline must catch before decode
# (the reference bounds and truncates payloads at the transfer layer,
# crawler/crawl/page_crawler_callback.cc:21-33, and drops undecodable
# bodies at handle time; sniffing magic bytes BEFORE decode is the
# batch-side equivalent).
FMT_CORRUPT_MOD = 17

_PNG_MAGIC = np.frombuffer(b"\x89PNG", np.uint8)
_QIM_MAGIC = np.frombuffer(b"QIM1", np.uint8)  # the from-scratch lossy
# codec standing in for JPEG (kernels/imaging.py) — its container header


def q_format_sniff(images_path: str) -> pa.Table:
    """Payload integrity gate: sniff each image's ACTUAL container format
    from its magic bytes, pull width/height out of the container header
    (PNG IHDR big-endian at bytes 17-24; the QIM1 stand-in's ``>II`` at
    bytes 5-12), and flag rows where the sniffed format or header
    geometry contradicts the table's declared ``fmt``/``w``/``h`` —
    corrupt or mislabeled rows must be dropped before the decode pool
    ever sees them. One embarrassingly-parallel streamed pass; the byte
    work is vectorized numpy over the Arrow binary buffer (no per-row
    Python). Output one row per image, ``ok=0`` rows are the quarantine
    set."""
    import polars as pl

    ds = read_images(
        images_path, columns=["image_id", "bytes", "fmt", "w", "h"]
    )

    out_schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("fmt", pa.string()),
            ("sniffed", pa.string()),
            ("hdr_w", pa.int64()),
            ("hdr_h", pa.int64()),
            ("ok", pa.int32()),
        ]
    )

    def sniff(t: pa.Table) -> pa.Table:
        b = t["bytes"].combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        odt = np.int64 if pa.types.is_large_binary(b.type) else np.int32
        off = (
            np.frombuffer(b.buffers()[1], odt)[
                b.offset : b.offset + len(b) + 1
            ].astype(np.int64)
        )
        data = np.frombuffer(b.buffers()[2], np.uint8)
        starts = off[:-1]
        # every image is ≥ 24 bytes (13-byte QIM1 header + payload /
        # 8-byte PNG magic + IHDR); guard anyway
        lens = off[1:] - off[:-1]
        idx = starts[:, None] + np.arange(24)[None, :]
        idx = np.minimum(idx, int(off[-1]) - 1)
        hdr = data[idx]  # (n, 24) header window per row
        seq = (
            pl.from_arrow(t.select(["image_id"]))["image_id"]
            .str.extract(r"/i/(\d+)$", 1)
            .cast(pl.Int64)
            .to_numpy()
        )
        corrupt = (seq % FMT_CORRUPT_MOD) == 0
        magic = hdr[:, :4].copy()
        magic[corrupt, 0] ^= 0xFF  # the planted first-byte flip
        is_png = (magic == _PNG_MAGIC).all(axis=1) & (lens >= 24)
        is_qim = (magic == _QIM_MAGIC).all(axis=1) & (lens >= 13)

        def be32(col: int) -> np.ndarray:
            h32 = hdr[:, col : col + 4].astype(np.int64)
            return (h32[:, 0] << 24) | (h32[:, 1] << 16) | (
                h32[:, 2] << 8
            ) | h32[:, 3]

        hdr_w = np.where(is_png, be32(16), np.where(is_qim, be32(4), 0))
        hdr_h = np.where(is_png, be32(20), np.where(is_qim, be32(8), 0))
        known = is_png | is_qim
        sniffed = np.where(
            is_png, "png", np.where(is_qim, "jpeg", "unknown")
        )
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        fmt = np.asarray(t["fmt"].to_pylist())
        ok = known & (sniffed == fmt) & (hdr_w == w) & (hdr_h == h)
        return pa.table(
            {
                "image_id": t["image_id"].cast(pa.string()),
                "fmt": t["fmt"].cast(pa.string()),
                "sniffed": pa.array(sniffed.tolist(), pa.string()),
                "hdr_w": pa.array(
                    [int(v) if k else None for v, k in zip(hdr_w, known)],
                    pa.int64(),
                ),
                "hdr_h": pa.array(
                    [int(v) if k else None for v, k in zip(hdr_h, known)],
                    pa.int64(),
                ),
                "ok": pa.array(ok.astype(np.int32), pa.int32()),
            }
        )

    return _sorted(
        _concat(ds.map_batches(sniff, batch_format="pyarrow")), "image_id"
    )
