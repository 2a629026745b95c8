"""Training-layout operators for the input_hint image+caption table —
how a curated image corpus is physically arranged for a dataloader:

* :func:`q_aspect_buckets` — SDXL-style aspect-ratio bucketing (Podell
  et al. 2023, arXiv:2307.01952 App. I): every image is assigned the
  closest of a fixed set of aspect-ratio prototypes so batches can be
  formed from same-shape images without destructive center-crops. The
  argmin is INTEGER-exact: |w/h - bw/bh| comparisons are cross-multiplied
  (score = |w*bh - h*bw| * (L/bh), L = lcm of the prototype denominators)
  so engine and SQL oracle agree bit-for-bit — no float ratios anywhere.
* :func:`q_image_shard_pack` — WebDataset-style shard layout (Aizman et
  al. 2019 "High Performance I/O For Large Scale Deep Learning": training
  corpora ship as fixed-size sequential shards, not per-sample files):
  greedily pack images, in corpus order, into shards of ≤ SHARD_BUDGET
  payload bytes. Distributed as the same per-range pack + O(ranges)
  offset-cumsum shape as ``text.q_sequence_pack`` / O2 bin-pack: ranges
  of SHARD_RANGE consecutive images pack independently inside a
  ``groupby(range).map_groups``, a tiny (range → shard count) table
  prefix-sums driver-side, and a second streamed pass adds each range's
  base — shards never span a range boundary (defined semantics: at most
  one underfull shard per SHARD_RANGE images), shard ids stay globally
  contiguous, and a failed run resumes per range.

Both are SQL-oracled bit-exact (bucket argmin as a window ``row_number``
over the cross-multiplied scores; the greedy walk as a lockstep recursive
CTE, one row per range per step).

Scale shape: bucketing is one embarrassingly-parallel streamed pass over
(image_id, w, h) — the bytes column never moves. Shard packing reads only
(image_id, byte length); the driver holds the O(ranges) offset map and
nothing proportional to the corpus.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from spider_ray.kernels.hashing import mix64_int
from spider_ray.pipelines.relational import _concat, _sorted
from spider_ray.sources.lance_io import read_images

# Aspect-ratio prototypes (bw : bh), portrait → landscape. Shared
# verbatim by the SQL oracle (__ray_entry__.oracle_sql). The corpus dims
# span 16-48 px → ratios in [1/3, 3], so every prototype wins somewhere.
ASPECT_BUCKETS = [(1, 2), (2, 3), (1, 1), (3, 2), (2, 1)]
_LCM_BH = math.lcm(*(bh for _, bh in ASPECT_BUCKETS))

SHARD_BUDGET = 16_384  # payload bytes per shard
SHARD_RANGE = 128  # images per independent pack range
# composite pack-unit key for the bucketed layout: bucket * 2^32 + range —
# preserves (bucket, range) lexicographic order under int64 sort, so the
# offset cumsum and the SQL oracle's window ORDER BY agree
_BUCKET_GRP = 1 << 32

# integer argmin constants, hoisted once (shared by every bucket site)
_BW = np.array([b for b, _ in ASPECT_BUCKETS], dtype=np.int64)
_BH = np.array([b for _, b in ASPECT_BUCKETS], dtype=np.int64)
_BMULT = _LCM_BH // _BH


def aspect_bucket_ids(w: np.ndarray, h: np.ndarray) -> np.ndarray:
    """The frozen integer-exact ASPECT_BUCKETS argmin (first minimum ==
    lowest bucket id) — ONE implementation shared by q_aspect_buckets,
    q_bucket_shard_pack, and the bucketed shard writer, so the bucket
    rule can never drift between the plan and the files on disk."""
    scores = np.abs(np.outer(w, _BH) - np.outer(h, _BW)) * _BMULT
    return np.argmin(scores, axis=1).astype(np.int64)


def q_aspect_buckets(images_path: str) -> pa.Table:
    """Assign every image the closest aspect-ratio prototype from
    ASPECT_BUCKETS (integer-exact cross-multiplied argmin; ties break to
    the lowest bucket index, i.e. the more-portrait prototype). One
    streamed pass over pruned (image_id, w, h)."""
    ds = read_images(images_path, columns=["image_id", "w", "h"])

    def assign(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = aspect_bucket_ids(w, h)
        return pa.table(
            {
                "image_id": batch["image_id"].cast(pa.string()),
                "w": pa.array(w, pa.int64()),
                "h": pa.array(h, pa.int64()),
                "bucket_id": pa.array(k, pa.int64()),
                "bucket_w": pa.array(_BW[k], pa.int64()),
                "bucket_h": pa.array(_BH[k], pa.int64()),
            }
        )

    return _sorted(
        _concat(ds.map_batches(assign, batch_format="pyarrow")), "image_id"
    )


_SEQ_PAT = r"(\d+)$"  # corpus ids carry a trailing per-corpus sequence


def member_checksum_keys(seq: np.ndarray, nb: np.ndarray) -> np.ndarray:
    """mix64_int(seq, seed=n_bytes) vectorized with per-row seeds — the
    FROZEN member key behind every shard checksum (q_shard_manifest, the
    writer's _MANIFEST.json, verify_shards, and the SQL oracle's HUGEINT
    replay). One implementation; never change the constants."""
    with np.errstate(over="ignore"):
        u = np.asarray(seq).astype(np.uint64) * np.uint64(
            2654435761
        ) + np.asarray(nb).astype(np.uint64)
        u = u ^ (u >> np.uint64(29))
        u = u * np.uint64(2246822519)
        return u ^ (u >> np.uint64(32))


def greedy_local_shards(sizes) -> list[int]:
    """The frozen greedy walk over one pack range's payload sizes (seq
    order): open a new shard when the next payload would cross
    SHARD_BUDGET; an oversized payload gets a shard of its own. Shared by
    the assignment query and the shard writer so the written layout can
    never drift from the oracled plan."""
    shards, fill, s = [], 0, 0
    for n in sizes:
        if fill > 0 and fill + n > SHARD_BUDGET:
            s += 1
            fill = 0
        fill += n
        shards.append(s)
    return shards


def _packed_local(images_path: str) -> "ray.data.Dataset":
    """Materialized Dataset of (image_id, seq, n_bytes, range_id,
    local_shard): the per-range independent pack, before global shard ids.
    Reads only (image_id, byte length) — the payload never moves."""
    import polars as pl

    ds = read_images(images_path, columns=["image_id", "bytes"])

    def sizes(batch: pa.Table) -> pa.Table:
        lf = pl.from_arrow(
            pa.table(
                {
                    "image_id": batch["image_id"].cast(pa.string()),
                    "n_bytes": pc.binary_length(batch["bytes"]).cast(
                        pa.int64()
                    ),
                }
            )
        ).with_columns(
            seq=pl.col("image_id").str.extract(_SEQ_PAT, 1).cast(pl.Int64)
        )
        return (
            lf.with_columns(range_id=pl.col("seq") // SHARD_RANGE)
            .select("image_id", "seq", "n_bytes", "range_id")
            .to_arrow()
        )

    def pack_range(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).sort("seq")
        return df.with_columns(
            local_shard=pl.Series(
                greedy_local_shards(df["n_bytes"].to_list()), dtype=pl.Int64
            )
        ).to_arrow()

    return (
        ds.map_batches(sizes, batch_format="pyarrow")
        .groupby("range_id")
        .map_groups(pack_range, batch_format="pyarrow")
        .materialize()
    )


def _bucket_packed_local(images_path: str) -> "ray.data.Dataset":
    """Bucketed twin of :func:`_packed_local`: the pack unit ("range_id"
    column, consumed verbatim by `_offsets_of` / `_assignments_from` /
    `q_shard_manifest` / the shard writer) is the composite
    ``bucket * 2^32 + seq // SHARD_RANGE`` — lexicographic (bucket, range)
    order under int64 sort, so shards never mix buckets and each bucket's
    ids stay contiguous per range. Reads (image_id, byte length, w, h)
    only."""
    import polars as pl

    ds = read_images(images_path, columns=["image_id", "bytes", "w", "h"])

    def sizes(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = aspect_bucket_ids(w, h)
        lf = pl.from_arrow(
            pa.table(
                {
                    "image_id": batch["image_id"].cast(pa.string()),
                    "n_bytes": pc.binary_length(batch["bytes"]).cast(
                        pa.int64()
                    ),
                    "bucket_id": pa.array(k, pa.int64()),
                }
            )
        ).with_columns(
            seq=pl.col("image_id").str.extract(_SEQ_PAT, 1).cast(pl.Int64)
        )
        return (
            lf.with_columns(
                range_id=pl.col("bucket_id") * _BUCKET_GRP
                + pl.col("seq") // SHARD_RANGE
            )
            .select("image_id", "seq", "n_bytes", "range_id")
            .to_arrow()
        )

    def pack_range(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).sort("seq")
        return df.with_columns(
            local_shard=pl.Series(
                greedy_local_shards(df["n_bytes"].to_list()), dtype=pl.Int64
            )
        ).to_arrow()

    return (
        ds.map_batches(sizes, batch_format="pyarrow")
        .groupby("range_id")
        .map_groups(pack_range, batch_format="pyarrow")
        .materialize()
    )


def _offsets_of(packed: "ray.data.Dataset") -> dict[int, int]:
    """O(ranges) global-shard-id base per pack range: cumsum of per-range
    shard counts in range order. The only state the driver ever holds."""
    from ray.data.aggregate import Max

    counts = (
        packed.groupby("range_id").aggregate(Max("local_shard")).to_pandas()
    )
    counts = counts.sort_values("range_id", ignore_index=True)
    n_shards = counts["max(local_shard)"].to_numpy() + 1
    return dict(
        zip(
            counts["range_id"].tolist(),
            np.concatenate([[0], np.cumsum(n_shards)[:-1]]).tolist(),
        )
    )


def _shard_assignments(images_path: str) -> "ray.data.Dataset":
    """The distributed greedy pack as a streaming Dataset of
    (image_id, seq, n_bytes, range_id, shard) — shared by
    :func:`q_image_shard_pack` (the per-image assignment view) and
    :func:`q_shard_manifest` (the per-shard lineage/integrity view).
    Per-range independent pack inside ``groupby(range).map_groups`` +
    O(ranges) driver offset cumsum; see module docstring."""
    packed = _packed_local(images_path)
    return _assignments_from(packed, _offsets_of(packed))


def _assignments_from(
    packed: "ray.data.Dataset", offsets: dict[int, int]
) -> "ray.data.Dataset":
    """Attach global shard ids (range base + local) to a `_packed_local`
    Dataset — split out so the shard writer can reuse one pack pass for
    assignments, staleness checks, and the root manifest."""
    off_ref = ray.put(offsets)

    def add_offset(batch: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        rid = batch["range_id"].to_pylist()
        base = np.array([off[r] for r in rid], dtype=np.int64)
        local = batch["local_shard"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "seq": batch["seq"],
                "n_bytes": batch["n_bytes"],
                "range_id": batch["range_id"],
                "shard": pa.array(base + local, pa.int64()),
            }
        )

    return packed.map_batches(add_offset, batch_format="pyarrow")


def q_image_shard_pack(images_path: str) -> pa.Table:
    """Greedy WebDataset-style shard assignment: walk images in corpus
    (seq) order, open a new shard whenever the next payload would push
    the current one past SHARD_BUDGET bytes (an oversized single image
    gets a shard of its own). Per-range distributed pack + O(ranges)
    driver cumsum; shard ids globally contiguous."""
    ds = _shard_assignments(images_path).select_columns(
        ["image_id", "seq", "n_bytes", "shard"]
    )
    return _sorted(_concat(ds), "seq")


def q_shard_manifest(
    images_path: str, _assignments: "ray.data.Dataset | None" = None
) -> pa.Table:
    """Per-shard lineage/integrity manifest over the shard-pack layout —
    the "per-partition lineage + metrics" record a resumable writer
    checkpoints next to each shard: which pack range produced it
    (``range_id`` — the resume unit), how many images and payload bytes
    it holds, its seq interval, and a content checksum
    (xor of ``mix64_int(seq, seed=n_bytes)`` over members — mergeable,
    order-free, and SQL-replayable with HUGEINT modular arithmetic).

    Scale shape: a per-batch combiner collapses each Arrow batch to one
    partial row per shard touched, then a hash-partitioned
    ``groupby(shard).map_groups`` merges partials — the driver never sees
    per-image rows, only the O(shards) manifest."""
    def _rows(shard, range_id, n_images, payload, first, last, xs):
        return pa.table(
            {
                "shard": pa.array(shard, pa.int64()),
                "range_id": pa.array(range_id, pa.int64()),
                "n_images": pa.array(n_images, pa.int64()),
                "payload_bytes": pa.array(payload, pa.int64()),
                "first_seq": pa.array(first, pa.int64()),
                "last_seq": pa.array(last, pa.int64()),
                "checksum": pa.array(xs, pa.uint64()),
            }
        )

    def partials(batch: pa.Table) -> pa.Table:
        shard = batch["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
        rid = batch["range_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        seq = batch["seq"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = batch["n_bytes"].to_numpy(zero_copy_only=False).astype(np.int64)
        # seed enters the mixer additively; n_bytes < 2^32 keeps the
        # (seq, n_bytes) -> key map collision-free at corpus sizes
        member = member_checksum_keys(seq, nb)
        order = np.argsort(shard, kind="stable")
        shard, rid, seq, nb, member = (
            shard[order],
            rid[order],
            seq[order],
            nb[order],
            member[order],
        )
        # group boundaries over the shard-sorted batch, then one
        # reduceat per aggregate — no Python loop over rows
        starts = np.flatnonzero(
            np.concatenate([[True], shard[1:] != shard[:-1]])
        )
        counts = np.diff(np.concatenate([starts, [len(shard)]]))
        return _rows(
            shard[starts],
            np.minimum.reduceat(rid, starts),
            counts.astype(np.int64),
            np.add.reduceat(nb, starts),
            np.minimum.reduceat(seq, starts),
            np.maximum.reduceat(seq, starts),
            np.bitwise_xor.reduceat(member, starts),
        )

    def merge(group: pa.Table) -> pa.Table:
        # one shard's partial rows -> one manifest row
        xs = group["checksum"].to_numpy(zero_copy_only=False)
        return _rows(
            [group["shard"][0].as_py()],
            [pc.min(group["range_id"]).as_py()],
            [pc.sum(group["n_images"]).as_py()],
            [pc.sum(group["payload_bytes"]).as_py()],
            [pc.min(group["first_seq"]).as_py()],
            [pc.max(group["last_seq"]).as_py()],
            np.bitwise_xor.reduce(xs.astype(np.uint64), keepdims=True),
        )

    assignments = (
        _assignments if _assignments is not None
        else _shard_assignments(images_path)
    )
    ds = (
        assignments
        .map_batches(partials, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(merge, batch_format="pyarrow")
    )
    return _sorted(_concat(ds), "shard")


def q_bucket_stats(images_path: str) -> pa.Table:
    """Dataset-card rollup per (aspect bucket, format) — the summary a
    curation run publishes next to the shard layout: image count, payload
    bytes, dimension extremes, caption-word totals. Integer-exact
    end to end (bucket via :func:`aspect_bucket_ids`; caption words =
    non-space runs, the imagecurate convention), so the SQL oracle
    replays it bit-for-bit.

    Scale shape: one streamed pass; a per-batch combiner collapses each
    Arrow batch to ≤ |buckets × fmts| partial rows, and the final merge
    runs over that BOUNDED key space (5 prototypes × a handful of
    formats) — the driver only ever holds the O(buckets × fmts) card,
    never rows."""
    import polars as pl

    from spider_ray.functions.imagecurate import _WORD_PAT
    from spider_ray.stages.agg import partial_final_agg

    ds = read_images(
        images_path, columns=["bytes", "w", "h", "fmt", "caption"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket_id": pa.array(aspect_bucket_ids(w, h), pa.int64()),
                "fmt": batch["fmt"].cast(pa.string()),
                "w": pa.array(w, pa.int64()),
                "h": pa.array(h, pa.int64()),
                "n_bytes": pc.binary_length(batch["bytes"]).cast(pa.int64()),
                "n_words": pc.count_substring_regex(
                    batch["caption"], _WORD_PAT
                ).cast(pa.int64()),
            }
        )

    def partial(lf: "pl.LazyFrame") -> "pl.LazyFrame":
        return lf.group_by("bucket_id", "fmt").agg(
            n_images=pl.len().cast(pl.Int64),
            payload_bytes=pl.col("n_bytes").sum(),
            min_w=pl.col("w").min(),
            max_w=pl.col("w").max(),
            min_h=pl.col("h").min(),
            max_h=pl.col("h").max(),
            caption_words=pl.col("n_words").sum(),
        )

    def final(lf: "pl.LazyFrame") -> "pl.LazyFrame":
        return (
            lf.group_by("bucket_id", "fmt")
            .agg(
                n_images=pl.col("n_images").sum(),
                payload_bytes=pl.col("payload_bytes").sum(),
                min_w=pl.col("min_w").min(),
                max_w=pl.col("max_w").max(),
                min_h=pl.col("min_h").min(),
                max_h=pl.col("max_h").max(),
                caption_words=pl.col("caption_words").sum(),
            )
            .sort("bucket_id", "fmt")
        )

    return partial_final_agg(
        ds.map_batches(prep, batch_format="pyarrow"), partial, final
    )


"""Epoch-shuffle seeds — frozen; the SQL oracle replays both keys with
HUGEINT modular arithmetic, so never change them without regenerating
goldens. Distinct additive seeds keep the shard-order stream and the
within-shard stream independent."""
EPOCH_SHARD_SEED = 101
EPOCH_MEMBER_SEED = 202
EPOCH_STRIDE = 1_000_003


def epoch_key(x: np.ndarray, seed: int) -> np.ndarray:
    """DOUBLE-mix64 permutation key: ``mix64_int(mix64_int(x, seed))``.
    A single mix64_int round is NOT seed-diffusing — its seed enters
    additively after the multiply, so two seeds shift every key by a
    near-constant and the induced ORDER barely changes (verified: single
    round gives identical argsort across epoch seeds). The second round
    avalanches the seed into the ordering. Frozen; replayed in SQL as the
    same 4-stage mixer applied twice."""
    return mix64_int(mix64_int(x, seed=seed))


def q_epoch_shuffle(images_path: str, epoch: int = 1) -> pa.Table:
    """Deterministic WebDataset-style training-epoch order over the shard
    layout (Aizman et al. 2019 §IV: shuffle the SHARD LIST, then shuffle
    WITHIN each shard — never a global row shuffle): shards are permuted
    by the frozen key ``epoch_key(shard, EPOCH_STRIDE·epoch +
    EPOCH_SHARD_SEED)`` and each shard's members are ordered by
    ``epoch_key(seq, EPOCH_STRIDE·epoch + EPOCH_MEMBER_SEED)`` (ties on
    either key break to the smaller shard / seq). ``epoch_pos`` is the
    global position in that order — a new epoch value re-deals both
    levels without touching the bytes on disk.

    Scale shape: the pack itself is the distributed per-range walk
    (:func:`_shard_assignments`); positions need NO global sort — the
    driver holds only the O(shards) size/permutation cumsum (the same
    O(ranges) footprint as `_offsets_of`), and ranks are local sorts
    inside a hash-partitioned ``groupby(shard).map_groups``."""
    from ray.data.aggregate import Count

    shard_seed = EPOCH_STRIDE * epoch + EPOCH_SHARD_SEED
    member_seed = EPOCH_STRIDE * epoch + EPOCH_MEMBER_SEED

    assignments = _shard_assignments(images_path).materialize()

    # O(shards) driver state: permuted epoch base offset per shard
    counts = assignments.groupby("shard").aggregate(Count()).to_pandas()
    shard_ids = counts["shard"].to_numpy().astype(np.int64)
    sizes = counts["count()"].to_numpy().astype(np.int64)
    skey = epoch_key(shard_ids, shard_seed)
    perm = np.lexsort((shard_ids, skey))
    bases = np.zeros(len(perm), dtype=np.int64)
    bases[perm] = np.concatenate([[0], np.cumsum(sizes[perm])[:-1]])
    base_ref = ray.put(dict(zip(shard_ids.tolist(), bases.tolist())))

    def rank_shard(group: pa.Table) -> pa.Table:
        base = ray.get(base_ref)[group["shard"][0].as_py()]
        seq = group["seq"].to_numpy(zero_copy_only=False).astype(np.int64)
        mkey = epoch_key(seq, member_seed)
        order = np.lexsort((seq, mkey))
        pos = np.empty(len(seq), dtype=np.int64)
        pos[order] = base + np.arange(len(seq), dtype=np.int64)
        return pa.table(
            {
                "image_id": group["image_id"],
                "seq": group["seq"],
                "shard": group["shard"],
                "epoch_pos": pa.array(pos, pa.int64()),
            }
        )

    ds = (
        assignments.groupby("shard")
        .map_groups(rank_shard, batch_format="pyarrow")
    )
    return _sorted(_concat(ds), "epoch_pos")


def q_bucket_shard_pack(images_path: str) -> pa.Table:
    """Aspect-bucketed WebDataset shard layout — the composition a
    bucketed dataloader (SDXL-style, arXiv:2307.01952 App. I) actually
    consumes: batches must be same-bucket, so shards must be too. Every
    image gets its ASPECT_BUCKETS argmin (:func:`aspect_bucket_ids`),
    then images pack greedily in seq order WITHIN each (bucket, pack
    range): same walk, same budget, shards never mix buckets or span a
    range. Global shard ids are contiguous in (bucket, range, local)
    order, so each bucket's shards form one contiguous id interval per
    range — a per-bucket reader is a range scan, not a scatter.

    Scale shape and implementation are exactly
    :func:`q_image_shard_pack` with the composite pack unit: this is the
    same `_bucket_packed_local` → `_offsets_of` → `_assignments_from`
    chain the shard writer consumes, so the oracled plan and the written
    layout can never drift."""
    packed = _bucket_packed_local(images_path)
    ds = _assignments_from(packed, _offsets_of(packed))

    def reveal_bucket(batch: pa.Table) -> pa.Table:
        unit = batch["range_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "seq": batch["seq"],
                "n_bytes": batch["n_bytes"],
                "bucket_id": pa.array(unit // _BUCKET_GRP, pa.int64()),
                "shard": batch["shard"],
            }
        )

    return _sorted(
        _concat(ds.map_batches(reveal_bucket, batch_format="pyarrow")),
        ["bucket_id", "seq"],
    )


# --- aspect-bucket balancing -----------------------------------------------

# frozen mixer seed for the balance sample (shared with the SQL oracle)
BAL_SEED = 20260821


def q_bucket_balance(images_path: str) -> pa.Table:
    """Deterministic per-aspect-bucket quota resampling — the bucket twin
    of the text pipeline's ``q_mixture_sample``: down-sample every aspect
    bucket toward the SMALLEST bucket's count so the training mixture is
    aspect-balanced (a bucketed-dataloader epoch otherwise over-trains the
    dominant aspect). keep_rate(bucket) = min_count / count(bucket),
    decided per row by the frozen ``mix64_int(image seq, BAL_SEED)`` key
    against the EXACT integer threshold ``(2^64 * min_count) // count`` —
    rate-based (streaming, no per-bucket sort), so the sampled size is
    approximate but the SAMPLE ITSELF is deterministic and bit-exact
    SQL-replayable.

    Scale shape: pass 1 is a per-block bincount + native groupby over
    BOUNDED keys (len(ASPECT_BUCKETS)); the ≤5-row count table is the only
    thing the driver sees. Pass 2 streams with the thresholds captured in
    the task closure. No corpus-proportional state anywhere."""
    ds = read_images(images_path, columns=["image_id", "w", "h"])
    n_buckets = len(ASPECT_BUCKETS)

    def partial_counts(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        bc = np.bincount(aspect_bucket_ids(w, h), minlength=n_buckets)
        return pa.table(
            {
                "bucket_id": pa.array(
                    np.arange(n_buckets, dtype=np.int64), pa.int64()
                ),
                "n": pa.array(bc.astype(np.int64), pa.int64()),
            }
        )

    cnt = _concat(
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("bucket_id")
        .sum("n")
    )
    n_by = dict(
        zip(cnt["bucket_id"].to_pylist(), cnt["sum(n)"].to_pylist())
    )
    present = {b: n for b, n in n_by.items() if n > 0}
    c_min = min(present.values())
    thresh = {b: ((1 << 64) * c_min) // n for b, n in present.items()}

    def pick(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = aspect_bucket_ids(w, h)
        ext = pc.struct_field(
            pc.extract_regex(batch["image_id"], r"/i/(?P<seq>\d+)$"), "seq"
        )
        assert ext.null_count == 0, (
            "bucket_balance keys on the corpus image seq: every image_id "
            "must carry the /i/<seq> suffix"
        )
        seq = pc.cast(ext, pa.uint64()).to_numpy(zero_copy_only=False)
        u = mix64_int(seq, BAL_SEED)
        keep = np.zeros(len(k), dtype=bool)
        for b, n in present.items():
            m = k == b
            if not m.any():
                continue
            keep[m] = True if n == c_min else u[m] < np.uint64(thresh[b])
        return pa.table(
            {
                "image_id": batch["image_id"].cast(pa.string()),
                "bucket_id": pa.array(k, pa.int64()),
            }
        ).filter(pa.array(keep))

    return _sorted(
        _concat(ds.map_batches(pick, batch_format="pyarrow")), "image_id"
    )
