"""Resize-to-bucket preprocessing for the image+caption corpus — the step
between curation and shard packing in an SDXL-style bucketed pipeline
(Podell et al. 2023, arXiv:2307.01952 App. I: every training image is
resized to its aspect bucket's fixed resolution, cover-scale + center
crop, so batches are same-shape tensors):

* :func:`q_resize_plan` — the per-image GEOMETRY, integer-exact end to
  end so a DuckDB oracle replays it bit-for-bit: aspect bucket (the
  frozen :func:`~spider_ray.functions.imageshard.aspect_bucket_ids`
  argmin), the bucket's target dims (BUCKET_DIMS — near-equal pixel
  area across buckets, the SDXL convention), the cover-scaled dims
  (scale UP to the larger of the two axis ratios, floor division — the
  branch test ``w·th ≥ h·tw`` and both scaled axes are exact int64),
  and the centered crop offsets. One embarrassingly-parallel pass over
  pruned (image_id, w, h); the bytes column never moves.
* :class:`ResizeToBucket` — the pixel stage: an actor-pool
  ``map_batches`` class (codec tables built once per actor in
  ``__init__``) that decodes each payload with the real codecs
  (``kernels/imaging.py``: from-scratch PNG, deterministic lossy qimg),
  nearest-neighbor samples the cover-scaled grid, center-crops to the
  bucket dims, re-encodes in the SAME format and recomputes the phash —
  emitting the exact input_hint schema, so the output store feeds
  directly into `q_bucket_shard_pack` / `write_shards(layout="bucket")`.
  Per-row decode is inherent to a codec boundary (the multimodal-stage
  precedent); everything around it is columnar, and the stage is sized
  by ``batch_size`` for payload-heavy corpora.

Scale shape: the plan is a streamed map over 3 small columns; the pixel
pass moves each byte exactly once through an actor pool and emits rows
1:1 — no shuffle anywhere. Geometry is frozen: changing BUCKET_DIMS or
the rounding convention invalidates goldens and the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from spider_ray.functions.imageshard import aspect_bucket_ids
from spider_ray.kernels.imaging import decode_image, encode_image, phash64
from spider_ray.pipelines.relational import _concat, _sorted
from spider_ray.sources.lance_io import read_images

# Target (w, h) per aspect bucket — near-equal pixel area (~2000 px,
# scaled to this corpus's 16-48 px dims; a production build multiplies
# by 16). Index == ASPECT_BUCKETS index. FROZEN: shared verbatim by the
# SQL oracle.
BUCKET_DIMS = [(32, 64), (36, 54), (45, 45), (54, 36), (64, 32)]

_TW = np.array([d[0] for d in BUCKET_DIMS], dtype=np.int64)
_TH = np.array([d[1] for d in BUCKET_DIMS], dtype=np.int64)


def resize_geometry(
    w: np.ndarray, h: np.ndarray
) -> tuple[np.ndarray, ...]:
    """Frozen integer cover-scale + center-crop geometry, vectorized:
    returns (bucket_id, target_w, target_h, scaled_w, scaled_h, crop_x,
    crop_y) — ONE implementation shared by the plan query and the pixel
    stage, so the written pixels can never drift from the oracled plan.

    Cover rule: scale so the image covers the target box. If
    ``w·th ≥ h·tw`` the image is wider than the target — the height
    pins (scaled_h = th, scaled_w = w·th // h, which the branch test
    guarantees ≥ tw); else the width pins. Crops center with the
    low-side bias of floor division."""
    k = aspect_bucket_ids(w, h)
    tw, th = _TW[k], _TH[k]
    wide = w * th >= h * tw
    sw = np.where(wide, (w * th) // h, tw)
    sh = np.where(wide, th, (h * tw) // w)
    return k, tw, th, sw, sh, (sw - tw) // 2, (sh - th) // 2


def q_resize_plan(images_path: str) -> pa.Table:
    """Per-image resize geometry for the SDXL bucketed pipeline —
    SQL-oracled bit-exact (integer argmin + integer cover/crop). Reads
    only (image_id, w, h)."""
    ds = read_images(images_path, columns=["image_id", "w", "h"])

    def plan(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        k, tw, th, sw, sh, cx, cy = resize_geometry(w, h)
        return pa.table(
            {
                "image_id": batch["image_id"].cast(pa.string()),
                "w": pa.array(w, pa.int64()),
                "h": pa.array(h, pa.int64()),
                "bucket_id": pa.array(k, pa.int64()),
                "target_w": pa.array(tw, pa.int64()),
                "target_h": pa.array(th, pa.int64()),
                "scaled_w": pa.array(sw, pa.int64()),
                "scaled_h": pa.array(sh, pa.int64()),
                "crop_x": pa.array(cx, pa.int64()),
                "crop_y": pa.array(cy, pa.int64()),
            }
        )

    return _sorted(
        _concat(ds.map_batches(plan, batch_format="pyarrow")), "image_id"
    )


def resize_pixels(
    img: np.ndarray, tw: int, th: int, sw: int, sh: int, cx: int, cy: int
) -> np.ndarray:
    """Nearest-neighbor sample of the cover-scaled grid, restricted to
    the centered (tw × th) crop — the crop's source indices are computed
    directly, so only target pixels are ever touched. Frozen sampling
    rule: source index = (dst_index · src_extent) // scaled_extent."""
    h, w = img.shape[:2]
    ys = ((cy + np.arange(th, dtype=np.int64)) * h) // sh
    xs = ((cx + np.arange(tw, dtype=np.int64)) * w) // sw
    return img[ys[:, None], xs[None, :]]


class ResizeToBucket:
    """Actor-pool pixel stage: decode → cover-scale/center-crop to the
    aspect bucket's dims → re-encode (same format) → re-phash. Emits the
    input_hint schema 1:1. Use with
    ``ds.map_batches(ResizeToBucket, concurrency=N, batch_size=B,
    batch_format="pyarrow")`` — small B for payload-heavy corpora."""

    def __init__(self) -> None:
        # codec + hash bound once per actor (the stateful-stage contract)
        self._decode = decode_image
        self._encode = encode_image
        self._phash = phash64

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, tw, th, sw, sh, cx, cy = resize_geometry(w, h)
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        out_bytes, out_phash = [], []
        for i, (data, fmt) in enumerate(zip(payloads, fmts)):
            img = self._decode(data, fmt)
            small = resize_pixels(
                img, int(tw[i]), int(th[i]), int(sw[i]), int(sh[i]),
                int(cx[i]), int(cy[i]),
            )
            out_bytes.append(self._encode(small, fmt))
            out_phash.append(self._phash(small))
        return pa.table(
            {
                "image_id": batch["image_id"].cast(pa.string()),
                "bytes": pa.array(out_bytes, pa.binary()),
                "w": pa.array(tw, pa.int32()),
                "h": pa.array(th, pa.int32()),
                "fmt": batch["fmt"].cast(pa.string()),
                "caption": batch["caption"].cast(pa.string()),
                "phash": pa.array(
                    np.array(out_phash, dtype=np.uint64).astype(np.int64),
                    pa.int64(),
                ),
            }
        )


def resize_corpus(images_path: str, *, concurrency: int = 4):
    """The distributed pixel pass: stream the corpus through a
    :class:`ResizeToBucket` actor pool. Returns a Dataset in the
    input_hint schema whose every image sits exactly at its bucket's
    dims — ready for ``write_shards(..., layout="bucket")``. Size
    ``concurrency`` BELOW the session's CPU count: the pool pins its
    CPU slots for the stage's lifetime and the surrounding read/write
    tasks must still schedule (an equal-to-cpus pool starves the
    pipeline — observed as a 30× stall at concurrency == num_cpus)."""
    ds = read_images(images_path)
    return ds.map_batches(
        ResizeToBucket,
        concurrency=concurrency,
        batch_size=64,
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# deterministic augmentation crop plan
# --------------------------------------------------------------------------

AUG_SEED = 20260823
AUG_EPOCHS = 3


def q_aug_crop_plan(images_path: str) -> pa.Table:
    """Per-(epoch, image) RANDOM-crop origins for training augmentation —
    deterministic, so a resumed/restarted training job reproduces the
    exact same augmented stream (the reproducibility contract
    epoch_shuffle gives the ORDER, extended to the pixels): origin =
    mix64(seq·AUG_EPOCHS + epoch, seed) modulo the cover-resize slack
    (scaled − target + 1 positions per axis; two independent frozen
    seeds for x and y). Replaces :func:`q_resize_plan`'s CENTER crop at
    train time; the geometry is the same frozen integer
    ``resize_geometry``. One streamed pass, AUG_EPOCHS rows out per
    image, all integer — SQL-oracled bit-exact."""
    import polars as pl

    from spider_ray.kernels.hashing import mix64_int

    ds = read_images(images_path, columns=["image_id", "w", "h"])

    def plan(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].cast(pa.string())
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        k, tw, th, sw, sh, _cx, _cy = resize_geometry(w, h)
        seq = (
            pl.from_arrow(ids)
            .str.extract(r"(\d+)$", 1)
            .cast(pl.Int64)
            .to_numpy()
            .astype(np.int64)
        )
        n = len(seq)
        slack_w = (sw - tw + 1).astype(np.int64)
        slack_h = (sh - th + 1).astype(np.int64)
        out_ids = np.repeat(np.arange(n), AUG_EPOCHS)
        epochs = np.tile(np.arange(AUG_EPOCHS, dtype=np.int64), n)
        key = seq[out_ids] * AUG_EPOCHS + epochs
        ux = mix64_int(key, AUG_SEED)
        uy = mix64_int(key, AUG_SEED + 1)
        x = (ux % slack_w[out_ids].astype(np.uint64)).astype(np.int64)
        y = (uy % slack_h[out_ids].astype(np.uint64)).astype(np.int64)
        return pa.table(
            {
                "image_id": ids.take(pa.array(out_ids)),
                "epoch": pa.array(epochs, pa.int64()),
                "bucket_id": pa.array(k[out_ids], pa.int64()),
                "crop_x": pa.array(x, pa.int64()),
                "crop_y": pa.array(y, pa.int64()),
            }
        )

    return _sorted(
        _concat(ds.map_batches(plan, batch_format="pyarrow")),
        ["image_id", "epoch"],
    )
