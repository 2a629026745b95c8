"""The image-axis flagship composition, end to end: LAION-style curation
feeding the resumable training-layout sink —

    raw image+caption store
      → curate (gates + phash-cluster best-rep, `functions/imagecurate`)
      → curated store (streamed `write_parquet`, full input_hint schema)
      → planned shard layout + manifest (`stages/shardsink.write_shards`)
      → integrity audit (`verify_shards`)

Scale shape: curation is one streamed filter pass over the full corpus —
the only broadcast state is the two O(near-dup-cluster) maps (`ray.put`),
never a kept-id set (which would be O(corpus) on the driver). The curated
store is written distributed (`Dataset.write_parquet`, one file per
block); the shard writer then re-plans from it with its usual pruned
passes. The curated store is DERIVED data and is rebuilt on every run
(each run wipes it first); resumability lives where it matters — in the
shard layout, whose committed ranges survive re-runs unchanged
(`write_shards` donelist + staleness semantics).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import ray

from spider_ray.functions.imagecurate import (
    PHASH_TAU,
    curate_keep_mask,
    curate_refs,
)
from spider_ray.sources.lance_io import IMAGE_HINT_SCHEMA, read_images
from spider_ray.stages.shardsink import verify_shards, write_shards


def curate_and_shard(
    images_path: str,
    out_dir: str,
    *,
    tau: int = PHASH_TAU,
    resize: bool = False,
    layout: str = "seq",
    resize_concurrency: int = 2,
) -> dict:
    """Run the full curate→layout pipeline; returns
    ``{"total", "kept", "shards", "summary", "audit"}`` where ``summary``
    is the per-range write table and ``audit`` the verify report (raises
    if the audit is not clean — a corrupted layout must not return
    silently).

    ``resize=True`` inserts the :class:`ResizeToBucket` actor-pool pixel
    stage between curation and the curated store — with
    ``layout="bucket"`` that is the full SDXL preprocessing chain
    (curate → resize to bucket dims → bucketed shard layout): resized
    images sit exactly on their prototype's ratio, so the pack's argmin
    reproduces the resize plan's bucket and every shard holds
    same-shape tensors. The extra stage fuses into the same streamed
    pass; nothing new materializes."""
    comp_ref, rep_ref = curate_refs(images_path, tau=tau)
    data_cols = [f.name for f in IMAGE_HINT_SCHEMA]

    ds = read_images(images_path)
    total = ds.count()

    def keep(batch: pa.Table) -> pa.Table:
        mask = curate_keep_mask(batch, ray.get(comp_ref), ray.get(rep_ref))
        return batch.filter(pa.array(mask)).select(data_cols)

    curated_dir = os.path.join(out_dir, "curated")
    if os.path.isdir(curated_dir):
        shutil.rmtree(curated_dir)  # derived data: each run owns it
    curated = ds.map_batches(keep, batch_format="pyarrow")
    if resize:
        from spider_ray.functions.imageresize import ResizeToBucket

        # size the actor pool BELOW the CPU count: the pool pins its CPU
        # slots for the stage's lifetime, and the surrounding read/write
        # tasks must still schedule (an equal-to-cpus pool starves them)
        curated = curated.map_batches(
            ResizeToBucket,
            concurrency=resize_concurrency,
            batch_size=64,
            batch_format="pyarrow",
        )
    curated.write_parquet(curated_dir)

    shard_dir = os.path.join(out_dir, "shards")
    summary = write_shards(curated_dir, shard_dir, layout=layout)
    audit = verify_shards(shard_dir)
    if audit["mismatches"]:
        raise RuntimeError(
            f"curate_and_shard audit failed: {audit['mismatches'][:5]}"
        )
    return {
        "total": int(total),
        "kept": int(sum(summary["n_images"].to_pylist())),
        "shards": int(sum(summary["n_shards"].to_pylist())),
        "summary": summary,
        "audit": audit,
    }
