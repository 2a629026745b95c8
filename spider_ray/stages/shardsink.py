"""Resumable WebDataset-style shard WRITER for the image+caption store —
the sink half of the training-layout story (`functions/imageshard.py`
plans the layout; this module materializes it on disk and can prove the
files match the plan):

* :func:`write_shards` — physically re-layout the corpus into the
  `q_image_shard_pack` plan: one parquet file per global shard, grouped
  in one directory per pack range (`range=%06d/`), members in seq order
  with the exact input_hint schema. RESUMABLE at range granularity, the
  pack's independence unit: each range directory is staged in a hidden
  tmp dir (its `_DONE` marker and `_MANIFEST.json` lineage record written
  first), then atomically renamed into place — a crashed run leaves only
  tmp dirs, which the next run wipes; finished ranges are pruned from the
  stream BEFORE the payload shuffle, so resume re-ships only unfinished
  bytes. S2 donelist semantics (`crawl/time_split_saver.h:16-57`,
  `fetcher_worker_main.cc:140-144`) applied to the training-layout sink.
* :func:`verify_shards` — integrity audit: re-reads every written shard
  file, recomputes each shard's manifest row (counts, byte totals, seq
  interval, xor-of-mix64 checksum) from the actual bytes on disk PLUS a
  members-in-seq-order check (the rollup fields are all
  permutation-invariant, so order needs its own eye), and compares
  against the `manifest.parquet` the writer left at the root (which
  itself is the independently SQL-oracled `q_shard_manifest`).

Scale shape: the only all-to-all is the payload `groupby(range_id)` —
inherent to a physical re-layout (every byte must reach its writer), and
bounded per worker by one range's payload (SHARD_RANGE images). The plan
passes read only (image_id, byte length); the driver holds the O(ranges)
offset map and the O(ranges) summary, never payload. Verification is an
embarrassingly-parallel map over shard FILES (one shard == one file — no
shuffle), joined to the manifest driver-side at O(shards).

Fault tolerance: range commits are atomic tmp-dir renames and IDEMPOTENT
under Ray task retries (a marked destination is kept, the retry's stage
dropped); the root manifest is replaced atomically BEFORE the payload
pass, right after the staleness wipe, so a crash at any point leaves
manifest + a subset of its own ranges — never stale ids over new files.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from spider_ray.functions.imageshard import (
    _BUCKET_GRP,
    SHARD_RANGE,
    _assignments_from,
    _bucket_packed_local,
    _offsets_of,
    _packed_local,
    aspect_bucket_ids,
    greedy_local_shards,
    member_checksum_keys,
    q_shard_manifest,
)
from spider_ray.pipelines.relational import _concat, _sorted
from spider_ray.sources.lance_io import IMAGE_HINT_SCHEMA, read_images

_SEQ_NAMED = r"(?P<seq>\d+)$"  # RE2 spelling of imageshard._SEQ_PAT
# (RE2 requires named groups in extract_regex; the polars sites keep _SEQ_PAT)
_RANGE_FMT = "range=%06d"
_SHARD_FMT = "shard-%08d.parquet"

_SUMMARY_SCHEMA = pa.schema(
    [
        ("range_id", pa.int64()),
        ("base_shard", pa.int64()),
        ("n_shards", pa.int64()),
        ("n_images", pa.int64()),
        ("payload_bytes", pa.int64()),
        ("skipped", pa.bool_()),
    ]
)


def _scan_done(out_dir: str) -> set[int]:
    """Donelist scan: wipe tmp staging dirs and markerless range dirs (a
    crashed attempt's partials — the retry owns the whole range), return
    the ids of ranges already committed."""
    done: set[int] = set()
    if not os.path.isdir(out_dir):
        return done
    for d in os.listdir(out_dir):
        p = os.path.join(out_dir, d)
        if d.startswith(".tmp-"):
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
        elif d.startswith("range=") and os.path.isdir(p):
            if os.path.exists(os.path.join(p, "_DONE")):
                done.add(int(d.split("=", 1)[1]))
            else:
                shutil.rmtree(p)
    return done


def write_shards(
    images_path: str, out_dir: str, *, layout: str = "seq"
) -> pa.Table:
    """Write the corpus as the planned shard layout under ``out_dir``;
    returns the per-range summary (written + skipped rows). Re-running
    after a crash or deletion rewrites exactly the missing ranges; if the
    SOURCE changed since a range was committed (e.g. the corpus grew into
    the trailing partial range, or an upstream edit shifted global shard
    ids), the stale range's on-disk `_MANIFEST.json` no longer matches
    the recomputed plan and it is rewritten too — incremental append is
    just resume over a grown corpus.

    ``layout="seq"`` materializes the `q_image_shard_pack` plan (pack
    unit = seq range); ``layout="bucket"`` the `q_bucket_shard_pack` plan
    (pack unit = the composite (aspect bucket, seq range) key — shards
    never mix buckets, the layout an SDXL-style bucketed dataloader
    consumes). Everything downstream — donelist resume, staleness check,
    manifest, verify, read_shards — is pack-unit-agnostic. Switching
    layout on an existing out_dir is safe: every committed unit fails the
    staleness check against the new plan and is rewritten."""
    if layout not in ("seq", "bucket"):
        raise ValueError(f"unknown layout {layout!r}")
    os.makedirs(out_dir, exist_ok=True)
    done = _scan_done(out_dir)

    # ONE pack pass (image_id + byte length [+ w,h for bucket] only)
    # feeds the offsets, the per-unit staleness check, and the manifest
    packed = (
        _packed_local(images_path)
        if layout == "seq"
        else _bucket_packed_local(images_path)
    )
    offsets = _offsets_of(packed)
    manifest = q_shard_manifest(
        images_path, _assignments=_assignments_from(packed, offsets)
    )

    plan_by_range: dict[int, list[dict]] = {}
    for r in manifest.to_pylist():
        plan_by_range.setdefault(r.pop("range_id"), []).append(r)
    for rid in sorted(done):
        path = os.path.join(out_dir, _RANGE_FMT % rid)
        with open(os.path.join(path, "_MANIFEST.json")) as f:
            on_disk = json.load(f)["shards"]
        if on_disk != plan_by_range.get(rid):
            done.discard(rid)
            shutil.rmtree(path)
    # committed ranges the new plan no longer contains are stale too
    for rid in sorted(done - set(plan_by_range)):
        done.discard(rid)
        shutil.rmtree(os.path.join(out_dir, _RANGE_FMT % rid))

    # root manifest: written ATOMICALLY (tmp + rename), and BEFORE the
    # payload pass — the staleness wipe above already removed every
    # committed dir that disagrees with this plan, so a crash mid-write
    # leaves manifest + a subset of its ranges (verify/read report the
    # missing shards; nothing silently serves stale ids against new files)
    mtmp = os.path.join(out_dir, f".tmp-manifest-{uuid.uuid4().hex[:8]}")
    pq.write_table(manifest, mtmp)
    os.replace(mtmp, os.path.join(out_dir, "manifest.parquet"))
    ltmp = os.path.join(out_dir, f".tmp-layout-{uuid.uuid4().hex[:8]}")
    with open(ltmp, "w") as f:
        json.dump({"layout": layout}, f)
    os.replace(ltmp, os.path.join(out_dir, "_LAYOUT.json"))

    off_ref = ray.put(offsets)
    done_ref = ray.put(done)

    data_cols = [f.name for f in IMAGE_HINT_SCHEMA]
    ds = read_images(images_path)

    def tag(batch: pa.Table) -> pa.Table:
        # seq + pack unit, then prune finished units BEFORE the shuffle
        seq = pc.struct_field(
            pc.extract_regex(batch["image_id"].cast(pa.string()), _SEQ_NAMED),
            "seq",
        ).cast(pa.int64())
        rid = pc.divide(seq, SHARD_RANGE)
        if layout == "bucket":
            w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
            h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
            unit = aspect_bucket_ids(w, h) * _BUCKET_GRP + rid.to_numpy(
                zero_copy_only=False
            )
            rid = pa.array(unit, pa.int64())
        out = batch.append_column("seq", seq).append_column("range_id", rid)
        skip = ray.get(done_ref)
        if skip:
            keep = np.isin(
                rid.to_numpy(zero_copy_only=False),
                np.fromiter(skip, dtype=np.int64),
                invert=True,
            )
            out = out.filter(pa.array(keep))
        return out

    def write_range(group: pa.Table) -> pa.Table:
        rid = group["range_id"][0].as_py()
        base = ray.get(off_ref)[rid]
        order = pc.sort_indices(group["seq"])
        group = group.take(order)
        nb = pc.binary_length(group["bytes"]).to_numpy(zero_copy_only=False)
        local = np.asarray(
            greedy_local_shards(nb.tolist()), dtype=np.int64
        )
        seq = group["seq"].to_numpy(zero_copy_only=False)
        keys = member_checksum_keys(seq.astype(np.int64), nb.astype(np.int64))

        tmp = os.path.join(
            out_dir, f".tmp-{_RANGE_FMT % rid}-{uuid.uuid4().hex[:8]}"
        )
        os.makedirs(tmp)
        manifest = []
        for s in range(int(local.max()) + 1 if len(local) else 0):
            mask = local == s
            sid = base + s
            members = group.filter(pa.array(mask)).select(data_cols)
            pq.write_table(
                members, os.path.join(tmp, _SHARD_FMT % sid)
            )
            manifest.append(
                {
                    "shard": int(sid),
                    "n_images": int(mask.sum()),
                    "payload_bytes": int(nb[mask].sum()),
                    "first_seq": int(seq[mask].min()),
                    "last_seq": int(seq[mask].max()),
                    "checksum": int(np.bitwise_xor.reduce(keys[mask])),
                }
            )
        with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
            json.dump({"range_id": rid, "shards": manifest}, f)
        with open(os.path.join(tmp, "_DONE"), "w") as f:
            f.write("")
        # commit: marker + lineage travel WITH the atomic rename. A Ray
        # task RETRY can reach here after a previous attempt already
        # committed (worker died between rename and returning the result);
        # a marked destination is that attempt's finished work — keep it,
        # drop ours (byte-identical by construction: same plan, same sort)
        dest = os.path.join(out_dir, _RANGE_FMT % rid)
        if os.path.exists(os.path.join(dest, "_DONE")):
            shutil.rmtree(tmp)
        else:
            os.rename(tmp, dest)
        return pa.table(
            {
                "range_id": pa.array([rid], pa.int64()),
                "base_shard": pa.array([base], pa.int64()),
                "n_shards": pa.array([len(manifest)], pa.int64()),
                "n_images": pa.array([len(group)], pa.int64()),
                "payload_bytes": pa.array([int(nb.sum())], pa.int64()),
                "skipped": pa.array([False], pa.bool_()),
            }
        )

    written = _concat(
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("range_id")
        .map_groups(write_range, batch_format="pyarrow"),
        schema=_SUMMARY_SCHEMA,
    )

    # skipped ranges surface in the summary from their on-disk lineage
    skipped_rows = []
    for rid in sorted(done):
        with open(
            os.path.join(out_dir, _RANGE_FMT % rid, "_MANIFEST.json")
        ) as f:
            m = json.load(f)
        skipped_rows.append(
            {
                "range_id": rid,
                "base_shard": offsets[rid],
                "n_shards": len(m["shards"]),
                "n_images": sum(s["n_images"] for s in m["shards"]),
                "payload_bytes": sum(s["payload_bytes"] for s in m["shards"]),
                "skipped": True,
            }
        )
    if skipped_rows:
        written = pa.concat_tables(
            [written, pa.Table.from_pylist(skipped_rows, _SUMMARY_SCHEMA)]
        )

    return _sorted(written, "range_id")


def _shard_files(out_dir: str) -> dict[int, str]:
    """{global shard id: file path} for every committed shard on disk."""
    out: dict[int, str] = {}
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if d.startswith("range=") and os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                if f.startswith("shard-") and f.endswith(".parquet"):
                    out[int(f.split("-")[1].split(".")[0])] = os.path.join(
                        p, f
                    )
    return out


def read_shards(
    out_dir: str,
    *,
    columns: list[str] | None = None,
    shards: list[int] | None = None,
    seq_range: tuple[int, int] | None = None,
    bucket: int | None = None,
) -> "ray.data.Dataset":
    """Dataloader-side read of a written shard layout as a streaming
    Dataset, pruned at the FILE level before any byte is read: ``shards``
    selects explicit shard ids, ``seq_range=(lo, hi)`` (inclusive) keeps
    only shards whose manifest [first_seq, last_seq] interval intersects
    it — the manifest is the layout's zone map; ``bucket=k`` (bucketed
    layouts) keeps only aspect-bucket k's shards. Column projection pushes
    into the parquet scan, so a caption-only consumer never moves the
    payload. Raises if a manifest-listed shard in the selection is
    missing on disk (run :func:`verify_shards` for the full audit)."""
    manifest = pq.read_table(
        os.path.join(out_dir, "manifest.parquet"),
        columns=["shard", "range_id", "first_seq", "last_seq"],
    )
    keep = manifest
    if bucket is not None:
        # bucketed layouts encode (bucket, range) in the pack-unit id; a
        # per-bucket dataloader epoch is a manifest filter, zero scatter.
        # The layout marker (not a unit-value heuristic: an all-bucket-0
        # corpus has every unit < 2^32) gates the filter.
        with open(os.path.join(out_dir, "_LAYOUT.json")) as f:
            written_layout = json.load(f)["layout"]
        if written_layout != "bucket":
            raise ValueError(
                f"bucket= filter on a {written_layout!r}-layout shard dir "
                "(pack units carry no bucket component) — write with "
                "layout='bucket'"
            )
        keep = keep.filter(
            pc.equal(pc.divide(keep["range_id"], _BUCKET_GRP), bucket)
        )
    if shards is not None:
        keep = keep.filter(pc.is_in(keep["shard"], pa.array(shards)))
    if seq_range is not None:
        lo, hi = seq_range
        keep = keep.filter(
            pc.and_(
                pc.less_equal(keep["first_seq"], hi),
                pc.greater_equal(keep["last_seq"], lo),
            )
        )
    on_disk = _shard_files(out_dir)
    wanted = keep["shard"].to_pylist()
    missing = [s for s in wanted if s not in on_disk]
    if missing:
        raise FileNotFoundError(
            f"manifest lists shards missing on disk: {missing[:10]}"
        )
    files = [on_disk[s] for s in wanted]
    if not files:
        return ray.data.from_arrow(
            pa.Table.from_pylist([], IMAGE_HINT_SCHEMA).select(
                columns or [f.name for f in IMAGE_HINT_SCHEMA]
            )
        )
    # always project explicitly: the range=... directory names would
    # otherwise be hive-inferred into a spurious partition column
    return ray.data.read_parquet(
        files, columns=columns or [f.name for f in IMAGE_HINT_SCHEMA]
    )


def iter_epoch(
    out_dir: str,
    epoch: int,
    *,
    columns: list[str] | None = None,
    rank: int = 0,
    world: int = 1,
    bucket: int | None = None,
):
    """Consume a written shard layout in the deterministic training-epoch
    order — the dataloader-side twin of
    :func:`~spider_ray.functions.imageshard.q_epoch_shuffle`, yielding
    one Arrow table per shard: shards in the frozen ``epoch_key``
    permutation, members re-ordered inside each shard by the member key.
    Every shard is still exactly ONE sequential file read; only the
    in-memory member order changes per epoch, so a new epoch moves zero
    bytes on disk.

    ``rank`` / ``world`` stride the permuted shard list (shard i goes to
    worker ``i % world``) — the standard multi-worker loader split: ranks
    see disjoint shards whose interleaved concatenation is the full epoch
    order. Per-worker state is O(shards in manifest) ids + one shard's
    payload.

    ``bucket=k`` (bucketed layouts only — the SDXL same-shape-batch
    loader) restricts the epoch to aspect-bucket k's shards. Shard keys
    depend only on the global shard id, so the per-bucket stream is
    exactly the full epoch order filtered to that bucket (tested)."""
    from spider_ray.functions.imageshard import (
        EPOCH_MEMBER_SEED,
        EPOCH_SHARD_SEED,
        EPOCH_STRIDE,
        epoch_key,
    )

    if not (0 <= rank < world):
        raise ValueError(f"rank {rank} outside world {world}")
    manifest = pq.read_table(
        os.path.join(out_dir, "manifest.parquet"),
        columns=["shard", "range_id"],
    )
    if bucket is not None:
        # same layout gate as read_shards: pack units carry a bucket
        # component only when written with layout="bucket"
        with open(os.path.join(out_dir, "_LAYOUT.json")) as f:
            written_layout = json.load(f)["layout"]
        if written_layout != "bucket":
            raise ValueError(
                f"bucket= filter on a {written_layout!r}-layout shard dir "
                "(pack units carry no bucket component) — write with "
                "layout='bucket'"
            )
        manifest = manifest.filter(
            pc.equal(pc.divide(manifest["range_id"], _BUCKET_GRP), bucket)
        )
    shard_ids = manifest["shard"].to_numpy().astype(np.int64)
    skey = epoch_key(shard_ids, EPOCH_STRIDE * epoch + EPOCH_SHARD_SEED)
    perm = shard_ids[np.lexsort((shard_ids, skey))]
    on_disk = _shard_files(out_dir)
    missing = [int(s) for s in perm if int(s) not in on_disk]
    if missing:
        raise FileNotFoundError(
            f"manifest lists shards missing on disk: {missing[:10]}"
        )
    member_seed = EPOCH_STRIDE * epoch + EPOCH_MEMBER_SEED
    want = columns or [f.name for f in IMAGE_HINT_SCHEMA]
    # seq (trailing digits of image_id) drives the member key; read
    # image_id regardless, drop it after if the caller didn't ask
    read_cols = list(dict.fromkeys(["image_id", *want]))
    for s in perm[rank::world]:
        t = pq.read_table(on_disk[int(s)], columns=read_cols)
        seq = (
            pc.extract_regex(t["image_id"], _SEQ_NAMED)
            .combine_chunks()
            .field("seq")
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((seq, epoch_key(seq, member_seed)))
        yield t.take(pa.array(order)).select(want)


def verify_shards(out_dir: str) -> dict:
    """Audit the written layout against ``manifest.parquet``: re-read
    every shard file (one shard == one file, so this is an
    embarrassingly-parallel map over files — no shuffle), recompute its
    manifest row from the bytes on disk, check the members are in seq
    order (the dataloader contract the permutation-invariant checksum
    alone cannot see), and report any divergence. Returns
    ``{"shards_checked": n, "mismatches": [...]}`` — an empty mismatch
    list is a clean bill."""
    want = pq.read_table(os.path.join(out_dir, "manifest.parquet"))

    shard_files = _shard_files(out_dir)
    if not shard_files:
        return {
            "shards_checked": 0,
            "mismatches": [{"shard": None, "field": "no shard files"}],
        }

    items = [
        {"shard": sid, "path": p} for sid, p in sorted(shard_files.items())
    ]

    def summarize(batch: pa.Table) -> pa.Table:
        rows = {
            "shard": [], "n_images": [], "payload_bytes": [],
            "first_seq": [], "last_seq": [], "checksum": [], "in_order": [],
        }
        for sid, path in zip(
            batch["shard"].to_pylist(), batch["path"].to_pylist()
        ):
            t = pq.read_table(path, columns=["image_id", "bytes"])
            seq = (
                pc.struct_field(
                    pc.extract_regex(
                        t["image_id"].cast(pa.string()), _SEQ_NAMED
                    ),
                    "seq",
                )
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            nb = (
                pc.binary_length(t["bytes"])
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            keys = member_checksum_keys(seq, nb)
            rows["shard"].append(int(sid))
            rows["n_images"].append(len(seq))
            rows["payload_bytes"].append(int(nb.sum()) if len(nb) else 0)
            rows["first_seq"].append(int(seq.min()) if len(seq) else -1)
            rows["last_seq"].append(int(seq.max()) if len(seq) else -1)
            rows["checksum"].append(
                int(np.bitwise_xor.reduce(keys)) if len(keys) else 0
            )
            rows["in_order"].append(bool(np.all(np.diff(seq) > 0)))
        return pa.table(
            {
                "shard": pa.array(rows["shard"], pa.int64()),
                "n_images": pa.array(rows["n_images"], pa.int64()),
                "payload_bytes": pa.array(rows["payload_bytes"], pa.int64()),
                "first_seq": pa.array(rows["first_seq"], pa.int64()),
                "last_seq": pa.array(rows["last_seq"], pa.int64()),
                "checksum": pa.array(
                    np.array(rows["checksum"], dtype=np.uint64), pa.uint64()
                ),
                "in_order": pa.array(rows["in_order"], pa.bool_()),
            }
        )

    got = _sorted(
        _concat(
            ray.data.from_items(items).map_batches(
                summarize, batch_format="pyarrow"
            )
        ),
        "shard",
    )

    fields = [
        "n_images",
        "payload_bytes",
        "first_seq",
        "last_seq",
        "checksum",
    ]
    want_rows = {r["shard"]: r for r in want.to_pylist()}
    got_rows = {r["shard"]: r for r in got.to_pylist()}
    mismatches = []
    for sid in sorted(set(want_rows) | set(got_rows)):
        if sid not in got_rows:
            mismatches.append({"shard": sid, "field": "missing on disk"})
            continue
        if sid not in want_rows:
            mismatches.append({"shard": sid, "field": "not in manifest"})
            continue
        if not got_rows[sid]["in_order"]:
            mismatches.append({"shard": sid, "field": "members out of seq order"})
        for f in fields:
            if want_rows[sid][f] != got_rows[sid][f]:
                mismatches.append(
                    {
                        "shard": sid,
                        "field": f,
                        "want": want_rows[sid][f],
                        "got": got_rows[sid][f],
                    }
                )
    return {"shards_checked": len(got_rows), "mismatches": mismatches}
