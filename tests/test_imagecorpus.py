"""End-to-end image-axis composition (pipelines/imagecorpus.py):
curate → curated store → shard layout → audit. Kept set equals
q_image_curate exactly, shard members carry the full input_hint rows,
and a second run is a no-op resume (identical derived plan → every
committed range skipped)."""

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spider_ray.functions.imagecurate import MIN_BYTES, q_image_curate
from spider_ray.pipelines.imagecorpus import curate_and_shard
from spider_ray.sources.lance_io import conform_images, write_images

OK_CAPTION = "a plain five word caption"


@pytest.fixture(scope="module")
def store(tmp_path_factory, ray_session):
    """40 images with seq-carrying ids: two phash near-dup clusters,
    every gate tripped somewhere, the rest clean."""
    rng = random.Random(20240821)
    rows = []
    cluster_a = 0x0000000000000000
    cluster_b = 0x7FFFFFFFFFFFFFFF
    for i in range(40):
        iid = f"img{i:05d}"
        w = h = 64
        caption, nbytes, phash = OK_CAPTION, MIN_BYTES + 100, None
        if i in (3, 9, 15):  # cluster A: rep = most pixels (i=15)
            phash, w, h = cluster_a, 40 + i, 40 + i
        elif i in (20, 21):  # cluster B: both fail the dim gate
            phash, w, h = cluster_b, 10, 10
        elif i == 5:
            caption = "too short"  # caption gate
        elif i == 6:
            nbytes = MIN_BYTES - 1  # byte gate
        elif i == 7:
            w, h = 90, 30  # aspect gate
        if phash is None:
            phash = rng.getrandbits(63)
        rows.append((iid, bytes([i]) * nbytes, w, h, caption, phash))
    tbl = conform_images(
        pa.table(
            {
                "image_id": [r[0] for r in rows],
                "bytes": [r[1] for r in rows],
                "w": [r[2] for r in rows],
                "h": [r[3] for r in rows],
                "fmt": ["png"] * len(rows),
                "caption": [r[4] for r in rows],
                "phash": [r[5] for r in rows],
            }
        )
    )
    return write_images(
        tbl, str(tmp_path_factory.mktemp("corpus") / "images")
    )


def test_curate_and_shard_end_to_end(store, tmp_path):
    out = str(tmp_path / "run")
    res = curate_and_shard(store, out)

    want_ids = set(q_image_curate(store)["image_id"].to_pylist())
    assert res["total"] == 40
    assert res["kept"] == len(want_ids)
    assert res["audit"]["mismatches"] == []

    # the union of shard members is exactly the curated set, full rows
    shard_dir = os.path.join(out, "shards")
    got = {}
    for d in sorted(os.listdir(shard_dir)):
        p = os.path.join(shard_dir, d)
        if d.startswith("range=") and os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                if f.startswith("shard-"):
                    for r in pq.read_table(os.path.join(p, f)).to_pylist():
                        got[r["image_id"]] = r
    assert set(got) == want_ids
    src = {
        r["image_id"]: r
        for r in pq.read_table(store).to_pylist()
    }
    for iid, row in got.items():
        assert row == src[iid]
    # gate/cluster expectations from the controlled corpus
    assert "img00015" in got  # cluster A's best-resolution rep
    assert {"img00003", "img00009"}.isdisjoint(got)  # its dropped dups
    assert {"img00020", "img00021"}.isdisjoint(got)  # all-fail cluster
    assert {"img00005", "img00006", "img00007"}.isdisjoint(got)  # gates

    # idempotent re-run: identical derived plan -> pure resume
    res2 = curate_and_shard(store, out)
    assert all(res2["summary"]["skipped"].to_pylist())
    assert res2["kept"] == res["kept"]
    assert res2["shards"] == res["shards"]
