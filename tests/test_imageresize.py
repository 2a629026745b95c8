"""Resize-to-bucket preprocessing (functions/imageresize.py): the
integer cover-scale + center-crop geometry against a Fraction-arithmetic
reference, and the actor-pool pixel stage against a single-process
decode→sample→encode reference (lossless path exact; lossy path within
the codec's quantization). SQL-oracle bit-exactness of q_resize_plan is
separately enforced by tools/oracle_strict.py / the driver."""

import os
import random
from fractions import Fraction

import numpy as np
import pyarrow as pa
import pytest

from spider_ray.functions.imageresize import (
    BUCKET_DIMS,
    ResizeToBucket,
    q_resize_plan,
    resize_corpus,
    resize_geometry,
    resize_pixels,
)
from spider_ray.functions.imageshard import ASPECT_BUCKETS
from spider_ray.kernels.imaging import (
    decode_image,
    encode_image,
    phash64,
    psnr,
)
from spider_ray.sources.lance_io import conform_images, write_images

N = 120


@pytest.fixture(scope="module")
def store(tmp_path_factory, ray_session):
    rng = random.Random(20260819)
    ids, blobs, ws, hs, fmts = [], [], [], [], []
    for i in range(N):
        w, h = rng.randrange(16, 49), rng.randrange(16, 49)
        arr = np.frombuffer(
            bytes(rng.getrandbits(8) for _ in range(w * h * 3)), np.uint8
        ).reshape(h, w, 3)
        fmt = "png" if i % 2 == 0 else "qimg"
        ids.append(f"img{i:05d}")
        blobs.append(encode_image(arr, fmt))
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
    tbl = conform_images(
        pa.table(
            {
                "image_id": ids,
                "bytes": blobs,
                "w": ws,
                "h": hs,
                "fmt": fmts,
                "caption": ["a plain five word caption"] * N,
                "phash": [0] * N,
            }
        )
    )
    return write_images(tbl, str(tmp_path_factory.mktemp("rsz") / "images"))


def test_resize_plan_matches_fraction_reference(store):
    t = q_resize_plan(store)
    assert t.column_names == [
        "image_id", "w", "h", "bucket_id", "target_w", "target_h",
        "scaled_w", "scaled_h", "crop_x", "crop_y",
    ]
    rows = t.to_pylist()
    assert len(rows) == N
    for r in rows:
        ratio = Fraction(r["w"], r["h"])
        dists = [abs(ratio - Fraction(bw, bh)) for bw, bh in ASPECT_BUCKETS]
        k = dists.index(min(dists))
        tw, th = BUCKET_DIMS[k]
        assert (r["bucket_id"], r["target_w"], r["target_h"]) == (k, tw, th)
        # cover: both scaled axes reach the target box; the pinned axis
        # is exact and the free axis is the floor of the true scale
        assert r["scaled_w"] >= tw and r["scaled_h"] >= th
        if r["w"] * th >= r["h"] * tw:
            assert r["scaled_h"] == th
            assert r["scaled_w"] == (r["w"] * th) // r["h"]
        else:
            assert r["scaled_w"] == tw
            assert r["scaled_h"] == (r["h"] * tw) // r["w"]
        assert r["crop_x"] == (r["scaled_w"] - tw) // 2
        assert r["crop_y"] == (r["scaled_h"] - th) // 2


def _reference_resize(img, tw, th, sw, sh, cx, cy):
    h, w = img.shape[:2]
    out = np.empty((th, tw, img.shape[2]), dtype=np.uint8)
    for y in range(th):
        for x in range(tw):
            out[y, x] = img[((cy + y) * h) // sh, ((cx + x) * w) // sw]
    return out


def test_resize_stage_matches_pixel_reference(store):
    from spider_ray.sources.lance_io import read_images_table

    raw = {r["image_id"]: r for r in read_images_table(store).to_pylist()}
    plan = {r["image_id"]: r for r in q_resize_plan(store).to_pylist()}

    out = resize_corpus(store, concurrency=2).take_all()
    assert len(out) == N
    for r in out:
        p = plan[r["image_id"]]
        src = raw[r["image_id"]]
        assert (r["w"], r["h"]) == (p["target_w"], p["target_h"])
        assert r["fmt"] == src["fmt"]
        assert r["caption"] == src["caption"]
        img = decode_image(src["bytes"], src["fmt"])
        want = _reference_resize(
            img, p["target_w"], p["target_h"], p["scaled_w"],
            p["scaled_h"], p["crop_x"], p["crop_y"],
        )
        got = decode_image(r["bytes"], r["fmt"])
        if r["fmt"] == "png":  # lossless: exact pixels and exact phash
            assert np.array_equal(got, want)
            assert r["phash"] == phash64(want)
        else:  # deterministic lossy codec: quantization-bounded
            assert got.shape == want.shape
            assert psnr(got, want) >= 40.0
            assert r["phash"] == phash64(
                resize_pixels(
                    img, p["target_w"], p["target_h"], p["scaled_w"],
                    p["scaled_h"], p["crop_x"], p["crop_y"],
                )
            )


def test_resized_corpus_feeds_bucketed_shard_writer(store, tmp_path):
    """The resize output is a valid input_hint store: write it, bucket-
    shard it, and every image lands in the bucket its plan assigned —
    at that bucket's exact dims."""
    from spider_ray.functions.imageshard import q_bucket_shard_pack
    from spider_ray.sources.lance_io import conform_images as conform
    from spider_ray.stages.shardsink import verify_shards, write_shards

    out_tbl = pa.Table.from_pylist(
        resize_corpus(store, concurrency=2).take_all()
    )
    resized_store = write_images(
        conform(out_tbl), str(tmp_path / "resized")
    )
    plan = {
        r["image_id"]: r["bucket_id"]
        for r in q_resize_plan(store).to_pylist()
    }
    packed = q_bucket_shard_pack(resized_store).to_pylist()
    assert len(packed) == N
    # every resized image is EXACTLY on its bucket prototype's ratio,
    # so the pack's argmin must reproduce the plan's bucket
    for r in packed:
        assert r["bucket_id"] == plan[r["image_id"]]
    out_dir = str(tmp_path / "shards")
    write_shards(resized_store, out_dir, layout="bucket")
    assert verify_shards(out_dir)["mismatches"] == []


def test_curate_resize_shard_composition(store, tmp_path):
    """curate_and_shard(resize=True, layout='bucket'): the full SDXL
    preprocessing chain — every image in the written layout sits at its
    bucket's exact dims, shards never mix buckets, the kept set equals
    q_image_curate, and the audit is clean."""
    from spider_ray.functions.imagecurate import q_image_curate
    from spider_ray.pipelines.imagecorpus import curate_and_shard
    from spider_ray.stages.shardsink import read_shards

    out = str(tmp_path / "pipe")
    res = curate_and_shard(store, out, resize=True, layout="bucket")
    kept_want = set(q_image_curate(store)["image_id"].to_pylist())
    assert res["total"] == N and res["kept"] == len(kept_want)
    assert res["audit"]["mismatches"] == []

    plan = {r["image_id"]: r for r in q_resize_plan(store).to_pylist()}
    rows = read_shards(
        os.path.join(out, "shards"), columns=["image_id", "w", "h"]
    ).take_all()
    assert {r["image_id"] for r in rows} == kept_want
    for r in rows:
        p = plan[r["image_id"]]
        assert (r["w"], r["h"]) == (p["target_w"], p["target_h"])


def test_resize_geometry_properties():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(min_value=1, max_value=10_000),
        st.integers(min_value=1, max_value=10_000),
    )
    def check(w, h):
        wa = np.array([w], dtype=np.int64)
        ha = np.array([h], dtype=np.int64)
        k, tw, th, sw, sh, cx, cy = (x[0] for x in resize_geometry(wa, ha))
        assert (tw, th) == BUCKET_DIMS[k]
        # cover: the scaled image reaches the target box on both axes
        assert sw >= tw and sh >= th
        # exactly one axis pins to the target (both iff ratios match)
        assert sw == tw or sh == th
        # the free axis is the floor of the true cover scale -> the
        # scaled box never exceeds the true-aspect cover by a pixel
        assert sw * h <= w * sh or sh * w <= h * sw
        # crop stays inside the scaled image and is centered
        assert 0 <= cx <= sw - tw and 0 <= cy <= sh - th
        assert cx == (sw - tw) // 2 and cy == (sh - th) // 2
        # sampling indices stay in range for the crop extremes
        assert ((cy + th - 1) * h) // sh <= h - 1
        assert ((cx + tw - 1) * w) // sw <= w - 1

    check()


def test_aug_crop_plan_in_slack_and_deterministic(store):
    """Every augmentation crop origin sits inside the cover-resize
    slack, epochs differ (the jitter is real), and the plan is
    deterministic."""
    import numpy as np
    import polars as pl

    from spider_ray.functions.imageresize import (
        AUG_EPOCHS,
        q_aug_crop_plan,
        q_resize_plan,
    )

    plan = pl.from_arrow(q_aug_crop_plan(store))
    geom = pl.from_arrow(q_resize_plan(store))
    j = plan.join(geom, on="image_id", suffix="_g")
    assert (j["bucket_id"] == j["bucket_id_g"]).all()
    assert (j["crop_x"] >= 0).all() and (j["crop_y"] >= 0).all()
    assert (j["crop_x"] <= j["scaled_w"] - j["target_w"]).all()
    assert (j["crop_y"] <= j["scaled_h"] - j["target_h"]).all()
    per = plan.group_by("image_id").agg(n=pl.len())
    assert (per["n"] == AUG_EPOCHS).all()
    # jitter across epochs is real for images with nonzero slack
    slackful = j.filter(pl.col("scaled_w") > pl.col("target_w"))
    if slackful.height:
        var = slackful.group_by("image_id").agg(
            nx=pl.col("crop_x").n_unique()
        )
        assert (var["nx"] > 1).any()
    assert q_aug_crop_plan(store).equals(q_aug_crop_plan(store))
