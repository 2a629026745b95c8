"""Regression tests for the round-3 functions/ review findings: crash on
no-heavy-hitters input, stereo WAV duration, linkbase hash-collision
contamination, upscale checkerboard thumbs, null-phash pseudo-dups,
zero-pair attach shortcut, and empty-doc minhash bucket pileup."""

import os

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_heavy_hitters_empty_result(ray_session, tmp_path):
    """Uniform user_ids (no key ≥ 1/200 of events) must yield an EMPTY
    table with the result schema — previously pa.concat_tables([]) raised
    ArrowInvalid when every block's Misra-Gries summary kept no keys."""
    from spider_ray.functions.sketch import q_heavy_hitters

    pq.write_table(
        pa.table({"user_id": pa.array(list(range(3000)), pa.int64())}),
        os.path.join(tmp_path, "events.parquet"),
    )
    out = q_heavy_hitters(str(tmp_path))
    assert out.num_rows == 0
    assert out.schema.names == ["user_id", "n_events"]
    assert out.schema.types == [pa.int64(), pa.int64()]


def test_decode_wav_stereo_duration():
    """Stereo WAVs must report the true clip duration (frames/rate), not
    duration × nchannels — decode_wav now averages channels to mono."""
    import io
    import wave as _wave

    from spider_ray.functions.multimodal import decode_wav

    x = (0.25 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000.0) * 32767)
    stereo = np.empty(16000, dtype="<i2")
    stereo[0::2] = x.astype("<i2")
    stereo[1::2] = x.astype("<i2")
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(stereo.tobytes())
    mono, rate = decode_wav(buf.getvalue())
    assert rate == 8000
    assert len(mono) == 8000  # frames, not interleaved samples
    assert abs(len(mono) / rate - 1.0) < 1e-9
    # equal channels -> mono average equals either channel
    np.testing.assert_allclose(mono, x.astype("<i2") / 32768.0)


def test_linkbase_collision_group_isolates_urls():
    """One url_hash group holding TWO urls (64-bit collision) must merge
    each url independently: a D command for url b must not delete url a,
    and a's record must not be dropped by the keep-latest head(1)."""
    from spider_ray.functions.linkbase import _merge_hash_group

    df = pl.DataFrame(
        {
            "url": ["a", "b", "b"],
            "timestamp": [1, 2, 3],
            "score": [0.5, 0.9, 0.0],
            "cmd": ["", "", "D"],
            "update_fail_cnt": [0, 0, 0],
            "url_hash": [42, 42, 42],
        }
    ).with_columns(pl.col("update_fail_cnt").cast(pl.Int32))
    out = _merge_hash_group(df).sort("url")
    assert out["url"].to_list() == ["a"]  # b deleted, a SURVIVES
    # R commands increment only their own url's fail count
    df2 = df.with_columns(
        cmd=pl.Series(["", "", "R"]),
    )
    out2 = _merge_hash_group(df2).sort("url")
    assert out2["url"].to_list() == ["a", "b"]
    got = dict(zip(out2["url"].to_list(), out2["update_fail_cnt"].to_list()))
    assert got == {"a": 0, "b": 1}


def test_resize_area_upscale_no_black_holes():
    """Upscaling (image smaller than the thumb) must replicate source
    pixels into unmapped cells, not leave them black (previously 75% of an
    8x8 thumb of a 4x4 image was zeros)."""
    from spider_ray.functions.multimodal import resize_area

    gray = np.full((4, 4), 128, dtype=np.uint8)
    up = resize_area(gray, 8, 8)
    assert up.shape == (8, 8)
    assert (up == 128).all()
    # RGB, non-uniform: every output pixel must equal SOME source pixel
    rgb = (np.arange(4 * 4 * 3).reshape(4, 4, 3) * 5 % 256).astype(np.uint8)
    up3 = resize_area(rgb, 8, 8)
    src_px = {tuple(p) for p in rgb.reshape(-1, 3)}
    assert all(tuple(p) in src_px for p in up3.reshape(-1, 3))
    # downscale path unchanged: area mean of a 2x2-blocked image
    big = np.zeros((8, 8), dtype=np.uint8)
    big[:4] = 100
    down = resize_area(big, 4, 4)
    assert (down[:2] == 100).all() and (down[2:] == 0).all()


def test_phash_neardup_drops_null_phash(ray_session, tmp_path):
    """Null-phash images must be EXCLUDED, not aliased to signature 0 —
    previously m null rows produced all m(m-1)/2 spurious hamming-0
    pairs."""
    from spider_ray.functions.multimodal import phash_neardup
    from spider_ray.sources.lance_io import resolve_images, write_images

    n = 6
    tbl = pa.table(
        {
            "image_id": pa.array([f"i{k}" for k in range(n)], pa.string()),
            "bytes": pa.array([b"x"] * n, pa.binary()),
            "w": pa.array([1] * n, pa.int32()),
            "h": pa.array([1] * n, pa.int32()),
            "fmt": pa.array(["png"] * n, pa.string()),
            "caption": pa.array(["c"] * n, pa.string()),
            # i0/i1 are true near-dups (hamming 1); i2..i5 have NULL phash
            "phash": pa.array([7, 6, None, None, None, None], pa.int64()),
        }
    )
    base = os.path.join(tmp_path, "imgs")
    write_images(tbl, base)
    out = phash_neardup(resolve_images(base), tau=6).to_pylist()
    assert out == [{"a_id": "i0", "b_id": "i1", "hamming": 1}]


def test_attach_pair_values_zero_pairs_short_circuits(ray_session):
    """An empty candidate list must return an empty correctly-schemaed
    dataset WITHOUT prepping/joining the corpus-sized side."""
    import ray

    from spider_ray.functions.dedup import _attach_pair_values

    cand_schema = pa.schema(
        [("a_id", pa.int64()), ("b_id", pa.int64()), ("n_shared", pa.int64())]
    )
    cand = ray.data.from_arrow(cand_schema.empty_table())
    calls = {"n": 0}

    def prep(batch: pa.Table) -> pa.Table:
        calls["n"] += 1  # must never run
        return batch

    side = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "size": pa.array([3, 4], pa.int64())})
    )
    out = _attach_pair_values(
        cand, side, "doc_id", "size", pa.int64(), cand_schema, prep=prep
    )
    t = pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))
    assert t.num_rows == 0
    assert t.schema.names == ["a_id", "b_id", "n_shared", "size_a", "size_b"]
    assert calls["n"] == 0


def test_minhash_skips_empty_docs(ray_session, tmp_path):
    """Zero-shingle (empty/whitespace) docs share the all-max signature;
    they must be dropped before banding — no candidate pairs among them
    and no crash — while real dups still pair."""
    from spider_ray.functions.dedup import q_minhash_lsh_pairs

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "text": pa.array([text, text, "", "  ", "", "one"], pa.string()),
        }
    )
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))
    out = q_minhash_lsh_pairs(str(tmp_path)).to_pylist()
    assert [(r["a_id"], r["b_id"]) for r in out] == [(1, 2)]
    assert out[0]["jaccard"] == pytest.approx(1.0)
