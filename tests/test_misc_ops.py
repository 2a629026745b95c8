"""Host splitting, bin-packing, multimodal stages, seeded shuffle."""

import numpy as np
import polars as pl
import pyarrow as pa
import pytest

from spider_ray.functions.binpack import greedy_binpack
from spider_ray.kernels.hosts import registered_domain, split_host


def test_split_host():
    assert split_host("a.b.example.co.uk") == ("co.uk", "example.co.uk", "a.b")
    assert split_host("example.com") == ("com", "example.com", "")
    assert split_host("www.example.com") == ("com", "example.com", "www")
    assert split_host("EXAMPLE.ORG.") == ("org", "example.org", "")
    assert split_host("weird.unknowntld") == ("unknowntld", "weird.unknowntld", "")
    assert split_host("") == ("", "", "")
    assert registered_domain("x.y.site.com.cn") == "site.com.cn"
    # a host that IS a public suffix has no registered domain (PSL rule)
    assert split_host("co.uk") == ("co.uk", "", "")
    assert split_host("com") == ("com", "", "")
    assert registered_domain("co.uk") == ""


def test_greedy_binpack_balance():
    weights = [(f"k{i}", float(100 - i)) for i in range(100)]
    bins = greedy_binpack(weights, 8)
    assert len(bins) == 100
    assert max(bins) == 7 and min(bins) == 0
    per_bin = [0.0] * 8
    for (k, w), b in zip(weights, bins):
        per_bin[b] += w
    avg = sum(w for _, w in weights) / 8
    # greedy prefix-sum keeps every bin within one max-item of the average
    assert max(per_bin) <= avg + 100


def test_binpack_query(ray_session, sf_small):
    from spider_ray.functions.binpack import q_binpack_customers

    t = q_binpack_customers(sf_small, n_bins=4)
    assert set(t.column_names) == {"o_custkey", "weight", "bin"}
    import polars as pl

    per = pl.from_arrow(t).group_by("bin").agg(pl.col("weight").sum())
    assert per.height == 4
    w = per["weight"].to_list()
    assert max(w) / max(min(w), 1) < 1.5  # roughly balanced


def test_image_feature_stage(ray_session):
    import ray

    from spider_ray.functions.multimodal import extract_image_features
    from spider_ray.kernels.imaging import encode_image

    rng = np.random.RandomState(0)
    rows = []
    for i in range(12):
        img = rng.randint(0, 256, (16 + i, 20, 3)).astype(np.uint8)
        fmt = "png" if i % 2 == 0 else "jpeg"
        rows.append(
            {"image_id": f"img{i}", "bytes": encode_image(img, fmt), "fmt": fmt}
        )
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = pa.concat_tables(
        ray.get(extract_image_features(ds, concurrency=2, batch_size=4).to_arrow_refs())
    )
    assert out.num_rows == 12
    assert set(out.column_names) == {
        "image_id", "w", "h", "mean_luma", "phash", "thumb"
    }
    # thumbnails decode back to 8x8
    from spider_ray.kernels.imaging import png_decode

    th = png_decode(out["thumb"][0].as_py())
    assert th.shape[:2] == (8, 8)


def test_resize_area_preserves_values_multichannel():
    """Regression: the per-channel scatter-add used to write into a ravel()
    COPY of the non-contiguous channel slice, silently producing all-black
    thumbnails for every RGB image (grayscale was unaffected)."""
    from spider_ray.functions.multimodal import resize_area

    rgb = np.full((16, 20, 3), (10, 128, 250), np.uint8)
    out = resize_area(rgb, 8, 8)
    assert out.shape == (8, 8, 3)
    assert (out == np.array((10, 128, 250), np.uint8)).all()
    gray = np.full((16, 20), 77, np.uint8)
    og = resize_area(gray, 8, 8)
    assert og.shape == (8, 8) and (og == 77).all()
    # mean is preserved for a non-constant image (area-mean semantics)
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    o = resize_area(img, 8, 8)
    assert abs(float(o.mean()) - float(img.mean())) < 4.0


def test_audio_stage_fake_and_stub(ray_session):
    import ray

    from spider_ray.functions.multimodal import (
        AudioFeatureExtractor,
        extract_audio_features,
    )

    rows = [
        {"clip_id": f"c{i}", "bytes": bytes([i] * (1000 + i))} for i in range(6)
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = pa.concat_tables(
        ray.get(extract_audio_features(ds, concurrency=2, batch_size=3).to_arrow_refs())
    )
    assert out.num_rows == 6
    # determinism
    out2 = pa.concat_tables(
        ray.get(extract_audio_features(ds, concurrency=2, batch_size=3).to_arrow_refs())
    )
    assert out.sort_by("clip_id").equals(out2.sort_by("clip_id"))
    # real decode is stubbed
    with pytest.raises(NotImplementedError):
        AudioFeatureExtractor(fake=False)(pa.Table.from_pylist(rows[:1]))


def test_seeded_shuffle_deterministic(ray_session, sf_small):
    from spider_ray.functions.urls import q_seeded_shuffle

    a = q_seeded_shuffle(sf_small)
    b = q_seeded_shuffle(sf_small)
    assert a.equals(b)
    ids = a["doc_id"].to_pylist()
    assert ids != sorted(ids)  # actually shuffled


def test_video_frame_sampler(ray_session):
    import ray

    from spider_ray.functions.multimodal import (
        VideoFrameSampler,
        sample_video_frames,
    )

    rows = [
        {
            "video_id": f"v{i}",
            "bytes": bytes([i] * (2000 + i)),
            "fps": 25.0,
            "n_frames": 95 + i,
        }
        for i in range(4)
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = pa.concat_tables(
        ray.get(
            sample_video_frames(ds, every_n=10, concurrency=2, batch_size=2)
            .to_arrow_refs()
        )
    )
    # v0: frames 0,10,...,90 -> 10 rows; v3: 98 frames -> still 10 rows
    assert out.num_rows == 4 * 10
    per = pl.from_arrow(out).group_by("video_id").agg(pl.len())
    assert set(per["len"].to_list()) == {10}
    # frame_ts follows fps; features deterministic across runs
    out2 = pa.concat_tables(
        ray.get(
            sample_video_frames(ds, every_n=10, concurrency=2, batch_size=2)
            .to_arrow_refs()
        )
    )
    key = [("video_id", "ascending"), ("frame_idx", "ascending")]
    assert out.sort_by(key).equals(out2.sort_by(key))
    first = out.sort_by(key).slice(0, 2).to_pylist()
    assert first[0]["frame_idx"] == 0 and first[1]["frame_idx"] == 10
    assert abs(first[1]["frame_ts_s"] - 0.4) < 1e-6
    with pytest.raises(NotImplementedError):
        VideoFrameSampler(fake=False)(pa.Table.from_pylist(rows[:1]))


def test_hll_accuracy_and_merge(ray_session, sf_small):
    import duckdb

    from spider_ray.functions.sketch import (
        hll_estimate,
        hll_from_column,
        hll_merge,
        q_approx_distinct,
    )

    # mergeability: sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly
    a = np.arange(0, 5000, dtype=np.int64)
    b = np.arange(2500, 9000, dtype=np.int64)
    ra, rb = hll_from_column(a, True), hll_from_column(b, True)
    rull = hll_from_column(np.concatenate([a, b]), True)
    assert np.array_equal(hll_merge(ra, rb), rull)
    # accuracy on a known cardinality (9000 distinct), p=12 -> ~1.6% typical
    est = hll_estimate(rull)
    assert abs(est - 9000) / 9000 < 0.05
    # end-to-end over the sf table vs exact
    approx = q_approx_distinct(sf_small)["n_users_approx"][0].as_py()
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{sf_small}/events.parquet'"
    ).fetchone()[0]
    assert abs(approx - exact) / max(exact, 1) < 0.05


def test_sequence_pack_invariants(ray_session, sf_small):
    from spider_ray.functions.text import PACK_BUDGET, q_sequence_pack

    a = q_sequence_pack(sf_small)
    b = q_sequence_pack(sf_small)
    assert a.equals(b)  # deterministic
    df = pl.from_arrow(a)
    per_bin = df.group_by("bin").agg(
        total=pl.col("n_tokens").sum(), n_docs=pl.len()
    )
    # budget respected unless a single doc alone exceeds it
    over = per_bin.filter(pl.col("total") > PACK_BUDGET)
    assert over.filter(pl.col("n_docs") > 1).height == 0
    # bins are contiguous in doc_id order and start at 0
    bins = df.sort("doc_id")["bin"].to_list()
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    # packing is reasonably tight: average fill > 50% of budget
    filled = per_bin.filter(pl.col("total") <= PACK_BUDGET)["total"]
    if len(filled) > 2:
        assert filled.mean() > PACK_BUDGET * 0.5


def test_phash_neardup_matches_bruteforce(ray_session):
    """Banded phash near-dup must find EXACTLY the pairs a brute-force
    Hamming scan finds (8 bands guarantee zero misses at tau=6)."""
    import pyarrow.parquet as pq

    import os

    from spider_ray.functions.multimodal import phash_neardup
    from spider_ray.sources.webgen import generate

    path = "/tmp/spider_ray_test_corpus/images.parquet"
    if not os.path.exists(path):
        generate("/tmp/spider_ray_test_corpus", n_pages=200, n_hosts=8,
                 seed=42)
    got = phash_neardup(path, tau=6)
    t = pq.read_table(path, columns=["image_id", "phash"])
    ids = t["image_id"].to_pylist()
    ph = t["phash"].to_numpy().astype(np.uint64)
    x = ph[:, None] ^ ph[None, :]
    ham = np.unpackbits(x.view(np.uint8).reshape(len(ph), len(ph), 8),
                        axis=2).sum(2)
    expect = sorted(
        (min(ids[i], ids[j]), max(ids[i], ids[j]), int(ham[i, j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if ham[i, j] <= 6
    )
    rows = sorted(zip(got["a_id"].to_pylist(), got["b_id"].to_pylist(),
                      got["hamming"].to_pylist()))
    assert rows == expect


def test_audio_wav_real_decode(ray_session):
    """PCM WAV clips decode for REAL (stdlib wave): duration and RMS energy
    must match the generated waveform, and fake=False must ACCEPT wav while
    still stubbing compressed formats."""
    import io
    import wave

    import numpy as np

    from spider_ray.functions.multimodal import AudioFeatureExtractor

    def make_wav(freq, seconds=0.5, rate=8000, amp=0.5):
        t = np.arange(int(rate * seconds)) / rate
        x = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(x.tobytes())
        return buf.getvalue()

    rows = [
        {"clip_id": "a", "bytes": make_wav(440)},
        {"clip_id": "b", "bytes": make_wav(880, amp=0.25)},
    ]
    out = AudioFeatureExtractor(fake=False)(pa.Table.from_pylist(rows))
    d = dict(zip(out["clip_id"].to_pylist(), out["duration_s"].to_pylist()))
    e = dict(zip(out["clip_id"].to_pylist(), out["energy"].to_pylist()))
    assert abs(d["a"] - 0.5) < 1e-3 and abs(d["b"] - 0.5) < 1e-3
    # RMS of a sine = amp/sqrt(2)
    assert abs(e["a"] - 0.5 / 2**0.5) < 0.01
    assert abs(e["b"] - 0.25 / 2**0.5) < 0.01
    # compressed formats still stub under fake=False
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        AudioFeatureExtractor(fake=False)(
            pa.Table.from_pylist([{"clip_id": "x", "bytes": b"\xffmp3junk"}])
        )


def test_partial_final_agg_empty_input(ray_session):
    """An empty input dataset yields an empty table with the aggregate
    schema — not an IndexError / ColumnNotFound from a schemaless block."""
    import polars as pl
    import pyarrow as pa
    import ray

    from spider_ray.stages.agg import partial_final_agg

    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()),
                  "v": pa.array([], pa.float64())})
    )
    out = partial_final_agg(
        ds,
        lambda lf: lf.group_by("k").agg(s=pl.col("v").sum()),
        lambda lf: lf.group_by("k").agg(s=pl.col("s").sum()),
    )
    assert out.num_rows == 0
    assert out.schema.names == ["k", "s"]


def test_approx_quantiles_error_bound(ray_session, sf_mid, monkeypatch):
    """Force a real subsample (AQ_TARGET=500 at 5000 events → stride 10)
    and bound the estimate's RANK displacement vs the exact quantile:
    the estimated median/p95 must sit within ±15 percentage points of
    its target rank in the full per-group distribution. Also pins
    determinism and the n_sample ≈ n/stride shape."""
    import numpy as np
    import polars as pl
    import pyarrow.parquet as pq

    from spider_ray.functions import sketch as K

    monkeypatch.setattr(K, "AQ_TARGET", 500)
    out = pl.from_arrow(K.q_approx_quantiles(sf_mid))
    assert out.height > 0
    full = pl.from_arrow(
        pq.read_table(
            sf_mid + "/events.parquet", columns=["event_type", "value"]
        )
    )
    for row in out.iter_rows(named=True):
        vals = np.sort(
            full.filter(pl.col("event_type") == row["event_type"])[
                "value"
            ].to_numpy()
        )
        n = len(vals)
        for est, q in ((row["median_est"], 0.5), (row["p95_est"], 0.95)):
            rank = np.searchsorted(vals, est) / n
            assert abs(rank - q) < 0.15, (row["event_type"], q, rank)
        # sample is a real subsample, not the full group
        assert 0 < row["n_sample"] < n
    again = pl.from_arrow(K.q_approx_quantiles(sf_mid))
    assert again.equals(out)
