"""Multimodal column stages: opaque ``binary`` payloads + typed metadata,
processed by actor-pool ``map_batches`` stages (SURVEY M7/M15 analogs; the
training-data-pipeline requirement from the build brief).

* images — REAL: decode (our PNG / qimg codecs), verify dims, resize
  (area-mean), phash, re-encode;
* audio — PCM WAV decodes for REAL (stdlib ``wave``: duration / RMS /
  fingerprint from the actual waveform, driver-oracle-checked); compressed
  formats are STUBBED at the ffmpeg seam exactly as prescribed;
* video — no codec exists in this container, so frame decode is STUBBED
  (deterministic fake per-frame signature) behind the real actor
  signature; the fan-out layout is driver-oracle-checked. The Ray-side
  plumbing (schema, batch size, actor pool, output layout) is real and
  tested throughout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from spider_ray.kernels.hashing import derive, hash64
from spider_ray.kernels.imaging import decode_image, encode_image, phash64

IMAGE_FEATURE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("mean_luma", pa.float32()),
        ("phash", pa.int64()),
        ("thumb", pa.binary()),  # 8x8 png thumbnail
    ]
)


def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area-mean resize (no external imaging libs)."""
    h, w = img.shape[:2]
    yi = (np.arange(h) * out_h // max(h, 1)).clip(0, out_h - 1)
    xi = (np.arange(w) * out_w // max(w, 1)).clip(0, out_w - 1)
    ch = 1 if img.ndim == 2 else img.shape[2]
    src = img.reshape(h, w, ch).astype(np.float64)
    sums = np.zeros((out_h, out_w, ch))
    cnts = np.zeros((out_h, out_w, 1))
    idx = (yi[:, None] * out_w + xi[None, :]).ravel()
    # scatter-add into a reshape VIEW of the contiguous buffer — a
    # per-channel `sums[:, :, c].ravel()` makes a copy for ch>1 and the
    # adds are lost (all-black thumbnails for RGB input)
    np.add.at(sums.reshape(out_h * out_w, ch), idx, src.reshape(h * w, ch))
    np.add.at(cnts.reshape(out_h * out_w, 1), idx, 1.0)
    out_f = sums / np.maximum(cnts, 1.0)
    # upscaling (out > in on an axis) leaves cells no source pixel mapped
    # into — fill them by nearest-source gather instead of emitting black;
    # downscale cells always have ≥1 contributor, so this never fires there
    zero = cnts[:, :, 0] == 0
    if zero.any():
        ys = (np.arange(out_h) * h // max(out_h, 1)).clip(0, max(h - 1, 0))
        xs = (np.arange(out_w) * w // max(out_w, 1)).clip(0, max(w - 1, 0))
        out_f[zero] = src[ys][:, xs][zero]
    out = out_f.round().clip(0, 255).astype(np.uint8)
    return out[:, :, 0] if img.ndim == 2 else out


class ImageFeatureExtractor:
    """Actor-pool stage: ``map_batches(ImageFeatureExtractor, concurrency=N,
    batch_size=B)`` over (image_id, bytes, fmt) batches. Codec state warm in
    __init__ (trivial here; a real model would load weights once)."""

    def __init__(self, thumb_size: int = 8):
        self.thumb = thumb_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("image_id", "w", "h", "mean_luma", "phash", "thumb")}
        for r in batch.to_pylist():
            arr = decode_image(r["bytes"], r["fmt"])
            h, w = arr.shape[:2]
            rows["image_id"].append(r["image_id"])
            rows["w"].append(w)
            rows["h"].append(h)
            rows["mean_luma"].append(float(arr.mean()))
            rows["phash"].append(int(np.uint64(phash64(arr)).astype(np.int64)))
            rows["thumb"].append(
                encode_image(resize_area(arr, self.thumb, self.thumb), "png")
            )
        return pa.Table.from_pydict(rows, schema=IMAGE_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("n_bytes", pa.int64()),
        ("duration_s", pa.float32()),  # fake-decoded
        ("energy", pa.float32()),
        ("fingerprint", pa.int64()),
    ]
)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """REAL PCM WAV decode on the stdlib ``wave`` module (no external
    codec needed) → (float64 MONO samples in [-1, 1], sample_rate).
    Multi-channel input is averaged to mono so ``len(x)/rate`` is the
    clip duration (interleaved samples would report duration × nchannels).
    Raises ``wave.Error`` on non-WAV bytes."""
    import io
    import wave as _wave

    with _wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        width = w.getsampwidth()
        nch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {width} unsupported")
    if nch > 1:
        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return x, rate


class AudioFeatureExtractor:
    """Actor-pool audio feature stage. PCM WAV decodes for REAL (stdlib
    ``wave`` — duration / RMS energy / sample fingerprint computed from the
    actual waveform). Compressed formats (mp3/ogg/aac) need ffmpeg, which
    this container lacks: ``fake=True`` (default) falls back to
    deterministic pseudo-features for non-WAV bytes so the pipeline
    plumbing is exercised end-to-end; ``fake=False`` raises
    NotImplementedError at that seam, marking exactly what a production
    build must replace."""

    def __init__(self, fake: bool = True):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        import wave as _wave

        rows = {k: [] for k in ("clip_id", "n_bytes", "duration_s", "energy",
                                "fingerprint")}
        for r in batch.to_pylist():
            data = r["bytes"] or b""
            try:
                x, rate = decode_wav(data)
                duration = len(x) / rate if rate else 0.0
                energy = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
                fp = int(hash64([x.tobytes().hex() or "0"])[0])
            except (_wave.Error, EOFError):
                if not self.fake:
                    raise NotImplementedError(
                        "non-WAV audio needs ffmpeg/soundfile — not in "
                        "this container; run with fake=True for plumbing "
                        "tests"
                    )
                # deterministic pseudo-features from the raw bytes (fixed
                # 4 KiB prefix: two clips with equal prefixes get equal
                # pseudo-energy regardless of total length)
                h = int(hash64([data.hex() or "0"])[0])
                arr = np.frombuffer(data[:4096], dtype=np.uint8)
                duration = len(data) / 32000.0
                energy = (
                    float(arr.astype(np.float64).std()) if arr.size else 0.0
                )
                fp = h
            rows["clip_id"].append(r["clip_id"])
            rows["n_bytes"].append(len(data))
            rows["duration_s"].append(duration)
            rows["energy"].append(energy)
            rows["fingerprint"].append(int(np.uint64(fp).astype(np.int64)))
        return pa.Table.from_pydict(rows, schema=AUDIO_FEATURE_SCHEMA)


VIDEO_FRAME_SCHEMA = pa.schema(
    [
        ("video_id", pa.string()),
        ("frame_idx", pa.int32()),
        ("frame_ts_s", pa.float32()),
        ("frame_feature", pa.int64()),  # fake-decoded per-frame signature
    ]
)


class VideoFrameSampler:
    """Frame-sampling actor stage: one INPUT row (video_id, bytes, fps,
    n_frames) fans out to one OUTPUT row per sampled frame (every
    ``every_n``-th frame) — the output layout a downstream per-frame model
    stage consumes. Video decode is NOT available in this container (no
    ffmpeg/pyav), so the decode is STUBBED per the build brief:
    ``fake=True`` derives a deterministic per-frame signature from
    (bytes-hash, frame_idx); ``fake=False`` raises NotImplementedError at
    the decode seam. Batches stay small because rows carry large binary
    payloads (SURVEY §4 memory-pressure rule: bytes-heavy stages get small
    ``batch_size``)."""

    def __init__(self, every_n: int = 10, fake: bool = True):
        self.every_n = max(1, int(every_n))
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in (
            "video_id", "frame_idx", "frame_ts_s", "frame_feature")}
        for r in batch.to_pylist():
            if not self.fake:
                raise NotImplementedError(
                    "real video decode requires ffmpeg/pyav — not in this "
                    "container; run with fake=True for plumbing tests"
                )
            data = r["bytes"] or b""
            fps = float(r.get("fps") or 25.0)
            n_frames = int(r.get("n_frames") or 0)
            base = int(hash64([data.hex() or "0"])[0])
            for idx in range(0, n_frames, self.every_n):
                sig = derive(base, idx + 1)
                rows["video_id"].append(r["video_id"])
                rows["frame_idx"].append(idx)
                rows["frame_ts_s"].append(idx / fps)
                rows["frame_feature"].append(int(np.uint64(sig).astype(np.int64)))
        return pa.Table.from_pydict(rows, schema=VIDEO_FRAME_SCHEMA)


def sample_video_frames(
    ds: ray.data.Dataset,
    every_n: int = 10,
    concurrency: int = 4,
    batch_size: int = 16,
) -> ray.data.Dataset:
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"every_n": every_n},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def phash_neardup(images_path: str, tau: int = 6) -> pa.Table:
    """Materialized query form of :func:`phash_neardup_ds`: the sorted
    (a_id, b_id, hamming) pair table."""
    from spider_ray.functions.dedup import hamming_pair_schema
    from spider_ray.pipelines.relational import _concat, _sorted

    return _sorted(
        _concat(
            phash_neardup_ds(images_path, tau=tau),
            schema=hamming_pair_schema(pa.string()),
        ),
        ["a_id", "b_id"],
    )


def phash_neardup_ds(images_path: str, tau: int = 6) -> ray.data.Dataset:
    """Near-duplicate images by perceptual-hash Hamming distance — D5's
    image analog (the reference's simhash near-dup, dedup/html_simhash,
    applied to the input_hint table's ``phash`` column). Reads ONLY
    (image_id, phash) from the bytes-heavy image table (column pruning at
    the read), bands each 64-bit phash into 8×8-bit keys (pigeonhole:
    hamming ≤ 7 ⇒ at least one band collides, so τ=6 has zero misses),
    cogroups candidates by band with the fully distributed pair reduce
    (spider_ray.functions.dedup._bucket_cogroup_pairs), and verifies with
    vectorized Hamming after joining the 8 B/image phash back by id —
    returned as a streaming Dataset so the cluster-labeling route above
    dedup.CC_DRIVER_PAIR_LIMIT never lands the pair list on the driver."""
    from spider_ray.functions.dedup import (
        _bucket_cogroup_pairs,
        _hamming_verify,
    )
    from spider_ray.kernels import tokens as tk

    from spider_ray.sources.lance_io import read_images

    BANDS = 8
    ds = read_images(images_path, columns=["image_id", "phash"])

    def norm(batch: pa.Table) -> pa.Table:
        # DROP null-phash rows (schema allows them): a fill_null(0) would
        # alias every null image to signature 0 and emit all m(m-1)/2 of
        # them as hamming-0 "duplicates"; the SQL oracle's NULL-xor WHERE
        # drops them too, so semantics stay aligned
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_valid(batch["phash"]))
        ph = (
            batch["phash"].combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)
            .view(np.uint64)
        )
        return pa.table(
            {
                "doc_id": batch["image_id"].cast(pa.string()),
                "sig": pa.array(ph, pa.uint64()),
            }
        )

    sigs = ds.map_batches(norm, batch_format="pyarrow").materialize()

    def explode(batch: pa.Table) -> pa.Table:
        s = batch["sig"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.uint64, copy=False)
        keys = tk.simhash_bands_batch(s, bands=BANDS)
        ids = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), keys.shape[1]
        )
        return pa.table(
            {
                "bucket": pa.array(keys.ravel(), pa.uint64()),
                "doc_id": pa.array(ids, pa.string()),
            }
        )

    exploded = sigs.map_batches(explode, batch_format="pyarrow")
    cand = _bucket_cogroup_pairs(exploded, pa.string()).select_columns(
        ["a_id", "b_id"]
    )
    return _hamming_verify(cand, sigs, "sig", tau, id_type=pa.string())


def extract_image_features(
    ds: ray.data.Dataset, concurrency: int = 4, batch_size: int = 64
) -> ray.data.Dataset:
    return ds.map_batches(
        ImageFeatureExtractor,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def extract_audio_features(
    ds: ray.data.Dataset, concurrency: int = 4, batch_size: int = 256
) -> ray.data.Dataset:
    return ds.map_batches(
        AudioFeatureExtractor,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()


def q_audio_features(sf_dir: str) -> pa.Table:
    """Audio actor-pool stage, driver-oracle-checked: one deterministic PCM
    WAV clip per document ((doc_id%5+1)×800 samples of a doc_id-seeded
    sine at 8 kHz), REAL-decoded by AudioFeatureExtractor. The DuckDB
    oracle reproduces clip_id / byte size (44-byte canonical WAV header +
    2 B/sample) / duration exactly; waveform-derived energy is pinned by
    the sine-RMS golden test instead."""
    import io
    import wave as _wave

    from spider_ray.sources.tables import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        clips, ids = [], []
        for did in batch["doc_id"].to_pylist():
            n = (did % 5 + 1) * 800
            t = np.arange(n) / 8000.0
            freq = 200.0 + (did % 20) * 40.0
            x = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
            buf = io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(x.tobytes())
            clips.append(buf.getvalue())
            ids.append(f"clip{did}")
        return pa.table(
            {
                "clip_id": pa.array(ids, pa.string()),
                "bytes": pa.array(clips, pa.binary()),
            }
        )

    # concurrency 2: an actor pool sized to the whole CPU count would
    # starve the upstream read tasks on small (4-cpu) test sessions
    out = extract_audio_features(
        ds.map_batches(synth, batch_format="pyarrow"), concurrency=2
    )

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["clip_id", "n_bytes", "duration_s"])

    from spider_ray.pipelines.relational import _concat, _sorted

    return _sorted(
        _concat(out.map_batches(project, batch_format="pyarrow")), "clip_id"
    )


def q_video_frames(sf_dir: str) -> pa.Table:
    """Video frame-sampling fan-out, driver-oracle-checked: one synthetic
    video row per document (fps=25, n_frames=doc_id%50+1) through the REAL
    VideoFrameSampler actor pool (every 10th frame); the deterministic
    fan-out layout (video_id, frame_idx, frame_ts_s) is reproduced by the
    oracle with generate_series — the fake per-frame feature column is
    excluded (its hash isn't SQL-expressible) and covered by unit tests."""
    from spider_ray.sources.tables import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "video_id": pa.array([f"v{d}" for d in ids], pa.string()),
                "bytes": pa.array(
                    [bytes([d % 251]) * 64 for d in ids], pa.binary()
                ),
                "fps": pa.array([25.0] * len(ids), pa.float64()),
                "n_frames": pa.array(
                    [d % 50 + 1 for d in ids], pa.int64()
                ),
            }
        )

    out = sample_video_frames(
        ds.map_batches(synth, batch_format="pyarrow"), every_n=10,
        concurrency=2,
    )

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["video_id", "frame_idx", "frame_ts_s"])

    from spider_ray.pipelines.relational import _concat, _sorted

    return _sorted(
        _concat(out.map_batches(project, batch_format="pyarrow")),
        ["video_id", "frame_idx"],
    )


# --- CLIP-style image<->caption alignment gate -----------------------------

# Alignment threshold for the gate flag. 0.3 sits >=9e-4 away from every
# adjacent-pair cosine in the deterministic sf0.001/0.01/0.1 embeddings, so
# the int flag is stable under any float library's last-ulp differences.
ALIGN_TAU = 0.3
_N_ALIGN_PARTS = 32


def q_clip_align(sf_dir: str) -> pa.Table:
    """CLIP-score alignment of (image, caption) embedding pairs — the
    LAION-style curation gate: score every pair with the cosine of its two
    embeddings and flag which pass the alignment threshold (downstream
    filters consume the flag; emitting the score keeps the gate auditable).

    Pairing convention over the ``embeddings`` table: even ``vec_id`` is the
    image-side vector, ``vec_id + 1`` its caption; ``pair_id = vec_id >> 1``.
    This is a DIFFERENT shape from ``q_embedding_neardup`` (all-pairs): here
    each row joins exactly one partner, so the distributed form is a hash
    co-partition on ``pair_id`` (both sides of a pair land in the same
    partition by construction) followed by one vectorized einsum per group
    — no N x N matrix anywhere, partition cardinality bounded by the part
    count, never by the corpus. At 100 TB the same two-stage shape holds:
    the shuffle moves (pair_id, embedding) once, the score is a per-row
    kernel. Unpartnered rows (odd total) drop, matching the SQL inner join.
    """
    from spider_ray.functions.similarity import _ids64, _vec_matrix
    from spider_ray.pipelines.relational import _concat, _sorted
    from spider_ray.sources.tables import read_table

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def tag(batch: pa.Table) -> pa.Table:
        pair = _ids64(batch["vec_id"]) >> 1
        return batch.append_column(
            "pair_id", pa.array(pair, pa.int64())
        ).append_column(
            "part", pa.array(pair % _N_ALIGN_PARTS, pa.int32())
        )

    def gate(group: pa.Table) -> pa.Table:
        ids = _ids64(group["vec_id"])
        pair = _ids64(group["pair_id"])
        M = _vec_matrix(group["embedding"])
        a_idx = np.nonzero(ids % 2 == 0)[0]
        b_idx = np.nonzero(ids % 2 == 1)[0]
        common, ia, ib = np.intersect1d(
            pair[a_idx], pair[b_idx], return_indices=True
        )
        A = M[a_idx[ia]]
        B = M[b_idx[ib]]
        cos = np.einsum("ij,ij->i", A, B) / np.maximum(
            np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1), 1e-12
        )
        return pa.table(
            {
                "pair_id": pa.array(common, pa.int64()),
                "cosine": pa.array(cos, pa.float64()),
                "aligned": pa.array(
                    (cos >= ALIGN_TAU).astype(np.int32), pa.int32()
                ),
            }
        )

    out = (
        emb.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gate, batch_format="pyarrow")
    )
    return _sorted(_concat(out), "pair_id")


def segment_energy(
    x: np.ndarray, frame: int = 80, threshold: float = 1e-4
) -> list[tuple[int, int]]:
    """Energy-based voice-activity segmentation (the classic frame-energy
    VAD): split the waveform into ``frame``-sample frames, mark frames
    with mean square energy above ``threshold`` active, return the
    [start_frame, end_frame) spans of contiguous active runs. Vectorized
    numpy (frame energies + run-edge detection via diff)."""
    n = (len(x) // frame) * frame
    if n == 0:
        return []
    e = (x[:n].astype(np.float64).reshape(-1, frame) ** 2).mean(axis=1)
    active = e > threshold
    if not active.any():
        return []
    edges = np.flatnonzero(np.diff(active.astype(np.int8)))
    starts = [0] if active[0] else []
    starts += [int(i) + 1 for i in edges if not active[i]]
    ends = [int(i) + 1 for i in edges if active[i]]
    if active[-1]:
        ends.append(len(active))
    return list(zip(starts, ends))


def q_audio_segments(sf_dir: str) -> pa.Table:
    """VAD-style segmentation over REAL-decoded PCM WAV: one
    deterministic clip per document built as K = 1 + doc_id%4 bursts of
    (480 tone samples + 320 silence samples) at 8 kHz; the actor-pool
    stage decodes the actual bytes (stdlib ``wave``) and segments by
    10 ms-frame energy. Because the burst layout is a pure function of
    doc_id and frames align with burst boundaries, the DuckDB oracle
    replays every output column exactly — the engine's numbers still
    come from the waveform, so a decode or segmentation bug breaks the
    hash. Output per clip: n_segments, active_ms, first_start_ms,
    last_end_ms."""
    import io
    import wave as _wave

    from spider_ray.pipelines.relational import _concat, _sorted
    from spider_ray.sources.tables import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        clips, ids, dids = [], [], []
        for did in batch["doc_id"].to_pylist():
            k = 1 + did % 4
            freq = 200.0 + (did % 20) * 40.0
            parts = []
            for b in range(k):
                t = np.arange(480) / 8000.0
                parts.append(
                    (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype(
                        "<i2"
                    )
                )
                parts.append(np.zeros(320, "<i2"))
            x = np.concatenate(parts)
            buf = io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(x.tobytes())
            clips.append(buf.getvalue())
            ids.append(f"clip{did}")
            dids.append(did)
        return pa.table(
            {
                "clip_id": pa.array(ids, pa.string()),
                "bytes": pa.array(clips, pa.binary()),
            }
        )

    class Segmenter:
        """Actor-pool stage: decode in __call__, codec state warm."""

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {
                "clip_id": [],
                "n_segments": [],
                "active_ms": [],
                "first_start_ms": [],
                "last_end_ms": [],
            }
            for cid, data in zip(
                batch["clip_id"].to_pylist(), batch["bytes"].to_pylist()
            ):
                x, rate = decode_wav(data)
                spans = segment_energy(x)
                ms = 1000 * 80 // rate  # 10 ms frames at 8 kHz
                out["clip_id"].append(cid)
                out["n_segments"].append(len(spans))
                out["active_ms"].append(
                    sum((e - s) for s, e in spans) * ms
                )
                out["first_start_ms"].append(
                    spans[0][0] * ms if spans else -1
                )
                out["last_end_ms"].append(
                    spans[-1][1] * ms if spans else -1
                )
            return pa.table(
                {
                    "clip_id": pa.array(out["clip_id"], pa.string()),
                    "n_segments": pa.array(out["n_segments"], pa.int64()),
                    "active_ms": pa.array(out["active_ms"], pa.int64()),
                    "first_start_ms": pa.array(
                        out["first_start_ms"], pa.int64()
                    ),
                    "last_end_ms": pa.array(
                        out["last_end_ms"], pa.int64()
                    ),
                }
            )

    seg = ds.map_batches(synth, batch_format="pyarrow").map_batches(
        Segmenter, batch_format="pyarrow", concurrency=2
    )
    return _sorted(_concat(seg), "clip_id")
