"""Resumable shard writer (stages/shardsink.py): written layout equals
the oracled pack plan, donelist resume semantics (skip committed ranges,
wipe markerless partials, rewrite exactly what's missing, byte-identical
result), and the verify audit catching corruption."""

import os
import random
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spider_ray.functions.imageshard import (
    SHARD_BUDGET,
    q_image_shard_pack,
    q_shard_manifest,
)
from spider_ray.sources.lance_io import conform_images, write_images
from spider_ray.stages.shardsink import verify_shards, write_shards

N = 300


@pytest.fixture(scope="module")
def store(tmp_path_factory, ray_session):
    rng = random.Random(20240820)
    sizes = []
    for _ in range(N):
        r = rng.random()
        if r < 0.02:
            sizes.append(SHARD_BUDGET + rng.randrange(1, 5000))
        else:
            sizes.append(rng.randrange(200, 7000))
    tbl = conform_images(
        pa.table(
            {
                "image_id": [f"img{i:05d}" for i in range(N)],
                "bytes": [bytes([i % 251]) * n for i, n in enumerate(sizes)],
                "w": [rng.randrange(16, 49) for _ in range(N)],
                "h": [rng.randrange(16, 49) for _ in range(N)],
                "fmt": ["png"] * N,
                "caption": [f"caption number {i}" for i in range(N)],
                "phash": [rng.getrandbits(63) for _ in range(N)],
            }
        )
    )
    return write_images(tbl, str(tmp_path_factory.mktemp("sink") / "images"))


def _read_layout(out_dir):
    """{shard_id: member table} for every written shard file."""
    out = {}
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if not (d.startswith("range=") and os.path.isdir(p)):
            continue
        assert os.path.exists(os.path.join(p, "_DONE"))
        assert os.path.exists(os.path.join(p, "_MANIFEST.json"))
        for f in sorted(os.listdir(p)):
            if f.startswith("shard-") and f.endswith(".parquet"):
                sid = int(f.split("-")[1].split(".")[0])
                out[sid] = pq.read_table(os.path.join(p, f))
    return out


def test_write_matches_plan_and_verifies(store, tmp_path):
    out = str(tmp_path / "shards")
    summary = write_shards(store, out)
    assert not any(summary["skipped"].to_pylist())

    plan = q_image_shard_pack(store).to_pylist()
    layout = _read_layout(out)
    # every planned shard exists; members are exactly the planned ones,
    # in seq order, with the full input_hint schema
    want = {}
    for r in plan:
        want.setdefault(r["shard"], []).append(r["image_id"])
    assert set(layout) == set(want)
    for sid, members in want.items():
        got = layout[sid]["image_id"].to_pylist()
        assert got == members
        assert layout[sid].column_names == [
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        ]
    # root manifest equals the oracled q_shard_manifest
    root = pq.read_table(os.path.join(out, "manifest.parquet"))
    assert root.equals(q_shard_manifest(store))
    # the audit is clean
    rep = verify_shards(out)
    assert rep["mismatches"] == []
    assert rep["shards_checked"] == len(want)


def test_resume_rewrites_only_missing_ranges(store, tmp_path):
    out = str(tmp_path / "shards")
    write_shards(store, out)
    first = {
        sid: t.to_pylist() for sid, t in _read_layout(out).items()
    }

    # simulate a crash: one range fully deleted, one left as a
    # markerless partial (crashed attempt), one untouched
    ranges = sorted(
        d for d in os.listdir(out) if d.startswith("range=")
    )
    assert len(ranges) == 3  # N=300, SHARD_RANGE=128
    shutil.rmtree(os.path.join(out, ranges[0]))
    os.remove(os.path.join(out, ranges[1], "_DONE"))
    untouched = os.path.join(out, ranges[2], "_MANIFEST.json")
    mtime_before = os.path.getmtime(untouched)

    summary = write_shards(store, out).to_pylist()
    by_range = {r["range_id"]: r for r in summary}
    assert [by_range[i]["skipped"] for i in sorted(by_range)] == [
        False, False, True,
    ]
    # untouched range was not rewritten
    assert os.path.getmtime(untouched) == mtime_before
    # final layout byte-identical to the first run
    second = {
        sid: t.to_pylist() for sid, t in _read_layout(out).items()
    }
    assert second == first
    assert verify_shards(out)["mismatches"] == []


def test_verify_catches_corruption(store, tmp_path):
    out = str(tmp_path / "shards")
    write_shards(store, out)
    layout_files = []
    for d in sorted(os.listdir(out)):
        p = os.path.join(out, d)
        if d.startswith("range=") and os.path.isdir(p):
            layout_files.extend(
                os.path.join(p, f)
                for f in sorted(os.listdir(p))
                if f.startswith("shard-")
            )
    # corrupt one shard: drop its last member row
    victim = layout_files[3]
    t = pq.read_table(victim)
    pq.write_table(t.slice(0, len(t) - 1), victim)
    rep = verify_shards(out)
    assert rep["mismatches"] != []
    bad = {m["shard"] for m in rep["mismatches"]}
    sid = int(os.path.basename(victim).split("-")[1].split(".")[0])
    assert bad == {sid}
    # and a deleted shard file reports as missing
    os.remove(layout_files[5])
    rep = verify_shards(out)
    sid5 = int(os.path.basename(layout_files[5]).split("-")[1].split(".")[0])
    assert {"shard": sid5, "field": "missing on disk"} in rep["mismatches"]


def test_append_rewrites_only_stale_and_new_ranges(
    store, tmp_path, tmp_path_factory
):
    """Incremental append = resume over a grown corpus: committed ranges
    whose plan is unchanged are kept; the trailing partial range (whose
    membership grew) and brand-new ranges are (re)written; the result is
    identical to a fresh full write."""
    from spider_ray.sources.lance_io import read_images_table

    base_tbl = read_images_table(store)
    rng = random.Random(99)
    extra = conform_images(
        pa.table(
            {
                "image_id": [f"img{i:05d}" for i in range(N, N + 128)],
                "bytes": [
                    bytes([i % 251]) * rng.randrange(200, 7000)
                    for i in range(N, N + 128)
                ],
                "w": [rng.randrange(16, 49) for _ in range(128)],
                "h": [rng.randrange(16, 49) for _ in range(128)],
                "fmt": ["png"] * 128,
                "caption": [f"caption number {i}" for i in range(N, N + 128)],
                "phash": [rng.getrandbits(63) for _ in range(128)],
            }
        )
    )
    grown = write_images(
        pa.concat_tables([base_tbl, extra]),
        str(tmp_path_factory.mktemp("grown") / "images"),
    )

    out = str(tmp_path / "shards")
    write_shards(store, out)
    mtime_r0 = os.path.getmtime(os.path.join(out, "range=000000"))

    summary = {
        r["range_id"]: r for r in write_shards(grown, out).to_pylist()
    }
    # ranges 0,1 (seq 0..255) unchanged -> skipped; range 2 grew from a
    # partial (seq 256..299) to full (..383) -> stale, rewritten; range 3
    # is new (seq 384..427)
    assert [summary[i]["skipped"] for i in range(4)] == [
        True, True, False, False,
    ]
    assert os.path.getmtime(os.path.join(out, "range=000000")) == mtime_r0

    fresh = str(tmp_path / "fresh")
    write_shards(grown, fresh)
    a = {sid: t.to_pylist() for sid, t in _read_layout(out).items()}
    b = {sid: t.to_pylist() for sid, t in _read_layout(fresh).items()}
    assert a == b
    assert verify_shards(out)["mismatches"] == []


def test_cli_shard_write_and_verify(store, tmp_path, capsys):
    """The ray-job-submit surface: shard-write (fresh then resumed) and
    shard-verify exit codes + JSON summaries."""
    import json

    from spider_ray.cli import main

    out = str(tmp_path / "cli_shards")
    assert main(["shard-write", "--images", store, "--out", out]) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["skipped"] == 0 and first["written"] == first["ranges"]

    assert main(["shard-write", "--images", store, "--out", out]) == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again["written"] == 0 and again["skipped"] == again["ranges"]
    assert again["shards"] == first["shards"]

    assert main(["shard-verify", "--out", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["mismatches"] == []

    # corrupt -> nonzero exit
    rdir = sorted(
        d for d in os.listdir(out) if d.startswith("range=")
    )[0]
    victims = sorted(
        f for f in os.listdir(os.path.join(out, rdir))
        if f.startswith("shard-")
    )
    t = pq.read_table(os.path.join(out, rdir, victims[0]))
    pq.write_table(t.slice(0, len(t) - 1), os.path.join(out, rdir, victims[0]))
    assert main(["shard-verify", "--out", out]) == 1


def test_read_shards_roundtrip_and_pruning(store, tmp_path):
    from spider_ray.sources.lance_io import read_images_table
    from spider_ray.stages.shardsink import read_shards

    out = str(tmp_path / "shards")
    write_shards(store, out)

    # full round trip: every corpus row comes back exactly once
    got = read_shards(out).take_all()
    src = read_images_table(store).to_pylist()
    key = lambda r: r["image_id"]  # noqa: E731
    assert sorted(got, key=key) == sorted(src, key=key)

    # seq_range pruning: only intersecting shards' members, and only
    # their files are opened (shard count from the manifest zone map)
    manifest = q_shard_manifest(store).to_pylist()
    lo, hi = 40, 170
    want_shards = {
        m["shard"] for m in manifest
        if m["first_seq"] <= hi and m["last_seq"] >= lo
    }
    ds = read_shards(out, seq_range=(lo, hi), columns=["image_id"])
    ids = [r["image_id"] for r in ds.take_all()]
    assert ds.schema().names == ["image_id"]
    plan = {r["image_id"]: r["shard"] for r in q_image_shard_pack(store).to_pylist()}
    assert {plan[i] for i in ids} == want_shards

    # explicit shard selection
    two = sorted(want_shards)[:2]
    ids2 = {
        r["image_id"]
        for r in read_shards(out, shards=two, columns=["image_id"]).take_all()
    }
    assert ids2 == {i for i, s in plan.items() if s in two}

    # a manifest-listed shard missing on disk raises
    files = sorted(
        os.path.join(out, d, f)
        for d in os.listdir(out) if d.startswith("range=")
        for f in os.listdir(os.path.join(out, d)) if f.startswith("shard-")
    )
    os.remove(files[0])
    with pytest.raises(FileNotFoundError):
        read_shards(out)


def test_bucket_layout_write_matches_plan(store, tmp_path):
    """layout='bucket' materializes the q_bucket_shard_pack plan: shard
    files never mix aspect buckets, membership/order match the oracled
    plan, audit is clean, resume skips all units, and switching layout on
    an existing out_dir rewrites everything via the staleness check."""
    from spider_ray.functions.imageshard import q_bucket_shard_pack

    out = str(tmp_path / "shards")
    write_shards(store, out, layout="bucket")

    plan = q_bucket_shard_pack(store).to_pylist()
    want = {}
    bucket_of = {}
    for r in sorted(plan, key=lambda r: r["seq"]):
        want.setdefault(r["shard"], []).append(r["image_id"])
        bucket_of[r["image_id"]] = r["bucket_id"]
    layout = _read_layout(out)
    assert set(layout) == set(want)
    for sid, members in want.items():
        got = layout[sid]["image_id"].to_pylist()
        assert got == members
        assert len({bucket_of[i] for i in got}) == 1  # never mix buckets
    assert verify_shards(out)["mismatches"] == []

    # pure resume on re-run
    again = write_shards(store, out, layout="bucket")
    assert all(again["skipped"].to_pylist())

    # switching layout on the same dir: every unit is stale -> rewritten,
    # and the result now matches the seq plan
    seq = write_shards(store, out, layout="seq")
    assert not any(seq["skipped"].to_pylist())
    seq_plan = {}
    for r in q_image_shard_pack(store).to_pylist():
        seq_plan.setdefault(r["shard"], []).append(r["image_id"])
    relayout = _read_layout(out)
    assert set(relayout) == set(seq_plan)
    assert verify_shards(out)["mismatches"] == []


def test_verify_catches_member_reordering(store, tmp_path):
    """Every rollup field (counts/bytes/interval/xor checksum) is
    permutation-invariant, so the order contract needs its own check."""
    out = str(tmp_path / "shards")
    write_shards(store, out)
    rdir = sorted(d for d in os.listdir(out) if d.startswith("range="))[0]
    victim = None
    for f in sorted(os.listdir(os.path.join(out, rdir))):
        if f.startswith("shard-"):
            t = pq.read_table(os.path.join(out, rdir, f))
            if len(t) >= 2:
                victim = os.path.join(out, rdir, f)
                break
    assert victim is not None
    # reverse the members: all rollup fields unchanged, order broken
    pq.write_table(t.take(list(range(len(t) - 1, -1, -1))), victim)
    rep = verify_shards(out)
    sid = int(os.path.basename(victim).split("-")[1].split(".")[0])
    assert {"shard": sid, "field": "members out of seq order"} in rep[
        "mismatches"
    ]
    assert len(rep["mismatches"]) == 1  # nothing else fires


def test_write_range_commit_is_idempotent(store, tmp_path, monkeypatch):
    """A Ray task retry can re-run write_range after a previous attempt
    already committed the range (worker died between rename and result
    return). Simulated by blinding the donelist scan: the committed dirs
    survive untouched and the rerun neither crashes nor rewrites."""
    import spider_ray.stages.shardsink as sink

    out = str(tmp_path / "shards")
    write_shards(store, out)
    first = {
        sid: t.to_pylist() for sid, t in _read_layout(out).items()
    }
    rdirs = sorted(d for d in os.listdir(out) if d.startswith("range="))
    mtimes = {
        d: os.path.getmtime(os.path.join(out, d, "_MANIFEST.json"))
        for d in rdirs
    }

    monkeypatch.setattr(sink, "_scan_done", lambda _out: set())
    write_shards(store, out)  # every range re-enters the stream
    for d in rdirs:  # committed work kept, not re-renamed
        assert (
            os.path.getmtime(os.path.join(out, d, "_MANIFEST.json"))
            == mtimes[d]
        )
    assert {
        sid: t.to_pylist() for sid, t in _read_layout(out).items()
    } == first
    assert verify_shards(out)["mismatches"] == []
    # no stray tmp dirs left behind
    assert not [d for d in os.listdir(out) if d.startswith(".tmp-")]


def test_read_shards_bucket_filter(store, tmp_path):
    from spider_ray.functions.imageshard import q_bucket_shard_pack
    from spider_ray.stages.shardsink import read_shards

    out = str(tmp_path / "shards")
    write_shards(store, out, layout="bucket")
    plan = q_bucket_shard_pack(store).to_pylist()
    buckets = sorted({r["bucket_id"] for r in plan})
    assert len(buckets) >= 2
    k = buckets[0]
    want = {r["image_id"] for r in plan if r["bucket_id"] == k}
    got = {
        r["image_id"]
        for r in read_shards(out, bucket=k, columns=["image_id"]).take_all()
    }
    assert got == want
    # empty bucket id -> empty dataset, correct schema
    ds = read_shards(out, bucket=max(buckets) + 1, columns=["image_id"])
    assert ds.count() == 0


def test_read_shards_bucket_filter_rejects_seq_layout(store, tmp_path):
    from spider_ray.stages.shardsink import read_shards

    out = str(tmp_path / "shards")
    write_shards(store, out)  # seq layout
    with pytest.raises(ValueError, match="layout shard dir"):
        read_shards(out, bucket=0)


def test_iter_epoch_matches_plan_and_strides(store, tmp_path):
    from spider_ray.functions.imageshard import q_epoch_shuffle
    from spider_ray.stages.shardsink import iter_epoch

    out = str(tmp_path / "shards")
    write_shards(store, out)

    plan = sorted(
        q_epoch_shuffle(store, epoch=1).to_pylist(),
        key=lambda r: r["epoch_pos"],
    )
    want_ids = [r["image_id"] for r in plan]
    want_shard_seq = []
    seen = set()
    for r in plan:  # shard visit order of the epoch
        if r["shard"] not in seen:
            seen.add(r["shard"])
            want_shard_seq.append(r["shard"])

    # single worker: concatenated member order IS the epoch order
    got_ids, got_shards = [], []
    for i, t in enumerate(iter_epoch(out, 1)):
        got_shards.append(i)
        got_ids.extend(t["image_id"].to_pylist())
        assert t.column_names == [
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        ]
    assert got_ids == want_ids
    assert len(got_shards) == len(want_shard_seq)

    # column projection keeps the order, drops the payload
    proj = [
        t.column_names == ["caption"]
        for t in iter_epoch(out, 1, columns=["caption"])
    ]
    assert all(proj) and len(proj) == len(want_shard_seq)

    # rank/world: disjoint shard strides whose interleave is the epoch
    world = 3
    per_rank = [
        [t["image_id"].to_pylist() for t in iter_epoch(out, 1, rank=r, world=world)]
        for r in range(world)
    ]
    # reassemble by striding shard tables in permutation order
    merged = []
    counts = [len(x) for x in per_rank]
    for i in range(max(counts)):
        for r in range(world):
            if i < counts[r]:
                merged.extend(per_rank[r][i])
    assert merged == want_ids

    # a different epoch re-deals; same member multiset
    e2 = [x for t in iter_epoch(out, 2) for x in t["image_id"].to_pylist()]
    assert e2 != want_ids and sorted(e2) == sorted(want_ids)


def test_iter_epoch_bucket_stream_is_filtered_full_epoch(store, tmp_path):
    from spider_ray.functions.imageshard import q_bucket_shard_pack
    from spider_ray.stages.shardsink import iter_epoch

    out = str(tmp_path / "shards")
    write_shards(store, out, layout="bucket")
    plan = q_bucket_shard_pack(store).to_pylist()
    bucket_of = {r["image_id"]: r["bucket_id"] for r in plan}
    buckets = sorted({r["bucket_id"] for r in plan})
    assert len(buckets) >= 2

    full = [x for t in iter_epoch(out, 1) for x in t["image_id"].to_pylist()]
    for k in buckets:
        got = [
            x
            for t in iter_epoch(out, 1, bucket=k)
            for x in t["image_id"].to_pylist()
        ]
        assert got == [x for x in full if bucket_of[x] == k]

    # seq layout rejects the bucket filter, same contract as read_shards
    seq_out = str(tmp_path / "seq_shards")
    write_shards(store, seq_out)
    with pytest.raises(ValueError, match="layout shard dir"):
        next(iter_epoch(seq_out, 1, bucket=0))
