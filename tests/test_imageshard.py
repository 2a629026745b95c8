"""Training-layout ops (functions/imageshard.py): aspect-ratio bucket
argmin semantics (integer-exact, first-minimum tie-break) against a
Fraction-arithmetic reference, and WebDataset shard packing against a
single-process greedy reference — budget, oversize-singleton, range
independence and global shard-id contiguity invariants. SQL-oracle
bit-exactness of both queries is separately enforced by
tools/oracle_strict.py / the driver."""

import random
from fractions import Fraction

import numpy as np
import pyarrow as pa
import pytest

from spider_ray.functions.imageshard import (
    ASPECT_BUCKETS,
    SHARD_BUDGET,
    SHARD_RANGE,
    q_aspect_buckets,
    q_image_shard_pack,
)
from spider_ray.sources.lance_io import conform_images, write_images

N = 300  # spans 3 pack ranges (SHARD_RANGE=128)


def _sizes(rng):
    """Payload sizes exercising every pack case: mostly small, some that
    exactly hit the budget boundary, and a few oversize singletons."""
    out = []
    for i in range(N):
        r = rng.random()
        if r < 0.02:
            out.append(SHARD_BUDGET + rng.randrange(1, 5000))  # oversize
        elif r < 0.06:
            out.append(SHARD_BUDGET)  # exact fit
        else:
            out.append(rng.randrange(200, 7000))
    return out


@pytest.fixture(scope="module")
def store(tmp_path_factory, ray_session):
    rng = random.Random(20240819)
    sizes = _sizes(rng)
    tbl = conform_images(
        pa.table(
            {
                "image_id": [f"img{i:05d}" for i in range(N)],
                "bytes": [b"x" * n for n in sizes],
                "w": [rng.randrange(16, 49) for _ in range(N)],
                "h": [rng.randrange(16, 49) for _ in range(N)],
                "fmt": ["png"] * N,
                "caption": ["a plain five word caption"] * N,
                "phash": [rng.getrandbits(63) for _ in range(N)],
            }
        )
    )
    return write_images(tbl, str(tmp_path_factory.mktemp("shard") / "images"))


def test_aspect_buckets_match_fraction_reference(store):
    t = q_aspect_buckets(store)
    assert t.column_names == [
        "image_id", "w", "h", "bucket_id", "bucket_w", "bucket_h",
    ]
    got = {
        r["image_id"]: (r["bucket_id"], r["bucket_w"], r["bucket_h"])
        for r in t.to_pylist()
    }
    assert len(got) == N
    for r in t.to_pylist():
        ratio = Fraction(r["w"], r["h"])
        dists = [abs(ratio - Fraction(bw, bh)) for bw, bh in ASPECT_BUCKETS]
        k = dists.index(min(dists))  # first minimum == lowest bucket index
        assert got[r["image_id"]] == (k, *ASPECT_BUCKETS[k]), r


def test_aspect_buckets_tie_breaks_low_index(ray_session, tmp_path):
    # 7/12 is exactly halfway between prototypes 1/2 and 2/3 -> the
    # integer argmin must break to the lower bucket_id (more portrait)
    tbl = conform_images(
        pa.table(
            {
                "image_id": ["tie0"],
                "bytes": [b"x" * 2000],
                "w": [7],
                "h": [12],
                "fmt": ["png"],
                "caption": ["a plain five word caption"],
                "phash": [0],
            }
        )
    )
    path = write_images(tbl, str(tmp_path / "images"))
    t = q_aspect_buckets(path)
    assert t["bucket_id"].to_pylist() == [0]
    assert t["bucket_w"].to_pylist() == [1]
    assert t["bucket_h"].to_pylist() == [2]


def _greedy_reference(sizes):
    """Single-process per-range greedy pack + offset cumsum."""
    shard_of = [0] * len(sizes)
    base = 0
    for start in range(0, len(sizes), SHARD_RANGE):
        fill, local = 0, 0
        for i in range(start, min(start + SHARD_RANGE, len(sizes))):
            n = sizes[i]
            if fill > 0 and fill + n > SHARD_BUDGET:
                local += 1
                fill = 0
            fill += n
            shard_of[i] = base + local
        base += local + 1
    return shard_of


def test_shard_pack_matches_greedy_reference(store):
    t = q_image_shard_pack(store)
    assert t.column_names == ["image_id", "seq", "n_bytes", "shard"]
    rows = sorted(t.to_pylist(), key=lambda r: r["seq"])
    assert [r["seq"] for r in rows] == list(range(N))
    sizes = [r["n_bytes"] for r in rows]
    assert [r["shard"] for r in rows] == _greedy_reference(sizes)


def test_shard_pack_invariants(store):
    rows = sorted(q_image_shard_pack(store).to_pylist(), key=lambda r: r["seq"])
    fills = {}
    for r in rows:
        fills.setdefault(r["shard"], []).append(r["n_bytes"])
    # shard ids globally contiguous from 0
    assert sorted(fills) == list(range(len(fills)))
    for members in fills.values():
        # budget respected, except an oversize image alone in its shard
        assert sum(members) <= SHARD_BUDGET or len(members) == 1
    # shards never span a range boundary; each range's ids are a
    # contiguous interval disjoint from every other range's
    by_range = {}
    for r in rows:
        by_range.setdefault(r["seq"] // SHARD_RANGE, set()).add(r["shard"])
    spans = sorted(
        (min(s), max(s)) for s in by_range.values()
    )
    for (lo, hi), (lo2, _) in zip(spans, spans[1:]):
        assert hi < lo2
    # monotone: shard ids never decrease in seq order
    shard_seq = [r["shard"] for r in rows]
    assert shard_seq == sorted(shard_seq)


def _mix64(x: int, seed: int) -> int:
    m = (1 << 64) - 1
    u = (x * 2654435761 + seed) & m
    u ^= u >> 29
    u = (u * 2246822519) & m
    u ^= u >> 32
    return u


def test_shard_manifest_matches_assignment_rollup(store):
    from spider_ray.functions.imageshard import q_shard_manifest

    pack = sorted(q_image_shard_pack(store).to_pylist(), key=lambda r: r["seq"])
    want = {}
    for r in pack:
        m = want.setdefault(
            r["shard"],
            {
                "shard": r["shard"],
                "range_id": r["seq"] // SHARD_RANGE,
                "n_images": 0,
                "payload_bytes": 0,
                "first_seq": r["seq"],
                "last_seq": r["seq"],
                "checksum": 0,
            },
        )
        m["n_images"] += 1
        m["payload_bytes"] += r["n_bytes"]
        m["first_seq"] = min(m["first_seq"], r["seq"])
        m["last_seq"] = max(m["last_seq"], r["seq"])
        m["checksum"] ^= _mix64(r["seq"], r["n_bytes"])

    got = q_shard_manifest(store).to_pylist()
    assert got == [want[s] for s in sorted(want)]
    # every image is accounted for exactly once
    assert sum(m["n_images"] for m in got) == N
    assert sum(m["payload_bytes"] for m in got) == sum(
        r["n_bytes"] for r in pack
    )


def test_bucket_shard_pack_matches_reference(store):
    from spider_ray.functions.imageshard import q_bucket_shard_pack

    t = q_bucket_shard_pack(store)
    assert t.column_names == [
        "image_id", "seq", "n_bytes", "bucket_id", "shard",
    ]
    rows = t.to_pylist()
    # output ordered by (bucket_id, seq); every image present once
    assert [(r["bucket_id"], r["seq"]) for r in rows] == sorted(
        (r["bucket_id"], r["seq"]) for r in rows
    )
    assert sorted(r["seq"] for r in rows) == list(range(N))

    # bucket assignment must equal q_aspect_buckets' argmin
    buckets = {
        r["image_id"]: r["bucket_id"]
        for r in q_aspect_buckets(store).to_pylist()
    }
    for r in rows:
        assert r["bucket_id"] == buckets[r["image_id"]]

    # single-process reference: per (bucket, seq-range) greedy pack,
    # global ids cumsum'd in (bucket, range) order
    groups = {}
    for r in sorted(rows, key=lambda r: r["seq"]):
        groups.setdefault(
            (r["bucket_id"], r["seq"] // SHARD_RANGE), []
        ).append(r)
    want = {}
    base = 0
    for key in sorted(groups):
        members = groups[key]
        fill, local = 0, 0
        for r in members:
            n = r["n_bytes"]
            if fill > 0 and fill + n > SHARD_BUDGET:
                local += 1
                fill = 0
            fill += n
            want[r["image_id"]] = base + local
        base += local + 1
    assert {r["image_id"]: r["shard"] for r in rows} == want

    # shards never mix buckets; budget respected except singletons
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert sorted(by_shard) == list(range(len(by_shard)))
    for members in by_shard.values():
        assert len({m["bucket_id"] for m in members}) == 1
        total = sum(m["n_bytes"] for m in members)
        assert total <= SHARD_BUDGET or len(members) == 1


def test_bucket_stats_matches_rollup_reference(store):
    from collections import defaultdict

    from spider_ray.functions.imageshard import q_bucket_stats
    from spider_ray.sources.lance_io import read_images_table

    raw = read_images_table(store)
    buckets = {
        r["image_id"]: r["bucket_id"]
        for r in q_aspect_buckets(store).to_pylist()
    }
    want = defaultdict(
        lambda: {
            "n_images": 0, "payload_bytes": 0,
            "min_w": 1 << 40, "max_w": -1, "min_h": 1 << 40, "max_h": -1,
            "caption_words": 0,
        }
    )
    for r in raw.to_pylist():
        m = want[(buckets[r["image_id"]], r["fmt"])]
        m["n_images"] += 1
        m["payload_bytes"] += len(r["bytes"])
        m["min_w"] = min(m["min_w"], r["w"])
        m["max_w"] = max(m["max_w"], r["w"])
        m["min_h"] = min(m["min_h"], r["h"])
        m["max_h"] = max(m["max_h"], r["h"])
        m["caption_words"] += len(r["caption"].split(" "))

    got = q_bucket_stats(store).to_pylist()
    assert [(r["bucket_id"], r["fmt"]) for r in got] == sorted(want)
    for r in got:
        m = want[(r["bucket_id"], r["fmt"])]
        assert {k: r[k] for k in m} == m, r
    assert sum(r["n_images"] for r in got) == N


def test_epoch_shuffle_matches_two_level_reference(store):
    from spider_ray.functions.imageshard import (
        EPOCH_MEMBER_SEED,
        EPOCH_SHARD_SEED,
        EPOCH_STRIDE,
        q_epoch_shuffle,
    )

    epoch = 1
    pack = sorted(q_image_shard_pack(store).to_pylist(), key=lambda r: r["seq"])
    # single-process reference: permute shard list by the frozen shard
    # key, then order members within each shard by the member key;
    # global position = cumsum of permuted shard sizes + local rank
    members = {}
    for r in pack:
        members.setdefault(r["shard"], []).append(r)
    # epoch_key = double mix64 (single round is not seed-diffusing)
    skey = lambda s: (
        _mix64(_mix64(s, EPOCH_STRIDE * epoch + EPOCH_SHARD_SEED), 0), s,
    )
    mkey = lambda q: (
        _mix64(_mix64(q, EPOCH_STRIDE * epoch + EPOCH_MEMBER_SEED), 0), q,
    )
    want, pos = {}, 0
    for s in sorted(members, key=skey):
        for r in sorted(members[s], key=lambda r: mkey(r["seq"])):
            want[r["image_id"]] = (r["seq"], s, pos)
            pos += 1

    t = q_epoch_shuffle(store, epoch=epoch)
    assert t.column_names == ["image_id", "seq", "shard", "epoch_pos"]
    rows = t.to_pylist()
    assert {
        r["image_id"]: (r["seq"], r["shard"], r["epoch_pos"]) for r in rows
    } == want
    # epoch_pos is a permutation of 0..N-1, output sorted by it
    assert [r["epoch_pos"] for r in rows] == list(range(N))
    # two-level structure: each shard's members occupy one contiguous
    # block of positions (the property that makes a shard one sequential
    # read per epoch)
    blocks = {}
    for r in rows:
        lo, hi, n = blocks.get(r["shard"], (r["epoch_pos"], r["epoch_pos"], 0))
        blocks[r["shard"]] = (
            min(lo, r["epoch_pos"]), max(hi, r["epoch_pos"]), n + 1
        )
    for lo, hi, n in blocks.values():
        assert hi - lo + 1 == n


def test_epoch_shuffle_epochs_differ_and_rerun_is_stable(store):
    from spider_ray.functions.imageshard import q_epoch_shuffle

    e1 = {r["image_id"]: r["epoch_pos"]
          for r in q_epoch_shuffle(store, epoch=1).to_pylist()}
    e1b = {r["image_id"]: r["epoch_pos"]
           for r in q_epoch_shuffle(store, epoch=1).to_pylist()}
    e2 = {r["image_id"]: r["epoch_pos"]
          for r in q_epoch_shuffle(store, epoch=2).to_pylist()}
    assert e1 == e1b  # deterministic across runs
    assert set(e1) == set(e2) and len(e1) == N
    assert e1 != e2  # a new epoch re-deals the order


def test_greedy_local_shards_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spider_ray.functions.imageshard import greedy_local_shards

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=3 * SHARD_BUDGET),
            max_size=300,
        )
    )
    def check(sizes):
        s = greedy_local_shards(sizes)
        assert len(s) == len(sizes)
        if not sizes:
            return
        # ids start at 0 and only ever step by +1 (contiguous)
        assert s[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(s, s[1:]))
        # each shard's payload fits the budget, unless its overflow is
        # carried by a single oversize item (zero-size members can ride
        # along BEFORE an oversize — fill stays 0 so the walk's gate
        # never trips — hence "one NONZERO member", not "one member")
        fills = {}
        for sz, sid in zip(sizes, s):
            fills.setdefault(sid, []).append(sz)
        for members in fills.values():
            assert (
                sum(members) <= SHARD_BUDGET
                or sum(1 for m in members if m > 0) == 1
            )

    check()


# --- bucket_balance ---------------------------------------------------------


@pytest.fixture(scope="module")
def seq_store(tmp_path_factory, ray_session):
    """A store with corpus-style /i/<seq> ids (bucket_balance keys on the
    seq suffix) and a deliberately skewed aspect mix."""
    rng = random.Random(20260821)
    n = 400
    w, h = [], []
    for i in range(n):
        r = rng.random()
        if r < 0.55:
            w.append(32), h.append(32)  # square — dominant bucket
        elif r < 0.8:
            w.append(48), h.append(24)  # 2:1
        else:
            w.append(24), h.append(48)  # 1:2 — smallest bucket
    tbl = conform_images(
        pa.table(
            {
                "image_id": [
                    f"http://img{i % 7}.example.com/i/{i}" for i in range(n)
                ],
                "bytes": [b"x" * rng.randrange(500, 2000) for _ in range(n)],
                "w": w,
                "h": h,
                "fmt": ["png"] * n,
                "caption": ["a plain five word caption"] * n,
                "phash": [rng.getrandbits(63) for _ in range(n)],
            }
        )
    )
    return write_images(
        tbl, str(tmp_path_factory.mktemp("balance") / "images")
    )


def test_bucket_balance_matches_reference_and_balances(seq_store):
    from spider_ray.functions.imageshard import (
        BAL_SEED,
        aspect_bucket_ids,
        q_bucket_balance,
    )
    from spider_ray.kernels.hashing import mix64_int
    from spider_ray.sources.lance_io import read_images_table

    got = q_bucket_balance(seq_store)
    tbl = read_images_table(seq_store)
    w = np.asarray(tbl["w"].to_pylist(), dtype=np.int64)
    h = np.asarray(tbl["h"].to_pylist(), dtype=np.int64)
    k = aspect_bucket_ids(w, h)
    ids = tbl["image_id"].to_pylist()
    seq = np.asarray(
        [int(s.rsplit("/", 1)[1]) for s in ids], dtype=np.uint64
    )
    u = mix64_int(seq, BAL_SEED)
    counts = np.bincount(k, minlength=5)
    c_min = counts[counts > 0].min()
    keep = np.zeros(len(ids), dtype=bool)
    for b in range(5):
        if counts[b] == 0:
            continue
        m = k == b
        if counts[b] == c_min:
            keep[m] = True
        else:
            t64 = ((1 << 64) * int(c_min)) // int(counts[b])
            keep[m] = u[m] < np.uint64(t64)
    ref = sorted(np.asarray(ids, dtype=object)[keep])
    assert got["image_id"].to_pylist() == ref
    # engine bucket labels match the assignment
    by_id = dict(zip(ids, k))
    for i in range(got.num_rows):
        assert got["bucket_id"][i].as_py() == by_id[got["image_id"][i].as_py()]
    # balance: every kept bucket lands within 30% of the smallest bucket
    kept_counts = np.bincount(k[keep], minlength=5)
    for b in range(5):
        if counts[b] > 0:
            assert kept_counts[b] <= max(1.3 * c_min, c_min + 10)
            assert kept_counts[b] >= 0.7 * c_min
