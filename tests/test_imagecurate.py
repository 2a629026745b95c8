"""Image-curation suite (functions/imagecurate.py): gate bitmask
semantics, union-find component correctness (incl. the root-in-map
property), best-resolution rep selection, and composed-curate parity
against an independent brute-force reference on a controlled corpus.
The SQL-oracle bit-exactness of all three queries is separately enforced
by tools/oracle_strict.py / the driver."""

import random

import pyarrow as pa
import pytest

from spider_ray.functions.imagecurate import (
    MIN_BYTES,
    MIN_CAPTION_WORDS,
    MIN_DIM,
    R_ASPECT,
    R_BYTES,
    R_CAPTION,
    R_DIM,
    _components,
    q_image_curate,
    q_image_filter,
    q_phash_clusters,
)
from spider_ray.sources.lance_io import conform_images, write_images

OK_CAPTION = "a plain five word caption"
OK_BYTES = b"x" * MIN_BYTES


def _store(tmp_path, rows):
    tbl = conform_images(
        pa.table(
            {
                "image_id": [r[0] for r in rows],
                "bytes": [r[5] for r in rows],
                "w": [r[1] for r in rows],
                "h": [r[2] for r in rows],
                "fmt": ["png"] * len(rows),
                "caption": [r[4] for r in rows],
                "phash": [r[3] for r in rows],
            }
        )
    )
    return write_images(tbl, str(tmp_path / "images"))


# (id, w, h, phash, caption, bytes) — a controlled corpus exercising every
# gate and cluster case:
#   cluster {a1,a2,a3}: identical phash; a2 has the most pixels but fails
#     the caption gate, so the CURATE rep falls to a3 (next px) while the
#     pure CLUSTER rep is a2 — distinguishing the two rep rules
#   cluster {b1,b2}: both fail gates → curate drops the whole cluster
#   cluster {t1,t2}: equal px → tie breaks to the smaller id (t1)
#   singletons: s_ok passes all gates, s_dim/s_asp/s_cap/s_byt each trip
#     exactly one gate bit
ROWS = [
    # phash values are pairwise Hamming >= 31 across DIFFERENT clusters
    # (identical within a cluster) so only the intended pairs band
    ("a1", 100, 100, 0x0000000000000000, OK_CAPTION, OK_BYTES),
    ("a2", 300, 300, 0x0000000000000000, "too short", OK_BYTES),
    ("a3", 200, 200, 0x0000000000000000, OK_CAPTION, OK_BYTES),
    ("b1", 10, 10, 0x7FFFFFFFFFFFFFFF, OK_CAPTION, OK_BYTES),
    ("b2", 12, 12, 0x7FFFFFFFFFFFFFFF, OK_CAPTION, OK_BYTES),
    ("t1", 50, 60, 0x00000000FFFFFFFF, OK_CAPTION, OK_BYTES),
    ("t2", 60, 50, 0x00000000FFFFFFFF, OK_CAPTION, OK_BYTES),
    ("s_ok", 64, 64, 0x0F0F0F0F0F0F0F0F, OK_CAPTION, OK_BYTES),
    ("s_dim", 30, 20, 0x3333333333333333, OK_CAPTION, OK_BYTES),
    ("s_asp", 90, 30, 0x5555555555555555, OK_CAPTION, OK_BYTES),
    ("s_cap", 64, 64, 0x00FF00FF00FF00FF, "four words only here", OK_BYTES),
    ("s_byt", 64, 64, 0x6666666666666666, OK_CAPTION, b"y" * (MIN_BYTES - 1)),
]


@pytest.fixture(scope="module")
def store(tmp_path_factory, ray_session):
    return _store(tmp_path_factory.mktemp("imgcurate"), ROWS)


def test_gate_bitmask(store):
    t = q_image_filter(store)
    m = dict(zip(t["image_id"].to_pylist(), t["reject_mask"].to_pylist()))
    kept = dict(zip(t["image_id"].to_pylist(), t["kept"].to_pylist()))
    assert m["s_ok"] == 0 and kept["s_ok"] == 1
    assert m["s_dim"] == R_DIM
    assert m["s_asp"] == R_ASPECT
    assert m["s_cap"] == R_CAPTION
    assert m["s_byt"] == R_BYTES
    # b1 is both too small AND (10 <= 2*10) not elongated -> dim only
    assert m["b1"] == R_DIM
    assert m["a2"] == R_CAPTION
    assert all(k == (v == 0) for k, v in zip(kept.values(), m.values()))
    # gate constants really are the module constants (guards drift
    # between engine and the SQL oracle's inlined literals)
    assert (MIN_DIM, MIN_CAPTION_WORDS, MIN_BYTES) == (24, 5, 1200)


def test_components_include_roots_and_match_bruteforce():
    rng = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(40)]
    edges = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(45)}
    )
    pairs = pa.table(
        {
            "a_id": [a for a, _ in edges],
            "b_id": [b for _, b in edges],
        }
    )
    got = _components(pairs)
    # brute force: repeated relabel to the min neighbour
    lab = {n: n for n in nodes}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            m = min(lab[a], lab[b])
            for x in (a, b):
                if lab[x] != m:
                    lab[x] = m
                    changed = True
    touched = {x for e in edges for x in e}
    assert set(got) == touched  # every pair-graph node, ROOTS INCLUDED
    assert got == {n: lab[n] for n in touched}


def test_phash_clusters_best_px_rep(store):
    t = q_phash_clusters(store)
    rep = dict(zip(t["image_id"].to_pylist(), t["cluster_rep"].to_pylist()))
    is_rep = dict(zip(t["image_id"].to_pylist(), t["is_rep"].to_pylist()))
    # cluster rep rule ignores gates: a2 (300x300) wins its cluster even
    # though its caption fails — and the ROOT member a1 is labeled with
    # it, not with itself (the root-in-map regression)
    assert rep["a1"] == rep["a2"] == rep["a3"] == "a2"
    assert rep["b1"] == rep["b2"] == "b2"  # 12x12 > 10x10
    assert rep["t1"] == rep["t2"] == "t1"  # equal px -> smaller id
    assert rep["s_ok"] == "s_ok" and is_rep["s_ok"] == 1
    assert [i for i, r in is_rep.items() if r] == sorted(set(rep.values()))


def test_image_curate_composed(store):
    t = q_image_curate(store)
    kept = t["image_id"].to_pylist()
    # a-cluster: a2 (best px) fails caption -> rep among PASSING is a3;
    # b-cluster all fail -> nothing; tie cluster -> t1; passing singleton
    # s_ok survives; every gate-failing singleton is gone
    assert kept == ["a3", "s_ok", "t1"]
    assert t.column_names == ["image_id", "w", "h", "fmt", "caption"]
    assert t["w"].to_pylist() == [200, 64, 50]


def test_image_decontaminate_controlled(tmp_path_factory, ray_session):
    """Controlled phash layout with seq-carrying ids: one train image a
    re-encode (Hamming 3) of a benchmark image, one exactly at tau, one
    just past tau, benchmark images never self-flag."""
    from spider_ray.functions.imagecurate import (
        IMG_DECON_MOD,
        IMG_DECON_TAU,
        q_image_decontaminate,
    )

    base = 0x0123456789ABCDEF
    far = 0x7EDCBA9876543210  # Hamming(base, far) >> tau

    def flip(v, k):  # flip the k lowest bits
        return v ^ ((1 << k) - 1)

    rows = []
    for i in range(3 * IMG_DECON_MOD):
        if i % IMG_DECON_MOD == 0:
            ph = base if i == 0 else far  # benchmarks
        elif i == 1:
            ph = flip(base, 3)  # near bench 0 -> flagged, dist 3
        elif i == 2:
            ph = flip(base, IMG_DECON_TAU)  # exactly tau -> flagged
        elif i == 3:
            ph = flip(base, IMG_DECON_TAU + 1)  # past tau -> clean
        else:
            ph = 0x5555555555550000 | i  # far from both benches
        rows.append((f"img{i:05d}", ph))
    tbl = conform_images(
        pa.table(
            {
                "image_id": [r[0] for r in rows],
                "bytes": [OK_BYTES] * len(rows),
                "w": [64] * len(rows),
                "h": [64] * len(rows),
                "fmt": ["png"] * len(rows),
                "caption": [OK_CAPTION] * len(rows),
                "phash": [r[1] for r in rows],
            }
        )
    )
    store = write_images(
        tbl, str(tmp_path_factory.mktemp("decon") / "images")
    )
    got = {
        r["image_id"]: r for r in q_image_decontaminate(store).to_pylist()
    }
    assert set(got) == {"img00001", "img00002"}
    assert got["img00001"]["min_dist"] == 3
    assert got["img00001"]["n_matches"] == 1
    assert got["img00002"]["min_dist"] == IMG_DECON_TAU


def test_crawl_delta_accounting(ray_session):
    """added = re-hosted survivors; removed = drops + re-host old ids;
    changed/same partition the stable ids; totals reconcile with the
    frozen perturbation mods."""
    import polars as pl

    from spider_ray.functions.imagecurate import (
        DELTA_DROP_MOD,
        DELTA_EDIT_MOD,
        DELTA_MOVE_MOD,
        q_crawl_delta,
    )
    from spider_ray.sources.lance_io import resolve_images
    from spider_ray.sources.webgen import generate
    import os

    corpus = "/tmp/spider_ray_delta_test_corpus"
    if not os.path.exists(os.path.join(corpus, "images.parquet")):
        generate(corpus, n_pages=400, n_hosts=8, seed=11)
    store = resolve_images(os.path.join(corpus, "images"))
    out = pl.from_arrow(q_crawl_delta(store))
    tot = dict(
        out.group_by("status").agg(pl.col("n").sum()).iter_rows()
    )
    import pyarrow.parquet as pq

    seqs = (
        pl.from_arrow(
            pq.read_table(
                os.path.join(corpus, "images.parquet"),
                columns=["image_id"],
            )
        )["image_id"]
        .str.extract(r"/i/(\d+)$", 1)
        .cast(pl.Int64)
        .to_list()
    )
    dropped = {s for s in seqs if s % DELTA_DROP_MOD == 0}
    moved = {
        s for s in seqs
        if s % DELTA_MOVE_MOD == 0 and s not in dropped
    }
    stable = [s for s in seqs if s not in dropped and s not in moved]
    changed = sum(1 for s in stable if s % DELTA_EDIT_MOD == 0)
    assert tot.get("added", 0) == len(moved)
    assert tot.get("removed", 0) == len(dropped) + len(moved)
    assert tot.get("changed", 0) == changed
    assert tot.get("same", 0) == len(stable) - changed


def test_recrawl_schedule_rules(ray_session):
    """Adaptive revisit rules: removed URLs leave the plan; added rows
    enter at REVISIT_BASE; changed rows halve prev (floored at
    REVISIT_MIN); same rows double prev (capped at REVISIT_MAX) — with
    both clamps actually exercised by the planted prev workload — and
    priority bands follow the frozen thresholds."""
    import os

    import polars as pl

    from spider_ray.functions.imagecurate import (
        REVISIT_BASE,
        REVISIT_MAX,
        REVISIT_MIN,
        REVISIT_PREV_MOD,
        q_crawl_delta,
        q_recrawl_schedule,
    )
    from spider_ray.sources.lance_io import resolve_images
    from spider_ray.sources.webgen import generate

    corpus = "/tmp/spider_ray_delta_test_corpus"
    if not os.path.exists(os.path.join(corpus, "images.parquet")):
        generate(corpus, n_pages=400, n_hosts=8, seed=11)
    store = resolve_images(os.path.join(corpus, "images"))
    out = pl.from_arrow(q_recrawl_schedule(store))

    assert set(out["status"].unique()) <= {"added", "changed", "same"}
    # row count reconciles with the delta report's live statuses
    delta = pl.from_arrow(q_crawl_delta(store))
    live = (
        delta.filter(pl.col("status") != "removed")["n"].sum()
    )
    assert out.height == live

    seq = out["image_id"].str.extract(r"/i/(\d+)", 1).cast(pl.Int64)
    prev = REVISIT_MIN * (2 ** (seq % REVISIT_PREV_MOD)).cast(pl.Int64)
    expect = (
        pl.when(out["status"] == "added")
        .then(pl.lit(REVISIT_BASE, dtype=pl.Int64))
        .when(out["status"] == "changed")
        .then(
            pl.max_horizontal(
                pl.lit(REVISIT_MIN, dtype=pl.Int64), prev // 2
            )
        )
        .otherwise(
            pl.min_horizontal(pl.lit(REVISIT_MAX, dtype=pl.Int64), prev * 2)
        )
    )
    df = pl.DataFrame({"got": out["interval_s"]}).with_columns(
        want=expect
    )
    assert (df["got"] == df["want"]).all()
    # both clamps exercised
    assert (out["interval_s"] == REVISIT_MIN).any() or (
        out.filter(pl.col("status") == "changed")["interval_s"].min()
        == REVISIT_MIN
    )
    assert out["interval_s"].max() == REVISIT_MAX
    # priority bands
    iv = out["interval_s"]
    want_p = (
        pl.when(iv <= 4 * REVISIT_MIN).then(0)
        .when(iv <= REVISIT_BASE).then(1)
        .otherwise(2)
    )
    dfp = pl.DataFrame({"p": out["priority"]}).with_columns(w=want_p)
    assert (dfp["p"] == dfp["w"].cast(pl.Int32)).all()


def test_format_sniff_integrity(ray_session):
    """Magic-byte sniff: exactly the planted seq%17 rows quarantine as
    unknown/ok=0; every clean row's sniffed format matches the declared
    fmt and the container-header w/h equal the table's columns (the
    from-scratch encoders write real headers)."""
    import os

    import polars as pl

    from spider_ray.functions.imagecurate import (
        FMT_CORRUPT_MOD,
        q_format_sniff,
    )
    from spider_ray.sources.lance_io import resolve_images
    from spider_ray.sources.webgen import generate

    corpus = "/tmp/spider_ray_delta_test_corpus"
    if not os.path.exists(os.path.join(corpus, "images.parquet")):
        generate(corpus, n_pages=400, n_hosts=8, seed=11)
    store = resolve_images(os.path.join(corpus, "images"))
    out = pl.from_arrow(q_format_sniff(store))
    seq = out["image_id"].str.extract(r"/i/(\d+)$", 1).cast(pl.Int64)
    corrupt = (seq % FMT_CORRUPT_MOD) == 0
    bad = out.filter(corrupt)
    assert (bad["sniffed"] == "unknown").all()
    assert (bad["ok"] == 0).all()
    assert bad["hdr_w"].is_null().all()
    clean = out.filter(~corrupt)
    assert (clean["ok"] == 1).all()
    assert (clean["sniffed"] == clean["fmt"]).all()
    # header geometry is REAL (parsed from the encoded container) — the
    # ok flag above already asserts it equals the declared columns
    assert clean["hdr_w"].null_count() == 0
    assert bad.height == seq.filter(corrupt).len()
    assert bad.height > 0
