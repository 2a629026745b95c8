import numpy as np
import pyarrow as pa

from spider_ray.kernels.hashing import derive, hash64, hash64_one


def test_hash64_deterministic():
    a = hash64(["http://a.com/", "http://b.com/", "http://a.com/"])
    assert a.dtype == np.uint64
    assert a[0] == a[2]
    assert a[0] != a[1]
    b = hash64(pa.array(["http://a.com/", "http://b.com/", "http://a.com/"]))
    assert (a == b).all()


def test_hash64_one():
    assert hash64_one("x") == hash64(["x"])[0]


def test_null_hashes_like_empty():
    a = hash64(pa.array(["", None]))
    assert a[0] == a[1]


def test_derive_scalar_and_vector():
    h = hash64(["a", "b", "c"])
    d = derive(h, 7)
    assert d.dtype == np.uint64
    assert derive(int(h[0]), 7) == int(d[0])
    # different salt → different stream
    assert (derive(h, 8) != d).any()


def test_expr_matches_array():
    """hash64_expr (lazy polars form) must be bit-identical to hash64 (the
    array kernel) — the frontier bench uses the expression, production
    stages use the array; parity between them is frozen."""
    import numpy as np
    import polars as pl

    from spider_ray.kernels.hashing import hash64, hash64_expr

    vals = ["http://a.example.com/x", "", "abc", None, "日本語", "x" * 5000]
    df = pl.DataFrame({"u": pl.Series(vals, dtype=pl.Utf8)})
    via_expr = df.select(hash64_expr("u"))["u"].to_numpy().astype(np.uint64)
    via_arr = hash64(df["u"].to_arrow())
    assert (via_expr == via_arr).all()


def test_popcount_u64_matches_python_bitcount():
    import numpy as np

    from spider_ray.kernels.tokens import popcount_u64

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 2**63, size=500, dtype=np.int64).view(np.uint64)
    vals[:4] = [0, 1, 0xFFFFFFFFFFFFFFFF, 0x8000000000000000]
    got = popcount_u64(vals)
    assert got.dtype == np.int64
    assert got.tolist() == [bin(int(v)).count("1") for v in vals]
    # shape-agnostic: 2-D matrix form used by image_decontaminate
    m = vals[:12].reshape(3, 4)
    assert popcount_u64(m).shape == (3, 4)
    assert popcount_u64(m).ravel().tolist() == got[:12].tolist()


def test_polyhash64_binary_equals_string_and_empty_is_zero():
    """cssenrich.body_digest hashes BINARY arrays directly — pinned
    equal to the utf-8 string twin (same buffer layout), empty → 0."""
    import numpy as np
    import pyarrow as pa

    from spider_ray.kernels.hashing import polyhash64

    strs = ["hello", "", "a", "body { margin: 3px; }", "\x00\xff bytes?"]
    sb = pa.array(strs, pa.string())
    bb = pa.array([s.encode("utf-8") for s in strs], pa.binary())
    assert polyhash64(sb).tolist() == polyhash64(bb).tolist()
    assert int(polyhash64(pa.array([b""], pa.binary()))[0]) == 0
    # large_binary offsets are int64 — layout detection must not
    # misread them as int32
    lb = pa.array(
        [s.encode("utf-8") for s in strs], pa.large_binary()
    )
    assert polyhash64(lb).tolist() == polyhash64(sb).tolist()
