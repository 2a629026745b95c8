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
