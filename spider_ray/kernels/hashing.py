"""Frozen 64-bit hash kernel.

The reference uses CityHash64 everywhere as THE partition / identity hash
(``crawler/api/base.cc:64-75``, ``crawler2/general_crawler/scheduler.cc:292``,
``fetcher/fetcher_thread.cc:178-180``). We freeze on ONE deterministic 64-bit
hash for url_hash / host_hash / dedup signs:

* fast path: polars ``Series.hash`` (vectorized xxhash-family, seed pinned to
  ``SEED``) — used in every hot pipeline stage;
* pure-python fallback: FNV-1a 64 (only if polars is missing, and for
  documentation of intent — never mixed with the fast path in one run).

Both the Ray engine and the single-process oracle import ``hash64`` from
here, so crawl-order / seen-set parity never depends on the hash's exact
value, only on its determinism within a run.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEED = 1_0416  # frozen; never change without regenerating goldens

try:
    import polars as pl

    _HAVE_POLARS = True
except Exception:  # pragma: no cover
    _HAVE_POLARS = False

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF


def _fnv1a64(s: str) -> int:
    h = _FNV_OFFSET ^ (SEED & _MASK64)
    for b in s.encode("utf-8", "surrogatepass"):
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


def hash64(values) -> np.ndarray:
    """64-bit hash of a string column → ``np.ndarray[uint64]``.

    Accepts a ``pyarrow.Array``/``ChunkedArray``, list of str, or numpy
    object array. Nulls hash like empty strings.
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if _HAVE_POLARS:
        if isinstance(values, pa.Array):
            s = pl.from_arrow(values)
        else:
            s = pl.Series(list(values), dtype=pl.Utf8)
        return (
            s.fill_null("")
            .hash(seed=SEED)
            .to_numpy()
            .astype(np.uint64, copy=False)
        )
    if isinstance(values, pa.Array):
        values = values.to_pylist()
    return np.array([_fnv1a64(v or "") for v in values], dtype=np.uint64)


def hash64_expr(col: str):
    """The SAME frozen hash as :func:`hash64`, as a polars EXPRESSION — for
    fully-lazy pipelines that would otherwise pay an arrow→polars→numpy
    round-trip per batch. Equality with the array form is pinned by
    tests/test_hashing.py::test_expr_matches_array."""
    import polars as pl

    return pl.col(col).fill_null("").hash(seed=SEED)


def hash64_one(value: str) -> int:
    """Scalar convenience — same function as :func:`hash64`."""
    return int(hash64([value])[0])


def derive(h: int | np.ndarray, salt: int) -> np.ndarray | int:
    """Deterministic secondary value from a hash — the engine's only source
    of "randomness" (FIXTURES.md §9: all randomness is a pure function of
    ``(seed, url_hash)``; reference used ``rand()`` at
    ``control/schedule/url_to_ip.cc:48``, ``fetcher/fetcher_thread.cc:575-577``,
    ``scheduler.cc:192-205``). splitmix64 finalizer over ``h ^ salt``."""
    scalar = np.isscalar(h) or isinstance(h, (int, np.integer))
    with np.errstate(over="ignore"):
        z = np.asarray(h, dtype=np.uint64) + np.uint64(
            (salt * 0x9E3779B97F4A7C15) & _MASK64
        )
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return int(z) if scalar else z


def mix64_int(x, seed: int = 0) -> np.ndarray:
    """SQL-expressible 64-bit mixer over an *integer* key column.

    Same role as :func:`derive` (deterministic permutation key) but every
    multiplier fits in 32 bits, so a DuckDB oracle can reproduce it exactly
    with HUGEINT modular arithmetic — used where a query needs an
    independently-checkable shuffle key. Frozen; never change the constants.
    Returns ``np.ndarray[uint64]``.
    """
    with np.errstate(over="ignore"):
        u = np.asarray(x).astype(np.uint64, copy=False) * np.uint64(
            2654435761
        ) + np.uint64(seed & _MASK64)
        u = u ^ (u >> np.uint64(29))
        u = u * np.uint64(2246822519)
        u = u ^ (u >> np.uint64(32))
    return u


def polyhash64(values) -> np.ndarray:
    """SQL-expressible 64-bit STRING hash → ``np.ndarray[uint64]``.

    Polynomial over the utf-8 bytes, ``raw = Σ d[j]·B^{L-1-j} mod 2⁶⁴``
    (B = the FNV prime — odd, so invertible mod 2⁶⁴), finished with
    :func:`mix64_int` for avalanche. Same role for *token* signatures as
    :func:`mix64_int` plays for integer keys: a DuckDB oracle reproduces
    it exactly (hex-pair byte decode + a powers-of-B recursive CTE —
    see ``oracle_sql()['simhash_pairs']``). Frozen; never change B or the
    finalizer without regenerating goldens.

    Vectorized over the whole batch via the prefix-sum identity on the
    CONCATENATED byte stream (the ``doc_fingerprint`` algebra, but with
    arbitrary-length spans): with ``Q[i] = Σ_{j<i} d[j]·B⁻ʲ``, the span
    ``[s, e)`` hashes to ``(Q[e] − Q[s])·B^{e−1}`` — position-independent,
    three O(total-bytes) uint64 passes for any number of tokens.
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        values = pa.array(list(values), pa.string())
    n = len(values)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    # zero-copy spans from the Arrow string/binary buffers (large_*
    # carries int64 offsets; plain int32 — misreading one as the other
    # would silently garble every span). Binary arrays share the exact
    # buffer layout, so they hash identically to their utf-8 string
    # twins (cssenrich.body_digest relies on this).
    off_dt = (
        np.int64
        if (
            pa.types.is_large_string(values.type)
            or pa.types.is_large_binary(values.type)
        )
        else np.int32
    )
    off = np.frombuffer(values.buffers()[1], dtype=off_dt)[
        values.offset : values.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(values.buffers()[2], dtype=np.uint8)
    m = int(off[-1])
    raw = np.zeros(n, dtype=np.uint64)
    if m > 0:
        with np.errstate(over="ignore"):
            d = data[: m].astype(np.uint64)
            binv = np.full(m, np.uint64(pow(_FNV_PRIME, -1, 1 << 64)))
            binv[0] = 1
            np.cumprod(binv, out=binv)  # B^-j
            q = np.zeros(m + 1, dtype=np.uint64)
            np.cumsum(d * binv, out=q[1:])  # Q[j+1]
            bp = np.full(m, np.uint64(_FNV_PRIME))
            bp[0] = 1
            np.cumprod(bp, out=bp)  # B^j
            s, e = off[:-1], off[1:]
            nonempty = e > s
            raw[nonempty] = (q[e[nonempty]] - q[s[nonempty]]) * bp[
                e[nonempty] - 1
            ]
    return mix64_int(raw)
