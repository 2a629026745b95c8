"""Mergeable sketches for approximate distributed aggregation.

HyperLogLog approximate distinct count (Flajolet et al. 2007, the public
HLL paper): per-block register arrays built vectorized inside
``map_batches``, merged with element-wise max — the shuffle moves one
4 KiB register array per block instead of the raw key column. This is the
"novel sketch" operator class from the build brief; the reference's
analog is its map-side combine discipline (ip_stat.cc:37-54) taken to the
approximate extreme.

Registers are frozen at p=12 (m=4096, ~1.6 % relative error). The hash is
``mix64_int`` for integer keys / ``hash64`` for strings — both frozen
kernels shared with the rest of the engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from spider_ray.kernels.hashing import hash64, mix64_int
from spider_ray.sources.tables import read_table

P = 12
M = 1 << P  # 4096 registers
_ALPHA = 0.7213 / (1.0 + 1.079 / M)
_HLL_SEED = 999


def hll_registers(hashes: np.ndarray) -> np.ndarray:
    """Build an HLL register array (uint8[M]) from 64-bit hashes.

    bucket = low P bits; rho = leading-zero count of the remaining 52-bit
    word + 1 (np.frexp gives the exact bit length — values < 2^52 are
    exactly representable in float64, so no log2 rounding hazard)."""
    reg = np.zeros(M, dtype=np.uint8)
    if len(hashes) == 0:
        return reg
    h = np.asarray(hashes, dtype=np.uint64)
    bucket = (h & np.uint64(M - 1)).astype(np.int64)
    w = (h >> np.uint64(P)).astype(np.uint64)
    # bit_length(w) via frexp exponent; w == 0 -> bit length 0
    exp = np.frexp(w.astype(np.float64))[1]
    rho = (64 - P + 1 - exp).astype(np.uint8)  # w==0 -> 53 (max)
    np.maximum.at(reg, bucket, rho)
    return reg


def hll_merge(*regs: np.ndarray) -> np.ndarray:
    out = np.zeros(M, dtype=np.uint8)
    for r in regs:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(reg: np.ndarray) -> float:
    """Bias-corrected HLL estimate with the small-range linear-counting
    correction (64-bit hash: no large-range correction needed)."""
    est = _ALPHA * M * M / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * M and zeros > 0:
        est = M * np.log(M / zeros)
    return float(est)


def hll_from_column(values, is_int: bool) -> np.ndarray:
    """Hash one Arrow column (or numpy array) and build its registers."""
    if is_int:
        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = values.to_numpy(zero_copy_only=False)
        h = mix64_int(np.asarray(values, dtype=np.int64), seed=_HLL_SEED)
    else:
        h = hash64(values)
    return hll_registers(h)


def approx_distinct(
    ds: ray.data.Dataset, column: str, is_int: bool = True
) -> float:
    """Approximate COUNT(DISTINCT column) over a Dataset: one register
    array per block (vectorized), merged driver-side (4 KiB × blocks)."""

    def partial(batch: pa.Table) -> pa.Table:
        reg = hll_from_column(batch[column], is_int)
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    tables = ray.get(parts.to_arrow_refs())
    regs = [
        np.frombuffer(b.as_py(), dtype=np.uint8)
        for t in tables
        for b in t["reg"]
    ]
    return hll_estimate(hll_merge(*regs))


def q_approx_distinct(sf_dir: str) -> pa.Table:
    """Approximate distinct users over events (rows-only query: the
    estimate is approximate by construction; its accuracy bound vs the
    exact count is asserted in tests/test_misc_ops.py)."""
    ds = read_table(sf_dir, "events", columns=["user_id"])
    est = approx_distinct(ds, "user_id", is_int=True)
    return pa.table({"n_users_approx": pa.array([int(round(est))], pa.int64())})


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()
