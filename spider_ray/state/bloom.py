"""Vectorized Bloom filter — the other membership structure the north rule
names ("bloom/cuckoo URL-seen set"). The crawl loop's streaming seen-set
uses the cuckoo filter (state/cuckoo.py: supports deletion and serializes
compactly); the Bloom filter is the bulk-side complement: mergeable by
bitwise OR, so per-block filters built inside ``map_batches`` combine
driver-side into one array — the classic bloom-prefiltered anti-join
(reference semantics: linkbase seen-suppression J3,
selector/mr_selector_r1_reducer.cc:54-156, done with a shuffle there).

No false negatives: a ``contains``-negative is definitely unseen, so it can
bypass the exact verify; only positives (bounded by the FP rate) need the
second, exact pass.
"""

from __future__ import annotations

import math

import numpy as np

from spider_ray.kernels.hashing import derive


class BloomFilter:
    """Fixed-size Bloom filter over 64-bit key hashes.

    ``n_bits`` is rounded up to a multiple of 64. ``k`` hash probes are
    derived from the input hash with the frozen :func:`derive` mixer
    (salts 1..k), so two filters with identical parameters are mergeable
    with bitwise OR."""

    def __init__(self, n_bits: int, k: int = 4):
        self.n_bits = int(math.ceil(n_bits / 64.0)) * 64
        self.k = int(k)
        self.bits = np.zeros(self.n_bits // 64, dtype=np.uint64)

    @classmethod
    def for_capacity(cls, n_keys: int, fp_rate: float = 0.01) -> "BloomFilter":
        n_bits = max(64, int(-n_keys * math.log(fp_rate) / (math.log(2) ** 2)))
        k = max(1, round(n_bits / max(n_keys, 1) * math.log(2)))
        return cls(n_bits, k=min(k, 16))

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.uint64)
        pos = np.empty((self.k, len(h)), dtype=np.uint64)
        for i in range(self.k):
            pos[i] = derive(h, i + 1) % np.uint64(self.n_bits)
        return pos

    def add(self, hashes: np.ndarray) -> None:
        pos = self._positions(hashes).ravel()
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        np.bitwise_or.at(self.bits, word.astype(np.int64),
                         np.uint64(1) << bit)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership probe → bool array (no false negatives)."""
        pos = self._positions(hashes)
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        hit = (self.bits[word.astype(np.int64)]
               >> bit) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.n_bits, self.k) == (other.n_bits, other.k)
        self.bits |= other.bits
        return self

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, k: int) -> "BloomFilter":
        bits = np.frombuffer(data, dtype=np.uint64).copy()
        f = cls(len(bits) * 64, k=k)
        f.bits = bits
        return f

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits.view(np.uint8)).mean())


from spider_ray._serial import register_all as _register_all  # noqa: E402

_register_all()
