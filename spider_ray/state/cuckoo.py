"""Cuckoo filter — the URL-seen membership structure the north rule
prescribes (reference contract it replaces: G3 LRU dedup cache
``job_manager.cc:319-360``, G2 redis sign store ``scheduler.cc:289-314``,
G1 linkbase anti-join).

Bucketed 4-way, 16-bit fingerprints, standard partial-key cuckoo hashing
(Fan et al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT'14 —
public paper): bucket2 = bucket1 XOR hash(fingerprint). ~2.1 B/key at 95%
load; 10^10 keys ≈ 21 GB aggregate → sharded by url_hash range across
frontier-shard actors, each shard serializable for checkpoints.

Deletions are supported (needed for revisit-interval expiry). False-positive
rate ≈ 2·buckets_per_item/2^16 ≈ 1.2e-4 at 4-way; the engine keeps an exact
per-shard seen dict alongside at test scale to audit FP behavior
(SURVEY §7.4.3).
"""

from __future__ import annotations

import numpy as np

_FP_MASK = np.uint64(0xFFFF)
_EMPTY = np.uint16(0)


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 7):
        # buckets = next power of two ≥ capacity/4 (4 slots per bucket)
        nb = 1
        while nb * 4 < capacity:
            nb *= 2
        self.num_buckets = nb
        self._mask = np.uint64(nb - 1)
        self.table = np.zeros((nb, 4), dtype=np.uint16)
        self.size = 0
        self.max_kicks = 500
        self._seed = np.uint64(seed)

    # fingerprint ∈ [1, 65535] (0 = empty slot)
    def _fp(self, h: np.uint64) -> np.uint16:
        fp = np.uint16((h >> np.uint64(48)) & _FP_MASK)
        return fp if fp != 0 else np.uint16(1)

    def _b1(self, h: np.uint64) -> int:
        return int(h & self._mask)

    def _b2(self, b1: int, fp: np.uint16) -> int:
        with np.errstate(over="ignore"):
            fph = (np.uint64(fp) * np.uint64(0x5BD1E9955BD1E995)) ^ self._seed
        return int((np.uint64(b1) ^ fph) & self._mask)

    def contains(self, h: int) -> bool:
        h = np.uint64(h)
        fp = self._fp(h)
        b1 = self._b1(h)
        if (self.table[b1] == fp).any():
            return True
        b2 = self._b2(b1, fp)
        return bool((self.table[b2] == fp).any())

    def add(self, h: int) -> bool:
        """Insert; returns False if the filter is full (kick-out failed)."""
        h = np.uint64(h)
        fp = self._fp(h)
        b1 = self._b1(h)
        b2 = self._b2(b1, fp)
        for b in (b1, b2):
            row = self.table[b]
            empty = np.nonzero(row == _EMPTY)[0]
            if empty.size:
                row[empty[0]] = fp
                self.size += 1
                return True
        # kick-out loop; victim slot chosen deterministically from the hash
        b = b1 if (int(h) >> 32) & 1 else b2
        cur = fp
        x = int(h)
        for kick in range(self.max_kicks):
            x = (x * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
            slot = x & 3
            cur, self.table[b][slot] = self.table[b][slot], cur
            b = self._b2(b, cur)
            row = self.table[b]
            empty = np.nonzero(row == _EMPTY)[0]
            if empty.size:
                row[empty[0]] = cur
                self.size += 1
                return True
        return False

    def remove(self, h: int) -> bool:
        h = np.uint64(h)
        fp = self._fp(h)
        b1 = self._b1(h)
        for b in (b1, self._b2(b1, fp)):
            row = self.table[b]
            hit = np.nonzero(row == fp)[0]
            if hit.size:
                row[hit[0]] = _EMPTY
                self.size -= 1
                return True
        return False

    def contains_many(self, hs: np.ndarray) -> np.ndarray:
        """Vectorized membership for a uint64 array."""
        hs = hs.astype(np.uint64, copy=False)
        fps = ((hs >> np.uint64(48)) & _FP_MASK).astype(np.uint16)
        fps[fps == 0] = 1
        b1 = (hs & self._mask).astype(np.int64)
        with np.errstate(over="ignore"):
            fph = (fps.astype(np.uint64) * np.uint64(0x5BD1E9955BD1E995)) ^ self._seed
        b2 = ((b1.astype(np.uint64) ^ fph) & self._mask).astype(np.int64)
        t1 = self.table[b1]  # (n, 4)
        t2 = self.table[b2]
        f = fps[:, None]
        return ((t1 == f) | (t2 == f)).any(axis=1)

    # --- checkpoint -----------------------------------------------------------

    def state_dict(self) -> dict:
        return {
            "table": self.table.copy(),
            "size": self.size,
            "seed": int(self._seed),
        }

    @classmethod
    def from_state_dict(cls, d: dict) -> "CuckooFilter":
        obj = cls.__new__(cls)
        obj.table = d["table"].copy()
        obj.num_buckets = obj.table.shape[0]
        obj._mask = np.uint64(obj.num_buckets - 1)
        obj.size = d["size"]
        obj.max_kicks = 500
        obj._seed = np.uint64(d["seed"])
        return obj
