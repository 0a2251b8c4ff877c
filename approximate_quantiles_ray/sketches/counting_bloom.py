"""Counting Bloom filter — membership with DELETION support.

Not present in the reference repo (its surface is quantile digests,
SURVEY.md §2.1-2.4) — built from the published algorithm (Fan et al.
2000, "Summary Cache: A Scalable Wide-Area Web Cache Sharing Protocol",
the counting generalization of Bloom 1970). Same k-hash layout as
`sketches/bloom.py` (Kirsch–Mitzenmacher double hashing) but each slot
is a SATURATING uint8 counter instead of a bit, so items can be
REMOVED — the retraction case the plain filter cannot express (e.g.
`jobs dedup-incremental` dropping documents later deleted from the
corpus index).

Laws (tests/test_counting_bloom.py):
- no false negatives for present items — including after any sequence
  of deletes of OTHER items (a delete only decrements counters its own
  item set, and saturated counters are never decremented, the standard
  safety rule: a saturated counter may leak a stale positive but can
  never create a false negative);
- merge = elementwise saturating add (associative, commutative —
  bit-identical states across merge orders);
- ``contains`` of a deleted item returns False once its counters drop
  to zero (subject to collisions, as published).
"""

from __future__ import annotations

import math

import numpy as np

from approximate_quantiles_ray.functions.hashing import double_hash, hash_any
from approximate_quantiles_ray.sketches.base import pack_state, register_sketch, unpack_state
from approximate_quantiles_ray.sketches.slotted import SlotState

_SAT = np.uint8(255)


@register_sketch
class CountingBloomFilter(SlotState):
    name = "counting_bloom"

    __slots__ = ("num_slots", "num_hashes", "seed", "counts", "_count")

    def __init__(self, num_slots: int = 1 << 20, num_hashes: int = 7, seed: int = 0):
        self.num_slots = int(num_slots)
        self.num_hashes = int(num_hashes)
        self.seed = int(seed)
        self.counts = np.zeros(self.num_slots, dtype=np.uint8)
        self._count = 0

    @classmethod
    def for_capacity(cls, n: int, fp_rate: float = 0.01, seed: int = 0) -> "CountingBloomFilter":
        m = max(64, int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2))))
        k = max(1, int(round(m / n * math.log(2)))) if n > 0 else 1
        return cls(num_slots=m, num_hashes=k, seed=seed)

    @property
    def count(self) -> int:
        return self._count

    @property
    def nbytes(self) -> int:
        return self.counts.nbytes + 32

    # -- updates --------------------------------------------------------
    def _positions(self, h: np.ndarray, i: int) -> np.ndarray:
        return double_hash(h, i, self.num_slots)

    def update(self, values) -> "CountingBloomFilter":
        h = hash_any(values, self.seed)
        if len(h) == 0:
            return self
        self._count += len(h)
        for i in range(self.num_hashes):
            pos = self._positions(h, i)
            # saturating add: within one batch, a slot hit c times must
            # go to min(255, cur + c) — bincount the hits, clip, add
            add = np.bincount(pos, minlength=self.num_slots)
            cur = self.counts.astype(np.int64)
            self.counts = np.minimum(cur + add, 255).astype(np.uint8)
        return self

    def delete(self, values) -> "CountingBloomFilter":
        """Remove items (caller asserts they were inserted — the
        published contract). Saturated (255) counters are never
        decremented: they may keep a stale positive but can never
        produce a false negative for other items."""
        h = hash_any(values, self.seed)
        if len(h) == 0:
            return self
        self._count -= len(h)
        for i in range(self.num_hashes):
            pos = self._positions(h, i)
            dec = np.bincount(pos, minlength=self.num_slots)
            cur = self.counts.astype(np.int64)
            sat = cur == 255
            new = np.maximum(cur - dec, 0)
            new[sat] = 255
            self.counts = new.astype(np.uint8)
        return self

    def contains(self, values) -> np.ndarray:
        h = hash_any(values, self.seed)
        out = np.ones(len(h), dtype=bool)
        for i in range(self.num_hashes):
            pos = self._positions(h, i)
            out &= self.counts[pos] > 0
        return out

    # -- merge / serde ----------------------------------------------------
    def merge(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        if (other.num_slots, other.num_hashes, other.seed) != (
            self.num_slots, self.num_hashes, self.seed,
        ):
            raise ValueError("cannot merge counting blooms with different config")
        s = self.counts.astype(np.int64) + other.counts.astype(np.int64)
        self.counts = np.minimum(s, 255).astype(np.uint8)
        self._count += other._count
        return self

    def fill_ratio(self) -> float:
        return float(np.count_nonzero(self.counts)) / self.num_slots

    def to_bytes(self) -> bytes:
        return pack_state(
            self.name,
            {
                "num_slots": self.num_slots,
                "num_hashes": self.num_hashes,
                "seed": self.seed,
                "counts": self.counts,
                "count": self._count,
            },
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountingBloomFilter":
        name, st = unpack_state(data)
        if name != cls.name:
            raise ValueError(f"expected {cls.name} state, got {name}")
        obj = cls(num_slots=st["num_slots"], num_hashes=st["num_hashes"], seed=st["seed"])
        obj.counts = np.asarray(st["counts"], dtype=np.uint8)
        obj._count = st["count"]
        return obj
