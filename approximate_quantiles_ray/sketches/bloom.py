"""Bloom membership filter.

Not present in the reference repo (SURVEY.md §2.6) — built from the
published algorithm (Bloom 1970; k independent hashes via the
Kirsch–Mitzenmacher double-hashing construction). Bit array stored as
uint8 bytes; merge = bitwise OR (exactly associative and commutative).
No false negatives; false-positive rate ~ (1 - e^{-kn/m})^k.
"""

from __future__ import annotations

import math

import numpy as np

from approximate_quantiles_ray.functions.hashing import double_hash, hash_any
from approximate_quantiles_ray.sketches.base import pack_state, register_sketch, unpack_state

from approximate_quantiles_ray.sketches.slotted import SlotState


@register_sketch
class BloomFilter(SlotState):
    name = "bloom"

    __slots__ = ("num_bits", "num_hashes", "seed", "bits", "_count")

    def __init__(self, num_bits: int = 1 << 20, num_hashes: int = 7, seed: int = 0):
        self.num_bits = int(num_bits)
        self.num_hashes = int(num_hashes)
        self.seed = int(seed)
        self.bits = np.zeros((self.num_bits + 7) // 8, dtype=np.uint8)
        self._count = 0

    @classmethod
    def for_capacity(cls, n: int, fp_rate: float = 0.01, seed: int = 0) -> "BloomFilter":
        """Size the filter for ~n distinct items at the target FP rate."""
        m = max(64, int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2))))
        k = max(1, int(round(m / n * math.log(2)))) if n > 0 else 1
        return cls(num_bits=m, num_hashes=k, seed=seed)

    @property
    def count(self) -> int:
        return self._count

    @property
    def nbytes(self) -> int:
        return self.bits.nbytes + 32

    def update(self, values) -> "BloomFilter":
        return self.update_prehashed(hash_any(values, self.seed))

    def update_prehashed(self, h: np.ndarray) -> "BloomFilter":
        """Counted pre-hashed update (values hashed once with this
        sketch's seed); the vectorized body of :meth:`update`."""
        if len(h) == 0:
            return self
        self._count += len(h)
        for i in range(self.num_hashes):
            pos = double_hash(h, i, self.num_bits)
            np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return self

    def contains(self, values) -> np.ndarray:
        """Vectorized membership test → bool array."""
        h = hash_any(values, self.seed)
        out = np.ones(len(h), dtype=bool)
        for i in range(self.num_hashes):
            pos = double_hash(h, i, self.num_bits)
            out &= (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.num_bits, other.num_hashes, other.seed) != (
            self.num_bits,
            self.num_hashes,
            self.seed,
        ):
            raise ValueError("cannot merge Bloom filters with different config")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self._count += other._count
        return self

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits).sum()) / self.num_bits

    def to_bytes(self) -> bytes:
        return pack_state(
            self.name,
            {
                "num_bits": self.num_bits,
                "num_hashes": self.num_hashes,
                "seed": self.seed,
                "bits": self.bits,
                "count": self._count,
            },
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        name, st = unpack_state(data)
        if name != cls.name:
            raise ValueError(f"expected {cls.name} state, got {name}")
        obj = cls(num_bits=st["num_bits"], num_hashes=st["num_hashes"], seed=st["seed"])
        obj.bits = np.asarray(st["bits"], dtype=np.uint8)
        obj._count = st["count"]
        return obj

    def __repr__(self) -> str:
        return (
            f"BloomFilter(bits={self.num_bits}, hashes={self.num_hashes}, "
            f"count={self._count})"
        )
