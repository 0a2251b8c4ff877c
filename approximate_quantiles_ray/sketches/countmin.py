"""Count-min frequency sketch.

Not present in the reference repo (SURVEY.md §2.6) — built from the
published algorithm (Cormode & Muthukrishnan 2005, "An improved data
stream summary: the count-min sketch and its applications"). depth
seeded pairwise-independent rows via double hashing; point query =
min over rows; merge = elementwise add (exactly associative and
commutative). int64 counters so 10^12-scale counts don't overflow.
"""

from __future__ import annotations

import numpy as np

from approximate_quantiles_ray.functions.hashing import double_hash, hash_any
from approximate_quantiles_ray.sketches.base import pack_state, register_sketch, unpack_state

from approximate_quantiles_ray.sketches.slotted import SlotState


@register_sketch
class CountMinSketch(SlotState):
    """Count-min sketch: width buckets x depth rows of int64 counters."""

    name = "countmin"

    __slots__ = ("width", "depth", "seed", "table", "_count", "conservative")

    def __init__(self, width: int = 8192, depth: int = 5, seed: int = 0,
                 conservative: bool = False):
        """``conservative=True`` enables conservative update (Estan &
        Varghese 2002): only counters currently equal to the item's min
        estimate are incremented — tighter (still never-underestimate)
        point queries. Slightly order-sensitive; merge stays elementwise
        add and stays a valid upper bound."""
        self.width = int(width)
        self.depth = int(depth)
        self.seed = int(seed)
        self.conservative = bool(conservative)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self._count = 0

    @property
    def count(self) -> int:
        return self._count

    @property
    def nbytes(self) -> int:
        return self.table.nbytes + 32

    def update(self, values, counts: np.ndarray | None = None) -> "CountMinSketch":
        """Add a batch of values with optional per-value counts.

        Pre-aggregates the batch with np.unique on the hash before
        touching the table, so hot keys cost one bucket update per batch.
        """
        return self.update_prehashed(hash_any(values, self.seed), counts)

    def update_prehashed(self, h: np.ndarray,
                         counts: np.ndarray | None = None) -> "CountMinSketch":
        """Counted pre-hashed update (values hashed once with this
        sketch's seed); the vectorized body of :meth:`update`."""
        if len(h) == 0:
            return self
        if counts is None:
            uh, uc = np.unique(h, return_counts=True)
            self._count += len(h)
        else:
            counts = np.asarray(counts, dtype=np.int64)
            order = np.argsort(h, kind="stable")
            hs, cs = h[order], counts[order]
            boundaries = np.flatnonzero(np.diff(hs)) + 1
            starts = np.concatenate([[0], boundaries])
            uh = hs[starts]
            uc = np.add.reduceat(cs, starts)
            self._count += int(counts.sum())
        if self.conservative:
            idxs = np.stack([double_hash(uh, i, self.width) for i in range(self.depth)])
            cur = np.stack([self.table[i][idxs[i]] for i in range(self.depth)])
            new = cur.min(axis=0) + uc  # raise each counter to at most min+count
            for i in range(self.depth):
                np.maximum.at(self.table[i], idxs[i], new)
        else:
            for i in range(self.depth):
                idx = double_hash(uh, i, self.width)
                np.add.at(self.table[i], idx, uc)
        return self

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.width, other.depth, other.seed) != (self.width, self.depth, self.seed):
            raise ValueError("cannot merge count-min sketches with different config")
        self.table += other.table
        self._count += other._count
        return self

    def estimate(self, values) -> np.ndarray:
        """Point-frequency estimates (never underestimates)."""
        h = hash_any(values, self.seed)
        est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
        for i in range(self.depth):
            idx = double_hash(h, i, self.width)
            np.minimum(est, self.table[i][idx], out=est)
        return est

    def to_bytes(self) -> bytes:
        return pack_state(
            self.name,
            {
                "width": self.width,
                "depth": self.depth,
                "seed": self.seed,
                "table": self.table,
                "count": self._count,
                "conservative": self.conservative,
            },
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinSketch":
        name, st = unpack_state(data)
        if name != cls.name:
            raise ValueError(f"expected {cls.name} state, got {name}")
        obj = cls(width=st["width"], depth=st["depth"], seed=st["seed"],
                  conservative=st.get("conservative", False))
        obj.table = np.asarray(st["table"], dtype=np.int64)
        obj._count = st["count"]
        return obj

    def __repr__(self) -> str:
        return f"CountMinSketch(width={self.width}, depth={self.depth}, count={self._count})"
