"""Misra–Gries mergeable heavy-hitters summary.

Not present in the reference repo (SURVEY.md §2.6 extension surface) —
built from the published algorithms: Misra & Gries 1982 ("Finding
repeated elements") and the mergeability proof of Agarwal, Cormode,
Huang, Phillips, Wei, Yi 2012 ("Mergeable Summaries", PODS — §3.1:
merging two MG_k summaries by adding counters and subtracting the
(k+1)-th largest preserves the n/(k+1) error bound).

Why it exists next to count-min (`sketches/countmin.py`): CMS gives a
probabilistic OVER-estimate with an ε·n additive bound that holds only
w.p. 1-δ; MG gives a deterministic sandwich — for every key,

    est ≤ true ≤ est + err_bound,

where ``err_bound`` is the summary's accumulated decrement (≤ n/(k+1)).
Every item with true frequency > n/(k+1) is guaranteed present. That
determinism is what a data-quality gate wants ("tool X appears in at
least N turns — certainly").

Batch update is vectorized: Arrow ``value_counts`` per batch, one dict
merge per batch (O(#distinct-in-batch), not O(rows)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from approximate_quantiles_ray.sketches.base import pack_state, register_sketch, unpack_state
from approximate_quantiles_ray.sketches.slotted import SlotState


@register_sketch
class MisraGries(SlotState):
    """MG_k summary: ≤ k counters, deterministic n/(k+1) undercount."""

    name = "misra_gries"

    __slots__ = ("k", "counters", "decrement", "_count")

    def __init__(self, k: int = 64):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.counters: dict = {}
        self.decrement = 0  # total subtracted per surviving key (error bound)
        self._count = 0

    # -- protocol -----------------------------------------------------
    @property
    def count(self) -> int:
        return self._count

    @property
    def nbytes(self) -> int:
        return 64 * len(self.counters) + 32  # dict entries dominate

    # -- updates ------------------------------------------------------
    def update(self, values) -> "MisraGries":
        """Add a batch (Arrow array / ChunkedArray / numpy / list)."""
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if isinstance(values, pa.Array):
            if values.null_count:
                values = values.drop_null()
            vc = pc.value_counts(values)
            keys = vc.field("values").to_pylist()
            counts = vc.field("counts").to_numpy(zero_copy_only=False)
        else:
            arr = np.asarray(values)
            keys_np, counts = np.unique(arr, return_counts=True)
            keys = keys_np.tolist()
        return self.add_counts(keys, counts)

    def add_counts(self, keys, counts) -> "MisraGries":
        c = self.counters
        total = 0
        for key, n in zip(keys, counts):
            n = int(n)
            total += n
            c[key] = c.get(key, 0) + n
        self._count += total
        self._shrink()
        return self

    def _shrink(self) -> None:
        """Reduce to ≤ k counters by subtracting the (k+1)-th largest
        value from all (the batched form of MG's decrement-all step)."""
        c = self.counters
        if len(c) <= self.k:
            return
        vals = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        # (k+1)-th largest = the largest value that must reach zero
        cut = int(np.partition(vals, len(vals) - self.k - 1)[len(vals) - self.k - 1])
        self.counters = {key: v - cut for key, v in c.items() if v > cut}
        self.decrement += cut

    def merge(self, other: "MisraGries") -> "MisraGries":
        if other.k != self.k:
            raise ValueError("cannot merge MG summaries with different k")
        c = self.counters
        for key, v in other.counters.items():
            c[key] = c.get(key, 0) + v
        self._count += other._count
        self.decrement += other.decrement
        self._shrink()
        return self

    # -- queries ------------------------------------------------------
    @property
    def err_bound(self) -> int:
        """Deterministic undercount bound: for every key,
        estimate(key) ≤ true(key) ≤ estimate(key) + err_bound."""
        return self.decrement

    def estimate(self, key) -> int:
        return self.counters.get(key, 0)

    def top(self, n: int | None = None) -> list[tuple]:
        """(key, est, upper) descending by est; ties by key ascending."""
        items = sorted(self.counters.items(), key=lambda kv: (-kv[1], str(kv[0])))
        if n is not None:
            items = items[:n]
        return [(key, v, v + self.decrement) for key, v in items]

    def to_bytes(self) -> bytes:
        return pack_state(
            self.name,
            {
                "k": self.k,
                "counters": self.counters,
                "decrement": self.decrement,
                "count": self._count,
            },
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "MisraGries":
        name, st = unpack_state(data)
        if name != cls.name:
            raise ValueError(f"expected {cls.name} state, got {name}")
        obj = cls(k=st["k"])
        obj.counters = dict(st["counters"])
        obj.decrement = st["decrement"]
        obj._count = st["count"]
        return obj

    def __repr__(self) -> str:
        return (
            f"MisraGries(k={self.k}, counters={len(self.counters)}, "
            f"err_bound={self.decrement}, count={self._count})"
        )
