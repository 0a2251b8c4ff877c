"""KLL-family relative-compactor quantile sketch (RCSketch2 semantics).

Follows the reference's lazy-growth relative compactor
(/root/reference/src/rc_sketch/rc_sketch2.rs) — the KLL/ReqSketch-style
variant with no a-priori input-length bound:

- levels grow lazily (``grow``, rc_sketch2.rs:241-246); an item stored at
  level h represents 2**h original items;
- per-level adaptive sections: when ``compaction_counter >=
  2**(sections-1)`` the section count doubles and the section size
  shrinks by sqrt(2) (``update_sections``, rc_sketch2.rs:116-121);
- per-level capacity ``2 * sections * trunc(section_size)``
  (rc_sketch2.rs:109-111);
- compaction boundary ``len/2 + (sections - trailing_ones(counter) - 1) *
  trunc(section_size)`` (rc_sketch2.rs:127-136); the buffer is sorted,
  everything above the boundary is halved by keeping the odd- or
  even-indexed survivors (each surviving item's implicit weight doubles)
  and promoting them one level up (rc_sketch2.rs:253-285);
- rank estimate = sum over levels of 2**h * #{x <= v}
  (rc_sketch2.rs:289-296); quantile = walk of the sorted weighted values
  (rc_sketch2.rs:66-76).

Two deliberate deviations from the reference:

1. The compaction coin (odd vs even survivors) is a **seeded
   counter-keyed hash** instead of ``thread_rng``
   (rc_sketch2.rs:265-268) so that sketches are deterministic under Ray
   task retries and merge(a, b) == merge(b, a) bit-for-bit — required
   for the merge-permutation and checkpoint/resume tests.
2. ``merge`` is native (concat per-level buffers, take the
   more-compacted section parameters, re-compress) — the reference never
   implements ``MergableDigest`` (/root/reference/src/traits.rs:43-52).

The fixed-size RCSketch (rc_sketch.rs) is deliberately not ported: its
up-front ``input_length`` requirement is hostile to streaming
(SURVEY.md §7 watch-list); RCSketch2 has the same query semantics.
"""

from __future__ import annotations

import math

import numpy as np

from approximate_quantiles_ray.sketches.base import pack_state, register_sketch, unpack_state

from approximate_quantiles_ray.sketches.slotted import SlotState

_GOLDEN = 0x9E3779B97F4A7C15
_MASK64 = (1 << 64) - 1


def _splitmix64_scalar(x: int) -> int:
    x = (x + _GOLDEN) & _MASK64
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK64
    return (z ^ (z >> 31)) & _MASK64


def _trailing_ones(x: int) -> int:
    n = 0
    while x & 1:
        n += 1
        x >>= 1
    return n


@register_sketch
class KLL(SlotState):
    """Mergeable relative-compactor quantile sketch over float64 values."""

    name = "kll"

    __slots__ = (
        "k",
        "seed",
        "_levels",
        "_level_lens",
        "sketch_size",
        "_count",
        "compaction_counters",
        "number_of_sections",
        "section_sizes",
        "_sorted_cache",
        "compaction",
        "fast",
        "dtype",
    )

    def __init__(self, k: int = 200, seed: int = 0, compaction: str = "default",
                 fast: bool = False, dtype: str = "f8"):
        if compaction not in ("default", "average"):
            raise ValueError("compaction must be 'default' or 'average'")
        # storage precision for level buffers, mirroring the reference's
        # genericity over F: Float (src/traits.rs:1-6; f32 instantiation
        # src/rc_sketch/rc_sketch.rs:412) — f4 halves sketch state
        self.dtype = np.dtype(dtype)
        if self.dtype not in (np.dtype("f4"), np.dtype("f8")):
            raise ValueError("dtype must be 'f4' or 'f8'")
        # fast=True always compacts the upper half (rc_sketch.rs:130-136
        # get_compact_index_fast): cheaper, more error
        self.fast = bool(fast)
        self.k = int(k)
        self.seed = int(seed)
        self.compaction = compaction
        self._levels: list[list[np.ndarray]] = []
        self._level_lens: list[int] = []
        self.sketch_size = 0
        self._count = 0
        self.compaction_counters: list[int] = []
        self.number_of_sections: list[int] = []
        self.section_sizes: list[float] = []
        self._sorted_cache: list[np.ndarray] | None = None
        self._grow()

    # ------------------------------------------------------------------ admin

    def _grow(self) -> None:
        self.compaction_counters.append(0)
        self.number_of_sections.append(3)
        self.section_sizes.append(float(self.k))
        self._levels.append([])
        self._level_lens.append(0)

    def _calc_buffer_size(self, h: int) -> int:
        return 2 * self.number_of_sections[h] * int(self.section_sizes[h])

    def _sketch_capacity(self) -> int:
        return sum(self._calc_buffer_size(h) for h in range(len(self._levels)))

    def _update_sections(self, h: int) -> None:
        if self.compaction_counters[h] >= 2 ** (self.number_of_sections[h] - 1):
            self.number_of_sections[h] *= 2
            self.section_sizes[h] /= math.sqrt(2.0)

    def _level_array(self, h: int) -> np.ndarray:
        chunks = self._levels[h]
        if len(chunks) == 1:
            return chunks[0]
        if not chunks:
            return np.empty(0, dtype=self.dtype)
        merged = np.concatenate(chunks)
        self._levels[h] = [merged]
        return merged

    # ------------------------------------------------------------------ ingest

    @property
    def count(self) -> int:
        return self._count

    @property
    def nbytes(self) -> int:
        return sum(ll * self.dtype.itemsize for ll in self._level_lens) + 64

    def update(self, values: np.ndarray) -> "KLL":
        values = np.asarray(values, dtype=self.dtype).ravel()
        if len(values) == 0:
            return self
        self._sorted_cache = None
        self._count += len(values)
        i = 0
        n = len(values)
        while i < n:
            cap = self._sketch_capacity()
            room = cap - self.sketch_size
            if room > 0:
                end = min(i + room, n)
                self._levels[0].append(values[i:end].copy())
                self._level_lens[0] += end - i
                self.sketch_size += end - i
                i = end
            if self.sketch_size >= self._sketch_capacity():
                self._compress()
        return self

    def _coin(self, h: int, counter: int) -> int:
        return _splitmix64_scalar(self.seed ^ (h * _GOLDEN) ^ counter) & 1

    def _get_compact_index(self, h: int) -> int:
        if self.fast:
            return self._level_lens[h] // 2
        num_compaction_sections = max(
            0,
            self.number_of_sections[h] - _trailing_ones(self.compaction_counters[h]) - 1,
        )
        compact_index = self._level_lens[h] // 2 + num_compaction_sections * int(
            self.section_sizes[h]
        )
        return compact_index

    def _compact_level(self, h: int) -> np.ndarray:
        """Sort level h, keep [0, compact_index), promote every other item
        of the upper part (survivors' implicit weight doubles)."""
        compact_index = self._get_compact_index(h)
        counter = self.compaction_counters[h]
        self.compaction_counters[h] = counter + 1

        buf = np.sort(self._level_array(h), kind="stable")
        upper = buf[compact_index:]
        lower = buf[:compact_index]
        self._levels[h] = [lower]
        self._level_lens[h] = len(lower)
        self.sketch_size -= len(upper)

        if self.compaction == "average":
            # AverageNeighbour (rc_sketch.rs:263-273 / compaction_method.rs):
            # average adjacent pairs; a dangling last item survives as-is
            n_pairs = len(upper) // 2
            pairs = upper[: 2 * n_pairs].reshape(n_pairs, 2).mean(axis=1)
            survivors = (
                np.concatenate([pairs, upper[2 * n_pairs :]])
                if len(upper) % 2
                else pairs
            )
        else:
            chosen = self._coin(h, counter)
            survivors = upper[chosen::2]
        return survivors

    def _compress(self) -> None:
        """One sweep over levels compacting every over-full buffer
        (rc_sketch2.rs:216-238)."""
        self._sorted_cache = None
        h = 0
        while h < len(self._levels):
            if self._level_lens[h] >= self._calc_buffer_size(h) and self._level_lens[h] > 0:
                survivors = self._compact_level(h)
                self._update_sections(h)
                if len(self._levels) == h + 1:
                    self._grow()
                self._levels[h + 1].append(survivors)
                self._level_lens[h + 1] += len(survivors)
                self.sketch_size += len(survivors)
            h += 1

    # ------------------------------------------------------------------ merge

    def merge(self, other: "KLL") -> "KLL":
        """Native KLL merge: concat per-level buffers, adopt the
        more-compacted section parameters, re-compress until every level
        fits. Symmetric in (self, other) so pairwise merge is exactly
        commutative (seeded coin + canonical sort)."""
        if (other.k, other.compaction, other.fast, other.dtype) != (
            self.k, self.compaction, self.fast, self.dtype,
        ):
            raise ValueError(
                "cannot merge KLL sketches with different (k, compaction, fast, dtype) configuration"
            )
        self._sorted_cache = None
        while len(self._levels) < len(other._levels):
            self._grow()
        for h in range(len(other._levels)):
            arr = other._level_array(h)
            if len(arr):
                self._levels[h].append(arr.copy())
                self._level_lens[h] += len(arr)
                self.sketch_size += len(arr)
            self.compaction_counters[h] = max(
                self.compaction_counters[h], other.compaction_counters[h]
            )
            self.number_of_sections[h] = max(
                self.number_of_sections[h], other.number_of_sections[h]
            )
            self.section_sizes[h] = min(self.section_sizes[h], other.section_sizes[h])
        self._count += other._count
        # seed must not depend on merge order: combine symmetrically
        self.seed = (self.seed + other.seed) & _MASK64
        guard = 0
        while any(
            self._level_lens[h] >= self._calc_buffer_size(h) and self._level_lens[h] > 0
            for h in range(len(self._levels))
        ):
            self._compress()
            guard += 1
            if guard > 64:  # pragma: no cover - safety valve
                break
        return self

    # ------------------------------------------------------------------ query

    def _sorted_levels(self) -> list[np.ndarray]:
        if self._sorted_cache is None:
            self._sorted_cache = [
                np.sort(self._level_array(h)) for h in range(len(self._levels))
            ]
        return self._sorted_cache

    def interpolate_rank(self, item: float) -> int:
        rank = 0
        for h, lvl in enumerate(self._sorted_levels()):
            if len(lvl):
                rank += int(np.searchsorted(lvl, item, side="right")) << h
        return rank

    def est_quantile_at_value(self, item: float) -> float:
        if self._count == 0:
            return float("nan")
        return self.interpolate_rank(float(item)) / self._count

    def est_value_at_quantile(self, q: float) -> float:
        if self._count == 0:
            return float("nan")
        values, weights = self._weighted_values()
        cw = np.cumsum(weights)
        target = float(q) * self._count
        idx = int(np.searchsorted(cw, target, side="right"))
        if idx >= len(values):
            idx = len(values) - 1
        return float(values[idx])

    def _weighted_values(self) -> tuple[np.ndarray, np.ndarray]:
        vals = []
        wts = []
        for h, lvl in enumerate(self._sorted_levels()):
            if len(lvl):
                vals.append(lvl)
                wts.append(np.full(len(lvl), float(1 << h)))
        if not vals:
            return np.empty(0), np.empty(0)
        values = np.concatenate(vals)
        weights = np.concatenate(wts)
        order = np.argsort(values, kind="stable")
        return values[order], weights[order]

    def quantiles(self, qs) -> np.ndarray:
        """Vectorized multi-quantile sweep: one flatten/sort/cumsum pass
        for the whole grid (not one per q — accuracy harnesses sweep
        hundreds of quantiles per sketch)."""
        qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
        values, weights = self._weighted_values()
        if not len(values):
            return np.full(len(qs), np.nan)
        cum = np.cumsum(weights)
        targets = qs * float(self._count)
        idx = np.searchsorted(cum, targets, side="right")  # same convention
        return values[np.minimum(idx, len(values) - 1)]    # as the scalar query

    # ------------------------------------------------------------------ serde

    def to_bytes(self) -> bytes:
        return pack_state(
            self.name,
            {
                "k": self.k,
                "seed": self.seed,
                "levels": [self._level_array(h) for h in range(len(self._levels))],
                "count": self._count,
                "compaction_counters": list(self.compaction_counters),
                "number_of_sections": list(self.number_of_sections),
                "section_sizes": list(self.section_sizes),
                "compaction": self.compaction,
                "fast": self.fast,
                "dtype": self.dtype.str,
            },
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLL":
        name, st = unpack_state(data)
        if name != cls.name:
            raise ValueError(f"expected {cls.name} state, got {name}")
        obj = cls(
            k=st["k"],
            seed=st["seed"],
            compaction=st.get("compaction", "default"),
            fast=st.get("fast", False),
            dtype=st.get("dtype", "f8"),
        )
        obj._levels = [[np.asarray(a, dtype=obj.dtype)] for a in st["levels"]]
        obj._level_lens = [len(a) for a in st["levels"]]
        obj.sketch_size = sum(obj._level_lens)
        obj._count = st["count"]
        obj.compaction_counters = list(st["compaction_counters"])
        obj.number_of_sections = list(st["number_of_sections"])
        obj.section_sizes = list(st["section_sizes"])
        return obj

    def __repr__(self) -> str:
        return (
            f"KLL(k={self.k}, levels={len(self._levels)}, "
            f"stored={self.sketch_size}, count={self._count})"
        )
