"""Fixed-capacity relative compactor — the reference's ``RCSketch``
(/root/reference/src/rc_sketch/rc_sketch.rs), distinct from the lazy
RCSketch2-style :class:`~approximate_quantiles_ray.sketches.kll.KLL`.

Kept for parity and for reproducing the reference's RCSketch unit tests
(rc_sketch.rs:311-607); the streaming engine uses :class:`KLL` because
this variant needs an a-priori upper bound on n (SURVEY.md §7).

Semantics preserved exactly, except the compaction coin: thread_rng
(rc_sketch.rs:255-257) is replaced with the seeded counter-keyed coin so
results are deterministic under retry (same substitution as KLL).

- buffer_size = max(2k·ceil(log2(n/k)), 2k)    (rc_sketch.rs:102-111)
- add_buffer feeds chunks of buffer_size/2     (rc_sketch.rs:52-59)
- level full → sort, split at compact index, promote every-other (or
  pair-averaged) survivors to level+1, cascading  (rc_sketch.rs:161-274)
- compact index = len − (trailing_ones(counter)+1)·k; fast variant is
  always buffer_size/2                         (rc_sketch.rs:117-136)
- rank = Σ_levels 2^level · #{x ≤ v}; quantile walks sorted weighted
  values to the target rank                    (rc_sketch.rs:279-299)
"""

from __future__ import annotations

import numpy as np

from approximate_quantiles_ray.sketches.base import pack_state, register_sketch, unpack_state
from approximate_quantiles_ray.sketches.kll import _splitmix64_scalar, _trailing_ones

from approximate_quantiles_ray.sketches.slotted import SlotState


@register_sketch
class KLLFixed(SlotState):
    name = "kll_fixed"

    __slots__ = ("input_length", "k", "buffer_size", "seed", "fast", "compaction",
                 "_buffers", "_count", "compaction_counters")

    def __init__(self, input_length: int, k: int = 200, seed: int = 0,
                 fast: bool = False, compaction: str = "default"):
        if compaction not in ("default", "average"):
            raise ValueError("compaction must be 'default' or 'average'")
        self.input_length = int(input_length)
        self.k = int(k)
        self.buffer_size = self.calc_buffer_size(self.input_length, self.k)
        self.seed = int(seed)
        self.fast = bool(fast)
        self.compaction = compaction
        self._buffers: list[list[float]] = []
        self.compaction_counters: list[int] = []
        self._count = 0

    @staticmethod
    def calc_buffer_size(input_length: int, k: int) -> int:
        # integer division first — matches the reference's usize division
        # (rc_sketch.rs:102-111); 300/200 → 1 → log term 0 → floor 2k
        ratio = input_length // k if k else 0
        logterm = int(np.ceil(np.log2(ratio))) if ratio >= 1 else 0
        return max(2 * k * logterm, 2 * k)

    # ------------------------------------------------------------------ state

    @property
    def count(self) -> int:
        return self._count

    @property
    def nbytes(self) -> int:
        return sum(len(b) for b in self._buffers) * 8 + 64

    # ----------------------------------------------------------------- update

    def update(self, values: np.ndarray) -> "KLLFixed":
        items = np.asarray(values, dtype=np.float64).ravel()
        half = max(1, self.buffer_size // 2)
        for i in range(0, len(items), half):
            self._insert_batch(items[i : i + half], 0)
        self._count += len(items)
        return self

    def _ensure_level(self, idx: int) -> None:
        while len(self._buffers) <= idx:
            self._buffers.append([])
            self.compaction_counters.append(0)

    def _compact_index(self, rc_index: int) -> int:
        if self.fast:
            # counter still advances: the coin must be fresh per
            # compaction (a constant coin drops the same parity every
            # time → one-sided rank drift; reference redraws per
            # compaction, rc_sketch.rs:255-257)
            self.compaction_counters[rc_index] += 1
            return self.buffer_size // 2
        ci = len(self._buffers[rc_index]) - (
            _trailing_ones(self.compaction_counters[rc_index]) + 1
        ) * self.k
        self.compaction_counters[rc_index] += 1
        return max(0, ci)

    def _compact(self, rc_index: int, compact_index: int) -> np.ndarray:
        buf = np.sort(np.asarray(self._buffers[rc_index], dtype=np.float64))
        lower, upper = buf[:compact_index], buf[compact_index:]
        self._buffers[rc_index] = lower.tolist()
        if self.compaction == "average":
            n_pairs = len(upper) // 2
            return upper[: 2 * n_pairs].reshape(n_pairs, 2).mean(axis=1)
        # deterministic coin (replaces thread_rng): keyed on seed, level,
        # pre-increment compaction counter (fresh every compaction)
        counter = self.compaction_counters[rc_index]
        chosen = _splitmix64_scalar(self.seed ^ (rc_index * 0x9E3779B97F4A7C15) ^ counter) & 1
        return upper[chosen::2]

    def _insert_batch(self, items: np.ndarray, rc_index: int) -> None:
        self._ensure_level(rc_index)
        current = 0
        while current < len(items):
            room = self.buffer_size - len(self._buffers[rc_index])
            end = min(current + max(room, 0), len(items))
            self._buffers[rc_index].extend(items[current:end].tolist())
            current = end
            while len(self._buffers[rc_index]) >= self.buffer_size:
                survivors = self._compact(rc_index, self._compact_index(rc_index))
                self._insert_batch(survivors, rc_index + 1)

    # ------------------------------------------------------------------ merge

    def merge(self, other: "KLLFixed") -> "KLLFixed":
        """Concat per-level buffers then let the cascade re-compact
        (same strategy as the lazy KLL's native merge; the reference
        declared but never implemented merge)."""
        if (other.k, other.input_length, other.fast, other.compaction) != (
            self.k, self.input_length, self.fast, self.compaction
        ):
            raise ValueError(
                "cannot merge KLLFixed with different "
                "(k, input_length, fast, compaction) configuration"
            )
        for lvl, buf in enumerate(other._buffers):
            if buf:
                self._insert_batch(np.asarray(buf, dtype=np.float64), lvl)
        self._count += other._count
        return self

    # ---------------------------------------------------------------- queries

    def interpolate_rank(self, item: float) -> int:
        rank = 0
        for i, buf in enumerate(self._buffers):
            if buf:
                rank += int((np.asarray(buf) <= item).sum()) << i
        return rank

    def est_quantile_at_value(self, item: float) -> float:
        if not self._count:
            return float("nan")  # consistent with KLL/TDigest/ExactDigest
        return self.interpolate_rank(item) / self._count

    def est_value_at_quantile(self, q: float) -> float:
        values, weights = self._weighted_values()
        if not len(values):
            return float("nan")
        target = q * self._count
        cum = np.cumsum(weights)
        idx = int(np.searchsorted(cum, target, side="right"))
        return float(values[min(idx, len(values) - 1)])

    def _weighted_values(self):
        vals, wts = [], []
        for i, buf in enumerate(self._buffers):
            if buf:
                vals.append(np.asarray(buf, dtype=np.float64))
                wts.append(np.full(len(buf), 1 << i, dtype=np.float64))
        if not vals:
            return np.zeros(0), np.zeros(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    # ------------------------------------------------------------------ serde

    def to_bytes(self) -> bytes:
        return pack_state(
            self.name,
            {
                "input_length": self.input_length,
                "k": self.k,
                "seed": self.seed,
                "fast": self.fast,
                "compaction": self.compaction,
                "levels": [np.asarray(b, dtype=np.float64) for b in self._buffers],
                "count": self._count,
                "compaction_counters": list(self.compaction_counters),
            },
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLLFixed":
        name, st = unpack_state(data)
        if name != cls.name:
            raise ValueError(f"expected {cls.name} state, got {name}")
        obj = cls(st["input_length"], st["k"], st["seed"], st["fast"], st["compaction"])
        obj._buffers = [list(np.asarray(a, dtype=np.float64)) for a in st["levels"]]
        obj.compaction_counters = list(st["compaction_counters"])
        obj._count = st["count"]
        return obj
