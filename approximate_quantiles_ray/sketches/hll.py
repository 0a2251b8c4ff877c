"""HyperLogLog cardinality sketch.

Not present in the reference repo (SURVEY.md §2.6) — built from the
published algorithm (Flajolet et al. 2007, "HyperLogLog: the analysis of
a near-optimal cardinality estimation algorithm"). The default
estimator is Ertl's improved raw estimator (Ertl 2017, "New cardinality
estimation algorithms for HyperLogLog sketches", arXiv:1702.01284,
Algorithm 6): it is bias-free across the whole range — including the
2.5m–5m band where Flajolet's raw estimator is biased and Heule et
al. 2013 (HLL++) patch with empirical bias TABLES — without needing
those tables (round-2 VERDICT item 8). The classic raw+linear-counting
estimator is kept as ``estimate_flajolet`` for comparison. 2**p uint8
registers; 64-bit hashes so no large-range correction is needed. Merge
= elementwise register max (exactly associative and commutative).
"""

from __future__ import annotations

import math

import numpy as np

from approximate_quantiles_ray.functions.hashing import hash_any
from approximate_quantiles_ray.sketches.base import pack_state, register_sketch, unpack_state

from approximate_quantiles_ray.sketches.slotted import SlotState


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length of a uint64 array (no float rounding)."""
    bl = np.zeros(v.shape, dtype=np.int64)
    v = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v >= (np.uint64(1) << np.uint64(shift))
        bl[mask] += shift
        v[mask] >>= np.uint64(shift)
    bl[v > 0] += 1
    return bl


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _sigma(x: float) -> float:
    """Ertl 2017, Algorithm 3: x → x + Σ x^(2^k)·2^(k-1) (exact fixpoint
    iteration; the linear-counting limit as a smooth function)."""
    if x == 1.0:
        return math.inf
    y = 1.0
    z = x
    while True:
        x = x * x
        z_prev = z
        z = z + x * y
        y = y + y
        if z == z_prev:
            return z


def _tau(x: float) -> float:
    """Ertl 2017, Algorithm 4 (upper-tail counterpart of _sigma)."""
    if x == 0.0 or x == 1.0:
        return 0.0
    y = 1.0
    z = 1.0 - x
    while True:
        x = math.sqrt(x)
        z_prev = z
        y = 0.5 * y
        z = z - (1.0 - x) ** 2 * y
        if z == z_prev:
            return z / 3.0


@register_sketch
class HLL(SlotState):
    """HyperLogLog with 2**p registers (default p=14 → ~0.8% rel. error)."""

    name = "hll"

    __slots__ = ("p", "seed", "registers", "_count")

    def __init__(self, p: int = 14, seed: int = 0):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = int(p)
        self.seed = int(seed)
        self.registers = np.zeros(1 << self.p, dtype=np.uint8)
        self._count = 0  # items offered (not distinct)

    @property
    def m(self) -> int:
        return 1 << self.p

    @property
    def count(self) -> int:
        return self._count

    @property
    def nbytes(self) -> int:
        return self.registers.nbytes + 32

    def update(self, values) -> "HLL":
        """Add a batch of values (any hashable dtype)."""
        h = hash_any(values, self.seed)
        if len(h) == 0:
            return self
        self._count += len(h)
        self.update_hashed(h)
        return self

    def update_prehashed(self, h: np.ndarray) -> "HLL":
        """Counted pre-hashed update: values already hashed ONCE with
        this sketch's seed (the window engines hash a whole batch and
        feed per-group slices). Equivalent to ``update`` minus the hash."""
        if len(h) == 0:
            return self
        self._count += len(h)
        return self.update_hashed(h)

    def precompute_hashed(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Row-aligned (register index, rho) for a pre-hashed batch —
        the vectorized bit arithmetic of :meth:`update_hashed`, hoisted
        so the window engines compute it ONCE per batch and feed
        per-group slices to :meth:`update_precomputed` (the per-tiny-
        group _bit_length_u64 calls were ~45% of the keyed replay wall).
        Depends only on (p); identical for every instance of a spec."""
        p64 = np.uint64(self.p)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        with np.errstate(over="ignore"):
            rem = (h << p64).astype(np.uint64)
        # rho = number of leading zeros in the remaining (64-p) bits + 1
        rho = (64 - self.p) - _bit_length_u64(rem >> np.uint64(self.p)) + 1
        np.clip(rho, 1, 64 - self.p + 1, out=rho)
        return idx, rho.astype(np.uint8)

    def _scatter_max(self, idx: np.ndarray, rho: np.ndarray) -> None:
        # scatter-max without np.maximum.at (ufunc.at is ~10× slower than
        # a sort + segmented reduce at batch sizes): group by register via
        # argsort, take each run's max with maximum.reduceat
        if len(idx) > 2048:
            order = np.argsort(idx, kind="stable")
            si = idx[order]
            sr = rho[order]
            starts = np.flatnonzero(np.concatenate(([True], si[1:] != si[:-1])))
            runmax = np.maximum.reduceat(sr, starts)
            uidx = si[starts]
            self.registers[uidx] = np.maximum(self.registers[uidx], runmax)
        else:
            np.maximum.at(self.registers, idx, rho)

    def update_precomputed(self, idx: np.ndarray, rho: np.ndarray) -> "HLL":
        """Counted scatter-max over precomputed (idx, rho) slices. Shares
        the segmented-reduce branch with :meth:`update_hashed` — a global
        window can feed a whole-batch-sized slice here, which would pay
        the ~10× ufunc.at penalty above 2048 elements."""
        if len(idx) == 0:
            return self
        self._count += len(idx)
        self._scatter_max(idx, rho)
        return self

    def update_hashed(self, h: np.ndarray) -> "HLL":
        idx, rho = self.precompute_hashed(h)
        self._scatter_max(idx, rho)
        return self

    def merge(self, other: "HLL") -> "HLL":
        if other.p != self.p or other.seed != self.seed:
            raise ValueError("cannot merge HLLs with different (p, seed)")
        np.maximum(self.registers, other.registers, out=self.registers)
        self._count += other._count
        return self

    def estimate(self) -> float:
        """Ertl 2017 Algorithm 6 (improved raw estimator): unbiased
        through the linear-counting↔raw transition band (2.5m–5m) with
        no empirical bias tables."""
        m = self.m
        q = 64 - self.p  # registers saturate at q + 1
        counts = np.bincount(self.registers, minlength=q + 2)
        z = m * _tau((m - float(counts[q + 1])) / m)
        for k in range(q, 0, -1):
            z = 0.5 * (z + float(counts[k]))
        z += m * _sigma(float(counts[0]) / m)
        if not math.isfinite(z):  # empty sketch: sigma(1) = inf → 0
            return 0.0
        return (m * m / (2.0 * math.log(2.0))) / z

    def estimate_flajolet(self) -> float:
        """Classic raw estimator + small-range linear counting
        (Flajolet 2007 / the pre-bias-correction HLL++ path) — kept for
        comparison and for the transition-band bias test."""
        m = self.m
        regs = self.registers.astype(np.float64)
        raw = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        if raw <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros > 0:
                return m * math.log(m / zeros)
        return float(raw)

    def to_bytes(self) -> bytes:
        return pack_state(
            self.name,
            {"p": self.p, "seed": self.seed, "registers": self.registers, "count": self._count},
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "HLL":
        name, st = unpack_state(data)
        if name != cls.name:
            raise ValueError(f"expected {cls.name} state, got {name}")
        obj = cls(p=st["p"], seed=st["seed"])
        obj.registers = np.asarray(st["registers"], dtype=np.uint8)
        obj._count = st["count"]
        return obj

    def __repr__(self) -> str:
        return f"HLL(p={self.p}, estimate={self.estimate():.1f}, count={self._count})"
