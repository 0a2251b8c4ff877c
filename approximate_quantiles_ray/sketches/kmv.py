"""KMV (k-minimum-values / bottom-k "theta") distinct-count sketch
with multiset operations (union / intersection / difference / Jaccard).

Not present in the reference repo (its surface is quantile digests,
SURVEY.md §2.1-2.4) — built from the published algorithms: Beyer et
al. 2007, "On Synopses for Distinct-Value Estimation Under Multiset
Operations" (SIGMOD), and the theta-sketch generalization of Dasgupta
et al. 2016, "A Framework for Estimating Stream Expression
Cardinalities" (the Apache DataSketches theta family).

Why it exists next to HLL (`sketches/hll.py`): HLL answers *one* set's
cardinality in O(m) registers, but set EXPRESSIONS over HLLs are only
cheap for union (register max) — intersections via inclusion-exclusion
blow up the relative error when the overlap is small. KMV keeps an
actual uniform sample of the key space (the k smallest 64-bit hashes),
so any set expression is answered by evaluating it on the samples below
a common threshold θ: ε ≈ 1/√(k·J) for intersections instead of
inclusion-exclusion's additive union errors.

Merge law (`base.py`): bottom-k of a set union is EXACTLY associative,
commutative and idempotent — unlike the quantile sketches, two merge
orders yield bit-identical states, which `tests/test_kmv.py` pins.

Estimator: with the k-th smallest normalized hash U_(k), the unbiased
distinct-count estimate is (k-1)/U_(k) (Beyer et al. §3.1); below k
distinct hashes the sketch is EXACT (it has seen every distinct hash).
Set operations evaluate on the sample truncated to θ = min(θ_a, θ_b)
and scale by 1/θ (Dasgupta et al. §4).
"""

from __future__ import annotations

import numpy as np

from approximate_quantiles_ray.functions.hashing import hash_any
from approximate_quantiles_ray.sketches.base import pack_state, register_sketch, unpack_state
from approximate_quantiles_ray.sketches.slotted import SlotState

_TWO64 = float(2**64)


@register_sketch
class KMV(SlotState):
    """Bottom-k distinct sketch: the ``k`` smallest distinct 64-bit
    hashes, kept sorted ascending. Relative error ~ 1/sqrt(k-2)."""

    name = "kmv"

    __slots__ = ("k", "seed", "values", "_count")

    def __init__(self, k: int = 1024, seed: int = 0):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.seed = int(seed)
        self.values = np.zeros(0, dtype=np.uint64)  # sorted ascending
        self._count = 0  # items offered (not distinct)

    # -- protocol -----------------------------------------------------
    @property
    def count(self) -> int:
        return self._count

    @property
    def nbytes(self) -> int:
        return self.values.nbytes + 32

    # -- updates ------------------------------------------------------
    def update(self, values) -> "KMV":
        h = hash_any(values, self.seed)
        if len(h) == 0:
            return self
        self._count += len(h)
        return self.update_hashed(h)

    def update_prehashed(self, h: np.ndarray) -> "KMV":
        """Counted pre-hashed update (values hashed once with this
        sketch's seed) — ``update`` minus the hash."""
        if len(h) == 0:
            return self
        self._count += len(h)
        return self.update_hashed(h)

    def update_hashed(self, h: np.ndarray) -> "KMV":
        h = np.asarray(h, dtype=np.uint64)
        if len(self.values) == self.k:
            # saturated: only candidates below the current k-th value
            # can enter — prune before the sort/unique
            h = h[h < self.values[-1]]
        if len(h) == 0:
            return self
        merged = np.union1d(self.values, h)  # sorted distinct
        self.values = merged[: self.k]
        return self

    def merge(self, other: "KMV") -> "KMV":
        if other.k != self.k or other.seed != self.seed:
            raise ValueError("cannot merge KMVs with different (k, seed)")
        if len(other.values):
            self.values = np.union1d(self.values, other.values)[: self.k]
        self._count += other._count
        return self

    # -- estimates ----------------------------------------------------
    @property
    def theta(self) -> float:
        """Sampling threshold in [0, 1]: every distinct hash with
        normalized value < θ is retained in ``values``. 1.0 until the
        sketch saturates; then U_(k) (the k-th smallest, exclusive)."""
        if len(self.values) < self.k:
            return 1.0
        return float(self.values[-1]) / _TWO64

    def estimate(self) -> float:
        n = len(self.values)
        if n < self.k:
            return float(n)  # exact below saturation
        return (self.k - 1) / self.theta

    def to_bytes(self) -> bytes:
        return pack_state(
            self.name,
            {"k": self.k, "seed": self.seed, "values": self.values, "count": self._count},
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "KMV":
        name, st = unpack_state(data)
        if name != cls.name:
            raise ValueError(f"expected {cls.name} state, got {name}")
        obj = cls(k=st["k"], seed=st["seed"])
        obj.values = np.asarray(st["values"], dtype=np.uint64)
        obj._count = st["count"]
        return obj

    def __repr__(self) -> str:
        return f"KMV(k={self.k}, estimate={self.estimate():.1f}, count={self._count})"


# -- theta-framework set expressions (Dasgupta et al. 2016 §4) ---------


def _common_theta(*sketches: KMV) -> tuple[float, list[np.ndarray]]:
    """Truncate every sample to the smallest θ so all samples are
    uniform over the same hash subrange; returns (θ, samples). The
    cut is computed in the uint64 domain (no float round-trip): θ of a
    saturated sketch is its k-th smallest hash, exclusive."""
    cuts = [s.values[-1] for s in sketches if len(s.values) == s.k]
    if not cuts:
        return 1.0, [s.values for s in sketches]
    cut = min(cuts)
    return float(cut) / _TWO64, [s.values[s.values < cut] for s in sketches]


def union_estimate(a: KMV, b: KMV) -> float:
    """|A ∪ B| — evaluated on a merged copy (exact bottom-k union)."""
    m = KMV(k=a.k, seed=a.seed)
    m.merge(a).merge(b)
    return m.estimate()


def intersection_estimate(a: KMV, b: KMV) -> float:
    """|A ∩ B| = #(common sample hashes below θ) / θ."""
    theta, (va, vb) = _common_theta(a, b)
    common = np.intersect1d(va, vb, assume_unique=True)
    return len(common) / theta if theta > 0 else 0.0


def difference_estimate(a: KMV, b: KMV) -> float:
    """|A \\ B| = #(sample hashes of A below θ not in B) / θ."""
    theta, (va, vb) = _common_theta(a, b)
    only = np.setdiff1d(va, vb, assume_unique=True)
    return len(only) / theta if theta > 0 else 0.0


def jaccard_estimate(a: KMV, b: KMV) -> float:
    """J(A,B) — ratio of intersection to union ON THE SAMPLES below a
    common θ (the unscaled form: the 1/θ factors cancel, so the ratio
    is tighter than dividing the two scaled estimates)."""
    theta, (va, vb) = _common_theta(a, b)
    inter = len(np.intersect1d(va, vb, assume_unique=True))
    union = len(va) + len(vb) - inter
    return inter / union if union else 0.0
