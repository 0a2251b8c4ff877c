"""DDSketch — relative-error quantile sketch (Masson, Rim & Lee,
VLDB 2019, "DDSketch: A Fast and Fully-Mergeable Quantile Sketch with
Relative-Error Guarantees").

Not present in the reference repo (its quantile surface is t-digest and
the relative compactor, SURVEY.md §2.2-2.3) — added because it rounds
out the quantile-sketch design space the reference explores: t-digest
gives *rank*-space accuracy concentrated at the tails, KLL gives
uniform rank-error (ε,δ) guarantees, DDSketch gives *value*-space
relative error: every returned quantile v̂ satisfies |v̂ − v| ≤ α·v,
regardless of q. That is the guarantee latency-SLO work actually wants
("p99 within 1%"), which is why it sits next to the latency pipelines.

Design (paper §2.2, the collapsing-lowest dense store):

- γ = (1+α)/(1−α); positive value x lands in bucket i = ⌈log_γ(x)⌉,
  i.e. bucket i covers (γ^(i−1), γ^i]. Returning γ^i·(1−α) for the
  bucket gives relative error ≤ α at both bucket edges.
- counts live in a contiguous int64 array with an index offset (dense
  store); negatives go to a mirrored store keyed on −x; exact zeros
  (and |x| below the smallest indexable value) are a scalar counter.
- when a store exceeds ``max_bins`` buckets, the LOWEST buckets are
  collapsed into the lowest kept bucket (paper §2.2: tail quantiles —
  the ones people ask a relative-error sketch for — stay exact-α;
  only quantiles that land in the collapsed head lose the guarantee).

Merge law (`base.py`): bucket counts are added elementwise, then the
same deterministic collapse is applied. The final state is a pure
function of the summed histogram, so merge is associative, commutative
and BIT-identical across merge orders — `tests/test_ddsketch.py` pins
this, like `test_kmv.py` does for KMV.
"""

from __future__ import annotations

import math

import numpy as np

from approximate_quantiles_ray.sketches.base import pack_state, register_sketch, unpack_state
from approximate_quantiles_ray.sketches.slotted import SlotState

# smallest positive value the index map handles without log underflow;
# anything below is counted as zero (paper's min_indexable_value)
_MIN_INDEXABLE = 1e-270


class _DenseStore(SlotState):
    """Contiguous int64 bucket counts with an index offset and
    collapse-lowest semantics."""

    __slots__ = ("counts", "offset", "max_bins")

    def __init__(self, max_bins: int):
        self.counts = np.zeros(0, dtype=np.int64)
        self.offset = 0  # bucket index of counts[0]
        self.max_bins = int(max_bins)

    @property
    def total(self) -> int:
        return int(self.counts.sum())

    def add_indices(self, idx: np.ndarray) -> None:
        """Vectorized bulk add of bucket indices (int64)."""
        if len(idx) == 0:
            return
        lo = int(idx.min())
        hi = int(idx.max())
        self._reserve(lo, hi)
        self.counts += np.bincount(idx - self.offset, minlength=len(self.counts)).astype(
            np.int64
        )[: len(self.counts)]
        self._collapse()

    def _reserve(self, lo: int, hi: int) -> None:
        if len(self.counts) == 0:
            self.offset = lo
            self.counts = np.zeros(hi - lo + 1, dtype=np.int64)
            return
        cur_hi = self.offset + len(self.counts) - 1
        new_lo = min(lo, self.offset)
        new_hi = max(hi, cur_hi)
        if new_lo == self.offset and new_hi == cur_hi:
            return
        fresh = np.zeros(new_hi - new_lo + 1, dtype=np.int64)
        fresh[self.offset - new_lo : self.offset - new_lo + len(self.counts)] = self.counts
        self.counts = fresh
        self.offset = new_lo

    def _collapse(self) -> None:
        """Keep at most max_bins buckets: fold every bucket below the
        boundary into the lowest kept bucket. Deterministic in the
        summed histogram — the merge-law anchor."""
        n = len(self.counts)
        if n <= self.max_bins:
            return
        cut = n - self.max_bins  # first kept slot
        head = int(self.counts[:cut].sum())
        self.counts = self.counts[cut:].copy()
        self.offset += cut
        self.counts[0] += head
        # trim leading/trailing zero slack so serialized size stays tight
        nz = np.flatnonzero(self.counts)
        if len(nz) == 0:
            self.counts = np.zeros(0, dtype=np.int64)
            return
        self.offset += int(nz[0])
        self.counts = self.counts[nz[0] : nz[-1] + 1].copy()

    def merge(self, other: "_DenseStore") -> None:
        if len(other.counts) == 0:
            return
        if len(self.counts) == 0:
            self.counts = other.counts.copy()
            self.offset = other.offset
            self._collapse()
            return
        lo = min(self.offset, other.offset)
        hi = max(self.offset + len(self.counts), other.offset + len(other.counts))
        fresh = np.zeros(hi - lo, dtype=np.int64)
        fresh[self.offset - lo : self.offset - lo + len(self.counts)] = self.counts
        fresh[other.offset - lo : other.offset - lo + len(other.counts)] += other.counts
        self.counts = fresh
        self.offset = lo
        self._collapse()


@register_sketch
class DDSketch(SlotState):
    """Relative-error quantile sketch: |est − true| ≤ alpha·|true| for
    every quantile whose value does not land in a collapsed bucket."""

    name = "ddsketch"

    __slots__ = ("alpha", "gamma", "_log_gamma", "max_bins", "pos", "neg", "zero_count")

    def __init__(self, alpha: float = 0.01, max_bins: int = 2048):
        if not 0.0 < alpha < 1.0:
            raise ValueError("alpha must be in (0, 1)")
        self.alpha = float(alpha)
        self.gamma = (1.0 + alpha) / (1.0 - alpha)
        self._log_gamma = math.log(self.gamma)
        self.max_bins = int(max_bins)
        self.pos = _DenseStore(max_bins)
        self.neg = _DenseStore(max_bins)
        self.zero_count = 0

    # -- protocol -------------------------------------------------------
    @property
    def count(self) -> int:
        return self.pos.total + self.neg.total + self.zero_count

    @property
    def nbytes(self) -> int:
        return self.pos.counts.nbytes + self.neg.counts.nbytes + 64

    # -- updates ----------------------------------------------------------
    def _indices(self, x: np.ndarray) -> np.ndarray:
        # i = ceil(log_gamma(x)); computed in float64, nudged so exact
        # bucket edges (x == gamma^i) stay in bucket i across platforms
        return np.ceil(np.log(x) / self._log_gamma - 1e-12).astype(np.int64)

    def update(self, values) -> "DDSketch":
        x = np.asarray(values, dtype=np.float64)
        x = x[~np.isnan(x)]
        if len(x) == 0:
            return self
        pos = x[x > _MIN_INDEXABLE]
        neg = -x[x < -_MIN_INDEXABLE]
        self.zero_count += int(len(x) - len(pos) - len(neg))
        if len(pos):
            self.pos.add_indices(self._indices(pos))
        if len(neg):
            self.neg.add_indices(self._indices(neg))
        return self

    def update_weighted(self, values, weights) -> "DDSketch":
        """Add weighted values: each value contributes ``weight`` counts
        to its bucket. Weights must be non-negative integers (counts in
        the dense store are int64; weighted quantile positions are taken
        over total weight). The merge law is unchanged — the state stays
        a pure function of the weighted value multiset."""
        x = np.asarray(values, dtype=np.float64).ravel()
        w = np.asarray(weights, dtype=np.float64).ravel()
        if len(x) != len(w):
            raise ValueError("values and weights must align")
        wi = np.round(w).astype(np.int64)
        if not np.array_equal(wi.astype(np.float64), w) or (wi < 0).any():
            raise ValueError("weights must be non-negative integers")
        ok = ~np.isnan(x) & (wi > 0)
        x, wi = x[ok], wi[ok]
        if len(x) == 0:
            return self
        pos = x > _MIN_INDEXABLE
        neg = x < -_MIN_INDEXABLE
        self.zero_count += int(wi[~pos & ~neg].sum())
        for store, sel, vals in ((self.pos, pos, x), (self.neg, neg, -x)):
            if not sel.any():
                continue
            idx = self._indices(vals[sel])
            lo, hi = int(idx.min()), int(idx.max())
            store._reserve(lo, hi)
            add = np.bincount(idx - store.offset, weights=wi[sel],
                              minlength=len(store.counts))
            store.counts += add.astype(np.int64)[: len(store.counts)]
            store._collapse()
        return self

    def merge(self, other: "DDSketch") -> "DDSketch":
        if abs(other.alpha - self.alpha) > 1e-15 or other.max_bins != self.max_bins:
            raise ValueError("cannot merge DDSketches with different (alpha, max_bins)")
        self.pos.merge(other.pos)
        self.neg.merge(other.neg)
        self.zero_count += other.zero_count
        return self

    # -- queries ----------------------------------------------------------
    def _bucket_value(self, i: int) -> float:
        # representative of bucket (gamma^(i-1), gamma^i]: gamma^i (1 - alpha)
        return math.exp(i * self._log_gamma) * (1.0 - self.alpha)

    def est_value_at_quantile(self, q: float) -> float:
        n = self.count
        if n == 0:
            raise ValueError("empty sketch")
        q = min(max(q, 0.0), 1.0)
        # element selection: floor(q·n + 0.5) clamped — the repo-wide
        # LinearDigest convention (sketches/exact.py, reference
        # linear_digest.rs:43-52) rather than the paper's floor(q·(n−1));
        # both are within the ±1-element freedom the guarantee allows,
        # and sharing the oracle's convention keeps extreme-tail
        # relative errors comparable across sketches in ACCURACY.json
        rank = min(int(math.floor(q * n + 0.5)), n - 1)
        # ascending order: negatives (highest index = most negative first),
        # then zeros, then positives ascending index
        neg_total = self.neg.total
        if rank < neg_total:
            # walk negative store from its highest bucket downwards
            cum = np.cumsum(self.neg.counts[::-1])
            j = int(np.searchsorted(cum, rank, side="right"))
            idx = self.neg.offset + len(self.neg.counts) - 1 - j
            return -self._bucket_value(idx)
        rank -= neg_total
        if rank < self.zero_count:
            return 0.0
        rank -= self.zero_count
        cum = np.cumsum(self.pos.counts)
        j = int(np.searchsorted(cum, rank, side="right"))
        j = min(j, len(self.pos.counts) - 1)
        return self._bucket_value(self.pos.offset + j)

    def _mass_at_or_below(self, store: _DenseStore, mag: float) -> float:
        """Items of the store with magnitude ≤ mag: full buckets below
        mag's bucket plus a linear within-bucket fraction (edges are
        γ^(i−1), γ^i — sub-bucket interpolation keeps the rank query's
        error well under one bucket's mass for smooth distributions)."""
        if not len(store.counts) or mag <= _MIN_INDEXABLE:
            return 0.0
        i = int(math.ceil(math.log(mag) / self._log_gamma - 1e-12))
        lo_slot = i - store.offset
        if lo_slot < 0:
            return 0.0
        if lo_slot >= len(store.counts):
            return float(store.counts.sum())
        full = float(store.counts[:lo_slot].sum())
        upper = math.exp(i * self._log_gamma)
        lower = upper / self.gamma
        frac = min(max((mag - lower) / (upper - lower), 0.0), 1.0)
        return full + frac * float(store.counts[lo_slot])

    def est_quantile_at_value(self, v: float) -> float:
        """Approximate CDF at v (within-bucket linear interpolation)."""
        n = self.count
        if n == 0:
            raise ValueError("empty sketch")
        if v >= 0:
            below = self.neg.total + self.zero_count + self._mass_at_or_below(self.pos, v)
        else:
            below = self.neg.total - self._mass_at_or_below(self.neg, -v)
        return below / n

    # -- serde --------------------------------------------------------------
    def to_bytes(self) -> bytes:
        return pack_state(
            self.name,
            {
                "alpha": self.alpha,
                "max_bins": self.max_bins,
                "pos_counts": self.pos.counts,
                "pos_offset": self.pos.offset,
                "neg_counts": self.neg.counts,
                "neg_offset": self.neg.offset,
                "zero_count": self.zero_count,
            },
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "DDSketch":
        name, st = unpack_state(data)
        if name != cls.name:
            raise ValueError(f"expected {cls.name} state, got {name}")
        obj = cls(alpha=st["alpha"], max_bins=st["max_bins"])
        obj.pos.counts = np.asarray(st["pos_counts"], dtype=np.int64)
        obj.pos.offset = int(st["pos_offset"])
        obj.neg.counts = np.asarray(st["neg_counts"], dtype=np.int64)
        obj.neg.offset = int(st["neg_offset"])
        obj.zero_count = int(st["zero_count"])
        return obj

    def __repr__(self) -> str:
        return (
            f"DDSketch(alpha={self.alpha}, bins={len(self.pos.counts)}+"
            f"{len(self.neg.counts)}, count={self.count})"
        )
