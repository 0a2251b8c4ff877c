"""t-digest: mergeable quantile sketch (vectorized NumPy kernel).

Semantics follow the reference implementation
(/root/reference/src/t_digest/t_digest.rs):

- ``_compress`` is the merge-compaction of ``add_centroid_buffer``
  (t_digest.rs:301-361): concat incoming weighted points with existing
  centroids, sort by mean, then one greedy pass merging adjacent
  centroids while the cluster's cumulative weight stays below the
  scale-function limit ``inv_k(k(w0/W) + 1) * W``. Here the greedy pass
  is expressed as a loop over *clusters* (≈ O(delta) iterations of
  ``np.searchsorted`` on the cumulative-weight array + ``np.add.reduceat``
  segment sums) instead of a loop over points — same result, vectorized.
- ``est_quantile_at_value`` ports the full edge-case ladder of
  t_digest.rs:68-202 (itself derived from the public t-digest Java
  ``MergingDigest``): empty / single centroid, below-min / above-max,
  first/last half-centroid interpolation, equal-mean runs, and the
  singleton (weight==1) exclusion rules.
- ``est_value_at_quantile`` ports t_digest.rs:204-266. One deliberate
  deviation: the reference's upper-tail branch (t_digest.rs:231-236)
  drops the ``* (max - last.mean)`` factor present in the upstream Java;
  we keep the factor (documented deviation — strictly more accurate,
  and the reference's own unit-test bounds still hold).
- Merge(a, b) = compress(concat centroid lists), validated by the
  reference's own ``ParTDigest::flush`` pattern
  (/root/reference/src/t_digest/par_t_digest.rs:59-94).

The clustering insert paths ``add_cluster`` / ``add_cluster_tree`` /
``find_closest_centroids`` (t_digest.rs:368-575) ARE ported (bottom of
this module, backed by sketches/keyed_sum_tree.py) for full API parity,
but they are per-item O(n) inserts the batch engine never uses —
``update``/``merge`` above is the default and strictly faster path
(PARITY.md §2.2; reference add_cluster tests ported in
tests/test_tdigest_cluster.py).

Counts are carried as int64 separately from float64 weights so that
count conservation survives 10^12-scale merges.
"""

from __future__ import annotations

import numpy as np

from approximate_quantiles_ray.sketches.base import pack_state, register_sketch, unpack_state
from approximate_quantiles_ray.sketches.scale_functions import SCALE_FUNCTIONS

from approximate_quantiles_ray.sketches.slotted import SlotState


def weighted_average(x1: float, w1: float, x2: float, w2: float) -> float:
    """Weighted mean clamped into [min(x1,x2), max(x1,x2)]
    (/root/reference/src/util/mod.rs:11-19)."""
    weighted = (x1 * w1 + x2 * w2) / (w1 + w2)
    lo, hi = (x1, x2) if x1 <= x2 else (x2, x1)
    return max(lo, min(weighted, hi))


@register_sketch
class TDigest(SlotState):
    """Mergeable t-digest over float values.

    ``dtype`` ("f8" default, "f4" optional) selects the CENTROID storage
    precision, mirroring the reference's genericity over ``F: Float``
    (src/traits.rs:1-6; its tests/benches instantiate f32,
    src/t_digest/t_digest.rs:12-17). f4 halves state size and doubles
    cache throughput at 10^12-turn scale; compaction and query
    arithmetic stay in float64 regardless (only storage narrows), so
    the rank-error guarantee degrades only by value-rounding at the
    f32 mantissa (~1e-7 relative), covered by the reference's own
    f32-instantiated bounds in tests/test_f32_kernels.py."""

    name = "tdigest"

    __slots__ = (
        "delta",
        "scale",
        "means",
        "weights",
        "min",
        "max",
        "_count",
        "_pending",
        "_pending_n",
        "_pending_w",
        "_pending_w_n",
        "flush_size",
        "dtype",
    )

    def __init__(self, delta: float = 1000.0, scale: str = "k2", flush_size: int = 65536,
                 dtype: str = "f8"):
        if scale not in SCALE_FUNCTIONS:
            raise ValueError(f"unknown scale function {scale!r}")
        self.dtype = np.dtype(dtype)
        if self.dtype not in (np.dtype("f4"), np.dtype("f8")):
            raise ValueError("dtype must be 'f4' or 'f8'")
        self.delta = float(delta)
        self.scale = scale
        self.means = np.empty(0, dtype=self.dtype)
        self.weights = np.empty(0, dtype=self.dtype)
        self.min = np.inf
        self.max = -np.inf
        self._count = 0
        self._pending: list[np.ndarray] = []
        self._pending_n = 0
        # weighted pending buffer: (means, weights) pairs from
        # update_weighted / merge, compacted lazily at flush boundaries
        # so an N-way merge fold costs O(N·centroids/flush_size)
        # compressions instead of N (the r4-verdict streaming-window
        # reduction spent ~90% of its wall in per-pair _compress calls)
        self._pending_w: list[tuple[np.ndarray, np.ndarray]] = []
        self._pending_w_n = 0
        self.flush_size = int(flush_size)

    # ------------------------------------------------------------------ ingest

    def update(self, values: np.ndarray) -> "TDigest":
        """Add a batch of values (weight-1 points). Buffered: compaction
        runs when the pending buffer reaches ``flush_size``."""
        values = np.asarray(values, dtype=self.dtype)
        if values.ndim != 1:
            values = values.ravel()
        if len(values) == 0:
            return self
        if values.base is not None:
            # buffered until the next flush → a retained VIEW would pin
            # its whole base buffer (a tiny per-group slice keeps the
            # full batch column alive in a long-lived window/key state)
            # and alias caller-mutable memory
            values = values.copy()
        self._count += len(values)
        self._pending.append(values)
        self._pending_n += len(values)
        if self._pending_n >= self.flush_size:
            self._flush()
        return self

    def update_weighted(self, values: np.ndarray, weights: np.ndarray) -> "TDigest":
        """Add weighted points: each value enters the compaction as a
        centroid of the given weight (the reference's centroid-buffer
        path, t_digest.rs:301-361, which never required weight == 1).
        Pairs with the exact oracle ``relational.exact_weighted_quantiles``
        — quantile positions are taken over total WEIGHT, not row count."""
        values = np.asarray(values, dtype=self.dtype).ravel()
        weights = np.asarray(weights, dtype=self.dtype).ravel()
        if len(values) != len(weights):
            raise ValueError("values and weights must align")
        pos = weights > 0
        if not pos.all():
            values, weights = values[pos], weights[pos]
        if len(values) == 0:
            return self
        self._count += int(round(float(weights.astype(np.float64).sum())))
        # buffered (not consumed immediately) → must not alias caller data
        self._pending_w.append((np.array(values, dtype=self.dtype),
                                np.array(weights, dtype=self.dtype)))
        self._pending_w_n += len(values)
        if self._pending_n + self._pending_w_n >= self.flush_size:
            self._flush()
        return self

    def _flush(self) -> None:
        """Compact BOTH pending buffers (weight-1 points and weighted
        centroid batches) into the digest with one _add_weighted call."""
        if self._pending_n == 0 and self._pending_w_n == 0:
            return
        parts_v: list[np.ndarray] = []
        parts_w: list[np.ndarray] = []
        if self._pending_n:
            vals = (np.concatenate(self._pending)
                    if len(self._pending) > 1 else self._pending[0])
            parts_v.append(vals)
            parts_w.append(np.ones(len(vals), dtype=self.dtype))
        for m, w in self._pending_w:
            parts_v.append(m)
            parts_w.append(w)
        self._pending = []
        self._pending_n = 0
        self._pending_w = []
        self._pending_w_n = 0
        vals = parts_v[0] if len(parts_v) == 1 else np.concatenate(parts_v)
        wts = parts_w[0] if len(parts_w) == 1 else np.concatenate(parts_w)
        self._add_weighted(vals, wts)

    def _add_weighted(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Merge weighted points into the digest (add_centroid_buffer)."""
        if len(self.means):
            means = np.concatenate([means, self.means])
            weights = np.concatenate([weights, self.weights])
        if len(means) == 0:
            return
        order = np.argsort(means, kind="stable")
        means = means[order]
        weights = weights[order]
        self.min = min(self.min, float(means[0]))
        self.max = max(self.max, float(means[-1]))
        self.means, self.weights = self._compress(means, weights)

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Greedy adjacent-merge under the scale-function weight limit.

        ``means`` must be sorted ascending; returns (means, weights) of the
        compacted centroid list.
        """
        k, inv_k = SCALE_FUNCTIONS[self.scale]
        delta = self.delta
        # arithmetic in float64 regardless of storage dtype: cumulative
        # weights and weighted means would lose counts past 2^24 in f4
        means = means.astype(np.float64, copy=False)
        weights = weights.astype(np.float64, copy=False)
        cw = np.cumsum(weights)
        total = float(cw[-1])
        n = len(means)

        starts = []
        s = 0
        w0 = 0.0
        while s < n:
            starts.append(s)
            # absolute cumulative-weight threshold for this cluster
            q0 = w0 / total
            if q0 > 1.0:  # guard float rounding for asin/log domains
                q0 = 1.0
            limit = inv_k(k(q0, delta, total) + 1.0, delta, total) * total
            e = int(np.searchsorted(cw, limit, side="right"))
            if e <= s:
                e = s + 1
            w0 = float(cw[e - 1])
            s = e

        starts_arr = np.asarray(starts, dtype=np.intp)
        new_weights = np.add.reduceat(weights, starts_arr)
        new_means = np.add.reduceat(means * weights, starts_arr) / new_weights
        return (
            new_means.astype(self.dtype, copy=False),
            new_weights.astype(self.dtype, copy=False),
        )

    # ------------------------------------------------------------------ merge

    def merge(self, other: "TDigest") -> "TDigest":
        """Merge another t-digest into this one (commutative up to the
        algorithm's published ε; validated by merge-permutation tests).

        LAZY: the other digest's centroids (and raw pending points) are
        buffered and compacted at the next flush boundary, so folding N
        digests costs O(N·|centroids|/flush_size) compressions instead
        of N — the difference between 74 s and ~7 s in the 16M-row
        1,024-block streaming-window tree reduction. min/max of already-
        compacted centroids are propagated explicitly (centroid means
        do not preserve extrema); raw pending points carry their own."""
        if (other.delta, other.scale, other.dtype) != (self.delta, self.scale, self.dtype):
            raise ValueError("cannot merge t-digests with different (delta, scale, dtype)")
        if other._count == 0:
            return self
        # snapshot other's buffers FIRST: when other IS self (t.merge(t)
        # doubles the digest), appending while iterating other's live
        # lists would never terminate
        other_means, other_weights = other.means, other.weights
        other_pw = list(other._pending_w)
        other_p = list(other._pending)
        other_pn = other._pending_n
        self._count += other._count
        # other.min/max, when set, are TRUE data extrema (set from raw
        # values or propagated through earlier merges) — centroid means
        # in the buffers do not preserve them, so carry them explicitly
        # whether or not other has compacted centroids right now
        if other.min < self.min:
            self.min = other.min
        if other.max > self.max:
            self.max = other.max
        if len(other_means):
            self._pending_w.append((other_means.copy(), other_weights.copy()))
            self._pending_w_n += len(other_means)
        for m, w in other_pw:
            self._pending_w.append((m.copy(), w.copy()))
            self._pending_w_n += len(m)
        for arr in other_p:
            self._pending.append(arr.copy())
        self._pending_n += other_pn
        if self._pending_n + self._pending_w_n >= self.flush_size:
            self._flush()
        return self

    # ------------------------------------------------------------------ query

    def _materialize(self) -> None:
        self._flush()

    def __getstate__(self):
        """Compact lazily-MERGED buffers before pickling: they grow
        linearly with merge count, so shipping them between tree-merge
        rounds (or into a checkpoint) would inflate state size round
        over round. Flushing here keeps every serialized digest at the
        compacted O(delta) footprint. Plain weight-1 pending points are
        left untouched — they are bounded by flush_size AND must survive
        pickling bit-exactly so a checkpoint/resume replays identically
        to the one-shot path (tests/test_streaming.py
        test_resumable_replay_matches_one_shot). Surviving weight-1
        pending is CONSOLIDATED into one contiguous array: merge()
        appends each source's buffers as separate tiny arrays, so after
        k tree-merge rounds a digest can hold fanin^k array objects —
        ~100 B of pickle overhead each (the 4096-block keyed smoke shipped
        89 MB blobs, 13 s to unpickle, vs ~2 MB consolidated). Concatenation
        preserves order, so the eventual _flush sees byte-identical input."""
        if self._pending_w_n:
            self._flush()
        elif len(self._pending) > 1:
            self._pending = [np.concatenate(self._pending)]
        return super().__getstate__()

    def _query_arrays(self):
        """Flushed (means, weights) upcast to float64 for query-time
        arithmetic. With dtype='f4' the reductions (np.sum / np.cumsum)
        must not accumulate in float32 — a cumsum past 2^24 would drop
        sub-ulp singleton weights and rank error would grow with
        centroid count; only STORAGE narrows, never query arithmetic."""
        self._materialize()
        return (
            self.means.astype(np.float64, copy=False),
            self.weights.astype(np.float64, copy=False),
        )

    @property
    def count(self) -> int:
        return self._count

    @property
    def nbytes(self) -> int:
        pend = sum(a.nbytes for a in self._pending)
        pend += sum(m.nbytes + w.nbytes for m, w in self._pending_w)
        return self.means.nbytes + self.weights.nbytes + pend + 64

    def total_weight(self) -> float:
        _, weights = self._query_arrays()
        return float(np.sum(weights))

    def est_quantile_at_value(self, item: float) -> float:
        """CDF estimate (rank / n) of ``item``. t_digest.rs:68-202."""
        means, weights = self._query_arrays()
        n = len(means)
        if n == 0:
            return float("nan")
        item = float(item)
        if n == 1:
            width = self.max - self.min
            if item < self.min:
                return 0.0
            if item > self.max:
                return 1.0
            # reference quirk: `item - min <= width` is always true inside
            # the range, so a single centroid answers 0.5 (t_digest.rs:74-83)
            if item - self.min <= width:
                return 0.5
            return (item - self.min) / width

        if item < self.min:
            return 0.0
        if item > self.max:
            return 1.0

        total = float(np.sum(weights))
        cw = np.cumsum(weights)

        # below the first centroid's mean
        if item < means[0]:
            if means[0] - self.min > 0:
                if item == self.min:
                    return 0.5 / total
                return (
                    1.0
                    + (item - self.min) / (means[0] - self.min) * (weights[0] / 2.0 - 1.0)
                ) / total
            return 0.0

        # above the last centroid's mean
        if item > means[-1]:
            if self.max - means[-1] > 0:
                if item == self.max:
                    return 1.0 - 0.5 / total
                return 1.0 - (
                    (
                        1.0
                        + (self.max - item) / (self.max - means[-1]) * (weights[-1] / 2.0 - 1.0)
                    )
                    / total
                )
            return 1.0

        j = int(np.searchsorted(means, item, side="left"))
        if j < n and means[j] == item:
            if j == n - 1:
                # matched only the last centroid (t_digest.rs:192-200)
                ws = float(cw[j - 1]) if j > 0 else 0.0
                if weights[j] == 1.0:
                    return ws / total
                return 1.0 - 0.5 / total
            # equal-mean run starting at j (t_digest.rs:129-142)
            j2 = int(np.searchsorted(means, item, side="right"))
            dw = float(np.sum(weights[j:j2]))
            ws = float(cw[j - 1]) if j > 0 else 0.0
            if j2 - j == 1 and dw == 1.0:
                # single singleton: nothing to the left of its midpoint
                return ws / total
            return (ws + dw / 2.0) / total

        # strictly between centroid means: means[i] < item < means[i+1]
        i = j - 1
        ws = float(cw[i - 1]) if i > 0 else 0.0
        left_m, right_m = float(means[i]), float(means[i + 1])
        lw, rw = float(weights[i]), float(weights[i + 1])
        if right_m - left_m > 0:
            left_excl = right_excl = 0.0
            if lw == 1.0:
                if rw == 1.0:
                    return (ws + 1.0) / total
                left_excl = 0.5
            elif rw == 1.0:
                right_excl = 0.5
            dw = (lw + rw) / 2.0
            dw_no_singleton = dw - left_excl - right_excl
            base = ws + lw / 2.0 + left_excl
            return (base + dw_no_singleton * (item - left_m) / (right_m - left_m)) / total
        dw = (lw + rw) / 2.0
        return (ws + dw) / total

    def est_value_at_quantile(self, q: float) -> float:
        """Inverse-CDF estimate. t_digest.rs:204-266."""
        means, weights = self._query_arrays()
        n = len(means)
        if n == 0:
            return float("nan")
        total = float(np.sum(weights))
        ti = total * float(q)

        if ti < 1.0:
            return self.min
        if weights[0] > 1.0 and ti < weights[0] / 2.0:
            return self.min + (ti - 1.0) / (weights[0] / 2.0 - 1.0) * (means[0] - self.min)
        if ti > total - 1.0:
            return self.max
        if weights[-1] > 1.0 and total - ti <= weights[-1] / 2.0:
            # reference omits the `* (max - last.mean)` factor
            # (t_digest.rs:231-236); we keep it (documented deviation).
            denom = weights[-1] / 2.0 - 1.0
            if denom <= 0.0:  # weight exactly 2: reference's 0/0 edge → max
                return self.max
            return self.max - (total - ti - 1.0) / denom * (self.max - means[-1])

        if n == 1:
            return float(means[0])

        cw = np.cumsum(weights)
        mid = cw - weights / 2.0  # mid[i] == weight to the left of centroid i's midpoint
        # first i with mid[i+1] > ti
        ip1 = int(np.searchsorted(mid, ti, side="right"))
        if ip1 >= n:
            # unreachable given the tail branches above; interpolate to max
            z1 = ti - (total - weights[-1] / 2.0)
            z2 = total - ti
            return weighted_average(float(means[-1]), z2, self.max, z1)
        if ip1 < 1:
            ip1 = 1
        i = ip1 - 1
        if weights[i] == 1.0 and ti - mid[i] < 0.5:
            return float(means[i])
        if weights[i + 1] == 1.0 and mid[i + 1] - ti <= 0.5:
            return float(means[i + 1])
        z1 = ti - mid[i] - 0.5
        z2 = mid[i + 1] - ti - 0.5
        return weighted_average(float(means[i]), z2, float(means[i + 1]), z1)

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.est_value_at_quantile(q) for q in np.atleast_1d(qs)])

    # ------------------------------------------------------------------ serde

    def to_bytes(self) -> bytes:
        self._materialize()
        return pack_state(
            self.name,
            {
                "delta": self.delta,
                "scale": self.scale,
                "means": self.means,
                "weights": self.weights,
                "min": self.min,
                "max": self.max,
                "count": self._count,
                "flush_size": self.flush_size,
                "dtype": self.dtype.str,
            },
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        name, st = unpack_state(data)
        if name != cls.name:
            raise ValueError(f"expected {cls.name} state, got {name}")
        obj = cls(delta=st["delta"], scale=st["scale"], flush_size=st["flush_size"],
                  dtype=st.get("dtype", "f8"))
        obj.means = np.asarray(st["means"], dtype=obj.dtype)
        obj.weights = np.asarray(st["weights"], dtype=obj.dtype)
        obj.min = st["min"]
        obj.max = st["max"]
        obj._count = st["count"]
        return obj

    def __repr__(self) -> str:
        return (
            f"TDigest(delta={self.delta}, scale={self.scale!r}, "
            f"centroids={len(self.means)}, count={self._count})"
        )


# ------------------------------------------------------------- cluster path
# Parity port of the reference's per-item clustering inserts
# (t_digest.rs:368-436 add_cluster, :443-520 add_cluster_tree, :527-575
# find_closest_centroids). NOT the engine's path — per-item O(n) inserts
# are strictly worse than the batched merge-compaction for a batch
# engine (PARITY.md §2.2) — but a reference user switching over keeps
# the full API. The reference's own add_cluster tests are ported in
# tests/test_tdigest_cluster.py.


def _cluster_helpers(self):
    from approximate_quantiles_ray.sketches.scale_functions import SCALE_FUNCTIONS as _SF

    return _SF[self.scale][0]


def _k_size_from_weights(self, weight: float, weight_left: float, new_total: float) -> float:
    """t_digest.rs:617-623: scaled quantile width of a centroid.
    Quantiles are clamped to [0, 1]: float rounding can push q a ulp
    past 1, where Rust's asin quietly yields NaN but Python raises."""
    k = _cluster_helpers(self)
    q_left = min(max(weight_left / new_total, 0.0), 1.0)
    q_right = min(max(q_left + weight / new_total, 0.0), 1.0)
    return k(q_right, self.delta, new_total) - k(q_left, self.delta, new_total)


def _find_closest_centroids(self, target_mean: float):
    """t_digest.rs:527-575, quirks preserved: distances are SIGNED
    diffs (mean − target), and the minimum of (lower, higher) picks the
    signed minimum — the reference never takes abs() here. Returns a
    half-open (start, end) index range or None on an empty digest."""
    self._materialize()
    m = self.means
    n = len(m)
    if n == 0:
        return None
    index = int(np.searchsorted(m, target_mean, side="left"))
    left_index, right_index = index, index + 1
    if index == 0:
        min_lr = m[0] - target_mean
    elif index == n:
        min_lr = m[n - 1] - target_mean
        left_index, right_index = n - 1, n
    else:
        lower = m[index - 1] - target_mean
        higher = m[index] - target_mean
        min_lr = lower if lower <= higher else higher
    while left_index > 0 and m[left_index - 1] - target_mean == min_lr:
        left_index -= 1
    while right_index < n - 1 and m[right_index + 1] - target_mean == min_lr:
        right_index += 1
    return (left_index, right_index)


def _add_cluster(self, means, weights, growth_limit: float = 5.0) -> "TDigest":
    """t_digest.rs:368-436: insert each centroid into its closest
    acceptable (|k_size| < 1) existing centroid — choosing the one with
    the minimum mean·weight product, the reference's tie rule — else
    insert it sorted; periodically recompress when the digest exceeds
    growth_limit·δ centroids. No final merge (reference behavior)."""
    xm = np.asarray(means, np.float64).ravel()
    xw = np.asarray(weights, np.float64).ravel()
    if len(xm) != len(xw):
        raise ValueError("means and weights must align")
    if not len(xm):
        return self
    self._materialize()
    self.min = min(self.min, float(xm.min()))
    self.max = max(self.max, float(xm.max()))
    self._count += int(round(float(xw.sum())))
    ms, ws = self.means.copy(), self.weights.copy()
    total = float(ws.sum())
    limit = growth_limit * self.delta
    for mean, weight in zip(xm, xw):
        self.means, self.weights = ms, ws  # for find_closest on live state
        rng_idx = _find_closest_centroids(self, float(mean))
        picked = None
        if rng_idx is not None:
            cum = np.cumsum(ws)
            for idx in range(rng_idx[0], rng_idx[1]):
                new_w = ws[idx] + weight
                new_mean = (ms[idx] * ws[idx] + mean * weight) / new_w
                lo = int(np.searchsorted(ms, new_mean, side="left"))
                w_left = float(cum[lo - 1]) if lo else 0.0
                # quirk preserved: new_total double-counts the existing
                # centroid's weight (k_size adds the MERGED weight to a
                # total that already contains the old one)
                ks = _k_size_from_weights(self, new_w, w_left, total + new_w)
                if abs(ks) < 1.0:
                    if picked is None or (
                        ms[picked] * ws[picked] > ms[idx] * ws[idx]
                    ):
                        picked = idx
        total += float(weight)
        if picked is not None:
            new_w = ws[picked] + weight
            ms[picked] = (ms[picked] * ws[picked] + mean * weight) / new_w
            ws[picked] = new_w
        else:
            at = int(np.searchsorted(ms, mean, side="left"))
            ms = np.insert(ms, at, mean)
            ws = np.insert(ws, at, weight)
        if len(ms) > limit:
            order = np.argsort(ms, kind="stable")
            ms, ws = self._compress(ms[order], ws[order])
    self.means, self.weights = ms, ws
    return self


def _add_cluster_tree(self, means, weights, growth_limit: float = 5.0) -> "TDigest":
    """t_digest.rs:443-520 via KeyedSumTree. Two documented deviations:
    (1) no thread_rng shuffle — it only balanced the reference's
    unbalanced BST; the array-backed tree is order-free, making this
    path deterministic like everything else here. (2) the reference
    passes new_MEAN as the `weight` argument of k_size_from_weights
    (t_digest.rs:461-466) — an evident bug; we pass the merged WEIGHT,
    which is what add_cluster's own acceptance test uses."""
    from approximate_quantiles_ray.sketches.keyed_sum_tree import KeyedSumTree

    xm = np.asarray(means, np.float64).ravel()
    xw = np.asarray(weights, np.float64).ravel()
    if not len(xm):
        return self
    self._materialize()
    self.min = min(self.min, float(xm.min()))
    self.max = max(self.max, float(xm.max()))
    self._count += int(round(float(xw.sum())))
    tree = KeyedSumTree.from_centroids(self.means, self.weights)
    total = float(self.weights.sum())
    limit = growth_limit * self.delta
    for mean, weight in zip(xm, xw):
        picked = None
        for cm, cw in tree.closest_keys(float(mean)):
            new_w = cw + weight
            new_mean = (cm * cw + mean * weight) / new_w
            w_left = tree.less_than_sum(new_mean) or 0.0
            ks = _k_size_from_weights(self, new_w, w_left, total + weight)
            if abs(ks) < 1.0:
                if picked is None or (picked[0] * picked[1] > cm * cw):
                    picked = (cm, cw)
        total += float(weight)
        if picked is not None:
            cm, cw = picked
            tree.delete(cm)
            new_w = cw + weight
            tree.insert((cm * cw + mean * weight) / new_w, new_w)
        else:
            tree.insert(float(mean), float(weight))
        if tree.size() > limit:
            ms, ws = tree.sorted_vec_key()
            ms, ws = self._compress(ms, ws)
            tree = KeyedSumTree.from_centroids(ms, ws)
    self.means, self.weights = tree.sorted_vec_key()
    return self


TDigest.k_size_from_weights = _k_size_from_weights
TDigest.find_closest_centroids = _find_closest_centroids
TDigest.add_cluster = _add_cluster
TDigest.add_cluster_tree = _add_cluster_tree
