"""Digest combinators ported from the reference's wrapper layer.

- :class:`ShardedDigest` — the reference's ``ParallelDigest``
  (/root/reference/src/parallel_digest.rs:6-99): shards are kept
  separate; the rank query is the count-weighted sum of shard ranks
  (:44-51) and the quantile query is bisection on the value domain over
  the combined rank function, tolerance 1e-6 relative, returning the
  smallest value whose rank reaches the target (:53-80). This is the
  generic merge strategy for sketches *without* a native merge, and an
  independent oracle for native-merge tests (SURVEY.md §2.4).
- :class:`SymDigest` — /root/reference/src/sym_digest.rs:8-72: a low
  digest over x and a high digest over −x; queries answer from the side
  of the median that is more accurate for one-sided sketches (the
  relative-compactor family is low-tail-accurate), ties averaged.
- :class:`BufferedDigest` — /root/reference/src/buffered_digest.rs:4-80:
  values accumulate in a buffer and flush into the inner digest in
  capacity-sized batches; queries flush first; ``count`` includes
  still-buffered values. In the Ray engine the same amortization is
  provided by ``map_batches`` batching + the t-digest's internal flush
  buffer (SURVEY §2.4), so this wrapper exists for single-process users
  coming from the reference API.
"""

from __future__ import annotations

import numpy as np


class ShardedDigest:
    """Query-time combination of independent shard digests.

    Any objects exposing ``est_quantile_at_value``,
    ``est_value_at_quantile`` and ``count`` work as shards.
    """

    def __init__(self, shards: list):
        if not shards:
            raise ValueError("need at least one shard")
        self.shards = list(shards)

    @property
    def count(self) -> int:
        return int(sum(s.count for s in self.shards))

    def est_quantile_at_value(self, value: float) -> float:
        """Count-weighted mean of shard ranks (parallel_digest.rs:44-51)."""
        total = self.count
        if total == 0:
            return 0.0
        acc = 0.0
        for s in self.shards:
            if s.count:
                acc += s.est_quantile_at_value(value) * s.count
        return acc / total

    def est_value_at_quantile(self, q: float, rel_tol: float = 1e-6) -> float:
        """Bisection over [min, max] of the combined rank function,
        choosing the smallest value with rank ≥ q
        (parallel_digest.rs:53-80)."""
        live = [s for s in self.shards if s.count]
        if not live:
            return float("nan")
        lo = min(s.est_value_at_quantile(0.0) for s in live)
        hi = max(s.est_value_at_quantile(1.0) for s in live)
        if lo == hi:
            return lo
        span = max(abs(lo), abs(hi), 1.0)
        while hi - lo > rel_tol * span:
            mid = 0.5 * (lo + hi)
            if self.est_quantile_at_value(mid) >= q:
                hi = mid
            else:
                lo = mid
        return hi


class SymDigest:
    """Two one-sided digests: ``low`` over x, ``high`` over −x.

    ``factory()`` must build a fresh inner digest; both sides see every
    value (sym_digest.rs:21-40).
    """

    def __init__(self, factory):
        self.low = factory()
        self.high = factory()

    @property
    def count(self) -> int:
        return int(self.low.count)

    def update(self, values: np.ndarray) -> "SymDigest":
        v = np.asarray(values, dtype=np.float64)
        self.low.update(v)
        self.high.update(-v)
        return self

    def merge(self, other: "SymDigest") -> "SymDigest":
        self.low.merge(other.low)
        self.high.merge(other.high)
        return self

    def est_value_at_quantile(self, q: float) -> float:
        """Low side below the median, mirrored high side above, ties
        averaged (sym_digest.rs:42-58)."""
        lo_est = self.low.est_value_at_quantile(q)
        hi_est = -self.high.est_value_at_quantile(1.0 - q)
        if q < 0.5:
            return lo_est
        if q > 0.5:
            return hi_est
        return 0.5 * (lo_est + hi_est)

    def est_quantile_at_value(self, value: float) -> float:
        """Reference-exact side selection (sym_digest.rs:39-52): branch
        on the AVERAGE of the two rank estimates vs 0.5 — low side when
        avg < 0.5, high side when avg > 0.5, the average on a tie."""
        lo_rank = self.low.est_quantile_at_value(value)
        hi_rank = 1.0 - self.high.est_quantile_at_value(-value)
        avg = 0.5 * (lo_rank + hi_rank)
        if avg < 0.5:
            return lo_rank
        if avg > 0.5:
            return hi_rank
        return avg


class BufferedDigest:
    """Buffering wrapper over any digest exposing ``update`` / ``count``
    / the two query methods (buffered_digest.rs:27-80).

    Semantics mirror the reference exactly: ``add`` appends and flushes
    once the buffer EXCEEDS capacity (:50-55); ``update`` feeds
    capacity-sized chunks with the same overflow check per chunk
    (:57-64); both queries flush before delegating (:66-75); ``count``
    is inner count plus buffered length (:77-79). ``merge`` is a repo
    strengthening (the reference never implements MergableDigest for
    this wrapper): flush both sides, merge the inners.
    """

    def __init__(self, digest, capacity: int):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.digest = digest
        self.capacity = int(capacity)
        self._chunks: list[np.ndarray] = []
        self._buffered = 0

    @property
    def count(self) -> int:
        return int(self.digest.count) + self._buffered

    @property
    def nbytes(self) -> int:
        """owned_size parity (buffered_digest.rs:15-25): inner digest
        plus the buffered values."""
        return int(self.digest.nbytes) + sum(c.nbytes for c in self._chunks)

    def flush(self) -> "BufferedDigest":
        if self._chunks:
            self.digest.update(np.concatenate(self._chunks))
            self._chunks.clear()
            self._buffered = 0
        return self

    def add(self, item: float) -> "BufferedDigest":
        self._chunks.append(np.array([item], dtype=np.float64))
        self._buffered += 1
        if self._buffered > self.capacity:
            self.flush()
        return self

    def update(self, values: np.ndarray) -> "BufferedDigest":
        v = np.asarray(values, dtype=np.float64).ravel()
        for i in range(0, len(v), self.capacity):
            chunk = v[i : i + self.capacity]
            self._chunks.append(chunk)
            self._buffered += len(chunk)
            if self._buffered > self.capacity:
                self.flush()
        return self

    def merge(self, other: "BufferedDigest") -> "BufferedDigest":
        self.flush()
        other.flush()
        self.digest.merge(other.digest)
        return self

    def est_quantile_at_value(self, value: float) -> float:
        self.flush()
        return self.digest.est_quantile_at_value(value)

    def est_value_at_quantile(self, q: float) -> float:
        self.flush()
        return self.digest.est_value_at_quantile(q)


class MultiDigest:
    """Ensemble fan-out: every value goes to every member; queries
    average the members' estimates (/root/reference/src/multi_digest.rs:26-61).
    Useful for variance reduction with randomized sketches (KLL)."""

    def __init__(self, factories: list):
        if not factories:
            raise ValueError("need at least one factory")
        self.members = [f() for f in factories]

    @property
    def count(self) -> int:
        return int(self.members[0].count)

    def update(self, values: np.ndarray) -> "MultiDigest":
        v = np.asarray(values, dtype=np.float64)
        for m in self.members:
            m.update(v)
        return self

    def merge(self, other: "MultiDigest") -> "MultiDigest":
        for a, b in zip(self.members, other.members):
            a.merge(b)
        return self

    def est_value_at_quantile(self, q: float) -> float:
        return float(np.mean([m.est_value_at_quantile(q) for m in self.members]))

    def est_quantile_at_value(self, value: float) -> float:
        return float(np.mean([m.est_quantile_at_value(value) for m in self.members]))
