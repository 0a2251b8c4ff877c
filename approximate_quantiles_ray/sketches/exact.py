"""Exact quantile oracle with the reference's LinearDigest semantics.

Mirrors /root/reference/src/util/linear_digest.rs:20-57 so the reference
unit-test assertions transfer:

- rank(v) = #less / n when #equal <= 1 (singleton rule), else
  (#less + #equal/2) / n
- value(q) = sorted[round(q * n)] with the index clamped to n-1
"""

from __future__ import annotations

import numpy as np


class ExactDigest:
    name = "exact"

    def __init__(self) -> None:
        self._chunks: list[np.ndarray] = []
        self._sorted: np.ndarray | None = None

    def update(self, values: np.ndarray) -> "ExactDigest":
        values = np.asarray(values, dtype=np.float64).ravel()
        if len(values):
            self._chunks.append(values)
            self._sorted = None
        return self

    def merge(self, other: "ExactDigest") -> "ExactDigest":
        self._chunks.extend(other._chunks)
        self._sorted = None
        return self

    @property
    def values(self) -> np.ndarray:
        if self._sorted is None:
            self._sorted = (
                np.sort(np.concatenate(self._chunks))
                if self._chunks
                else np.empty(0, dtype=np.float64)
            )
        return self._sorted

    @property
    def count(self) -> int:
        return sum(len(c) for c in self._chunks)

    def est_quantile_at_value(self, item: float) -> float:
        v = self.values
        n = len(v)
        if n == 0:
            return float("nan")
        less = int(np.searchsorted(v, item, side="left"))
        equal = int(np.searchsorted(v, item, side="right")) - less
        if equal <= 1:
            return less / n
        return (less + equal / 2.0) / n

    def est_value_at_quantile(self, q: float) -> float:
        v = self.values
        n = len(v)
        if n == 0:
            return float("nan")
        # Rust f64::round rounds half away from zero (not banker's)
        idx = int(np.floor(q * n + 0.5))
        if idx >= n:
            idx = n - 1
        return float(v[idx])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.est_value_at_quantile(q) for q in np.atleast_1d(qs)])
