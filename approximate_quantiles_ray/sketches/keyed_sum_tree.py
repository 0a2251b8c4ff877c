"""KeyedSumTree — prefix-weight index over (mean, weight) centroids.

Parity port of the reference's unbalanced BST with per-subtree weight
sums (/root/reference/src/util/keyed_sum_tree.rs:150-316): the same
contract — ``insert`` / ``delete`` by key, ``less_than_sum`` (total
weight of keys strictly below a target; ``None`` on an empty tree),
``closest_keys`` (all centroids whose |mean − target| is within 1e-3 of
the minimum, keyed_sum_tree.rs:293-316), ``sorted_vec_key``, ``size``.

Implementation is sorted parallel arrays + a lazily rebuilt cumulative
weight cache instead of a node-pointer BST: this structure only serves
``TDigest.add_cluster_tree`` (a per-item insertion path the batch
engine never uses — PARITY.md §2.2), its live size is bounded by
growth_limit·δ ≈ thousands, and at that size numpy memmove beats a
Python-object BST by an order of magnitude while satisfying the same
ported tests (keyed_sum_tree.rs:342-423).
"""

from __future__ import annotations

import numpy as np


class KeyedSumTree:
    __slots__ = ("keys", "weights", "_cum")

    def __init__(self):
        self.keys = np.zeros(0, np.float64)
        self.weights = np.zeros(0, np.float64)
        self._cum: np.ndarray | None = None

    @classmethod
    def from_centroids(cls, means, weights) -> "KeyedSumTree":
        t = cls()
        # bulk load (the reference feeds a shuffled slice one insert at
        # a time; order does not affect the array representation)
        order = np.argsort(means, kind="stable")
        t.keys = np.asarray(means, np.float64)[order]
        t.weights = np.asarray(weights, np.float64)[order]
        return t

    def size(self) -> int:
        return len(self.keys)

    def insert(self, key: float, weight: float) -> None:
        i = int(np.searchsorted(self.keys, key, side="left"))
        self.keys = np.insert(self.keys, i, key)
        self.weights = np.insert(self.weights, i, weight)
        self._cum = None

    def delete(self, key: float) -> None:
        """Remove ONE centroid with this exact key (no-op when absent,
        matching the reference's Option-returning delete)."""
        i = int(np.searchsorted(self.keys, key, side="left"))
        if i < len(self.keys) and self.keys[i] == key:
            self.keys = np.delete(self.keys, i)
            self.weights = np.delete(self.weights, i)
            self._cum = None

    def less_than_sum(self, key: float) -> float | None:
        """Total weight of keys strictly < key; None iff the tree is
        empty (keyed_sum_tree.rs manual test: present keys with nothing
        below them return 0.0, an empty tree returns None)."""
        if not len(self.keys):
            return None
        if self._cum is None:
            self._cum = np.cumsum(self.weights)
        i = int(np.searchsorted(self.keys, key, side="left"))
        return float(self._cum[i - 1]) if i else 0.0

    def closest_keys(self, target: float) -> list[tuple[float, float]]:
        """All (mean, weight) whose |mean − target| is within 1e-3 of
        the minimum distance (the reference's filter tolerance,
        keyed_sum_tree.rs:306-310)."""
        n = len(self.keys)
        if not n:
            return []
        dist = np.abs(self.keys - target)
        dmin = dist.min()
        sel = np.flatnonzero(np.abs(dist - dmin) < 0.001)
        return [(float(self.keys[i]), float(self.weights[i])) for i in sel]

    def sorted_vec_key(self) -> tuple[np.ndarray, np.ndarray]:
        return self.keys.copy(), self.weights.copy()
