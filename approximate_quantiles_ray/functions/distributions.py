"""Seeded mirrors of the reference's test-data generators.

Same parameters as /root/reference/src/util/mod.rs:24-144 (FIXTURES.md
§B); used by the accuracy tests and the offline accuracy harness
(tools/accuracy_report.py) that replaces the reference's SVG plot suite
(examples/accuracy.rs) with JSON output.
"""

from __future__ import annotations

import numpy as np


def uniform(n: int, seed: int = 42) -> np.ndarray:
    """U[0, 1001) — util/mod.rs:24-33."""
    return np.random.default_rng(seed).uniform(0, 1001, n)


def tan_dist(n: int, seed: int = 42) -> np.ndarray:
    """tan(U[−20, 20)) — extreme two-sided tails, util/mod.rs:38-47."""
    return np.tan(np.random.default_rng(seed).uniform(-20, 20, n))


def reverse_exp(n: int, seed: int = 42) -> np.ndarray:
    """−Exp(1) − 1 (all negative, left tail) — util/mod.rs:53-63."""
    return -np.random.default_rng(seed).exponential(1.0, n) - 1.0


def growing_blocks(n: int, seed: int = 42) -> np.ndarray:
    """Plateaus: value increments with prob 0.001·0.98^k —
    util/mod.rs:69-86 (DataSketches KLL-vs-tdigest pattern)."""
    rng = np.random.default_rng(seed)
    u = rng.random(n)
    out = np.empty(n)
    value, prob = 0.0, 0.001
    k = 0
    for i in range(n):  # sequential by construction (stateful walk)
        if u[i] < prob:
            value += 1.0
            k += 1
            prob = 0.001 * 0.98**k
        out[i] = value
    return out


def ascending(n: int, seed: int = 42) -> np.ndarray:
    """0..n−1 — util/mod.rs:124-129."""
    return np.arange(n, dtype=np.float64)


def descending(n: int, seed: int = 42) -> np.ndarray:
    """n−1..0 — rc_sketch.rs:340-360 order-robustness."""
    return np.arange(n, dtype=np.float64)[::-1].copy()


def sin_abs(n: int, seed: int = 42) -> np.ndarray:
    """|sin(U[0,1001))| — examples/demo.rs:12-17."""
    return np.abs(np.sin(np.random.default_rng(seed).uniform(0, 1001, n)))


DISTRIBUTIONS = {
    "uniform": uniform,
    "tan": tan_dist,
    "reverse_exp": reverse_exp,
    "growing_blocks": growing_blocks,
    "ascending": ascending,
    "descending": descending,
    "sin_abs": sin_abs,
}

SINGLETON_SET = np.array([1.0, 2.0, 8.0, 0.5])  # t_digest.rs:934-949
