"""t-digest scale functions k0..k3 and inverses.

Semantics follow the reference
(/root/reference/src/t_digest/scale_functions.rs:4-120), which in turn
implements the published t-digest scale-function family (Dunning &
Ertl, "Computing extremely accurate quantiles using t-digests").
All functions take (q_or_scale, delta, n) where n is the total weight.
They operate on python/numpy float64 scalars.
"""

from __future__ import annotations

import math

_LOG10E = math.log10(math.e)


def k0(q: float, delta: float, n: float) -> float:
    return (q * delta) / 2.0


def inv_k0(s: float, delta: float, n: float) -> float:
    return (s * 2.0) / delta


def k1(q: float, delta: float, n: float) -> float:
    return (delta / (2.0 * math.pi)) * math.asin(2.0 * q - 1.0)


def inv_k1(s: float, delta: float, n: float) -> float:
    return (1.0 + math.sin(2.0 * math.pi * s / delta)) / 2.0


def k2(q: float, delta: float, n: float) -> float:
    denom = 4.0 * math.log10(n / delta) + 24.0
    if q <= 0.0:
        return -math.inf
    if q >= 1.0:
        return math.inf
    return (delta / denom) * math.log10(q / (1.0 - q))


def inv_k2(s: float, delta: float, n: float) -> float:
    denom = 4.0 * math.log10(n / delta) + 24.0
    if s == -math.inf:
        return 0.0
    if s == math.inf:
        return 1.0
    exponent = (s * denom) / delta
    if exponent > 300.0:  # 10**x would overflow float64
        return 1.0
    x = 10.0**exponent
    return x / (1.0 + x)


def k2_asym(q: float, delta: float, n: float) -> float:
    return k2(q * 0.5, delta * 2.0, n)


def inv_k2_asym(s: float, delta: float, n: float) -> float:
    return inv_k2(s, delta * 2.0, n) * 2.0


def _k2n_delta(delta: float, n: float) -> float:
    # log10(1)**2 == 0 would zero the effective delta (k2 then divides by
    # it) — floor at the raw delta for tiny n (scale_functions.rs:69-91
    # never hits this: the reference only exercises n ≥ 10)
    return max(delta / 10.0 * math.log10(max(n, 1.0)) ** 2.0, delta / 10.0)


def k2n(q: float, delta: float, n: float) -> float:
    return k2(q, _k2n_delta(delta, n), n)


def inv_k2n(s: float, delta: float, n: float) -> float:
    return inv_k2(s, _k2n_delta(delta, n), n)


def k3(q: float, delta: float, n: float) -> float:
    if q <= 0.0:
        return -math.inf
    if q >= 1.0:
        return math.inf
    if q <= 0.5:
        factor = math.log10(2.0 * q)
    else:
        factor = -math.log10(2.0 * (1.0 - q))
    return (delta / (4.0 * math.log10(n / delta) + 21.0)) * factor


def inv_k3(s: float, delta: float, n: float) -> float:
    if s == -math.inf:
        return 0.0
    if s == math.inf:
        return 1.0
    pow_ = (s * (4.0 * math.log10(n / delta) + 21.0)) / delta
    q_low = 10.0**pow_ / 2.0
    q_high = (2.0 - 10.0**-pow_) / 2.0
    if abs(0.5 - q_low) > abs(0.5 - q_high):
        return q_high
    return q_low


SCALE_FUNCTIONS: dict[str, tuple] = {
    "k0": (k0, inv_k0),
    "k1": (k1, inv_k1),
    "k2": (k2, inv_k2),
    "k2_asym": (k2_asym, inv_k2_asym),
    "k2n": (k2n, inv_k2n),
    "k3": (k3, inv_k3),
}
