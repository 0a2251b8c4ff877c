"""Scale-function round-trip tests.

Mirrors /root/reference/src/t_digest/scale_functions.rs:122-185:
inv_k(k(q)) == q for all six pairs (k3 with epsilon 0.01).
"""

import numpy as np
import pytest

from approximate_quantiles_ray.sketches.scale_functions import SCALE_FUNCTIONS

QS = [i / 10.0 for i in range(11)]


@pytest.mark.parametrize("name", list(SCALE_FUNCTIONS))
def test_roundtrip(name):
    k, inv_k = SCALE_FUNCTIONS[name]
    eps = 0.01 if name == "k3" else 1e-7
    for q in QS:
        s = k(q, 10.0, 1000.0)
        back = inv_k(s, 10.0, 1000.0)
        assert back == pytest.approx(q, abs=eps), (name, q, s, back)


@pytest.mark.parametrize("name", list(SCALE_FUNCTIONS))
def test_monotone(name):
    k, _ = SCALE_FUNCTIONS[name]
    qs = np.linspace(0.001, 0.999, 101)
    vals = [k(q, 100.0, 1e6) for q in qs]
    assert all(b > a for a, b in zip(vals, vals[1:]))


def test_k2_edge_guards():
    k, inv_k = SCALE_FUNCTIONS["k2"]
    assert k(0.0, 10.0, 1e6) == -np.inf
    assert inv_k(k(0.0, 10.0, 1e6), 10.0, 1e6) == 0.0
    assert inv_k(k(1.0, 10.0, 1e6), 10.0, 1e6) == 1.0
