"""Offline accuracy-parameter tuner — mirror of the reference's
``opt_accuracy_parameter`` bisection (/root/reference/src/util/mod.rs:155-205,
used at examples/accuracy.rs:450-543).

Bisects a sketch's accuracy parameter (KLL k, t-digest δ) until
≥ ``pass_ratio`` of randomized trials meet per-quantile absolute
rank-error bounds (the reference's tail-accuracy targets:
≤1e-6 @ q=1e-5 … ≤1e-3 @ q=1e-2, scaled here to the trial size).

    python tools/tune_accuracy.py [--sketch kll|tdigest] [--n 100000]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from approximate_quantiles_ray.functions.distributions import tan_dist
from approximate_quantiles_ray.sketches.exact import ExactDigest
from approximate_quantiles_ray.sketches.kll import KLL
from approximate_quantiles_ray.sketches.tdigest import TDigest

# (quantile, abs rank-error bound) — examples/accuracy.rs:489-498 shape
BOUNDS = [(1e-4, 1e-4), (1e-3, 5e-4), (1e-2, 1e-3), (0.1, 5e-3)]


def trial_passes(factory, param: float, n: int, seed: int) -> bool:
    data = tan_dist(n, seed=seed)
    exact = ExactDigest()
    exact.update(data)
    sk = factory(param)
    sk.update(data)
    for q, bound in BOUNDS:
        want = exact.est_value_at_quantile(q)
        if abs(sk.est_quantile_at_value(want) - exact.est_quantile_at_value(want)) > bound:
            return False
    return True


def _one_trial(args) -> bool:
    fac_blob, param, n, seed = args
    from ray import cloudpickle as cp

    return trial_passes(cp.loads(fac_blob), param, n, seed)


def opt_accuracy_parameter(
    factory, lo: float, hi: float, n: int, trials: int = 20, pass_ratio: float = 0.9,
    sketch: str | None = None, jobs: int = 1,
) -> float:
    """Smallest parameter whose pass rate ≥ pass_ratio (bisection,
    util/mod.rs:155-205 — higher param = more accurate for both sketches).
    ``jobs > 1`` fans the independent trials over a process pool (the
    reference's n=1e6 / 100-trial setting is ~10 min serial). The
    CALLER's factory is what the workers run (cloudpickled — plain
    pickle can't ship a lambda), so the parallel path tunes the same
    configuration as the serial one; ``sketch`` is retained for CLI
    labeling only."""
    pool = None
    fac_blob = None
    if jobs > 1:
        import multiprocessing as mp

        from ray import cloudpickle as cp

        fac_blob = cp.dumps(factory)
        pool = mp.Pool(jobs)

    def passes(param: float) -> bool:
        if pool is not None:
            oks = pool.map(
                _one_trial, [(fac_blob, param, n, 100 + t) for t in range(trials)]
            )
            ok = sum(oks)
        else:
            ok = sum(
                trial_passes(factory, param, n, seed=100 + t) for t in range(trials)
            )
        return ok / trials >= pass_ratio

    try:
        if not passes(hi):
            raise ValueError(f"upper bound {hi} still fails the bounds")
        while hi / lo > 1.05:
            mid = (lo * hi) ** 0.5  # geometric bisection over scale params
            if passes(mid):
                hi = mid
            else:
                lo = mid
        return hi
    finally:
        if pool is not None:
            pool.close()
            pool.join()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sketch", choices=["kll", "tdigest"], default="kll")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--jobs", type=int, default=1)
    args = ap.parse_args()
    if args.sketch == "kll":
        best = opt_accuracy_parameter(
            lambda k: KLL(k=int(k), seed=0), 8, 1000, args.n, args.trials,
            sketch="kll", jobs=args.jobs,
        )
    else:
        best = opt_accuracy_parameter(
            lambda d: TDigest(delta=d, scale="k2"), 50, 10_000, args.n, args.trials,
            sketch="tdigest", jobs=args.jobs,
        )
    print(json.dumps({"sketch": args.sketch, "n": args.n, "tuned_param": round(best, 1)}))
