"""Offline accuracy harness — the JSON replacement for the reference's
SVG plot suite (/root/reference/examples/accuracy.rs:557-1870).

For each (distribution × sketch config): build sketch + exact oracle on
the same data, report value-at-quantile relative error and
rank-at-value absolute error across the quantile grid, plus sketch
memory (nbytes) — i.e. the error-vs-quantile and error-vs-memory
experiments, numerically.

    python tools/accuracy_report.py [--n 100000] [--trials 5] [--out report.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from approximate_quantiles_ray.functions.distributions import DISTRIBUTIONS
from approximate_quantiles_ray.sketches.exact import ExactDigest
from approximate_quantiles_ray.sketches.ddsketch import DDSketch
from approximate_quantiles_ray.sketches.kll import KLL
from approximate_quantiles_ray.sketches.tdigest import TDigest

QS = (1e-5, 1e-4, 1e-3, 1e-2, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999, 1.0)

CONFIGS = {
    # harness defaults: examples/accuracy.rs:609-613 (rc k=20, δ=6000)
    # plus the unit-test configs (δ=2000 k2, k=200)
    "tdigest_d2000_k2": lambda: TDigest(delta=2000, scale="k2"),
    "tdigest_d6000_k2": lambda: TDigest(delta=6000, scale="k2"),
    "tdigest_d500_k1": lambda: TDigest(delta=500, scale="k1"),
    "kll_k20": lambda: KLL(k=20, seed=42),
    "ddsketch_a01": lambda: DDSketch(alpha=0.01),
    "ddsketch_a05": lambda: DDSketch(alpha=0.05),
    "kll_k200": lambda: KLL(k=200, seed=42),
    "kll_k200_avg": lambda: KLL(k=200, seed=42, compaction="average"),
}


def run(n: int, trials: int) -> dict:
    out: dict = {"n": n, "trials": trials, "quantiles": list(QS), "results": []}
    for dist_name, gen in DISTRIBUTIONS.items():
        for cfg_name, factory in CONFIGS.items():
            val_errs = np.zeros((trials, len(QS)))
            rank_errs = np.zeros((trials, len(QS)))
            nbytes = 0
            for t in range(trials):
                data = gen(n, seed=42 + t)
                exact = ExactDigest()
                exact.update(data)
                sk = factory()
                sk.update(data)
                nbytes = sk.nbytes
                for j, q in enumerate(QS):
                    want = exact.est_value_at_quantile(q)
                    got = sk.est_value_at_quantile(q)
                    denom = max(abs(want), 1e-12)
                    val_errs[t, j] = abs(got - want) / denom
                    rank_errs[t, j] = abs(
                        sk.est_quantile_at_value(want) - exact.est_quantile_at_value(want)
                    )
            out["results"].append(
                {
                    "distribution": dist_name,
                    "config": cfg_name,
                    "nbytes": int(nbytes),
                    "value_rel_err_mean": val_errs.mean(axis=0).round(6).tolist(),
                    "value_rel_err_max": val_errs.max(axis=0).round(6).tolist(),
                    "rank_abs_err_mean": rank_errs.mean(axis=0).round(6).tolist(),
                    "rank_abs_err_max": rank_errs.max(axis=0).round(6).tolist(),
                }
            )
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    report = run(args.n, args.trials)
    text = json.dumps(report, indent=1)
    if args.out:
        Path(args.out).write_text(text)
    print(text[:2000] + ("\n... (truncated; see --out)" if len(text) > 2000 else ""))
