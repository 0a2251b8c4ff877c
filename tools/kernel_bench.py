"""Kernel update-throughput bench — the recorded counterpart to the
reference's criterion definitions (benches/t_digest.rs,
benches/relative_compactor.rs: sizes 2^10..2^19, t-digest δ∈{20,3000},
RC k∈{16,64,256}; the reference defines these but ships no numbers).

    python tools/kernel_bench.py [--out kernel_bench.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from approximate_quantiles_ray.functions.hashing import hash_int64
from approximate_quantiles_ray.sketches.bloom import BloomFilter
from approximate_quantiles_ray.sketches.countmin import CountMinSketch
from approximate_quantiles_ray.sketches.ddsketch import DDSketch
from approximate_quantiles_ray.sketches.hll import HLL
from approximate_quantiles_ray.sketches.kll import KLL
from approximate_quantiles_ray.sketches.kll_fixed import KLLFixed
from approximate_quantiles_ray.sketches.tdigest import TDigest

SIZES = [1 << p for p in (10, 13, 16, 19)]


def bench_one(factory, data, trials: int = 3) -> float:
    best = float("inf")
    for _ in range(trials):
        sk = factory()
        t0 = time.perf_counter()
        sk.update(data)
        # force any internal buffer to materialize (t-digest defers
        # compaction to a 64k flush; timing update alone would measure a
        # list append for small n)
        if hasattr(sk, "est_value_at_quantile"):
            sk.est_value_at_quantile(0.5)
        best = min(best, time.perf_counter() - t0)
    return len(data) / best


def bench_cluster(factory, data, tree: bool, trials: int = 1) -> float:
    """Reference bench shapes t_digest_add_cluster[_tree]_* (benches/
    t_digest.rs:57-112): per-item clustering inserts — parity paths,
    orders slower than the batch kernel by design. Capped input so the
    kernel-bench run stays fast."""
    data = data[: min(len(data), 1 << 14)]
    best = float("inf")
    for _ in range(trials):
        sk = factory()
        t0 = time.perf_counter()
        if tree:
            sk.add_cluster_tree(data, np.ones(len(data)), 5.0)
        else:
            sk.add_cluster(data, np.ones(len(data)), 5.0)
        best = min(best, time.perf_counter() - t0)
    return len(data) / best


def bench_weighted(factory, data, weights, trials: int = 3) -> float:
    best = float("inf")
    for _ in range(trials):
        sk = factory()
        t0 = time.perf_counter()
        sk.update_weighted(data, weights)
        if hasattr(sk, "est_value_at_quantile"):
            sk.est_value_at_quantile(0.5)
        best = min(best, time.perf_counter() - t0)
    return len(data) / best


def run() -> dict:
    rng = np.random.default_rng(1)
    out = {"sizes": SIZES, "elements_per_sec": {}}
    for n in SIZES:
        vals = rng.uniform(0, 1001, n)
        hashes = hash_int64(rng.integers(0, 1 << 40, n))
        row = {
            "tdigest_d20": bench_one(lambda: TDigest(delta=20, scale="k1"), vals),
            "tdigest_d3000": bench_one(lambda: TDigest(delta=3000, scale="k2"), vals),
            "ddsketch_a01": bench_one(lambda: DDSketch(alpha=0.01), vals),
            "ddsketch_a01_weighted": bench_weighted(
                lambda: DDSketch(alpha=0.01), vals, rng.integers(1, 50, n)
            ),
            "tdigest_d20_add_cluster": bench_cluster(
                lambda: TDigest(delta=20, scale="k1"), vals, tree=False
            ),
            "tdigest_d20_add_cluster_tree": bench_cluster(
                lambda: TDigest(delta=20, scale="k1"), vals, tree=True
            ),
            "tdigest_d3000_weighted": bench_weighted(
                lambda: TDigest(delta=3000, scale="k2"), vals,
                rng.integers(1, 50, n).astype(float),
            ),
            "tdigest_d3000_f32": bench_one(
                lambda: TDigest(delta=3000, scale="k2", dtype="f4"), vals
            ),
            "kll_k16": bench_one(lambda: KLL(k=16, seed=1), vals),
            "kll_k256_f32": bench_one(lambda: KLL(k=256, seed=1, dtype="f4"), vals),
            "kll_k64": bench_one(lambda: KLL(k=64, seed=1), vals),
            "kll_k256": bench_one(lambda: KLL(k=256, seed=1), vals),
            "kll_fixed_k64": bench_one(lambda: KLLFixed(n, k=64, seed=1), vals),
            "hll_p14": bench_one(lambda: HLL(p=14, seed=1), hashes),
            "cms_8192x5": bench_one(lambda: CountMinSketch(width=8192, depth=5, seed=1), hashes),
            "bloom_4M": bench_one(
                lambda: BloomFilter(num_bits=1 << 22, num_hashes=7, seed=1), hashes
            ),
        }
        out["elements_per_sec"][str(n)] = {k: round(v) for k, v in row.items()}
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    rep = run()
    text = json.dumps(rep, indent=1)
    if args.out:
        Path(args.out).write_text(text)
    print(text)
