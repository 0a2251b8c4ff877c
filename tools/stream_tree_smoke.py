"""Scale smoke for the log-depth streaming-window blob reduction
(r4 verdict item 1): 16M events forced into ≥1,000 blocks, run through
``stream_windows_distributed`` and ``stream_keyed_windows_distributed``
with the default fanin (64 → one distributed merge round at 1,024
blocks: 1024 → 16 ≤ 64; the per-run `tree_rounds` field records the
measured count), recording wall time and driver max-RSS. The claim under test:
the driver folds O(fanin) blobs instead of O(#blocks), so driver memory
stays flat no matter how many blocks the replay stage emits.

Writes STREAM_TREE_SMOKE.json at the repo root.

Usage:  python tools/stream_tree_smoke.py [--rows 16000000] [--blocks 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

WINDOW_US = 3_600_000_000  # 1h


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def synth_block(batch: dict) -> pa.Table:
    """Deterministic per-block event synthesis (seeded by block ids)."""
    ids = batch["id"]
    rng = np.random.default_rng(int(ids[0]) + 7)
    n = len(ids)
    ts = rng.integers(0, 48 * WINDOW_US, n).astype(np.int64)
    return pa.table(
        {
            "ts": pa.array(ts, pa.int64()),
            "v": pa.array(rng.lognormal(1.0, 0.6, n)),
            "u": pa.array(rng.integers(0, 100_000, n).astype(np.int64)),
            "k": pa.array(np.char.add("t", rng.integers(0, 8, n).astype(str))),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16_000_000)
    ap.add_argument("--blocks", type=int, default=1024)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--out", default="STREAM_TREE_SMOKE.json",
                    help="output filename (repo-root relative)")
    args = ap.parse_args()

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False)

    from approximate_quantiles_ray.engine.streaming import (
        stream_keyed_windows_distributed,
        stream_windows_distributed,
    )
    from approximate_quantiles_ray.engine.udaf import SketchSpec
    from approximate_quantiles_ray.sketches.hll import HLL
    from approximate_quantiles_ray.sketches.tdigest import TDigest

    specs = [
        SketchSpec(key="v_td", factory=lambda: TDigest(delta=300), on="v"),
        SketchSpec(key="u_hll", factory=lambda: HLL(p=12, seed=1), on="u", kind="hash"),
    ]

    ds = (
        rd.range(args.rows, override_num_blocks=args.blocks)
        .map_batches(synth_block, batch_format="numpy", batch_size=None,
                     zero_copy_batch=True)
        .materialize()
    )
    n_blocks = ds.num_blocks()
    rss0 = _rss_mb()

    from approximate_quantiles_ray.engine.udaf import tree_reduce_rows

    t0 = time.perf_counter()
    glob = stream_windows_distributed(ds, specs, window_us=WINDOW_US)
    t_glob = time.perf_counter() - t0
    rounds_glob = getattr(tree_reduce_rows, "last_rounds", None)
    rss_glob = _rss_mb()

    t0 = time.perf_counter()
    keyed = stream_keyed_windows_distributed(ds, specs, ["k"], window_us=WINDOW_US)
    t_keyed = time.perf_counter() - t0
    rounds_keyed = getattr(tree_reduce_rows, "last_rounds", None)
    rss_keyed = _rss_mb()

    assert int(glob["rows"].sum()) == args.rows, "lost rows in global path"
    assert int(keyed["rows"].sum()) == args.rows, "lost rows in keyed path"

    out = {
        "rows": args.rows,
        "blocks": n_blocks,
        "cpus": args.cpus,
        "merge_fanin": 64,
        # MEASURED distributed merge rounds (counted by tree_reduce_rows,
        # not inferred): at 1024 blocks / fanin 64 ONE round runs
        # (1024 → 16 ≤ 64); a prior version hardcoded 2 here
        "tree_rounds": {"global": rounds_glob, "keyed": rounds_keyed},
        "global": {
            "wall_sec": round(t_glob, 3),
            "windows": int(len(glob)),
            "rows_conserved": True,
            "events_per_sec": round(args.rows / t_glob),
        },
        "keyed": {
            "wall_sec": round(t_keyed, 3),
            "windows": int(len(keyed)),
            "rows_conserved": True,
            "events_per_sec": round(args.rows / t_keyed),
        },
        "driver_rss_mb": {
            "before": round(rss0, 1),
            "after_global": round(rss_glob, 1),
            "after_keyed": round(rss_keyed, 1),
            "delta_global": round(rss_glob - rss0, 1),
            "delta_keyed": round(rss_keyed - rss_glob, 1),
        },
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
