"""100×-shaped resumability rehearsal (round-3 verdict item 9).

Runs the flagship sketch suite through CheckpointedSketchJob over the
64M-turn corpus three ways and proves the BASELINE.json resumability
mandate at the largest local scale:

1. ``cold``     — uninterrupted checkpointed run (fresh dir), timed.
2. ``killed``   — same job in a CHILD PROCESS, SIGKILLed mid-run (a
                  real kill, not a graceful stop), leaving a partial
                  manifest behind.
3. ``resume``   — fresh process over the killed dir: only the missing
                  shards run; merged result must be BIT-EQUAL to the
                  cold run's (same shard topology, deterministic
                  shard-id merge order), timed.

Also records per-shard lineage/metrics from the manifest. Results go to
stdout as JSON for BASELINE.md §5.12.

    python tools/scale_rehearsal.py                # full 64M rehearsal
    python tools/scale_rehearsal.py --turns 2000000  # smaller smoke
    python tools/scale_rehearsal.py --child DIR    # internal: killed run
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _job(tdir: str, ckpt_dir: str):
    from approximate_quantiles_ray.pipelines.transcripts import global_specs
    from approximate_quantiles_ray.state.checkpoint import CheckpointedSketchJob

    files = sorted(glob.glob(f"{tdir}/*.parquet"))
    # 256 shard files → 32 checkpoint shards: coarse enough that the
    # manifest stays tiny, fine enough that a mid-run kill loses at most
    # 1/32 of the work
    return CheckpointedSketchJob(files, global_specs(), ckpt_dir, files_per_shard=8)


def child_main(tdir: str, ckpt_dir: str) -> None:
    _init_ray()
    _job(tdir, ckpt_dir).run()


def states(merged: dict) -> dict[str, bytes]:
    return {k: v.to_bytes() for k, v in sorted(merged.items())}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=64_000_000)
    ap.add_argument("--kill-after", type=float, default=None,
                    help="seconds before SIGKILL (default: ~40%% of cold wall)")
    ap.add_argument("--kill-after-shards", type=int, default=None,
                    help="SIGKILL once this many shards are durable in the "
                         "child's manifest (robust to host-load variance; "
                         "overrides --kill-after)")
    ap.add_argument("--child", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--tdir", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        child_main(args.tdir, args.child)
        return

    from approximate_quantiles_ray.sources.transcripts import ensure_transcripts

    tdir = ensure_transcripts(args.turns, seed=42, n_shards=256)

    root = f"/tmp/aqr_rehearsal_{args.turns}"
    shutil.rmtree(root, ignore_errors=True)
    cold_dir, kill_dir = f"{root}/cold", f"{root}/killed"

    # ---- 1. cold uninterrupted run
    _init_ray()
    job = _job(tdir, cold_dir)
    t0 = time.perf_counter()
    cold = job.run()
    cold_wall = time.perf_counter() - t0
    cold_states = states(cold)
    cold_metrics = job.metrics()

    # ---- 2. killed run in a real child process
    child = subprocess.Popen(
        [sys.executable, __file__, "--child", kill_dir, "--tdir", tdir],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    t_kill0 = time.perf_counter()
    if args.kill_after_shards is not None:
        # Host load makes a fixed kill TIME a coin flip between "nothing
        # durable yet" and "already finished"; polling the child's own
        # manifest pins the kill to a progress point instead. Cap the wait
        # so a wedged child can't hang the rehearsal.
        manifest = os.path.join(kill_dir, "manifest.jsonl")
        deadline = t_kill0 + max(120.0, 20 * cold_wall)
        while time.perf_counter() < deadline:
            try:
                with open(manifest) as f:
                    done = sum(1 for _ in f)
            except FileNotFoundError:
                done = 0
            if done >= args.kill_after_shards or child.poll() is not None:
                break
            time.sleep(0.05)
        kill_after = time.perf_counter() - t_kill0
    else:
        kill_after = args.kill_after or max(2.0, 0.4 * cold_wall)
        time.sleep(kill_after)
    child.send_signal(signal.SIGKILL)
    child.wait()

    job2 = _job(tdir, kill_dir)
    done_at_kill = len(job2.completed_shards())
    assert done_at_kill < len(job2.shards), "kill landed after completion — rerun with smaller --kill-after"

    # ---- 3. resume in this process: only missing shards run
    t0 = time.perf_counter()
    resumed = job2.run()
    resume_wall = time.perf_counter() - t0
    resumed_states = states(resumed)

    bit_equal = cold_states == resumed_states
    manifest = job2.completed_shards()
    lineage_ok = all(
        {"files", "rows", "wall_s", "config_hash"} <= set(e) for e in manifest.values()
    )

    out = {
        "turns": args.turns,
        "num_cpus": CPUS,
        "shards": len(job2.shards),
        "cold_wall_s": round(cold_wall, 2),
        "cold_turns_per_sec": round(args.turns / cold_wall, 1),
        "kill_after_s": round(kill_after, 2),
        "shards_done_at_kill": done_at_kill,
        "resume_wall_s": round(resume_wall, 2),
        "resume_fraction_of_cold": round(resume_wall / cold_wall, 3),
        "bit_equal_after_resume": bit_equal,
        "lineage_complete": lineage_ok,
        "metrics_cold": cold_metrics,
        "metrics_resumed": job2.metrics(),
    }
    print(json.dumps(out, indent=1, default=float))
    assert bit_equal and lineage_ok
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
