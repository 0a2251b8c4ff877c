"""Deterministic synthetic conversation-transcript table (Parquet).

Schema per BASELINE.json input_hint: (conv_id:string, turn_idx:int32,
role:string, text:string, tool:string, ts:timestamp[us]). Generation
rules follow FIXTURES.md §A:

- turns per conversation ~ Zipf(a=1.2) clipped to [1, 500] (the conv_id
  skew the salted/grouped paths must defuse);
- roles cycle user → assistant, assistant turns become "tool" with
  p=0.25, turn 0 becomes "system" with p=0.3;
- text is deterministically derived from (conv_id, turn_idx): the
  16-hex-char splitmix64 fingerprint repeated r times, where
  r = ceil(L/16) and L ~ lognormal(mu=5, sigma=1) clipped to [1, 32768]
  — so per-turn text equality is byte-for-byte checkable by
  regeneration, and len(text) = 16*r is the quantile-sketch metric;
- tool is null on non-tool turns, else one of 50 names with Zipf(1.5)
  frequencies (known heavy hitters);
- ts = per-conv base (uniform over 30 days) + cumsum(Exp(mean=20s) +
  100ms), strictly increasing within a conversation.

Shards are generated independently (shard id keyed into the RNG seed and
the conv_id prefix) so generation is parallel and reproducible, and rows
are shuffled within each shard so the stable (conv_id, turn_idx)
ordering invariant is actually exercised.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TOOL_VOCAB = np.array([f"tool-{i:02d}" for i in range(50)], dtype=object)
_EPOCH_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, arbitrary fixed base

SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)


def _segmented_arange(sizes: np.ndarray) -> np.ndarray:
    """[0..s0-1, 0..s1-1, ...] for segment sizes, vectorized."""
    total = int(sizes.sum())
    out = np.arange(total, dtype=np.int64)
    offsets = np.repeat(np.cumsum(sizes) - sizes, sizes)
    return out - offsets


def generate_shard(shard: int, n_turns: int, seed: int = 42) -> pa.Table:
    """Generate one shard of ~n_turns rows, deterministically."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, shard]))

    # conversation sizes: Zipf(1.2) clipped [1, 500]
    sizes = []
    total = 0
    while total < n_turns:
        chunk = np.clip(rng.zipf(1.2, size=max(256, n_turns // 64)), 1, 500)
        sizes.append(chunk)
        total += int(chunk.sum())
    sizes = np.concatenate(sizes)
    cum = np.cumsum(sizes)
    n_convs = int(np.searchsorted(cum, n_turns)) + 1
    sizes = sizes[:n_convs]
    n = int(sizes.sum())

    conv_ord = np.repeat(np.arange(n_convs, dtype=np.int64), sizes)
    turn_idx = _segmented_arange(sizes)

    conv_names = np.array(
        [f"conv-{shard:03d}{i:07d}" for i in range(n_convs)], dtype=object
    )
    conv_id = conv_names[conv_ord]

    # roles
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    is_assistant = turn_idx % 2 == 1
    tool_turn = is_assistant & (rng.random(n) < 0.25)
    role[tool_turn] = "tool"
    system_turn = (turn_idx == 0) & (rng.random(n) < 0.3)
    role[system_turn] = "system"

    # text: 16-hex fingerprint of (seed, shard, conv_ord, turn_idx) repeated
    from approximate_quantiles_ray.functions.hashing import splitmix64

    with np.errstate(over="ignore"):
        key = (
            np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
            ^ np.uint64((shard * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFFFFFF)
            ^ conv_ord.astype(np.uint64) * np.uint64(0x165667B19E3779F9)
            ^ turn_idx.astype(np.uint64)
        )
        h = splitmix64(key)
    hex16 = np.char.mod("%016x", h)
    length = np.clip(rng.lognormal(5.0, 1.0, n), 1, 32768)
    repeats = np.ceil(length / 16.0).astype(np.int64)
    import pandas as pd

    text = pd.Series(hex16).str.repeat(repeats).to_numpy(dtype=object)

    # tool names, Zipf(1.5) heavy hitters; null off tool turns
    tool = np.full(n, None, dtype=object)
    n_tool = int(tool_turn.sum())
    if n_tool:
        tool[tool_turn] = TOOL_VOCAB[rng.zipf(1.5, n_tool) % 50]

    # timestamps: per-conv base + cumsum(exp(20s) + 100ms)
    base_us = rng.integers(0, 30 * 24 * 3600 * 1_000_000, n_convs, dtype=np.int64)
    gaps_us = (rng.exponential(20.0, n) * 1_000_000 + 100_000).astype(np.int64)
    gap_cum = np.cumsum(gaps_us)
    seg_start = np.repeat(gap_cum[np.cumsum(sizes) - sizes], sizes)
    rel = gap_cum - seg_start  # cumulative gap within each conversation
    ts = _EPOCH_US + base_us[conv_ord] + rel

    # shuffle rows within the shard (ordering invariant must be earned)
    perm = rng.permutation(n)
    return pa.Table.from_arrays(
        [
            pa.array(conv_id[perm], type=pa.string()),
            pa.array(turn_idx[perm].astype(np.int32)),
            pa.array(role[perm], type=pa.string()),
            pa.array(text[perm], type=pa.string()),
            pa.array(tool[perm], type=pa.string()),
            pa.array(ts[perm], type=pa.timestamp("us")),
        ],
        schema=SCHEMA,
    )


def _write_shard(args: tuple) -> None:
    shard, per_shard, seed, tmp = args
    tbl = generate_shard(shard, per_shard, seed)
    pq.write_table(tbl, os.path.join(tmp, f"part-{shard:05d}.parquet"))


def generate_transcripts(
    out_dir: str, n_turns: int, seed: int = 42, n_shards: int = 8
) -> str:
    """Write an n_turns-row transcript table as n_shards Parquet files.

    Atomic: writes to a temp dir then renames, so readers never see a
    partial table and a crashed generation restarts cleanly.
    """
    # per-process tmp: two concurrent generators must not rmtree each
    # other's half-written shards and rename a truncated table into place
    import glob as _glob
    import time as _time

    for orphan in _glob.glob(f"{out_dir}.tmp.*"):  # crashed-run leftovers
        try:
            if _time.time() - os.path.getmtime(orphan) > 7200:
                shutil.rmtree(orphan, ignore_errors=True)
        except OSError:
            pass
    tmp = f"{out_dir}.tmp.{os.getpid()}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    per_shard = max(1, n_turns // n_shards)
    if n_shards >= 8:
        # shards are seed-independent → generate in parallel processes
        from concurrent.futures import ProcessPoolExecutor

        workers = min(16, n_shards, os.cpu_count() or 8)
        with ProcessPoolExecutor(max_workers=workers) as pool:
            list(
                pool.map(
                    _write_shard,
                    [(shard, per_shard, seed, tmp) for shard in range(n_shards)],
                )
            )
    else:
        for shard in range(n_shards):
            _write_shard((shard, per_shard, seed, tmp))
    try:
        os.rename(tmp, out_dir)
    except OSError:
        # out_dir already exists: only treat it as a concurrent generator
        # winning the race if it holds the SAME shard layout — otherwise
        # (stale table with different params) surface the conflict rather
        # than silently discarding the fresh data
        existing = (
            sorted(os.path.basename(f) for f in _glob.glob(f"{out_dir}/part-*.parquet"))
            if os.path.isdir(out_dir)
            else []
        )
        expected = [f"part-{i:05d}.parquet" for i in range(n_shards)]
        shutil_ok = existing == expected
        if shutil_ok:
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise FileExistsError(
                f"{out_dir} exists with a different layout; remove it or "
                "choose another output path"
            )
    return out_dir


def ensure_transcripts(
    n_turns: int, seed: int = 42, n_shards: int = 8, root: str = "/tmp/aqr_transcripts"
) -> str:
    """Idempotent cached generation; returns the table directory."""
    out_dir = os.path.join(root, f"n{n_turns}_seed{seed}_s{n_shards}")
    if not os.path.isdir(out_dir):
        os.makedirs(root, exist_ok=True)
        generate_transcripts(out_dir, n_turns, seed, n_shards)
    return out_dir


def transcripts_for_sf(sf: float, seed: int = 42) -> str:
    """sf → table dir; sf=0.001 ≈ 10k turns, 0.01 ≈ 100k, 0.1 ≈ 1M."""
    n_turns = max(1000, int(10_000_000 * sf))
    return ensure_transcripts(n_turns, seed=seed)
