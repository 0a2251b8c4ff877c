"""Segmented-lag operator: exactness vs a pandas oracle, including
block-boundary stitching (many tiny blocks forced via repartition)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from approximate_quantiles_ray.sources.transcripts import ensure_transcripts


def _oracle_gaps_us(table_dir: str) -> np.ndarray:
    import pyarrow.dataset as pads

    df = pads.dataset(table_dir).to_table(columns=["conv_id", "turn_idx", "ts"]).to_pandas()
    df = df.sort_values(["conv_id", "turn_idx"])
    ts = df["ts"].astype("datetime64[us]").astype("int64")
    gaps = ts.groupby(df["conv_id"].values).diff().dropna()
    return np.sort(gaps.to_numpy().astype(np.int64))


@pytest.fixture(scope="module")
def small_table(ray_session):
    return ensure_transcripts(5_000, seed=7, n_shards=4)


def test_segmented_gaps_exact_with_boundaries(small_table):
    import ray.data as rd

    from approximate_quantiles_ray.engine.segmented import segmented_gaps

    # many tiny blocks → lots of conv-spanning boundaries to stitch
    ds = rd.read_parquet(small_table, columns=["conv_id", "turn_idx", "ts"]).repartition(37)
    gaps_ds, boundary = segmented_gaps(ds)
    got = np.concatenate(
        [gaps_ds.to_pandas()["gap_us"].to_numpy().astype(np.int64), boundary]
    )
    exp = _oracle_gaps_us(small_table)
    assert len(boundary) > 0  # stitching actually exercised
    np.testing.assert_array_equal(np.sort(got), exp)


def test_single_row_blocks_chain_correctly(ray_session):
    """Blocks of 1 row emit HEADTAIL rows that must pair on BOTH sides
    (T → HT → H chain), never self-pair into spurious 0 gaps."""
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.engine.segmented import segmented_gaps

    n = 9  # one conversation, 9 turns, 1-row blocks via repartition(9)
    ts = pa.array(np.arange(n) * 1_000_000 * np.array([1, 2, 3, 1, 2, 3, 1, 2, 3]),
                  pa.timestamp("us"))
    tbl = pa.table({"conv_id": ["c"] * n, "turn_idx": np.arange(n, dtype=np.int64), "ts": ts})
    ds = rd.from_arrow(tbl).repartition(n)
    gaps_ds, boundary = segmented_gaps(ds)
    interior = gaps_ds.to_pandas()["gap_us"].to_numpy().astype(np.int64)
    got = np.sort(np.concatenate([interior, boundary]))
    t = ts.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    exp = np.sort(np.diff(t))  # gaps in turn order (ts is not monotone)
    np.testing.assert_array_equal(got, exp)


def test_boundary_tie_order_keeps_gap(ray_session):
    """Duplicate order keys across a block boundary (tail and head tie
    on (conv, turn_idx) but differ in ts) must still stitch the gap —
    the round-1 ADVICE latent-data-loss edge."""
    import pyarrow as pa

    from approximate_quantiles_ray.engine.segmented import HEAD, TAIL, _stitch_boundaries
    import pandas as pd

    bnd = pd.DataFrame(
        {
            "kind": np.array([TAIL, HEAD], np.int8),
            "conv_id": ["c", "c"],
            "turn_idx": np.array([5, 5], np.int64),  # tie on the order key
            "ts_us": np.array([100, 250], np.int64),
        }
    )
    gaps = _stitch_boundaries(bnd)
    np.testing.assert_array_equal(gaps, np.array([150], np.int64))


def test_session_partials_partition_independent(ray_session):
    """Fused sessionization partials must fold to the same per-key
    (n_events, n_breaks) for ANY partitioning — boundary breaks are
    stitched exactly, in-block breaks counted per block."""
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg
    from approximate_quantiles_ray.engine.segmented import segmented_session_partials

    rng = np.random.default_rng(21)
    n, timeout = 600, 50
    users = np.sort(rng.integers(0, 12, n))
    ts = np.cumsum(rng.integers(1, 120, n)).astype("datetime64[us]")
    tbl = pa.table(
        {
            "user_id": pa.array([f"u{u}" for u in users]),
            "order_us": pa.array(ts.astype(np.int64)),
            "ts": pa.array(ts),
        }
    )
    df = tbl.to_pandas()
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype(np.int64)
    gaps = df.sort_values(["user_id", "order_us"]).groupby("user_id")["ts_us"].diff()
    exp_breaks = (
        (gaps > timeout).groupby(df.sort_values(["user_id", "order_us"])["user_id"].values).sum()
    )
    exp_counts = df.groupby("user_id").size()

    for n_parts in (1, 5, 23):
        part, boundary = segmented_session_partials(
            rd.from_arrow(tbl).repartition(n_parts),
            key_col="user_id", order_col="order_us", ts_col="ts", timeout_us=timeout,
        )
        out = adaptive_grouped_agg(part, ["key"], {"n_events": "sum", "n_breaks": "sum"})
        out = out.set_index("key")
        big_bnd = boundary[boundary["gap_us"] > timeout]
        if len(big_bnd):
            extra = big_bnd.groupby("conv_id").size()
            out.loc[extra.index, "n_breaks"] = out.loc[extra.index, "n_breaks"] + extra
        assert out["n_events"].to_dict() == exp_counts.to_dict(), n_parts
        assert out["n_breaks"].astype(int).to_dict() == exp_breaks.astype(int).to_dict(), n_parts


def test_fused_gap_sketches_match_unfused(small_table):
    import ray.data as rd

    from approximate_quantiles_ray.engine.segmented import segmented_gap_sketches
    from approximate_quantiles_ray.engine.udaf import SketchSpec
    from approximate_quantiles_ray.sketches.kll import KLL

    ds = rd.read_parquet(small_table, columns=["conv_id", "turn_idx", "ts"]).repartition(23)
    specs = [SketchSpec(key="lat_kll", factory=lambda: KLL(k=200, seed=1), on="x")]
    merged = segmented_gap_sketches(ds, specs, scale=1e-6)
    sk = merged["lat_kll"]

    exp = _oracle_gaps_us(small_table).astype(np.float64) * 1e-6
    assert sk.count == len(exp)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = sk.est_value_at_quantile(q)
        lo, hi = np.quantile(exp, max(0.0, q - 0.05)), np.quantile(exp, min(1.0, q + 0.05))
        assert lo <= est <= hi, (q, est, lo, hi)


def test_hash_keyed_sort_matches_string_sort(ray_session):
    """The int-keyed sort plan must produce the same gaps/boundaries as
    the string sort (round-2 VERDICT item 7) — collisions aside, which
    are absent on a small corpus."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.engine.segmented import segmented_gaps

    rng = np.random.default_rng(11)
    n = 5000
    conv = np.array([f"conv-{i % 157:05d}" for i in range(n)], object)
    turn = np.concatenate([np.arange((n + 156) // 157)[: (n // 157) + 1] for _ in range(157)])[:n]
    tbl = pa.table(
        {
            "conv_id": pa.array(conv),
            "turn_idx": pa.array(rng.permutation(n) % 64),
            "ts": pa.array(rng.integers(0, 10**9, n), pa.int64()),
        }
    )
    # make (conv, turn) unique so gap multisets are well-defined
    tbl = tbl.set_column(1, "turn_idx", pa.array(np.arange(n) // 157, pa.int64()))

    def gaps_of(hash_key):
        ds, bnd = segmented_gaps(
            rd.from_arrow(tbl).repartition(7), hash_key=hash_key
        )
        interior = ds.to_pandas()["gap_us"].to_numpy()
        return np.sort(np.concatenate([interior, bnd]))

    np.testing.assert_array_equal(gaps_of(False), gaps_of(True))


@pytest.mark.parametrize("window", [1, 2, 3, 8])
def test_segmented_rolling_max_matches_pandas(ray_session, window):
    """Distributed rolling-peak vs a pandas groupby-rolling reference on
    skewed random data across many partitions — batch boundaries land
    inside keys, so the suspect/tail stitch path is exercised."""
    import ray.data as rd

    from approximate_quantiles_ray.engine.segmented import segmented_rolling_max

    rng = np.random.default_rng(17)
    n = 4000
    tbl = pa.table(
        {
            "k": np.sort(rng.choice([1, 2, 3, 5, 8, 13], n)).astype(np.int64),
            "o1": rng.integers(0, 500, n).astype(np.int64),
            "o2": rng.permutation(n).astype(np.int64),
            "v": rng.integers(-100, 100, n).astype(np.int64),
        }
    )
    ds = rd.from_arrow(tbl).repartition(16)
    got = segmented_rolling_max(ds, "k", ["o1", "o2"], "v", window)

    df = tbl.to_pandas().sort_values(["k", "o1", "o2"]).reset_index(drop=True)
    roll = (
        df.groupby("k")["v"]
        .rolling(window, min_periods=1)
        .sum()
        .reset_index(level=0, drop=True)
    )
    want = (
        df.assign(roll=roll.astype(np.int64))
        .groupby("k", as_index=False)["roll"]
        .max()
        .rename(columns={"roll": "max_roll"})
    )
    pd.testing.assert_frame_equal(got, want.astype({"max_roll": np.int64}))


def test_segmented_transitions_matches_pandas(ray_session):
    """Random segments split across many tiny blocks: the fused
    transition counts (in-block partials + TAIL→HEAD stitching) must
    equal a driver-side pandas LAG reference."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.engine.segmented import segmented_transitions

    rng = np.random.default_rng(21)
    n = 20_000
    conv = np.char.add("c", rng.integers(0, 500, n).astype(str))
    # include single-turn conversations and long ones
    df = pd.DataFrame(
        {
            "conv_id": conv,
            "turn_idx": np.zeros(n, np.int64),
            "role": np.array(["user", "assistant", "tool", "system"], object)[
                rng.integers(0, 4, n)
            ],
        }
    )
    df["turn_idx"] = df.groupby("conv_id").cumcount().astype(np.int64)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(16)
    got = segmented_transitions(ds, "conv_id", "turn_idx", "role")

    ref = df.sort_values(["conv_id", "turn_idx"])
    prev = ref.groupby("conv_id")["role"].shift(1)
    mask = prev.notna()
    want = (
        pd.DataFrame({"prev": prev[mask], "nxt": ref["role"][mask]})
        .groupby(["prev", "nxt"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["prev", "nxt"])
        .reset_index(drop=True)
    )
    want["n"] = want["n"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)
    assert int(got["n"].sum()) == int(mask.sum())
