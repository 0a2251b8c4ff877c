"""Streaming tumbling windows: watermark finalization order, late-data
routing, end-of-stream flush, partitioned-state merge, and equivalence
with the batch windowed aggregate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from approximate_quantiles_ray.engine.streaming import StreamingWindowAggregator, stream_windows
from approximate_quantiles_ray.engine.udaf import SketchSpec
from approximate_quantiles_ray.sketches.hll import HLL
from approximate_quantiles_ray.sketches.tdigest import TDigest

WINDOW = 1_000_000  # 1s windows
LATE = 500_000  # 0.5s lateness


def _specs():
    return [
        SketchSpec(key="v_td", factory=lambda: TDigest(delta=100), on="v"),
        SketchSpec(key="u_hll", factory=lambda: HLL(p=12, seed=1), on="u", kind="hash"),
    ]


def _batch(ts_us, vals, users):
    return pa.table(
        {
            "ts": pa.array(np.asarray(ts_us, np.int64), pa.int64()),
            "v": pa.array(np.asarray(vals, np.float64)),
            "u": pa.array(np.asarray(users, np.int64)),
        }
    )


def test_watermark_finalization_and_late_routing():
    agg = StreamingWindowAggregator(_specs(), window_us=WINDOW, allowed_lateness_us=LATE)
    # window 0: [0, 1s); window 1: [1s, 2s)
    out = agg.push(_batch([100_000, 200_000], [1.0, 2.0], [1, 2]))
    assert out == []  # nothing finalized yet
    # advance into window 2 → watermark = 2.6s − 0.5s = 2.1s → windows
    # [0,1s) and [1s,2s) both close (ends 1.0s and 2.0s ≤ 2.1s)
    out = agg.push(_batch([2_600_000], [5.0], [3]))
    assert [r["window_start_us"] for r in out] == [0]  # window 1 had no
    assert out[0]["rows"] == 2                         # events → never opens
    # a 0.15s event now is LATE (window 0 closed); 1.5s is late too — its
    # window's end (2.0s) is behind the 2.1s watermark even though the
    # window never opened (watermark rule, not finalized-set rule)
    agg.push(_batch([150_000, 1_500_000], [9.0, 9.0], [4, 4]))
    assert agg.late_rows == 2
    tail = agg.flush()
    assert {r["window_start_us"] for r in tail} == {2_000_000}
    assert agg.total_rows == 5


def test_stream_matches_batch_windows(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 50_000
    ts = np.sort(rng.integers(0, 30 * WINDOW, n)) + rng.integers(-40_000, 40_000, n)
    tbl = _batch(ts, rng.lognormal(1, 0.5, n), rng.integers(0, 500, n))
    ds = rd.from_arrow(tbl)
    out = stream_windows(ds, _specs(), batch_size=4096, window_us=WINDOW,
                         allowed_lateness_us=10 * WINDOW)  # lateness > jitter → 0 late
    assert out.attrs["late_rows"] == 0
    assert out["rows"].sum() == n
    # per-window medians vs exact pandas
    df = tbl.to_pandas()
    df["w"] = (df["ts"] // WINDOW) * WINDOW
    for _, row in out.head(5).iterrows():
        grp = df[df["w"] == row["window_start_us"]]["v"]
        assert row["v_td_p50"] == pytest.approx(grp.median(), rel=0.05), row["window_start_us"]
        assert int(row["rows"]) == len(grp)


def test_partitioned_streaming_merge():
    rng = np.random.default_rng(5)
    ts = rng.integers(0, 5 * WINDOW, 20_000)
    vals = rng.normal(10, 2, 20_000)
    users = rng.integers(0, 300, 20_000)
    whole = StreamingWindowAggregator(_specs(), window_us=WINDOW, allowed_lateness_us=1 << 60)
    whole.push(_batch(ts, vals, users))
    a = StreamingWindowAggregator(_specs(), window_us=WINDOW, allowed_lateness_us=1 << 60)
    b = StreamingWindowAggregator(_specs(), window_us=WINDOW, allowed_lateness_us=1 << 60)
    a.push(_batch(ts[::2], vals[::2], users[::2]))
    b.push(_batch(ts[1::2], vals[1::2], users[1::2]))
    a.merge(b)
    wa, ww = a.flush(), whole.flush()
    assert len(wa) == len(ww) == 5
    for ra, rw in zip(wa, ww):
        assert ra["rows"] == rw["rows"]
        # HLL registers identical regardless of partitioning
        np.testing.assert_array_equal(ra["u_hll"].registers, rw["u_hll"].registers)
        assert ra["v_td"].est_value_at_quantile(0.5) == pytest.approx(
            rw["v_td"].est_value_at_quantile(0.5), rel=0.02
        )


def test_merge_never_double_emits_finalized_windows():
    """Review regression: merging a partition that still holds rows for
    a window the receiver already emitted must route those rows to the
    late counter, not re-open and re-emit the window."""
    a = StreamingWindowAggregator(_specs(), window_us=WINDOW, allowed_lateness_us=LATE)
    emitted = a.push(_batch([100_000, 200_000], [1.0, 2.0], [1, 2]))
    emitted += a.push(_batch([2_600_000], [5.0], [3]))  # finalizes window 0
    assert [r["window_start_us"] for r in emitted] == [0]

    b = StreamingWindowAggregator(_specs(), window_us=WINDOW, allowed_lateness_us=LATE)
    b.push(_batch([300_000, 400_000, 500_000], [7.0, 8.0, 9.0], [5, 6, 7]))  # window 0 open
    a.merge(b)
    assert a.late_rows == 3  # b's window-0 rows cannot merge into an emission
    tail = a.flush()
    assert 0 not in {r["window_start_us"] for r in tail}  # never re-emitted


# ------------------------------------------------------- keyed / sliding


def _kbatch(ts_us, keys):
    return pa.table(
        {
            "ts": pa.array(np.asarray(ts_us, np.int64), pa.int64()),
            "k": pa.array(list(keys), pa.string()),
        }
    )


def test_keyed_windows_counts_and_late_per_key():
    from approximate_quantiles_ray.engine.streaming import KeyedStreamingWindowAggregator

    agg = KeyedStreamingWindowAggregator([], ["k"], window_us=WINDOW,
                                         allowed_lateness_us=LATE)
    out = agg.push(_kbatch([100, 200, 1_100_000], ["a", "b", "a"]))
    assert out == []  # watermark 0.6s — window 0 still open
    # watermark jumps to 2.5s: window 0 and 1 finalize, per key
    out = agg.push(_kbatch([3_000_000], ["b"]))
    got = {(r["window_start_us"], r["k"]): r["rows"] for r in out}
    assert got == {(0, "a"): 1, (0, "b"): 1, (1_000_000, "a"): 1}
    # late arrivals for closed windows are counted PER KEY
    agg.push(_kbatch([150, 250, 1_200_000], ["a", "a", "b"]))
    assert agg.late_by_key == {("a",): 2, ("b",): 1}
    rest = agg.flush()
    assert {(r["window_start_us"], r["k"]): r["rows"] for r in rest} == {(3_000_000, "b"): 1}


def test_sliding_windows_assign_each_event_to_all_panes():
    from approximate_quantiles_ray.engine.streaming import KeyedStreamingWindowAggregator

    # 1s window, 250ms slide → every event in 4 windows
    agg = KeyedStreamingWindowAggregator([], ["k"], window_us=1_000_000,
                                         slide_us=250_000, allowed_lateness_us=0)
    agg.push(_kbatch([600_000], ["a"]))
    rows = agg.flush()
    starts = sorted(r["window_start_us"] for r in rows)
    assert starts == [-250_000, 0, 250_000, 500_000]
    assert all(r["rows"] == 1 and r["k"] == "a" for r in rows)

    with pytest.raises(ValueError, match="multiple of"):
        KeyedStreamingWindowAggregator([], ["k"], window_us=1_000_000, slide_us=300_000)


def test_keyed_partitioned_merge_routes_finalized_to_late():
    from approximate_quantiles_ray.engine.streaming import KeyedStreamingWindowAggregator

    def feed(ts, keys, lateness):
        a = KeyedStreamingWindowAggregator([], ["k"], window_us=WINDOW,
                                           allowed_lateness_us=lateness)
        a.push(_kbatch(ts, keys))
        return a

    # partition A finalizes window 0 (tight lateness), B still holds it open
    a = feed([100, 5_000_000], ["a", "a"], lateness=0)
    b = feed([200], ["a"], lateness=1 << 62)
    assert 0 in a.finalized  # push auto-drained window 0
    a.merge(b)
    assert a.late_by_key == {("a",): 1}  # B's window-0 row cannot re-open it

    # loss-free pattern: huge lateness on BOTH, merge, then flush
    a2 = feed([100, 5_000_000], ["a", "a"], lateness=1 << 62)
    b2 = feed([200], ["a"], lateness=1 << 62)
    a2.merge(b2)
    rows = {(r["window_start_us"], r["k"]): r["rows"] for r in a2.flush()}
    assert rows == {(0, "a"): 2, (5_000_000, "a"): 1}
    assert a2.late_rows == 0


# ----------------------------------------------------------- session windows


def test_session_windows_merge_and_finalize():
    from approximate_quantiles_ray.engine.streaming import SessionStreamAggregator

    GAP = 1_000_000  # 1s
    agg = SessionStreamAggregator(["k"], gap_us=GAP, allowed_lateness_us=1 << 62)
    # two separate proto-sessions for key a: [0] and [1.8s] (gap 1s apart)
    assert agg.push(_kbatch([0, 1_800_000], ["a", "a"])) == []
    # a bridging event at 0.9s is within the gap of BOTH — MERGES them
    # into one session (the mergeable-window case)
    agg.push(_kbatch([900_000], ["a"]))
    rows = agg.flush()
    assert len(rows) == 1
    r = rows[0]
    assert (r["session_start_us"], r["session_end_us"], r["n_events"], r["k"]) == (
        0, 1_800_000, 3, "a",
    )


def test_session_windows_watermark_and_late_per_key():
    from approximate_quantiles_ray.engine.streaming import SessionStreamAggregator

    GAP = 1_000_000
    agg = SessionStreamAggregator(["k"], gap_us=GAP, allowed_lateness_us=0)
    agg.push(_kbatch([0, 100_000], ["a", "b"]))
    # watermark jumps: both sessions (last+gap <= 10s) finalize
    out = agg.push(_kbatch([10_000_000], ["a"]))
    done = {(r["k"], r["n_events"]) for r in out}
    assert done == {("a", 1), ("b", 1)}
    # an event whose reach (ts+gap) is behind the watermark is late, per key
    agg.push(_kbatch([50_000, 60_000], ["a", "b"]))
    assert agg.late_by_key == {("a",): 1, ("b",): 1}


def test_session_windows_partitioned_merge():
    from approximate_quantiles_ray.engine.streaming import SessionStreamAggregator

    GAP = 1_000_000

    def feed(ts, keys, lateness=1 << 62):
        a = SessionStreamAggregator(["k"], gap_us=GAP, allowed_lateness_us=lateness)
        a.push(_kbatch(ts, keys))
        return a

    # loss-free pattern: unbounded lateness both sides, merge, flush;
    # the two partitions' fragments of one logical session reunite
    a = feed([0, 500_000], ["a", "a"])
    b = feed([900_000, 5_000_000], ["a", "a"])
    a.merge(b)
    rows = a.flush()
    got = {(r["session_start_us"], r["session_end_us"], r["n_events"]) for r in rows}
    assert got == {(0, 900_000, 3), (5_000_000, 5_000_000, 1)}
    assert a.late_rows == 0

    # conflict rule: a session span the receiver already finalized
    # routes the other partition's overlapping fragment to late
    c = feed([0], ["a"], lateness=0)
    c.push(_kbatch([10_000_000], ["a"]))  # finalizes [0,0]
    d = feed([200_000], ["a"])
    c.merge(d)
    assert c.late_by_key == {("a",): 1}


def _ref_keyed_sweep(codes, starts, lasts, counts, gap):
    """Per-key reference interval merge (plain Python)."""
    out = []
    for k in np.unique(codes):
        m = codes == k
        ivs = sorted(zip(starts[m], lasts[m], counts[m]))
        cur = None
        for s, l, c in ivs:
            if cur is not None and s <= cur[1] + gap:
                cur = (cur[0], max(cur[1], l), cur[2] + c)
            else:
                if cur is not None:
                    out.append((k, *cur))
                cur = (s, l, c)
        if cur is not None:
            out.append((k, *cur))
    return sorted(out)


def test_keyed_interval_sweep_matches_reference():
    from approximate_quantiles_ray.engine.streaming import _keyed_interval_sweep

    rng = np.random.default_rng(7)
    for trial in range(5):
        n = 500
        codes = rng.integers(0, 20, n)
        starts = rng.integers(0, 100_000, n)
        lasts = starts + rng.integers(0, 500, n)
        counts = rng.integers(1, 5, n)
        gap = int(rng.integers(1, 1000))
        oc, os_, ol, on = _keyed_interval_sweep(
            codes.astype(np.int64), starts.astype(np.int64),
            lasts.astype(np.int64), counts.astype(np.int64), gap
        )
        got = sorted(zip(oc.tolist(), os_.tolist(), ol.tolist(), on.tolist()))
        assert got == _ref_keyed_sweep(codes, starts, lasts, counts, gap)


def test_stream_sessions_distributed_matches_replay(ray_session):
    import ray.data as rd

    from approximate_quantiles_ray.engine.streaming import (
        stream_sessions,
        stream_sessions_distributed,
    )

    rng = np.random.default_rng(11)
    n = 5000
    tbl = pa.table(
        {
            "k": rng.integers(0, 40, n),
            "ts": rng.integers(0, 10_000_000, n).astype("int64"),
        }
    )
    ds = rd.from_arrow(tbl).repartition(8)
    gap = 50_000
    replay = stream_sessions(ds, ["k"], ts_col="ts", gap_us=gap, allowed_lateness_us=1 << 62)
    replay = replay.sort_values(["k", "session_start_us"]).reset_index(drop=True)
    for cap in (1 << 22, 0):  # driver sweep AND the Ray sort+stitch path
        dist = stream_sessions_distributed(ds, ["k"], ts_col="ts", gap_us=gap, driver_cap=cap)
        pd.testing.assert_frame_equal(
            dist.astype({"k": np.int64}),
            replay[["k", "session_start_us", "session_end_us", "n_events"]].astype(
                {"k": np.int64}
            ),
            check_dtype=False,
        )


def test_stream_sessions_distributed_multi_key(ray_session):
    import ray.data as rd

    from approximate_quantiles_ray.engine.streaming import (
        stream_sessions,
        stream_sessions_distributed,
    )

    rng = np.random.default_rng(13)
    n = 2000
    tbl = pa.table(
        {
            "a": rng.choice(["x", "y", "z"], n),
            "b": rng.integers(0, 5, n),
            "ts": rng.integers(0, 2_000_000, n).astype("int64"),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    gap = 20_000
    replay = stream_sessions(
        ds, ["a", "b"], ts_col="ts", gap_us=gap, allowed_lateness_us=1 << 62
    ).sort_values(["a", "b", "session_start_us"]).reset_index(drop=True)
    dist = stream_sessions_distributed(ds, ["a", "b"], ts_col="ts", gap_us=gap)
    pd.testing.assert_frame_equal(
        dist.astype({"b": np.int64}),
        replay[["a", "b", "session_start_us", "session_end_us", "n_events"]].astype(
            {"b": np.int64}
        ),
        check_dtype=False,
    )


def test_distributed_keyed_stream_equals_sequential(ray_session):
    """Per-block aggregators merged on the driver must reproduce the
    sequential replay exactly — counts AND sketch state — for tumbling
    and sliding windows, on a multi-block, key-partitioned stream."""
    import ray.data as rd

    from approximate_quantiles_ray.engine.streaming import (
        stream_keyed_windows,
        stream_keyed_windows_distributed,
    )

    rng = np.random.default_rng(11)
    n = 40_000
    ts = rng.integers(0, 20 * WINDOW, n)  # unsorted arrival
    tbl = pa.table(
        {
            "ts": pa.array(ts.astype(np.int64), pa.int64()),
            "v": pa.array(rng.lognormal(1, 0.5, n)),
            "u": pa.array(rng.integers(0, 300, n).astype(np.int64)),
            "k": pa.array(np.char.add("t", rng.integers(0, 5, n).astype(str))),
        }
    )
    ds = rd.from_arrow(tbl).repartition(8)
    for slide in (None, WINDOW // 4):
        seq = stream_keyed_windows(
            ds, _specs(), ["k"], batch_size=4096,
            window_us=WINDOW, slide_us=slide, allowed_lateness_us=1 << 62,
        )
        dist = stream_keyed_windows_distributed(
            ds, _specs(), ["k"], batch_size=4096,
            window_us=WINDOW, slide_us=slide,
        )
        assert list(seq.columns) == list(dist.columns)
        pd.testing.assert_frame_equal(
            seq[["window_start_us", "k", "rows"]],
            dist[["window_start_us", "k", "rows"]],
        )
        # sketch merges commute across the partitioning: HLL registers are
        # max-merged (bit-exact under any split); t-digest medians agree
        # within the sketch's own tolerance
        assert np.allclose(seq["u_hll_est"], dist["u_hll_est"], rtol=0.15)
        assert np.allclose(seq["v_td_p50"], dist["v_td_p50"], rtol=0.05)


def test_distributed_stream_count_only_fast_path(ray_session):
    import ray.data as rd

    from approximate_quantiles_ray.engine.streaming import (
        stream_keyed_windows,
        stream_keyed_windows_distributed,
    )

    rng = np.random.default_rng(12)
    n = 20_000
    tbl = pa.table(
        {
            "ts": pa.array(rng.integers(0, 10 * WINDOW, n).astype(np.int64), pa.int64()),
            "k": pa.array(np.char.add("e", rng.integers(0, 3, n).astype(str))),
        }
    )
    ds = rd.from_arrow(tbl).repartition(6)
    seq = stream_keyed_windows(
        ds, [], ["k"], window_us=WINDOW, allowed_lateness_us=1 << 62
    )
    dist = stream_keyed_windows_distributed(ds, [], ["k"], window_us=WINDOW)
    pd.testing.assert_frame_equal(
        seq[["window_start_us", "k", "rows"]], dist[["window_start_us", "k", "rows"]]
    )
    assert dist["rows"].sum() == n


def test_distributed_global_stream_equals_sequential(ray_session):
    import ray.data as rd

    from approximate_quantiles_ray.engine.streaming import stream_windows_distributed

    rng = np.random.default_rng(13)
    n = 40_000
    tbl = pa.table(
        {
            "ts": pa.array(rng.integers(0, 20 * WINDOW, n).astype(np.int64), pa.int64()),
            "v": pa.array(rng.lognormal(1, 0.5, n)),
            "u": pa.array(rng.integers(0, 300, n).astype(np.int64)),
        }
    )
    ds = rd.from_arrow(tbl).repartition(8)
    seq = stream_windows(
        ds, _specs(), batch_size=4096, window_us=WINDOW, allowed_lateness_us=1 << 62
    )
    dist = stream_windows_distributed(ds, _specs(), batch_size=4096, window_us=WINDOW)
    assert list(seq.columns) == list(dist.columns)
    pd.testing.assert_frame_equal(
        seq[["window_start_us", "rows"]], dist[["window_start_us", "rows"]]
    )
    assert dist["rows"].sum() == n
    # HLL register max-merge is bit-exact under any partitioning; the
    # t-digest median agrees within the sketch's own tolerance
    assert np.allclose(seq["u_hll_est"], dist["u_hll_est"], rtol=1e-12)
    assert np.allclose(seq["v_td_p50"], dist["v_td_p50"], rtol=0.05)


def test_distributed_global_stream_count_only(ray_session):
    import ray.data as rd

    from approximate_quantiles_ray.engine.streaming import stream_windows_distributed

    rng = np.random.default_rng(14)
    n = 10_000
    tbl = pa.table(
        {"ts": pa.array(rng.integers(0, 6 * WINDOW, n).astype(np.int64), pa.int64())}
    )
    ds = rd.from_arrow(tbl).repartition(5)
    seq = stream_windows(ds, [], window_us=WINDOW, allowed_lateness_us=1 << 62)
    dist = stream_windows_distributed(ds, [], window_us=WINDOW)
    pd.testing.assert_frame_equal(
        seq[["window_start_us", "rows"]], dist[["window_start_us", "rows"]]
    )
    assert dist["rows"].sum() == n


def test_resumable_replay_matches_one_shot(ray_session, tmp_path):
    """Kill-and-resume: a checkpoint written mid-replay must let a
    re-run produce EXACTLY the one-shot result (counts bit-equal,
    sketch estimates identical via identical fold order)."""
    import ray.data as rd

    from approximate_quantiles_ray.engine.streaming import (
        replay_config_sig,
        save_stream_state,
        stream_windows_resumable,
    )

    rng = np.random.default_rng(33)
    n = 30_000
    tbl = _batch(
        rng.integers(0, 12 * WINDOW, n),
        rng.lognormal(1, 0.5, n),
        rng.integers(0, 200, n),
    )
    ds = rd.from_arrow(tbl)
    ck = str(tmp_path / "stream.ckpt")
    one_shot = stream_windows(
        ds, _specs(), batch_size=4096, window_us=WINDOW, allowed_lateness_us=1 << 62
    )
    # simulate a job killed after 3 batches: fold them, checkpoint, stop
    agg = StreamingWindowAggregator(_specs(), window_us=WINDOW, allowed_lateness_us=1 << 62)
    rows = []
    for i, b in enumerate(ds.iter_batches(batch_format="pyarrow", batch_size=4096)):
        rows.extend(agg.push(b))
        if i == 2:
            break
    sig = replay_config_sig(
        _specs(), None, 4096, dict(window_us=WINDOW, allowed_lateness_us=1 << 62)
    )
    save_stream_state(agg, rows, 3, ck, config_sig=sig)
    resumed = stream_windows_resumable(
        ds, _specs(), ck, every_n_batches=2, batch_size=4096,
        window_us=WINDOW, allowed_lateness_us=1 << 62,
    )
    pd.testing.assert_frame_equal(one_shot, resumed)
    # completed checkpoint → rerun replays nothing and returns the same
    again = stream_windows_resumable(
        ds, _specs(), ck, every_n_batches=2, batch_size=4096,
        window_us=WINDOW, allowed_lateness_us=1 << 62,
    )
    pd.testing.assert_frame_equal(one_shot, again)
    # changed parameters must NOT resume stale state: a different
    # window width with the same checkpoint path starts fresh
    changed = stream_windows_resumable(
        ds, _specs(), ck, every_n_batches=2, batch_size=4096,
        window_us=2 * WINDOW, allowed_lateness_us=1 << 62,
    )
    assert (np.diff(changed["window_start_us"]) >= 2 * WINDOW).all()
    assert changed["rows"].sum() == one_shot["rows"].sum()


def test_resumable_keyed_replay(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.engine.streaming import (
        stream_keyed_windows,
        stream_windows_resumable,
    )

    rng = np.random.default_rng(34)
    n = 20_000
    tbl = pa.table(
        {
            "ts": pa.array(rng.integers(0, 8 * WINDOW, n).astype(np.int64), pa.int64()),
            "k": pa.array(np.char.add("t", rng.integers(0, 4, n).astype(str))),
        }
    )
    ds = rd.from_arrow(tbl)
    ck = str(tmp_path / "keyed.ckpt")
    one_shot = stream_keyed_windows(
        ds, [], ["k"], batch_size=4096, window_us=WINDOW, allowed_lateness_us=1 << 62
    )
    resumed = stream_windows_resumable(
        ds, [], ck, every_n_batches=2, batch_size=4096, keyed=["k"],
        window_us=WINDOW, allowed_lateness_us=1 << 62,
    )
    pd.testing.assert_frame_equal(one_shot, resumed)
    # resume after "kill": wipe nothing — checkpoint at batch 4 exists;
    # corrupt the file and verify a fresh run still works
    with open(ck, "wb") as f:
        f.write(b"garbage")
    try:
        fresh = stream_windows_resumable(
            ds, [], ck, every_n_batches=2, batch_size=4096, keyed=["k"],
            window_us=WINDOW, allowed_lateness_us=1 << 62,
        )
    except Exception:
        import pytest

        pytest.fail("corrupt checkpoint must fall back to a fresh replay")
    pd.testing.assert_frame_equal(one_shot, fresh)


def test_streaming_windowed_ddsketch_guarantee():
    """Composition: DDSketch as a per-window streaming spec — each
    finalized window's p50 carries the alpha guarantee vs the exact
    per-window selection, and window partial-merge stays bit-exact."""
    import math

    from approximate_quantiles_ray.sketches.ddsketch import DDSketch

    specs = [SketchSpec(key="v_dd", factory=lambda: DDSketch(alpha=0.01), on="v")]
    rng = np.random.default_rng(23)
    n = 6_000
    ts = np.sort(rng.integers(0, 5 * WINDOW, n))
    vals = rng.lognormal(2.0, 1.0, n)
    agg = StreamingWindowAggregator(specs, window_us=WINDOW, allowed_lateness_us=1 << 60)
    for i in range(0, n, 512):
        agg.push(_batch(ts[i:i + 512], vals[i:i + 512], np.zeros(min(512, n - i))))
    done = {w["window_start_us"]: w for w in agg.flush()}
    for wstart in np.unique((ts // WINDOW) * WINDOW):
        sel = (ts // WINDOW) * WINDOW == wstart
        v = np.sort(vals[sel])
        sk = done[int(wstart)]["v_dd"]
        assert sk.count == len(v)
        true = float(v[min(int(math.floor(0.5 * len(v) + 0.5)), len(v) - 1)])
        assert abs(sk.est_value_at_quantile(0.5) - true) <= 0.0101 * true


def test_stream_sessions_distributed_bridge_intervals(ray_session):
    """Regression: a long session from one sort block can BRIDGE two
    non-adjacent intervals of a later block. The old stitch forwarded
    only each block's first/last interval per key, so the bridged
    middle interval stayed 'final' and the merge was missed whenever
    the sort happened to split there (load-dependent flake). The fix
    sweeps all locally-collapsed rows once on the driver — exact for
    every block layout, so this must pass for ANY repartitioning.

    Pattern per key (gap=50k): a dense run [0, 1.085M] plus points at
    1.02M / 1.08M / 1.14M. Truth: the run bridges the first two
    (1.085M within gap of both) while 1.14M stays separate →
    exactly 2 sessions per key with n_events = n_run + 2 and 1.
    """
    import ray.data as rd

    from approximate_quantiles_ray.engine.streaming import (
        stream_sessions,
        stream_sessions_distributed,
    )

    gap = 50_000
    n_keys = 64
    run = np.arange(0, 1_085_001, 40_000, dtype=np.int64)  # dense: steps < gap
    extras = np.array([1_020_000, 1_080_000, 1_140_000], np.int64)
    ts = np.concatenate([run, extras])
    keys = np.repeat(np.arange(n_keys, dtype=np.int64), len(ts))
    tbl = pa.table({"k": keys, "ts": np.tile(ts, n_keys)})

    replay = stream_sessions(
        rd.from_arrow(tbl).repartition(4), ["k"], ts_col="ts", gap_us=gap,
        allowed_lateness_us=1 << 62,
    ).sort_values(["k", "session_start_us"]).reset_index(drop=True)
    assert len(replay) == 2 * n_keys  # the pattern itself: 2 sessions/key

    for n_parts in (2, 7, 16, 64):
        dist = stream_sessions_distributed(
            rd.from_arrow(tbl).repartition(n_parts), ["k"], ts_col="ts",
            gap_us=gap, driver_cap=0,  # force the sort path
        )
        pd.testing.assert_frame_equal(
            dist.astype({"k": np.int64}),
            replay[["k", "session_start_us", "session_end_us", "n_events"]].astype(
                {"k": np.int64}
            ),
            check_dtype=False,
        )


def test_sessions_dataset_matches_replay(ray_session):
    """sessions_dataset (groupby-finish, nothing on the driver) must
    equal the replay oracle exactly — single and multi key."""
    import ray.data as rd

    from approximate_quantiles_ray.engine.streaming import (
        sessions_dataset,
        stream_sessions,
    )

    rng = np.random.default_rng(23)
    n = 4000
    tbl = pa.table(
        {
            "k": rng.integers(0, 30, n),
            "g": rng.integers(0, 3, n),
            "ts": rng.integers(0, 8_000_000, n).astype("int64"),
        }
    )
    ds = rd.from_arrow(tbl).repartition(6)
    for keys in (["k"], ["k", "g"]):
        replay = stream_sessions(
            ds, keys, ts_col="ts", gap_us=40_000, allowed_lateness_us=1 << 62
        )[keys + ["session_start_us", "session_end_us", "n_events"]]
        got = (
            sessions_dataset(ds, keys, ts_col="ts", gap_us=40_000)
            .to_pandas()
            .sort_values(keys + ["session_start_us"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({k: np.int64 for k in keys}),
            replay.sort_values(keys + ["session_start_us"])
            .reset_index(drop=True)
            .astype({k: np.int64 for k in keys}),
            check_dtype=False,
        )


def test_tree_merge_multi_round_equals_sequential(ray_session):
    """Force the log-depth blob reduction through MULTIPLE tree rounds
    (32 blocks, fanin=3 → at least two distributed merge rounds) and
    check it reproduces the sequential replay — exact counts, window
    set, and sketch estimates within sketch tolerance — for both the
    global and the keyed engine. This is the r4-verdict item 1 gate:
    the driver must only ever fold ≤ fanin blobs."""
    import ray.data as rd

    from approximate_quantiles_ray.engine.streaming import (
        stream_keyed_windows,
        stream_keyed_windows_distributed,
        stream_windows_distributed,
    )

    rng = np.random.default_rng(31)
    n = 60_000
    tbl = pa.table(
        {
            "ts": pa.array(rng.integers(0, 24 * WINDOW, n).astype(np.int64), pa.int64()),
            "v": pa.array(rng.lognormal(1, 0.5, n)),
            "u": pa.array(rng.integers(0, 400, n).astype(np.int64)),
            "k": pa.array(np.char.add("t", rng.integers(0, 4, n).astype(str))),
        }
    )
    ds = rd.from_arrow(tbl).repartition(32)

    seq = stream_windows(
        ds, _specs(), batch_size=4096, window_us=WINDOW, allowed_lateness_us=1 << 62
    )
    dist = stream_windows_distributed(
        ds, _specs(), batch_size=4096, window_us=WINDOW, merge_fanin=3
    )
    pd.testing.assert_frame_equal(
        seq[["window_start_us", "rows"]], dist[["window_start_us", "rows"]]
    )
    assert dist["rows"].sum() == n
    # HLL register max-merge is order-insensitive bit-exact
    assert np.allclose(seq["u_hll_est"], dist["u_hll_est"], rtol=1e-12)
    assert np.allclose(seq["v_td_p50"], dist["v_td_p50"], rtol=0.05)

    kseq = stream_keyed_windows(
        ds, _specs(), ["k"], batch_size=4096,
        window_us=WINDOW, allowed_lateness_us=1 << 62,
    )
    kdist = stream_keyed_windows_distributed(
        ds, _specs(), ["k"], batch_size=4096, window_us=WINDOW, merge_fanin=3
    )
    pd.testing.assert_frame_equal(
        kseq[["window_start_us", "k", "rows"]],
        kdist[["window_start_us", "k", "rows"]],
    )
    assert np.allclose(kseq["u_hll_est"], kdist["u_hll_est"], rtol=1e-12)
    assert np.allclose(kseq["v_td_p50"], kdist["v_td_p50"], rtol=0.05)


def test_tree_merge_empty_stream(ray_session):
    """Empty input → empty frame with the stable schema, through the
    tree path (no blobs at all → fresh aggregator on the driver)."""
    import ray.data as rd

    from approximate_quantiles_ray.engine.streaming import stream_windows_distributed

    tbl = pa.table(
        {
            "ts": pa.array([], pa.int64()),
            "v": pa.array([], pa.float64()),
            "u": pa.array([], pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl)
    out = stream_windows_distributed(ds, _specs(), window_us=WINDOW, merge_fanin=2)
    assert len(out) == 0
    assert list(out.columns) == ["window_start_us", "rows", "v_td_p50", "u_hll_est"]


def test_window_engines_null_columns_fall_back_correctly():
    """Nulls in a spec column disable the batch fast path (slicing a
    null-dropped array would misalign groups) — the per-group ingest
    fallback must produce the same estimates as feeding the non-null
    values directly. Covers global and keyed engines."""
    from approximate_quantiles_ray.engine.streaming import (
        KeyedStreamingWindowAggregator,
        StreamingWindowAggregator,
    )

    rng = np.random.default_rng(11)
    n = 40_000
    ts = rng.integers(0, 4 * WINDOW, n).astype(np.int64)
    v = rng.lognormal(1, 0.5, n)
    u = rng.integers(0, 5_000, n).astype(np.int64)
    null_mask = rng.random(n) < 0.15
    v_nullable = pa.compute.if_else(pa.array(~null_mask), pa.array(v), pa.scalar(None, pa.float64()))
    k = np.char.add("g", (u % 3).astype(str))
    tbl = pa.table({"ts": pa.array(ts, pa.int64()), "v": v_nullable,
                    "u": pa.array(u), "k": pa.array(k)})

    agg = StreamingWindowAggregator(_specs(), window_us=WINDOW,
                                    allowed_lateness_us=1 << 62)
    for off in range(0, n, 4096):
        agg.push(tbl.slice(off, 4096))
    rows = agg.flush()
    assert sum(r["rows"] for r in rows) == n  # row counts ignore value nulls
    # oracle: per-window t-digest over the NON-NULL values only
    for r in rows:
        w = r["window_start_us"]
        sel = ((ts // WINDOW) * WINDOW == w) & ~null_mask
        want = np.quantile(v[sel], 0.5)
        got = r["v_td"].est_value_at_quantile(0.5)
        assert abs(got - want) / want < 0.05
        # HLL column has no nulls → exercised through the fast path
        exact_u = len(np.unique(u[(ts // WINDOW) * WINDOW == w]))
        assert abs(r["u_hll"].estimate() - exact_u) / exact_u < 0.05

    kagg = KeyedStreamingWindowAggregator(_specs(), ["k"], window_us=WINDOW,
                                          allowed_lateness_us=1 << 62)
    for off in range(0, n, 4096):
        kagg.push(tbl.slice(off, 4096))
    krows = kagg.flush()
    assert sum(r["rows"] for r in krows) == n
    for r in krows[:6]:
        w, key = r["window_start_us"], r["k"]
        sel = ((ts // WINDOW) * WINDOW == w) & (k == key) & ~null_mask
        want = np.quantile(v[sel], 0.5)
        got = r["v_td"].est_value_at_quantile(0.5)
        assert abs(got - want) / max(want, 1e-9) < 0.08


def test_tree_merge_fanin_one_terminates(ray_session):
    """merge_fanin=1 (public kwarg) used to spin forever — one blob per
    block emits one row per block, so the row count never shrank. The
    tree reducer now floors the per-block row budget at 2×unit."""
    import ray.data as rd

    from approximate_quantiles_ray.engine.streaming import (
        stream_windows_distributed,
    )
    from approximate_quantiles_ray.engine.udaf import sketch_columns_streaming

    rng = np.random.default_rng(5)
    n = 4_000
    tbl = pa.table(
        {
            "ts": pa.array(rng.integers(0, 4 * WINDOW, n).astype(np.int64), pa.int64()),
            "v": pa.array(rng.normal(size=n)),
            "u": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        }
    )
    ds = rd.from_arrow(tbl).repartition(16)
    out = stream_windows_distributed(
        ds, _specs(), batch_size=256, window_us=WINDOW, merge_fanin=1
    )
    assert out["rows"].sum() == n
    merged = sketch_columns_streaming(ds, _specs(), batch_size=256, merge_fanin=1)
    assert sum(sk.count for sk in merged.values()) > 0


def test_window_aggregator_pickle_sheds_probe_caps():
    """The per-spec probe sketches (KBs of zeroed HLL registers each)
    must not ride inside tree-merge blobs; caps rebuild lazily after
    unpickle and the fast path still works."""
    from ray import cloudpickle as cp

    from approximate_quantiles_ray.engine.streaming import StreamingWindowAggregator

    agg = StreamingWindowAggregator(_specs(), ts_col="ts", window_us=WINDOW,
                                    allowed_lateness_us=1 << 62)
    blob_fresh = cp.dumps(agg)
    agg2 = cp.loads(blob_fresh)
    assert agg2._caps is None  # shed from the pickle
    rng = np.random.default_rng(11)
    n = 3_000
    tbl = pa.table(
        {
            "ts": pa.array(rng.integers(0, 2 * WINDOW, n).astype(np.int64), pa.int64()),
            "v": pa.array(rng.normal(size=n)),
            "u": pa.array(rng.integers(0, 40, n).astype(np.int64)),
        }
    )
    agg2.push(tbl)  # lazy caps rebuild + fast path
    ref = StreamingWindowAggregator(_specs(), ts_col="ts", window_us=WINDOW,
                                    allowed_lateness_us=1 << 62)
    ref.push(tbl)
    got = {w: {k: v for k, v in st.items()} for w, st in agg2.open.items()}
    assert set(got) == set(ref.open)
    for w in ref.open:
        assert np.array_equal(
            got[w]["u_hll"].registers, ref.open[w]["u_hll"].registers
        )
