"""Property-based checks of session-interval merging.

The round-4 bridge bug (a long interval spanning a later block's middle
interval) showed gap-merge composition deserves adversarial random
coverage, not just crafted cases:

- the core ``_keyed_interval_sweep`` vs a brute-force python reference
  (pure numpy, no Ray — wide random sweep), and
- the distributed finishes (``stream_sessions_distributed`` at
  driver_cap=0 forcing the sort path, and the ``sessions_dataset``
  groupby finish) vs the same reference through real Ray pipelines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from approximate_quantiles_ray.engine.streaming import _keyed_interval_sweep


def _brute_sessions(keys: np.ndarray, ts: np.ndarray, gap: int) -> pd.DataFrame:
    rows = []
    for k in np.unique(keys):
        t = np.sort(ts[keys == k])
        start, last, n = int(t[0]), int(t[0]), 1
        for x in t[1:]:
            if int(x) - last <= gap:
                last, n = int(x), n + 1
            else:
                rows.append((int(k), start, last, n))
                start, last, n = int(x), int(x), 1
        rows.append((int(k), start, last, n))
    return (
        pd.DataFrame(rows, columns=["k", "session_start_us", "session_end_us", "n_events"])
        .sort_values(["k", "session_start_us"])
        .reset_index(drop=True)
    )


events = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 2000)), min_size=1, max_size=300
)
gaps = st.integers(1, 400)


@settings(max_examples=200, deadline=None)
@given(events, gaps)
def test_interval_sweep_matches_brute_force(evts, gap):
    keys = np.array([k for k, _ in evts], np.int64)
    ts = np.array([t for _, t in evts], np.int64)
    oc, os_, ol, on = _keyed_interval_sweep(
        keys, ts, ts, np.ones(len(ts), np.int64), gap
    )
    got = (
        pd.DataFrame(
            {"k": oc, "session_start_us": os_, "session_end_us": ol, "n_events": on}
        )
        .sort_values(["k", "session_start_us"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    want = _brute_sessions(keys, ts, gap).astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


@settings(max_examples=10, deadline=None)
@given(events, gaps, st.integers(1, 9))
def test_distributed_finishes_match_brute_force(ray_session, evts, gap, n_parts):
    import ray.data as rd

    from approximate_quantiles_ray.engine.streaming import (
        sessions_dataset,
        stream_sessions_distributed,
    )

    keys = np.array([k for k, _ in evts], np.int64)
    ts = np.array([t for _, t in evts], np.int64)
    want = _brute_sessions(keys, ts, gap).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": keys, "ts": ts})).repartition(n_parts)

    dist = stream_sessions_distributed(ds, ["k"], ts_col="ts", gap_us=gap, driver_cap=0)
    pd.testing.assert_frame_equal(dist.astype(np.int64), want)

    got = (
        sessions_dataset(ds, ["k"], ts_col="ts", gap_us=gap)
        .to_pandas()
        .sort_values(["k", "session_start_us"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(got, want)


def _brute_sliding(keys, ts, window, slide):
    """Every event lands in each pane whose [start, start+window) covers
    it; pane starts are multiples of slide."""
    rows = {}
    for k, t in zip(keys, ts):
        t = int(t)
        s = (t // slide) * slide  # latest pane containing t …
        while s > t - window:  # … back to the earliest (may be negative)
            rows[(s, int(k))] = rows.get((s, int(k)), 0) + 1
            s -= slide
    out = pd.DataFrame(
        [(s, k, n) for (s, k), n in rows.items()],
        columns=["window_start_us", "k", "n_events"],
    )
    return out.sort_values(["window_start_us", "k"]).reset_index(drop=True)


@settings(max_examples=10, deadline=None)
@given(events, st.integers(1, 5), st.integers(1, 4))
def test_distributed_sliding_windows_match_brute_force(
    ray_session, evts, slide_mult, n_parts
):
    """stream_keyed_windows_distributed (sliding panes) vs a pane-offset
    brute force, at random slides and partitionings."""
    import ray.data as rd

    from approximate_quantiles_ray.engine.streaming import (
        stream_keyed_windows_distributed,
    )

    slide = slide_mult * 100
    window = slide * 3  # window a multiple of slide, 3 panes per event
    keys = np.array([k for k, _ in evts], np.int64)
    ts = np.array([t for _, t in evts], np.int64)
    want = _brute_sliding(keys, ts, window, slide).astype(np.int64)

    ds = rd.from_arrow(pa.table({"k": keys, "ts": ts})).repartition(n_parts)
    df = stream_keyed_windows_distributed(
        ds, [], ["k"], ts_col="ts", window_us=window, slide_us=slide
    )
    got = (
        pd.DataFrame(
            {
                "window_start_us": df["window_start_us"].astype(np.int64),
                "k": df["k"].astype(np.int64),
                "n_events": df["rows"].astype(np.int64),
            }
        )
        .sort_values(["window_start_us", "k"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
