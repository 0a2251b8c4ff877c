"""Streaming tumbling windows with watermarks and late-data handling.

The reference has no time semantics (SURVEY.md §2.6); this provides the
streaming-shaped counterpart to pipelines/windows.py for unbounded /
micro-batch ingestion (e.g. ``iter_batches`` over a growing table, a
Kafka-ish feed, or replaying a Parquet table in event-time order).

Semantics (standard dataflow-model):

- events are assigned to tumbling windows of ``window_us``;
- the watermark is ``max(event_ts seen) − allowed_lateness_us``;
- a window FINALIZES (is emitted) once the watermark passes its end;
- events older than the watermark that arrive after their window
  finalized are **late**: counted and routed to a side output rather
  than silently dropped or incorrectly merged.

State per open window is a dict of mergeable sketches (same SketchSpec
machinery as everything else), so memory is O(open windows × sketch
size) regardless of stream length — and because sketches merge, two
StreamingWindowAggregators fed disjoint partitions of a stream can have
their per-window states merged (partitioned streaming), which is the
multi-node story.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from approximate_quantiles_ray.engine.udaf import batch_fast_values, spec_probe_caps


class StreamingWindowAggregator:
    """Consume pyarrow batches; emit finalized windows as they close.

    Parameters
    ----------
    specs : list[SketchSpec]
        sketches maintained per window.
    ts_col : str
        event-time column (timestamp or int64 µs).
    window_us / allowed_lateness_us : int
        tumbling window width and watermark lag, microseconds.
    """

    def __init__(self, specs, ts_col: str = "ts", window_us: int = 3_600_000_000,
                 allowed_lateness_us: int = 600_000_000):
        self.specs = list(specs)
        self.ts_col = ts_col
        self.window_us = int(window_us)
        self.lateness = int(allowed_lateness_us)
        self.open: dict[int, dict[str, Any]] = {}  # window_start_us -> sketches
        self.open_counts: dict[int, int] = {}
        self.watermark: int = -(1 << 62)
        self.finalized: set[int] = set()
        self.late_rows = 0
        self.total_rows = 0
        # per-spec (seed, has_update_prehashed, probe) for the batch
        # fast path; dropped from pickles (see __getstate__) — the probe
        # instance can be KBs of zeroed registers per spec, pure dead
        # weight in every tree-merge blob
        self._caps = {s.key: spec_probe_caps(s) for s in self.specs}

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_caps"] = None  # rebuilt lazily from specs after unpickle
        return state

    @property
    def caps(self) -> dict:
        if self._caps is None:
            self._caps = {s.key: spec_probe_caps(s) for s in self.specs}
        return self._caps

    def _ts_us(self, tbl: pa.Table) -> np.ndarray:
        col = tbl.column(self.ts_col).combine_chunks()
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.int64())
        return col.to_numpy(zero_copy_only=False).astype(np.int64)

    def _window_of(self, ts_us: np.ndarray) -> np.ndarray:
        return (ts_us // self.window_us) * self.window_us

    def push(self, tbl: pa.Table) -> list[dict[str, Any]]:
        """Feed one batch; returns windows finalized by the advancing
        watermark (list of {window_start_us, rows, <spec sketches>})."""
        if tbl.num_rows:
            ts = self._ts_us(tbl)
            self.total_rows += len(ts)
            win = self._window_of(ts)
            # late = the event's window already closed under the CURRENT
            # watermark (evaluated before this batch advances it)
            on_time = (win + self.window_us) > self.watermark
            self.late_rows += int((~on_time).sum())
            ot_idx = np.flatnonzero(on_time)
            if len(ot_idx):
                # ONE stable argsort + permutation take, then zero-copy
                # slices per window — instead of a full-table boolean
                # filter per window (O(#windows × rows) mask passes)
                order = np.argsort(win[ot_idx], kind="stable")
                sorted_win = win[ot_idx][order]
                perm = tbl.take(pa.array(ot_idx[order]))
                # one extraction (and one hash) per batch; groups ingest
                # zero-copy numpy slices — see udaf.batch_fast_values
                fast = batch_fast_values(self.specs, perm, self.caps)
                starts = np.flatnonzero(
                    np.concatenate(([True], sorted_win[1:] != sorted_win[:-1]))
                )
                ends = np.append(starts[1:], len(sorted_win))
                for s0, e0 in zip(starts, ends):
                    w = int(sorted_win[s0])
                    n_g = int(e0 - s0)
                    state = self.open.setdefault(w, {})
                    self.open_counts[w] = self.open_counts.get(w, 0) + n_g
                    sub = None
                    cache: dict = {}
                    for spec in self.specs:
                        # ingest into the EXISTING sketch: build-then-merge
                        # allocated a fresh sketch (HLL: 4 KB of zeroed
                        # registers) per (window, batch) just to throw it away
                        sk = state.get(spec.key)
                        if sk is None:
                            sk = state[spec.key] = spec.factory()
                        fv = fast.get(spec.key)
                        if fv is None:
                            if sub is None:
                                sub = perm.slice(s0, n_g)
                            spec.ingest(sk, sub, cache)
                        elif fv[0] == "precomputed":
                            sk.update_precomputed(fv[1][0][s0:e0], fv[1][1][s0:e0])
                        elif fv[0] == "prehashed":
                            sk.update_prehashed(fv[1][s0:e0])
                        elif e0 > s0:
                            sk.update(fv[1][s0:e0])
            self.watermark = max(self.watermark, int(ts.max()) - self.lateness)
        return self._drain()

    def _drain(self) -> list[dict[str, Any]]:
        out = []
        for w in sorted(self.open):
            if w + self.window_us <= self.watermark:
                state = self.open.pop(w)
                out.append(
                    {"window_start_us": w, "rows": self.open_counts.pop(w), **state}
                )
                self.finalized.add(w)
        return out

    def flush(self) -> list[dict[str, Any]]:
        """End-of-stream: finalize every remaining open window."""
        self.watermark = 1 << 62
        return self._drain()

    def compact_states(self) -> None:
        """Compact every open state's lazy buffers (t-digest pending
        points/centroids) down to the sketch's O(parameter) footprint.
        Called before each ``cp.dumps`` on the distributed paths so a
        shipped blob is O(windows × keys × sketch size) — withOUT this,
        a t-digest ships up to ``flush_size`` (64Ki) RAW float64 points
        per state and a tree-merge round moves nearly as many bytes as
        it received (measured: 66 MB final blobs on a 16M-row/4096-block
        keyed smoke vs ~2 MB compacted). Compaction is the sketch's own
        ε-bounded operation; the partitioned result already differs from
        sequential replay only within sketch ε, which the invariance
        tests assert with rtol."""
        for state in self.open.values():
            for sk in state.values():
                m = getattr(sk, "_materialize", None)
                if m is not None:
                    m()

    def merge(self, other: "StreamingWindowAggregator") -> "StreamingWindowAggregator":
        """Merge another partition's open state (partitioned streaming).

        A window the receiver ALREADY finalized must not re-open (it was
        emitted; re-emitting with the other partition's rows would
        double-count downstream): its rows are routed to the late
        counter, exactly like late single events. For loss-free
        partitioned streaming, merge before draining — e.g. feed
        partitions with auto-drain disabled (huge allowed_lateness) and
        flush once after the merge.
        """
        for w, state in other.open.items():
            if w in self.finalized:
                self.late_rows += other.open_counts[w]
                continue
            mine = self.open.setdefault(w, {})
            for key, sk in state.items():
                if key in mine:
                    mine[key].merge(sk)
                else:
                    mine[key] = sk
            self.open_counts[w] = self.open_counts.get(w, 0) + other.open_counts[w]
        # symmetric case: the OTHER side already emitted w → our open rows
        # for w can no longer be merged into an emission; they are late
        for w in [w for w in self.open if w in other.finalized]:
            self.late_rows += self.open_counts.pop(w)
            del self.open[w]
        self.finalized |= other.finalized
        self.watermark = max(self.watermark, other.watermark)
        self.late_rows += other.late_rows
        self.total_rows += other.total_rows
        return self


class KeyedStreamingWindowAggregator:
    """Per-key tumbling OR sliding/hopping windows with watermarks and
    late-data accounting (the shapes a real feed pipeline asks for after
    global tumbling — round-2 VERDICT item 6).

    - ``key_cols``: state is kept per (key tuple, window start); the
      watermark is global (event time is one stream), so a window
      finalizes for ALL keys at once.
    - ``slide_us``: window stride. Equal to ``window_us`` (default) →
      tumbling; a divisor of it → sliding/hopping, where each event
      belongs to ``window_us // slide_us`` windows. An (event, window)
      assignment whose window already finalized is late — counted
      per key in ``late_by_key`` (an event can be late for its oldest
      sliding window and on time for newer ones).

    Memory is O(open windows × live keys × sketch size); partitioned
    aggregators merge with the same already-finalized ⇒ late routing
    rules as the global engine.
    """

    def __init__(self, specs, key_cols: list[str], ts_col: str = "ts",
                 window_us: int = 3_600_000_000, slide_us: int | None = None,
                 allowed_lateness_us: int = 600_000_000):
        self.specs = list(specs)
        self.key_cols = list(key_cols)
        self.ts_col = ts_col
        self.window_us = int(window_us)
        self.slide = int(slide_us) if slide_us else self.window_us
        if self.window_us % self.slide != 0:
            raise ValueError("window_us must be a multiple of slide_us")
        self.n_per = self.window_us // self.slide
        self.lateness = int(allowed_lateness_us)
        self.open: dict[tuple, dict[str, Any]] = {}  # (wstart, *keys) -> sketches
        self.open_counts: dict[tuple, int] = {}
        self.watermark: int = -(1 << 62)
        self.finalized: set[int] = set()  # window starts
        self.late_by_key: dict[tuple, int] = {}
        self.total_rows = 0
        # per-spec (seed, has_update_prehashed, probe) for the batch
        # fast path; dropped from pickles (see __getstate__) — the probe
        # instance can be KBs of zeroed registers per spec, pure dead
        # weight in every tree-merge blob
        self._caps = {s.key: spec_probe_caps(s) for s in self.specs}

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_caps"] = None  # rebuilt lazily from specs after unpickle
        return state

    @property
    def caps(self) -> dict:
        if self._caps is None:
            self._caps = {s.key: spec_probe_caps(s) for s in self.specs}
        return self._caps

    _ts_us = StreamingWindowAggregator._ts_us
    # same open[*][spec_key] → sketch layout, same lazy-buffer concern
    compact_states = StreamingWindowAggregator.compact_states

    def push(self, tbl: pa.Table) -> list[dict[str, Any]]:
        if tbl.num_rows:
            ts = self._ts_us(tbl)
            self.total_rows += len(ts)
            keys = [
                tbl.column(c).combine_chunks().to_numpy(zero_copy_only=False)
                for c in self.key_cols
            ]
            base = (ts // self.slide) * self.slide
            for i in range(self.n_per):
                win = base - i * self.slide
                on_time = (win + self.window_us) > self.watermark
                if not on_time.all():
                    late_idx = np.flatnonzero(~on_time)
                    lk = list(zip(*(k[late_idx] for k in keys))) if keys else [()] * len(late_idx)
                    for t in lk:
                        self.late_by_key[t] = self.late_by_key.get(t, 0) + 1
                idx = np.flatnonzero(on_time)
                if not len(idx):
                    continue
                # group assignment rows by (window, key...) — one pandas
                # groupby per batch×offset; #groups is bounded by
                # (#windows in batch × live keys), not rows
                gdf = pd.DataFrame({"_w": win[idx]})
                for c, k in zip(self.key_cols, keys):
                    gdf[c] = k[idx]
                grouped = gdf.groupby(["_w"] + self.key_cols, sort=False)
                if not self.specs:
                    # count-only fast path: one vectorized size() per
                    # batch×offset, no per-group row materialization
                    for gval, n in grouped.size().items():
                        gval = gval if isinstance(gval, tuple) else (gval,)
                        skey = (int(gval[0]), *gval[1:])
                        self.open.setdefault(skey, {})
                        self.open_counts[skey] = self.open_counts.get(skey, 0) + int(n)
                    continue
                # ONE permutation take (group index arrays concatenated),
                # then zero-copy slices per group — an Arrow take per
                # (window, key) group paid per-call overhead × #groups
                items = list(grouped.indices.items())
                order = np.concatenate([g for _, g in items])
                perm = tbl.take(pa.array(idx[order]))
                # one extraction (and one hash) per batch×offset; groups
                # ingest zero-copy numpy slices (udaf.batch_fast_values)
                fast = batch_fast_values(self.specs, perm, self.caps)
                off = 0
                for gval, gidx in items:
                    gval = gval if isinstance(gval, tuple) else (gval,)
                    skey = (int(gval[0]), *gval[1:])
                    n_g = len(gidx)
                    state = self.open.setdefault(skey, {})
                    self.open_counts[skey] = self.open_counts.get(skey, 0) + n_g
                    sub = None
                    cache: dict = {}
                    for spec in self.specs:
                        # ingest into the EXISTING sketch — build+merge
                        # paid a fresh-sketch allocation per
                        # (window, key, batch); with many small groups
                        # that allocation dominated the keyed replay
                        sk = state.get(spec.key)
                        if sk is None:
                            sk = state[spec.key] = spec.factory()
                        fv = fast.get(spec.key)
                        if fv is None:
                            if sub is None:
                                sub = perm.slice(off, n_g)
                            spec.ingest(sk, sub, cache)
                        elif fv[0] == "precomputed":
                            sk.update_precomputed(
                                fv[1][0][off:off + n_g], fv[1][1][off:off + n_g]
                            )
                        elif fv[0] == "prehashed":
                            sk.update_prehashed(fv[1][off:off + n_g])
                        elif n_g:
                            sk.update(fv[1][off:off + n_g])
                    off += n_g
            self.watermark = max(self.watermark, int(ts.max()) - self.lateness)
        return self._drain()

    def _drain(self) -> list[dict[str, Any]]:
        out = []
        for skey in sorted(self.open, key=lambda t: (t[0], tuple(map(str, t[1:])))):
            w = skey[0]
            if w + self.window_us <= self.watermark:
                state = self.open.pop(skey)
                row = {"window_start_us": w, "rows": self.open_counts.pop(skey)}
                row.update(dict(zip(self.key_cols, skey[1:])))
                row.update(state)
                out.append(row)
                self.finalized.add(w)
        return out

    def flush(self) -> list[dict[str, Any]]:
        self.watermark = 1 << 62
        return self._drain()

    @property
    def late_rows(self) -> int:
        return sum(self.late_by_key.values())

    def merge(self, other: "KeyedStreamingWindowAggregator") -> "KeyedStreamingWindowAggregator":
        """Partitioned-streaming merge; same double-count rules as the
        global engine, applied per (key, window) state."""
        for skey, state in other.open.items():
            if skey[0] in self.finalized:
                t = skey[1:]
                self.late_by_key[t] = self.late_by_key.get(t, 0) + other.open_counts[skey]
                continue
            mine = self.open.setdefault(skey, {})
            for key, sk in state.items():
                if key in mine:
                    mine[key].merge(sk)
                else:
                    mine[key] = sk
            self.open_counts[skey] = self.open_counts.get(skey, 0) + other.open_counts[skey]
        for skey in [s for s in self.open if s[0] in other.finalized]:
            t = skey[1:]
            self.late_by_key[t] = self.late_by_key.get(t, 0) + self.open_counts.pop(skey)
            del self.open[skey]
        self.finalized |= other.finalized
        self.watermark = max(self.watermark, other.watermark)
        for t, n in other.late_by_key.items():
            self.late_by_key[t] = self.late_by_key.get(t, 0) + n
        self.total_rows += other.total_rows
        return self


class SessionStreamAggregator:
    """Keyed SESSION windows (inactivity-gap based) with watermarks —
    the mergeable-window case of the dataflow model: an event extends a
    session when it lands within ``gap_us`` of its span, and one event
    can MERGE two open sessions into one.

    State per key: sorted disjoint sessions (start, last, count),
    re-swept vectorized on every push (argsort + cummax-based interval
    merge — no per-event Python). A session FINALIZES once the
    watermark passes ``last + gap`` (no on-time event can extend it).
    An event is late when ``ts + gap ≤ watermark`` — any session it
    could have extended has already finalized; counted per key. Note
    the standard early-firing divergence: under a TIGHT watermark an
    on-time event arriving after its neighbor-session finalized starts
    a fresh session where an unbounded-lateness replay would have
    merged them — with unbounded lateness the result is exact (that is
    the oracle configuration).

    ``merge`` unions another partition's open sessions and re-sweeps;
    sessions overlapping a span the receiver already finalized route to
    the late counter (same double-count rule as the window engines) —
    for loss-free partitioned streaming, merge before draining.
    """

    def __init__(self, key_cols: list[str], ts_col: str = "ts",
                 gap_us: int = 1_800_000_000, allowed_lateness_us: int = 600_000_000):
        self.key_cols = list(key_cols)
        self.ts_col = ts_col
        self.gap = int(gap_us)
        self.lateness = int(allowed_lateness_us)
        # key tuple -> (starts, lasts, counts) sorted disjoint np arrays
        self.open: dict[tuple, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        self.finalized_until: dict[tuple, int] = {}
        self.watermark: int = -(1 << 62)
        self.late_by_key: dict[tuple, int] = {}
        self.total_rows = 0

    _ts_us = StreamingWindowAggregator._ts_us

    @staticmethod
    def _sweep(starts, lasts, counts, gap):
        """Merge overlapping-within-gap intervals (vectorized)."""
        order = np.argsort(starts, kind="stable")
        s, l_, c = starts[order], lasts[order], counts[order]
        cummax = np.maximum.accumulate(l_)
        new_grp = np.ones(len(s), bool)
        new_grp[1:] = s[1:] > cummax[:-1] + gap
        gidx = np.flatnonzero(new_grp)
        gends = np.append(gidx[1:], len(s))
        out_s = s[gidx]
        out_l = np.array([l_[a:b].max() for a, b in zip(gidx, gends)], np.int64)
        out_c = np.add.reduceat(c, gidx)
        return out_s, out_l, out_c

    def push(self, tbl: pa.Table) -> list[dict[str, Any]]:
        if tbl.num_rows:
            ts = self._ts_us(tbl)
            self.total_rows += len(ts)
            keys = [
                tbl.column(c).combine_chunks().to_numpy(zero_copy_only=False)
                for c in self.key_cols
            ]
            late = (ts + self.gap) <= self.watermark
            if late.any():
                li = np.flatnonzero(late)
                for t in zip(*(k[li] for k in keys)) if keys else [()] * len(li):
                    self.late_by_key[t] = self.late_by_key.get(t, 0) + 1
            idx = np.flatnonzero(~late)
            if len(idx):
                gdf = pd.DataFrame({c: k[idx] for c, k in zip(self.key_cols, keys)})
                gdf["_i"] = idx
                for gval, gidx in gdf.groupby(self.key_cols, sort=False).indices.items():
                    t = gval if isinstance(gval, tuple) else (gval,)
                    ets = ts[idx[gidx]].astype(np.int64)
                    s0, l0, c0 = self.open.get(
                        t,
                        (np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64)),
                    )
                    self.open[t] = self._sweep(
                        np.concatenate([s0, ets]),
                        np.concatenate([l0, ets]),
                        np.concatenate([c0, np.ones(len(ets), np.int64)]),
                        self.gap,
                    )
            self.watermark = max(self.watermark, int(ts.max()) - self.lateness)
        return self._drain()

    def _drain(self) -> list[dict[str, Any]]:
        out = []
        for t in sorted(self.open, key=lambda k: tuple(map(str, k))):
            s, l_, c = self.open[t]
            done = (l_ + self.gap) <= self.watermark
            if not done.any():
                continue
            for i in np.flatnonzero(done):
                row = {
                    "session_start_us": int(s[i]),
                    "session_end_us": int(l_[i]),
                    "n_events": int(c[i]),
                }
                row.update(dict(zip(self.key_cols, t)))
                out.append(row)
            self.finalized_until[t] = max(
                self.finalized_until.get(t, -(1 << 62)), int(l_[done].max()) + self.gap
            )
            keep = ~done
            if keep.any():
                self.open[t] = (s[keep], l_[keep], c[keep])
            else:
                del self.open[t]
        return out

    def flush(self) -> list[dict[str, Any]]:
        self.watermark = 1 << 62
        return self._drain()

    @property
    def late_rows(self) -> int:
        return sum(self.late_by_key.values())

    def merge(self, other: "SessionStreamAggregator") -> "SessionStreamAggregator":
        for t, (s, l_, c) in other.open.items():
            cut = self.finalized_until.get(t, -(1 << 62))
            clash = s < cut
            if clash.any():
                self.late_by_key[t] = self.late_by_key.get(t, 0) + int(c[clash].sum())
            if (~clash).any():
                s0, l0, c0 = self.open.get(
                    t, (np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64))
                )
                self.open[t] = self._sweep(
                    np.concatenate([s0, s[~clash]]),
                    np.concatenate([l0, l_[~clash]]),
                    np.concatenate([c0, c[~clash]]),
                    self.gap,
                )
        # symmetric: our sessions inside the other's finalized spans
        for t in list(self.open):
            cut = other.finalized_until.get(t, -(1 << 62))
            s, l_, c = self.open[t]
            clash = s < cut
            if clash.any():
                self.late_by_key[t] = self.late_by_key.get(t, 0) + int(c[clash].sum())
                if (~clash).any():
                    self.open[t] = (s[~clash], l_[~clash], c[~clash])
                else:
                    del self.open[t]
        for t, v in other.finalized_until.items():
            self.finalized_until[t] = max(self.finalized_until.get(t, -(1 << 62)), v)
        for t, n in other.late_by_key.items():
            self.late_by_key[t] = self.late_by_key.get(t, 0) + n
        self.watermark = max(self.watermark, other.watermark)
        self.total_rows += other.total_rows
        return self


def stream_sessions(ds, key_cols: list[str], batch_size: int = 8192,
                    **agg_kwargs) -> pd.DataFrame:
    """Replay a Dataset through the session-window aggregator: one row
    per finalized session (key cols, session_start_us, session_end_us,
    n_events); per-key late counts in ``df.attrs['late_by_key']``."""
    agg = SessionStreamAggregator(key_cols, **agg_kwargs)
    rows: list[dict[str, Any]] = []
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=batch_size):
        rows.extend(agg.push(batch))
    rows.extend(agg.flush())
    if not rows:
        cols = {c: pd.Series(dtype=object) for c in key_cols}
        cols.update(
            session_start_us=pd.Series(dtype=np.int64),
            session_end_us=pd.Series(dtype=np.int64),
            n_events=pd.Series(dtype=np.int64),
        )
        df = pd.DataFrame(cols)
    else:
        df = (
            pd.DataFrame(rows)
            .sort_values(key_cols + ["session_start_us"])
            .reset_index(drop=True)
        )
    df.attrs["late_by_key"] = dict(agg.late_by_key)
    df.attrs["late_rows"] = agg.late_rows
    df.attrs["total_rows"] = agg.total_rows
    return df


def _keyed_interval_sweep(
    codes: np.ndarray,
    starts: np.ndarray,
    lasts: np.ndarray,
    counts: np.ndarray,
    gap: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-key gap-interval merge, fully vectorized across ALL keys.

    Maps every key's intervals onto a disjoint coordinate range
    (``code * span`` offset), then runs ONE global cummax sweep — no
    per-key Python. Falls back to chunking by key code if the offset
    would overflow int64 (spans × #keys ≥ 2^62). Inputs need not be
    sorted; outputs are sorted by (code, start) with disjoint intervals
    per key (gap-exclusive: ``next.start > prev.last + gap``).
    """
    n = len(codes)
    if n == 0:
        z = np.zeros(0, np.int64)
        return z, z, z, z
    gmin = int(starts.min())
    span = int(lasts.max()) - gmin + 2 * int(gap) + 2
    n_codes = int(codes.max()) + 1
    if span * n_codes < (1 << 62):
        off = codes.astype(np.int64) * np.int64(span)
        s = starts.astype(np.int64) - gmin + off
        l_ = lasts.astype(np.int64) - gmin + off
        order = np.argsort(s, kind="stable")
        s, l_, c = s[order], l_[order], counts[order].astype(np.int64)
        cummax = np.maximum.accumulate(l_)
        new_grp = np.ones(n, bool)
        new_grp[1:] = s[1:] > cummax[:-1] + gap
        gidx = np.flatnonzero(new_grp)
        out_s = s[gidx]
        # last of each merged group = running max at the group's end
        gend = np.append(gidx[1:], n) - 1
        out_l = cummax[gend]
        out_c = np.add.reduceat(c, gidx)
        out_codes = (out_s // span).astype(np.int64)
        off_out = out_codes * np.int64(span)
        return out_codes, out_s - off_out + gmin, out_l - off_out + gmin, out_c
    # chunked fallback: process key-code ranges small enough to offset
    chunk = max(1, ((1 << 62) // span) - 1)
    outs = []
    for lo in range(0, n_codes, chunk):
        m = (codes >= lo) & (codes < lo + chunk)
        if not m.any():
            continue
        oc, os_, ol, on = _keyed_interval_sweep(
            codes[m] - lo, starts[m], lasts[m], counts[m], gap
        )
        outs.append((oc + lo, os_, ol, on))
    return tuple(np.concatenate(parts) for parts in zip(*outs))  # type: ignore[return-value]


def sessions_dataset(
    ds,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_us: int = 1_800_000_000,
):
    """Fully-distributed session windows returning a DATASET — the
    100 TB path: per-block interval partials (same reduction as
    ``stream_sessions_distributed``) → ``groupby(key).map_groups``
    sweep, so every key's intervals meet in exactly one group and the
    per-key sweep is exact with NOTHING corpus-sized on the driver.
    Write the result with ``write_parquet``. Partitioning assumption:
    one hash bucket's interval partials fit in a group task (bounded by
    #keys/#buckets × #blocks, not #events — a key with a billion events
    still reduces to ≤ one interval row per block first).

    Keys are hash-bucketed into ~#CPU super-groups and each bucket runs
    ONE vectorized multi-key sweep — grouping by the raw key instead
    would invoke a pandas function per key (measured at 16M turns ×
    540k convs: 21.5 s per-key vs 9.9 s bucketed, same result): the
    shuffle moves identical bytes either way, the per-group call
    overhead was the whole difference.
    """
    import ray

    from approximate_quantiles_ray.functions.hashing import hash_strings, splitmix64

    part = _session_partials_ds(ds, key_cols, ts_col, int(gap_us))

    gap = int(gap_us)
    try:
        n_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    except Exception:
        n_buckets = 16

    def add_bucket(tbl: pa.Table) -> pa.Table:
        h = np.zeros(tbl.num_rows, np.uint64)
        for c in key_cols:
            col = tbl.column(c).combine_chunks()
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                h ^= hash_strings(col)
            else:
                h ^= splitmix64(
                    col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
                )
        return tbl.append_column(
            "_sb", pa.array((h % np.uint64(n_buckets)).astype(np.int32))
        )

    bucketed = part.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_sweep(df: pd.DataFrame) -> pd.DataFrame:
        if len(key_cols) == 1:
            codes, uniq = pd.factorize(df[key_cols[0]].to_numpy())
            uniq_cols = {key_cols[0]: np.asarray(uniq)}
        else:
            codes, uniq = pd.MultiIndex.from_frame(df[key_cols]).factorize()
            uniq_cols = {
                c: np.asarray(uniq.get_level_values(i)) for i, c in enumerate(key_cols)
            }
        oc, os_, ol, on = _keyed_interval_sweep(
            codes.astype(np.int64),
            df["start_us"].to_numpy(np.int64),
            df["last_us"].to_numpy(np.int64),
            df["n"].to_numpy(np.int64),
            gap,
        )
        out = pd.DataFrame({c: uniq_cols[c][oc] for c in key_cols})
        out["session_start_us"] = os_
        out["session_end_us"] = ol
        out["n_events"] = on
        return out

    return bucketed.groupby("_sb").map_groups(bucket_sweep, batch_format="pandas")


def _session_partials_ds(ds, key_cols, ts_col, gap):
    """Per-block reduction shared by both session finishes: events →
    per-key merged intervals (one vectorized sweep per block)."""

    def block_partials(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            cols = {c: tbl.column(c) for c in key_cols}
            cols.update(
                start_us=pa.array([], pa.int64()),
                last_us=pa.array([], pa.int64()),
                n=pa.array([], pa.int64()),
            )
            return pa.table(cols)
        ts = tbl.column(ts_col).combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        ts = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(key_cols) == 1:
            codes, uniq = pd.factorize(
                tbl.column(key_cols[0]).combine_chunks().to_numpy(zero_copy_only=False)
            )
            uniq_cols = {key_cols[0]: np.asarray(uniq)}
        else:
            arrays = [
                tbl.column(c).combine_chunks().to_numpy(zero_copy_only=False)
                for c in key_cols
            ]
            codes, uniq = pd.MultiIndex.from_arrays(arrays).factorize()
            uniq_cols = {
                c: np.asarray(uniq.get_level_values(i)) for i, c in enumerate(key_cols)
            }
        oc, os_, ol, on = _keyed_interval_sweep(
            codes.astype(np.int64), ts, ts, np.ones(len(ts), np.int64), gap
        )
        out = {c: pa.array(uniq_cols[c][oc]) for c in key_cols}
        out.update(start_us=pa.array(os_), last_us=pa.array(ol), n=pa.array(on))
        return pa.table(out)

    return ds.map_batches(block_partials, batch_format="pyarrow", zero_copy_batch=True)


def stream_sessions_distributed(
    ds,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_us: int = 1_800_000_000,
    driver_cap: int = 1 << 22,
) -> pd.DataFrame:
    """DISTRIBUTED session windows — the scale path for
    ``stream_sessions``'s unbounded-lateness (exact) configuration.

    Session windows are MERGEABLE: a session is a gap-connected interval
    union, and interval-union-with-gap is associative and commutative.
    So each block reduces its events to per-key merged intervals
    (one vectorized sweep — ``_keyed_interval_sweep``), only interval
    rows (keys, start, last, n) leave the block, and a fold re-sweeps:

    - ≤ ``driver_cap`` partial rows: one driver-side vectorized sweep;
    - above the cap: Ray range-sort by (key, start) → per-block local
      sweep (collapses almost everything) → one exact driver sweep over
      the collapsed rows.

    For a Dataset (no driver result at all), use ``sessions_dataset`` —
    the groupby(key).map_groups finish. Equals the replay engine
    (``stream_sessions``) exactly when no event is late there — i.e.
    the unbounded-lateness oracle configuration. Tight-watermark
    semantics are inherently arrival-order-dependent and stay on the
    replay engine.
    """
    gap = int(gap_us)

    part = _session_partials_ds(ds, key_cols, ts_col, gap)
    part = part.materialize()
    n_part = part.count()

    def _sweep_df(df: pd.DataFrame) -> pd.DataFrame:
        if len(key_cols) == 1:
            codes, uniq = pd.factorize(df[key_cols[0]].to_numpy())
            uniq_cols = {key_cols[0]: np.asarray(uniq)}
        else:
            codes, uniq = pd.MultiIndex.from_frame(df[key_cols]).factorize()
            uniq_cols = {c: np.asarray(uniq.get_level_values(i)) for i, c in enumerate(key_cols)}
        oc, os_, ol, on = _keyed_interval_sweep(
            codes.astype(np.int64),
            df["start_us"].to_numpy(np.int64),
            df["last_us"].to_numpy(np.int64),
            df["n"].to_numpy(np.int64),
            gap,
        )
        out = pd.DataFrame({c: uniq_cols[c][oc] for c in key_cols})
        out["session_start_us"] = os_
        out["session_end_us"] = ol
        out["n_events"] = on
        return out

    if n_part <= driver_cap:
        out = _sweep_df(part.to_pandas())
    else:
        # range-sort interval rows and LOCALLY sweep each sorted block —
        # that collapses almost everything to final sessions — then one
        # exact driver sweep over the collapsed rows finishes the job.
        # (An earlier version stitched only each block's first/last
        # interval per key; that is WRONG when a long interval from an
        # earlier block bridges two non-adjacent intervals of a later
        # block — the later block's middle interval never reached the
        # stitch. The driver already collected every row in that design,
        # so sweeping them all costs the same and is layout-independent.)
        srt = part.sort(key_cols + ["start_us"])

        def local_sweep(df: pd.DataFrame) -> pd.DataFrame:
            sw = _sweep_df(df)
            return sw.rename(
                columns={
                    "session_start_us": "start_us",
                    "session_end_us": "last_us",
                    "n_events": "n",
                }
            )

        collapsed = srt.map_batches(local_sweep, batch_format="pandas").to_pandas()
        out = _sweep_df(collapsed)

    if not len(out):
        cols = {c: pd.Series(dtype=object) for c in key_cols}
        cols.update(
            session_start_us=pd.Series(dtype=np.int64),
            session_end_us=pd.Series(dtype=np.int64),
            n_events=pd.Series(dtype=np.int64),
        )
        out = pd.DataFrame(cols)
    return out.sort_values(key_cols + ["session_start_us"]).reset_index(drop=True)


def stream_keyed_windows(ds, specs, key_cols: list[str], batch_size: int = 8192,
                         **agg_kwargs) -> pd.DataFrame:
    """Replay a Dataset through the keyed streaming aggregator: one row
    per finalized (window, key) with exact row counts and sketch-derived
    metrics; late counts per key land in ``df.attrs['late_by_key']``."""
    agg = KeyedStreamingWindowAggregator(specs, key_cols, **agg_kwargs)
    rows: list[dict[str, Any]] = []
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=batch_size):
        rows.extend(agg.push(batch))
    rows.extend(agg.flush())
    return _format_keyed_rows(rows, specs, key_cols, agg)


def _format_keyed_rows(rows, specs, key_cols, agg) -> pd.DataFrame:
    out = []
    for r in rows:
        row = {"window_start_us": r["window_start_us"], "rows": r["rows"]}
        for c in key_cols:
            row[c] = r[c]
        for spec in specs:
            sk = r[spec.key]
            if hasattr(sk, "est_value_at_quantile"):
                row[f"{spec.key}_p50"] = sk.est_value_at_quantile(0.5)
            elif getattr(sk, "name", "") == "hll":
                row[f"{spec.key}_est"] = float(sk.estimate())
        out.append(row)
    if not out:
        cols = {"window_start_us": pd.Series(dtype=np.int64),
                "rows": pd.Series(dtype=np.int64)}
        for c in key_cols:
            cols[c] = pd.Series(dtype=object)
        df = pd.DataFrame(cols)
    else:
        df = (
            pd.DataFrame(out)
            .sort_values(["window_start_us"] + key_cols)
            .reset_index(drop=True)
        )
    df.attrs["late_by_key"] = dict(agg.late_by_key)
    df.attrs["late_rows"] = agg.late_rows
    df.attrs["total_rows"] = agg.total_rows
    return df


def _tree_merge_blobs(blobs, make_empty, fanin: int = 64):
    """Log-depth DISTRIBUTED reduction of pickled-aggregator blob rows.

    The r4-verdict finding: ``take_all()`` + a driver loop over #blocks
    blobs is O(#blocks) sequential merges and linear driver memory — at
    10^12-turn scale #blocks is 10^5–10^6 and the driver becomes the
    bottleneck. This helper keeps the reduction on the cluster: while
    more than ``fanin`` blobs remain, repartition to ceil(n/fanin)
    blocks and merge each block's blobs inside one ``map_batches`` task
    (parallel, only KB-sized states move), giving log_fanin(#blocks)
    rounds; the driver then folds the ≤ fanin survivors — O(fanin)
    merges and O(1) blob rows held, regardless of input block count.

    Merge order differs from the sequential fold, which is sound because
    the aggregators' ``merge`` is associative and commutative when no
    window has finalized (workers run with unbounded lateness, so
    ``finalized`` is empty and sketch merges — HLL register max, t-digest
    /KLL concat-compact — commute); partitioning-invariance is covered by
    tests/test_streaming.py.
    """
    from ray import cloudpickle as cp

    from approximate_quantiles_ray.engine.udaf import tree_reduce_rows

    def merge_block(tbl: pa.Table) -> pa.Table:
        agg = None
        for b in tbl.column("blob").to_pylist():
            other = cp.loads(b)
            if agg is None:
                agg = other
            else:
                agg.merge(other)
        if agg is None:
            return pa.table({"blob": pa.array([], pa.large_binary())})
        compact = getattr(agg, "compact_states", None)
        if compact is not None:
            compact()  # blob stays O(states × sketch param) every round
        return pa.table({"blob": pa.array([cp.dumps(agg)], pa.large_binary())})

    mat = tree_reduce_rows(blobs, merge_block, fanin)
    merged = make_empty()
    for row in mat.take_all():
        merged.merge(cp.loads(row["blob"]))
    return merged


def stream_keyed_windows_distributed(ds, specs, key_cols: list[str],
                                     batch_size: int = 8192,
                                     merge_fanin: int = 64,
                                     **agg_kwargs) -> pd.DataFrame:
    """DISTRIBUTED keyed streaming windows: every block replays through
    its OWN :class:`KeyedStreamingWindowAggregator` inside ``map_batches``
    (parallel, streaming, no shuffle — the per-window sketch/count state
    is the only thing leaving a worker), the serialized aggregators
    reduce through a log-depth distributed tree (``_tree_merge_blobs``),
    and the driver flushes the single merged state once.

    This is the multi-node shape of the streaming engine: state size per
    worker is O(open windows × live keys × sketch size) and the driver
    handles O(merge_fanin) × that — never event rows, never #blocks
    blobs. Worker aggregators run with unbounded allowed-lateness so NO
    window finalizes before the merge (finalize-early + merge is where
    partitioned streaming double-counts; the merge rules route such
    state to the late side). Consequently the result is the complete,
    exact window set — equal to the sequential replay with unbounded
    lateness — and per-key late-data accounting is only meaningful on
    the sequential path, where a global arrival order exists.
    """
    from ray import cloudpickle as cp

    kw = dict(agg_kwargs)
    kw["allowed_lateness_us"] = 1 << 62  # workers must never finalize
    kw.pop("batch_size", None)

    def block_replay(tbl: pa.Table) -> pa.Table:
        agg = KeyedStreamingWindowAggregator(specs, key_cols, **kw)
        for off in range(0, tbl.num_rows, batch_size):
            agg.push(tbl.slice(off, batch_size))
        agg.compact_states()  # ship O(states × sketch param), not raw points
        return pa.table({"blob": pa.array([cp.dumps(agg)], pa.large_binary())})

    blobs = ds.map_batches(
        block_replay, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = _tree_merge_blobs(
        blobs,
        lambda: KeyedStreamingWindowAggregator(specs, key_cols, **kw),
        fanin=merge_fanin,
    )
    rows = merged.flush()
    return _format_keyed_rows(rows, specs, key_cols, merged)


def stream_windows(ds, specs, batch_size: int = 8192, **agg_kwargs) -> pd.DataFrame:
    """Replay a Dataset through the streaming aggregator (micro-batch
    driver): returns one row per finalized window with sketch-derived
    metrics, plus the late-row count as an attribute frame column."""
    agg = StreamingWindowAggregator(specs, **agg_kwargs)
    rows: list[dict[str, Any]] = []
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=batch_size):
        rows.extend(agg.push(batch))
    rows.extend(agg.flush())
    return _format_global_rows(rows, specs, agg)


def stream_windows_distributed(ds, specs, batch_size: int = 8192,
                               merge_fanin: int = 64,
                               **agg_kwargs) -> pd.DataFrame:
    """DISTRIBUTED global (non-keyed) streaming windows: each block
    replays through its OWN :class:`StreamingWindowAggregator` inside
    ``map_batches`` (parallel, no shuffle — only the serialized
    per-window sketch/count state leaves a worker), the aggregators
    reduce through a log-depth distributed tree (``_tree_merge_blobs``),
    and the driver flushes the single merged state once.

    Worker aggregators run with unbounded allowed-lateness so NO window
    finalizes before the merge (a pre-merge finalize is exactly the
    double-count case the merge rules route to the late side), making
    the result equal to a sequential replay with unbounded lateness.
    Driver state is O(merge_fanin × open windows × sketch size) — never
    event rows, never #blocks blobs. Mirrors
    :func:`stream_keyed_windows_distributed` for the keyed engine.
    """
    from ray import cloudpickle as cp

    kw = dict(agg_kwargs)
    kw["allowed_lateness_us"] = 1 << 62  # workers must never finalize
    kw.pop("batch_size", None)

    def block_replay(tbl: pa.Table) -> pa.Table:
        agg = StreamingWindowAggregator(specs, **kw)
        for off in range(0, tbl.num_rows, batch_size):
            agg.push(tbl.slice(off, batch_size))
        agg.compact_states()  # ship O(states × sketch param), not raw points
        return pa.table({"blob": pa.array([cp.dumps(agg)], pa.large_binary())})

    blobs = ds.map_batches(
        block_replay, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = _tree_merge_blobs(
        blobs, lambda: StreamingWindowAggregator(specs, **kw), fanin=merge_fanin
    )
    rows = merged.flush()
    return _format_global_rows(rows, specs, merged)


def _format_global_rows(rows, specs, agg) -> pd.DataFrame:
    out = []
    for r in rows:
        row = {"window_start_us": r["window_start_us"], "rows": r["rows"]}
        for spec in specs:
            sk = r[spec.key]
            if hasattr(sk, "est_value_at_quantile"):
                row[f"{spec.key}_p50"] = sk.est_value_at_quantile(0.5)
            elif getattr(sk, "name", "") == "hll":
                row[f"{spec.key}_est"] = float(sk.estimate())
        out.append(row)
    if not out:  # empty / all-late stream → empty frame, SAME schema
        cols = {"window_start_us": pd.Series(dtype=np.int64),
                "rows": pd.Series(dtype=np.int64)}
        for spec in specs:
            probe = spec.factory()
            if hasattr(probe, "est_value_at_quantile"):
                cols[f"{spec.key}_p50"] = pd.Series(dtype=float)
            elif getattr(probe, "name", "") == "hll":
                cols[f"{spec.key}_est"] = pd.Series(dtype=float)
        df = pd.DataFrame(cols)
        df.attrs["late_rows"] = agg.late_rows
        df.attrs["total_rows"] = agg.total_rows
        return df
    df = pd.DataFrame(out).sort_values("window_start_us").reset_index(drop=True)
    df.attrs["late_rows"] = agg.late_rows
    df.attrs["total_rows"] = agg.total_rows
    return df


# ------------------------------------------------------------- durable replay


STREAM_CKPT_VERSION = 1


def replay_config_sig(specs, keyed, batch_size: int, agg_kwargs: dict) -> str:
    """Deterministic signature of a resumable replay's parameters —
    stored in the checkpoint so a re-run with different windows/specs/
    batching starts fresh instead of resuming mismatched state."""
    return repr(
        (
            sorted(s.key for s in specs),
            keyed,
            int(batch_size),
            sorted(agg_kwargs.items()),
        )
    )


def save_stream_state(agg, emitted: list, batches_done: int, path: str,
                      config_sig: str = "") -> None:
    """Atomically persist a streaming aggregator mid-replay: serialized
    state + the rows already emitted + the replay offset + the replay
    config signature. tmp+rename — a kill mid-write leaves the
    previous checkpoint intact."""
    import os

    from ray import cloudpickle as cp

    blob = cp.dumps(
        {
            "version": STREAM_CKPT_VERSION,
            "config_sig": config_sig,
            "agg": agg,
            "emitted": emitted,
            "batches_done": int(batches_done),
        }
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_stream_state(path: str, config_sig: str | None = None):
    """Load a checkpoint written by :func:`save_stream_state`; returns
    None when absent/unreadable OR when ``config_sig`` differs from the
    recorded one (changed window/batch/spec parameters must NOT resume
    stale state — same invalidation rule as state/checkpoint.py)."""
    import os

    from ray import cloudpickle as cp

    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            state = cp.loads(f.read())
        if state.get("version") != STREAM_CKPT_VERSION:
            return None
        if config_sig is not None and state.get("config_sig") != config_sig:
            return None
        return state
    except Exception:
        return None  # truncated/corrupt checkpoint → fresh replay


def stream_windows_resumable(ds, specs, checkpoint_path: str,
                             every_n_batches: int = 8,
                             batch_size: int = 8192,
                             keyed: list[str] | None = None,
                             **agg_kwargs) -> pd.DataFrame:
    """Durable micro-batch replay: like :func:`stream_windows` /
    :func:`stream_keyed_windows` but the aggregator state, the windows
    already emitted, and the replay offset checkpoint to disk every
    ``every_n_batches`` batches — a killed job re-run with the same
    arguments resumes from the last checkpoint instead of the start,
    and a completed checkpoint makes the re-run a no-op replaying
    nothing.

    Relies on ``iter_batches`` yielding a deterministic batch sequence
    for the same Dataset + batch_size (row order of the dataset), the
    same property the exactness tests of the sequential replay already
    assume. State size on disk is O(open windows × sketch size) —
    never event rows.
    """
    if keyed is not None:
        agg_cls = lambda: KeyedStreamingWindowAggregator(specs, keyed, **agg_kwargs)  # noqa: E731
    else:
        agg_cls = lambda: StreamingWindowAggregator(specs, **agg_kwargs)  # noqa: E731
    sig = replay_config_sig(specs, keyed, batch_size, agg_kwargs)
    state = load_stream_state(checkpoint_path, config_sig=sig)
    if state is not None:
        agg = state["agg"]
        rows: list = list(state["emitted"])
        done = state["batches_done"]
    else:
        agg = agg_cls()
        rows = []
        done = 0
    i = -1
    for i, batch in enumerate(
        ds.iter_batches(batch_format="pyarrow", batch_size=batch_size)
    ):
        if i < done:
            continue  # already folded into the checkpointed state
        rows.extend(agg.push(batch))
        if (i + 1) % every_n_batches == 0:
            save_stream_state(agg, rows, i + 1, checkpoint_path, config_sig=sig)
    if i + 1 > done:
        save_stream_state(agg, rows, i + 1, checkpoint_path, config_sig=sig)
    rows = rows + agg.flush()
    if keyed is not None:
        return _format_keyed_rows(rows, specs, keyed, agg)
    return _format_global_rows(rows, specs, agg)
