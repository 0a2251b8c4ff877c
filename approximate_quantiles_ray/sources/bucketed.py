"""Bucketed table layout: partition once by hash(key), reuse forever.

The 100 TB play for key-local computations (SURVEY.md §7: "pick ONE
partitioning key and reuse it across stages"): pay one explicit shuffle
to write the table partitioned by ``hash(conv_id) % n_buckets``
(``bucket=K/`` directories). Every later per-conversation computation —
inter-turn latency, per-conv ordering checks, conv-grouped sketches —
then runs as an embarrassingly parallel map over buckets: each task owns
whole conversations, sorts locally, and reduces to KB-size sketch
partials. No global range shuffle, no block-boundary stitching, and a
failed run can recompute per bucket (the layout doubles as the resume
unit).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from approximate_quantiles_ray.functions.hashing import hash_strings


def write_bucketed(ds, out_dir: str, key: str = "conv_id", n_buckets: int = 32):
    """One-time layout shuffle: append bucket = hash(key) % n, write
    Parquet partitioned by bucket (out_dir/bucket=K/...)."""

    def add_bucket(tbl: pa.Table) -> pa.Table:
        h = hash_strings(tbl.column(key).combine_chunks())
        return tbl.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int32))
        )

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    bucketed.write_parquet(out_dir, partition_cols=["bucket"])
    return out_dir


def bucket_dirs(root: str) -> list[str]:
    return sorted(glob.glob(os.path.join(root, "bucket=*")))


def ensure_bucketed(
    table_dir: str,
    key: str = "conv_id",
    n_buckets: int = 32,
    cache_root: str = "/tmp/aqr_buckets",
) -> str:
    """Build-once cached bucket layout for a Parquet table.

    The cache key fingerprints the source files (name, mtime, size) plus
    the layout parameters, so a changed table gets a fresh layout while
    repeated queries against the same table reuse one shuffle. The
    layout is written to a temp dir and atomically renamed, with a
    manifest as the completeness marker — a killed build is invisible.
    At warehouse scale run ``jobs bucketize`` once explicitly instead
    and point consumers at its output; this helper is the same layout
    with an automatic lifecycle for interactive use.
    """
    import hashlib
    import json

    if os.path.isfile(table_dir):  # single-file tables (the testdata shape)
        files = [table_dir]
    else:
        files = sorted(glob.glob(os.path.join(table_dir, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files under {table_dir}")
    stamp = [(os.path.basename(f), os.path.getmtime(f), os.path.getsize(f)) for f in files]
    fp = hashlib.sha256(
        json.dumps([stamp, key, n_buckets]).encode()
    ).hexdigest()[:16]
    base = os.path.basename(table_dir.rstrip("/"))
    out = os.path.join(cache_root, f"{base}-{key}-{n_buckets}-{fp}")
    manifest = os.path.join(out, "_MANIFEST.json")
    if os.path.exists(manifest):
        return out

    from approximate_quantiles_ray.sources.read import read_parquet_sized

    os.makedirs(cache_root, exist_ok=True)
    tmp = f"{out}.tmp-{os.getpid()}"
    write_bucketed(read_parquet_sized(table_dir), tmp, key=key, n_buckets=n_buckets)
    with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
        json.dump({"source": table_dir, "key": key, "n_buckets": n_buckets}, f)
    try:
        os.rename(tmp, out)
    except OSError:  # lost a build race — the other layout is identical
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out


class BucketLatencySketcher:
    """map_batches task over bucket directories: read one bucket, local
    (conv, turn) sort, vectorized gap diff, per-bucket sketch partials.

    Buckets hold whole conversations by construction, so the gap
    computation is complete without any cross-task reconciliation.
    Worker-cached task stage (engine/stages.py) — factories travel via
    one ``ray.put`` ref, so repeated reports pay no actor-pool spin-up.
    """

    def __init__(self, factories_ref, scale: float = 1e-6):
        import ray

        self.factories = (
            ray.get(factories_ref)
            if isinstance(factories_ref, ray.ObjectRef)
            else factories_ref
        )
        self.scale = scale

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_keys, out_states = [], []
        for d in batch.column("path").to_pylist():
            tbl = pq.read_table(
                d, columns=["conv_id", "turn_idx", "ts"], use_threads=False
            )
            conv = tbl.column("conv_id").combine_chunks().to_numpy(zero_copy_only=False)
            turn = tbl.column("turn_idx").combine_chunks().to_numpy(zero_copy_only=False)
            ts = tbl.column("ts").combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            order = np.lexsort((turn, conv))
            conv, ts = conv[order], ts[order]
            same = conv[1:] == conv[:-1]
            gaps = (ts[1:] - ts[:-1])[same].astype(np.float64) * self.scale
            for key, factory in self.factories.items():
                sk = factory()
                if len(gaps):
                    sk.update(gaps)
                out_keys.append(key)
                out_states.append(sk.to_bytes())
        return pa.table(
            {
                "sketch_key": pa.array(out_keys, pa.string()),
                "state": pa.array(out_states, pa.binary()),
            }
        )


def latency_sketches_bucketed(bucket_root: str, specs, scale: float = 1e-6):
    """Per-conversation latency sketches over a bucketed layout — zero
    shuffles (the layout already paid it). Returns {key: merged sketch}."""
    import ray
    import ray.data as rd

    from approximate_quantiles_ray.engine.stages import worker_cached_stage
    from approximate_quantiles_ray.sketches.base import sketch_from_bytes

    dirs = bucket_dirs(bucket_root)
    if not dirs:
        raise ValueError(f"no bucket=* dirs under {bucket_root}")
    factories_ref = ray.put({s.key: s.factory for s in specs})
    parts = rd.from_items([{"path": d} for d in dirs]).map_batches(
        worker_cached_stage(BucketLatencySketcher, factories_ref=factories_ref, scale=scale),
        batch_format="pyarrow",
        batch_size=1,
    )
    merged: dict = {}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for key, state in zip(b.column("sketch_key").to_pylist(), b.column("state").to_pylist()):
            sk = sketch_from_bytes(state)
            merged[key] = merged[key].merge(sk) if key in merged else sk
    for s in specs:
        if s.key not in merged:
            merged[s.key] = s.factory()
    return merged


class BucketGapHist:
    """map_batches task over bucket dirs: read one bucket, local
    (conv, turn) lexsort, vectorized inter-turn gap diff, reduce to the
    bucket's distinct (gap_us, n) value counts. Buckets hold whole
    conversations by construction, so no block-boundary gaps exist —
    the histogram partials are complete without any stitching."""

    def __init__(self, key: str = "conv_id", order: str = "turn_idx", ts: str = "ts"):
        self.key = key
        self.order = order
        self.ts = ts

    def __call__(self, batch: pa.Table) -> pa.Table:
        gap_col, n_col = [], []
        for d in batch.column("path").to_pylist():
            tbl = pq.read_table(d, columns=[self.key, self.order, self.ts], use_threads=False)
            if tbl.num_rows < 2:
                continue
            conv = tbl.column(self.key).combine_chunks().to_numpy(zero_copy_only=False)
            turn = tbl.column(self.order).combine_chunks().to_numpy(zero_copy_only=False)
            ts = (
                tbl.column(self.ts)
                .combine_chunks()
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            order = np.lexsort((turn, conv))
            conv, ts = conv[order], ts[order]
            same = conv[1:] == conv[:-1]
            gaps = (ts[1:] - ts[:-1])[same]
            if not len(gaps):
                continue
            vals, counts = np.unique(gaps, return_counts=True)
            gap_col.append(vals)
            n_col.append(counts.astype(np.int64))
        if not gap_col:
            return pa.table(
                {"gap_us": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "gap_us": pa.array(np.concatenate(gap_col)),
                "n": pa.array(np.concatenate(n_col)),
            }
        )


def gap_hist_bucketed(bucket_root: str, key: str = "conv_id",
                      order: str = "turn_idx", ts: str = "ts"):
    """Distributed (gap_us, n) histogram partials over a bucketed layout
    — zero shuffles and zero boundary stitching (vs the global range
    sort of engine/segmented.segmented_gap_hist). Feed the returned
    Dataset to relational.quantiles_from_histogram(pre_grouped=False)."""
    import ray.data as rd

    from approximate_quantiles_ray.engine.stages import worker_cached_stage

    dirs = bucket_dirs(bucket_root)
    if not dirs:
        raise ValueError(f"no bucket=* dirs under {bucket_root}")
    return rd.from_items([{"path": d} for d in dirs]).map_batches(
        worker_cached_stage(BucketGapHist, key=key, order=order, ts=ts),
        batch_format="pyarrow",
        batch_size=1,
    )


class BucketGroupedSketcher:
    """map_batches task over bucket dirs: per-group sketches WITHOUT a
    shuffle — groups are wholly contained in their bucket (bucket key =
    hash(group key)), so a local pyarrow group_by + per-group sketch
    build inside the bucket is globally correct."""

    def __init__(self, cfg_ref):
        import ray

        cfg = ray.get(cfg_ref) if isinstance(cfg_ref, ray.ObjectRef) else cfg_ref
        self.group_key = cfg["group_key"]
        self.specs = cfg["specs"]
        self.columns = cfg["columns"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"group": [], "sketch_key": [], "state": []}
        for d in batch.column("path").to_pylist():
            tbl = pq.read_table(d, columns=self.columns, use_threads=False)
            if tbl.num_rows == 0:  # stale/empty bucket dir
                continue
            keys = tbl.column(self.group_key).combine_chunks().to_numpy(zero_copy_only=False)
            order = np.argsort(keys, kind="stable")
            sorted_tbl = tbl.take(pa.array(order))
            skeys = keys[order]
            starts = np.flatnonzero(
                np.concatenate(([True], skeys[1:] != skeys[:-1]))
            )
            ends = np.append(starts[1:], len(skeys))
            for s, e in zip(starts, ends):
                group_tbl = sorted_tbl.slice(int(s), int(e - s))
                cache: dict = {}
                for spec in self.specs:
                    sk = spec.build(group_tbl, cache)
                    out["group"].append(skeys[s])
                    out["sketch_key"].append(spec.key)
                    out["state"].append(sk.to_bytes())
        return pa.table(
            {
                # inferred type: group keys may be int64, string, ...
                "group": pa.array(out["group"]),
                "sketch_key": pa.array(out["sketch_key"], pa.string()),
                "state": pa.array(out["state"], pa.binary()),
            }
        )


def grouped_sketches_bucketed(bucket_root: str, group_key: str, specs,
                              columns: list[str]):
    """Per-group sketches over a layout bucketed BY THE GROUP KEY —
    zero shuffles (vs grouped_sketches' hash shuffle). Returns a pandas
    DataFrame [group, <spec.key state bytes>...]. Groups never straddle
    buckets, so no cross-task merge is needed at all."""
    import ray
    import ray.data as rd

    from approximate_quantiles_ray.engine.stages import worker_cached_stage

    dirs = bucket_dirs(bucket_root)
    if not dirs:
        raise ValueError(f"no bucket=* dirs under {bucket_root}")
    cfg_ref = ray.put({"group_key": group_key, "specs": specs, "columns": columns})
    parts = rd.from_items([{"path": d} for d in dirs]).map_batches(
        worker_cached_stage(BucketGroupedSketcher, cfg_ref=cfg_ref),
        batch_format="pyarrow",
        batch_size=1,
    ).to_pandas()
    wide = parts.pivot(index="group", columns="sketch_key", values="state").reset_index()
    wide.columns.name = None
    return wide.rename(columns={"group": group_key})


class BucketTransitions:
    """map_batches task over bucket dirs: read one bucket, local
    (conv, turn) lexsort, count adjacent same-conv (prev, nxt) value
    pairs. Buckets own whole conversations, so per-bucket counts are
    complete — zero shuffle, zero boundary stitching (the bucketed twin
    of engine/segmented.segmented_transitions)."""

    def __init__(self, key: str = "conv_id", order: str = "turn_idx", val: str = "role"):
        self.key = key
        self.order = order
        self.val = val

    def __call__(self, batch: pa.Table) -> pa.Table:
        prev_all, nxt_all, n_all = [], [], []
        for d in batch.column("path").to_pylist():
            tbl = pq.read_table(d, columns=[self.key, self.order, self.val], use_threads=False)
            if tbl.num_rows < 2:
                continue
            conv = tbl.column(self.key).combine_chunks().to_numpy(zero_copy_only=False)
            turn = tbl.column(self.order).combine_chunks().to_numpy(zero_copy_only=False)
            val = tbl.column(self.val).combine_chunks().to_numpy(zero_copy_only=False)
            order = np.lexsort((turn, conv))
            conv, val = conv[order], val[order]
            same = conv[1:] == conv[:-1]
            uvals, codes = np.unique(val, return_inverse=True)
            pair = codes[:-1][same] * len(uvals) + codes[1:][same]
            upair, cnt = np.unique(pair, return_counts=True)
            prev_all.append(uvals[upair // len(uvals)])
            nxt_all.append(uvals[upair % len(uvals)])
            n_all.append(cnt.astype(np.int64))
        if not prev_all:
            return pa.table(
                {"prev": pa.array([], pa.string()), "nxt": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "prev": pa.array(np.concatenate(prev_all), pa.string()),
                "nxt": pa.array(np.concatenate(nxt_all), pa.string()),
                "n": pa.array(np.concatenate(n_all)),
            }
        )


def transitions_bucketed(bucket_root: str, key: str = "conv_id",
                         order: str = "turn_idx", val: str = "role"):
    """Distributed (prev, nxt, n) transition partials over a bucketed
    layout; fold with a small groupby-sum (≤ #buckets × alphabet² rows)."""
    import ray.data as rd

    from approximate_quantiles_ray.engine.stages import worker_cached_stage

    dirs = bucket_dirs(bucket_root)
    if not dirs:
        raise ValueError(f"no bucket=* dirs under {bucket_root}")
    return rd.from_items([{"path": d} for d in dirs]).map_batches(
        worker_cached_stage(BucketTransitions, key=key, order=order, val=val),
        batch_format="pyarrow",
        batch_size=1,
    )


class BucketConvFingerprints:
    """map_batches task over bucket dirs: order-sensitive 64-bit
    conversation fingerprint per conv — fp(conv) = Σ_turns
    splitmix64(hash(text)) · B^position (mod 2^64), a polynomial hash
    in the turn ORDER (position = rank of the turn within its
    conversation, so two identical conversations match even if their
    absolute turn_idx values are shifted). Reordered turns (and of
    course edited text) change the fingerprint; a different
    partitioning of the same conversation cannot (buckets own whole
    conversations). Emits one (conv_id, fp) row per conversation."""

    _B = np.uint64(0x9E3779B97F4A7C15)  # odd → invertible mod 2^64

    def __init__(self, key: str = "conv_id", order: str = "turn_idx", text: str = "text"):
        self.key = key
        self.order = order
        self.text = text

    def __call__(self, batch: pa.Table) -> pa.Table:
        from approximate_quantiles_ray.functions.hashing import hash_strings, splitmix64

        convs, fps = [], []
        for d in batch.column("path").to_pylist():
            tbl = pq.read_table(d, columns=[self.key, self.order, self.text], use_threads=False)
            if not tbl.num_rows:
                continue
            conv = tbl.column(self.key).combine_chunks().to_numpy(zero_copy_only=False)
            turn = tbl.column(self.order).combine_chunks().to_numpy(zero_copy_only=False)
            h = splitmix64(hash_strings(tbl.column(self.text), seed=11))
            order = np.lexsort((turn, conv))
            conv, h = conv[order], h[order]
            first = np.concatenate([[True], conv[1:] != conv[:-1]])
            starts = np.flatnonzero(first)
            counts = np.diff(np.append(starts, len(conv)))
            pos = np.arange(len(conv), dtype=np.uint64) - np.repeat(
                starts.astype(np.uint64), counts
            )
            with np.errstate(over="ignore"):
                term = h * _pow_u64(self._B, pos)
                fp = np.add.reduceat(term, starts)
            convs.append(conv[starts])
            fps.append(fp.astype(np.int64))
        if not convs:
            return pa.table(
                {"conv_id": pa.array([], pa.string()), "fp": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "conv_id": pa.array(np.concatenate(convs), pa.string()),
                "fp": pa.array(np.concatenate(fps)),
            }
        )


def _pow_u64(base: np.uint64, exp: np.ndarray) -> np.ndarray:
    """Vectorized base**exp (mod 2^64) by square-and-multiply over the
    exponent bits (exp < 2^20 in practice — ≤ 20 rounds)."""
    result = np.ones(len(exp), np.uint64)
    b = base
    e = exp.copy()
    with np.errstate(over="ignore"):
        while e.any():
            odd = (e & np.uint64(1)).astype(bool)
            result[odd] *= b
            b = b * b
            e >>= np.uint64(1)
    return result


def conv_fingerprints_bucketed(bucket_root: str, key: str = "conv_id",
                               order: str = "turn_idx", text: str = "text"):
    """Distributed (conv_id, fp) rows over a bucketed layout — one
    complete fingerprint per conversation, zero shuffle."""
    import ray.data as rd

    from approximate_quantiles_ray.engine.stages import worker_cached_stage

    dirs = bucket_dirs(bucket_root)
    if not dirs:
        raise ValueError(f"no bucket=* dirs under {bucket_root}")
    return rd.from_items([{"path": d} for d in dirs]).map_batches(
        worker_cached_stage(BucketConvFingerprints, key=key, order=order, text=text),
        batch_format="pyarrow",
        batch_size=1,
    )


class CoBucketJoiner:
    """map_batches task over PAIRED bucket dirs: read bucket i of two
    layouts bucketed by the SAME key function and join them locally
    with Arrow's C++ hash join — matching keys land in the same bucket
    index by construction, so the join needs NO shuffle at query time.
    ``post_fn`` (optional, top-level or None) reduces each bucket's
    join output before it leaves the task (project/aggregate partials)
    so corpus-scale join rows never materialize as a Dataset."""

    def __init__(self, left_key: str, right_key: str, columns_left=None,
                 columns_right=None, how: str = "inner", post_fn_ref=None):
        import ray

        self.left_key = left_key
        self.right_key = right_key
        self.columns_left = columns_left
        self.columns_right = columns_right
        self.how = how
        # the reducer travels as a ray.put ref (functions can't be
        # cache-keyed by value; the ref hex is the stable key)
        self.post_fn = (
            ray.get(post_fn_ref) if isinstance(post_fn_ref, ray.ObjectRef) else post_fn_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for la, lb in zip(
            batch.column("left").to_pylist(), batch.column("right").to_pylist()
        ):
            lt = pq.read_table(
                la,
                columns=list(self.columns_left) if self.columns_left else None,
                use_threads=False,
            )
            rt = pq.read_table(
                lb,
                columns=list(self.columns_right) if self.columns_right else None,
                use_threads=False,
            )
            j = lt.join(
                rt, keys=[self.left_key], right_keys=[self.right_key],
                join_type=self.how,
            )
            outs.append(self.post_fn(j) if self.post_fn else j)
        if not outs:
            raise ValueError("empty bucket-pair batch")
        return pa.concat_tables(outs, promote_options="default")


def cobucket_join(left_root: str, right_root: str, left_key: str, right_key: str,
                  columns_left=None, columns_right=None, how: str = "inner",
                  post_fn=None):
    """Zero-shuffle equi-join of two layouts bucketed by the same key
    hash (``write_bucketed`` with equal n_buckets): one task per bucket
    pair, Arrow hash join inside the task. The 100 TB plan this
    encodes: pay the partitioning shuffle ONCE per table (jobs
    `bucketize`), then every subsequent join/group on that key is
    embarrassingly parallel. Both layouts must use the same
    ``hash_strings``-based bucket function and bucket count (checked).
    """
    import ray
    import ray.data as rd

    from approximate_quantiles_ray.engine.stages import worker_cached_stage

    ld, rdirs = bucket_dirs(left_root), bucket_dirs(right_root)
    if len(ld) != len(rdirs) or not ld:
        raise ValueError(
            f"bucket layouts disagree: {len(ld)} vs {len(rdirs)} buckets "
            f"under {left_root} / {right_root}"
        )
    for a, b in zip(ld, rdirs):
        if os.path.basename(a) != os.path.basename(b):
            raise ValueError(f"bucket mismatch: {a} vs {b}")
    # a layout bucketed by the WRONG column has matching counts and dir
    # names but silently drops every cross-bucket match — verify the
    # manifest (written by ensure_bucketed) records the expected keys
    for root, key in ((left_root, left_key), (right_root, right_key)):
        mf = os.path.join(root, "_MANIFEST.json")
        if os.path.exists(mf):
            import json

            meta = json.load(open(mf))
            if meta.get("key") != key:
                raise ValueError(
                    f"{root} is bucketed by {meta.get('key')!r}, not the "
                    f"join key {key!r} — rebuild the layout on the join key"
                )
    pairs = [{"left": a, "right": b} for a, b in zip(ld, rdirs)]
    return rd.from_items(pairs).map_batches(
        worker_cached_stage(
            CoBucketJoiner,
            left_key=left_key, right_key=right_key,
            columns_left=tuple(columns_left) if columns_left else None,
            columns_right=tuple(columns_right) if columns_right else None,
            how=how, post_fn_ref=ray.put(post_fn) if post_fn else None,
        ),
        batch_format="pyarrow",
        batch_size=1,
    )
