"""Mergeable sketch UDAFs for Ray Data.

The execution plan mirrors the reference's ``ParTDigest::flush``
(/root/reference/src/t_digest/par_t_digest.rs:59-94): per-shard partial
digests whose states are concatenated and compacted into one — here the
"shards" are Ray Data blocks and the combine is Ray's native
partial-per-block + tree-merge aggregation (``AggregateFnV2``), so a
global sketch needs **no shuffle at all**: every block reduces to a
KB-sized sketch state and only states move.

Two drivers:

- :func:`sketch_columns` — ``ds.aggregate(SketchAggregate(...), ...)``:
  Ray owns the partial/merge topology (global, one result row).
- :func:`grouped_sketches` — ``ds.groupby(key).aggregate(...)``: one
  sketch per group. Per-block partials are built *before* the shuffle,
  so only (group, state) rows shuffle; skewed groups cost one state per
  block, not one row per input row.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from approximate_quantiles_ray.functions.hashing import hash_any
from approximate_quantiles_ray.sketches.base import sketch_from_bytes


def _array_as_numpy(arr) -> np.ndarray:
    """Arrow (chunked) array -> numpy, zero-copy when the type allows."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    try:
        return arr.to_numpy(zero_copy_only=True)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return arr.to_numpy(zero_copy_only=False)


def column_as_numpy(tbl: pa.Table, col: str, drop_nulls: bool = True) -> np.ndarray:
    """Extract a column as a numpy array, zero-copy when the type allows."""
    arr = tbl.column(col)
    if drop_nulls and arr.null_count:
        arr = arr.drop_null()
    return _array_as_numpy(arr)


@dataclass
class SketchSpec:
    """One sketch over one (possibly derived) column.

    ``kind="float"`` feeds float64 values (quantile sketches);
    ``kind="hash"`` feeds 64-bit hashes (HLL / count-min / Bloom — the
    sketch's own seed is applied inside the kernel).
    ``transform(batch) -> np.ndarray`` overrides plain column extraction
    for derived metrics (e.g. text length).
    """

    key: str
    factory: Callable[[], Any]
    on: str | None = None
    transform: Callable[[pa.Table], np.ndarray] | None = None
    kind: str = "float"
    # optional weight column (kind="float" only): the sketch's
    # update_weighted(values, weights) is fed instead of update —
    # quantile positions then run over total weight (pairs with the
    # exact oracle relational.exact_weighted_quantiles)
    weight_on: str | None = None
    # set-semantics sketches (HLL, Bloom) ignore multiplicity: pre-unique
    # the batch (pc.unique, vectorized) so e.g. a conv_id column with ~30
    # turns/conversation feeds ~30× fewer values. NEVER set for
    # multiplicity-sensitive sketches (count-min, quantiles).
    dedup_per_batch: bool = False
    # columns a `transform` touches (projection hint — transforms are
    # opaque, so readers that want a pruned scan need this; plain
    # `on`/`weight_on` specs don't)
    requires: tuple[str, ...] | None = None

    def _cache_key(self):
        return (id(self.transform), self.on, self.kind, self.dedup_per_batch, self.weight_on)

    def extract(self, block: pa.Table, cache: dict | None = None):
        """Column/derived values for this spec. ``kind="hash"`` columns
        stay as Arrow arrays (the hash kernel's fast path — no Python
        object materialization). ``cache`` (shared per batch) dedupes
        identical extractions across specs (e.g. text length feeds both
        the t-digest and the KLL)."""
        key = self._cache_key()
        if cache is not None and key in cache:
            return cache[key]
        if self.transform is not None:
            values = self.transform(block)
        elif self.on is None:
            raise ValueError(f"SketchSpec {self.key!r} needs `on` or `transform`")
        elif self.kind == "hash":
            arr = block.column(self.on)
            if arr.null_count:
                arr = arr.drop_null()
            if self.dedup_per_batch:
                arr = pa.compute.unique(arr)
            values = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        else:
            values = column_as_numpy(block, self.on)
        if cache is not None:
            cache[key] = values
        return values

    def build(self, block: pa.Table, cache: dict | None = None):
        sketch = self.factory()
        return self.ingest(sketch, block, cache)

    def ingest(self, sketch, block: pa.Table, cache: dict | None = None):
        """Feed one block into an EXISTING sketch (incremental form of
        :meth:`build` — lets a reader fold many record batches into one
        deterministic per-file partial)."""
        if self.kind == "float" and self.weight_on is not None:
            # value/weight pairing must survive null dropping TOGETHER:
            # independent per-column drop_null misaligns the pairs when
            # the null positions differ, so filter rows where either
            # side is null before converting.
            if self.transform is not None:
                # derived values are row-aligned with the block; drop
                # null-weight rows BEFORE transforming so pairs stay
                # aligned (transforms must return one value per row)
                blk = block
                wcol = blk.column(self.weight_on)
                if wcol.null_count:
                    blk = blk.filter(pc.is_valid(wcol))
                    wcol = blk.column(self.weight_on)
                values = np.asarray(self.transform(blk), dtype=np.float64)
                if len(values) != blk.num_rows:
                    raise ValueError(
                        f"SketchSpec {self.key!r}: weighted transform must be "
                        f"row-aligned ({len(values)} values for {blk.num_rows} rows)"
                    )
                if len(values):
                    sketch.update_weighted(values, _array_as_numpy(wcol))
                return sketch
            if self.on is None:
                raise ValueError(f"SketchSpec {self.key!r}: weight_on requires `on`")
            pair = block.select([self.on, self.weight_on])
            vcol, wcol = pair.column(0), pair.column(1)
            if vcol.null_count or wcol.null_count:
                mask = pc.and_kleene(pc.is_valid(vcol), pc.is_valid(wcol))
                pair = pair.filter(mask)
                vcol, wcol = pair.column(0), pair.column(1)
            if pair.num_rows:
                sketch.update_weighted(
                    np.asarray(_array_as_numpy(vcol), dtype=np.float64),
                    _array_as_numpy(wcol),
                )
            return sketch
        values = self.extract(block, cache)
        if len(values):
            if self.kind == "float":
                sketch.update(np.asarray(values, dtype=np.float64))
            else:
                sketch.update(values)
        return sketch


def spec_probe_caps(spec: SketchSpec) -> tuple:
    """(seed, has_update_prehashed, probe) of the spec's sketch type,
    read off ONE probe instance — every sketch a spec builds shares the
    factory's config, so the window engines can pre-hash (and for HLL
    pre-bit-crunch) a whole batch once with the right parameters and
    feed counted per-group slices."""
    probe = spec.factory()
    return getattr(probe, "seed", None), hasattr(probe, "update_prehashed"), probe


def batch_fast_values(specs: list[SketchSpec], tbl: pa.Table, caps: dict) -> dict:
    """ROW-ALIGNED per-spec value arrays for group-sliced ingestion.

    The window engines group each batch into many small (window[, key])
    sub-tables; extracting Arrow columns per GROUP costs per-call
    overhead × #groups (measured: ~70% of the keyed replay wall). This
    computes each spec's values ONCE on the (already permuted) batch —
    including the hash pass for pre-hash-capable sketches — so groups
    ingest zero-copy numpy slices.

    Only specs whose semantics survive slicing get an entry; the rest
    fall back to per-group :meth:`SketchSpec.ingest`:
    - ``weight_on`` / ``dedup_per_batch`` specs never (pair-null
      alignment / batch-scope dedup would change results),
    - transform specs only when their ``requires`` columns are
      null-free AND the output is row-aligned (a transform may drop
      nulls itself),
    - plain columns only when null-free (extraction drops nulls, which
      would misalign slices).

    Returns {spec.key: ("prehashed", uint64 hashes) | ("values", arr)}.
    """
    out: dict[str, tuple] = {}
    for spec in specs:
        if spec.weight_on is not None or spec.dedup_per_batch:
            continue
        if spec.transform is not None:
            req = spec.requires
            if not req or any(
                c not in tbl.column_names or tbl.column(c).null_count for c in req
            ):
                continue
            vals = spec.transform(tbl)
            if len(vals) != tbl.num_rows:
                continue  # transform dropped rows — not sliceable
            if spec.kind == "float":
                out[spec.key] = ("values", np.asarray(vals, dtype=np.float64))
            else:
                # sketch hashes each group slice itself, same as ingest
                out[spec.key] = ("values", vals)
        elif (
            spec.on is not None
            and spec.on in tbl.column_names
            and tbl.column(spec.on).null_count == 0
        ):
            if spec.kind == "float":
                out[spec.key] = (
                    "values",
                    np.asarray(
                        column_as_numpy(tbl, spec.on, drop_nulls=False), np.float64
                    ),
                )
            else:
                seed, has_pre, probe = caps[spec.key]
                if not has_pre or seed is None:
                    continue
                arr = tbl.column(spec.on)
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                h = hash_any(arr, seed)
                if hasattr(probe, "precompute_hashed"):
                    # e.g. HLL: (register idx, rho) bit arithmetic done
                    # once per batch; groups only scatter-max slices
                    out[spec.key] = ("precomputed", probe.precompute_hashed(h))
                else:
                    out[spec.key] = ("prehashed", h)
    return out


def required_columns(specs: list[SketchSpec]) -> list[str] | None:
    """Union of input columns the specs read — the projection a pruned
    scan should use. Returns None when some transform carries no
    ``requires`` hint (opaque derivation: caller must read everything)."""
    cols: set[str] = set()
    for s in specs:
        if s.transform is not None and s.requires is None:
            return None
        if s.on:
            cols.add(s.on)
        if s.weight_on:
            cols.add(s.weight_on)
        if s.requires:
            cols.update(s.requires)
    return sorted(cols)


def _as_table(block) -> pa.Table:
    if isinstance(block, pa.Table):
        return block
    return pa.Table.from_pandas(block)


def make_aggregate(spec: SketchSpec):
    """Build an AggregateFnV2 for a sketch spec (lazy Ray import so the
    sketch layer stays importable without Ray)."""
    from ray.data.aggregate import AggregateFnV2

    class SketchAggregate(AggregateFnV2):
        # accumulator type is serialized sketch state (bytes), so partial
        # states sitting in shuffle blocks stay Arrow-native binary
        def __init__(self) -> None:
            super().__init__(
                name=spec.key, zero_factory=lambda: None, on=None, ignore_nulls=True
            )

        def aggregate_block(self, block):
            return spec.build(_as_table(block)).to_bytes()

        def combine(self, a, b):
            if a is None:
                return b
            if b is None:
                return a
            return sketch_from_bytes(a).merge(sketch_from_bytes(b)).to_bytes()

        def finalize(self, acc):
            if acc is None:
                acc = spec.factory().to_bytes()
            return acc

    return SketchAggregate()


def sketch_columns(ds, specs: list[SketchSpec]) -> dict[str, Any]:
    """Global sketches over a Dataset — streaming, shuffle-free.

    Returns {spec.key: merged sketch object}.
    """
    aggs = [make_aggregate(s) for s in specs]
    row = ds.aggregate(*aggs)
    out = {}
    for s in specs:
        # empty datasets can yield a missing/None aggregate value
        state = row.get(s.key) if row else None
        out[s.key] = sketch_from_bytes(state) if state is not None else s.factory()
    return out


def grouped_sketches(ds, group_key: str, specs: list[SketchSpec]):
    """Per-group sketches: Dataset with columns [group_key, *spec keys]
    where each spec column holds serialized sketch state (binary).

    Only per-block partial states shuffle (hash on ``group_key``).
    """
    aggs = [make_aggregate(s) for s in specs]
    return ds.groupby(group_key).aggregate(*aggs)


def grouped_sketches_partial(ds, group_key: str, specs: list[SketchSpec]) -> dict:
    """Grouped sketches for LOW-CARDINALITY group keys (time windows,
    roles): each block sorts locally, slices per-group sub-blocks
    (zero-copy), builds one partial state per (group, spec), and the
    driver folds the #groups × #blocks × #specs states as they stream —
    no hash shuffle at all. Ray's grouped aggregate (grouped_sketches)
    stays the path for high-cardinality keys, where per-block × per-group
    state rows would exceed driver memory.

    Returns {group_value: {spec.key: sketch}}.
    """

    def block_partials(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {"g": tbl.column(group_key) if group_key in tbl.column_names else pa.array([]),
                 "sketch_key": pa.array([], pa.string()),
                 "state": pa.array([], pa.binary())}
            )
        t = tbl.take(pc.sort_indices(tbl.column(group_key)))
        k_np = t.column(group_key).combine_chunks().to_numpy(zero_copy_only=False)
        new = np.ones(len(k_np), bool)
        new[1:] = k_np[1:] != k_np[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k_np))
        g_rows, s_keys, states = [], [], []
        for s0, e0 in zip(starts, ends):
            sub = t.slice(s0, e0 - s0)
            cache: dict = {}
            for spec in specs:
                g_rows.append(int(s0))
                s_keys.append(spec.key)
                states.append(spec.build(sub, cache).to_bytes())
        return pa.table(
            {
                "g": t.column(group_key).take(pa.array(g_rows, pa.int64())),
                "sketch_key": pa.array(s_keys, pa.string()),
                "state": pa.array(states, pa.binary()),
            }
        )

    partials = ds.map_batches(
        block_partials, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    merged: dict = {}
    for tbl in partials.iter_batches(batch_format="pyarrow"):
        gs = tbl.column("g").to_pylist()
        for g, key, state in zip(
            gs, tbl.column("sketch_key").to_pylist(), tbl.column("state").to_pylist()
        ):
            sk = sketch_from_bytes(state)
            slot = merged.setdefault(g, {})
            if key in slot:
                slot[key].merge(sk)
            else:
                slot[key] = sk
    return merged


# ---------------------------------------------------------------- partial rows

PARTIAL_SCHEMA = pa.schema(
    [
        pa.field("sketch_key", pa.string()),
        pa.field("state", pa.binary()),
        pa.field("count", pa.int64()),
    ]
)


class PartialSketcher:
    """map_batches callable: block -> one sketch-state row per spec.

    Used by the checkpointing path (state/checkpoint.py), where we need
    explicit per-shard partial states rather than Ray's opaque
    aggregation tree.
    """

    def __init__(self, specs: list[SketchSpec]):
        self.specs = specs

    def __call__(self, block: pa.Table) -> pa.Table:
        keys, states, counts = [], [], []
        cache: dict = {}  # share derived columns across specs within the batch
        for spec in self.specs:
            sk = spec.build(block, cache)
            keys.append(spec.key)
            states.append(sk.to_bytes())
            counts.append(sk.count)
        return pa.Table.from_arrays(
            [pa.array(keys), pa.array(states, type=pa.binary()), pa.array(counts)],
            schema=PARTIAL_SCHEMA,
        )


def merge_partial_rows(batches) -> dict[str, Any]:
    """Driver-side streaming merge of partial sketch rows.

    ``batches`` is an iterable of pyarrow Tables with PARTIAL_SCHEMA.
    O(#specs) memory — partials stream through and fold immediately.
    """
    merged: dict[str, Any] = {}
    for tbl in batches:
        for key, state in zip(
            tbl.column("sketch_key").to_pylist(), tbl.column("state").to_pylist()
        ):
            sk = sketch_from_bytes(state)
            if key in merged:
                merged[key].merge(sk)
            else:
                merged[key] = sk
    return merged


def _merge_partial_block(tbl: pa.Table) -> pa.Table:
    """One tree-merge round over PARTIAL_SCHEMA rows: fold every state
    in this block per sketch_key, emit one compacted row per key."""
    merged: dict[str, Any] = {}
    for key, state in zip(
        tbl.column("sketch_key").to_pylist(), tbl.column("state").to_pylist()
    ):
        sk = sketch_from_bytes(state)
        if key in merged:
            merged[key].merge(sk)
        else:
            merged[key] = sk
    keys = sorted(merged)
    return pa.Table.from_arrays(
        [
            pa.array(keys),
            pa.array([merged[k].to_bytes() for k in keys], type=pa.binary()),
            pa.array([int(merged[k].count) for k in keys], pa.int64()),
        ],
        schema=PARTIAL_SCHEMA,
    )


def tree_reduce_rows(ds, merge_block, rows_per_block: int, unit: int = 1):
    """Log-depth distributed reduction shared by the sketch-partials and
    streaming-window tree merges: while more than ``rows_per_block``
    rows remain, repartition to ceil(n/rows_per_block) blocks and run
    ``merge_block`` (a whole-block pyarrow reducer) over each — rows only
    shrink by round, the driver never holds them.

    ``unit`` is the irreducible row count a block can emit (1 for
    one-aggregator-per-row blobs, #specs for keyed partial rows): the
    floor ``rows_per_block >= 2*unit`` guarantees every round strictly
    reduces the row count — with fanin 1 a block would emit as many rows
    as it read and the loop would spin forever.
    """
    import math

    rows_per_block = max(2 * max(1, unit), int(rows_per_block))
    mat = ds.materialize()
    n = mat.count()
    tree_reduce_rows.last_rounds = 0  # observability (scale smokes)
    while n > rows_per_block:
        tree_reduce_rows.last_rounds += 1
        mat = (
            mat.repartition(max(1, math.ceil(n / rows_per_block)))
            .map_batches(
                merge_block,
                batch_format="pyarrow",
                batch_size=None,  # whole block per call → true fanin-way merge
                zero_copy_batch=True,
            )
            .materialize()
        )
        n = mat.count()
    return mat


def sketch_columns_streaming(ds, specs: list[SketchSpec], batch_size: int = 65536,
                             merge_fanin: int = 32):
    """Alternative global driver: explicit map_batches partials reduced
    through a log-depth DISTRIBUTED tree, then a driver fold of at most
    ``merge_fanin`` states per spec. Same result as
    :func:`sketch_columns` (up to the sketches' published merge ε —
    the fold order was always arrival-order-dependent).

    The tree matters at scale: 64M turns × 7 specs produced ~5.3k
    partial rows ≈ **1 GB** of serialized KLL/t-digest state that the
    r4 driver deserialized and folded single-threaded (~2.3 s serial —
    the Amdahl term behind the 0.50 raw 8→32 scaling efficiency).
    Each tree round merges fanin×#specs rows per task in parallel and
    re-serializes compacted states, so the driver sees ≤ fanin states
    per spec regardless of block count — the same shape as
    engine/streaming._tree_merge_blobs. Inputs small enough to skip the
    tree (≤ fanin blocks) pay only a materialize of KB-sized rows."""
    partials = ds.map_batches(
        PartialSketcher(specs),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    n_specs = max(1, len(specs))
    mat = tree_reduce_rows(
        partials, _merge_partial_block, merge_fanin * n_specs, unit=n_specs
    )
    merged = merge_partial_rows(mat.iter_batches(batch_format="pyarrow"))
    for s in specs:  # empty dataset → empty sketches, like the other drivers
        if s.key not in merged:
            merged[s.key] = s.factory()
    return merged


# ------------------------------------------------------------------ transforms


def text_length_transform(col: str) -> Callable[[pa.Table], np.ndarray]:
    """Per-row UTF-8 character length of a string column (Arrow kernel)."""
    import pyarrow.compute as pc

    def transform(tbl: pa.Table) -> np.ndarray:
        arr = tbl.column(col)
        if arr.null_count:
            arr = arr.drop_null()
        return pc.utf8_length(arr).combine_chunks().to_numpy(zero_copy_only=False)

    return transform


def hashed_column_transform(col: str) -> Callable[[pa.Table], np.ndarray]:
    """64-bit hashes of a column (for pre-hashed HLL/CMS/Bloom updates)."""

    def transform(tbl: pa.Table) -> np.ndarray:
        arr = tbl.column(col)
        if arr.null_count:
            arr = arr.drop_null()
        return hash_any(arr.combine_chunks())

    return transform


def grouped_sketches_salted(ds, group_key: str, specs: list[SketchSpec], salt: int = 16,
                            hot_keys=None):
    """Skew-defused grouped sketches: two-stage salted merge.

    Stage 1 groups on ``(group_key, salt)`` where salt spreads each hot
    key across ``salt`` reducers (round-robin within each batch), so a
    Zipf-hot key costs ``salt`` parallel partial merges instead of one
    straggler reducer. Stage 2 merges the ≤ salt partial states per key
    — sketch states are KB-sized, so the final merge is driver-side and
    O(#groups × salt).

    ``hot_keys`` (optional, e.g. from ``engine.planner.detect_hot_keys``
    — one CMS pass) restricts the salting to the listed keys: cold keys
    keep salt 0, so stage 2 shrinks from #groups × salt rows to
    #groups + #hot × salt — targeted skew defusal instead of blanket.

    Returns a pandas DataFrame [group_key, *spec.key] of merged states
    (bytes), same schema as :func:`grouped_sketches` collected.
    """
    import pandas as pd

    hot = set(hot_keys) if hot_keys is not None else None

    def add_salt(tbl: pa.Table) -> pa.Table:
        s = np.arange(tbl.num_rows, dtype=np.int64) % salt
        if hot is not None:
            keys = tbl.column(group_key).to_pandas()
            s = np.where(keys.isin(hot).to_numpy(), s, 0)
        return tbl.append_column("__salt", pa.array(s))

    salted = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
    aggs = [make_aggregate(s) for s in specs]
    stage1 = salted.groupby([group_key, "__salt"]).aggregate(*aggs).to_pandas()

    rows = []
    for key, g in stage1.groupby(group_key, sort=True):
        row = {group_key: key}
        for spec in specs:
            merged = None
            for state in g[spec.key]:
                sk = sketch_from_bytes(state)
                merged = sk if merged is None else merged.merge(sk)
            row[spec.key] = (merged or spec.factory()).to_bytes()
        rows.append(row)
    return pd.DataFrame(rows)


def _merge_states(states: list[bytes]):
    acc = None
    for s in states:
        if s is None:
            continue
        sk = sketch_from_bytes(s)
        acc = sk if acc is None else acc.merge(sk)
    return acc


def sketch_columns_tree(ds, specs: list[SketchSpec], batch_size: int | None = 65536):
    """Global sketches with a DISTRIBUTED tree merge of the partials.

    Same per-block partial stage as :func:`sketch_columns_streaming`,
    but the (sketch_key, state) rows reduce through
    ``groupby(sketch_key).aggregate`` — Ray's partial+final combine tree
    — instead of a driver-side fold. The driver fold is O(#blocks)
    sketch merges in one process: fine to ~10^4 blocks, a bottleneck at
    10^12-turn scale (~10^7 blocks); this variant keeps the reduction on
    the cluster (only KB-sized states shuffle) at the cost of Ray's
    aggregate-operator fixed overhead (~2 s), so prefer the streaming
    fold for small jobs and this for huge ones.
    """
    from ray.data.aggregate import AggregateFnV2

    class StateMerge(AggregateFnV2):
        def __init__(self) -> None:
            super().__init__(name="state", zero_factory=lambda: None, on=None, ignore_nulls=True)

        def aggregate_block(self, block):
            tbl = _as_table(block)
            acc = _merge_states(tbl.column("state").to_pylist())
            return acc.to_bytes() if acc is not None else None

        def combine(self, a, b):
            if a is None:
                return b
            if b is None:
                return a
            return sketch_from_bytes(a).merge(sketch_from_bytes(b)).to_bytes()

        def finalize(self, acc):
            return acc

    partials = ds.map_batches(
        PartialSketcher(specs),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    rows = partials.groupby("sketch_key").aggregate(StateMerge()).take_all()
    by_key = {r["sketch_key"]: r["state"] for r in rows}
    out = {}
    for s in specs:
        state = by_key.get(s.key)
        out[s.key] = sketch_from_bytes(state) if state is not None else s.factory()
    return out
