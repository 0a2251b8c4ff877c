"""Segmented lag (windowed diff) as a vectorized Ray Data operator.

Problem: per-conversation inter-turn gaps need a LAG over (conv_id
ORDER BY turn_idx). ``groupby(conv).map_groups(fn)`` is semantically
right but calls a Python fn once per group — at 10^12 turns (billions
of conversations) that is a per-row-scale Python loop, the exact
anti-pattern SURVEY.md §7 bans.

Scale plan implemented here:

1. range-shuffle ``sort(["conv_id", "turn_idx"])`` (the ONE shuffle);
2. ``map_batches``: within each sorted block, diffs are one vectorized
   numpy subtraction masked where conv_id changes;
3. the only information lost is the gap that straddles two adjacent
   blocks — each block also emits its head and tail row (2 rows per
   block, regardless of block size). The driver stitches those
   boundary pairs (tail_i → head_{i+1} of the same conv) into the
   missing gaps. O(#blocks) driver work, exact result.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

GAP, HEAD, TAIL = 0, 1, 2
# single-row block: its head and tail are the SAME physical row — emit
# one HEADTAIL row that pairs on both sides (kind 3 is reserved by
# segmented_gap_sketches for sketch-partial rows)
HEADTAIL = 4

_SCHEMA = pa.schema(
    [
        pa.field("kind", pa.int8()),
        pa.field("gap_us", pa.int64()),
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int64()),
        pa.field("ts_us", pa.int64()),
    ]
)


def _ts_us(tbl: pa.Table, ts_col: str) -> np.ndarray:
    col = tbl.column(ts_col).combine_chunks()
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


# auto plan threshold: the int-keyed sort pays one extra map stage, which
# dominates below ~100 MB of input (measured sf0.1: 0.55 s string vs
# 0.92 s hashed) and wins ~2× above it (measured 16 M turns / 690 MB:
# 3.3-6.1 s string vs 2.2-2.8 s hashed)
_AUTO_HASH_MIN_BYTES = 128 << 20


def _input_bytes(ds) -> int | None:
    """Cheap size proxy: sum of the source files' on-disk bytes (no
    execution). None for non-file-backed datasets."""
    try:
        import os

        files = ds.input_files()
        if not files:
            return None
        return sum(os.path.getsize(f) for f in files if os.path.exists(f))
    except Exception:
        return None


def sort_segments(ds, key_col: str, order_col: str, hash_key: bool | None = False):
    """The engine's ONE range shuffle, with an optional int-keyed plan.

    ``hash_key=True`` sorts by (hash64(key), order) instead of the raw
    string key — int64 comparisons make the range sort measurably
    cheaper than string comparisons (round-2 VERDICT item 7). Segment
    DETECTION downstream still compares the original strings (neighbor
    equality inside each block), so a hash collision cannot mis-pair
    gaps; it can only make one colliding pair of conversations
    interleave so their in-block gaps are not adjacent and are silently
    dropped. Expected colliding pairs ≈ m²/2⁶⁵ — ~27k pairs across
    10¹² conversations, i.e. a ~3·10⁻⁸ fraction of gaps — negligible
    for sketch paths (their ε dominates), which default to the hash
    plan; EXACT paths (oracle-gated quantiles/sessions) default to the
    string sort.

    ``hash_key=None`` → auto: hash plan when the source files exceed
    ~128 MB (where the shuffle dominates the extra hash stage), string
    plan below (measured crossover — see _AUTO_HASH_MIN_BYTES).
    """
    if hash_key is None:
        b = _input_bytes(ds)
        hash_key = bool(b and b > _AUTO_HASH_MIN_BYTES)
    if not hash_key:
        return ds.sort([key_col, order_col])
    from approximate_quantiles_ray.functions.hashing import hash_strings

    def add_h(tbl: pa.Table) -> pa.Table:
        h = hash_strings(tbl.column(key_col).combine_chunks()).astype(np.int64)
        return tbl.append_column("_seg_key", pa.array(h, pa.int64()))

    return ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["_seg_key", order_col]
    )


def make_block_gaps(key_col: str, order_col: str, ts_col: str, keep_gap_keys: bool = False):
    """Vectorized per-block segmented diff + head/tail boundary rows.

    ``keep_gap_keys=True`` stamps each gap row with its segment key
    (needed for per-key downstream aggregation, e.g. sessionization)."""

    def block_gaps(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return _SCHEMA.empty_table()
        conv = tbl.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
        turn = (
            tbl.column(order_col)
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ts = _ts_us(tbl, ts_col)

        same = conv[1:] == conv[:-1]
        gaps = (ts[1:] - ts[:-1])[same]

        if n == 1:  # head and tail are the same row → one HEADTAIL
            bkinds, bturns, bts = np.int8([HEADTAIL]), np.int64([turn[0]]), [ts[0]]
            bconvs = [conv[0]]
        else:
            bkinds, bturns, bts = np.int8([HEAD, TAIL]), np.int64([turn[0], turn[-1]]), [ts[0], ts[-1]]
            bconvs = [conv[0], conv[-1]]
        kind = np.concatenate([np.zeros(len(gaps), np.int8), bkinds])
        gap_col = np.concatenate([gaps, np.zeros(len(bkinds))]).astype(np.int64)
        gap_keys = conv[1:][same] if keep_gap_keys else np.full(len(gaps), None, object)
        conv_col = np.concatenate([gap_keys, bconvs])
        turn_col = np.concatenate([np.zeros(len(gaps), np.int64), bturns])
        ts_col_out = np.concatenate([np.zeros(len(gaps), np.int64), bts])
        return pa.Table.from_arrays(
            [
                pa.array(kind, pa.int8()),
                pa.array(gap_col, pa.int64()),
                pa.array(conv_col, pa.string()),
                pa.array(turn_col, pa.int64()),
                pa.array(ts_col_out, pa.int64()),
            ],
            schema=_SCHEMA,
        )

    return block_gaps


def _stitch_boundaries_keyed(bnd: pd.DataFrame) -> pd.DataFrame:
    """Gaps lost at block boundaries: sort boundary rows by (conv, turn,
    kind); every TAIL immediately followed by a HEAD of the same conv is
    an adjacent-block pair → one gap. Returns (gap_us, conv_id) rows."""
    if not len(bnd):
        return pd.DataFrame({"gap_us": pd.Series(dtype=np.int64), "conv_id": pd.Series(dtype=object)})
    # ties on (conv, turn) must sort TAIL-before-HEAD: a block-straddling
    # pair whose tail and head share the order key would otherwise sort
    # HEAD-first and the gap would be silently dropped (ADVICE r1 item 2).
    # Single-row blocks emit HEADTAIL (pairs on both sides) and rank
    # between the two, so they chain correctly: T → HT → H.
    rank = np.select(
        [bnd["kind"].to_numpy() == TAIL, bnd["kind"].to_numpy() == HEADTAIL],
        [0, 1],
        default=2,  # HEAD
    )
    b = (
        bnd.assign(_rank=rank)
        .sort_values(["conv_id", "turn_idx", "_rank"])
        .reset_index(drop=True)
    )
    kind = b["kind"].to_numpy()
    conv = b["conv_id"].to_numpy()
    ts = b["ts_us"].to_numpy()
    tailish = np.isin(kind, (TAIL, HEADTAIL))
    headish = np.isin(kind, (HEAD, HEADTAIL))
    is_pair = tailish[:-1] & headish[1:] & (conv[:-1] == conv[1:])
    return pd.DataFrame(
        {"gap_us": (ts[1:] - ts[:-1])[is_pair].astype(np.int64), "conv_id": conv[1:][is_pair]}
    )


def _stitch_boundaries(bnd: pd.DataFrame) -> np.ndarray:
    return _stitch_boundaries_keyed(bnd)["gap_us"].to_numpy()


def segmented_gaps(
    ds,
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    keep_gap_keys: bool = False,
    hash_key: bool = False,
):
    """Returns (gap Dataset, boundary gaps). Caller folds the (tiny)
    boundary set into whatever reduction it runs over the Dataset.

    ``keep_gap_keys=False`` (default): gap Dataset has one ``gap_us``
    column; boundary is an int64 np.ndarray.
    ``keep_gap_keys=True``: gap Dataset carries (gap_us, conv_id=key);
    boundary is a (gap_us, conv_id) DataFrame — for per-key reductions
    (sessionization)."""
    sorted_ds = sort_segments(ds, key_col, order_col, hash_key)
    tagged = sorted_ds.map_batches(
        make_block_gaps(key_col, order_col, ts_col, keep_gap_keys=keep_gap_keys),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,  # one call per block: boundary rows ∝ #blocks
    )
    # one pass, split by kind: interior gaps stay distributed; the 2-per-
    # block boundary rows come back to the driver for stitching
    mat = tagged.materialize()
    gap_cols = ["gap_us", "conv_id"] if keep_gap_keys else ["gap_us"]
    gaps_ds = mat.filter(expr="kind == 0").select_columns(gap_cols)
    bnd = mat.filter(expr="kind > 0").select_columns(
        ["kind", "conv_id", "turn_idx", "ts_us"]
    ).to_pandas()
    if keep_gap_keys:
        return gaps_ds, _stitch_boundaries_keyed(bnd)
    return gaps_ds, _stitch_boundaries(bnd)


def _sort_tag_split(ds, key_col: str, order_col: str, block_fn, part_cols: list[str],
                    hash_key: bool = False):
    """Shared skeleton of the fused segmented operators: one range sort,
    one per-block tagging pass (kind==0 partial rows + kind>0 boundary
    rows), one materialize of the BLOCK-LEVEL tagged stream to split the
    two consumers. Returns (partials Dataset[part_cols], boundary df)."""
    sorted_ds = sort_segments(ds, key_col, order_col, hash_key)
    tagged = sorted_ds.map_batches(
        block_fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()  # block-level partials only — deliberate, spillable
    bnd = tagged.filter(expr="kind > 0").select_columns(
        ["kind", "conv_id", "turn_idx", "ts_us"]
    ).to_pandas()
    part = tagged.filter(expr="kind == 0").select_columns(part_cols)
    return part, bnd


def segmented_gap_hist(
    ds,
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
):
    """Fused exact-quantile path: sort → ONE map_batches that computes
    in-block gaps AND reduces them to per-block distinct (gap_us, n)
    value counts, plus the 2-per-block boundary rows. The tagged stream
    is block-level partials — raw gap rows never exist as a dataset —
    so the ``materialize()`` that splits the two consumers pins only
    per-block histograms (≤ block distinct values each), not row-scale
    data. Returns (distributed PARTIAL (gap_us, n) histogram Dataset —
    block-level distinct — plus the stitched boundary-gap ndarray).
    """
    schema = pa.schema(
        [
            pa.field("kind", pa.int8()),
            pa.field("gap_us", pa.int64()),
            pa.field("n", pa.int64()),
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int64()),
            pa.field("ts_us", pa.int64()),
        ]
    )
    block_gaps = make_block_gaps(key_col, order_col, ts_col)

    def block_fn(tbl: pa.Table) -> pa.Table:
        tagged = block_gaps(tbl)
        if tagged.num_rows == 0:
            return schema.empty_table()
        kinds = tagged.column("kind").to_numpy(zero_copy_only=False)
        gaps = tagged.column("gap_us").to_numpy(zero_copy_only=False)[kinds == GAP]
        vals, cnts = np.unique(gaps, return_counts=True) if len(gaps) else (
            np.zeros(0, np.int64), np.zeros(0, np.int64))
        bnd = tagged.filter(pa.compute.greater(tagged.column("kind"), 0))
        nb = bnd.num_rows
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate([np.zeros(len(vals), np.int8),
                                         bnd.column("kind").to_numpy(zero_copy_only=False)]),
                         pa.int8()),
                pa.array(np.concatenate([vals.astype(np.int64), np.zeros(nb, np.int64)]),
                         pa.int64()),
                pa.array(np.concatenate([cnts.astype(np.int64), np.zeros(nb, np.int64)]),
                         pa.int64()),
                pa.array([None] * len(vals) + bnd.column("conv_id").to_pylist(), pa.string()),
                pa.array(np.concatenate(
                    [np.zeros(len(vals), np.int64),
                     bnd.column("turn_idx").to_numpy(zero_copy_only=False)]), pa.int64()),
                pa.array(np.concatenate(
                    [np.zeros(len(vals), np.int64),
                     bnd.column("ts_us").to_numpy(zero_copy_only=False)]), pa.int64()),
            ],
            schema=schema,
        )

    # PARTIAL histogram (block-level distinct, values may repeat across
    # blocks): the consumer (quantiles_from_histogram pre_grouped=False)
    # combines on the driver under its cap, or inserts the Ray groupby
    # only on the truly-huge path — skipping the all-to-all entirely at
    # moderate scale.
    hist, bnd = _sort_tag_split(ds, key_col, order_col, block_fn, ["gap_us", "n"])
    return hist, _stitch_boundaries(bnd)


def segmented_session_partials(
    ds,
    key_col: str,
    order_col: str,
    ts_col: str,
    timeout_us: int,
):
    """Fused sessionization partials: ONE sort + ONE map_batches emits,
    per block, (key, n_events, n_breaks) partial rows (break = in-block
    gap > timeout) plus the 2-per-block boundary rows. Nothing
    row-scale survives the block — the materialize that splits the two
    consumers pins ≤ #keys-per-block + 2 rows per block. Returns
    (partials Dataset(key, n_events, n_breaks), stitched boundary
    DataFrame(gap_us, conv_id) for the caller's timeout fold).
    """
    schema = pa.schema(
        [
            pa.field("kind", pa.int8()),
            pa.field("key", pa.string()),
            pa.field("n_events", pa.int64()),
            pa.field("n_breaks", pa.int64()),
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int64()),
            pa.field("ts_us", pa.int64()),
        ]
    )
    block_gaps = make_block_gaps(key_col, order_col, ts_col, keep_gap_keys=True)

    pc_ = pa.compute

    def block_fn(tbl: pa.Table) -> pa.Table:
        tagged = block_gaps(tbl)
        if tagged.num_rows == 0:
            return schema.empty_table()
        # per-key event counts: Arrow C++ value_counts, no Python objects
        evc = pc_.value_counts(tbl.column(key_col).combine_chunks())
        ne = len(evc)
        # per-key break counts: filter big in-block gaps, value_counts —
        # emitted as SEPARATE partial rows (n_events=0); the downstream
        # fold sums both families, so no key alignment is needed here
        is_big_gap = pc_.and_(
            pc_.equal(tagged.column("kind"), GAP),
            pc_.greater(tagged.column("gap_us"), timeout_us),
        )
        brc = pc_.value_counts(tagged.filter(is_big_gap).column("conv_id").combine_chunks())
        nk = len(brc)
        bnd = tagged.filter(pc_.greater(tagged.column("kind"), 0))
        nb = bnd.num_rows
        zeros = np.zeros  # local alias: used 7× in the column builders below
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(
                    [zeros(ne + nk, np.int8),
                     bnd.column("kind").to_numpy(zero_copy_only=False)]), pa.int8()),
                pa.concat_arrays(
                    [evc.field("values"), brc.field("values"),
                     pa.nulls(nb, pa.string())]),
                pa.array(np.concatenate(
                    [evc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64),
                     zeros(nk + nb, np.int64)]), pa.int64()),
                pa.array(np.concatenate(
                    [zeros(ne, np.int64),
                     brc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64),
                     zeros(nb, np.int64)]), pa.int64()),
                pa.concat_arrays(
                    [pa.nulls(ne + nk, pa.string()),
                     bnd.column("conv_id").combine_chunks()]),
                pa.array(np.concatenate(
                    [zeros(ne + nk, np.int64),
                     bnd.column("turn_idx").to_numpy(zero_copy_only=False)]), pa.int64()),
                pa.array(np.concatenate(
                    [zeros(ne + nk, np.int64),
                     bnd.column("ts_us").to_numpy(zero_copy_only=False)]), pa.int64()),
            ],
            schema=schema,
        )

    part, bnd = _sort_tag_split(
        ds, key_col, order_col, block_fn, ["key", "n_events", "n_breaks"]
    )
    return part, _stitch_boundaries_keyed(bnd)


def segmented_gap_sketches(
    ds,
    specs,
    scale: float = 1e-6,
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    hash_key: bool | None = None,
):
    """Fused scale path: sort → one map_batches that computes in-block
    gaps AND reduces them to per-block sketch partials (KB each), plus
    the 2-per-block boundary rows. Nothing row-scale ever leaves a
    block, so there is no intermediate gap dataset to materialize; the
    driver folds partial states and feeds the stitched boundary gaps
    (scaled by ``scale``, default µs→s) into the merged sketches.

    ``specs``: list of SketchSpec-like (key, factory) — gaps are fed as
    float64 ``gap_us * scale``. Sketch estimates tolerate the hash-keyed
    sort's collision loss (see sort_segments), so ``hash_key`` defaults
    ON here — the cheaper int64 range shuffle is this operator's
    dominant cost.
    """
    out_schema = pa.schema(
        [
            pa.field("kind", pa.int8()),  # 3 = sketch partial
            pa.field("sketch_key", pa.string()),
            pa.field("state", pa.binary()),
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("ts_us", pa.int64()),
        ]
    )
    block_gaps = make_block_gaps(key_col, order_col, ts_col)

    def block_fn(tbl: pa.Table) -> pa.Table:
        tagged = block_gaps(tbl)
        kinds = tagged.column("kind").to_numpy(zero_copy_only=False)
        gaps = tagged.column("gap_us").to_numpy(zero_copy_only=False)[kinds == GAP]
        values = gaps.astype(np.float64) * scale
        rows = {name: [] for name in out_schema.names}
        for spec in specs:
            sk = spec.factory()
            if len(values):
                sk.update(values)
            rows["kind"].append(3)
            rows["sketch_key"].append(spec.key)
            rows["state"].append(sk.to_bytes())
            rows["conv_id"].append(None)
            rows["turn_idx"].append(0)
            rows["ts_us"].append(0)
        bnd = tagged.filter(pa.compute.greater(tagged.column("kind"), 0))
        for i in range(bnd.num_rows):
            rows["kind"].append(int(bnd.column("kind")[i].as_py()))
            rows["sketch_key"].append(None)
            rows["state"].append(None)
            rows["conv_id"].append(bnd.column("conv_id")[i].as_py())
            rows["turn_idx"].append(int(bnd.column("turn_idx")[i].as_py()))
            rows["ts_us"].append(int(bnd.column("ts_us")[i].as_py()))
        return pa.Table.from_pydict(rows, schema=out_schema)

    sorted_ds = sort_segments(ds, key_col, order_col, hash_key)
    tagged = sorted_ds.map_batches(
        block_fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    from approximate_quantiles_ray.sketches.base import sketch_from_bytes

    merged = {}
    bnd_rows = []
    for b in tagged.iter_batches(batch_format="pyarrow"):
        kinds = b.column("kind").to_numpy(zero_copy_only=False)
        for i in np.flatnonzero(kinds == 3):
            key = b.column("sketch_key")[int(i)].as_py()
            sk = sketch_from_bytes(b.column("state")[int(i)].as_py())
            merged[key] = merged[key].merge(sk) if key in merged else sk
        sel = kinds != 3
        if sel.any():
            bnd_rows.append(b.filter(pa.array(sel)).to_pandas())
    if key_missing := [s.key for s in specs if s.key not in merged]:
        for k in key_missing:
            merged[k] = next(s for s in specs if s.key == k).factory()
    if bnd_rows:
        boundary = _stitch_boundaries(pd.concat(bnd_rows, ignore_index=True))
        if len(boundary):
            vals = boundary.astype(np.float64) * scale
            for sk in merged.values():
                sk.update(vals)
    return merged


def segmented_rolling_max(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window: int,
) -> pd.DataFrame:
    """Per-key MAX of the ordered rolling sum (``ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW``) — the window-function family (running /
    rolling aggregates over a partitioned order) the reference lacks,
    distributed on the segmented-lag pattern.

    Plan: ONE (key, order) range sort → per-batch vectorized rolling
    sums (cumsum difference with per-key clipping — no Python row loop)
    → per-batch per-key max partials. The only rows whose window can
    straddle a batch boundary are the first ``window-1`` rows of a
    batch's first key (their predecessors are the previous batch's last
    key's last ``window-1`` rows), so each batch emits those as SUSPECT
    rows (excluded from its partial max) plus its last key's last
    ``window-1`` rows as TAIL context; the driver replays only this
    O(window · #batches) boundary stream per key — a sliding deque of
    the true immediate predecessors — to correct suspect values, then
    folds partial maxes adaptively. SQL-equivalent (oracle-gated):
    ``MAX(SUM(v) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW))``.

    Requires ``order_cols`` to be a total order within each key
    (include a unique tiebreaker, e.g. an event id) — rolling sums over
    ties are otherwise order-dependent. Key and order/value columns
    must be integer-valued (int64 µs timestamps, int cents).
    """
    from collections import deque

    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg

    if window < 1:
        raise ValueError("window must be >= 1")
    o1, o2 = order_cols[0], order_cols[1] if len(order_cols) > 1 else None

    out_schema = pa.schema(
        [
            pa.field("kind", pa.int8()),  # 0 = per-key max partial, 1 = boundary
            pa.field("key", pa.int64()),
            pa.field("a", pa.int64()),  # partial: max_roll; boundary: order1
            pa.field("b", pa.int64()),  # boundary: order2 (tiebreak)
            pa.field("v", pa.int64()),  # boundary: row value
            pa.field("sus", pa.bool_()),
        ]
    )

    def block_fn(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return out_schema.empty_table()
        k = tbl.column(key_col).combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        a1 = tbl.column(o1).combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        a2 = (
            tbl.column(o2).combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
            if o2 is not None
            else np.zeros(n, np.int64)
        )
        v = tbl.column(value_col).combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)

        change = np.ones(n, bool)
        change[1:] = k[1:] != k[:-1]
        seg_first = np.flatnonzero(change)
        seg_len = np.diff(np.append(seg_first, n))
        seg_start = np.repeat(seg_first, seg_len)
        cs = np.cumsum(v)
        idx = np.arange(n, dtype=np.int64)
        ws = np.maximum(idx - window + 1, seg_start)
        r = cs - np.where(ws > 0, cs[np.maximum(ws - 1, 0)], 0)

        n_sus = min(window - 1, int(seg_len[0]))
        suspect = idx < n_sus
        n_tail = min(window - 1, int(seg_len[-1]))
        tail = idx >= n - n_tail
        bnd = suspect | tail

        ok = ~suspect
        kk, rr = k[ok], r[ok]
        parts = []
        if len(kk):
            ch = np.ones(len(kk), bool)
            ch[1:] = kk[1:] != kk[:-1]
            st = np.flatnonzero(ch)
            parts.append(
                {
                    "kind": np.zeros(len(st), np.int8),
                    "key": kk[st],
                    "a": np.maximum.reduceat(rr, st),
                    "b": np.zeros(len(st), np.int64),
                    "v": np.zeros(len(st), np.int64),
                    "sus": np.zeros(len(st), bool),
                }
            )
        bi = np.flatnonzero(bnd)
        if len(bi):
            parts.append(
                {
                    "kind": np.ones(len(bi), np.int8),
                    "key": k[bi],
                    "a": a1[bi],
                    "b": a2[bi],
                    "v": v[bi],
                    "sus": suspect[bi],
                }
            )
        cols = {
            name: np.concatenate([p[name] for p in parts]) for name in out_schema.names
        }
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in out_schema], schema=out_schema
        )

    mat = (
        ds.sort([key_col] + order_cols)
        .map_batches(block_fn, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    part = mat.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 0)).select(["key", "a"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    folded = adaptive_grouped_agg(part, ["key"], {"a": "max"})

    bnd = mat.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 1)).select(
            ["key", "a", "b", "v", "sus"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    corrected: dict[int, int] = {}
    if window > 1 and len(bnd):
        bnd = bnd.sort_values(["key", "a", "b"])
        dq: deque = deque(maxlen=window - 1)
        cur = None
        for key, sus, val in zip(
            bnd["key"].to_numpy(), bnd["sus"].to_numpy(), bnd["v"].to_numpy()
        ):
            if key != cur:
                dq.clear()
                cur = key
            if sus:
                roll = int(val) + sum(dq)
                if key not in corrected or roll > corrected[key]:
                    corrected[key] = roll
            dq.append(int(val))

    out = folded.rename(columns={"a": "max_roll"})
    if corrected:
        cdf = pd.DataFrame(
            {"key": list(corrected.keys()), "max_roll": list(corrected.values())}
        )
        out = (
            pd.concat([out, cdf], ignore_index=True)
            .groupby("key", as_index=False)["max_roll"]
            .max()
        )
    out["max_roll"] = out["max_roll"].astype(np.int64)
    out = out.rename(columns={"key": key_col})
    return out.sort_values(key_col).reset_index(drop=True)


_TRANSITION_SCHEMA = pa.schema(
    [
        pa.field("kind", pa.int8()),
        pa.field("prev", pa.string()),
        pa.field("nxt", pa.string()),
        pa.field("n", pa.int64()),
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int64()),
        pa.field("val", pa.string()),
    ]
)


def segmented_transitions(
    ds,
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    val_col: str = "role",
    hash_key: bool = False,
) -> "pd.DataFrame":
    """Exact adjacent-pair (LAG) transition counts per segment: for each
    segment ordered by ``order_col``, count every consecutive
    (val[i-1] → val[i]) pair, summed over all segments.

    Same fused one-sort shape as :func:`segmented_gap_hist`: range sort
    by (key, order) → ONE per-block pass that reduces in-block pairs to
    (prev, nxt, n) partial counts (≤ |alphabet|² rows per block — tiny
    for categorical columns like role) and emits the 2-per-block
    head/tail boundary rows; the driver stitches the ≤ #blocks−1
    block-straddling pairs with the same TAIL→HEAD pairing rule as the
    gap engine and folds everything into one count table. Driver
    traffic is O(#blocks × alphabet²), never row-scale.
    """
    import pandas as pd

    sorted_ds = sort_segments(ds, key_col, order_col, hash_key)

    def block_fn(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return _TRANSITION_SCHEMA.empty_table()
        conv = tbl.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
        val = tbl.column(val_col).combine_chunks().to_numpy(zero_copy_only=False)
        turn = (
            tbl.column(order_col)
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        same = conv[1:] == conv[:-1]
        # factorize pairs → count per (prev, nxt) without Python loops
        uvals, codes = np.unique(val, return_inverse=True)
        pair_codes = codes[:-1][same] * len(uvals) + codes[1:][same]
        upair, cnt = np.unique(pair_codes, return_counts=True)
        prev_c = uvals[upair // len(uvals)]
        nxt_c = uvals[upair % len(uvals)]
        if n == 1:
            bkinds, bturns = np.int8([HEADTAIL]), np.int64([turn[0]])
            bconvs, bvals = [conv[0]], [val[0]]
        else:
            bkinds = np.int8([HEAD, TAIL])
            bturns = np.int64([turn[0], turn[-1]])
            bconvs, bvals = [conv[0], conv[-1]], [val[0], val[-1]]
        k = len(upair)
        b = len(bkinds)
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate([np.zeros(k, np.int8), bkinds]), pa.int8()),
                pa.array(np.concatenate([prev_c, np.full(b, None, object)]), pa.string()),
                pa.array(np.concatenate([nxt_c, np.full(b, None, object)]), pa.string()),
                pa.array(np.concatenate([cnt.astype(np.int64), np.zeros(b, np.int64)]), pa.int64()),
                pa.array(np.concatenate([np.full(k, None, object), bconvs]), pa.string()),
                pa.array(np.concatenate([np.zeros(k, np.int64), bturns]), pa.int64()),
                pa.array(np.concatenate([np.full(k, None, object), bvals]), pa.string()),
            ],
            schema=_TRANSITION_SCHEMA,
        )

    tagged = sorted_ds.map_batches(
        block_fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()
    part = (
        tagged.filter(expr="kind == 0").select_columns(["prev", "nxt", "n"]).to_pandas()
    )
    bnd = (
        tagged.filter(expr="kind > 0")
        .select_columns(["kind", "conv_id", "turn_idx", "val"])
        .to_pandas()
    )
    extra = _stitch_boundary_transitions(bnd)
    allp = pd.concat([part, extra], ignore_index=True)
    if not len(allp):
        return pd.DataFrame(
            {
                "prev": pd.Series(dtype=object),
                "nxt": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64),
            }
        )
    out = allp.groupby(["prev", "nxt"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["prev", "nxt"]).reset_index(drop=True)


def _stitch_boundary_transitions(bnd: "pd.DataFrame") -> "pd.DataFrame":
    """Block-straddling adjacent pairs, same pairing rule as
    :func:`_stitch_boundaries_keyed` (TAIL-before-HEAD on order ties,
    HEADTAIL chains both sides)."""
    import pandas as pd

    if not len(bnd):
        return pd.DataFrame(
            {"prev": pd.Series(dtype=object), "nxt": pd.Series(dtype=object),
             "n": pd.Series(dtype=np.int64)}
        )
    rank = np.select(
        [bnd["kind"].to_numpy() == TAIL, bnd["kind"].to_numpy() == HEADTAIL],
        [0, 1],
        default=2,
    )
    b = (
        bnd.assign(_rank=rank)
        .sort_values(["conv_id", "turn_idx", "_rank"])
        .reset_index(drop=True)
    )
    kind = b["kind"].to_numpy()
    conv = b["conv_id"].to_numpy()
    val = b["val"].to_numpy()
    tailish = np.isin(kind, (TAIL, HEADTAIL))
    headish = np.isin(kind, (HEAD, HEADTAIL))
    is_pair = tailish[:-1] & headish[1:] & (conv[:-1] == conv[1:])
    return pd.DataFrame(
        {
            "prev": val[:-1][is_pair],
            "nxt": val[1:][is_pair],
            "n": np.ones(int(is_pair.sum()), np.int64),
        }
    )
