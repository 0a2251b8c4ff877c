"""Flagship pipeline: the sketch suite over a conversation-transcript table.

Answers, in two streaming passes over the Parquet table (per
BASELINE.json north_star):

- p50/p95/p99 of per-turn text length — t-digest AND KLL (no shuffle:
  per-block partials folded streaming on the driver);
- p50/p95/p99 of inter-turn latency — per-conversation ts deltas under
  stable (conv_id, turn_idx) order via the fused segmented-lag operator
  (one range sort, per-block sketch partials, exact boundary stitching);
- distinct conv_id — HLL;
- heavy-hitter tool frequencies — count-min + exact small-vocab check;
- conv_id membership — Bloom filter.

Column pruning happens at the read: the wide ``text`` column is reduced
to its length inside the first map_batches projection and never
shuffles (SURVEY.md §7 watch-list).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from approximate_quantiles_ray.engine.udaf import (
    SketchSpec,
    column_as_numpy,
    sketch_columns_streaming,
    text_length_transform,
)
from approximate_quantiles_ray.sketches.bloom import BloomFilter
from approximate_quantiles_ray.sketches.countmin import CountMinSketch
from approximate_quantiles_ray.sketches.hll import HLL
from approximate_quantiles_ray.sketches.kll import KLL
from approximate_quantiles_ray.sketches.tdigest import TDigest

from approximate_quantiles_ray.sources.read import read_parquet_sized

QUANTILES = (0.5, 0.95, 0.99)


def global_specs(
    delta: float = 500.0,
    kll_k: int = 200,
    hll_p: int = 14,
    cms_width: int = 8192,
    bloom_bits: int = 1 << 22,
    seed: int = 42,
) -> list[SketchSpec]:
    text_len = text_length_transform("text")  # shared → computed once/batch
    return [
        SketchSpec(
            key="text_len_tdigest",
            factory=lambda: TDigest(delta=delta, scale="k2"),
            transform=text_len,
            requires=("text",),
        ),
        SketchSpec(
            key="text_len_kll",
            factory=lambda: KLL(k=kll_k, seed=seed),
            transform=text_len,
            requires=("text",),
        ),
        SketchSpec(
            key="conv_hll",
            factory=lambda: HLL(p=hll_p, seed=seed),
            on="conv_id",
            kind="hash",
            dedup_per_batch=True,  # set semantics: ~30 turns/conv collapse
        ),
        SketchSpec(
            key="tool_cms",
            factory=lambda: CountMinSketch(width=cms_width, depth=5, seed=seed),
            on="tool",
            kind="hash",
        ),
        SketchSpec(
            key="conv_bloom",
            factory=lambda: BloomFilter(num_bits=bloom_bits, num_hashes=7, seed=seed),
            on="conv_id",
            kind="hash",
            dedup_per_batch=True,
        ),
    ]


def latency_specs(delta: float = 500.0, kll_k: int = 200, seed: int = 42) -> list[SketchSpec]:
    return [
        SketchSpec(
            key="latency_tdigest",
            factory=lambda: TDigest(delta=delta, scale="k2"),
            on="latency_s",
        ),
        SketchSpec(
            key="latency_kll",
            factory=lambda: KLL(k=kll_k, seed=seed),
            on="latency_s",
        ),
    ]


def latency_sketches(ds, specs: list[SketchSpec]):
    """Inter-turn latency sketches via the fused segmented-lag operator
    (engine/segmented.py): one (conv_id, turn_idx) range sort, then each
    sorted block reduces its vectorized gaps straight into per-block
    sketch partials — no per-group Python calls, no materialized gap
    dataset; block-boundary gaps are stitched in exactly on the driver."""
    from approximate_quantiles_ray.engine.segmented import segmented_gap_sketches

    narrow = ds.select_columns(["conv_id", "turn_idx", "ts"])
    return segmented_gap_sketches(narrow, specs, scale=1e-6)


# exactly what order_invariant_summary consumes — keep the scan pruned
ORDER_INVARIANT_COLUMNS = ["conv_id", "turn_idx", "text"]


def read_transcripts(table_dir: str, columns: list[str] | None = None):
    """Pruned transcript scan. Defaults to the order-invariant column
    set; at 100 TB an unprojected read of a wide transcript table
    (ts/tool/role never touched here) is real money."""
    return read_parquet_sized(
        table_dir, columns=ORDER_INVARIANT_COLUMNS if columns is None else columns
    )


def transcript_report(
    table_dir: str,
    delta: float = 500.0,
    kll_k: int = 200,
    seed: int = 42,
    include_latency: bool = True,
    latency_layout: str = "auto",
) -> pd.DataFrame:
    """Run the flagship sketch suite; returns a (metric, value) DataFrame.

    ``latency_layout`` picks the inter-turn-latency plan:

    - ``"auto"`` (default): use a conv_id-bucketed layout, building a
      cached one under /tmp on first use (sources/bucketed.py) — each
      later report is a shuffle-free map over buckets, the measured-
      faster and 100 TB-correct plan for repeated latency queries
      (round-2 VERDICT item 3). Falls back to "sort" if the layout
      cannot be built (e.g. unwritable cache root).
    - ``"bucketed"``: require the layout (raise on failure).
    - ``"sort"``: the one-shot range-sort segmented plan — right when
      the table is queried once and a layout shuffle would not amortize.
    """

    ds = read_parquet_sized(table_dir, columns=["conv_id", "text", "tool"])
    # explicit map_batches partials + driver fold: measured ~4× faster and
    # far more stable than Dataset.aggregate's AllToAllOperator for the
    # global (no-groupby) case — see BASELINE.md "aggregate vs streaming"
    merged = sketch_columns_streaming(
        ds, global_specs(delta=delta, kll_k=kll_k, seed=seed), batch_size=65536
    )

    rows: list[dict[str, Any]] = []
    td: TDigest = merged["text_len_tdigest"]
    kll: KLL = merged["text_len_kll"]
    for q in QUANTILES:
        rows.append({"metric": f"text_len_p{int(q * 100)}_tdigest", "value": td.est_value_at_quantile(q)})
    for q in QUANTILES:
        rows.append({"metric": f"text_len_p{int(q * 100)}_kll", "value": kll.est_value_at_quantile(q)})
    rows.append({"metric": "turns_count", "value": float(td.count)})
    rows.append({"metric": "distinct_conv_hll", "value": merged["conv_hll"].estimate()})

    cms: CountMinSketch = merged["tool_cms"]
    from approximate_quantiles_ray.sources.transcripts import TOOL_VOCAB

    est = cms.estimate(TOOL_VOCAB)
    top = np.argsort(est)[::-1][:5]
    for rank, i in enumerate(top):
        rows.append({"metric": f"tool_top{rank + 1}_{TOOL_VOCAB[i]}", "value": float(est[i])})

    bloom: BloomFilter = merged["conv_bloom"]
    rows.append({"metric": "bloom_fill_ratio", "value": bloom.fill_ratio()})

    if include_latency:
        specs = latency_specs(delta=delta, kll_k=kll_k, seed=seed)
        lat = None
        if latency_layout in ("auto", "bucketed"):
            try:
                from approximate_quantiles_ray.sources.bucketed import (
                    ensure_bucketed,
                    latency_sketches_bucketed,
                )

                lat = latency_sketches_bucketed(ensure_bucketed(table_dir), specs)
            except Exception:
                if latency_layout == "bucketed":
                    raise
        if lat is None:
            lat = latency_sketches(
                read_parquet_sized(table_dir, columns=["conv_id", "turn_idx", "ts"]), specs
            )
        ltd: TDigest = lat["latency_tdigest"]
        for q in QUANTILES:
            rows.append({"metric": f"latency_p{int(q * 100)}_tdigest", "value": ltd.est_value_at_quantile(q)})
        rows.append({"metric": "latency_p50_kll", "value": lat["latency_kll"].est_value_at_quantile(0.5)})
        rows.append({"metric": "latency_gaps_count", "value": float(ltd.count)})

    out = pd.DataFrame(rows)
    out["value"] = out["value"].astype(float)
    return out


def grouped_text_len_by_role(table_dir: str, delta: float = 300.0) -> pd.DataFrame:
    """Grouped-sketch demo: one t-digest of text length per role."""

    from approximate_quantiles_ray.engine.udaf import grouped_sketches
    from approximate_quantiles_ray.sketches.base import sketch_from_bytes

    ds = read_parquet_sized(table_dir, columns=["role", "text"])
    spec = SketchSpec(
        key="len_td",
        factory=lambda: TDigest(delta=delta, scale="k2"),
        transform=text_length_transform("text"),
    )
    agg = grouped_sketches(ds, "role", [spec])
    rows = []
    for row in agg.take_all():
        sk = sketch_from_bytes(row["len_td"])
        rows.append(
            {
                "role": row["role"],
                "n_turns": int(sk.count),
                "len_p50": sk.est_value_at_quantile(0.5),
                "len_p99": sk.est_value_at_quantile(0.99),
            }
        )
    return pd.DataFrame(rows).sort_values("role").reset_index(drop=True)


# ------------------------------------------------------------------ invariant


def _order_checksum_batch(tbl: pa.Table) -> pa.Table:
    """Per-batch: verify (conv_id, turn_idx) sorted within the batch and
    emit an order-insensitive checksum of (conv_id, turn_idx, text)."""
    from approximate_quantiles_ray.functions.hashing import hash_strings

    conv = tbl.column("conv_id").combine_chunks().to_numpy(zero_copy_only=False)
    turn = column_as_numpy(tbl, "turn_idx", drop_nulls=False).astype(np.int64)
    text = tbl.column("text").combine_chunks().to_numpy(zero_copy_only=False)
    if len(conv) == 0:  # empty fragment: zero row, no boundary keys
        return pa.Table.from_pydict(
            {
                "xor_sum": pa.array([0], type=pa.uint64()),
                "add_sum": pa.array([0], type=pa.uint64()),
                "n": pa.array([0], type=pa.int64()),
                "sorted_ok": pa.array([True]),
                "first_conv": pa.array([None], type=pa.string()),
                "first_turn": pa.array([0], type=pa.int64()),
                "last_conv": pa.array([None], type=pa.string()),
                "last_turn": pa.array([0], type=pa.int64()),
            }
        )

    conv_h = hash_strings(conv)
    text_h = hash_strings(text)
    with np.errstate(over="ignore"):
        row_h = conv_h * np.uint64(0x9E3779B97F4A7C15) ^ text_h ^ turn.astype(np.uint64)
        xor_sum = np.bitwise_xor.reduce(row_h)
        add_sum = np.sum(row_h, dtype=np.uint64)

    # sortedness within the batch; cross-batch boundaries are attested by
    # the driver from the emitted first/last keys (a batch-boundary
    # inversion would otherwise be invisible)
    order_ok = True
    if len(conv) > 1:
        same = conv[1:] == conv[:-1]
        order_ok = bool(np.all(turn[1:][same] > turn[:-1][same]))
        prev_le = np.less_equal(conv[:-1], conv[1:])
        order_ok = order_ok and bool(np.all(prev_le))
    return pa.Table.from_pydict(
        {
            "xor_sum": pa.array([int(xor_sum)], type=pa.uint64()),
            "add_sum": pa.array([int(add_sum)], type=pa.uint64()),
            "n": pa.array([len(conv)], type=pa.int64()),
            "sorted_ok": pa.array([order_ok]),
            "first_conv": pa.array([str(conv[0])], type=pa.string()),
            "first_turn": pa.array([int(turn[0])], type=pa.int64()),
            "last_conv": pa.array([str(conv[-1])], type=pa.string()),
            "last_turn": pa.array([int(turn[-1])], type=pa.int64()),
        }
    )


def order_invariant_summary(ds) -> dict[str, Any]:
    """Sort by (conv_id, turn_idx) and reduce to {checksum, rows, sorted_ok}.

    The checksum is order-insensitive over rows (XOR + wrapping sum of
    per-row hashes of (conv_id, turn_idx, text)), so two tables hold the
    same turns iff checksums AND row counts match; ``sorted_ok`` attests
    the produced ordering is stable (conv_id, turn_idx).
    """
    sorted_ds = ds.sort(["conv_id", "turn_idx"])
    parts = sorted_ds.map_batches(_order_checksum_batch, batch_format="pyarrow")
    xor = np.uint64(0)
    add = np.uint64(0)
    n = 0
    ok = True
    bounds = []
    for b in parts.iter_batches(batch_format="pyarrow"):
        with np.errstate(over="ignore"):
            xor ^= np.bitwise_xor.reduce(b.column("xor_sum").to_numpy().astype(np.uint64))
            add += np.sum(b.column("add_sum").to_numpy().astype(np.uint64), dtype=np.uint64)
        n += int(np.sum(b.column("n").to_numpy()))
        ok = ok and bool(np.all(b.column("sorted_ok").to_numpy()))
        bounds.extend(
            t for t in zip(
                b.column("first_conv").to_pylist(), b.column("first_turn").to_pylist(),
                b.column("last_conv").to_pylist(), b.column("last_turn").to_pylist(),
            ) if t[0] is not None  # skip empty-batch sentinel rows
        )
    # cross-batch attestation: batches are contiguous sorted ranges, so
    # ordering them by their first key must give last_i ≤ first_{i+1}
    # tie-break on the LAST key too: batches tying on first key (duplicate
    # boundary rows) must order narrow-before-wide or the chain check
    # false-positives on correctly sorted data
    bounds.sort(key=lambda t: (t[0], t[1], t[2], t[3]))
    for (fc, ft, lc, lt), (fc2, ft2, _, _) in zip(bounds, bounds[1:]):
        if (lc, lt) > (fc2, ft2):
            ok = False
            break
    return {"xor": int(xor), "add": int(add), "rows": n, "sorted_ok": ok}


def _sorted_distinct_head(ds, n: int, col: str = "conv_id") -> np.ndarray:
    """First ``n`` distinct values in sorted order, computed distributed:
    each block emits only its own smallest-``n`` distinct values, so the
    driver merge is O(#blocks × n) — never the corpus. Deterministic and
    reproducible in SQL (``SELECT DISTINCT … ORDER BY … LIMIT n``),
    unlike a head()-of-file-order sample."""

    def partial(tbl: pa.Table) -> pa.Table:
        u = np.unique(tbl.column(col).combine_chunks().to_numpy(zero_copy_only=False))[:n]
        return pa.table({col: pa.array(u)})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return np.unique(parts[col].to_numpy())[:n]


def conv_membership_check(table_dir: str, n_probes: int = 200, seed: int = 42) -> pd.DataFrame:
    """Bloom membership demo: build the conv_id Bloom filter in one
    streaming pass, then probe known conv_ids (must ALL hit — Bloom has
    no false negatives) and synthetic absent ids (hit rate estimates the
    false-positive rate)."""
    spec = global_specs(seed=seed)
    bloom_spec = [s for s in spec if s.key == "conv_bloom"]

    ds = read_parquet_sized(table_dir, columns=["conv_id"])
    bloom: BloomFilter = sketch_columns_streaming(ds, bloom_spec)["conv_bloom"]

    known = _sorted_distinct_head(ds, n_probes)
    absent = np.array([f"conv-absent-{i:07d}" for i in range(n_probes)], dtype=object)

    present_hits = int(bloom.contains(pa.array(known)).sum())
    absent_hits = int(bloom.contains(pa.array(absent)).sum())
    return pd.DataFrame(
        [
            {"metric": "present_probes", "value": float(len(known))},
            {"metric": "present_hits", "value": float(present_hits)},
            {"metric": "absent_probes", "value": float(n_probes)},
            {"metric": "absent_hits", "value": float(absent_hits)},
            {"metric": "fp_rate_est", "value": absent_hits / n_probes},
        ]
    )


def conv_membership_gate(table_dir: str, n_probes: int = 200, seed: int = 42) -> pd.DataFrame:
    """Oracle-checkable membership law (round-2 VERDICT item 2): the
    probe set is the first ``n_probes`` DISTINCT conv_ids in sorted
    order (SQL-reproducible), and Bloom's no-false-negative guarantee
    makes present_hits == present_probes a hard invariant SQL can state
    (``LEAST(COUNT(DISTINCT conv_id), n)`` for both). The
    false-positive estimate stays in conv_membership_check — its value
    depends on the Bloom hash family, which SQL cannot reproduce."""
    spec = global_specs(seed=seed)
    bloom_spec = [s for s in spec if s.key == "conv_bloom"]

    ds = read_parquet_sized(table_dir, columns=["conv_id"])
    bloom: BloomFilter = sketch_columns_streaming(ds, bloom_spec)["conv_bloom"]
    known = _sorted_distinct_head(ds, n_probes)
    return pd.DataFrame(
        [
            {
                "present_probes": np.int64(len(known)),
                "present_hits": np.int64(bloom.contains(pa.array(known)).sum()),
                "absent_probes": np.int64(n_probes),
            }
        ]
    )
