"""Checkpointed, resumable sketch jobs with per-partition lineage.

The reference has no fault-tolerance story (SURVEY.md §4); this is the
design mandated by BASELINE.json north_rule: input files are grouped
into shards, each shard's merged sketch states are written atomically to
``part-{shard:05d}.parquet`` (write temp + rename) together with lineage
(input fragments, row count, wall time, config hash) and a manifest
line. A resumed run skips every completed shard and reproduces the
unbroken run's final states **bit-for-bit**, which requires determinism:

- every sketch is seeded (no thread_rng — SURVEY.md §7 watch-list);
- per-shard partial states are merged in sorted-state order, and shard
  states in shard-id order, so the merge tree is independent of Ray's
  task completion order.
"""

from __future__ import annotations

import functools
import hashlib
import json
import os
import time
from typing import Any, Callable

import pyarrow as pa
import pyarrow.parquet as pq

from approximate_quantiles_ray.engine.udaf import SketchSpec, required_columns
from approximate_quantiles_ray.sketches.base import sketch_from_bytes


class FilePartialSketcher:
    """map_batches callable over FILE PATHS: each file folds through its
    own record-batch stream (fixed ``batch_size``) into ONE sketch per
    spec — a pure function of the file, immune to Ray's block-splitting
    and task-fusion choices, so checkpointed partials are bit-stable
    across runs, sessions, and cluster load. The scan is pruned to the
    specs' required columns when every transform declares them."""

    def __init__(self, specs: list[SketchSpec], batch_size: int = 65536):
        self.specs = specs
        self.batch_size = batch_size
        self.columns = required_columns(specs)

    @staticmethod
    def _open(path: str) -> pq.ParquetFile:
        """Open a Parquet file by path OR URI. A bare ``pq.ParquetFile(path)``
        only supports local/shared-filesystem paths; resolving through
        ``pyarrow.fs.FileSystem.from_uri`` keeps checkpointed jobs working
        over remote inputs (s3://, gs://, hdfs://) the way the Ray read
        path does (ADVICE r4). Plain local paths take the fast path."""
        if "://" not in path:
            return pq.ParquetFile(path)
        from pyarrow import fs as pafs

        filesystem, fs_path = pafs.FileSystem.from_uri(path)
        return pq.ParquetFile(filesystem.open_input_file(fs_path))

    def __call__(self, paths: pa.Table) -> pa.Table:
        keys, states, counts = [], [], []
        for path in paths.column("path").to_pylist():
            pf = self._open(path)
            sketches = {s.key: s.factory() for s in self.specs}
            for rb in pf.iter_batches(batch_size=self.batch_size, columns=self.columns):
                block = pa.Table.from_batches([rb])
                cache: dict = {}
                for s in self.specs:
                    s.ingest(sketches[s.key], block, cache)
            for s in self.specs:
                sk = sketches[s.key]
                keys.append(s.key)
                states.append(sk.to_bytes())
                counts.append(sk.count)
        from approximate_quantiles_ray.engine.udaf import PARTIAL_SCHEMA

        return pa.Table.from_arrays(
            [pa.array(keys), pa.array(states, type=pa.binary()),
             pa.array(counts, type=pa.int64())],
            schema=PARTIAL_SCHEMA,
        )

PART_SCHEMA = pa.schema(
    [
        pa.field("shard_id", pa.int64()),
        pa.field("sketch_key", pa.string()),
        pa.field("state", pa.binary()),
        pa.field("count", pa.int64()),
        pa.field("nbytes", pa.int64()),
        pa.field("rows", pa.int64()),
        pa.field("wall_s", pa.float64()),
        pa.field("input_files", pa.string()),
        pa.field("config_hash", pa.string()),
    ]
)


def _config_hash(specs: list[SketchSpec]) -> str:
    """Checkpoint compatibility key. Includes:

    - each spec's EMPTY serialized state — which encodes every sketch
      parameter (delta, p, width/depth, seeds, compaction mode), so a
      precision or seed change invalidates old part files;
    - HASH_VERSION plus a runtime probe hash of a known string — so a
      change in the string-hash family (including a polars upgrade that
      alters xxhash output) also invalidates, instead of silently
      merging states built under incompatible hashes.
    """
    import pyarrow as _pa

    from approximate_quantiles_ray.functions.hashing import HASH_VERSION, hash_strings

    probe = int(hash_strings(_pa.array(["aqr-hash-probe"]))[0])
    h = hashlib.sha256()
    h.update(json.dumps([HASH_VERSION, probe]).encode())
    for s in specs:
        h.update(
            json.dumps([s.key, s.kind, s.on, s.dedup_per_batch, s.weight_on]).encode()
        )
        h.update(_transform_sig(s.transform).encode())
        h.update(s.factory().to_bytes())
    return h.hexdigest()[:16]


class UnsignableTransformError(ValueError):
    """A closure cell holds an object whose parameters cannot be
    recovered (no __dict__/__slots__/__getstate__/__reduce__): signing
    it by type name alone could silently reuse stale checkpoints after
    a parameter change, so we refuse instead (ADVICE r2 item 1)."""


def _transform_sig(transform) -> str:
    """Best-effort signature of a derived-metric transform: code bytes +
    closure cell values, so editing the derivation (e.g. char length →
    byte length, or the source column captured in the closure)
    invalidates old checkpoints instead of silently merging two
    different metrics."""
    if transform is None:
        return "none"

    def cell_sig(value, depth: int = 0) -> str:
        """Deterministic signature for a closure cell. Plain repr is NOT
        process-stable for functions / default-repr instances (their
        repr embeds a memory address), which would change the config
        hash on every run and silently re-run every shard (ADVICE r1
        item 4). Callables recurse into their own code; parameterized
        objects fold in their recoverable state (__dict__/__slots__/
        __getstate__/__reduce__) — and raise if none exists, because a
        bare type name would collapse differently-parameterized
        transforms into one signature (ADVICE r2 item 1)."""
        if depth > 4:
            return "max-depth"
        if isinstance(value, functools.partial):
            inner = (
                cell_sig(value.func, depth + 1),
                tuple(cell_sig(a, depth + 1) for a in value.args),
                tuple(
                    (k, cell_sig(v, depth + 1)) for k, v in sorted(value.keywords.items())
                ),
            )
            return "partial:" + hashlib.sha256(repr(inner).encode()).hexdigest()[:12]
        if isinstance(value, (tuple, list)):
            return (
                f"{type(value).__name__}("
                + ",".join(cell_sig(v, depth + 1) for v in value)
                + ")"
            )
        if isinstance(value, dict):
            items = sorted(value.items(), key=lambda kv: repr(kv[0]))
            return (
                "dict("
                + ",".join(f"{k!r}:{cell_sig(v, depth + 1)}" for k, v in items)
                + ")"
            )
        if callable(value) and hasattr(value, "__code__"):
            c = value.__code__
            inner = tuple(
                cell_sig(getattr(cc, "cell_contents", None), depth + 1)
                for cc in (value.__closure__ or ())
            )
            return hashlib.sha256(
                c.co_code + repr((c.co_names, c.co_consts, inner)).encode()
            ).hexdigest()[:16]
        r = repr(value)
        if " at 0x" not in r:
            return r
        # default object repr → address-bearing, unstable: recover the
        # parameter state instead (never sign by type name alone)
        base = f"instance:{type(value).__module__}.{type(value).__qualname__}"
        state = getattr(value, "__dict__", None)
        if not state and hasattr(type(value), "__slots__"):
            state = {
                s: getattr(value, s)
                for s in getattr(type(value), "__slots__", ())
                if hasattr(value, s)
            }
        if not state:
            try:
                gs = value.__getstate__()
            except Exception:
                gs = None
            if gs:
                return base + ":" + hashlib.sha256(
                    cell_sig(gs, depth + 1).encode()
                ).hexdigest()[:12]
            try:
                red = value.__reduce_ex__(2)
            except Exception:
                red = None
            if red:
                return base + ":" + hashlib.sha256(
                    cell_sig(tuple(red), depth + 1).encode()
                ).hexdigest()[:12]
            raise UnsignableTransformError(
                f"cannot sign closure cell of type {type(value)!r}: no "
                "recoverable parameter state (__dict__/__slots__/"
                "__getstate__/__reduce__) — wrap the parameters in a "
                "functools.partial or a plain function closure instead"
            )
        inner = tuple((k, cell_sig(v, depth + 1)) for k, v in sorted(state.items()))
        return base + ":" + hashlib.sha256(repr(inner).encode()).hexdigest()[:12]

    try:
        code = transform.__code__
        cells = tuple(
            cell_sig(getattr(c, "cell_contents", None)) for c in (transform.__closure__ or ())
        )
        # co_names/co_consts matter: pc.utf8_length → pc.binary_length or a
        # changed constant leaves co_code identical
        sig = code.co_code + repr((code.co_names, code.co_consts, cells)).encode()
        return hashlib.sha256(sig).hexdigest()[:16]
    except UnsignableTransformError:
        raise
    except Exception:
        return getattr(transform, "__qualname__", repr(type(transform)))


def _merge_deterministic(states: list[bytes]):
    """Fold serialized states in sorted-bytes order → order-independent."""
    if not states:
        return None
    states = sorted(states)
    acc = sketch_from_bytes(states[0])
    for s in states[1:]:
        acc.merge(sketch_from_bytes(s))
    return acc


def _shard_files(input_files: list[str], files_per_shard: int) -> list[list[str]]:
    files = sorted(input_files)
    return [files[i : i + files_per_shard] for i in range(0, len(files), files_per_shard)]


class CheckpointedSketchJob:
    """Run sketch specs over Parquet shards with resume support."""

    def __init__(
        self,
        input_files: list[str],
        specs: list[SketchSpec],
        checkpoint_dir: str,
        files_per_shard: int = 1,
        batch_size: int = 65536,
    ):
        self.shards = _shard_files(input_files, files_per_shard)
        self.specs = specs
        self.checkpoint_dir = checkpoint_dir
        self.batch_size = batch_size
        self.cfg_hash = _config_hash(specs)
        os.makedirs(checkpoint_dir, exist_ok=True)
        import threading

        self._driver_lock = threading.Lock()

    def _part_path(self, shard_id: int) -> str:
        return os.path.join(self.checkpoint_dir, f"part-{shard_id:05d}.parquet")

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.checkpoint_dir, "manifest.jsonl")

    def completed_shards(self) -> dict[int, dict]:
        """Read the manifest, keeping only entries whose part file exists
        and whose config hash matches (stale checkpoints are ignored)."""
        done: dict[int, dict] = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    entry = json.loads(line)
                    sid = entry["shard_id"]
                    if (
                        entry.get("config_hash") == self.cfg_hash
                        and sid < len(self.shards)
                        # lineage must match the CURRENT shard composition:
                        # a changed files_per_shard or input list would
                        # otherwise silently skip data
                        and entry.get("files") == self.shards[sid]
                        and os.path.exists(self._part_path(sid))
                        # the part FILE's embedded hash is authoritative (an
                        # interleaved job with another config may have
                        # overwritten it) — mismatch ⇒ not done ⇒ re-run
                        and self._part_config_ok(sid)
                    ):
                        done[sid] = entry
        return done

    def _part_config_ok(self, shard_id: int) -> bool:
        try:
            col = pq.read_table(self._part_path(shard_id), columns=["config_hash"])
            return set(col.column("config_hash").to_pylist()) == {self.cfg_hash}
        except Exception:
            return False

    def _run_shard(self, shard_id: int, files: list[str]) -> None:
        import ray.data as rd

        t0 = time.perf_counter()
        # One partial per (file, spec), built by FilePartialSketcher from
        # the file's own record-batch stream at a FIXED batch size. This
        # makes every partial a pure function of the file — independent
        # of Ray's block splitting, task fusion, or cluster load — so an
        # interrupted+resumed run is bit-equal to an unbroken one even
        # across sessions (the old per-Ray-block partials drifted with
        # the scheduler's batch boundaries). Dataset creation is
        # serialized: Ray's path resolver lazily imports optional fsspec
        # modules, and since the import FAILS in this env (no aiohttp) it
        # never caches — concurrent attempts race into a plain
        # ImportError that escapes Ray's ModuleNotFoundError guard.
        # Execution below stays concurrent.
        with self._driver_lock:
            paths = rd.from_items([{"path": f} for f in sorted(files)])
        partials = paths.map_batches(
            FilePartialSketcher(self.specs, self.batch_size),
            batch_format="pyarrow",
            batch_size=1,
        )
        by_key: dict[str, list[bytes]] = {s.key: [] for s in self.specs}
        for tbl in partials.iter_batches(batch_format="pyarrow"):
            for key, state in zip(
                tbl.column("sketch_key").to_pylist(), tbl.column("state").to_pylist()
            ):
                by_key[key].append(state)
        wall = time.perf_counter() - t0

        rows_out: dict[str, Any] = {k: [] for k in PART_SCHEMA.names}
        total_rows = 0
        for spec in self.specs:
            sk = _merge_deterministic(by_key[spec.key]) or spec.factory()
            total_rows = max(total_rows, sk.count)
            rows_out["shard_id"].append(shard_id)
            rows_out["sketch_key"].append(spec.key)
            rows_out["state"].append(sk.to_bytes())
            rows_out["count"].append(sk.count)
            rows_out["nbytes"].append(sk.nbytes)
            rows_out["rows"].append(sk.count)
            rows_out["wall_s"].append(wall)
            rows_out["input_files"].append(json.dumps(files))
            rows_out["config_hash"].append(self.cfg_hash)

        tmp = self._part_path(shard_id) + ".tmp"
        pq.write_table(pa.Table.from_pydict(rows_out, schema=PART_SCHEMA), tmp)
        os.replace(tmp, self._part_path(shard_id))
        with self._driver_lock, open(self.manifest_path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "shard_id": shard_id,
                        "files": files,
                        "rows": total_rows,
                        "wall_s": round(wall, 4),
                        "config_hash": self.cfg_hash,
                    }
                )
                + "\n"
            )

    def run(
        self, max_shards: int | None = None, max_concurrent: int = 4
    ) -> dict[str, Any]:
        """Process incomplete shards (optionally at most ``max_shards``,
        for interruption tests), then merge all completed shard states.

        Shards run as concurrent Ray Data pipelines (``max_concurrent``
        driver threads) so shard-level sequencing doesn't serialize the
        cluster; each shard still checkpoints atomically on completion
        (manifest append is under a lock).

        Returns {sketch_key: merged sketch} over the completed shards.
        """
        from concurrent.futures import ThreadPoolExecutor

        done = self.completed_shards()
        todo = [
            (shard_id, files)
            for shard_id, files in enumerate(self.shards)
            if shard_id not in done
        ]
        if max_shards is not None:
            todo = todo[:max_shards]
        if todo:
            # first shard runs inline: Ray's read path lazily imports
            # optional modules (fsspec.http, …) and a concurrent FIRST
            # import from several threads races into a plain ImportError
            # that Ray's ModuleNotFoundError guard doesn't catch; one
            # warm pass makes the rest thread-safe
            self._run_shard(*todo[0])
            rest = todo[1:]
            if rest and max_concurrent > 1:
                with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
                    list(pool.map(lambda t: self._run_shard(*t), rest))
            else:
                for shard_id, files in rest:
                    self._run_shard(shard_id, files)
        return self.collect()

    def collect(self) -> dict[str, Any]:
        """Merge completed shard states in shard-id order (deterministic)."""
        done = sorted(self.completed_shards())
        merged: dict[str, Any] = {}
        for shard_id in done:
            tbl = pq.read_table(self._part_path(shard_id))
            cfgs = set(tbl.column("config_hash").to_pylist())
            if cfgs != {self.cfg_hash}:  # gated in completed_shards; a
                # mismatch here means the file changed mid-collect —
                # raising beats returning silently-partial results
                raise RuntimeError(
                    f"checkpoint part {shard_id} config hash changed during "
                    "collect(); another job is writing this checkpoint dir"
                )
            for key, state in zip(
                tbl.column("sketch_key").to_pylist(), tbl.column("state").to_pylist()
            ):
                sk = sketch_from_bytes(state)
                if key in merged:
                    merged[key].merge(sk)
                else:
                    merged[key] = sk
        return merged

    def metrics(self) -> dict[str, Any]:
        done = self.completed_shards()
        rows = sum(e["rows"] for e in done.values())
        wall = sum(e["wall_s"] for e in done.values())
        return {
            "shards_total": len(self.shards),
            "shards_done": len(done),
            "rows": rows,
            "wall_s_sum": round(wall, 4),
            "rows_per_sec_per_shard": round(rows / wall, 1) if wall > 0 else None,
        }
