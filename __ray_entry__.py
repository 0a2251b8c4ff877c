"""Driver contract for the graft builder (Ray Data target).

Three groups of queries:

- **Exact, oracle-matched** (relational / text-stats / transcript
  companions): results are bit-identical to the DuckDB SQL in
  ``oracle_sql()`` — integer sums (cents), min/max, counts, and
  element-selection quantiles only, so value hashes are stable.
- **Transcript exact companions**: run over the deterministic synthetic
  transcript table (BASELINE.json input_hint schema) generated under
  /tmp; their oracle SQL reads the same Parquet via read_parquet(path).
- **Sketch/ANN/dedup gates** (pipelines/sketch_gates.py): approximate
  queries are registered through oracle-matched gates — exact scalars
  hash-pinned against DuckDB, approximation guarantees as boolean laws
  the SQL twin pins to TRUE. Every queries() entry has an oracle_sql()
  twin (no rows-only entries remain); the raw estimate surfaces stay
  on the underlying pipeline functions for bench/pytest.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

# the driver may import this module by file path from another cwd — make
# the package resolvable regardless
_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import pandas as pd


def _register_package_by_value() -> None:
    """Ray workers import UDF modules BY NAME; if the driver's cwd isn't
    the repo root (file-path import), workers raise ModuleNotFoundError
    for our package. Registering every submodule with cloudpickle's
    by-value serializer ships the code inside each task spec instead —
    cwd-independent. No-op if anything is unavailable."""
    try:
        import importlib
        import pkgutil

        from ray import cloudpickle as _cp

        import approximate_quantiles_ray as _pkg

        _cp.register_pickle_by_value(_pkg)
        for info in pkgutil.walk_packages(_pkg.__path__, _pkg.__name__ + "."):
            try:
                _cp.register_pickle_by_value(importlib.import_module(info.name))
            except Exception:
                pass
    except Exception:
        pass


_register_package_by_value()

from approximate_quantiles_ray.pipelines import relational, textstats
from approximate_quantiles_ray.pipelines import transcript_exact as te
from approximate_quantiles_ray.pipelines.transcripts import (
    order_invariant_summary,
    transcript_report,
)
from approximate_quantiles_ray.sources.transcripts import transcripts_for_sf

_ORACLE_SF_DIR = "/root/testdata/sf0.01"  # driver's t2 correctness scale


def entry() -> Any:
    """Flagship pipeline: full sketch suite (t-digest + KLL quantiles of
    per-turn text length, inter-turn latency, HLL distinct convs,
    count-min tool heavy hitters, Bloom membership) over the sf0.001
    synthetic transcript table."""
    table_dir = transcripts_for_sf(0.001)
    return transcript_report(table_dir)


def _membership(sf_dir: str) -> pd.DataFrame:
    """Oracle-matched: probes are the first 200 sorted distinct conv_ids
    (SQL-reproducible) and Bloom's no-false-negative law fixes
    present_hits == present_probes. The hash-dependent fp-rate estimate
    lives in conv_membership_check (bench surface, pytest-bounded)."""
    from approximate_quantiles_ray.pipelines.transcripts import conv_membership_gate

    return conv_membership_gate(te.transcripts_dir_for(sf_dir))


def _order_invariant(sf_dir: str) -> pd.DataFrame:
    """Oracle-matched on the SQL-checkable invariants (row conservation
    + sortedness attestation); the order-insensitive xor/add checksums
    stay a pytest contract (tests/test_transcripts_pipeline.py) — no
    SQL twin exists for the hash."""
    import ray.data as rd

    summary = order_invariant_summary(
        rd.read_parquet(
            te.transcripts_dir_for(sf_dir), columns=["conv_id", "turn_idx", "text"]
        )
    )
    return pd.DataFrame(
        [{"n_rows": int(summary["rows"]), "sorted_ok": bool(summary["sorted_ok"])}]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {}
    q.update(relational.QUERIES)
    q.update(textstats.QUERIES)
    q.update(te.QUERIES)
    q["transcript_membership"] = _membership
    q["transcript_order_invariant"] = _order_invariant
    try:  # extension pipelines registered as they land
        from approximate_quantiles_ray.pipelines import (
            curation,
            dedup,
            drift,
            multimodal,
            overlap,
            patterns,
            sampling,
            sessions,
            similarity,
            windows,
        )

        q.update(drift.QUERIES)
        q.update(curation.QUERIES)
        q.update(dedup.QUERIES)
        q.update(similarity.QUERIES)
        q.update(windows.QUERIES)
        q.update(sessions.QUERIES)
        q.update(multimodal.QUERIES)
        q.update(sampling.QUERIES)
        q.update(overlap.QUERIES)
        q.update(patterns.QUERIES)
    except ImportError:
        pass
    # oracle-matched gates for the sketch suite (round-3 verdict item 1):
    # registered LAST so the gate versions win the shared names — exact
    # scalars hash-pinned, approximation guarantees as boolean laws
    from approximate_quantiles_ray.pipelines import sketch_gates

    q.update(sketch_gates.QUERIES)
    return q


def oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {}
    sqls.update(relational.ORACLE_SQL)
    sqls.update(textstats.ORACLE_SQL)
    # transcript oracles read the deterministic /tmp parquet the queries
    # use (generated on demand — oracle_sql() may be called first)
    sqls.update(te.oracle_sql(_ORACLE_SF_DIR))
    try:
        from approximate_quantiles_ray.pipelines import (
            curation,
            dedup,
            drift,
            overlap,
            patterns,
            sampling,
            sessions,
            similarity,
            windows,
        )

        sqls.update(drift.ORACLE_SQL)
        sqls.update(curation.ORACLE_SQL)
        sqls.update(dedup.ORACLE_SQL)
        sqls.update(similarity.ORACLE_SQL)
        sqls.update(windows.ORACLE_SQL)
        sqls.update(windows.oracle_sql(_ORACLE_SF_DIR))
        sqls.update(sessions.ORACLE_SQL)
        sqls.update(sampling.ORACLE_SQL)
        sqls.update(overlap.ORACLE_SQL)
        sqls.update(patterns.ORACLE_SQL)
    except ImportError:
        pass
    from approximate_quantiles_ray.pipelines import sketch_gates

    sqls.update(sketch_gates.ORACLE_SQL)
    sqls.update(sketch_gates.extra_oracle_sql())
    sqls.update(sketch_gates.oracle_sql(_ORACLE_SF_DIR))
    return sqls
