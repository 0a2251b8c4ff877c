"""Driver-style correctness sweep: run EVERY ``queries()`` entry and
compare oracle-backed ones to DuckDB (rows / schema / dtypes / exact
values, column-name aligned) — the same comparison the per-round
CORRECTNESS gate applies, runnable locally before committing.

    python tools/oracle_sweep.py [--sf-dir /root/testdata/sf0.01] [--only name ...]

Owns its Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys
import traceback
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_df(r):
    import pyarrow as pa

    if isinstance(r, pd.DataFrame):
        return r
    if isinstance(r, pa.Table):
        return r.to_pandas()
    return r.to_pandas()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    ray.init(
        address="local", num_cpus=args.num_cpus,
        include_dashboard=False, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as mod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = mod.queries()
    sqls = mod.oracle_sql()
    # __ray_entry__ binds its transcript-table oracles to the DRIVER's
    # correctness scale (sf0.01); when sweeping another sf_dir, rebuild
    # the dir-dependent oracles for THAT dir so queries and twins read
    # the same transcript corpus
    from approximate_quantiles_ray.pipelines import sketch_gates, windows
    from approximate_quantiles_ray.pipelines import transcript_exact as te

    sqls.update(te.oracle_sql(args.sf_dir))
    sqls.update(windows.oracle_sql(args.sf_dir))
    sqls.update(sketch_gates.oracle_sql(args.sf_dir))
    if args.only:
        qs = {k: v for k, v in qs.items() if k in set(args.only)}

    res: dict = {}
    fails: list[str] = []
    for name, fn in sorted(qs.items()):
        try:
            got = to_df(fn(args.sf_dir))
            if name not in sqls:
                res[name] = {"rows": len(got), "oracle": None}
                continue
            exp = con.sql(sqls[name]).df()
            g, e = norm(got), norm(exp)
            ok = (
                list(g.columns) == list(e.columns)
                and len(g) == len(e)
                and [str(t) for t in g.dtypes] == [str(t) for t in e.dtypes]
            )
            if ok:
                try:
                    pd.testing.assert_frame_equal(g, e, check_exact=True)
                except AssertionError:
                    ok = False
            res[name] = {"rows": len(g), "oracle": bool(ok)}
            if not ok:
                fails.append(name)
        except Exception as ex:  # noqa: BLE001 — sweep must finish
            res[name] = {"err": repr(ex)[:200]}
            fails.append(name)
            traceback.print_exc()

    n_green = sum(1 for v in res.values() if v.get("oracle") is True)
    print(
        json.dumps(
            {
                "total": len(res),
                "oracle_green": n_green,
                "no_oracle": sum(1 for v in res.values() if v.get("oracle") is None),
                "fails": fails,
            }
        )
    )
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
