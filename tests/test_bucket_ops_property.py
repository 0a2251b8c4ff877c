"""Randomized property tests for the order-sensitive user-bucket
operators: the vectorized funnel automaton and the merged-order
attribution probe must match a brute-force per-user Python reference
on arbitrary event streams (random types, heavy ts ties, shuffled
input order, many buckets)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from approximate_quantiles_ray.pipelines import relational as rel

TYPES = ["view", "click", "purchase", "error", "signup"]


def _random_events(rng, n_users=40, n_events=600):
    uid = rng.integers(1, n_users + 1, n_events)
    ty = rng.choice(TYPES, n_events)
    # coarse ts grid → many exact ties, the adversarial case
    ts = rng.integers(0, 50, n_events).astype(np.int64) * 1_000_000
    val = rng.integers(0, 500, n_events) / 100.0
    eid = rng.permutation(n_events) + 1
    return pa.table(
        {
            "event_id": pa.array(eid.astype(np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uid.astype(np.int64)),
            "event_type": pa.array(ty.astype(object), pa.string()),
            "value": pa.array(val, pa.float64()),
            "props": pa.array(['{"k": 1}'] * n_events),
        }
    )


def _brute_funnel(tbl):
    import collections

    by_user = collections.defaultdict(list)
    for eid, ts, uid, ty in zip(
        tbl.column("event_id").to_pylist(),
        tbl.column("ts").cast(pa.int64()).to_pylist(),
        tbl.column("user_id").to_pylist(),
        tbl.column("event_type").to_pylist(),
    ):
        by_user[uid].append((ts, ty))
    n_v = n_c = n_p = 0
    for evs in by_user.values():
        vts = [t for t, y in evs if y == "view"]
        if not vts:
            continue
        n_v += 1
        v = min(vts)
        cts = [t for t, y in evs if y == "click" and t >= v]
        if not cts:
            continue
        n_c += 1
        c = min(cts)
        pts = [t for t, y in evs if y == "purchase" and t >= c]
        if pts:
            n_p += 1
    return {
        "n_users": len(by_user),
        "n_viewed": n_v,
        "n_clicked_after_view": n_c,
        "n_purchased_after_click": n_p,
    }


def _brute_attribution(tbl, window_us=3_600_000_000):
    import collections

    by_user = collections.defaultdict(lambda: {"c": [], "p": []})
    for ts, uid, ty, val in zip(
        tbl.column("ts").cast(pa.int64()).to_pylist(),
        tbl.column("user_id").to_pylist(),
        tbl.column("event_type").to_pylist(),
        tbl.column("value").to_pylist(),
    ):
        if ty == "click":
            by_user[uid]["c"].append(ts)
        elif ty == "purchase":
            by_user[uid]["p"].append((ts, int(round(val * 100))))
    rows = {}
    for uid, d in by_user.items():
        if not d["p"]:
            continue
        clicks = sorted(d["c"])
        n_att = cents = 0
        for pt, pc_ in d["p"]:
            last = None
            for ct in clicks:
                if ct <= pt:
                    last = ct
                else:
                    break
            if last is not None and pt - last <= window_us:
                n_att += 1
                cents += pc_
        rows[uid] = (len(d["p"]), n_att, cents)
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_funnel_matches_bruteforce(ray_session, tmp_path_factory, seed):
    rng = np.random.default_rng(seed)
    tbl = _random_events(rng)
    d = tmp_path_factory.mktemp(f"fp{seed}")
    pq.write_table(tbl, str(d / "events.parquet"))
    out = rel.events_funnel_counts(str(d)).iloc[0].to_dict()
    assert out == _brute_funnel(tbl)


@pytest.mark.parametrize("seed", [5, 6, 7])
def test_attribution_matches_bruteforce(ray_session, tmp_path_factory, seed):
    rng = np.random.default_rng(seed)
    tbl = _random_events(rng)
    d = tmp_path_factory.mktemp(f"ap{seed}")
    pq.write_table(tbl, str(d / "events.parquet"))
    out = rel.events_click_attribution(str(d))
    got = {
        int(r.user_id): (int(r.n_purchases), int(r.n_attributed), int(r.attributed_cents))
        for r in out.itertuples()
    }
    assert got == _brute_attribution(tbl)
