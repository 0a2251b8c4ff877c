"""Ray Data integration tests for the sketch UDAF engine (local ray)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from approximate_quantiles_ray.engine.udaf import (
    SketchSpec,
    grouped_sketches,
    sketch_columns,
    sketch_columns_streaming,
)
from approximate_quantiles_ray.sketches.base import sketch_from_bytes
from approximate_quantiles_ray.sketches.exact import ExactDigest
from approximate_quantiles_ray.sketches.hll import HLL
from approximate_quantiles_ray.sketches.kll import KLL
from approximate_quantiles_ray.sketches.tdigest import TDigest

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _value_specs():
    return [
        SketchSpec(key="v_td", factory=lambda: TDigest(delta=500.0), on="value"),
        SketchSpec(key="v_kll", factory=lambda: KLL(k=200, seed=1), on="value"),
        SketchSpec(key="u_hll", factory=lambda: HLL(p=14, seed=0), on="user_id", kind="hash"),
    ]


@pytest.fixture(scope="module")
def events_exact():
    tbl = pq.read_table(EVENTS, columns=["value", "user_id"])
    vals = tbl.column("value").to_numpy()
    users = tbl.column("user_id").to_numpy()
    return vals, users


def test_sketch_columns_vs_exact(ray_session, events_exact):
    import ray.data as rd

    vals, users = events_exact
    ds = rd.read_parquet(EVENTS, columns=["value", "user_id"])
    merged = sketch_columns(ds, _value_specs())
    ex = ExactDigest().update(vals)
    assert merged["v_td"].count == len(vals)
    assert merged["v_kll"].count == len(vals)
    for q in (0.1, 0.5, 0.9):
        assert merged["v_td"].est_value_at_quantile(q) == pytest.approx(
            ex.est_value_at_quantile(q), rel=0.05
        )
        assert merged["v_kll"].est_value_at_quantile(q) == pytest.approx(
            ex.est_value_at_quantile(q), rel=0.05
        )
    exact_users = len(np.unique(users))
    assert merged["u_hll"].estimate() == pytest.approx(exact_users, rel=0.05)


def test_streaming_path_matches_aggregate_path(ray_session, events_exact):
    import ray.data as rd

    vals, _ = events_exact
    ds = rd.read_parquet(EVENTS, columns=["value", "user_id"])
    a = sketch_columns(ds, _value_specs())
    b = sketch_columns_streaming(ds, _value_specs())
    # HLL merge is exact → identical registers regardless of plan
    np.testing.assert_array_equal(a["u_hll"].registers, b["u_hll"].registers)
    for key in ("v_td", "v_kll"):
        assert a[key].count == b[key].count == len(vals)
        assert a[key].est_value_at_quantile(0.5) == pytest.approx(
            b[key].est_value_at_quantile(0.5), rel=0.01
        )


def test_grouped_sketches(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(EVENTS, columns=["event_type", "value"])
    spec = SketchSpec(key="v_td", factory=lambda: TDigest(delta=300.0), on="value")
    out = {r["event_type"]: r["v_td"] for r in grouped_sketches(ds, "event_type", [spec]).take_all()}

    import pandas as pd

    pdf = pq.read_table(EVENTS, columns=["event_type", "value"]).to_pandas()
    for etype, grp in pdf.groupby("event_type"):
        sk = sketch_from_bytes(out[etype])
        assert sk.count == len(grp), etype
        ex = ExactDigest().update(grp["value"].to_numpy())
        assert sk.est_value_at_quantile(0.5) == pytest.approx(
            ex.est_value_at_quantile(0.5), rel=0.05
        )


def test_empty_dataset(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(EVENTS, columns=["value", "user_id"]).filter(
        lambda row: False
    )
    merged = sketch_columns(ds, _value_specs())
    assert merged["v_td"].count == 0
    assert merged["u_hll"].estimate() == 0.0


def test_heavy_hitters_matches_exact_topk(ray_session):
    import pyarrow.dataset as pads
    import ray.data as rd

    from approximate_quantiles_ray.engine.topk import heavy_hitters
    from approximate_quantiles_ray.sources.transcripts import ensure_transcripts

    table = ensure_transcripts(20_000, seed=13, n_shards=4)
    ds = rd.read_parquet(table, columns=["tool"])
    got = heavy_hitters(ds, "tool", k=10)

    df = pads.dataset(table).to_table(columns=["tool"]).to_pandas().dropna()
    exact = df["tool"].value_counts()
    # Zipf tools: top-10 sets agree; CMS estimates are upper bounds
    # within eN (e = e/width ~ 3e-4 of N)
    assert set(got["value"]) == set(exact.head(10).index)
    n = len(df)
    for _, row in got.iterrows():
        true = int(exact[row["value"]])
        assert true <= row["est_count"] <= true + 0.01 * n, row["value"]


def test_tree_merge_matches_streaming_fold(ray_session):
    import ray.data as rd

    from approximate_quantiles_ray.engine.udaf import (
        sketch_columns_streaming,
        sketch_columns_tree,
    )
    from approximate_quantiles_ray.pipelines.transcripts import global_specs
    from approximate_quantiles_ray.sources.transcripts import ensure_transcripts

    table = ensure_transcripts(20_000, seed=13, n_shards=4)
    cols = ["conv_id", "text", "tool"]
    a = sketch_columns_streaming(rd.read_parquet(table, columns=cols), global_specs())
    b = sketch_columns_tree(rd.read_parquet(table, columns=cols), global_specs())
    assert a["text_len_tdigest"].count == b["text_len_tdigest"].count
    # HLL/Bloom states are merge-order-invariant → identical
    import numpy as np

    np.testing.assert_array_equal(a["conv_hll"].registers, b["conv_hll"].registers)
    np.testing.assert_array_equal(a["conv_bloom"].bits, b["conv_bloom"].bits)
    # quantile estimates: Ray's aggregate tree combines partials in
    # task-completion order (nondeterministic run to run), so don't
    # compare the two paths to each other (that doubles the ε budget
    # and flakes at the tail) — hold EACH path to the sketch band
    # around the exact quantile instead
    import duckdb

    exact = np.sort(
        duckdb.sql(
            f"select length(text) from read_parquet('{table}/*.parquet')"
        ).df().iloc[:, 0].to_numpy()
    )
    for key in ("text_len_tdigest", "text_len_kll"):
        for q in (0.1, 0.5, 0.99):
            true = float(exact[min(len(exact) - 1, int(round(q * len(exact))))])
            for est in (a[key].est_value_at_quantile(q), b[key].est_value_at_quantile(q)):
                assert abs(est - true) / max(1.0, true) < 0.05, (key, q, est, true)


def test_grouped_top_rows_matches_pandas(ray_session):
    """Per-group top-k row selection vs a pandas ROW_NUMBER reference,
    with duplicate values (tiebreak determinism) across partitions."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.engine.topk import grouped_top_rows

    rng = np.random.default_rng(23)
    n = 3000
    tbl = pa.table(
        {
            "g": rng.choice(["a", "b", "c", "d"], n),
            "v": rng.integers(0, 50, n).astype(np.int64),  # many ties
            "tie": rng.permutation(n).astype(np.int64),
            "payload": rng.integers(0, 10, n).astype(np.int64),
        }
    )
    got = grouped_top_rows(
        rd.from_arrow(tbl).repartition(8), "g", "v", "tie", k=5, extra_cols=["payload"]
    )
    df = tbl.to_pandas().sort_values(["g", "v", "tie"], ascending=[True, False, True])
    rnk = df.groupby("g").cumcount() + 1
    want = df[rnk <= 5].assign(rnk=rnk[rnk <= 5].astype(np.int64)).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["g", "v", "tie", "payload", "rnk"]], want[["g", "v", "tie", "payload", "rnk"]]
    )


def test_grouped_ddsketch_guarantee_per_group(ray_session):
    """DDSketch through the grouped engine path: per-group estimates
    keep the alpha relative-error guarantee vs per-group numpy, and
    states are bit-identical across partitionings (exact merge law
    survives the groupby shuffle)."""
    import math

    import ray.data as rd

    from approximate_quantiles_ray.sketches.ddsketch import DDSketch

    spec = SketchSpec(key="v_dd", factory=lambda: DDSketch(alpha=0.01), on="value")

    def states(n_parts):
        ds = rd.read_parquet(EVENTS, columns=["event_type", "value"]).repartition(n_parts)
        return {
            r["event_type"]: r["v_dd"]
            for r in grouped_sketches(ds, "event_type", [spec]).take_all()
        }

    a, b = states(1), states(6)
    assert a == b  # serialized bytes equal per group

    pdf = pq.read_table(EVENTS, columns=["event_type", "value"]).to_pandas()
    for etype, grp in pdf.groupby("event_type"):
        sk = sketch_from_bytes(a[etype])
        v = np.sort(grp["value"].to_numpy())
        assert sk.count == len(v)
        for q in (0.1, 0.5, 0.99):
            true = float(v[min(int(math.floor(q * len(v) + 0.5)), len(v) - 1)])
            assert abs(sk.est_value_at_quantile(q) - true) <= 0.0101 * abs(true)


def test_weighted_spec_drops_nulls_jointly():
    """ADVICE r3 item 1: a null in EITHER the value or the weight
    column drops the whole row, keeping (value, weight) pairs aligned.
    Before the fix, independent per-column null-dropping silently
    attached wrong weights to wrong values."""
    import pyarrow as pa

    from approximate_quantiles_ray.sketches.ddsketch import DDSketch

    spec = SketchSpec(
        key="wv", factory=lambda: DDSketch(alpha=0.01), on="v", weight_on="w"
    )
    block = pa.table(
        {
            "v": pa.array([10.0, None, 30.0, 40.0], pa.float64()),
            "w": pa.array([1, 2, None, 4], pa.int64()),
        }
    )
    got = spec.build(block)
    want = DDSketch(alpha=0.01).update_weighted(
        np.array([10.0, 40.0]), np.array([1, 4])
    )
    assert got.to_bytes() == want.to_bytes()
    assert got.count == 5  # 1 + 4, not 7

    # equal-null-count misalignment case from the advice: values/weights
    # with nulls at DIFFERENT positions but the same null count must not
    # silently pair up either
    block2 = pa.table(
        {
            "v": pa.array([10.0, None, 30.0, 40.0], pa.float64()),
            "w": pa.array([1.0, 2.0, 3.0, None], pa.float64()),
        }
    )
    got2 = spec.build(block2)
    want2 = DDSketch(alpha=0.01).update_weighted(
        np.array([10.0, 30.0]), np.array([1.0, 3.0])
    )
    assert got2.to_bytes() == want2.to_bytes()


def test_config_hash_signs_weight_on():
    """ADVICE r3 item 2: weighted vs unweighted specs must produce
    different checkpoint config hashes so a weight_on change
    invalidates old part files instead of silently merging."""
    from approximate_quantiles_ray.sketches.ddsketch import DDSketch
    from approximate_quantiles_ray.state.checkpoint import _config_hash

    base = SketchSpec(key="x", factory=lambda: DDSketch(alpha=0.01), on="v")
    weighted = SketchSpec(
        key="x", factory=lambda: DDSketch(alpha=0.01), on="v", weight_on="w"
    )
    assert _config_hash([base]) != _config_hash([weighted])
    assert _config_hash([weighted]) != _config_hash(
        [SketchSpec(key="x", factory=lambda: DDSketch(alpha=0.01), on="v", weight_on="u")]
    )


def test_streaming_partials_multi_round_tree(ray_session):
    """Force sketch_columns_streaming's distributed partial reduction
    through MULTIPLE tree rounds (64 blocks, merge_fanin=3 → at least
    two map_batches merge rounds) and hold the result to exact counts,
    bit-exact order-invariant sketch states, and the quantile band —
    the r5 tree is what keeps the driver fold O(fanin) at 10^5 blocks,
    so it must not change semantics."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from approximate_quantiles_ray.engine.udaf import sketch_columns_streaming
    from approximate_quantiles_ray.pipelines.transcripts import global_specs
    from approximate_quantiles_ray.sources.transcripts import ensure_transcripts

    table = ensure_transcripts(20_000, seed=13, n_shards=4)
    cols = ["conv_id", "text", "tool"]
    ds = rd.read_parquet(table, columns=cols).repartition(64)
    tree = sketch_columns_streaming(ds, global_specs(), batch_size=512, merge_fanin=3)
    flat = sketch_columns_streaming(
        rd.read_parquet(table, columns=cols), global_specs()
    )
    n = duckdb.sql(
        f"select count(*) from read_parquet('{table}/*.parquet')"
    ).fetchone()[0]
    assert tree["text_len_tdigest"].count == flat["text_len_tdigest"].count == n
    # order-invariant states must be bit-equal regardless of tree shape
    np.testing.assert_array_equal(tree["conv_hll"].registers, flat["conv_hll"].registers)
    np.testing.assert_array_equal(tree["conv_bloom"].bits, flat["conv_bloom"].bits)
    np.testing.assert_array_equal(tree["tool_cms"].table, flat["tool_cms"].table)
    exact = np.sort(
        duckdb.sql(
            f"select length(text) from read_parquet('{table}/*.parquet')"
        ).df().iloc[:, 0].to_numpy()
    )
    for key in ("text_len_tdigest", "text_len_kll"):
        for q in (0.1, 0.5, 0.99):
            true = float(exact[min(len(exact) - 1, int(round(q * len(exact))))])
            est = tree[key].est_value_at_quantile(q)
            assert abs(est - true) / max(1.0, true) < 0.05, (key, q, est, true)
