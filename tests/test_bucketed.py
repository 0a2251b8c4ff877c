"""Bucketed layout: write partitioned by hash(conv), then shuffle-free
latency sketches must agree with the sort-based segmented path."""

from __future__ import annotations

import shutil

import numpy as np
import pytest

from approximate_quantiles_ray.sources.transcripts import ensure_transcripts


@pytest.fixture(scope="module")
def bucketed_root(ray_session):
    import ray.data as rd

    from approximate_quantiles_ray.sources.bucketed import write_bucketed

    src = ensure_transcripts(20_000, seed=13, n_shards=4)
    out = "/tmp/aqr_bucketed_test"
    shutil.rmtree(out, ignore_errors=True)
    write_bucketed(rd.read_parquet(src), out, key="conv_id", n_buckets=8)
    return src, out


def test_buckets_hold_whole_conversations(bucketed_root):
    import pyarrow.dataset as pads

    src, out = bucketed_root
    from approximate_quantiles_ray.sources.bucketed import bucket_dirs

    dirs = bucket_dirs(out)
    assert len(dirs) == 8
    seen: dict[str, str] = {}
    total = 0
    for d in dirs:
        convs = pads.dataset(d).to_table(columns=["conv_id"]).column("conv_id").to_pylist()
        total += len(convs)
        for c in set(convs):
            assert seen.setdefault(c, d) == d, f"conv {c} split across buckets"
    assert total == pads.dataset(src).count_rows()


def test_bucketed_latency_matches_segmented(bucketed_root):
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.transcripts import latency_sketches, latency_specs
    from approximate_quantiles_ray.sources.bucketed import latency_sketches_bucketed

    src, out = bucketed_root
    sort_based = latency_sketches(
        rd.read_parquet(src, columns=["conv_id", "turn_idx", "ts"]), latency_specs()
    )
    bucketed = latency_sketches_bucketed(out, latency_specs())
    a, b = sort_based["latency_tdigest"], bucketed["latency_tdigest"]
    assert a.count == b.count  # identical gap multisets
    for q in (0.1, 0.5, 0.9, 0.99):
        assert b.est_value_at_quantile(q) == pytest.approx(
            a.est_value_at_quantile(q), rel=0.02, abs=0.05
        ), q


def test_bucketed_grouped_sketches_match_shuffle_grouped(bucketed_root):
    import numpy as np
    import ray.data as rd

    from approximate_quantiles_ray.engine.udaf import SketchSpec, grouped_sketches
    from approximate_quantiles_ray.sketches.base import sketch_from_bytes
    from approximate_quantiles_ray.sketches.tdigest import TDigest
    from approximate_quantiles_ray.sources.bucketed import grouped_sketches_bucketed

    src, out = bucketed_root
    spec = SketchSpec(key="turn_td", factory=lambda: TDigest(delta=200), on="turn_idx")
    shuffled = (
        grouped_sketches(
            rd.read_parquet(src, columns=["conv_id", "turn_idx"]), "conv_id", [spec]
        )
        .to_pandas()
        .set_index("conv_id")
    )
    bucketed = grouped_sketches_bucketed(
        out, "conv_id", [spec], columns=["conv_id", "turn_idx"]
    ).set_index("conv_id")
    assert sorted(shuffled.index) == sorted(bucketed.index)
    rng = np.random.default_rng(0)
    for conv in rng.choice(shuffled.index.to_numpy(), size=20, replace=False):
        a = sketch_from_bytes(shuffled.loc[conv, "turn_td"])
        b = sketch_from_bytes(bucketed.loc[conv, "turn_td"])
        assert a.count == b.count
        assert b.est_value_at_quantile(0.5) == pytest.approx(
            a.est_value_at_quantile(0.5), rel=0.02, abs=1.0
        ), conv


def test_bucketed_gap_hist_quantiles_match_segmented(bucketed_root):
    """Exact latency quantiles over the bucketed layout must equal the
    range-sort + boundary-stitch plan element-for-element."""
    import pandas as pd
    import ray.data as rd

    from approximate_quantiles_ray.engine.segmented import segmented_gap_hist
    from approximate_quantiles_ray.pipelines.relational import quantiles_from_histogram
    from approximate_quantiles_ray.sources.bucketed import gap_hist_bucketed

    src, out = bucketed_root
    qs = (0.5, 0.9, 0.99)
    a = quantiles_from_histogram(gap_hist_bucketed(out), "gap_us", qs, pre_grouped=False)
    hist, boundary = segmented_gap_hist(
        rd.read_parquet(src, columns=["conv_id", "turn_idx", "ts"])
    )
    b = quantiles_from_histogram(
        hist, "gap_us", qs, extra_values=boundary, pre_grouped=False
    )
    pd.testing.assert_frame_equal(a, b)


def test_conv_fingerprints_detect_planted_dups(ray_session, tmp_path_factory):
    """Order-sensitive conversation fingerprints: identical ordered
    content (even with shifted absolute turn_idx and a different
    conv_id, split across different buckets) collides; reordered or
    edited content does not."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.sources.bucketed import (
        conv_fingerprints_bucketed,
        write_bucketed,
    )

    rows = []
    texts = ["hello", "world", "how are you", "fine"]
    # base conversation
    for i, t in enumerate(texts):
        rows.append(("conv_a", i, t))
    # exact duplicate, different id + shifted turn indices
    for i, t in enumerate(texts):
        rows.append(("conv_b", i + 7, t))
    # same multiset, different order → different fingerprint
    for i, t in enumerate(reversed(texts)):
        rows.append(("conv_c", i, t))
    # one edited turn → different fingerprint
    for i, t in enumerate(["hello", "world", "how are you", "FINE"]):
        rows.append(("conv_d", i, t))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    df["turn_idx"] = df["turn_idx"].astype(np.int64)
    out = str(tmp_path_factory.mktemp("convdup") / "buckets")
    write_bucketed(rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
                   out, key="conv_id", n_buckets=4)
    fps = conv_fingerprints_bucketed(out).to_pandas().set_index("conv_id")["fp"]
    assert fps["conv_a"] == fps["conv_b"]  # duplicate found across buckets
    assert fps["conv_a"] != fps["conv_c"]  # order matters
    assert fps["conv_a"] != fps["conv_d"]  # content matters
    assert fps["conv_c"] != fps["conv_d"]


def test_cobucket_join_matches_pandas(ray_session, tmp_path_factory):
    """Co-partitioned bucket join == pandas merge on random int keys;
    layouts with mismatched bucket counts are rejected."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from approximate_quantiles_ray.sources.bucketed import cobucket_join, write_bucketed

    rng = np.random.default_rng(55)
    left = pd.DataFrame(
        {"k": rng.integers(0, 300, 500).astype(np.int64), "a": rng.integers(0, 10, 500)}
    )
    right = pd.DataFrame(
        {"kk": rng.integers(0, 300, 400).astype(np.int64), "b": rng.integers(0, 10, 400)}
    )
    root = tmp_path_factory.mktemp("cbj")
    lo, ro = str(root / "l"), str(root / "r")
    write_bucketed(rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)), lo,
                   key="k", n_buckets=8)
    write_bucketed(rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)), ro,
                   key="kk", n_buckets=8)
    got = (
        cobucket_join(lo, ro, "k", "kk", columns_left=["k", "a"], columns_right=["kk", "b"])
        .to_pandas()
        .sort_values(["k", "a", "b"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="kk")[["k", "a", "b"]]
        .sort_values(["k", "a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "a", "b"]], want)
    # bucket-count mismatch must fail loudly, not silently drop matches
    ro4 = str(root / "r4")
    write_bucketed(rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)), ro4,
                   key="kk", n_buckets=4)
    with pytest.raises(ValueError, match="disagree"):
        cobucket_join(lo, ro4, "k", "kk")
