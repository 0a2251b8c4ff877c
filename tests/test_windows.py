"""Tumbling-window aggregates: window key derivation and per-window
sketch counts vs a pandas oracle."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from approximate_quantiles_ray.pipelines.windows import add_window_column, transcript_daily_text_len


def test_add_window_column_floors_to_hour():
    ts = pa.array(
        pd.to_datetime(
            ["2024-01-01 10:59:59.999", "2024-01-01 11:00:00.000", "2024-01-02 00:30:00.000"]
        )
    )
    t = pa.table({"ts": ts})
    out = add_window_column(t, "ts", "hour")
    got = pd.Series(out.column("window_start").to_pandas())
    assert got.tolist() == pd.to_datetime(
        ["2024-01-01 10:00:00", "2024-01-01 11:00:00", "2024-01-02 00:00:00"]
    ).tolist()


def test_daily_sketch_windows_cover_all_turns(ray_session):
    out = transcript_daily_text_len("/root/testdata/sf0.001")
    assert len(out) >= 25  # ~30-day window span in the corpus
    import pyarrow.dataset as pads

    from approximate_quantiles_ray.pipelines.transcript_exact import transcripts_dir_for

    total = pads.dataset(transcripts_dir_for("/root/testdata/sf0.001")).count_rows()
    assert out["n_turns"].sum() == total
    df = pads.dataset(transcripts_dir_for("/root/testdata/sf0.001")).to_table(
        columns=["ts", "text"]
    ).to_pandas()
    df["day"] = df["ts"].dt.floor("D")
    lens = df["text"].str.len()
    # compare only well-populated windows: on a handful of values the
    # t-digest p50 and pandas' interpolated median legitimately diverge
    big = out[out["n_turns"] >= 100].head(5)
    assert len(big) >= 3
    for _, row in big.iterrows():
        grp = lens[df["day"] == row["window_start"]]
        assert row["len_p50"] == pytest.approx(grp.median(), rel=0.05, abs=8)
