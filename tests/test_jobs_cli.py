"""jobs CLI entrypoints driven through main(argv) (the ray-job-submit
surface): synth, report, checkpointed resume, dedup write, bucketize."""

from __future__ import annotations

import json
import shutil

import pyarrow.dataset as pads
import pytest


@pytest.fixture(scope="module")
def cli_table(ray_session, tmp_path_factory):
    from approximate_quantiles_ray import jobs

    root = tmp_path_factory.mktemp("cli")
    out = str(root / "table")
    jobs.main(["synth", "--out", out, "--n-turns", "8000", "--n-shards", "4"])
    return root, out


def test_synth_and_report(cli_table, capsys):
    from approximate_quantiles_ray import jobs

    root, table = cli_table
    assert pads.dataset(table).count_rows() >= 8000
    out_json = str(root / "report.json")
    jobs.main(["report", "--input", table, "--output", out_json, "--no-latency"])
    rep = json.load(open(out_json))
    assert rep["turns_count"] >= 8000
    assert rep["text_len_p50_tdigest"] > 0


def test_checkpointed_resume(cli_table, capsys):
    from approximate_quantiles_ray import jobs

    root, table = cli_table
    ck = str(root / "ckpt")
    jobs.main(["checkpointed", "--input", table, "--checkpoint-dir", ck, "--max-shards", "2"])
    capsys.readouterr()
    jobs.main(["checkpointed", "--input", table, "--checkpoint-dir", ck,
               "--output", str(root / "ck.json")])
    res = json.load(open(root / "ck.json"))
    assert res["metrics"]["shards_done"] == 4
    assert res["turns"] == pads.dataset(table).count_rows()


def test_dedup_cli_pruned_scan_no_driver_ids(ray_session, tmp_path_factory, capsys, monkeypatch):
    """cmd_dedup's keep-set scan must be PRUNED to (id, text) — on a
    wide 100-TB corpus the unprojected read was the job's largest
    avoidable cost (r4 verdict item 2); the semi-join side reads full
    rows because they ARE the output. And it must never collect ids to
    the driver (no Dataset.to_pandas) — the keep-set stays distributed
    and rows are selected by a semi join."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data import Dataset

    from approximate_quantiles_ray import jobs

    root = tmp_path_factory.mktemp("dedupcli")
    texts = ["a", "b", "c", "d", "e", "a", "b", "c", "x", "y"]
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}),
        str(root / "docs.parquet"),
    )
    scans = []
    real = rd.read_parquet

    def recording(*a, **k):
        scans.append(k.get("columns"))
        return real(*a, **k)

    monkeypatch.setattr(rd, "read_parquet", recording)

    def no_collect(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("cmd_dedup must not collect a Dataset to the driver")

    monkeypatch.setattr(Dataset, "to_pandas", no_collect)
    out = str(root / "out")
    jobs.main(["dedup", "--input", str(root / "docs.parquet"), "--output", out])
    assert scans == [["doc_id", "text"], None]  # pruned keep scan + full output scan
    emitted = json.loads(capsys.readouterr().out)
    assert emitted["kept"] == 7
    got = sorted(pads.dataset(out).to_table().column("doc_id").to_pylist())
    assert got == [0, 1, 2, 3, 4, 8, 9]  # MIN(id) per distinct text


def test_bucketize(cli_table, capsys):
    from approximate_quantiles_ray import jobs
    from approximate_quantiles_ray.sources.bucketed import bucket_dirs

    root, table = cli_table
    out = str(root / "buckets")
    shutil.rmtree(out, ignore_errors=True)
    jobs.main(["bucketize", "--input", table, "--output", out, "--n-buckets", "4"])
    dirs = bucket_dirs(out)
    assert len(dirs) == 4
    assert sum(pads.dataset(d).count_rows() for d in dirs) == pads.dataset(table).count_rows()


def test_sample_cli_replayable(ray_session, tmp_path_factory, capsys):
    """sample job keeps the hash-selected rows, writes partitioned
    Parquet, and a re-run selects the identical set (replayability)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from approximate_quantiles_ray import jobs
    from approximate_quantiles_ray.pipelines.sampling import bernoulli_mask

    root = tmp_path_factory.mktemp("sample")
    src = str(root / "docs.parquet")
    ids = np.arange(5000, dtype=np.int64)
    pq.write_table(pa.table({"doc_id": ids, "n_chars": ids % 97}), src)

    out1, out2 = str(root / "out1"), str(root / "out2")
    jobs.main(["sample", "--input", src, "--output", out1,
               "--rate-permille", "200", "--seed", "7"])
    capsys.readouterr()
    jobs.main(["sample", "--input", src, "--output", out2,
               "--rate-permille", "200", "--seed", "7"])

    got1 = sorted(pads.dataset(out1).to_table().column("doc_id").to_pylist())
    got2 = sorted(pads.dataset(out2).to_table().column("doc_id").to_pylist())
    want = sorted(ids[bernoulli_mask(ids, 200, 7)].tolist())
    assert got1 == want and got2 == want
    assert abs(len(want) / 5000 - 0.2) < 0.02


def test_simjoin_cli(ray_session, tmp_path_factory, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from approximate_quantiles_ray import jobs

    root = tmp_path_factory.mktemp("simjoin")
    src = str(root / "docs.parquet")
    words = [f"w{i}" for i in range(20)]
    base = " ".join(words)  # 16 shingles; one changed word → 11 shared → 524‰
    texts = [base, base.replace("w3", "CHANGED"), "unrelated words only here now maybe"]
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": texts}), src
    )
    out = str(root / "pairs")
    jobs.main(["simjoin", "--input", src, "--output", out, "--tau-permille", "300"])
    pairs = pads.dataset(out).to_table().to_pandas()
    assert len(pairs) == 1
    assert (pairs.a.iloc[0], pairs.b.iloc[0]) == (0, 1)
    assert pairs.jacc_permille.iloc[0] >= 300


def test_pq_index_job_persists_searchable_codes(ray_session, tmp_path_factory, capsys):
    """pq-index writes a pure-Parquet code table + codebook blob; an ADC
    scan over the PERSISTED codes must reproduce the candidates a fresh
    in-memory encode produces (the job is the run-once scale path)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from approximate_quantiles_ray import jobs
    from approximate_quantiles_ray.engine.stages import worker_cached_stage
    from approximate_quantiles_ray.pipelines.similarity import PQTopK, _merge_topk

    root = tmp_path_factory.mktemp("pqjob")
    src = str(root / "emb.parquet")
    rng = np.random.default_rng(31)
    centers = rng.standard_normal((4, 32)) * 3
    pts = np.vstack([c + rng.standard_normal((100, 32)) for c in centers])
    ids = np.arange(len(pts), dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "vec_id": ids,
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(pts.astype(np.float32).ravel(), pa.float32()), 32
                ),
            }
        ),
        src,
    )
    out = str(root / "codes")
    jobs.main(["pq-index", "--input", src, "--output", out,
               "--sample-size", "400", "--ks", "64"])
    codes = rd.read_parquet(out)
    assert codes.count() == len(pts)
    z = np.load(out + "_codebooks.npz")
    qref = ray.put({"qids": ids[:2], "matrix": pts[:2]})
    bref = ray.put({"coarse": z["coarse"], "books": z["books"]})
    got = _merge_topk(
        codes.map_batches(
            worker_cached_stage(PQTopK, queries_ref=qref, books_ref=bref, k=20),
            batch_format="pyarrow", zero_copy_batch=True,
        ).to_pandas(),
        20,
    )
    assert set(got["query_id"]) == {0, 1}
    assert (got.groupby("query_id").size() == 20).all()
    # self-similar cluster members dominate: top hits share the query's cluster
    for q in (0, 1):
        top = got[got["query_id"] == q].nsmallest(5, "rank")["vec_id"].to_numpy()
        assert (top // 100 == q // 100).mean() >= 0.8


def test_shuffle_export_deterministic(ray_session, tmp_path_factory, capsys):
    """shuffle-export: rows conserved, shard = splitmix64(id^mix(seed))
    % n_shards for every row, per-shard row SETS identical across two
    runs, and a different seed actually reshuffles."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from approximate_quantiles_ray import jobs
    from approximate_quantiles_ray.functions.hashing import splitmix64

    root = tmp_path_factory.mktemp("shufex")
    src = str(root / "docs.parquet")
    n = 5000
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array([f"doc {i}" for i in range(n)]),
            }
        ),
        src,
    )

    def run(out, seed):
        jobs.main(["shuffle-export", "--input", src, "--output", out,
                   "--n-shards", "4", "--seed", str(seed)])
        capsys.readouterr()
        ds = pads.dataset(out, partitioning="hive")
        t = ds.to_table()
        return t

    a = run(str(root / "a"), 42)
    b = run(str(root / "b"), 42)
    c = run(str(root / "c"), 7)
    assert a.num_rows == b.num_rows == c.num_rows == n
    import pandas as pd

    da = a.to_pandas().sort_values("doc_id").reset_index(drop=True)
    db = b.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(da[["doc_id", "shard", "h"]], db[["doc_id", "shard", "h"]])
    # shard formula is verifiable from the id alone
    ids = da["doc_id"].to_numpy(np.int64).astype(np.uint64)
    h = splitmix64(ids ^ splitmix64(np.uint64(42)))
    assert (da["shard"].to_numpy(np.int64) == (h % 4).astype(np.int64)).all()
    # a different seed gives a genuinely different assignment
    dc = c.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (da["shard"].to_numpy() != dc["shard"].to_numpy()).mean() > 0.5
    # shards are roughly balanced (hash uniformity)
    sizes = da.groupby("shard").size()
    assert len(sizes) == 4 and sizes.min() > n / 4 * 0.8


def test_curate_end_to_end(ray_session, tmp_path_factory, capsys):
    """curate: stage counts form a consistent funnel, the export is a
    valid sharded layout of survivors only, and the whole job is
    deterministic for a fixed (input, seed)."""
    import json

    import numpy as np

    from approximate_quantiles_ray import jobs

    root = tmp_path_factory.mktemp("curate")
    src = "/root/testdata/sf0.001/documents.parquet"

    def run(tag):
        outj = str(root / f"{tag}.json")
        jobs.main(["curate", "--input", src, "--output", str(root / tag),
                   "--output-json", outj, "--n-shards", "4"])
        capsys.readouterr()
        rep = json.load(open(outj))
        t = pads.dataset(str(root / tag), partitioning="hive").to_table()
        return rep, t

    rep, t = run("a")
    # funnel consistency
    assert rep["after_dedup"] <= rep["input"]
    assert (rep["after_filters"] == rep["after_dedup"] - rep["bench_held_out"]
            - rep["contaminated_dropped"] - rep["lowqual_dropped"])
    assert rep["exported"] == t.num_rows <= rep["after_filters"]
    # no benchmark docs in the export
    ids = t.column("doc_id").to_numpy()
    assert (ids % 50 != 0).all()
    assert len(np.unique(ids)) == len(ids)  # deduped
    assert set(np.unique(t.column("shard").to_numpy())) <= {0, 1, 2, 3}
    # determinism
    rep2, t2 = run("b")
    assert rep2["exported"] == rep["exported"]
    assert sorted(t2.column("doc_id").to_numpy()) == sorted(ids)


def test_ingest_jsonl_csv_tsv(ray_session, tmp_path_factory, capsys):
    """ingest: JSONL, CSV and TSV dumps round-trip into Parquet with
    identical rows; --columns projects at ingest time."""
    import csv as _csv
    import json as _json

    import pyarrow.parquet as pq

    from approximate_quantiles_ray import jobs

    root = tmp_path_factory.mktemp("ingest")
    rows = [
        {"doc_id": i, "text": f"doc number {i}", "score": i * 10}
        for i in range(200)
    ]
    jl = root / "dump.jsonl"
    jl.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")
    cv = root / "dump.csv"
    with open(cv, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["doc_id", "text", "score"])
        w.writeheader()
        w.writerows(rows)
    tv = root / "dump.tsv"
    with open(tv, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["doc_id", "text", "score"], delimiter="\t")
        w.writeheader()
        w.writerows(rows)

    for src in (jl, cv, tv):
        out = str(root / (src.stem + "_" + src.suffix.lstrip(".")))
        jobs.main(["ingest", "--input", str(src), "--output", out])
        capsys.readouterr()
        t = pads.dataset(out).to_table().sort_by("doc_id")
        assert t.num_rows == 200
        assert t.column("doc_id").to_pylist() == [r["doc_id"] for r in rows]
        assert t.column("text").to_pylist() == [r["text"] for r in rows]

    # projection at ingest
    out = str(root / "proj")
    jobs.main(["ingest", "--input", str(jl), "--output", out,
               "--columns", "doc_id,text"])
    capsys.readouterr()
    t = pads.dataset(out).to_table()
    assert sorted(t.schema.names) == ["doc_id", "text"]


def test_layout_cli_range_and_zorder(ray_session, tmp_path_factory, capsys):
    import json

    import numpy as np

    from approximate_quantiles_ray import jobs

    root = tmp_path_factory.mktemp("layout")
    src = "/root/testdata/sf0.001/events.parquet"
    out_r = str(root / "range")
    jobs.main(["layout", "--input", src, "--output", out_r,
               "--mode", "range", "--col", "value", "--n-parts", "4"])
    rep = json.loads(capsys.readouterr().out.strip())
    assert len(rep["bounds"]) == 3
    t = pads.dataset(out_r, partitioning="hive").to_table()
    import pyarrow.parquet as _pq

    n_src = _pq.read_metadata(src).num_rows
    assert t.num_rows == n_src
    counts = np.bincount(t.column("part").to_numpy(), minlength=4)
    assert counts.min() > n_src / 4 * 0.6  # balanced

    out_z = str(root / "zorder")
    jobs.main(["layout", "--input", src, "--output", out_z,
               "--mode", "zorder", "--col", "value", "--col2", "user_id",
               "--rows-per-file", "250"])
    capsys.readouterr()
    tz = pads.dataset(out_z).to_table()
    assert tz.num_rows == n_src


def test_stream_cli_durable_replay(ray_session, tmp_path_factory, capsys):
    """stream: window rows match the oracle-green in-process replay;
    a rerun against the COMPLETED checkpoint replays nothing and
    produces the identical file."""
    import json

    import pandas as pd

    from approximate_quantiles_ray import jobs
    from approximate_quantiles_ray.pipelines.windows import events_hourly_stream_counts

    root = tmp_path_factory.mktemp("stream")
    src = "/root/testdata/sf0.001/events.parquet"
    out = str(root / "windows.parquet")
    ck = str(root / "ck.bin")
    jobs.main(["stream", "--input", src, "--output", out, "--checkpoint", ck,
               "--value-col", "value"])
    rep = json.loads(capsys.readouterr().out.strip())
    got = pd.read_parquet(out)
    exp = events_hourly_stream_counts("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(
        got[["window_start", "n_events"]].reset_index(drop=True), exp
    )
    assert rep["events"] == int(exp["n_events"].sum())
    assert "value_p50" in got.columns and got["value_p50"].notna().all()
    # completed checkpoint → rerun is a no-op replay with equal output
    jobs.main(["stream", "--input", src, "--output", out, "--checkpoint", ck,
               "--value-col", "value"])
    capsys.readouterr()
    again = pd.read_parquet(out)
    pd.testing.assert_frame_equal(got, again)


def test_dedup_incremental_two_batches(ray_session, tmp_path_factory, capsys):
    """Batch 1 seeds the index; batch 2 drops its within-batch dups AND
    every doc already seen in batch 1; the index grows append-only."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from approximate_quantiles_ray import jobs

    root = tmp_path_factory.mktemp("incr")
    idx = str(root / "index")

    def write_batch(name, rows):
        p = str(root / name)
        ids, texts = zip(*rows)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())}), p)
        return p

    b1 = write_batch("b1.parquet", [(1, "alpha"), (2, "beta"), (3, "alpha")])
    b2 = write_batch("b2.parquet", [(10, "beta"), (11, "gamma"),
                                    (12, "gamma"), (13, "delta")])

    jobs.main(["dedup-incremental", "--input", b1, "--output", str(root / "o1"),
               "--index", idx])
    r1 = json.loads(capsys.readouterr().out.strip())
    assert r1["kept"] == 2 and r1["dropped_in_batch"] == 1  # alpha dup
    assert r1["index_size_after"] == 2

    jobs.main(["dedup-incremental", "--input", b2, "--output", str(root / "o2"),
               "--index", idx])
    r2 = json.loads(capsys.readouterr().out.strip())
    # beta seen in batch 1; gamma duplicated within batch 2
    assert r2["kept"] == 2
    assert r2["dropped_vs_index"] == 1 and r2["dropped_in_batch"] == 1
    assert r2["index_size_after"] == 4
    t = pads.dataset(str(root / "o2")).to_table()
    assert sorted(t.column("text").to_pylist()) == ["delta", "gamma"]
    assert "h" not in t.schema.names  # internal column stripped


def test_drift_cli(ray_session, tmp_path, capsys):
    """jobs drift: exact KS/W1 between two written corpora matches the
    in-process drift_report, floats bucketed via --decimals."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from approximate_quantiles_ray import jobs

    rng = np.random.default_rng(3)
    a_dir, b_dir = tmp_path / "a", tmp_path / "b"
    a_dir.mkdir(); b_dir.mkdir()
    a_vals = np.round(rng.normal(50, 5, 500), 2)
    b_vals = np.round(rng.normal(55, 7, 400), 2)
    pq.write_table(pa.table({"x": pa.array(a_vals, pa.float64())}), a_dir / "p.parquet")
    pq.write_table(pa.table({"x": pa.array(b_vals, pa.float64())}), b_dir / "p.parquet")

    out = str(tmp_path / "drift.json")
    jobs.main(["drift", "--input-a", str(a_dir), "--input-b", str(b_dir),
               "--column", "x", "--decimals", "2", "--output", out])
    import json

    rep = json.load(open(out))
    assert rep["n_a"] == 500 and rep["n_b"] == 400

    # brute force KS over the union of values
    union = np.unique(np.concatenate([a_vals, b_vals]))
    fa = np.searchsorted(np.sort(a_vals), union, side="right") / len(a_vals)
    fb = np.searchsorted(np.sort(b_vals), union, side="right") / len(b_vals)
    assert abs(rep["ks"] - np.abs(fa - fb).max()) < 1e-12
    assert rep["median_a"] == np.sort(a_vals)[249]  # ceil(0.5*500)-1
    assert rep["w1"] > 0


def test_profile_cli(ray_session, tmp_path):
    """jobs profile: exact distinct/null counts for an arbitrary
    parquet table, full-schema default and --columns subset."""
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from approximate_quantiles_ray import jobs

    d = tmp_path / "t"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "a": pa.array([1, 1, 2, None, 3], pa.int64()),
                "b": pa.array(["x", "x", "x", "y", None], pa.string()),
                "c": pa.array(np.arange(5.0)),
            }
        ),
        d / "p.parquet",
    )
    out = str(tmp_path / "prof.json")
    jobs.main(["profile", "--input", str(d), "--output", out])
    rep = json.load(open(out))
    assert rep["rows"] == 5
    by_col = {r["col"]: r for r in rep["columns"]}
    assert by_col["a"] == {"col": "a", "n_distinct": 3, "n_nulls": 1,
                           "vmin": "1", "vmax": "3"}
    assert by_col["b"] == {"col": "b", "n_distinct": 2, "n_nulls": 1,
                           "vmin": "x", "vmax": "y"}
    assert by_col["c"]["n_distinct"] == 5
    assert by_col["c"]["vmin"] == "0.0" and by_col["c"]["vmax"] == "4.0"

    jobs.main(["profile", "--input", str(d), "--columns", "a", "--output", out])
    rep = json.load(open(out))
    assert [r["col"] for r in rep["columns"]] == ["a"]


def test_column_minmax_ns_timestamp_exact(ray_session):
    """ADVICE r3 item 4: nanosecond timestamps (~1.7e18) exceed
    float64's 2^53 integer range; the min/max fold must compare on
    int64 keys so two blocks' extrema within ~256 ns resolve
    correctly. Also covers int64 columns beyond 2^53."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.relational import column_minmax

    base = 1_700_000_000_000_000_000  # ~2023 in ns epoch
    # true min is base+1 (block B), true max base+130 (block B); block A
    # holds base+2 and base+129 — all four collide when cast to float64
    blk_a = pa.table({
        "ts": pa.array(np.array([base + 2, base + 129], np.int64), pa.timestamp("ns")),
        "big": pa.array(np.array([2**60 + 2, 2**60 + 129], np.int64)),
    })
    blk_b = pa.table({
        "ts": pa.array(np.array([base + 1, base + 130], np.int64), pa.timestamp("ns")),
        "big": pa.array(np.array([2**60 + 1, 2**60 + 130], np.int64)),
    })
    assert float(base + 1) == float(base + 2)  # premise: float64 can't tell
    ds = rd.from_arrow([blk_a, blk_b])
    out = column_minmax(ds, ["ts", "big"]).set_index("col")
    assert out.loc["big", "vmin"] == str(2**60 + 1)
    assert out.loc["big", "vmax"] == str(2**60 + 130)
    assert out.loc["ts", "vmin"].endswith(".000000001")
    assert out.loc["ts", "vmax"].endswith(".000000130")


def test_column_minmax_mixed_types_exact(ray_session):
    """ADVICE r4 (medium): when `cols` mixes integer/timestamp columns
    with float/string columns the int64 partial columns gain nulls; a
    pandas fold would coerce them to float64 and lose >2^53 precision.
    The fold must stay exact for the int column regardless of siblings."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.relational import column_minmax

    big = 1_700_000_000_000_000_000
    blk_a = pa.table({
        "big": pa.array(np.array([big + 2, big + 129], np.int64)),
        "f": pa.array([0.5, 2.5], pa.float64()),
        "s": pa.array(["m", "q"], pa.string()),
    })
    blk_b = pa.table({
        "big": pa.array(np.array([big + 1, big + 130], np.int64)),
        "f": pa.array([1.5, 3.5], pa.float64()),
        "s": pa.array(["a", "z"], pa.string()),
    })
    assert float(big + 1) == float(big + 2)  # premise: float64 can't tell
    ds = rd.from_arrow([blk_a, blk_b])
    out = column_minmax(ds, ["big", "f", "s"]).set_index("col")
    assert out.loc["big", "vmin"] == str(big + 1)
    assert out.loc["big", "vmax"] == str(big + 130)
    assert out.loc["f", "vmin"] == "0.5" and out.loc["f", "vmax"] == "3.5"
    assert out.loc["s", "vmin"] == "a" and out.loc["s", "vmax"] == "z"


def test_semantic_dedup_cli(ray_session, tmp_path_factory, capsys):
    """semantic-dedup: verdict Parquet with planted embedding families
    collapsed (min-id kept), singletons conserved, counts in the emit."""
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from approximate_quantiles_ray import jobs

    root = tmp_path_factory.mktemp("semdedup")
    src = str(root / "emb.parquet")
    rng = np.random.default_rng(17)
    base = rng.standard_normal((40, 32))
    dups = base[:4] + rng.standard_normal((4, 32)) * 0.005  # ids 40..43 dup 0..3
    pts = np.vstack([base, dups]).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": np.arange(len(pts), dtype=np.int64),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(pts.ravel(), pa.float32()), 32
                ),
            }
        ),
        src,
    )
    out = str(root / "verdicts")
    jobs.main(["semantic-dedup", "--input", src, "--output", out,
               "--threshold", "0.98"])
    emitted = json.loads(capsys.readouterr().out.strip())
    assert emitted["rows"] == len(pts)
    assert emitted["removed"] == 4 and emitted["kept"] == len(pts) - 4

    v = rd.read_parquet(out).to_pandas().set_index("vec_id").sort_index()
    for i in range(4):
        assert v.loc[40 + i, "cluster_id"] == i and not v.loc[40 + i, "is_kept"]
        assert v.loc[i, "is_kept"] and v.loc[i, "cluster_id"] == i
    singles = list(range(4, 40))
    assert v.loc[singles, "is_kept"].all()


def test_sessions_cli(ray_session, tmp_path_factory, capsys):
    """sessions job: session Parquet matches the replay oracle."""
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from approximate_quantiles_ray import jobs
    from approximate_quantiles_ray.engine.streaming import stream_sessions

    root = tmp_path_factory.mktemp("sessjob")
    src = str(root / "events.parquet")
    rng = np.random.default_rng(29)
    n = 3000
    tbl = pa.table(
        {
            "user": rng.integers(0, 25, n),
            "ts": rng.integers(0, 5_000_000, n).astype("int64"),
        }
    )
    pq.write_table(tbl, src)
    out = str(root / "sessions")
    jobs.main(["sessions", "--input", src, "--output", out,
               "--keys", "user", "--gap-us", "60000"])
    emitted = json.loads(capsys.readouterr().out.strip())

    replay = stream_sessions(
        rd.from_arrow(tbl).repartition(4), ["user"], ts_col="ts",
        gap_us=60_000, allowed_lateness_us=1 << 62,
    )
    got = (
        rd.read_parquet(out).to_pandas()
        .sort_values(["user", "session_start_us"]).reset_index(drop=True)
    )
    assert emitted["sessions"] == len(replay) == len(got)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.astype({"user": np.int64}),
        replay[["user", "session_start_us", "session_end_us", "n_events"]]
        .sort_values(["user", "session_start_us"]).reset_index(drop=True)
        .astype({"user": np.int64}),
        check_dtype=False,
    )


def test_job_scans_are_column_pruned(ray_session, tmp_path_factory, capsys, monkeypatch):
    """r4 verdict item 2: the jobs whose outputs do NOT carry full rows
    must prune their input scan to the columns they consume — simjoin
    and pq-index/semantic-dedup read (id, text) / (id, embedding) only.
    Asserted by recording the ``columns=`` kwarg of every
    rd.read_parquet call against the job's input path."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from approximate_quantiles_ray import jobs

    root = tmp_path_factory.mktemp("prunedscans")
    docs = str(root / "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": ["the same six words repeated here",
                           "the same six words repeated here",
                           "a completely different document text body"],
                  "wide_extra": ["x" * 100] * 3,  # the column pruning must drop
                  "lang": ["en", "en", "en"]}),
        docs,
    )
    emb = str(root / "emb.parquet")
    rng = np.random.default_rng(5)
    pts = rng.standard_normal((30, 16)).astype(np.float32)
    pq.write_table(
        pa.table({"vec_id": np.arange(30, dtype=np.int64),
                  "embedding": pa.FixedSizeListArray.from_arrays(
                      pa.array(pts.ravel(), pa.float32()), 16),
                  "label": np.arange(30, dtype=np.int64)}),
        emb,
    )

    scans: list[tuple[str, list | None]] = []
    real = rd.read_parquet

    def recording(path, *a, **k):
        scans.append((str(path), k.get("columns")))
        return real(path, *a, **k)

    monkeypatch.setattr(rd, "read_parquet", recording)

    def input_scans(path):
        got = [c for p, c in scans if p == path]
        scans.clear()
        return got

    jobs.main(["simjoin", "--input", docs, "--output", str(root / "p1"),
               "--tau-permille", "300"])
    assert input_scans(docs) == [["doc_id", "text"]]

    jobs.main(["pq-index", "--input", emb, "--output", str(root / "codes"),
               "--sample-size", "30", "--ks", "8", "--m", "4"])
    assert input_scans(emb) == [["vec_id", "embedding"]]

    jobs.main(["semantic-dedup", "--input", emb, "--output", str(root / "v"),
               "--threshold", "0.99"])
    assert input_scans(emb) == [["vec_id", "embedding"]]
    capsys.readouterr()
