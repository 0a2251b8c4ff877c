"""Similarity search: brute-force exactness vs numpy oracle, LSH recall,
near-dup blocking on planted duplicates, DuckDB oracle parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _numpy_oracle_topk(emb: np.ndarray, ids: np.ndarray, qids, k=10):
    m = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    out = {}
    for qid in qids:
        qv = m[ids == qid][0]
        s = m @ qv
        s[ids == qid] = -np.inf
        idx = np.lexsort((ids, -s))[:k]
        out[int(qid)] = [int(i) for i in ids[idx]]
    return out


@pytest.fixture(scope="module")
def emb_data(ray_session):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist(), np.int64)
    emb = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    return ids, emb


def test_brute_force_matches_numpy_oracle(emb_data):
    from approximate_quantiles_ray.pipelines.similarity import embeddings_knn_bruteforce

    ids, emb = emb_data
    out = embeddings_knn_bruteforce(SF_DIR)
    oracle = _numpy_oracle_topk(emb, ids, sorted(ids)[:3])
    for qid, neighbors in oracle.items():
        got = out[out["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert got == neighbors, qid


def test_brute_force_matches_duckdb(emb_data):
    from approximate_quantiles_ray.pipelines.similarity import ORACLE_SQL, embeddings_knn_bruteforce

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    exp = con.sql(ORACLE_SQL["embeddings_knn_bruteforce"]).df()
    got = embeddings_knn_bruteforce(SF_DIR)
    exp = exp.astype({c: got[c].dtype for c in got.columns})[got.columns]
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp.reset_index(drop=True))


def test_lsh_recall_vs_brute_force(emb_data):
    from approximate_quantiles_ray.pipelines.similarity import (
        embeddings_knn_bruteforce,
        embeddings_knn_lsh,
    )

    bf = embeddings_knn_bruteforce(SF_DIR)
    ann = embeddings_knn_lsh(SF_DIR)
    recalls = []
    for qid in bf["query_id"].unique():
        truth = set(bf[bf["query_id"] == qid]["vec_id"])
        got = set(ann[ann["query_id"] == qid]["vec_id"])
        recalls.append(len(truth & got) / len(truth))
    assert np.mean(recalls) >= 0.5, recalls  # radius=6/16 planes on random data


def test_embedding_near_dups_finds_planted(ray_session):
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.similarity import embedding_near_dup_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal((50, 32))
    dup = base[:5] + rng.standard_normal((5, 32)) * 0.01  # ~identical direction
    emb = np.vstack([base, dup]).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": list(range(55)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), pa.float32()), 32
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(3)
    pairs = embedding_near_dup_pairs(ds, threshold=0.98, dim=32)
    got = set(zip(pairs["a"], pairs["b"]))
    assert all((i, 50 + i) in got for i in range(5)), got
    # no false positives among random vectors
    assert all(b - a == 50 for a, b in got), got


def test_ivf_recall_on_clustered_data(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.similarity import knn_brute_force, knn_ivf

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((8, 32)) * 3
    points = np.vstack([c + rng.standard_normal((200, 32)) for c in centers]).astype(np.float32)
    ids = np.arange(len(points), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(points.ravel(), pa.float32()), 32
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    qids = ids[:3]
    qmat = points[:3].astype(np.float64)
    bf = knn_brute_force(rd.from_arrow(tbl), qids, qmat, k=10)
    ann = knn_ivf(rd.from_arrow(tbl), qids, qmat, k=10, n_centroids=16, nprobe=3)
    recalls = []
    for q in qids:
        t = set(bf[bf["query_id"] == q]["vec_id"])
        g = set(ann[ann["query_id"] == q]["vec_id"])
        recalls.append(len(t & g) / len(t))
    assert np.mean(recalls) >= 0.9, recalls


def test_pq_recall_and_exact_rerank_scores(ray_session):
    """PQ/ADC with exact re-rank: high recall vs brute force on
    clustered data, and every returned score must be the EXACT cosine
    (the re-rank pass guarantees it), so matching (query, vec) pairs
    agree with brute force to float precision."""
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.similarity import knn_brute_force, knn_pq

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((8, 32)) * 3
    points = np.vstack([c + rng.standard_normal((200, 32)) for c in centers]).astype(np.float32)
    ids = np.arange(len(points), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(points.ravel(), pa.float32()), 32
            ),
        }
    )
    qids = ids[:3]
    qmat = points[:3].astype(np.float64)
    bf = knn_brute_force(rd.from_arrow(tbl), qids, qmat, k=10)
    ann = knn_pq(
        rd.from_arrow(tbl).repartition(4), qids, qmat, k=10, m=8, ks=256,
        sample_size=1600, refine_mult=4,
    )
    recalls = []
    for q in qids:
        t = set(bf[bf["query_id"] == q]["vec_id"])
        g = set(ann[ann["query_id"] == q]["vec_id"])
        recalls.append(len(t & g) / len(t))
    assert np.mean(recalls) >= 0.85, recalls
    merged = ann.merge(bf, on=["query_id", "vec_id"], suffixes=("_pq", "_bf"))
    assert len(merged)  # overlap exists
    assert np.allclose(merged["score_pq"], merged["score_bf"], atol=1e-12)


def test_pq_codes_roundtrip_determinism(ray_session):
    """Same corpus through two independent encode passes → identical
    codes (seeded training, deterministic argmax)."""
    import pyarrow as pa

    from approximate_quantiles_ray.pipelines.similarity import (
        _normalize,
        _pq_codes,
        train_pq_codebooks,
    )

    rng = np.random.default_rng(5)
    x = rng.standard_normal((500, 64))
    coarse, books = train_pq_codebooks(x, m=8, ks=32, seed=9)
    coarse2, books2 = train_pq_codebooks(x, m=8, ks=32, seed=9)
    assert np.array_equal(books, books2) and np.array_equal(coarse, coarse2)
    a1, c1 = _pq_codes(_normalize(x), coarse, books)
    a2, c2 = _pq_codes(_normalize(x), coarse, books)
    assert np.array_equal(c1, c2) and np.array_equal(a1, a2)
    assert c1.shape == (500, 8) and c1.dtype == np.uint8
    # quantization actually reconstructs: cosine of recon vs input near 1
    m, ks, sub = books.shape
    recon = coarse[a1] + np.concatenate(
        [books[s][c1[:, s]] for s in range(m)], axis=1
    )
    cos = (recon * _normalize(x)).sum(axis=1) / np.linalg.norm(recon, axis=1)
    # isotropic 64-dim data is the quantization worst case (no cluster
    # structure for the coarse stage); 8 bytes/vector still keeps ~0.7
    assert cos.mean() > 0.6


def test_pq_partition_independence(ray_session):
    """ADC candidate generation + exact re-rank must be independent of
    the corpus partitioning (per-batch top-k partials merge to the
    exact global top-k; deterministic tie-breaks)."""
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.similarity import knn_pq

    rng = np.random.default_rng(41)
    pts = np.vstack(
        [c + rng.standard_normal((150, 32)) for c in rng.standard_normal((4, 32)) * 3]
    ).astype(np.float32)
    ids = np.arange(len(pts), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(pts.ravel(), pa.float32()), 32
            ),
        }
    )
    qids, qmat = ids[:2], pts[:2].astype(np.float64)
    results = [
        knn_pq(rd.from_arrow(tbl).repartition(p), qids, qmat, k=5, ks=64,
               sample_size=600)
        for p in (2, 8)
    ]
    pd.testing.assert_frame_equal(results[0], results[1])


def test_cluster_label_profile_determinism_and_completeness(ray_session):
    """On the testdata (labels random w.r.t. geometry) the contingency
    must still be deterministic across runs and conserve every row."""
    from approximate_quantiles_ray.pipelines.similarity import (
        embeddings_cluster_label_profile,
    )

    sf = "/root/testdata/sf0.001"
    a = embeddings_cluster_label_profile(sf)
    b = embeddings_cluster_label_profile(sf)
    pd.testing.assert_frame_equal(a, b)
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf}/embeddings.parquet").num_rows
    assert int(a["n"].sum()) == n
    assert [str(t) for t in a.dtypes] == ["int64", "int64", "int64"]


def test_cluster_label_profile_purity_on_planted_clusters(ray_session, tmp_path):
    """With geometry that follows the labels, clusters must be nearly
    label-pure and the k-means must recover roughly one cluster per
    label."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from approximate_quantiles_ray.pipelines.similarity import (
        embeddings_cluster_label_profile,
    )

    rng = np.random.default_rng(4)
    dim, per = 32, 200
    centers = rng.normal(size=(4, dim)) * 5
    rows, labels = [], []
    for lbl, c in enumerate(centers):
        pts = c + rng.normal(size=(per, dim)) * 0.2
        rows.extend(pts.astype(np.float32).tolist())
        labels.extend([lbl] * per)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(rows)), pa.int64()),
            "embedding": pa.array(rows, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    out = embeddings_cluster_label_profile(str(tmp_path), n_clusters=4)
    n = 4 * per
    assert int(out["n"].sum()) == n
    dom = out.groupby("cluster")["n"].max().sum()
    assert dom / n > 0.95, out


def test_semantic_dedup_planted_clusters(ray_session):
    """SemDeDup verdicts on planted near-dup families: each family
    collapses to one cluster keeping its min id; singletons untouched."""
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.similarity import semantic_dedup

    rng = np.random.default_rng(6)
    base = rng.standard_normal((60, 32))
    # 6 planted families of 3: base[i], plus two tiny perturbations
    fam_ids = list(range(6))
    emb = [base]
    for _ in range(2):
        emb.append(base[:6] + rng.standard_normal((6, 32)) * 0.01)
    emb = np.vstack(emb).astype(np.float32)  # ids 60..65, 66..71 dup 0..5
    tbl = pa.table(
        {
            "vec_id": list(range(len(emb))),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), pa.float32()), 32
            ),
        }
    )
    out = (
        semantic_dedup(rd.from_arrow(tbl).repartition(4), threshold=0.98, dim=32)
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert len(out) == len(emb)  # row conservation
    for i in fam_ids:
        members = [i, 60 + i, 66 + i]
        clusters = {out.loc[m, "cluster_id"] for m in members}
        assert clusters == {i}, (i, clusters)  # family collapsed, min id is root
        assert bool(out.loc[i, "is_kept"])
        assert not out.loc[members[1:], "is_kept"].any()
    singles = [i for i in range(6, 60)]
    assert out.loc[singles, "is_kept"].all()
    assert (out.loc[singles, "cluster_id"] == singles).all()


def test_parquet_list_dim_footer_only(tmp_path):
    """dim sniffing must come from footer metadata (no read task): list
    column -> per-row length; scalar column / ragged list -> None."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from approximate_quantiles_ray.sources.read import parquet_list_dim

    p = str(tmp_path / "e.parquet")
    pq.write_table(
        pa.table({
            "vec_id": np.arange(6, dtype=np.int64),
            "embedding": pa.array([[1.0] * 8] * 6, pa.list_(pa.float32())),
        }),
        p,
    )
    assert parquet_list_dim(p, "embedding") == 8
    assert parquet_list_dim(p, "vec_id") is None
    ragged = str(tmp_path / "r.parquet")
    pq.write_table(
        pa.table({"x": pa.array([[1.0], [1.0, 2.0], [3.0]], pa.list_(pa.float32()))}),
        ragged,
    )
    assert parquet_list_dim(ragged, "x") is None
    # ragged lists whose TOTAL happens to divide the row count ([1, 3]
    # over 2 rows → whole-file ratio 2) must not report a fake dim
    tricky = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"x": pa.array([[1.0], [1.0, 2.0, 3.0]], pa.list_(pa.float32()))}),
        tricky,
    )
    assert parquet_list_dim(tricky, "x") is None
