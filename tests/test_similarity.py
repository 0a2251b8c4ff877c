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
