"""Dedup operators: planted exact/near duplicates must be found;
unrelated docs must not be merged."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _corpus() -> pa.Table:
    rng = np.random.default_rng(123)
    words = np.array(
        "the quick brown fox jumps over lazy dog table query merge sort batch "
        "stream data row column hash join scan filter window vector".split(),
        dtype=object,
    )
    base = [" ".join(rng.choice(words, 40)) for _ in range(60)]
    docs = list(base)
    # exact dups: docs 60..64 duplicate docs 0..4
    docs += base[:5]
    # near dups: docs 65..69 = docs 5..9 with one word changed
    for i in range(5):
        toks = base[5 + i].split()
        toks[3] = "changedword"
        docs.append(" ".join(toks))
    return pa.table({"doc_id": list(range(len(docs))), "text": docs})


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(_corpus()).repartition(4)


def test_exact_dedup(corpus_ds):
    from approximate_quantiles_ray.pipelines.dedup import exact_dedup

    out = (
        exact_dedup(corpus_ds)
        .to_pandas()[["doc_id", "n_copies"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df = _corpus().to_pandas()
    exp = (
        df.groupby("text", as_index=False)
        .agg(doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "n_copies"]]
    )
    pd.testing.assert_frame_equal(out, exp.astype({"n_copies": out["n_copies"].dtype}))
    # the 5 exact dups collapse onto doc 0..4
    assert out[out["doc_id"] < 5]["n_copies"].tolist() == [2] * 5


def test_minhash_lsh_dedup_clusters(corpus_ds):
    from approximate_quantiles_ray.pipelines.dedup import minhash_lsh_dedup

    out = minhash_lsh_dedup(corpus_ds, threshold=0.5).to_pandas().set_index("doc_id").sort_index()
    # exact dups cluster with their originals
    for i in range(5):
        assert out.loc[60 + i, "cluster_id"] == out.loc[i, "cluster_id"] == i
        assert not out.loc[60 + i, "is_kept"]
    # near dups (1 word of 40 changed → Jaccard ≈ 0.8+) cluster too
    for i in range(5):
        assert out.loc[65 + i, "cluster_id"] == out.loc[5 + i, "cluster_id"] == 5 + i
    # unrelated docs keep singleton clusters
    singles = out.loc[10:59]
    assert (singles["cluster_id"] == singles.index).all()
    assert singles["is_kept"].all()


def test_minhash_merge_is_partition_independent(ray_session):
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.dedup import minhash_lsh_dedup

    def run(n_parts):
        out = minhash_lsh_dedup(rd.from_arrow(_corpus()).repartition(n_parts), threshold=0.5)
        return out.to_pandas().sort_values("doc_id").reset_index(drop=True)

    pd.testing.assert_frame_equal(run(2), run(7))


def test_simhash_near_dup_pairs(corpus_ds):
    from approximate_quantiles_ray.pipelines.dedup import simhash_near_dup_pairs

    pairs = simhash_near_dup_pairs(corpus_ds, max_hamming=6)
    got = set(zip(pairs["a"], pairs["b"]))
    for i in range(5):  # exact dups: hamming 0
        assert (i, 60 + i) in got
    ham0 = pairs[pairs["a"] < 5].set_index("a")["hamming"]
    assert (ham0 == 0).all()


def test_jaccard_exact_values():
    from approximate_quantiles_ray.pipelines.dedup import jaccard_pairs

    texts = {0: "abcdefgh", 1: "abcdefgh", 2: "zzzzzzzz"}
    pairs = pd.DataFrame({"a": [0, 0], "b": [1, 2]})
    out = jaccard_pairs(texts, pairs, k=5)
    assert out["jaccard"].tolist()[0] == 1.0
    assert out["jaccard"].tolist()[1] == 0.0


def test_minhash_verify_never_driver_side(corpus_ds, monkeypatch):
    """The pipeline must not verify candidates on the driver: patch the
    driver-side verifier to explode — the run must still succeed with
    correct clusters (round-2 VERDICT item 1)."""
    import approximate_quantiles_ray.pipelines.dedup as dd

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("driver-side jaccard_pairs must not run in the pipeline")

    monkeypatch.setattr(dd, "jaccard_pairs", boom)
    out = dd.minhash_lsh_dedup(corpus_ds, threshold=0.5).to_pandas().set_index("doc_id")
    for i in range(5):
        assert out.loc[60 + i, "cluster_id"] == i


@pytest.mark.parametrize("pair_cap", [1 << 17, 0])  # broadcast plan / groupby plan
def test_verify_jaccard_distributed_matches_exact(corpus_ds, pair_cap):
    """Distributed verify (both plans) returns exactly the driver
    verifier's scores."""
    from approximate_quantiles_ray.pipelines.dedup import (
        jaccard_pairs,
        verify_jaccard_distributed,
    )

    pairs = pd.DataFrame({"a": [0, 0, 5, 10], "b": [60, 2, 65, 11]})
    got = (
        verify_jaccard_distributed(corpus_ds, pairs, shingle_k=5, broadcast_pair_cap=pair_cap)
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    df = _corpus().to_pandas()
    texts = dict(zip(df["doc_id"], df["text"]))
    exp = jaccard_pairs(texts, pairs, k=5).sort_values(["a", "b"]).reset_index(drop=True)
    assert got[["a", "b"]].astype(np.int64).equals(exp[["a", "b"]].astype(np.int64))
    np.testing.assert_allclose(got["jaccard"].to_numpy(), exp["jaccard"].to_numpy())
    dup_row = got[(got["a"] == 0) & (got["b"] == 60)]
    assert dup_row["jaccard"].iloc[0] == 1.0  # 0 and 60 are exact dups


def test_hot_bucket_pairs_cap_warns_and_none_disables():
    from approximate_quantiles_ray.pipelines.dedup import _hot_bucket_pairs

    n = 30
    rows = pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "band": np.zeros(n, np.int32),
            "bucket": np.zeros(n, np.int64),
        }
    )
    with pytest.warns(UserWarning, match="truncated 1 bucket run"):
        capped = _hot_bucket_pairs(rows, cap=10)
    assert len(capped) == 10 * 9 // 2

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        full = _hot_bucket_pairs(rows, cap=None)
    assert len(full) == n * (n - 1) // 2


def test_dist_bucket_pairs_matches_driver_pair_gen(ray_session):
    """Distributed super-bucket pair generation emits exactly the pairs
    the driver-side generator produces on the hot-bucket rows."""
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.dedup import _hot_bucket_pairs, dist_bucket_pairs

    rng = np.random.default_rng(7)
    n = 200
    rows = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "band": pa.array(rng.integers(0, 4, n).astype(np.int32)),
            "bucket": pa.array(rng.integers(0, 40, n).astype(np.int64)),
        }
    )
    got = dist_bucket_pairs(rd.from_arrow(rows).repartition(5), cap=None, n_buckets=6)
    exp = _hot_bucket_pairs(rows.to_pandas(), cap=None)
    key = lambda d: d[["a", "b"]].astype(np.int64).sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(got), key(exp))


def test_exact_dedup_wide_key_flag(corpus_ds, monkeypatch):
    """wide_key widens the dedup key to two seeded hashes. Collision
    behavior (verified without Ray via the key builder, where a patch
    actually reaches the code): an engineered seed-0 collision merges
    two DISTINCT texts under the narrow key but stays separate under
    the wide key."""
    import approximate_quantiles_ray.pipelines.dedup as dd

    # Ray path: identical results to the narrow key on a collision-free
    # corpus, default unchanged
    narrow = (
        dd.exact_dedup(corpus_ds).to_pandas()[["doc_id", "n_copies"]]
        .sort_values("doc_id").reset_index(drop=True)
    )
    wide = (
        dd.exact_dedup(corpus_ds, wide_key=True).to_pandas()[["doc_id", "n_copies"]]
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(narrow, wide)

    real = dd.hash_strings

    def colliding(values, seed=0):
        if seed == 0:  # degenerate primary hash: collides on equal length
            arr = values.to_pylist() if hasattr(values, "to_pylist") else list(values)
            return np.array([len(t) for t in arr], np.uint64)
        return real(values, seed)

    monkeypatch.setattr(dd, "hash_strings", colliding)
    tbl = pa.table({"doc_id": [1, 2], "text": ["aaaa", "bbbb"]})  # same length
    k_narrow = dd._dedup_key_table(tbl, "doc_id", "text", wide_key=False)
    k_wide = dd._dedup_key_table(tbl, "doc_id", "text", wide_key=True)
    th = k_narrow.column("text_hash").to_pylist()
    assert th[0] == th[1]  # narrow key would merge the two documents
    wide_keys = list(
        zip(k_wide.column("text_hash").to_pylist(), k_wide.column("text_hash2").to_pylist())
    )
    assert wide_keys[0] != wide_keys[1]  # second seeded hash separates them


def test_connected_components_distributed_matches_union_find(ray_session):
    """Label propagation over a pair Dataset converges to the same
    min-id component labels as the driver union-find (round-2 VERDICT
    item 10), including chains that need several rounds."""
    from approximate_quantiles_ray.pipelines.dedup import (
        _connected_components,
        connected_components_distributed,
    )

    # planted: star {0,1,2,3}, chain 10-11-12-13-14, pair {20,21}
    pairs = pd.DataFrame(
        {
            "a": [0, 0, 0, 10, 11, 12, 13, 21],
            "b": [1, 2, 3, 11, 12, 13, 14, 20],
        }
    )
    got = connected_components_distributed(pairs)
    exp = _connected_components(pairs)
    assert dict(zip(got["node"], got["label"])) == {k: int(v) for k, v in exp.items()}
    assert got.set_index("node")["label"].loc[14] == 10  # chain collapses to min

    assert len(connected_components_distributed(pd.DataFrame({"a": [], "b": []}))) == 0


def test_minhash_dedup_distributed_components_equivalent(corpus_ds):
    from approximate_quantiles_ray.pipelines.dedup import minhash_lsh_dedup

    drv = (
        minhash_lsh_dedup(corpus_ds, threshold=0.5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    dist = (
        minhash_lsh_dedup(corpus_ds, threshold=0.5, components="distributed")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(drv, dist)


def test_shingle_flat_kernel_edge_cases():
    """The flat-buffer shingle kernel must reproduce the per-doc kernel
    exactly: empty docs, sub-k docs (single whole-doc hash), exactly-k,
    multibyte UTF-8, nulls (as empty), and sliced arrays (offset!=0)."""
    from approximate_quantiles_ray.functions.hashing import splitmix64
    from approximate_quantiles_ray.pipelines.dedup import (
        _shingle_hashes_flat,
        _unique_per_doc,
    )

    def per_doc(texts, k=5):
        out = []
        for t in texts:
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            if len(b) == 0:
                out.append(np.zeros(0, np.uint64))
                continue
            win = np.lib.stride_tricks.sliding_window_view(b, min(k, len(b)))
            with np.errstate(over="ignore"):
                acc = np.zeros(len(win), np.uint64)
                for j in range(win.shape[1]):
                    acc = acc * np.uint64(1099511628211) + win[:, j].astype(np.uint64)
                out.append(splitmix64(acc))
        return out

    cases = ["", "a", "abcd", "abcde", "abcdef", "héllo wörld", "日本語テキスト", "aaaaaaa"]
    arr = pa.array(cases + [None], pa.string())
    flat, counts = _shingle_hashes_flat(arr, 5)
    ref = per_doc(cases + [""], 5)
    assert np.array_equal(flat, np.concatenate(ref))
    assert counts.tolist() == [len(r) for r in ref]

    sliced = arr.slice(2, 5)
    f2, c2 = _shingle_hashes_flat(sliced, 5)
    assert np.array_equal(f2, np.concatenate(per_doc(cases[2:7], 5)))

    uvals, ucnt = _unique_per_doc(flat, counts)
    offs = np.concatenate(([0], np.cumsum(ucnt)))
    for i, r in enumerate(ref):
        assert np.array_equal(uvals[offs[i] : offs[i + 1]], np.unique(r))


def test_jaccard_join_paths_agree_and_find_planted(ray_session):
    """Exact word-shingle similarity join: the driver (under-cap) and
    super-bucket (over-cap) plans must produce identical pair tables,
    and a planted near-dup pair must surface with high jaccard."""
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.dedup import jaccard_similarity_join

    rng = np.random.default_rng(5)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"])
    texts = [" ".join(rng.choice(vocab, 40)) for _ in range(60)]
    near = texts[7].split()
    near[3] = "CHANGED"
    texts.append(" ".join(near))  # doc 60 ≈ doc 7
    tbl = pa.table({"doc_id": pa.array(np.arange(61, dtype=np.int64)), "text": texts})
    ds = rd.from_arrow(tbl).repartition(5)

    under = jaccard_similarity_join(ds, tau_permille=400)
    over = jaccard_similarity_join(ds, tau_permille=400, cap=0)
    pd.testing.assert_frame_equal(under, over)
    planted = under[(under.a == 7) & (under.b == 60)]
    assert len(planted) == 1
    assert planted.jacc_permille.iloc[0] >= 700


def test_jaccard_join_hot_shingle_guard_warns():
    from approximate_quantiles_ray.pipelines.dedup import _pair_inter_counts

    df = pd.DataFrame({"sh": np.zeros(40, np.int64), "doc": np.arange(40)})
    with pytest.warns(UserWarning, match="stop-shingles"):
        out = _pair_inter_counts(df, hot_cap=10)
    assert len(out) == 0


def test_word_shingles_short_docs_empty():
    from approximate_quantiles_ray.pipelines.dedup import _word_shingle_hashes_flat

    col = pa.array(["one two three four", "", "a b c d e", None])
    flat, counts = _word_shingle_hashes_flat(col, k=5)
    assert counts.tolist() == [0, 0, 1, 0]
    assert len(flat) == 1


def test_jaccard_join_matches_python_reference_random_corpora(ray_session):
    """Randomized cross-validation: the distributed join must equal a
    pure-Python set-based reference on random corpora, for EVERY
    partition layout (1, 3, 8 blocks) — partition-count independence is
    the core Ray Data invariant."""
    import itertools

    import ray.data as rd

    from approximate_quantiles_ray.pipelines.dedup import jaccard_similarity_join

    k = 5
    for trial in range(3):
        rng = np.random.default_rng(100 + trial)
        vocab = np.array([f"w{i}" for i in range(6 + trial * 3)])
        n_docs = 30 + 10 * trial
        texts = [
            " ".join(rng.choice(vocab, rng.integers(2, 30)))  # some < k words
            for _ in range(n_docs)
        ]
        # python reference: word-shingle sets, all-pairs exact jaccard
        def shset(t):
            ws = t.split()
            return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}

        sets = {i: shset(t) for i, t in enumerate(texts)}
        want = []
        for a, b in itertools.combinations(range(n_docs), 2):
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            un = len(sets[a]) + len(sets[b]) - inter
            jp = 1000 * inter // un
            if jp >= 300:
                want.append((a, b, inter, un, jp))
        want_df = (
            pd.DataFrame(want, columns=["a", "b", "inter", "n_union", "jacc_permille"])
            .astype(np.int64)
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        tbl = pa.table(
            {"doc_id": pa.array(np.arange(n_docs, dtype=np.int64)), "text": texts}
        )
        for n_parts in (1, 3, 8):
            ds = rd.from_arrow(tbl).repartition(n_parts)
            got = jaccard_similarity_join(ds, tau_permille=300)
            pd.testing.assert_frame_equal(got, want_df), (trial, n_parts)
