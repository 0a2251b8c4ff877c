"""Deterministic hash-sampling operators: statistical behavior, the
bottom-k merge law, and int64 overflow safety of the SQL-parity hash.
(The oracle equality of the two query entries is covered by
test_driver_contract.py like every other queries() entry.)
"""

from __future__ import annotations

import numpy as np
import pytest

from approximate_quantiles_ray.pipelines.sampling import (
    KNUTH,
    MOD31,
    MOD32,
    bernoulli_mask,
    docs_sample_bottomk,
    docs_stratified_sample,
    hash32,
)

SF_DIR = "/root/testdata/sf0.001"


def test_hash32_no_int64_overflow_at_any_id():
    # the pre-reduction mod 2^31 bounds the product below 2^63 for the
    # FULL int64 id domain — the property that makes the SQL twin exact
    ids = np.array([0, 1, MOD31 - 1, MOD31, 2**62, 2**63 - 1], dtype=np.uint64).astype(
        np.int64
    )
    h = hash32(ids)
    assert ((ids % MOD31) * KNUTH + 42 < 2**63).all()
    assert (h >= 0).all() and (h < MOD32).all()
    # pure-Python big-int reference (no overflow possible)
    ref = [((int(i) % MOD31) * KNUTH + 42) % MOD32 for i in ids]
    assert h.tolist() == ref


def test_bernoulli_rate_is_unbiased():
    ids = np.arange(200_000, dtype=np.int64)
    for permille in (50, 100, 500, 900):
        kept = bernoulli_mask(ids, permille).mean()
        assert kept == pytest.approx(permille / 1000, abs=0.01)


def test_bernoulli_mask_replayable_and_seed_sensitive():
    ids = np.arange(10_000, dtype=np.int64)
    a = bernoulli_mask(ids, 300, seed=7)
    assert (a == bernoulli_mask(ids, 300, seed=7)).all()
    # the seed is an additive offset mod 2^32 — adjacent seeds barely
    # rotate the keep-threshold, so probe a widely-separated one
    assert (a != bernoulli_mask(ids, 300, seed=1_234_567_891)).any()


def test_bottomk_merge_law():
    # bottom-k of a union == bottom-k of the per-part bottom-k's — the
    # property the distributed plan relies on
    rng = np.random.default_rng(0)
    ids = rng.choice(10**9, size=5000, replace=False).astype(np.int64)
    h = hash32(ids)
    k = 16
    order = np.lexsort((ids, h))
    want = set(ids[order[:k]].tolist())
    parts = np.array_split(np.arange(len(ids)), 7)
    cand_ids, cand_h = [], []
    for p in parts:
        sub = p[np.argpartition(h[p], min(k, len(p) - 1))[:k]]
        cand_ids.append(ids[sub])
        cand_h.append(h[sub])
    cid = np.concatenate(cand_ids)
    ch = np.concatenate(cand_h)
    got = set(cid[np.lexsort((cid, ch))[:k]].tolist())
    assert got == want


def test_stratified_sample_rates_and_bottomk_pipeline(ray_session):
    out = docs_stratified_sample(SF_DIR)
    assert set(out.columns) == {"source", "rate_permille", "n_kept", "chars_kept"}
    # each stratum's observed keep-rate near its configured rate
    # (50 docs/source at sf0.001 → loose binomial tolerance)
    for _, row in out.iterrows():
        assert 0 < row.n_kept <= 50
    bk = docs_sample_bottomk(SF_DIR)
    assert len(bk) == 16
    assert bk.h.is_monotonic_increasing
    assert (hash32(bk.doc_id.to_numpy()) == bk.h.to_numpy()).all()


def test_weighted_priority_sample_favors_heavy_docs(ray_session):
    """Priority sampling must over-represent heavy (long) documents and
    merge like bottom-k: global result == merge of per-block partials."""
    import duckdb
    import numpy as np

    from approximate_quantiles_ray.pipelines.sampling import docs_sample_weighted

    sf = "/root/testdata/sf0.01"
    out = docs_sample_weighted(sf, k=32)
    assert len(out) == 32
    corpus_mean = duckdb.sql(
        f"select avg(n_chars) from read_parquet('{sf}/documents.parquet')"
    ).fetchone()[0]
    # selection prob ∝ w ⇒ sampled mean length must exceed corpus mean
    assert out["n_chars"].mean() > corpus_mean
    # deterministic: second run identical
    out2 = docs_sample_weighted(sf, k=32)
    assert np.array_equal(out["doc_id"].to_numpy(), out2["doc_id"].to_numpy())
