"""HLL / count-min / Bloom error-bound and merge tests (new sketches
mandated by BASELINE.json:14; not in the reference — SURVEY.md §2.6)."""

import collections

import numpy as np
import pytest

from approximate_quantiles_ray import BloomFilter, CountMinSketch, HLL


@pytest.fixture(scope="module")
def ids():
    rng = np.random.default_rng(42)
    return rng.integers(0, 1 << 40, 300_000)


class TestHLL:
    def test_estimate_within_bound(self, ids):
        h = HLL(p=14, seed=0).update(ids)
        exact = len(np.unique(ids))
        # 1.04/sqrt(2^14) ~= 0.81% std error; allow 4 sigma
        assert abs(h.estimate() - exact) / exact < 0.033

    def test_small_range_linear_counting(self):
        h = HLL(p=14, seed=0).update(np.arange(100))
        assert abs(h.estimate() - 100) <= 2

    def test_strings(self):
        vals = np.array([f"conv-{i}" for i in range(50_000)], dtype=object)
        h = HLL(p=14, seed=0).update(vals)
        assert abs(h.estimate() - 50_000) / 50_000 < 0.033

    def test_merge_equals_union(self, ids):
        a = HLL(p=12, seed=0).update(ids[:150_000])
        b = HLL(p=12, seed=0).update(ids[150_000:])
        whole = HLL(p=12, seed=0).update(ids)
        a.merge(b)
        np.testing.assert_array_equal(a.registers, whole.registers)
        assert a.estimate() == whole.estimate()

    def test_merge_commutative(self, ids):
        a1 = HLL(p=12, seed=0).update(ids[:100_000])
        b1 = HLL(p=12, seed=0).update(ids[100_000:])
        a2 = HLL.from_bytes(a1.to_bytes())
        m1 = a1.merge(b1)
        m2 = b1.merge(a2)
        np.testing.assert_array_equal(m1.registers, m2.registers)

    def test_duplicates_dont_inflate(self):
        h = HLL(p=14, seed=0)
        for _ in range(10):
            h.update(np.arange(1000))
        assert abs(h.estimate() - 1000) / 1000 < 0.05

    def test_serde(self, ids):
        h = HLL(p=14, seed=3).update(ids[:10_000])
        back = HLL.from_bytes(h.to_bytes())
        assert back.estimate() == h.estimate()
        assert back.count == h.count


class TestCountMin:
    def test_exact_on_heavy_hitters(self):
        rng = np.random.default_rng(1)
        keys = np.array([f"tool-{z % 50:02d}" for z in rng.zipf(1.5, 100_000)], dtype=object)
        cm = CountMinSketch(width=8192, depth=5, seed=0).update(keys)
        cnt = collections.Counter(keys.tolist())
        assert cm.count == 100_000
        for k, true in cnt.most_common(10):
            est = int(cm.estimate(np.array([k], dtype=object))[0])
            assert est >= true  # never underestimates
            assert est - true <= max(5, 0.001 * cm.count)

    def test_weighted_update(self):
        cm = CountMinSketch(width=1024, depth=5, seed=0)
        cm.update(np.array(["a", "b", "a"], dtype=object), counts=np.array([2, 3, 4]))
        assert cm.count == 9
        assert int(cm.estimate(np.array(["a"], dtype=object))[0]) >= 6

    def test_merge_equals_whole(self):
        rng = np.random.default_rng(2)
        keys = np.array([f"k{z % 100}" for z in rng.zipf(1.3, 60_000)], dtype=object)
        a = CountMinSketch(width=4096, depth=5, seed=0).update(keys[:30_000])
        b = CountMinSketch(width=4096, depth=5, seed=0).update(keys[30_000:])
        whole = CountMinSketch(width=4096, depth=5, seed=0).update(keys)
        a.merge(b)
        np.testing.assert_array_equal(a.table, whole.table)
        assert a.count == whole.count

    def test_serde(self):
        cm = CountMinSketch(width=512, depth=3, seed=7).update(np.arange(1000))
        back = CountMinSketch.from_bytes(cm.to_bytes())
        np.testing.assert_array_equal(back.table, cm.table)


class TestBloom:
    def test_no_false_negatives(self):
        seen = np.array([f"conv-{i:010d}" for i in range(50_000)], dtype=object)
        b = BloomFilter.for_capacity(50_000, 0.01, seed=0).update(seen)
        assert b.contains(seen).all()

    def test_false_positive_rate(self):
        seen = np.array([f"conv-{i:010d}" for i in range(50_000)], dtype=object)
        b = BloomFilter.for_capacity(50_000, 0.01, seed=0).update(seen)
        unseen = np.array([f"unseen-{i}" for i in range(20_000)], dtype=object)
        assert b.contains(unseen).mean() <= 0.02  # 2x configured bound

    def test_merge_is_union(self):
        a_items = np.array([f"a{i}" for i in range(10_000)], dtype=object)
        b_items = np.array([f"b{i}" for i in range(10_000)], dtype=object)
        a = BloomFilter(num_bits=1 << 18, num_hashes=5, seed=0).update(a_items)
        b = BloomFilter(num_bits=1 << 18, num_hashes=5, seed=0).update(b_items)
        a.merge(b)
        assert a.contains(a_items).all()
        assert a.contains(b_items).all()
        whole = BloomFilter(num_bits=1 << 18, num_hashes=5, seed=0)
        whole.update(a_items).update(b_items)
        np.testing.assert_array_equal(a.bits, whole.bits)

    def test_int_keys(self):
        b = BloomFilter(num_bits=1 << 16, num_hashes=5, seed=0).update(np.arange(1000))
        assert b.contains(np.arange(1000)).all()

    def test_serde(self):
        b = BloomFilter(num_bits=1 << 12, num_hashes=3, seed=1).update(np.arange(100))
        back = BloomFilter.from_bytes(b.to_bytes())
        np.testing.assert_array_equal(back.bits, b.bits)
        assert back.contains(np.arange(100)).all()


def test_cms_conservative_update_tighter_never_underestimates():
    import numpy as np

    from approximate_quantiles_ray.sketches.countmin import CountMinSketch

    rng = np.random.default_rng(8)
    # heavy collisions: tiny width forces overestimates in plain mode
    data = rng.zipf(1.3, 50_000).astype(np.int64) % 5_000
    vals, true = np.unique(data, return_counts=True)
    plain = CountMinSketch(width=512, depth=4, seed=1)
    cons = CountMinSketch(width=512, depth=4, seed=1, conservative=True)
    plain.update(data)
    cons.update(data)
    ep, ec = plain.estimate(vals), cons.estimate(vals)
    assert (ep >= true).all() and (ec >= true).all()  # upper bound law
    assert ec.sum() <= ep.sum()  # conservative is tighter overall
    assert (ec <= ep).mean() > 0.95
    rt = CountMinSketch.from_bytes(cons.to_bytes())
    assert rt.conservative and (rt.estimate(vals) == ec).all()


def test_hash_any_on_non_string_object_arrays():
    """Review regression: object arrays of ints/mixed values must hash
    (pandas fallback), not raise ArrowTypeError."""
    import numpy as np

    from approximate_quantiles_ray.functions.hashing import hash_any, hash_strings
    from approximate_quantiles_ray.sketches.hll import HLL

    obj_ints = np.array([1, 2, 3, 1], dtype=object)
    h = hash_strings(obj_ints)
    assert h.dtype == np.uint64 and h[0] == h[3] and h[0] != h[1]
    sk = HLL(p=10, seed=1)
    sk.update(obj_ints)  # routes through hash_any → must not crash
    assert 2 <= sk.estimate() <= 5


def test_hll_transition_band_bias_ertl_vs_flajolet():
    """The 2.5m-5m band is where the classic raw estimator is biased
    (the reason HLL++ carries bias tables). The default Ertl estimator
    must stay within ~2 standard errors MEAN bias there at p in {12,14},
    and must not be worse than the classic estimator's band bias."""
    import numpy as np

    from approximate_quantiles_ray.sketches.hll import HLL

    rng = np.random.default_rng(77)
    for p in (12, 14):
        m = 1 << p
        stderr = 1.04 / (m ** 0.5)
        for n in (int(2.5 * m), int(3.5 * m), int(5 * m)):
            errs, errs_classic = [], []
            for trial in range(8):
                h = HLL(p=p, seed=trial)
                vals = rng.integers(0, 1 << 62, n, dtype=np.uint64) + np.uint64(
                    trial << 1
                )
                h.update(np.unique(vals))
                n_true = len(np.unique(vals))
                errs.append((h.estimate() - n_true) / n_true)
                errs_classic.append((h.estimate_flajolet() - n_true) / n_true)
            mean_bias = abs(float(np.mean(errs)))
            assert mean_bias < 2.0 * stderr, (p, n, mean_bias, stderr)
            # per-trial error bounded too (no catastrophic band behavior)
            assert max(abs(e) for e in errs) < 5.0 * stderr, (p, n, errs)
            assert mean_bias <= abs(float(np.mean(errs_classic))) + stderr


def test_update_prehashed_bit_equal_to_update():
    """update_prehashed(hash_any(v, seed)) must equal update(v) exactly
    (registers/tables/bits AND count) — the window engines' batch fast
    path hashes once per batch and feeds slices; any drift here would
    silently skew every windowed sketch."""
    import numpy as np

    from approximate_quantiles_ray.functions.hashing import hash_any
    from approximate_quantiles_ray.sketches.bloom import BloomFilter
    from approximate_quantiles_ray.sketches.countmin import CountMinSketch
    from approximate_quantiles_ray.sketches.hll import HLL
    from approximate_quantiles_ray.sketches.kmv import KMV

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50_000, 20_000).astype(np.int64)

    a, b = HLL(p=12, seed=5), HLL(p=12, seed=5)
    a.update(vals)
    b.update_prehashed(hash_any(vals, 5))
    assert np.array_equal(a.registers, b.registers) and a.count == b.count
    # and the precompute/scatter split used per group slices
    c = HLL(p=12, seed=5)
    idx, rho = c.precompute_hashed(hash_any(vals, 5))
    for s in range(0, len(vals), 137):  # uneven slices
        c.update_precomputed(idx[s:s + 137], rho[s:s + 137])
    assert np.array_equal(a.registers, c.registers) and a.count == c.count

    a, b = CountMinSketch(width=2048, depth=4, seed=5), CountMinSketch(width=2048, depth=4, seed=5)
    a.update(vals)
    b.update_prehashed(hash_any(vals, 5))
    assert np.array_equal(a.table, b.table) and a.count == b.count

    a, b = BloomFilter(num_bits=1 << 16, num_hashes=5, seed=5), BloomFilter(num_bits=1 << 16, num_hashes=5, seed=5)
    a.update(vals)
    b.update_prehashed(hash_any(vals, 5))
    assert np.array_equal(a.bits, b.bits) and a.count == b.count

    a, b = KMV(k=512, seed=5), KMV(k=512, seed=5)
    a.update(vals)
    b.update_prehashed(hash_any(vals, 5))
    assert np.array_equal(a.values, b.values) and a.count == b.count
