import numpy as np

from legislation_scraper_ray.state.cuckoo import CuckooFilter, ExactSet


def _keys(n, seed=0):
    return np.random.default_rng(seed).integers(0, 2**63, size=n, dtype=np.uint64)


def test_no_false_negatives():
    keys = _keys(50_000)
    cf = CuckooFilter(capacity=60_000)
    cf.add_batch(keys)
    assert cf.contains_batch(keys).all()


def test_false_positive_rate_small():
    keys = _keys(50_000, seed=1)
    other = _keys(50_000, seed=2)
    cf = CuckooFilter(capacity=60_000)
    cf.add_batch(keys)
    fp = cf.contains_batch(other).mean()
    assert fp < 0.01, fp  # 16-bit fingerprints → expected ~0.012%


def test_add_batch_semantics_match_exact_set():
    rng = np.random.default_rng(3)
    # keys with plenty of intra- and inter-batch duplicates
    pool = rng.integers(0, 5_000, size=20_000, dtype=np.uint64)
    cf, ex = CuckooFilter(capacity=10_000), ExactSet()
    for lo in range(0, len(pool), 1000):
        batch = pool[lo : lo + 1000]
        m_cf = cf.add_batch(batch)
        m_ex = ex.add_batch(batch)
        # cuckoo may have false *positives* (seen=True for novel key) but never
        # false negatives (seen=False for present key)
        assert not (m_ex & ~m_cf).any()
        assert (m_cf == m_ex).mean() > 0.999


def test_serialize_roundtrip():
    keys = _keys(10_000, seed=4)
    cf = CuckooFilter(capacity=20_000)
    cf.add_batch(keys)
    cf2 = CuckooFilter.deserialize(cf.serialize())
    assert cf2.contains_batch(keys).all()
    assert cf2.count == cf.count
    # behavior after restore matches: adding the same keys reports all-seen
    assert cf2.add_batch(keys[:100]).all()


def test_overload_never_loses_keys():
    cf = CuckooFilter(capacity=1_000)
    keys = _keys(4_000, seed=5)  # way past capacity → overflow set engages
    cf.add_batch(keys)
    assert cf.contains_batch(keys).all()


def test_exact_set_roundtrip():
    ex = ExactSet()
    keys = _keys(1_000, seed=6)
    ex.add_batch(keys)
    ex2 = ExactSet.deserialize(ex.serialize())
    assert ex2.contains_batch(keys).all()
    assert ex2.count == ex.count


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=500))
@settings(max_examples=30, deadline=None)
def test_property_add_subset_contains(keys):
    """Property: every added key is contained afterwards (no false negatives),
    for arbitrary key distributions including adversarial duplicates."""
    cf = CuckooFilter(capacity=1024)
    arr = np.array(keys, dtype=np.uint64)
    cf.add_batch(arr)
    assert cf.contains_batch(arr).all()
