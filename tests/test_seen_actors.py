import numpy as np
import pytest


@pytest.fixture()
def seen_set(ray_session):
    from legislation_scraper_ray.state.seen import ShardedSeenSet

    s = ShardedSeenSet(n_shards=3, capacity_per_shard=1 << 14, mode="exact")
    yield s
    s.shutdown()


def test_check_and_add_mask(seen_set):
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**63, size=5_000, dtype=np.uint64)
    ref: set[int] = set()
    for lo in range(0, len(keys), 500):
        batch = keys[lo : lo + 500]
        mask = seen_set.check_and_add(batch)
        expect = []
        for k in batch:
            expect.append(int(k) in ref)
            ref.add(int(k))
        assert (mask == np.array(expect)).all()
    assert seen_set.total_ops() == len(keys)


def test_snapshot_restore_idempotent(seen_set):
    keys = np.arange(1000, dtype=np.uint64)
    seen_set.check_and_add(keys)
    snap = seen_set.snapshot()
    seen_set.check_and_add(np.arange(1000, 2000, dtype=np.uint64))
    seen_set.restore(snap)
    # after restore, the second range is novel again; the first is seen
    mask1 = seen_set.check_and_add(keys)
    assert mask1.all()
    mask2 = seen_set.check_and_add(np.arange(1000, 2000, dtype=np.uint64))
    assert not mask2.any()
