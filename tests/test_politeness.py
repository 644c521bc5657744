from legislation_scraper_ray.state.politeness import HostPoliteness, TokenBucket


def test_token_bucket_basic():
    tb = TokenBucket(rate=2.0, burst=2.0)
    assert tb.try_acquire(0.0)
    assert tb.try_acquire(0.0)
    assert not tb.try_acquire(0.0)  # burst exhausted
    assert not tb.try_acquire(0.4)  # 0.8 tokens refilled
    assert tb.try_acquire(0.6)  # ≥1 token


def test_token_bucket_next_available():
    tb = TokenBucket(rate=1.0, burst=1.0)
    assert tb.try_acquire(0.0)
    t = tb.next_available(0.0)
    assert abs(t - 1.0) < 1e-9


def test_host_politeness_spacing():
    hp = HostPoliteness({"a": 100, "b": 0}, mode="virtual")
    starts_a = [hp.schedule("a") for _ in range(10)]
    diffs = [b - a for a, b in zip(starts_a, starts_a[1:])]
    assert all(abs(d - 0.1) < 1e-9 for d in diffs)
    starts_b = [hp.schedule("b") for _ in range(5)]
    assert all(s == 0.0 for s in starts_b)  # no delay host
