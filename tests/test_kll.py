"""KLL quantile sketch: deterministic rank-error bound on continuous (unbounded-
domain) values, merge law, and the distributed pipeline operator (VERDICT r2
item 7)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from legislation_scraper_ray.functions.sketch import KLL

QS = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99)


def _continuous(n=200_000, seed=17):
    return np.random.default_rng(seed).lognormal(mean=2.0, sigma=1.2, size=n)


def _rank_errors(sk: KLL, vals: np.ndarray) -> list[float]:
    """|true_rank(estimate) − q·n| / n for each q."""
    s = np.sort(vals)
    n = len(s)
    errs = []
    for q in QS:
        est = sk.quantile(q)
        true_rank = np.searchsorted(s, est, side="right")
        errs.append(abs(true_rank - q * n) / n)
    return errs


def test_kll_rank_error_bound_continuous():
    vals = _continuous()
    sk = KLL(256)
    sk.update_many(vals)
    assert sk.n == len(vals)
    errs = _rank_errors(sk, vals)
    assert max(errs) <= sk.eps(), errs  # explicit ε = 4/k bound holds


def test_kll_merge_law_and_wire_roundtrip():
    """Merging 40 partial sketches (any split) must keep the bound — the
    property the Ray combiner relies on — and the (level, value) wire rows
    must rebuild an equivalent sketch."""
    vals = _continuous(seed=23)
    chunks = np.array_split(vals, 40)
    parts = []
    for c in chunks:
        sk = KLL(256)
        sk.update_many(c)
        parts.append(sk)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.n == len(vals)
    assert max(_rank_errors(merged, vals)) <= merged.eps()
    lv, it = merged.items()
    rebuilt = KLL.from_items(lv, it, merged.n, 256)
    assert max(_rank_errors(rebuilt, vals)) <= rebuilt.eps()


def test_kll_deterministic():
    """No RNG anywhere: identical input → identical estimates (reproducible
    across runs and cluster sizes, like the hash-keyed samplers)."""
    vals = _continuous(seed=31)
    a, b = KLL(128), KLL(128)
    a.update_many(vals)
    b.update_many(vals)
    assert [a.quantile(q) for q in QS] == [b.quantile(q) for q in QS]


def test_value_quantiles_kll_pipeline(ray_session, tmp_path):
    """End-to-end operator on a CONTINUOUS-value events corpus (every value
    distinct — the exact frequency-table path's worst case): every estimate
    must land within the sketch's rank-error band of the true distribution."""
    from legislation_scraper_ray.pipelines.analytics import value_quantiles_kll

    rng = np.random.default_rng(7)
    n = 120_000
    types = rng.choice(["a", "b", "c"], size=n)
    vals = rng.lognormal(mean=1.0, sigma=1.5, size=n) + np.arange(n) * 1e-9
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        tmp_path / "events.parquet",
    )
    out = value_quantiles_kll(str(tmp_path)).set_index("event_type")
    for et in ("a", "b", "c"):
        s = np.sort(vals[types == et])
        m = len(s)
        eps = float(out.loc[et, "eps_rank"])
        assert int(out.loc[et, "n"]) == m
        for q, col in ((0.25, "p25_est"), (0.5, "p50_est"), (0.75, "p75_est"), (0.9, "p90_est")):
            est = float(out.loc[et, col])
            true_rank = np.searchsorted(s, est, side="right")
            assert abs(true_rank - q * m) / m <= eps, (et, col)
