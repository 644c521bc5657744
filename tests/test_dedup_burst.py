"""Planted semantics for events_dedup_burst: previous-EVENT (not
previous-kept) gap rule, per-(user, type) keys, (ts, event_id) tie order."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_burst_semantics_planted(ray_session, tmp_path):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = np.timedelta64(1_000_000, "us")  # one second

    rows = [
        # chained burst: 0, +50s, +110s — the third is 60s after the SECOND
        # event (previous-event rule drops it even though the second was
        # itself dropped)
        (1, 7, "click", base),
        (2, 7, "click", base + 50 * s),
        (3, 7, "click", base + 110 * s),
        # exactly 61s later → kept (> 60, not >=)
        (4, 7, "click", base + 171 * s),
        # same ts tie: only the lowest event_id survives
        (5, 7, "view", base),
        (6, 7, "view", base),
        # different user, same type+ts as user 7's burst: independent key
        (7, 8, "click", base + 50 * s),
        # different type for user 7 inside the click burst: independent key
        (8, 7, "buy", base + 50 * s),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "ts": pa.array([r[3].astype("datetime64[us]").item() for r in rows],
                       pa.timestamp("us")),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    from legislation_scraper_ray.pipelines.queries import events_dedup_burst

    out = events_dedup_burst(str(tmp_path)).to_pandas()
    assert sorted(out["event_id"]) == [1, 4, 5, 7, 8]


def test_burst_all_kept_when_sparse(ray_session, tmp_path):
    ts = pd.date_range("2024-01-01", periods=10, freq="2min").values.astype("datetime64[us]")
    tbl = pa.table({
        "event_id": pa.array(range(10), pa.int64()),
        "user_id": pa.array([1] * 10, pa.int64()),
        "event_type": pa.array(["click"] * 10),
        "ts": pa.array(list(ts), pa.timestamp("us")),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    from legislation_scraper_ray.pipelines.queries import events_dedup_burst

    out = events_dedup_burst(str(tmp_path)).to_pandas()
    assert len(out) == 10
