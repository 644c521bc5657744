"""As-of join correctness: planted date ties, no-prior-order events, and
parity with a brute-force per-event scan."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path):
    rng = np.random.default_rng(5)
    n_ev, n_ord, n_users = 400, 300, 20
    ev = pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(pd.to_datetime(rng.integers(10**6, 10**9, n_ev), unit="s").astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(["x"] * n_ev),
        "value": pa.array(np.zeros(n_ev)),
        "props": pa.array(["{}"] * n_ev),
    })
    dates = pd.to_datetime(rng.integers(10**6, 10**9, n_ord), unit="s").values.astype("datetime64[us]")
    dates[1] = dates[0]  # planted date tie (same custkey below)
    orders = pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(np.r_[[7, 7], rng.integers(0, n_users, n_ord - 2)], pa.int64()),
        "o_orderstatus": pa.array(["O"] * n_ord),
        "o_totalprice": pa.array(np.zeros(n_ord)),
        "o_orderdate": pa.array(dates),
        "o_orderpriority": pa.array(["1-URGENT"] * n_ord),
    })
    pq.write_table(ev, tmp_path / "events.parquet")
    pq.write_table(orders, tmp_path / "orders.parquet")
    return ev.to_pandas(), orders.to_pandas()


def test_asof_join_matches_brute_force(ray_session, tmp_path):
    from legislation_scraper_ray.pipelines.queries import events_asof_orders

    ev, orders = _write(tmp_path)
    out = events_asof_orders(str(tmp_path)).sort_values("event_id").reset_index(drop=True)

    # brute force: per event, the max-date order at-or-before ts; ties on the
    # date break to max o_orderkey (the deduped semantics)
    rows = []
    for _, e in ev.iterrows():
        cand = orders[(orders.o_custkey == e.user_id) & (orders.o_orderdate <= e.ts)]
        if len(cand):
            best_date = cand.o_orderdate.max()
            best = cand[cand.o_orderdate == best_date].o_orderkey.max()
            rows.append((e.event_id, best, best_date))
    truth = pd.DataFrame(rows, columns=["event_id", "o_orderkey", "o_orderdate"]).astype(
        {"event_id": "int64", "o_orderkey": "int64", "o_orderdate": "datetime64[us]"}
    ).sort_values("event_id").reset_index(drop=True)
    assert len(out) == len(truth)
    pd.testing.assert_frame_equal(out[truth.columns], truth)
