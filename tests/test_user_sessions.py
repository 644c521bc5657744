"""Planted semantics for user_sessions: STRICT > gap rule, 1-based per-user
session index, (ts, event_id) tie order, session start/end/count/sum."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows):
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2].astype("datetime64[us]").item() for r in rows],
                       pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")


def test_user_sessions_planted(ray_session, tmp_path):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(60_000_000, "us")  # one minute

    rows = [
        # user 7: two events 10 min apart → one session; then a 31-min gap
        # (> 30, STRICT) opens session 2; an exactly-30-min gap does NOT
        (1, 7, base, 1.0),
        (2, 7, base + 10 * m, 2.0),
        (3, 7, base + 41 * m, 4.0),          # 31 min after event 2 → new
        (4, 7, base + 71 * m, 8.0),          # exactly 30 min → SAME session
        # user 8: single event → one session of one
        (5, 8, base, 16.0),
        # user 9: same-ts tie, both in one session
        (6, 9, base, 32.0),
        (7, 9, base, 64.0),
    ]
    _write_events(tmp_path, rows)
    from legislation_scraper_ray.pipelines.queries import user_sessions

    out = (user_sessions(str(tmp_path)).to_pandas()
           .sort_values(["user_id", "session_idx"], ignore_index=True))

    assert out[["user_id", "session_idx", "n_events"]].values.tolist() == [
        [7, 1, 2], [7, 2, 2], [8, 1, 1], [9, 1, 2]]
    assert out["sum_value"].tolist() == [3.0, 12.0, 16.0, 96.0]
    s7 = out[out["user_id"] == 7]
    assert s7["session_start"].tolist() == [base.item(), (base + 41 * m).item()]
    assert s7["session_end"].tolist() == [(base + 10 * m).item(),
                                          (base + 71 * m).item()]


def test_user_sessions_vs_brute(ray_session, tmp_path):
    """Random corpus vs an O(n log n) driver-side brute force."""
    rng = np.random.default_rng(5)
    n = 2000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    uid = rng.integers(0, 37, n)
    ts = base + rng.integers(0, 3_000, n) * np.timedelta64(60_000_000, "us")
    # exact binary grid (k/64): session sums are then exact in float64
    # regardless of summation order, so pandas-groupby vs sequential brute
    # rounding can never disagree at a .xx5 boundary
    val = rng.integers(0, 640, n) / 64.0
    rows = list(zip(range(n), uid.tolist(), ts, val.tolist()))
    _write_events(tmp_path, rows)

    from legislation_scraper_ray.pipelines.queries import user_sessions

    out = (user_sessions(str(tmp_path)).to_pandas()
           .sort_values(["user_id", "session_idx"], ignore_index=True))

    # brute force: per user, sort by (ts, event_id), split on gap > 30 min
    import collections
    per_user = collections.defaultdict(list)
    for eid, u, t, v in rows:
        per_user[u].append((t.astype("datetime64[us]").view(np.int64), eid, v))
    expect = []
    for u in sorted(per_user):
        evs = sorted(per_user[u])
        sidx, start = 0, None
        cur = []
        sessions = []
        for t, eid, v in evs:
            if cur and t - cur[-1][0] > 30 * 60_000_000:
                sessions.append(cur)
                cur = []
            cur.append((t, eid, v))
        sessions.append(cur)
        from legislation_scraper_ray.pipelines.queries import _round
        for i, s in enumerate(sessions, 1):
            expect.append((u, i, s[0][0], s[-1][0], len(s),
                           float(_round(np.array([sum(x[2] for x in s)]), 2)[0])))

    assert len(out) == len(expect)
    got = list(zip(out["user_id"], out["session_idx"],
                   out["session_start"].astype("int64"),
                   out["session_end"].astype("int64"),
                   out["n_events"], out["sum_value"]))
    for g, e in zip(got, expect):
        assert g[:5] == e[:5], (g, e)
        assert abs(g[5] - e[5]) < 1e-6, (g, e)
