"""Unit coverage for the plasma static-layout primitives every iterated
fixpoint and the fused link_triangles rely on: ``static_parts`` (partition a
Dataset once into {part → ObjectRef}, optional sort + global dedup) and
``repartition_parts`` (re-key an existing layout by a different column)."""

import numpy as np
import pyarrow as pa
import ray


def _table(n=1000, seed=3):
    rng = np.random.default_rng(seed)
    a = rng.integers(-2**62, 2**62, n)
    b = rng.integers(-2**62, 2**62, n)
    return pa.table({"a": pa.array(a, pa.int64()),
                     "b": pa.array(b, pa.int64())})


def test_static_parts_partition_sort_dedup(ray_session):
    import ray.data as rd

    from legislation_scraper_ray.pipelines.common import static_parts

    t = _table()
    # plant duplicates that share the key column (same part → dedupable)
    dup = t.slice(0, 50)
    ds = rd.from_arrow(pa.concat_tables([t, dup, dup]))
    n_parts = 8
    parts = static_parts(ds, "a", n_parts, sort_by=["a", "b"], dedup=True)
    assert set(parts) == set(range(n_parts))
    seen = []
    for p, ref in parts.items():
        pt = ray.get(ref)
        if not pt.num_rows:
            continue
        av = pt["a"].to_numpy(zero_copy_only=False)
        bv = pt["b"].to_numpy(zero_copy_only=False)
        # partition law matches _add_part: uint64(key) % n_parts
        assert (av.astype(np.uint64) % n_parts == p).all()
        # sorted by (a, b) in SIGNED int64 order (what the engine's
        # int64 searchsorted consumers rely on), strictly (dedup dropped
        # adjacent repeats)
        pairs = list(zip(av.tolist(), bv.tolist()))
        assert pairs == sorted(pairs)
        assert len(set(pairs)) == len(pairs)
        seen.extend(zip(av.tolist(), bv.tolist()))
    # global distinct equals the distinct rows of the input
    want = set(zip(t["a"].to_pylist(), t["b"].to_pylist()))
    assert set(seen) == want


def test_repartition_parts_rekey(ray_session):
    import ray.data as rd

    from legislation_scraper_ray.pipelines.common import (
        repartition_parts, static_parts,
    )

    t = _table(500, seed=7)
    n_parts = 8
    by_a = static_parts(rd.from_arrow(t), "a", n_parts, sort_by=["a", "b"])
    by_b = repartition_parts(by_a, "b", n_parts, sort_by=["b", "a"])
    rows = []
    for p, ref in by_b.items():
        pt = ray.get(ref)
        if not pt.num_rows:
            continue
        bv = pt["b"].to_numpy(zero_copy_only=False)
        assert (bv.astype(np.uint64) % n_parts == p).all()
        pairs = list(zip(bv.tolist(),
                         pt["a"].to_numpy(zero_copy_only=False).tolist()))
        assert pairs == sorted(pairs)
        rows.extend(zip(pt["a"].to_pylist(), pt["b"].to_pylist()))
    # nothing lost or duplicated by the re-key
    assert sorted(rows) == sorted(zip(t["a"].to_pylist(), t["b"].to_pylist()))
