"""Shared query-pipeline helpers (used by queries.py and analytics.py —
kept in a leaf module so the two registries can import them without a cycle)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _read(sf_dir: str, table: str, columns=None):
    """Column-pruned lazy read of one input table.  Routed through the
    Lance-or-parquet adapter: a ``<table>.lance`` dataset directory next to
    (or instead of) the parquet file wins when the Lance runtime is present,
    so the same pipelines run unchanged over the north-star Lance corpora."""
    import os

    from ..sources.table_io import read_table

    lance_dir = f"{sf_dir}/{table}.lance"
    if os.path.isdir(lance_dir):
        return read_table(lance_dir, columns=columns)
    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def _round(x, n: int):
    """Round half away from zero — matches SQL ROUND (numpy/pandas/pyarrow
    default to half-even, which diverges on exact ties like 0.03125)."""
    scale = 10.0**n
    arr = np.asarray(x, dtype=np.float64)
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale


def from_local_tables(tables) -> "rd.MaterializedDataset":
    """Pre-blocked MaterializedDataset from DRIVER-LOCAL Arrow tables with
    metadata computed locally — the zero-remote-work equivalent of
    ``rd.from_arrow_refs([ray.put(t) for t in tables])``.

    ``from_arrow_refs`` submits one ``get_table_block_metadata_schema`` remote
    task per ref and blocks on ``ray.get`` — metadata we already hold
    driver-side.  Idle-box cost is ~0.45 s for 16 refs, but mid-crawl those
    tiny tasks queue BEHIND the busy fetch tasks (measured 1.4–2.4 s staging a
    1,280-row seed table during the scaling bench), a serial seam that deflates
    the high-core legs.  Building the plan locally does no remote work at all,
    so it cannot queue.  Uses only the same internal constructors
    ``from_arrow_refs`` itself calls (ray 2.49); if a future Ray moves those
    internals, fall back to the public (slower, remote-metadata) path rather
    than breaking the crawl."""
    import ray
    import ray.data as rd

    try:
        from ray.data._internal.logical.interfaces import LogicalPlan
        from ray.data._internal.logical.operators.from_operators import FromArrow
        from ray.data._internal.plan import ExecutionPlan
        from ray.data._internal.stats import DatasetStats
        from ray.data.block import BlockExecStats, BlockMetadataWithSchema
        from ray.data.context import DataContext
        from ray.data.dataset import MaterializedDataset
    except ImportError:  # internal layout moved: correctness over the seam
        return rd.from_arrow_refs([ray.put(t) for t in tables])

    metadata_schema = []
    refs = []
    for t in tables:
        stats = BlockExecStats.builder()
        metadata_schema.append(
            BlockMetadataWithSchema.from_block(t, stats=stats.build())
        )
        refs.append(ray.put(t))
    execution_plan = ExecutionPlan(
        DatasetStats(metadata={"FromArrow": metadata_schema}, parent=None),
        DataContext.get_current().copy(),
    )
    logical_plan = LogicalPlan(
        FromArrow(refs, metadata_schema), execution_plan._context
    )
    return MaterializedDataset(execution_plan, logical_plan)


def _add_part(col: str, n_parts: int = 32):
    """Vectorized coarse-partition column for the two-level grouped-apply
    pattern: ``groupby(part).map_groups(inner)`` launches n_parts Ray groups
    (hash-partitioned on the real key), and ``inner`` runs the per-key logic
    vectorized in pandas/numpy — instead of one Ray task per tiny key group."""

    def add(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        part = (v.astype(np.uint64) % np.uint64(n_parts)).astype(np.int32)
        return t.append_column("part", pa.array(part, pa.int32()))

    return add


#: Per-worker-process cache of constructed map_batches handles (task_stage).
#: Bounded FIFO like _PART_CACHE; instances hold zero-copy plasma views.
_INSTANCE_CACHE: dict = {}
_INSTANCE_CACHE_MAX = 64


def task_stage(cls, *ctor_args, **ctor_kw):
    """Wrap a STATELESS map_batches class as a fused TASK-stage function with
    a per-worker-cached instance.

    CLAUDE.md r4 law: a handle that carries no cross-batch state (broadcast
    views fetched in ``__init__``) does not need an actor pool — the (1, N)
    pool only pays ramp-up and a min-CPU reservation (which multiplies under
    pipelined windows); a task stage is semantics-identical, fuses with the
    upstream operator, and the per-worker cache still amortizes construction
    to once per worker process (measured: supplier_revenue 3.2 s → 1.3 s,
    ann_topk 1.2 s → 0.4 s at sf0.1/32 cpu).  NOT for genuinely stateful
    handles (cross-batch sessions, postback-token chains, politeness clocks)
    — those stay actor pools."""
    import uuid

    key = uuid.uuid4().hex

    def fn(batch, _key=key, _cls=cls, _args=ctor_args, _kw=ctor_kw):
        inst = _INSTANCE_CACHE.get(_key)
        if inst is None:
            if len(_INSTANCE_CACHE) >= _INSTANCE_CACHE_MAX:
                _INSTANCE_CACHE.pop(next(iter(_INSTANCE_CACHE)))
            inst = _cls(*_args, **_kw)
            _INSTANCE_CACHE[_key] = inst
        return inst(batch)

    fn.__name__ = f"task_{getattr(cls, '__name__', 'stage')}"
    return fn


def session_parts(lo: int = 16, hi: int = 256) -> int:
    """Exchange partition count sized to the session's CPU capacity (CLAUDE.md
    r3 law: size pools/parts from ``ray.cluster_resources()``, not fixed
    constants).  One part = one ``map_groups`` task, so a fixed 32 would cap
    exchange parallelism on a big cluster and pay 32 tiny-task overheads in a
    4-CPU pytest session.  Clamped: ``lo`` keeps key skew tolerable at tiny
    scale, ``hi`` bounds the per-exchange task count (and the sentinel-row
    union) at cluster scale."""
    try:
        import ray

        cpu = int(ray.cluster_resources().get("CPU", 32))
    except Exception:
        return 32
    return int(np.clip(cpu, lo, hi))


def static_parts(ds: "rd.Dataset", key_col: str, n_parts: int = 32,
                 sort_by=None, dedup: bool = False) -> dict:
    """Hash-partition a STATIC relation ONCE into plasma: one ``num_returns``
    fan-out task per block (no worker ever holds a foreign part), then one
    concat task per part.  Returns ``{part: ObjectRef(pa.Table)}`` — the
    iterated-join build side (pagerank) / probe side (cell-partitioned kNN).
    Part formula matches ``_add_part`` (uint64 key % n_parts), so exchange
    rows tagged by ``_add_part(key_col, n_parts)`` land on the same part.
    ``sort_by``: optional column list each part table is sorted by (enables
    searchsorted lookups in the per-part group fns).
    ``dedup``: with ``sort_by``, drop rows whose ``sort_by`` tuple repeats —
    a GLOBAL distinct, because every row with a given ``key_col`` value
    lands in one part (k-core needs distinct undirected edges; duplicated
    out_links would inflate degrees AND decrement pushes)."""
    import ray as _ray

    @_ray.remote(num_returns=n_parts)
    def split(tbl: pa.Table):
        if key_col not in tbl.schema.names or tbl.num_rows == 0:
            # empty map_groups outputs surface as zero-COLUMN blocks
            empty = tbl.slice(0, 0)
            return tuple(empty for _ in range(n_parts))
        v = tbl[key_col].to_numpy(zero_copy_only=False)
        part = v.astype(np.uint64) % np.uint64(n_parts)
        return tuple(tbl.filter(pa.array(part == p)) for p in range(n_parts))

    @_ray.remote
    def combine(*tbls):
        nonempty = [x for x in tbls if x.num_rows]
        if not nonempty:
            schemas = [x.schema for x in tbls if key_col in x.schema.names]
            sch = schemas[0] if schemas else tbls[0].schema
            return pa.table({f.name: pa.array([], f.type) for f in sch})
        t = pa.concat_tables(nonempty, promote_options="default")
        if sort_by:
            t = t.sort_by([(c, "ascending") for c in sort_by]
                          if isinstance(sort_by, (list, tuple)) else sort_by)
            if dedup and t.num_rows:
                cols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
                keep = np.zeros(t.num_rows, bool)
                keep[0] = True
                for c in cols:
                    v = t[c].to_numpy(zero_copy_only=False)
                    keep[1:] |= v[1:] != v[:-1]
                t = t.filter(pa.array(keep))
        return t.combine_chunks()

    block_splits = [split.remote(ref) for ref in ds.to_arrow_refs()]
    return {p: combine.remote(*[bs[p] for bs in block_splits])
            for p in range(n_parts)}


def repartition_parts(parts: dict, key_col: str, n_parts: int,
                      sort_by=None) -> dict:
    """Re-key an existing ``static_parts`` dict by a DIFFERENT column — e.g.
    turn a (a, b) edge layout partitioned by ``a`` into the same edges
    partitioned by ``b`` (link_triangles needs the adjacency pinned by both
    endpoints so per-part degree is fully local).  Same split/combine task
    shape as ``static_parts``, but sourced from the part refs (no Dataset
    round-trip, and the input is already deduped)."""
    import ray as _ray

    @_ray.remote(num_returns=n_parts)
    def split(tbl: pa.Table):
        if key_col not in tbl.schema.names or tbl.num_rows == 0:
            empty = tbl.slice(0, 0)
            return tuple(empty for _ in range(n_parts))
        v = tbl[key_col].to_numpy(zero_copy_only=False)
        part = v.astype(np.uint64) % np.uint64(n_parts)
        return tuple(tbl.filter(pa.array(part == p)) for p in range(n_parts))

    @_ray.remote
    def combine(*tbls):
        nonempty = [x for x in tbls if x.num_rows]
        if not nonempty:
            return tbls[0].slice(0, 0)
        t = pa.concat_tables(nonempty, promote_options="default")
        if sort_by:
            t = t.sort_by([(c, "ascending") for c in sort_by]
                          if isinstance(sort_by, (list, tuple)) else sort_by)
        return t.combine_chunks()

    block_splits = [split.remote(ref) for ref in parts.values()]
    return {p: combine.remote(*[bs[p] for bs in block_splits])
            for p in range(n_parts)}


# Per-worker-process cache of static part tables, keyed by (epoch, ref).
# ray.get of a plasma table is zero-copy; the cache only avoids repeated
# deserialization across a call's many group tasks.  EPOCH-scoped: each
# driver call mints a fresh epoch, and any access drops entries from other
# epochs — so a finished call's plasma buffers are unpinned the next time
# any part-cached query touches the worker, instead of lingering for the
# worker's lifetime (the r3 FIFO bound kept up to 128 dead-ref tables
# pinned between calls).
_PART_CACHE: dict = {}


def part_cache_get(epoch: str, ref):
    for k in [k for k in _PART_CACHE if k[0] != epoch]:
        _PART_CACHE.pop(k, None)
    key = (epoch, ref)
    tbl = _PART_CACHE.get(key)
    if tbl is None:
        import ray

        tbl = ray.get(ref)
        _PART_CACHE[key] = tbl
    return tbl


_M64 = 1 << 64

# shared CTE chain: token-3-gram shingles → exact Jaccard → verified near-dup
# pairs at threshold 0.95 (string-replace the threshold / source table to
# retarget — used by the minhash/jaccard/cluster oracles in queries.py and the
# composed training_data_prep oracle in analytics.py)
_MINHASH_PAIRS_CTES = """w AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents
        ),
        shd AS (
            SELECT DISTINCT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS sh
            FROM w a
            JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            JOIN w c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id),
        inter AS (
            SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS i
            FROM shd x JOIN shd y ON x.sh = y.sh AND x.doc_id < y.doc_id
            GROUP BY x.doc_id, y.doc_id
        ),
        pairs AS (
            SELECT doc_a, doc_b, ROUND(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.95
        )"""


def _mul64_sql(a: str, b: str) -> str:
    """SQL expression: (a*b) mod 2^64 for 64-bit operands via 32-bit split —
    every intermediate fits in HUGEINT (32×32-bit products are < 2^64)."""
    return (
        f"((({a} % 4294967296) * ({b} % 4294967296)"
        f" + (((({a} % 4294967296) * ({b} // 4294967296)"
        f" + ({a} // 4294967296) * ({b} % 4294967296)) % 4294967296) * 4294967296)) % {_M64})"
    )


_FNV_OFFSET_I = 0xCBF29CE484222325
_FNV_PRIME_I = 0x100000001B3


def _fnv_sql(col: str) -> str:
    """SQL expression: FNV-1a64(col) with the engine's length mix
    (functions/hashing.py fnv1a64_bytes — validated byte-exact vs the kernel).
    Texts are ASCII by corpus construction, so ord(substr) == byte value.
    FNV's per-byte multiply uses HUGEINT directly (prime ≈ 2^40, so h·prime
    < 2^104 fits in HUGEINT)."""
    return f"""((xor(
      list_reduce(
        [{_FNV_OFFSET_I}::HUGEINT] ||
        list_transform(range(1, strlen({col})+1), i -> ord(substr({col}, i, 1))::HUGEINT),
        (h, c) -> ((xor(h::UBIGINT, c::UBIGINT))::HUGEINT * {_FNV_PRIME_I}) % {_M64}
      )::UBIGINT, strlen({col})::UBIGINT))::HUGEINT * {_FNV_PRIME_I}) % {_M64}"""
