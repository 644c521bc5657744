"""The distributed crawl: URL frontier + fetch scheduler as a Ray Data generation loop.

This replaces the reference's whole execution engine — nested
``for year / situation / type / page`` loops + per-stage ThreadPoolExecutors +
a background saver thread (src/scraper/base/scraper.py:458-493,
src/scraper/federal_legislation/scrape.py:247-371, src/database/saver.py:63-141)
— with a BFS generation loop where every stage is a Dataset transform:

    frontier ──map_batches(canonicalize)──▶ url_hash
            ──map_batches(SeenFilter → cuckoo shard actors)──▶ novel URLs
            ──groupby(host).map_groups(politeness schedule)──▶ scheduled_ts
            ──sort(priority) [ordered modes]
            ──map_batches(FetchActor pool)──▶ payloads + out_links   [generation barrier]
            ├─ errors  ──▶ write_parquet(errors/)          (S9 error sink)
            ├─ docs    ──▶ project+filter (decode ran fused in fetch) ──▶ write_parquet(docs/, partitioned)
            └─ listings──▶ explode(out_links) ──▶ next generation's frontier

Two ordering modes (SURVEY.md §7 "Hard parts — crawl-order parity"):

- ``order="strict"`` — process (year, situation, type) units sequentially in
  priority order, BFS within each unit.  This IS the reference's crawl order
  (years asc, situations/types in declared order, page waves inside) and is
  what the parity tests compare against the single-threaded simulator.
- ``order="bfs"`` (default) — one global BFS; all units crawl concurrently.
  Same final URL-seen set and document set (dedup is order-insensitive over a
  deterministic link graph), ~unit-count× more parallelism.  This is the
  at-scale path and the one benchmarked.

Checkpoint/resume (north_rule): each generation is a barrier; before consuming
generation ``g`` the engine snapshots the seen-set shards and persists the
frontier, so a resumed run replays ``check_and_add`` idempotently and skips
completed generations exactly (vs the reference's lossy resume-at-last-year-1,
src/database/saver.py:48-61).  Lineage records (url_hash, generation, host,
scheduled_ts, status, attempts) are written per generation.

Hot-host skew (north_rule "salted repartitioning for hot-host skew"): the BFS
fetch path goes one step further than salting — it does not partition by host
AT ALL.  Frontier order spreads a Zipf hot host's URLs uniformly across fetch
batches (tests/test_crawl_t2.py::test_hot_host_skew_spreads_across_tasks), so
no task can become the hot-host straggler, while per-host politeness spacing
is enforced by the sharded slot actors rather than by co-locating a host's
rows (the co-location a salted shuffle would merely mitigate).  Only
``host_affinity=True`` trades this back deliberately — sequential per-host
protocols (S6 postback chains) REQUIRE one fetch unit per host; there the hot
host is the protocol's own serial floor, not a partitioning artifact.

Streaming-frontier design (r2): the frontier never lands on the driver — it is
a materialized Dataset whose blocks live in the object store; the checkpoint
persists it with ``write_parquet``.  The only synchronization a generation
needs is the FETCH of its listings (BFS data dependency: out_links feed the
next frontier); doc decode + partitioned write — the bulk of per-generation
work — runs asynchronously in a writer thread and is joined only before the
next checkpoint (so "checkpoint at g+1" still implies "docs ≤ g durable") and
at crawl end.  Driver-side per-generation state is O(hosts-touched): a
per-batch (host, status, kind) partial aggregate feeds counters and metrics
records.  Host clocks and robots delays live ONLY in the sharded politeness
actors (each holds its owned 1/n_shards slice — r5 scale audit: a full
host→value dict is ~15-20 GB at the 10^8 hosts a 10^10-URL frontier implies);
checkpoints stream the clocks out shard-at-a-time to parquet.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .common import from_local_tables
from ..stages.canonicalize import canonicalize_batch, make_robots_filter
from ..stages.fetch import FetchActor, prepare_web_cached
from ..state.politeness import PolitenessSlotShard, SlotAssigner, host_shard_of
from ..state.seen import SeenFilter, ShardedSeenSet

DOC_COLUMNS = [
    "url",
    "url_hash",
    "host",
    "image_id",
    "w",
    "h",
    "fmt",
    "caption",
    "phash",
    "phash_decoded",
    "decode_ok",
    "ocr_used",
    "feat_mean_rgb",
    "subject_ids",
    "psnr_db",
    "generation",
    "scheduled_ts",
    "priority",
    "year",
    "situation",
    "type",
]
LINEAGE_COLUMNS = [
    "url_hash",
    "host",
    "kind",
    "status",
    "attempts",
    "scheduled_ts",
    "priority",
    "generation",
]


@dataclass
class CrawlConfig:
    n_seen_shards: int = 4
    seen_mode: str = "cuckoo"  # cuckoo (at-scale) | exact (parity tests)
    seen_capacity_per_shard: int = 1 << 20
    fetch_concurrency: int = 4
    actor_num_cpus: float = 0.5  # fractional so actor-pool reservations leave
    # CPUs for the fused task stages even at small num_cpus
    batch_size: int = 4096
    order: str = "bfs"  # bfs | strict
    politeness_mode: str = "virtual"  # virtual (scheduled_ts accounting only)
    # | sleep (fetch actors pace against the wall clock — live-crawl mode)
    compute: str = "actors"  # actors (stateful pools, the at-scale path) |
    # tasks (stateless task pools — same semantics since fetch/decode state is a
    # zero-copy plasma view; avoids per-generation pool spin-up in short tests)
    host_affinity: bool = False  # S6 sequential-protocol mode: every host's
    # frontier rows are routed to ONE fetch unit per generation and processed
    # in scheduled order (the reference's ViewState/JSF postback chains —
    # espirito_santo.py:69-127, maranhao.py:45-110 — require strictly ordered
    # per-host requests).  Parallelism = host count; lineage gains
    # (fetch_seq, fetch_pid) so the ordering is auditable.
    session_tokens: bool = False  # S6 end-to-end (r3): thread a per-host
    # postback token chain through the fetch units — request i must present
    # the token minted by the host's previous response (state/session.py),
    # carried ACROSS generations by sharded session actors.  Requires
    # host_affinity (the chain is sequential by protocol); lineage gains
    # ``post_token`` so the chain is auditable end-to-end.  Auto-enabled when
    # any registered Source declares ``stateful_session = True``.
    max_generations: int = 64
    pipeline_generations: int = 4  # single-consumer streaming window (r3): how
    # many BFS generations are chained LAZILY into ONE streaming execution on
    # the fast path (no checkpoint/budget/host-affinity, write_lineage on).
    # Each generation's doc + lineage sinks run INSIDE its fused fetch chain
    # (pass-through map_batches), so generation g+1's fetch starts while g's
    # tail drains — the fill/drain seam of the per-generation fetch barrier is
    # paid once per window, not once per generation.  1 = legacy per-generation
    # barrier.  Trade-off: a URL discovered in two adjacent generations may be
    # fetched under the later generation label (the seen check races across the
    # overlapped generations); final seen/doc/error SETS are unchanged — use
    # order="strict" when exact per-generation attribution matters.
    robots_disallow: dict | None = None  # robots.txt path rules: host →
    # tuple of disallowed path prefixes.  Enforced by a vectorized filter
    # stage between canonicalize and the seen filter (stages/canonicalize.py
    # make_robots_filter): disallowed URLs are never fetched and never enter
    # the seen set; dropped-row counts surface as CrawlResult.robots_blocked.
    frontier_budget: int | None = None  # max URLs fetched per generation: the
    # priority-frontier pop (sort(priority).limit(k)); the remainder carries
    # over to the next generation.  SURVEY.md §2.6 engine extension.
    checkpoint: bool = True
    write_lineage: bool = True
    collect_stats: bool = False  # keep ds.stats() of each generation's pipeline
    ocr_threshold: int = 0
    keep_payloads: bool = False  # write decoded payload bytes into the doc sink
    browser_pool: bool = False  # S3/T2 browser stand-in (r4): insert a
    # BrowserExpand actor stage after fetch — one ScriptedBrowser handle per
    # actor (state/browser.py) drives each OK entry listing through its
    # scripted click-chain and merges the clicked pages' links into
    # out_links.  Auto-enabled when any registered Source declares
    # ``browser_pool = True``; lineage gains (pages_clicked, dom_token).


@dataclass
class CrawlResult:
    out_dir: str
    generations: int = 0
    fetched_ok: int = 0
    errors: int = 0
    dedup_dropped: int = 0
    robots_blocked: int = 0
    docs_written: int = 0
    seen_total: int = 0
    dedup_ops: int = 0
    wall_s: float = 0.0
    per_generation: list[dict] = field(default_factory=list)
    stats: list[str] = field(default_factory=list)
    # coarse non-generation phase timings: setup (staging/actor spawn before
    # the BFS loop), final writer join, teardown (actor kill + seen stats)
    timings: dict = field(default_factory=dict)


class _BlockedCounter:
    """Zero-CPU accumulator actor for fire-and-forget per-batch robots-drop
    counts (the filter stage never blocks on it)."""

    def __init__(self):
        self.n = 0

    def add(self, k: int) -> None:
        self.n += int(k)

    def total(self) -> int:
        return self.n


def _load_tables(corpus_dir: str):
    graph = pq.read_table(os.path.join(corpus_dir, "web_graph.parquet"))
    corpus = pq.read_table(os.path.join(corpus_dir, "corpus.parquet"))
    with open(os.path.join(corpus_dir, "manifest.json")) as f:
        manifest = json.load(f)
    return graph, corpus, manifest


# (corpus_dir, manifest mtime) → (graph_ref, corpus_ref, manifest).  The
# synthetic corpus is this sandbox's stand-in for the live internet: staging
# it into the object store is simulation setup, not crawl work, and repeat
# crawls in one session (bench warm/timed legs, tests) should not re-read and
# re-put ~700 MB of payload blobs each time.
_STAGE_CACHE: dict[str, tuple[float, tuple]] = {}


def stage_corpus(corpus_dir: str) -> tuple:
    """Load the synthetic web (graph + payload corpus) into the Ray object
    store once per session; zero-copy plasma refs are shared by every fetch
    task/actor and every subsequent crawl over the same corpus dir."""
    mpath = os.path.join(corpus_dir, "manifest.json")
    mt = os.path.getmtime(mpath)
    hit = _STAGE_CACHE.get(corpus_dir)
    if hit and hit[0] == mt:
        return hit[1]
    graph, corpus, manifest = _load_tables(corpus_dir)
    staged = (
        ray.put(prepare_web_cached(corpus_dir, graph, corpus)),
        ray.put(corpus),
        manifest,
    )
    _STAGE_CACHE[corpus_dir] = (mt, staged)
    return staged


def _seed_frontier(corpus_dir: str) -> pa.Table:
    seeds = pq.read_table(os.path.join(corpus_dir, "seeds.parquet"))
    return seeds.append_column("depth", pa.array(np.zeros(seeds.num_rows, np.int32)))


def _make_slot_shards(delays_ms: dict[str, int], clocks: dict[str, float], n_shards: int):
    """Spawn the sharded politeness slot actors (state/politeness.py), seeding
    each shard with ONLY the delays and clocks of the hosts it owns.

    r5 scale audit (10^10 URLs ≈ 10^8 hosts): a python host→value dict costs
    ~150-200 B/entry (dict slot + key string + float) → ~15-20 GB for the
    full universe.  Replicating the delay dict into every shard (the pre-r5
    shape) multiplies that by n_shards; slicing caps each shard at
    (hosts/n_shards) entries — ~60-80 MB at 256 shards — and the driver's
    own copy is a transient it releases after seeding (at true 10^8-host
    scale the robots-delay source would itself be a Dataset streamed
    per-shard through this same slicing, row-group at a time, exactly like
    ``_save_checkpoint``'s clock dump reads it back)."""
    Shard = ray.remote(num_cpus=0)(PolitenessSlotShard)
    # single pass over each dict (not a full scan per shard — that would be
    # O(n_shards x hosts), 2.6e10 dict probes at 10^8 hosts x 256 shards)
    owned_d: list[dict] = [{} for _ in range(n_shards)]
    owned_c: list[dict] = [{} for _ in range(n_shards)]
    for h, dl in delays_ms.items():
        owned_d[host_shard_of(h, n_shards)][h] = dl
    for h, c in clocks.items():
        owned_c[host_shard_of(h, n_shards)][h] = c
    return [Shard.remote(owned_d[i], owned_c[i]) for i in range(n_shards)]


def _small_frontier_batch(n_frontier: int, cfg: "CrawlConfig") -> int:
    """Effective batch size for a SMALL materialized frontier (seeds,
    strict-mode units, budget pops): spread it across ~2 scheduling waves of
    the fetch width instead of one serial task — map_batches BUNDLES blocks up
    to batch_size, so the staged block count and the chain's batch size must
    scale down TOGETHER (the 1,280-seed generation ran as ONE 1.1 s task at
    16 cores before this)."""
    if 1 < n_frontier < cfg.batch_size * cfg.fetch_concurrency:
        return max(64, -(-n_frontier // (2 * max(cfg.fetch_concurrency, 1))))
    return cfg.batch_size


def _explode_links(batch: pa.Table) -> pa.Table:
    """listing rows → one frontier row per out_link (flat-map as a vectorized
    Arrow list explode: list_parent_indices + flatten — no Python row loop)."""
    links = batch["out_links"]
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    parents = pc.list_parent_indices(links)
    flat = pc.list_flatten(links)
    # Take ONLY the scalar columns we re-emit.  Including `out_links` in the
    # take would copy each parent's full link list once PER CHILD link —
    # O(fanout²) string copies; measured >100 s for a 1280×356-link block vs
    # ~1 s without the list column (pyarrow's list-take goes per-element).
    taken = batch.select(
        ["host", "year", "situation", "type", "priority", "depth"]
    ).take(parents)
    return pa.table(
        {
            "url": flat,
            "host": taken["host"],
            "year": taken["year"],
            "situation": taken["situation"],
            "type": taken["type"],
            "priority": taken["priority"],
            "depth": pc.add(taken["depth"], pa.scalar(1, pa.int32())).cast(pa.int32()),
        }
    )


def run_crawl(
    corpus_dir: str,
    out_dir: str,
    cfg: CrawlConfig | None = None,
    resume: bool = False,
    frontier_override: pa.Table | rd.Dataset | None = None,
    sources: list | None = None,
    recrawl: bool = False,
) -> CrawlResult:
    """Run (or resume) the crawl — see ``_run_crawl_inner`` for the dataflow.

    ``recrawl=True`` = INCREMENTAL ingest: restore the seen set + host clocks
    from the completed crawl's checkpoint but seed a fresh frontier (including
    newly registered sources) — only never-seen URLs are fetched and appended.
    The reference has no such mode (its resume re-scrapes the last year,
    src/database/saver.py:48-61); this is the delta-crawl a production corpus
    refresh needs.

    Runs with the streaming executor's per-operator CPU reservation DISABLED
    (restored on exit): the fused fetch chain is one hot operator inside a
    5-7-operator pipeline, and the default reservation policy capped it at
    ~12 of 16 slots even with every other operator idle (measured: full bench
    crawl 30.3 s → 22.4 s at 16 pinned cores with reservation off)."""
    ctx = rd.DataContext.get_current()
    prev = getattr(ctx, "op_resource_reservation_enabled", True)
    ctx.op_resource_reservation_enabled = False
    try:
        return _run_crawl_inner(
            corpus_dir, out_dir, cfg, resume, frontier_override, sources, recrawl
        )
    finally:
        ctx.op_resource_reservation_enabled = prev


def _run_crawl_inner(
    corpus_dir: str,
    out_dir: str,
    cfg: CrawlConfig | None = None,
    resume: bool = False,
    frontier_override: pa.Table | rd.Dataset | None = None,
    sources: list | None = None,
    recrawl: bool = False,
) -> CrawlResult:
    """Run (or resume) the crawl over a synthetic corpus directory.

    ``frontier_override`` replaces the seed frontier (used by the sustained-
    throughput benchmark to feed the whole URL set as one generation).

    ``sources``: a list of Source implementations (sources/base.py) to crawl
    as ONE union frontier — each source's corpus/graph is loaded and merged
    (image ordinals re-offset, politeness budgets unioned), seed rows carry a
    ``source`` column, and listing/doc parsing dispatches to each source's
    ``parse_listing`` / ``parse_doc`` (the reference's 27-subclass template
    dispatch, src/scraper/base/scraper.py:434-456, as batch-level UDFs).
    Without ``sources`` the single ``corpus_dir`` is crawled with the default
    (synthetic-source) parse steps — the zero-dispatch fast path."""
    cfg = cfg or CrawlConfig()
    t_start = time.perf_counter()
    parse_listing_fn = parse_doc_fn = None
    cfg._browser_pages_ref = None  # set below when a browser-pool source is active
    if sources:
        prepared, corpora = [], []
        browser_tbls: list[pa.Table] = []
        delays_ms: dict[str, int] = {}
        offset = 0
        for s in sources:
            g, c, _m = _load_tables(s.corpus_dir)
            delays_ms.update(s.politeness())
            if getattr(s, "browser_pool", False):
                browser_tbls.append(
                    pq.read_table(os.path.join(s.corpus_dir, "browser_pages.parquet"))
                )
            p = prepare_web_cached(s.corpus_dir, g, c)
            if offset:
                idx = p["image_idx"]
                idx = pc.if_else(
                    pc.equal(idx, -1), idx, pc.add(idx, pa.scalar(offset, pa.int64()))
                )
                p = p.set_column(
                    p.schema.get_field_index("image_idx"), "image_idx", idx.cast(pa.int64())
                )
            prepared.append(p)
            corpora.append(c)
            offset += c.num_rows
        # promote: source graphs may differ by optional columns (e.g. the b64
        # source's payload_encoding) — missing columns fill with nulls
        graph_ref = ray.put(
            pa.concat_tables(prepared, promote_options="default").sort_by("url_hash")
        )
        corpus_ref = ray.put(pa.concat_tables(corpora, promote_options="default"))
        seed_tbls = []
        for s in sources:
            t = s.seeds()
            seed_tbls.append(
                t.append_column("source", pa.array([s.name] * t.num_rows, pa.string()))
            )
        frontier_default = pa.concat_tables(seed_tbls)
        parse_listing_fn = _make_dispatch(sources, "parse_listing")
        parse_doc_fn = _make_dispatch(sources, "parse_doc")
        if browser_tbls:
            cfg.browser_pool = True  # reflect source-driven auto-enable (lineage cols)
            cfg._browser_pages_ref = ray.put(
                pa.concat_tables(browser_tbls, promote_options="default")
            )
    else:
        graph_ref, corpus_ref, manifest = stage_corpus(corpus_dir)
        delays_ms = manifest["robots_delay_ms"]
        frontier_default = _seed_frontier(corpus_dir)

    crawl_epoch = time.time()
    ckpt_dir = os.path.join(out_dir, "checkpoint")
    seen = ShardedSeenSet(cfg.n_seen_shards, cfg.seen_capacity_per_shard, cfg.seen_mode)
    res = CrawlResult(out_dir=out_dir)
    clocks: dict[str, float] = {}
    start_gen = 0
    frontier_tbl = frontier_override if frontier_override is not None else frontier_default

    if resume:
        state = _load_checkpoint(ckpt_dir)
        if state is None:
            resume = False  # nothing to resume from → fresh run
        else:
            _check_seen_mode(state, cfg)
            start_gen = state["next_generation"]
            clocks = _load_clocks(state)
            seen.restore([_read_blob(p) for p in state["shard_files"]])
            fpath = state["frontier_file"]
            frontier_tbl = (
                rd.read_parquet(fpath).materialize() if os.path.exists(fpath) else None
            )
            res.per_generation = state.get("per_generation", [])
            for g in res.per_generation:
                res.fetched_ok += g["fetched_ok"]
                res.errors += g["errors"]
                res.dedup_dropped += g["dedup_dropped"]
                res.docs_written += g["docs_written"]
    elif recrawl:
        # incremental recrawl: restore the SEEN SET and host clocks from the
        # completed crawl's checkpoint, but start from a FRESH seed frontier
        # (including any newly registered sources).  Already-crawled URLs are
        # dropped by the seen filter, so only genuinely new pages are fetched
        # and appended (generation numbering continues, so partitioned output
        # dirs never collide).  Result counters report THIS run's new work.
        state = _load_checkpoint(ckpt_dir)
        if state is None:
            raise ValueError(
                "recrawl=True requires a completed checkpointed crawl in out_dir "
                f"(no checkpoint manifest under {ckpt_dir})"
            )
        if not state.get("final"):
            # an interrupted crawl's snapshot marks pending-frontier pages as
            # seen-by-parent but never fetched; recrawling from it would drop
            # them silently — resume it to completion first (ADVICE r2)
            raise ValueError(
                "recrawl=True requires a COMPLETED crawl checkpoint; this one is "
                "mid-crawl — run with resume=True to finish it first"
            )
        if len(state["shard_files"]) != cfg.n_seen_shards:
            raise ValueError(
                f"recrawl needs n_seen_shards={len(state['shard_files'])} (the "
                f"snapshot's shard count); got {cfg.n_seen_shards}"
            )
        _check_seen_mode(state, cfg)
        start_gen = state["next_generation"]
        clocks = _load_clocks(state)
        seen.restore([_read_blob(p) for p in state["shard_files"]])
    if not (resume or recrawl) and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    # sharded politeness slot actors own the per-host virtual clocks for the
    # whole crawl (seeded from the checkpoint's clocks on resume)
    slot_shards = _make_slot_shards(delays_ms, clocks, max(1, cfg.n_seen_shards))
    # robots path-Disallow enforcement (vectorized stage between canonicalize
    # and the seen filter in BOTH the per-generation and pipelined chains)
    robots_counter = None
    cfg._robots_fn = None
    if cfg.robots_disallow:
        robots_counter = ray.remote(num_cpus=0)(_BlockedCounter).remote()
        cfg._robots_fn = make_robots_filter(cfg.robots_disallow, robots_counter)
    # sharded session-token actors (S6 stateful form-POST protocol)
    session_on = cfg.session_tokens or bool(
        sources and any(getattr(s, "stateful_session", False) for s in sources)
    )
    session_shards = None
    cfg.session_tokens = session_on  # reflect source-driven auto-enable (lineage cols)
    if session_on:
        if not cfg.host_affinity:
            raise ValueError(
                "session_tokens (stateful form-POST protocol) requires "
                "host_affinity=True — the per-host token chain is sequential"
            )
        from ..state.session import SessionTokenShard

        Shard = ray.remote(num_cpus=0)(SessionTokenShard)
        session_shards = [Shard.remote() for _ in range(max(1, cfg.n_seen_shards))]

    res.timings["setup"] = round(time.perf_counter() - t_start, 2)
    if cfg.order == "strict":
        # Reference order: host-major (sources strictly sequential,
        # main.py:359-365), then one (year, situation, type) unit at a time in
        # declared order (src/scraper/base/scraper.py:479-485).
        if isinstance(frontier_tbl, rd.Dataset):  # resumed frontier → table
            frontier_tbl = pa.concat_tables(ray.get(frontier_tbl.to_arrow_refs()))
        units = (
            frontier_tbl.group_by(["host", "priority"])
            .aggregate([])
            .sort_by([("host", "ascending"), ("priority", "ascending")])
            if frontier_tbl is not None
            else pa.table({"host": pa.array([], pa.string()), "priority": pa.array([], pa.float32())})
        )
        for host, prio in zip(units["host"].to_pylist(), units["priority"].to_pylist()):
            unit_frontier = frontier_tbl.filter(
                pc.and_(
                    pc.equal(frontier_tbl["priority"], prio),
                    pc.equal(frontier_tbl["host"], host),
                )
            )
            _bfs(
                unit_frontier, cfg, seen, graph_ref, corpus_ref, out_dir,
                ckpt_dir, res, start_gen=res.generations, checkpoint=False,
                crawl_epoch=crawl_epoch, parse_listing_fn=parse_listing_fn,
                parse_doc_fn=parse_doc_fn, slot_shards=slot_shards,
                session_shards=session_shards,
                # strict mode IS the per-generation attribution harness (wave-
                # order parity vs the simulator) — keep the serial barrier
                allow_pipelined=False,
            )
    else:
        _bfs(
            frontier_tbl, cfg, seen, graph_ref, corpus_ref, out_dir,
            ckpt_dir, res, start_gen=start_gen, checkpoint=cfg.checkpoint,
            crawl_epoch=crawl_epoch, parse_listing_fn=parse_listing_fn,
            parse_doc_fn=parse_doc_fn, slot_shards=slot_shards,
            session_shards=session_shards,
        )

    t_td = time.perf_counter()
    if robots_counter is not None:
        res.robots_blocked = ray.get(robots_counter.total.remote())
        ray.kill(robots_counter)
    for sh in slot_shards + (session_shards or []):
        ray.kill(sh)
    stats = seen.stats()
    res.seen_total = sum(s["count"] for s in stats)
    res.dedup_ops = sum(s["ops"] for s in stats)
    res.timings["teardown"] = round(time.perf_counter() - t_td, 2)
    res.wall_s = time.perf_counter() - t_start
    with open(os.path.join(out_dir, "crawl_result.json"), "w") as f:
        json.dump({k: v for k, v in res.__dict__.items()}, f, indent=2, default=str)
    seen.shutdown()
    return res


class _AsyncWriter:
    """Bounded background writer pool for the doc decode+write path.

    The BFS loop only *needs* fetch output (listings → next frontier); doc
    decode + partitioned write is pure sink work, so it overlaps the next
    generation's schedule/fetch — up to ``max_inflight`` generations' writes
    run concurrently (bounding how many generations of payload blocks stay
    pinned in the object store).  ``join`` re-raises any failure and is called
    before each checkpoint save (durability ordering) and at crawl end."""

    def __init__(self, max_inflight: int = 2):
        self._threads: list[threading.Thread] = []
        self._err: BaseException | None = None
        self.max_inflight = max_inflight

    def launch(self, fn) -> None:
        self._threads = [t for t in self._threads if t.is_alive()]
        while len(self._threads) >= self.max_inflight:
            self._threads.pop(0).join()
        self._raise()

        def run():
            try:
                fn()
            except BaseException as e:  # re-raised on join
                self._err = e

        t = threading.Thread(target=run, daemon=True)
        t.start()
        self._threads.append(t)

    def join(self) -> None:
        while self._threads:
            self._threads.pop(0).join()
        self._raise()

    def _raise(self) -> None:
        if self._err is not None:
            err, self._err = self._err, None
            raise err


def _partial_stats(t: pa.Table) -> "pd.DataFrame":
    """(host, status, kind) partial aggregate of lineage-shaped rows —
    O(hosts) output regardless of input size."""
    # error rows carry a NULL kind (no graph row matched) — fill it, or the
    # pandas combine groupby silently drops those groups (dropna default)
    t = t.set_column(
        t.schema.get_field_index("kind"), "kind", pc.fill_null(t["kind"], "none")
    )
    g = t.group_by(["host", "status", "kind"]).aggregate(
        [("attempts", "count"), ("attempts", "sum"), ("attempts", "max"),
         ("scheduled_ts", "max")]
    )
    return g.rename_columns(
        ["host", "status", "kind", "n", "sum_attempts", "max_attempts", "max_ts"]
    ).to_pandas()


def _combine_stats(parts: "pd.DataFrame | None") -> "pd.DataFrame":
    import pandas as pd

    if parts is None or not len(parts):
        return pd.DataFrame(
            columns=["host", "status", "kind", "n", "sum_attempts", "max_attempts", "max_ts"]
        )
    return (
        parts.groupby(["host", "status", "kind"], sort=False)
        .agg(n=("n", "sum"), sum_attempts=("sum_attempts", "sum"),
             max_attempts=("max_attempts", "max"), max_ts=("max_ts", "max"))
        .reset_index()
    )


def _collect_gen_stats(fetched: rd.Dataset) -> "pd.DataFrame":
    """O(hosts)-sized per-generation bookkeeping via a Ray pass (fallback when
    lineage isn't written; the lineage-backed driver read is the fast path)."""
    parts = (
        fetched.select_columns(["host", "status", "kind", "attempts", "scheduled_ts", "url_hash"])
        .map_batches(
            lambda t: pa.Table.from_pandas(_partial_stats(t), preserve_index=False),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return _combine_stats(parts)


def _seen_total_ops(seen) -> int:
    """Total check_and_add ops across the seen shards (one tiny RPC per
    shard).  Generations are serial, so per-generation deltas of this counter
    give the exact number of frontier rows that REACHED the seen filter —
    which lets the fast path keep the frontier lazy (never counted/
    materialized between generations)."""
    return sum(st["ops"] for st in seen.stats())


def _write_gen_lineage(fetched: rd.Dataset, out_dir: str, gen: int, cfg: CrawlConfig) -> str:
    """ONE distributed lineage write for the generation (hive dir, cleared
    first since write_parquet appends)."""
    lin_dir = os.path.join(out_dir, "lineage", f"gen={gen}")
    if os.path.exists(lin_dir):
        shutil.rmtree(lin_dir)
    fetched.select_columns(_lineage_cols(cfg)).write_parquet(lin_dir)
    return lin_dir


def _lineage_cols(cfg: CrawlConfig) -> list[str]:
    cols = LINEAGE_COLUMNS + (["fetch_seq", "fetch_pid"] if cfg.host_affinity else [])
    if cfg.session_tokens:
        cols = cols + ["post_token"]
    if getattr(cfg, "browser_pool", False):
        cols = cols + ["pages_clicked", "dom_token"]
    return cols


def _derive_gen_stats(fetched: rd.Dataset, lin_dir: str | None):
    """Per-(host, status, kind) stats: from the written lineage files when
    available (driver-side pyarrow read of 5 small columns — no extra Ray
    execution), else a distributed O(hosts) pass over ``fetched``."""
    if lin_dir is not None and os.path.exists(lin_dir):
        import pyarrow.dataset as pads

        lin = pads.dataset(lin_dir).to_table(
            columns=["host", "status", "kind", "attempts", "scheduled_ts"]
        )
        return _combine_stats(_partial_stats(lin))
    if lin_dir is None:
        return _collect_gen_stats(fetched)
    return _combine_stats(None)


def _write_gen_errors(fetched: rd.Dataset, out_dir: str, gen: int, lin_dir: str | None) -> None:
    """Error sink (S9): error rows are failure-rate-sized."""
    err_dir = os.path.join(out_dir, "errors")
    os.makedirs(err_dir, exist_ok=True)
    import pyarrow.dataset as pads

    if lin_dir is not None and os.path.exists(lin_dir):
        err_tbl = pads.dataset(lin_dir).to_table(
            columns=LINEAGE_COLUMNS, filter=pads.field("status") == "error"
        )
    else:
        err_tbl = pa.concat_tables(
            ray.get(
                fetched.select_columns(LINEAGE_COLUMNS)
                .map_batches(_status_kind_filter("error", None), batch_format="pyarrow")
                .to_arrow_refs()
            )
        )
    pq.write_table(err_tbl, os.path.join(err_dir, f"gen-{gen}.parquet"))


def _write_gen_metrics(stats, err_rows, n_err: int, out_dir: str, gen: int) -> None:
    """Per-(host, generation) fetch/dedup metrics (north_rule: every partition
    emits lineage AND metrics records) — O(hosts) rows."""
    by_host = stats.groupby("host", sort=False).agg(
        n_fetched=("n", "sum"), sum_attempts=("sum_attempts", "sum"),
        max_attempts=("max_attempts", "max"), max_scheduled_ts=("max_ts", "max"),
    ).reset_index()
    errs = err_rows.groupby("host", sort=False)["n"].sum() if n_err else None
    by_host["n_errors"] = (
        by_host["host"].map(errs).fillna(0).astype("int64") if errs is not None else 0
    )
    by_host["n_errors"] = by_host["n_errors"].astype("int64")
    by_host["generation"] = np.int32(gen)
    mtr_dir = os.path.join(out_dir, "metrics")
    os.makedirs(mtr_dir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(by_host, preserve_index=False),
        os.path.join(mtr_dir, f"gen-{gen}.parquet"),
    )


def _build_doc_sink(fetched: rd.Dataset, cfg: "CrawlConfig", parse_doc_fn, out_dir: str,
                    gen: int) -> tuple[rd.Dataset, str]:
    """The doc sink dataset (decode already fused into fetch) + its hive dir.
    Clears the gen dir first: resume re-runs the generation from its
    checkpoint and write_parquet APPENDS."""
    doc_cols = (
        [c for c in DOC_COLUMNS]
        + (["bytes"] if cfg.keep_payloads else [])
        + (["source", "extras"] if parse_doc_fn is not None else [])
    )
    docs_dir = os.path.join(out_dir, "docs", f"gen={gen}")
    if os.path.exists(docs_dir):
        shutil.rmtree(docs_dir)
    if parse_doc_fn is not None:
        # user-extension path: per-source parse_doc may read any column, so
        # keep the full row and filter up front
        docs = (
            fetched.map_batches(_status_kind_filter("ok", "doc"), batch_format="pyarrow")
            .map_batches(parse_doc_fn, batch_format="pyarrow")
            .map_batches(lambda b, cols=doc_cols: _project_docs(b, cols), batch_format="pyarrow")
        )
    else:
        # the sink is a column prune + project + row filter, ordered so the
        # gather runs AFTER the ~15 KB/row payload is dropped — the old
        # filter-first order copied every payload-bearing block (~45 KB/row)
        # just to drop ~1% of rows
        sink_in = ["status", "kind"] + [
            "doc_" + c if c in ("year", "situation", "type") else c for c in doc_cols
        ]
        docs = fetched.select_columns(sink_in).map_batches(
            lambda b, cols=doc_cols: _project_docs_ok(b, cols), batch_format="pyarrow"
        )
    return docs, docs_dir


def _next_frontier_lazy(fetched: rd.Dataset, parse_listing_fn, cfg: "CrawlConfig") -> rd.Dataset:
    """Next frontier = exploded out_links of this generation's listings:
    metadata columns only (payloads never flow through the explode), re-blocked
    at fetch granularity with a STREAMING repartition (local block split/merge,
    no shuffle barrier).  Returned LAZY — the fast path chains it straight into
    the next generation's fused fetch execution; the checkpoint/budget path
    materializes it (the frontier must be durable/sortable there)."""
    meta_cols = ["status", "kind", "out_links", "host", "year", "situation",
                 "type", "priority", "depth"]
    if parse_listing_fn is not None:
        meta_cols.append("source")
    listings = fetched.select_columns(meta_cols).map_batches(
        _status_kind_filter("ok", "listing"), batch_format="pyarrow"
    )
    # re-block the (rare) listing rows into SMALL blocks before the explode so
    # it fans out: with one ~1k-listing block the whole next frontier is built
    # by a single task — a serial head that capped gen-1's 16-core efficiency
    # at ~0.65 (each listing fans out ~350 links, so 128 listings ≈ one 45k-row
    # explode output per task)
    listings = listings.repartition(target_num_rows_per_block=128)
    explode = parse_listing_fn or _explode_links
    # a listing generation is small (its fan-out is the next generation), so
    # its explode output easily fits ONE target_max_block_size block — and a
    # one-block frontier makes the next generation's fused fetch chain a
    # single serial task (measured: 2.5k pages/s vs 26k); hence the re-block.
    return listings.map_batches(explode, batch_format="pyarrow").repartition(
        target_num_rows_per_block=max(cfg.batch_size // 2, 1)
    )


def _stage_frontier(
    frontier_tbl: pa.Table | rd.Dataset | None, cfg: CrawlConfig, res: CrawlResult
) -> tuple[rd.Dataset | None, int]:
    """Normalize the incoming frontier (seed table / resumed Dataset) to a
    materialized Dataset + row count; (None, 0) means exhausted.

    A seed table is staged as a pre-blocked MaterializedDataset via driver-side
    zero-copy slices + plasma puts: ~5x cheaper than
    ``from_arrow(...).materialize()``, whose single FromArrow task re-serializes
    the whole table (a SERIAL cost that Amdahl-caps the high-core sustained
    legs).  Block rows ≥ batch_size → map_batches bundles exactly ONE block per
    task (bundling rounds UP to the batch size: 4064-row blocks under an 8192
    batch gave 3-block / ~12k-row tasks — only 2.4 task waves across 16 slots,
    so the final wave idled most cores).  Small seed tables block at the same
    ~2-wave effective batch the fetch chain will use (bundling can merge
    blocks, never split)."""
    t_norm = time.perf_counter()
    if isinstance(frontier_tbl, pa.Table):
        n_frontier = frontier_tbl.num_rows
        if n_frontier:
            bs_plan = _small_frontier_batch(n_frontier, cfg)
            k = max(1, min(256, n_frontier // max(bs_plan, 1)))
            bounds = np.linspace(0, n_frontier, k + 1).astype(int)
            frontier_ds = from_local_tables(
                [
                    frontier_tbl.slice(int(a), int(b - a))
                    for a, b in zip(bounds[:-1], bounds[1:])
                    if b > a
                ]
            )
        else:
            frontier_ds = None
    else:
        frontier_ds = frontier_tbl
        n_frontier = frontier_ds.count() if frontier_ds is not None else 0
    res.timings["frontier_stage"] = round(
        res.timings.get("frontier_stage", 0.0) + time.perf_counter() - t_norm, 2
    )
    return frontier_ds, n_frontier


def _bfs(
    frontier_tbl: pa.Table | rd.Dataset | None,
    cfg: CrawlConfig,
    seen: ShardedSeenSet,
    graph_ref,
    corpus_ref,
    out_dir: str,
    ckpt_dir: str,
    res: CrawlResult,
    start_gen: int,
    checkpoint: bool,
    crawl_epoch: float = 0.0,
    parse_listing_fn=None,
    parse_doc_fn=None,
    slot_shards: list | None = None,
    session_shards: list | None = None,
    allow_pipelined: bool = True,
) -> None:
    import pandas as pd

    if (
        allow_pipelined
        and not checkpoint
        and not cfg.frontier_budget
        and not cfg.host_affinity
        and cfg.write_lineage
        and cfg.pipeline_generations > 1
    ):
        return _bfs_pipelined(
            frontier_tbl, cfg, seen, graph_ref, corpus_ref,
            out_dir, res, start_gen, crawl_epoch, parse_listing_fn, parse_doc_fn,
            slot_shards,
        )

    gen = start_gen
    writer = _AsyncWriter()
    frontier_ds, n_frontier = _stage_frontier(frontier_tbl, cfg, res)

    # fast path: no checkpoint and no frontier budget → the frontier stays a
    # LAZY dataset between generations (the explode chains into the next
    # generation's fused fetch — one streaming execution per generation), and
    # ALL per-generation sinks (lineage, errors, metrics, doc write) run in
    # the bounded async writer.  Per-generation arrival/dedup counts come from
    # seen-shard counter deltas (generations are serial), so nothing on the
    # critical path counts or materializes the frontier.  The checkpoint /
    # budget path below keeps the materialized frontier (it must be durable /
    # sortable) and synchronous bookkeeping.
    fast = not checkpoint and not cfg.frontier_budget
    ops_prev = _seen_total_ops(seen) if fast else 0
    fast_gens: list[dict] = []

    try:
        while frontier_ds is not None and n_frontier > 0:
            if gen - start_gen >= cfg.max_generations:
                break
            if checkpoint:
                # docs of gen-1 must be durable before the checkpoint that
                # promises "resume at gen" skips them
                writer.join()
                _save_checkpoint(ckpt_dir, gen, frontier_ds, seen,
                                 slot_shards, res.per_generation)
            t_iter0 = time.perf_counter()
            carryover: rd.Dataset | None = None
            n_carry = 0
            if cfg.frontier_budget and n_frontier > cfg.frontier_budget:
                # priority-frontier pop, fully distributed: sort + index split
                srt = frontier_ds.sort(["priority", "url"]).materialize()
                frontier_ds, carryover = srt.split_at_indices([cfg.frontier_budget])
                n_carry = n_frontier - cfg.frontier_budget
                n_frontier = cfg.frontier_budget
            # the frontier arrives pre-blocked at fetch granularity: the seed
            # path via override_num_blocks, the explode path via the chunked
            # generator in the frontier construction below (which replaced the
            # per-generation Repartition all-to-all — a fixed ~0.5-1 s launch
            # cost per generation that capped 16-core scaling)
            frontier = frontier_ds
            # per-generation effective batch (the lazy-frontier path's
            # sentinel n_frontier=1 keeps the configured batch)
            bs_eff = _small_frontier_batch(n_frontier, cfg)
            frontier = frontier.map_batches(
                canonicalize_batch, batch_format="pyarrow", batch_size=bs_eff
            )
            _rf = getattr(cfg, "_robots_fn", None)
            if _rf is not None:
                frontier = frontier.map_batches(
                    _rf, batch_format="pyarrow", batch_size=bs_eff
                )
            frontier = frontier.map_batches(
                SeenFilter(seen.shards, seen.n_shards),
                batch_format="pyarrow",
                batch_size=bs_eff,
            )
            # politeness scheduling: per-host slot reservation against the
            # sharded slot actors — a map stage (tiny RPC per batch), NOT the
            # r1 groupby(host) all-to-all whose fixed cost capped scaling
            frontier = frontier.map_batches(
                SlotAssigner(slot_shards, len(slot_shards)),
                batch_format="pyarrow",
                batch_size=bs_eff,
            )
            # decode is FUSED into the fetch stage (FetchActor decode=True):
            # payload bytes are read as zero-copy views over the plasma
            # corpus and never enter an output block unless keep_payloads (or
            # a per-source parse_doc, which receives the payload) asks.  Two
            # earlier designs lost to memory bandwidth — a decoupled async
            # decode serialized the last generation's decode after its fetch,
            # and a separate decode stage copied every blob through
            # take→block→plasma→read (~45 KB/row).
            keep_bytes = cfg.keep_payloads or parse_doc_fn is not None
            fetch_args = (
                graph_ref, corpus_ref, cfg.politeness_mode, crawl_epoch,
                True, cfg.ocr_threshold, keep_bytes,
            )
            if cfg.host_affinity:
                # S6: one fetch unit per host, rows processed in scheduled
                # order within it — no re-split (splitting would break the
                # per-host request chain a stateful postback protocol needs)
                fetched = frontier.groupby("host").map_groups(
                    _make_host_fetch_fn(*fetch_args, session_shards=session_shards),
                    batch_format="pyarrow",
                )
            elif cfg.compute == "actors":
                fetched = frontier.map_batches(
                    FetchActor,
                    fn_constructor_args=fetch_args,
                    batch_format="pyarrow",
                    batch_size=bs_eff,
                    # autoscaling pool: min = 1/4 of max warms a few actors up
                    # front (cuts ramp-up skew) while never reserving the whole
                    # CPU budget — a fixed-size pool + shard actors can deadlock
                    # a 4-CPU session by starving the fused task stages
                    concurrency=(max(1, cfg.fetch_concurrency // 4), cfg.fetch_concurrency),
                    num_cpus=cfg.actor_num_cpus,
                )
            else:
                fetched = frontier.map_batches(
                    _make_fetch_fn(*fetch_args),
                    batch_format="pyarrow",
                    batch_size=bs_eff,
                )
            fetched = _browser_stage(fetched, cfg, bs_eff)
            fetched = fetched.map_batches(
                lambda b, g=gen: b.append_column(
                    "generation", pa.array(np.full(b.num_rows, g, np.int32))
                ),
                batch_format="pyarrow",
            )
            # ---- fetch barrier: the ONLY sync point a generation requires ----
            t_g0 = time.perf_counter()
            fetched = fetched.materialize()
            t_fetch = time.perf_counter() - t_g0
            if cfg.collect_stats:
                res.stats.append(fetched.stats())

            if fast:
                ops_now = _seen_total_ops(seen)
                n_arrivals = ops_now - ops_prev
                ops_prev = ops_now
                n_after_seen = fetched.count()  # metadata — free post-materialize
                if n_arrivals == 0 and n_after_seen == 0:
                    break  # trailing empty generation (previous gen had no listings)
                d = {
                    "generation": gen,
                    "frontier": n_arrivals,
                    "after_seen": n_after_seen,
                    "dedup_dropped": n_arrivals - n_after_seen,
                    "fetched_ok": 0, "errors": 0, "docs_written": 0,
                    "t_fetch": round(t_fetch, 2), "t_meta": 0.0,
                    "t_decode_write": 0.0, "t_frontier": 0.0,
                    "t_iter": round(time.perf_counter() - t_iter0, 2),
                }
                res.per_generation.append(d)
                fast_gens.append(d)

                def _meta(fetched=fetched, gen=gen, d=d, n_after_seen=n_after_seen):
                    t0 = time.perf_counter()
                    lin_dir = (
                        _write_gen_lineage(fetched, out_dir, gen, cfg)
                        if cfg.write_lineage else None
                    )
                    stats = _derive_gen_stats(fetched, lin_dir)
                    err_rows = stats[stats["status"] == "error"] if len(stats) else stats
                    ok_rows = stats[stats["status"] == "ok"] if len(stats) else stats
                    n_err = int(err_rows["n"].sum()) if len(stats) else 0
                    n_docs = int(ok_rows[ok_rows["kind"] == "doc"]["n"].sum()) if len(stats) else 0
                    if n_err:
                        _write_gen_errors(fetched, out_dir, gen, lin_dir)
                    if cfg.write_lineage and n_after_seen:
                        _write_gen_metrics(stats, err_rows, n_err, out_dir, gen)
                    d["errors"] = n_err
                    d["fetched_ok"] = n_after_seen - n_err
                    d["t_meta"] = round(time.perf_counter() - t0, 2)
                    if n_docs:
                        t1 = time.perf_counter()
                        docs, docs_dir = _build_doc_sink(fetched, cfg, parse_doc_fn, out_dir, gen)
                        docs.write_parquet(docs_dir, partition_cols=["year", "type", "situation"])
                        if cfg.collect_stats:
                            res.stats.append(docs.stats())
                        d["t_decode_write"] = round(time.perf_counter() - t1, 2)
                    d["docs_written"] = n_docs

                writer.launch(_meta)
                res.generations = gen + 1
                gen += 1
                if n_after_seen == 0 or (gen - start_gen) >= cfg.max_generations:
                    break
                frontier_ds = _next_frontier_lazy(fetched, parse_listing_fn, cfg)
                n_frontier = 1  # sentinel: the lazy frontier is never counted
                continue

            # ---- lineage sink + derived bookkeeping (sync: checkpoint/budget
            # path — the fast path above runs the same helpers async) ----
            lin_dir = (
                _write_gen_lineage(fetched, out_dir, gen, cfg)
                if cfg.write_lineage else None
            )
            stats = _derive_gen_stats(fetched, lin_dir)
            n_after_seen = int(stats["n"].sum()) if len(stats) else 0
            dropped = n_frontier - n_after_seen
            err_rows = stats[stats["status"] == "error"] if len(stats) else stats
            ok_rows = stats[stats["status"] == "ok"] if len(stats) else stats
            n_err = int(err_rows["n"].sum()) if len(stats) else 0
            n_docs = int(ok_rows[ok_rows["kind"] == "doc"]["n"].sum()) if len(stats) else 0
            n_listings = int(ok_rows[ok_rows["kind"] == "listing"]["n"].sum()) if len(stats) else 0

            if n_err:
                _write_gen_errors(fetched, out_dir, gen, lin_dir)
            if cfg.write_lineage and n_after_seen:
                _write_gen_metrics(stats, err_rows, n_err, out_dir, gen)

            t_meta = time.perf_counter() - t_g0 - t_fetch
            t_g1 = time.perf_counter()
            # next frontier = exploded out_links of this generation's listings:
            # metadata columns only (payloads never flow through the explode),
            # materialized into the OBJECT STORE — never collected to the driver.
            will_continue = (gen + 1 - start_gen) < cfg.max_generations
            nxt: rd.Dataset | None = None
            n_next = 0
            if n_listings and (will_continue or checkpoint):
                nxt = _next_frontier_lazy(fetched, parse_listing_fn, cfg).materialize()
                n_next = nxt.count()
            if carryover is not None and n_carry:
                nxt = nxt.union(carryover).materialize() if nxt is not None else carryover
                n_next += n_carry
            t_frontier = time.perf_counter() - t_g1

            # docs: decode + partitioned write, OFF the critical path
            t_g2 = time.perf_counter()
            if n_docs:
                docs, docs_dir = _build_doc_sink(fetched, cfg, parse_doc_fn, out_dir, gen)

                def _write_docs(ds=docs, d=docs_dir, collect=cfg.collect_stats):
                    ds.write_parquet(d, partition_cols=["year", "type", "situation"])
                    if collect:
                        res.stats.append(ds.stats())

                writer.launch(_write_docs)
            t_docs_launch = time.perf_counter() - t_g2

            res.per_generation.append(
                {
                    "generation": gen,
                    "frontier": n_frontier,
                    "after_seen": n_after_seen,
                    "dedup_dropped": dropped,
                    "fetched_ok": n_after_seen - n_err,
                    "errors": n_err,
                    "docs_written": n_docs,
                    "t_fetch": round(t_fetch, 2),
                    "t_meta": round(t_meta, 2),
                    "t_decode_write": round(t_docs_launch, 2),
                    "t_frontier": round(t_frontier, 2),
                    "t_iter": round(time.perf_counter() - t_iter0, 2),
                }
            )
            res.fetched_ok += n_after_seen - n_err
            res.errors += n_err
            res.dedup_dropped += dropped
            res.docs_written += n_docs
            res.generations = gen + 1
            gen += 1
            frontier_ds, n_frontier = nxt, n_next
    finally:
        t_j = time.perf_counter()
        writer.join()
        res.timings["final_writer_join"] = round(
            res.timings.get("final_writer_join", 0.0) + time.perf_counter() - t_j, 2,
        )
        # fast-path generations fill errors/docs counters in the async meta
        # closures — accumulate them only after the join above flushed them
        for d in fast_gens:
            res.fetched_ok += d["fetched_ok"]
            res.errors += d["errors"]
            res.dedup_dropped += d["dedup_dropped"]
            res.docs_written += d["docs_written"]

    if checkpoint:
        exhausted = frontier_ds is None or n_frontier == 0
        _save_checkpoint(
            ckpt_dir, gen, frontier_ds if n_frontier else None, seen,
            slot_shards, res.per_generation, final=exhausted,
        )


def _make_gen_sink(gen: int, out_dir: str, cfg: CrawlConfig, parse_listing_fn, parse_doc_fn):
    """Single-consumer generation sink (r3): a pass-through ``map_batches``
    stage fused onto the tail of generation ``gen``'s fetch chain.  Per batch it
    (1) writes the lineage rows (hive ``lineage/gen=N/part-*.parquet``),
    (2) writes the doc rows (hive ``docs/gen=N/year=/type=/situation=``, decode
    columns already produced by the fused fetch), and (3) emits ONLY the
    exploded out-links of the batch's listings — the next generation's frontier
    rows.  This makes the whole generation ONE Ray Data consumer: no separate
    doc-sink / lineage executions over a materialized fetch output, so the next
    generation's (lazily chained) fetch starts while this one's tail drains.

    Output files use uuid basenames, so concurrent tasks never collide; dirs
    are cleared at CHAIN BUILD time on the driver (resume/recrawl re-runs a
    generation and parquet sinks append by default).  Assumes ``out_dir`` is on
    a filesystem shared by all workers (single-node /tmp here; NFS/objstore
    mount on a cluster) — the same assumption Dataset.write_parquet makes."""
    lin_dir = os.path.join(out_dir, "lineage", f"gen={gen}")
    docs_dir = os.path.join(out_dir, "docs", f"gen={gen}")
    for d in (lin_dir, docs_dir):
        if os.path.exists(d):
            shutil.rmtree(d)
    # dirs are (re)created inside the sink tasks (exist_ok — concurrent-safe):
    # an empty pre-created lineage dir would read as a present-but-schemaless
    # pads.dataset in the post-window bookkeeping
    doc_cols = (
        [c for c in DOC_COLUMNS]
        + (["bytes"] if cfg.keep_payloads else [])
        + (["source", "extras"] if parse_doc_fn is not None else [])
    )
    meta_cols = ["status", "kind", "out_links", "host", "year", "situation",
                 "type", "priority", "depth"]
    if parse_listing_fn is not None:
        meta_cols.append("source")
    explode = parse_listing_fn or _explode_links
    part_schema = pa.schema(
        [pa.field("year", pa.int32()), pa.field("type", pa.string()),
         pa.field("situation", pa.string())]
    )

    def sink(batch: pa.Table) -> pa.Table:
        import uuid

        import pyarrow.dataset as pads

        batch = batch.append_column(
            "generation", pa.array(np.full(batch.num_rows, gen, np.int32))
        )
        if batch.num_rows:
            uid = uuid.uuid4().hex
            os.makedirs(lin_dir, exist_ok=True)
            pq.write_table(
                batch.select(_lineage_cols(cfg)),
                os.path.join(lin_dir, f"part-{uid}.parquet"),
            )
            if parse_doc_fn is not None:
                d = _status_kind_filter("ok", "doc")(batch)
                doc_tbl = _project_docs(parse_doc_fn(d), doc_cols) if d.num_rows else None
            else:
                # projection first (zero-copy column refs), row gather after the
                # payload column is dropped — same ordering as _project_docs_ok
                doc_tbl = _project_docs_ok(batch, doc_cols)
            if doc_tbl is not None and doc_tbl.num_rows:
                pads.write_dataset(
                    doc_tbl,
                    docs_dir,
                    format="parquet",
                    partitioning=pads.partitioning(part_schema, flavor="hive"),
                    basename_template=f"part-{uid}-{{i}}.parquet",
                    existing_data_behavior="overwrite_or_ignore",
                )
        meta = batch.select([c for c in meta_cols if c in batch.schema.names])
        return explode(_status_kind_filter("ok", "listing")(meta))

    return sink


def _gen_segment(
    chain: rd.Dataset, gen: int, bs_eff: int, cfg: CrawlConfig, seen: ShardedSeenSet,
    slot_shards: list, graph_ref, corpus_ref, crawl_epoch: float,
    parse_listing_fn, parse_doc_fn, out_dir: str,
) -> rd.Dataset:
    """One lazy generation segment: canonicalize → seen → politeness slots →
    fetch(+fused decode) → generation sink.  All map stages share ``bs_eff`` so
    the task-compute path fuses into a single operator; the segment's output is
    the NEXT generation's frontier rows."""
    chain = chain.map_batches(canonicalize_batch, batch_format="pyarrow", batch_size=bs_eff)
    _rf = getattr(cfg, "_robots_fn", None)
    if _rf is not None:
        chain = chain.map_batches(_rf, batch_format="pyarrow", batch_size=bs_eff)
    chain = chain.map_batches(
        SeenFilter(seen.shards, seen.n_shards), batch_format="pyarrow", batch_size=bs_eff
    )
    chain = chain.map_batches(
        SlotAssigner(slot_shards, len(slot_shards)),
        batch_format="pyarrow",
        batch_size=bs_eff,
    )
    keep_bytes = cfg.keep_payloads or parse_doc_fn is not None
    fetch_args = (
        graph_ref, corpus_ref, cfg.politeness_mode, crawl_epoch,
        True, cfg.ocr_threshold, keep_bytes,
    )
    if cfg.compute == "actors":
        chain = chain.map_batches(
            FetchActor,
            fn_constructor_args=fetch_args,
            batch_format="pyarrow",
            batch_size=bs_eff,
            concurrency=(max(1, cfg.fetch_concurrency // 4), cfg.fetch_concurrency),
            num_cpus=cfg.actor_num_cpus,
        )
    else:
        chain = chain.map_batches(
            _make_fetch_fn(*fetch_args), batch_format="pyarrow", batch_size=bs_eff
        )
    chain = _browser_stage(chain, cfg, bs_eff)
    return chain.map_batches(
        _make_gen_sink(gen, out_dir, cfg, parse_listing_fn, parse_doc_fn),
        batch_format="pyarrow",
        batch_size=bs_eff,
    )


def _bfs_pipelined(
    frontier_tbl: pa.Table | rd.Dataset | None,
    cfg: CrawlConfig,
    seen: ShardedSeenSet,
    graph_ref,
    corpus_ref,
    out_dir: str,
    res: CrawlResult,
    start_gen: int,
    crawl_epoch: float,
    parse_listing_fn,
    parse_doc_fn,
    slot_shards: list,
) -> None:
    """Single-consumer streaming BFS (r3): up to ``cfg.pipeline_generations``
    generation segments are chained LAZILY and executed as ONE streaming
    pipeline; the only materialized artifact per window is the (small,
    metadata-only) frontier left over at the window's end.  Doc + lineage
    writes happen inside each segment's sink, so the per-generation fetch
    barrier — and its fill/drain seam, the measured cap on 4→16-core full-crawl
    scaling efficiency (0.57–0.62 vs the ≥0.8 north_rule bar) — is paid once
    per WINDOW.  Per-generation bookkeeping (errors, metrics, host clocks,
    counters) derives from the written lineage after the window (driver-side
    O(hosts) reads); dedup counts come from seen-shard op deltas per window."""
    gen = start_gen
    frontier_ds, n_frontier = _stage_frontier(frontier_tbl, cfg, res)
    ops_prev = _seen_total_ops(seen)

    while frontier_ds is not None and n_frontier > 0 and (gen - start_gen) < cfg.max_generations:
        W = min(cfg.pipeline_generations, cfg.max_generations - (gen - start_gen))
        window = list(range(gen, gen + W))
        t_iter0 = time.perf_counter()
        chain = frontier_ds
        for g in window:
            bs_eff = _small_frontier_batch(n_frontier, cfg) if g == window[0] else cfg.batch_size
            chain = _gen_segment(
                chain, g, bs_eff, cfg, seen, slot_shards, graph_ref,
                corpus_ref, crawl_epoch, parse_listing_fn, parse_doc_fn, out_dir,
            )
            if g != window[-1]:
                # re-block the exploded frontier at fetch granularity so the
                # next segment fans out (streaming split, no shuffle barrier)
                chain = chain.repartition(
                    target_num_rows_per_block=max(cfg.batch_size // 2, 1)
                )
        nxt = chain.materialize()
        t_window = time.perf_counter() - t_iter0
        if cfg.collect_stats:
            res.stats.append(nxt.stats())
        n_frontier = nxt.count()
        frontier_ds = nxt

        # ---- post-window bookkeeping from lineage (O(hosts) per generation) ----
        t_meta0 = time.perf_counter()
        ops_now = _seen_total_ops(seen)
        survivors_window = 0
        window_active = False
        for g in window:
            lin_dir = os.path.join(out_dir, "lineage", f"gen={g}")
            stats = _derive_gen_stats(None, lin_dir)
            if not len(stats):
                continue
            window_active = True
            n_after_seen = int(stats["n"].sum())
            err_rows = stats[stats["status"] == "error"]
            ok_rows = stats[stats["status"] == "ok"]
            n_err = int(err_rows["n"].sum())
            n_docs = int(ok_rows[ok_rows["kind"] == "doc"]["n"].sum())
            if n_err:
                _write_gen_errors(None, out_dir, g, lin_dir)
            _write_gen_metrics(stats, err_rows, n_err, out_dir, g)
            survivors_window += n_after_seen
            res.fetched_ok += n_after_seen - n_err
            res.errors += n_err
            res.docs_written += n_docs
            res.generations = max(res.generations, g + 1)
            res.per_generation.append(
                {
                    "generation": g,
                    "after_seen": n_after_seen,
                    "fetched_ok": n_after_seen - n_err,
                    "errors": n_err,
                    "docs_written": n_docs,
                    "window": [window[0], window[-1]],
                    "t_window": round(t_window, 2),
                }
            )
        res.dedup_dropped += (ops_now - ops_prev) - survivors_window
        ops_prev = ops_now
        res.timings["meta"] = round(
            res.timings.get("meta", 0.0) + time.perf_counter() - t_meta0, 2
        )
        gen += W
        if n_frontier == 0 or not window_active:
            break


def _make_dispatch(sources: list, method: str):
    """Per-source UDF dispatch inside one map_batches (SURVEY.md M4): split the
    batch by its ``source`` column, apply each source's vectorized parse
    method to its sub-table, concat.  The reference expresses this as 27
    scraper subclasses behind a registry (main.py:59-357); here it is a batch
    partition + per-partition kernel — no per-row dispatch."""
    by_name = {s.name: s for s in sources}

    def dispatch(batch: pa.Table) -> pa.Table:
        outs = []
        for name, src in by_name.items():
            sub = batch.filter(pc.equal(batch["source"], name))
            if sub.num_rows:
                o = getattr(src, method)(sub)
                if "source" not in o.schema.names:
                    o = o.append_column(
                        "source", pa.array([name] * o.num_rows, pa.string())
                    )
                outs.append(o)
        if not outs:  # empty batch: preserve the output schema
            first = next(iter(by_name.values()))
            o = getattr(first, method)(batch.slice(0, 0))
            if "source" not in o.schema.names:
                o = o.append_column("source", pa.array([], pa.string()))
            return _ensure_extras(o) if method == "parse_doc" else o
        if method == "parse_doc":
            # per-source extras (map<string,string>) are optional in the
            # protocol; normalize so mixed-source batches concat cleanly
            outs = [_ensure_extras(o) for o in outs]
        return pa.concat_tables(outs)

    return dispatch


EXTRAS_TYPE = pa.map_(pa.string(), pa.string())


def _ensure_extras(t: pa.Table) -> pa.Table:
    """Guarantee the dynamic per-source ``extras`` map column (SURVEY §1.4 —
    the reference dict-merges per-source fields into each record,
    federal_legislation/scrape.py:355-360).  Sources that emit none get nulls."""
    if "extras" in t.schema.names:
        col = t["extras"]
        if col.type != EXTRAS_TYPE:
            col = col.cast(EXTRAS_TYPE) if isinstance(col, pa.ChunkedArray) else pa.chunked_array([col]).cast(EXTRAS_TYPE)
            t = t.set_column(t.schema.get_field_index("extras"), "extras", col)
        return t
    return t.append_column("extras", pa.nulls(t.num_rows, EXTRAS_TYPE))


def _status_kind_filter(status: str, kind: str | None):
    """Vectorized Arrow row filter — ``Dataset.filter(expr=...)`` evaluates
    row-at-a-time in Python (measured 4+ s per 8k-row payload block); a
    ``Table.filter`` with a compute mask is a C++ kernel."""

    def f(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["status"], status)
        if kind is not None:
            mask = pc.and_(mask, pc.equal(t["kind"], kind))
        return t.filter(pc.fill_null(mask, False))

    return f


def _make_fetch_fn(*fetch_args):
    """Task-pool fetch: builds a FetchActor per task — cheap because its state
    is a zero-copy plasma view (no index construction)."""

    def fetch(batch: pa.Table) -> pa.Table:
        return FetchActor(*fetch_args)(batch)

    return fetch


def _make_host_fetch_fn(*fetch_args, session_shards: list | None = None):
    """S6 sequential-protocol fetch: one ``groupby(host)`` group = one fetch
    unit; rows are processed strictly in scheduled order and stamped with a
    dense per-host sequence + the worker pid, so tests (and operators) can
    audit that a host's request chain never interleaved across workers.

    With ``session_shards`` (cfg.session_tokens), each unit additionally
    threads the host's postback token chain (state/session.py): it fetches the
    host's tail token from the owning shard, presents ``token_i`` with request
    *i* (recorded in the ``post_token`` lineage column), and persists the new
    tail — so the chain survives batches AND generations, exactly like the
    reference's per-host requests.Session holding a live ViewState."""

    def fetch_host(group: pa.Table) -> pa.Table:
        import os

        order = pc.sort_indices(
            group, sort_keys=[("scheduled_ts", "ascending"), ("url_hash", "ascending")]
        )
        group = group.take(order)
        out = FetchActor(*fetch_args)(group)
        n = out.num_rows
        if session_shards is not None:
            from ..state.politeness import host_shard_of
            from ..state.session import advance_chain

            host = group["host"][0].as_py() if n else ""
            shard = session_shards[host_shard_of(host, len(session_shards))]
            tok0 = ray.get(shard.get.remote(host))
            hashes = out["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
            toks, tail = advance_chain(tok0, hashes)
            ray.get(shard.put.remote(host, tail))
            out = out.append_column("post_token", pa.array(toks, pa.uint64()))
        out = out.append_column("fetch_seq", pa.array(np.arange(n, dtype=np.int64)))
        return out.append_column(
            "fetch_pid", pa.array(np.full(n, os.getpid(), np.int64))
        )

    return fetch_host


# one live ScriptedBrowser per WORKER PROCESS (keyed by the click-chain ref):
# the T2 "one driver per worker" semantic (base/scraper.py:134-171) WITHOUT an
# actor-pool reservation — a per-generation-segment actor pool would add
# min-pool CPU reservations per window segment and deadlock small sessions
# (the repo's known fixed-pool gotcha; measured hang at num_cpus=4 with the
# default 4-generation window).  ray.get of the pages table is a zero-copy
# plasma view, so the cache only skips the per-batch index-dict build.
_BROWSER_CACHE: dict = {}


def _worker_browser(pages_ref):
    b = _BROWSER_CACHE.get(pages_ref)
    if b is None:
        from ..state.browser import ScriptedBrowser

        _BROWSER_CACHE.clear()  # refs from finished crawls: drop their pins
        b = ScriptedBrowser(ray.get(pages_ref))
        _BROWSER_CACHE[pages_ref] = b
    return b


def _make_browser_expand(pages_ref):
    """Browser click-through expansion (S3/T2 stand-in): every OK listing row
    whose URL is a click-through entry is driven ``open`` → ``click_next``\\*
    through its scripted pagination (parana.py:127-156's 'próximo' loop) on
    the worker's live ScriptedBrowser handle, and the clicked pages' links
    are appended to the row's ``out_links`` so the ordinary frontier explode
    sees them.  The per-entry loop is row-at-a-time BY PROTOCOL — each click
    depends on the previous DOM state, exactly like a live browser — and
    entries are listing-count-sized, never doc-sized.  Rows that aren't
    browser entries (docs, other sources in a union crawl) pass through
    untouched.  Adds audit columns: ``pages_clicked`` (0 for non-entries) and
    ``dom_token`` (the final DOM state — lineage replays the chain to prove
    no click was skipped or interleaved)."""

    def expand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        clicked = np.zeros(n, np.int32)
        dom = np.zeros(n, np.uint64)
        if n and "out_links" in batch.schema.names:
            b = _worker_browser(pages_ref)
            urls = batch["url"].to_pylist()
            status = batch["status"].to_pylist()
            kind = batch["kind"].to_pylist()
            links_col = None
            for i in range(n):
                if status[i] != "ok" or kind[i] != "listing" or not b.is_entry(urls[i]):
                    continue
                if links_col is None:
                    links_col = batch["out_links"].to_pylist()
                b.open(urls[i])
                extra: list[str] = []
                while b.has_next():
                    extra.extend(b.click_next())
                links_col[i] = list(links_col[i] or []) + extra
                clicked[i] = b.page - 1
                dom[i] = b.dom_token
            if links_col is not None:
                batch = batch.set_column(
                    batch.schema.get_field_index("out_links"), "out_links",
                    pa.array(links_col, pa.list_(pa.string())),
                )
        return batch.append_column(
            "pages_clicked", pa.array(clicked, pa.int32())
        ).append_column("dom_token", pa.array(dom, pa.uint64()))

    return expand


def _browser_stage(fetched: rd.Dataset, cfg: CrawlConfig, bs_eff: int) -> rd.Dataset:
    """Insert the click-through expansion when a browser-pool source is
    active (no-op otherwise).  Task stage sharing ``bs_eff`` so it fuses onto
    the fetch chain; handle state lives in the worker-process cache."""
    bp_ref = getattr(cfg, "_browser_pages_ref", None)
    if bp_ref is None:
        return fetched
    return fetched.map_batches(
        _make_browser_expand(bp_ref), batch_format="pyarrow", batch_size=bs_eff
    )


# doc-sink columns produced by DecodeActor itself (not read from the fetch row)
DERIVED_DOC_COLUMNS = {"decode_ok", "phash_decoded", "ocr_used", "feat_mean_rgb"}


def _project_docs(batch: pa.Table, cols: list[str]) -> pa.Table:
    out = {}
    for c in cols:
        if c in ("year", "situation", "type"):
            out[c] = batch["doc_" + c]
        else:
            out[c] = batch[c]
    return pa.table(out)


def _project_docs_ok(batch: pa.Table, cols: list[str]) -> pa.Table:
    """Project to the doc-sink schema, then keep only ok/doc rows.  The
    projection is zero-copy (column references), so the row gather happens
    AFTER the payload column is dropped — filtering first would copy every
    blob (measured: the payload is ~98% of the block)."""
    mask = pc.and_(pc.equal(batch["status"], "ok"), pc.equal(batch["kind"], "doc"))
    return _project_docs(batch, cols).filter(pc.fill_null(mask, False))


# ---------------- checkpoint helpers ----------------


def _check_seen_mode(state: dict, cfg: CrawlConfig) -> None:
    """Restoring an 'exact' snapshot into a 'cuckoo' session (or vice versa)
    would fail deep inside CuckooFilter/ExactSet.deserialize with an obscure
    numpy load error — validate against the recorded mode up front (ADVICE r2).
    Manifests written before the mode was recorded validate permissively."""
    saved = state.get("seen_mode")
    if saved is not None and saved != cfg.seen_mode:
        raise ValueError(
            f"checkpoint was written with seen_mode={saved!r}; "
            f"got cfg.seen_mode={cfg.seen_mode!r}"
        )


def _save_checkpoint(ckpt_dir, gen, frontier, seen, slot_shards, per_generation, final=False):
    """``frontier`` is a (materialized) Dataset or None — persisted as a
    parquet DIRECTORY (distributed write; cleared first since write_parquet
    appends).  The manifest is only flipped to point at it afterwards, so an
    interrupted checkpoint write leaves the previous manifest intact.

    Host clocks are pulled from the politeness shard actors ONE SHARD AT A
    TIME and streamed to a parquet file (r5 scale audit: a manifest-embedded
    host→clock dict is ~15-20 GB at 10^8 hosts; per-shard row groups bound
    both the driver transient and the resume-side read)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    cpath = os.path.join(ckpt_dir, f"clocks_gen{gen}.parquet")
    cschema = pa.schema([("host", pa.string()), ("clock", pa.float64())])
    cwriter = pq.ParquetWriter(cpath, cschema)
    for sh in slot_shards or []:
        d = ray.get(sh.clocks.remote())
        cwriter.write_table(pa.table(
            {"host": pa.array(list(d.keys()), pa.string()),
             "clock": pa.array([float(v) for v in d.values()], pa.float64())},
            schema=cschema))
    cwriter.close()
    shard_files = []
    for i, blob in enumerate(seen.snapshot()):
        p = os.path.join(ckpt_dir, f"seen_gen{gen}_shard{i}.bin")
        with open(p, "wb") as f:
            f.write(blob)
        shard_files.append(p)
    fpath = os.path.join(ckpt_dir, f"frontier_gen{gen}")
    if frontier is not None:
        if os.path.exists(fpath):
            shutil.rmtree(fpath)
        frontier.write_parquet(fpath)
    state = {
        "next_generation": gen,
        "frontier_file": fpath,
        "shard_files": shard_files,
        "seen_mode": seen.mode,
        "clocks_file": cpath,
        "per_generation": per_generation,
        "final": final,
    }
    tmp = os.path.join(ckpt_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, os.path.join(ckpt_dir, "manifest.json"))


def _load_checkpoint(ckpt_dir):
    p = os.path.join(ckpt_dir, "manifest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        state = json.load(f)
    if state.get("final"):
        return state | {"frontier_file": "/nonexistent"}
    return state


def _load_clocks(state: dict) -> dict:
    """Clocks from a checkpoint manifest: the r5 per-shard parquet dump, or
    the legacy manifest-embedded dict.  Returned as one dict (sandbox scale);
    at 10^8 hosts the caller would stream row groups straight into the
    per-shard seeding slices instead of materializing the union."""
    cpath = state.get("clocks_file")
    if cpath and os.path.exists(cpath):
        t = pq.read_table(cpath)
        return dict(zip(t["host"].to_pylist(), t["clock"].to_pylist()))
    return dict(state.get("clocks") or {})


def _read_blob(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()
